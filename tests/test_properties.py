"""Property-based kernel tests (hypothesis): the invariants every other
layer (engine UDFs, oracle, streaming) silently relies on.

Only EXACT properties — determinism, idempotence, path equivalence,
reference-implementation equality — no statistical assertions that could
flake.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcompress_spark import kernels as K  # noqa: E402
from pcompress_spark.config import DedupConfig  # noqa: E402

CFG = DedupConfig()
SETTINGS = dict(max_examples=60, deadline=None)

texts = st.text(max_size=200)
text_lists = st.lists(st.text(max_size=80), min_size=1, max_size=12)


@given(texts)
@settings(**SETTINGS)
def test_normalize_idempotent(t):
    once = K.normalize_one(t)
    assert K.normalize_one(once) == once


@given(texts)
@settings(**SETTINGS)
def test_normalize_fast_path_equals_regex(t):
    """The ASCII translate fast path must be byte-identical to the regex
    definition for EVERY input (non-ASCII exercises the fallback branch)."""
    assert K.normalize_one(t) == K._NORM_RE.sub(" ", t.lower()).strip()


@given(texts)
@settings(**SETTINGS)
def test_normalize_scalar_equals_vector(t):
    got = K.normalize_texts(pd.Series([t, t]))
    assert got.tolist() == [K.normalize_one(t)] * 2


@given(text_lists)
@settings(**SETTINGS)
def test_normalize_bytes_batch_matches_scalar(docs):
    """normalize_bytes_batch (flat-ASCII want_hashes=False path) must agree
    with normalize_one on bytes AND char length for every mix of
    ASCII/non-ASCII/NUL docs."""
    nb, lens = K.normalize_bytes_batch(pd.Series(docs))
    for b, l, t in zip(nb, lens, docs):
        ref = K.normalize_one(t)
        assert b == ref.encode("utf-8")
        assert l == len(ref)


@given(text_lists)
@settings(**SETTINGS)
def test_signatures_batch_invariance(docs):
    """Signatures must not depend on batch composition (partition
    independence — the property Spark repartitioning relies on)."""
    s = pd.Series(docs)
    whole = K.signatures_for_texts(s, CFG)
    split = pd.concat(
        [K.signatures_for_texts(s[:1], CFG), K.signatures_for_texts(s[1:], CFG)],
        ignore_index=True,
    )
    assert whole["content_hash"].tolist() == split["content_hash"].tolist()
    assert whole["simhash"].tolist() == split["simhash"].tolist()
    for i in range(len(docs)):
        assert np.array_equal(whole.loc[i, "minhash"], split.loc[i, "minhash"])
        assert np.array_equal(whole.loc[i, "shingles"], split.loc[i, "shingles"])


@given(text_lists)
@settings(**SETTINGS)
def test_identical_docs_get_identical_signatures(docs):
    s = pd.Series(docs + docs)
    sig = K.signatures_for_texts(s, CFG)
    n = len(docs)
    for i in range(n):
        assert sig.loc[i, "content_hash"] == sig.loc[n + i, "content_hash"]
        assert sig.loc[i, "simhash"] == sig.loc[n + i, "simhash"]
        assert np.array_equal(sig.loc[i, "minhash"], sig.loc[n + i, "minhash"])


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=200, unique=True))
@settings(**SETTINGS)
def test_splitmix64_injective_on_distinct_inputs(xs):
    out = K.splitmix64(np.asarray(xs, dtype=np.uint64))
    assert len(set(out.tolist())) == len(xs)


@given(st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=40),
       st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=40))
@settings(**SETTINGS)
def test_longest_common_run_matches_naive(a, b):
    def naive(x, y):
        best = 0
        for i in range(len(x)):
            for j in range(len(y)):
                k = 0
                while i + k < len(x) and j + k < len(y) and x[i + k] == y[j + k]:
                    k += 1
                best = max(best, k)
        return best

    xa = np.asarray(a, dtype=np.uint64)
    xb = np.asarray(b, dtype=np.uint64)
    expect = naive(a, b)
    assert K.longest_common_run(xa, xb) == expect
    # the suffix-array scheme is bit-identical to the rolling-hash scheme
    assert K.lcs_suffix_array(xa, xb) == expect
