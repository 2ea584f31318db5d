"""Unit tests for the shared signature kernels (no Spark needed)."""

import numpy as np
import pandas as pd
import pytest

from pcompress_spark.config import DedupConfig
from pcompress_spark import kernels as K


CFG = DedupConfig()


def test_normalize_idempotent_and_ascii():
    s = pd.Series(["  Hello, WORLD!! 42 ", "a--b__c", None, ""])
    out = K.normalize_texts(s)
    assert out.tolist() == ["hello world 42", "a b c", "", ""]
    assert K.normalize_texts(out).tolist() == out.tolist()
    for raw, norm in zip(s, out):
        assert K.normalize_one(raw) == norm


def test_hash_tokens_deterministic_and_distinct():
    toks = np.array(["alpha", "beta", "alpha", "alphabeta", "x"])
    h = K.hash_tokens(toks)
    assert h.dtype == np.uint64
    assert h[0] == h[2]
    assert len({int(x) for x in h}) == 4
    # stable across calls and array widths
    h2 = K.hash_tokens(np.array(["alpha", "a-very-much-longer-token-here"]))
    assert h2[0] == h[0]


def test_token_truncation_shared_semantics():
    long_a = "q" * 100 + "a"
    long_b = "q" * 100 + "b"
    h = K.hash_tokens(np.array([long_a, long_b]), max_token_chars=64)
    assert h[0] == h[1]  # differ only beyond truncation point


def test_shingle_flat_matches_per_doc():
    rng = np.random.default_rng(0)
    docs = [rng.integers(0, 2**63, size=n).astype(np.uint64) for n in (10, 3, 0, 7, 5)]
    starts = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=starts[1:])
    flat = np.concatenate([d for d in docs if len(d)])
    k = 5
    sh_flat, sh_starts = K.shingle_hashes_flat(flat, starts, k)
    for i, d in enumerate(docs):
        expect = K.shingle_hashes(d, k)
        got = sh_flat[sh_starts[i]: sh_starts[i + 1]]
        assert np.array_equal(got, expect), f"doc {i}"


def test_minhash_matches_bruteforce_and_empty_sentinel():
    rng = np.random.default_rng(1)
    docs = [rng.integers(0, 2**63, size=n).astype(np.uint64) for n in (50, 0, 8, 0)]
    starts = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=starts[1:])
    flat = np.concatenate([d for d in docs if len(d)])
    sig = K.minhash_flat(flat, starts, CFG.num_perm, CFG.seed, perm_chunk=7,
                         scheme="perm")
    a, b = K.perm_params(CFG.num_perm, CFG.seed)
    for i, d in enumerate(docs):
        if len(d):
            expect = (d[:, None] * a[None, :] + b[None, :]).min(axis=0)
        else:
            expect = K._EMPTY_SENTINEL * a + b
        assert np.array_equal(sig[i], expect), f"doc {i}"
    assert np.array_equal(sig[1], sig[3])  # all empties identical


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 2**63, size=2000).astype(np.uint64)
    a = np.unique(base[:1500])
    b = np.unique(base[500:])  # true J ~ 1000/2000 = 0.5
    starts = np.array([0, len(a), len(a) + len(b)], dtype=np.int64)
    sig = K.minhash_flat(np.concatenate([a, b]), starts, 128, 42)
    est = K.minhash_est(sig[0], sig[1])
    true_j = K.jaccard_sorted(a, b)
    assert abs(est - true_j) < 0.15


def test_simhash_hamming_monotone():
    """More shared shingles -> smaller Hamming distance (on average)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**63, size=600).astype(np.uint64)
    variants = [np.unique(np.concatenate([base[:500], rng.integers(0, 2**63, size=m).astype(np.uint64)]))
                for m in (5, 250)]
    sets = [np.unique(base[:500])] + variants
    starts = np.zeros(len(sets) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=starts[1:])
    sims = K.simhash_flat(np.concatenate(sets), starts)
    d_close = K.hamming64(sims[0], sims[1])
    d_far = K.hamming64(sims[0], sims[2])
    assert d_close < d_far


def test_window_fingerprints_detect_shared_run():
    """Content-defined selection: a shared run is found at ANY offset."""
    rng = np.random.default_rng(4)
    run = rng.integers(0, 2**63, size=200).astype(np.uint64)
    for off_a, off_b in [(33, 7), (0, 111), (55, 0)]:
        doc_a = np.concatenate([rng.integers(0, 2**63, size=off_a).astype(np.uint64), run,
                                rng.integers(0, 2**63, size=20).astype(np.uint64)])
        doc_b = np.concatenate([rng.integers(0, 2**63, size=off_b).astype(np.uint64), run])
        wa, _ = K.window_fingerprints(doc_a, 30, 16, k=5)
        wb, _ = K.window_fingerprints(doc_b, 30, 16, k=5)
        assert len(set(map(int, wa)) & set(map(int, wb))) >= 1, (off_a, off_b)


def test_signatures_for_texts_shapes():
    texts = pd.Series(["the quick brown fox jumps over the lazy dog " * 3,
                       "THE quick  brown fox jumps over the lazy dog " * 3,
                       "tiny", ""])
    out = K.signatures_for_texts(texts, CFG)
    assert list(out.columns) == ["n_tokens", "content_hash", "shingles", "minhash",
                                 "simhash", "win_hashes", "win_positions"]
    assert out["n_tokens"].tolist()[2:] == [1, 0]
    # rows 0 and 1 normalize identically -> identical everything
    assert out.loc[0, "content_hash"] == out.loc[1, "content_hash"]
    assert np.array_equal(out.loc[0, "minhash"], out.loc[1, "minhash"])
    assert len(out.loc[0, "minhash"]) == CFG.num_perm
    # shingles distinct, sorted in unsigned space
    sh = np.asarray(out.loc[0, "shingles"]).view(np.uint64)
    assert np.array_equal(sh, np.unique(sh))


def test_batch_invariance():
    """Signatures must not depend on batch composition (partition independence)."""
    texts = pd.Series([f"word{i} " * 30 + "common tail of tokens here now ok yes" for i in range(10)])
    whole = K.signatures_for_texts(texts, CFG)
    part = pd.concat([K.signatures_for_texts(texts[:3], CFG),
                      K.signatures_for_texts(texts[3:7], CFG),
                      K.signatures_for_texts(texts[7:], CFG)], ignore_index=True)
    for col in ("content_hash", "simhash", "n_tokens"):
        assert whole[col].tolist() == part[col].tolist()
    for i in range(10):
        assert np.array_equal(whole.loc[i, "minhash"], part.loc[i, "minhash"])
        assert np.array_equal(whole.loc[i, "shingles"], part.loc[i, "shingles"])


def test_shingle_emptiness_iff_token_floor():
    """band_explode filters banding on n_tokens >= shingle_k instead of
    size(shingles) > 0 (lets Parquet prune the wide shingles column); the
    two predicates must be exactly equivalent for every doc."""
    texts = pd.Series(
        ["", "one", "one two", "one two three", "a b c d e f g",
         "x " * 50, "!!!", "a a a", "tok " * (CFG.shingle_k - 1),
         "tok " * CFG.shingle_k]
    )
    sig = K.signatures_for_texts(texts, CFG)
    for i in range(len(texts)):
        has_shingles = len(sig.loc[i, "shingles"]) > 0
        assert has_shingles == (sig.loc[i, "n_tokens"] >= CFG.shingle_k), (
            i, sig.loc[i, "n_tokens"], len(sig.loc[i, "shingles"]))


def test_trim_after_passes_batches_through():
    seen = []

    def gen(batches):
        for b in batches:
            seen.append(b)
            yield b * 2

    wrapped = K.trim_after(gen)
    out = list(wrapped(iter([1, 2, 3])))
    assert out == [2, 4, 6] and seen == [1, 2, 3]


def test_simhash_flat_matches_naive_majority():
    """simhash_flat's two-level uint8 reduceat vs an independent per-doc
    bit-majority reference, over ragged / empty / over-sample-cap docs."""
    rng = np.random.default_rng(3)
    for trial in range(10):
        n_docs = int(rng.integers(1, 30))
        lens = rng.integers(0, 700, size=n_docs)
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        flat = np.sort(rng.integers(0, 2**64, size=int(starts[-1]), dtype=np.uint64))
        got = K.simhash_flat(flat, starts)
        for i in range(n_docs):
            seg = flat[starts[i]:starts[i + 1]][:512]
            if len(seg) == 0:
                assert got[i] == K._EMPTY_SENTINEL
                continue
            bm = np.unpackbits(seg.astype("<u8").view(np.uint8).reshape(len(seg), 8), axis=1)
            maj = (2 * bm.sum(0) >= len(seg)).astype(np.uint8)
            assert got[i] == np.packbits(maj).view("<u8")[0], (trial, i)


def test_fold_dot_is_left_fold_exact():
    # fold_dot's documented invariant: per row it performs EXACTLY
    # acc = (acc + a_d * b_d) left-to-right in float64 — the operation
    # sequence of the Catalyst aggregate(zip_with(...)) fold and the DuckDB
    # oracle's list_reduce fold. Pinned bitwise vs a scalar reference,
    # including a summation-order-sensitive case (pairwise/SIMD summation
    # would diverge in the last ulps).
    rng = np.random.default_rng(7)
    A = rng.uniform(-1.0, 1.0, (17, 64))
    B = rng.uniform(-1.0, 1.0, 64)
    got_1d = K.fold_dot(A, B)
    got_2d = K.fold_dot(A, np.broadcast_to(B, A.shape).copy())
    for i in range(A.shape[0]):
        acc = 0.0
        for d in range(64):
            acc = acc + A[i, d] * B[d]
        assert got_1d[i] == acc  # bitwise, no tolerance
        assert got_2d[i] == acc
    # order sensitivity: mixed magnitudes where np.dot (pairwise) differs
    a = np.array([[1e16, 1.0, -1e16, 1.0]])
    b = np.ones((1, 4))
    assert K.fold_dot(a, b)[0] == ((0.0 + 1e16) + 1.0 - 1e16) + 1.0
    assert K.fold_norm(a)[0] == np.sqrt((((0.0 + 1e32) + 1.0) + 1e32) + 1.0)


def test_lsh_bucket_matrix_bits():
    V = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 0.0]])
    planes = np.array([  # 1 table, 2 planes
        [[1.0, 0.0],     # dot = v[0]
         [-1.0, 0.0]],   # dot = -v[0]
    ])
    out = K.lsh_bucket_matrix(V, planes)
    # dot >= 0 sets bit p: row0 -> bit0 only; row1 -> bit1 only;
    # row2 (zero vector, dots exactly 0.0) -> both bits
    assert out.tolist() == [[1], [2], [3]]


def test_distinct_sorted_matches_per_doc_unique():
    # the vectorized batch dedup must be bit-identical to per-doc np.unique,
    # including cross-doc-boundary equal values, empty docs at every
    # position, and all-duplicate segments
    rng = np.random.default_rng(11)
    for trial in range(50):
        n_docs = int(rng.integers(1, 30))
        docs = []
        for _ in range(n_docs):
            n = int(rng.integers(0, 40))
            # small value alphabet forces duplicates within AND across docs
            docs.append(rng.integers(0, 25, size=n).astype(np.uint64))
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum([len(d) for d in docs], out=starts[1:])
        flat = (
            np.concatenate([d for d in docs if len(d)])
            if starts[-1]
            else np.empty(0, dtype=np.uint64)
        )
        flat_before = flat.copy()
        outs, cat, new_starts = K.distinct_sorted_per_doc(flat, starts)
        assert np.array_equal(flat, flat_before), "input must not be mutated"
        expect_list = [np.unique(d) if len(d) else d for d in docs]
        for i, e in enumerate(expect_list):
            assert np.array_equal(outs[i], e), f"trial {trial} doc {i}"
        assert np.array_equal(
            cat,
            np.concatenate(expect_list)
            if sum(len(e) for e in expect_list)
            else np.empty(0, dtype=np.uint64),
        )
        assert new_starts[0] == 0 and new_starts[-1] == len(cat)


def test_oph_densify_matches_rotation_loop():
    # the vectorized nearest-left-circular fill must equal the reference
    # two-pass rotation loop for every emptiness pattern
    num_perm = 16
    sentinel = K._MASK64

    def densify_loop(sig):
        sig = sig.copy()
        for _pass in range(2):
            for j in range(num_perm):
                prev = (j - 1) % num_perm
                col = sig[:, j]
                empty = col == sentinel
                if empty.any():
                    col[empty] = sig[empty, prev]
        return sig

    rng = np.random.default_rng(13)
    for trial in range(100):
        n = int(rng.integers(1, 20))
        sig = rng.integers(0, 2**63, (n, num_perm), dtype=np.int64).astype(
            np.uint64
        )
        mask = rng.random((n, num_perm)) < rng.random() ** 2
        sig[mask] = sentinel
        if trial % 7 == 0:
            sig[0, :] = sentinel  # fully-empty doc
        expect = densify_loop(sig)
        # drive the real kernel path: feed a raw sig through the public
        # function by reconstructing from flat input is indirect; instead
        # exercise the internal fill via minhash_oph_flat on crafted input
        # is not possible per-pattern, so pin the module-level behavior by
        # replicating the fill (kept in sync with minhash_oph_flat).
        invalid = sig == sentinel
        rows = np.flatnonzero(invalid.any(axis=1))
        out = sig.copy()
        if len(rows):
            sub = out[rows]
            cols = np.arange(num_perm, dtype=np.int16)
            idx = np.where(invalid[rows], np.int16(-1), cols[None, :])
            np.maximum.accumulate(idx, axis=1, out=idx)
            np.copyto(idx, idx[:, -1:], where=(idx < 0))
            all_empty = idx[:, -1] < 0
            if all_empty.any():
                idx[all_empty] = 0
            filled = np.take_along_axis(sub, idx.astype(np.intp), axis=1)
            if all_empty.any():
                filled[all_empty] = sentinel
            out[rows] = filled
        assert np.array_equal(out, expect), f"trial {trial}"


def test_oph_signature_unchanged_golden():
    # end-to-end OPH golden pin: the densification rewrite must not move a
    # single signature value for sparse docs (few shingles -> many empty
    # bins, the densification-heavy case)
    rng = np.random.default_rng(17)
    docs = [rng.integers(0, 2**63, size=n).astype(np.uint64)
            for n in (3, 0, 1, 200, 7)]
    starts = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=starts[1:])
    flat = np.concatenate([d for d in docs if len(d)])
    sig = K.minhash_oph_flat(flat, starts, 128, CFG.seed)
    # every bin filled (no sentinel survives a non-empty doc)
    lens = np.array([len(d) for d in docs])
    assert not (sig[lens > 0] == K._MASK64).any()
    # empty docs get the deterministic filler, identical across docs
    assert np.array_equal(sig[1], K.minhash_oph_flat(
        np.empty(0, dtype=np.uint64), np.zeros(2, dtype=np.int64), 128,
        CFG.seed)[0])
    # single-shingle doc: every bin must equal that shingle's value hash
    v = K.splitmix64(docs[2] + np.uint64(CFG.seed) * np.uint64(0x9E3779B1))[0]
    assert (sig[2] == v).all()


def test_hash_tokens_identifiers_full_length():
    """Identifier hashing (max_token_chars=None) must distinguish ids that
    share a 64+ char prefix; TOKEN hashing keeps the 64-char truncation
    (shared oracle semantics)."""
    import numpy as np

    from pcompress_spark.kernels import hash_tokens

    a, b = "x" * 70 + "1", "x" * 70 + "2"
    ids = hash_tokens(np.array([a, b], dtype=np.str_), None)
    assert ids[0] != ids[1], "full-length id hash collided on a long prefix"
    toks = hash_tokens(np.array([a, b], dtype=np.str_))
    assert toks[0] == toks[1]  # 64-char token truncation unchanged
    # short ids are unaffected by the None mode (same values either way)
    short = np.array(["conv-1", "conv-2"], dtype=np.str_)
    assert (hash_tokens(short, None) == hash_tokens(short)).all()


def test_simhash_bits_must_be_64():
    import numpy as np
    import pytest as _pytest

    from pcompress_spark.config import DedupConfig
    from pcompress_spark.kernels import simhash_flat

    with _pytest.raises(ValueError):
        DedupConfig(simhash_bits=32)
    with _pytest.raises(ValueError):
        simhash_flat(np.array([1], dtype=np.uint64),
                     np.array([0, 1], dtype=np.int64), bits=32)
