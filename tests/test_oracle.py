"""Oracle (pure pandas reference) vs planted ground truth — no Spark."""

import numpy as np
import pandas as pd
import pytest

from pcompress_spark.config import DedupConfig
from pcompress_spark import datagen, oracle


@pytest.fixture(scope="module")
def data():
    return datagen.generate(seed=42, n_conv=200, dup_frac=0.30)


@pytest.fixture(scope="module")
def result(data):
    return oracle.run(data.transcripts, DedupConfig())


def test_datagen_deterministic():
    a = datagen.generate(seed=42, n_conv=50)
    b = datagen.generate(seed=42, n_conv=50)
    pd.testing.assert_frame_equal(a.transcripts, b.transcripts)
    pd.testing.assert_frame_equal(a.truth_pairs, b.truth_pairs)
    c = datagen.generate(seed=43, n_conv=50)
    assert not a.transcripts["text"].equals(c.transcripts["text"])


def test_datagen_schema_and_invariants(data):
    t = data.transcripts
    assert list(t.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t["turn_idx"].dtype == "int32"
    # dense unique turn_idx per conv
    g = t.groupby("conv_id")["turn_idx"]
    assert (g.nunique() == g.size()).all()
    assert (g.min() == 0).all()
    assert (g.max() == g.size() - 1).all()
    fams = set(data.truth_pairs["family"])
    assert {"exact", "near_high", "near_mid", "substring"} <= fams


def test_assemble_stable_order(data):
    """Assembly must be invariant to input row order (input_hint invariant)."""
    asm1 = oracle.assemble(data.transcripts)
    shuffled = data.transcripts.sample(frac=1.0, random_state=7).reset_index(drop=True)
    asm2 = oracle.assemble(shuffled)
    pd.testing.assert_frame_equal(asm1, asm2)


def test_oracle_recall_vs_truth(data, result):
    eng_pairs = oracle.cluster_pairs(result.clusters)
    rec = oracle.pair_recall(eng_pairs, data.truth_pairs, ("exact", "near_high"))
    assert rec >= 0.99, f"recall {rec}"


def test_oracle_exact_pairs_are_exact(data, result):
    """Every truth exact pair ends up in the same cluster (the pairs table
    stores star edges, so check at cluster level)."""
    exact_truth = data.truth_pairs[data.truth_pairs["family"] == "exact"]
    lab = dict(zip(result.clusters["conv_id"], result.clusters["cluster_id"]))
    for a, b in zip(exact_truth["conv_id_a"], exact_truth["conv_id_b"]):
        assert lab[a] == lab[b], (a, b)


def test_oracle_no_false_merges(data, result):
    """distinct/hot_bucket/tiny convs must not be clustered with anything."""
    dup_ids = set(data.truth_pairs["conv_id_a"]) | set(data.truth_pairs["conv_id_b"])
    clus = result.clusters
    sizes = clus.groupby("cluster_id").size()
    multi = set(sizes[sizes > 1].index)
    for cid, lab in zip(clus["conv_id"], clus["cluster_id"]):
        if lab in multi:
            assert cid in dup_ids, f"{cid} falsely clustered"


def test_oracle_substring_detection(data, result):
    want = {(a, b) for a, b, f in zip(data.truth_pairs["conv_id_a"],
                                      data.truth_pairs["conv_id_b"],
                                      data.truth_pairs["family"]) if f == "substring"}
    got = set(zip(result.substring_pairs["conv_id_a"], result.substring_pairs["conv_id_b"]))
    assert want, "datagen planted no substring pairs"
    found = len(want & got) / len(want)
    assert found >= 0.9, f"substring detection rate {found}; missed {want - got}"


def test_tiny_docs_no_shingles(result):
    tiny = result.signatures[result.signatures["n_tokens"] < 5]
    assert len(tiny) > 0
    assert all(len(s) == 0 for s in tiny["shingles"])
