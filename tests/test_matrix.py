"""Config-matrix tests (analog of the reference's dedup/delta option matrix,
/root/reference/test/t4.tst:13-15): a small grid of signature configs at
smoke scale, each cell asserting recall vs planted truth and zero false
merges among distinct controls. Oracle-only (pure Python) — the engine is
pinned to the oracle pair-for-pair by test_engine_parity, so grid coverage
here covers the engine too."""

import pytest

from pcompress_spark.config import DedupConfig
from pcompress_spark import datagen, oracle

GRID = [
    DedupConfig(shingle_k=3, num_perm=64, bands=16, rows=4),
    DedupConfig(shingle_k=5, num_perm=64, bands=32, rows=2),
    DedupConfig(shingle_k=5, num_perm=128, bands=32, rows=4),          # judged default
    DedupConfig(shingle_k=5, num_perm=128, bands=32, rows=4, minhash_scheme="perm"),
    DedupConfig(shingle_k=5, num_perm=128, bands=16, rows=8, substring_enabled=False),
]


@pytest.fixture(scope="module")
def data():
    return datagen.generate(seed=11, n_conv=150, dup_frac=0.3)


@pytest.mark.parametrize("cfg", GRID, ids=lambda c: f"k{c.shingle_k}-p{c.num_perm}-b{c.bands}-{c.minhash_scheme}")
def test_grid_recall_and_precision(data, cfg):
    res = oracle.run(data.transcripts, cfg)
    pairs = oracle.cluster_pairs(res.clusters)
    rec = oracle.pair_recall(pairs, data.truth_pairs, ("exact", "near_high"))
    assert rec >= 0.99, f"recall {rec} at {cfg}"
    # no false merges: clustered ids must all belong to dup families
    dup_ids = set(data.truth_pairs["conv_id_a"]) | set(data.truth_pairs["conv_id_b"])
    for a, b in pairs:
        assert a in dup_ids and b in dup_ids, (a, b, cfg)


def test_config_hash_distinguishes_grid():
    hashes = {c.config_hash() for c in GRID}
    assert len(hashes) == len(GRID)
