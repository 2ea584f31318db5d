"""Substring LCS verification (bsdiff long-match analog) + CC stress."""

import numpy as np
import pandas as pd
import pytest

from pcompress_spark.config import DedupConfig
from pcompress_spark import kernels as K
from pcompress_spark.operators.assemble import assemble
from pcompress_spark.operators.cluster import connected_components
from pcompress_spark.operators.signatures import compute_signatures
from pcompress_spark.operators.substring import substring_pairs, verify_substring_pairs

CFG = DedupConfig()


def test_longest_common_run_exact():
    rng = np.random.default_rng(5)
    run = rng.integers(1, 2**63, size=137).astype(np.uint64)
    a = np.concatenate([rng.integers(1, 2**63, size=40).astype(np.uint64), run,
                        rng.integers(1, 2**63, size=11).astype(np.uint64)])
    b = np.concatenate([run, rng.integers(1, 2**63, size=7).astype(np.uint64)])
    assert K.longest_common_run(a, b) == 137
    assert K.longest_common_run(a, a) == len(a)
    assert K.longest_common_run(a, np.empty(0, dtype=np.uint64)) == 0
    # disjoint sequences share no run
    c = rng.integers(1, 2**63, size=50).astype(np.uint64)
    d = rng.integers(1, 2**63, size=60).astype(np.uint64)
    assert K.longest_common_run(c, d) == 0


def test_verify_substring_pairs_engine(spark, smoke_transcripts, smoke_data):
    asm = assemble(smoke_transcripts, parallelism=8).cache()
    sig = compute_signatures(asm, CFG)
    no_verified = spark.createDataFrame([], "conv_id_a string, conv_id_b string")
    cand = substring_pairs(sig, no_verified, CFG)
    ver = verify_substring_pairs(cand, asm, CFG).toPandas()
    assert (ver["lcs_tokens"] > 0).all()
    # planted substring family pairs must show a long run (>= 150 tokens)
    truth_sub = smoke_data.truth_pairs.query("family == 'substring'")
    got = {(r.conv_id_a, r.conv_id_b): r.lcs_tokens for r in ver.itertuples()}
    found = [got.get((a, b), 0) for a, b in
             zip(truth_sub["conv_id_a"], truth_sub["conv_id_b"])]
    assert sum(1 for x in found if x >= 80) >= 0.9 * len(found), found
    # engine LCS equals the shared-kernel computation on the oracle side
    from pcompress_spark import oracle
    asm_pd = oracle.assemble(smoke_data.transcripts).set_index("conv_id")
    for (a, b), lcs in list(got.items())[:20]:
        ta = K.tokens_to_hashes(asm_pd.at[a, "doc_text"])
        tb = K.tokens_to_hashes(asm_pd.at[b, "doc_text"])
        assert K.longest_common_run(ta, tb) == lcs, (a, b)


def test_connected_components_long_chain(spark):
    """Chain of 120 nodes + two cliques -> star iteration must converge to
    single components (union-find ground truth)."""
    from pyspark.sql import functions as F

    chain = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(120)]
    clique = [(f"c{i}", f"c{j}") for i in range(6) for j in range(i + 1, 6)]
    iso = [("z1", "z2")]
    edges = spark.createDataFrame(chain + clique + iso, ["conv_id_a", "conv_id_b"])
    edges = edges.withColumn("ih_a", F.xxhash64("conv_id_a")).withColumn(
        "ih_b", F.xxhash64("conv_id_b"))
    nodes = edges.selectExpr("conv_id_a as conv_id").union(
        edges.selectExpr("conv_id_b as conv_id")).distinct().withColumn(
        "id_hash", F.xxhash64("conv_id"))
    out = connected_components(nodes, edges, CFG).toPandas()
    lab = dict(zip(out["conv_id"], out["cluster_id"]))
    assert all(lab[f"n{i:03d}"] == "n000" for i in range(121))
    assert all(lab[f"c{i}"] == "c0" for i in range(6))
    assert lab["z1"] == lab["z2"] == "z1"
