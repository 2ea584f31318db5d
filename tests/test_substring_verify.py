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


def test_hot_window_bucket_salted_and_logged(spark):
    """A viral boilerplate span shared by many conversations creates a
    window bucket far above bucket_cap. The shared salted bucket path must
    (a) bound the reducer input (drops happen, logged in stats), and
    (b) stay exactly equal to the pandas oracle, which implements the same
    pmod(id_hash, ceil(m/cap)) == 0 salt + sorted cap."""
    from pcompress_spark import oracle
    from pcompress_spark.operators.substring import substring_candidates

    cfg = DedupConfig(bucket_cap=8, hot_bucket_threshold=4)
    rng = np.random.default_rng(11)
    boiler = " ".join(f"tok{w}" for w in rng.integers(0, 50_000, size=600))
    rows = []
    for i in range(40):
        tail = " ".join(f"uniq{i}w{j}" for j in range(30))
        rows.append((f"hot{i:03d}", 0, "user", boiler, "", None))
        rows.append((f"hot{i:03d}", 1, "assistant", tail, "", None))
    tr = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df = spark.createDataFrame(tr[["conv_id", "turn_idx", "role", "text", "tool"]])

    sig = compute_signatures(assemble(df, parallelism=4), cfg).cache()
    cand, stats = substring_candidates(sig, cfg, persist_sizes=True)
    st = stats.collect()[0].asDict()
    # fixture really is hot, and drops are logged — no silent caps
    assert st["max_bucket_size"] > cfg.bucket_cap, st
    assert st["hot_member_rows"] > 0, st
    # bounded reducer: pairs only among salt-kept, capped members — so the
    # distinct ids appearing in ANY pair is <= bucket_cap here (one bucket
    # family), far below the 40 raw members
    cand_pd = cand.toPandas()
    ids = set(cand_pd["ih_a"]) | set(cand_pd["ih_b"])
    assert 2 <= len(ids) <= cfg.bucket_cap, len(ids)

    # exact parity with the salted pandas oracle
    no_verified = spark.createDataFrame([], "conv_id_a string, conv_id_b string")
    eng = substring_pairs(sig, no_verified, cfg).toPandas()
    orc = oracle.substring_pairs(oracle.signatures(oracle.assemble(tr), cfg), cfg)
    eng_set = set(zip(eng["conv_id_a"], eng["conv_id_b"], eng["n_windows"]))
    orc_set = set(zip(orc["conv_id_a"], orc["conv_id_b"], orc["n_windows"]))
    assert eng_set == orc_set
    sig.unpersist()


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
    stats: dict = {}
    out = connected_components(nodes, edges, CFG, stats=stats).toPandas()
    lab = dict(zip(out["conv_id"], out["cluster_id"]))
    assert stats["path"] == "local_union_find"  # small edge set -> fast path
    assert all(lab[f"n{i:03d}"] == "n000" for i in range(121))
    assert all(lab[f"c{i}"] == "c0" for i in range(6))
    assert lab["z1"] == lab["z2"] == "z1"

    # the distributed star loop (forced via cc_local_edges=0) must produce
    # the bit-identical assignment — the two paths are one logical operator
    import dataclasses

    dist_cfg = dataclasses.replace(CFG, cc_local_edges=0)
    dstats: dict = {}
    dout = connected_components(nodes, edges, dist_cfg, stats=dstats).toPandas()
    assert dstats["path"] == "distributed_star"
    dlab = dict(zip(dout["conv_id"], dout["cluster_id"]))
    assert dlab == lab


def test_lcs_suffix_array_parity_with_rolling():
    """The reference-literal suffix-array scheme (bsdiff qsufsort analog)
    must agree with the rolling-hash scheme on structured inputs: planted
    runs, containment, self, empties, disjoint, and repetitive (small
    alphabet, long equal runs) sequences."""
    rng = np.random.default_rng(11)
    run = rng.integers(1, 2**63, size=137).astype(np.uint64)
    a = np.concatenate([rng.integers(1, 2**63, size=40).astype(np.uint64),
                        run,
                        rng.integers(1, 2**63, size=11).astype(np.uint64)])
    b = np.concatenate([run,
                        rng.integers(1, 2**63, size=7).astype(np.uint64)])
    cases = [
        (a, b), (a, a), (b, a),
        (a, np.empty(0, dtype=np.uint64)),
        (np.empty(0, dtype=np.uint64), b),
        (rng.integers(1, 2**63, size=50).astype(np.uint64),
         rng.integers(1, 2**63, size=60).astype(np.uint64)),
        # b fully contained in a (the LCP walk exhausts a B-suffix)
        (np.concatenate([a, b, a]), b),
        # small alphabet, highly repetitive — many equal adjacent suffixes
        (rng.integers(0, 3, size=200).astype(np.uint64),
         rng.integers(0, 3, size=180).astype(np.uint64)),
        # all-identical tokens
        (np.zeros(64, dtype=np.uint64), np.zeros(31, dtype=np.uint64)),
    ]
    for ta, tb in cases:
        assert K.lcs_suffix_array(ta, tb) == K.longest_common_run(ta, tb)
    assert K.lcs_suffix_array(np.zeros(64, dtype=np.uint64),
                              np.zeros(31, dtype=np.uint64)) == 31


def test_verify_substring_pairs_scheme_parity(spark, smoke_transcripts):
    """The pipeline verify stage yields bit-identical rows under both
    substring_verify schemes (the oracle pins the rolling scheme; this
    pins suffix_array to it end-to-end through the Arrow UDF)."""
    asm = assemble(smoke_transcripts, parallelism=8).cache()
    sig = compute_signatures(asm, CFG)
    no_verified = spark.createDataFrame([], "conv_id_a string, conv_id_b string")
    cand = substring_pairs(sig, no_verified, CFG).cache()
    sa_cfg = DedupConfig(substring_verify="suffix_array")
    roll = (verify_substring_pairs(cand, asm, CFG).toPandas()
            .sort_values(["conv_id_a", "conv_id_b"]).reset_index(drop=True))
    sa = (verify_substring_pairs(cand, asm, sa_cfg).toPandas()
          .sort_values(["conv_id_a", "conv_id_b"]).reset_index(drop=True))
    assert len(roll) > 0
    assert roll.equals(sa)
