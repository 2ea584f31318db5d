"""Execution-parameter planner: derived knobs, pass-splitting equivalence,
and oracle-green auto-planned pipeline runs at two scales."""

import json

import pytest
from pyspark.sql import functions as F

from pcompress_spark import datagen, oracle
from pcompress_spark.config import DedupConfig
from pcompress_spark.operators.assemble import assemble
from pcompress_spark.operators.candidates import candidate_pairs
from pcompress_spark.operators.signatures import compute_signatures
from pcompress_spark.pipeline import DedupPipeline
from pcompress_spark.planner import band_ranges, derive_exec_plan

CFG = DedupConfig()


def test_band_ranges_tile_exactly():
    for bands, passes in [(32, 1), (32, 3), (32, 32), (32, 64), (7, 3)]:
        rs = band_ranges(bands, passes)
        assert rs[0][0] == 0 and rs[-1][1] == bands
        for (_, hi), (lo, _) in zip(rs, rs[1:]):
            assert hi == lo
        assert all(hi > lo for lo, hi in rs)


def test_band_pass_splitting_is_semantics_preserving(spark, smoke_transcripts):
    """Union of per-pass candidate aggregates (summing n_bands) must equal
    the single-pass result exactly — the invariant the planner's
    simple->segmented switch rests on."""
    sig = compute_signatures(assemble(smoke_transcripts, parallelism=8), CFG).cache()
    full, _ = candidate_pairs(sig, CFG)
    parts = [candidate_pairs(sig, CFG, band_range=r)[0]
             for r in band_ranges(CFG.bands, 3)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    merged = merged.groupBy("ih_a", "ih_b").agg(
        F.sum("n_bands").cast("int").alias("n_bands"))
    a = {(r.ih_a, r.ih_b): r.n_bands for r in full.collect()}
    b = {(r.ih_a, r.ih_b): r.n_bands for r in merged.collect()}
    assert a == b
    sig.unpersist()


def test_derive_exec_plan_scales_with_input(spark, tmp_path):
    """Two corpora of different scales must pick different (logged)
    parameters; file-backed input also derives byte-based knobs."""
    small = spark.createDataFrame(
        datagen.generate(seed=5, n_conv=100, dup_frac=0.2).transcripts)
    p_small = derive_exec_plan(spark, small, bands=CFG.bands)
    assert p_small.bucket_cap == 1024          # tiny corpus: generous cap
    assert p_small.input_bytes is None         # not file-backed

    big_pd = datagen.generate(seed=6, n_conv=3000, dup_frac=0.2).transcripts
    path = str(tmp_path / "big.parquet")
    spark.createDataFrame(big_pd).write.parquet(path)
    big = spark.read.parquet(path)
    p_big = derive_exec_plan(spark, big, bands=CFG.bands)
    assert p_big.bucket_cap == 256             # past the small-corpus knee
    assert p_big.input_bytes and p_big.input_bytes > 0
    assert p_big.avg_doc_bytes and p_big.avg_doc_bytes > 0
    assert p_big.input_rows > p_small.input_rows
    # in-flight budget: tiny budget forces multi-pass banding, capped at bands
    p_split = derive_exec_plan(spark, big, bands=CFG.bands,
                               inflight_budget_bytes=1 << 20)
    assert 1 < p_split.band_passes <= CFG.bands


def test_auto_planned_pipeline_oracle_green_at_two_scales(spark, tmp_path):
    """The reference auto-switches its index mode from (size, memlimit)
    (/root/reference/rabin/global/index.c:119-215); our analog must pick
    different parameters at two scales AND stay exactly oracle-green at
    both under the DERIVED config (manual config still overrides by just
    not passing auto_plan)."""
    saved = {k: spark.conf.get(k) for k in
             ("spark.sql.shuffle.partitions",
              "spark.sql.execution.arrow.maxRecordsPerBatch")}
    # planning units are CONVERSATIONS; lower the cap knee so the two test
    # scales (120 vs 2800 convs) straddle it without a 50k-conv fixture
    from pcompress_spark import planner as planner_mod
    saved_knees = planner_mod.BUCKET_CAP_KNEES
    planner_mod.BUCKET_CAP_KNEES = (1_000, 50_000_000)
    caps = {}
    for name, n_conv in (("small", 120), ("big", 2800)):
        data = datagen.generate(seed=11, n_conv=n_conv, dup_frac=0.3)
        tdf = spark.createDataFrame(data.transcripts)
        wd = str(tmp_path / f"wd_{name}")
        pipe = DedupPipeline(spark, DedupConfig(), work_dir=wd, auto_plan=True)
        res = pipe.run(tdf)
        caps[name] = pipe.cfg.bucket_cap
        with open(wd + "/metrics.json") as f:
            logged = json.load(f)["exec_plan"]
        assert logged["bucket_cap"] == pipe.cfg.bucket_cap
        # planning units = conversations (approx-count-distinct, ~2% error),
        # NOT turn rows — turn-count units would blow the Arrow budget by
        # the turns-per-conversation factor
        n_convs = data.transcripts["conv_id"].nunique()
        assert abs(logged["input_rows"] - n_convs) <= max(2, n_convs // 20)
        # oracle parity under the derived config
        orc = oracle.run(data.transcripts, cfg=pipe.cfg)
        eng = res.tables["pairs"].toPandas()
        eng_set = set(zip(eng["conv_id_a"], eng["conv_id_b"], eng["match_kind"]))
        orc_set = set(zip(orc.pairs["conv_id_a"], orc.pairs["conv_id_b"],
                          orc.pairs["match_kind"]))
        assert eng_set == orc_set, name
    assert caps["small"] != caps["big"], caps
    planner_mod.BUCKET_CAP_KNEES = saved_knees
    for k, v in saved.items():
        spark.conf.set(k, v)
