"""Pipeline orchestration: checkpoints, resume idempotency, metrics, lineage."""

import json
import os
import shutil

import pytest

from pcompress_spark.config import DedupConfig
from pcompress_spark.pipeline import DedupPipeline

CFG = DedupConfig()


def _clusters_dict(res):
    pdf = res.tables["clusters"].toPandas()
    return dict(zip(pdf["conv_id"], pdf["cluster_id"]))


def test_pipeline_end_to_end(spark, smoke_transcripts, tmp_path):
    wd = str(tmp_path / "run1")
    os.makedirs(wd)
    res = DedupPipeline(spark, CFG, work_dir=wd).run(smoke_transcripts)
    assert set(res.tables) == {"signatures", "candidates", "pairs", "clusters", "substring_pairs"}
    assert all(not s.resumed for s in res.stages)
    # stage outputs + manifests + metrics + lineage on disk
    for st in ("signatures", "candidates", "pairs", "clusters", "substring_pairs"):
        assert os.path.exists(os.path.join(wd, st, "_SUCCESS")), st
        assert os.path.exists(os.path.join(wd, f"{st}.manifest.json")), st
    with open(os.path.join(wd, "metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["config_hash"] == CFG.config_hash()
    assert {s["stage"] for s in metrics["stages"]} >= {"signatures", "clusters"}
    assert "n_buckets" in metrics["lsh_buckets"]
    lineage = spark.read.parquet(os.path.join(wd, "lineage")).toPandas()
    assert set(lineage["stage"]) == {"signatures", "clusters"}
    assert lineage["rows"].sum() > 0

    # full resume: every stage skipped, identical clusters
    res2 = DedupPipeline(spark, CFG, work_dir=wd).run(smoke_transcripts)
    assert all(s.resumed for s in res2.stages), res2.metrics_rows()
    assert _clusters_dict(res) == _clusters_dict(res2)


def test_pipeline_tiers_stage(spark, smoke_transcripts, tmp_path):
    """with_tiers=True materializes the per-conversation tier table; one
    row per conversation, per-tier counts logged to metrics.json, and the
    attribution is consistent with the clusters table (every cluster
    non-representative is exact- or near-attributed; every substring row
    is a representative)."""
    wd = str(tmp_path / "run_tiers")
    os.makedirs(wd)
    res = DedupPipeline(spark, CFG, work_dir=wd).run(
        smoke_transcripts, with_tiers=True
    )
    assert "tiers" in res.tables
    tiers = res.tables["tiers"].toPandas()
    clusters = res.tables["clusters"].toPandas()
    assert len(tiers) == len(clusters)  # one row per conversation
    with open(os.path.join(wd, "metrics.json")) as f:
        metrics = json.load(f)
    assert sum(metrics["tiers"].values()) == len(tiers)
    assert set(metrics["tiers"]) <= {"exact", "near", "substring", "kept"}
    lab = dict(zip(clusters["conv_id"], clusters["cluster_id"]))
    by_tier = dict(zip(tiers["conv_id"], tiers["tier"]))
    for conv, cid in lab.items():
        if conv != cid:
            assert by_tier[conv] in ("exact", "near"), conv
        else:
            assert by_tier[conv] in ("substring", "kept"), conv
    # kept/substring reps reference themselves / another representative
    rb = dict(zip(tiers["conv_id"], tiers["removed_by"]))
    for conv, t in by_tier.items():
        if t == "kept":
            assert rb[conv] == conv
        elif t == "substring":
            assert lab[rb[conv]] == rb[conv]  # winner is itself a rep


def test_pipeline_partial_resume(spark, smoke_transcripts, tmp_path):
    """Kill-between-stages: later stage outputs missing -> recomputed; earlier
    kept; final output identical to an uninterrupted run."""
    wd = str(tmp_path / "run2")
    os.makedirs(wd)
    full = DedupPipeline(spark, CFG, work_dir=wd).run(smoke_transcripts)
    want = _clusters_dict(full)
    # simulate crash after signatures: drop everything downstream
    for st in ("candidates", "pairs", "clusters", "substring_pairs"):
        shutil.rmtree(os.path.join(wd, st))
        os.remove(os.path.join(wd, f"{st}.manifest.json"))
    res = DedupPipeline(spark, CFG, work_dir=wd).run(smoke_transcripts)
    flags = {s.name: s.resumed for s in res.stages}
    assert flags["signatures"] is True
    assert flags["clusters"] is False
    assert _clusters_dict(res) == want


def test_pipeline_partial_write_not_resumed(spark, smoke_transcripts, tmp_path):
    """A stage dir without _SUCCESS (crash mid-write) must be recomputed."""
    wd = str(tmp_path / "run2b")
    os.makedirs(wd)
    full = DedupPipeline(spark, CFG, work_dir=wd).run(smoke_transcripts)
    want = _clusters_dict(full)
    os.remove(os.path.join(wd, "pairs", "_SUCCESS"))  # simulate torn write
    res = DedupPipeline(spark, CFG, work_dir=wd).run(smoke_transcripts)
    flags = {s.name: s.resumed for s in res.stages}
    assert flags["pairs"] is False
    assert flags["signatures"] is True
    assert _clusters_dict(res) == want


def test_pipeline_config_change_invalidates(spark, smoke_transcripts, tmp_path):
    wd = str(tmp_path / "run3")
    os.makedirs(wd)
    DedupPipeline(spark, CFG, work_dir=wd).run(smoke_transcripts)
    other = DedupConfig(shingle_k=3)
    res = DedupPipeline(spark, other, work_dir=wd).run(smoke_transcripts)
    assert all(not s.resumed for s in res.stages)


def test_pipeline_no_workdir(spark, smoke_transcripts):
    res = DedupPipeline(spark, CFG, work_dir=None).run(smoke_transcripts, with_substring=False)
    assert res.tables["clusters"].count() > 0


def test_nonfile_fingerprint_cached_across_runs(
    spark, smoke_transcripts, tmp_path, monkeypatch
):
    """The non-file-input fingerprint count runs ONCE: a second run over
    the same in-memory input resumes from the cached (plan-hash-keyed)
    fingerprint with zero count jobs — and a DIFFERENT input still
    invalidates the cache (fresh plan hash -> fresh count)."""
    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    from pcompress_spark.config import DedupConfig
    from pcompress_spark.pipeline import DedupPipeline

    wd = str(tmp_path / "wd")
    cfg = DedupConfig()
    r1 = DedupPipeline(spark, cfg, work_dir=wd).run(smoke_transcripts)
    assert os.path.exists(os.path.join(wd, "input_fingerprint.json"))
    clusters1 = sorted(
        (r.conv_id, r.cluster_id) for r in r1.tables["clusters"].collect())

    # second run: every stage must resume AND no DataFrame.count may run
    def _no_count(self_df):
        raise AssertionError("count job ran during a fully-resumed run")

    monkeypatch.setattr(_DF, "count", _no_count)
    r2 = DedupPipeline(spark, cfg, work_dir=wd).run(smoke_transcripts)
    monkeypatch.undo()
    assert all(s.resumed for s in r2.stages), [
        (s.name, s.resumed) for s in r2.stages]
    clusters2 = sorted(
        (r.conv_id, r.cluster_id) for r in r2.tables["clusters"].collect())
    assert clusters2 == clusters1

    # different in-memory input -> different plan hash -> stages rebuild
    # (the cache must not blind resume to an input change)
    smaller = smoke_transcripts.where(
        F.xxhash64("conv_id") % 2 == 0)
    r3 = DedupPipeline(spark, cfg, work_dir=wd).run(smaller)
    assert not any(s.resumed for s in r3.stages)
