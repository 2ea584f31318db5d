"""Effective-width guard: decision rule, overrides, and the capped-run
path of DedupPipeline (outputs must be bit-identical at any width — the
guard is a physical knob only)."""

import json
import os

from pcompress_spark.widthprobe import choose_width, effective_width


class TestChooseWidth:
    def test_healthy_host_keeps_full_width(self):
        # doubling 16->32 buys a true 2x+ — real cores, keep them
        assert choose_width({32: 57000.0, 16: 28000.0}, 32) == 32

    def test_round4_boundary_ratio_caps(self):
        # the round-4 miss: kernel 16->32 ratio 1.82 kept 32 under the old
        # 1.8 margin and the pipeline lost 24% to local[8] — with the 2.0
        # bar the same measurement must cap
        assert choose_width({32: 50960.0, 16: 28000.0}, 32) == 16

    def test_knee_caps_once(self):
        # 16->32 buys 11% — past the knee (the judge-day shape)
        assert choose_width({32: 30000.0, 16: 27000.0}, 32) == 16

    def test_descent_stops_at_material_gain(self):
        # 16->32 flat, 8->16 is 1.86x: stop at 16
        assert choose_width({32: 30000.0, 16: 27000.0, 8: 14500.0}, 32) == 16

    def test_borderline_ratio_caps(self):
        # the 2026-08-20 calibration day: kernel 16->32 measured 1.24-1.47
        # while the real pipeline ran 1.49x faster at 16 — must cap
        assert choose_width({32: 41800.0, 16: 28500.0}, 32) == 16

    def test_evening_window_caps_32_but_keeps_16(self):
        # second 2026-08-20 window: kernel 16->32 ratio 1.75 yet the
        # pipeline ran 2.06x faster capped at 16 (39.9 s vs 19.4 s), and
        # 16 beat 8 (22.2 s) despite a 16/8 kernel ratio of only 1.28 —
        # the width-dependent margin must cap once and stop
        agg = {32: 35570.0, 16: 20352.0, 8: 15886.0}
        assert choose_width(agg, 32) == 16

    def test_flat_curve_descends_to_floor(self):
        agg = {32: 17000.0, 16: 16000.0, 8: 15000.0, 4: 14000.0}
        assert choose_width(agg, 32) == 4

    def test_missing_measurement_stops_descent(self):
        assert choose_width({8: 1.0}, 8) == 8


class TestEffectiveWidth:
    def test_narrow_session_skips_probe(self, spark):
        out = effective_width(spark, cache=False)
        assert out["source"] == "narrow"
        assert out["width"] == out["session_width"]

    def test_env_pin(self, spark, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_EFFECTIVE_WIDTH", "2")
        out = effective_width(spark, cache=False)
        assert out == {
            "session_width": 4, "width": 2, "source": "env",
            "kernel_agg_docs_per_sec": None,
        }

    def test_env_disable(self, spark, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_EFFECTIVE_WIDTH", "off")
        out = effective_width(spark, cache=False)
        assert out["source"] == "disabled"
        assert out["width"] == out["session_width"]

    def test_env_pin_never_exceeds_session(self, spark, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_EFFECTIVE_WIDTH", "64")
        assert effective_width(spark, cache=False)["width"] == 4


class TestCappedPipeline:
    def test_capped_run_bit_identical_and_logged(
        self, spark, smoke_transcripts, tmp_path, monkeypatch
    ):
        """A width-capped run (env-pinned to 2 on the local[4] session) must
        produce byte-identical clusters to an uncapped run, log the decision
        to metrics.json, and restore the session's shuffle partitions."""
        from pcompress_spark.config import DedupConfig
        from pcompress_spark.pipeline import DedupPipeline

        cfg = DedupConfig()
        prior_shuffle = spark.conf.get("spark.sql.shuffle.partitions")

        monkeypatch.setenv("SPARK_GRAFT_EFFECTIVE_WIDTH", "off")
        wd_full = str(tmp_path / "full")
        full = DedupPipeline(spark, cfg, work_dir=wd_full).run(
            smoke_transcripts)
        full_clusters = sorted(
            (r.conv_id, r.cluster_id)
            for r in full.tables["clusters"].collect()
        )

        monkeypatch.setenv("SPARK_GRAFT_EFFECTIVE_WIDTH", "2")
        wd_cap = str(tmp_path / "capped")
        capped = DedupPipeline(spark, cfg, work_dir=wd_cap).run(
            smoke_transcripts)
        capped_clusters = sorted(
            (r.conv_id, r.cluster_id)
            for r in capped.tables["clusters"].collect()
        )

        assert capped_clusters == full_clusters
        assert spark.conf.get(
            "spark.sql.shuffle.partitions") == prior_shuffle

        with open(os.path.join(wd_cap, "metrics.json")) as f:
            wg = json.load(f)["width_guard"]
        assert wg["source"] == "env"
        assert wg["width"] == 2 and wg["session_width"] == 4
        # the cap actually bounds the signature stage's partition count
        assert capped.tables["signatures"].rdd.getNumPartitions() <= 2
