"""Pipeline orchestration: checkpointed stages + lineage + metrics + resume.

Reference analogs:
  - per-chunk headers & checksums verified on every read
    (/root/reference/pcompress.c:799-833, 776-790) -> per-stage manifest
    (config hash + row count) and per-partition lineage checksums;
  - the metadata stream kept separate from data
    (/root/reference/meta_stream.c) -> metrics/lineage parquet tables
    written alongside stage outputs;
  - deterministic restart semantics (the writer thread's strict ordering,
    /root/reference/pcompress.c:2093-2146) -> idempotent stage resume: a
    stage is skipped iff its output dir carries a manifest whose config
    hash matches the current run. Because every stage is a deterministic
    function of (input table, config), a resumed run produces the
    bit-identical output of an uninterrupted one.

Stage graph (each node one parquet table under work_dir):
  transcripts -> signatures -> candidates -> pairs -> clusters
                      \\----------------------> substring_pairs

Scale notes: checkpointing signatures/candidates/pairs to parquet is the
explicit "segcache" (reference spills segment metadata to a tempfile and
mmaps it back, /root/reference/rabin/global/index.c:280-440). At the
10^12-turn design point these intermediates are orders of magnitude smaller
than the input and make every downstream stage restartable without
re-reading the raw table. On a real cluster, point work_dir at object
storage / an Iceberg warehouse; outputs are plain columnar tables.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig
from .operators.assemble import assemble
from .operators.candidates import candidate_pairs
from .operators.cluster import connected_components
from .operators.signatures import compute_signatures
from .operators.substring import substring_pairs
from .operators.verify import verify_pairs


# Bumped whenever a stage's output schema/semantics change: a resume only
# reuses checkpoints written by the same format (e.g. format 2 switched the
# candidates/pairs tables to 64-bit id_hash keys; format 3 added the
# precomputed band_hashes column to the signatures table).
PIPELINE_FORMAT = 3


@dataclass
class StageResult:
    name: str
    rows: int
    seconds: float
    resumed: bool
    construct_seconds: float = 0.0


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame]
    stages: list[StageResult] = field(default_factory=list)

    def metrics_rows(self) -> list[dict]:
        return [
            {"stage": s.name, "rows": s.rows, "seconds": round(s.seconds, 3),
             "construct_seconds": round(s.construct_seconds, 3),
             "resumed": s.resumed}
            for s in self.stages
        ]


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig | None = None,
        work_dir: str | None = None,
        auto_plan: bool = False,
    ) -> None:
        """auto_plan: derive shuffle_partitions / arrow_batch_rows /
        bucket_cap / banding pass count from input stats at run() time
        (planner.derive_exec_plan — the reference's memory-budgeted index
        auto-configuration, /root/reference/rabin/global/index.c:119-215)
        and log the decision to metrics.json. Off by default: an explicit
        cfg always means exactly what it says."""
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.work_dir = work_dir
        self.auto_plan = auto_plan
        self.exec_plan = None
        self._stages: list[StageResult] = []
        self._input_fp: str | None = None

    # ---- checkpoint bookkeeping -------------------------------------
    def _stage_dir(self, name: str) -> str | None:
        return os.path.join(self.work_dir, name) if self.work_dir else None

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.work_dir, f"{name}.manifest.json")

    def _can_resume(self, name: str) -> bool:
        if not self.work_dir:
            return False
        mp = self._manifest_path(name)
        sd = self._stage_dir(name)
        if not (os.path.exists(mp) and os.path.exists(os.path.join(sd, "_SUCCESS"))):
            return False
        try:
            with open(mp) as f:
                manifest = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return (
            manifest.get("config_hash") == self.cfg.config_hash()
            and manifest.get("format") == PIPELINE_FORMAT
            and manifest.get("input") == self._input_fp
        )

    def _checkpoint(self, name: str, df: DataFrame) -> tuple[DataFrame, int, bool]:
        """Write stage output (if work_dir set), record lineage, return the
        (re-read) DataFrame + row count + resumed flag.

        Row counts ride on the write action via ``Observation`` (zero extra
        jobs); resumed stages read the count from the manifest (zero jobs).
        Keeping the per-stage serial overhead near zero is what makes the
        N->4N scaling efficiency hold: every constant-cost driver round-trip
        is pure Amdahl serial fraction."""
        sd = self._stage_dir(name)
        if sd is None:
            df = df.localCheckpoint()  # cut lineage, keep in memory
            return df, df.count(), False
        # the re-read passes the just-written plan's schema explicitly:
        # skipping footer inference removes one driver round-trip per stage
        # (fixed serial cost — Amdahl fraction at N->4N). Resume is handled
        # before construction in _run_stage; this path always writes.
        from pyspark.sql import Observation

        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(sd)
        rows = int(obs.get["rows"])
        with open(self._manifest_path(name), "w") as f:
            json.dump(
                {"stage": name, "config_hash": self.cfg.config_hash(),
                 "rows": rows, "format": PIPELINE_FORMAT, "input": self._input_fp},
                f,
            )
        return self.spark.read.schema(df.schema).parquet(sd), rows, False

    def _run_stage(self, name: str, build) -> DataFrame:
        """build: () -> DataFrame. Construction is timed separately because
        some operators run driver-synchronized jobs at build time (the CC
        local-path probe, convergence checksums/localCheckpoints) — a fixed,
        core-count-independent cost that is pure Amdahl serial fraction at
        N->4N. Keeping it visible per stage is what lets the scaling probe
        attribute the wall-vs-stage-sum gap instead of guessing.

        Resume is checked BEFORE construction: a resumed stage must not pay
        the operator's build-time driver jobs for output it is about to
        discard — "skips completed stages" means skips their work, not just
        their write."""
        t0 = time.monotonic()
        if self._can_resume(name):
            with open(self._manifest_path(name)) as f:
                rows = json.load(f).get("rows", -1)
            out = self.spark.read.parquet(self._stage_dir(name))
            self._stages.append(
                StageResult(name, rows, time.monotonic() - t0, True))
            return out
        df = build() if callable(build) else build
        t1 = time.monotonic()
        out, rows, resumed = self._checkpoint(name, df)
        self._stages.append(
            StageResult(name, rows, time.monotonic() - t0, resumed,
                        construct_seconds=t1 - t0))
        return out

    # ---- lineage ------------------------------------------------------
    def lineage(self, name: str, df: DataFrame, key_cols: list[str]) -> DataFrame:
        """Per-partition row counts + order-insensitive checksums — the
        resume idempotency guard (whole-chunk checksum analog,
        /root/reference/pcompress.c:1840-1842)."""
        return (
            df.withColumn("part_id", F.spark_partition_id())
            .groupBy("part_id")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.xxhash64(*key_cols).cast("decimal(38,0)")).alias("checksum"),
            )
            .withColumn("stage", F.lit(name))
        )

    # ---- the pipeline ---------------------------------------------------
    def _input_fingerprint(self, df: DataFrame) -> str:
        """Cheap input-identity key for resume safety: hash of the input
        file listing when the DataFrame reads files (no Spark job). The
        fallback for non-file-backed input is a row count — and that count
        is CACHED in the work_dir keyed by the input plan's semantic hash
        (``df.semanticHash()``, a driver-side canonicalized-plan hash, no
        job): a re-run/resume over the same logical input reuses the
        recorded count instead of re-scanning. A DIFFERENT in-memory input
        produces a different plan hash (local relations hash their data),
        so the count re-runs and a count change still invalidates resume.
        The one blind spot is mutable storage read through an identical
        plan — but such input is file/table-backed, which takes the
        listing-hash path above, never this one. Re-running the same
        work_dir against DIFFERENT input must not silently reuse stale
        stage outputs — a resumed run is only 'bit-identical to an
        uninterrupted one' if (input, config) both match."""
        import hashlib

        try:
            files = sorted(df.inputFiles())
        except Exception:
            files = []
        if files:
            return "files:" + hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]
        try:
            plan_hash = int(df.semanticHash())
        except Exception:
            return f"rows:{df.count()}"   # no plan hash -> no safe cache key
        cache_path = (os.path.join(self.work_dir, "input_fingerprint.json")
                      if self.work_dir else None)
        if cache_path and os.path.exists(cache_path):
            try:
                with open(cache_path) as f:
                    rec = json.load(f)
                if rec.get("plan_hash") == plan_hash:
                    return rec["fingerprint"]
            except (OSError, json.JSONDecodeError, KeyError):
                pass
        fp = f"rows:{df.count()}"
        if cache_path:
            os.makedirs(self.work_dir, exist_ok=True)
            with open(cache_path, "w") as f:
                json.dump({"plan_hash": plan_hash, "fingerprint": fp}, f)
        return fp

    def run(
        self,
        transcripts: DataFrame,
        with_substring: bool | None = None,
        with_tiers: bool = False,
    ) -> PipelineResult:
        """with_tiers: also materialize the ``tiers`` table (per
        conversation: exact / near / substring / kept + removed_by —
        operators/tiers.tier_attribution) and log per-tier counts to
        metrics.json. Off by default: it pays the substring LCS verify over
        the flagged pairs, which callers that only need clusters skip.

        Effective-width guard: before anything runs, the session's real
        concurrency budget is measured (widthprobe.effective_width — cached
        per process) and, when the host sustains fewer concurrent tasks
        than the master advertises (the hypervisor knee in CLAUDE.md), UDF
        parallelism and shuffle partitions are capped at the measured width
        for the duration of the run. The decision is logged to
        metrics.json["width_guard"]; SPARK_GRAFT_EFFECTIVE_WIDTH pins or
        disables it. Physical-only knob: outputs are bit-identical at any
        width, so resume manifests do not key on it."""
        from .widthprobe import effective_width

        wg = effective_width(self.spark)
        prev_shuffle = None
        if wg["width"] < wg["session_width"]:
            # concurrency = min(task slots, partitions) in local mode; the
            # partition count is the only runtime lever, so the cap must
            # hold for every exchange in the run
            prev_shuffle = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set(
                "spark.sql.shuffle.partitions", str(wg["width"]))
        try:
            return self._run_inner(transcripts, with_substring, with_tiers, wg)
        finally:
            if prev_shuffle is not None:
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", prev_shuffle)

    def _run_inner(
        self,
        transcripts: DataFrame,
        with_substring: bool | None,
        with_tiers: bool,
        wg: dict,
    ) -> PipelineResult:
        cfg = self.cfg
        self._stages = []
        self._input_fp = self._input_fingerprint(transcripts) if self.work_dir else None
        with_substring = cfg.substring_enabled if with_substring is None else with_substring
        # the PRIOR run's metrics (if any): resumed stages reuse their
        # recorded bucket/CC stats instead of re-running the stats jobs —
        # resume must skip a stage's WORK, including its metrics collects
        prior_metrics: dict = {}
        if self.work_dir:
            try:
                with open(os.path.join(self.work_dir, "metrics.json")) as f:
                    prior_metrics = json.load(f)
            except (OSError, json.JSONDecodeError):
                pass

        band_passes = 1
        if self.auto_plan:
            import dataclasses

            from .planner import derive_exec_plan

            # unit_col: transcripts is TURN-level; plan budgets are per
            # conversation (the row the UDF/banding stages actually see)
            plan = derive_exec_plan(self.spark, transcripts, cfg.bands,
                                    cores=wg["width"], unit_col="conv_id")
            self.exec_plan = plan
            cfg = dataclasses.replace(
                cfg,
                bucket_cap=plan.bucket_cap,
                shuffle_partitions=plan.shuffle_partitions,
                arrow_batch_rows=plan.arrow_batch_rows,
            )
            self.cfg = cfg  # manifests/resume key on the DERIVED config
            if wg["width"] >= wg["session_width"]:
                # a width-capped run keeps shuffle partitions at the capped
                # width (set in run()); the plan's value still governs the
                # cluster-scale config and is logged either way
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(plan.shuffle_partitions))
            self.spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch",
                str(plan.arrow_batch_rows))
            band_passes = plan.band_passes

        # uncapped: 2 waves at full width for load balancing (status quo).
        # capped: exactly `width` partitions — any more and local mode would
        # schedule past the measured knee (slots > effective cores).
        if wg["width"] < wg["session_width"]:
            par = wg["width"]
        else:
            par = self.spark.sparkContext.defaultParallelism * 2
        asm = assemble(transcripts, parallelism=par)
        sig = self._run_stage("signatures", lambda: compute_signatures(asm, cfg))

        if band_passes > 1:
            from .planner import band_ranges

            # each pass is MATERIALIZED (stage checkpoint / eager
            # localCheckpoint) before the next is constructed — a lazy
            # union would fuse all passes into one job whose in-flight
            # exploded-band footprint is the single-pass total, defeating
            # the very budget band_passes was derived to enforce. The
            # final candidates stage unions the materialized pass outputs
            # (pair rows only) and combines n_bands.
            pass_frames, pass_stats = [], []
            for i, rng in enumerate(band_ranges(cfg.bands, band_passes)):
                holder: dict = {}

                def _build(rng=rng, holder=holder):
                    df, st = candidate_pairs(sig, cfg, band_range=rng)
                    holder["stats"] = st
                    return df

                pass_frames.append(
                    self._run_stage(f"candidates_p{i}", _build))
                pass_stats.append(holder.get("stats"))
            cand_df = pass_frames[0]
            for p in pass_frames[1:]:
                cand_df = cand_df.unionByName(p)
            cand_df = cand_df.groupBy("ih_a", "ih_b").agg(
                F.sum("n_bands").cast("int").alias("n_bands")
            )
            if all(s is not None for s in pass_stats):
                all_stats = pass_stats[0]
                for s in pass_stats[1:]:
                    all_stats = all_stats.unionByName(s)
                bucket_stats = all_stats.select(
                    F.sum("n_buckets").alias("n_buckets"),
                    F.sum("n_hot_buckets").alias("n_hot_buckets"),
                    F.sum("hot_member_rows").alias("hot_member_rows"),
                    F.max("max_bucket_size").alias("max_bucket_size"),
                )
            else:
                # >= 1 pass resumed: its stats frame was never built; the
                # prior run's recorded stats stand (finalize falls back)
                bucket_stats = None
        else:
            cand_df, bucket_stats = candidate_pairs(sig, cfg)
        cand = self._run_stage("candidates", cand_df)
        # exact pair count from the stage manifest (zero extra jobs) drives
        # the verify stage's broadcast-vs-shuffle decision for the pair list
        cand_rows = self._stages[-1].rows
        pairs = self._run_stage(
            "pairs",
            lambda: verify_pairs(sig, cand, cfg,
                                 cand_rows=cand_rows if cand_rows >= 0 else None),
        )

        cc_stats: dict = {}
        clusters = self._run_stage(
            "clusters",
            lambda: connected_components(
                sig.select("conv_id", "id_hash"), pairs, cfg, stats=cc_stats),
        )
        if not cc_stats:
            # clusters stage resumed -> CC never executed this run; carry the
            # original run's path decision forward instead of erasing it
            cc_stats = prior_metrics.get("connected_components", {})

        tables: dict[str, DataFrame] = {
            "signatures": sig,
            "candidates": cand,
            "pairs": pairs,
            "clusters": clusters,
        }
        sub_stats = None
        if with_substring:
            sub_df, sub_stats = substring_pairs(sig, pairs, cfg, return_stats=True)
            tables["substring_pairs"] = self._run_stage("substring_pairs", sub_df)  # lazy frame, construct above

        if with_tiers:
            from .operators.substring import verify_substring_pairs
            from .operators.tiers import tier_attribution

            if "substring_pairs" in tables:
                ver = verify_substring_pairs(tables["substring_pairs"], asm, cfg)
            else:
                # substring tier disabled: cascade degrades to exact/near/kept
                ver = self.spark.createDataFrame(
                    [], "conv_id_a string, conv_id_b string, "
                        "n_windows long, lcs_tokens long"
                )
            tables["tiers"] = self._run_stage(
                "tiers", tier_attribution(sig, clusters, ver, cfg)
            )

        # metrics + lineage tables (the reference's separate metadata stream)
        result = PipelineResult(tables, list(self._stages))
        if self.work_dir:
            t_fin = time.monotonic()
            resumed = {s.name: s.resumed for s in self._stages}
            # stats collects are part of a stage's WORK: a resumed stage
            # reuses its recorded stats instead of re-running banding jobs
            # for numbers the prior run already wrote
            if resumed.get("candidates") and "lsh_buckets" in prior_metrics:
                lsh_buckets = prior_metrics["lsh_buckets"]
            elif bucket_stats is not None:
                bucket_row = [r.asDict() for r in bucket_stats.collect()]
                lsh_buckets = bucket_row[0] if bucket_row else {}
            else:
                lsh_buckets = prior_metrics.get("lsh_buckets", {})
            t_bucket = time.monotonic()
            metrics = {
                "config_hash": cfg.config_hash(),
                "stages": result.metrics_rows(),
                "lsh_buckets": lsh_buckets,
                "connected_components": cc_stats,
            }
            if sub_stats is not None:
                if (resumed.get("substring_pairs")
                        and "substring_buckets" in prior_metrics):
                    metrics["substring_buckets"] = (
                        prior_metrics["substring_buckets"])
                else:
                    sub_row = [r.asDict() for r in sub_stats.collect()]
                    metrics["substring_buckets"] = (
                        sub_row[0] if sub_row else {})
            if "tiers" in tables:
                if resumed.get("tiers") and "tiers" in prior_metrics:
                    metrics["tiers"] = prior_metrics["tiers"]
                else:
                    metrics["tiers"] = {
                        r["tier"]: r["n"]
                        for r in tables["tiers"]
                        .groupBy("tier")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect()
                    }
            if self.exec_plan is not None:
                metrics["exec_plan"] = self.exec_plan.as_dict()
            metrics["width_guard"] = wg
            t_stats = time.monotonic()
            # lineage derives purely from the signatures/clusters stage
            # outputs: when BOTH resumed (same config + input fingerprint),
            # the prior run's lineage parquet is bit-identical — rewriting
            # it would re-run two aggregation jobs per resumed invocation
            lineage_path = os.path.join(self.work_dir, "lineage")
            if not (resumed.get("signatures") and resumed.get("clusters")
                    and os.path.exists(lineage_path)):
                lineage = self.lineage(
                    "signatures", sig, ["conv_id", "content_hash"]
                ).unionByName(
                    self.lineage("clusters", clusters, ["conv_id", "cluster_id"])
                )
                lineage.write.mode("overwrite").parquet(lineage_path)
            # serial driver overhead is Amdahl fraction at N->4N; keep it
            # visible so regressions show up in metrics, not just wall clock
            metrics["finalize_seconds"] = {
                "bucket_stats": round(t_bucket - t_fin, 3),
                "substring_stats_and_tiers": round(t_stats - t_bucket, 3),
                "lineage": round(time.monotonic() - t_stats, 3),
            }
            with open(os.path.join(self.work_dir, "metrics.json"), "w") as f:
                json.dump(metrics, f, indent=2, default=str)
        return result


def run_dedup(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: DedupConfig | None = None,
    work_dir: str | None = None,
    auto_plan: bool = False,
) -> PipelineResult:
    return DedupPipeline(spark, cfg, work_dir, auto_plan=auto_plan).run(transcripts)
