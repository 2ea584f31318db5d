"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

The flagship measurement is the full transcript near-dup pipeline
(assemble -> signatures -> LSH -> verify -> CC) on a deterministic synthetic
corpus sized by SPARK_GRAFT_BENCH_CONVS (default 160000 conversations,
~3.3M turns — the same corpus as BENCH/BASELINE.md, large enough that
per-stage constants don't dominate) — fresh work_dir every run so
checkpoint resume can never fake the number. Scaling-efficiency evidence (local[8] vs local[32]) is produced
by BENCH/run_scaling.py from this same script.

Thread-width auto-calibration: when SPARK_GRAFT_CPUS is unset (or "auto"),
the harness first MEASURES which local[N] width this box actually sustains
— one small pipeline run (10k conversations) at nproc and nproc/2 — and
benches at the winner. The VM advertises 32 CPUs but the hypervisor
delivers a varying effective-core budget (observed ~14-16 after host
migrations), and past that knee extra task threads actively hurt: measured
back-to-back, local[16] ran the 40k-conv pipeline in 33-38 s vs 45-100+ s
at local[32] on the same input. A fixed 32 would bench the hypervisor, not
the engine — the same reasoning a cluster deployment applies when sizing
executor cores to the actual cgroup quota. An explicit SPARK_GRAFT_CPUS
always wins (that is how run_scaling.py pins its N-vs-4N points).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _probe_width(candidates, sf_dir) -> tuple[str, dict[str, float]]:
    """Measure the pipeline at each candidate local[N] width on a small
    corpus (one run each, fresh session per width) and return the winner.
    See the module docstring for why this exists; cost is ~30-60 s, all
    outside the timed region."""
    import tempfile
    from pcompress_spark.config import DedupConfig
    from pcompress_spark.pipeline import DedupPipeline
    from pcompress_spark.session import get_spark
    from pcompress_spark.sources.tables import transcripts_path

    probe_path = transcripts_path(sf_dir, n_conv=10000)
    walls: dict[str, float] = {}
    # the engine's own effective-width guard (widthprobe.effective_width)
    # must stay out of these measurements: each session here IS a width
    # candidate, and a nested in-session probe would both distort the
    # timing and re-measure what this loop measures
    prev_env = os.environ.get("SPARK_GRAFT_EFFECTIVE_WIDTH")
    os.environ["SPARK_GRAFT_EFFECTIVE_WIDTH"] = "off"
    try:
        for width in candidates:
            spark = get_spark(
                app_name=f"pcompress-bench-width-probe-{width}",
                master=f"local[{width}]",
                shuffle_partitions=width * 2,
            )
            spark.sparkContext.setLogLevel("ERROR")
            tdf = spark.read.parquet(probe_path)
            wd = tempfile.mkdtemp(prefix="pcompress_widthprobe_")
            t0 = time.monotonic()
            DedupPipeline(spark, DedupConfig(), work_dir=wd).run(tdf)
            walls[str(width)] = round(time.monotonic() - t0, 3)
            spark.stop()
            shutil.rmtree(wd, ignore_errors=True)
    finally:
        if prev_env is None:
            os.environ.pop("SPARK_GRAFT_EFFECTIVE_WIDTH", None)
        else:
            os.environ["SPARK_GRAFT_EFFECTIVE_WIDTH"] = prev_env
    best = min(walls, key=walls.get)
    return best, walls


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "auto")
    n_conv = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "160000"))
    # pipeline-only mode (run_scaling's 1->4 pair): skip the per-query
    # suite, the turn-grain stats, the KMV channel, and the host kernel
    # calibration — at local[1] those cost more than the pipeline itself
    # (the KMV JVM channel alone is ~20 min single-core) and the scaling
    # ratio only needs the pipeline point
    pipeline_only = os.environ.get(
        "SPARK_GRAFT_BENCH_PIPELINE_ONLY", "") == "1"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pcompress_spark.config import DedupConfig
    from pcompress_spark.pipeline import DedupPipeline
    from pcompress_spark.session import get_spark
    from pcompress_spark.sources.tables import transcripts_path
    import __spark_entry__ as entry

    width_probe: dict[str, float] | None = None
    if cpus == "auto":
        # Descend while halving keeps winning: the hypervisor's effective-core
        # budget varies across sessions (some days nproc/2 is past the knee
        # too — measured local[8] beating local[32] by 1.7x on the identical
        # pipeline). Each extra probe run costs ~15-30 s, paid only while the
        # narrower width keeps measuring faster, floor 4.
        # Descend only on a MATERIAL win (>5%): the probe corpus is small
        # enough that fixed costs flatten differences at low widths, and a
        # 2-3% probe-scale "win" for the narrower width has measured as a
        # 35% LOSS at full bench scale (probe 4 beat 8 by 2.8% at 10k convs
        # while local[8] out-ran local[4] 47.9 s vs 72.4 s on the 160k
        # corpus). Ties go to the wider width — more parallelism is what
        # the real deployment buys.
        nproc = os.cpu_count() or 32
        cpus, width_probe = _probe_width([nproc, max(1, nproc // 2)], sf_dir)
        if cpus != str(nproc) and width_probe[cpus] >= 0.95 * width_probe[str(nproc)]:
            cpus = str(nproc)
        while int(cpus) > 4 and int(cpus) != nproc:
            narrower = max(4, int(cpus) // 2)
            if str(narrower) in width_probe:
                break
            best, more = _probe_width([narrower], sf_dir)
            width_probe.update(more)
            if more[best] >= 0.95 * width_probe[cpus]:
                break
            cpus = best
        # the probed winner IS the session width — pin the engine's
        # in-session guard to it so the bench session doesn't re-probe
        # what this loop just measured with whole-session fidelity
        os.environ["SPARK_GRAFT_EFFECTIVE_WIDTH"] = cpus

    # host calibration: single-process raw-kernel throughput (no Spark),
    # measured fresh every invocation. This VM migrates across physical
    # hosts between sessions and absolute wall times move 1.5x+ with it
    # (see CLAUDE.md) — the calibration line lets round-over-round bench
    # deltas be read against the host the numbers were taken on, instead
    # of mistaking a slower host for an engine regression. ~20 s, entirely
    # outside every timed region.
    host_kernel = None
    try:
        if pipeline_only:
            raise RuntimeError("pipeline-only mode: skip host calibration")
        import subprocess
        ks = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH", "kernel_scaling.py"), "1"],
            capture_output=True, text=True, timeout=600,
        )
        host_kernel = json.loads(ks.stdout.strip().splitlines()[-1])[
            "docs_per_sec"]["1"]
    except Exception:
        pass  # calibration is advisory; never fail the bench over it

    # materialize the bench corpus before any timing
    tr_path = transcripts_path(sf_dir, n_conv=n_conv)

    spark = get_spark(
        app_name="pcompress-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2 if cpus.isdigit() else 64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the Python workers (fork + pandas/numpy import is a one-time
    # ~0.5s/worker cluster-startup cost, not pipeline throughput; the
    # scaling protocol in BENCH/BASELINE.md measures steady-state)
    def _noop(it):
        import pandas as _pd  # noqa: F401
        from pcompress_spark import kernels as _k  # noqa: F401
        for pdf in it:
            yield pdf
    spark.range(0, 10_000, 1, int(cpus) * 2 if cpus.isdigit() else 64).mapInPandas(
        _noop, "id long").count()

    timings: dict[str, float] = {}

    # ---- flagship: full dedup pipeline, fresh work dir each attempt ----
    # best-of-2: single-box memory-pressure variance (page cache / GC) can
    # double a run's wall time; the minimum is the steady-state number
    tdf = spark.read.parquet(tr_path)
    n_turns = tdf.count()
    attempts = []
    n_clusters = 0
    width_guard = None
    for _ in range(max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))):
        wd = tempfile.mkdtemp(prefix="pcompress_bench_")
        t0 = time.monotonic()
        res = DedupPipeline(spark, DedupConfig(), work_dir=wd).run(tdf)
        attempts.append(time.monotonic() - t0)
        n_clusters = res.tables["clusters"].select("cluster_id").distinct().count()
        if width_guard is None:
            try:
                with open(os.path.join(wd, "metrics.json")) as f:
                    width_guard = json.load(f).get("width_guard")
            except (OSError, json.JSONDecodeError, KeyError):
                pass
        shutil.rmtree(wd, ignore_errors=True)
    pipeline_sec = min(attempts)
    timings["dedup_pipeline"] = round(pipeline_sec, 3)

    # ---- per-operator headline queries on the driver tables ----
    from pcompress_spark.cache import release_persisted

    kmv_sec = None
    curation_stages: dict[str, dict] = {}
    if not pipeline_only:
        qs = entry.queries()
        for name in ["q1_pricing_summary", "q5_nation_revenue",
                     "events_sessionize", "doc_minhash_lsh_pairs",
                     "doc_token_stats", "doc_admission", "ann_topk_brute",
                     "ann_recall_report"]:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).count()
            timings[name] = round(time.monotonic() - t0, 3)
            release_persisted()  # one query's caches must not skew the next

        # doc_curation/tr_curation: the flagship COMPOSED cascades
        # (admission -> near-dup keep-best -> repetition -> budget ->
        # packing) — run with stage_seconds instrumentation so the bench
        # carries a per-stage cost breakdown (round-4's 471 s pathology
        # needed hand-decomposition to localize; never again). The stage
        # forcing orders the same persisted-frame materializations the
        # plain query performs, so the total stays comparable.
        from pcompress_spark.functions import curation
        from pcompress_spark.sources.tables import load_table, load_transcripts

        ss: dict = {}
        t0 = time.monotonic()
        curation.curate_corpus(
            load_table(spark, sf_dir, "documents"), threshold=0.3,
            stage_seconds=ss).count()
        timings["doc_curation"] = round(time.monotonic() - t0, 3)
        curation_stages["doc_curation"] = ss
        release_persisted()

        # tr_curation rides the checkpointed cascade signature table the
        # same way the entry query does (entry._cascade_signatures); a
        # cold cache pays the one-time signing+write inside the timed
        # region, warm rounds read parquet — exactly the deployment story
        ss = {}
        t0 = time.monotonic()
        curation.curate_transcripts(
            load_transcripts(spark, sf_dir), threshold=0.3,
            stage_seconds=ss,
            signatures=entry._cascade_signatures(spark, sf_dir)).count()
        timings["tr_curation"] = round(time.monotonic() - t0, 3)
        curation_stages["tr_curation"] = ss
        release_persisted()

        # turn-level dedup on the FULL bench corpus (3.3M turns) — the
        # JVM-only block-granularity channel, timed at the same scale as
        # the pipeline
        from pcompress_spark.operators.turns import turn_dedup_stats
        t0 = time.monotonic()
        turn_dedup_stats(tdf).collect()
        timings["tr_turn_dedup_stats"] = round(time.monotonic() - t0, 3)

        # KMV pure-JVM near-dup channel on the FULL bench corpus — the
        # zero-Python-worker execution strategy (functions/kmv.py), timed
        # at the same scale as the UDF pipeline for a direct strategy
        # comparison. Reported OUTSIDE the headline total: "value" sums
        # the same query set every round, so round-over-round comparisons
        # stay apples-to-apples.
        from pcompress_spark.functions.kmv import kmv_near_pairs_transcripts
        t0 = time.monotonic()
        kmv_near_pairs_transcripts(tdf, DedupConfig()).count()
        kmv_sec = round(time.monotonic() - t0, 3)
        release_persisted()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "transcript_dedup_pipeline+ops_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "bench_convs": n_conv,
        "bench_turns": n_turns,
        "turns_per_sec": round(n_turns / pipeline_sec, 1),
        "pipeline_attempts_sec": [round(a, 3) for a in attempts],
        "clusters": n_clusters,
        "cpus": cpus,
        "jvm_channel": (
            {"tr_kmv_near_pairs": kmv_sec} if kmv_sec is not None else None),
        "curation_stages": curation_stages or None,
        "host_kernel_docs_per_sec_1proc": host_kernel,
        "width_guard": width_guard,
    }
    if width_probe is not None:
        out["width_probe_sec"] = width_probe
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
