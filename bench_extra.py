"""Side benchmarks for optimization work (bench.py is FROZEN for
measurement — this file carries the finer-grained numbers cited in
OPTIMIZATION_r06.md).

Modes:
  python bench_extra.py cascade   # doc_curation + tr_curation attribution
  python bench_extra.py pipeline  # dedup pipeline per-stage (metrics.json)
  python bench_extra.py queries   # small bench queries, noop-sink isolated

Environment mirrors bench.py: $SPARK_GRAFT_SF_DIR (default sf0.1),
$SPARK_GRAFT_CPUS (default 32 here — bench's auto-probe is skipped so the
numbers are attributable to one fixed width; pass the width bench chose).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _session(cpus: str):
    from pcompress_spark.session import get_spark

    spark = get_spark(
        app_name="pcompress-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(it):
        import pandas as _pd  # noqa: F401
        from pcompress_spark import kernels as _k  # noqa: F401
        for pdf in it:
            yield pdf

    spark.range(0, 10_000, 1, int(cpus) * 2).mapInPandas(
        _noop, "id long").count()
    return spark


def _plan_seconds(df) -> float:
    """Driver-side planning cost of the frame (analysis+optimization+
    physical planning, no job)."""
    t0 = time.monotonic()
    df._jdf.queryExecution().executedPlan()
    return round(time.monotonic() - t0, 3)


def cascade(cpus: str, sf_dir: str) -> None:
    from pcompress_spark.cache import release_persisted
    from pcompress_spark.functions import curation
    from pcompress_spark.sources.tables import load_table, load_transcripts
    import __spark_entry__ as entry

    spark = _session(cpus)
    out: dict = {"cpus": cpus, "sf": sf_dir}

    for name, build in (
        ("doc_curation", lambda ss: curation.curate_corpus(
            load_table(spark, sf_dir, "documents"), threshold=0.3,
            stage_seconds=ss)),
        ("tr_curation", lambda ss: curation.curate_transcripts(
            load_transcripts(spark, sf_dir), threshold=0.3,
            stage_seconds=ss,
            signatures=entry._cascade_signatures(spark, sf_dir))),
    ):
        spark.sparkContext.setJobDescription(f"{name}: build+stages")
        ss: dict = {}
        t0 = time.monotonic()
        vdf = build(ss)
        t1 = time.monotonic()
        spark.sparkContext.setJobDescription(f"{name}: compose plan")
        plan_s = _plan_seconds(vdf)
        spark.sparkContext.setJobDescription(f"{name}: compose count")
        t2 = time.monotonic()
        n = vdf.count()
        t3 = time.monotonic()
        out[name] = {
            "rows": n,
            "build_and_stages_sec": round(t1 - t0, 3),
            "stage_seconds": ss,
            "stage_sum": round(sum(ss.values()), 3),
            "compose_plan_sec": plan_s,
            "compose_exec_sec": round(t3 - t2, 3),
        }
        out[name]["total_sec"] = round((t1 - t0) + plan_s + (t3 - t2), 3)
        release_persisted()
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))
    spark.stop()


def pipeline(cpus: str, sf_dir: str, n_conv: int) -> None:
    from pcompress_spark.config import DedupConfig
    from pcompress_spark.pipeline import DedupPipeline
    from pcompress_spark.sources.tables import transcripts_path

    tr_path = transcripts_path(sf_dir, n_conv=n_conv)
    spark = _session(cpus)
    tdf = spark.read.parquet(tr_path)
    results = []
    for attempt in range(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))):
        wd = tempfile.mkdtemp(prefix="pcompress_benchx_")
        t0 = time.monotonic()
        DedupPipeline(spark, DedupConfig(), work_dir=wd).run(tdf)
        wall = round(time.monotonic() - t0, 3)
        with open(os.path.join(wd, "metrics.json")) as f:
            m = json.load(f)
        results.append({
            "wall_sec": wall,
            "stages": m["stages"],
            "finalize_seconds": m.get("finalize_seconds"),
            "width_guard": {k: m.get("width_guard", {}).get(k)
                            for k in ("width", "session_width", "source")},
        })
        shutil.rmtree(wd, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "sf": sf_dir, "n_conv": n_conv,
                      "attempts": results}))
    spark.stop()


def queries(cpus: str, sf_dir: str, names: list[str] | None = None) -> None:
    """Time individual bench queries with the noop sink (computation only,
    full column materialization — guide §1.4)."""
    from pcompress_spark.cache import release_persisted
    import __spark_entry__ as entry

    spark = _session(cpus)
    qs = entry.queries()
    names = names or [
        "q1_pricing_summary", "q5_nation_revenue", "events_sessionize",
        "doc_minhash_lsh_pairs", "doc_token_stats", "doc_admission",
        "ann_topk_brute", "ann_recall_report",
    ]
    out: dict = {"cpus": cpus, "sf": sf_dir, "queries": {}}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        df = qs[name](spark, sf_dir)
        plan_s = _plan_seconds(df)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        out["queries"][name] = {
            "noop_sec": round(time.monotonic() - t0, 3),
            "plan_sec": plan_s,
        }
        release_persisted()
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


def turn_stats(cpus: str, sf_dir: str, n_conv: int) -> None:
    from pcompress_spark.operators.turns import turn_dedup_stats
    from pcompress_spark.sources.tables import transcripts_path

    spark = _session(cpus)
    tdf = spark.read.parquet(transcripts_path(sf_dir, n_conv=n_conv))
    t0 = time.monotonic()
    rows = turn_dedup_stats(tdf).collect()
    print(json.dumps({
        "cpus": cpus, "n_conv": n_conv,
        "tr_turn_dedup_stats_sec": round(time.monotonic() - t0, 3),
        "row": {k: str(v) for k, v in rows[0].asDict().items()},
    }))
    spark.stop()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "cascade"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_conv = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "160000"))
    if mode == "cascade":
        cascade(cpus, sf_dir)
    elif mode == "pipeline":
        pipeline(cpus, sf_dir, n_conv)
    elif mode == "queries":
        queries(cpus, sf_dir, sys.argv[2:] or None)
    elif mode == "turn_stats":
        turn_stats(cpus, sf_dir, n_conv)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
