"""Effective-width self-calibration: measure how many concurrent CPU-bound
workers this host actually sustains, and cap the pipeline's UDF/shuffle
parallelism at that width.

Why this exists: local mode trusts ``local[N]`` absolutely, but the
sandbox's hypervisor delivers a varying effective-core budget (observed
~14-16 while advertising 32; see CLAUDE.md "Perf facts"). Past that knee
extra task threads actively hurt — the same pipeline measured 94 s at a
pinned ``local[32]`` vs 61 s at ``local[16]`` on the same input and code.
``bench.py`` defends itself by probing session widths when the width is
unpinned, but a caller that PINS the width (the driver's bench, a user's
spark-submit) bypassed that defense entirely. This module is the
engine-level guard: ``DedupPipeline.run`` asks it for the effective width
and, when the measured width is below the session's, caps stage
parallelism so at most ``width`` tasks are ever concurrent.

How the probe measures: N independent PROCESSES (multiprocessing, no Spark,
no JVM) each run the real signature kernel on disjoint slabs of a small
deterministic corpus; the aggregate docs/sec at width w vs w/2 exposes the
host's concurrency knee directly. A Spark-side mini-pipeline probe was
tried first and rejected: at any corpus size cheap enough to probe with,
per-partition fixed costs dominate and the narrowest width always "wins"
(the same hazard CLAUDE.md records for bench.py's probe at small scale —
a 2.8% probe-scale win for 4 over 8 measured as a 35% full-scale loss).
The process-level kernel aggregate has no per-partition overhead term, and
the builder's side-by-side strategy test (BENCH/BASELINE.md: the JVM-only
KMV channel scales no better than the Python pipeline, 0.247 vs 0.304 at
8->32) showed the kernel's DRAM/scheduler ceiling is the same ceiling the
JVM stages hit — so the kernel curve is a sound proxy for both.

Decision rule: keep the full width only while doubling the worker count
buys a material aggregate gain (>25%); otherwise halve. On the measured
hazard days (kernel 8->32 aggregate ratio ~1.4x, i.e. 16->32 ~1.0-1.1x)
this caps 32 -> 16, exactly the width that ran 61 s instead of 94 s; on a
healthy host (16->32 ratio ~1.5-2x) it leaves the session width alone.

How the cap is applied: in local mode concurrency = min(task slots,
partitions) and the slot count is fixed at session start — so the partition
count is the only runtime lever. A capped run pins the assemble/signature
stages to exactly ``width`` partitions and sets
``spark.sql.shuffle.partitions`` to ``width`` for the run. On a real
multi-executor cluster the guard is moot (executor cores are sized to the
cgroup quota at deploy time — the same reasoning, applied earlier), so it
only engages for local masters.

Reference analog: pcompress sizes worker threads from the *detected* CPU
budget, not a CLI assertion (/root/reference/pcompress.c:2446-2473 —
nprocs via sysconf, then capped by the memory budget). Here "detected"
must be measured, because the VM lies about nproc.

Cost & caching: corpus generation plus ~2-4 s per measured width, once per
(process, session width); later runs (including best-of-N bench attempts)
reuse the cached decision. Overrides: ``SPARK_GRAFT_EFFECTIVE_WIDTH=<int>``
pins the width (no probe); ``off``/``0`` disables the guard entirely.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time

from pyspark.sql import SparkSession

# session-width -> decision dict; one probe per process is the contract
_CACHE: dict[int, dict] = {}
# probe corpus (list of doc_text strings), reused across widths/sessions
_CORPUS = None

PROBE_BATCH = 512      # docs per kernel call (the engine's Arrow-batch order)
PROBE_ITERS = 4        # kernel calls per worker per timed window
PROBE_FLOOR = 4        # never cap below this width


def gain_margin(width: int) -> float:
    """How much aggregate kernel throughput doubling the workers must buy
    to KEEP the wider width — width-dependent, because the mixed
    JVM+Python pipeline's thrash penalty grows with total thread count.

    Calibrated against same-window pipeline ground truth (2026-08-20, two
    separate host windows, 40k-conv corpus):
      - 32 vs 16: afternoon window — kernel ratio 1.24-1.47, pipeline
        1.49x faster capped (42.5 s -> 28.5 s); evening window — kernel
        ratio 1.75 yet pipeline 2.06x faster capped (39.9 s -> 19.4 s);
        round-4 scaling window — kernel ratio 1.82 and the UNCAPPED
        pipeline still lost 24% to local[8] (73.98 s vs 59.43 s,
        BENCH/BASELINE.md r4). Every observed window with a ratio <= 1.82
        favored capping, so above 16 threads the bar is a full 2.0: only
        a true doubling of effective cores justifies the extra threads.
        The cost asymmetry backs the high bar — a wrong KEEP measured
        24-106% slower, while a wrong CAP costs ~nothing here (a capped
        local[32] matches a true local[16] session within noise, 28.5 s
        vs 28.7 s).
      - 16 vs 8: evening window — kernel ratio only 1.28, but the capped-
        16 pipeline still beat local[8] (19.4 s vs 22.2 s): below the
        thrash regime moderate kernel gains DO translate, so the bar is
        the modest 1.25.
    A genuinely healthy doubling of real cores delivers ~1.9-2x kernel
    aggregate; choose_width keeps the FULL width at exactly the margin
    (its >= comparison — ties go to the wider width, matching
    bench.py's probe rule), so only sub-2.0 windows cap."""
    return 2.0 if width > 16 else 1.25


def _probe_texts():
    """Deterministic synthetic documents (assembled transcripts) — enough
    that every worker iterates disjoint slabs. Generated once per process."""
    global _CORPUS
    if _CORPUS is None:
        from . import datagen, oracle

        data = datagen.generate(
            seed=7, n_conv=PROBE_BATCH * (PROBE_ITERS + 2), dup_frac=0.3)
        _CORPUS = (
            oracle.assemble(data.transcripts)["doc_text"]
            .reset_index(drop=True)
        )
    return _CORPUS


def _worker(texts, barrier, out_q) -> None:
    from .config import DedupConfig
    from .kernels import signatures_for_texts

    cfg = DedupConfig()
    signatures_for_texts(texts[:PROBE_BATCH], cfg)  # warm caches + allocator
    barrier.wait()
    t0 = time.perf_counter()
    for i in range(PROBE_ITERS):
        lo = (i * PROBE_BATCH) % max(1, len(texts) - PROBE_BATCH)
        signatures_for_texts(texts[lo: lo + PROBE_BATCH], cfg)
    out_q.put(time.perf_counter() - t0)


def kernel_aggregate(n_procs: int) -> float:
    """Aggregate kernel docs/sec across n_procs concurrent processes (all
    released together at a barrier; the slowest wall is the denominator)."""
    texts = _probe_texts()
    barrier = mp.Barrier(n_procs)
    out_q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(texts, barrier, out_q))
             for _ in range(n_procs)]
    for p in procs:
        p.start()
    walls = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    return n_procs * PROBE_ITERS * PROBE_BATCH / max(walls)


def choose_width(agg: dict[int, float], session_width: int,
                 floor: int = PROBE_FLOOR) -> int:
    """Pure decision rule over measured {width: aggregate_docs_per_sec}:
    starting at the session width, halve while the wider width's aggregate
    gain over the half is below gain_margin(width) — those extra threads
    are past the host's knee and, in the full pipeline, actively negative
    (thread thrash + worker RSS; measured 94 s vs 61 s, and 39.9 s vs
    19.4 s same-window). Stops at the first material gain or the floor.
    Exists as a pure function so the rule is unit-testable without a
    probe."""
    w = session_width
    while w // 2 >= floor and (w // 2) in agg and w in agg:
        if agg[w] >= gain_margin(w) * agg[w // 2]:
            break
        w //= 2
    return w


def effective_width(spark: SparkSession, cache: bool = True) -> dict:
    """-> {"session_width": int, "width": int, "source": str,
           "kernel_agg_docs_per_sec": {width: agg} | None}

    ``width < session_width`` means: cap partitions at ``width`` for
    CPU-bound stages and shuffle partitions at ``width`` for this run.
    """
    sc = spark.sparkContext
    w0 = sc.defaultParallelism
    out = {"session_width": w0, "width": w0, "kernel_agg_docs_per_sec": None}

    env = os.environ.get("SPARK_GRAFT_EFFECTIVE_WIDTH", "").strip().lower()
    if env in ("off", "0", "none", "false"):
        out["source"] = "disabled"
        return out
    if env.isdigit():
        out["width"] = max(1, min(int(env), w0))
        out["source"] = "env"
        return out
    if not sc.master.startswith("local"):
        # real cluster: executor cores are sized at deploy time; partition
        # capping can't bound cluster-wide concurrency anyway
        out["source"] = "cluster"
        return out
    if w0 <= 2 * PROBE_FLOOR:
        # narrow sessions (tests at local[4]) are below every observed knee
        out["source"] = "narrow"
        return out
    if cache and w0 in _CACHE:
        return _CACHE[w0]

    agg: dict[int, float] = {}
    w = w0
    while w >= PROBE_FLOOR:
        agg[w] = kernel_aggregate(w)
        if len(agg) > 1 and choose_width(agg, w0) != w:
            break      # the descent stopped one level up — no need to go on
        if w // 2 < PROBE_FLOOR:
            break
        w //= 2

    out["width"] = choose_width(agg, w0)
    out["kernel_agg_docs_per_sec"] = {
        str(k): round(v, 1) for k, v in agg.items()}
    out["source"] = "probe"
    if cache:
        _CACHE[w0] = out
    return out
