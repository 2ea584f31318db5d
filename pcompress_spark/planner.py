"""Execution-parameter planning: derive shuffle/batch/skew knobs from input
stats instead of static defaults.

Reference analog: pcompress sizes its global dedup index from the dataset
size and the memory limit, shrinks slots to fit, and auto-switches
simple -> segmented mode when ``memreqd > 3 x memlimit``
(/root/reference/rabin/global/index.c:119-215, esp. 203-213). The Spark
engine's equivalents are planning-time choices, made once per run from
cheap input statistics and LOGGED to metrics.json so every deviation from
the defaults is auditable:

  - ``shuffle_partitions`` — sized so one reduce partition of the raw-text
    shuffle lands near a target of bytes, never below 2x the core count;
  - ``arrow_batch_rows``   — sized so one Arrow batch of documents stays
    near a bytes budget regardless of average document size;
  - ``bucket_cap``         — the hot-bucket cap scales DOWN as the corpus
    grows (pair-generation cost per hot bucket is O(cap^2); at small scale
    a bigger cap trades trivial cost for fewer logged drops);
  - ``band_passes``        — the banding explode is split into sequential
    passes when rows x bands would exceed the in-flight budget (the
    simple -> segmented mode switch; band_explode documents why
    pass-splitting is semantics-preserving).

Stats come from input FILE SIZES (Hadoop FileSystem metadata, no data
scan — exactly the reference's ``file size / mem limit`` inputs) plus a
row count, which Parquet answers from footers. Everything here is a pure
function of (stats, budgets) so tests can pin the decisions; manual
config always wins (the pipeline only applies the plan when asked to).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession

# planning budgets (bytes). Deliberately coarse: the goal is order-of-
# magnitude fit, AQE handles the rest at runtime.
TARGET_SHUFFLE_PARTITION_BYTES = 64 << 20   # post-shuffle partition target
TARGET_ARROW_BATCH_BYTES = 32 << 20         # UDF batch working set
PARQUET_EXPANSION = 3.0                     # decoded-text vs parquet bytes
BAND_ROW_BYTES = 24                         # (id_hash, band_idx, band_hash)
DEFAULT_INFLIGHT_BUDGET = 8 << 30           # banding rows in flight per pass
BUCKET_CAP_KNEES = (50_000, 50_000_000)     # unit-count knees for the cap


@dataclass(frozen=True)
class ExecPlan:
    shuffle_partitions: int
    arrow_batch_rows: int
    bucket_cap: int
    band_passes: int
    # the stats the decisions were derived from (for metrics.json)
    input_bytes: int | None
    input_rows: int
    avg_doc_bytes: float | None
    cores: int

    def as_dict(self) -> dict:
        return asdict(self)


def _input_bytes(spark: SparkSession, df: DataFrame) -> int | None:
    """Total size of the DataFrame's backing files via Hadoop FileSystem
    metadata (no Spark job, no data read); None when not file-backed.

    Batched by parent directory: one ``listStatus`` RPC per directory
    instead of one ``getFileStatus`` per file — a 100k-file table behind
    an object store is a handful of LIST calls, not 100k GETs. Parents are
    split from the URI strings in Python so no per-file JVM round-trips
    happen either."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    parents: dict[str, set[str]] = {}
    for f in files:
        parent, _, name = f.rpartition("/")
        if not parent or not name:
            return None
        parents.setdefault(parent, set()).add(name)
    total = 0
    try:
        for parent, names in parents.items():
            p = jvm.org.apache.hadoop.fs.Path(parent)
            for st in p.getFileSystem(conf).listStatus(p):
                if st.getPath().getName() in names:
                    total += st.getLen()
    except Exception:
        return None
    return int(total)


def _clamp(x: int, lo: int, hi: int) -> int:
    return max(lo, min(hi, x))


def derive_exec_plan(
    spark: SparkSession,
    docs: DataFrame,
    bands: int,
    cores: int | None = None,
    inflight_budget_bytes: int = DEFAULT_INFLIGHT_BUDGET,
    unit_col: str | None = None,
) -> ExecPlan:
    """Derive execution parameters for a dedup run over ``docs``.

    Every budget below is per PLANNING UNIT — the row the signature UDF
    and the banding explode actually see (one conversation/document). When
    ``docs`` is already unit-level (one row per doc), leave ``unit_col``
    None and rows are counted once (Parquet answers from footers). When
    ``docs`` is finer-grained (the raw TURN-level transcript table),
    pass ``unit_col="conv_id"``: units are then approx-count-distinct of
    that column (one pass, partial aggs, deterministic HLL) — counting
    turns as units would size Arrow batches ~turns-per-conv times past the
    working-set budget and split banding into that many needless passes.
    All rules are simple monotone functions so two corpora of different
    scales verifiably pick different parameters (the test pins this).
    """
    cores = cores or spark.sparkContext.defaultParallelism
    if unit_col is None:
        rows = docs.count()
    else:
        from pyspark.sql import functions as F

        # rsd=0.01: ~10k HLL registers — still trivial driver memory, and
        # the unit count stays within ~1-2% (planning thresholds are
        # order-of-magnitude, but the logged stat should read true)
        rows = max(
            int(
                docs.agg(
                    F.approx_count_distinct(unit_col, rsd=0.01)
                ).collect()[0][0]
            ),
            1,
        )
    total_bytes = _input_bytes(spark, docs)

    if total_bytes is not None:
        raw = total_bytes * PARQUET_EXPANSION
        shuffle_partitions = _clamp(
            int(raw / TARGET_SHUFFLE_PARTITION_BYTES) + 1, 2 * cores, 200_000
        )
        avg_doc = raw / max(rows, 1)
        arrow_batch_rows = _clamp(
            int(TARGET_ARROW_BATCH_BYTES / max(avg_doc, 1.0)), 256, 8192
        )
    else:
        shuffle_partitions = 2 * cores
        avg_doc = None
        arrow_batch_rows = 2048

    # hot-bucket cap: O(cap^2) pair cost per hot bucket. Small corpora can
    # afford a generous cap (fewer logged drops); web scale tightens it so
    # a single viral bucket stays a bounded task (the reference analog is
    # lossy eviction at capacity, index.c:539-547 — ours is deterministic
    # and logged either way).
    if rows <= BUCKET_CAP_KNEES[0]:
        bucket_cap = 1024
    elif rows <= BUCKET_CAP_KNEES[1]:
        bucket_cap = 256
    else:
        bucket_cap = 128

    band_rows_bytes = rows * bands * BAND_ROW_BYTES
    band_passes = max(1, -(-band_rows_bytes // inflight_budget_bytes))
    band_passes = min(band_passes, bands)  # can't split finer than 1 band

    return ExecPlan(
        shuffle_partitions=shuffle_partitions,
        arrow_batch_rows=arrow_batch_rows,
        bucket_cap=bucket_cap,
        band_passes=band_passes,
        input_bytes=total_bytes,
        input_rows=rows,
        avg_doc_bytes=round(avg_doc, 1) if avg_doc is not None else None,
        cores=cores,
    )


def band_ranges(bands: int, passes: int) -> list[tuple[int, int]]:
    """Split [0, bands) into ``passes`` contiguous ranges (first ranges one
    band larger when uneven) — the inputs to band_explode(band_range=...)."""
    passes = max(1, min(passes, bands))
    base, extra = divmod(bands, passes)
    out, lo = [], 0
    for i in range(passes):
        hi = lo + base + (1 if i < extra else 0)
        out.append((lo, hi))
        lo = hi
    return out
