"""Corpus curation operators: deterministic stratified sampling, benchmark
decontamination, and boilerplate n-gram mining.

These are the selection/hygiene passes a training-data pipeline runs AFTER
dedup: downsample over-represented strata, remove documents that leak
evaluation content, and surface viral boilerplate phrases. Reference
analogs: pcompress routes content classes to different treatment
(/root/reference/adaptive_compress.c:255-335 — here: per-stratum sample
rates) and its global index deliberately drops content by deterministic
rule at capacity (/root/reference/rabin/global/index.c:539-547 — here:
hash-threshold sampling, the same "keep iff key < rate" shape as the
hot-bucket salt).

Scale notes (100 TB design point):
- stratified_sample is map-only: one JVM projection per row, no shuffle,
  no UDF. The sample decision is a pure function of (doc_id, seed), so it
  is reproducible across runs/partitionings and auditable row-by-row.
- decontamination broadcasts the benchmark gram set (eval suites are tiny
  by nature — if yours is not, it is a corpus, not a benchmark) and counts
  hits with one groupBy(doc_id): shuffle volume is bounded by matched
  grams, never the corpus text.
- boilerplate mining is explode -> hash-agg with map-side combine; the
  min_df filter happens after partial aggregation, so only frequent-gram
  partials survive the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .doc_dedup import ngrams_col
from .text import content_class_col, norm_words

# per-stratum keep rates (per mille) for the judged default sample: empty
# docs carry no signal, numeric/airy classes are over-represented noise in
# web corpora, dense prose is what training wants most of
DEFAULT_RATES = {"empty": 0, "numeric": 100, "airy": 500, "dense": 800}


def stratified_sample(
    docs: DataFrame,
    rates_per_mille: dict[str, int] | None = None,
    seed: int = 7,
) -> DataFrame:
    """Deterministic per-stratum downsampling decision table:
    (doc_id, lang, content_class, rate_per_mille, sample_key, kept).

    kept <=> pmod(xxhash64(doc_id XOR seed), 1000) < rate[content_class].
    xxhash64 is JVM-native (whole-stage codegen, no Python) and the DuckDB
    oracle reproduces it bit-for-bit (oracle_sql.xxh64_long_ctes), so the
    exact membership of the sample is value-checked, not just its size.
    Unknown strata keep everything (rate 1000) — sampling must fail open,
    silently dropping a class nobody listed is a data-loss bug."""
    rates = DEFAULT_RATES if rates_per_mille is None else rates_per_mille
    rate = F.lit(1000)
    for klass, r in sorted(rates.items()):
        rate = F.when(F.col("content_class") == klass, F.lit(int(r))).otherwise(rate)
    key = F.pmod(F.xxhash64(F.col("doc_id").bitwiseXOR(F.lit(int(seed)))), F.lit(1000))
    return (
        docs.select("doc_id", "lang", content_class_col().alias("content_class"))
        .withColumn("rate_per_mille", rate.cast("long"))
        .withColumn("sample_key", key.cast("long"))
        .withColumn("kept", F.col("sample_key") < F.col("rate_per_mille"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    overlap_threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-decontamination report for every non-benchmark document:
    (doc_id, n_grams, n_overlap, overlap_ratio, contaminated).

    A document is contaminated when >= overlap_threshold of its distinct
    word n-grams appear anywhere in the benchmark suite — the standard
    n-gram-collision eval-leak test run before training. benchmark is a
    (doc_id, text) frame of the eval suite.

    Plan shape: the benchmark's distinct grams are broadcast (eval suites
    are small); each corpus doc's grams are exploded once, inner-joined
    against the broadcast set, and hit counts come back through one
    groupBy(doc_id) whose input is only the MATCHED gram rows. The corpus
    text itself is never shuffled. Documents shorter than n words have no
    grams and report ratio 0.0 (nothing to leak)."""
    grams = docs.select(
        "doc_id", norm_words("text").alias("words")
    ).select("doc_id", ngrams_col(n).alias("grams"))
    bench_grams = (
        benchmark.select(norm_words("text").alias("words"))
        .select(F.explode(ngrams_col(n)).alias("gram"))
        .distinct()
    )
    hits = (
        grams.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    ratio = F.when(
        F.col("n_grams") > 0, F.col("n_overlap") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return (
        grams.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)).cast("long"))
        .withColumn("overlap_ratio", F.round(ratio, 6))
        .withColumn(
            "contaminated", F.col("overlap_ratio") >= F.lit(float(overlap_threshold))
        )
    )


def boilerplate_ngrams(docs: DataFrame, n: int = 3, min_df: int = 5) -> DataFrame:
    """Word n-grams appearing in >= min_df distinct documents, with their
    document frequency: (gram, df). The frequency-analysis half of
    boilerplate removal — navigation chrome, license headers, and viral
    spans surface here long before they are frequent enough to matter to
    pairwise dedup. Distinct-per-doc explode -> hash agg with map-side
    partial combine; the df >= min_df filter keeps the result set tiny.
    No top-k LIMIT: a count cutoff is deterministic under any row order,
    a rank boundary is not."""
    return (
        docs.select("doc_id", norm_words("text").alias("words"))
        .select("doc_id", F.explode(ngrams_col(n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") >= int(min_df))
    )


def pack_assignments(
    docs: DataFrame, budget: int = 2048, n_shards: int = 8
) -> DataFrame:
    """Deterministic sequence-packing plan for training-shard assembly:
    (doc_id, shard, n_tokens, pack_id).

    Documents are routed to a shard by pmod(xxhash64(doc_id), n_shards)
    (JVM-native, reproducible across runs/partitionings — the same
    hash-route shape as stratified_sample) and packed greedily in doc_id
    order within the shard under a token budget with WATERMARK semantics:
    pack_id = floor(preceding_shard_tokens / budget), i.e. a pack keeps
    accepting documents until its cumulative token count crosses the
    budget, then closes — a document never splits, so a pack may overrun
    by at most one document (the rule training-data packers actually use
    when sequences must stay whole). The whole plan is two window
    functions over one exchange, deterministic under any input order.

    Scale (100 TB design point): the only shuffle is hash-partitioning by
    shard; the in-shard ordering is a per-partition sort, so n_shards is
    the parallelism knob — set it >> executor count and each sort stays
    partition-bounded. No UDF, whole-stage codegen end to end. Reference
    analog: the archive member sort that packs similar members into
    fixed-size segments before compression
    (/root/reference/archive/pc_archive.c:378-423, 642-700).
    """
    from pyspark.sql import Window

    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            "doc_id",
            F.pmod(F.xxhash64("doc_id"), F.lit(int(n_shards))).cast("long").alias("shard"),
            ntok.alias("n_tokens"),
        )
        .withColumn(
            "pack_id",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(int(budget))
            ).cast("long"),
        )
    )
