"""Turn-level dedup index — the reference's *block-granularity* dedup.

pcompress dedups at rabin-block granularity inside each chunk: every block
either becomes a backward reference to an earlier identical block (index
entry MSB=1) or is stored as a literal run (MSB=0)
(/root/reference/rabin/rabin_dedup.h:116-134, reference-vs-literal emit at
/root/reference/rabin/rabin_dedup.c:1236-1344). The transcript engine's
conversation-level channels are the *chunk/segment* analogs; this module is
the *block* analog: the dedup granule is a single turn, and the output is
the same literal/backward-ref index, re-expressed relationally.

Blocks below the minimum block size are never dedup candidates in the
reference (RAB_BLK_MIN_BITS floor, /root/reference/rabin/rabin_dedup.c:120-126);
here the analog is a minimum normalized-char floor (``min_chars``) below
which a turn is always stored literal.

Everything is JVM-side built-ins (sha2 over the shared normalization
expression) — no Python UDF, whole-stage codegen end to end. The only
shuffle is the groupBy(turn_hash); the firsts side is re-joined on the same
key, so AQE plans a co-partitioned shuffle hash join (no second full
exchange of the big side beyond the hash key) and a viral boilerplate turn
("ok", a canned greeting) produces a large group but only min/count aggs —
membership is never materialized, so there is no hot-reducer risk at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def norm_text_col(col):
    """JVM twin of kernels.normalize_one for ASCII corpora: lowercase,
    collapse non-[a-z0-9] runs to one space, trim. Matches the DuckDB
    oracle expression verbatim (``_NORM`` in __spark_entry__.py)."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def turn_dedup_index(transcripts: DataFrame, min_chars: int = 16) -> DataFrame:
    """Per-turn dedup index: (conv_id, turn_idx, kind, src_conv_id,
    src_turn_idx, n_chars).

    ``kind='ref'`` marks a turn whose normalized text already occurred at a
    globally earlier (conv_id, turn_idx) — the backward-reference entry;
    ``kind='literal'`` is the first occurrence (or a below-floor turn).
    Literal rows self-reference (src == self) so the schema is null-free.
    The "earlier" order is lexicographic (conv_id, turn_idx) — a
    deterministic total order, the relational analog of the reference's
    file-offset order (earlier offset wins the index slot,
    /root/reference/rabin/global/index.c:286-323).
    """
    h = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.sha2(norm_text_col(F.col("text")), 256).alias("turn_hash"),
        F.length(norm_text_col(F.col("text"))).cast("long").alias("n_chars"),
    )
    elig = h.where(F.col("n_chars") >= min_chars)
    firsts = elig.groupBy("turn_hash").agg(
        F.min(F.struct("conv_id", "turn_idx")).alias("src")
    )
    deduped = elig.join(firsts, "turn_hash").select(
        "conv_id",
        "turn_idx",
        F.when(
            (F.col("conv_id") == F.col("src.conv_id"))
            & (F.col("turn_idx") == F.col("src.turn_idx")),
            F.lit("literal"),
        )
        .otherwise(F.lit("ref"))
        .alias("kind"),
        F.col("src.conv_id").alias("src_conv_id"),
        F.col("src.turn_idx").alias("src_turn_idx"),
        "n_chars",
    )
    short = h.where(F.col("n_chars") < min_chars).select(
        "conv_id",
        "turn_idx",
        F.lit("literal").alias("kind"),
        F.col("conv_id").alias("src_conv_id"),
        F.col("turn_idx").alias("src_turn_idx"),
        "n_chars",
    )
    return deduped.unionByName(short)


def turn_dedup_stats(transcripts: DataFrame, min_chars: int = 16) -> DataFrame:
    """One-row savings rollup over the turn dedup index — the analog of the
    reference's end-of-run dedup ratio report (chunks_deduped / ratio
    printout, /root/reference/rabin/rabin_dedup.c:1469-1489 and final stats
    at /root/reference/pcompress.c:1082-1118).

    Columns: n_turns, n_literal, n_ref, total_chars, ref_chars,
    savings_ratio (= ref_chars / total_chars, the fraction of normalized
    text a turn-granular store would not re-store), each rounded/cast to
    match the DuckDB twin exactly.
    """
    idx = turn_dedup_index(transcripts, min_chars=min_chars)
    return idx.agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col("kind") == "literal").cast("long")).alias("n_literal"),
        F.sum((F.col("kind") == "ref").cast("long")).alias("n_ref"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("kind") == "ref", F.col("n_chars")).otherwise(F.lit(0))).alias(
            "ref_chars"
        ),
        F.round(
            F.sum(F.when(F.col("kind") == "ref", F.col("n_chars")).otherwise(F.lit(0)))
            / F.greatest(F.sum("n_chars"), F.lit(1)),
            6,
        ).alias("savings_ratio"),
    )
