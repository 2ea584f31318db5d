"""Structured Streaming front-end: incremental signature computation and
exact dedup over an arriving transcript stream.

Reference analog: pipe mode (`pcompress -p < in > out`,
/root/reference/pcompress.c:2397-2420) — same single-pass pipeline, with the
segmented index sized for bounded memory (/root/reference/rabin/global/
index.c:140-151). Here bounded state comes from a watermark: conversations
are assembled per event-time window, signatures computed by the SAME Arrow
kernels as batch, and exact dedup runs with dropDuplicates within the
watermark horizon.

Like the reference (global-dedup decompress "not possible in pipe mode",
/root/reference/rabin/rabin_dedup.c:1615-1617), cross-horizon near-dup
clustering is out of streaming scope — the batch pipeline handles it; the
stream handles ingest-time signatures + same-window exact suppression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..operators.signatures import compute_signatures


def assemble_windowed(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Assemble conversations from streaming turn rows: group by conv_id
    within the watermark horizon, stable turn order via array_sort (same
    construction as batch assemble). Works on append-mode aggregation."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", watermark).alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: F.coalesce(s["text"], F.lit("")),
                ),
                "\n",
            ).alias("doc_text"),
        )
        .drop("win")
    )


def signatures_stream(stream: DataFrame, cfg: DedupConfig | None = None,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming signatures: identical schema/values to the batch stage for
    conversations fully contained in one watermark window."""
    cfg = cfg or DedupConfig()
    return compute_signatures(assemble_windowed(stream, watermark), cfg)


def streaming_exact_dedup(stream: DataFrame, cfg: DedupConfig | None = None,
                          watermark: str = "10 minutes") -> DataFrame:
    """Exact-dup suppression within the watermark horizon: first conversation
    per content_hash survives (state bounded by the watermark, the memlimit
    analog). Emits (conv_id, content_hash, n_turns, n_tokens)."""
    sig = signatures_stream(stream, cfg, watermark)
    return sig.select("conv_id", "content_hash", "n_turns", "n_tokens").dropDuplicates(
        ["content_hash"]
    )
