"""Assemble: turn rows -> one document per conversation (stable turn order).

Reference analog: content-aligned chunk read — chunk boundaries are snapped
to content-defined boundaries so no dedup granule is ever split across
workers (`Read_Adjusted`, /root/reference/utils/utils.c:234-278). Here the
"content boundary" is the conversation: all turns of a `conv_id` are brought
together by ONE shuffle (groupBy conv_id), and turn order is restored with
`array_sort` over (turn_idx, ...) structs — stable, deterministic, and
entirely JVM-side (whole-stage codegen; zero Python in this stage).

input_hint invariant: "per-turn text equality under stable turn ordering" —
`assembled_turns` re-exposes per-turn texts in turn_idx order so tests can
assert byte-for-byte equality against the input.

Scale: this is an unavoidable full shuffle of the text payload, keyed on
conv_id (high cardinality, near-uniform — conversations are the unit of
work exactly like the reference's 8 MiB chunks). At 10^12 turns, set
spark.sql.shuffle.partitions (or let AQE coalesce) so each partition holds
~128-256 MB of text; no other stage shuffles the raw text again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_SEP = "\n"


def assemble(transcripts: DataFrame, parallelism: int | None = None) -> DataFrame:
    """-> (conv_id, n_turns, doc_text) with doc_text = turn texts joined by
    '\n' in turn_idx order. Matches oracle.assemble byte-for-byte.

    ``parallelism`` pins the shuffle width: repartition(n, conv_id) BEFORE
    the groupBy satisfies the aggregation's clustered-distribution
    requirement, so Catalyst adds no second exchange, AQE cannot coalesce a
    user-specified repartition, and the downstream (CPU-bound, Python)
    signature stage inherits exactly n tasks. One text shuffle total."""
    t = transcripts.select("conv_id", "turn_idx", "text")
    if parallelism:
        t = t.repartition(parallelism, "conv_id")
    return (
        t
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ),
                    lambda s: F.coalesce(s["text"], F.lit("")),
                ),
                TURN_SEP,
            ).alias("doc_text"),
        )
    )


def assembled_turns(transcripts: DataFrame) -> DataFrame:
    """Per-turn view in stable order: (conv_id, pos, turn_idx, text) from the
    sorted struct array (byte-exact — does NOT round-trip through doc_text,
    so turn texts containing the separator are preserved verbatim). Used by
    tests to prove the per-turn text-fidelity invariant."""
    sorted_turns = (
        transcripts
        .select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(F.struct("turn_idx", "text"))).alias("turns"))
    )
    return sorted_turns.select(
        "conv_id",
        F.posexplode("turns").alias("pos", "turn"),
    ).select("conv_id", "pos", F.col("turn.turn_idx").alias("turn_idx"),
             F.col("turn.text").alias("text"))
