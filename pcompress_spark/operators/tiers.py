"""Tier attribution: WHICH dedup tier removed each conversation.

The reference routes every chunk through a tier cascade — an identical-hash
global-index hit dedups the chunk outright, a similarity probe nominates
near-match chunks for delta encoding, and only the leftovers are stored
whole (/root/reference/rabin/rabin_dedup.c:1236-1344 exact-index path,
:1469-1489 similarity probe -> bsdiff nomination). This operator reproduces
that attribution at conversation granularity over the pipeline's stage
tables:

- ``exact``     — byte-identical (normalized content hash) to an earlier
                  conversation; removed_by = the group's min conv_id.
- ``near``      — a non-representative member of a near-dup cluster;
                  removed_by = the cluster representative.
- ``substring`` — a surviving representative whose text shares a verified
                  exact token run of >= cfg.substring_window tokens with
                  another representative; the pair's "loser" (fewer tokens;
                  tie -> lexicographically greater conv_id) is attributed
                  here, removed_by = min winner over its qualifying pairs.
                  One round only: a loser is attributed even if its winner
                  is itself the loser of a different pair (matching the
                  reference, where a delta target may itself be delta'd
                  against a third block in a later segment).
- ``kept``      — everything else; removed_by = itself.

Priority is exact > near > substring: an exact duplicate is never
double-attributed to the near tier even though exact star edges also feed
the cluster stage.

Scale shape: exact reps via groupBy(content_hash).min (map-side combine,
J3 pattern); the substring side starts from the verified-pairs table —
already candidate-pruned and tiny relative to the corpus — so its joins
against the representative set and token counts broadcast under AQE. No
window functions, no collects; output is one row per conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig


def tier_attribution(
    signatures: DataFrame,
    clusters: DataFrame,
    verified_substring: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """(conv_id, tier, removed_by) for every conversation.

    ``signatures``: pipeline signatures table (conv_id, content_hash,
    n_tokens, ...). ``clusters``: (conv_id, cluster_id). ``verified_substring``:
    verify_substring_pairs output (conv_id_a, conv_id_b, n_windows,
    lcs_tokens) with conv_id_a < conv_id_b.
    """
    sig = signatures.select("conv_id", "content_hash", "n_tokens")

    exact_rep = sig.groupBy("content_hash").agg(
        F.min("conv_id").alias("exact_rep")
    )
    base = sig.join(exact_rep, "content_hash").join(clusters, "conv_id")

    reps = clusters.where(F.col("cluster_id") == F.col("conv_id")).select("conv_id")
    ntok = sig.select("conv_id", "n_tokens")
    qual = (
        verified_substring
        .where(F.col("lcs_tokens") >= int(cfg.substring_window))
        .join(reps.withColumnRenamed("conv_id", "conv_id_a"), "conv_id_a")
        .join(reps.withColumnRenamed("conv_id", "conv_id_b"), "conv_id_b")
        .join(
            ntok.select(F.col("conv_id").alias("conv_id_a"),
                        F.col("n_tokens").alias("na")),
            "conv_id_a",
        )
        .join(
            ntok.select(F.col("conv_id").alias("conv_id_b"),
                        F.col("n_tokens").alias("nb")),
            "conv_id_b",
        )
    )
    loser_is_a = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("conv_id_a") > F.col("conv_id_b"))
    )
    subrm = (
        qual.select(
            F.when(loser_is_a, F.col("conv_id_a"))
            .otherwise(F.col("conv_id_b")).alias("loser"),
            F.when(loser_is_a, F.col("conv_id_b"))
            .otherwise(F.col("conv_id_a")).alias("winner"),
        )
        .groupBy("loser")
        .agg(F.min("winner").alias("sub_winner"))
    )

    return (
        base.join(subrm, base["conv_id"] == subrm["loser"], "left")
        .select(
            "conv_id",
            F.when(F.col("conv_id") != F.col("exact_rep"), F.lit("exact"))
            .when(F.col("conv_id") != F.col("cluster_id"), F.lit("near"))
            .when(F.col("sub_winner").isNotNull(), F.lit("substring"))
            .otherwise(F.lit("kept"))
            .alias("tier"),
            F.when(F.col("conv_id") != F.col("exact_rep"), F.col("exact_rep"))
            .when(F.col("conv_id") != F.col("cluster_id"), F.col("cluster_id"))
            .when(F.col("sub_winner").isNotNull(), F.col("sub_winner"))
            .otherwise(F.col("conv_id"))
            .alias("removed_by"),
        )
    )
