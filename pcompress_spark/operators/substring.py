"""Substring pass: long exact token runs shared across conversations.

Reference analog: bsdiff's suffix-array long-match search between similar
blocks (/root/reference/bsdiff/bsdiff.c:142-254, invoked at
/root/reference/rabin/rabin_dedup.c:1469-1489). Shingle-based MinHash misses
a short-vs-long containment pair (Jaccard is tiny when one doc is much
longer), so this stage catches "conversation B embeds a long verbatim span
of conversation A".

Spark-first: no suffix arrays needed for *detection* — signatures already
carry content-defined window fingerprints (kernels.window_fingerprints: a
window is selected iff its own hash % stride == 0, the rabin-boundary trick,
so selection is position-independent). Detection is then exactly the LSH
shape: explode (win_hash), group, pair within bucket — one shuffle on the
window hash, same deterministic sorted-cap as the LSH buckets.

Pairs already verified as exact/near duplicates are anti-joined away: this
table reports *containment-style* overlap that clustering did NOT capture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig


def substring_candidates(sig: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures -> (conv_id_a, conv_id_b, n_windows) pairs sharing at
    least substring_min_windows distinct window fingerprints."""
    exploded = (
        sig.where(F.size("win_hashes") > 0)
        .select("conv_id", F.explode(F.array_distinct("win_hashes")).alias("win_hash"))
    )
    buckets = (
        exploded.groupBy("win_hash")
        .agg(F.slice(F.sort_array(F.collect_list("conv_id")), 1, cfg.bucket_cap).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), y -> "
                "struct(x as conv_id_a, y as conv_id_b))))"
            )
        ).alias("p")
    ).select("p.conv_id_a", "p.conv_id_b")
    return (
        pairs.groupBy("conv_id_a", "conv_id_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_windows"))
        .where(F.col("n_windows") >= cfg.substring_min_windows)
    )


def substring_pairs(
    sig: DataFrame, verified_pairs: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Substring-overlap pairs not already explained by exact/near dedup."""
    cand = substring_candidates(sig, cfg)
    known = verified_pairs.select("conv_id_a", "conv_id_b")
    return cand.join(known, ["conv_id_a", "conv_id_b"], "left_anti")
