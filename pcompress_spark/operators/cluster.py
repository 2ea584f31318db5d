"""Connected components: verified pairs -> cluster assignments.

Reference analog: the dedup index resolves every duplicate to a single
*backward* reference — the first occurrence wins, deterministically, thanks
to the serialized index ring (/root/reference/rabin/rabin_dedup.c:1466-1467,
/root/reference/pcompress.c:2610-2617). Here "first" becomes "lexicographic
minimum conv_id of the component" — the same acyclicity invariant
("all duplicate references will be backward references",
/root/reference/rabin/rabin_dedup.c:1606-1617) with no serialization: the
shuffle is the index and min() is associative.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond") — O(log^2 n) rounds worst case, 2-3
rounds on dedup graphs (clusters are near-cliques with tiny diameter).

Scale-first formulation: each half-round is groupBy().min() + a join —
NO collect_set/collect_list, so a giant component (every near-copy of one
viral boilerplate doc) never materializes a multi-million-element array in
one task. The groupBy min is map-side combinable; the join back is AQE
skew-splittable. ``localCheckpoint`` truncates lineage each round so the
plan doesn't grow superlinearly with iterations.

Convergence is detected by an order-insensitive edge-set checksum
(count + sum of xxhash64(u,v)) — one cheap agg per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u."""
    nbrs = edges.select(F.col("u"), F.col("v")).union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("mu"), F.least("mn", "u").alias("m"))
    )
    return (
        nbrs.alias("nb")
        .join(mins.alias("mi"), F.col("nb.u") == F.col("mi.mu"))
        .where(F.col("nb.v") > F.col("nb.u"))
        .select(F.col("nb.v").alias("u"), F.col("mi.m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges hi->lo; per hi: m = min(lo); emit (lo, m) for lo != m
    plus (hi, m)."""
    oriented = edges.select(
        F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
    ).distinct()
    mins = (
        oriented.groupBy("hi")
        .agg(F.min("lo").alias("m"))
        .select(F.col("hi").alias("mhi"), "m")
    )
    lo_edges = (
        oriented.alias("or")
        .join(mins.alias("mi"), F.col("or.hi") == F.col("mi.mhi"))
        .where(F.col("or.lo") != F.col("mi.m"))
        .select(F.col("or.lo").alias("u"), F.col("mi.m").alias("v"))
    )
    hi_edges = mins.select(F.col("mhi").alias("u"), F.col("m").alias("v"))
    return lo_edges.union(hi_edges).where(F.col("u") != F.col("v")).distinct()


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: ANSI-safe (no long overflow) and exact
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    all_nodes: DataFrame, pairs: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """all_nodes: (conv_id, id_hash) for every doc, clustered or not;
    pairs: (..., ih_a, ih_b) long edge keys. Returns (conv_id, cluster_id)
    where cluster_id = min conv_id of the component (singletons map to
    self).

    Every CC round shuffles only 8-byte node ids (the id_hash longs), never
    conv_id strings — at 10^12 nodes the string keys would ~4x every
    iteration's exchange. The final labels table (tiny: clustered nodes
    only) is mapped back to conv_ids with two small joins, and the
    representative is still the LEXICOGRAPHIC min conv_id of the component
    — identical output to a string-keyed run."""
    edges = (
        pairs.select(F.col("ih_a").alias("u"), F.col("ih_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    prev = _edge_checksum(edges)
    if prev[0] > 0:
        for _ in range(cfg.cc_max_iters):
            edges = _small_star(_large_star(edges)).localCheckpoint()
            cur = _edge_checksum(edges)
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(f"connected components did not converge in {cfg.cc_max_iters} iters")
    # converged: every edge is (node, component_min) over id_hash longs
    labels = (
        edges.select(F.greatest("u", "v").alias("id_hash"), F.least("u", "v").alias("lab"))
        .groupBy("id_hash")
        .agg(F.min("lab").alias("lab"))
    )
    comp = (
        all_nodes.select("conv_id", "id_hash")
        .join(labels, "id_hash", "left")
        .select("conv_id", F.coalesce("lab", "id_hash").alias("lab"))
    )
    reps = comp.groupBy("lab").agg(F.min("conv_id").alias("cluster_id"))
    return comp.join(reps, "lab").select("conv_id", "cluster_id")
