"""Similarity search over embedding columns: brute-force cosine top-k and a
hyperplane-LSH bucketed approximate variant.

No direct reference analog (pcompress has no vector search); this is the
training-data-pipeline extension mandated by the build brief. Semantics:
all similarity math in JVM double arithmetic (zip_with/aggregate,
left-to-right sums — bit-reproducible); ordering is made deterministic by
rounding the score and tie-breaking on vec_id, so results are stable across
partitionings and match the SQL oracle exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernels import splitmix64


def _with_norm(emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    return emb.select(
        F.col(id_col), F.col("embedding").cast("array<double>").alias("v")
    ).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0),
                        lambda acc, x: acc + x)
        ),
    )


def _cosine(va, vb, na, nb):
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """For each query vector: top-k corpus neighbors by cosine (self
    excluded). queries: (vec_id, embedding) subset. Brute force = broadcast
    the (small) query set against the corpus — one pass over the corpus, no
    quadratic shuffle; this is the exact baseline the ANN path is judged
    against. Returns (query_id, neighbor_id, cosine, rank)."""
    c = _with_norm(emb).select(F.col("vec_id").alias("neighbor_id"),
                               F.col("v").alias("vc"), F.col("norm").alias("nc"))
    q = _with_norm(queries).select(F.col("vec_id").alias("query_id"),
                                   F.col("v").alias("vq"), F.col("norm").alias("nq"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("vq"), F.col("vc"), F.col("nq"), F.col("nc")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer partitions the corpus
    into cells; queries probe only their ``n_probe`` nearest cells.

    Scale shape: cell anchors are a tiny deterministic sample collected to
    the driver (n_cells x dim floats — the only driver-side data) and
    re-distributed as a BROADCAST-JOINED DataFrame, never as plan-literal
    arrays (a literal anchor array inlines n_cells x dim constants into
    every scoring expression and blows up plan/codegen size from a few
    thousand cells). Cell assignment is corpus x broadcast(anchors) ->
    score -> max_by partial aggregate: the n_cells-way expansion lives only
    inside one whole-stage-codegen pipeline, and the shuffle after the
    map-side combine carries exactly one row per corpus vector. The probe
    is a hash join on cell_id; each query touches ~n_probe/n_cells of the
    corpus. Recall/cost tunes with n_probe.
    """
    withn = _with_norm(emb)
    # deterministic anchors: the n_cells corpus vectors with smallest
    # xxhash64(vec_id) — content-independent, seed-stable sample
    anchor_rows = (
        withn.withColumn(
            "rk", F.xxhash64(F.col("vec_id"))
        ).orderBy("rk").limit(n_cells).select("v", "norm").collect()
    )
    anchors = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in r["v"]], float(r["norm"]))
         for i, r in enumerate(anchor_rows)],
        "cell int, av array<double>, an double",
    )
    # cosine vs anchor; tie order (score DESC, cell DESC) matches the
    # previous literal-array implementation (reverse of an ascending
    # (score, cell) struct sort) and the SQL oracle
    anchor_score = F.when(
        (F.col("an") > 0) & (F.col("norm") > 0),
        F.aggregate(F.zip_with("v", "av", lambda x, y: x * y), F.lit(0.0),
                    lambda acc, x: acc + x) / (F.col("an") * F.col("norm")),
    ).otherwise(F.lit(-2.0))

    corpus = (
        withn.crossJoin(F.broadcast(anchors))
        .withColumn("score", anchor_score)
        .groupBy("vec_id")
        .agg(
            F.max_by("cell", F.struct("score", "cell")).alias("cell"),
            F.first("v").alias("vc"),
            F.first("norm").alias("nc"),
        )
        .select(F.col("vec_id").alias("neighbor_id"), "vc", "nc", "cell")
    )
    wq = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.desc("cell"))
    probes = (
        withn.join(queries.select("vec_id"), "vec_id")
        .crossJoin(F.broadcast(anchors))
        .withColumn("score", anchor_score)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("vq"),
            F.col("norm").alias("nq"), "cell",
        )
    )
    cand = (
        corpus.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(_cosine(F.col("vq"), F.col("vc"), F.col("nq"), F.col("nc")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def hyperplane_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-of-dot-product hyperplane LSH.

    Each of ``n_tables`` hash tables buckets vectors by an ``n_planes``-bit
    signature (sign pattern against seed-fixed random hyperplanes). Query
    vectors probe their buckets; candidates are scored exactly and top-k
    selected. Scale path: corpus is hashed ONCE (map-only), the join is on
    (table_id, bucket) — the quadratic scan is replaced by bucket-local
    work, same shape as the text LSH. Recall tunes with n_planes/n_tables.

    Hyperplanes are derived deterministically from the seed via splitmix64
    -> uniform(-1,1) — identical across runs/partitions.
    """
    rng_idx = np.arange(n_tables * n_planes * dim, dtype=np.uint64)
    u = splitmix64(rng_idx + np.uint64(seed) * np.uint64(0x9E37)).astype(np.float64)
    planes = (u / 2**63 - 1.0).reshape(n_tables, n_planes, dim)  # uniform[-1,1)

    def sig_expr(vcol: str):
        # bucket bits per table, computed with JVM expressions
        table_sigs = []
        for t in range(n_tables):
            bits = []
            for p in range(n_planes):
                coeffs = F.array([F.lit(float(c)) for c in planes[t, p]])
                dot = F.aggregate(
                    F.zip_with(F.col(vcol), coeffs, lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x,
                )
                bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
            sig = bits[0]
            for bb in bits[1:]:
                sig = sig + bb
            table_sigs.append(F.struct(F.lit(t).alias("table_id"), sig.alias("bucket")))
        return F.array(*table_sigs)

    c = _with_norm(emb).withColumn("tables", sig_expr("v"))
    q = _with_norm(queries).withColumn("tables", sig_expr("v"))
    c_b = c.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vc"),
        F.col("norm").alias("nc"), F.explode("tables").alias("tb")
    ).select("neighbor_id", "vc", "nc", "tb.table_id", "tb.bucket")
    q_b = q.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("vq"),
        F.col("norm").alias("nq"), F.explode("tables").alias("tb")
    ).select("query_id", "vq", "nq", "tb.table_id", "tb.bucket")
    cand = (
        c_b.join(F.broadcast(q_b), ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "vq", "nq", "vc", "nc")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(_cosine(F.col("vq"), F.col("vc"), F.col("nq"), F.col("nc")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ann_recall_report(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Recall@k of each approximate method vs the brute-force truth — the
    similarity-search analog of doc_dedup.recall_report (the north rule's
    headline recall metric, applied to the ANN channel). Two rows:
    (method 'lsh'|'ivf', k, n_truth, n_found, recall).

    The truth set (brute top-k over the query sample) is computed once and
    persisted across the two method joins; each method's found set joins it
    on (query_id, neighbor_id) — count-only aggregates, so the report costs
    one corpus pass per method plus two tiny joins, never a second
    quadratic pass.
    """
    truth = (
        cosine_topk_bruteforce(emb, queries, k=k)
        .select("query_id", "neighbor_id")
        .persist()
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))

    def one(method: str, found: DataFrame) -> DataFrame:
        return (
            found.select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("n_found"))
            .crossJoin(n_truth)
            .select(
                F.lit(method).alias("method"),
                F.lit(k).cast("long").alias("k"),
                "n_truth",
                "n_found",
                F.round(
                    F.col("n_found") / F.greatest(F.col("n_truth"), F.lit(1)), 6
                ).alias("recall"),
            )
        )

    return one("lsh", hyperplane_lsh_topk(emb, queries, k=k)).unionByName(
        one("ivf", ivf_topk(emb, queries, k=k))
    )
