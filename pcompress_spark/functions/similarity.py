"""Similarity search over embedding columns: brute-force cosine top-k,
a hyperplane-LSH bucketed approximate variant, and an IVF-flat variant.

No direct reference analog (pcompress has no vector search); this is the
training-data-pipeline extension mandated by the build brief. Semantics:
all similarity math is float64 with LEFT-TO-RIGHT accumulation across
dimensions (kernels.fold_dot — vectorized across rows in Arrow batches,
but the per-row operation sequence is identical to the Catalyst
``aggregate(zip_with(...))`` fold it replaced and to the DuckDB oracle's
``list_reduce`` fold, so scores are bit-reproducible, not merely close).
Ordering is made deterministic by rounding the score (JVM ``round``,
HALF_UP — kept out of the kernels so engine and oracle rounding rules
stay the single pair already proven equal) and tie-breaking on vec_id, so
results are stable across partitionings and match the SQL oracle exactly.

Why kernels and not JVM expressions: per-row ``aggregate``/``zip_with``
higher-order functions are interpreted (never whole-stage codegen), and
unrolling them per hyperplane inlines n_tables*n_planes*dim literals into
the plan — at the previous 8x6x64 that was ~3k literal leaves, dominating
both analysis time and per-row cost. One Arrow batch through numpy does
the same math at memory bandwidth; all mapInPandas UDFs are wrapped in
kernels.trim_after (worker arena hygiene, see kernels.trim_memory).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import cache, kernels
from ..kernels import splitmix64


def _stack64(series) -> np.ndarray:
    """pd.Series of float arrays -> (n, dim) float64 (the widening cast is
    exact, same as the JVM array<float> -> array<double> cast)."""
    return np.stack(series.to_numpy()).astype(np.float64)


def _prep(emb: DataFrame, planes: np.ndarray | None = None) -> DataFrame:
    """(vec_id, embedding) -> (vec_id, v array<double>, norm double
    [, buckets array<bigint>]) in one map-only Arrow pass.

    norm is the left-fold sum of squares (kernels.fold_norm); buckets[t]
    is the n_planes-bit hyperplane sign signature for table t
    (kernels.lsh_bucket_matrix) when ``planes`` is given.
    """
    schema = "vec_id bigint, v array<double>, norm double"
    if planes is not None:
        schema += ", buckets array<bigint>"
    pl = planes

    @kernels.trim_after
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = _stack64(pdf["embedding"])
            out = {
                "vec_id": pdf["vec_id"].to_numpy(),
                "v": list(V),
                "norm": kernels.fold_norm(V),
            }
            if pl is not None:
                out["buckets"] = list(kernels.lsh_bucket_matrix(V, pl))
            yield pd.DataFrame(out)

    return emb.select("vec_id", "embedding").mapInPandas(gen, schema)


def _score_pairs(cand: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, vq, nq, vc, nc) -> (query_id, neighbor_id,
    cosine) — raw (unrounded) cosine; callers apply the JVM round(.., 6).
    ``cosine = dot / (nq * nc)`` when both norms > 0 else 0.0, the same
    expression tree as the previous per-pair Catalyst fold."""

    @kernels.trim_after
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            A = _stack64(pdf["vq"])
            B = _stack64(pdf["vc"])
            na = pdf["nq"].to_numpy(dtype=np.float64)
            nb = pdf["nc"].to_numpy(dtype=np.float64)
            dot = kernels.fold_dot(A, B)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where((na > 0) & (nb > 0), dot / (na * nb), 0.0)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cosine": cos,
                }
            )

    return cand.select("query_id", "neighbor_id", "vq", "nq", "vc", "nc").mapInPandas(
        gen, "query_id bigint, neighbor_id bigint, cosine double"
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("long").alias("rank"))
    )


def cosine_topk_bruteforce(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """For each query vector: top-k corpus neighbors by cosine (self
    excluded). queries: (vec_id, embedding) subset. Brute force = broadcast
    the (small) query set against the corpus — one pass over the corpus, no
    quadratic shuffle; this is the exact baseline the ANN path is judged
    against. Returns (query_id, neighbor_id, cosine, rank)."""
    c = _prep(emb).select(F.col("vec_id").alias("neighbor_id"),
                          F.col("v").alias("vc"), F.col("norm").alias("nc"))
    q = _prep(queries).select(F.col("vec_id").alias("query_id"),
                              F.col("v").alias("vq"), F.col("norm").alias("nq"))
    cand = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = _score_pairs(cand).withColumn("cosine", F.round("cosine", 6))
    return _topk(scored, k)


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
    shipped to the assignment kernel as a closure ndarray (never
    plan-literal arrays: a literal anchor array inlines n_cells x dim
    constants into every scoring expression and blows up plan/codegen size
    from a few thousand cells). Cell assignment and probe selection are
    MAP-ONLY — the n_cells-way score expansion lives inside one numpy batch
    and one row per corpus vector (resp. n_probe per query) comes out; no
    shuffle until the cell hash join. Each query touches ~n_probe/n_cells
    of the corpus. Recall/cost tunes with n_probe.
    """
    # persisted: referenced three times (anchor collect, corpus cell
    # assignment, probe side) — without it the prep UDF re-scans the corpus
    # per reference, the same fan-out lesson as doc_dedup's signatures
    prepped = cache.persist(_prep(emb))
    # deterministic anchors: the n_cells corpus vectors with smallest
    # xxhash64(vec_id) — content-independent, seed-stable sample
    anchor_rows = (
        prepped.withColumn("rk", F.xxhash64(F.col("vec_id")))
        .orderBy("rk").limit(n_cells).select("v", "norm").collect()
    )
    av = np.array([r["v"] for r in anchor_rows], dtype=np.float64)
    an = np.array([r["norm"] for r in anchor_rows], dtype=np.float64)

    def _cell_scores(V: np.ndarray, nv: np.ndarray) -> np.ndarray:
        """(n, n_cells) anchor cosine; -2.0 where either norm is 0 (same
        fallback the previous JVM CASE used, and the SQL oracle uses)."""
        n = V.shape[0]
        S = np.empty((n, len(av)), dtype=np.float64)
        for c in range(len(av)):
            with np.errstate(divide="ignore", invalid="ignore"):
                S[:, c] = np.where(
                    (an[c] > 0) & (nv > 0),
                    kernels.fold_dot(V, av[c]) / (an[c] * nv),
                    -2.0,
                )
        return S

    @kernels.trim_after
    def assign_gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = _stack64(pdf["v"])
            S = _cell_scores(V, pdf["norm"].to_numpy(dtype=np.float64))
            # max_by(cell, struct(score, cell)): ties -> larger cell wins
            best = np.zeros(len(V), dtype=np.int64)
            best_s = S[:, 0].copy()
            for c in range(1, S.shape[1]):
                upd = S[:, c] >= best_s
                best[upd] = c
                best_s[upd] = S[upd, c]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "v": pdf["v"],
                 "norm": pdf["norm"].to_numpy(), "cell": best}
            )

    np_probe = n_probe

    @kernels.trim_after
    def probe_gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = _stack64(pdf["v"])
            S = _cell_scores(V, pdf["norm"].to_numpy(dtype=np.float64))
            n, C = S.shape
            cells2d = np.broadcast_to(np.arange(C, dtype=np.int64), (n, C))
            # primary: score DESC; tie: cell DESC (matches the previous
            # row_number window and the SQL oracle)
            order = np.lexsort((-cells2d, -S))[:, :np_probe]
            rep = np.repeat(pdf["vec_id"].to_numpy(), order.shape[1])
            rv = [v for v, row in zip(pdf["v"], order) for _ in row]
            rn = np.repeat(pdf["norm"].to_numpy(), order.shape[1])
            yield pd.DataFrame(
                {"vec_id": rep, "v": rv, "norm": rn,
                 "cell": np.take_along_axis(cells2d, order, 1).ravel()}
            )

    row_schema = "vec_id bigint, v array<double>, norm double, cell bigint"
    corpus = prepped.mapInPandas(assign_gen, row_schema).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vc"),
        F.col("norm").alias("nc"), "cell",
    )
    probes = (
        prepped.join(queries.select("vec_id"), "vec_id")
        .mapInPandas(probe_gen, row_schema)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("vq"),
                F.col("norm").alias("nq"), "cell")
    )
    cand = (
        corpus.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = (
        _score_pairs(cand)
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round("cosine", 6))
    )
    return _topk(scored, k)


def kmeans_clusters(
    emb: DataFrame, n_clusters: int = 8, n_iters: int = 3
) -> DataFrame:
    """Distributed spherical k-means (Lloyd's iterations) over the
    embedding corpus — the iterative-refinement generalization of the IVF
    coarse quantizer (ivf_topk freezes the anchors; this re-estimates them
    until the pass budget is spent). Returns one row per vector:
    (vec_id, cluster, score) — the final cluster id and the cosine to its
    centroid, rounded 6dp.

    Determinism & oracle parity (every step is bit-reproducible across
    partitionings AND engines):
      - init: the ``n_clusters`` corpus vectors with smallest
        xxhash64(vec_id) (the IVF anchor rule), components 6dp-rounded by
        a JVM ``round`` at collect time;
      - assignment: the same left-to-right fold_dot/fold_norm kernels the
        brute/IVF paths use, zero-norm sentinel -2.0, ties -> larger cell
        (max_by semantics, identical to the IVF assign kernel);
      - update: per-component mean as an exact decimal(18,6) sum divided
        once as double and 6dp-rounded — the repo's standard
        order-independent float-aggregate recipe — so every centroid at
        every iteration is a 6dp double identical in both engines. Empty
        clusters carry their previous centroid forward.

    Scale shape (100 TB design point): centroids are k x dim driver
    floats shipped into a MAP-ONLY assignment kernel as a closure ndarray
    (never plan-literal arrays). Each update is one posexplode + hash
    aggregation with map-side partial combine — shuffle volume is
    partitions x k x dim partial rows, never corpus-sized — plus a
    k x dim driver collect (the same legitimate driver traffic MLlib's
    own Lloyd's loop incurs). The corpus is read n_iters + 1 times from
    the persisted prep stage; point it at a stage table at warehouse
    scale, as the transcript pipeline does with signatures.
    """
    _prepped, final = _kmeans_fit(emb, n_clusters, n_iters)
    return final.select(
        "vec_id",
        F.col("cell").alias("cluster"),
        F.round("score", 6).alias("score"),
    )


def _kmeans_fit(
    emb: DataFrame, n_clusters: int, n_iters: int
) -> tuple[DataFrame, DataFrame]:
    """Shared k-means core -> (prepped vectors, raw final assignment
    (vec_id, cell, score<unrounded>)). kmeans_clusters exposes the
    assignment alone; semdedup needs the persisted prep stage too (its
    intra-cluster rescore joins vectors back per candidate pair)."""
    prepped = cache.persist(_prep(emb))
    anchor_rows = (
        prepped.withColumn("rk", F.xxhash64(F.col("vec_id")))
        .orderBy("rk").limit(n_clusters)
        .select(F.transform("v", lambda x: F.round(x, 6)).alias("cv"))
        .collect()
    )
    cents = np.array([r["cv"] for r in anchor_rows], dtype=np.float64)

    def assign(cents_arr: np.ndarray, with_score: bool) -> DataFrame:
        cn = kernels.fold_norm(cents_arr)

        @kernels.trim_after
        def gen(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                V = _stack64(pdf["v"])
                nv = pdf["norm"].to_numpy(dtype=np.float64)
                S = np.empty((len(V), len(cents_arr)), dtype=np.float64)
                for c in range(len(cents_arr)):
                    with np.errstate(divide="ignore", invalid="ignore"):
                        S[:, c] = np.where(
                            (cn[c] > 0) & (nv > 0),
                            kernels.fold_dot(V, cents_arr[c]) / (cn[c] * nv),
                            -2.0,
                        )
                best = np.zeros(len(V), dtype=np.int64)
                best_s = S[:, 0].copy()
                for c in range(1, S.shape[1]):
                    upd = S[:, c] >= best_s
                    best[upd] = c
                    best_s[upd] = S[upd, c]
                out = {"vec_id": pdf["vec_id"].to_numpy(), "cell": best}
                if with_score:
                    out["score"] = best_s
                else:
                    out["v"] = pdf["v"]
                yield pd.DataFrame(out)

        schema = ("vec_id bigint, cell bigint, score double" if with_score
                  else "vec_id bigint, cell bigint, v array<double>")
        return prepped.mapInPandas(gen, schema)

    for _ in range(n_iters):
        rows = (
            assign(cents, with_score=False)
            .select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.round("val", 6).cast("decimal(18,6)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cell", "pos",
                F.round(F.col("s").cast("double") / F.col("n"), 6).alias("cval"),
            )
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[r["cell"], r["pos"]] = r["cval"]
        cents = new

    return prepped, assign(cents, with_score=True)


def semdedup(
    emb: DataFrame,
    threshold: float = 0.4,
    n_clusters: int = 8,
    n_iters: int = 3,
    cfg=None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means partitioning — spherical k-means carves the
    embedding space into ``n_clusters`` cells, pair comparison happens ONLY
    within a cell (the paper's trick for avoiding the all-pairs corpus
    scan), pairs at-or-above the cosine ``threshold`` (the paper's
    1 - eps) are semantic-duplicate edges, and each connected group keeps
    exactly ONE representative: the member LEAST similar to its centroid —
    the paper's keep-low-centroid-similarity choice (§4: keeping examples
    far from the cluster center preserved the most diverse subset), ties
    broken by min vec_id. Singletons form their own group and are kept.

    Returns one row per corpus vector:
    (vec_id, cluster, score, group_id, keep) — the k-means cell, the 6dp
    cosine to its centroid, the semantic-dup group label (min vec_id of
    the component), and the keep verdict.

    Scale shape (100 TB design point): the k-means stages are
    kmeans_clusters' audited plan (map-only assignment against broadcast
    centroids, decimal-exact partial-agg updates); intra-cell pair
    generation routes through THE shared salted/capped/logged
    ``bucket_members`` with the cell id as the bucket key, so a degenerate
    cell (one mega-cluster of near-identical vectors) is deterministically
    sampled to ``cfg.bucket_cap`` members instead of exploding
    quadratically — at real scale n_clusters is sized so cells land under
    the cap (the paper uses corpus_size/10k clusters). Rescore joins move
    only candidate-pair vectors; the group label rides the shared long-key
    agg+join connected-components operator; the keep verdict is one
    skew-safe groupBy(group).min(struct) + an id-keyed join back.
    """
    from ..config import DedupConfig
    from ..operators.candidates import bucket_members, bucket_pairs
    from ..operators.cluster import connected_components

    cfg = cfg or DedupConfig()
    prepped, raw = _kmeans_fit(emb, n_clusters, n_iters)
    # referenced four times (banding, CC nodes, winner agg, output join)
    asg = cache.persist(raw.select(
        "vec_id", F.col("cell").alias("cluster"),
        F.round("score", 6).alias("score")))
    banded = asg.select(
        "vec_id", F.lit(0).alias("band_idx"),
        F.col("cluster").alias("band_hash"))
    buckets, _stats = bucket_members(
        banded, cfg, id_col="vec_id", persist_sizes=False)
    # one band (the cell id) -> pairs are already distinct
    pairs = bucket_pairs(buckets, "vec_id_a", "vec_id_b")
    a = prepped.select(F.col("vec_id").alias("vec_id_a"),
                       F.col("v").alias("vq"), F.col("norm").alias("nq"))
    b = prepped.select(F.col("vec_id").alias("vec_id_b"),
                       F.col("v").alias("vc"), F.col("norm").alias("nc"))
    cand = (
        pairs.join(a, "vec_id_a").join(b, "vec_id_b")
        .select(F.col("vec_id_a").alias("query_id"),
                F.col("vec_id_b").alias("neighbor_id"),
                "vq", "nq", "vc", "nc")
    )
    edges = (
        _score_pairs(cand)
        .where(F.round("cosine", 6) >= threshold)
        .select(F.col("query_id").alias("ih_a"),
                F.col("neighbor_id").alias("ih_b"))
    )
    nodes = asg.select(F.col("vec_id").alias("conv_id"),
                       F.col("vec_id").alias("id_hash"))
    cc = connected_components(nodes, edges, cfg)
    labeled = asg.join(
        cc.select(F.col("conv_id").cast("long").alias("vec_id"),
                  F.col("cluster_id").cast("long").alias("group_id")),
        "vec_id")
    winners = labeled.groupBy("group_id").agg(
        F.min(F.struct(F.col("score"), F.col("vec_id"))).alias("w"))
    return (
        labeled.join(winners, "group_id")
        .select("vec_id", "cluster", "score", "group_id",
                (F.col("vec_id") == F.col("w.vec_id")).alias("keep"))
    )


def _hyperplanes(n_tables: int, n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Seed-deterministic hyperplane coefficients, uniform[-1, 1), shape
    (n_tables, n_planes, dim) — splitmix64 over a flat index, identical
    across runs/partitions and reproduced verbatim by the DuckDB oracle."""
    rng_idx = np.arange(n_tables * n_planes * dim, dtype=np.uint64)
    u = splitmix64(rng_idx + np.uint64(seed) * np.uint64(0x9E37)).astype(np.float64)
    return (u / 2**63 - 1.0).reshape(n_tables, n_planes, dim)


def embedding_lsh_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    cfg=None,
) -> DataFrame:
    """Embedding near-dup PAIRS above a cosine threshold — the bucketed
    scale path twin of doc_dedup.embedding_cosine_pairs (whose O(n^2)
    self-join is the oracle-checkable brute form). Same shape as the text
    LSH: corpus hashed once into n_tables hyperplane-sign buckets, pair
    generation routed through THE shared salted/capped/logged
    ``bucket_members`` (operators/candidates.py) so a degenerate bucket —
    e.g. a spike of near-identical or zero vectors — is deterministically
    sampled to ``cfg.bucket_cap`` members instead of exploding
    quadratically; candidates are then scored exactly (kernels.fold_dot,
    bit-identical to the brute path) and filtered on the rounded cosine.

    Approximate by construction: a pair is emitted only if it collides in
    at least one table, so recall < 1 vs the brute form (tunable via
    n_planes/n_tables), but every emitted pair carries its EXACT cosine.
    Returns (vec_id_a, vec_id_b, cosine) with vec_id_a < vec_id_b.
    """
    from ..config import DedupConfig
    from ..operators.candidates import bucket_members, bucket_pairs

    cfg = cfg or DedupConfig()
    planes = _hyperplanes(n_tables, n_planes, dim, seed)
    # persisted: referenced three times (banding + both exact-score sides)
    prepped = cache.persist(_prep(emb, planes=planes))
    banded = prepped.select(
        "vec_id", F.posexplode("buckets").alias("band_idx", "band_hash")
    )
    # vec_id doubles as the salt: sequential ids under pmod give the same
    # deterministic 1-in-ceil(m/cap) sample the oracle's pymod reproduces
    buckets, _stats = bucket_members(
        banded, cfg, id_col="vec_id", persist_sizes=False
    )
    # a pair colliding in several tables appears once per table — dedupe
    # BEFORE the vector join so each pair is scored exactly once
    pairs = bucket_pairs(buckets, "vec_id_a", "vec_id_b").distinct()
    a = prepped.select(F.col("vec_id").alias("vec_id_a"),
                       F.col("v").alias("vq"), F.col("norm").alias("nq"))
    b = prepped.select(F.col("vec_id").alias("vec_id_b"),
                       F.col("v").alias("vc"), F.col("norm").alias("nc"))
    cand = (
        pairs.join(a, "vec_id_a").join(b, "vec_id_b")
        .select(F.col("vec_id_a").alias("query_id"),
                F.col("vec_id_b").alias("neighbor_id"),
                "vq", "nq", "vc", "nc")
    )
    return (
        _score_pairs(cand)
        .select(F.col("query_id").alias("vec_id_a"),
                F.col("neighbor_id").alias("vec_id_b"),
                F.round("cosine", 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_clusters(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    cfg=None,
) -> DataFrame:
    """Semantic near-dup clusters over the embeddings table: connected
    components of the bucketed embedding_lsh_pairs edges, labeled with the
    min vec_id of the component (singletons map to self) — the embedding
    twin of doc_dedup.neardup_clusters, on the same long-key agg+join CC
    (operators/cluster.py — no collect_set, skew-safe at 10^12 rows).

    No separate exact-dup star edge is needed: byte-identical vectors
    always produce identical hyperplane signs, so exact duplicates are
    GUARANTEED to collide in every table and surface as cosine-1.0 pairs.
    Returns (vec_id, cluster_id)."""
    from ..config import DedupConfig
    from ..operators.cluster import connected_components

    cfg = cfg or DedupConfig()
    edges = embedding_lsh_pairs(
        emb, threshold, n_planes, n_tables, dim, seed, cfg
    ).select(F.col("vec_id_a").alias("ih_a"), F.col("vec_id_b").alias("ih_b"))
    nodes = emb.select(F.col("vec_id").alias("conv_id"),
                       F.col("vec_id").alias("id_hash"))
    cc = connected_components(nodes, edges, cfg)
    return cc.select(F.col("conv_id").cast("long").alias("vec_id"),
                     F.col("cluster_id").cast("long").alias("cluster_id"))


def embedding_pair_recall_report(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    cfg=None,
) -> DataFrame:
    """One-row recall audit of the bucketed embedding pair path against the
    brute-force truth at the same threshold — the embedding twin of
    doc_dedup.recall_report (the north rule's headline metric, applied to
    the vector channel). Returns (threshold, n_truth, n_found, recall).

    The LSH path's emitted pairs are a SUBSET of the brute pairs with
    identical cosines (same fold-exact kernel), so found-set membership is
    a plain inner join on the id pair — count-only aggregates, one corpus
    pass per side."""
    from .doc_dedup import embedding_cosine_pairs

    truth = embedding_cosine_pairs(emb, threshold).select("vec_id_a", "vec_id_b")
    found = embedding_lsh_pairs(
        emb, threshold, n_planes, n_tables, dim, seed, cfg
    ).select("vec_id_a", "vec_id_b")
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    return (
        found.join(truth, ["vec_id_a", "vec_id_b"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_found"))
        .crossJoin(n_truth)
        .select(
            F.lit(threshold).cast("double").alias("threshold"),
            "n_truth",
            "n_found",
            F.round(
                F.col("n_found") / F.greatest(F.col("n_truth"), F.lit(1)), 6
            ).alias("recall"),
        )
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
    selected. Scale path: corpus is hashed ONCE (map-only Arrow batch —
    all n_tables * n_planes sign bits in one numpy pass, no per-plane
    expression unrolling), the join is on (table_id, bucket) — the
    quadratic scan is replaced by bucket-local work, same shape as the
    text LSH. Recall tunes with n_planes/n_tables.

    Hyperplanes are derived deterministically from the seed via splitmix64
    -> uniform(-1,1) — identical across runs/partitions.

    Plan shape: the bucket join moves ONLY (id, table_id, bucket) triples —
    carrying the full vector through the n_tables posexplode would
    duplicate every corpus vector n_tables times through the exchange, and
    a degenerate bucket (a spike of identical vectors) would multiply that
    again by its co-bucketed query count. Candidate IDs are deduplicated
    first; the vectors join back once per unique (query, neighbor) pair —
    the candidate side is query-bounded (AQE broadcasts it), so the corpus
    vector table is scanned, never shuffled.
    """
    planes = _hyperplanes(n_tables, n_planes, dim, seed)
    prepped_c = cache.persist(_prep(emb, planes=planes))
    prepped_q = cache.persist(_prep(queries, planes=planes))

    def banded(prepped: DataFrame, id_alias: str) -> DataFrame:
        return prepped.select(
            F.col("vec_id").alias(id_alias),
            F.posexplode("buckets").alias("table_id", "bucket"),
        )

    pair_ids = (
        banded(prepped_c, "neighbor_id")
        .join(F.broadcast(banded(prepped_q, "query_id")),
              ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cand = pair_ids.join(
        prepped_c.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("vc"), F.col("norm").alias("nc"),
        ),
        "neighbor_id",
    ).join(
        F.broadcast(prepped_q.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("vq"), F.col("norm").alias("nq"),
        )),
        "query_id",
    )
    scored = _score_pairs(cand).withColumn("cosine", F.round("cosine", 6))
    return _topk(scored, k)


def hyperplane_multiprobe_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Multi-probe hyperplane LSH (Lv et al., VLDB 2007): each query
    probes its exact bucket AND the bucket across its least-confident
    plane (min |dot|, deterministic first-plane tie-break) in every
    table — 2x the probes against the SAME corpus index, recovering the
    near-misses single-probe loses when a query sits close to a
    hyperplane, without the memory cost of more tables.

    Same plan shape as hyperplane_lsh_topk: the corpus is hashed once,
    the bucket join moves only (id, table_id, bucket) triples with the
    query probe set broadcast, candidates dedupe before the vector
    rescore, exact cosines, window top-k."""
    pair_ids, prepped_c, prepped_q = _multiprobe_candidates(
        emb, queries, n_planes, n_tables, dim, seed)
    cand = pair_ids.join(
        prepped_c.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("vc"), F.col("norm").alias("nc"),
        ),
        "neighbor_id",
    ).join(
        F.broadcast(prepped_q.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("vq"), F.col("norm").alias("nq"),
        )),
        "query_id",
    )
    scored = _score_pairs(cand).withColumn("cosine", F.round("cosine", 6))
    return _topk(scored, k)


def _multiprobe_candidates(
    emb: DataFrame,
    queries: DataFrame,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared multi-probe candidate generation -> (pair_ids, prepped_c,
    prepped_q). pair_ids is the deduped (query_id, neighbor_id) candidate
    set from the exact-bucket and least-confident-plane probes; prepped_*
    carry (vec_id, v, norm[, buckets...]) for the exact rescore. Consumers:
    hyperplane_multiprobe_topk (top-k), hard_negatives_lsh (label-filtered
    top-k), knn_label_purity_lsh (neighborhood labels)."""
    planes = _hyperplanes(n_tables, n_planes, dim, seed)
    prepped_c = cache.persist(_prep(emb, planes=planes))

    pl = planes

    @kernels.trim_after
    def gen_q(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = _stack64(pdf["embedding"])
            buckets, alts = kernels.lsh_bucket_alt_matrix(V, pl)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "v": list(V),
                "norm": kernels.fold_norm(V),
                "buckets": list(buckets),
                "alts": list(alts),
            })

    prepped_q = cache.persist(
        queries.select("vec_id", "embedding").mapInPandas(
            gen_q,
            "vec_id bigint, v array<double>, norm double, "
            "buckets array<bigint>, alts array<bigint>",
        )
    )
    probes = (
        prepped_q.select(
            F.col("vec_id").alias("query_id"),
            F.posexplode("buckets").alias("table_id", "bucket"))
        .unionByName(prepped_q.select(
            F.col("vec_id").alias("query_id"),
            F.posexplode("alts").alias("table_id", "bucket")))
        .distinct()
    )
    banded_c = prepped_c.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode("buckets").alias("table_id", "bucket"),
    )
    pair_ids = (
        banded_c.join(F.broadcast(probes), ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return pair_ids, prepped_c, prepped_q


def ann_recall_report(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Recall@k of each approximate method vs the brute-force truth — the
    similarity-search analog of doc_dedup.recall_report (the north rule's
    headline recall metric, applied to the ANN channel). Three rows:
    (method 'lsh'|'multiprobe'|'ivf', k, n_truth, n_found, recall).

    The truth set (brute top-k over the query sample) is computed once and
    persisted across the method joins; each method's found set joins it
    on (query_id, neighbor_id) — count-only aggregates, so the report costs
    one corpus pass per method plus tiny joins, never a second
    quadratic pass.
    """
    truth = cache.persist(
        cosine_topk_bruteforce(emb, queries, k=k)
        .select("query_id", "neighbor_id")
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

    return (
        one("lsh", hyperplane_lsh_topk(emb, queries, k=k))
        .unionByName(
            one("multiprobe", hyperplane_multiprobe_topk(emb, queries, k=k)))
        .unionByName(one("ivf", ivf_topk(emb, queries, k=k)))
    )


def hard_negatives(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: per query
    vector, the k most-cosine-similar corpus vectors with a DIFFERENT
    label — the near-miss examples a contrastive loss learns the most
    from (same construction as dense-retriever training sets mined from
    an ANN index). One row per (query, negative):
    (query_id, query_label, neighbor_id, neighbor_label, cosine, rank).

    Scale shape: labels ride the pair BUILDER (corpus side joined
    id-to-id before the broadcast-query cross), so the same-label filter
    runs before scoring and the rank window sees negatives only; the
    |queries| x k result re-attaches labels through broadcast-pair joins
    (the knn_label_purity shape) — the corpus is never exchanged on a
    pair key.

    This is the TRUTH channel: O(|Q| x |C|) scored pairs, right only for
    bounded query samples; the production path at corpus scale is
    hard_negatives_lsh (same semantics over the multi-probe bucket index,
    recall audited against this form in tests).

    Query labels come from ``queries`` itself when it carries a ``label``
    column; otherwise they are looked up in ``emb``, which requires every
    query vec_id to exist in the corpus — a query absent from the label
    source has no label and is omitted (pass labels on the queries frame
    to make the contract self-contained)."""
    labels = emb.select("vec_id", "label")
    q_labels = (queries.select("vec_id", "label")
                if "label" in queries.columns else labels)
    c = _prep(emb).join(labels, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vc"),
        F.col("norm").alias("nc"), F.col("label").alias("nl"))
    q = _prep(queries).join(q_labels, "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("vq"),
        F.col("norm").alias("nq"), F.col("label").alias("ql"))
    cand = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("nl") != F.col("ql")),
    )
    scored = _score_pairs(cand).withColumn("cosine", F.round("cosine", 6))
    top = _topk(scored, k)
    enriched = labels.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
    ).join(F.broadcast(top), "neighbor_id")
    return (
        q_labels.select(F.col("vec_id").alias("query_id"),
                        F.col("label").alias("query_label"))
        .join(F.broadcast(enriched), "query_id")
        .select("query_id", "query_label", "neighbor_id",
                "neighbor_label", "cosine", "rank")
    )


def hard_negatives_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Bucketed hard-negative mining — the production-scale form of
    hard_negatives: candidates come from the multi-probe hyperplane index
    (_multiprobe_candidates, the same bucket join every other ANN consumer
    rides), the DIFFERENT-label filter is applied to the candidate ID set
    through id-keyed label joins, and only surviving pairs are exactly
    rescored. Per-query cost is bounded by bucket occupancy, never
    O(|corpus|); no query x corpus cross join appears in the plan (the
    dump_plans check pins this). Recall vs the brute truth channel is
    audited in tests and tunes with n_planes/n_tables exactly like
    hyperplane_multiprobe_topk.

    Output schema matches hard_negatives:
    (query_id, query_label, neighbor_id, neighbor_label, cosine, rank) —
    rank windows over the label-filtered candidate set. Query labels come
    from ``queries`` when it has a ``label`` column, else from ``emb``
    (subset contract as in hard_negatives)."""
    pair_ids, prepped_c, prepped_q = _multiprobe_candidates(
        emb, queries, n_planes, n_tables, dim, seed)
    labels = emb.select("vec_id", "label")
    q_labels = (queries.select("vec_id", "label")
                if "label" in queries.columns else labels)
    neg_ids = (
        pair_ids
        .join(labels.select(F.col("vec_id").alias("neighbor_id"),
                            F.col("label").alias("nl")), "neighbor_id")
        .join(F.broadcast(q_labels.select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("ql"))), "query_id")
        .where(F.col("nl") != F.col("ql"))
        .select("query_id", "neighbor_id")
    )
    cand = neg_ids.join(
        prepped_c.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("vc"), F.col("norm").alias("nc"),
        ),
        "neighbor_id",
    ).join(
        F.broadcast(prepped_q.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("vq"), F.col("norm").alias("nq"),
        )),
        "query_id",
    )
    scored = _score_pairs(cand).withColumn("cosine", F.round("cosine", 6))
    top = _topk(scored, k)
    enriched = labels.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
    ).join(F.broadcast(top), "neighbor_id")
    return (
        q_labels.select(F.col("vec_id").alias("query_id"),
                        F.col("label").alias("query_label"))
        .join(F.broadcast(enriched), "query_id")
        .select("query_id", "query_label", "neighbor_id",
                "neighbor_label", "cosine", "rank")
    )


def knn_label_purity_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Label purity over the APPROXIMATE (multi-probe LSH) k-NN
    neighborhood — the production-scale form of knn_label_purity: the
    neighborhood comes from hyperplane_multiprobe_topk (bucket-bounded,
    no corpus cross join) instead of the brute pass; the label
    aggregation is identical. At web scale the purity estimate inherits
    the index's recall (audited by ann_recall_report); the brute form
    stays the truth channel for bounded samples."""
    pairs = hyperplane_multiprobe_topk(
        emb, queries, k=k, n_planes=n_planes, n_tables=n_tables,
        dim=dim, seed=seed,
    ).select("query_id", "neighbor_id")
    labels = emb.select("vec_id", "label")
    nb = labels.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
    ).join(F.broadcast(pairs), "neighbor_id")
    enriched = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("query_label")
    ).join(F.broadcast(nb), "query_id")
    match = F.when(
        F.col("neighbor_label") == F.col("query_label"), F.lit(1)
    ).otherwise(F.lit(0))
    return enriched.groupBy("query_id", "query_label").agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        F.sum(match).cast("long").alias("n_match"),
        F.round(
            F.sum(match).cast("double") / F.count(F.lit(1)), 6
        ).alias("purity"),
    )


def knn_label_purity(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Per-query label consistency of the brute-force k-NN neighborhood —
    the standard embedding-space quality probe a training-data pipeline
    runs before trusting embedding-cosine near-dup thresholds: if a
    vector's nearest neighbors rarely share its label, cosine distance in
    this space is not meaningful for dedup/retrieval. One row per query:
    (query_id, query_label, n_neighbors, n_match, purity), purity rounded
    6dp.

    Scale shape: the truth set is one corpus pass (cosine_topk_bruteforce
    broadcasts the query sample). The (query_id, neighbor_id) pair list is
    bounded by |queries| * k, so BOTH label probes broadcast the pair list
    into a plain (vec_id, label) corpus scan — the corpus is never
    exchanged on a pair key (same join shape as the pipeline verify
    stage). The final aggregate groups on query_id: at most k rows per
    group, skew-free by construction.
    """
    pairs = cosine_topk_bruteforce(emb, queries, k=k).select(
        "query_id", "neighbor_id"
    )
    labels = emb.select("vec_id", "label")
    nb = labels.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
    ).join(F.broadcast(pairs), "neighbor_id")
    enriched = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("query_label")
    ).join(F.broadcast(nb), "query_id")
    match = F.when(
        F.col("neighbor_label") == F.col("query_label"), F.lit(1)
    ).otherwise(F.lit(0))
    return enriched.groupBy("query_id", "query_label").agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        F.sum(match).cast("long").alias("n_match"),
        F.round(
            F.sum(match).cast("double") / F.count(F.lit(1)), 6
        ).alias("purity"),
    )
