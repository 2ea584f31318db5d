"""Approximate (rows-only) doc operators validated against exact baselines."""

import pytest
from pyspark.sql import functions as F

from pcompress_spark.functions import doc_dedup, similarity
from pcompress_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_minhash_lsh_vs_bruteforce(spark, docs):
    """LSH pairs must agree with the brute-force n-gram Jaccard on values and
    achieve high recall at a threshold above the LSH design point."""
    brute = doc_dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3).toPandas()
    lsh = doc_dedup.minhash_lsh_pairs(docs, threshold=0.3).toPandas()
    bmap = {(a, b): j for a, b, j in zip(brute.doc_id_a, brute.doc_id_b, brute.jaccard)}
    lmap = {(a, b): j for a, b, j in zip(lsh.doc_id_a, lsh.doc_id_b, lsh.jaccard)}
    # identical jaccard on shared pairs (same 3-gram set cardinalities)
    for k in set(bmap) & set(lmap):
        assert abs(bmap[k] - lmap[k]) < 1e-9, k
    strong = {k for k, j in bmap.items() if j >= 0.5}
    if strong:
        rec = len(strong & set(lmap)) / len(strong)
        assert rec >= 0.99, f"LSH recall {rec} on strong pairs"


def test_doc_signature_udf_runs_once_per_query(spark, docs):
    """The signature frame fans out to banding + both verify sides; the
    persist must collapse that to ONE physical Python-map instance — every
    reference reads the same cached relation (the formatted plan re-prints
    the cached body under each InMemoryTableScan, but all MapInArrow
    occurrences must carry the SAME node id). The signature UDF is
    Arrow-native since r6 (MapInArrow, zero per-row objects)."""
    import io
    import re
    from contextlib import redirect_stdout

    for df in (doc_dedup.minhash_lsh_pairs(docs, threshold=0.3),
               doc_dedup.simhash_pairs(docs, max_hamming=6)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        ids = set(re.findall(r"MapIn(?:Arrow|Pandas) \((\d+)\)", plan))
        assert len(ids) == 1, f"signature UDF appears as {ids} distinct nodes"
        assert "InMemoryRelation" in plan, plan


def test_simhash_pairs_symmetric_and_bounded(spark, docs):
    pairs = doc_dedup.simhash_pairs(docs, max_hamming=6).toPandas()
    assert (pairs.hamming <= 6).all()
    assert (pairs.doc_id_a < pairs.doc_id_b).all()
    assert not pairs.duplicated(["doc_id_a", "doc_id_b"]).any()


def test_ivf_anchor_broadcast_plan_size(spark, emb):
    """Anchors must ride a broadcast join, not plan-literal arrays: at
    n_cells=256 a literal encoding inlines 256 x dim doubles into every
    scoring expression and the plan text explodes; the broadcast version
    stays flat."""
    import io
    from contextlib import redirect_stdout

    q = emb.where(F.col("vec_id") % 100 == 0)
    df = similarity.ivf_topk(emb, q, k=5, n_cells=256, n_probe=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert len(plan) < 120_000, f"plan text {len(plan)} chars — literals leaked?"
    assert df.count() > 0


def test_kmeans_optimal_assignment_and_determinism(spark, emb):
    """Lloyd's invariants, checked against an independent numpy replay:
    every vector is assigned to its argmax-cosine centroid (ties ->
    larger cell), more iterations never worsen the total objective, and
    the result is identical under input repartitioning."""
    import numpy as np

    out = similarity.kmeans_clusters(emb, n_clusters=8, n_iters=3).toPandas()
    n = emb.count()
    assert len(out) == n and out.vec_id.is_unique
    assert out.cluster.between(0, 7).all()

    # independent replay: recompute the final centroids from the engine's
    # own assignments at iteration 3 is circular — instead replay the WHOLE
    # loop in numpy from the same deterministic init and compare.
    pdf = emb.toPandas().sort_values("vec_id")
    V = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    rk = (
        similarity._prep(emb).withColumn("rk", F.xxhash64(F.col("vec_id")))
        .select("vec_id", "rk").toPandas().set_index("vec_id").rk
    )
    order = np.argsort(rk[ids].to_numpy(), kind="stable")
    cents = np.round(V[order[:8]], 6)

    def norms(M):
        return np.sqrt((M * M).sum(axis=1))

    def assign(C):
        cn = norms(C)
        nv = norms(V)
        S = np.where(
            (cn[None, :] > 0) & (nv[:, None] > 0),
            V @ C.T / (nv[:, None] * cn[None, :]), -2.0,
        )
        # ties -> larger cell (the engine's max_by rule)
        best = (S.shape[1] - 1) - np.argmax(S[:, ::-1], axis=1)
        return best, S[np.arange(len(V)), best]

    for _ in range(3):
        best, _s = assign(cents)
        new = cents.copy()
        for c in range(8):
            m = best == c
            if m.any():
                comp = np.round(V[m], 6)
                new[c] = np.round(comp.sum(axis=0) / m.sum(), 6)
        cents = new
    best, score = assign(cents)
    got = out.set_index("vec_id")
    # np dot accumulates in a different order than fold_dot, so compare
    # assignments (discrete) and scores loosely
    assert (got.loc[ids].cluster.to_numpy() == best).all()
    assert np.abs(got.loc[ids].score.to_numpy() - np.round(score, 6)).max() < 1e-5

    # objective is (weakly) improved by iterating
    one = similarity.kmeans_clusters(emb, n_clusters=8, n_iters=1).toPandas()
    assert out.score.sum() >= one.score.sum() - 1e-6

    # deterministic under repartitioning
    out2 = similarity.kmeans_clusters(
        emb.repartition(7), n_clusters=8, n_iters=3).toPandas()
    a = out.sort_values("vec_id").reset_index(drop=True)
    b = out2.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_semdedup_invariants(spark, emb):
    """SemDeDup structural invariants: one row per vector; exactly one
    keeper per semantic-dup group; the keeper is the group's
    (score ASC, vec_id ASC) arg-min (keep-low-centroid-similarity);
    groups never span k-means cells (pairs are generated intra-cell
    only); cluster/score columns agree with kmeans_clusters at the same
    config."""
    out = similarity.semdedup(
        emb, threshold=0.4, n_clusters=8, n_iters=3).toPandas()
    n = emb.count()
    assert len(out) == n and out.vec_id.is_unique

    per_group = out.groupby("group_id")
    assert (per_group.keep.sum() == 1).all(), "exactly one keeper per group"
    for _gid, g in per_group:
        w = g.sort_values(["score", "vec_id"]).iloc[0]
        assert g.loc[g.keep, "vec_id"].iloc[0] == w.vec_id
        assert g.cluster.nunique() == 1, "group spans k-means cells"

    # at least one non-trivial group at this threshold on the fixture
    assert (per_group.size() >= 2).any()
    dropped = out.loc[~out.keep]
    assert len(dropped) == n - out.group_id.nunique()

    km = similarity.kmeans_clusters(emb, n_clusters=8, n_iters=3).toPandas()
    a = out[["vec_id", "cluster", "score"]].sort_values("vec_id").reset_index(drop=True)
    b = km.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_multiprobe_recall_dominates_single_probe(spark, emb):
    """Multi-probe candidates are a SUPERSET of single-probe candidates
    (the exact bucket is always probed), so recall@k vs the brute truth
    can only improve; scores stay exact."""
    q = emb.where(F.col("vec_id") % 100 == 0)
    brute = similarity.cosine_topk_bruteforce(emb, q, k=5).toPandas()
    single = similarity.hyperplane_lsh_topk(emb, q, k=5).toPandas()
    multi = similarity.hyperplane_multiprobe_topk(emb, q, k=5).toPandas()
    truth = set(zip(brute.query_id, brute.neighbor_id))
    rs = len(truth & set(zip(single.query_id, single.neighbor_id))) / len(truth)
    rm = len(truth & set(zip(multi.query_id, multi.neighbor_id))) / len(truth)
    assert rm >= rs
    # exact scores on everything emitted
    full = similarity.cosine_topk_bruteforce(emb, q, k=10**6).toPandas()
    fscore = {(r.query_id, r.neighbor_id): r.cosine for r in full.itertuples()}
    for r in multi.itertuples():
        assert abs(fscore[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9
    """Every mined negative has a different label from its query, ranks
    run 1..k, and the negatives are exactly the best-cosine mismatched
    neighbors from the full brute ranking."""
    q = emb.where(F.col("vec_id") % 100 == 0)
    neg = similarity.hard_negatives(emb, q, k=5).toPandas()
    assert (neg.query_label != neg.neighbor_label).all()
    assert set(neg.groupby("query_id")["rank"].apply(
        lambda s: tuple(sorted(s)))) == {(1, 2, 3, 4, 5)}
    # brute list filtered to mismatches reproduces the same top-5
    full = similarity.cosine_topk_bruteforce(emb, q, k=10**6).toPandas()
    labels = emb.select("vec_id", "label").toPandas().set_index("vec_id").label
    full["ql"] = labels[full.query_id].to_numpy()
    full["nl"] = labels[full.neighbor_id].to_numpy()
    mm = full[full.ql != full.nl]
    for qid, grp in neg.groupby("query_id"):
        want = (mm[mm.query_id == qid]
                .sort_values(["cosine", "neighbor_id"],
                             ascending=[False, True]).head(5))
        got = grp.sort_values("rank")
        assert list(got.neighbor_id) == list(want.neighbor_id)
        assert (got.cosine.to_numpy() == want.cosine.to_numpy()).all()


def test_ann_lsh_subset_of_bruteforce_scores(spark, emb):
    """Every LSH result must carry the exact cosine the brute-force computes,
    and per-query recall should clear a floor."""
    q = emb.where(F.col("vec_id") % 100 == 0)
    brute = similarity.cosine_topk_bruteforce(emb, q, k=5).toPandas()
    lsh = similarity.hyperplane_lsh_topk(emb, q, k=5).toPandas()
    bscore = {(r.query_id, r.neighbor_id): r.cosine for r in brute.itertuples()}
    # exact-score agreement on overlap
    full = similarity.cosine_topk_bruteforce(emb, q, k=10**6).toPandas()
    fscore = {(r.query_id, r.neighbor_id): r.cosine for r in full.itertuples()}
    for r in lsh.itertuples():
        assert abs(fscore[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9
    # recall floor (approximate by design; tuned in config)
    hits = sum(1 for k in bscore if k in
               {(r.query_id, r.neighbor_id) for r in lsh.itertuples()})
    assert hits / len(bscore) >= 0.1


def test_embedding_lsh_pairs_subset_of_brute(spark, emb):
    """The bucketed embedding pair path must emit a SUBSET of the brute
    O(n^2) pairs with bit-identical cosines (it rescores candidates through
    the same fold-exact kernel), all above threshold, a < b, no dupes."""
    thr = 0.4
    brute = doc_dedup.embedding_cosine_pairs(emb, threshold=thr).toPandas()
    lsh = similarity.embedding_lsh_pairs(emb, threshold=thr).toPandas()
    bmap = {(r.vec_id_a, r.vec_id_b): r.cosine for r in brute.itertuples()}
    keys = list(zip(lsh.vec_id_a, lsh.vec_id_b))
    assert len(keys) == len(set(keys))  # multi-table collisions deduped
    for r in lsh.itertuples():
        assert r.vec_id_a < r.vec_id_b
        assert r.cosine >= thr
        assert bmap[(r.vec_id_a, r.vec_id_b)] == r.cosine  # exact, not close
    # approximate by design, but must find a real fraction of the pairs
    assert len(keys) >= 0.15 * len(bmap)


def test_embedding_clusters_consistent_with_pairs(spark, emb):
    """Cluster labels must be the min-vec_id connected component of the
    LSH pair edges: every pair shares a label, every label is a member,
    non-paired vectors are singletons labeled self."""
    pairs = similarity.embedding_lsh_pairs(emb, threshold=0.4).toPandas()
    clusters = similarity.embedding_clusters(emb, threshold=0.4).toPandas()
    label = dict(zip(clusters.vec_id, clusters.cluster_id))
    # union-find ground truth from the pair edges
    parent = {v: v for v in clusters.vec_id}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.itertuples():
        ra, rb = find(r.vec_id_a), find(r.vec_id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for v in parent:
        assert label[v] == find(v)


def test_embedding_pair_recall_report(spark, emb):
    rep = similarity.embedding_pair_recall_report(emb, threshold=0.4).collect()
    assert len(rep) == 1
    r = rep[0]
    brute = doc_dedup.embedding_cosine_pairs(emb, threshold=0.4).count()
    found = similarity.embedding_lsh_pairs(emb, threshold=0.4).count()
    assert r.n_truth == brute
    assert r.n_found == found  # subset property: every found pair is truth
    assert 0.0 < r.recall <= 1.0


def test_ivf_recall_vs_bruteforce(spark, emb):
    from pyspark.sql import functions as F
    q = emb.where(F.col("vec_id") % 100 == 0)
    brute = similarity.cosine_topk_bruteforce(emb, q, k=5).toPandas()
    ivf = similarity.ivf_topk(emb, q, k=5, n_cells=16, n_probe=4).toPandas()
    bset = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    iset = {(r.query_id, r.neighbor_id) for r in ivf.itertuples()}
    rec = len(bset & iset) / len(bset)
    assert rec >= 0.4, f"IVF recall {rec}"
    # scores must be the exact cosines
    full = similarity.cosine_topk_bruteforce(emb, q, k=10**6).toPandas()
    fscore = {(r.query_id, r.neighbor_id): r.cosine for r in full.itertuples()}
    for r in ivf.itertuples():
        assert abs(fscore[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_exact_dedup_is_lossless(spark, docs):
    """keep-first dedup keeps exactly one doc per distinct text."""
    kept = doc_dedup.dedup_keep_first(docs).toPandas()
    n_distinct = docs.select("text").distinct().count()
    assert len(kept) == n_distinct


def test_neardup_clusters_partition_and_consistency(spark, docs):
    """Clusters form a partition labeled by the component min; every
    near/exact edge's endpoints share a cluster; singletons self-label."""
    clusters = doc_dedup.neardup_clusters(docs, threshold=0.3).toPandas()
    assert len(clusters) == docs.count()
    lab = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    # label is the min member of its component
    by_cluster = clusters.groupby("cluster_id")["doc_id"].min()
    assert all(cid == mn for cid, mn in by_cluster.items())
    # every verified pair co-clusters
    pairs = doc_dedup.minhash_lsh_pairs(docs, threshold=0.3).toPandas()
    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        assert lab[a] == lab[b], (a, b)
    # exact dups co-cluster
    groups = doc_dedup.exact_dup_groups(docs).toPandas()
    eh = doc_dedup.exact_hash(docs).toPandas()
    md5_lab = dict(zip(eh["doc_id"], eh["content_md5"]))
    for h in groups["content_md5"]:
        members = [d for d, m in md5_lab.items() if m == h]
        assert len({lab[d] for d in members}) == 1


def test_doc_substring_containment(spark):
    """The containment channel must flag a short doc embedded verbatim in a
    much longer one — a pair whose Jaccard is far below any near-dup
    threshold — and report an exact common-run length covering the
    embedded span."""
    from pcompress_spark.config import DedupConfig
    from pcompress_spark.kernels import tokens_to_hashes

    rng = __import__("numpy").random.Generator(__import__("numpy").random.PCG64(3))
    words = [f"w{i:03d}" for i in range(400)]
    span = " ".join(rng.choice(words, size=120))          # the shared run
    long_doc = (" ".join(rng.choice(words, size=600)) + " " + span + " "
                + " ".join(rng.choice(words, size=600)))
    short_doc = span
    other = " ".join(rng.choice(words, size=300))
    docs = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)], "doc_id long, text string"
    )
    cfg = DedupConfig(shingle_k=3, substring_enabled=True)
    out = {(r.doc_id_a, r.doc_id_b): r
           for r in doc_dedup.doc_substring_pairs(docs, cfg).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    n_short = len(tokens_to_hashes(short_doc))
    # the exact common run covers the whole embedded span
    assert r.lcs_tokens >= n_short
    # and Jaccard would never have flagged it (~120/1320 token overlap)
    jac = doc_dedup.ngram_jaccard_pairs(
        docs.withColumn("lang", F.lit("en")), n=3, threshold=0.0
    ).toPandas()
    jmap = {(a, b): j for a, b, j in zip(jac.doc_id_a, jac.doc_id_b, jac.jaccard)}
    assert jmap.get((1, 2), 0.0) < 0.3


def test_doc_substring_fixture_pairs(spark, docs):
    """sf fixture sanity: every flagged pair's exact common run is at least
    the fingerprint window (windows only exist inside true shared runs)."""
    from pcompress_spark.config import DedupConfig

    cfg = DedupConfig(shingle_k=3, substring_enabled=True)
    rows = doc_dedup.doc_substring_pairs(docs, cfg).collect()
    for r in rows:
        assert r.doc_id_a < r.doc_id_b
        assert r.n_windows >= 1
        assert r.lcs_tokens >= cfg.substring_window


def test_corpus_admission_cascade(spark):
    """First-match-wins reasons: exact_dup beats empty beats low_quality
    beats unknown_lang; keepers of dup groups are judged on their own text."""
    good = ("the quick brown fox jumps over the lazy dog and then it runs "
            "to the forest for a while because it is happy there ") * 3
    rows = [
        (10, good),             # keep (first occurrence)
        (11, good),             # exact_dup (same content, higher id)
        (12, ""),               # empty (its dup group = itself)
        (13, ""),               # exact_dup of the empty group — dup wins
        (14, "!@#$ %^&* ()~~"),  # mostly punctuation: quality < 0.25 fires
                                 # before the (also true) unknown_lang
        (15, "kwyjibo " * 60),  # long + alnum but zero stopword hits -> unknown_lang
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in doc_dedup.corpus_admission(docs).collect()}
    assert out[10].decision == "keep" and out[10].reason == "ok"
    assert out[11].reason == "exact_dup" and out[11].keeper_doc_id == 10
    assert out[12].reason == "empty"
    assert out[13].reason == "exact_dup" and out[13].keeper_doc_id == 12
    assert out[14].reason == "low_quality"
    assert out[15].reason == "unknown_lang" and out[15].quality >= 0.25
    assert all(out[i].decision == "drop" for i in (11, 12, 13, 14, 15))


def test_corpus_admission_fixture_consistency(spark, docs):
    """Fixture-level invariants: exactly one keeper per content group, and
    every kept doc passes all the drop predicates."""
    adm = doc_dedup.corpus_admission(docs).toPandas()
    keep = adm[adm.decision == "keep"]
    assert (keep.doc_id == keep.keeper_doc_id).all()
    assert (keep.quality >= 0.25).all()
    assert (keep.lang_guess != "und").all()
    assert (keep.content_class != "empty").all()
    # dropped exact dups reference a keeper that was itself admitted or
    # dropped for a text reason — never a dangling id
    ids = set(adm.doc_id)
    assert set(adm.keeper_doc_id) <= ids


def test_recall_report_meets_north_rule(spark, docs):
    """The headline metric as a query: LSH recall vs exact shingle-Jaccard
    truth must clear the north rule's >= 0.99 bar on the fixture."""
    row = doc_dedup.recall_report(docs).collect()[0]
    assert row.n_truth > 0, "fixture must contain strong truth pairs"
    assert row.recall >= 0.99, (row.n_found, row.n_truth)


def test_ann_recall_report_consistent_with_sets(spark, emb):
    """The report's counts must equal the set intersections of the
    underlying method results, and recall stays in [0, 1]."""
    from pyspark.sql import functions as F
    q = emb.where(F.col("vec_id") % 100 == 0)
    rep = {r.method: r for r in similarity.ann_recall_report(emb, q, k=5).collect()}
    assert set(rep) == {"lsh", "multiprobe", "ivf"}
    brute = similarity.cosine_topk_bruteforce(emb, q, k=5).toPandas()
    bset = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    for method, fn in (("lsh", similarity.hyperplane_lsh_topk),
                       ("multiprobe", similarity.hyperplane_multiprobe_topk),
                       ("ivf", similarity.ivf_topk)):
        found = fn(emb, q, k=5).toPandas()
        fset = {(r.query_id, r.neighbor_id) for r in found.itertuples()}
        row = rep[method]
        assert row.n_truth == len(bset)
        assert row.n_found == len(bset & fset)
        assert 0.0 <= row.recall <= 1.0
        assert row.k == 5


def test_dedup_keep_best_policy(spark, docs):
    """keep_best keeps exactly one row per cluster: the max-quality member,
    min doc_id on quality ties; singletons keep themselves."""
    from pcompress_spark.functions.text import quality_score

    kept = doc_dedup.dedup_keep_best(docs, threshold=0.3).toPandas()
    clusters = doc_dedup.neardup_clusters(docs, threshold=0.3).toPandas()
    q = quality_score(docs).toPandas().set_index("doc_id")["quality"]

    assert len(kept) == clusters["cluster_id"].nunique()
    sizes = clusters.groupby("cluster_id").size()
    by_cluster = clusters.groupby("cluster_id")["doc_id"].apply(list)
    for row in kept.itertuples(index=False):
        members = by_cluster[row.cluster_id]
        assert row.n_members == sizes[row.cluster_id]
        best = max(q[m] for m in members)
        assert row.quality == best
        assert row.doc_id == min(m for m in members if q[m] == best)
    # singleton clusters keep themselves with n_members == 1
    singles = kept[kept.n_members == 1]
    assert (singles.doc_id == singles.cluster_id).all()


def test_knn_label_purity_matches_bruteforce(spark, emb):
    """Per-query purity equals a pandas recomputation over the brute top-k
    set joined to the label column; every query appears exactly once."""
    from pyspark.sql import functions as F

    q = emb.where(F.col("vec_id") % 100 == 0)
    rep = similarity.knn_label_purity(emb, q, k=5).toPandas()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    brute = similarity.cosine_topk_bruteforce(emb, q, k=5).toPandas()

    assert sorted(rep.query_id) == sorted(
        r.vec_id for r in q.select("vec_id").collect()
    )
    assert (rep.n_neighbors == 5).all()
    assert ((rep.purity >= 0) & (rep.purity <= 1)).all()
    by_q = brute.groupby("query_id")["neighbor_id"].apply(list)
    for row in rep.itertuples(index=False):
        assert row.query_label == labels[row.query_id]
        n_match = sum(
            1 for n in by_q[row.query_id] if labels[n] == row.query_label
        )
        assert row.n_match == n_match
        assert abs(row.purity - round(n_match / 5, 6)) < 1e-9


def test_hard_negatives_lsh_vs_brute(spark, emb):
    """The bucketed hard-negative channel (multi-probe LSH candidates +
    label filter) must emit ONLY true negatives with the exact brute
    cosine on every overlapping pair, and recover a material fraction of
    the brute truth set — the brute-equivalence audit the bucketed
    production path is shipped with."""
    from pyspark.sql import functions as F

    q = emb.where(F.col("vec_id") % 100 == 0)
    brute = similarity.hard_negatives(emb, q, k=5).toPandas()
    lsh = similarity.hard_negatives_lsh(emb, q, k=5).toPandas()

    assert (lsh.query_label != lsh.neighbor_label).all()
    # per-query ranks are 1..n with no gaps
    for _, grp in lsh.groupby("query_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
    # exact-score agreement wherever both channels emit the pair
    bscore = {(r.query_id, r.neighbor_id): r.cosine
              for r in brute.itertuples()}
    overlap = [r for r in lsh.itertuples()
               if (r.query_id, r.neighbor_id) in bscore]
    assert overlap, "no overlap between bucketed and brute negatives"
    for r in overlap:
        assert bscore[(r.query_id, r.neighbor_id)] == r.cosine
    # recall floor vs the brute truth (approximate by design — same
    # index geometry as hyperplane_multiprobe_topk)
    truth = set(zip(brute.query_id, brute.neighbor_id))
    found = set(zip(lsh.query_id, lsh.neighbor_id))
    assert len(truth & found) / len(truth) >= 0.1


def test_knn_label_purity_lsh_matches_multiprobe_neighborhood(spark, emb):
    """Purity over the approximate neighborhood must equal a pandas
    recomputation over hyperplane_multiprobe_topk's own pair set — the
    aggregation is shared with the brute form; only the neighborhood
    source differs."""
    from pyspark.sql import functions as F

    q = emb.where(F.col("vec_id") % 100 == 0)
    rep = similarity.knn_label_purity_lsh(emb, q, k=5).toPandas()
    mp = similarity.hyperplane_multiprobe_topk(emb, q, k=5).toPandas()
    labels = {r.vec_id: r.label
              for r in emb.select("vec_id", "label").collect()}

    by_q = mp.groupby("query_id")["neighbor_id"].apply(list)
    assert sorted(rep.query_id) == sorted(by_q.index)
    for row in rep.itertuples(index=False):
        nbrs = by_q[row.query_id]
        assert row.n_neighbors == len(nbrs)
        n_match = sum(1 for n in nbrs if labels[n] == row.query_label)
        assert row.n_match == n_match
        assert abs(row.purity - round(n_match / len(nbrs), 6)) < 1e-9
