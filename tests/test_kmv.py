"""Pure-JVM KMV channel (functions/kmv.py): hash parity, brute-force
agreement, planted-duplicate behavior, and the zero-Python plan property."""

import hashlib
import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from pcompress_spark.config import DedupConfig
from pcompress_spark.functions import doc_dedup
from pcompress_spark.functions.kmv import (
    kmv_near_pairs,
    kmv_near_pairs_transcripts,
    kmv_signatures,
    md5_60,
)
from pcompress_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_md5_60_matches_hashlib(spark):
    """The 60-bit hash is exactly int(md5(s).hexdigest()[:15], 16) — the
    contract the DuckDB twin (oracle_sql md5_60 macro) implements."""
    texts = ["hello world", "", "a", "Hello, World! 42", "conv-000123"]
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = [r[0] for r in df.select(md5_60("s")).collect()]
    want = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in texts]
    assert got == want


def test_kmv_vs_bruteforce(spark, docs):
    """KMV pairs share the exact same shingle sets as the brute n-gram
    Jaccard (same normalization, same 3-gram grams, injective-w.h.p. hash),
    so jaccard values must be EQUAL on shared pairs and strong-pair recall
    high. Brute is lang-scoped; KMV is corpus-wide, so compare on brute's
    pair universe only."""
    brute = doc_dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3).toPandas()
    kmvp = kmv_near_pairs(docs, k_shingle=3, threshold=0.3).toPandas()
    bmap = {(a, b): j for a, b, j in zip(brute.doc_id_a, brute.doc_id_b, brute.jaccard)}
    kmap = {(a, b): j for a, b, j in zip(kmvp.doc_id_a, kmvp.doc_id_b, kmvp.jaccard)}
    shared = set(bmap) & set(kmap)
    assert shared, "no overlap between brute and KMV pair sets"
    for k in shared:
        assert abs(bmap[k] - kmap[k]) < 1e-9, k
    strong = {k for k, j in bmap.items() if j >= 0.5}
    if strong:
        rec = len(strong & set(kmap)) / len(strong)
        assert rec >= 0.99, f"KMV recall {rec} on strong pairs"
    # output contract: a < b, threshold respected
    assert (kmvp.doc_id_a < kmvp.doc_id_b).all()
    assert (kmvp.jaccard >= 0.3).all()


def test_kmv_signatures_shape(spark, docs):
    sig = kmv_signatures(docs, k_shingle=3, k_min=20).toPandas()
    assert set(sig.columns) == {"doc_id", "id_hash", "shingles", "kmv"}
    assert (sig.id_hash >= 0).all(), "60-bit hash must be positive"
    for sh, kv in zip(sig.shingles, sig.kmv):
        assert list(kv) == sorted(set(sh))[:20]
        assert all(v >= 0 for v in kv)


def test_kmv_transcripts_planted_exact_dup(spark, smoke_transcripts):
    """An exact copy of a conversation under a new conv_id must pair with
    its source at jaccard 1.0 through the transcript KMV channel."""
    src_id = smoke_transcripts.select(F.min("conv_id")).first()[0]
    one = smoke_transcripts.where(F.col("conv_id") == src_id)
    clone = one.withColumn("conv_id", F.lit("zzz-clone"))
    t = smoke_transcripts.unionByName(clone)
    pairs = kmv_near_pairs_transcripts(t, DedupConfig()).toPandas()
    hit = pairs[(pairs.conv_id_a == src_id) & (pairs.conv_id_b == "zzz-clone")]
    assert len(hit) == 1 and abs(hit.jaccard.iloc[0] - 1.0) < 1e-9
    assert (pairs.jaccard >= DedupConfig().jaccard_threshold).all()


def test_kmv_plans_have_zero_python_nodes(spark, docs, smoke_transcripts):
    """The channel's headline property: not one Python-worker node in
    either plan — the whole near-dup path is JVM whole-stage codegen.
    Also pins the verify tail's double-broadcast shape: the candidate pair
    list is broadcast to BOTH shingle probes (+ the hot-bucket salt
    broadcast >= 3 BroadcastHashJoins total) and the shingle-array table
    is never exchanged on a single pair-end key — the O(corpus) array
    sort-spill shape the repo invariant forbids. The composite (a, b)
    exchange carries both keys, so the single-key pattern cannot match it."""
    py_nodes = ("MapInPandas", "MapInArrow", "BatchEvalPython",
                "ArrowEvalPython", "FlatMapGroupsInPandas", "PythonUDF")
    for df in (kmv_near_pairs(docs, k_shingle=3, threshold=0.3),
               kmv_near_pairs_transcripts(smoke_transcripts, DedupConfig())):
        plan = _plan(df)
        hits = [n for n in py_nodes if n in plan]
        assert not hits, f"Python nodes in KMV plan: {hits}"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 3, plan
        bad = re.search(r"hashpartitioning\((doc_id|conv_id)_[ab]#\d+, \d+\)",
                        plan)
        assert not bad, f"corpus-keyed pair-end exchange: {bad.group(0)}"


def test_kmv_clusters_planted_family(spark, smoke_transcripts):
    """Exact clone + whitespace variant must land in the source's cluster
    (exact star covers the variant even if its text normalizes equal);
    cluster_id is the min conv_id; every conversation gets a row."""
    from pcompress_spark.functions.kmv import kmv_clusters_transcripts

    src_id = smoke_transcripts.select(F.min("conv_id")).first()[0]
    one = smoke_transcripts.where(F.col("conv_id") == src_id)
    clone = one.withColumn("conv_id", F.lit("zzz-clone"))
    spaced = one.withColumn("conv_id", F.lit("zzz-spaced")).withColumn(
        "text", F.concat(F.col("text"), F.lit("   \t "))
    )
    t = smoke_transcripts.unionByName(clone).unionByName(spaced)
    cc = kmv_clusters_transcripts(t, DedupConfig()).toPandas()
    n_convs = t.select("conv_id").distinct().count()
    assert len(cc) == n_convs
    lab = dict(zip(cc.conv_id, cc.cluster_id))
    assert lab["zzz-clone"] == lab[src_id] == lab["zzz-spaced"] == min(
        c for c, l in lab.items() if l == lab[src_id]
    )


def test_kmv_recall_report_headline(spark, docs):
    """North-rule headline for the JVM channel: dup-pair recall >= 0.99 vs
    exact brute-force truth at a threshold above the 1-of-K design point."""
    from pcompress_spark.functions.kmv import kmv_recall_report

    row = kmv_recall_report(docs, k_shingle=3, truth_threshold=0.5,
                            design_threshold=0.3).toPandas().iloc[0]
    assert row.n_truth > 0, "fixture must contain strong dup pairs"
    assert row.recall >= 0.99, f"KMV recall {row.recall}"


def test_kmv_hot_bucket_cap_bounds_buckets(spark):
    """A viral shingle shared by many docs must ride the shared salted/
    capped bucket path: pair count stays far below quadratic when one
    bucket's raw membership exceeds bucket_cap."""
    n = 40
    rows = [(i, "common boilerplate tokens repeated everywhere "
                f"unique tail {i} {i + 1} {i + 2}") for i in range(n)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = DedupConfig(shingle_k=3, substring_enabled=False, bucket_cap=8,
                      jaccard_threshold=0.1)
    pairs = kmv_near_pairs(docs, cfg, k_shingle=3, threshold=0.1).toPandas()
    # cap=8 bounds each bucket to C(8,2)=28 pairs; K=20 values per doc give
    # at most 20 buckets' worth of nominations — far below C(40,2)=780
    assert len(pairs) <= 20 * 28


def test_kmv_shuffled_fallback_matches_broadcast(spark, docs):
    """broadcast_pairs=False (the pair-list-outgrows-broadcast regime, the
    same fallback verify.near_pairs takes above its broadcast_limit) must
    produce the identical verified pair set — only the join strategy moves,
    never the semantics."""
    from pcompress_spark import cache
    from pcompress_spark.functions.kmv import _kmv_pairs

    cfg = DedupConfig(shingle_k=3, substring_enabled=False,
                      jaccard_threshold=0.3)
    sig = cache.persist(kmv_signatures(docs, 3, id_col="doc_id"))
    key = lambda df: sorted(
        map(tuple, df.toPandas()[["doc_id_a", "doc_id_b", "jaccard"]].values)
    )
    bc = _kmv_pairs(sig, cfg, "doc_id", "doc_id_a", "doc_id_b", 0.3)
    sh = _kmv_pairs(sig, cfg, "doc_id", "doc_id_a", "doc_id_b", 0.3,
                    broadcast_pairs=False)
    assert key(bc) == key(sh)
