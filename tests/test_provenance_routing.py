"""Multi-source provenance (S3 analog) + content-class routing (D6)."""

import pytest
from pyspark.sql import functions as F

from pcompress_spark.functions import doc_dedup
from pcompress_spark.sources.tables import load_table, load_transcripts_multi

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_multi_source_union_carries_provenance(spark):
    t = load_transcripts_multi(spark, SF)
    assert set(t.columns) == {"conv_id", "turn_idx", "role", "text", "tool",
                              "ts", "source"}
    per_src = dict(t.groupBy("source").count().collect())
    assert set(per_src) == {"src0", "src1", "src2"}
    # src2 mirrors src0 (same seed/count)
    assert per_src["src0"] == per_src["src2"]
    # conv_ids are namespaced — no collisions across sources
    n_rows = t.count()
    assert t.select("conv_id", "turn_idx").distinct().count() == n_rows


def test_provenance_dedup_finds_cross_source_dups(spark):
    import __spark_entry__ as entry

    out = entry.queries()["tr_provenance_dedup"](spark, SF).toPandas()
    # every src0 conversation has its src2 mirror: its group spans 2 sources
    assert (out["n_sources"] >= 1).all() and out["n_sources"].max() == 2
    two = out[out["n_sources"] == 2]
    assert len(two) > 0
    assert (two["n_copies"] >= 2).all()
    # representative is the min conv_id, so never from src2 when src0 exists
    assert not two["rep_conv_id"].str.startswith("src2/").any()


def test_provenance_clusters_span_sources(spark):
    """src2 byte-mirrors src0, so every src0-anchored near-dup cluster
    must contain the src2 mirror: >= 2 members spanning >= 2 sources.
    (cluster_id is the min conv_id; 'src0/...' sorts first, so src0
    clusters are exactly the src0-anchored ones.)"""
    import __spark_entry__ as entry

    out = entry.queries()["tr_provenance_clusters"](spark, SF).toPandas()
    anchored = out[out["cluster_id"].str.startswith("src0/")]
    assert len(anchored) > 0
    assert (anchored["n_sources"] >= 2).all()
    assert (anchored["n_members"] >= 2).all()


def test_route_docs_classes(spark, docs):
    routed = doc_dedup.route_docs(docs).toPandas()
    assert set(routed["route"]) <= {"exact_only", "shingle"}
    by_class = routed.groupby("content_class")["route"].agg(set).to_dict()
    for klass, routes in by_class.items():
        assert routes == {doc_dedup.CLASS_ROUTES[klass]}, klass


def test_routed_lsh_equals_full_on_shingle_docs(spark, docs):
    """Routing must only REMOVE exact_only docs from the LSH path — pairs
    among shingle-routed docs are identical to the unrouted run."""
    full = doc_dedup.minhash_lsh_pairs(docs, threshold=0.3).toPandas()
    sub, stats = doc_dedup.routed_lsh_pairs(docs, threshold=0.3, with_stats=True)
    sub = sub.toPandas()
    shingle_ids = set(
        doc_dedup.route_docs(docs).where(F.col("route") == "shingle")
        .toPandas()["doc_id"]
    )
    want = {(a, b) for a, b in zip(full["doc_id_a"], full["doc_id_b"])
            if a in shingle_ids and b in shingle_ids}
    assert set(zip(sub["doc_id_a"], sub["doc_id_b"])) == want
    srows = {r["route"]: r["n_docs"] for r in stats.collect()}
    assert sum(srows.values()) == docs.count()
