"""Driver-contract smoke tests + exactness spot-checks at sf0.001.

The exhaustive oracle comparison lives in tools/check_oracles.py (run at
sf0.01, mirrors the driver); here we keep a fast subset in the suite.
"""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(str(x) for x in v) + "]"
        return str(v)

    return tuple(cols), sorted(tuple(cell(v) for v in r) for r in df.itertuples(index=False))


def test_entry_smoke(spark):
    df = entry.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert list(pdf.columns) == ["conv_id", "cluster_id", "cluster_size"]
    assert (pdf["cluster_size"] >= 1).all()
    # at least one true duplicate cluster at smoke scale
    assert pdf["cluster_size"].max() >= 2


def test_queries_have_oracles_or_are_documented(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs), "oracle for unknown query"
    # the SQL-expressible core must be oracled
    for name in ["tr_assemble", "tr_exact_dup_groups", "doc_exact_hash",
                 "q1_pricing_summary", "events_sessionize", "ann_topk_brute"]:
        assert name in oracles


@pytest.mark.parametrize("name", [
    "tr_assemble", "tr_exact_dup_groups", "doc_exact_hash",
    "doc_token_stats", "q1_pricing_summary", "events_sessionize",
    "ann_topk_brute",
])
def test_query_matches_oracle_sf0001(spark, duck, name):
    qs = entry.queries()
    sql = entry.oracle_sql()[name]
    # transcript oracles embed the sf0.01 fixture path; swap for sf0.001
    if name.startswith("tr_"):
        from pcompress_spark.sources.tables import transcripts_path
        sql = sql.replace(transcripts_path("/root/testdata/sf0.01"),
                          transcripts_path(SF))
    eng = qs[name](spark, SF).toPandas()
    orc = duck.sql(sql).fetchdf()
    ec, er = _canon(eng)
    oc, orows = _canon(orc)
    assert ec == oc, f"schema {ec} != {oc}"
    assert er == orows


def test_tr_recall_report_meets_north_rule(spark):
    """The north rule's headline: dup-pair recall >= 0.99 of the clustered
    pipeline output vs exact shingle-Jaccard truth (truth threshold 0.7,
    above the 0.5 LSH design point)."""
    pdf = entry.queries()["tr_recall_report"](spark, SF).toPandas()
    assert len(pdf) == 1
    assert pdf["n_truth"][0] > 0
    assert pdf["recall"][0] >= 0.99


def test_rows_only_queries_nonempty(spark):
    qs = entry.queries()
    for name in ["tr_near_pairs", "tr_clusters", "doc_minhash_lsh_pairs",
                 "doc_simhash_pairs", "doc_fingerprints", "ann_topk_lsh"]:
        pdf = qs[name](spark, SF).toPandas()
        assert len(pdf) > 0, name
