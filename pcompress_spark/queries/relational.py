"""Relational benchmark queries over the driver-provided TPC-H-ish tables.

These exercise the generic engine surface (scan/filter/join/agg/window)
that the dedup pipeline is built from — the harness-checkable counterparts
of SURVEY.md §2's aggregation (A1-A3) and join (J1-J5) rows.

Float determinism: monetary aggregates go through decimal(18,2) so the sum
is EXACT and bit-identical to the DuckDB oracle regardless of partitioning/
order; averages divide the exact decimal (cast to double) by the exact
count. Plans: filters are pushed to the parquet scan, small dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _dec(col) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pushdown filter + partial-agg-friendly groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    # decimal BEFORE multiplying: the product is exact, so the sum is
    # bit-identical to the oracle regardless of partitioning or tie-rounding
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast dim join -> fact agg -> top-N."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .where(F.col("o_orderdate") < F.lit("1995-03-15"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: multi-way join with two broadcast dims."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .where(cust["c_nationkey"] == supp["s_nationkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: date-pushdown fact scan + broadcast part dim +
    conditional aggregate (promo revenue share for one ship month).
    Completes computed coverage of every test table — part was the one
    table no query read. Decimal products BEFORE summing keep the sums
    exact; only the final ratio is floating."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,2)"))
    )
    total = F.sum(rev)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(F.lit(100.0) * promo.cast("double") / total.cast("double"), 6)
            .alias("promo_revenue_pct"),
            promo.cast("double").alias("promo_revenue"),
            total.cast("double").alias("total_revenue"),
        )
    )


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic representative selection via window row_number — the
    J3 first-occurrence-wins pattern (/root/reference/rabin/global/
    index.c:485-558) as a reusable relational operator."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate",
                F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_price"))
    )


def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of the streaming path)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def events_type_ngrams(spark: SparkSession, sf_dir: str,
                       n: int = 2) -> DataFrame:
    """Consecutive event-type chains per user in event-time order — the
    events-axis twin of the transcript tool-chain census (which action
    sequences dominate user behavior). Ties in ts break on event_id so
    the sequence is total-ordered and deterministic. One conv-free
    exchange on user_id feeds the lead() window, then a count-distinct
    partial agg — no UDF. Returns (types, n_occurrences, n_users)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cols = [F.col("event_type")] + [
        F.lead("event_type", i).over(w) for i in range(1, int(n))
    ]
    grams = ev.select(
        "user_id", F.concat_ws(">", *cols).alias("types"),
        cols[-1].isNotNull().alias("full"),
    ).where(F.col("full"))
    return (
        grams.groupBy("types")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: event counts by (event_type, hour-of-day) with
    subtotals — grouping-set coverage; NULL grouping levels rendered as
    'ALL' so the oracle comparison is unambiguous."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.col("event_type"), F.hour("ts").cast("long").alias("hod"),
                  F.col("value"))
        .rollup("event_type", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("hod").cast("string"), F.lit("ALL")).alias("hod"),
            "n_events", "sum_value",
        )
    )


def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op / anti-join coverage: orders with no line items."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left_anti")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user (lag + cumulative sum of
    new-session flags): (user_id, n_sessions, n_events)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60)
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > gap),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
