"""Window-function kernels (SURVEY.md §2.5).

The waterfall is computed entirely in integer cents inside the window, so
the greedy fill is exact and partitioning-independent — the same discipline
the reference needed for reproducible CRM allocation (SURVEY §7.2 hard-parts
1–3: NaN/null parity, deterministic ordering, tie-broken waterfalls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum, sql_scaled_sum
from rwa_calculator_spark.plans.registry import query
from rwa_calculator_spark.sources.star import load_table


@query(
    "window_sum_pct_of_group",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           order_total,
           l_extendedprice / nullif(order_total, 0) AS share
    FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
                   OVER (PARTITION BY l_orderkey) / CAST(100 AS DOUBLE) AS order_total
        FROM lineitem
    )
    """,
    tags=("window",),
    bench=True,
)
def window_sum_pct_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition sum without collapsing rows — pro-rata weight denominators
    (ref engine/kernels/allocation.py:240-248 sum().over(key))."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey")
    total = (
        F.sum(F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")).over(w) / F.lit(100.0)
    ).alias("order_total")
    return li.select("l_orderkey", "l_linenumber", "l_extendedprice", total).withColumn(
        "share", F.col("l_extendedprice") / F.nullif(F.col("order_total"), F.lit(0.0))
    )


@query(
    "window_cumsum_waterfall",
    oracle="""
    WITH cents AS (
        SELECT l.l_orderkey,
               CAST(round(o.o_totalprice * 50.0, 0) AS BIGINT) AS capacity_c,
               CAST(round(l.l_extendedprice * 100.0, 0) AS BIGINT) AS price_c,
               coalesce(sum(CAST(round(l.l_extendedprice * 100.0, 0) AS BIGINT)) OVER (
                   PARTITION BY l.l_orderkey
                   ORDER BY l.l_extendedprice, l.l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), alloc AS (
        SELECT l_orderkey, capacity_c,
               least(price_c, greatest(capacity_c - prior_c, 0)) AS allocated_c,
               price_c
        FROM cents
    )
    SELECT l_orderkey,
           capacity_c / CAST(100 AS DOUBLE) AS capacity,
           sum(allocated_c) / CAST(100 AS DOUBLE) AS allocated_total,
           sum(CASE WHEN allocated_c >= price_c THEN 1 ELSE 0 END)::BIGINT AS n_fully_funded,
           count(*) AS n_items
    FROM alloc GROUP BY l_orderkey, capacity_c
    """,
    tags=("window",),
    bench=True,
)
def window_cumsum_waterfall(spark: SparkSession, sf_dir: str, loader=load_table) -> DataFrame:
    """Greedy ordered-cumsum waterfall: fill a per-parent capacity from
    children in ascending-cost order (ref engine/crm/guarantees.py:1433-1441
    RW-ordered guarantee redistribution; facility_undrawn.py:751).
    Integer-cents arithmetic inside the window → bit-exact at any scale.
    With `loader=bucketed_star_loader` the l_orderkey window needs no
    Exchange (prepared-layout path, ~3× at sf0.1)."""
    li = loader(spark, sf_dir, "lineitem")
    o = loader(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    price_c = F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")
    capacity_c = F.round(F.col("o_totalprice") * 50.0, 0).cast("long")  # 50% of order value
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_extendedprice", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cents = j.select(
        "l_orderkey",
        capacity_c.alias("capacity_c"),
        price_c.alias("price_c"),
        F.coalesce(F.sum(price_c).over(w), F.lit(0)).alias("prior_c"),
    )
    alloc = cents.withColumn(
        "allocated_c",
        F.least(F.col("price_c"), F.greatest(F.col("capacity_c") - F.col("prior_c"), F.lit(0))),
    )
    return alloc.groupBy("l_orderkey", "capacity_c").agg(
        F.sum("allocated_c").alias("allocated_total_c"),
        F.sum(F.when(F.col("allocated_c") >= F.col("price_c"), 1).otherwise(0))
        .cast("long")
        .alias("n_fully_funded"),
        F.count("*").alias("n_items"),
    ).select(
        "l_orderkey",
        (F.col("capacity_c") / F.lit(100.0)).alias("capacity"),
        (F.col("allocated_total_c") / F.lit(100.0)).alias("allocated_total"),
        "n_fully_funded",
        "n_items",
    )


@query(
    "window_rank_nth_best",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey, c_acctbal
    FROM customer
    QUALIFY row_number() OVER (
        PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) = 2
    """,
    tags=("window",),
)
def window_rank_nth_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal rank to pick the nth-best per group — the multi-rating
    '2nd-best external rating' rule (ref engine/stages/hierarchy/ratings.py:126)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 2)
        .select(F.col("c_nationkey").cast("long").alias("nationkey"), "c_custkey", "c_acctbal")
    )


@query(
    "window_flag_propagate",
    oracle="""
    WITH flagged AS (
        SELECT l_linestatus,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY l_orderkey) AS order_has_return
        FROM lineitem
    )
    SELECT l_linestatus,
           sum(order_has_return)::BIGINT AS n_rows_in_flagged_orders,
           count(*) AS n_rows
    FROM flagged GROUP BY l_linestatus
    """,
    tags=("window",),
)
def window_flag_propagate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """any()-style flag propagation over a group without collapsing rows
    (ref engine/stages/classify/attributes.py QRRE propagation)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey")
    flag = F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).over(w)
    return (
        li.select("l_linestatus", flag.alias("order_has_return"))
        .groupBy("l_linestatus")
        .agg(
            F.sum("order_has_return").cast("long").alias("n_rows_in_flagged_orders"),
            F.count("*").alias("n_rows"),
        )
    )
