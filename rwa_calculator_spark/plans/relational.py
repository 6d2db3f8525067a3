"""Relational operator inventory (SURVEY.md §2.1–2.8) as named queries.

Every query is the Spark-first re-expression of a reference operator family
(citations in each docstring point into /root/reference) over the driver's
star-schema testdata, paired with a DuckDB oracle. Scale notes:

- dimension tables (region/nation/supplier/part/customer) are broadcast —
  no shuffle for enrichment joins even at 10^12 fact rows;
- all money aggregates use fixed-point exact sums (functions/exact.py) so
  results are partitioning-independent;
- filters/projections stay in plain Column expressions → parquet pushdown
  + whole-stage codegen end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rwa_calculator_spark.contracts import ColumnSpec, conform
from rwa_calculator_spark.functions.exact import (
    scaled_avg,
    scaled_sum,
    sql_scaled_avg,
    sql_scaled_sum,
)
from rwa_calculator_spark.plans.registry import query
from rwa_calculator_spark.sources.star import load_table, load_table_csv


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.1 scans / sources
# ---------------------------------------------------------------------------


@query(
    "scan_parquet",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {sql_scaled_sum('l_extendedprice', 2)} AS total_price,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared parquet scan (ref engine/loader.py:814-876)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        scaled_sum(F.col("l_extendedprice"), 2).alias("total_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "scan_csv",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    """,
    tags=("scan",),
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with declared schema, no inference (ref engine/loader.py:878-943).
    The CSV is a faithful mirror of the parquet table, so the parquet-view
    oracle checks the reader round-trips values exactly."""
    n = load_table_csv(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


@query(
    "schema_enforce",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_acctbal, c_mktsegment,
           CAST('NONE' AS VARCHAR) AS c_loyalty_tier,
           CAST(0.0 AS DOUBLE) AS c_credit_limit
    FROM customer
    """,
    tags=("scan", "contract"),
)
def schema_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColumnSpec conform: cast + inject absent optional columns with typed
    defaults (ref data/column_spec.py:33-67, engine/loader.py:108-196)."""
    specs = {
        "c_custkey": ColumnSpec(T.LongType(), required=True),
        "c_name": ColumnSpec(T.StringType()),
        "c_nationkey": ColumnSpec(T.LongType()),
        "c_acctbal": ColumnSpec(T.DoubleType()),
        "c_mktsegment": ColumnSpec(T.StringType()),
        "c_loyalty_tier": ColumnSpec(T.StringType(), default="NONE"),
        "c_credit_limit": ColumnSpec(T.DoubleType(), default=0.0),
    }
    return conform(_t(spark, sf_dir, "customer"), specs)


@query(
    "nonfinite_scrub",
    oracle="""
    WITH dirty AS (
        SELECT event_type,
               CASE WHEN event_id % 97 = 0 THEN 'NaN'::DOUBLE
                    WHEN event_id % 101 = 0 THEN 'Infinity'::DOUBLE
                    ELSE value END AS v
        FROM events
    ), clean AS (
        SELECT event_type,
               CASE WHEN isnan(v) OR isinf(v) THEN NULL ELSE v END AS v
        FROM dirty
    )
    SELECT event_type, count(*) - count(v) AS n_scrubbed,
           """ + sql_scaled_sum("v", 2) + """ AS total_value
    FROM clean GROUP BY event_type
    """,
    tags=("validation",),
)
def nonfinite_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN/±inf → null scrub, DQ011 (ref contracts/validation.py
    scrub_non_finite_values, applied engine/pipeline.py:255-269). Non-finites
    are injected deterministically since the testdata is clean."""
    ev = _t(spark, sf_dir, "events")
    inf = F.lit(float("inf"))
    dirty = ev.withColumn(
        "v",
        F.when(F.col("event_id") % 97 == 0, F.lit(float("nan")))
        .when(F.col("event_id") % 101 == 0, inf)
        .otherwise(F.col("value")),
    )
    clean = dirty.withColumn(
        "v", F.when(F.isnan("v") | F.col("v").isin(float("inf"), float("-inf")), None).otherwise(F.col("v"))
    )
    return clean.groupBy("event_type").agg(
        (F.count("*") - F.count("v")).alias("n_scrubbed"),
        scaled_sum(F.col("v"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# §2.2 project / filter / case-when / null semantics / clip
# ---------------------------------------------------------------------------


@query(
    "project_filter",
    oracle=f"""
    SELECT {sql_scaled_sum('l_extendedprice * l_discount', 4)} AS promo_revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    tags=("filter",),
    bench=True,
)
def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection+selection with parquet pushdown — the reference's 271
    `.filter` / 273 `.select` uses (e.g. engine/stages/calc.py:1-28).
    TPC-H Q6 shape: the scan should read 4 columns, not 11."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            scaled_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("promo_revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "case_when_ladder",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_scaled_sum('''CASE
                WHEN c_acctbal < 0 THEN 1.5
                WHEN c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 5000 THEN 0.75
                WHEN c_mktsegment IN ('BUILDING', 'FURNITURE') THEN 1.0
                WHEN c_acctbal > 9000 THEN 0.2
                WHEN c_acctbal > 2500 THEN 0.5
                ELSE 1.0 END''', 4)} AS total_rw,
           count(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("expression",),
)
def case_when_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested when/then/otherwise decision ladder — the reference's single
    most used primitive (962 `.when`, e.g. engine/sa/risk_weights.py)."""
    c = _t(spark, sf_dir, "customer")
    rw = (
        F.when(F.col("c_acctbal") < 0, 1.5)
        .when((F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") > 5000), 0.75)
        .when(F.col("c_mktsegment").isin("BUILDING", "FURNITURE"), 1.0)
        .when(F.col("c_acctbal") > 9000, 0.2)
        .when(F.col("c_acctbal") > 2500, 0.5)
        .otherwise(1.0)
    )
    return c.groupBy("c_mktsegment").agg(
        scaled_sum(rw, 4).alias("total_rw"), F.count("*").alias("n_customers")
    )


@query(
    "null_semantics",
    oracle=f"""
    SELECT o.o_orderstatus,
           coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
           count(*) AS n_orders,
           sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unmatched,
           {sql_scaled_sum('coalesce(c.c_acctbal, 0.0)', 2)} AS total_bal
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("expression", "join"),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-vs-zero discipline: coalesce defaults and explicit null counting
    (ref data/column_spec.py:79-126 fill policy; 634 fill_null uses)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    return j.groupBy(
        "o_orderstatus", F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).cast("long").alias("n_unmatched"),
        scaled_sum(F.coalesce("c_acctbal", F.lit(0.0)), 2).alias("total_bal"),
    )


@query(
    "clip_floor",
    oracle=f"""
    SELECT l_returnflag,
           {sql_scaled_sum('l_extendedprice * (1 - least(greatest(l_discount, 0.02), 0.08)) * (1 + l_tax)', 4)} AS clipped_charge,
           {sql_scaled_sum('greatest(l_quantity - 10, 0.0)', 2)} AS excess_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("expression",),
)
def clip_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clip / min_horizontal / max_horizontal ≡ least/greatest (ref
    engine/irb/formulas.py:461,577, engine/crm/guarantees.py:1449)."""
    li = _t(spark, sf_dir, "lineitem")
    eff_disc = F.least(F.greatest(F.col("l_discount"), F.lit(0.02)), F.lit(0.08))
    charge = F.col("l_extendedprice") * (1 - eff_disc) * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag").agg(
        scaled_sum(charge, 4).alias("clipped_charge"),
        scaled_sum(F.greatest(F.col("l_quantity") - 10, F.lit(0.0)), 2).alias("excess_qty"),
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@query(
    "join_left_enrich",
    oracle=f"""
    SELECT coalesce(r.r_name, 'OTHER') AS region_name,
           count(*) AS n_customers,
           {sql_scaled_sum('c.c_acctbal', 2)} AS total_bal
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN (SELECT * FROM region WHERE r_name IN ('EUROPE', 'ASIA')) r
      ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
    tags=("join",),
    bench=True,
)
def join_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant join shape: sequential left equi-joins enriching a fact from
    small dims (ref engine/stages/hierarchy/graph.py:381-423). Dims are
    broadcast — zero shuffle at any scale."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name").isin("EUROPE", "ASIA"))
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left"
    )
    return j.groupBy(F.coalesce("r_name", F.lit("OTHER")).alias("region_name")).agg(
        F.count("*").alias("n_customers"),
        scaled_sum(F.col("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "join_inner",
    oracle=f"""
    SELECT p.p_brand,
           {sql_scaled_sum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 30
    GROUP BY p.p_brand
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join expansion (ref engine/kernels/allocation.py:424-431)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") >= 30)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            scaled_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join scope filter (ref engine/stages/scope/resolver.py:434-468)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    tags=("join", "validation"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: exclusion against a constrained set (ref
    contracts/validation.py:742,767, engine/crm/link_allocation.py:121).
    Constrained to urgent orders so the result is non-degenerate at every
    scale factor (an all-customers-have-orders SF would otherwise yield 0
    rows and a trivially-passing check)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "validate_antijoin",
    oracle="""
    SELECT l.l_returnflag, count(*) AS n_orphans
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size > 25)
    GROUP BY l.l_returnflag
    """,
    tags=("join", "validation"),
)
def validate_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-orphan DQ check via anti join against a constrained dim
    (ref contracts/validation.py:742 orphan detection)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") > 25)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_anti")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_orphans"))
    )


@query(
    "join_full_recon",
    oracle=f"""
    WITH ours AS (
        SELECT o_custkey AS custkey, {sql_scaled_sum('o_totalprice', 2)} AS amount
        FROM orders GROUP BY o_custkey
    ), theirs AS (
        SELECT o.o_custkey AS custkey,
               {sql_scaled_sum('l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)', 2)} AS amount
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey
    ), recon AS (
        SELECT coalesce(a.custkey, b.custkey) AS custkey,
               a.amount AS ours, b.amount AS theirs,
               CASE WHEN a.custkey IS NULL THEN 'missing_ours'
                    WHEN b.custkey IS NULL THEN 'missing_theirs'
                    WHEN abs(a.amount - b.amount) <= 0.01 THEN 'exact'
                    WHEN abs(a.amount - b.amount)
                         <= 0.05 * greatest(abs(a.amount), abs(b.amount)) THEN 'tolerance'
                    ELSE 'break' END AS bucket
        FROM ours a FULL OUTER JOIN theirs b ON a.custkey = b.custkey
    )
    SELECT bucket, count(*) AS n,
           {sql_scaled_sum('coalesce(ours, 0.0) - coalesce(theirs, 0.0)', 2)} AS total_diff
    FROM recon GROUP BY bucket
    """,
    tags=("join", "recon"),
    bench=True,
)
def join_full_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation on a coalesced key with per-component
    bucketing — the reference's reconciliation core
    (analysis/reconciliation.py:184,886; SURVEY §3.3)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ours = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        scaled_sum(F.col("o_totalprice"), 2).alias("ours")
    )
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    theirs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(scaled_sum(charge, 2).alias("theirs"))
    )
    j = ours.join(theirs, "custkey", "full")
    diff = F.abs(F.col("ours") - F.col("theirs"))
    bucket = (
        F.when(F.col("ours").isNull(), "missing_ours")
        .when(F.col("theirs").isNull(), "missing_theirs")
        .when(diff <= 0.01, "exact")
        .when(diff <= 0.05 * F.greatest(F.abs("ours"), F.abs("theirs")), "tolerance")
        .otherwise("break")
    )
    return j.select(bucket.alias("bucket"), "ours", "theirs").groupBy("bucket").agg(
        F.count("*").alias("n"),
        scaled_sum(F.coalesce("ours", F.lit(0.0)) - F.coalesce("theirs", F.lit(0.0)), 2).alias(
            "total_diff"
        ),
    )


@query(
    "join_cross_scalar",
    oracle=f"""
    WITH nat AS (
        SELECT n.n_name, {sql_scaled_sum('c.c_acctbal', 2)} AS total_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ), tot AS (SELECT {sql_scaled_sum('c_acctbal', 2)} AS grand_total FROM customer)
    SELECT nat.n_name, nat.total_bal,
           round(nat.total_bal / nullif(tot.grand_total, 0), 6) AS share
    FROM nat CROSS JOIN tot
    """,
    tags=("join",),
)
def join_cross_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-join a 1-row scalar frame onto every row (ref
    engine/ccr/ccp.py:103, analysis/comparison.py:685) — Spark broadcasts
    the single-row side, so this is shuffle-free."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    nat = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(scaled_sum(F.col("c_acctbal"), 2).alias("total_bal"))
    )
    tot = c.agg(scaled_sum(F.col("c_acctbal"), 2).alias("grand_total"))
    return nat.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "total_bal",
        F.round(F.col("total_bal") / F.nullif(F.col("grand_total"), F.lit(0.0)), 6).alias("share"),
    )


@query(
    "join_multikey",
    oracle=f"""
    WITH grp AS (
        SELECT l_partkey, l_suppkey, {sql_scaled_sum('l_quantity', 2)} AS grp_qty,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT g.l_partkey, g.l_suppkey, g.grp_qty, g.n_lines,
           sum(CASE WHEN l.l_quantity >= 0.5 * g.grp_qty THEN 1 ELSE 0 END)::BIGINT AS n_dominant
    FROM lineitem l
    JOIN grp g ON l.l_partkey = g.l_partkey AND l.l_suppkey = g.l_suppkey
    GROUP BY 1, 2, 3, 4
    """,
    tags=("join", "agg"),
)
def join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi-join: aggregate on (partkey, suppkey) joined back
    to the fact on both keys (ref engine/crm/collateral.py:298-327 netting
    pools on (agreement, ccy, counterparty))."""
    li = _t(spark, sf_dir, "lineitem")
    grp = li.groupBy("l_partkey", "l_suppkey").agg(
        scaled_sum(F.col("l_quantity"), 2).alias("grp_qty"), F.count("*").alias("n_lines")
    )
    j = li.join(grp, ["l_partkey", "l_suppkey"])
    return j.groupBy("l_partkey", "l_suppkey", "grp_qty", "n_lines").agg(
        F.sum(F.when(F.col("l_quantity") >= 0.5 * F.col("grp_qty"), 1).otherwise(0))
        .cast("long")
        .alias("n_dominant")
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_sum_by_key",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_scaled_sum('l_quantity', 2)} AS sum_qty,
           {sql_scaled_sum('l_extendedprice', 2)} AS sum_base_price,
           {sql_scaled_sum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_scaled_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS sum_charge,
           round({sql_scaled_avg('l_quantity', 2)}, 6) AS avg_qty,
           round({sql_scaled_avg('l_discount', 4)}, 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
    bench=True,
)
def agg_sum_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with multiple measures — TPC-H Q1 shape covering the
    reference's dominant agg mix: sum(260)/len(34)/mean(2)
    (ref engine/aggregator/_summaries.py). Partial (map-side) aggregation is
    automatic; fixed-point sums keep the merge order irrelevant."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            scaled_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            scaled_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            scaled_sum(disc_price, 4).alias("sum_disc_price"),
            scaled_sum(charge, 4).alias("sum_charge"),
            F.round(scaled_avg(F.col("l_quantity"), 2), 6).alias("avg_qty"),
            F.round(scaled_avg(F.col("l_discount"), 4), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT l_linestatus,
           {sql_scaled_sum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END", 2)} AS returned_value,
           sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)::BIGINT AS n_high_discount
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg",),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregate sum(when(cond, x).otherwise(0)) (ref
    engine/crm/guarantees.py:1400-1416)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        scaled_sum(
            F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0), 2
        ).alias("returned_value"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).cast("long").alias("n_high_discount"),
    )


@query(
    "agg_any",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, bool_or(o_orderpriority = '1-URGENT') AS has_urgent
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           sum(CASE WHEN p.has_urgent THEN 1 ELSE 0 END)::BIGINT AS n_with_urgent,
           count(*) AS n_customers
    FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("agg",),
)
def agg_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean any() per group (ref engine/kernels/allocation.py:669)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = o.groupBy("o_custkey").agg(
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("has_urgent")
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("has_urgent"), 1).otherwise(0)).cast("long").alias("n_with_urgent"),
            F.count("*").alias("n_customers"),
        )
    )


@query(
    "agg_two_key",
    oracle=f"""
    SELECT n.n_name, c.c_mktsegment, count(*) AS n_customers,
           {sql_scaled_sum('c.c_acctbal', 2)} AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    tags=("agg",),
)
def agg_two_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key aggregation (ref engine/kernels/allocation.py:219-225)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_customers"), scaled_sum(F.col("c_acctbal"), 2).alias("total_bal"))
    )


@query(
    "agg_collect_list",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_debtors,
           string_agg(c.c_custkey, ',' ORDER BY c.c_custkey) AS debtor_custkeys
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal < 0
    GROUP BY n.n_name
    """,
    tags=("agg", "nested"),
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation (ref engine/stages/hierarchy/graph.py:300-305
    ancestor lists). Built as a real ArrayType column via collect_list, then
    serialised sorted so the oracle comparison is order-stable."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0)
    n = _t(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    agg = j.groupBy("n_name").agg(
        F.count("*").alias("n_debtors"),
        F.sort_array(F.collect_list("c_custkey")).alias("keys"),
    )
    return agg.select(
        "n_name",
        "n_debtors",
        F.concat_ws(",", F.transform(F.col("keys"), lambda x: x.cast("string"))).alias(
            "debtor_custkeys"
        ),
    )


@query(
    "agg_collect_struct",
    oracle="""
    SELECT l_orderkey,
           count(*) AS n_items,
           string_agg(l_linenumber || ':' || l_partkey, '|' ORDER BY l_linenumber, l_partkey) AS items
    FROM lineitem GROUP BY l_orderkey
    """,
    tags=("agg", "nested"),
)
def agg_collect_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List-of-struct aggregation (ref engine/securitisation/allocator.py:187,245
    pool allocations as List(Struct)). collect_list(struct(...)) sorted by the
    struct's leading field, serialised for the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        F.sort_array(F.collect_list(F.struct("l_linenumber", "l_partkey"))).alias("allocs"),
    )
    item = lambda s: F.concat_ws(  # noqa: E731
        ":", s["l_linenumber"].cast("string"), s["l_partkey"].cast("string")
    )
    return agg.select(
        "l_orderkey",
        "n_items",
        F.concat_ws("|", F.transform(F.col("allocs"), item)).alias("items"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (ref n_unique, contracts/validation.py DQ).
    At 100 TB the DQ path swaps to approx_count_distinct (HLL) — exposed in
    operators; exact here so the oracle matches."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "dedup_first_wins",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
    """,
    tags=("agg", "window"),
)
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic first-row-wins dedup via row_number over an explicit
    order (ref engine/stages/hierarchy/graph.py:454-470; Polars
    maintain_order=True has no distributed analogue, so the order column is
    explicit — SURVEY §7.2 hard-part 2)."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    )


# ---------------------------------------------------------------------------
# §2.6 sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("sort",),
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy().limit() → TakeOrdered physical op: top-k without a global
    sort (ref sorts-then-heads, SURVEY §2.6). Tiebreak on key keeps the
    boundary deterministic."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@query(
    "sort_materiality",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey, {sql_scaled_sum('o_totalprice', 2)} AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, s.total_spend
    FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
    WHERE c.c_nationkey IN (1, 2, 3)
    ORDER BY s.total_spend DESC NULLS LAST, c.c_custkey
    LIMIT 40
    """,
    tags=("sort",),
)
def sort_materiality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materiality worklist: sort with nulls last + head (ref
    analysis/reconciliation.py:907-1120 break worklists)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(1, 2, 3))
    spend = o.groupBy("o_custkey").agg(scaled_sum(F.col("o_totalprice"), 2).alias("total_spend"))
    return (
        c.join(spend, c.c_custkey == spend.o_custkey, "left")
        .select("c_custkey", "c_name", "total_spend")
        .orderBy(F.col("total_spend").desc_nulls_last(), F.col("c_custkey"))
        .limit(40)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations / concatenation
# ---------------------------------------------------------------------------


@query(
    "union_by_name",
    oracle=f"""
    WITH unioned AS (
        SELECT 'order' AS src, o_totalprice AS amount, o_orderpriority AS priority
        FROM orders
        UNION ALL
        SELECT 'line' AS src, l_extendedprice AS amount, NULL AS priority
        FROM lineitem WHERE l_linenumber = 1
    )
    SELECT src, coalesce(priority, 'NONE') AS priority, count(*) AS n,
           {sql_scaled_sum('amount', 2)} AS total_amount
    FROM unioned GROUP BY 1, 2
    """,
    tags=("union",),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True) — the reference's
    diagonal_relaxed concat, THE unification primitive
    (ref engine/stages/hierarchy/unify.py:107, aggregator.py:134,150)."""
    o = _t(spark, sf_dir, "orders").select(
        F.lit("order").alias("src"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderpriority").alias("priority"),
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_linenumber") == 1)
        .select(F.lit("line").alias("src"), F.col("l_extendedprice").alias("amount"))
    )
    u = o.unionByName(li, allowMissingColumns=True)
    return u.groupBy("src", F.coalesce("priority", F.lit("NONE")).alias("priority")).agg(
        F.count("*").alias("n"), scaled_sum(F.col("amount"), 2).alias("total_amount")
    )


@query(
    "union_all",
    oracle=f"""
    WITH u AS (
        SELECT * FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        UNION ALL
        SELECT * FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    SELECT l_returnflag, count(*) AS n, {sql_scaled_sum('l_extendedprice', 2)} AS total
    FROM u GROUP BY l_returnflag
    """,
    tags=("union",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-schema vertical concat (ref analysis/reconciliation.py:1120)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    b = li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return a.union(b).groupBy("l_returnflag").agg(
        F.count("*").alias("n"), scaled_sum(F.col("l_extendedprice"), 2).alias("total")
    )


# ---------------------------------------------------------------------------
# §2.8 reshape
# ---------------------------------------------------------------------------


@query(
    "explode_edges",
    oracle=f"""
    SELECT word, count(*) AS n_parts, {sql_scaled_sum('p_retailprice', 2)} AS total_price
    FROM (SELECT unnest(string_split(p_type, ' ')) AS word, p_retailprice FROM part)
    GROUP BY word
    """,
    tags=("reshape",),
)
def explode_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode (ref engine/kernels/allocation.py:477,515 ancestor
    cascade expansion)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("word"), "p_retailprice")
        .groupBy("word")
        .agg(F.count("*").alias("n_parts"), scaled_sum(F.col("p_retailprice"), 2).alias("total_price"))
    )


@query(
    "unpivot_facts",
    oracle=f"""
    WITH wide AS (
        SELECT l_returnflag,
               {sql_scaled_sum('l_quantity', 2)} AS sum_qty,
               {sql_scaled_sum('l_extendedprice', 2)} AS sum_base,
               CAST(count(*) AS DOUBLE) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_base' AS measure, sum_base AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'n_rows' AS measure, n_rows AS value FROM wide
    """,
    tags=("reshape",),
)
def unpivot_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via stack() (ref reporting/facts.py:274,292 —
    template cells to (template, row, col, value) facts)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        scaled_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        scaled_sum(F.col("l_extendedprice"), 2).alias("sum_base"),
        F.count("*").cast("double").alias("n_rows"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(3, 'sum_qty', sum_qty, 'sum_base', sum_base, 'n_rows', n_rows) AS (measure, value)",
    )


# ---------------------------------------------------------------------------
# JSON scalar surface (new in the rebuild; SURVEY §2.9 JSON row)
# ---------------------------------------------------------------------------


@query(
    "events_json_extract",
    oracle=f"""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           {sql_scaled_sum('value', 2)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("expression", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access (get_json_object) — new surface
    the reference lacks (SURVEY §2.9: events.props)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type", (k % 10).alias("k_bucket")).agg(
        F.count("*").alias("n"), scaled_sum(F.col("value"), 2).alias("total_value")
    )


# ---------------------------------------------------------------------------
# flagship (entry) — joins + filter + case-when + agg in one plan
# ---------------------------------------------------------------------------


@query(
    "flagship_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name,
           CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'expedited' ELSE 'standard' END AS order_band,
           {sql_scaled_sum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders,
           count(*) AS n_rows
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY 1, 2
    """,
    tags=("flagship",),
    bench=True,
)
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's dominant operator mix in one plan —
    scan → filter → 3 joins (dims broadcast) → case-when → hash agg
    (SURVEY §7.1 step 1)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    band = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedited"
    ).otherwise("standard")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
    )
    return j.groupBy("n_name", band.alias("order_band")).agg(
        scaled_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER)
               AS grouping_level,
           count(*) AS n_rows,
           {sql_scaled_sum('l_quantity', 2)} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — a Spark-native widening beyond
    the reference's plain single-level group-bys (SURVEY §2.4: "no
    grouping sets/cube/rollup" in the reference; its summary tables
    re-aggregate per level instead). One pass produces per-(flag, status)
    rows, per-flag subtotals, and the grand total, with grouping() tagging
    each level — on a cluster this replaces three separate scans."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).cast("int").alias("grouping_level"),
            F.count("*").alias("n_rows"),
            scaled_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "grouping_level",
            "n_rows",
            "sum_qty",
        )
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
           round(quantile_cont(l_quantity, 0.95), 6) AS qty_p95,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS price_p50,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    `percentile` ≡ DuckDB `quantile_cont` — both the type-7 estimator).
    The scale path swaps in percentile_approx (t-digest, mergeable
    map-side sketch) when an exact sort-based percentile would shuffle
    too much — that variant is plan-compatible but approximate, so the
    ORACLED query pins the exact form."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("qty_p50"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 6).alias("qty_p95"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("price_p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("price_p99"),
    )
