"""Statistical kernels as named queries (SURVEY §2.9 Statistical row).

normal_cdf/normal_ppf are pure Column expressions (functions/stats.py), so
the IRB pipeline stays inside WholeStageCodegen — no Python UDF on the hot
path. Oracles are generated from the SAME coefficient tables through the
SQL backend, staged in CTEs to bound expression size; residual cross-engine
noise is exp/ln libm last-ulp, absorbed by output rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum, sql_scaled_sum
from rwa_calculator_spark.functions.irb import (
    irb_maturity_adj,
    irb_pd_floor,
    sql_capital_k,
    sql_maturity_adj,
    sql_pd_floor,
    with_irb_k,
)
from rwa_calculator_spark.functions.stats import (
    spark_expr_normal_cdf,
    sql_acklam_raw,
    sql_halley_step,
    sql_normal_cdf,
    with_normal_ppf,
)
from rwa_calculator_spark.plans.registry import query
from rwa_calculator_spark.sources.star import load_table


@query(
    "normal_cdf_ppf",
    oracle=f"""
    WITH base AS (
        SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
               CAST(2 * n_nationkey + 1 AS DOUBLE) / CAST(52 AS DOUBLE) AS p,
               CAST(n_nationkey - 12 AS DOUBLE) / CAST(4 AS DOUBLE) AS x
        FROM nation
    ), s1 AS (
        SELECT *, {sql_acklam_raw('p')} AS x0 FROM base
    ), s2 AS (
        SELECT nationkey, x, p,
               {sql_halley_step('x0', 'p')} AS ppf_raw,
               {sql_normal_cdf('x')} AS cdf_raw
        FROM s1
    )
    SELECT nationkey, round(cdf_raw, 12) AS cdf_val, round(ppf_raw, 9) AS ppf_val
    FROM s2
    """,
    tags=("stats", "tolerant"),
)
def normal_cdf_ppf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Φ and Φ⁻¹ over a deterministic grid — the polars-normal-stats plugin
    surface (ref engine/irb/stats_backend.py:13-44) as codegen-friendly
    Column expressions."""
    n = load_table(spark, sf_dir, "nation")
    base = n.select(
        F.col("n_nationkey").cast("long").alias("nationkey"),
        ((2 * F.col("n_nationkey") + 1).cast("double") / F.lit(52.0)).alias("p"),
        ((F.col("n_nationkey") - 12).cast("double") / F.lit(4.0)).alias("x"),
    )
    staged = with_normal_ppf(base, "p", "ppf_raw")
    return staged.select(
        "nationkey",
        F.round(spark_expr_normal_cdf("x"), 12).alias("cdf_val"),
        F.round(F.col("ppf_raw"), 9).alias("ppf_val"),
    )


_SQL_PD = """CASE o_orderpriority
    WHEN '1-URGENT' THEN 0.0001
    WHEN '2-HIGH' THEN 0.001
    WHEN '3-MEDIUM' THEN 0.005
    WHEN '4-NOT SPECIFIED' THEN 0.02
    ELSE 0.05 END"""
_SQL_LGD = """CASE l_returnflag WHEN 'N' THEN 0.45 WHEN 'R' THEN 0.75 ELSE 0.25 END"""
_SQL_M = """CASE l_linestatus WHEN 'O' THEN 2.5 ELSE 1.0 END"""


@query(
    "irb_capital_k",
    oracle=f"""
    WITH base AS (
        SELECT o.o_orderpriority, l.l_returnflag, l.l_linestatus,
               {sql_pd_floor(f'CAST(({_SQL_PD}) AS DOUBLE)')} AS pd,
               CAST(({_SQL_LGD}) AS DOUBLE) AS lgd,
               CAST(({_SQL_M}) AS DOUBLE) AS m,
               l.l_extendedprice AS ead
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), s1 AS (
        SELECT *, {sql_acklam_raw('pd')} AS x0 FROM base
    ), s2 AS (
        SELECT o_orderpriority, l_returnflag, l_linestatus, pd, lgd, m, ead,
               {sql_halley_step('x0', 'pd')} AS g_pd
        FROM s1
    ), s3 AS (
        SELECT o_orderpriority, l_returnflag, l_linestatus, ead,
               {sql_capital_k('pd', 'lgd', 'g_pd')} AS k,
               {sql_maturity_adj('pd', 'm')} AS ma
        FROM s2
    )
    SELECT o_orderpriority, l_returnflag, l_linestatus,
           round(min(k), 8) AS k_value,
           round(min(ma), 8) AS ma_value,
           round(((min(k) * min(ma)) * 12.5) * ({sql_scaled_sum('ead', 2)}), 2) AS rwa,
           count(*) AS n_rows
    FROM s3 GROUP BY 1, 2, 3
    """,
    tags=("stats", "irb", "tolerant"),
    bench=True,
)
def irb_capital_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IRB capital requirement K / correlation / maturity adjustment
    pipeline (ref engine/irb/formulas.py:571-925) over banded (PD, LGD, M)
    with the CRR PD floor, RWA = K·MA·12.5·EAD aggregated per band.
    All expression-level: 1M-row throughput target per BASELINE (≈300 ms)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)

    pd_raw = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 0.0001)
        .when(F.col("o_orderpriority") == "2-HIGH", 0.001)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 0.005)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 0.02)
        .otherwise(0.05)
        .cast("double")
    )
    lgd = (
        F.when(F.col("l_returnflag") == "N", 0.45)
        .when(F.col("l_returnflag") == "R", 0.75)
        .otherwise(0.25)
        .cast("double")
    )
    m = F.when(F.col("l_linestatus") == "O", 2.5).otherwise(1.0).cast("double")

    # aggregate-then-compute dictionary evaluation: the fact side is
    # scanned once and reduced to ≤30 band rows; PD/LGD/M derive purely
    # from the three band keys, which survive the groupBy, so the whole
    # Φ⁻¹/Φ kernel attaches directly to the aggregated rows — no extra
    # distinct scans, no combo join. RWA = K·MA·12.5·Σead is exact per
    # band since K/MA are band constants. Bit-identical to per-row
    # evaluation; kernel cost O(bands), fact cost one hash aggregation.
    fact_agg = (
        j.groupBy("o_orderpriority", "l_returnflag", "l_linestatus")
        .agg(
            scaled_sum(F.col("l_extendedprice"), 2).alias("total_ead"),
            F.count("*").alias("n_rows"),
        )
        .withColumn("pd", irb_pd_floor(pd_raw))
        .withColumn("lgd", lgd)
        .withColumn("m", m)
    )
    enriched = with_normal_ppf(fact_agg, "pd", "g_pd")
    enriched = with_irb_k(enriched, "pd", "lgd", "g_pd", "k")
    enriched = enriched.withColumn("ma", irb_maturity_adj(F.col("pd"), F.col("m")))
    return enriched.select(
        "o_orderpriority",
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("k"), 8).alias("k_value"),
        F.round(F.col("ma"), 8).alias("ma_value"),
        F.round(F.col("k") * F.col("ma") * F.lit(12.5) * F.col("total_ead"), 2).alias("rwa"),
        "n_rows",
    )
