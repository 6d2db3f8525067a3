"""Counterparty credit risk surfaces (ref engine/ccr/* SA-CCR,
engine/stages/sft.py FCCM, engine/cva/ BA-CVA) re-expressed over the star
schema. Each is the reference's composed arithmetic shape — netting-set
group-bys, add-on aggregation, portfolio-correlation formulas — with
deterministic parameter mappings so DuckDB can pin them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum, sql_scaled_sum
from rwa_calculator_spark.plans.registry import query
from rwa_calculator_spark.sources.star import load_table


@query(
    "saccr_ead",
    oracle=f"""
    WITH trades AS (
        SELECT l_orderkey AS netting_set,
               l_extendedprice * (1 - l_discount) AS mtm,
               l_quantity * 1000.0 AS notional,
               CASE l_returnflag WHEN 'A' THEN 'ir' WHEN 'N' THEN 'fx' ELSE 'credit' END AS asset_class,
               CAST(CASE l_returnflag WHEN 'A' THEN 0.005 WHEN 'N' THEN 0.04 ELSE 0.05 END AS DOUBLE) AS sf
        FROM lineitem
    ), per_class AS (
        SELECT netting_set, asset_class,
               {sql_scaled_sum('mtm', 2)} AS class_mtm,
               {sql_scaled_sum('sf * notional', 2)} AS class_addon
        FROM trades GROUP BY 1, 2
    ), per_set AS (
        SELECT netting_set,
               {sql_scaled_sum('class_mtm', 2)} AS set_mtm,
               {sql_scaled_sum('class_addon', 2)} AS aggregate_addon
        FROM per_class GROUP BY netting_set
    )
    SELECT netting_set,
           round(1.4 * (greatest(set_mtm, 0.0) + aggregate_addon), 2) AS ead,
           round(greatest(set_mtm, 0.0), 2) AS replacement_cost,
           round(aggregate_addon, 2) AS pfe_addon
    FROM per_set
    """,
    tags=("ccr",),
)
def saccr_ead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA-CCR EAD = α·(RC + PFE): replacement cost is the floored netting-set
    MTM, the PFE add-on aggregates per-asset-class supervisory-factor ×
    notional add-ons (BCBS CRE52; ref engine/ccr/: trades → netting sets →
    add-on aggregation). Two-level group-by, all expression arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    trades = li.select(
        F.col("l_orderkey").alias("netting_set"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("mtm"),
        (F.col("l_quantity") * 1000.0).alias("notional"),
        F.when(F.col("l_returnflag") == "A", "ir")
        .when(F.col("l_returnflag") == "N", "fx")
        .otherwise("credit")
        .alias("asset_class"),
        F.when(F.col("l_returnflag") == "A", 0.005)
        .when(F.col("l_returnflag") == "N", 0.04)
        .otherwise(0.05)
        .cast("double")
        .alias("sf"),
    )
    per_class = trades.groupBy("netting_set", "asset_class").agg(
        scaled_sum(F.col("mtm"), 2).alias("class_mtm"),
        scaled_sum(F.col("sf") * F.col("notional"), 2).alias("class_addon"),
    )
    per_set = per_class.groupBy("netting_set").agg(
        scaled_sum(F.col("class_mtm"), 2).alias("set_mtm"),
        scaled_sum(F.col("class_addon"), 2).alias("aggregate_addon"),
    )
    return per_set.select(
        "netting_set",
        F.round(
            F.lit(1.4) * (F.greatest(F.col("set_mtm"), F.lit(0.0)) + F.col("aggregate_addon")), 2
        ).alias("ead"),
        F.round(F.greatest(F.col("set_mtm"), F.lit(0.0)), 2).alias("replacement_cost"),
        F.round(F.col("aggregate_addon"), 2).alias("pfe_addon"),
    )


@query(
    "saccr_margined_rc",
    oracle=f"""
    WITH trades AS (
        SELECT 'NS' || l_orderkey AS ns,
               l_extendedprice * (1 - l_discount) - 35000.0 AS mtm,
               l_quantity * 1000.0 AS notional,
               CASE l_returnflag WHEN 'A' THEN 'ir' WHEN 'N' THEN 'fx' ELSE 'credit' END AS asset_class,
               CAST(CASE l_returnflag WHEN 'A' THEN 0.005 WHEN 'N' THEN 0.04 ELSE 0.05 END AS DOUBLE) AS sf
        FROM lineitem
    ), per_class AS (
        SELECT ns, asset_class,
               {sql_scaled_sum('mtm', 2)} AS class_mtm,
               {sql_scaled_sum('sf * notional', 2)} AS class_addon
        FROM trades GROUP BY 1, 2
    ), per_set AS (
        SELECT ns,
               {sql_scaled_sum('class_mtm', 2)} AS set_mtm,
               {sql_scaled_sum('class_addon', 2)} AS addon
        FROM per_class GROUP BY ns
    ), margins AS (
        SELECT 'NS' || o_orderkey AS ns,
               CAST((o_orderkey % 5) * 2000 AS DOUBLE) AS th,
               CAST((o_orderkey % 3) * 500 AS DOUBLE) AS mta,
               CAST((o_orderkey % 4) * 250 AS DOUBLE) AS nica
        FROM orders WHERE o_orderkey % 2 = 0
    ), coll AS (
        SELECT 'NS' || o_orderkey AS ns,
               {sql_scaled_sum('''(o_totalprice * 0.4) * (1 - CAST(CASE o_orderpriority
                    WHEN '1-URGENT' THEN 0.005 WHEN '2-HIGH' THEN 0.02
                    ELSE 0.04 END AS DOUBLE))''', 2)} AS c_net
        FROM orders WHERE o_orderkey % 3 = 0
        GROUP BY 1
    ), joined AS (
        SELECT p.ns, p.set_mtm, p.addon, m.th, m.mta, m.nica,
               coalesce(c.c_net, 0.0) AS c_net,
               p.set_mtm - coalesce(c.c_net, 0.0) AS vc
        FROM per_set p
        LEFT JOIN margins m ON p.ns = m.ns
        LEFT JOIN coll c ON p.ns = c.ns
    ), computed AS (
        SELECT ns,
               CASE WHEN th IS NOT NULL
                    THEN greatest(vc, (th + coalesce(mta, 0.0)) - coalesce(nica, 0.0), 0.0)
                    ELSE greatest(vc, 0.0) END AS rc,
               CASE WHEN vc < 0 AND addon > 0
                    THEN least(1.0, 0.05 + (1 - 0.05) * exp(vc / ((2 * (1 - 0.05)) * addon)))
                    ELSE 1.0 END AS mult,
               addon
        FROM joined
    )
    SELECT ns || '_CCR' AS exposure_reference,
           round(1.4 * (rc + mult * addon), 2) AS ead
    FROM computed
    """,
    tags=("ccr", "engine"),
)
def saccr_margined_rc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full margined SA-CCR through the REAL pipeline operator
    (engine/stages/ccr_sft.py ccr_exposures; ref engine/ccr/rc.py
    compute_rc_margined + pfe.py Art.278(3) multiplier): RC =
    max(V−C, TH+MTA−NICA, 0) for margined sets, collateral nets at
    (1−haircut), over-collateralised sets shrink PFE via
    min(1, F + (1−F)·e^{(V−C)/(2(1−F)·AddOn)}). The oracle re-derives the
    identical two-level fixed-point aggregation and multiplier arithmetic;
    the per-set 2-dp rounding absorbs exp() libm noise."""
    from rwa_calculator_spark.engine.rulepack import CRR_PACK
    from rwa_calculator_spark.engine.stages.ccr_sft import ccr_exposures

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    trades = li.select(
        F.concat(F.lit("T"), F.col("l_orderkey"), F.lit("_"), F.col("l_linenumber")).alias(
            "trade_reference"
        ),
        F.concat(F.lit("NS"), F.col("l_orderkey")).alias("netting_set_reference"),
        F.lit("CP1").alias("counterparty_reference"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) - 35000.0).alias("mtm"),
        (F.col("l_quantity") * 1000.0).alias("notional"),
        F.when(F.col("l_returnflag") == "A", "ir")
        .when(F.col("l_returnflag") == "N", "fx")
        .otherwise("credit")
        .alias("asset_class"),
    )
    margins = o.where(F.col("o_orderkey") % 2 == 0).select(
        F.concat(F.lit("NS"), F.col("o_orderkey")).alias("netting_set_reference"),
        ((F.col("o_orderkey") % 5) * 2000).cast("double").alias("threshold"),
        ((F.col("o_orderkey") % 3) * 500).cast("double").alias("mta"),
        ((F.col("o_orderkey") % 4) * 250).cast("double").alias("nica"),
    )
    hc = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 0.005)
        .when(F.col("o_orderpriority") == "2-HIGH", 0.02)
        .otherwise(0.04)
        .cast("double")
    )
    coll = o.where(F.col("o_orderkey") % 3 == 0).select(
        F.concat(F.lit("NS"), F.col("o_orderkey")).alias("netting_set_reference"),
        (F.col("o_totalprice") * 0.4).alias("value"),
        hc.alias("haircut"),
    )
    out = ccr_exposures(trades, CRR_PACK, margin_agreements=margins, ccr_collateral=coll)
    return out.select(
        "exposure_reference", F.round(F.col("drawn_amount"), 2).alias("ead")
    )


@query(
    "sft_fccm",
    oracle=f"""
    WITH legs AS (
        SELECT o_custkey AS netting_set,
               CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END AS lent,
               CASE WHEN o_orderstatus <> 'O' THEN o_totalprice ELSE 0.0 END AS received,
               CASE WHEN o_orderstatus <> 'O'
                    THEN o_totalprice * CAST(CASE o_orderpriority
                         WHEN '1-URGENT' THEN 0.005 WHEN '2-HIGH' THEN 0.02
                         ELSE 0.04 END AS DOUBLE)
                    ELSE 0.0 END AS haircut_amt
        FROM orders
    )
    SELECT netting_set,
           round(greatest(
               {sql_scaled_sum('lent', 2)} - ({sql_scaled_sum('received', 2)}
                   - {sql_scaled_sum('haircut_amt', 2)}),
               0.0), 2) AS sft_exposure,
           count(*) AS n_trades
    FROM legs GROUP BY netting_set
    """,
    tags=("ccr", "sft"),
)
def sft_fccm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT comprehensive method: E* = max(0, Σ lent − Σ(collateral −
    haircuts)) per netting set (CRR Art.223; ref engine/stages/sft.py,
    engine/crm/haircuts.py sft path)."""
    o = load_table(spark, sf_dir, "orders")
    hc = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 0.005)
        .when(F.col("o_orderpriority") == "2-HIGH", 0.02)
        .otherwise(0.04)
        .cast("double")
    )
    legs = o.select(
        F.col("o_custkey").alias("netting_set"),
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0).alias("lent"),
        F.when(F.col("o_orderstatus") != "O", F.col("o_totalprice")).otherwise(0.0).alias(
            "received"
        ),
        F.when(F.col("o_orderstatus") != "O", F.col("o_totalprice") * hc)
        .otherwise(0.0)
        .alias("haircut_amt"),
    )
    return legs.groupBy("netting_set").agg(
        F.round(
            F.greatest(
                scaled_sum(F.col("lent"), 2)
                - (scaled_sum(F.col("received"), 2) - scaled_sum(F.col("haircut_amt"), 2)),
                F.lit(0.0),
            ),
            2,
        ).alias("sft_exposure"),
        F.count("*").alias("n_trades"),
    )


@query(
    "ba_cva",
    oracle=f"""
    WITH scva AS (
        SELECT n.n_name,
               CAST(CASE WHEN r.r_name = 'EUROPE' THEN 0.01 ELSE 0.03 END AS DOUBLE)
                   * ({sql_scaled_sum('o.o_totalprice', 2)}) AS s_cva
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name
    )
    SELECT round(sqrt(
               power(0.5 * sum(s_cva), 2) + 0.75 * sum(s_cva * s_cva)
           ), 2) AS k_cva,
           count(*) AS n_counterparties,
           round(sum(s_cva), 2) AS total_scva
    FROM scva
    """,
    tags=("ccr", "cva", "tolerant"),
)
def ba_cva(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BA-CVA reduced form: K = √((ρ·ΣS)² + (1−ρ²)·ΣS²) with ρ=0.5
    (BCBS MAR50.15; ref engine/cva/ ba_cva). Portfolio sum-of-squares
    aggregation — the one formula in the reference that mixes linear and
    quadratic portfolio terms."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    weight = F.when(F.col("r_name") == "EUROPE", 0.01).otherwise(0.03).cast("double")
    scva = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg((weight * scaled_sum(F.col("o_totalprice"), 2)).alias("s_cva"))
    )
    return scva.agg(
        F.round(
            F.sqrt(
                F.pow(F.lit(0.5) * F.sum("s_cva"), 2)
                + F.lit(0.75) * F.sum(F.col("s_cva") * F.col("s_cva"))
            ),
            2,
        ).alias("k_cva"),
        F.count("*").alias("n_counterparties"),
        F.round(F.sum("s_cva"), 2).alias("total_scva"),
    )


def _sql_supervisory_delta() -> str:
    from rwa_calculator_spark.functions.stats import sql_normal_cdf

    return f"""
    WITH trades AS (
        SELECT CASE l_returnflag WHEN 'A' THEN 'ir' WHEN 'N' THEN 'fx'
                    ELSE 'credit' END AS asset_class,
               l_returnflag <> 'R' AS is_long,
               CASE WHEN l_linenumber <= 3 THEN
                    CASE WHEN l_linestatus = 'O' THEN 'call' ELSE 'put' END
               END AS option_type,
               CASE WHEN l_linenumber <= 3
                    THEN l_extendedprice / l_quantity END AS k_strike,
               CASE WHEN l_linenumber <= 3
                    THEN (l_extendedprice / l_quantity)
                         * (0.8 + CAST(l_orderkey % 5 AS DOUBLE) * 0.1) END AS p_under,
               (1.0 + CAST(l_suppkey % 8 AS DOUBLE)) / 4.0 AS t_years,
               CAST(CASE l_returnflag WHEN 'A' THEN 0.5 WHEN 'N' THEN 0.15
                    ELSE 1.0 END AS DOUBLE) AS sigma
        FROM lineitem
    ), staged AS (
        SELECT *,
               CASE WHEN k_strike IS NOT NULL THEN
                    (ln(p_under / k_strike) + (0.5 * sigma * sigma) * t_years)
                        / (sigma * sqrt(t_years)) END AS d1
        FROM trades
    ), with_phi AS (
        SELECT asset_class, is_long, option_type,
               {sql_normal_cdf('d1')} AS phi_d1,
               {sql_normal_cdf('(- d1)')} AS phi_neg_d1
        FROM staged
    ), deltas AS (
        SELECT asset_class,
               coalesce(option_type, 'linear') AS instrument,
               CASE WHEN option_type IS NULL THEN
                         CASE WHEN is_long THEN 1.0 ELSE -1.0 END
                    WHEN option_type = 'call' THEN
                         CASE WHEN is_long THEN phi_d1 ELSE - phi_d1 END
                    ELSE CASE WHEN is_long THEN - phi_neg_d1 ELSE phi_neg_d1 END
               END AS delta
        FROM with_phi
    )
    SELECT asset_class, instrument, count(*) AS n_trades,
           sum(CAST(round(delta * 10000000000.0, 0) AS BIGINT))
               / CAST(10000000000 AS DOUBLE) AS total_delta
    FROM deltas GROUP BY 1, 2
    """


@query(
    "saccr_supervisory_delta",
    oracle=_sql_supervisory_delta(),
    tags=("ccr", "stats", "tolerant"),
)
def saccr_supervisory_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA-CCR supervisory delta (CRR Art.279a / BCBS CRE52.42; ref
    engine/ccr/supervisory_delta.py): ±1 for linear trades, Black-Scholes
    ±Φ(±d1) for European options with d1 = (ln(P/K) + 0.5σ²T)/(σ√T) and
    the supervisory per-asset-class volatility (CRE52.47). Φ is the same
    pure-Column Cody kernel as the IRB pipeline (functions/stats.py) —
    staged as a projection column so the expression tree stays bounded."""
    from rwa_calculator_spark.functions.stats import spark_expr_normal_cdf

    li = load_table(spark, sf_dir, "lineitem")
    is_opt = F.col("l_linenumber") <= 3
    k = F.col("l_extendedprice") / F.col("l_quantity")
    trades = li.select(
        F.when(F.col("l_returnflag") == "A", "ir")
        .when(F.col("l_returnflag") == "N", "fx")
        .otherwise("credit")
        .alias("asset_class"),
        (F.col("l_returnflag") != "R").alias("is_long"),
        F.when(is_opt, F.when(F.col("l_linestatus") == "O", "call").otherwise("put")).alias(
            "option_type"
        ),
        F.when(is_opt, k).alias("k_strike"),
        F.when(is_opt, k * (0.8 + (F.col("l_orderkey") % 5).cast("double") * 0.1)).alias(
            "p_under"
        ),
        ((1.0 + (F.col("l_suppkey") % 8).cast("double")) / 4.0).alias("t_years"),
        F.when(F.col("l_returnflag") == "A", 0.5)
        .when(F.col("l_returnflag") == "N", 0.15)
        .otherwise(1.0)
        .cast("double")
        .alias("sigma"),
    )
    d1 = F.when(
        F.col("k_strike").isNotNull(),
        (F.log(F.col("p_under") / F.col("k_strike")) + (0.5 * F.col("sigma") * F.col("sigma")) * F.col("t_years"))
        / (F.col("sigma") * F.sqrt("t_years")),
    )
    staged = trades.withColumn("d1", d1).withColumn("neg_d1", -F.col("d1"))
    with_phi = staged.withColumn("phi_d1", spark_expr_normal_cdf("d1")).withColumn(
        "phi_neg_d1", spark_expr_normal_cdf("neg_d1")
    )
    delta = (
        F.when(
            F.col("option_type").isNull(),
            F.when(F.col("is_long"), 1.0).otherwise(-1.0),
        )
        .when(
            F.col("option_type") == "call",
            F.when(F.col("is_long"), F.col("phi_d1")).otherwise(-F.col("phi_d1")),
        )
        .otherwise(
            F.when(F.col("is_long"), -F.col("phi_neg_d1")).otherwise(F.col("phi_neg_d1"))
        )
    )
    return (
        with_phi.select(
            "asset_class",
            F.coalesce("option_type", F.lit("linear")).alias("instrument"),
            delta.alias("delta"),
        )
        .groupBy("asset_class", "instrument")
        .agg(
            F.count("*").alias("n_trades"),
            scaled_sum(F.col("delta"), 10).alias("total_delta"),
        )
    )


@query(
    "saccr_adjusted_notional",
    oracle=f"""
    WITH trades AS (
        SELECT CASE l_returnflag WHEN 'A' THEN 'ir' ELSE 'credit' END AS asset_class,
               l_quantity * 1000.0 AS trade_notional,
               CAST(l_orderkey % 3 AS DOUBLE) AS s_years,
               CAST(l_orderkey % 3 AS DOUBLE)
                   + 0.5 + CAST(l_suppkey % 10 AS DOUBLE) / 2.0 AS e_years
        FROM lineitem WHERE l_returnflag <> 'N'
    ), sd AS (
        SELECT asset_class, trade_notional,
               (exp(-0.05 * s_years) - exp(-0.05 * e_years)) / 0.05 AS duration
        FROM trades
    )
    SELECT asset_class, count(*) AS n_trades,
           {sql_scaled_sum('trade_notional * duration', 2)} AS adjusted_notional
    FROM sd GROUP BY asset_class
    """,
    tags=("ccr", "tolerant"),
)
def saccr_adjusted_notional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA-CCR supervisory-duration adjusted notional for IR/credit trades
    (CRR Art.279b(1)(a) / BCBS CRE52.34; ref
    engine/ccr/adjusted_notional.py): SD(S,E) = (e^{−0.05·S} − e^{−0.05·E})
    / 0.05, adjusted notional = trade notional × SD, summed per asset
    class. Pure expression arithmetic in whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    trades = li.where(F.col("l_returnflag") != "N").select(
        F.when(F.col("l_returnflag") == "A", "ir").otherwise("credit").alias("asset_class"),
        (F.col("l_quantity") * 1000.0).alias("trade_notional"),
        (F.col("l_orderkey") % 3).cast("double").alias("s_years"),
        (
            (F.col("l_orderkey") % 3).cast("double")
            + 0.5
            + (F.col("l_suppkey") % 10).cast("double") / 2.0
        ).alias("e_years"),
    )
    duration = (F.exp(-0.05 * F.col("s_years")) - F.exp(-0.05 * F.col("e_years"))) / F.lit(
        0.05
    )
    return (
        trades.select("asset_class", "trade_notional", duration.alias("duration"))
        .groupBy("asset_class")
        .agg(
            F.count("*").alias("n_trades"),
            scaled_sum(F.col("trade_notional") * F.col("duration"), 2).alias(
                "adjusted_notional"
            ),
        )
    )


_CVA_DF = "((1 - exp(-0.05 * {m})) / (0.05 * {m}))"


@query(
    "ba_cva_hedged",
    oracle=f"""
    WITH scva AS (
        SELECT n.n_name,
               (1.0 / 1.4)
                   * CAST(CASE WHEN r.r_name = 'EUROPE' THEN 0.01 ELSE 0.03 END AS DOUBLE)
                   * (1.0 + CAST(n.n_nationkey % 5 AS DOUBLE))
                   * ({sql_scaled_sum('o.o_totalprice', 2)})
                   * {_CVA_DF.format(m='(1.0 + CAST(n.n_nationkey % 5 AS DOUBLE))')} AS s_cva,
               CAST(n.n_nationkey AS BIGINT) AS nk
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name, n.n_nationkey
    ), hedges AS (
        SELECT n.n_name,
               CAST(CASE n.n_nationkey % 3 WHEN 0 THEN 0.5 WHEN 1 THEN 0.8
                    ELSE 0.9 END AS DOUBLE) AS r_hc,
               CAST(0.02 AS DOUBLE)
                   * (1.0 + CAST(n.n_nationkey % 3 AS DOUBLE))
                   * ({sql_scaled_sum('greatest(s.s_acctbal, 0.0)', 2)})
                   * {_CVA_DF.format(m='(1.0 + CAST(n.n_nationkey % 3 AS DOUBLE))')} AS h_term
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name, n.n_nationkey
    ), per_cp AS (
        SELECT s.n_name, s.s_cva,
               coalesce(h.r_hc * h.h_term, 0.0) AS snh,
               coalesce((1 - h.r_hc * h.r_hc) * h.h_term * h.h_term, 0.0) AS hma
        FROM scva s LEFT JOIN hedges h ON s.n_name = h.n_name
    ), ih AS (
        SELECT sum((0.02 * 0.70) * 2.0
                   * (CAST(round(reg_total * 0.001 * 100.0, 0) AS BIGINT) / CAST(100 AS DOUBLE))
                   * {_CVA_DF.format(m='2.0')}) AS ih_total
        FROM (
            SELECT r.r_name, {sql_scaled_sum('o.o_totalprice', 2)} AS reg_total
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        )
    ), k AS (
        SELECT sqrt(power(0.5 * sum(s_cva), 2) + 0.75 * sum(s_cva * s_cva)) AS k_reduced,
               sqrt(power(0.5 * sum(s_cva - snh) - (SELECT ih_total FROM ih), 2)
                    + 0.75 * sum((s_cva - snh) * (s_cva - snh))
                    + sum(hma)) AS k_hedged,
               count(*) AS n_counterparties
        FROM per_cp
    )
    SELECT round(k_reduced, 2) AS k_reduced,
           round(k_hedged, 2) AS k_hedged,
           round(0.25 * k_reduced + 0.75 * k_hedged, 2) AS k_full,
           round((0.25 * k_reduced + 0.75 * k_hedged) * 0.65 * 12.5, 2) AS rwea_cva,
           n_counterparties
    FROM k
    """,
    tags=("ccr", "cva", "tolerant"),
)
def ba_cva_hedged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BA-CVA with eligible hedges (PRA PS1/26 CVA 4.5-4.10; ref
    engine/cva/ba_cva.py full-version path): SCVA_c carries 1/α and the
    supervisory discount factor DF = (1−e^{−0.05M})/(0.05M); single-name
    hedges SNH_c = r_hc·RW_h·M_h·B_h·DF_h (NO 1/α — the reference flags
    this asymmetry as CRITICAL); HMA_c = (1−r²)·(term)²; index hedges get
    the 0.70 diversification factor; K_full = β·K_reduced + (1−β)·K_hedged
    with β=0.25; RWEA = 0.65·K_full·12.5. Customers are counterparties
    (nation grain), suppliers provide the hedge book."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")

    def df_factor(m):
        return (1 - F.exp(-0.05 * m)) / (0.05 * m)

    rw = F.when(F.col("r_name") == "EUROPE", 0.01).otherwise(0.03).cast("double")
    m_cp = 1.0 + (F.col("n_nationkey") % 5).cast("double")
    # one orders→counterparty aggregation feeds BOTH the SCVA leg (per
    # nation) and the index-hedge regional totals below (guide §1.2: the
    # two legs previously instantiated the identical 4-table join+agg
    # twice). The cents stay integer until each leg's own /100.0, so the
    # per-nation ead and the re-aggregated regional total are bit-identical
    # to the two independent aggregations (integer addition is associative).
    cp_cents = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("n_name", "r_name", "n_nationkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("long")
            ).alias("_cents")
        )
    )
    scva = cp_cents.select(
        "n_name",
        (
            (1.0 / 1.4)
            * rw
            * m_cp
            * (F.col("_cents") / F.lit(100.0))
            * df_factor(m_cp)
        ).alias("s_cva"),
    )
    r_hc = (
        F.when(F.col("n_nationkey") % 3 == 0, 0.5)
        .when(F.col("n_nationkey") % 3 == 1, 0.8)
        .otherwise(0.9)
        .cast("double")
    )
    m_h = 1.0 + (F.col("n_nationkey") % 3).cast("double")
    hedges = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "n_nationkey")
        .agg(scaled_sum(F.greatest(F.col("s_acctbal"), F.lit(0.0)), 2).alias("b_h"))
        .select(
            "n_name",
            r_hc.alias("r_hc"),
            (F.lit(0.02) * m_h * F.col("b_h") * df_factor(m_h)).alias("h_term"),
        )
    )
    per_cp = scva.join(hedges, "n_name", "left").select(
        "s_cva",
        F.coalesce(F.col("r_hc") * F.col("h_term"), F.lit(0.0)).alias("snh"),
        F.coalesce(
            (1 - F.col("r_hc") * F.col("r_hc")) * F.col("h_term") * F.col("h_term"),
            F.lit(0.0),
        ).alias("hma"),
    )
    reg_totals = cp_cents.groupBy("r_name").agg(
        (F.sum("_cents") / F.lit(100.0)).alias("reg_total")
    )
    b_i = F.round(F.col("reg_total") * 0.001 * 100.0, 0).cast("long") / F.lit(100.0)
    ih = reg_totals.agg(
        F.sum(F.lit(0.02 * 0.70) * 2.0 * b_i * df_factor(F.lit(2.0))).alias("ih_total")
    )
    agg = per_cp.crossJoin(F.broadcast(ih)).agg(
        F.sqrt(
            F.pow(F.lit(0.5) * F.sum("s_cva"), 2)
            + F.lit(0.75) * F.sum(F.col("s_cva") * F.col("s_cva"))
        ).alias("k_reduced"),
        F.sqrt(
            F.pow(
                F.lit(0.5) * F.sum(F.col("s_cva") - F.col("snh")) - F.first("ih_total"),
                2,
            )
            + F.lit(0.75)
            * F.sum((F.col("s_cva") - F.col("snh")) * (F.col("s_cva") - F.col("snh")))
            + F.sum("hma")
        ).alias("k_hedged"),
        F.count("*").alias("n_counterparties"),
    )
    return agg.select(
        F.round("k_reduced", 2).alias("k_reduced"),
        F.round("k_hedged", 2).alias("k_hedged"),
        F.round(F.lit(0.25) * F.col("k_reduced") + F.lit(0.75) * F.col("k_hedged"), 2).alias(
            "k_full"
        ),
        F.round(
            (F.lit(0.25) * F.col("k_reduced") + F.lit(0.75) * F.col("k_hedged"))
            * 0.65
            * 12.5,
            2,
        ).alias("rwea_cva"),
        "n_counterparties",
    )


@query(
    "re_split",
    oracle=f"""
    WITH expo AS (
        SELECT o_orderkey, o_totalprice AS ead,
               -- double arithmetic in Spark's op order, not DuckDB decimal
               0.3 + CAST(o_orderkey % 10 AS DOUBLE) * 0.1 AS ltv
        FROM orders
    ), split_parts AS (
        SELECT o_orderkey, 'secured' AS part,
               CASE WHEN ltv <= 0.8 THEN ead ELSE ead * (0.8 / ltv) END AS part_ead,
               CAST(0.35 AS DOUBLE) AS part_rw
        FROM expo
        UNION ALL
        SELECT o_orderkey, 'unsecured' AS part,
               CASE WHEN ltv <= 0.8 THEN 0.0 ELSE ead * (1.0 - 0.8 / ltv) END AS part_ead,
               CAST(0.75 AS DOUBLE) AS part_rw
        FROM expo
    )
    SELECT part, count(*) AS n_parts,
           {sql_scaled_sum('part_ead', 2)} AS total_ead,
           {sql_scaled_sum('part_ead * part_rw', 2)} AS total_rwa
    FROM split_parts
    WHERE part_ead > 0.0
    GROUP BY part
    """,
    tags=("domain", "reshape"),
)
def re_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-estate exposure split: one exposure → secured tranche (≤80% LTV,
    35% RW) + unsecured remainder (75% RW) — the reference's RE-split stage
    emits child rows per tranche (ref engine/stages/re_split/splitter.py:323,
    diagonal concat of split parts). Expressed as an explode of a built
    struct array so the reshape primitive is the same at any scale."""
    o = load_table(spark, sf_dir, "orders")
    expo = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("ead"),
        (F.lit(0.3) + (F.col("o_orderkey") % 10).cast("double") * 0.1).alias("ltv"),
    )
    secured = F.when(F.col("ltv") <= 0.8, F.col("ead")).otherwise(
        F.col("ead") * (F.lit(0.8) / F.col("ltv"))
    )
    unsecured = F.when(F.col("ltv") <= 0.8, F.lit(0.0)).otherwise(
        F.col("ead") * (F.lit(1.0) - F.lit(0.8) / F.col("ltv"))
    )
    parts = expo.select(
        "o_orderkey",
        F.explode(
            F.array(
                F.struct(
                    F.lit("secured").alias("part"),
                    secured.alias("part_ead"),
                    F.lit(0.35).alias("part_rw"),
                ),
                F.struct(
                    F.lit("unsecured").alias("part"),
                    unsecured.alias("part_ead"),
                    F.lit(0.75).alias("part_rw"),
                ),
            )
        ).alias("s"),
    ).select("o_orderkey", "s.part", "s.part_ead", "s.part_rw")
    return (
        parts.where(F.col("part_ead") > 0.0)
        .groupBy("part")
        .agg(
            F.count("*").alias("n_parts"),
            scaled_sum(F.col("part_ead"), 2).alias("total_ead"),
            scaled_sum(F.col("part_ead") * F.col("part_rw"), 2).alias("total_rwa"),
        )
    )


@query(
    "ccp_default_fund",
    oracle=f"""
    WITH contrib AS (
        SELECT s.s_suppkey,
               n.n_name AS ccp,
               s.s_acctbal + 1000.0 AS df_i,
               5000.0 + 100.0 * n.n_nationkey AS k_ccp,
               (n.n_nationkey % 2 = 0) AS is_qccp,
               (s.s_suppkey % 5 = 0) AS is_unfunded
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    ), alloc AS (
        SELECT ccp, is_qccp, is_unfunded,
               k_ccp * (df_i / (sum(CAST(round(df_i * 100.0, 0) AS BIGINT))
                   OVER (PARTITION BY ccp) / CAST(100 AS DOUBLE))) AS k_cm
        FROM contrib
    ), banded AS (
        SELECT ccp,
               CASE WHEN is_qccp THEN 'dfc_qccp_prefunded'
                    WHEN is_unfunded THEN 'dfc_non_qccp_unfunded'
                    ELSE 'dfc_non_qccp_prefunded' END AS regulatory_band,
               k_cm
        FROM alloc
    )
    SELECT ccp, regulatory_band,
           count(*) AS n_contributions,
           {sql_scaled_sum('k_cm', 4)} AS k_cm_total,
           {sql_scaled_sum('k_cm * 12.5', 4)} AS dfc_rwea
    FROM banded GROUP BY ccp, regulatory_band
    """,
    tags=("ccr",),
)
def ccp_default_fund(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCP default-fund capital: allocate the CCP hypothetical capital K_CCP
    to each clearing member pro-rata by its contribution (K_CM = K_CCP ·
    DF_i / DF_CM, ref engine/ccr/default_fund.py CRR Art. 308(2)), convert
    to RWEA ×12.5 (Art. 92(3)(ca)), and attribute QCCP/non-QCCP/unfunded
    regulatory bands (Art. 308/309). Suppliers are contributions, nations
    are CCPs; the group denominator is an exact fixed-point window sum."""
    from pyspark.sql import Window as W

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    contrib = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey",
        F.col("n_name").alias("ccp"),
        (F.col("s_acctbal") + 1000.0).alias("df_i"),
        (5000.0 + 100.0 * F.col("n_nationkey")).alias("k_ccp"),
        (F.col("n_nationkey") % 2 == 0).alias("is_qccp"),
        (F.col("s_suppkey") % 5 == 0).alias("is_unfunded"),
    )
    w = W.partitionBy("ccp")
    df_cm = F.sum(F.round(F.col("df_i") * 100.0, 0).cast("long")).over(w) / F.lit(100.0)
    alloc = contrib.select(
        "ccp",
        "is_qccp",
        "is_unfunded",
        (F.col("k_ccp") * (F.col("df_i") / df_cm)).alias("k_cm"),
    )
    banded = alloc.select(
        "ccp",
        F.when(F.col("is_qccp"), "dfc_qccp_prefunded")
        .when(F.col("is_unfunded"), "dfc_non_qccp_unfunded")
        .otherwise("dfc_non_qccp_prefunded")
        .alias("regulatory_band"),
        "k_cm",
    )
    return banded.groupBy("ccp", "regulatory_band").agg(
        F.count("*").alias("n_contributions"),
        scaled_sum(F.col("k_cm"), 4).alias("k_cm_total"),
        scaled_sum(F.col("k_cm") * 12.5, 4).alias("dfc_rwea"),
    )


@query(
    "saccr_mpor_mf",
    oracle="""
    WITH ns AS (
        SELECT o.o_orderkey,
               count(*) AS n_trades,
               bool_or(l.l_returnflag = 'R') AS has_illiquid,
               sum(CASE WHEN l.l_linestatus = 'O' THEN 1 ELSE 0 END) AS disputes,
               1 + o.o_orderkey % 7 AS remargin_days,
               5 + o.o_orderkey % 20 AS mpor_input
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey
    ), cascade AS (
        SELECT *,
               greatest(
                   (CASE WHEN disputes > 2 THEN 2 ELSE 1 END)
                   * (CASE WHEN n_trades > 5 OR has_illiquid THEN 20 ELSE 10 END)
                   + remargin_days - 1,
                   mpor_input) AS mpor_eff
        FROM ns
    )
    SELECT CAST(mpor_eff AS BIGINT) AS mpor_eff,
           round(1.5 * sqrt(mpor_eff / 250.0), 8) AS maturity_factor,
           count(*) AS n_netting_sets,
           sum(n_trades)::BIGINT AS n_trades_total
    FROM cascade GROUP BY 1, 2
    """,
    tags=("ccr",),
)
def saccr_mpor_mf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-period-of-risk cascade for margined netting sets (ref
    engine/ccr/maturity_factor.py CRR Art. 285(2)-(5)): 10-BD OTC base,
    20-BD upgrade for large (>5000 trades; >5 here for testdata density) or
    illiquid sets, dispute doubling, remargining-frequency adjustment, and
    the firm-supplied MPOR floor; MF = 1.5·√(MPOR_eff/250) (Art. 279c(2)).
    Orders are netting sets, lineitems trades; one aggregation then pure
    expression cascade."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ns = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_trades"),
            F.bool_or(F.col("l_returnflag") == "R").alias("has_illiquid"),
            F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias("disputes"),
        )
        .withColumn("remargin_days", 1 + F.col("o_orderkey") % 7)
        .withColumn("mpor_input", 5 + F.col("o_orderkey") % 20)
    )
    base = F.when((F.col("n_trades") > 5) | F.col("has_illiquid"), 20).otherwise(10)
    doubled = F.when(F.col("disputes") > 2, 2).otherwise(1) * base
    mpor_eff = F.greatest(doubled + F.col("remargin_days") - 1, F.col("mpor_input"))
    cascade = ns.withColumn("mpor_eff", mpor_eff.cast("long"))
    return cascade.groupBy(
        "mpor_eff",
        F.round(1.5 * F.sqrt(F.col("mpor_eff") / 250.0), 8).alias("maturity_factor"),
    ).agg(
        F.count("*").alias("n_netting_sets"),
        F.sum("n_trades").alias("n_trades_total"),
    )


@query(
    "saccr_ir_hedging_sets",
    oracle=f"""
    WITH trades AS (
        SELECT 'NS' || (l_orderkey % 500) AS netting_set,
               CASE l_linenumber % 3 WHEN 0 THEN 'GBP' WHEN 1 THEN 'EUR'
                    ELSE 'USD' END AS ccy,
               (1.0 + CAST(l_suppkey % 10 AS DOUBLE)) / 2.0 AS m_years,
               CASE WHEN l_linestatus = 'O' THEN 1.0 ELSE -1.0 END AS delta,
               l_quantity * 1000.0 AS notional
        FROM lineitem WHERE l_returnflag = 'A'
    ), staged AS (
        SELECT netting_set, ccy,
               CASE WHEN m_years < 1.0 THEN 1 WHEN m_years <= 5.0 THEN 2
                    ELSE 3 END AS bucket,
               delta
                   * (notional * ((exp(-0.05 * 0.0) - exp(-0.05 * m_years)) / 0.05))
                   * sqrt(least(m_years, 1.0) / 1.0) AS eff_contrib
        FROM trades
    ), per_bucket AS (
        SELECT netting_set, ccy, bucket,
               {sql_scaled_sum('eff_contrib', 2)} AS d_k
        FROM staged GROUP BY 1, 2, 3
    ), per_hs AS (
        SELECT netting_set, ccy,
               coalesce(max(CASE WHEN bucket = 1 THEN d_k END), 0.0) AS d1,
               coalesce(max(CASE WHEN bucket = 2 THEN d_k END), 0.0) AS d2,
               coalesce(max(CASE WHEN bucket = 3 THEN d_k END), 0.0) AS d3
        FROM per_bucket GROUP BY 1, 2
    ), eff AS (
        SELECT netting_set, ccy,
               sqrt(((((d1 * d1) + (d2 * d2)) + (d3 * d3))
                     + (1.4 * ((d1 * d2) + (d2 * d3)))) + (0.6 * (d1 * d3))) AS eff_notional
        FROM per_hs
    )
    SELECT count(*) AS n_hedging_sets,
           {sql_scaled_sum('eff_notional', 2)} AS total_eff_notional,
           round({sql_scaled_sum('0.005 * eff_notional', 4)}, 2) AS addon_ir
    FROM eff
    """,
    tags=("ccr", "tolerant"),
)
def saccr_ir_hedging_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA-CCR interest-rate hedging sets with maturity-bucket partial
    offset (CRR Art.277(2)/280a / BCBS CRE52.57; ref
    engine/ccr/hedging_sets.py): one hedging set per (netting set,
    currency); per-bucket effective notionals D_k = Σ δ·d·MF (supervisory
    duration d, unmargined MF = √(min(M,1y)/1y)), aggregated with the
    prescribed cross-bucket correlations EffN = √(ΣD_k² + 1.4(D₁D₂+D₂D₃)
    + 0.6·D₁D₃); AddOn_IR = SF·ΣEffN. Two keyed partial aggregations plus
    pure arithmetic — map-side combinable at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    trades = li.where(F.col("l_returnflag") == "A").select(
        F.concat(F.lit("NS"), F.col("l_orderkey") % 500).alias("netting_set"),
        F.when(F.col("l_linenumber") % 3 == 0, "GBP")
        .when(F.col("l_linenumber") % 3 == 1, "EUR")
        .otherwise("USD")
        .alias("ccy"),
        ((1.0 + (F.col("l_suppkey") % 10).cast("double")) / 2.0).alias("m_years"),
        F.when(F.col("l_linestatus") == "O", 1.0).otherwise(-1.0).alias("delta"),
        (F.col("l_quantity") * 1000.0).alias("notional"),
    )
    bucket = (
        F.when(F.col("m_years") < 1.0, 1).when(F.col("m_years") <= 5.0, 2).otherwise(3)
    )
    duration = (F.exp(F.lit(-0.05) * 0.0) - F.exp(-0.05 * F.col("m_years"))) / F.lit(0.05)
    mf = F.sqrt(F.least(F.col("m_years"), F.lit(1.0)) / F.lit(1.0))
    staged = trades.select(
        "netting_set",
        "ccy",
        bucket.alias("bucket"),
        (F.col("delta") * (F.col("notional") * duration) * mf).alias("eff_contrib"),
    )
    per_bucket = staged.groupBy("netting_set", "ccy", "bucket").agg(
        scaled_sum(F.col("eff_contrib"), 2).alias("d_k")
    )
    per_hs = per_bucket.groupBy("netting_set", "ccy").agg(
        F.coalesce(F.max(F.when(F.col("bucket") == 1, F.col("d_k"))), F.lit(0.0)).alias("d1"),
        F.coalesce(F.max(F.when(F.col("bucket") == 2, F.col("d_k"))), F.lit(0.0)).alias("d2"),
        F.coalesce(F.max(F.when(F.col("bucket") == 3, F.col("d_k"))), F.lit(0.0)).alias("d3"),
    )
    eff = per_hs.select(
        F.sqrt(
            (
                (
                    (F.col("d1") * F.col("d1"))
                    + (F.col("d2") * F.col("d2"))
                    + (F.col("d3") * F.col("d3"))
                )
                + (1.4 * ((F.col("d1") * F.col("d2")) + (F.col("d2") * F.col("d3"))))
            )
            + (0.6 * (F.col("d1") * F.col("d3")))
        ).alias("eff_notional")
    )
    return eff.agg(
        F.count("*").alias("n_hedging_sets"),
        scaled_sum(F.col("eff_notional"), 2).alias("total_eff_notional"),
        F.round(scaled_sum(F.lit(0.005) * F.col("eff_notional"), 4), 2).alias("addon_ir"),
    )


_C34_ORACLE = f"""
    WITH trades AS (
        SELECT l_orderkey AS netting_set,
               l_extendedprice * (1 - l_discount) AS mtm,
               l_quantity * 1000.0 AS notional,
               CASE l_returnflag WHEN 'A' THEN 'ir' WHEN 'N' THEN 'fx' ELSE 'credit' END AS asset_class,
               CAST(CASE l_returnflag WHEN 'A' THEN 0.005 WHEN 'N' THEN 0.04 ELSE 0.05 END AS DOUBLE) AS sf
        FROM lineitem
    ), per_class AS (
        SELECT netting_set, asset_class,
               {sql_scaled_sum('mtm', 2)} AS class_mtm,
               {sql_scaled_sum('sf * notional', 2)} AS class_addon
        FROM trades GROUP BY 1, 2
    ), per_set AS (
        SELECT netting_set,
               {sql_scaled_sum('class_mtm', 2)} AS set_mtm,
               {sql_scaled_sum('class_addon', 2)} AS aggregate_addon
        FROM per_class GROUP BY netting_set
    ), set_figures AS (
        SELECT netting_set,
               greatest(set_mtm, 0.0) AS rc,
               aggregate_addon AS addon,
               1.4 * (greatest(set_mtm, 0.0) + aggregate_addon) AS ead
        FROM per_set
    )
    SELECT 'addon_' || asset_class AS row_label,
           CAST(count(DISTINCT netting_set) AS BIGINT) AS n_netting_sets,
           CAST(NULL AS DOUBLE) AS replacement_cost,
           {sql_scaled_sum('class_addon', 2)} AS pfe_addon,
           CAST(NULL AS DOUBLE) AS ead
    FROM per_class GROUP BY asset_class
    UNION ALL
    SELECT 'saccr_total',
           CAST(count(*) AS BIGINT),
           {sql_scaled_sum('rc', 2)},
           {sql_scaled_sum('addon', 2)},
           {sql_scaled_sum('ead', 2)}
    FROM set_figures
    """


@query("corep_c34", oracle=_C34_ORACLE, tags=("ccr", "reporting"))
def corep_c34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COREP C 34.01/34.02 — counterparty-credit-risk exposure analysis
    (ref reporting/corep/c34.py, 536 LoC; CRR Art.274-280): the C 34.01
    "composition of the PFE add-on" rows (one per SA-CCR asset class, the
    per-class supervisory-factor add-on summed across netting sets) plus
    the C 34.02 SA-CCR summary row — netting-set count, total replacement
    cost max(V,0), total aggregate add-on, and total EAD = α·(RC + PFE),
    α = 1.4. Composition rows carry null RC/EAD (those figures live at
    netting-set grain, not asset-class grain — null is not the same claim
    as 0.0, the reference's empty-cell policy)."""
    li = load_table(spark, sf_dir, "lineitem")
    trades = li.select(
        F.col("l_orderkey").alias("netting_set"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("mtm"),
        (F.col("l_quantity") * 1000.0).alias("notional"),
        F.when(F.col("l_returnflag") == "A", "ir")
        .when(F.col("l_returnflag") == "N", "fx")
        .otherwise("credit")
        .alias("asset_class"),
        F.when(F.col("l_returnflag") == "A", 0.005)
        .when(F.col("l_returnflag") == "N", 0.04)
        .otherwise(0.05)
        .cast("double")
        .alias("sf"),
    )
    per_class = trades.groupBy("netting_set", "asset_class").agg(
        scaled_sum(F.col("mtm"), 2).alias("class_mtm"),
        scaled_sum(F.col("sf") * F.col("notional"), 2).alias("class_addon"),
    )
    per_set = per_class.groupBy("netting_set").agg(
        scaled_sum(F.col("class_mtm"), 2).alias("set_mtm"),
        scaled_sum(F.col("class_addon"), 2).alias("aggregate_addon"),
    )
    set_figures = per_set.select(
        "netting_set",
        F.greatest(F.col("set_mtm"), F.lit(0.0)).alias("rc"),
        F.col("aggregate_addon").alias("addon"),
        (
            F.lit(1.4)
            * (F.greatest(F.col("set_mtm"), F.lit(0.0)) + F.col("aggregate_addon"))
        ).alias("ead"),
    )
    composition = per_class.groupBy("asset_class").agg(
        F.countDistinct("netting_set").alias("n_netting_sets"),
        scaled_sum(F.col("class_addon"), 2).alias("pfe_addon"),
    ).select(
        F.concat(F.lit("addon_"), F.col("asset_class")).alias("row_label"),
        "n_netting_sets",
        F.lit(None).cast("double").alias("replacement_cost"),
        "pfe_addon",
        F.lit(None).cast("double").alias("ead"),
    )
    total = set_figures.agg(
        F.count("*").alias("n_netting_sets"),
        scaled_sum(F.col("rc"), 2).alias("replacement_cost"),
        scaled_sum(F.col("addon"), 2).alias("pfe_addon"),
        scaled_sum(F.col("ead"), 2).alias("ead"),
    ).select(
        F.lit("saccr_total").alias("row_label"),
        "n_netting_sets",
        "replacement_cost",
        "pfe_addon",
        "ead",
    )
    return composition.unionByName(total)


_CCR2_ORACLE = f"""
    WITH scva AS (
        SELECT n.n_name,
               CAST(CASE WHEN r.r_name = 'EUROPE' THEN 0.01 ELSE 0.03 END AS DOUBLE)
                   * ({sql_scaled_sum('o.o_totalprice', 2)}) AS s_cva,
               {sql_scaled_sum('o.o_totalprice', 2)} AS ead
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name
    ), k AS (
        SELECT sqrt(power(0.5 * sum(s_cva), 2) + 0.75 * sum(s_cva * s_cva)) AS k_cva,
               CAST(count(*) AS BIGINT) AS n_cp,
               sum(CAST(round(ead * 100.0, 0) AS BIGINT)) / CAST(100 AS DOUBLE) AS ead
        FROM scva
    )
    , r AS (
        SELECT n_cp, ead, round(k_cva, 2) AS k2 FROM k
    )
    SELECT 'ba_cva_reduced' AS row_label, n_cp AS n_counterparties,
           ead, k2 AS own_funds_req,
           floor(k2 * 12.5 * 100.0 + 0.5) / 100.0 AS rwea
    FROM r
    UNION ALL
    SELECT 'total', n_cp, ead, k2, floor(k2 * 12.5 * 100.0 + 0.5) / 100.0
    FROM r
    """


@query("pillar3_ccr2", oracle=_CCR2_ORACLE, tags=("ccr", "cva", "reporting", "tolerant"))
def pillar3_ccr2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pillar 3 CCR2 — CVA capital charge (ref reporting/pillar3/ccr.py;
    CRR Art.439(e)/384): the template row form of the BA-CVA reduced
    formula — per approach row (only BA-CVA here; the reference's SA-CVA
    row stays structurally absent), EAD of the in-scope portfolio, the
    own-funds requirement K, and RWEA = K × 12.5, plus the total row. The
    disclosure is a pure re-presentation of the `ba_cva` portfolio
    aggregation — one source of truth for the K formula."""
    from pyspark.sql import Row

    k_row = ba_cva(spark, sf_dir).collect()[0]  # O(1) scalars by design
    ead_row = (
        load_table(spark, sf_dir, "orders")
        .agg(scaled_sum(F.col("o_totalprice"), 2).alias("ead"))
        .collect()[0]
    )
    import math

    # floor-based cent rounding: k2dp × 12.5 lands on exact eighths, where
    # Spark/Python half-even and DuckDB half-away disagree (verify-recipe
    # gotcha) — floor(x·100 + 0.5) is identical in both engines
    rwea = math.floor(float(k_row.k_cva) * 12.5 * 100.0 + 0.5) / 100.0
    rows = [
        ("ba_cva_reduced", k_row.n_counterparties, float(ead_row.ead),
         float(k_row.k_cva), rwea),
        ("total", k_row.n_counterparties, float(ead_row.ead),
         float(k_row.k_cva), rwea),
    ]
    return spark.createDataFrame(
        rows,
        "row_label string, n_counterparties long, ead double, "
        "own_funds_req double, rwea double",
    )
