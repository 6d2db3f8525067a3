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
