"""Scalar-function families and remaining composed shapes (SURVEY §2.9
string/date rows, §2.13 netting/slotting/equity/comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum, sql_scaled_sum
from rwa_calculator_spark.plans.registry import query
from rwa_calculator_spark.sources.star import load_table


@query(
    "scalar_string_funcs",
    oracle=f"""
    SELECT CASE WHEN lower(p_type) LIKE '%anodized%' THEN 'anodized'
                WHEN p_type LIKE 'STANDARD%' THEN 'standard'
                ELSE 'other' END AS type_bucket,
           upper(p_brand) AS brand_u,
           count(*) AS n_parts,
           sum(length(p_name))::BIGINT AS total_name_len,
           {sql_scaled_sum('p_retailprice', 2)} AS total_price,
           string_agg(DISTINCT substr(p_name, 1, 2), ',' ORDER BY substr(p_name, 1, 2)) AS prefixes
    FROM part
    GROUP BY 1, 2
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: contains/lower/upper/startswith/length/substr/concat
    (ref §2.9: str.contains ×80, to_lowercase ×74, starts_with ×9 — class
    routing ladders like engine/irb/formulas.py:192-196)."""
    p = load_table(spark, sf_dir, "part")
    bucket = (
        F.when(F.lower("p_type").contains("anodized"), "anodized")
        .when(F.col("p_type").startswith("STANDARD"), "standard")
        .otherwise("other")
    )
    agg = p.groupBy(bucket.alias("type_bucket"), F.upper("p_brand").alias("brand_u")).agg(
        F.count("*").alias("n_parts"),
        F.sum(F.length("p_name")).cast("long").alias("total_name_len"),
        scaled_sum(F.col("p_retailprice"), 2).alias("total_price"),
        F.sort_array(F.collect_set(F.substring("p_name", 1, 2))).alias("pfx"),
    )
    return agg.select(
        "type_bucket",
        "brand_u",
        "n_parts",
        "total_name_len",
        "total_price",
        F.concat_ws(",", "pfx").alias("prefixes"),
    )


@query(
    "scalar_date_funcs",
    oracle=f"""
    SELECT year(o.o_orderdate) AS order_year,
           count(*) AS n,
           round({sql_scaled_sum("CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS DOUBLE) / 365.25", 6)}, 4) AS total_maturity_years,
           sum(CASE WHEN dayofyear(l.l_shipdate) <= 183 THEN 1 ELSE 0 END)::BIGINT AS n_h1
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: the maturity-in-years pattern
    (maturity − reporting).days / 365.25 (ref engine/stages/classify/*,
    engine/ccr/maturity_factor.py), year(), dayofyear()."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
    maturity_years = F.datediff("l_shipdate", "o_orderdate").cast("double") / F.lit(365.25)
    return j.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count("*").alias("n"),
        F.round(scaled_sum(maturity_years, 6), 4).alias("total_maturity_years"),
        F.sum(F.when(F.dayofyear("l_shipdate") <= 183, 1).otherwise(0)).cast("long").alias("n_h1"),
    )


@query(
    "onbal_netting",
    oracle=f"""
    WITH nets AS (
        SELECT l_orderkey,
               greatest(
                   {sql_scaled_sum("CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0.0 END", 2)}
                   - {sql_scaled_sum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END", 2)},
                   0.0) AS net_exposure,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus,
           count(*) AS n_netting_sets,
           {sql_scaled_sum('n.net_exposure', 2)} AS total_net_exposure,
           sum(CASE WHEN n.net_exposure = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_fully_netted
    FROM nets n JOIN orders o ON n.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("domain", "netting"),
)
def onbal_netting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance-sheet netting: conditional group-by per netting set
    (assets − liabilities floored at 0) then join-back
    (ref engine/crm/collateral.py:256-330 netting on (agreement, ccy, cp))."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    nets = li.groupBy("l_orderkey").agg(
        F.greatest(
            scaled_sum(
                F.when(F.col("l_returnflag") == "N", F.col("l_extendedprice")).otherwise(0.0), 2
            )
            - scaled_sum(
                F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0), 2
            ),
            F.lit(0.0),
        ).alias("net_exposure"),
        F.count("*").alias("n_lines"),
    )
    j = nets.join(F.broadcast(o), nets.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_netting_sets"),
        scaled_sum(F.col("net_exposure"), 2).alias("total_net_exposure"),
        F.sum(F.when(F.col("net_exposure") == 0.0, 1).otherwise(0)).cast("long").alias(
            "n_fully_netted"
        ),
    )


@query(
    "slotting_rw",
    oracle=f"""
    SELECT CASE o_orderpriority
               WHEN '1-URGENT' THEN 'strong' WHEN '2-HIGH' THEN 'good'
               WHEN '3-MEDIUM' THEN 'satisfactory' ELSE 'weak' END AS slot,
           CAST(CASE o_orderpriority
               WHEN '1-URGENT' THEN 0.7 WHEN '2-HIGH' THEN 0.9
               WHEN '3-MEDIUM' THEN 1.15 ELSE 2.5 END AS DOUBLE) AS slot_rw,
           count(*) AS n_exposures,
           {sql_scaled_sum('''o_totalprice * CAST(CASE o_orderpriority
               WHEN '1-URGENT' THEN 0.7 WHEN '2-HIGH' THEN 0.9
               WHEN '3-MEDIUM' THEN 1.15 ELSE 2.5 END AS DOUBLE)''', 2)} AS total_rwa
    FROM orders GROUP BY 1, 2
    """,
    tags=("domain", "slotting"),
)
def slotting_rw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Specialised-lending supervisory slotting: category → fixed RW
    (strong 70% / good 90% / satisfactory 115% / weak 250%; CRR Art.153(5),
    ref engine/slotting/)."""
    o = load_table(spark, sf_dir, "orders")
    slot = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "strong")
        .when(F.col("o_orderpriority") == "2-HIGH", "good")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "satisfactory")
        .otherwise("weak")
    )
    rw = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 0.7)
        .when(F.col("o_orderpriority") == "2-HIGH", 0.9)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 1.15)
        .otherwise(2.5)
    )
    return o.groupBy(slot.alias("slot"), rw.alias("slot_rw")).agg(
        F.count("*").alias("n_exposures"),
        scaled_sum(F.col("o_totalprice") * rw.cast("double"), 2).alias("total_rwa"),
    )


@query(
    "equity_rw",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_holdings,
           {sql_scaled_sum('''abs(c_acctbal) * CAST(CASE WHEN c_acctbal >= 0
               THEN 1.9 ELSE 3.7 END AS DOUBLE)''', 2)} AS total_rwa
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("domain", "equity"),
)
def equity_rw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equity calculator: simple risk-weight method — 190% exchange-traded,
    370% other (CRR Art.155(2), ref engine/equity/calculator.py)."""
    c = load_table(spark, sf_dir, "customer")
    rw = F.when(F.col("c_acctbal") >= 0, 1.9).otherwise(3.7).cast("double")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_holdings"),
        scaled_sum(F.abs("c_acctbal") * rw, 2).alias("total_rwa"),
    )


def _sql_eu_sovereign() -> str:
    from rwa_calculator_spark.engine.rulepack import CRR_PACK

    values = ", ".join(
        f"('{c}', '{m}')" for c, m in CRR_PACK.tables["eu_domestic_ccy"][1]
    )
    return f"""
    WITH sovs AS (
        SELECT c.c_custkey,
               CASE n.n_nationkey % 6 WHEN 0 THEN 'DE' WHEN 1 THEN 'FR'
                    WHEN 2 THEN 'RO' WHEN 3 THEN 'PL' WHEN 4 THEN 'US'
                    ELSE 'RU' END AS country
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_mktsegment = 'HOUSEHOLD'
    ), expo AS (
        SELECT s.country,
               CASE o.o_orderkey % 4 WHEN 0 THEN 'EUR' WHEN 1 THEN 'USD'
                    WHEN 2 THEN 'RON' ELSE 'PLN' END AS currency,
               o.o_totalprice AS ead,
               CAST(1 + s.c_custkey % 6 AS INTEGER) AS cqs
        FROM orders o JOIN sovs s ON o.o_custkey = s.c_custkey
    ), weighted AS (
        SELECT e.country, e.currency,
               CASE WHEN m.domestic_ccy IS NOT NULL AND e.currency = m.domestic_ccy
                    THEN 0.0
                    ELSE CASE WHEN e.cqs <= 1 THEN 0.0 WHEN e.cqs = 2 THEN 0.2
                              WHEN e.cqs = 3 THEN 0.5 WHEN e.cqs <= 5 THEN 1.0
                              ELSE 1.5 END END AS rw,
               CASE WHEN m.domestic_ccy IS NOT NULL AND e.currency = m.domestic_ccy
                    THEN 'eu_domestic' ELSE 'cqs_ladder' END AS rw_source,
               e.ead
        FROM expo e
        LEFT JOIN (VALUES {values}) AS m(country, domestic_ccy)
          ON e.country = m.country
    )
    SELECT country, rw_source, count(*) AS n_exposures,
           {sql_scaled_sum('ead', 2)} AS total_ead,
           {sql_scaled_sum('ead * rw', 2)} AS total_rwa
    FROM weighted GROUP BY 1, 2
    """


@query(
    "sovereign_eu_domestic",
    oracle=_sql_eu_sovereign(),
    tags=("rwa", "sovereign"),
)
def sovereign_eu_domestic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EU member-state sovereign domestic-currency 0% RW (CRR Art.114(4)/
    (7) + Art.141; ref engine/eu_sovereign.py + engine/stages/calculators
    run_sa override): exposures to an EU central government denominated in
    the member state's domestic currency override the CQS ladder to 0%;
    foreign-currency and non-EU sovereigns keep the ladder weight. The
    country→currency map is rulepack data broadcast into the join — the
    oracle VALUES are generated from the SAME pack table."""
    from rwa_calculator_spark.engine.rulepack import CRR_PACK

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    country = (
        F.when(F.col("n_nationkey") % 6 == 0, "DE")
        .when(F.col("n_nationkey") % 6 == 1, "FR")
        .when(F.col("n_nationkey") % 6 == 2, "RO")
        .when(F.col("n_nationkey") % 6 == 3, "PL")
        .when(F.col("n_nationkey") % 6 == 4, "US")
        .otherwise("RU")
    )
    sovs = (
        c.where(F.col("c_mktsegment") == "HOUSEHOLD")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", country.alias("country"))
    )
    currency = (
        F.when(F.col("o_orderkey") % 4 == 0, "EUR")
        .when(F.col("o_orderkey") % 4 == 1, "USD")
        .when(F.col("o_orderkey") % 4 == 2, "RON")
        .otherwise("PLN")
    )
    expo = o.join(sovs, o.o_custkey == F.col("c_custkey")).select(
        "country",
        currency.alias("currency"),
        F.col("o_totalprice").alias("ead"),
        (1 + F.col("c_custkey") % 6).cast("int").alias("cqs"),
    )
    eu = CRR_PACK.broadcast_table(spark, "eu_domestic_ccy").select(
        F.col("country").alias("_eu_country"),
        F.col("domestic_ccy").alias("_eu_ccy"),
    )
    expo = expo.join(eu, expo.country == F.col("_eu_country"), "left")
    eu_match = F.col("_eu_ccy").isNotNull() & (F.col("currency") == F.col("_eu_ccy"))
    ladder = (
        F.when(F.col("cqs") <= 1, 0.0)
        .when(F.col("cqs") == 2, 0.2)
        .when(F.col("cqs") == 3, 0.5)
        .when(F.col("cqs") <= 5, 1.0)
        .otherwise(1.5)
    )
    rw = F.when(eu_match, F.lit(0.0)).otherwise(ladder)
    src = F.when(eu_match, "eu_domestic").otherwise("cqs_ladder")
    return (
        expo.select("country", "currency", rw.alias("rw"), src.alias("rw_source"), "ead")
        .groupBy("country", "rw_source")
        .agg(
            F.count("*").alias("n_exposures"),
            scaled_sum(F.col("ead"), 2).alias("total_ead"),
            scaled_sum(F.col("ead") * F.col("rw"), 2).alias("total_rwa"),
        )
    )
