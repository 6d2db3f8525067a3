"""SA and IRB calculators (ref engine/sa/risk_weights.py,
engine/irb/formulas.py) + approach routing (ref engine/stages/calc.py:
filter-split by approach, compute branches, recombine by unionByName).

SA: rulepack RW lookup on (class, cqs) broadcast-joined, override ladder
(defaulted / retail / unrated), guarantee substitution on the covered
portion, supporting factors.

IRB: the staged K pipeline from functions/irb (codegen-friendly Φ/Φ⁻¹),
PD/LGD floors from the rulepack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import CalcOutput, CRMOutput
from rwa_calculator_spark.engine.rulepack import RulePack
from rwa_calculator_spark.functions.irb import irb_maturity_adj, with_irb_k
from rwa_calculator_spark.functions.stats import with_normal_ppf
from rwa_calculator_spark.operators.dictionary import dictionary_apply

_RESULT_COLS = [
    "exposure_reference",
    "counterparty_reference",
    "exposure_class",
    "approach",
    "ead",
    "ead_after_crm",
    "risk_weight",
    "rwa_before_sf",
    "rwa",
]


def run_sa(crm: CRMOutput, pack: RulePack) -> CalcOutput:
    spark = crm.exposures.sparkSession
    exp = crm.exposures.where(
        ~F.col("has_irb_permission")
        & ~F.col("is_specialised")
        & (F.col("exposure_class") != "securitisation")
    )

    rw_table = pack.broadcast_table(spark, "sa_rw")
    exp = exp.join(
        rw_table,
        (exp.exposure_class == rw_table.exposure_class) & (F.coalesce(exp.cqs, F.lit(0)) == rw_table.cqs),
        "left",
    ).drop(rw_table.exposure_class).drop(rw_table.cqs)

    base_rw = (
        F.when(
            F.col("is_defaulted") & (F.col("exposure_class") == "re_secured"),
            pack.lit("defaulted_rw_secured"),
        )
        .when(F.col("is_defaulted"), pack.lit("defaulted_rw"))
        .when(F.col("exposure_class") == "re_secured", pack.lit("re_secured_rw"))
        .when(F.col("exposure_class") == "retail", pack.lit("retail_rw"))
        .when(F.col("rw").isNotNull(), F.col("rw"))
        .otherwise(pack.lit("unrated_corp_rw"))
    )
    exp = exp.withColumn("own_rw", base_rw)

    # guarantee substitution on the covered share (ref crm/guarantees.py)
    g_rw_table = pack.table_df(spark, "sa_rw").select(
        F.col("exposure_class").alias("g_class_t"),
        F.col("cqs").alias("g_cqs_t"),
        F.col("rw").alias("g_rw"),
    )
    exp = exp.join(
        F.broadcast(g_rw_table),
        (F.col("g_class") == F.col("g_class_t"))
        & (F.coalesce(F.col("g_cqs"), F.lit(0)) == F.col("g_cqs_t")),
        "left",
    ).drop("g_class_t", "g_cqs_t")
    eff_rw = (
        F.col("g_coverage") * F.least(F.col("own_rw"), F.coalesce("g_rw", F.col("own_rw")))
        + (1 - F.col("g_coverage")) * F.col("own_rw")
    )
    exp = exp.withColumn("risk_weight", eff_rw)

    sf = F.when(
        (F.col("exposure_class") == "corporate")
        & (F.col("annual_revenue") > 0)
        & (F.col("annual_revenue") <= 50_000_000),
        pack.lit("sme_supporting_factor"),
    ).otherwise(F.lit(1.0))

    out = exp.select(
        "exposure_reference",
        "counterparty_reference",
        "exposure_class",
        F.lit("SA").alias("approach"),
        "ead",
        "ead_after_crm",
        "risk_weight",
        (F.col("ead_after_crm") * F.col("risk_weight")).alias("rwa_before_sf"),
        (F.col("ead_after_crm") * F.col("risk_weight") * sf).alias("rwa"),
    )
    return CalcOutput(results=out)


def run_irb(crm: CRMOutput, pack: RulePack, dictionary: bool = True) -> CalcOutput:
    exp = crm.exposures.where(
        F.col("has_irb_permission")
        & ~F.col("is_specialised")
        & (F.col("exposure_class") != "securitisation")
    )
    exp = exp.withColumn(
        "pd_floored",
        F.when(F.col("is_defaulted"), F.lit(1.0)).otherwise(
            F.greatest(F.coalesce("pd", F.lit(1.0)), pack.lit("pd_floor"))
        ),
    ).withColumn(
        "lgd_floored",
        F.greatest(F.coalesce("lgd", F.lit(0.45)), pack.lit("lgd_floor_unsecured")),
    ).withColumn(
        "m_eff", F.least(F.greatest(F.coalesce("effective_maturity", F.lit(2.5)), F.lit(1.0)), F.lit(5.0))
    )

    perf = exp.where(F.col("pd_floored") < 1.0)

    def _k_ma(dims):
        dims = with_normal_ppf(dims, "pd_floored", "g_pd")
        dims = with_irb_k(dims, "pd_floored", "lgd_floored", "g_pd", "k")
        dims = dims.withColumn("ma", irb_maturity_adj(F.col("pd_floored"), F.col("m_eff")))
        return dims.drop("g_pd")

    if dictionary:
        # dictionary evaluation: K/MA computed once per distinct
        # (PD, LGD, M) combo, broadcast back — bit-identical to per-row
        # evaluation; right for banded master scales
        perf = dictionary_apply(perf, ["pd_floored", "lgd_floored", "m_eff"], _k_ma)
    else:
        perf = _k_ma(perf)
    perf = perf.withColumn("risk_weight", F.col("k") * F.col("ma") * 12.5)

    # defaulted under IRB: RW from max(0, 12.5·(LGD − EL_BE)) — simplified
    # to the reference's conservative default here
    dflt = exp.where(F.col("pd_floored") >= 1.0).withColumn("risk_weight", F.lit(0.0))

    out = perf.select(*_irb_cols()).unionByName(dflt.select(*_irb_cols()))
    return CalcOutput(results=out)


def _irb_cols():
    return [
        "exposure_reference",
        "counterparty_reference",
        "exposure_class",
        F.lit("IRB").alias("approach"),
        "ead",
        "ead_after_crm",
        "risk_weight",
        (F.col("ead_after_crm") * F.col("risk_weight")).alias("rwa_before_sf"),
        (F.col("ead_after_crm") * F.col("risk_weight")).alias("rwa"),
    ]


def run_secsa(crm: CRMOutput, pack: RulePack) -> CalcOutput:
    """SEC-SA branch for securitisation pool rows (ref
    engine/aggregator/_securitisation.py; CRR Art.261 distilled — flat pool
    K_SA × 12.5 × p with the 15% floor; the SSFA tranche integral is out of
    scope, the routing/floor shape is real)."""
    exp = crm.exposures.where(F.col("exposure_class") == "securitisation")
    rw = F.greatest(
        pack.lit("secsa_floor_rw"),
        pack.lit("secsa_ksa") * F.lit(12.5) * pack.lit("secsa_p"),
    )
    out = exp.select(
        "exposure_reference",
        "counterparty_reference",
        "exposure_class",
        F.lit("SEC-SA").alias("approach"),
        "ead",
        "ead_after_crm",
        rw.alias("risk_weight"),
        (F.col("ead_after_crm") * rw).alias("rwa_before_sf"),
        (F.col("ead_after_crm") * rw).alias("rwa"),
    )
    return CalcOutput(results=out)


def run_slotting(crm: CRMOutput, pack: RulePack) -> CalcOutput:
    """Specialised-lending supervisory slotting: exposures of counterparties
    in the specialised_lending table take the slot-category RW from the
    rulepack (CRR Art.153(5); ref engine/slotting/)."""
    spark = crm.exposures.sparkSession
    exp = crm.exposures.where(F.col("is_specialised"))
    slot_rw = pack.broadcast_table(spark, "slotting_rw")
    exp = exp.join(slot_rw, "slot_category", "left").withColumn(
        "risk_weight",
        F.when(F.col("is_defaulted"), F.lit(0.0)).otherwise(
            F.coalesce("rw", pack.lit("unrated_corp_rw"))
        ),
    )
    out = exp.select(
        "exposure_reference",
        "counterparty_reference",
        F.lit("specialised").alias("exposure_class"),
        F.lit("SLOTTING").alias("approach"),
        "ead",
        "ead_after_crm",
        "risk_weight",
        (F.col("ead_after_crm") * F.col("risk_weight")).alias("rwa_before_sf"),
        (F.col("ead_after_crm") * F.col("risk_weight")).alias("rwa"),
    )
    return CalcOutput(results=out)


def run_equity(equity: DataFrame, pack: RulePack) -> CalcOutput:
    """Equity holdings, regime-aware.

    CRR: IRB simple risk-weight method (Art.155(2); ref
    engine/equity/calculator.py:760-762) — diversified PE 190%,
    exchange-traded 290%, other 370%.
    B3.1: IRB equity removed (PS1/26 Art.133) — SA 250% standard,
    400% speculative unlisted.
    """
    listed = F.coalesce("is_exchange_traded", F.lit(False))
    # optional flags (absent in minimal bundles → default false)
    pe_div = (
        F.coalesce("is_diversified_pe", F.lit(False))
        if "is_diversified_pe" in equity.columns
        else F.lit(False)
    )
    spec = (
        F.coalesce("is_speculative", F.lit(False))
        if "is_speculative" in equity.columns
        else F.lit(False)
    )
    if pack.scalar("equity_irb_available") >= 1.0:
        rw = (
            F.when(pe_div, pack.lit("equity_pe_diversified_rw"))
            .when(listed, pack.lit("equity_exchange_traded_rw"))
            .otherwise(pack.lit("equity_other_rw"))
        )
    else:
        rw = F.when(spec, pack.lit("equity_speculative_rw")).otherwise(
            pack.lit("equity_standard_rw")
        )
    mv = F.coalesce("market_value", F.lit(0.0))
    out = equity.select(
        "exposure_reference",
        "counterparty_reference",
        F.lit("equity").alias("exposure_class"),
        F.lit("EQUITY").alias("approach"),
        mv.alias("ead"),
        mv.alias("ead_after_crm"),
        rw.alias("risk_weight"),
        (mv * rw).alias("rwa_before_sf"),
        (mv * rw).alias("rwa"),
    )
    return CalcOutput(results=out)
