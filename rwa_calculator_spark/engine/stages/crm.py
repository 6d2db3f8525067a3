"""CRM stage: EAD (CCF), collateral FCCM with supervisory haircuts and
pro-rata link allocation, guarantee substitution
(ref engine/ccf.py, engine/crm/{haircuts,collateral,link_allocation,
guarantees}.py — the 3,000-LoC CRM surface reduced to its dataflow shapes,
parameterised by the rulepack).

Shapes and their scale posture:
- CCF: broadcast lookup join on risk_bucket (rulepack table);
- link allocation: one collateral item split across beneficiary exposures
  pro-rata by exposure EAD — window sum denominator, no collapse;
- FCCM: E* = max(0, EAD − Σ allocated collateral × (1 − haircut));
- guarantees: covered portion takes min(own RW, guarantor RW) downstream
  (the guarantee columns ride along to the SA stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import ClassifiedOutput, CRMOutput, RawBundle
from rwa_calculator_spark.engine.rulepack import RulePack


def _resolve_provisions(exp: DataFrame, provisions: DataFrame) -> DataFrame:
    """Multi-level provision allocation (ref engine/crm/provisions.py:37-110
    resolve_provisions + kernels/allocation.py allocate_multi_level):

    1. direct — beneficiary_reference names the exposure: full amount;
    2. facility — beneficiary names a facility: pro-rata over the facility's
       exposures by pre-CCF amount (requires parent_facility_reference);
    3. counterparty — beneficiary names the obligor: pro-rata over the
       obligor's exposures by pre-CCF amount.

    Levels combine additively into provision_allocated. The item aggregate
    is one conditional groupBy per (level, beneficiary); each level joins at
    its own key — dimension-sized joins, window-sum pro-rata denominators,
    no fact collapse."""
    btype = (
        F.coalesce("beneficiary_type", F.lit("direct"))
        if "beneficiary_type" in provisions.columns
        else F.lit("direct")
    )
    items = provisions.select(
        "beneficiary_reference",
        btype.alias("_lvl"),
        F.coalesce("amount", F.lit(0.0)).alias("_amt"),
    ).withColumn(
        "_lvl",
        F.when(F.col("_lvl").isin("loan", "exposure", "contingent", "direct"), "direct")
        .otherwise(F.col("_lvl")),
    )
    per_level = items.groupBy("_lvl", "beneficiary_reference").agg(
        F.sum("_amt").alias("_prov")
    )

    basis = F.col("drawn_amount") + F.col("undrawn_amount")
    exp = exp.withColumn("_basis", basis)

    # direct: full amount onto the named exposure
    direct = per_level.where(F.col("_lvl") == "direct").select(
        F.col("beneficiary_reference").alias("exposure_reference"),
        F.col("_prov").alias("_prov_direct"),
    )
    exp = exp.join(F.broadcast(direct), "exposure_reference", "left")

    # counterparty: pro-rata by basis within the obligor
    cp = per_level.where(F.col("_lvl") == "counterparty").select(
        F.col("beneficiary_reference").alias("counterparty_reference"),
        F.col("_prov").alias("_prov_cp_total"),
    )
    exp = exp.join(F.broadcast(cp), "counterparty_reference", "left")
    w_cp = W.partitionBy("counterparty_reference")
    cp_denom = F.sum(F.round(F.col("_basis") * 100.0, 0).cast("long")).over(w_cp) / F.lit(
        100.0
    )
    prov_cp = F.when(
        F.col("_prov_cp_total").isNotNull() & (cp_denom > 0),
        F.col("_prov_cp_total") * F.col("_basis") / cp_denom,
    ).otherwise(F.lit(0.0))

    # facility: pro-rata within the facility (column present only when the
    # bundle carries facility mappings)
    if "parent_facility_reference" in exp.columns:
        fac = per_level.where(F.col("_lvl") == "facility").select(
            F.col("beneficiary_reference").alias("parent_facility_reference"),
            F.col("_prov").alias("_prov_fac_total"),
        )
        exp = exp.join(F.broadcast(fac), "parent_facility_reference", "left")
        w_fac = W.partitionBy("parent_facility_reference")
        fac_denom = F.sum(
            F.round(F.col("_basis") * 100.0, 0).cast("long")
        ).over(w_fac) / F.lit(100.0)
        prov_fac = F.when(
            F.col("parent_facility_reference").isNotNull()
            & F.col("_prov_fac_total").isNotNull()
            & (fac_denom > 0),
            F.col("_prov_fac_total") * F.col("_basis") / fac_denom,
        ).otherwise(F.lit(0.0))
    else:
        prov_fac = F.lit(0.0)

    exp = exp.withColumn(
        "provision_allocated",
        F.coalesce("_prov_direct", F.lit(0.0)) + prov_fac + prov_cp,
    )
    return exp.drop("_basis", "_prov_direct", "_prov_cp_total", "_prov_fac_total")


def run_crm(raw: RawBundle, c: ClassifiedOutput, pack: RulePack) -> CRMOutput:
    spark = c.exposures.sparkSession
    exp = c.exposures

    # --- provisions: multi-level allocation + SA drawn-first deduction ----
    # (CRR Art.110-111(2); ref engine/crm/provisions.py resolve_provisions)
    if raw.provisions is not None:
        exp = _resolve_provisions(exp, raw.provisions)
    else:
        exp = exp.withColumn("provision_allocated", F.lit(0.0))

    # SA rows deduct drawn-first; IRB/slotting rows pass provisions through
    # to EL shortfall/excess instead (ref provisions.py IRB pass-through)
    is_sa = ~F.col("has_irb_permission") & ~F.col("is_specialised")
    floored_drawn = F.greatest(F.col("drawn_amount"), F.lit(0.0))
    prov_on_drawn = F.when(
        is_sa, F.least(F.col("provision_allocated"), floored_drawn)
    ).otherwise(F.lit(0.0))
    exp = exp.withColumn("provision_on_drawn", prov_on_drawn).withColumn(
        "provision_on_nominal",
        F.when(
            is_sa,
            F.least(
                F.col("provision_allocated") - F.col("provision_on_drawn"),
                F.col("undrawn_amount"),
            ),
        ).otherwise(F.lit(0.0)),
    )

    # --- EAD: (drawn − prov) + CCF × (undrawn − prov) (ref engine/ccf.py) --
    ccf = pack.broadcast_table(spark, "ccf")
    exp = (
        exp.join(ccf, "risk_bucket", "left")
        .withColumn("ccf", F.coalesce("ccf", F.lit(1.0)))
        .withColumn(
            "ead",
            (F.col("drawn_amount") - F.col("provision_on_drawn"))
            + F.col("ccf") * (F.col("undrawn_amount") - F.col("provision_on_nominal")),
        )
    )

    # --- collateral: haircut then pro-rata allocation over links ----------
    # real-estate items are NOT FCCM-netted — they route to the RE-split
    # stage instead (ref engine/stages/re_split; CRR Art.124-126), so the
    # same property can never both reduce EAD here and secure a tranche
    if raw.collateral is not None and raw.collateral_links is not None:
        fin_coll = raw.collateral
        if "collateral_type" in fin_coll.columns:
            fin_coll = fin_coll.where(
                F.coalesce("collateral_type", F.lit("")) != "real_estate"
            )
        coll = fin_coll.select(
            "collateral_reference",
            (
                F.coalesce("market_value", F.lit(0.0))
                * (1 - F.coalesce("haircut", F.lit(0.0)))
                * (1 - F.when(F.coalesce("currency_mismatch", F.lit(False)), pack.lit("fx_haircut")).otherwise(0.0))
            ).alias("adjusted_value"),
        )
        links = raw.collateral_links.select(
            "collateral_reference", "exposure_reference"
        )
        # pro-rata by beneficiary EAD (ref engine/kernels/allocation.py)
        linked = links.join(
            exp.select("exposure_reference", "ead"), "exposure_reference"
        ).join(F.broadcast(coll), "collateral_reference")
        wcoll = W.partitionBy("collateral_reference")
        denom = F.sum(F.round(F.col("ead") * 100.0, 0).cast("long")).over(wcoll) / F.lit(100.0)
        allocated = linked.withColumn(
            "allocated_value",
            F.col("adjusted_value") * (F.col("ead") / F.nullif(denom, F.lit(0.0))),
        )
        per_exposure = allocated.groupBy("exposure_reference").agg(
            F.sum("allocated_value").alias("collateral_value")
        )
        exp = exp.join(per_exposure, "exposure_reference", "left").withColumn(
            "collateral_value", F.coalesce("collateral_value", F.lit(0.0))
        )
    else:
        exp = exp.withColumn("collateral_value", F.lit(0.0))

    # FCCM: effective exposure after collateral (capped at zero)
    exp = exp.withColumn(
        "ead_after_crm", F.greatest(F.col("ead") - F.col("collateral_value"), F.lit(0.0))
    )

    # --- guarantees: coverage share + guarantor class ---------------------
    if raw.guarantees is not None:
        g = raw.guarantees.select(
            "exposure_reference",
            F.coalesce("coverage_pct", F.lit(0.0)).alias("g_coverage"),
            F.col("guarantor_class").alias("g_class"),
            F.col("guarantor_cqs").cast("int").alias("g_cqs"),
        )
        # one guarantee per exposure in this slice; first-wins dedup guards
        wg = W.partitionBy("exposure_reference").orderBy(
            F.col("g_coverage").desc(), F.col("g_class")
        )
        g = g.withColumn("rn", F.row_number().over(wg)).where(F.col("rn") == 1).drop("rn")
        exp = exp.join(F.broadcast(g), "exposure_reference", "left")
    else:
        exp = (
            exp.withColumn("g_coverage", F.lit(0.0))
            .withColumn("g_class", F.lit(None).cast("string"))
            .withColumn("g_cqs", F.lit(None).cast("int"))
        )
    exp = exp.withColumn("g_coverage", F.coalesce("g_coverage", F.lit(0.0)))

    return CRMOutput(exposures=exp)
