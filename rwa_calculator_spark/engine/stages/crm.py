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


def run_crm(raw: RawBundle, c: ClassifiedOutput, pack: RulePack) -> CRMOutput:
    spark = c.exposures.sparkSession
    exp = c.exposures

    # --- EAD: drawn + CCF × undrawn (ref engine/ccf.py) -------------------
    ccf = pack.broadcast_table(spark, "ccf")
    exp = (
        exp.join(ccf, "risk_bucket", "left")
        .withColumn("ccf", F.coalesce("ccf", F.lit(1.0)))
        .withColumn("ead", F.col("drawn_amount") + F.col("ccf") * F.col("undrawn_amount"))
    )

    # --- collateral: haircut then pro-rata allocation over links ----------
    if raw.collateral is not None and raw.collateral_links is not None:
        coll = raw.collateral.select(
            "collateral_reference",
            (
                F.coalesce("market_value", F.lit(0.0))
                * (1 - F.coalesce("haircut", F.lit(0.0)))
                * (1 - F.when(F.coalesce("currency_mismatch", F.lit(False)), pack.lit("fx_haircut")).otherwise(0.0))
            ).alias("adjusted_value"),
        )
        links = raw.collateral_links.select("collateral_reference", "exposure_reference")
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
