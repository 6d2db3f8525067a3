"""Real-estate split stage: exposures secured by RE collateral split into a
secured tranche (capped at 80% of property value, preferential RW) and an
unsecured remainder (ref engine/stages/re_split/splitter.py:323 — child
rows concatenated into the ledger between CRM and the calculators;
CRR Art.124-126).

Scale posture: RE collateral aggregates to exposure grain through the link
table (one keyed shuffle on the collateral key then one on the exposure
key); the split itself is an explode of a 2-element struct array — no
driver round-trip, row growth ≤ 2×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import CRMOutput, RawBundle
from rwa_calculator_spark.engine.rulepack import RulePack

RE_LTV_CAP = 0.8  # secured tranche cap: 80% of property value (CRR Art.125(2)(d))


def run_re_split(crm: CRMOutput, raw: RawBundle, pack: RulePack) -> CRMOutput:
    coll = raw.collateral
    if (
        coll is None
        or raw.collateral_links is None
        or "collateral_type" not in coll.columns
    ):
        return CRMOutput(
            exposures=crm.exposures.withColumn(
                "collateral_re_value", F.lit(0.0)
            )
        )

    re_items = coll.where(F.col("collateral_type") == "real_estate").select(
        "collateral_reference",
        F.coalesce("market_value", F.lit(0.0)).alias("_re_mv"),
    )
    re_per_exp = (
        raw.collateral_links.select("collateral_reference", "exposure_reference")
        .join(F.broadcast(re_items), "collateral_reference")
        .groupBy("exposure_reference")
        .agg(F.sum("_re_mv").alias("_re_value"))
    )

    exp = crm.exposures.join(re_per_exp, "exposure_reference", "left")
    # ledger carrier (ref CALCULATION_OUTPUT_SCHEMA collateral_re_value,
    # data/schemas.py:2965): the real-estate collateral value securing the
    # row — sealed HERE because RE items never enter the FCCM channel (the
    # same property cannot both net EAD and drive the Art.124(2) split)
    exp = exp.withColumn("collateral_re_value", F.coalesce("_re_value", F.lit(0.0)))
    secured = F.least(F.col("ead_after_crm"), F.lit(RE_LTV_CAP) * F.col("_re_value"))
    splittable = (
        F.col("_re_value").isNotNull()
        & (F.col("ead_after_crm") > 0)
        & (secured > 0)
    )

    plain = (
        exp.where(~splittable)
        .drop("_re_value")
        .withColumn("source_exposure_reference", F.col("exposure_reference"))
    )

    split_src = exp.where(splittable).withColumn("_secured", secured)
    # pre-CRM EAD splits pro-rata with the post-CRM split so component
    # buckets stay conserved
    ratio = F.col("_secured") / F.col("ead_after_crm")
    parts = split_src.withColumn(
        "_part",
        F.explode(
            F.array(
                F.struct(
                    F.lit("_RESEC").alias("suffix"),
                    F.lit("re_secured").alias("cls"),
                    F.col("_secured").alias("part_ead_after"),
                    (F.col("ead") * ratio).alias("part_ead"),
                ),
                F.struct(
                    F.lit("").alias("suffix"),
                    F.col("exposure_class").alias("cls"),
                    (F.col("ead_after_crm") - F.col("_secured")).alias("part_ead_after"),
                    (F.col("ead") * (1 - ratio)).alias("part_ead"),
                ),
            )
        ),
    ).where((F.col("_part.part_ead_after") > 0) | (F.col("_part.suffix") == "_RESEC"))
    split_rows = (
        # split provenance (ref CALCULATION_OUTPUT_SCHEMA
        # source_exposure_reference: "original exposure before any splits"):
        # both parts name the pre-split reference; unsplit rows seal their
        # own reference in the calculators' identity fill
        parts.withColumn(
            "source_exposure_reference", F.col("exposure_reference")
        )
        .withColumn(
            "exposure_reference",
            F.concat(F.col("exposure_reference"), F.col("_part.suffix")),
        )
        .withColumn("exposure_class", F.col("_part.cls"))
        .withColumn("ead_after_crm", F.col("_part.part_ead_after"))
        .withColumn("ead", F.col("_part.part_ead"))
        .drop("_part", "_re_value", "_secured")
    )
    return CRMOutput(exposures=plain.unionByName(split_rows))
