"""Classifier stage: exposure-class decision ladder (ref
engine/stages/classify/* — the 1,692-LoC case-when surface distilled to its
decision structure, driven by rulepack thresholds, not literals).

The retail threshold is a *group-level* test: total exposure of the obligor's
lending group ≤ threshold. That is a window sum over the resolved group key —
no collapse, no second join (ref engine/stages/hierarchy/facility_undrawn.py
group-total shapes).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import ClassifiedOutput, HierarchyOutput
from rwa_calculator_spark.engine.rulepack import RulePack


def run_classify(h: HierarchyOutput, pack: RulePack) -> ClassifiedOutput:
    exp = h.exposures
    grp = W.partitionBy("group_reference")
    total_exposure = F.sum(
        F.round((F.col("drawn_amount") + F.col("undrawn_amount")) * 100.0, 0).cast("long")
    ).over(grp) / F.lit(100.0)
    exp = exp.withColumn("group_exposure", total_exposure)

    is_retail = (
        (F.col("entity_type") == "individual") | F.col("is_managed_as_retail")
    ) & (F.col("group_exposure") <= pack.lit("retail_threshold"))

    cls = (
        F.when(F.col("entity_type") == "sovereign", "sovereign")
        .when(F.col("entity_type") == "institution", "institution")
        .when(is_retail, "retail")
        .otherwise("corporate")
    )
    return ClassifiedOutput(exposures=exp.withColumn("exposure_class", cls))
