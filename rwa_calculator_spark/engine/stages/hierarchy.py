"""Hierarchy stage: unify exposure sources, enrich with counterparty
attributes, resolve the org hierarchy (ref engine/stages/hierarchy/*:
unify.py diagonal_relaxed concat, enrich.py left joins, graph.py walks).

Scale posture: the exposure union is columnar and shuffle-free; the
counterparty enrich joins on counterparty_reference (broadcast when the dim
fits, shuffle-hash otherwise — AQE decides); hierarchy resolution is the
iterative broadcast-join from operators/graph (edge tables are tiny
relative to facts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import HierarchyOutput, RawBundle
from rwa_calculator_spark.operators.graph import resolve_ultimate_parent_iterative


def run_hierarchy(raw: RawBundle) -> HierarchyOutput:
    loans = raw.loans.select(
        F.col("loan_reference").alias("exposure_reference"),
        F.lit("loan").alias("exposure_type"),
        "counterparty_reference",
        F.coalesce("drawn_amount", F.lit(0.0)).alias("drawn_amount"),
        F.lit(0.0).alias("undrawn_amount"),
        F.lit(None).cast("string").alias("risk_bucket"),
        F.coalesce(F.col("is_defaulted"), F.lit(False)).alias("is_defaulted"),
        F.col("pd"),
        F.col("lgd"),
        F.col("effective_maturity"),
    )
    frames = [loans]
    if raw.contingents is not None:
        frames.append(
            raw.contingents.select(
                F.col("contingent_reference").alias("exposure_reference"),
                F.lit("contingent").alias("exposure_type"),
                "counterparty_reference",
                F.lit(0.0).alias("drawn_amount"),
                F.coalesce("nominal_amount", F.lit(0.0)).alias("undrawn_amount"),
                F.col("risk_bucket"),
                F.coalesce(F.col("is_defaulted"), F.lit(False)).alias("is_defaulted"),
                F.col("pd"),
                F.col("lgd"),
                F.col("effective_maturity"),
            )
        )
    exposures = frames[0]
    for f in frames[1:]:
        exposures = exposures.unionByName(f, allowMissingColumns=True)

    # One combined counterparty dimension: the three lookups (attributes,
    # slotting, resolved hierarchy) all key on counterparty_reference, so
    # they pre-join on the SMALL side and the fact table pays ONE broadcast
    # hash probe per row instead of three (and the driver builds one
    # broadcast map, not three).
    dim = raw.counterparties.select(
        "counterparty_reference",
        "entity_type",
        F.col("cqs").cast("int").alias("cqs"),
        F.coalesce("is_managed_as_retail", F.lit(False)).alias("is_managed_as_retail"),
        F.coalesce("annual_revenue", F.lit(0.0)).alias("annual_revenue"),
        F.coalesce("has_irb_permission", F.lit(False)).alias("has_irb_permission"),
    )

    if raw.specialised_lending is not None:
        sl = raw.specialised_lending.select("counterparty_reference", "slot_category")
        dim = dim.join(sl, "counterparty_reference", "left")
    else:
        dim = dim.withColumn("slot_category", F.lit(None).cast("string"))
    dim = dim.withColumn("is_specialised", F.col("slot_category").isNotNull())

    if raw.org_mappings is not None:
        # iterative resolution: every round re-joins the STATIC broadcast
        # edge table — cheaper than pointer jumping here, whose per-round
        # self-join re-broadcasts a growing unmaterialised plan (use
        # resolve_ultimate_parent_pointer_jumping only over materialised
        # maps with depth ≫ 10)
        up = resolve_ultimate_parent_iterative(
            raw.org_mappings.select(
                F.col("child_reference").alias("child"), F.col("parent_reference").alias("parent")
            )
        ).select(
            F.col("node").alias("counterparty_reference"),
            F.col("ultimate_parent").alias("group_reference"),
        )
        dim = dim.join(up, "counterparty_reference", "left")
    else:
        dim = dim.withColumn("group_reference", F.lit(None).cast("string"))

    enriched = exposures.join(F.broadcast(dim), "counterparty_reference", "left")
    # exposures may reference counterparties absent from the dim (or with no
    # org edge): their group defaults to themselves, matching the reference
    enriched = enriched.withColumn(
        "group_reference", F.coalesce("group_reference", "counterparty_reference")
    ).withColumn("is_specialised", F.coalesce("is_specialised", F.lit(False)))

    return HierarchyOutput(exposures=enriched)
