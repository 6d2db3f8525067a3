"""Facility hierarchy: synthetic facility-undrawn exposures with the MOF
CCF-descending waterfall (ref engine/stages/hierarchy/facility_undrawn.py:
55-187 calculate_facility_undrawn, :751 waterfall allocation).

Semantics reproduced:
- per ROOT/standalone facility: undrawn headroom = clip(limit − Σ descendant
  loan drawn − Σ descendant contingent nominal, 0). Loans/contingents under
  sub-facilities aggregate up to the root; sub-facilities emit no row.
- drawn aggregation is netting-aware (CRR Art.195/219): a negative drawn
  balance only reduces utilisation when the loan carries a
  netting_agreement_reference; otherwise it clamps to 0. Contingent
  nominals clamp to 0 per item.
- Multiple Option Facility (MOF): a root with facility-typed children
  expands into per-sub waterfall rows ordered by DESCENDING sub CCF (worst
  commitment first), each allocated
  min(sub_headroom, clip(parent_headroom − running_prior_headroom, 0)),
  plus a residual row at the parent's own attributes when headroom remains.
- only committed facilities with undrawn > 0 emit exposure rows
  (unconditionally cancellable ⇒ no commitment EAD is held).

Scale posture: facilities / mappings are dimension-sized next to the loan
facts. The loan→facility aggregation is one shuffle on the mapping key with
map-side partial sums; root resolution reuses the iterative broadcast-join
graph operator; the waterfall itself is a window cumsum over facilities —
never a fact-table shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.rulepack import RulePack
from rwa_calculator_spark.operators.graph import resolve_ultimate_parent_iterative


def _facility_root_lookup(facility_mappings: DataFrame) -> DataFrame:
    """(child_facility_reference, root_facility_reference) for every
    facility-typed child, multi-level resolved (ref graph.py
    build_facility_root_lookup)."""
    edges = facility_mappings.where(F.col("child_type") == "facility").select(
        F.col("child_reference").alias("child"),
        F.col("parent_facility_reference").alias("parent"),
    )
    return resolve_ultimate_parent_iterative(edges).select(
        F.col("node").alias("child_facility_reference"),
        F.col("ultimate_parent").alias("root_facility_reference"),
    )


def _to_aggregation_root(mapped: DataFrame, root_lookup: DataFrame) -> DataFrame:
    """Resolve the directly-mapped parent facility to its root (fallback to
    the direct parent for standalone facilities)."""
    rl = root_lookup.select(
        F.col("child_facility_reference").alias("_rl_child"),
        F.col("root_facility_reference").alias("_rl_root"),
    )
    return mapped.join(
        F.broadcast(rl), mapped.parent_facility_reference == F.col("_rl_child"), "left"
    ).withColumn(
        "aggregation_facility",
        F.coalesce("_rl_root", "parent_facility_reference"),
    ).drop("_rl_child", "_rl_root")


def facility_undrawn_exposures(
    facilities: DataFrame,
    loans: DataFrame,
    contingents: DataFrame | None,
    facility_mappings: DataFrame,
    pack: RulePack,
) -> DataFrame:
    """Synthetic facility-undrawn exposure rows.

    Returns (exposure_reference, exposure_type='facility_undrawn',
    counterparty_reference, drawn_amount=0, undrawn_amount, risk_bucket,
    is_defaulted=False, pd, lgd, effective_maturity) — union-ready with
    the loans/contingents exposure shape in run_hierarchy.
    """
    spark = facilities.sparkSession
    # the 10-round iterative lookup is consumed by five branches (loan and
    # contingent rooting, sub-ref anti-join, MOF marker, descendants) —
    # persist the dimension-sized result so the join chain runs once
    root_lookup = _facility_root_lookup(facility_mappings).persist()

    # --- descendant loan drawn per root facility (netting-aware) ---------
    loan_map = facility_mappings.where(F.col("child_type") == "loan").select(
        "parent_facility_reference", F.col("child_reference").alias("loan_reference")
    )
    has_netting = "netting_agreement_reference" in loans.columns
    netting_ref = (
        F.col("netting_agreement_reference") if has_netting else F.lit(None).cast("string")
    )
    loan_drawn = (
        loans.select("loan_reference", "drawn_amount", netting_ref.alias("_net_ref"))
        .join(loan_map, "loan_reference")
        .withColumn(
            "_drawn",
            F.when(
                (F.col("drawn_amount") < 0) & F.col("_net_ref").isNull(), F.lit(0.0)
            ).otherwise(F.col("drawn_amount")),
        )
    )
    loan_drawn = _to_aggregation_root(loan_drawn, root_lookup).persist()
    loan_totals = loan_drawn.groupBy("aggregation_facility").agg(
        F.sum("_drawn").alias("total_drawn")
    )
    # per-sub direct drawn (MOF waterfall reads DIRECT mappings, not root)
    loan_per_sub = loan_drawn.groupBy("parent_facility_reference").agg(
        F.sum("_drawn").alias("sub_drawn_loans")
    )

    # --- descendant contingent nominal per root facility -----------------
    if contingents is not None:
        cont_map = facility_mappings.where(F.col("child_type") == "contingent").select(
            "parent_facility_reference", F.col("child_reference").alias("contingent_reference")
        )
        cont = (
            contingents.select("contingent_reference", "nominal_amount")
            .join(cont_map, "contingent_reference")
            .withColumn("_nom", F.greatest(F.col("nominal_amount"), F.lit(0.0)))
        )
        cont = _to_aggregation_root(cont, root_lookup)
        cont_totals = cont.groupBy("aggregation_facility").agg(
            F.sum("_nom").alias("total_contingent")
        )
        cont_per_sub = cont.groupBy("parent_facility_reference").agg(
            F.sum("_nom").alias("sub_drawn_contingents")
        )
    else:
        cont_totals = spark.createDataFrame(
            [], "aggregation_facility string, total_contingent double"
        )
        cont_per_sub = spark.createDataFrame(
            [], "parent_facility_reference string, sub_drawn_contingents double"
        )

    # --- undrawn headroom per root / standalone facility ------------------
    fac = facilities.select(
        "facility_reference",
        "counterparty_reference",
        "limit",
        F.coalesce("committed", F.lit(True)).alias("committed"),
        "risk_bucket",
    )
    sub_refs = root_lookup.select(
        F.col("child_facility_reference").alias("facility_reference")
    ).distinct()
    roots = (
        fac.join(sub_refs, "facility_reference", "anti")
        .join(
            loan_totals,
            fac.facility_reference == loan_totals.aggregation_facility,
            "left",
        )
        .drop("aggregation_facility")
        .join(
            cont_totals,
            F.col("facility_reference") == cont_totals.aggregation_facility,
            "left",
        )
        .drop("aggregation_facility")
        .withColumn(
            "undrawn_amount",
            F.greatest(
                F.col("limit")
                - F.coalesce("total_drawn", F.lit(0.0))
                - F.coalesce("total_contingent", F.lit(0.0)),
                F.lit(0.0),
            ),
        )
        .where(F.col("committed") & (F.col("undrawn_amount") > 0.0))
    )
    # roots is dimension-sized but its lineage holds the fact-table drawn
    # aggregation, and FOUR branches consume it (non-MOF rows, waterfall
    # parent headroom, residual, no-subs fallback) — persist so the loan
    # scan+shuffle runs once, the reference's stage-edge materialisation
    # shape (SURVEY §4 re-computation avoidance)
    roots = roots.persist()

    # --- MOF marker: roots with >=1 facility child ------------------------
    mof_roots = root_lookup.select(
        F.col("root_facility_reference").alias("facility_reference")
    ).distinct()
    roots = roots.join(
        F.broadcast(mof_roots.withColumn("_is_mof", F.lit(True))),
        "facility_reference",
        "left",
    ).withColumn("_is_mof", F.coalesce("_is_mof", F.lit(False)))

    non_mof = roots.where(~F.col("_is_mof")).select(
        F.concat(F.col("facility_reference"), F.lit("_UNDRAWN")).alias("exposure_reference"),
        "counterparty_reference",
        "undrawn_amount",
        "risk_bucket",
    )

    # --- MOF waterfall: per-sub allocation by descending CCF --------------
    ccf_table = pack.table_df(spark, "ccf").select(
        F.col("risk_bucket").alias("_sub_bucket_key"), F.col("ccf").alias("sub_ccf")
    )
    sub_attrs = fac.select(
        F.col("facility_reference").alias("_sub_ref"),
        F.col("counterparty_reference").alias("_sub_counterparty"),
        F.col("limit").alias("_sub_limit"),
        F.col("committed").alias("_sub_committed"),
        F.col("risk_bucket").alias("_sub_bucket"),
    )
    descendants = (
        root_lookup.select(
            F.col("root_facility_reference").alias("facility_reference"),
            F.col("child_facility_reference").alias("_sub_ref"),
        )
        .join(F.broadcast(sub_attrs), "_sub_ref")
        .where(F.col("_sub_committed") & F.col("_sub_bucket").isNotNull())
        .join(
            loan_per_sub,
            F.col("_sub_ref") == loan_per_sub.parent_facility_reference,
            "left",
        )
        .drop("parent_facility_reference")
        .join(
            cont_per_sub,
            F.col("_sub_ref") == cont_per_sub.parent_facility_reference,
            "left",
        )
        .drop("parent_facility_reference")
        .withColumn(
            "sub_drawn",
            F.coalesce("sub_drawn_loans", F.lit(0.0))
            + F.coalesce("sub_drawn_contingents", F.lit(0.0)),
        )
        .join(F.broadcast(ccf_table), F.col("_sub_bucket") == F.col("_sub_bucket_key"), "left")
        .withColumn("sub_ccf", F.coalesce("sub_ccf", F.lit(1.0)))
        .withColumn(
            "sub_headroom", F.greatest(F.col("_sub_limit") - F.col("sub_drawn"), F.lit(0.0))
        )
    )
    parent_headroom = roots.where(F.col("_is_mof")).select(
        "facility_reference",
        F.col("undrawn_amount").alias("_parent_headroom"),
        F.col("counterparty_reference").alias("_parent_counterparty"),
        F.col("risk_bucket").alias("_parent_bucket"),
    )
    w_falls = (
        W.partitionBy("facility_reference")
        .orderBy(F.col("sub_ccf").desc(), F.col("_sub_bucket").asc(), F.col("_sub_ref").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    waterfall = (
        descendants.join(parent_headroom, "facility_reference")
        .withColumn("cum_headroom", F.sum("sub_headroom").over(w_falls))
        .withColumn(
            "allocation",
            F.greatest(
                F.least(
                    F.col("sub_headroom"),
                    F.greatest(
                        F.col("_parent_headroom")
                        - (F.col("cum_headroom") - F.col("sub_headroom")),
                        F.lit(0.0),
                    ),
                ),
                F.lit(0.0),
            ),
        )
        .where(F.col("allocation") > 0.0)
    )
    # three consumers (sub rows, residual group-by, no-subs anti-join)
    waterfall = waterfall.persist()
    sub_rows = waterfall.select(
        F.concat(
            F.col("facility_reference"), F.lit("_UNDRAWN_"), F.col("_sub_ref")
        ).alias("exposure_reference"),
        F.col("_sub_counterparty").alias("counterparty_reference"),
        F.col("allocation").alias("undrawn_amount"),
        F.col("_sub_bucket").alias("risk_bucket"),
    )
    residual = (
        waterfall.groupBy(
            "facility_reference", "_parent_headroom", "_parent_counterparty", "_parent_bucket"
        )
        .agg(F.sum("allocation").alias("_total_alloc"))
        .withColumn(
            "_residual",
            F.greatest(F.col("_parent_headroom") - F.col("_total_alloc"), F.lit(0.0)),
        )
        .where(F.col("_residual") > 0.0)
        .select(
            F.concat(F.col("facility_reference"), F.lit("_UNDRAWN_RESIDUAL")).alias(
                "exposure_reference"
            ),
            F.col("_parent_counterparty").alias("counterparty_reference"),
            F.col("_residual").alias("undrawn_amount"),
            F.col("_parent_bucket").alias("risk_bucket"),
        )
    )
    # MOF parents whose waterfall allocated nothing (no eligible subs) fall
    # back to a single parent-attribute row, same as non-MOF
    mof_no_subs = (
        roots.where(F.col("_is_mof"))
        .join(waterfall.select("facility_reference").distinct(), "facility_reference", "anti")
        .select(
            F.concat(F.col("facility_reference"), F.lit("_UNDRAWN")).alias(
                "exposure_reference"
            ),
            "counterparty_reference",
            "undrawn_amount",
            "risk_bucket",
        )
    )

    out = non_mof.unionByName(sub_rows).unionByName(residual).unionByName(mof_no_subs)
    return out.select(
        "exposure_reference",
        F.lit("facility_undrawn").alias("exposure_type"),
        "counterparty_reference",
        F.lit(0.0).alias("drawn_amount"),
        "undrawn_amount",
        "risk_bucket",
        F.lit(False).alias("is_defaulted"),
        F.lit(None).cast("double").alias("pd"),
        F.lit(None).cast("double").alias("lgd"),
        F.lit(None).cast("double").alias("effective_maturity"),
    )
