"""Securitisation pipeline stage: allocated slices leave the loan book,
pools enter the unified ledger as securitisation exposures (ref
engine/stages/securitisation.py + engine/securitisation/allocator.py:187,245
— the stage runs FIRST after scope in the registry fold, so hierarchy /
classify / CRM only ever see the retained share).

Distillation: allocation_pct of each named exposure's drawn amount moves to
the pool; over-allocation (>100%) scales down pro-rata (the reference flags
it as a DQ error and clips). Pool rows route to the SEC-SA calculator
branch via exposure_type='securitisation_pool'.

Scale posture: allocations are exposure-grain (one shuffle keyed on the
exposure), pool aggregation is a keyed group-by to pool grain
(dimension-sized output); the loan-book reduction is a single left join on
the loan key.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.rulepack import RulePack
from rwa_calculator_spark.functions.exact import scaled_sum


def run_securitisation(raw: RawBundle, pack: RulePack) -> tuple[RawBundle, DataFrame | None]:
    """Returns (bundle with retained loan shares, pool exposure frame in the
    unified-union shape) — pool frame is None when no allocations exist."""
    allocs = raw.securitisation_allocations
    if allocs is None:
        return raw, None

    per_exp = allocs.groupBy("exposure_reference").agg(
        F.sum("allocation_pct").alias("_alloc_raw")
    )
    # over-allocation clips to 100%, individual slices scale pro-rata
    per_exp = per_exp.withColumn(
        "_alloc_total", F.least(F.col("_alloc_raw"), F.lit(1.0))
    )

    loans = raw.loans.join(
        per_exp.select(
            F.col("exposure_reference").alias("loan_reference"),
            "_alloc_raw",
            "_alloc_total",
        ),
        "loan_reference",
        "left",
    )
    retained = loans.withColumn(
        "drawn_amount",
        F.col("drawn_amount") * (1 - F.coalesce("_alloc_total", F.lit(0.0))),
    ).drop("_alloc_raw", "_alloc_total")

    scaled = allocs.join(
        per_exp, "exposure_reference"
    ).withColumn(
        "_eff_pct",
        F.col("allocation_pct") / F.greatest(F.col("_alloc_raw"), F.lit(1.0)),
    )
    pool_amounts = (
        scaled.join(
            raw.loans.select(
                F.col("loan_reference").alias("exposure_reference"),
                F.col("drawn_amount").alias("_drawn"),
            ),
            "exposure_reference",
        )
        .groupBy("pool_reference")
        .agg(scaled_sum(F.col("_drawn") * F.col("_eff_pct"), 2).alias("_pool_amount"))
    )
    if raw.securitisation_tranches is not None:
        # tranche grain: one synthetic exposure per (pool, tranche) carrying
        # attachment/detachment/W so the SEC-SA branch can run the full
        # SSFA closed form (functions/secsa.py). Tranche nominal = pool
        # amount × tranche width; the tranche table is dimension-sized so
        # the join broadcasts.
        tr = raw.securitisation_tranches
        if "w_delinquent" not in tr.columns:
            tr = tr.withColumn("w_delinquent", F.lit(0.0))
        tranched = pool_amounts.join(F.broadcast(tr), "pool_reference")
        cols = [
            F.concat(
                F.lit("SEC_"), F.col("pool_reference"), F.lit("_"), F.col("tranche_reference")
            ).alias("exposure_reference"),
            F.lit("securitisation_pool").alias("exposure_type"),
            F.lit(None).cast("string").alias("counterparty_reference"),
            (F.col("_pool_amount") * (F.col("detachment") - F.col("attachment"))).alias(
                "drawn_amount"
            ),
            F.lit(0.0).alias("undrawn_amount"),
            F.lit(None).cast("string").alias("risk_bucket"),
            F.lit(False).alias("is_defaulted"),
            F.lit(None).cast("double").alias("pd"),
            F.lit(None).cast("double").alias("lgd"),
            F.lit(None).cast("double").alias("effective_maturity"),
            F.col("attachment").cast("double").alias("attachment"),
            F.col("detachment").cast("double").alias("detachment"),
            F.coalesce(F.col("w_delinquent").cast("double"), F.lit(0.0)).alias(
                "w_delinquent"
            ),
        ]
        # optional SEC-IRBA pool parameters (k_irb + supervisory-p inputs,
        # CRR Art.259) and the STS flag (Art.262) travel with the tranche
        if "is_sts" in tr.columns:
            cols.append(
                F.coalesce(F.col("is_sts").cast("boolean"), F.lit(False)).alias("is_sts")
            )
        if "k_irb" in tr.columns:
            cols.append(F.col("k_irb").cast("double").alias("k_irb"))
            for c, default in (
                ("pool_n", 25.0),
                ("pool_lgd", 0.45),
                ("pool_maturity", 2.5),
            ):
                cols.append(
                    (
                        F.coalesce(F.col(c).cast("double"), F.lit(default))
                        if c in tr.columns
                        else F.lit(default)
                    ).alias(c)
                )
        pools = tranched.select(*cols)
        return replace(raw, loans=retained), pools

    pools = pool_amounts.select(
        F.concat(F.lit("SEC_"), F.col("pool_reference")).alias("exposure_reference"),
        F.lit("securitisation_pool").alias("exposure_type"),
        F.lit(None).cast("string").alias("counterparty_reference"),
        F.col("_pool_amount").alias("drawn_amount"),
        F.lit(0.0).alias("undrawn_amount"),
        F.lit(None).cast("string").alias("risk_bucket"),
        F.lit(False).alias("is_defaulted"),
        F.lit(None).cast("double").alias("pd"),
        F.lit(None).cast("double").alias("lgd"),
        F.lit(None).cast("double").alias("effective_maturity"),
    )
    return replace(raw, loans=retained), pools
