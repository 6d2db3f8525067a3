"""Securitisation pool allocation (ref engine/securitisation/allocator.py:
187,245 — pool allocations held as List(Struct{pool_reference,
allocation_pct}) nested columns; contracts/edges.py:758).

The allocator builds the nested allocation column with
collect_list(struct(...)), validates Σpct ≤ 1 per exposure, and explodes it
back out for pool-level aggregation — the ArrayType(StructType) round trip
the reference's data model requires (SURVEY §1.2). Conservation holds by
construction: exploded allocated amounts partition each exposure's amount
across pools plus a retained remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_allocation_column(allocations: DataFrame) -> DataFrame:
    """(exposure_reference, pool_reference, allocation_pct) rows → one row
    per exposure with a sorted List(Struct) allocation column + Σpct."""
    return (
        allocations.groupBy("exposure_reference")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pool_reference", "allocation_pct"))
            ).alias("pool_allocations"),
            F.sum(F.round(F.col("allocation_pct") * 1e6, 0).cast("long")).alias("_pct_scaled"),
        )
        .withColumn("total_pct", F.col("_pct_scaled") / F.lit(1e6))
        .drop("_pct_scaled")
        .withColumn("is_over_allocated", F.col("total_pct") > 1.0 + 1e-9)
    )


def explode_to_pools(exposures: DataFrame, with_allocs: DataFrame) -> DataFrame:
    """Exposure amounts × exploded allocations → per-(exposure, pool)
    allocated amounts, plus a synthetic 'RETAINED' pool for the remainder."""
    j = exposures.join(with_allocs, "exposure_reference", "left")
    allocated = j.select(
        "exposure_reference",
        F.explode("pool_allocations").alias("a"),
        "amount",
    ).select(
        "exposure_reference",
        F.col("a.pool_reference").alias("pool_reference"),
        (F.col("amount") * F.col("a.allocation_pct")).alias("allocated_amount"),
    )
    retained = j.select(
        "exposure_reference",
        F.lit("RETAINED").alias("pool_reference"),
        (
            F.col("amount")
            * (F.lit(1.0) - F.coalesce("total_pct", F.lit(0.0)))
        ).alias("allocated_amount"),
    )
    return allocated.unionByName(retained)
