"""Capital-impact analysis over dual-regime pipeline runs.

Spark-first re-expression of the reference's analysis layer
(ref analysis/attribution.py:40-120 AttributionResult / the CRR->B31
4-driver waterfall registered in analysis/comparison.py:197-465, and
analysis/transition.py:36-100 TransitionalScheduleRunner).

Both functions consume the per-exposure audit ledger (AggregatedOutput
.results) of already-executed pipeline runs, so they add zero extra
passes over the raw inputs: the attribution is two grouped aggregations
joined on the (tiny) class dimension — never a row-level join between the
two regime ledgers — and the schedule is one scalar aggregate cross-joined
with a four-row calendar. Per-class partial sums are map-side combinable;
at 100 TB this is a pure reduce-side merge of ~dozens of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import AggregatedOutput
from rwa_calculator_spark.functions.exact import scaled_sum

# CRR Art.153(1) scaling removal: a CRR-scaled IRB RWA of x becomes x/1.06
# under B3.1, an impact of x * (1/1.06 - 1). Folded to a Python double so
# Spark and the SQL oracle compute the identical IEEE constant.
_SCALING_REMOVAL = 1.0 / 1.06 - 1.0

# PRA PS1/26 Art.92(5) / Art.92(2A): output-floor transitional schedule.
TRANSITIONAL_FLOOR_SCHEDULE = (
    (2027, 0.60),
    (2028, 0.65),
    (2029, 0.70),
    (2030, 0.725),
)


def capital_attribution(crr, b31, sequential: bool = False) -> DataFrame:
    """Decompose the CRR vs Basel 3.1 RWA delta into the reference's four
    regulatory drivers, per exposure class (ref analysis/comparison.py
    _ATTRIBUTION_DRIVERS:438-443 and the waterfall at :455-533):

    1. scaling_impact            — removal of the 1.06x IRB scaling factor
    2. supporting_factor_impact  — removal of the SME/infra factors
    3. output_floor_impact       — the Art.92(3) floor bite (B3.1 only)
    4. methodology_impact        — residual (CCF/floor/RW methodology)

    The four drivers sum to delta per class by construction (the residual
    closes the waterfall — the reference's invariant at comparison.py:220).

    crr/b31: AggregatedOutput, or (sequential mode) zero-arg callables
    returning one — in sequential mode the SECOND pipeline's plan must not
    exist before the first run's cache release (unpersisting a
    checkpoint-marked-but-unmaterialised RDD truncates a lineage that can
    then never be computed), so the callable defers plan construction.
    """

    def _agg_c(out: AggregatedOutput) -> DataFrame:
        return out.results.groupBy("exposure_class").agg(
            scaled_sum(F.col("rwa"), 2).alias("rwa_crr"),
            scaled_sum(F.col("rwa_before_sf"), 2).alias("rwa_before_sf_crr"),
            scaled_sum(
                F.when(F.col("rw_source").startswith("irb_vasicek"), F.col("rwa")).otherwise(
                    F.lit(0.0)
                ),
                2,
            ).alias("rwa_irb_scaled"),
        )

    def _agg_b(out: AggregatedOutput) -> DataFrame:
        return out.results.groupBy(F.col("exposure_class").alias("b_class")).agg(
            scaled_sum(F.col("rwa"), 2).alias("rwa_b31"),
            scaled_sum(F.col("rwa_pre_floor"), 2).alias("rwa_pre_floor_b31"),
        )

    if sequential:
        # Shared-session posture: materialise each regime's CLASS-GRAIN
        # aggregate (≤ dozens of rows — bounded like the graph driver-walk)
        # and release cached blocks between the two runs, so peak heap
        # holds ONE pipeline's lineage instead of two. The second
        # pipeline's plan is built only AFTER the release (the callables),
        # because unpersisting a checkpoint-marked-but-unmaterialised RDD
        # truncates its lineage irrecoverably.
        from rwa_calculator_spark.utils import release_cached_blocks

        c = _agg_c(crr() if callable(crr) else crr)
        spark = c.sparkSession
        c_rows = c.collect()  # executes the first pipeline
        release_cached_blocks(spark)
        b = _agg_b(b31() if callable(b31) else b31)
        b_rows = b.collect()  # executes the second pipeline
        release_cached_blocks(spark)
        c = spark.createDataFrame(c_rows, c.schema)
        b = spark.createDataFrame(b_rows, b.schema)
    else:
        c = _agg_c(crr)
        b = _agg_b(b31)
    j = c.join(b, c.exposure_class == F.col("b_class"), "inner")
    delta = F.col("rwa_b31") - F.col("rwa_crr")
    scaling = F.col("rwa_irb_scaled") * F.lit(_SCALING_REMOVAL)
    supporting = F.col("rwa_before_sf_crr") - F.col("rwa_crr")
    floor = F.col("rwa_b31") - F.col("rwa_pre_floor_b31")
    return j.select(
        "exposure_class",
        "rwa_crr",
        "rwa_b31",
        delta.alias("delta"),
        scaling.alias("scaling_impact"),
        supporting.alias("supporting_factor_impact"),
        floor.alias("output_floor_impact"),
        (((delta - scaling) - supporting) - floor).alias("methodology_impact"),
    )


def floor_transition_schedule(
    spark: SparkSession,
    b31: AggregatedOutput,
    schedule=TRANSITIONAL_FLOOR_SCHEDULE,
    sequential: bool = False,
) -> DataFrame:
    """Model the output-floor phase-in (PRA PS1/26 Art.92(5): 60% in 2027
    rising to 72.5% steady-state) over ONE executed B3.1 run — the pre-floor
    modelled total and the SA-equivalent total are both already on the
    ledger, so re-running the pipeline per year (the reference's
    full-re-run choice, transition.py:63-70) collapses to re-applying the
    floor scalar: four arithmetic rows from one aggregate.
    """
    tot = b31.results.agg(
        scaled_sum(F.col("rwa_pre_floor"), 2).alias("modelled_total"),
        scaled_sum(
            F.coalesce("rwa_sa_equivalent", F.col("rwa_pre_floor")), 2
        ).alias("std_total"),
    )
    if sequential:
        # shared-session posture (see capital_attribution): the portfolio
        # scalar is one row — materialise it and release the pipeline
        from rwa_calculator_spark.utils import release_cached_blocks

        tot_rows = tot.collect()
        release_cached_blocks(spark)
        tot = spark.createDataFrame(tot_rows, tot.schema)
    sched = spark.createDataFrame(
        [(int(y), float(a)) for y, a in schedule],
        "year int, floor_alpha double",
    )
    out = tot.crossJoin(F.broadcast(sched))
    floored = F.greatest(
        F.col("modelled_total"), F.col("floor_alpha") * F.col("std_total")
    )
    return out.select(
        "year",
        "floor_alpha",
        "modelled_total",
        "std_total",
        floored.alias("rwa_floored"),
        F.greatest(
            F.col("floor_alpha") * F.col("std_total") - F.col("modelled_total"),
            F.lit(0.0),
        ).alias("floor_addon"),
        (F.col("floor_alpha") * F.col("std_total") > F.col("modelled_total")).alias(
            "floor_binding"
        ),
    ).orderBy("year")
