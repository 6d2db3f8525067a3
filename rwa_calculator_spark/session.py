"""SparkSession factory.

Reference behaviour being replaced: the Polars engine configured its lazy
runtime per-collect (`engine/materialise.py`); in Spark the equivalent knobs
are session-level. AQE is on so joins/skew re-plan at runtime; Arrow is on so
any pandas exchange is vectorised; timezone pinned UTC so timestamps compare
bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def build_session(
    app_name: str = "rwa_calculator_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Local-mode session tuned for the test/bench harness.

    On a real cluster the same app code runs unchanged — only master/memory
    configs differ; shuffle partitioning is AQE-coalesced either way.
    """
    cpus = default_parallelism()
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    sp = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Engine rows are narrow to store but expensive to compute (160+
        # derived columns over checkpointed edges): the default 64m advisory
        # target coalesces the ~17MB calc shuffle to 6 partitions and strands
        # 26 cores. 8m keeps post-shuffle stages parallel at bench scale and
        # is still far above the scheduler-overhead floor at cluster scale.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # Engine post-shuffle stages are CPU-heavy over narrow bytes (160
        # derived columns on a ~20MB shuffle): byte-targeted coalescing
        # shrinks them to a handful of tasks and strands the other cores
        # (measured: the group-window reduce ran 6-wide on 32 cores, 4.5s
        # of task time on the critical path). Floor the coalesced width at
        # the session's core count — scale-adaptive (derived from
        # SPARK_GRAFT_CPUS / cluster parallelism, not a constant), and the
        # floor never widens a shuffle beyond its initial partition count.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", str(cpus))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Per-call Python origin capture (error-message enrichment) costs 3
        # py4j round trips per DataFrame/Column API call — ~60% of all
        # gateway traffic on wide engine plans. See
        # utils.disable_dataframe_debugging for the measurement.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Let AQE coalesce the shuffles inside persisted subtrees (engine
        # stages cache dimension-sized frames) — see
        # utils.allow_cached_plan_repartitioning for the measurement.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    )
    spark = builder.getOrCreate()
    from rwa_calculator_spark.utils import disable_dataframe_debugging

    disable_dataframe_debugging()
    spark.sparkContext.setLogLevel("WARN")
    # Releasing a locally-checkpointed frame (release_cached_blocks /
    # lazy-checkpoint GC) logs a benign "lineage has been truncated" WARN
    # per RDD — dozens of lines of noise in the bench's one-JSON-line
    # stderr. Quiet that one logger; every other RDD warning still shows.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd.MapPartitionsRDD",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # logging-only tuning; never fail session build over it
    return spark
