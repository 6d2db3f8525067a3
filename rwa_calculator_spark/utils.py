"""Runtime plumbing helpers."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Any Pandas-UDF / mapInPandas closure that references package functions
    needs the module importable on the worker, regardless of the driver
    process's cwd/sys.path (the round driver may import __spark_entry__.py
    from anywhere). Zipping once per SparkContext is idempotent; on a real
    cluster this is the standard --py-files deployment expressed at runtime.
    """
    ctx_id = spark.sparkContext.applicationId
    if ctx_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # rebuild per process so a stale zip never ships edited-but-unshipped code
    zip_base = os.path.join(tempfile.gettempdir(), f"rwa_calculator_spark_pkg_{os.getpid()}")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir), "rwa_calculator_spark")
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(ctx_id)


def disable_dataframe_debugging() -> None:
    """Turn off PySpark's per-call DataFrame-debugging origin capture in
    THIS Python process (the Python half of the public static conf
    ``spark.python.sql.dataFrameDebugging.enabled``).

    With the default (true), every wrapped DataFrame/Column API call walks
    the Python stack and pays THREE extra py4j round trips (``conf.get`` of
    the stack-depth conf + ``PySparkCurrentOrigin.set`` + ``.clear``) purely
    to decorate potential error messages with user call sites. On a
    160-column engine plan that is ~60% of all gateway traffic: one
    measured pipeline-query build dropped from 29,699 to 12,269 py4j
    commands with it off (guide §1.2 per-task work, applied to the driver).

    ``build_session`` sets the static conf at builder time; sessions built
    by EXTERNAL harnesses (the round driver's vanilla session) cannot — the
    conf is static and pyspark caches its value in a module global on first
    use. Pre-seeding that documented cache is the supported effect of the
    same public conf, applied process-wide; results are unaffected (error
    messages simply lose the Python call-site enrichment). Guarded so a
    pyspark that renames the cache degrades to a no-op.
    """
    try:
        import pyspark.errors.utils as _eu

        if hasattr(_eu, "_enable_debugging_cache"):
            _eu._enable_debugging_cache = False
    except Exception:
        pass  # observability-only tuning; never fail over it


def allow_cached_plan_repartitioning(spark: SparkSession) -> None:
    """Let AQE re-optimise the shuffles INSIDE cached plans
    (``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning``).

    Engine stages persist dimension-sized frames (facility root lookup,
    waterfall allocations, CRM membership edges). With the default (false),
    every shuffle feeding a persisted frame materialises at the session's
    full ``spark.sql.shuffle.partitions`` width — 200 near-empty cached
    partitions per frame in a default session — and every consumer stage
    (and the final branch union) pays that task count. With it on, AQE
    coalesces those shuffles from runtime sizes exactly as it already does
    for uncached plans (guide §2.2: fewer, larger partitions; derived from
    data size, not a constant).

    Results are unaffected: partitioning only. Every registered query is
    partitioning-independent by construction (exact integer-cents sums,
    explicit total orderings — SURVEY §7.2 hard-parts 1-3). Measured:
    ``facility_undrawn_waterfall`` 8.5 s → 4.3 s per run (vanilla local[8],
    sf0.01, interleaved A/B, 4 reps); engine/corep families neutral.
    Guarded conf.get so sessions that already set it pay one round trip.
    """
    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    try:
        if spark.conf.get(key, None) != "true":
            spark.conf.set(key, "true")
    except Exception:  # noqa: BLE001 — tuning, never fail a query over it
        pass


def release_cached_blocks(spark: SparkSession) -> None:
    """Unpersist every cached DataFrame and persistent RDD left by EARLIER
    queries in this session.

    One-session multi-query drivers (the round driver, bench.py) run ~95
    queries against one SparkSession; pipeline queries leave
    localCheckpoint and persist blocks behind, and with a default-sized
    driver heap the accumulation eventually OOMs during a later query's
    broadcast. Called at the ENTRY of each heavy pipeline query — never
    mid-query, so a query can never drop its own blocks — this bounds the
    session's cached footprint to one query's working set.
    """
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    rdds = jsc.getPersistentRDDs()
    it = rdds.values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    # Broadcast blocks are freed by ContextCleaner only after their py4j
    # handles are garbage-collected on the Python side AND the JVM runs a
    # GC that processes the cleaner's weak references. With ~100 broadcast
    # joins per session and a default-sized heap, waiting for an organic
    # full GC is what eventually OOMs a later query. Python GC is cheap —
    # always run it; the JVM full GC is a stop-the-world pause, so trigger
    # it only under real heap pressure (a roomy bench heap never pays it,
    # a default 1g driver sheds its accumulated broadcasts before OOM).
    import gc

    gc.collect()
    try:
        rt = spark.sparkContext._jvm.Runtime.getRuntime()
        if rt.totalMemory() - rt.freeMemory() > 0.6 * rt.maxMemory():
            spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # diagnostics-grade nudge; never fail a query over it
