"""Event-time windowing over the events table (SURVEY §2.12 — new surface;
the reference is pure batch).

These are the *batch* analogues of the Structured Streaming pipelines in
rwa_calculator_spark/streaming/windows.py — same operators (F.window,
F.session_window, dropDuplicates), run on the bounded table so the DuckDB
oracle can pin them. tests/test_streaming.py proves the streaming execution
of the same pipelines (readStream → watermark → window → memory sink)
produces these exact results.

Window starts are emitted as epoch seconds (BIGINT) — timezone-proof across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum, sql_scaled_sum
from rwa_calculator_spark.plans.registry import query
from rwa_calculator_spark.sources.star import load_table


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT CAST(floor(epoch(ts) / 3600.0) * 3600 AS BIGINT) AS window_start,
           event_type,
           count(*) AS n_events,
           {sql_scaled_sum('value', 2)} AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
    bench=True,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows via F.window (epoch-aligned)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), scaled_sum(F.col("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle=f"""
    WITH expanded AS (
        SELECT CAST(floor(epoch(e.ts) / 1800.0) * 1800 - k.k * 1800 AS BIGINT) AS window_start,
               e.event_type, e.value
        FROM events e CROSS JOIN (VALUES (0), (1)) AS k(k)
    )
    SELECT window_start, event_type, count(*) AS n_events,
           {sql_scaled_sum('value', 2)} AS total_value
    FROM expanded GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour / 30 min slide): every event lands in two
    windows; F.window enumerates them (the oracle derives both starts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), scaled_sum(F.col("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_session_window",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id)) >= 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events, {sql_scaled_sum('value', 2)} AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("streaming",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionisation with a 30-minute gap via F.session_window (the oracle
    re-derives sessions with the lag/cumsum formulation — the two must
    agree exactly)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), scaled_sum(F.col("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_dedup",
    oracle="""
    WITH dd AS (
        SELECT DISTINCT user_id, event_type,
               CAST(floor(epoch(ts) / 3600.0) * 3600 AS BIGINT) AS bucket
        FROM events
    )
    SELECT event_type, count(*) AS n_after_dedup FROM dd GROUP BY event_type
    """,
    tags=("streaming",),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked-dedup analogue: dropDuplicates on (user, type, hour) —
    in streaming this is dropDuplicates within the watermark; the batch
    semantics are identical on bounded data."""
    ev = load_table(spark, sf_dir, "events")
    dd = ev.select(
        "user_id",
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("bucket"),
    ).dropDuplicates(["user_id", "event_type", "bucket"])
    return dd.groupBy("event_type").agg(F.count("*").alias("n_after_dedup"))


@query(
    "stream_stream_join",
    oracle=f"""
    WITH pairs AS (
        SELECT c.user_id,
               CAST(floor(epoch(c.ts) / 3600.0) * 3600 AS BIGINT) AS click_hour,
               p.value AS purchase_value
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND p.ts > c.ts
         AND p.ts <= c.ts + INTERVAL 1 HOUR
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    )
    SELECT click_hour, count(*) AS n_pairs,
           count(DISTINCT user_id) AS n_users,
           {sql_scaled_sum('purchase_value', 2)} AS attributed_value
    FROM pairs GROUP BY click_hour
    """,
    tags=("streaming",),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution pairs (same user, purchase within 1 h
    after the click), aggregated by click hour. Batch analogue of the
    watermarked stream-stream interval join in streaming/joins.py —
    tests/test_streaming.py proves the streaming execution emits exactly
    these pairs."""
    from rwa_calculator_spark.streaming.joins import attribution_join

    ev = load_table(spark, sf_dir, "events")
    pairs = attribution_join(ev)
    return (
        pairs.select(
            F.col("c_user_id").alias("user_id"),
            (F.floor(F.unix_timestamp("click_ts") / 3600) * 3600)
            .cast("long")
            .alias("click_hour"),
            "purchase_value",
        )
        .groupBy("click_hour")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("user_id").alias("n_users"),
            scaled_sum(F.col("purchase_value"), 2).alias("attributed_value"),
        )
    )


@query(
    "stream_static_enrich",
    oracle=f"""
    SELECT CAST(floor(epoch(e.ts) / 3600.0) * 3600 AS BIGINT) AS window_start,
           coalesce(c.c_mktsegment, 'unknown') AS segment,
           count(*) AS n_events,
           {sql_scaled_sum('e.value', 2)} AS total_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (streaming/joins.py
    static_enrich): events join the customer dimension on user_id, then
    windowed per-segment aggregation. The STREAMING execution of the
    identical pipeline (readStream events × static customer frame) is
    proven equal in tests/test_streaming.py — the batch analogue here
    gives the DuckDB oracle the same plan to pin."""
    from rwa_calculator_spark.streaming.joins import static_enrich

    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return static_enrich(ev, dim)


@query(
    "stream_late_data_watermark",
    oracle=f"""
    WITH arrivals AS (
        SELECT event_id, ts, value,
               max(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS frontier
        FROM events
    ), flagged AS (
        SELECT CAST(floor(epoch(ts) / 3600.0) * 3600 AS BIGINT) AS window_start,
               value,
               (epoch(ts) < epoch(frontier) - 600.0) AS is_late
        FROM arrivals
    )
    SELECT window_start,
           count(*) FILTER (WHERE NOT is_late) AS n_events,
           {sql_scaled_sum('CASE WHEN NOT is_late THEN value END', 2)} AS total_value,
           count(*) FILTER (WHERE is_late) AS n_late_dropped
    FROM flagged GROUP BY 1
    """,
    tags=("streaming",),
)
def stream_late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, batch-simulated (Structured Streaming
    `withWatermark("ts", "10 minutes")` §2.12): the ingestion order is the
    monotone event_id; the watermark frontier is the running max event time
    over arrivals; an event whose timestamp trails the frontier by more
    than the 10-minute delay is LATE and dropped from its tumbling window,
    and counted in n_late_dropped. The streaming twin drops exactly these
    rows once the watermark passes; the batch analogue pins the semantics
    for the DuckDB oracle (running-max window function — one shuffle-free
    sort-based window pass; at scale the frontier is per-partition
    monotone, matching Spark's per-executor watermark accounting)."""
    ev = load_table(spark, sf_dir, "events")
    frontier = F.max("ts").over(
        W.orderBy("event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = ev.select(
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("window_start"),
        "value",
        (
            F.unix_timestamp("ts")
            < F.unix_timestamp(frontier) - F.lit(600.0)
        ).alias("is_late"),
    )
    return flagged.groupBy("window_start").agg(
        F.count(F.when(~F.col("is_late"), 1)).alias("n_events"),
        scaled_sum(F.when(~F.col("is_late"), F.col("value")), 2).alias("total_value"),
        F.count(F.when(F.col("is_late"), 1)).alias("n_late_dropped"),
    )
