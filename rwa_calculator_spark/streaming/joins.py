"""Stream-stream joins (SURVEY §2.12 — new surface; the reference is batch).

Click→purchase attribution: a purchase joins every click by the same user
in the preceding hour. Both sides are watermarked so Spark can bound the
join state: the range condition tells it a click older than (purchase
watermark − 1 h) can never match again and its state is dropped — without
the time bound, stream-stream inner join state grows forever.

Scale posture: both sides hash-partition on user_id (the equi key); the
range predicate is evaluated post-colocation, so state and shuffle are
O(events within the watermark horizon), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Pairs (click, purchase) for the same user with the purchase inside
    `horizon` after the click. `events` may be a streaming or batch frame —
    the same code path serves both (tests prove equality)."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 day")
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 day")
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""
            c_user_id = p_user_id
            AND purchase_ts > click_ts
            AND purchase_ts <= click_ts + INTERVAL {horizon}
            """
        ),
    )


def static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: the unbounded event stream joins a BATCH
    dimension frame (Spark re-plans the static side per micro-batch, so a
    slowly-refreshed dimension table is picked up without restarting the
    query) and aggregates value by segment per 1-hour event-time window.

    `events` may be a streaming or batch frame — the plan is identical,
    which is what the equivalence test pins. The dimension is broadcast:
    stream-static joins never shuffle the stream side on the join key.
    dim: (user_id, segment).
    """
    from rwa_calculator_spark.functions.exact import scaled_sum

    joined = events.join(F.broadcast(dim), "user_id", "left")
    return (
        joined.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.coalesce("segment", F.lit("unknown")).alias("segment"),
        )
        .agg(
            F.count("*").alias("n_events"),
            scaled_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )
