"""Structured Streaming pipelines over the events table (SURVEY §2.12).

The reference has no streaming surface; this is the rebuild's north-star
addition. Each pipeline mirrors a batch query in plans/streaming_batch.py —
tests drive the stream to completion (memory sink + processAllAvailable)
and assert the results equal the batch analogue, which in turn is
DuckDB-oracle-checked.

Production notes baked into the shapes:
- watermarks bound state: 1 day here (testdata spans a month; on a live
  feed pick lateness SLO), so window state is dropped, not accumulated;
- parquet directory source is swap-for-Kafka: everything downstream of
  readStream is source-agnostic;
- outputs append finalized windows only — exactly-once with an idempotent
  sink (foreachBatch + overwrite-by-window for object stores).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum
from rwa_calculator_spark.sources.star import STAR_SCHEMAS


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (one file = one micro-batch
    in tests; a Kafka source drops in here unchanged). ts is TIMESTAMP_MICROS
    (NTZ) in the files and is read natively, same as the batch reader."""
    # The file stream source requires a directory; mirror the single file
    # into /tmp via symlink (testdata is read-only).
    tag = os.path.basename(os.path.normpath(sf_dir))
    stream_dir = os.path.join("/tmp", "rwa_spark_stream", tag, "events")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    raw = spark.readStream.schema(STAR_SCHEMAS["events"]).parquet(stream_dir)
    # Structured Streaming watermarks require TIMESTAMP (not NTZ); session
    # timezone is pinned UTC so this cast relabels without shifting values.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), scaled_sum(F.col("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_aggregates(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), scaled_sum(F.col("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def deduped_events(events: DataFrame) -> DataFrame:
    """Streaming dedup within the watermark (state TTL = watermark)."""
    return (
        events.withWatermark("ts", "1 day")
        .select(
            "user_id",
            "event_type",
            "ts",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("bucket"),
        )
        .dropDuplicates(["user_id", "event_type", "bucket"])
    )


def run_to_memory(df: DataFrame, name: str, complete: bool = False) -> None:
    """Drive a streaming frame to completion synchronously (test harness)."""
    q = (
        df.writeStream.outputMode("complete" if complete else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
