"""Structured Streaming pipelines must reproduce their batch analogues
(which are DuckDB-oracle-checked) when driven to completion."""

from __future__ import annotations

from pyspark.sql import functions as F

from rwa_calculator_spark.plans import load_all
from rwa_calculator_spark.streaming.windows import (
    deduped_events,
    read_events_stream,
    run_to_memory,
    session_aggregates,
    tumbling_counts,
)

REGISTRY = load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_matches_batch(spark, sf_dir):
    # complete mode: the file source is one batch, watermark never closes
    # windows within it; complete emits every window state.
    run_to_memory(tumbling_counts(read_events_stream(spark, sf_dir)), "t_tumble", complete=True)
    got = _rows(spark.table("t_tumble"))
    want = _rows(REGISTRY["stream_tumbling_window"].fn(spark, sf_dir))
    assert got == want


def test_stream_sessions_match_batch(spark, sf_dir):
    run_to_memory(
        session_aggregates(read_events_stream(spark, sf_dir)), "t_sess", complete=True
    )
    got = _rows(spark.table("t_sess"))
    want = _rows(REGISTRY["stream_session_window"].fn(spark, sf_dir))
    assert got == want


def test_stream_dedup_matches_batch(spark, sf_dir):
    run_to_memory(deduped_events(read_events_stream(spark, sf_dir)), "t_dedup")
    got = _rows(
        spark.table("t_dedup").groupBy("event_type").agg(F.count("*").alias("n_after_dedup"))
    )
    want = _rows(REGISTRY["stream_dedup"].fn(spark, sf_dir))
    assert got == want


def test_stateful_running_totals(spark, sf_dir):
    """applyInPandasWithState accumulates per-user state; final update-mode
    emissions must equal the batch groupBy aggregates."""
    from rwa_calculator_spark.sources.star import load_table
    from rwa_calculator_spark.streaming.stateful import running_user_totals
    from rwa_calculator_spark.streaming.windows import read_events_stream

    q = (
        running_user_totals(read_events_stream(spark, sf_dir))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # latest emission per user (single micro-batch here → the only one)
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6), round(r.max_value, 6))
        for r in spark.table("t_state").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, round(r.t, 6), round(r.m, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"), F.max("value").alias("m"))
        .collect()
    }
    assert got == want
