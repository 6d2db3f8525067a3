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


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """The watermarked stream-stream interval join must emit exactly the
    pairs the batch attribution join produces."""
    from rwa_calculator_spark.sources.star import load_table
    from rwa_calculator_spark.streaming.joins import attribution_join
    from rwa_calculator_spark.streaming.windows import read_events_stream, run_to_memory

    run_to_memory(
        attribution_join(read_events_stream(spark, sf_dir)).select(
            "click_id", "purchase_id", "purchase_value"
        ),
        "t_ssj",
    )
    got = _rows(spark.table("t_ssj"))
    want = _rows(
        attribution_join(load_table(spark, sf_dir, "events")).select(
            "click_id", "purchase_id", "purchase_value"
        )
    )
    assert len(want) > 0
    assert got == want


def test_foreach_batch_sink_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch exactly-once recipe: output equals the batch result, and
    replaying a micro-batch (crash-recovery case) does not duplicate rows."""
    from rwa_calculator_spark.sources.star import load_table
    from rwa_calculator_spark.streaming.sinks import idempotent_batch_writer, run_foreach_batch
    from rwa_calculator_spark.streaming.windows import read_events_stream

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    run_foreach_batch(stream, out, ckpt)

    batch = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_expected = batch.count()
    assert spark.read.parquet(out).count() == n_expected

    # simulate post-crash replay of batch 0: same batch_id, same data
    idempotent_batch_writer(out)(batch, 0)
    assert spark.read.parquet(out).count() == n_expected


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    """Stream-static broadcast join + windowed agg: the streaming run over
    the same events must produce exactly the batch-plan rows."""
    from rwa_calculator_spark.sources.star import load_table
    from rwa_calculator_spark.streaming.joins import static_enrich
    from rwa_calculator_spark.streaming.windows import read_events_stream, run_to_memory

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    run_to_memory(
        static_enrich(read_events_stream(spark, sf_dir), dim),
        "t_static_enrich",
        complete=True,
    )
    got = _rows(spark.table("t_static_enrich"))
    want = _rows(static_enrich(load_table(spark, sf_dir, "events"), dim))
    assert len(want) > 0
    assert got == want


def test_incremental_multi_batch_processing(spark, sf_dir, tmp_path):
    """Genuine incremental execution: the same windowed aggregation driven
    through MANY micro-batches (maxFilesPerTrigger=1 over a multi-file
    source) must converge to the single-batch/batch-plan result — state
    carries correctly across triggers, which a one-batch test never
    exercises."""
    from rwa_calculator_spark.sources.star import STAR_SCHEMAS, load_table
    from rwa_calculator_spark.streaming.windows import tumbling_counts

    src = str(tmp_path / "events_parts")
    load_table(spark, sf_dir, "events").repartition(8).write.parquet(src)
    n_files = len([f for f in __import__("os").listdir(src) if f.endswith(".parquet")])
    assert n_files >= 8

    raw = (
        spark.readStream.schema(STAR_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        tumbling_counts(raw)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_multibatch")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
    assert n_batches >= 8, f"expected one micro-batch per file, saw {n_batches}"
    got = _rows(spark.table("t_multibatch"))
    want = _rows(tumbling_counts(load_table(spark, sf_dir, "events")))
    assert got == want


def test_watermark_append_drops_late_windows(spark, sf_dir, tmp_path):
    """Pin REAL watermark drop semantics (withWatermark + append mode)
    against a hand-computed batch mirror. Spark keeps TWO watermarks
    (SPARK-40925): the EVICTION watermark (running max event time over
    previous batches minus the delay, millisecond-truncated) decides which
    windows finalize and emit, while the LATE-EVENT filter uses the
    PREVIOUS batch's eviction watermark — one batch of extra lag, so rows
    arriving in the same batch where their window closes still aggregate
    before emission. A row is dropped iff its window end <= that lagged
    watermark. A far-future sentinel batch closes every real window so
    append mode emits them all."""
    import os
    import shutil
    from collections import Counter
    from datetime import timedelta, timezone

    from rwa_calculator_spark.sources.star import STAR_SCHEMAS, load_table

    # Arrival order deliberately SCRAMBLED vs event time (hash-bucketed),
    # so batches genuinely interleave timestamps and late rows exist —
    # an event_id-ordered feed would never exercise the drop branch.
    rows = (
        load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(200)
        .orderBy((F.col("event_id") % 7), "event_id")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .collect()
    )
    assert len(rows) == 200
    batches = [rows[i : i + 50] for i in range(0, 200, 50)]
    sentinel_ts = max(r.ts for r in rows) + timedelta(days=3)
    batches.append(
        [type(rows[0])(event_id=10**9, ts=sentinel_ts, user_id=0,
                       event_type="sentinel", value=0.0, props=None)]
    )

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    for i, batch in enumerate(batches):
        part_dir = str(tmp_path / f"part_{i}")
        spark.createDataFrame(batch, STAR_SCHEMAS["events"]).coalesce(1).write.parquet(part_dir)
        part = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.copy(os.path.join(part_dir, part), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))  # arrival order = batch order

    raw = (
        spark.readStream.schema(STAR_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        raw.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_watermark")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got: Counter = Counter()
    for r in spark.table("t_watermark").collect():
        got[r.window_start] += r.n

    # hand-computed mirror of the semantics above
    import math

    def epoch(dt):
        return dt.replace(tzinfo=timezone.utc).timestamp()

    def late_wm(frontier):
        # ms-truncated (Spark stores event-time stats in milliseconds)
        if frontier is None:
            return None
        return math.floor(epoch(frontier) * 1000) / 1000.0 - 600.0

    expected: Counter = Counter()
    fr_prev2 = fr_prev1 = None  # frontiers: two batches back / one back
    for batch in batches:
        wm = late_wm(fr_prev2)
        for r in batch:
            if r.event_type == "sentinel":
                continue
            wstart = int(epoch(r.ts) // 3600) * 3600
            if wm is None or wstart + 3600 > wm:
                expected[wstart] += 1
        top = max(r.ts for r in batch)
        if fr_prev1 is not None and (fr_prev2 is None or fr_prev1 > fr_prev2):
            fr_prev2 = fr_prev1
        if fr_prev1 is None or top > fr_prev1:
            fr_prev1 = top
    assert dict(got) == dict(expected)
    # non-vacuous: the scrambled arrival order must actually drop rows,
    # otherwise the mirror proves nothing about late-data semantics
    total_kept = sum(expected.values())
    assert total_kept < 200, "no late rows were dropped — drop branch unexercised"
