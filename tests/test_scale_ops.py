"""Scale-posture operators: salting must be a pure physical rewrite
(bit-identical results); bucketed joins must plan without an Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from rwa_calculator_spark.operators.bucketing import bucketed_join, write_bucketed
from rwa_calculator_spark.operators.skew import explode_salt_join, salted_sum
from rwa_calculator_spark.sources.star import load_table


def test_salted_sum_bit_identical(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_orderkey: r.total
        for r in li.groupBy("l_orderkey")
        .agg(
            (F.sum(F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")) / 100.0).alias(
                "total"
            )
        )
        .collect()
    }
    salted = {
        r.l_orderkey: r.total
        for r in salted_sum(li, ["l_orderkey"], F.col("l_extendedprice"), "total").collect()
    }
    assert plain == salted  # exact equality, not approx


def test_explode_salt_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey", "left").agg(
        F.count("*").alias("n"), F.sum(F.round("o_totalprice", 0).cast("long")).alias("s")
    ).collect()[0]
    salted = explode_salt_join(li, o, "l_orderkey").agg(
        F.count("*").alias("n"), F.sum(F.round("o_totalprice", 0).cast("long")).alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "t_li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(o, "t_o_bucketed", "l_orderkey", n_buckets=8)
    # disable auto-broadcast: at real scale both sides are too big for it —
    # the point of bucketing is a shuffle-free sort-merge join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_li_bucketed", "t_o_bucketed", "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_prepared_layout_windows_shuffle_free(spark, sf_dir):
    """The prepared bucketed layout must remove the hashpartitioning
    Exchange from the partitionBy(l_orderkey) window queries and leave
    results bit-identical to the plain parquet path."""
    from rwa_calculator_spark.operators.bucketing import (
        bucketed_star_loader,
        prepare_star_layout,
    )
    from rwa_calculator_spark.plans.domain import pro_rata_allocation
    from rwa_calculator_spark.plans.windows import window_cumsum_waterfall

    prepare_star_layout(spark, sf_dir, n_buckets=8)
    for fn in (window_cumsum_waterfall, pro_rata_allocation):
        plain_df = fn(spark, sf_dir)
        prepared_df = fn(spark, sf_dir, loader=bucketed_star_loader)
        plan = prepared_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert sorted(map(tuple, plain_df.collect())) == sorted(
            map(tuple, prepared_df.collect())
        )


def test_asof_window_matches_pandas(spark, sf_dir):
    """The window as-of join (scale path) and applyInPandas merge_asof
    (fallback path) must agree row-for-row."""
    from rwa_calculator_spark.operators.asof import asof_join_pandas, asof_join_window

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    a = {
        (r.user_id, r.ts): (r.asof_ts, r.asof_value)
        for r in asof_join_window(purchases, clicks, "user_id", "ts", ("value",)).collect()
    }
    b = {
        (r.user_id, r.ts): (r.asof_ts, r.asof_value)
        for r in asof_join_pandas(purchases, clicks, "user_id", "ts", ("value",)).collect()
    }
    assert a == b


def test_ngram_candidates_bounded_under_stopword_corpus(spark):
    """A stopword shared by EVERY document must not generate candidate
    pairs: the df-capped posting list drops it before the self-join, so
    candidates stay bounded by rare-word co-occurrence (the 100 TB shape —
    without the cap one hot token makes the join quadratic in corpus size)."""
    from pyspark.sql import Window as W

    # 200 docs, all sharing the word 'the'; only doc pairs (2k, 2k+1) share
    # a rare word
    rows = []
    for i in range(200):
        rare = f"rare{i // 2}"
        rows.append((i, f"the {rare} x{i}"))
    d = spark.createDataFrame(rows, "doc_id long, text string")

    ws = d.select("doc_id", F.explode(F.split("text", " ")).alias("word")).distinct()
    rare = (
        ws.withColumn("_df", F.count("*").over(W.partitionBy("word")))
        .where(F.col("_df") <= 100)
        .drop("_df")
    )
    a, b = rare.alias("a"), rare.alias("b")
    cand = (
        a.join(b, (F.col("a.word") == F.col("b.word")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    n = cand.count()
    # without the cap: 'the' alone contributes C(200,2) = 19900 pairs
    assert n == 100, n


def test_ann_broadcast_query_guard(spark):
    """The exact-ANN broadcast side is size-guarded (VERDICT r1/r2: an
    unbounded query slice broadcast is the one scale-killer in the ANN
    family) — oversized query sets must raise toward the IVF/LSH paths."""
    import pytest

    from rwa_calculator_spark.plans.llm import guard_broadcast_query

    q = spark.range(10).selectExpr("id AS qid")
    assert guard_broadcast_query(q).count() == 10  # under limit: passthrough
    with pytest.raises(ValueError, match="ann_ivf_probe"):
        guard_broadcast_query(q, limit=5)


def test_decontamination_plan_broadcasts_eval_grams(spark, sf_dir):
    """The eval-set gram table must reach the semi-join as a BROADCAST —
    at 100 TB the corpus side must never shuffle on the gram key."""
    from rwa_calculator_spark.plans.llm import decontamination_ngram_overlap

    df = decontamination_ngram_overlap(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert df.count() > 0


def test_hedging_set_plan_two_aggregations_no_join(spark, sf_dir):
    """saccr_ir_hedging_sets is two keyed partial aggregations plus pure
    arithmetic — its physical plan must contain NO join at all and keep
    the bucket pivot map-side combinable (partial_ aggregates present)."""
    from rwa_calculator_spark.plans.ccr import saccr_ir_hedging_sets

    df = saccr_ir_hedging_sets(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "partial_" in plan, plan  # map-side combine before each exchange
    assert df.count() == 1


def test_stream_static_enrich_broadcasts_dimension(spark, sf_dir):
    """The stream-static join must broadcast the dimension side — a
    shuffle on the stream key would be the 100 TB bottleneck."""
    from rwa_calculator_spark.plans.streaming_batch import stream_static_enrich

    plan = stream_static_enrich(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_corpus_line_dedup_plan_shape(spark, sf_dir):
    """Segment-frequency dedup: the reassembly aggregation must be a plain
    two-shuffle plan (segment key, then doc key) with no cartesian or
    nested-loop join anywhere."""
    from rwa_calculator_spark.plans.llm import dedup_lines_corpus

    plan = dedup_lines_corpus(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_pii_redaction_stays_codegen(spark, sf_dir):
    """PII detect/redact is pure row expressions: no exchange, no UDF —
    the whole plan is a single whole-stage-codegen scan+project."""
    from rwa_calculator_spark.plans.llm import pii_redaction

    plan = pii_redaction(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_ledger_widening_adds_no_exchange(spark):
    """The round-6 per-type collateral decomposition and SCRA/GCRA
    provision split ride EXISTING aggregations. Pinned DIFFERENTIALLY:
    the same book run with typed collateral/provisions must plan exactly
    as many shuffles as run with untyped ones — the carriers are
    conditional sums inside aggregations the untyped plan already has,
    so the Exchange census of the two executed plans must be equal."""
    from rwa_calculator_spark.engine.bundles import RawBundle
    from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
    from rwa_calculator_spark.engine.rulepack import CRR_PACK

    cps = spark.createDataFrame(
        [("CP1", "corporate", 2, False, 0.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0)],
        "loan_reference string, counterparty_reference string, drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd", "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    links = spark.createDataFrame(
        [("C1", "L1"), ("C2", "L1")],
        "collateral_reference string, exposure_reference string",
    )

    def census(coll_schema, coll_rows, prov_schema, prov_rows):
        coll = spark.createDataFrame(coll_rows, coll_schema)
        provs = spark.createDataFrame(prov_rows, prov_schema)
        out = run_pipeline(
            RawBundle(
                counterparties=cps, loans=loans, collateral=coll,
                collateral_links=links, provisions=provs,
            ),
            PipelineConfig(pack=CRR_PACK),
        )
        plan = out.results._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange ")

    typed = census(
        "collateral_reference string, collateral_type string, "
        "market_value double, haircut double",
        [("C1", "cash", 100.0, 0.1), ("C2", "receivables", 50.0, 0.1)],
        "beneficiary_reference string, beneficiary_type string, amount double, "
        "provision_type string, provision_reference string",
        [("L1", "exposure", 10.0, "scra", "P1"),
         ("CP1", "counterparty", 5.0, "gcra", "P2")],
    )
    untyped = census(
        "collateral_reference string, collateral_type string, "
        "market_value double, haircut double",
        [("C1", "cash", 100.0, 0.1), ("C2", "cash", 50.0, 0.1)],
        "beneficiary_reference string, beneficiary_type string, amount double",
        [("L1", "exposure", 10.0), ("CP1", "counterparty", 5.0)],
    )
    assert typed == untyped, f"typed={typed} untyped={untyped}"
