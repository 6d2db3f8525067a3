"""Reconciliation operator: two pipeline runs with a known perturbation must
reconcile with exactly the injected breaks (ref analysis/reconciliation.py
semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK
from rwa_calculator_spark.operators.recon import ReconComponent, reconcile


def test_reconcile_identical_runs_all_exact(spark):
    from tests.engine_fixtures import build_bundle

    bundle = build_bundle(spark, n_cp=100)
    # reconcile over materialised ledgers (the real workflow reads the
    # parquet results cache; unmaterialised lineages would recompute the
    # whole pipeline per action)
    a = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK)).results.localCheckpoint()
    b = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK)).results.localCheckpoint()
    res = reconcile(
        a, b, ["exposure_reference"], [ReconComponent("ead"), ReconComponent("rwa")]
    )
    buckets = {(r.component, r.bucket): r.n for r in res.summary.collect()}
    assert set(b for (_, b) in buckets) == {"exact"}
    assert res.worklist.count() == 0


def test_reconcile_detects_injected_breaks(spark):
    from tests.engine_fixtures import build_bundle

    bundle = build_bundle(spark, n_cp=100)
    a = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK)).results.localCheckpoint()
    # perturb: +5% RWA on exposures whose reference ends in '7', drop one key
    b = a.withColumn(
        "rwa",
        F.when(F.col("exposure_reference").endswith("7"), F.col("rwa") * 1.05).otherwise(
            F.col("rwa")
        ),
    ).where(F.col("exposure_reference") != "L00000000")
    res = reconcile(a, b, ["exposure_reference"], [ReconComponent("rwa")])
    buckets = {r.bucket: r.n for r in res.summary.collect()}
    n_seven = a.where(F.col("exposure_reference").endswith("7") & (F.col("rwa") > 0.2)).count()
    assert buckets.get("missing_theirs", 0) == 1
    assert buckets.get("break", 0) >= n_seven - 1  # zero-RWA rows stay exact
    top = res.worklist.limit(1).collect()[0]
    assert abs(top.diff) > 0  # materiality ordering yields the biggest break first
