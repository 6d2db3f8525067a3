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


def test_component_registry_mapping_validates_in_module():
    """ref analysis/recon_registry.py: LegacyColumnMapping validates its
    component names against the registry at construction — unknown names
    are configuration errors, not silent drops."""
    import pytest

    from rwa_calculator_spark.operators.recon_registry import LegacyColumnMapping

    LegacyColumnMapping({"legacy_rwa": "rwa"})  # known component: fine
    with pytest.raises(ValueError, match="not_a_component"):
        LegacyColumnMapping({"x": "not_a_component"})


def test_select_ours_preference_order_and_missing(spark):
    import pytest

    from rwa_calculator_spark.operators.recon_registry import (
        COMPONENT_REGISTRY,
        select_ours,
    )

    df = spark.createDataFrame(
        [("E1", 100.0, 90.0)], "exposure_reference string, ead_after_crm double, ead double"
    )
    # first present candidate wins: ead_after_crm preferred over ead
    out = select_ours(df, [COMPONENT_REGISTRY["ead"]], ["exposure_reference"])
    assert out.collect()[0]["ead"] == 100.0
    # fallback when the preferred column is absent
    out2 = select_ours(
        df.drop("ead_after_crm"), [COMPONENT_REGISTRY["ead"]], ["exposure_reference"]
    )
    assert out2.collect()[0]["ead"] == 90.0
    with pytest.raises(ValueError, match="rwa"):
        select_ours(df, [COMPONENT_REGISTRY["rwa"]], ["exposure_reference"])


def test_parallel_run_recon_categorical_normalised_equality(spark):
    from rwa_calculator_spark.operators.recon_registry import (
        COMPONENT_REGISTRY,
        reconcile_parallel_run,
    )

    ours = spark.createDataFrame(
        [("E1", "retail", 1.0), ("E2", "corporate", 2.0), ("E3", "retail", 3.0)],
        "exposure_reference string, exposure_class string, rwa double",
    )
    legacy = spark.createDataFrame(
        # case/whitespace differences must be EXACT; a flipped label breaks;
        # E3 absent -> missing_theirs; E9 extra -> missing_ours
        [("E1", " RETAIL ", 1.0), ("E2", "sovereign", 2.0), ("E9", "retail", 9.0)],
        "exposure_reference string, exposure_class string, rwa double",
    )
    comps = [COMPONENT_REGISTRY["exposure_class"], COMPONENT_REGISTRY["rwa"]]
    res = reconcile_parallel_run(ours, legacy, ["exposure_reference"], comps)
    rows = {
        (r.exposure_reference, r.component): r.bucket for r in res.detail.collect()
    }
    assert rows[("E1", "exposure_class")] == "exact"
    assert rows[("E2", "exposure_class")] == "break"
    assert rows[("E3", "exposure_class")] == "missing_theirs"
    assert rows[("E9", "exposure_class")] == "missing_ours"
    assert rows[("E1", "rwa")] == "exact"
