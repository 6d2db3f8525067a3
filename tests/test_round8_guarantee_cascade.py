"""Round-8: multi-level guarantee beneficiary cascade (closes the recorded
round-7 narrowing; ref engine/crm/guarantees.py:594-655
_expand_guarantee_beneficiaries — direct pass-through, facility-level
cascade over the descendant subtree, counterparty-level pooling; declared
percentages pass through unchanged, amounts allocate pro-rata by
ead_after_collateral)."""

from __future__ import annotations

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK


def _cps(spark, refs=("CP1",)):
    return spark.createDataFrame(
        [(r, "corporate", 2, False, 0.0, False) for r in refs],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )


def _loans(spark, rows):
    return spark.createDataFrame(
        rows,
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )


def _fmap(spark, rows):
    return spark.createDataFrame(
        rows,
        "child_reference string, child_type string, "
        "parent_facility_reference string",
    )


def _guar(spark, rows):
    return spark.createDataFrame(
        rows,
        "beneficiary_type string, beneficiary_reference string, "
        "coverage_pct double, guarantee_amount double, "
        "guarantor_class string, guarantor_cqs int",
    )


def _run(spark, loans, fmap, guarantees):
    return run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=loans,
            facility_mappings=fmap,
            guarantees=guarantees,
        ),
        PipelineConfig(pack=CRR_PACK),
    )


def test_facility_pct_guarantee_cascades_to_subtree(spark):
    # sovereign CQS1 guarantee (RW 0%) declared at FAC1 covers 50% of both
    # loans under it; corporate CQS2 own RW 0.5 → blended 0.25 each
    out = _run(
        spark,
        _loans(spark, [("L1", "CP1", 600.0), ("L2", "CP1", 400.0)]),
        _fmap(spark, [("L1", "loan", "FAC1"), ("L2", "loan", "FAC1")]),
        _guar(spark, [("facility", "FAC1", 0.5, None, "sovereign", 1)]),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    for ref, ead in (("L1", 600.0), ("L2", 400.0)):
        r = rows[ref]
        assert r.guarantee_source_level == "facility"
        assert r.guarantee_inherited_from == "FAC1"
        assert abs(r.rwa - ead * 0.25) < 1e-9
        assert "guarantee@facility/substitution<-FAC1" in r.crm_allocation_notes


def test_ancestor_facility_guarantee_reaches_grandchild(spark):
    # guarantee pledged at ROOT cascades down ROOT → FAC1 → L1
    out = _run(
        spark,
        _loans(spark, [("L1", "CP1", 1000.0)]),
        _fmap(spark, [("L1", "loan", "FAC1"), ("FAC1", "facility", "ROOT")]),
        _guar(spark, [("facility", "ROOT", 1.0, None, "sovereign", 1)]),
    )
    r = out.results.collect()[0]
    assert r.guarantee_source_level == "facility"
    assert r.guarantee_inherited_from == "ROOT"
    assert abs(r.rwa - 0.0) < 1e-9  # fully covered at sovereign CQS1 0%


def test_counterparty_amount_guarantee_pro_rata(spark):
    # a 500 guarantee pooled over CP1's 600+400 book covers the uniform
    # fraction 500/1000 = 0.5 of each exposure
    out = _run(
        spark,
        _loans(spark, [("L1", "CP1", 600.0), ("L2", "CP1", 400.0)]),
        None,
        _guar(spark, [("counterparty", "CP1", None, 500.0, "sovereign", 1)]),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    for ref, ead in (("L1", 600.0), ("L2", 400.0)):
        r = rows[ref]
        assert r.guarantee_source_level == "counterparty"
        assert r.guarantee_inherited_from == "CP1"
        assert abs(r.g_coverage - 0.5) < 1e-12
        assert abs(r.rwa - ead * 0.25) < 1e-9


def test_direct_beneficiary_without_exposure_reference_column(spark):
    # beneficiary_type='loan' names the exposure directly; the other loan
    # stays un-guaranteed; provenance stays the exposure level, never
    # inherited
    out = _run(
        spark,
        _loans(spark, [("L1", "CP1", 600.0), ("L2", "CP1", 400.0)]),
        None,
        _guar(spark, [("loan", "L1", 1.0, None, "sovereign", 1)]),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    assert rows["L1"].guarantee_source_level == "exposure"
    assert rows["L1"].guarantee_inherited_from is None
    assert abs(rows["L1"].rwa - 0.0) < 1e-9
    assert rows["L2"].guarantee_source_level is None
    assert abs(rows["L2"].rwa - 400.0 * 0.5) < 1e-9


def test_amount_guarantee_caps_at_full_coverage(spark):
    # amount 5000 over a 1000 book: fraction caps at 1.0, never >100%
    out = _run(
        spark,
        _loans(spark, [("L1", "CP1", 1000.0)]),
        None,
        _guar(spark, [("counterparty", "CP1", None, 5000.0, "sovereign", 1)]),
    )
    r = out.results.collect()[0]
    assert abs(r.g_coverage - 1.0) < 1e-12
    assert abs(r.rwa - 0.0) < 1e-9


def test_declared_pct_wins_over_amount(spark):
    # both declared: the % is the contract figure (ref guarantees.py
    # percentage passes through unchanged)
    out = _run(
        spark,
        _loans(spark, [("L1", "CP1", 1000.0)]),
        None,
        _guar(spark, [("counterparty", "CP1", 0.3, 900.0, "sovereign", 1)]),
    )
    r = out.results.collect()[0]
    assert abs(r.g_coverage - 0.3) < 1e-12
