"""Round-6 ledger widening: collateral decomposition lists, the CRR
double-default carriers, and per-stage wall-ms in the run manifest (ref
CALCULATION_OUTPUT_SCHEMA data/schemas.py:2954-2955 collateral_references/
collateral_types, :3098-3100 double-default block; engine/materialise.py:
74-98 EdgeEvent wall-ms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import CRMOutput, RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK


def test_collateral_types_and_references_sealed(spark):
    cps = spark.createDataFrame(
        [("CP1", "corporate", 2, False, 0.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0), ("L2", "CP1", 500.0)],
        "loan_reference string, counterparty_reference string, drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    collateral = spark.createDataFrame(
        [("C1", "govt_bond", 400.0), ("C2", "cash", 100.0)],
        "collateral_reference string, collateral_type string, market_value double",
    )
    links = spark.createDataFrame(
        [("C1", "L1"), ("C2", "L1")],
        "collateral_reference string, exposure_reference string",
    )
    out = run_pipeline(
        RawBundle(
            counterparties=cps, loans=loans, collateral=collateral,
            collateral_links=links,
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    # sorted, duplicate-free lists — deterministic under shuffle
    assert rows["L1"].collateral_references == ["C1", "C2"]
    assert rows["L1"].collateral_types == ["cash", "govt_bond"]
    # an unsecured row in a collateral-bearing run carries the EMPTY list
    # (the channel ran and found nothing), never null
    assert rows["L2"].collateral_references == []
    assert rows["L2"].collateral_types == []


def test_collateral_lists_null_without_collateral_channel(spark):
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
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    out = run_pipeline(RawBundle(counterparties=cps, loans=loans),
                       PipelineConfig(pack=CRR_PACK))
    r = out.results.collect()[0]
    assert r.collateral_references is None or r.collateral_references == []
    assert "collateral_types" in out.results.columns


def _dd_book(spark, pd_g=0.001, seniority="subordinated", sub="airb"):
    """One corporate A-IRB exposure with a subordinated institution
    guarantor: rw_dd = rw_own × (0.15 + 160×PD_g) = 1.5885 × 0.31 ≈ 0.492
    beats the Art.161(1) subordinated-LGD substitution (≈ 0.524), so DD
    both qualifies AND prices the row."""
    return spark.createDataFrame(
        [("L1", "CP1", "corporate", 2, True, False, False, 0.05, 0.45, 2.5,
          200_000_000.0, 1000.0, 0.0, 1000.0, 1000.0, 0.5, "institution", 1,
          pd_g, seniority, sub)],
        "exposure_reference string, counterparty_reference string, "
        "exposure_class string, cqs int, has_irb_permission boolean, "
        "is_specialised boolean, is_defaulted boolean, pd double, lgd double, "
        "effective_maturity double, annual_revenue double, drawn_amount double, "
        "undrawn_amount double, ead double, ead_after_crm double, "
        "g_coverage double, g_class string, g_cqs int, guarantor_pd double, "
        "guarantor_seniority string, irb_subapproach string",
    )


def test_double_default_carriers_sealed_when_dd_prices(spark):
    from rwa_calculator_spark.engine.stages.calculators import run_irb

    res = run_irb(CRMOutput(exposures=_dd_book(spark)), CRR_PACK).results
    r = res.collect()[0]
    assert r.is_double_default_eligible is True
    assert r.rw_source.endswith("+gdd")
    # guaranteed portion under DD = coverage × EAD (the COREP 0220 figure)
    assert r.double_default_unfunded_protection == pytest.approx(500.0)
    # DD uses the OBLIGOR's LGD (it modifies K through PD_g, never LGD)
    assert r.irb_lgd_double_default == pytest.approx(0.45)


def test_double_default_carriers_null_when_substitution_wins(spark):
    from rwa_calculator_spark.engine.stages.calculators import run_irb

    # senior guarantor (LGD 0.45): substitution at PD_g=0.002 (~0.47)
    # beats rw_dd (~0.75) — eligible but NOT applied
    res = run_irb(
        CRMOutput(exposures=_dd_book(spark, pd_g=0.002, seniority="senior")),
        CRR_PACK,
    ).results
    r = res.collect()[0]
    assert r.is_double_default_eligible is True
    assert "+gsub_pd" in r.rw_source
    assert r.double_default_unfunded_protection is None
    assert r.irb_lgd_double_default is None


def test_double_default_gated_off_under_b31(spark):
    from rwa_calculator_spark.engine.stages.calculators import run_irb

    # PS1/26 did not onshore double default — the B3.1 pack gates the
    # branch off entirely; the carriers stay honest nulls
    res = run_irb(CRMOutput(exposures=_dd_book(spark)), B31_PACK).results
    r = res.collect()[0]
    assert r.is_double_default_eligible is None
    assert r.double_default_unfunded_protection is None
    assert "dd" not in (r.rw_source or "").split("+g")[-1]


def test_firb_rows_not_dd_eligible(spark):
    from rwa_calculator_spark.engine.stages.calculators import run_irb

    # CRR Art.153(3) double default is an A-IRB treatment
    res = run_irb(CRMOutput(exposures=_dd_book(spark, sub="firb")), CRR_PACK).results
    r = res.collect()[0]
    assert r.is_double_default_eligible is False
    assert r.double_default_unfunded_protection is None


def test_manifest_records_per_stage_wall_ms(spark, tmp_path):
    from rwa_calculator_spark.api import CreditRiskCalc

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
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    calc = CreditRiskCalc(
        spark, RawBundle(counterparties=cps, loans=loans), pack=CRR_PACK,
        cache_dir=str(tmp_path / "cache"),
    )
    resp = calc.calculate(persist_edges=False)
    stages = resp.run_manifest["stages"]
    for name in ("hierarchy", "classify", "crm", "re_split", "calculators",
                 "aggregate"):
        assert name in stages and stages[name] >= 0.0


def test_collateral_per_type_decomposition_sealed(spark):
    # L1 holds cash 100, govt_bond 400 (supplied 10% haircut each), a
    # receivables item 200 and a machinery item 100: financial = 0.9×500
    # = 450, cash subset = 90, receivables = 180, other = 90, and
    # collateral_value = 450 + 180 + 90 = 720 exactly (the identity the
    # COREP 0180/0200/0210 columns rely on).
    cps = spark.createDataFrame(
        [("CP1", "corporate", 2, False, 0.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 2000.0)],
        "loan_reference string, counterparty_reference string, drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    collateral = spark.createDataFrame(
        [
            ("C1", "cash", 100.0, 0.1),
            ("C2", "govt_bond", 400.0, 0.1),
            ("C3", "receivables", 200.0, 0.1),
            ("C4", "machinery", 100.0, 0.1),
        ],
        "collateral_reference string, collateral_type string, "
        "market_value double, haircut double",
    )
    links = spark.createDataFrame(
        [("C1", "L1"), ("C2", "L1"), ("C3", "L1"), ("C4", "L1")],
        "collateral_reference string, exposure_reference string",
    )
    out = run_pipeline(
        RawBundle(
            counterparties=cps, loans=loans, collateral=collateral,
            collateral_links=links,
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    r = out.results.collect()[0]
    assert r.collateral_financial_value == pytest.approx(450.0)
    assert r.collateral_cash_value == pytest.approx(90.0)
    assert r.collateral_receivables_value == pytest.approx(180.0)
    assert r.collateral_other_physical_value == pytest.approx(90.0)
    assert r.collateral_value == pytest.approx(720.0)
    assert r.collateral_re_value == pytest.approx(0.0)


def test_collateral_re_value_sealed_on_both_split_parts(spark):
    # A 1000 loan secured on a 900 property: the Art.124(2) split makes a
    # 720 re_secured tranche and a 280 remainder — BOTH parts carry the
    # full 900 collateral_re_value (provenance, deliberately not conserved
    # across the split), and neither carries FCCM decomposition value.
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
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    collateral = spark.createDataFrame(
        [("RE1", "real_estate", 900.0)],
        "collateral_reference string, collateral_type string, market_value double",
    )
    links = spark.createDataFrame(
        [("RE1", "L1")],
        "collateral_reference string, exposure_reference string",
    )
    out = run_pipeline(
        RawBundle(
            counterparties=cps, loans=loans, collateral=collateral,
            collateral_links=links,
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    assert rows["L1_RESEC"].ead_after_crm == pytest.approx(720.0)
    assert rows["L1"].ead_after_crm == pytest.approx(280.0)
    for ref in ("L1_RESEC", "L1"):
        assert rows[ref].collateral_re_value == pytest.approx(900.0)
        assert rows[ref].collateral_financial_value == pytest.approx(0.0)
        assert rows[ref].collateral_value == pytest.approx(0.0)
