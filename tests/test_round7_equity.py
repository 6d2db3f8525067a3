"""Round-7 equity branch depth: CRR Art.155(2) net-short-position netting
and the PRA Rules 4.1-4.10 B3.1 equity transitional RW floor (ref
engine/equity/calculator.py:829 _net_short_positions, :1023
_apply_transitional_floor, :1200 _equity_transitional_rw;
rulebook/packs/b31.py:740-761 schedules)."""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK


def _cps(spark):
    return spark.createDataFrame(
        [("CP1", "corporate", 2, False, 0.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )


def _run(spark, equity, pack=CRR_PACK, reporting_date=None):
    loans = spark.createDataFrame(
        [("L_FILL", "CP1", 100.0)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark), loans=loans, equity_exposures=equity
        ),
        PipelineConfig(pack=pack, reporting_date=reporting_date),
    )
    return {r.exposure_reference: r for r in out.results.collect()}


def test_equity_net_short_netting(spark):
    # Art.155(2): hedged short −400 offsets the hedged long 1000 on the
    # same stock → net long 600 rides the long row, the short collapses
    # to 0; the unhedged 500 keeps its absolute value. All "other" 370%.
    equity = spark.createDataFrame(
        [
            ("E1", "CP1", 1000.0, False, "ISS1", 1000.0, True),
            ("E2", "CP1", 400.0, False, "ISS1", -400.0, True),
            ("E3", "CP1", 500.0, False, "ISS1", 500.0, False),
        ],
        "exposure_reference string, counterparty_reference string, "
        "market_value double, is_exchange_traded boolean, "
        "issuer_reference string, position_value double, "
        "is_explicitly_hedged boolean",
    )
    rows = _run(spark, equity)
    assert rows["E1"].ead == pytest.approx(600.0)
    assert rows["E1"].rwa == pytest.approx(600.0 * 3.7)
    assert rows["E2"].ead == pytest.approx(0.0)
    assert rows["E2"].rwa == pytest.approx(0.0)
    assert rows["E3"].ead == pytest.approx(500.0)
    assert rows["E3"].rwa == pytest.approx(500.0 * 3.7)


def test_equity_net_short_group_nets_to_zero(spark):
    # a fully-netted issuer group collapses every eligible row to 0
    equity = spark.createDataFrame(
        [
            ("E1", "CP1", 700.0, False, "ISS1", 700.0, True),
            ("E2", "CP1", 900.0, False, "ISS1", -900.0, True),
        ],
        "exposure_reference string, counterparty_reference string, "
        "market_value double, is_exchange_traded boolean, "
        "issuer_reference string, position_value double, "
        "is_explicitly_hedged boolean",
    )
    rows = _run(spark, equity)
    assert rows["E1"].ead == pytest.approx(0.0)
    assert rows["E2"].ead == pytest.approx(0.0)


def test_equity_unhedged_short_not_netted(spark):
    # without the explicit ≥1y hedge the short is ineligible: it keeps the
    # absolute-value chain (market_value) and the long is untouched
    equity = spark.createDataFrame(
        [
            ("E1", "CP1", 1000.0, False, "ISS1", 1000.0, False),
            ("E2", "CP1", 400.0, False, "ISS1", -400.0, False),
        ],
        "exposure_reference string, counterparty_reference string, "
        "market_value double, is_exchange_traded boolean, "
        "issuer_reference string, position_value double, "
        "is_explicitly_hedged boolean",
    )
    rows = _run(spark, equity)
    assert rows["E1"].ead == pytest.approx(1000.0)
    assert rows["E2"].ead == pytest.approx(400.0)


def _b31_equity(spark):
    return spark.createDataFrame(
        [
            # standard 250% — below every transitional std step ≥ 2028
            ("E_STD", "CP1", 1000.0, True, False),
            # speculative 400% — the 2029 HR step 3.40 stays below, the
            # 2030 step 4.00 equals it
            ("E_SPEC", "CP1", 1000.0, False, True),
        ],
        "exposure_reference string, counterparty_reference string, "
        "market_value double, is_exchange_traded boolean, "
        "is_speculative boolean",
    )


def test_equity_transitional_floor_phases_in(spark):
    # 2028-06-30: std 1.90 < 2.50 assigned (no uplift), HR 2.80 < 4.00.
    rows = _run(spark, _b31_equity(spark), B31_PACK, "2028-06-30")
    assert rows["E_STD"].risk_weight == pytest.approx(2.5)
    assert rows["E_STD"].equity_transitional_rw == pytest.approx(1.9)
    assert rows["E_STD"].equity_transitional_approach == "sa_transitional"
    assert rows["E_SPEC"].risk_weight == pytest.approx(4.0)
    assert rows["E_SPEC"].equity_transitional_rw == pytest.approx(2.8)


def test_equity_transitional_floor_binds_above_assigned(spark):
    # 2030: std step 2.50 equals the standard RW; a young unlisted
    # diversified-PE holding is HIGHER-RISK (Art.133(4)) so its floor is
    # 4.00 — binding over the 2.50 the B3.1 SA ladder assigns it
    equity = spark.createDataFrame(
        [("E_PE", "CP1", 1000.0, False, False, True, 3.0)],
        "exposure_reference string, counterparty_reference string, "
        "market_value double, is_exchange_traded boolean, "
        "is_speculative boolean, is_diversified_pe boolean, "
        "business_age_years double",
    )
    rows = _run(spark, equity, B31_PACK, "2030-03-31")
    r = rows["E_PE"]
    assert r.risk_weight == pytest.approx(4.0)
    assert r.equity_transitional_rw == pytest.approx(4.0)
    assert r.equity_higher_risk is True
    assert r.rwa == pytest.approx(4000.0)


def test_equity_transitional_outside_window_or_crr(spark):
    # before the first step the schedule explicitly does NOT fire (the
    # reference's "no transition → skip" contract), and CRR has no Feature
    rows = _run(spark, _b31_equity(spark), B31_PACK, "2026-12-31")
    assert rows["E_STD"].equity_transitional_approach is None
    assert rows["E_STD"].equity_transitional_rw is None
    assert rows["E_STD"].risk_weight == pytest.approx(2.5)
    crr_eq = spark.createDataFrame(
        [("E1", "CP1", 1000.0, True)],
        "exposure_reference string, counterparty_reference string, "
        "market_value double, is_exchange_traded boolean",
    )
    rows = _run(spark, crr_eq, CRR_PACK, "2028-06-30")
    assert rows["E1"].equity_transitional_approach is None
    assert rows["E1"].risk_weight == pytest.approx(2.9)


def test_equity_transitional_excludes_carveouts(spark):
    # PRA Rule 4.2/4.3: subordinated debt / central-bank holdings carry no
    # transitional floor (0.0) even inside the window
    equity = spark.createDataFrame(
        [("E_SUB", "CP1", 1000.0, False, "subordinated_debt")],
        "exposure_reference string, counterparty_reference string, "
        "market_value double, is_exchange_traded boolean, "
        "equity_subtype string",
    )
    rows = _run(spark, equity, B31_PACK, "2029-06-30")
    r = rows["E_SUB"]
    assert r.equity_transitional_rw == pytest.approx(0.0)
    assert r.risk_weight == pytest.approx(2.5)
