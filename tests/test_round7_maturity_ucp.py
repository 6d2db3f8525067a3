"""Round-7 Art.162 maturity priority chain + Art.213(1)(c)(i) UCP gate
(ref engine/irb/transforms.py _build_maturity_exprs /
_apply_firb_fixed_supervisory_maturity + engine/crm/guarantees.py:258
_gate_unilateral_protection; rulebook/packs features one_day_maturity_floor,
revolving_uses_termination_maturity, firb_fixed_supervisory_maturity,
ucp_unilateral_change_ineligible)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import CRMOutput, RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK
from rwa_calculator_spark.engine.stages.calculators import run_irb

_ONE_DAY = 1.0 / 365.0


def _cps(spark):
    return spark.createDataFrame(
        [("CP1", "corporate", 2, False, 2.0e8, True)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )


def _no_loans(spark):
    return spark.createDataFrame(
        [],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, is_defaulted boolean, pd double, lgd double, "
        "effective_maturity double",
    )


def test_one_day_floor_derived_from_trade_lc_under_crr(spark):
    # CRR Art.162(3)(b): a self-liquidating short-term trade LC with
    # residual <= 1y takes M = 1 day; a 2y one keeps the 2.5 default
    conts = spark.createDataFrame(
        [
            ("K1", "CP1", 100.0, "medium_risk", 0.01, True, 0.5),
            ("K2", "CP1", 100.0, "medium_risk", 0.01, True, 2.0),
        ],
        "contingent_reference string, counterparty_reference string, "
        "nominal_amount double, risk_bucket string, pd double, "
        "is_short_term_trade_lc boolean, original_maturity_years double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    out = run_pipeline(
        RawBundle(counterparties=_cps(spark), loans=_no_loans(spark), contingents=conts),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    assert rows["K1"].irb_maturity_m == pytest.approx(_ONE_DAY)
    assert rows["K2"].irb_maturity_m == pytest.approx(2.5)
    # the carve-out row prices with a LOWER maturity adjustment
    assert rows["K1"].risk_weight < rows["K2"].risk_weight


def test_one_day_derivation_off_under_b31(spark):
    # PS1/26 drops the Art.162(3)(b) derivation — the same trade LC keeps
    # the 2.5y default under the B3.1 pack
    conts = spark.createDataFrame(
        [("K1", "CP1", 100.0, "medium_risk", 0.01, True, 0.5)],
        "contingent_reference string, counterparty_reference string, "
        "nominal_amount double, risk_bucket string, pd double, "
        "is_short_term_trade_lc boolean, original_maturity_years double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    out = run_pipeline(
        RawBundle(counterparties=_cps(spark), loans=_no_loans(spark), contingents=conts),
        PipelineConfig(pack=B31_PACK),
    )
    assert out.results.collect()[0].irb_maturity_m == pytest.approx(2.5)


def test_supplied_maturity_trusted_to_one_day_clip(spark):
    # rung 1: a supplied effective_maturity is the firm's own Art.162(2)
    # figure — clipped [1 day, 5y], NOT re-floored at 1 year
    loans = spark.createDataFrame(
        [("L1", "CP1", 100.0, 0.01, 0.45, 0.5)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, pd double, lgd double, effective_maturity double",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "pd", "lgd", "effective_maturity",
    )
    out = run_pipeline(
        RawBundle(counterparties=_cps(spark), loans=loans),
        PipelineConfig(pack=CRR_PACK),
    )
    assert out.results.collect()[0].irb_maturity_m == pytest.approx(0.5)


def test_b31_revolver_prices_to_termination_date(spark):
    # PS1/26 Art.162(2A)(k): a revolving facility with no supplied M takes
    # the facility termination date (3 years out, clipped [1, 5])
    loans = spark.createDataFrame(
        [
            ("L1", "CP1", 100.0, 0.01, 0.45, True, "2030-06-30"),
            ("L2", "CP1", 100.0, 0.01, 0.45, False, "2030-06-30"),
        ],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, pd double, lgd double, is_revolving boolean, "
        "facility_termination_date string",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "pd", "lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
        "is_revolving", "facility_termination_date",
    )
    out = run_pipeline(
        RawBundle(counterparties=_cps(spark), loans=loans),
        PipelineConfig(pack=B31_PACK, reporting_date="2027-06-30"),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    assert rows["L1"].irb_maturity_m == pytest.approx(1096.0 / 365.0)
    assert rows["L2"].irb_maturity_m == pytest.approx(2.5)


def test_firb_fixed_supervisory_maturity_election(spark):
    # CRR Art.162(1) / Art.143 election: F-IRB rows take the fixed 2.5y
    # regardless of dates; A-IRB rows keep the chain. Direct run_irb call
    # (irb_subapproach is a model-permissions output).
    exp = spark.createDataFrame(
        [
            ("L1", "CP1", "firb"),
            ("L2", "CP1", "airb"),
        ],
        "exposure_reference string, counterparty_reference string, "
        "irb_subapproach string",
    ).selectExpr(
        "*", "'corporate' AS exposure_class", "CAST(2 AS INT) AS cqs",
        "CAST(NULL AS INT) AS g_cqs",
        "true AS has_irb_permission", "false AS is_specialised",
        "false AS is_defaulted", "CAST(0.01 AS DOUBLE) AS pd",
        "CAST(0.45 AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
        "CAST(2.0e8 AS DOUBLE) AS annual_revenue",
        "CAST(100.0 AS DOUBLE) AS drawn_amount",
        "CAST(0.0 AS DOUBLE) AS undrawn_amount",
        "CAST(100.0 AS DOUBLE) AS ead",
        "CAST(100.0 AS DOUBLE) AS ead_after_crm",
    )
    res = run_irb(
        CRMOutput(exposures=exp), CRR_PACK, firb_fixed_maturity=True
    ).results
    rows = {r["exposure_reference"]: r for r in res.collect()}
    assert rows["L1"]["irb_maturity_m"] == pytest.approx(2.5)
    assert rows["L2"]["irb_maturity_m"] == pytest.approx(2.5)
    # the election replaces only the BASE rungs (the reference's date
    # derivation / our revolving rung) — supplied maturities and the
    # one-day carve-out still win, and the engine's base default equals
    # the fixed supervisory value, so the off-switch is value-identical
    res_off = run_irb(CRMOutput(exposures=exp), CRR_PACK).results
    assert {r["irb_maturity_m"] for r in res_off.collect()} == {2.5}


def _gtee_book(spark, gtee_rows, pack):
    loans = spark.createDataFrame(
        [("L1", "CP1", 100.0)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    cps = spark.createDataFrame(
        [("CP1", "corporate", 5, False, 0.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    gtees = spark.createDataFrame(
        gtee_rows,
        "guarantee_reference string, exposure_reference string, "
        "coverage_pct double, guarantor_class string, guarantor_cqs int, "
        "is_unilaterally_cancellable boolean, "
        "is_unilaterally_changeable boolean",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans, guarantees=gtees),
        PipelineConfig(pack=pack),
    )
    return out.results.select(
        "risk_weight", "is_guaranteed", "data_quality_flags"
    ).collect()[0]


def test_ucp_unilateral_cancel_ineligible_both_regimes(spark):
    # a cancellable guarantee is dropped under CRR too: the 150% obligor
    # stays unguaranteed and the row flags CRM012
    r = _gtee_book(
        spark, [("G1", "L1", 0.8, "sovereign", 1, True, None)], CRR_PACK
    )
    assert r["risk_weight"] == pytest.approx(1.5)
    assert not r["is_guaranteed"]
    assert "CRM012:G1" in list(r["data_quality_flags"] or [])


def test_ucp_unilateral_change_arm_is_b31_only(spark):
    # the change arm: eligible under CRR (coverage prices), ineligible
    # under PS1/26
    crr = _gtee_book(
        spark, [("G1", "L1", 0.8, "sovereign", 1, None, True)], CRR_PACK
    )
    assert crr["risk_weight"] == pytest.approx(0.8 * 0.0 + 0.2 * 1.5)
    assert crr["is_guaranteed"]
    b31 = _gtee_book(
        spark, [("G1", "L1", 0.8, "sovereign", 1, None, True)], B31_PACK
    )
    assert not b31["is_guaranteed"]
    assert "CRM012:G1" in list(b31["data_quality_flags"] or [])


def test_ucp_null_flags_are_permissive(spark):
    r = _gtee_book(
        spark, [("G1", "L1", 0.8, "sovereign", 1, None, None)], CRR_PACK
    )
    assert r["is_guaranteed"]
    assert r["risk_weight"] == pytest.approx(0.2 * 1.5)


# --- Art.114 central-bank treatments (ref engine/sa/central_bank.py) -------


def _cb_book(spark, entity, cqs, pack, sovereign_cqs=None):
    cp_cols = [
        "counterparty_reference string", "entity_type string", "cqs int",
        "is_managed_as_retail boolean", "annual_revenue double",
        "has_irb_permission boolean",
    ]
    row = ["CP1", entity, cqs, False, 0.0, False]
    if sovereign_cqs is not None:
        cp_cols.append("sovereign_cqs int")
        row.append(sovereign_cqs)
    cps = spark.createDataFrame([tuple(row)], ", ".join(cp_cols))
    loans = spark.createDataFrame(
        [("L1", "CP1", 100.0)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans), PipelineConfig(pack=pack)
    )
    return out.results.select(
        "exposure_class", "risk_weight", "rw_source", "class_reason"
    ).collect()[0]


def test_central_bank_takes_the_cgcb_ladder(spark):
    # CRR Art.114(2): central banks price on the central-government ladder
    r = _cb_book(spark, "central_bank", 2, CRR_PACK)
    assert r["exposure_class"] == "sovereign"
    assert r["risk_weight"] == pytest.approx(0.2)
    assert r["class_reason"] == "CLS_ENTITY_CENTRAL_BANK"


def test_ecb_unconditional_zero_rw(spark):
    # Art.114(3): the ECB is 0% regardless of rating — a CQS-5 assessment
    # would ladder to 100% but the override wins, in BOTH regimes
    for pack in (CRR_PACK, B31_PACK):
        r = _cb_book(spark, "central_bank_ecb", 5, pack)
        assert r["risk_weight"] == pytest.approx(0.0)
        assert r["rw_source"] == "ecb_art114_3"


def test_b31_central_bank_cqs_read_across(spark):
    # PS1/26 Art.114(2A): an unrated central bank reads across its
    # government's CQS (carrier sovereign_cqs=1 -> 0%); under CRR the
    # same book stays unrated-sovereign (100%)
    b31 = _cb_book(spark, "central_bank", None, B31_PACK, sovereign_cqs=1)
    assert b31["risk_weight"] == pytest.approx(0.0)
    crr = _cb_book(spark, "central_bank", None, CRR_PACK, sovereign_cqs=1)
    assert crr["risk_weight"] == pytest.approx(1.0)
