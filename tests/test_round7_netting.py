"""Round-7 CRR Art.195/219 on-balance-sheet netting + ledger identity
long tail (ref engine/crm/collateral.py:170 generate_netting_collateral,
processor.py:445 _join_netting_amounts; CALCULATION_OUTPUT_SCHEMA
data/schemas.py:2881-2961)."""

from __future__ import annotations

import pytest

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
    """rows: (ref, cp, drawn, netting_agreement, currency, maturity)."""
    return spark.createDataFrame(
        rows,
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, netting_agreement_reference string, "
        "currency string, effective_maturity double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
    )


def _run(spark, loans, cps=None):
    out = run_pipeline(
        RawBundle(counterparties=cps if cps is not None else _cps(spark), loans=loans),
        PipelineConfig(pack=CRR_PACK),
    )
    return {
        r["exposure_reference"]: r
        for r in out.results.select(
            "exposure_reference", "ead", "on_bs_netting_amount",
            "collateral_value", "collateral_cash_value", "haircut_fx",
            "haircut_maturity_mismatch", "ead_after_crm",
            "data_quality_flags",
        ).collect()
    }


def test_netting_pro_rata_same_counterparty(spark):
    # deposit 40 nets loans 60/140 pro-rata (12/28); same ccy + maturity
    rows = _run(
        spark,
        _loans(
            spark,
            [
                ("D1", "CP1", -40.0, "NA1", "GBP", 2.5),
                ("L1", "CP1", 60.0, "NA1", "GBP", 2.5),
                ("L2", "CP1", 140.0, "NA1", "GBP", 2.5),
            ],
        ),
    )
    assert rows["D1"]["ead"] == 0.0 and rows["D1"]["ead_after_crm"] == 0.0
    assert rows["L1"]["on_bs_netting_amount"] == pytest.approx(12.0)
    assert rows["L2"]["on_bs_netting_amount"] == pytest.approx(28.0)
    assert rows["L1"]["ead_after_crm"] == pytest.approx(48.0)
    assert rows["L2"]["ead_after_crm"] == pytest.approx(112.0)


def test_netting_requires_shared_agreement_and_counterparty(spark):
    # same cp, different agreement -> no offset; cross-cp agreement ->
    # no offset AND a CRM016 flag on the agreement's rows (Art.195
    # mutual-claims boundary)
    rows = _run(
        spark,
        _loans(
            spark,
            [
                ("D1", "CP1", -40.0, "NA1", "GBP", 2.5),
                ("L1", "CP1", 60.0, "NA2", "GBP", 2.5),
                ("D2", "CP2", -30.0, "NA3", "GBP", 2.5),
                ("L2", "CP3", 80.0, "NA3", "GBP", 2.5),
            ],
        ),
        cps=_cps(spark, ("CP1", "CP2", "CP3")),
    )
    assert rows["L1"]["on_bs_netting_amount"] == 0.0
    assert rows["L1"]["ead_after_crm"] == pytest.approx(60.0)
    assert rows["L2"]["on_bs_netting_amount"] == 0.0
    flags = list(rows["L2"]["data_quality_flags"])
    assert any(f.startswith("CRM016") for f in flags)
    assert any(
        f.startswith("CRM016") for f in rows["D2"]["data_quality_flags"]
    )
    assert not list(rows["L1"]["data_quality_flags"])


def test_netting_fx_and_maturity_mismatch_haircuts(spark):
    # USD deposit vs GBP loan: 8% FX haircut; deposit residual 1.0y vs
    # loan 2.0y: Art.238 factor (1.0-0.25)/(2.0-0.25); a 0.2y deposit
    # zeroes entirely (Art.237(1))
    rows = _run(
        spark,
        _loans(
            spark,
            [
                ("D1", "CP1", -100.0, "NA1", "USD", 1.0),
                ("L1", "CP1", 100.0, "NA1", "GBP", 2.0),
                ("D2", "CP2", -50.0, "NA2", "GBP", 0.2),
                ("L2", "CP2", 80.0, "NA2", "GBP", 2.0),
            ],
        ),
        cps=_cps(spark, ("CP1", "CP2")),
    )
    exp_adj = 100.0 * 0.92 * (0.75 / 1.75)
    assert rows["L1"]["on_bs_netting_amount"] == pytest.approx(100.0)
    assert rows["L1"]["collateral_value"] == pytest.approx(exp_adj, abs=0.01)
    assert rows["L1"]["haircut_fx"] == pytest.approx(8.0)
    assert rows["L1"]["ead_after_crm"] == pytest.approx(100.0 - exp_adj, abs=0.01)
    # short deposit: allocated but fully haircut away by the 0.25y gate
    assert rows["L2"]["on_bs_netting_amount"] == pytest.approx(50.0)
    assert rows["L2"]["collateral_value"] == pytest.approx(0.0)
    assert rows["L2"]["ead_after_crm"] == pytest.approx(80.0)


def test_netting_absent_column_zero_fill(spark):
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=spark.createDataFrame(
                [("L1", "CP1", 100.0)],
                "loan_reference string, counterparty_reference string, "
                "drawn_amount double",
            ).selectExpr(
                "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
                "CAST(NULL AS DOUBLE) AS lgd",
                "CAST(NULL AS DOUBLE) AS effective_maturity",
            ),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    r = out.results.select(
        "on_bs_netting_amount", "netting_agreement_reference"
    ).collect()[0]
    assert r["on_bs_netting_amount"] == 0.0
    assert r["netting_agreement_reference"] is None


def test_identity_long_tail_and_run_stamp(spark):
    loans = spark.createDataFrame(
        [("L1", "CP1", 100.0, "BOOK_A", 0.5, 1.25)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, book_code string, ava_amount double, "
        "other_own_funds_reductions double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(0.01 AS DOUBLE) AS pd",
        "CAST(0.4 AS DOUBLE) AS lgd", "CAST(2.5 AS DOUBLE) AS effective_maturity",
    )
    cps = spark.createDataFrame(
        [("CP1", "corporate", 2, False, 0.0, True)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(
            pack=CRR_PACK, run_id="run_test", run_timestamp="2026-08-15T12:00:00"
        ),
    )
    r = out.results.collect()[0]
    assert r["calculation_run_id"] == "run_test"
    assert r["calculation_timestamp"] is not None
    assert r["book_code"] == "BOOK_A"
    assert r["parent_exposure_reference"] == "L1"
    assert r["approach_permitted"] == "AIRB"
    assert r["approach"] == "IRB"
    assert r["ava_amount"] == 0.5
    assert r["other_own_funds_reductions"] == 1.25
    # Art.159(1)(c)/(d): the Pool-B extras reduce the EL shortfall
    assert r["el_shortfall"] == pytest.approx(
        max(r["expected_loss"] - 1.75, 0.0), abs=1e-9
    )
    assert r["guarantor_references"] is None


def test_sa_decision_strings(spark):
    # external rating channel names the agency; unrated corporates cite
    # Art.122(2); the defaulted branch cites Art.127
    cps = spark.createDataFrame(
        [
            ("CP1", "corporate", 5, False, 0.0, False),
            ("CP2", "corporate", None, False, 0.0, False),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [
            ("L1", "CP1", 100.0, False),
            ("L2", "CP2", 100.0, False),
            ("L3", "CP2", 100.0, True),
        ],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, is_defaulted boolean",
    ).selectExpr(
        "*", "CAST(NULL AS DOUBLE) AS pd", "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    ratings = spark.createDataFrame(
        [("CP1", "external", False, "AgencyA", "2025-01-01", "R1", 3, None)],
        "counterparty_reference string, rating_type string, "
        "is_short_term boolean, rating_agency string, rating_date string, "
        "rating_reference string, cqs int, pd double",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans, ratings=ratings),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {
        r["exposure_reference"]: r
        for r in out.results.select(
            "exposure_reference", "sa_rating_source", "sa_rw_regulatory_ref",
            "external_cqs", "sa_cqs",
        ).collect()
    }
    assert rows["L1"]["sa_rating_source"] == "AgencyA"
    assert rows["L1"]["external_cqs"] == 3
    assert rows["L1"]["sa_rw_regulatory_ref"] == "CRR Art.122"
    # CP2 has no external rating; the ratings channel REPLACES the
    # supplied mapping, so the row prices unrated (Art.122(2))
    assert rows["L2"]["sa_rating_source"] is None
    assert rows["L2"]["sa_rw_regulatory_ref"] == "CRR Art.122(2)"
    assert rows["L3"]["sa_rw_regulatory_ref"] == "CRR Art.127(1)"


def _gtees(spark, rows):
    """rows: (guarantee_ref, exposure_ref, coverage, class, cqs, guarantor)."""
    return spark.createDataFrame(
        rows,
        "guarantee_reference string, exposure_reference string, "
        "coverage_pct double, guarantor_class string, guarantor_cqs int, "
        "guarantor_reference string",
    )


def _run_gtee(spark, gtees, cqs=5):
    cps = spark.createDataFrame(
        [("CP1", "corporate", cqs, False, 0.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
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
        RawBundle(counterparties=cps, loans=loans, guarantees=gtees),
        PipelineConfig(pack=CRR_PACK),
    )
    return out.results.select(
        "risk_weight", "guaranteed_portion", "unguaranteed_portion",
        "guarantee_references", "guarantor_references", "guarantee_benefit_rw",
        "guarantor_risk_weight", "rw_source", "rwa",
    ).collect()[0]


def test_multi_guarantee_stacks_by_priority(spark):
    # own 150% (corporate cqs5); institution cqs2 (50%) covers 0.7 first
    # (higher coverage), sovereign cqs1 (0%) claims the remaining 0.3:
    # rw = 0.7*0.5 + 0.3*0.0 + 0*1.5 = 0.35
    r = _run_gtee(
        spark,
        _gtees(
            spark,
            [
                ("G1", "L1", 0.6, "sovereign", 1, "GA"),
                ("G2", "L1", 0.7, "institution", 2, "GB"),
            ],
        ),
    )
    assert r["risk_weight"] == pytest.approx(0.35)
    assert r["guaranteed_portion"] == pytest.approx(100.0)
    assert r["unguaranteed_portion"] == pytest.approx(0.0)
    assert list(r["guarantee_references"]) == ["G2", "G1"]
    assert list(r["guarantor_references"]) == ["GB", "GA"]
    assert r["guarantee_benefit_rw"] == pytest.approx(1.15)
    # rank-1 carriers stay the dominant guarantee's
    assert r["guarantor_risk_weight"] == pytest.approx(0.5)
    assert r["rw_source"].endswith("+guarantee")
    assert r["rwa"] == pytest.approx(35.0)


def test_multi_guarantee_cap_and_worse_guarantor_neutral(spark):
    # corporate cqs3 guarantor (100%) under a 150% obligor still helps;
    # a 150%-equal guarantor slice is neutral (least semantics); total
    # coverage caps at 100% so the third guarantee adds nothing
    r = _run_gtee(
        spark,
        _gtees(
            spark,
            [
                ("G1", "L1", 0.8, "corporate", 3, "GA"),   # rw 1.0
                ("G2", "L1", 0.5, "corporate", 5, "GB"),   # rw 1.5 neutral
                ("G3", "L1", 0.4, "sovereign", 1, "GC"),   # crowded out
            ],
        ),
    )
    # slices: G1 0.8 (rw 1.0), G2 0.2 (rw 1.5 -> neutral at own), G3 0.0
    assert r["risk_weight"] == pytest.approx(0.8 * 1.0 + 0.2 * 1.5)
    assert r["guarantee_benefit_rw"] == pytest.approx(0.8 * 0.5)
    assert list(r["guarantee_references"]) == ["G1", "G2", "G3"]


def test_single_guarantee_unchanged_by_stacking_machinery(spark):
    # the legacy single-guarantee path must price identically (the 169
    # oracled queries pin this too — this is the local fast pin)
    r = _run_gtee(
        spark, _gtees(spark, [("G1", "L1", 0.6, "sovereign", 1, "GA")])
    )
    assert r["risk_weight"] == pytest.approx(0.6 * 0.0 + 0.4 * 1.5)
    assert r["guaranteed_portion"] == pytest.approx(60.0)
    assert list(r["guarantee_references"]) == ["G1"]
    assert r["guarantee_benefit_rw"] == pytest.approx(0.6 * 1.5)
