"""Round-7 IRB multi-guarantee stacking (closes the rank-1 narrowing;
ref engine/irb/guarantee.py multi-leg waterfall re-expressed on-row):
every priority-ordered guarantee leg prices through its own channel on
the IRB branch — SA RW substitution from the ladder, parameter
substitution through the full Vasicek kernel with the guarantor's
floored PD + Art.161(1) supervisory LGD, per-leg Art.193(1)
neutral-or-beneficial semantics — and the EL follows each leg's channel.
Expectations derived with stdlib ``statistics.NormalDist`` (independent
of the engine's Cody/Acklam kernels)."""

from __future__ import annotations

import math
from statistics import NormalDist

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK

_N = NormalDist()


def _vasicek_rw(pd: float, lgd: float, m: float = 2.5, scaling: float = 1.06) -> float:
    w = (1.0 - math.exp(-50.0 * pd)) / (1.0 - math.exp(-50.0))
    r = 0.12 * w + 0.24 * (1.0 - w)
    k = (
        lgd
        * _N.cdf(
            (_N.inv_cdf(pd) + math.sqrt(r) * _N.inv_cdf(0.999)) / math.sqrt(1.0 - r)
        )
        - pd * lgd
    )
    b = (0.11852 - 0.05478 * math.log(pd)) ** 2
    ma = (1.0 + (m - 2.5) * b) / (1.0 - 1.5 * b)
    return k * ma * 12.5 * scaling


_OWN = _vasicek_rw(0.01, 0.45)  # the obligor: PD 1%, LGD 45%, M 2.5


def _run(spark, gtee_rows):
    cps = spark.createDataFrame(
        [("CP1", "corporate", 3, False, 2.0e8, True)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 100.0, 0.01, 0.45, 2.5)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, pd double, lgd double, "
        "effective_maturity double",
    ).selectExpr("*", "false AS is_defaulted")
    gtees = spark.createDataFrame(
        gtee_rows,
        "guarantee_reference string, exposure_reference string, "
        "coverage_pct double, guarantor_class string, guarantor_cqs int, "
        "guarantor_reference string, guarantor_pd double, "
        "guarantor_seniority string",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans, guarantees=gtees),
        PipelineConfig(pack=CRR_PACK),
    )
    return out.results.select(
        "risk_weight", "expected_loss", "guaranteed_portion",
        "unguaranteed_portion", "guarantee_benefit_rw",
        "guarantee_references", "guarantee_status", "rw_source", "rwa",
    ).collect()[0]


def test_irb_two_sa_guarantors_stack(spark):
    # institution CQS2 (50%) claims 0.5 first, sovereign CQS1 (0%) 0.3;
    # the uncovered 0.2 stays at the obligor's Vasicek weight
    r = _run(
        spark,
        [
            ("G1", "L1", 0.3, "sovereign", 1, "GA", None, None),
            ("G2", "L1", 0.5, "institution", 2, "GB", None, None),
        ],
    )
    assert r["risk_weight"] == pytest.approx(
        0.5 * min(_OWN, 0.5) + 0.3 * 0.0 + 0.2 * _OWN, rel=1e-9
    )
    assert list(r["guarantee_references"]) == ["G2", "G1"]
    assert r["guaranteed_portion"] == pytest.approx(80.0)
    assert r["unguaranteed_portion"] == pytest.approx(20.0)
    # SA-substituted slices drop their EL; the uncovered slice keeps
    # the obligor rate
    assert r["expected_loss"] == pytest.approx(0.2 * 0.01 * 0.45 * 100.0, rel=1e-9)
    assert r["rw_source"].endswith("+gmulti")


def test_irb_modelled_plus_sa_leg(spark):
    # leg 1: parameter substitution (guarantor PD 0.2%, senior FIRB LGD
    # 0.45); leg 2: sovereign SA substitution at 0%
    rw_g = _vasicek_rw(0.002, 0.45)
    r = _run(
        spark,
        [
            ("G1", "L1", 0.5, "institution", 2, "GB", 0.002, "senior"),
            ("G2", "L1", 0.3, "sovereign", 1, "GA", None, None),
        ],
    )
    assert r["risk_weight"] == pytest.approx(
        0.5 * min(_OWN, rw_g) + 0.3 * 0.0 + 0.2 * _OWN, rel=1e-9
    )
    # PD-substituted slice re-prices EL at PD_g·LGD_g
    assert r["expected_loss"] == pytest.approx(
        (0.5 * 0.002 * 0.45 + 0.2 * 0.01 * 0.45) * 100.0, rel=1e-9
    )
    assert r["guarantee_benefit_rw"] == pytest.approx(
        _OWN - r["risk_weight"], rel=1e-9
    )


def test_irb_subordinated_guarantor_lgd(spark):
    # a subordinated modelled guarantor takes the Art.161(1) 75% LGD
    rw_g = _vasicek_rw(0.001, 0.75)
    r = _run(
        spark,
        [
            ("G1", "L1", 0.6, "corporate", 2, "GX", 0.001, "subordinated"),
            ("G2", "L1", 0.2, "sovereign", 1, "GA", None, None),
        ],
    )
    assert rw_g < _OWN  # the leg is beneficial in this scenario
    assert r["risk_weight"] == pytest.approx(
        0.6 * rw_g + 0.2 * 0.0 + 0.2 * _OWN, rel=1e-9
    )
    assert r["expected_loss"] == pytest.approx(
        (0.6 * 0.001 * 0.75 + 0.2 * 0.01 * 0.45) * 100.0, rel=1e-9
    )


def test_irb_non_beneficial_leg_is_neutral(spark):
    # a worse modelled guarantor (PD 20%, subordinated) prices above the
    # obligor — its slice stays at the OWN weight and keeps the obligor
    # EL rate (per-leg Art.193(1) decline, not a cap)
    assert _vasicek_rw(0.20, 0.75) > _OWN
    r = _run(
        spark,
        [
            ("G1", "L1", 0.5, "corporate", 5, "GX", 0.20, "subordinated"),
            ("G2", "L1", 0.3, "sovereign", 1, "GA", None, None),
        ],
    )
    assert r["risk_weight"] == pytest.approx(0.7 * _OWN, rel=1e-9)
    assert r["expected_loss"] == pytest.approx(
        (0.5 * 0.01 * 0.45 + 0.2 * 0.01 * 0.45) * 100.0, rel=1e-9
    )
    assert r["guaranteed_portion"] == pytest.approx(80.0)


def test_irb_single_guarantee_keeps_legacy_blend(spark):
    # n=1 books keep the legacy rank-1 expressions bit-for-bit (the
    # 169 oracled queries pin this too — local fast pin): the blend is
    # (1−g)·own + g·grw, EL = (1−g)·el_own + PD_g·LGD_g·g·EAD
    rw_g = _vasicek_rw(0.002, 0.45)
    r = _run(
        spark,
        [("G1", "L1", 0.5, "institution", 2, "GB", 0.002, "senior")],
    )
    assert r["risk_weight"] == pytest.approx(
        0.5 * _OWN + 0.5 * rw_g, rel=1e-9
    )
    assert r["expected_loss"] == pytest.approx(
        (0.5 * 0.01 * 0.45 + 0.002 * 0.45 * 0.5) * 100.0, rel=1e-9
    )
    assert not r["rw_source"].endswith("+gmulti")
    assert r["guarantee_status"] == "PD_PARAMETER_SUBSTITUTION"


def test_irb_double_default_inside_the_stack(spark):
    # per-leg CRR Art.153(3) double default: an A-IRB corporate exposure
    # with a modelled institution guarantor (DD-eligible) stacked over a
    # sovereign SA leg — the institution leg prices min(parameter
    # substitution, RW_own·(0.15+160·PD_g)) and the DD leg retains the
    # FULL obligor EL rate on its slice. Direct run_irb call with the crm
    # stack struct (irb_subapproach is a model-permissions output).
    from rwa_calculator_spark.engine.bundles import CRMOutput
    from rwa_calculator_spark.engine.stages.calculators import run_irb

    exp = spark.createDataFrame(
        [("L1", "CP1")],
        "exposure_reference string, counterparty_reference string",
    ).selectExpr(
        "*",
        "'corporate' AS exposure_class",
        "CAST(2 AS INT) AS cqs",
        "'airb' AS irb_subapproach",
        "true AS has_irb_permission",
        "false AS is_specialised",
        "false AS is_defaulted",
        "CAST(0.01 AS DOUBLE) AS pd",
        "CAST(0.45 AS DOUBLE) AS lgd",
        "CAST(2.5 AS DOUBLE) AS effective_maturity",
        "CAST(2.0e8 AS DOUBLE) AS annual_revenue",
        "CAST(100.0 AS DOUBLE) AS drawn_amount",
        "CAST(0.0 AS DOUBLE) AS undrawn_amount",
        "CAST(100.0 AS DOUBLE) AS ead",
        "CAST(100.0 AS DOUBLE) AS ead_after_crm",
        # rank-1 scalars mirror the priority-1 (institution) leg
        "CAST(0.5 AS DOUBLE) AS g_coverage",
        "'institution' AS g_class",
        "CAST(1 AS INT) AS g_cqs",
        "CAST(0.002 AS DOUBLE) AS guarantor_pd",
        "'senior' AS guarantor_seniority",
        "array("
        " named_struct('slice', CAST(0.5 AS DOUBLE), 'rw', CAST(0.2 AS DOUBLE),"
        "   'pd', CAST(0.002 AS DOUBLE), 'sen', 'senior',"
        "   'fse', CAST(NULL AS BOOLEAN), 'gclass', 'institution',"
        "   'gcqs', CAST(1 AS INT)),"
        " named_struct('slice', CAST(0.3 AS DOUBLE), 'rw', CAST(0.0 AS DOUBLE),"
        "   'pd', CAST(NULL AS DOUBLE), 'sen', CAST(NULL AS STRING),"
        "   'fse', CAST(NULL AS BOOLEAN), 'gclass', 'sovereign',"
        "   'gcqs', CAST(1 AS INT))"
        ") AS _mg",
    )
    r = run_irb(CRMOutput(exposures=exp), CRR_PACK).results.collect()[0]
    own = _vasicek_rw(0.01, 0.45)
    rw_sub = _vasicek_rw(0.002, 0.45)
    rw_dd = own * (0.15 + 160.0 * 0.002)
    leg1 = min(own, min(rw_sub, rw_dd))
    assert r["risk_weight"] == pytest.approx(
        0.5 * leg1 + 0.3 * 0.0 + 0.2 * own, rel=1e-9
    )
    # DD retains the obligor EL on its slice; the SA slice drops EL
    dd_applies = rw_dd < rw_sub
    leg1_el = 0.5 * (0.01 * 0.45 if dd_applies else 0.002 * 0.45)
    assert r["expected_loss"] == pytest.approx(
        (leg1_el + 0.2 * 0.01 * 0.45) * 100.0, rel=1e-9
    )
