"""Round-9 cross-approach supporting factors (CRR2 Art.501 / Art.501a; ref
engine/supporting_factors.py SupportingFactorCalculator — the reference
applies it on EVERY branch: sa/factors_output.py, irb/calculator.py:168,
slotting/calculator.py:176):

- The IRB branch now carries the same most-beneficial min(SME, infra)
  factor the SA branch prices, applied post-Vasicek to rwa.
- Art.501(2)(b): defaulted exposures are excluded from the SME factor on
  every branch (the infrastructure factor carries no such exclusion).
- The slotting branch prices the Art.501a 0.75 on infrastructure SL.
- B3.1 disables both factors (pack scalars 1.0).
"""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK


def _row(spark, *, revenue=30e6, infra=False, defaulted=False, irb=True,
         pack=CRR_PACK, sl=None):
    cps = spark.createDataFrame(
        [("CP1", "corporate", 3, False, revenue, irb, infra)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, is_infrastructure boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, defaulted, 0.01, 0.45, 2.5)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, is_defaulted boolean, pd double, lgd double, "
        "effective_maturity double",
    )
    slf = None
    if sl is not None:
        slf = spark.createDataFrame(
            [("CP1", sl)],
            "counterparty_reference string, slot_category string",
        )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans, specialised_lending=slf),
        PipelineConfig(pack=pack),
    )
    return out.results.collect()[0]


def test_irb_sme_factor_applies(spark):
    r = _row(spark, revenue=30e6)
    assert r.approach == "IRB"
    # group drawn 1000 < 2.5m threshold -> pure tier-1 0.7619
    assert r.sme_supporting_factor == pytest.approx(0.7619)
    assert r.rwa == pytest.approx(r.rwa_before_sf * 0.7619)
    assert r.supporting_factor_benefit == pytest.approx(
        r.rwa_before_sf - r.rwa
    )


def test_irb_defaulted_sme_excluded(spark):
    r = _row(spark, revenue=30e6, defaulted=True)
    assert r.sme_supporting_factor == pytest.approx(1.0)


def test_sa_defaulted_sme_excluded(spark):
    r = _row(spark, revenue=30e6, defaulted=True, irb=False)
    assert r.approach == "SA"
    assert r.sme_supporting_factor == pytest.approx(1.0)
    assert r.rwa == pytest.approx(r.rwa_before_sf)


def test_irb_infra_factor_and_most_beneficial_min(spark):
    r = _row(spark, revenue=30e6, infra=True)
    assert r.infra_supporting_factor == pytest.approx(0.75)
    # min(0.7619, 0.75) = 0.75
    assert r.rwa == pytest.approx(r.rwa_before_sf * 0.75)


def test_slotting_infra_factor(spark):
    r = _row(spark, revenue=2.0e8, infra=True, sl="strong")
    assert r.approach == "SLOTTING"
    assert r.rwa == pytest.approx(r.rwa_before_sf * 0.75)


def test_b31_no_factors_on_irb(spark):
    r = _row(spark, revenue=30e6, infra=True, pack=B31_PACK)
    assert r.sme_supporting_factor == pytest.approx(1.0)
    assert r.infra_supporting_factor == pytest.approx(1.0)
    assert r.rwa == pytest.approx(r.rwa_before_sf)
