"""Round-9 Art.161(1)(e)/(f)/(g) purchased-receivables F-IRB supervisory
LGDs + the routed null-LGD fallback (ref engine/irb/transforms.py
apply_firb_lgd + rulebook/packs firb_supervisory_lgd):

- Rows with no own LGD take the seniority-routed supervisory value:
  senior 45% CRR / 40% B3.1 non-FSE (Art.161(1)(aa)) / 45% B3.1 FSE,
  subordinated 75% both regimes.
- A declared purchased_receivables_subtype OVERRIDES seniority routing:
  senior receivables 45%/40%, subordinated receivables 100% (both — NOT
  the plain 75%), dilution risk 75% CRR / 100% B3.1.
- The sub-type rates bind whenever the row has no own LGD (the reference
  records that gating them on approach==FIRB was anti-conservative).
"""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK


def _row(spark, *, pack=CRR_PACK, seniority="senior", subtype=None,
         fse=False, lgd=None):
    cps = spark.createDataFrame(
        [("CP1", "corporate", 3, False, 2.0e8, True, fse)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, is_financial_sector_entity boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, 0.01, lgd, 2.5, seniority, subtype)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, pd double, lgd double, "
        "effective_maturity double, seniority string, "
        "purchased_receivables_subtype string",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "pd", "lgd", "effective_maturity",
        "seniority", "purchased_receivables_subtype",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(pack=pack),
    )
    return out.results.collect()[0]


@pytest.mark.parametrize(
    "pack,subtype,expect",
    [
        (CRR_PACK, "senior", 0.45),
        (CRR_PACK, "subordinated", 1.00),
        (CRR_PACK, "dilution_risk", 0.75),
        (B31_PACK, "senior", 0.40),
        (B31_PACK, "subordinated", 1.00),
        (B31_PACK, "dilution_risk", 1.00),
    ],
)
def test_pr_subtype_lgd_rates(spark, pack, subtype, expect):
    r = _row(spark, pack=pack, subtype=subtype)
    assert r.irb_lgd_floored == pytest.approx(expect)


def test_pr_subtype_overrides_seniority(spark):
    # a SENIOR instrument with a subordinated-receivables subtype takes
    # 100%, not the 45% seniority rate — subtype dispatch wins
    r = _row(spark, seniority="senior", subtype="subordinated")
    assert r.irb_lgd_floored == pytest.approx(1.00)


def test_b31_fse_senior_lgd_split(spark):
    # PS1/26 Art.161(1)(a)/(aa): FSE senior unsecured 45%, non-FSE 40%
    non_fse = _row(spark, pack=B31_PACK)
    fse = _row(spark, pack=B31_PACK, fse=True)
    assert non_fse.irb_lgd_floored == pytest.approx(0.40)
    assert fse.irb_lgd_floored == pytest.approx(0.45)


def test_seniority_fallback_and_own_lgd_kept(spark):
    sub = _row(spark, seniority="subordinated")
    assert sub.irb_lgd_floored == pytest.approx(0.75)
    own = _row(spark, subtype="dilution_risk", lgd=0.33)
    # an own LGD estimate survives — the supervisory rates fill nulls only
    assert own.irb_lgd_floored == pytest.approx(0.33)
