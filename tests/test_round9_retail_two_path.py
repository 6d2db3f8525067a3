"""Round-9 PS1/26 Art.123A two-path retail qualification (ref
classify/attributes.py _build_qualifies_as_retail_expr):

- Art.123A(1)(a): SME-sized obligors (CRR Art.4(1)(128D)) AUTO-qualify
  under the aggregate threshold with no pool-management attestation.
- Art.123A(1)(b)(iii): non-SMEs need is_managed_as_retail; a NULL flag
  keeps qualification (the reference's documented KEEP default).
- Threshold failure disqualifies everything first.
- CRR keeps the plain Art.123 outcome (candidate AND under-threshold) —
  an unmanaged SME corporate does NOT qualify under CRR.
- The retail CLASS route is unchanged: an auto-qualified unmanaged SME
  stays a corporate (reclassification needs the attestation).
"""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK
from rwa_calculator_spark.engine.stages.classify import run_classify
from rwa_calculator_spark.engine.stages.hierarchy import run_hierarchy


def _row(spark, *, revenue=10e6, managed=None, drawn=1000.0, pack=B31_PACK,
         entity="corporate"):
    cps = spark.createDataFrame(
        [("CP1", entity, 3, managed, revenue, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", drawn)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    h = run_hierarchy(RawBundle(counterparties=cps, loans=loans), pack)
    return run_classify(h, pack).exposures.collect()[0]


def test_b31_sme_auto_qualifies_without_attestation(spark):
    r = _row(spark, revenue=10e6, managed=False)
    assert r.qualifies_as_retail is True  # limb (a): size test alone
    assert r.exposure_class == "corporate"  # class route needs attestation


def test_b31_non_sme_null_attestation_keeps_qualification(spark):
    r = _row(spark, revenue=500e6, managed=None)
    assert r.qualifies_as_retail is True  # null -> KEEP (ref default)
    r2 = _row(spark, revenue=500e6, managed=False)
    assert r2.qualifies_as_retail is False  # explicit False -> limb b(iii)


def test_b31_threshold_fail_disqualifies_sme(spark):
    r = _row(spark, revenue=10e6, managed=True, drawn=2_000_000.0)
    assert r.qualifies_as_retail is False


def test_crr_unmanaged_sme_does_not_qualify(spark):
    r = _row(spark, revenue=10e6, managed=False, pack=CRR_PACK)
    assert r.qualifies_as_retail is False
    assert r.exposure_class == "corporate"
