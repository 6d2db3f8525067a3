"""Round-9 CRR Art.235(3) + Art.114(4)/(7) domestic CGCB-guarantor 0%
extension (ref engine/sa/rw_adjustments.py _build_domestic_guarantor_expr):

- A central-government guarantee from an EU member state, denominated AND
  funded in that state's domestic currency, extends the sovereign 0% to
  the covered portion — bypassing the guarantor's own CQS weight.
- Denomination falls back to the exposure currency when the guarantee
  declares none; the funding limb is null-PERMISSIVE.
- A USD-funded (or USD-denominated) guarantee falls back to the
  guarantor's CQS ladder weight.
"""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK


def _row(spark, *, g_country="DE", g_ccy="EUR", funding=None):
    cps = spark.createDataFrame(
        [("CP1", "corporate", 3, False, 0.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, funding)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, funding_currency string",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity", "funding_currency",
    )
    gtees = spark.createDataFrame(
        [("G1", "L1", 0.5, "sovereign", 3, g_country, g_ccy)],
        "guarantee_reference string, exposure_reference string, "
        "coverage_pct double, guarantor_class string, guarantor_cqs int, "
        "guarantor_country_code string, guarantee_currency string",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans, guarantees=gtees),
        PipelineConfig(pack=CRR_PACK),
    )
    return out.results.collect()[0]


def test_domestic_guarantee_extends_zero_rw(spark):
    # corporate CQS3 own RW 1.0; sovereign CQS3 guarantor would be 0.5 —
    # the domestic EUR/DE match takes the covered half to 0%
    r = _row(spark)
    assert r.risk_weight == pytest.approx(0.5 * 1.0 + 0.5 * 0.0)


def test_non_domestic_currency_keeps_guarantor_cqs(spark):
    r = _row(spark, g_ccy="USD")
    assert r.risk_weight == pytest.approx(0.5 * 1.0 + 0.5 * 0.5)


def test_foreign_funding_blocks_extension(spark):
    # Art.235(3): funded in USD -> the 0% extension is lost even though
    # the guarantee itself is EUR-denominated
    r = _row(spark, funding="USD")
    assert r.risk_weight == pytest.approx(0.5 * 1.0 + 0.5 * 0.5)


def test_non_eu_guarantor_unaffected(spark):
    r = _row(spark, g_country="US", g_ccy="USD")
    assert r.risk_weight == pytest.approx(0.5 * 1.0 + 0.5 * 0.5)
