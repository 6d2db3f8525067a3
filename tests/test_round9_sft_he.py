"""Round-9 CRR Art.223(5) exposure-side volatility haircut HE on the SFT
FCCM (ref engine/crm/haircuts.py apply_exposure_haircut): lent SECURITIES
inflate the exposure leg by the Art.224 Table 1 haircut scaled to the
5-day SFT liquidation period (Art.226(2) H5 = H10*sqrt(5/10)); cash lent
and legacy books without the security columns keep HE = 0.
"""

from __future__ import annotations

import math

import pytest

from rwa_calculator_spark.engine.rulepack import CRR_PACK
from rwa_calculator_spark.engine.stages.ccr_sft import sft_exposures

_SCHEMA = (
    "netting_set_reference string, counterparty_reference string, "
    "leg string, value double, haircut double, security_type string, "
    "security_cqs int, security_residual_maturity_years double"
)


def _ead(spark, rows, schema=_SCHEMA):
    out = sft_exposures(spark.createDataFrame(rows, schema), CRR_PACK)
    return {r.exposure_reference: r.drawn_amount for r in out.collect()}


def test_lent_bond_inflates_by_scaled_haircut(spark):
    # govt CQS1, 3y -> 1_5y band 0.02; HE = 0.02*sqrt(0.5)
    ead = _ead(spark, [
        ("NS1", "CP1", "lent", 1000.0, 0.0, "govt_bond", 1, 3.0),
        ("NS1", "CP1", "collateral", 400.0, 0.05, None, None, None),
    ])
    he = 0.02 * math.sqrt(0.5)
    # engine cents-rounds each leg sum before netting
    lent = round(1000.0 * (1 + he), 2)
    assert ead["NS1_SFT"] == pytest.approx(lent - 400.0 * 0.95)


def test_cash_lent_keeps_zero_he(spark):
    ead = _ead(spark, [
        ("NS1", "CP1", "lent", 1000.0, 0.0, None, None, 3.0),
        ("NS1", "CP1", "collateral", 400.0, 0.0, None, None, None),
    ])
    assert ead["NS1_SFT"] == pytest.approx(600.0)


def test_legacy_shape_without_columns_unchanged(spark):
    ead = _ead(
        spark,
        [("NS1", "CP1", "lent", 1000.0, 0.0),
         ("NS1", "CP1", "collateral", 250.0, 0.04)],
        "netting_set_reference string, counterparty_reference string, "
        "leg string, value double, haircut double",
    )
    assert ead["NS1_SFT"] == pytest.approx(1000.0 - 250.0 * 0.96)
