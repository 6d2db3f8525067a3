"""Round-9 CRR Art.306(1) / Art.107(2)(a) CCP treatment (ref
engine/ccr/ccp.py apply_ccp_risk_weight + engine/sa/cqs_lift.py):

- A CCP counterparty classifies onto the institution ladder
  (Art.107(2)(a) demotion).
- Qualifying CCP: clearing-member trades 2% (Art.306(1)(a)),
  client-cleared trades 4% (Art.306(1)(c)).
- Non-qualifying CCP: keeps the institution CQS weight.
"""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK


def _row(spark, *, qccp, cleared=False, cqs=2):
    cps = spark.createDataFrame(
        [("CP1", "ccp", cqs, False, 0.0, False, qccp)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, is_qccp boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, cleared)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, is_client_cleared boolean",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity", "is_client_cleared",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(pack=CRR_PACK),
    )
    return out.results.collect()[0]


def test_qccp_member_trade_2pct(spark):
    r = _row(spark, qccp=True)
    assert r.exposure_class == "institution"
    assert r.class_reason == "CLS_ENTITY_CCP_ART107"
    assert r.risk_weight == pytest.approx(0.02)
    assert r.rw_source == "sa_qccp_trade_art306_1a"


def test_qccp_client_cleared_4pct(spark):
    r = _row(spark, qccp=True, cleared=True)
    assert r.risk_weight == pytest.approx(0.04)
    assert r.rw_source == "sa_qccp_client_cleared_art306_1c"


def test_non_qccp_keeps_institution_ladder(spark):
    r = _row(spark, qccp=False, cqs=2)
    assert r.exposure_class == "institution"
    assert r.risk_weight == pytest.approx(0.5)  # CRR institution CQS2
    assert r.rw_source == "sa_cqs_lookup"
