"""Round-9 PS1/26 Table A1 Row 4(b) + Art.166E(5) CCF overrides (ref
engine/ccf.py _apply_uk_residential_mortgage_ccf /
_apply_purchased_receivable_ccf):

- A UK residential-mortgage commitment takes a fixed 50% CCF unless it
  already sits at the Row 7 UCC 10% or the Row 1/2 100% (carve-out on
  the RESOLVED factor).
- A revolving purchased-receivables purchase commitment routes to the
  Row 5 OC 40% regardless of bucket, dropping to the UCC 10% when
  unconditionally cancellable; non-revolving flags are inert.
- PRA constructs: both are no-ops under CRR (pack has no scalars).
"""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK


def _row(spark, *, bucket="medium_low_risk", resi=False, prc=False,
         revolving=False, pack=B31_PACK):
    cps = spark.createDataFrame(
        [("CP1", "corporate", 2, False, 2.0e8, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, is_defaulted boolean, pd double, lgd double, "
        "effective_maturity double",
    )
    cont = spark.createDataFrame(
        [("K1", "CP1", 1000.0, bucket, resi, prc, revolving)],
        "contingent_reference string, counterparty_reference string, "
        "nominal_amount double, risk_bucket string, "
        "is_uk_residential_mortgage_commitment boolean, "
        "is_purchased_receivable_commitment boolean, is_revolving boolean",
    ).selectExpr(
        "contingent_reference", "counterparty_reference", "nominal_amount",
        "risk_bucket", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
        "is_uk_residential_mortgage_commitment",
        "is_purchased_receivable_commitment", "is_revolving",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans, contingents=cont),
        PipelineConfig(pack=pack),
    )
    return out.results.collect()[0]


def test_resi_commitment_takes_row4b_50pct(spark):
    r = _row(spark, bucket="medium_low_risk", resi=True)
    assert r.ccf == pytest.approx(0.5)
    assert r.ccf_source == "uk_resi_commitment_row4b"


@pytest.mark.parametrize("bucket,keep", [("low_risk", 0.1), ("full_risk", 1.0)])
def test_resi_carve_out_keeps_ucc_and_full(spark, bucket, keep):
    r = _row(spark, bucket=bucket, resi=True)
    assert r.ccf == pytest.approx(keep)
    assert r.ccf_source == "sa_annex_i_bucket"


def test_pr_revolving_routes_40_or_ucc_10(spark):
    r = _row(spark, bucket="medium_risk", prc=True, revolving=True)
    assert r.ccf == pytest.approx(0.4)
    assert r.ccf_source == "pr_revolving_art166e5"
    ucc = _row(spark, bucket="low_risk", prc=True, revolving=True)
    assert ucc.ccf == pytest.approx(0.1)
    assert ucc.ccf_source == "pr_revolving_art166e5"


def test_pr_non_revolving_inert_and_crr_noop(spark):
    r = _row(spark, bucket="medium_risk", prc=True, revolving=False)
    assert r.ccf == pytest.approx(0.5)
    assert r.ccf_source == "sa_annex_i_bucket"
    crr = _row(spark, bucket="medium_risk", resi=True, prc=True,
               revolving=True, pack=CRR_PACK)
    assert crr.ccf == pytest.approx(0.5)  # CRR Annex I MR, overrides absent
    assert crr.ccf_source == "sa_annex_i_bucket"
