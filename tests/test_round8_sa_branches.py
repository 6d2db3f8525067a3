"""Round-8 SA branch family: Art.127 defaulted provision test, B3.1 retail
transactor/payroll, IG assessment, corporate SME, short-term institution /
corporate ECAI tables, and the regime-split SA ladders (ref
engine/sa/risk_weights.py + b31_risk_weight_tables.py + rulebook/packs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK


def _cps(spark, rows):
    """(ref, entity, cqs, revenue) plus optional carrier columns via dict."""
    return spark.createDataFrame(
        rows,
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )


def _loans(spark, rows, schema_extra=""):
    base = (
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, is_defaulted boolean"
    )
    return spark.createDataFrame(rows, base + schema_extra).selectExpr(
        "*", "CAST(NULL AS DOUBLE) AS pd", "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )


def _prov(spark, rows):
    return spark.createDataFrame(
        rows,
        "beneficiary_reference string, beneficiary_type string, "
        "amount double, provision_type string, provision_reference string",
    )


def _rw(out):
    return {r.exposure_reference: (r.risk_weight, r.rw_source)
            for r in out.results.collect()}


def test_crr_defaulted_provision_split(spark):
    # 30% provisioned -> 100%; 10% -> 150%; none -> 150%. CRR denominator
    # is the pre-provision exposure value (EAD + deducted provision).
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark, [("CP1", "corporate", 3, False, 0.0, False)]),
            loans=_loans(
                spark,
                [("LH", "CP1", 1000.0, True), ("LL", "CP1", 1000.0, True),
                 ("LN", "CP1", 1000.0, True), ("LP", "CP1", 1000.0, False)],
            ),
            provisions=_prov(
                spark,
                [("LH", "exposure", 300.0, "scra", "P1"),
                 ("LL", "exposure", 100.0, "scra", "P2")],
            ),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rws = _rw(out)
    assert rws["LH"] == (1.0, "sa_defaulted_high_provision")
    assert rws["LL"] == (1.5, "sa_defaulted")
    assert rws["LN"] == (1.5, "sa_defaulted")
    assert rws["LP"] == (1.0, "sa_cqs_lookup")  # CRR corporate CQS3 100%


def test_b31_defaulted_denominator_is_gross_outstanding(spark):
    # B3.1 measures the 20% against gross outstanding: 250 provisions on a
    # 1000 drawn = 25% >= 20% -> 100% even though EAD fell to 750
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark, [("CP1", "corporate", 0, False, 0.0, False)]),
            loans=_loans(spark, [("L1", "CP1", 1000.0, True)]),
            provisions=_prov(spark, [("L1", "exposure", 250.0, "scra", "P1")]),
        ),
        PipelineConfig(pack=B31_PACK),
    )
    assert _rw(out)["L1"] == (1.0, "sa_defaulted_high_provision")


def test_b31_defaulted_resi_re_non_income_flat(spark):
    # general (non-income) resi RE default stays flat 100% regardless of
    # provisions; an income-producing twin joins the provision test (150%)
    loans = spark.createDataFrame(
        [("LG", "CP1", 1000.0, True, True, False, 0.5),
         ("LI", "CP1", 1000.0, True, True, True, 0.5)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, is_defaulted boolean, "
        "is_property_secured boolean, is_income_producing boolean, ltv double",
    ).selectExpr(
        "*", "CAST(NULL AS DOUBLE) AS pd", "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark, [("CP1", "individual", 0, False, 0.0, False)]),
            loans=loans,
        ),
        PipelineConfig(pack=B31_PACK),
    )
    rws = _rw(out)
    assert rws["LG"] == (1.0, "sa_defaulted_secured")
    assert rws["LI"] == (1.5, "sa_defaulted")


def _branch_book(spark, cps_extra, loans_extra, pack, **cfg):
    cps = spark.createDataFrame(*cps_extra)
    loans = spark.createDataFrame(*loans_extra).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    return run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(pack=pack, **cfg),
    )


def test_b31_retail_transactor_beats_payroll(spark):
    out = _branch_book(
        spark,
        (
            [("CP1", "individual", 0, False, 0.0, False, True),
             ("CP2", "individual", 0, False, 0.0, False, False)],
            "counterparty_reference string, entity_type string, cqs int, "
            "is_managed_as_retail boolean, annual_revenue double, "
            "has_irb_permission boolean, is_qrre_transactor boolean",
        ),
        (
            [("L1", "CP1", 100.0, True), ("L2", "CP2", 100.0, True),
             ("L3", "CP2", 100.0, False)],
            "loan_reference string, counterparty_reference string, "
            "drawn_amount double, is_payroll_loan boolean",
        ),
        B31_PACK,
    )
    rws = _rw(out)
    assert rws["L1"] == (0.45, "sa_retail_transactor")  # transactor wins ties
    assert rws["L2"] == (0.35, "sa_retail_payroll")
    assert rws["L3"] == (0.75, "sa_retail")


def test_crr_payroll_branch_and_no_transactor(spark):
    # CRR2 F68 carries the 35% payroll branch; the 45% transactor RW is
    # B3.1-only — a CRR transactor stays at 75%
    out = _branch_book(
        spark,
        (
            [("CP1", "individual", 0, False, 0.0, False, True)],
            "counterparty_reference string, entity_type string, cqs int, "
            "is_managed_as_retail boolean, annual_revenue double, "
            "has_irb_permission boolean, is_qrre_transactor boolean",
        ),
        (
            [("L1", "CP1", 100.0, True), ("L2", "CP1", 100.0, False)],
            "loan_reference string, counterparty_reference string, "
            "drawn_amount double, is_payroll_loan boolean",
        ),
        CRR_PACK,
    )
    rws = _rw(out)
    assert rws["L1"] == (0.35, "sa_retail_payroll")
    assert rws["L2"] == (0.75, "sa_retail")


def test_b31_ig_assessment_permission_gated(spark):
    cps_schema = (
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, is_investment_grade boolean"
    )
    rows = [
        ("CPIG", "corporate", 0, False, 60000000.0, False, True),
        ("CPNG", "corporate", 0, False, 60000000.0, False, False),
        ("CPSME", "corporate", 0, False, 40000000.0, False, True),
    ]
    loans = (
        [("L1", "CPIG", 100.0), ("L2", "CPNG", 100.0), ("L3", "CPSME", 100.0)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double",
    )
    on = _branch_book(
        spark, (rows, cps_schema), loans, B31_PACK,
        use_investment_grade_assessment=True,
    )
    rws = _rw(on)
    assert rws["L1"] == (0.65, "sa_corporate_ig")
    assert rws["L2"] == (1.35, "sa_corporate_non_ig")
    # SME 85% takes precedence over the IG assessment (Art.122(11))
    assert rws["L3"] == (0.85, "sa_corporate_sme")
    off = _branch_book(spark, (rows, cps_schema), loans, B31_PACK)
    rws_off = _rw(off)
    assert rws_off["L1"][0] == 1.0  # permission off: Art.122(2) 100%
    assert rws_off["L2"][0] == 1.0
    assert rws_off["L3"] == (0.85, "sa_corporate_sme")  # SME needs no permission


def test_b31_short_term_institution_routing(spark):
    cps_schema = (
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, has_short_term_ecai boolean, "
        "scra_grade string"
    )
    rows = [
        ("CP4A", "institution", 2, False, 0.0, False, True, None),   # Table 4A
        ("CP4", "institution", 2, False, 0.0, False, False, None),   # Table 4
        ("CPLT", "institution", 2, False, 0.0, False, False, None),  # ladder
        ("CPST", "institution", 0, False, 0.0, False, False, "B"),   # SCRA-ST
        ("CPSL", "institution", 0, False, 0.0, False, False, "A_ENHANCED"),
    ]
    loans = (
        [("L1", "CP4A", 100.0, 0.2), ("L2", "CP4", 100.0, 0.2),
         ("L3", "CPLT", 100.0, 2.0), ("L4", "CPST", 100.0, 0.2),
         ("L5", "CPSL", 100.0, 2.0)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, original_maturity_years double",
    )
    out = _branch_book(spark, (rows, cps_schema), loans, B31_PACK)
    rws = _rw(out)
    assert rws["L1"] == (0.5, "sa_ecra_st_ecai")       # 4A: CQS2 50%
    assert rws["L2"] == (0.2, "sa_ecra_short_term")    # 4: CQS2 20%
    assert rws["L3"] == (0.3, "sa_cqs_lookup")         # B31 Table 3 CQS2 30%
    assert rws["L4"] == (0.5, "sa_scra_short_term")    # SCRA-ST grade B 50%
    assert rws["L5"] == (0.3, "sa_scra")               # long SCRA A_ENHANCED 30%


def test_b31_corporate_table_6a_and_ladder(spark):
    cps_schema = (
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, has_short_term_ecai boolean"
    )
    rows = [
        ("CP6A", "corporate", 3, False, 60000000.0, False, True),
        ("CPL", "corporate", 3, False, 60000000.0, False, False),
        ("CPSME", "corporate", 3, False, 40000000.0, False, True),
    ]
    loans = (
        [("L1", "CP6A", 100.0), ("L2", "CPL", 100.0), ("L3", "CPSME", 100.0)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double",
    )
    out = _branch_book(spark, (rows, cps_schema), loans, B31_PACK)
    rws = _rw(out)
    assert rws["L1"] == (1.0, "sa_corp_st_ecai")   # 6A: CQS3 100%
    assert rws["L2"] == (0.75, "sa_cqs_lookup")    # B31 Table 6 CQS3 75%
    assert rws["L3"][0] == 0.75                    # rated SME keeps Table 6


def test_crr_ladder_unchanged(spark):
    # regime split: the CRR keeps institution CQS2 50% / corporate CQS3 100%
    out = _branch_book(
        spark,
        (
            [("CPI", "institution", 2, False, 0.0, False),
             ("CPC", "corporate", 3, False, 60000000.0, False)],
            "counterparty_reference string, entity_type string, cqs int, "
            "is_managed_as_retail boolean, annual_revenue double, "
            "has_irb_permission boolean",
        ),
        (
            [("L1", "CPI", 100.0), ("L2", "CPC", 100.0)],
            "loan_reference string, counterparty_reference string, "
            "drawn_amount double",
        ),
        CRR_PACK,
    )
    rws = _rw(out)
    assert rws["L1"][0] == 0.5
    assert rws["L2"][0] == 1.0
