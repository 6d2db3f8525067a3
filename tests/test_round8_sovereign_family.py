"""Round-8 sovereign family: PSE / MDB / IO routing (CRR Art.116-118),
ECA/MEIP sovereign scores (Art.137), and the Table A2 rows 3-4 classes
(ref engine/sa/risk_weights.py sovereign-like chain + defaulted gate)."""

from __future__ import annotations

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK


def _book(spark, cps_rows, cps_schema, loan_rows, loan_schema, pack):
    loans = spark.createDataFrame(loan_rows, loan_schema).selectExpr(
        "*", "CAST(NULL AS DOUBLE) AS pd", "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    return run_pipeline(
        RawBundle(
            counterparties=spark.createDataFrame(cps_rows, cps_schema),
            loans=loans,
        ),
        PipelineConfig(pack=pack),
    )


_CPS = (
    "counterparty_reference string, entity_type string, cqs int, "
    "is_managed_as_retail boolean, annual_revenue double, "
    "has_irb_permission boolean"
)
_LOANS = (
    "loan_reference string, counterparty_reference string, "
    "drawn_amount double, is_defaulted boolean"
)


def _rw(out):
    return {r.exposure_reference: (r.risk_weight, r.rw_source)
            for r in out.results.collect()}


def test_pse_four_leg_routing_crr(spark):
    cps_schema = _CPS + (
        ", sovereign_cqs int, pse_jurisdiction_equivalent boolean"
    )
    rows = [
        ("CPNE", "pse", 1, False, 0.0, False, 1, False),   # non-equivalent
        ("CPST", "pse", 1, False, 0.0, False, 1, True),    # short-term
        ("CPSD", "pse", 0, False, 0.0, False, 2, True),    # sovereign-derived
        ("CPOR", "pse", 3, False, 0.0, False, 2, True),    # own rating
    ]
    loans_schema = _LOANS + ", original_maturity_years double"
    loans = [
        ("L1", "CPNE", 100.0, False, 0.2),
        ("L2", "CPST", 100.0, False, 0.2),
        ("L3", "CPSD", 100.0, False, 2.0),
        ("L4", "CPOR", 100.0, False, 2.0),
    ]
    out = _book(spark, rows, cps_schema, loans, loans_schema, CRR_PACK)
    rws = _rw(out)
    assert rws["L1"] == (1.0, "sa_pse_non_equivalent")  # Art.116(5)
    assert rws["L2"] == (0.2, "sa_pse_short_term")      # Art.116(3)
    assert rws["L3"] == (0.5, "sa_pse_sovereign_derived")  # Table 2 sov CQS2
    assert rws["L4"] == (0.5, "sa_pse_own_rating")      # Table 2A CQS3 50%


def test_mdb_named_rated_unrated(spark):
    rows = [
        ("CPN", "mdb_named", 4, False, 0.0, False),
        ("CPR", "mdb", 2, False, 0.0, False),
        ("CPU", "mdb", 0, False, 0.0, False),
    ]
    loans = [("L1", "CPN", 100.0, False), ("L2", "CPR", 100.0, False),
             ("L3", "CPU", 100.0, False)]
    out = _book(spark, rows, _CPS, loans, _LOANS, CRR_PACK)
    rws = _rw(out)
    assert rws["L1"] == (0.0, "sa_mdb_named")     # Art.117(2) list
    assert rws["L2"] == (0.3, "sa_mdb_table2b")   # Table 2B CQS2 30%
    assert rws["L3"] == (0.5, "sa_mdb_table2b")   # Art.117(1) unrated 50%


def test_io_zero_and_eca_meip(spark):
    cps_schema = _CPS + ", eca_meip_score int"
    rows = [
        ("CPIO", "international_organisation", 0, False, 0.0, False, None),
        ("CPE2", "sovereign", 0, False, 0.0, False, 2),
        ("CPE7", "sovereign", 0, False, 0.0, False, 7),
        ("CPEN", "sovereign", 0, False, 0.0, False, None),  # ladder fallback
        ("CPRS", "sovereign", 2, False, 0.0, False, 2),     # rated: ladder
    ]
    loans = [("L1", "CPIO", 100.0, False), ("L2", "CPE2", 100.0, False),
             ("L3", "CPE7", 100.0, False), ("L4", "CPEN", 100.0, False),
             ("L5", "CPRS", 100.0, False)]
    out = _book(spark, rows, cps_schema, loans, _LOANS, CRR_PACK)
    rws = _rw(out)
    assert rws["L1"] == (0.0, "sa_art118_io")
    assert rws["L2"] == (0.2, "sa_eca_meip")   # Table 9 score 2
    assert rws["L3"] == (1.5, "sa_eca_meip")   # Table 9 score 7
    assert rws["L4"][0] == 1.0                 # unrated sovereign fallback
    assert rws["L5"] == (0.2, "sa_cqs_lookup")  # rated beats the score


def test_table_a2_rows_3_4_regime_split(spark):
    # B3.1 prices sub-debt/high-risk at 150% and both outrank the defaulted
    # rule; the CRR (Art.128 omitted by SI 2021/1078) prices high-risk
    # through the residual 100% — including defaulted rows (Table A2
    # precedence) — and never forms the sub-debt class
    loans_schema = _LOANS + ", is_high_risk boolean, is_subordinated_debt boolean"
    rows = [("CP1", "corporate", 0, False, 0.0, False)]
    loans = [
        ("LHR", "CP1", 100.0, False, True, False),
        ("LHRD", "CP1", 100.0, True, True, False),
        ("LSD", "CP1", 100.0, True, False, True),
        ("LPL", "CP1", 100.0, False, False, False),
    ]
    b31 = _rw(_book(spark, rows, _CPS, loans, loans_schema, B31_PACK))
    assert b31["LHR"] == (1.5, "sa_high_risk")
    assert b31["LHRD"] == (1.5, "sa_high_risk")        # row 4 > defaulted
    assert b31["LSD"] == (1.5, "sa_subordinated_debt")  # row 3 > defaulted
    assert b31["LPL"][0] == 1.0
    crr = _rw(_book(spark, rows, _CPS, loans, loans_schema, CRR_PACK))
    assert crr["LHR"] == (1.0, "sa_unrated")           # residual, no Art.128
    assert crr["LHRD"] == (1.0, "sa_unrated")          # precedence survives
    assert crr["LSD"][1] in ("sa_defaulted", "sa_defaulted_high_provision")
    assert crr["LSD"][0] == 1.5                        # plain defaulted corp


def test_retail_granularity_limb(spark):
    # one whale obligor holds >0.2% of the regulatory-retail portfolio:
    # flag ON routes it out of retail (its loans price 100%), flag OFF and
    # the CRR pack (no limb) keep it retail at 75%
    rows = [("CPW", "individual", 0, False, 0.0, False)] + [
        (f"CP{i}", "individual", 0, False, 0.0, False) for i in range(999)
    ]
    loans = [("LW", "CPW", 5000.0, False)] + [
        (f"L{i}", f"CP{i}", 100.0, False) for i in range(999)
    ]
    for pack, flag, want_rw, want_reason in (
        (B31_PACK, True, 1.0, "CLS_RETAIL_GRANULARITY"),
        (B31_PACK, False, 0.75, "CLS_RETAIL_INDIVIDUAL"),
        (CRR_PACK, True, 0.75, "CLS_RETAIL_INDIVIDUAL"),  # pack has no limb
    ):
        out = run_pipeline(
            RawBundle(
                counterparties=spark.createDataFrame(rows, _CPS),
                loans=spark.createDataFrame(loans, _LOANS).selectExpr(
                    "*", "CAST(NULL AS DOUBLE) AS pd",
                    "CAST(NULL AS DOUBLE) AS lgd",
                    "CAST(NULL AS DOUBLE) AS effective_maturity",
                ),
            ),
            PipelineConfig(pack=pack, enforce_retail_granularity=flag),
        )
        got = {r.exposure_reference: r for r in out.results.collect()}
        assert got["LW"].risk_weight == want_rw, (pack.regime, flag)
        assert got["LW"].class_reason == want_reason, (pack.regime, flag)
        assert got["L0"].risk_weight == 0.75  # small obligors stay retail


def test_rgla_art115_three_legs(spark):
    # Art.115(5) sterling-domestic 20% > (1)(a) Table 1A sovereign-derived
    # for unrated > (1)(b) Table 1B own-rating; under B3.1 Table 1B keeps
    # CQS2 at 50% where the institution Table 3 moved to 30% — the round-8
    # class split is visible exactly there
    cps_schema = _CPS + ", sovereign_cqs int, country string"
    rows = [
        ("CPD", "rgla", 0, False, 0.0, False, None, "GB"),
        ("CPU", "rgla", 0, False, 0.0, False, 3, "FR"),
        ("CPR", "rgla", 2, False, 0.0, False, None, "FR"),
        ("CPI", "institution", 2, False, 0.0, False, None, "FR"),
    ]
    loans_schema = _LOANS + ", currency string"
    loans = [
        ("L1", "CPD", 100.0, False, "GBP"),
        ("L2", "CPU", 100.0, False, "USD"),
        ("L3", "CPR", 100.0, False, "USD"),
        ("L4", "CPI", 100.0, False, "USD"),
    ]
    crr = _rw(_book(spark, rows, cps_schema, loans, loans_schema, CRR_PACK))
    assert crr["L1"] == (0.2, "sa_rgla_domestic")
    assert crr["L2"] == (1.0, "sa_rgla_sovereign_derived")  # Table 1A CQS3
    assert crr["L3"] == (0.5, "sa_rgla_own_rating")         # Table 1B CQS2
    assert crr["L4"][0] == 0.5                              # CRR Table 3 CQS2
    b31 = _rw(_book(spark, rows, cps_schema, loans, loans_schema, B31_PACK))
    assert b31["L3"] == (0.5, "sa_rgla_own_rating")  # Table 1B unchanged
    assert b31["L4"][0] == 0.3                       # B3.1 Table 3 CQS2 30%
