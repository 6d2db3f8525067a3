"""Golden-scenario acceptance layer (ref tests/acceptance/{crr,basel31}
against tests/expected_outputs + EXPECTED_OUTPUT_SCHEMA,
data/schemas.py:3186: scenario_id, ead, pd, lgd, risk_weight,
rwa_before_sf, rwa, expected_loss, regulatory_reference).

Every scenario is HAND-COMPUTED from the public rule text (the arithmetic
is written out next to each expectation) and pinned as an expected-output
fixture; the suite fails if any pinned figure moves. This is the
regression net the co-evolving DuckDB oracles cannot provide — the oracle
re-derives whatever the query computes, whereas these rows assert what the
regulation says the answer IS. IRB expectations derive Φ/Φ⁻¹ from
``statistics.NormalDist`` — stdlib-only, independent of the engine's
Cody/Acklam kernels (the reference's tests/oracle/derive.py discipline:
"DOES NOT IMPORT rwa_calc").

One bundle per regime, each scenario on its own counterparty (group-of-one
classification), run through the FULL ``run_pipeline`` — so a pinned value
also locks hierarchy → classify → CRM → calculator → aggregate wiring, not
just the formula.
"""

from __future__ import annotations

import math
from statistics import NormalDist

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK

_N = NormalDist()


def _vasicek_rw(pd: float, lgd: float, m: float, scaling: float) -> float:
    """Independent stdlib derivation of the CRR Art.153(1) corporate risk
    weight: R 0.12–0.24/50-decay, K = LGD·Φ((G(PD)+√R·G(0.999))/√(1−R))
    − PD·LGD, b = (0.11852 − 0.05478·ln PD)², MA = (1+(M−2.5)b)/(1−1.5b)."""
    w = (1.0 - math.exp(-50.0 * pd)) / (1.0 - math.exp(-50.0))
    r = 0.12 * w + 0.24 * (1.0 - w)
    g_pd = _N.inv_cdf(pd)
    g999 = _N.inv_cdf(0.999)
    k = lgd * _N.cdf((g_pd + math.sqrt(r) * g999) / math.sqrt(1.0 - r)) - pd * lgd
    b = (0.11852 - 0.05478 * math.log(pd)) ** 2
    ma = (1.0 + (m - 2.5) * b) / (1.0 - 1.5 * b)
    return k * ma * 12.5 * scaling


@pytest.fixture(scope="module")
def crr_rows(spark):
    cps = spark.createDataFrame(
        [
            # ref, entity, cqs, managed_retail, revenue, irb
            ("CP_A", "corporate", 2, False, 60_000_000.0, False),
            ("CP_B", "corporate", 0, False, 10_000_000.0, False),
            ("CP_C", "corporate", 0, False, 10_000_000.0, False),
            ("CP_D", "individual", 0, False, 0.0, False),
            ("CP_E", "individual", 0, False, 0.0, False),
            ("CP_F", "corporate", 1, False, 60_000_000.0, False),
            ("CP_G", "institution", 0, False, 0.0, False),
            ("CP_H", "corporate", 0, False, 60_000_000.0, False),
            ("CP_I", "corporate", 0, False, 60_000_000.0, False),
            ("CP_J", "corporate", 0, False, 60_000_000.0, True),
            ("CP_K", "corporate", 0, False, 60_000_000.0, True),
            ("CP_L", "corporate", 0, False, 60_000_000.0, True),
            ("CP_N", "institution", 2, False, 0.0, False),
            ("CP_P", "corporate", 1, False, 60_000_000.0, False),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [
            # ref, cp, drawn, defaulted, pd, lgd, m, el_be, is_cb, cb_cqs
            ("L_A", "CP_A", 1000.0, False, None, None, None, None, None, None),
            ("L_B", "CP_B", 1_000_000.0, False, None, None, None, None, None, None),
            ("L_C", "CP_C", 4_000_000.0, False, None, None, None, None, None, None),
            ("L_D", "CP_D", 500_000.0, False, None, None, None, None, None, None),
            ("L_E", "CP_E", 1_500_000.0, False, None, None, None, None, None, None),
            ("L_F", "CP_F", 200.0, True, None, None, None, None, None, None),
            ("L_H", "CP_H", 1000.0, False, None, None, None, None, None, None),
            ("L_I", "CP_I", 1000.0, False, None, None, None, None, None, None),
            ("L_J", "CP_J", 1000.0, False, 0.01, None, None, None, None, None),
            ("L_K", "CP_K", 1000.0, True, None, 0.6, None, 0.4, None, None),
            ("L_L", "CP_L", 1000.0, False, 0.01, None, 2.0, None, None, None),
            ("L_N", "CP_N", 1000.0, False, None, None, None, None, True, 1),
        ],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_defaulted boolean, pd double, lgd double, effective_maturity double, "
        "el_be double, is_covered_bond boolean, cb_cqs int",
    )
    contingents = spark.createDataFrame(
        [
            ("K_G", "CP_G", 1000.0, "medium_risk", False, None, None, None),
            ("K_P", "CP_P", 1000.0, "low_risk", False, None, None, None),
        ],
        "contingent_reference string, counterparty_reference string, "
        "nominal_amount double, risk_bucket string, is_defaulted boolean, "
        "pd double, lgd double, effective_maturity double",
    )
    collateral = spark.createDataFrame(
        [
            # supplied-haircut cash item (supplied wins over derivation)
            ("COL_H", "cash", 500.0, 0.2, False, None, None),
            # banded derivation: govt bond CQS1, 3y residual → 1-5y band
            ("COL_I", "govt_bond", 500.0, None, True, 1, 3.0),
        ],
        "collateral_reference string, collateral_type string, market_value double, "
        "haircut double, currency_mismatch boolean, collateral_cqs int, "
        "residual_maturity double",
    )
    links = spark.createDataFrame(
        [("COL_H", "L_H"), ("COL_I", "L_I")],
        "collateral_reference string, exposure_reference string",
    )
    slotting = spark.createDataFrame(
        [("CP_L", "strong")], "counterparty_reference string, slot_category string"
    )
    equity = spark.createDataFrame(
        [("E_M", "CP_A", 1000.0, True)],
        "exposure_reference string, counterparty_reference string, "
        "market_value double, is_exchange_traded boolean",
    )
    bundle = RawBundle(
        counterparties=cps,
        loans=loans,
        contingents=contingents,
        collateral=collateral,
        collateral_links=links,
        specialised_lending=slotting,
        equity_exposures=equity,
    )
    out = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK))
    return {r.exposure_reference: r for r in out.results.collect()}


def test_sa_corporate_rated(crr_rows):
    # CRR Art.122 Table 6: corporate CQS2 → 50%; revenue 60m > 50m → no
    # Art.501 factor. RWA = 1000 × 0.50 = 500.
    r = crr_rows["L_A"]
    assert r.risk_weight == 0.5
    assert r.ead == 1000.0 and r.rwa == pytest.approx(500.0)
    assert r.class_reason == "CLS_CORPORATE_RESIDUAL" and r.risk_type == "CREDIT"


def test_sa_sme_supporting_factor_tier1(crr_rows):
    # CRR2 Art.501: E* = 1.0m ≤ 2.5m → factor 0.7619 on the whole amount.
    # RWA = 1,000,000 × 1.00 (unrated corp) × 0.7619 = 761,900.
    assert crr_rows["L_B"].rwa == pytest.approx(761_900.0)


def test_sa_sme_supporting_factor_tier2(crr_rows):
    # Art.501 tiered blend at E* = 4.0m:
    # (2.5m×0.7619 + 1.5m×0.85)/4.0m = 3,179,750/4,000,000 = 0.7949375
    # RWA = 4,000,000 × 1.00 × 0.7949375 = 3,179,750.
    assert crr_rows["L_C"].rwa == pytest.approx(3_179_750.0)


def test_sa_retail_threshold(crr_rows):
    # Art.123: individual, group exposure 0.5m ≤ €1m → retail 75%.
    r = crr_rows["L_D"]
    assert r.exposure_class == "retail" and r.risk_weight == 0.75
    assert r.rwa == pytest.approx(375_000.0)
    assert r.class_reason == "CLS_RETAIL_INDIVIDUAL"


def test_sa_retail_over_threshold_falls_to_corporate(crr_rows):
    # Art.123(c) fails at 1.5m > €1m → corporate treatment, unrated 100%.
    r = crr_rows["L_E"]
    assert r.exposure_class == "corporate" and r.risk_weight == 1.0
    assert r.rwa == pytest.approx(1_500_000.0)
    assert r.class_reason == "CLS_RETAIL_OVER_THRESHOLD"


def test_sa_defaulted(crr_rows):
    # Art.127: unsecured defaulted → 150%. RWA = 200 × 1.5 = 300.
    r = crr_rows["L_F"]
    assert r.risk_weight == 1.5 and r.rwa == pytest.approx(300.0)


def test_sa_ccf_medium_risk(crr_rows):
    # Annex I medium risk → CCF 50%: EAD = 500; institution unrated → 50%
    # (Art.121 route in the unrated ladder). RWA = 250.
    r = crr_rows["K_G"]
    assert r.ead == pytest.approx(500.0) and r.ccf == pytest.approx(0.5)
    assert r.rwa == pytest.approx(250.0)


def test_sa_ccf_low_risk_is_zero_under_crr(crr_rows):
    # Annex I low risk (UCC) → CCF 0% under CRR: EAD 0, RWA 0 (the B3.1
    # twin below pins the divergent 10%).
    r = crr_rows["K_P"]
    assert r.ead == pytest.approx(0.0) and r.rwa == pytest.approx(0.0)


def test_crm_fccm_supplied_haircut(crr_rows):
    # Art.223 FCCM: C_adj = 500×(1−0.20) = 400 → E* = 1000 − 400 = 600.
    # Unrated corporate 100% → RWA 600. Decomposition conserves exactly:
    # gross 500 − quality 100 − fx 0 − mismatch 0 = 400.
    r = crr_rows["L_H"]
    assert r.ead_after_crm == pytest.approx(600.0)
    assert r.rwa == pytest.approx(600.0)
    assert r.collateral_value == pytest.approx(400.0)
    assert r.collateral_value_gross == pytest.approx(500.0)
    assert r.haircut_quality == pytest.approx(100.0)
    assert r.haircut_fx == pytest.approx(0.0)
    assert r.haircut_maturity_mismatch == pytest.approx(0.0)


def test_crm_banded_haircut_and_fx(crr_rows):
    # Art.224 Table 1: govt bond CQS1, residual 3y → 1-5y band → 2%;
    # currency mismatch → ×(1−8%). C_adj = 500×0.98×0.92 = 450.80.
    # No maturity mismatch (t_coll capped at t_exp). E* = 549.20.
    # Components: quality = 500×0.02 = 10; fx = 500×0.98×0.08 = 39.20.
    r = crr_rows["L_I"]
    assert r.collateral_value == pytest.approx(450.80)
    assert r.ead_after_crm == pytest.approx(549.20)
    assert r.rwa == pytest.approx(549.20)
    assert r.haircut_quality == pytest.approx(10.0)
    assert r.haircut_fx == pytest.approx(39.20)
    assert r.haircut_maturity_mismatch == pytest.approx(0.0)
    # conservation: gross − quality − fx − mm ≡ allocated
    assert r.collateral_value_gross - r.haircut_quality - r.haircut_fx - (
        r.haircut_maturity_mismatch
    ) == pytest.approx(r.collateral_value)


def test_firb_performing_vasicek(crr_rows):
    # Art.153(1): PD 1% (≥ 0.03% floor), supervisory LGD 45%, M 2.5
    # (no maturity adjustment term at M = 2.5… MA ≠ 1: b enters via
    # 1/(1−1.5b)), ×1.06 scaling. Derived via stdlib NormalDist.
    r = crr_rows["L_J"]
    expected_rw = _vasicek_rw(0.01, 0.45, 2.5, 1.06)
    assert r.approach == "IRB" and r.pd_used == 0.01 and r.lgd_used == 0.45
    assert r.risk_weight == pytest.approx(expected_rw, rel=1e-7)
    assert r.rwa == pytest.approx(1000.0 * expected_rw, rel=1e-7)
    # EL = PD × LGD × EAD = 0.01 × 0.45 × 1000 = 4.5
    assert r.expected_loss == pytest.approx(4.5, rel=1e-9)


def test_airb_defaulted_el_shortfall(crr_rows):
    # Art.153(1)(ii) / CRE31.3: defaulted A-IRB (own BEEL) →
    # K = max(0, LGD − BEEL) = 0.6 − 0.4 = 0.2; RW = 0.2×12.5 = 2.5
    # (no MA, no 1.06). RWA = 2,500. EL = BEEL×EAD = 400; no provisions →
    # Art.159 shortfall = 400.
    r = crr_rows["L_K"]
    assert r.risk_weight == pytest.approx(2.5)
    assert r.rwa == pytest.approx(2500.0)
    assert r.pd_used == 1.0
    assert r.expected_loss == pytest.approx(400.0)
    assert r.el_shortfall == pytest.approx(400.0)
    assert r.rw_source == "irb_defaulted_airb"


def test_slotting_short_maturity_strong(crr_rows):
    # Art.153(5) Table A: strong, remaining maturity 2.0 < 2.5y → 50%
    # preferential; Art.158(6) Table B short-strong EL rate 0%.
    r = crr_rows["L_L"]
    assert r.approach == "SLOTTING"
    assert r.risk_weight == pytest.approx(0.5)
    assert r.rwa == pytest.approx(500.0)
    assert r.expected_loss == pytest.approx(0.0)


def test_equity_exchange_traded(crr_rows):
    # Art.155(2): exchange-traded 290%; Art.158(7) EL 0.8%.
    # RWA = 1000 × 2.9 = 2900; EL = 8.
    r = crr_rows["E_M"]
    assert r.risk_weight == pytest.approx(2.9)
    assert r.rwa == pytest.approx(2900.0)
    assert r.expected_loss == pytest.approx(8.0)
    assert r.risk_type == "EQUITY"


def test_covered_bond_rated(crr_rows):
    # Art.129(4) Table 6A: bond's OWN CQS1 → 10%. RWA = 100.
    r = crr_rows["L_N"]
    assert r.risk_weight == pytest.approx(0.10)
    assert r.rwa == pytest.approx(100.0)


# ---------------------------------------------------------------------------
# Basel 3.1 twins
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def b31_rows(spark):
    cps = spark.createDataFrame(
        [
            ("CP_P", "corporate", 1, False, 60_000_000.0, False),
            ("CP_Q", "corporate", 1, False, 60_000_000.0, True),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L_Q", "CP_Q", 1000.0, False, 0.0005, 0.25, 2.5)],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_defaulted boolean, pd double, lgd double, effective_maturity double",
    )
    contingents = spark.createDataFrame(
        [("K_P", "CP_P", 1000.0, "low_risk", False, None, None, None)],
        "contingent_reference string, counterparty_reference string, "
        "nominal_amount double, risk_bucket string, is_defaulted boolean, "
        "pd double, lgd double, effective_maturity double",
    )
    bundle = RawBundle(counterparties=cps, loans=loans, contingents=contingents)
    out = run_pipeline(bundle, PipelineConfig(pack=B31_PACK))
    return {r.exposure_reference: r for r in out.results.collect()}


def test_b31_ucc_ccf_divergence(b31_rows):
    # PS1/26 Art.111 / CRE20.101: unconditionally-cancellable commitments
    # 0% → 10%. EAD = 100; corporate CQS1 → 20% → RWA 20 — BEFORE the
    # output floor (below) uplifts the book.
    r = b31_rows["K_P"]
    assert r.ccf == pytest.approx(0.10)
    assert r.ead == pytest.approx(100.0)
    assert r.rwa_pre_floor == pytest.approx(20.0)


def test_b31_output_floor_binds(b31_rows):
    # Art.92(3)/PS1/26: floored RWA = max(modelled, 72.5% × S-TREA).
    # L_Q: PD at the 0.05% B3.1 floor, LGD 25%, M 2.5, no 1.06 under B3.1
    # → modelled RW ≈ 0.109 (stdlib derivation below); SA-equivalent
    # RW 20% (corporate CQS1) → floor base 0.725 × (1100×0.2) = 159.5 >
    # modelled total — the floor BINDS and uplifts pro-rata.
    modelled_rw = _vasicek_rw(0.0005, 0.25, 2.5, 1.0)
    q = b31_rows["L_Q"]
    assert q.rwa_pre_floor == pytest.approx(1000.0 * modelled_rw, rel=1e-6)
    # portfolio: modelled = 1000·rw_q + 20 (SA leg keeps its own rwa);
    # std = 1000×0.2 + 100×0.2 = 220 → floored total = 0.725×220 = 159.5
    modelled_total = round(1000.0 * modelled_rw, 2) + 20.0
    assert modelled_total < 0.725 * 220.0
    uplift = (0.725 * 220.0) / modelled_total
    assert q.floor_applied is True
    assert q.floor_uplift == pytest.approx(uplift, rel=1e-6)
    assert q.rwa == pytest.approx(1000.0 * modelled_rw * uplift, rel=1e-6)


# ---------------------------------------------------------------------------
# Second CRR golden portfolio: the SA special ladders (guarantees, covered
# bonds, Art.121, Art.114(4), Annex I maturity split)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def crr2_rows(spark):
    cps = spark.createDataFrame(
        [
            # ref, entity, cqs, managed, revenue, irb, sovereign_cqs, country
            ("CP_R", "corporate", 0, False, 60_000_000.0, False, None, None),
            ("CP_S", "institution", 2, False, 0.0, False, None, None),
            ("CP_T", "institution", 0, False, 0.0, False, 1, None),
            ("CP_U", "sovereign", 0, False, 0.0, False, None, "DE"),
            ("CP_V", "institution", 1, False, 0.0, False, None, None),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, sovereign_cqs int, country string",
    )
    loans = spark.createDataFrame(
        [
            ("L_R", "CP_R", 1000.0, False, None, None, None, False, None, None),
            ("L_S", "CP_S", 1000.0, False, None, None, None, True, None, None),
            ("L_U", "CP_U", 1000.0, False, None, None, None, False, None, "EUR"),
        ],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_defaulted boolean, pd double, lgd double, effective_maturity double, "
        "is_covered_bond boolean, cb_cqs int, currency string",
    )
    contingents = spark.createDataFrame(
        [("K_V", "CP_V", 1000.0, "medium_risk", False, None, None, None, 0.5)],
        "contingent_reference string, counterparty_reference string, "
        "nominal_amount double, risk_bucket string, is_defaulted boolean, "
        "pd double, lgd double, effective_maturity double, "
        "original_maturity_years double",
    )
    gtees = spark.createDataFrame(
        [("L_R", 0.6, "institution", 1)],
        "exposure_reference string, coverage_pct double, guarantor_class string, "
        "guarantor_cqs int",
    )
    bundle = RawBundle(
        counterparties=cps, loans=loans, contingents=contingents, guarantees=gtees
    )
    out = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK))
    return {r.exposure_reference: r for r in out.results.collect()}


def test_sa_guarantee_substitution(crr2_rows):
    # Art.235: unrated corporate 100%; institution CQS1 guarantor 20% on
    # the 60% covered share → 0.6×min(1.0, 0.2) + 0.4×1.0 = 0.52.
    # RWA = 520; the hypothetical keeps the own ladder: 1000.
    r = crr2_rows["L_R"]
    assert r.risk_weight == pytest.approx(0.52)
    assert r.rwa == pytest.approx(520.0)
    assert r.rw_source.endswith("+guarantee")
    assert r.g_class == "institution" and r.g_coverage == pytest.approx(0.6)
    assert r.rwa_pre_crm_substitution == pytest.approx(1000.0)


def test_sa_covered_bond_unrated_derivation(crr2_rows):
    # Art.129(5)(b): unrated covered bond derives from the ISSUER's senior
    # unsecured weight — institution CQS2 → 50% → CB 20%. RWA = 200.
    r = crr2_rows["L_S"]
    assert r.risk_weight == pytest.approx(0.20)
    assert r.rwa == pytest.approx(200.0)
    assert r.rw_source == "sa_covered_bond_unrated_derived"


def test_sa_eu_domestic_currency_sovereign(crr2_rows):
    # Art.114(4) + Art.141: German central government, EUR-denominated →
    # 0% risk weight overrides the CQS ladder. RWA = 0.
    r = crr2_rows["L_U"]
    assert r.risk_weight == pytest.approx(0.0)
    assert r.rwa == pytest.approx(0.0)
    assert r.rw_source == "sovereign_eu_domestic"


def test_sa_annex1_oc_maturity_split(crr2_rows):
    # CRR Annex I 3(b): other commitments with original maturity ≤ 1y take
    # 20% instead of 50%. EAD = 200; institution CQS1 → 20% → RWA = 40.
    r = crr2_rows["K_V"]
    assert r.ccf == pytest.approx(0.20)
    assert r.ead == pytest.approx(200.0)
    assert r.rwa == pytest.approx(40.0)


def test_sa_sovereign_derived_institution_isolated(spark):
    # Art.121 Table 5 in isolation: unrated institution, sovereign CQS1 →
    # 20%. RWA = 200.
    cps = spark.createDataFrame(
        [("CP_T", "institution", 0, False, 0.0, False, 1)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, sovereign_cqs int",
    )
    loans = spark.createDataFrame(
        [("L_T", "CP_T", 1000.0, False, None, None, None)],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_defaulted boolean, pd double, lgd double, effective_maturity double",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans), PipelineConfig(pack=CRR_PACK)
    )
    r = {x.exposure_reference: x for x in out.results.collect()}["L_T"]
    assert r.risk_weight == pytest.approx(0.20)
    assert r.rwa == pytest.approx(200.0)
    assert r.rw_source == "sa_sovereign_derived"


def test_b31_five_band_haircut(spark):
    # PS1/26 Art.224 Table 1 (5 bands): govt bond CQS1, 7y residual →
    # 5-10y band → 4% haircut. C_adj = 500×0.96 = 480 → E* = 520;
    # corporate CQS1 → 20% → RWA = 104.
    cps = spark.createDataFrame(
        [("CP_W", "corporate", 1, False, 60_000_000.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L_W", "CP_W", 1000.0, False, None, None, None)],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_defaulted boolean, pd double, lgd double, effective_maturity double",
    )
    coll = spark.createDataFrame(
        [("COL_W", "govt_bond", 500.0, None, False, 1, 7.0)],
        "collateral_reference string, collateral_type string, market_value double, "
        "haircut double, currency_mismatch boolean, collateral_cqs int, "
        "residual_maturity double",
    )
    links = spark.createDataFrame(
        [("COL_W", "L_W")], "collateral_reference string, exposure_reference string"
    )
    out = run_pipeline(
        RawBundle(
            counterparties=cps, loans=loans, collateral=coll, collateral_links=links
        ),
        PipelineConfig(pack=B31_PACK),
    )
    r = {x.exposure_reference: x for x in out.results.collect()}["L_W"]
    assert r.collateral_value == pytest.approx(480.0)
    assert r.ead_after_crm == pytest.approx(520.0)
    assert r.haircut_quality == pytest.approx(20.0)
    assert r.rwa_pre_floor == pytest.approx(104.0)


# ---------------------------------------------------------------------------
# CCR / SFT / settlement / securitisation golden scenarios (round 5; ref
# tests/acceptance/ccr — the books the first 24 scenarios did not pin).
# All CCR/SFT counterparties are institutions CQS2 → SA RW 0.50 with no
# Art.501 factor, so every expectation isolates the EAD formula under test.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ccr_rows(spark):
    cps = spark.createDataFrame(
        [
            ("CP_U", "institution", 2, False, 0.0, False),
            ("CP_M", "institution", 2, False, 0.0, False),
            ("CP_P", "institution", 2, False, 0.0, False),
            ("CP_R", "institution", 2, False, 0.0, False),
            ("CP_F", "institution", 2, False, 0.0, False),
            ("CP_T", "institution", 2, False, 0.0, False),
            ("CP_X", "corporate", 0, False, 60_000_000.0, False),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    trades = spark.createDataFrame(
        [
            # S1 unmargined: V = 100k − 20k = 80k; AddOn = 0.005 × 1.5m
            ("T1", "NS_U", "CP_U", 100_000.0, 1_000_000.0, "ir"),
            ("T2", "NS_U", "CP_U", -20_000.0, 500_000.0, "ir"),
            # S2 margined: V = 10k; AddOn = 0.04 × 2m (fx)
            ("T3", "NS_M", "CP_M", 10_000.0, 2_000_000.0, "fx"),
            # S3 PFE multiplier: V = −50k; AddOn = 0.05 × 1m (credit)
            ("T4", "NS_P", "CP_P", -50_000.0, 1_000_000.0, "credit"),
            # S4 MPOR: V = 20k; AddOn = 0.005 × 1m (ir)
            ("T5", "NS_R", "CP_R", 20_000.0, 1_000_000.0, "ir"),
        ],
        "trade_reference string, netting_set_reference string, "
        "counterparty_reference string, mtm double, notional double, "
        "asset_class string",
    )
    margin = spark.createDataFrame(
        [
            # S2: TH+MTA−NICA = 50k+10k−5k = 55k; no remargin cadence → MF=1
            ("NS_M", 50_000.0, 10_000.0, 5_000.0, None),
            # S4: TH=0 (margined), daily remargin → MPOR = 10+1−1 = 10
            ("NS_R", 0.0, 0.0, 0.0, 1.0),
        ],
        "netting_set_reference string, threshold double, mta double, "
        "nica double, remargin_days double",
    )
    ccr_coll = spark.createDataFrame(
        [("NS_M", 4_000.0, 0.0)],
        "netting_set_reference string, value double, haircut double",
    )
    sfts = spark.createDataFrame(
        [
            # S5: E* = max(0, 100k − 60k·(1−0.2)) = 52k
            ("NS_F", "CP_F", "lent", 100_000.0, None),
            ("NS_F", "CP_F", "collateral", 60_000.0, 0.2),
        ],
        "netting_set_reference string, counterparty_reference string, "
        "leg string, value double, haircut double",
    )
    failed = spark.createDataFrame(
        [("FT1", "CP_T", 10_000.0, 20), ("FT2", "CP_T", 5_000.0, 3)],
        "trade_reference string, counterparty_reference string, "
        "amount double, days_late int",
    )
    loans = spark.createDataFrame(
        [("L_SEC", "CP_X", 1_000_000.0, False, None, None, None)],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_defaulted boolean, pd double, lgd double, effective_maturity double",
    )
    allocs = spark.createDataFrame(
        [("L_SEC", "P1", 1.0)],
        "exposure_reference string, pool_reference string, allocation_pct double",
    )
    tranches = spark.createDataFrame(
        [
            ("P1", "JUN", 0.00, 0.05),
            ("P1", "MEZ", 0.05, 0.20),
            ("P1", "SEN", 0.20, 1.00),
        ],
        "pool_reference string, tranche_reference string, "
        "attachment double, detachment double",
    )
    bundle = RawBundle(
        counterparties=cps,
        loans=loans,
        trades=trades,
        margin_agreements=margin,
        ccr_collateral=ccr_coll,
        sft_trades=sfts,
        failed_trades=failed,
        securitisation_allocations=allocs,
        securitisation_tranches=tranches,
    )
    out = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK))
    return {r.exposure_reference: r for r in out.results.collect()}


def test_saccr_unmargined_ead(ccr_rows):
    # CRR Art.274(2)/275(1): RC = max(V−C, 0) = 80,000 (no CSA for NS_U);
    # AddOn = SF_ir × notional = 0.005 × 1,500,000 = 7,500; multiplier = 1
    # (V−C ≥ 0). EAD = 1.4 × (80,000 + 7,500) = 122,500.
    # RWA = 122,500 × 0.50 (institution CQS2) = 61,250.
    r = ccr_rows["NS_U_CCR"]
    assert r.ead == pytest.approx(122_500.0)
    assert r.rwa == pytest.approx(61_250.0)
    assert r.risk_type == "CCR_DERIVATIVE"


def test_saccr_margined_rc_floor(ccr_rows):
    # Art.275(2): RC = max(V−C, TH+MTA−NICA, 0); V−C = 10,000 − 4,000 =
    # 6,000 < 55,000 → RC = 55,000. AddOn = 0.04 × 2,000,000 = 80,000;
    # V−C ≥ 0 → multiplier 1; no remargin cadence → MF 1.
    # EAD = 1.4 × (55,000 + 80,000) = 189,000; RWA = 94,500.
    r = ccr_rows["NS_M_CCR"]
    assert r.ead == pytest.approx(189_000.0)
    assert r.rwa == pytest.approx(94_500.0)


def test_saccr_pfe_multiplier(ccr_rows):
    # Art.278(3): V−C = −50,000 < 0, AddOn = 50,000 →
    # multiplier = min(1, 0.05 + 0.95·exp(−50,000 / (2·0.95·50,000)))
    #            = 0.05 + 0.95·e^(−10/19); RC = max(−50,000, 0) = 0.
    mult = 0.05 + 0.95 * math.exp(-50_000.0 / (2.0 * 0.95 * 50_000.0))
    r = ccr_rows["NS_P_CCR"]
    assert r.ead == pytest.approx(1.4 * mult * 50_000.0, rel=1e-9)
    assert r.rwa == pytest.approx(1.4 * mult * 50_000.0 * 0.5, rel=1e-9)


def test_saccr_mpor_maturity_factor(ccr_rows):
    # Art.285(2): MPOR = max(10 + remargin − 1, floor) = 10 business days;
    # Art.279c(2): MF = 1.5·√(10/250) = 0.3. RC = max(20,000, 0+0−0, 0)
    # = 20,000; AddOn = 5,000. EAD = 1.4 × (20,000 + 0.3·5,000) = 30,100.
    r = ccr_rows["NS_R_CCR"]
    assert r.ead == pytest.approx(30_100.0, rel=1e-12)
    assert r.rwa == pytest.approx(15_050.0, rel=1e-12)


def test_sft_fccm_estar(ccr_rows):
    # Art.223(5): E* = max(0, Σ lent − Σ coll·(1−h))
    #            = max(0, 100,000 − 60,000·0.8) = 52,000. RWA @0.5 = 26,000.
    r = ccr_rows["NS_F_SFT"]
    assert r.ead == pytest.approx(52_000.0)
    assert r.rwa == pytest.approx(26_000.0)
    assert r.risk_type == "CCR_SFT"


def test_settlement_band_factor(ccr_rows):
    # Art.378 Table 1: 20 days late → factor 50%; capital = 10,000 × 0.5,
    # RWA = 12.5 × capital = 62,500. A 3-days-late trade emits NO row.
    r = ccr_rows["FT1_STL"]
    assert r.rwa == pytest.approx(62_500.0)
    assert r.risk_type == "SETTLEMENT"
    assert "FT2_STL" not in ccr_rows


def test_secsa_junior_tranche_1250(ccr_rows):
    # CRE41/Art.261: K_A = 0.08 (W=0); junior D = 0.05 ≤ K_A → RW 1250%.
    # Nominal = 1,000,000 × 0.05 = 50,000 → RWA = 50,000 × 12.5 = 625,000.
    r = ccr_rows["SEC_P1_JUN"]
    assert r.ead == pytest.approx(50_000.0)
    assert r.rwa == pytest.approx(625_000.0)


def test_secsa_senior_and_mezzanine_ssfa(ccr_rows):
    # Independent stdlib SSFA (Art.261 closed form, K_A = 0.08, p = 1):
    #   a = −1/K_A = −12.5
    # Senior (A=0.2 ≥ K_A): K_SSFA = (e^{a(D−K_A)} − e^{a(A−K_A)})
    #   / (a·(D−A)) → RW = 12.5·K_SSFA; nominal = 800,000.
    a = -12.5
    k_ssfa_sen = (math.exp(a * (1.0 - 0.08)) - math.exp(a * (0.2 - 0.08))) / (
        a * ((1.0 - 0.08) - (0.2 - 0.08))
    )
    rw_sen = max(12.5 * k_ssfa_sen, 0.15)
    r_sen = ccr_rows["SEC_P1_SEN"]
    assert r_sen.rwa == pytest.approx(800_000.0 * rw_sen, rel=1e-9)
    # Mezzanine straddle (A=0.05 < K_A < D=0.2): l clamps to 0 →
    # K_SSFA over (0, D−K_A]; RW = 12.5·[(K_A−A) + (D−K_A)·K_SSFA]/(D−A).
    k_ssfa_mez = (math.exp(a * (0.2 - 0.08)) - 1.0) / (a * (0.2 - 0.08))
    rw_mez = max(
        ((0.08 - 0.05) + (0.2 - 0.08) * k_ssfa_mez) * 12.5 / (0.2 - 0.05), 0.15
    )
    r_mez = ccr_rows["SEC_P1_MEZ"]
    assert r_mez.rwa == pytest.approx(150_000.0 * rw_mez, rel=1e-9)
    # the fully-allocated originating loan retains a zero share
    assert ccr_rows["L_SEC"].ead == pytest.approx(0.0)


@pytest.fixture(scope="module")
def ciu_wwr_rows(spark):
    """CIU look-through (Art.132) and specific-WWR carve-out (Art.291)
    scenarios — the remaining wired books without golden pins."""
    cps = spark.createDataFrame(
        [("CP_W", "institution", 2, False, 0.0, False)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_defaulted boolean, pd double, lgd double, effective_maturity double",
    )
    trades = spark.createDataFrame(
        [
            # T_W is specific-WWR: carved into its own single-trade set with
            # an LGD=100% override; T_N stays on the original set
            ("T_W", "NS_W", "CP_W", 10_000.0, 100_000.0, "ir", True, "financial"),
            ("T_N", "NS_W", "CP_W", 5_000.0, 200_000.0, "ir", False, "financial"),
            # Art.274(2) alpha carve-out: a pension-scheme counterparty's
            # netting set takes alpha = 1.0 instead of 1.4
            ("T_P", "NS_PSA", "CP_W", 10_000.0, 1_000_000.0, "ir", False,
             "pension_scheme"),
        ],
        "trade_reference string, netting_set_reference string, "
        "counterparty_reference string, mtm double, notional double, "
        "asset_class string, is_specific_wwr boolean, counterparty_type string",
    )
    ciu = spark.createDataFrame(
        [
            # corporate CQS2 underlying → 50% RW
            ("F1", "H1", "corporate", 10_000.0, 2, None),
            # equity underlying → CRR Art.155(2) 370%
            ("F1", "H2", "equity", 1_000.0, None, None),
            # unknown class, mandate unknown → Art.132(2) 1250% fallback
            ("F1", "H3", "mystery", 100.0, None, False),
        ],
        "fund_reference string, holding_reference string, underlying_class string, "
        "value double, holding_cqs int, is_mandate_known boolean",
    )
    bundle = RawBundle(
        counterparties=cps, loans=loans, trades=trades, ciu_holdings=ciu
    )
    out = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK))
    return {r.exposure_reference: r for r in out.results.collect()}


def test_wwr_specific_carve_out(ciu_wwr_rows):
    # Art.291(5)(a): the specific-WWR trade leaves NS_W into its own
    # synthetic set. Residual NS_W: EAD = 1.4·(5,000 + 0.005·200,000)
    # = 8,400; carved set: EAD = 1.4·(10,000 + 0.005·100,000) = 14,700,
    # carrying the Art.291(5)(c) LGD=100% override on its ledger row.
    r_res = ciu_wwr_rows["NS_W_CCR"]
    r_wwr = ciu_wwr_rows["NS_W__wwr__T_W_CCR"]
    assert r_res.ead == pytest.approx(8_400.0)
    assert r_wwr.ead == pytest.approx(14_700.0)
    assert r_wwr.lgd_used is None or r_wwr.lgd_used == pytest.approx(1.0)


def test_ciu_look_through(ciu_wwr_rows):
    # Art.132a look-through: corporate CQS2 → 10,000 × 0.50 = 5,000;
    # equity underlying (CRR, IRB equity available) → 1,000 × 3.70 = 3,700;
    # unknown class with no usable mandate → Art.132(2) fallback
    # 100 × 12.50 = 1,250.
    assert ciu_wwr_rows["F1_CIU_H1"].rwa == pytest.approx(5_000.0)
    assert ciu_wwr_rows["F1_CIU_H2"].rwa == pytest.approx(3_700.0)
    assert ciu_wwr_rows["F1_CIU_H3"].rwa == pytest.approx(1_250.0)


def test_saccr_alpha_carve_out(ciu_wwr_rows):
    # CRR Art.274(2) second sub-paragraph: pension-scheme counterparty →
    # alpha = 1.0. EAD = 1.0 × (10,000 + 0.005 × 1,000,000) = 15,000
    # (the standard alpha would give 21,000).
    assert ciu_wwr_rows["NS_PSA_CCR"].ead == pytest.approx(15_000.0)


# ---------------------------------------------------------------------------
# B3.1 revised real-estate treatment (PS1/26 Art.124E-124K)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def b31_re_rows(spark):
    cps = spark.createDataFrame(
        [
            # natural person; no property count declared
            ("CP_R1", "individual", 0, True, 0.0, False, None),
            # CQS2 corporate
            ("CP_R2", "corporate", 2, False, 0.0, False, None),
            # natural person financing FOUR residential properties —
            # breaches the Art.124E(1)(b) limit of three
            ("CP_R3", "individual", 0, True, 0.0, False, 4),
            # natural person at exactly the limit — stays owner-occupied
            ("CP_R4", "individual", 0, True, 0.0, False, 3),
            # CQS5 corporate (150% ladder weight)
            ("CP_R5", "corporate", 5, False, 0.0, False, None),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, qualifying_property_count int",
    )
    loans = spark.createDataFrame(
        [
            # ref, cp, drawn, ltv, income, commercial, junior, adc, presold, prior
            ("L_INC", "CP_R1", 1000.0, 0.65, True, False, False, False, False, 0.0),
            ("L_JUN", "CP_R1", 1000.0, 0.65, True, False, True, False, False, 0.0),
            ("L_SPL", "CP_R1", 1000.0, 1.10, False, False, False, False, False, 0.0),
            ("L_CSP", "CP_R2", 1000.0, 1.10, False, True, False, False, False, 0.0),
            ("L_ADC", "CP_R2", 1000.0, 0.80, False, False, False, True, False, 0.0),
            ("L_ADP", "CP_R2", 1000.0, 0.80, False, False, False, True, True, 0.0),
            # person CRE general — keeps the Art.124H(1-2) loan split
            ("L_CSP2", "CP_R1", 1000.0, 1.10, False, True, False, False, False, 0.0),
            # three-property re-route (count 4) vs at-limit (count 3)
            ("L_3P4", "CP_R3", 1000.0, 0.65, False, False, False, False, False, 0.0),
            ("L_3P3", "CP_R4", 1000.0, 1.10, False, False, False, False, False, 0.0),
            # Art.124I(3) junior income-CRE absolute weights
            ("L_CJN", "CP_R2", 1000.0, 0.65, True, True, True, False, False, 0.0),
            ("L_CJH", "CP_R2", 1000.0, 0.85, True, True, True, False, False, 0.0),
            # Art.124H(3) with a cp weight between floor and income cap
            ("L_CH3", "CP_R5", 1000.0, 1.10, False, True, False, False, False, 0.0),
            # Art.124F(2): prior charge shrinks the RRE split threshold
            ("L_PRI", "CP_R1", 1000.0, 1.10, False, False, False, False, False, 0.30),
        ],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "ltv double, is_income_producing boolean, is_commercial_re boolean, "
        "is_junior_lien boolean, is_adc boolean, is_presold boolean, "
        "prior_charge_ltv double",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
        "true AS is_property_secured", "ltv", "is_income_producing",
        "is_commercial_re", "is_junior_lien", "is_adc", "is_presold",
        "prior_charge_ltv",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans), PipelineConfig(pack=B31_PACK)
    )
    return {r.exposure_reference: r for r in out.results.collect()}


def test_b31_rre_income_ltv_band(b31_re_rows):
    # PS1/26 Art.124G Table 6B: income-producing RRE, LTV 0.65 sits in the
    # (0.60, 0.70] band → whole-loan RW 40%; RWA = 1000 × 0.40 = 400.
    r = b31_re_rows["L_INC"]
    assert r.rw_source == "b31_rre_income_ltv"
    assert r.risk_weight == pytest.approx(0.40)
    assert r.rwa == pytest.approx(400.0)


def test_b31_rre_income_junior_multiplier(b31_re_rows):
    # Art.124G(2): junior lien with LTV 0.65 > 50% → 0.40 × 1.25 = 0.50.
    r = b31_re_rows["L_JUN"]
    assert r.risk_weight == pytest.approx(0.50)
    assert r.rwa == pytest.approx(500.0)


def test_b31_rre_general_loan_split(b31_re_rows):
    # Art.124F(1): LTV 1.10 → secured share = 0.55/1.10 = 0.50 at 20%;
    # remainder 0.50 prices as an exposure to the natural person → 75%.
    # Effective RW = 0.5×0.20 + 0.5×0.75 = 0.475; RWA = 475.
    r = b31_re_rows["L_SPL"]
    assert r.rw_source == "b31_rre_loan_split"
    assert r.risk_weight == pytest.approx(0.475)
    assert r.rwa == pytest.approx(475.0)


def test_b31_cre_art124h3_corporate_no_split(b31_re_rows):
    # Art.124H(3): general CRE to a CORPORATE cannot loan-split — it takes
    # max(60%, min(counterparty RW, Art.124I base income RW)). CQS2 carries
    # 50%, income base at LTV 1.10 is 110% → min = 50%, floored at 60%.
    # (The split would have given 0.5×0.60 + 0.5×0.50 = 55% — the ADVICE-r5
    # capital under-weight this scenario pins shut.)
    r = b31_re_rows["L_CSP"]
    assert r.rw_source == "b31_cre_art124h3"
    assert r.risk_weight == pytest.approx(0.60)
    assert r.rwa == pytest.approx(600.0)


def test_b31_cre_art124h3_between_floor_and_cap(b31_re_rows):
    # Art.124H(3) with CQS5 (150%): min(1.50, income base 1.10) = 1.10,
    # above the 60% floor → 110%.
    r = b31_re_rows["L_CH3"]
    assert r.rw_source == "b31_cre_art124h3"
    assert r.risk_weight == pytest.approx(1.10)


def test_b31_cre_general_loan_split_person(b31_re_rows):
    # Art.124H(1-2): a natural person DOES loan-split — secured 0.50 at
    # 60%; remainder at the person's retail 75%.
    # RW = 0.5×0.60 + 0.5×0.75 = 0.675.
    r = b31_re_rows["L_CSP2"]
    assert r.rw_source == "b31_cre_loan_split"
    assert r.risk_weight == pytest.approx(0.675)


def test_b31_three_property_reroute(b31_re_rows):
    # Art.124E(1)(b)/(2): a natural person financing FOUR residential
    # properties is materially dependent on property cash flows — the
    # general RRE loan re-routes to the Art.124G income-producing
    # whole-loan track: LTV 0.65 → band (0.60, 0.70] → 40% whole-loan,
    # with its own audit leg.
    r = b31_re_rows["L_3P4"]
    assert r.rw_source == "b31_rre_three_property"
    assert r.risk_weight == pytest.approx(0.40)
    assert r.rwa == pytest.approx(400.0)


def test_b31_three_property_at_limit_stays_split(b31_re_rows):
    # Boundary is strict >3: exactly three financed properties keeps the
    # owner-occupied Art.124F loan split (0.5×0.20 + 0.5×0.75 = 0.475).
    r = b31_re_rows["L_3P3"]
    assert r.rw_source == "b31_rre_loan_split"
    assert r.risk_weight == pytest.approx(0.475)


def test_b31_cre_income_junior_absolute(b31_re_rows):
    # Art.124I(3): junior income-CRE takes ABSOLUTE weights replacing the
    # base bands — LTV 0.65 → 125% (not base 100% and not 100%×1.25 via a
    # multiplier reading); LTV 0.85 → 137.5% (not 110%×1.375 = 151.25%).
    assert b31_re_rows["L_CJN"].rw_source == "b31_cre_income_ltv"
    assert b31_re_rows["L_CJN"].risk_weight == pytest.approx(1.25)
    assert b31_re_rows["L_CJH"].risk_weight == pytest.approx(1.375)


def test_b31_prior_charge_shrinks_split_threshold(b31_re_rows):
    # Art.124F(2): a 30% prior charge reduces the preferential threshold to
    # 25% of property value: secured share = 0.25/1.10, RW =
    # (0.25/1.1)×0.20 + (1 − 0.25/1.1)×0.75 = 0.625 (vs 0.475 unreduced).
    r = b31_re_rows["L_PRI"]
    assert r.rw_source == "b31_rre_loan_split"
    assert r.risk_weight == pytest.approx(0.625)


def test_b31_adc_flat_and_presold(b31_re_rows):
    # Art.124K(1): ADC 150% flat regardless of LTV; Art.124K(2): the
    # qualifying residential pre-sold concession prices at 100%.
    assert b31_re_rows["L_ADC"].risk_weight == pytest.approx(1.50)
    assert b31_re_rows["L_ADC"].rw_source == "b31_adc"
    assert b31_re_rows["L_ADP"].risk_weight == pytest.approx(1.00)
    assert b31_re_rows["L_ADP"].rw_source == "b31_adc_presold"


def test_b31_other_re_art124j(spark):
    # Art.124J non-qualifying RE: income-dependent 150% flat; non-dependent
    # RESI at the counterparty weight with NO floor (person → 75%);
    # non-dependent CRE at max(60%, counterparty weight) — CQS2 corporate
    # carries 50%, so the 60% floor binds. LTV is deliberately NULL on the
    # RESI row: a property failing Art.124A may carry no valuation, and the
    # treatment must price without one.
    cps = spark.createDataFrame(
        [
            ("CP_X1", "individual", 0, True, 0.0, False),
            ("CP_X2", "corporate", 2, False, 0.0, False),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [
            ("L_OIN", "CP_X2", 1000.0, 0.70, True, False),
            ("L_ORS", "CP_X1", 1000.0, None, False, False),
            ("L_OCR", "CP_X2", 1000.0, 0.70, False, True),
        ],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "ltv double, is_income_producing boolean, is_commercial_re boolean",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
        "true AS is_property_secured", "true AS is_other_re", "ltv",
        "is_income_producing", "is_commercial_re",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans), PipelineConfig(pack=B31_PACK)
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    assert rows["L_OIN"].risk_weight == pytest.approx(1.50)
    assert rows["L_OIN"].rw_source == "b31_other_re_income"
    assert rows["L_ORS"].risk_weight == pytest.approx(0.75)
    assert rows["L_ORS"].rw_source == "b31_other_re_resi"
    assert rows["L_OCR"].risk_weight == pytest.approx(0.60)  # floor binds over 50%
    assert rows["L_OCR"].rw_source == "b31_other_re_cre"


def test_b31_art124l_counterparty_type_table(spark):
    # PS1/26 Art.124L: the general-RE loan-split REMAINDER prices by
    # counterparty type. All loans LTV 1.10 → secured share 0.55/1.10 = 0.5.
    # Round-9 two-path update (Art.123A(1)(a)): an under-threshold SME
    # AUTO-qualifies as retail with no pool attestation, so limb (b) 85%
    # is reached only by an OVER-threshold SME.
    #  - L_SME: turnover-SME (10m < 50m), NOT retail-managed, under the
    #    Art.123A threshold → auto-qualifies, limb (a) 75%.
    #    RRE split = 0.5×0.20 + 0.5×0.75 = 0.475.
    #  - L_OTS: the same SME shape with a 2m book — OVER the 1m aggregate
    #    threshold → limb (b) 85%. Split = 0.5×0.20 + 0.5×0.85 = 0.525.
    #  - L_RSM: retail-qualifying SME (managed as retail, under the Art.123
    #    threshold) → limb (a) 75%. Split = 0.475.
    #  - L_SOC: registered social housing, CQS2 corporate (unsecured 50%),
    #    non-SME with an explicit managed=False (limb b(iii) disqualifies)
    #    → limb (c) max(75%, 50%) = 75% — the floor LIFTS the residual.
    #    Split = 0.475 (would be 0.35 on the raw counterparty weight).
    #  - L_SCR: balance-sheet-SME (assets 30m < 43m, turnover absent) with
    #    COMMERCIAL property: the Art.124H(3) gate widens to any SME, so
    #    the row keeps the split — with the auto-qualified limb (a) 75%
    #    residual = 0.5×0.60 + 0.5×0.75 = 0.675 — instead of
    #    H3's max(60%, min(50%, 110%)) = 60%.
    #  - L_ORS: other-RE RESI non-dependent to the auto-qualified SME →
    #    the Art.124J limb consumes the same table, UNFLOORED → 75% flat.
    cps = spark.createDataFrame(
        [
            ("CP_SME", "corporate", 2, False, 10_000_000.0, 0.0, False, False),
            ("CP_OTS", "corporate", 2, False, 10_000_000.0, 0.0, False, False),
            ("CP_RSM", "corporate", 2, True, 10_000_000.0, 0.0, False, False),
            ("CP_SOC", "corporate", 2, False, 0.0, 0.0, True, False),
            ("CP_BSH", "corporate", 2, False, 0.0, 30_000_000.0, False, False),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "total_assets double, is_social_housing boolean, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [
            ("L_SME", "CP_SME", 1000.0, False, False),
            ("L_OTS", "CP_OTS", 2_000_000.0, False, False),
            ("L_RSM", "CP_RSM", 1000.0, False, False),
            ("L_SOC", "CP_SOC", 1000.0, False, False),
            ("L_SCR", "CP_BSH", 1000.0, True, False),
            ("L_ORS", "CP_SME", 1000.0, False, True),
        ],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_commercial_re boolean, is_other_re boolean",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
        "true AS is_property_secured", "CAST(1.10 AS DOUBLE) AS ltv",
        "false AS is_income_producing", "is_commercial_re", "is_other_re",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans), PipelineConfig(pack=B31_PACK)
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    assert rows["L_SME"].risk_weight == pytest.approx(0.475)
    assert rows["L_SME"].rw_source == "b31_rre_loan_split"
    assert rows["L_OTS"].risk_weight == pytest.approx(0.525)
    assert rows["L_OTS"].rw_source == "b31_rre_loan_split"
    assert rows["L_RSM"].risk_weight == pytest.approx(0.475)
    assert rows["L_SOC"].risk_weight == pytest.approx(0.475)
    assert rows["L_SCR"].risk_weight == pytest.approx(0.675)
    assert rows["L_SCR"].rw_source == "b31_cre_loan_split"
    assert rows["L_ORS"].risk_weight == pytest.approx(0.75)
    assert rows["L_ORS"].rw_source == "b31_other_re_resi"


def test_b31_sa_specialised_lending_art122a(spark):
    # PS1/26 Art.122A-122B: unrated SL prices on the type table — project
    # finance pre-operational 130%; rated SL keeps its Art.122A(3)
    # corporate CQS weight (CQS2 → 50%); Art.139(2B) disapplies a
    # non-issue-specific rating, re-routing the row through the unrated
    # table (high-quality operational project finance → 80%).
    cps = spark.createDataFrame(
        [
            ("CP_S1", "corporate", 0, False, 0.0, False, True),
            ("CP_S2", "corporate", 2, False, 0.0, False, True),
            ("CP_S3", "corporate", 2, False, 0.0, False, False),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, external_rating_is_issue_specific boolean",
    )
    sl = spark.createDataFrame(
        [
            ("CP_S1", None, "project_finance", "pre_operational"),
            ("CP_S2", None, "object_finance", None),
            ("CP_S3", None, "project_finance", "high_quality_operational"),
        ],
        "counterparty_reference string, slot_category string, sl_type string, "
        "sl_project_phase string",
    )
    loans = spark.createDataFrame(
        [("L_S1", "CP_S1", 1000.0), ("L_S2", "CP_S2", 1000.0),
         ("L_S3", "CP_S3", 1000.0)],
        "loan_reference string, counterparty_reference string, drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans, specialised_lending=sl),
        PipelineConfig(pack=B31_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    assert rows["L_S1"].risk_weight == pytest.approx(1.30)
    assert rows["L_S1"].rw_source == "b31_sa_sl_project_finance_pre_operational"
    assert rows["L_S2"].risk_weight == pytest.approx(0.50)
    assert rows["L_S2"].rw_source == "sa_cqs_lookup"
    assert rows["L_S3"].risk_weight == pytest.approx(0.80)
    assert rows["L_S3"].rw_source == "b31_sa_sl_project_finance_high_quality"


def test_b31_post_model_adjustments_sequencing(spark):
    # PS1/26 Art.154(4A): one retail-mortgage IRB loan, PD 0.0005 floored
    # to the Art.163(1)(b) retail-MORTGAGE 0.0010 floor, LGD 0.25 (above
    # the Art.164(4)(a) 5% RRE floor), EAD 1000. Retail mortgage R = 0.15,
    # no maturity adjustment, scaling 1.0. The modelled RW lands ~2.6%,
    # far below the 10% floor, so with PMA 5% / unrecognised 2% / EL 10%:
    #   mortgage_adj = (0.10 − rw_model) × 1000
    #   post-floor base = 100.0 exactly; general PMA = 5.0; unrec = 2.0
    #   rwa (pre output floor) = 107.0 — scalars on the PRE-floor base
    #   would give less, which is the ordering error this pins.
    cps = spark.createDataFrame(
        [("CP1", "individual", 0, True, 0.0, True, "mortgage")],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, retail_subtype string",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, 0.0005, 0.25, None)],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "pd double, lgd double, effective_maturity double",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "pd", "lgd", "effective_maturity",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(
            pack=B31_PACK, pma_rwa_scalar=0.05, pma_el_scalar=0.10,
            pma_unrecognised_scalar=0.02,
        ),
    )
    r = out.results.collect()[0]
    assert r.mortgage_rw_floor_adjustment == pytest.approx(
        (0.10 - r.rwa_pre_adjustments / 1000.0) * 1000.0
    )
    post_floor = r.rwa_pre_adjustments + r.mortgage_rw_floor_adjustment
    assert post_floor == pytest.approx(100.0)
    assert r.post_model_adjustment_rwa == pytest.approx(5.0)
    assert r.unrecognised_exposure_adjustment == pytest.approx(2.0)
    # rwa_pre_floor is the post-PMA, pre-OUTPUT-floor figure
    assert r.rwa_pre_floor == pytest.approx(107.0)
    # EL prices on the FLOORED PD (retail-mortgage floor 0.0010)
    assert r.el_pre_adjustment == pytest.approx(0.0010 * 0.25 * 1000.0)
    assert r.post_model_adjustment_el == pytest.approx(r.el_pre_adjustment * 0.10)
    assert r.el_after_adjustment == pytest.approx(r.el_pre_adjustment * 1.10)
    # expected_loss keeps the PRE-PMA value (the reference's contract)
    assert r.expected_loss == pytest.approx(r.el_pre_adjustment)


def test_pma_mortgage_floor_excludes_commercial_re(spark):
    # PS1/26 Art.154(4A)(b) scopes the 10% RW floor to RESIDENTIAL
    # mortgages (ref irb/adjustments.py is_mortgage = class contains
    # MORTGAGE|RESIDENTIAL): a commercial-RE-secured IRB row with modelled
    # RW below 10% must NOT be floored, while its residential twin is.
    def book(commercial):
        cps = spark.createDataFrame(
            [("CP1", "corporate", 2, False, 0.0, True)],
            "counterparty_reference string, entity_type string, cqs int, "
            "is_managed_as_retail boolean, annual_revenue double, "
            "has_irb_permission boolean",
        )
        loans = spark.createDataFrame(
            [("L1", "CP1", 1000.0, 0.0005, 0.25, 1.0, True, commercial)],
            "loan_reference string, counterparty_reference string, "
            "drawn_amount double, pd double, lgd double, "
            "effective_maturity double, is_property_secured boolean, "
            "is_commercial_re boolean",
        ).selectExpr(
            "loan_reference", "counterparty_reference", "drawn_amount",
            "false AS is_defaulted", "pd", "lgd", "effective_maturity",
            "is_property_secured", "is_commercial_re",
        )
        out = run_pipeline(
            RawBundle(counterparties=cps, loans=loans),
            PipelineConfig(pack=B31_PACK, pma_rwa_scalar=0.05),
        )
        return out.results.collect()[0]

    resi, comm = book(False), book(True)
    assert resi.exposure_class == "re_secured"
    assert comm.exposure_class == "re_secured"
    # same model parameters ⇒ identical pre-adjustment RWA, below the floor
    assert comm.rwa_pre_adjustments == pytest.approx(resi.rwa_pre_adjustments)
    assert resi.rwa_pre_adjustments / 1000.0 < 0.10
    assert resi.mortgage_rw_floor_adjustment == pytest.approx(
        (0.10 - resi.rwa_pre_adjustments / 1000.0) * 1000.0
    )
    assert comm.mortgage_rw_floor_adjustment == pytest.approx(0.0)
    # the PMA scalar then prices on the UN-inflated base for commercial
    assert comm.post_model_adjustment_rwa == pytest.approx(
        comm.rwa_pre_adjustments * 0.05
    )


def test_pma_zero_columns_under_crr(spark):
    # CRR applies no post-model adjustments: zero-valued columns, EL twins
    # alias the unadjusted figure, rwa untouched.
    cps = spark.createDataFrame(
        [("CP1", "corporate", 2, False, 0.0, True)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, 0.01, 0.45, 2.5)],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "pd double, lgd double, effective_maturity double",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "pd", "lgd", "effective_maturity",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(pack=CRR_PACK, pma_rwa_scalar=0.05),
    )
    r = out.results.collect()[0]
    assert r.mortgage_rw_floor_adjustment == pytest.approx(0.0)
    assert r.post_model_adjustment_rwa == pytest.approx(0.0)
    assert r.rwa_pre_adjustments == pytest.approx(r.rwa_pre_floor)
    assert r.el_after_adjustment == pytest.approx(r.expected_loss)
