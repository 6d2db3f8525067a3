"""Round-7 per-class IRB PD floors + A-IRB LGD input floors (ref
engine/irb/formulas.py _pd_floor_expression / _lgd_floor_blended_expression
+ rulebook/packs/{crr,b31}.py pd_floors / lgd_floors):

- CRR Art.160(1)/163(1): the 0.03% floor reaches corporates/institutions
  and retail — central governments/central banks are reached by NEITHER
  article, so sovereign IRB PDs are UNFLOORED under CRR.
- PS1/26 (BCBS CRE30.55): differentiated PD floors — retail mortgages and
  QRRE revolvers 0.10%, QRRE transactors and everything else 0.05%.
- PS1/26 Art.161(5)/164(4): A-IRB LGD input floors — 25% corporate
  unsecured, 5% retail-RRE, 50% QRRE, 30% other retail; where recognised
  funded protection exists, the floor is the Art.161(5)(b) blend of
  per-collateral-type LGDS over the Art.230(1) CCF=100% basis.
- Guarantor PD substitution floors key on the GUARANTOR's class
  (Art.160(4)) — a sovereign guarantor's PD is unfloored under CRR.
"""

from __future__ import annotations

import math
from statistics import NormalDist

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK

_N = NormalDist()


def _book(spark, entity, pd, lgd, *, subtype=None, transactor=None,
          managed_retail=False, collateral=None, pack=CRR_PACK):
    cp_cols = [
        "counterparty_reference string", "entity_type string", "cqs int",
        "is_managed_as_retail boolean", "annual_revenue double",
        "has_irb_permission boolean",
    ]
    cp_row = ["CP1", entity, 2, managed_retail, 0.0, True]
    if subtype is not None:
        cp_cols.append("retail_subtype string")
        cp_row.append(subtype)
    if transactor is not None:
        cp_cols.append("is_qrre_transactor boolean")
        cp_row.append(transactor)
    cps = spark.createDataFrame([tuple(cp_row)], ", ".join(cp_cols))
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, pd, lgd, 2.5)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, pd double, lgd double, effective_maturity double",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "pd", "lgd", "effective_maturity",
    )
    coll = links = None
    if collateral is not None:
        coll = spark.createDataFrame(
            [(ref, ctype, mv, 0.0, False) for ref, _, ctype, mv in collateral],
            "collateral_reference string, collateral_type string, "
            "market_value double, haircut double, currency_mismatch boolean",
        )
        links = spark.createDataFrame(
            [(ref, exp) for ref, exp, _, _ in collateral],
            "collateral_reference string, exposure_reference string",
        )
    out = run_pipeline(
        RawBundle(
            counterparties=cps, loans=loans, collateral=coll,
            collateral_links=links,
        ),
        PipelineConfig(pack=pack),
    )
    return out.results.collect()[0]


def test_crr_sovereign_pd_unfloored(spark):
    # CRR: no article floors a central-government PD — 0.0001 stands
    r = _book(spark, "sovereign", 0.0001, 0.45)
    assert r.irb_pd_floor == pytest.approx(0.0)
    assert r.irb_pd_floored == pytest.approx(0.0001)


def test_crr_corporate_pd_floor_unchanged(spark):
    r = _book(spark, "corporate", 0.0001, 0.45)
    assert r.irb_pd_floor == pytest.approx(0.0003)
    assert r.irb_pd_floored == pytest.approx(0.0003)


def test_b31_qrre_revolver_vs_transactor_pd_floor(spark):
    # CRE30.55: transactors 0.05%, revolvers 0.10%; absent carrier is
    # tested through the revolver=False path here, conservative default
    # is pinned by the mortgage floor in the PMA acceptance test
    rev = _book(
        spark, "individual", 0.0004, 0.60, subtype="qrre",
        transactor=False, managed_retail=True, pack=B31_PACK,
    )
    tra = _book(
        spark, "individual", 0.0004, 0.60, subtype="qrre",
        transactor=True, managed_retail=True, pack=B31_PACK,
    )
    assert rev.irb_pd_floored == pytest.approx(0.0010)
    assert tra.irb_pd_floored == pytest.approx(0.0005)


def test_b31_retail_lgd_floors_by_subtype(spark):
    # Art.164(4): QRRE unsecured 50%, other retail 30% — both BIND on a
    # modelled LGD of 0.20; mortgage RRE floor is 5% so 0.20 stands
    qrre = _book(
        spark, "individual", 0.01, 0.20, subtype="qrre",
        transactor=True, managed_retail=True, pack=B31_PACK,
    )
    other = _book(
        spark, "individual", 0.01, 0.20, subtype="other",
        managed_retail=True, pack=B31_PACK,
    )
    mort = _book(
        spark, "individual", 0.01, 0.20, subtype="mortgage",
        managed_retail=True, pack=B31_PACK,
    )
    assert qrre.irb_lgd_floored == pytest.approx(0.50)
    assert other.irb_lgd_floored == pytest.approx(0.30)
    assert mort.irb_lgd_floored == pytest.approx(0.20)
    assert mort.irb_lgd_floor == pytest.approx(0.05)


def test_b31_blended_lgd_floor_with_financial_collateral(spark):
    # Art.161(5)(b): a corporate A-IRB row with recognised cash collateral
    # floors on the blend (unsec/E)·25% + (fin/E)·0% — NOT the flat 25%.
    # Cash takes no haircut, so 400 of the 1000 drawn is financial:
    # floor = 0.6·0.25 = 0.15; modelled LGD 0.18 >= 0.15 stands.
    r = _book(
        spark, "corporate", 0.01, 0.18, pack=B31_PACK,
        collateral=[("C1", "L1", "cash", 400.0)],
    )
    assert r.collateral_financial_value == pytest.approx(400.0)
    assert r.irb_lgd_floor == pytest.approx(0.6 * 0.25)
    assert r.irb_lgd_floored == pytest.approx(0.18)


def test_b31_blended_floor_binds_below_flat(spark):
    # same book, modelled LGD 0.10: the blend (0.15) binds — the old flat
    # 25% would have overstated the floored LGD
    r = _book(
        spark, "corporate", 0.01, 0.10, pack=B31_PACK,
        collateral=[("C1", "L1", "cash", 400.0)],
    )
    assert r.irb_lgd_floored == pytest.approx(0.6 * 0.25)


def test_crr_no_lgd_floor(spark):
    # CRR has no A-IRB LGD input floors — a modelled 0.05 stands
    r = _book(spark, "corporate", 0.01, 0.05)
    assert r.irb_lgd_floor == pytest.approx(0.0)
    assert r.irb_lgd_floored == pytest.approx(0.05)


def test_crr_sovereign_guarantor_pd_unfloored(spark):
    # Art.160(4): the guaranteed slice is a direct exposure to the
    # guarantor, so the GUARANTOR's class floor governs — a sovereign
    # guarantor's modelled PD 0.0001 is unfloored under CRR and the
    # covered leg re-prices on it
    cps = spark.createDataFrame(
        [("CP1", "corporate", 3, False, 2.0e8, True)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, 0.01, 0.45, 2.5)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, pd double, lgd double, effective_maturity double",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "pd", "lgd", "effective_maturity",
    )
    gtees = spark.createDataFrame(
        [("G1", "L1", 0.5, "sovereign", 1, "GA", 0.0001, "senior")],
        "guarantee_reference string, exposure_reference string, "
        "coverage_pct double, guarantor_class string, guarantor_cqs int, "
        "guarantor_reference string, guarantor_pd double, "
        "guarantor_seniority string",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans, guarantees=gtees),
        PipelineConfig(pack=CRR_PACK),
    )
    r = out.results.collect()[0]

    def vasicek(pd, lgd, m=2.5, scaling=1.06):
        w = (1.0 - math.exp(-50.0 * pd)) / (1.0 - math.exp(-50.0))
        rr = 0.12 * w + 0.24 * (1.0 - w)
        k = lgd * _N.cdf(
            (_N.inv_cdf(pd) + math.sqrt(rr) * _N.inv_cdf(0.999)) / math.sqrt(1.0 - rr)
        ) - pd * lgd
        b = (0.11852 - 0.05478 * math.log(pd)) ** 2
        ma = (1.0 + (m - 2.5) * b) / (1.0 - 1.5 * b)
        return k * ma * 12.5 * scaling

    own = vasicek(0.01, 0.45)
    rw_g = vasicek(0.0001, 0.45)  # UNFLOORED guarantor PD
    assert r.risk_weight == pytest.approx(0.5 * own + 0.5 * rw_g, rel=1e-9)
