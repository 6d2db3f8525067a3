"""Round-9 Art.147(3)/(4)(b) IRB class equivalence (ref rulebook/packs/
common.py entity_type_to_irb_class + data/schemas.py RGLA_PSE_ENTITY_TYPES
+ engine/entity_class_maps.py):

- Art.147(3): MDBs and international organisations take the
  central-government IRB treatment — under CRR that means the PD is
  UNFLOORED (Art.160(1) reaches corporates/institutions only).
- Art.147(4)(b): institution-leg RGLA/PSE obligors take the institution
  treatment (0.03% CRR floor).
- The SA exposure_class on the ledger is untouched — the routing is IRB
  floor/formula selection only (mirrors the reference's post-approach
  exposure_class alignment, which rewrites the class the IRB calculator
  sees while the classifier's SA class stays).
"""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK


def _row(spark, entity, pd=0.0001):
    cps = spark.createDataFrame(
        [("CP1", entity, 2, False, 2.0e8, True)],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [("L1", "CP1", 1000.0, pd, 0.45, 2.5)],
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double, pd double, lgd double, effective_maturity double",
    ).selectExpr(
        "loan_reference", "counterparty_reference", "drawn_amount",
        "false AS is_defaulted", "pd", "lgd", "effective_maturity",
    )
    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(pack=CRR_PACK),
    )
    return out.results.collect()[0]


@pytest.mark.parametrize("entity", ["mdb", "mdb_named", "international_organisation"])
def test_mdb_and_io_take_cgcb_unfloored_pd(spark, entity):
    r = _row(spark, entity)
    assert r.irb_pd_floor == pytest.approx(0.0)
    assert r.irb_pd_floored == pytest.approx(0.0001)


@pytest.mark.parametrize("entity,sa_class", [("pse", "pse"), ("rgla", "rgla")])
def test_institution_leg_pse_rgla_floor_as_institution(spark, entity, sa_class):
    r = _row(spark, entity)
    assert r.exposure_class == sa_class  # SA class untouched on the ledger
    assert r.irb_pd_floor == pytest.approx(0.0003)
    assert r.irb_pd_floored == pytest.approx(0.0003)


def test_sa_class_survives_on_mdb_ledger_row(spark):
    r = _row(spark, "mdb_named")
    assert r.exposure_class == "mdb"
    assert r.rw_source.startswith("irb_vasicek")
