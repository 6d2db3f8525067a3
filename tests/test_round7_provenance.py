"""Round-7 ledger widening: facility-path carriers and CRM-inheritance
provenance (ref CALCULATION_OUTPUT_SCHEMA data/schemas.py:2911-2929 —
root_facility_reference / facility_hierarchy_path / ancestor_facilities +
collateral/guarantee/provision source-level, inherited-from, allocation
method and crm_allocation_notes; engine/crm/processor.py
_build_exposure_lookups levels; engine/stages/hierarchy/graph.py:180-305)."""

from __future__ import annotations

import pytest

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK


def _cps(spark, refs=("CP1",)):
    return spark.createDataFrame(
        [(r, "corporate", 2, False, 0.0, False) for r in refs],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean",
    )


def _loans(spark, rows):
    return spark.createDataFrame(
        rows,
        "loan_reference string, counterparty_reference string, "
        "drawn_amount double",
    ).selectExpr(
        "*", "false AS is_defaulted", "CAST(NULL AS DOUBLE) AS pd",
        "CAST(NULL AS DOUBLE) AS lgd",
        "CAST(NULL AS DOUBLE) AS effective_maturity",
    )


def _fmap(spark, rows):
    return spark.createDataFrame(
        rows,
        "child_reference string, child_type string, "
        "parent_facility_reference string",
    )


def test_facility_path_carriers_two_level_chain(spark):
    # L1 → FAC1 → ROOT: ancestors parent-first, path root→exposure,
    # depth = levels below root; a parentless loan is its own 1-element
    # path at depth 0
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 1000.0), ("L2", "CP1", 400.0)]),
            facility_mappings=_fmap(
                spark,
                [("L1", "loan", "FAC1"), ("FAC1", "facility", "ROOT")],
            ),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    r1, r2 = rows["L1"], rows["L2"]
    assert r1.exposure_has_parent is True
    assert r1.parent_facility_reference == "FAC1"
    assert r1.ancestor_facilities == ["FAC1", "ROOT"]
    assert r1.root_facility_reference == "ROOT"
    assert r1.facility_hierarchy_depth == 2
    assert r1.facility_hierarchy_path == ["ROOT", "FAC1", "L1"]
    assert r2.exposure_has_parent is False
    assert r2.parent_facility_reference is None
    assert r2.ancestor_facilities is None
    assert r2.root_facility_reference is None
    assert r2.facility_hierarchy_depth == 0
    assert r2.facility_hierarchy_path == ["L2"]


def test_facility_path_single_level_fallback(spark):
    # a parent that never appears in the facility-edge graph still yields
    # the 1-element legacy chain (ref graph.py:301 fallback)
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 1000.0)]),
            facility_mappings=_fmap(spark, [("L1", "loan", "FACX")]),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    r = out.results.collect()[0]
    assert r.ancestor_facilities == ["FACX"]
    assert r.root_facility_reference == "FACX"
    assert r.facility_hierarchy_depth == 1
    assert r.facility_hierarchy_path == ["FACX", "L1"]


def _coll(spark, rows):
    return spark.createDataFrame(
        rows,
        "collateral_reference string, collateral_type string, "
        "market_value double",
    ).selectExpr("*", "CAST(0.0 AS DOUBLE) AS haircut",
                 "false AS currency_mismatch")


def _links(spark, rows):
    return spark.createDataFrame(
        rows,
        "collateral_reference string, exposure_reference string, "
        "beneficiary_type string, beneficiary_reference string",
    )


def test_collateral_provenance_three_levels(spark):
    # CP1: L1 (600) and L2 (400) under FAC1; direct cash on L1, a
    # facility-level pledge on FAC1, a counterparty-level pledge on CP1.
    # L1 takes the direct level (priority), L2 inherits facility-first.
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 600.0), ("L2", "CP1", 400.0)]),
            facility_mappings=_fmap(
                spark, [("L1", "loan", "FAC1"), ("L2", "loan", "FAC1")]
            ),
            collateral=_coll(
                spark,
                [("CD1", "cash", 100.0), ("CF1", "cash", 200.0),
                 ("CC1", "cash", 50.0)],
            ),
            collateral_links=_links(
                spark,
                [
                    ("CD1", "L1", "exposure", None),
                    ("CF1", None, "facility", "FAC1"),
                    ("CC1", None, "counterparty", "CP1"),
                ],
            ),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    r1, r2 = rows["L1"], rows["L2"]
    # facility pledge splits 60/40 by EAD; cp pledge likewise
    assert r1.collateral_value == pytest.approx(100.0 + 120.0 + 30.0)
    assert r2.collateral_value == pytest.approx(80.0 + 20.0)
    assert r1.collateral_source_level == "exposure"
    assert r1.collateral_inherited_from is None
    assert r1.collateral_allocation_method == "direct"
    assert r2.collateral_source_level == "facility"
    assert r2.collateral_inherited_from == "FAC1"
    assert r2.collateral_allocation_method == "pro_rata"
    assert "collateral@exposure/direct" in r1.crm_allocation_notes
    assert "collateral@facility/pro_rata<-FAC1" in r2.crm_allocation_notes


def test_collateral_facility_pledge_cascades_to_grandchildren(spark):
    # pledge at the ROOT facility reaches exposures parented two levels
    # down (the closure cascade), and the inherited-from names the pledged
    # beneficiary, not the direct parent
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 500.0), ("L2", "CP1", 500.0)]),
            facility_mappings=_fmap(
                spark,
                [
                    ("L1", "loan", "FAC1"),
                    ("L2", "loan", "FAC2"),
                    ("FAC1", "facility", "ROOT"),
                    ("FAC2", "facility", "ROOT"),
                ],
            ),
            collateral=_coll(spark, [("CG1", "cash", 300.0)]),
            collateral_links=_links(
                spark, [("CG1", None, "facility", "ROOT")]
            ),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    for r in rows.values():
        assert r.collateral_value == pytest.approx(150.0)
        assert r.collateral_source_level == "facility"
        assert r.collateral_inherited_from == "ROOT"
        assert r.collateral_allocation_method == "pro_rata"


def test_direct_collateral_split_is_pro_rata(spark):
    # ONE exposure-level item linked to two beneficiaries is allocation
    # method pro_rata even though the source level stays "exposure"
    links = spark.createDataFrame(
        [("C1", "L1"), ("C1", "L2")],
        "collateral_reference string, exposure_reference string",
    )
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 600.0), ("L2", "CP1", 400.0)]),
            collateral=_coll(spark, [("C1", "cash", 100.0)]),
            collateral_links=links,
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    for r in rows.values():
        assert r.collateral_source_level == "exposure"
        assert r.collateral_allocation_method == "pro_rata"
        assert r.collateral_inherited_from is None


def test_provision_and_guarantee_provenance(spark):
    provisions = spark.createDataFrame(
        [
            ("L1", "exposure", 50.0, "P1", "scra"),
            ("CP1", "counterparty", 100.0, "P2", "gcra"),
        ],
        "beneficiary_reference string, beneficiary_type string, "
        "amount double, provision_reference string, provision_type string",
    )
    gtees = spark.createDataFrame(
        [("L2", 0.5, "institution", 1, "GCP", "G1")],
        "exposure_reference string, coverage_pct double, guarantor_class "
        "string, guarantor_cqs int, guarantor_reference string, "
        "guarantee_reference string",
    )
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 600.0), ("L2", "CP1", 400.0)]),
            provisions=provisions,
            guarantees=gtees,
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    r1, r2 = rows["L1"], rows["L2"]
    # L1 has a direct provision → exposure-level, not inherited (the cp
    # pot ALSO contributes, but direct wins the source-level priority)
    assert r1.provision_source_level == "exposure"
    assert r1.provision_inherited_from is None
    # L2 only receives the counterparty pot
    assert r2.provision_source_level == "counterparty"
    assert r2.provision_inherited_from == "CP1"
    assert r1.guarantee_source_level is None
    assert r2.guarantee_source_level == "exposure"
    assert r2.guarantee_inherited_from is None
    assert "provision@exposure" in r1.crm_allocation_notes
    assert "provision@counterparty<-CP1" in r2.crm_allocation_notes
    assert "guarantee@exposure/substitution" in r2.crm_allocation_notes


def test_notes_null_when_no_crm(spark):
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 600.0)]),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    r = out.results.collect()[0]
    assert r.crm_allocation_notes is None
    assert r.collateral_source_level is None
    assert r.provision_source_level is None
    assert r.guarantee_source_level is None


def _coll_iss(spark, rows):
    return spark.createDataFrame(
        rows,
        "collateral_reference string, collateral_type string, "
        "market_value double, issuer_counterparty_reference string",
    ).selectExpr("*", "CAST(0.0 AS DOUBLE) AS haircut",
                 "false AS currency_mismatch")


def test_own_issue_collateral_excluded(spark):
    # CRR Art.194(4): a security issued by the obligor itself is
    # ineligible funded protection — excluded before allocation with a
    # CRM015 flag; third-party paper on the same loan still counts
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 1000.0)]),
            collateral=_coll_iss(
                spark,
                [("C_OWN", "corp_bond", 400.0, "CP1"),
                 ("C_OK", "cash", 100.0, "OTHER")],
            ),
            collateral_links=spark.createDataFrame(
                [("C_OWN", "L1"), ("C_OK", "L1")],
                "collateral_reference string, exposure_reference string",
            ),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    r = out.results.collect()[0]
    assert r.collateral_value == pytest.approx(100.0)
    assert r.ead_after_crm == pytest.approx(900.0)
    assert r.collateral_references == ["C_OK"]
    assert r.collateral_types == ["cash"]
    assert r.data_quality_flags == ["CRM015:C_OWN"]
    assert "own-issue collateral excluded (Art.194(4)): C_OWN" in (
        r.calculation_warnings[0]
    )


def test_own_issue_group_member_excluded(spark):
    # the issuer is a fellow subsidiary of the obligor's group (shared
    # ultimate parent via org_mappings) — same Art.194(4) exclusion
    org = spark.createDataFrame(
        [("CP1", "UP1"), ("SUB2", "UP1")],
        "child_reference string, parent_reference string",
    )
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 1000.0)]),
            collateral=_coll_iss(spark, [("C_G", "cash", 300.0, "SUB2")]),
            collateral_links=spark.createDataFrame(
                [("C_G", "L1")],
                "collateral_reference string, exposure_reference string",
            ),
            org_mappings=org,
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    r = out.results.collect()[0]
    assert r.collateral_value == pytest.approx(0.0)
    assert r.data_quality_flags == ["CRM015:C_G"]


def test_own_issue_null_issuer_permissive(spark):
    # null issuer must NOT drop the row (existing data is number-neutral),
    # and an unrelated third-party issuer prices normally
    out = run_pipeline(
        RawBundle(
            counterparties=_cps(spark),
            loans=_loans(spark, [("L1", "CP1", 1000.0)]),
            collateral=_coll_iss(spark, [("C_N", "cash", 200.0, None)]),
            collateral_links=spark.createDataFrame(
                [("C_N", "L1")],
                "collateral_reference string, exposure_reference string",
            ),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    r = out.results.collect()[0]
    assert r.collateral_value == pytest.approx(200.0)
    assert r.data_quality_flags == []
    assert r.calculation_warnings == []


def test_own_issue_mixed_pledge_pro_rata_unaffected(spark):
    # a shared item gated for ONE obligor's loan must not starve the other
    # obligor: the gated pair leaves the denominator, so the clean loan
    # absorbs the full value (ref processor.py:838 "filtering side-steps
    # the pledge re-resolution that would revive a value-zeroed row")
    cps = _cps(spark, refs=("CP1", "CP2"))
    out = run_pipeline(
        RawBundle(
            counterparties=cps,
            loans=_loans(
                spark, [("L1", "CP1", 500.0), ("L2", "CP2", 500.0)]
            ),
            collateral=_coll_iss(spark, [("C_M", "cash", 200.0, "CP1")]),
            collateral_links=spark.createDataFrame(
                [("C_M", "L1"), ("C_M", "L2")],
                "collateral_reference string, exposure_reference string",
            ),
        ),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    # L1 (own-issue) gets nothing and carries the flag; L2 gets ALL 200
    assert rows["L1"].collateral_value == pytest.approx(0.0)
    assert rows["L1"].data_quality_flags == ["CRM015:C_M"]
    assert rows["L2"].collateral_value == pytest.approx(200.0)
    assert rows["L2"].data_quality_flags == []
    # and the surviving single pair reads as a direct allocation
    assert rows["L2"].collateral_allocation_method == "direct"


def test_supporting_factor_carriers_sealed(spark):
    # CRR2 Art.501/501a decomposition: each factor under its own name,
    # 1.0 where it did not apply, and the RWEA the min saved
    cps = spark.createDataFrame(
        [
            ("CP_SME", "corporate", 2, False, 10_000_000.0, False, False),
            ("CP_INF", "corporate", 2, False, 60_000_000.0, False, True),
            ("CP_BOTH", "corporate", 2, False, 10_000_000.0, False, True),
            ("CP_NONE", "corporate", 2, False, 60_000_000.0, False, False),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, "
        "has_irb_permission boolean, is_infrastructure boolean",
    )
    loans = _loans(
        spark,
        [("L_S", "CP_SME", 1000.0), ("L_I", "CP_INF", 1000.0),
         ("L_B", "CP_BOTH", 1000.0), ("L_N", "CP_NONE", 1000.0)],
    )
    from rwa_calculator_spark.engine.rulepack import B31_PACK

    out = run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(pack=CRR_PACK),
    )
    rows = {r.exposure_reference: r for r in out.results.collect()}
    # drawn 1000 ≤ 2.5m threshold → pure tier-1 factor
    assert rows["L_S"].sme_supporting_factor == pytest.approx(0.7619)
    assert rows["L_S"].infra_supporting_factor == pytest.approx(1.0)
    assert rows["L_S"].supporting_factor_benefit == pytest.approx(
        1000.0 * 0.5 * (1 - 0.7619)
    )
    assert rows["L_I"].sme_supporting_factor == pytest.approx(1.0)
    assert rows["L_I"].infra_supporting_factor == pytest.approx(0.75)
    # overlapping book: most-beneficial min — infra 0.75 < SME 0.7619, so
    # the Art.501a factor wins; both carriers still report their own value
    assert rows["L_B"].sme_supporting_factor == pytest.approx(0.7619)
    assert rows["L_B"].infra_supporting_factor == pytest.approx(0.75)
    assert rows["L_B"].rwa == pytest.approx(500.0 * 0.75)
    assert rows["L_B"].supporting_factor_benefit == pytest.approx(
        500.0 * (1 - 0.75)
    )
    assert rows["L_N"].sme_supporting_factor == pytest.approx(1.0)
    assert rows["L_N"].supporting_factor_benefit == pytest.approx(0.0)
    # B3.1 removed both factors: carriers read 1.0, benefit 0
    out_b31 = run_pipeline(
        RawBundle(counterparties=cps, loans=loans),
        PipelineConfig(pack=B31_PACK),
    )
    r = {x.exposure_reference: x for x in out_b31.results.collect()}["L_B"]
    assert r.sme_supporting_factor == pytest.approx(1.0)
    assert r.infra_supporting_factor == pytest.approx(1.0)
    assert r.supporting_factor_benefit == pytest.approx(0.0)
