"""Model-permission routing truth table (ref
engine/stages/classify/permissions.py + approach.py; CRR Art.143/148/150,
PS1/26 Art.147A) — mirror of the reference's per-cause diagnostics and
SA-precedence semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK
from rwa_calculator_spark.engine.stages.permissions import (
    apply_model_permissions,
    permission_warnings,
    resolve_model_permissions,
)

_EXP_SCHEMA = (
    "exposure_reference string, model_id string, exposure_class string, "
    "country string, book_code string, pd double, lgd double, "
    "is_specialised boolean, has_irb_permission boolean, "
    "entity_type string, group_reference string, annual_revenue double"
)

_MP_SCHEMA = (
    "model_id string, exposure_class string, approach string, "
    "country_codes string, excluded_book_codes string, ppu_reason string"
)


def _mp(spark):
    return spark.createDataFrame(
        [
            ("M1", "corporate", "AIRB", None, None, None),
            ("M1", "corporate", "FIRB", None, None, None),
            ("M2", "corporate", "FIRB", None, None, None),
            # M3: AIRB granted but a valid SA row blocks it (PPU carve-out)
            ("M3", "corporate", "AIRB", None, None, None),
            ("M3", "corporate", "SA", None, None, "ppu_rollout"),
            # M4: geography-scoped to GB,FR; book B9 excluded
            ("M4", "corporate", "AIRB", "GB,FR", "B9", None),
            ("M5", "specialised", "SLOTTING", None, None, None),
        ],
        _MP_SCHEMA,
    )


def _exposures(spark):
    rows = [
        # ref, model, class,      ctry, book, pd,   lgd,  spec,  org_irb
        ("E1", "M1", "corporate", "GB", "B1", 0.01, 0.4, False, False),
        ("E2", "M2", "corporate", "GB", "B1", 0.01, 0.4, False, False),
        ("E3", "M3", "corporate", "GB", "B1", 0.01, 0.4, False, False),
        ("E4", "M4", "corporate", "DE", "B1", 0.01, 0.4, False, False),  # geo reject
        ("E5", "M4", "corporate", "GB", "B9", 0.01, 0.4, False, False),  # book reject
        ("E6", None, "corporate", "GB", "B1", 0.01, 0.4, False, True),   # null model
        ("E7", "MX", "corporate", "GB", "B1", 0.01, 0.4, False, True),   # unmatched
        ("E8", "M1", "retail", "GB", "B1", 0.01, 0.4, False, False),     # class reject
        ("E9", "M5", "specialised", "GB", "B1", 0.01, 0.4, True, False), # slotting ok
        ("E10", "M1", "corporate", "GB", "B1", 0.01, None, False, False),# AIRB w/o LGD
        ("E11", "M2", "corporate", "GB", "B1", None, 0.4, False, False), # FIRB w/o PD
        ("E12", "MX", "specialised", "GB", "B1", 0.01, 0.4, True, False),# slot withdrawn
    ]
    return spark.createDataFrame(
        [r + ("corporate", "G1", 1e6) for r in rows], _EXP_SCHEMA
    )


def _flags(df):
    return {
        r["exposure_reference"]: (
            r["model_airb_permitted"],
            r["model_firb_permitted"],
            r["model_slotting_permitted"],
            r["permission_diagnostic"],
        )
        for r in df.collect()
    }


def test_resolution_truth_table(spark):
    out = resolve_model_permissions(_exposures(spark), _mp(spark))
    assert out.count() == 12  # one row per exposure after the join dedup
    f = _flags(out)
    assert f["E1"] == (True, True, False, None)
    assert f["E2"] == (False, True, False, None)
    # SA precedence blocks every IRB flag and carries the PPU label
    assert f["E3"] == (False, False, False, "filter_rejected")
    ppu = {r["exposure_reference"]: r["ppu_reason"] for r in out.collect()}
    assert ppu["E3"] == "ppu_rollout"
    assert ppu["E1"] is None
    assert f["E4"] == (False, False, False, "filter_rejected")
    assert f["E5"] == (False, False, False, "filter_rejected")
    assert f["E6"] == (False, False, False, "null_model_id")
    assert f["E7"] == (False, False, False, "unmatched_model_id")
    assert f["E8"] == (False, False, False, "filter_rejected")
    assert f["E9"] == (False, False, True, None)


def test_routing_and_firb_lgd_clearing(spark):
    routed, _w = apply_model_permissions(_exposures(spark), _mp(spark), CRR_PACK)
    rows = {r["exposure_reference"]: r for r in routed.collect()}
    # AIRB: IRB granted, own LGD kept
    assert rows["E1"]["has_irb_permission"] and rows["E1"]["lgd"] == 0.4
    assert rows["E1"]["irb_subapproach"] == "airb"
    # FIRB: IRB granted, LGD cleared to the supervisory default
    assert rows["E2"]["has_irb_permission"] and rows["E2"]["lgd"] is None
    assert rows["E2"]["irb_subapproach"] == "firb"
    # SA-blocked / rejected / unmatched → org-wide flag is overwritten
    for ref in ("E3", "E4", "E5", "E6", "E7", "E8"):
        assert not rows[ref]["has_irb_permission"], ref
    # AIRB permission without modelled LGD degrades to FIRB (M1 has both)
    assert rows["E10"]["has_irb_permission"]
    assert rows["E10"]["irb_subapproach"] == "firb"
    # FIRB permission without an internal rating → SA
    assert not rows["E11"]["has_irb_permission"]
    # slotting grant survives; withdrawn registry routes to SA
    assert rows["E9"]["is_specialised"]
    assert not rows["E12"]["is_specialised"]


def test_permission_warnings_rollup(spark):
    out = resolve_model_permissions(_exposures(spark), _mp(spark))
    w = permission_warnings(out)
    by_cause = {r["key"]: r for r in w.collect()}
    # E11 has null pd → excluded from the internally-rated roll-up
    assert set(by_cause) == {"null_model_id", "unmatched_model_id", "filter_rejected"}
    assert by_cause["filter_rejected"]["message"].startswith("4 ")  # E3,E4,E5,E8
    assert by_cause["null_model_id"]["code"] == "CLS006"
    assert by_cause["null_model_id"]["severity"] == "warning"


def test_b31_art147a_restrictions(spark):
    exp = spark.createDataFrame(
        [
            # large corp (group revenue 500m > 440m): AIRB blocked → FIRB
            ("E1", "M1", "corporate", None, None, 0.01, 0.4, False, False,
             "corporate", "G1", 500e6),
            # small corp: AIRB survives
            ("E2", "M1", "corporate", None, None, 0.01, 0.4, False, False,
             "corporate", "G2", 10e6),
            # sovereign-like entity: SA-only regardless of grants
            ("E3", "M1", "corporate", None, None, 0.01, 0.4, False, False,
             "rgla", "G3", 10e6),
            # institution class: no AIRB (FIRB fallback via M1's FIRB row)
            ("E4", "M6", "institution", None, None, 0.01, 0.4, False, False,
             "institution", "G4", 10e6),
            # unknown revenue (0 ≡ unreported here) → conservatively large
            ("E5", "M1", "corporate", None, None, 0.01, 0.4, False, False,
             "corporate", "G5", 0.0),
        ],
        _EXP_SCHEMA,
    )
    mp = spark.createDataFrame(
        [
            ("M1", "corporate", "AIRB", None, None, None),
            ("M1", "corporate", "FIRB", None, None, None),
            ("M6", "institution", "AIRB", None, None, None),
            ("M6", "institution", "FIRB", None, None, None),
        ],
        _MP_SCHEMA,
    )
    routed, _w = apply_model_permissions(exp, mp, B31_PACK)
    rows = {r["exposure_reference"]: r for r in routed.collect()}
    assert rows["E1"]["irb_subapproach"] == "firb" and rows["E1"]["lgd"] is None
    assert rows["E2"]["irb_subapproach"] == "airb" and rows["E2"]["lgd"] == 0.4
    assert not rows["E3"]["has_irb_permission"]
    assert rows["E4"]["irb_subapproach"] == "firb"
    assert rows["E5"]["irb_subapproach"] == "firb"
    # same grants under CRR: no restrictions, everyone AIRB-routed
    crr, _w2 = apply_model_permissions(exp, mp, CRR_PACK)
    crr_rows = {r["exposure_reference"]: r for r in crr.collect()}
    for ref in ("E1", "E2", "E3", "E4", "E5"):
        assert crr_rows[ref]["irb_subapproach"] == "airb", ref


def test_group_revenue_rollup_blocks_subsidiary(spark):
    # Art.147(4C)(b)(ii): a small subsidiary of a large group is F-IRB-only
    # — revenue is taken at the highest level of consolidation
    exp = spark.createDataFrame(
        [
            ("E1", "M1", "corporate", None, None, 0.01, 0.4, False, False,
             "corporate", "G1", 500e6),  # the large parent
            ("E2", "M1", "corporate", None, None, 0.01, 0.4, False, False,
             "corporate", "G1", 1e6),    # small subsidiary, same group
        ],
        _EXP_SCHEMA,
    )
    mp = spark.createDataFrame(
        [("M1", "corporate", "AIRB", None, None, None),
         ("M1", "corporate", "FIRB", None, None, None)],
        _MP_SCHEMA,
    )
    routed, _w = apply_model_permissions(exp, mp, B31_PACK)
    rows = {r["exposure_reference"]: r for r in routed.collect()}
    assert rows["E1"]["irb_subapproach"] == "firb"
    assert rows["E2"]["irb_subapproach"] == "firb"  # inherits the group block


def test_pipeline_consumes_model_permissions(spark):
    """End-to-end: ratings carry model_id, the registry routes approaches,
    CLS006 lands on AggregatedOutput.errors, and the previously-dead
    RawBundle.model_permissions field is load-bearing."""
    from rwa_calculator_spark.engine.bundles import RawBundle
    from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline

    cps = spark.createDataFrame(
        [
            ("CP1", "corporate", 2, False, 1e6, False),
            ("CP2", "corporate", 2, False, 1e6, False),
            ("CP3", "corporate", 2, False, 1e6, False),
        ],
        "counterparty_reference string, entity_type string, cqs int, "
        "is_managed_as_retail boolean, annual_revenue double, has_irb_permission boolean",
    )
    loans = spark.createDataFrame(
        [
            ("L1", "CP1", 1000.0, False, None, 0.4, 2.5),
            ("L2", "CP2", 1000.0, False, None, 0.4, 2.5),
            ("L3", "CP3", 1000.0, False, None, 0.4, 2.5),
        ],
        "loan_reference string, counterparty_reference string, drawn_amount double, "
        "is_defaulted boolean, pd double, lgd double, effective_maturity double",
    )
    ratings = spark.createDataFrame(
        [
            ("CP1", "internal", False, None, "2025-06-30", "R1", None, 0.01, "M1"),
            ("CP2", "internal", False, None, "2025-06-30", "R2", None, 0.01, "M9"),
            # CP3: no internal rating at all → SA, no CLS006 (not rated)
        ],
        "counterparty_reference string, rating_type string, is_short_term boolean, "
        "rating_agency string, rating_date string, rating_reference string, "
        "cqs int, pd double, model_id string",
    ).withColumn("rating_date", F.to_date("rating_date"))
    mp = spark.createDataFrame(
        [("M1", "corporate", "AIRB", None, None, None)], _MP_SCHEMA
    )
    bundle = RawBundle(
        counterparties=cps, loans=loans, ratings=ratings, model_permissions=mp
    )
    out = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK, validation="off"))
    rows = {r["exposure_reference"]: r for r in out.results.collect()}
    assert rows["L1"]["approach"] == "IRB"
    assert rows["L1"]["rw_source"] == "irb_vasicek_airb"  # routed variant on the ledger
    assert rows["L2"]["approach"] == "SA"  # M9 unmatched → SA fallback
    assert rows["L3"]["approach"] == "SA"
    errs = out.errors.collect()
    causes = {r["key"] for r in errs if r["code"] == "CLS006"}
    assert "unmatched_model_id" in causes
