"""Classifier conformance against an independently-authored decision table
(ref tests/conformance/test_classification_conformance.py:1-25 — the
classifier is checked against an externally-authored truth table over the
FULL generated input combination space; an uncovered combination is a hard
failure, a mismatch names the combination).

The table below is authored from the regulation text (CRR Art.112 exposure
classes, Art.123 retail conditions), NOT derived from the engine code:
securitisation positions classify first, sovereign/institution by
counterparty type, retail requires (individual OR managed-as-retail) AND
the group aggregate under the Art.123(c) threshold, everything else is
corporate.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import HierarchyOutput
from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK
from rwa_calculator_spark.engine.stages.classify import run_classify

ENTITY_TYPES = (
    "corporate", "individual", "institution", "sovereign",
    "central_bank", "central_bank_ecb",
)
BOOLS = (True, False)
EXPOSURE_TYPES = ("loan", "securitisation_pool")

# threshold is EUR 1m in both packs; 500k sits under, 1.5m over
UNDER, OVER = 500_000.0, 1_500_000.0


def expected_class(entity_type, managed_retail, under_threshold, exposure_type):
    """The externally-authored decision ladder (regulation order)."""
    if exposure_type == "securitisation_pool":
        return "securitisation"
    if entity_type == "sovereign":
        return "sovereign"
    # CRR Art.114(2)/(3): central banks (the ECB included) sit on the
    # central-government ladder
    if entity_type in ("central_bank", "central_bank_ecb"):
        return "sovereign"
    if entity_type == "institution":
        return "institution"
    if (entity_type == "individual" or managed_retail) and under_threshold:
        return "retail"
    return "corporate"


def test_classifier_full_combination_space(spark):
    combos = list(
        itertools.product(ENTITY_TYPES, BOOLS, BOOLS, EXPOSURE_TYPES)
    )
    rows = []
    for i, (etype, managed, under, exp_type) in enumerate(combos):
        rows.append(
            (
                f"E{i}",
                exp_type,
                f"CP{i}",
                UNDER if under else OVER,
                0.0,
                etype,
                managed,
                f"G{i}",  # group-of-one: group aggregate == own amount
                False,
            )
        )
    exposures = spark.createDataFrame(
        rows,
        "exposure_reference string, exposure_type string, "
        "counterparty_reference string, drawn_amount double, "
        "undrawn_amount double, entity_type string, "
        "is_managed_as_retail boolean, group_reference string, "
        "is_defaulted boolean",
    )
    for pack in (CRR_PACK, B31_PACK):
        out = run_classify(HierarchyOutput(exposures=exposures), pack)
        got = {
            r.exposure_reference: r.exposure_class
            for r in out.exposures.select("exposure_reference", "exposure_class").collect()
        }
        # every combination must be covered — an absent row is a hard failure
        assert len(got) == len(combos)
        mismatches = []
        for i, (etype, managed, under, exp_type) in enumerate(combos):
            want = expected_class(etype, managed, under, exp_type)
            if got[f"E{i}"] != want:
                mismatches.append(
                    f"{pack.regime}: ({etype}, managed={managed}, under={under}, "
                    f"{exp_type}) -> {got[f'E{i}']}, expected {want}"
                )
        assert not mismatches, "\n".join(mismatches)


def test_classifier_threshold_boundary(spark):
    """The Art.123(c) test is ≤ (inclusive): a group aggregate exactly AT
    the threshold stays retail; one cent over flips to corporate."""
    rows = [
        ("AT", "loan", "CP_AT", 1_000_000.0, 0.0, "individual", False, "GA", False),
        ("OVER", "loan", "CP_OV", 1_000_000.01, 0.0, "individual", False, "GB", False),
    ]
    exposures = spark.createDataFrame(
        rows,
        "exposure_reference string, exposure_type string, "
        "counterparty_reference string, drawn_amount double, "
        "undrawn_amount double, entity_type string, "
        "is_managed_as_retail boolean, group_reference string, "
        "is_defaulted boolean",
    )
    out = run_classify(HierarchyOutput(exposures=exposures), CRR_PACK)
    got = {r.exposure_reference: r.exposure_class for r in out.exposures.collect()}
    assert got["AT"] == "retail"
    assert got["OVER"] == "corporate"


# ---------------------------------------------------------------------------
# Approach-routing conformance (ref tests/conformance layer applied to
# engine/stages/classify/{permissions,approach}.py semantics)
# ---------------------------------------------------------------------------

GRANTS = (
    (), ("AIRB",), ("FIRB",), ("SLOTTING",), ("SA",),
    ("AIRB", "FIRB"), ("AIRB", "SA"), ("FIRB", "SA"), ("SLOTTING", "SA"),
    ("AIRB", "FIRB", "SLOTTING"), ("AIRB", "FIRB", "SA"),
    ("AIRB", "SLOTTING"), ("FIRB", "SLOTTING"),
    ("AIRB", "FIRB", "SLOTTING", "SA"),
)


def expected_route(grants, has_pd, has_lgd, spec, b31, sovereign_like, large):
    """Externally-authored ladder (CRR Art.143/148/150 + PS1/26 Art.147A):
    a valid SA permission row blocks every IRB grant (Art.150(1) PPU
    precedence); AIRB needs an internal rating AND a modelled LGD
    (Art.143/Art.179), FIRB needs the rating only; under Basel 3.1 a
    sovereign-like obligor is SA-only (Art.147A(1)(a)) and a large
    corporate loses A-IRB but keeps F-IRB (Art.147A(1)(e)); slotting
    requires its own registry grant (Art.153(5))."""
    sa_block = "SA" in grants
    airb = "AIRB" in grants and not sa_block and has_pd and has_lgd
    firb = "FIRB" in grants and not sa_block and has_pd
    slot = "SLOTTING" in grants and not sa_block
    if b31:
        if sovereign_like:
            airb = firb = False
        elif large:
            airb = False
    sub = "airb" if airb else ("firb" if firb else None)
    return {
        "irb": airb or firb,
        "sub": sub,
        "specialised": spec and slot,
        "lgd_cleared": (sub == "firb") and has_lgd,
    }


@pytest.mark.parametrize("pack_name", ["crr", "b31"])
def test_approach_routing_full_combination_space(spark, pack_name):
    import itertools

    from rwa_calculator_spark.engine.stages.permissions import (
        apply_model_permissions,
    )

    b31 = pack_name == "b31"
    pack = B31_PACK if b31 else CRR_PACK
    combos = list(
        itertools.product(
            range(len(GRANTS)),  # model grant set
            (True, False),       # has_pd
            (True, False),       # has_lgd
            (True, False),       # is_specialised
            (False, True),       # sovereign_like entity
            (False, True),       # large corporate group
        )
    )
    exp_rows, mp_rows = [], []
    for i, (gi, has_pd, has_lgd, spec, sov, large) in enumerate(combos):
        exp_rows.append(
            (
                f"E{i}",
                f"M{gi}",
                "corporate",
                None,
                None,
                0.01 if has_pd else None,
                0.4 if has_lgd else None,
                spec,
                False,
                "rgla" if sov else "corporate",
                f"G{i}",
                500e6 if large else 1e6,
            )
        )
    for gi, grants in enumerate(GRANTS):
        for g in grants:
            mp_rows.append((f"M{gi}", "corporate", g, None, None, None))
    exposures = spark.createDataFrame(
        exp_rows,
        "exposure_reference string, model_id string, exposure_class string, "
        "country string, book_code string, pd double, lgd double, "
        "is_specialised boolean, has_irb_permission boolean, "
        "entity_type string, group_reference string, annual_revenue double",
    )
    mp = spark.createDataFrame(
        mp_rows,
        "model_id string, exposure_class string, approach string, "
        "country_codes string, excluded_book_codes string, ppu_reason string",
    )
    routed, _w = apply_model_permissions(exposures, mp, pack)
    got = {r["exposure_reference"]: r for r in routed.collect()}
    assert len(got) == len(combos)  # every combination covered, none lost
    for i, (gi, has_pd, has_lgd, spec, sov, large) in enumerate(combos):
        want = expected_route(GRANTS[gi], has_pd, has_lgd, spec, b31, sov, large)
        r = got[f"E{i}"]
        ctx = f"E{i} grants={GRANTS[gi]} pd={has_pd} lgd={has_lgd} spec={spec} sov={sov} large={large} pack={pack_name}"
        assert r["has_irb_permission"] == want["irb"], ctx
        assert r["irb_subapproach"] == want["sub"], ctx
        assert r["is_specialised"] == want["specialised"], ctx
        if want["lgd_cleared"]:
            assert r["lgd"] is None, ctx
        elif has_lgd:
            assert r["lgd"] == 0.4, ctx
