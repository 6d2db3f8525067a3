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

ENTITY_TYPES = ("corporate", "individual", "institution", "sovereign")
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
