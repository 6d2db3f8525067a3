"""Cross-template tie-out checker behaviours (ref reporting/tieouts.py):
accumulate-don't-throw, skip-on-absent (absent ≠ break), break-on-drift
beyond the golden tolerance, and the non-comparable guard (every tie only
spans templates NOT recorded as a non-comparable pair)."""

from __future__ import annotations

from rwa_calculator_spark.reporting_tieouts import (
    NON_COMPARABLE_PAIRS,
    TIE_OUTS,
    check_cross_template_consistency,
    findings_frame,
)


def _cells(total=300.0, sa=100.0, irb=200.0, classes=None):
    corep = {
        "C02.00|total": total,
        "C02.00|sa": sa,
        "C02.00|irb": irb,
        # the round-7 C 02.00 internal-footing cells (rows + class-row
        # sums) — consistent by construction: all-A-IRB book, no F-IRB
        "C02.00|row|0010": total,
        "C02.00|row|0040": total * 0.08,
        "C02.00|row|0060": sa,
        "C02.00|sa_class_sum": sa,
        "C02.00|row|0220": irb,
        "C02.00|row|0240": 0.0,
        "C02.00|airb_class_sum": irb,
    }
    for cls, (s, i) in (classes or {"corporate": (60.0, 150.0), "retail": (40.0, 50.0)}).items():
        corep[f"C07.00|{cls}"] = s
        corep[f"C08.01|{cls}"] = i
    pillar3 = {
        "OV1|credit_risk_sa": sa,
        "OV1|credit_risk_irb": irb,
        "OV1|total": sa + irb,
    }
    return corep, pillar3


def test_all_ties_green_on_consistent_templates():
    corep, p3 = _cells()
    findings = check_cross_template_consistency(corep, p3)
    assert len(findings) == len(TIE_OUTS)
    assert {f.status for f in findings} == {"tie"}
    assert all(f.code == "TIE001" for f in findings)


def test_drifted_template_breaks_exactly_the_spanning_ties():
    # Drift one C 08.01 sheet by 1.0 — a silent aggregation regression in
    # one template must fire every tie that spans it, and only those.
    corep, p3 = _cells()
    corep["C08.01|corporate"] += 1.0
    by_name = {
        f.name: f for f in check_cross_template_consistency(corep, p3)
    }
    assert by_name["irb_rwea_c08_01_vs_c02"].status == "break"
    assert by_name["irb_rwea_c08_01_vs_ov1"].status == "break"
    assert by_name["total_rwea_c02_vs_ov1"].status == "tie"
    assert by_name["credit_risk_rollup_c02"].status == "tie"
    assert by_name["sa_rwea_c07_vs_c02"].status == "tie"
    # the finding quotes both sides so a reviewer sees which cells disagreed
    b = by_name["irb_rwea_c08_01_vs_c02"]
    assert abs(b.diff - 1.0) < 1e-9 and b.lhs_label and b.rhs_label


def test_within_tolerance_drift_still_ties():
    corep, p3 = _cells()
    corep["C08.01|corporate"] += 2e-7  # inside atol
    findings = check_cross_template_consistency(corep, p3)
    assert {f.status for f in findings} == {"tie"}


def test_absent_template_skips_never_breaks():
    # An SA-only run produces no C 08.01 / OV1 IRB rows: the IRB ties must
    # SKIP (absent is not an inconsistency), and never report 'tie' either
    # (vacuous is not a pass).
    corep = {"C02.00|total": 100.0, "C02.00|sa": 100.0, "C07.00|corporate": 100.0}
    p3 = {"OV1|credit_risk_sa": 100.0}
    by_name = {
        f.name: f for f in check_cross_template_consistency(corep, p3)
    }
    assert by_name["irb_rwea_c08_01_vs_c02"].status == "skipped"
    assert by_name["irb_rwea_c08_01_vs_ov1"].status == "skipped"
    assert by_name["total_rwea_c02_vs_ov1"].status == "skipped"  # no OV1 total
    assert by_name["credit_risk_rollup_c02"].status == "skipped"
    assert by_name["sa_rwea_c07_vs_c02"].status == "tie"


def test_no_tie_spans_a_non_comparable_pair():
    # The guard the reference encodes as NON_COMPARABLE_PAIRS: no curated
    # tie may equate templates recorded as non-comparable.
    blocked = {frozenset(p.pair) for p in NON_COMPARABLE_PAIRS}
    for tie in TIE_OUTS:
        for a in tie.templates:
            for b in tie.templates:
                assert frozenset((a, b)) not in blocked, tie.name
    # and every non-comparable pair carries its regulatory reason
    assert all(p.reason and p.regulatory_reference for p in NON_COMPARABLE_PAIRS)


def test_findings_frame_schema(spark):
    corep, p3 = _cells()
    df = findings_frame(spark, check_cross_template_consistency(corep, p3))
    assert df.columns == [
        "tie_name", "status", "lhs_label", "rhs_label", "lhs", "rhs",
    ]
    assert df.count() == len(TIE_OUTS)
