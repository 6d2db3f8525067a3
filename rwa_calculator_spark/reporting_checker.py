"""Supervisory validation checker — the one entry point over the rule
estate (ref reporting/validations/checker.py, 541 LoC: COREPGenerator →
evaluate_all → ValidationReport → check_supervisory_validations →
error-channel findings).

The three pieces this composes already exist and stay testable alone:
the parsed grammar catalogue + evaluator (reporting_grammar /
reporting_grammar_catalog), the filing-scope resolver (reporting_scope),
and the template estate. What the checker adds is the reference's
submission-time contract:

- **scope → evaluate → aggregate in one call.** ``run_checker(spark,
  sf_dir, ctx)`` applies the submission's filing scope, evaluates every
  in-scope enforced rule against the estate the run actually generated,
  and returns the per-rule outcome frame plus the supervisor-facing
  findings.
- **Error-channel adaptation.** A FAIL on an error-severity rule is a
  ``VAL001`` (blocking — an Error break rejects the whole return); a FAIL
  on a warning rule is ``VAL002``; both are ACCUMULATED, never raised
  (the tieouts.py contract).
- **An empty finding list must be meaningful.** The obvious gate —
  ``if not findings: submit()`` — fails OPEN when every rule was
  NOT_EVALUATED: such an estate produces no breaks and is
  indistinguishable from a clean one. ``VAL003`` reports insufficient
  coverage (nothing executed, or a referenced template the run never
  emitted), so the guard lives HERE rather than in each caller (ref
  checker.py:114-152 + _coverage_finding).
- **What is deliberately NOT reported** (ref checker.py module doc):
  NOT_IN_SCOPE rules (not applicable to this filing), NOT_EVALUATED rules
  (named reason — absent axis, unsupported construct), and VACUOUS
  comparisons (all-zero operands are no evidence of correctness). They
  appear in the report's status counts, never as findings.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

ERROR_VALIDATION_RULE_ERROR = "VAL001"
ERROR_VALIDATION_RULE_WARNING = "VAL002"
ERROR_VALIDATION_COVERAGE_INSUFFICIENT = "VAL003"


@dataclass(frozen=True)
class CheckerFinding:
    code: str
    severity: str  # 'error' | 'warning'
    rule_id: str
    message: str


@dataclass
class ValidationReport:
    """Per-rule outcomes plus the roll-up the supervisor-facing surface
    renders (ref checker.py:240-320 ValidationReport)."""

    outcomes: DataFrame
    status_counts: dict[str, int]
    not_evaluated_reasons: dict[str, int]
    templates_uncovered: tuple[str, ...]
    findings: list[CheckerFinding] = field(default_factory=list)

    @property
    def rules_executed(self) -> int:
        return (
            self.status_counts.get("PASS", 0)
            + self.status_counts.get("FAIL", 0)
            + self.status_counts.get("VACUOUS", 0)
        )

    @property
    def is_coverage_sufficient(self) -> bool:
        return self.rules_executed > 0 and not self.templates_uncovered


def run_checker(spark: SparkSession, sf_dir: str, ctx) -> ValidationReport:
    """Scope → evaluate → aggregate for one submission context.

    The outcome frame is IDENTICAL to ``scoped_grammar_outcomes`` (the
    driver-oracled surface `report_validation_grammar` /
    `report_validation_scope` render) — the checker is the orchestration
    layer above it, not a different evaluator."""
    from rwa_calculator_spark.reporting_grammar_catalog import (
        GRAMMAR_RULES,
        grammar_estate,
        scoped_grammar_outcomes,
    )
    from rwa_calculator_spark.reporting_scope import rule_scope, rule_templates

    # one estate computation feeds both the evaluator and template coverage
    # (previously computed twice — 2x the Spark jobs for identical facts)
    index = grammar_estate(spark, sf_dir)
    outcomes = scoped_grammar_outcomes(spark, sf_dir, ctx, index=index)
    rows = outcomes.collect()  # rule-catalogue grain — bounded, never data

    counts = Counter(r.status for r in rows)
    nev_reasons = Counter(
        r.reason for r in rows if r.status == "NOT_EVALUATED" and r.reason
    )

    # coverage: every template an IN-SCOPE rule references must have been
    # emitted by this run's estate (ref checker.py:399-419
    # _template_coverage — "row not emitted" per-cell skips are normal;
    # an entire referenced TABLE missing is an estate defect)
    index = grammar_estate(spark, sf_dir)
    uncovered: set[str] = set()
    for rule in GRAMMAR_RULES:
        verdict, _ = rule_scope(rule, ctx)
        if verdict != "in_scope":
            continue
        for table in rule_templates(rule):
            if not index.is_emitted(table):
                uncovered.add(table)

    report = ValidationReport(
        outcomes=outcomes,
        status_counts=dict(counts),
        not_evaluated_reasons=dict(nev_reasons),
        templates_uncovered=tuple(sorted(uncovered)),
    )

    sev = {r.rule_id: r.severity for r in GRAMMAR_RULES}
    for r in rows:
        if r.status != "FAIL":
            continue
        severity = sev.get(r.rule_id, "error")
        code = (
            ERROR_VALIDATION_RULE_ERROR
            if severity == "error"
            else ERROR_VALIDATION_RULE_WARNING
        )
        at = f" at {r.coordinate}" if r.coordinate else ""
        report.findings.append(
            CheckerFinding(
                code,
                severity,
                r.rule_id,
                f"{r.source} rule {r.rule_id} failed{at}: "
                f"lhs={r.lhs!r} rhs={r.rhs!r}",
            )
        )
    if not report.is_coverage_sufficient:
        detail = (
            f"referenced templates never emitted: "
            f"{', '.join(report.templates_uncovered)}"
            if report.templates_uncovered
            else "no enforced rule executed against this estate"
        )
        report.findings.append(
            CheckerFinding(
                ERROR_VALIDATION_COVERAGE_INSUFFICIENT,
                "error",
                "",
                f"validation coverage insufficient — {detail}; an empty "
                "finding list would otherwise fail OPEN",
            )
        )
    return report


def findings_rows(findings: Sequence[CheckerFinding]) -> list[tuple]:
    return [(f.code, f.severity, f.rule_id, f.message) for f in findings]
