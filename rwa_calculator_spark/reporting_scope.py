"""Validation-rule SCOPING — which rules apply to which filing (ref
reporting/validations/scope.py, 1,132 LoC distilled to its decision layer).

The grammar evaluator (reporting_grammar.py) answers "does this rule hold
over these cells"; this module answers the question that comes FIRST in a
real submission: "is this rule even in scope for what the firm is filing".
The reference separates the two deliberately — its scope resolver expands a
rule onto concrete coordinates per filed template/module and records every
coordinate it cannot form as a SKIP, never a break (scope.py:64-77), and a
rule whose tables are not part of the submission never evaluates at all.

Distilled semantics:

- **Filing modules.** Templates group into the modules a firm files
  (COREP own-funds vs the Pillar 3 disclosure set here; ref scope.py's
  module filing scope + `TableBinding`). A submission context names the
  filed modules.
- **Scope = every referenced table filed.** A rule referencing tables from
  an unfiled module — including CROSS-module rules where only one side is
  filed — is `NOT_IN_SCOPE` (the reference's
  ``SKIP_PREREQUISITE_TABLE_ABSENT``: you cannot tie C 07.00 to a CR04 the
  firm did not produce).
- **Unknown tables are out of scope by name** (scope.py's "a wrong sheet
  mapping silently produces wrong findings, which is far worse than a
  skip").
- **NOT_IN_SCOPE ≠ NOT_EVALUATED.** An out-of-scope rule is never handed
  to the evaluator — the distinction a supervisor reads: "not applicable
  to this filing" vs "applicable but this estate couldn't run it".

The DuckDB oracle derives the same scope decision IN SQL from the same two
data tables (rule→table references, table→module map) via an anti-join on
unfiled modules, so the driver compare exercises the scope logic on both
engines rather than copying a Python verdict into the SQL text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterable, Sequence

from rwa_calculator_spark.reporting_grammar import (
    BinOp,
    Call,
    Compare,
    GrammarRule,
    Ref,
    TemplateIndex,
    UnsupportedExpression,
    evaluate_rule,
    parse_expression,
)

#: Outcome status for rules the submission context excludes — distinct from
#: the evaluator's NOT_EVALUATED by design (see module docstring).
STATUS_NOT_IN_SCOPE = "NOT_IN_SCOPE"

#: Filing module → the template codes it carries (ref scope.py
#: _base_bindings: publisher TABLE code → bundle member, grouped here by
#: the return the firm files them under).
FILING_MODULES: dict[str, tuple[str, ...]] = {
    "corep_of": ("C02.00", "C07.00", "C08.01", "C09.01", "C09.02"),
    "pillar3": ("CR04",),
}

TEMPLATE_MODULE: dict[str, str] = {
    t: m for m, ts in FILING_MODULES.items() for t in ts
}


@dataclass(frozen=True)
class SubmissionContext:
    """What this submission files (ref scope.py's module filing scope)."""

    filed_modules: tuple[str, ...]

    def files(self, module: str) -> bool:
        return module in self.filed_modules


#: A full return: every module filed — the scope under which the whole
#: catalogue evaluates (report_validation_grammar's context).
FULL_SUBMISSION = SubmissionContext(tuple(sorted(FILING_MODULES)))

#: A COREP-only filing: the Pillar 3 disclosure set is not produced, so
#: every rule touching CR04 — including cross-module ties — leaves scope.
COREP_ONLY_SUBMISSION = SubmissionContext(("corep_of",))

_REF_TABLE_TOKEN = re.compile(r"\{\s*(?:t\s*:\s*)?([A-Z]{1,4}\s?\d{2}(?:\.\d{2})*)")


def _walk_ref_tables(node) -> Iterable[str]:
    if isinstance(node, Ref):
        if node.table:
            yield node.table
    elif isinstance(node, Call):
        for a in node.args:
            yield from _walk_ref_tables(a)
    elif isinstance(node, (BinOp, Compare)):
        yield from _walk_ref_tables(node.lhs)
        yield from _walk_ref_tables(node.rhs)


def rule_templates(rule: GrammarRule) -> tuple[str, ...]:
    """Every template a rule's formula references (sorted, distinct).

    Parse-first; a formula the evaluator refuses (if/then conditionals)
    still needs a scope placement, so unsupported rules fall back to a
    token scan of the ``{...}`` reference groups — the scope layer must
    place even rules the evaluator will refuse by name."""
    try:
        expr = parse_expression(rule.formula)
        tables = {t for t in _walk_ref_tables(expr.root)}
    except UnsupportedExpression:
        tables = {m.group(1) for m in _REF_TABLE_TOKEN.finditer(rule.formula)}
    # both publishers print table codes with and without the space
    # ("C 08.01" vs "C08.01"); the module map keys the compact form
    return tuple(sorted(t.replace(" ", "") for t in tables))


def rule_scope(rule: GrammarRule, ctx: SubmissionContext) -> tuple[str, str]:
    """('in_scope' | 'not_in_scope', reason). The reason names WHAT
    excluded the rule — the unfiled module(s) or the unmapped template(s) —
    mirroring the reference's named skip reasons (scope.py:64-77)."""
    unknown = []
    missing = []
    for t in rule_templates(rule):
        module = TEMPLATE_MODULE.get(t)
        if module is None:
            unknown.append(t)
        elif not ctx.files(module):
            missing.append(module)
    if unknown:
        return "not_in_scope", "template_unmapped:" + ",".join(sorted(set(unknown)))
    if missing:
        return "not_in_scope", "module_not_filed:" + ",".join(sorted(set(missing)))
    return "in_scope", ""


def scoped_outcomes(
    rules: Sequence[GrammarRule], index: TemplateIndex, ctx: SubmissionContext
) -> list[tuple]:
    """Evaluate only the rules in scope; out-of-scope rules emit exactly ONE
    (rule_id, source, '', NOT_IN_SCOPE, reason, null, null, scope) row and
    are NEVER handed to the evaluator (pinned by
    tests/test_grammar.py::test_out_of_scope_rule_is_excluded_not_vacuous).
    In-scope rows carry scope='in_scope' alongside their evaluator output."""
    out: list[tuple] = []
    for rule in rules:
        scope, why = rule_scope(rule, ctx)
        if scope != "in_scope":
            out.append(
                (rule.rule_id, rule.source, "", STATUS_NOT_IN_SCOPE, why, None, None,
                 scope)
            )
            continue
        out.extend((*row, "in_scope") for row in evaluate_rule(rule, index))
    return out


# ---------------------------------------------------------------------------
# Oracle — the scope decision derived IN SQL from the same data tables
# ---------------------------------------------------------------------------


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def scope_tables_sql(rules: Sequence[GrammarRule], ctx: SubmissionContext) -> str:
    """CTEs deriving each rule's scope verdict + reason in DuckDB from the
    (rule, template) reference pairs and the module map — an aggregation
    over data tables, not a transcribed Python verdict."""
    ref_rows = []
    for rule in rules:
        # a formula with no cell references (never published, but the
        # grammar admits it) touches no template and is trivially in scope
        # — it simply has no rule_refs rows, matching rule_scope's verdict
        for t in rule_templates(rule):
            ref_rows.append(f"({_sql_quote(rule.rule_id)}, {_sql_quote(t)})")
    if not ref_rows:
        ref_rows.append("('__none__', CAST(NULL AS VARCHAR))")
    mod_rows = [
        f"({_sql_quote(t)}, {_sql_quote(m)})" for t, m in sorted(TEMPLATE_MODULE.items())
    ]
    filed = ", ".join(_sql_quote(m) for m in ctx.filed_modules) or "''"
    return f"""
    rule_refs(rule_id, template) AS (VALUES {', '.join(ref_rows)}),
    module_map(template, module) AS (VALUES {', '.join(mod_rows)}),
    rule_scope AS (
        SELECT rule_id,
               CASE WHEN count(*) FILTER (WHERE module IS NULL) > 0
                         OR count(*) FILTER (WHERE module NOT IN ({filed})) > 0
                    THEN 'not_in_scope' ELSE 'in_scope' END AS scope,
               CASE WHEN count(*) FILTER (WHERE module IS NULL) > 0
                    THEN 'template_unmapped:' || string_agg(
                        DISTINCT template, ',' ORDER BY template
                    ) FILTER (WHERE module IS NULL)
                    WHEN count(*) FILTER (WHERE module NOT IN ({filed})) > 0
                    THEN 'module_not_filed:' || string_agg(
                        DISTINCT module, ',' ORDER BY module
                    ) FILTER (WHERE module NOT IN ({filed}))
                    ELSE '' END AS reason
        FROM rule_refs LEFT JOIN module_map USING (template)
        GROUP BY rule_id
    )"""


def scoped_oracle_sql(
    rules: Sequence[GrammarRule],
    facts_sql: str,
    estate: dict,
    sheet_codes: dict,
    ctx: SubmissionContext,
) -> str:
    """The scoped twin of reporting_grammar.rules_oracle_sql: in-scope rules
    compile to their per-rule SELECTs (each stamped scope='in_scope');
    out-of-scope rules emit one row whose NOT_IN_SCOPE status and reason
    come from the SQL-side `rule_scope` derivation above. Which branch a
    rule lands in is decided by the same `rule_scope` helper the Spark
    surface uses — the REASON text, the part that could silently drift, is
    re-derived in SQL."""
    from rwa_calculator_spark.reporting_grammar import rule_oracle_select

    in_scope = [r for r in rules if rule_scope(r, ctx)[0] == "in_scope"]
    out_scope = [r for r in rules if rule_scope(r, ctx)[0] != "in_scope"]
    selects = [
        f"SELECT s.*, 'in_scope' AS scope FROM ({rule_oracle_select(r, estate, sheet_codes)}) s"
        for r in in_scope
    ]
    for r in out_scope:
        selects.append(
            f"SELECT {_sql_quote(r.rule_id)} AS rule_id, "
            f"{_sql_quote(r.source)} AS source, '' AS coordinate, "
            f"'{STATUS_NOT_IN_SCOPE}' AS status, "
            f"(SELECT reason FROM rule_scope WHERE rule_id = {_sql_quote(r.rule_id)}) AS reason, "
            "CAST(NULL AS DOUBLE) AS lhs, CAST(NULL AS DOUBLE) AS rhs, "
            f"(SELECT scope FROM rule_scope WHERE rule_id = {_sql_quote(r.rule_id)}) AS scope"
        )
    body = "\n    UNION ALL\n    ".join(selects)
    return (
        f"WITH facts AS MATERIALIZED (\n{facts_sql}\n),"
        f"{scope_tables_sql(rules, ctx)}\n    {body}"
    )
