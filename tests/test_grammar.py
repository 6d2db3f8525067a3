"""Validation-grammar evaluator tests (ref reporting/validations/
evaluate.py semantics). Pure driver-side: TemplateIndex + evaluator + the
AST→SQL compiler run without a SparkSession; the DuckDB cross-check uses an
inline VALUES estate."""

from __future__ import annotations

import math

import pytest

from rwa_calculator_spark.reporting_grammar import (
    ARITHMETIC_INTERVAL,
    ARITHMETIC_POINT,
    GEOGRAPHY_TOTAL_SHEET,
    MISSING_DO_NOT_RUN,
    MISSING_ZERO,
    SINGLE_SHEET,
    STATUS_FAIL,
    STATUS_NOT_EVALUATED,
    STATUS_PASS,
    STATUS_VACUOUS,
    Coordinate,
    GrammarRule,
    TemplateIndex,
    UnsupportedExpression,
    _EstateAxes,
    evaluate_at,
    evaluate_rule,
    parse_expression,
    rules_oracle_sql,
)

# ---------------------------------------------------------------------------
# Synthetic estate: internally-consistent values so the identity rules PASS
# ---------------------------------------------------------------------------

_C0X_ROWS = [f"{(i + 1) * 10:04d}" for i in range(5)]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_C07_RWA = [8.0, 12.0, 6.0, 10.0, 4.0]  # Σ = 40 = C02 SA row
_C08_RWA = [20.0, 15.0, 10.0, 10.0, 5.0]  # Σ = 60 = C02 IRB row
_REGION_EAD = [10.0, 20.0, 30.0, 40.0, 50.0]  # Σ = 150 = TOTAL sheet


def _estate_rows():
    rows = [
        ("C02.00", None, "0010", "0010", 100.0),
        ("C02.00", None, "0060", "0010", 40.0),
        ("C02.00", None, "0250", "0010", 60.0),
        ("C07.00", None, "0090", "0010", None),  # reported-empty cell
    ]
    for r, rwa in zip(_C0X_ROWS, _C07_RWA):
        rows.append(("C07.00", None, r, "0010", rwa * 2))
        rows.append(("C07.00", None, r, "0020", rwa))
    for r, rwa in zip(_C0X_ROWS, _C08_RWA):
        rows.append(("C08.01", None, r, "0010", rwa * 2))
        rows.append(("C08.01", None, r, "0020", rwa))
    for region, ead in zip(_REGIONS, _REGION_EAD):
        rows.append(("C09.02", region, "0010", "0010", ead))
    rows.append(("C09.02", GEOGRAPHY_TOTAL_SHEET, "0010", "0010", 150.0))
    return rows


_SHEET_CODES = {"C09.02": {f"{i + 1:04d}": r for i, r in enumerate(_REGIONS)}}

_ESTATE_AXES = {
    "C02.00": _EstateAxes((SINGLE_SHEET,), ("0010", "0060", "0250"), ("0010",)),
    "C07.00": _EstateAxes(
        (SINGLE_SHEET,), tuple(sorted([*_C0X_ROWS, "0090"])), ("0010", "0020")
    ),
    "C08.01": _EstateAxes((SINGLE_SHEET,), tuple(_C0X_ROWS), ("0010", "0020")),
    "C09.02": _EstateAxes(
        tuple(sorted([*_REGIONS, GEOGRAPHY_TOTAL_SHEET])), ("0010",), ("0010",)
    ),
}


@pytest.fixture()
def index():
    return TemplateIndex.from_rows(_estate_rows(), sheet_codes=_SHEET_CODES)


def _one(rule, index):
    rows = evaluate_rule(rule, index)
    assert len(rows) == 1, rows
    return rows[0]


# ---------------------------------------------------------------------------
# Parsing: both publishers' grammars onto one AST
# ---------------------------------------------------------------------------


def test_eba_and_boe_syntax_parse_to_the_same_ast():
    eba = parse_expression("{C 08.01, r0070, c0020} = {C 08.01, r0080, c0020}")
    boe = parse_expression("{t: C 08.01, r: 0070, c: 0020} = {t: C 08.01, r: 0080, c: 0020}")
    assert eba.root == boe.root


def test_sheet_range_expands_at_source_width():
    expr = parse_expression("{C09.02, r0010, c0010, (s0001-0003)} = 0")
    ref = expr.root.lhs
    assert ref.sheets == ("0001", "0002", "0003")


def test_unsupported_constructs_are_refused_by_name():
    for formula, fragment in [
        ("if {A, r0010, c0010} > 0 then {A, r0020, c0010} = 0", "conditional"),
        ("where({A, r0010, c0010}) = 0", "where"),
        ("count({A, r0010, c0010}) = 0", "count"),
        ("{A, r0010, c0010} = 0 and {A, r0020, c0010} = 0", "conjunction"),
    ]:
        with pytest.raises(UnsupportedExpression) as err:
            parse_expression(formula)
        assert fragment in err.value.detail


def test_unknown_dimensional_filter_is_refused():
    with pytest.raises(UnsupportedExpression):
        parse_expression("{C09.02, r0010, c0010, [RIO=eba_GA:GB]} = 0")
    # ...while the all-geographies CEG member resolves to the TOTAL sheet
    expr = parse_expression("{C09.02, r0010, c0010, [CEG=eba_GA:x1]} = 0")
    assert expr.root.lhs.geography == GEOGRAPHY_TOTAL_SHEET


# ---------------------------------------------------------------------------
# Status semantics
# ---------------------------------------------------------------------------


def test_identity_rules_pass_with_interval_tolerance(index):
    for formula in [
        "{C02.00, r0010, c0010} = {C02.00, r0060, c0010} + {C02.00, r0250, c0010}",
        "{t: C02.00, r: 0060, c: 0010} = {t: C07.00, r: 0010; 0020; 0030; 0040; 0050, c: 0020}",
        "{C02.00, r0250, c0010} = sum({C08.01, c0020})",
    ]:
        row = _one(GrammarRule("t", "EBA", formula), index)
        assert row[3] == STATUS_PASS, (formula, row)


def test_point_compares_exactly_where_interval_tolerates(index):
    # perturb within the Interval tolerance but beyond Point exactness
    rows = _estate_rows()
    rows[0] = ("C02.00", None, "0010", "0010", 100.0 + 1e-7)
    bumped = TemplateIndex.from_rows(rows, sheet_codes=_SHEET_CODES)
    formula = "{C02.00, r0010, c0010} = {C02.00, r0060, c0010} + {C02.00, r0250, c0010}"
    assert _one(GrammarRule("i", "EBA", formula), bumped)[3] == STATUS_PASS
    assert (
        _one(GrammarRule("p", "EBA", formula, arithmetic=ARITHMETIC_POINT), bumped)[3]
        == STATUS_FAIL
    )


def test_fail_injection_flips_pass_to_fail(index):
    """Break one reported cell → the tie-out that covered it FAILS (the
    evaluator can detect a corrupted estate, not just bless a clean one)."""
    formula = "{C02.00, r0010, c0010} = {C02.00, r0060, c0010} + {C02.00, r0250, c0010}"
    assert _one(GrammarRule("ok", "EBA", formula), index)[3] == STATUS_PASS
    rows = [
        ("C02.00", s, r, c, (v + 5.0 if (r, c) == ("0010", "0010") else v))
        if t == "C02.00"
        else (t, s, r, c, v)
        for (t, s, r, c, v) in _estate_rows()
    ]
    broken = TemplateIndex.from_rows(rows, sheet_codes=_SHEET_CODES)
    rid, src, coord, status, reason, lhs, rhs = _one(
        GrammarRule("broken", "EBA", formula), broken
    )
    assert status == STATUS_FAIL
    assert lhs == 105.0 and rhs == 100.0


def test_absent_cell_names_the_missing_axis(index):
    row = _one(GrammarRule("r", "EBA", "{C07.00, r9999, c0010} = 0"), index)
    assert (row[3], row[4]) == (STATUS_NOT_EVALUATED, "row_not_emitted")
    col = _one(GrammarRule("c", "EBA", "{C07.00, r0010, c9999} = 0"), index)
    assert (col[3], col[4]) == (STATUS_NOT_EVALUATED, "column_not_emitted")
    tab = _one(GrammarRule("t", "EBA", "{C99.99, r0010, c0010} = 0"), index)
    assert (tab[3], tab[4]) == (STATUS_NOT_EVALUATED, "cell_not_emitted")


def test_missing_value_policy_split(index):
    """The reported-empty cell: do-not-run skips; treat-as-zero evaluates —
    and an all-zero comparison is VACUOUS, never PASS."""
    formula = "{t: C07.00, r: 0090, c: 0010} = 0"
    skip = _one(GrammarRule("s", "BOE", formula, missing_value=MISSING_DO_NOT_RUN), index)
    assert (skip[3], skip[4]) == (STATUS_NOT_EVALUATED, "missing_value_do_not_run")
    zero = _one(GrammarRule("z", "BOE", formula, missing_value=MISSING_ZERO), index)
    assert zero[3] == STATUS_VACUOUS


def test_empty_form_ignores_missing_policy(index):
    fail = _one(GrammarRule("f", "EBA", "{C02.00, r0010, c0010} = empty"), index)
    assert fail[3] == STATUS_FAIL and fail[5] == 1.0 and fail[6] == 0.0
    vac = _one(
        GrammarRule(
            "v", "EBA", "{C07.00, r0090, c0010} = empty", missing_value=MISSING_ZERO
        ),
        index,
    )
    assert vac[3] == STATUS_VACUOUS
    ne = _one(GrammarRule("n", "EBA", "{C02.00, r0010, c0010} != empty"), index)
    assert ne[3] == STATUS_PASS


def test_geography_filter_selects_total_sheet(index):
    row = _one(
        GrammarRule(
            "g",
            "BOE",
            "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]} = "
            "{t: C09.02, r: 0010, c: 0010, z: 0001; 0002; 0003; 0004; 0005}",
        ),
        index,
    )
    assert row[3] == STATUS_PASS and row[5] == 150.0 and row[6] == 150.0


def test_max_expands_unbound_sheet_axis(index):
    row = _one(
        GrammarRule(
            "m",
            "BOE",
            "max({t: C09.02, r: 0010, c: 0010}) <= "
            "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]}",
        ),
        index,
    )
    assert row[3] == STATUS_PASS and row[5] == 150.0


def test_division_by_zero_is_a_skip(index):
    rows = _estate_rows() + [("C02.00", None, "0500", "0010", 0.0)]
    idx = TemplateIndex.from_rows(rows, sheet_codes=_SHEET_CODES)
    row = _one(
        GrammarRule(
            "d", "EBA", "{C02.00, r0010, c0010} / {C02.00, r0500, c0010} >= 0"
        ),
        idx,
    )
    assert (row[3], row[4]) == (STATUS_NOT_EVALUATED, "non_finite_value")


def test_all_zero_identity_is_vacuous_not_pass():
    rows = [
        ("C02.00", None, "0010", "0010", 0.0),
        ("C02.00", None, "0060", "0010", 0.0),
        ("C02.00", None, "0250", "0010", 0.0),
    ]
    idx = TemplateIndex.from_rows(rows)
    row = _one(
        GrammarRule(
            "v",
            "EBA",
            "{C02.00, r0010, c0010} = {C02.00, r0060, c0010} + {C02.00, r0250, c0010}",
        ),
        idx,
    )
    assert row[3] == STATUS_VACUOUS


# ---------------------------------------------------------------------------
# Coordinate grid (unbound axes outside aggregates)
# ---------------------------------------------------------------------------


def test_unbound_row_axis_iterates_the_grid(index):
    rows = evaluate_rule(GrammarRule("g", "EBA", "{C08.01, c0020} >= 0"), index)
    assert len(rows) == 5  # one outcome per emitted C08.01 row
    assert {r[2] for r in rows} == set(_C0X_ROWS)
    assert all(r[3] == STATUS_PASS for r in rows)


def test_evaluate_at_binds_the_coordinate(index):
    expr = parse_expression("{C08.01, c0020} = {C08.01, c0010} - {C08.01, c0020}")
    # rwa = ead − rwa holds exactly when ead = 2·rwa, true per construction
    out = evaluate_at(expr, Coordinate(table="C08.01", row="0020"), index)
    assert out.status == STATUS_PASS and out.lhs == 15.0


# ---------------------------------------------------------------------------
# Compiler ↔ evaluator agreement (DuckDB cross-check on the same estate)
# ---------------------------------------------------------------------------


def _facts_values_sql() -> str:
    parts = []
    for t, s, r, c, v in _estate_rows():
        sheet = SINGLE_SHEET if s is None else s
        val = "CAST(NULL AS DOUBLE)" if v is None else f"CAST({float(v)!r} AS DOUBLE)"
        parts.append(f"('{t}', '{sheet}', '{r}', '{c}', {val})")
    return (
        "SELECT * FROM (VALUES " + ", ".join(parts) + ") "
        "AS t(template, sheet, row_id, col_id, value)"
    )


_XCHECK_RULES = (
    GrammarRule(
        "x_rollup", "EBA",
        "{C02.00, r0010, c0010} = {C02.00, r0060, c0010} + {C02.00, r0250, c0010}",
    ),
    GrammarRule(
        "x_point", "EBA",
        "{C02.00, r0010, c0010} = {C02.00, r0060, c0010}",
        arithmetic=ARITHMETIC_POINT,
    ),
    GrammarRule("x_skip", "BOE", "{t: C07.00, r: 0090, c: 0010} = 0"),
    GrammarRule(
        "x_zero", "BOE", "{t: C07.00, r: 0090, c: 0010} = 0", missing_value=MISSING_ZERO
    ),
    GrammarRule("x_absent", "EBA", "{C07.00, r9999, c0010} = 0"),
    GrammarRule("x_if", "EBA", "if {C02.00, r0010, c0010} > 0 then 1 = 1"),
    GrammarRule("x_sum", "EBA", "{C02.00, r0250, c0010} = sum({C08.01, c0020})"),
    GrammarRule(
        "x_geo", "BOE",
        "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]} = "
        "{t: C09.02, r: 0010, c: 0010, z: 0001; 0002; 0003; 0004; 0005}",
    ),
    GrammarRule("x_empty_f", "EBA", "{C02.00, r0010, c0010} = empty"),
    GrammarRule("x_empty_v", "EBA", "{C07.00, r0090, c0010} = empty"),
    GrammarRule(
        "x_max", "BOE",
        "max({t: C09.02, r: 0010, c: 0010}) <= "
        "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]}",
    ),
    # a geography filter against a SINGLE-sheet template binds to the one
    # sheet (the reference's _reference_sheets short-circuit) — both
    # engines must evaluate, not skip
    GrammarRule(
        "x_single_geo", "BOE",
        "{t: C07.00, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]} = "
        "{t: C07.00, r: 0010, c: 0010}",
    ),
    # an unknown positional sheet code is a sheet_not_emitted skip in both
    # engines, never a compile crash
    GrammarRule("x_badcode", "BOE", "{t: C09.02, r: 0010, c: 0010, z: 9999} = 0"),
)


def test_compiled_oracle_matches_evaluator_rowwise(index):
    duckdb = pytest.importorskip("duckdb")
    sql = rules_oracle_sql(
        _XCHECK_RULES, _facts_values_sql(), _ESTATE_AXES, _SHEET_CODES
    )
    got = duckdb.connect().execute(sql).fetchall()
    want = [row for rule in _XCHECK_RULES for row in evaluate_rule(rule, index)]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert g[3] == w[3], (g, w)  # status
        assert g[4] == w[4], (g, w)  # reason
        for gv, wv in ((g[5], w[5]), (g[6], w[6])):
            if wv is None:
                assert gv is None or (isinstance(gv, float) and math.isnan(gv)), (g, w)
            else:
                assert gv == pytest.approx(wv, abs=1e-12), (g, w)


def test_catalogue_compiles_and_every_rule_evaluates():
    """Every GRAMMAR_RULES entry must both compile to oracle SQL and
    evaluate — a rule the compiler refuses (division, unbound axes) would
    otherwise crash catalogue_oracle_sql() at import time and take the
    whole query registry down with it."""
    from rwa_calculator_spark.reporting_grammar_catalog import (
        GRAMMAR_RULES,
        catalogue_oracle_sql,
    )

    sql = catalogue_oracle_sql()
    for rule in GRAMMAR_RULES:
        assert f"'{rule.rule_id}'" in sql


# ---------------------------------------------------------------------------
# Property: evaluator ≡ compiled oracle on RANDOM estates (the adversarial
# version of the row-wise cross-check — random cell values, random absent
# and reported-empty cells, every catalogue-shaped rule form)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


#: Templates addressed through UNBOUND axes (sum over rows, max over
#: sheets). Their random emission is RECTANGULAR — emitted-sheets ×
#: emitted-rows × emitted-cols, no per-cell holes and no reported-null
#: cells — which is the kernel-emitted shape the compiler's region
#: semantics are specified against (compute_cells always emits every
#: declared cell). Explicit-ref templates keep fully adversarial per-cell
#: states.
_RECTANGULAR = ("C08.01", "C09.02")


def _random_estate_rows(draw):
    rows = []
    for t, axes in _ESTATE_AXES.items():
        if t in _RECTANGULAR:
            sheets = [s for s in axes.sheets if draw(st.booleans())]
            emit_rows = [r for r in axes.rows if draw(st.booleans())]
            emit_cols = [c for c in axes.columns if draw(st.booleans())]
            for s in sheets:
                for r in emit_rows:
                    for c in emit_cols:
                        v = float(draw(st.integers(-10_000, 10_000))) / 4.0
                        rows.append((t, s, r, c, v))
            continue
        for s in axes.sheets:
            for r in axes.rows:
                for c in axes.columns:
                    state = draw(
                        st.sampled_from(["absent", "empty", "zero", "value"])
                    )
                    if state == "absent":
                        continue
                    if state == "empty":
                        rows.append((t, s, r, c, None))
                    elif state == "zero":
                        rows.append((t, s, r, c, 0.0))
                    else:
                        rows.append(
                            (t, s, r, c, float(draw(st.integers(-10_000, 10_000))) / 4.0)
                        )
    return rows


_PROPERTY_RULES = [
    GrammarRule(
        "p_rollup", "EBA",
        "{C02.00, r0010, c0010} = {C02.00, r0060, c0010} + {C02.00, r0250, c0010}",
    ),
    GrammarRule(
        "p_point", "EBA",
        "{C02.00, r0010, c0010} = {C02.00, r0060, c0010}",
        arithmetic=ARITHMETIC_POINT,
    ),
    GrammarRule(
        "p_multirow", "BOE",
        "{t: C02.00, r: 0060, c: 0010} <= "
        "{t: C07.00, r: 0010; 0020; 0030, c: 0020}",
        missing_value=MISSING_ZERO,
    ),
    GrammarRule("p_sum", "EBA", "{C02.00, r0250, c0010} >= sum({C08.01, c0020})"),
    GrammarRule(
        "p_geo", "BOE",
        "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]} = "
        "{t: C09.02, r: 0010, c: 0010, z: 0001; 0002; 0003; 0004; 0005}",
        missing_value=MISSING_ZERO,
    ),
    GrammarRule(
        "p_max", "BOE",
        "max({t: C09.02, r: 0010, c: 0010}) <= "
        "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]}",
    ),
    GrammarRule("p_empty", "EBA", "{C07.00, r0090, c0010} = empty"),
    GrammarRule("p_zero_vac", "BOE", "{t: C07.00, r: 0090, c: 0010} = 0",
                missing_value=MISSING_ZERO),
    GrammarRule("p_pct", "EBA", "{C02.00, r0060, c0010} <= 100% * {C02.00, r0010, c0010}"),
    GrammarRule(
        "p_abs", "EBA",
        "abs({C02.00, r0010, c0010} - {C02.00, r0060, c0010}"
        " - {C02.00, r0250, c0010}) <= 0.01",
    ),
]


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_property_evaluator_matches_compiled_oracle(data):
    """For ANY estate (random values, absences, reported-empties) the
    Python evaluator and the compiled DuckDB oracle must agree on every
    rule's status, reason, and figures — the contract that makes the
    oracle an independent check rather than a second copy of the code."""
    duckdb = pytest.importorskip("duckdb")
    rows = _random_estate_rows(data.draw)
    idx = TemplateIndex.from_rows(rows, sheet_codes=_SHEET_CODES)
    if rows:
        parts = []
        for t, s, r, c, v in rows:
            val = "CAST(NULL AS DOUBLE)" if v is None else f"CAST({float(v)!r} AS DOUBLE)"
            parts.append(f"('{t}', '{s}', '{r}', '{c}', {val})")
        facts_sql = (
            "SELECT * FROM (VALUES " + ", ".join(parts) + ") "
            "AS t(template, sheet, row_id, col_id, value)"
        )
    else:
        facts_sql = (
            "SELECT * FROM (VALUES ('_', '_', '_', '_', CAST(NULL AS DOUBLE))) "
            "AS t(template, sheet, row_id, col_id, value) WHERE FALSE"
        )
    sql = rules_oracle_sql(_PROPERTY_RULES, facts_sql, _ESTATE_AXES, _SHEET_CODES)
    got = duckdb.connect().execute(sql).fetchall()
    want = [row for rule in _PROPERTY_RULES for row in evaluate_rule(rule, idx)]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g[0], g[3], g[4]) == (w[0], w[3], w[4]), (g, w)
        for gv, wv in ((g[5], w[5]), (g[6], w[6])):
            if wv is None:
                assert gv is None or (isinstance(gv, float) and math.isnan(gv)), (g, w)
            else:
                assert gv == pytest.approx(wv, rel=1e-12, abs=1e-12), (g, w)


def test_rule_lineage_pinpoints_the_broken_cell(index):
    """'A cell's lineage IS its spec': the drilldown re-resolves the rule's
    own references, so a FAIL row leads straight to the cells that fed it —
    including the injected corruption."""
    from rwa_calculator_spark.reporting_grammar import rule_cell_lineage

    rule = GrammarRule(
        "lin", "EBA",
        "{C02.00, r0010, c0010} = {C02.00, r0060, c0010} + {C02.00, r0250, c0010}",
    )
    legs = rule_cell_lineage(rule, index)
    assert [(l[1], l[4], l[7]) for l in legs] == [
        ("lhs", "0010", 100.0),
        ("rhs", "0060", 40.0),
        ("rhs", "0250", 60.0),
    ]
    # an absent referenced cell surfaces as present=False — the
    # NOT_EVALUATED explanation without re-deriving the grammar
    legs2 = rule_cell_lineage(
        GrammarRule("lin2", "EBA", "{C07.00, r9999, c0010} = 0"), index
    )
    assert legs2 == [("lin2", "lhs", "C07.00", "_", "9999", "0010", False, None)]
    # aggregates expand to every emitted cell they actually read
    legs3 = rule_cell_lineage(
        GrammarRule("lin3", "EBA", "{C02.00, r0250, c0010} = sum({C08.01, c0020})"),
        index,
    )
    rhs_rows = [l[4] for l in legs3 if l[1] == "rhs"]
    assert rhs_rows == ["0010", "0020", "0030", "0040", "0050"]


# ---------------------------------------------------------------------------
# Scoping layer (reporting_scope; ref reporting/validations/scope.py)
# ---------------------------------------------------------------------------


def test_rule_scope_module_gating():
    from rwa_calculator_spark.reporting_scope import (
        COREP_ONLY_SUBMISSION,
        FULL_SUBMISSION,
        rule_scope,
        rule_templates,
    )

    corep = GrammarRule("s1", "EBA", "{C02.00, r0010, c0010} >= 0")
    p3 = GrammarRule("s2", "EBA", "{CR04, r0010, c0010} >= 0")
    cross = GrammarRule(
        "s3", "EBA", "{CR04, r0010, c0010} = {C07.00, r0010, c0010}"
    )
    assert rule_templates(cross) == ("C07.00", "CR04")
    assert rule_scope(corep, FULL_SUBMISSION) == ("in_scope", "")
    assert rule_scope(p3, FULL_SUBMISSION) == ("in_scope", "")
    assert rule_scope(corep, COREP_ONLY_SUBMISSION) == ("in_scope", "")
    assert rule_scope(p3, COREP_ONLY_SUBMISSION) == (
        "not_in_scope", "module_not_filed:pillar3",
    )
    # cross-module: one side filed is NOT enough (prerequisite-table skip)
    assert rule_scope(cross, COREP_ONLY_SUBMISSION) == (
        "not_in_scope", "module_not_filed:pillar3",
    )


def test_rule_scope_unknown_template_named():
    from rwa_calculator_spark.reporting_scope import FULL_SUBMISSION, rule_scope

    ghost = GrammarRule("s4", "EBA", "{C 99.99, r0010, c0010} >= 0")
    scope, why = rule_scope(ghost, FULL_SUBMISSION)
    assert scope == "not_in_scope"
    assert why == "template_unmapped:C99.99"


def test_rule_scope_places_rules_the_evaluator_refuses():
    # the scope layer must place even if/then conditionals the grammar
    # refuses by name — the token-scan fallback extracts their tables
    from rwa_calculator_spark.reporting_scope import (
        COREP_ONLY_SUBMISSION,
        rule_scope,
    )

    cond = GrammarRule(
        "s5", "EBA",
        "if {CR04, r0010, c0010} > 0 then {CR04, r0020, c0010} >= 0",
    )
    assert rule_scope(cond, COREP_ONLY_SUBMISSION) == (
        "not_in_scope", "module_not_filed:pillar3",
    )


def test_out_of_scope_rule_is_excluded_not_vacuous(index):
    """The load-bearing distinction: a rule that WOULD FAIL if evaluated
    reports NOT_IN_SCOPE under a filing that excludes its module — it is
    never handed to the evaluator, so there is no FAIL, no VACUOUS, and no
    NOT_EVALUATED masquerading as a scope verdict."""
    from rwa_calculator_spark.reporting_scope import (
        FULL_SUBMISSION,
        STATUS_NOT_IN_SCOPE,
        SubmissionContext,
        scoped_outcomes,
    )

    # C02.00 r0010 c0010 is reported as 100.0 in this estate — `= 0` FAILS
    breaker = GrammarRule("s6", "EBA", "{C02.00, r0010, c0010} = 0")
    full = scoped_outcomes([breaker], index, FULL_SUBMISSION)
    assert [r[3] for r in full] == ["FAIL"]
    assert [r[7] for r in full] == ["in_scope"]

    # a filing that produces only the Pillar 3 set excludes the COREP rule
    reduced = scoped_outcomes([breaker], index, SubmissionContext(("pillar3",)))
    assert len(reduced) == 1
    rid, source, coord, status, reason, lhs, rhs, scope = reduced[0]
    assert status == STATUS_NOT_IN_SCOPE
    assert status not in ("FAIL", "VACUOUS", "NOT_EVALUATED")
    assert reason == "module_not_filed:corep_of"
    assert scope == "not_in_scope"
    assert lhs is None and rhs is None and coord == ""


def test_catalogue_count_pinned_at_200():
    """Round-6 widening: the catalogue states the full sign / band /
    population / geography / syntax-tie families over the estate — ≥200
    rules, every one compiled to oracle SQL (the compile test above)."""
    from rwa_calculator_spark.reporting_grammar_catalog import GRAMMAR_RULES

    assert len(GRAMMAR_RULES) >= 200
    ids = [r.rule_id for r in GRAMMAR_RULES]
    assert len(ids) == len(set(ids))
