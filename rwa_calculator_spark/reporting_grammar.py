"""Supervisory validation-rule GRAMMAR evaluator (ref
reporting/validations/evaluate.py:1-861 — parse both publishers' reference
grammars onto one AST, evaluate with the publisher's own semantics, and
refuse by name every construct not supported).

The round-3 `report_validation_rules` surface evaluates a curated
`lhs == Σ rhs` rule shape; this module is the full grammar the reference
ships:

- **Both publishers' reference syntaxes.** The EBA writes
  ``{C 08.01, r0070, c0020}`` with positional axis tokens (``r``/``c``/``s``
  + sheet ranges ``(s0003-0004)``); the BoE writes keyed references
  ``{t: C08.01, r: 0070, c: 0020, z: 0002}`` with ``;``-separated
  multi-valued axes. Both normalise onto one ``Ref`` (evaluate.py:186-203).
- **Dimensional filters**: only the counterparty-geography total
  ``[CEG = eba_GA:x1]`` (EBA) / ``filter: [eba_dim:CEG] = [eba_GA:x1]``
  (BoE) is understood — it addresses the all-geographies TOTAL sheet; every
  other dimension/member is refused by name (evaluate.py:103-135, 530-548:
  guessing a sheet "would produce confident findings on the wrong
  population").
- **Expressions**: + − * /, parentheses, unary sign, numeric literals with
  ``%``, ``abs``/``sum``/``max``/``min`` calls, ``= != >= <= > <``
  comparisons, and the ``{ref} = empty`` nonexistence form. A ref inside an
  aggregate expands its unbound axes to every emitted id; outside one it
  binds to the coordinate (evaluate.py:562-577, 763-785).
- **Statuses**: PASS / FAIL / VACUOUS / NOT_EVALUATED. A structurally
  ABSENT cell is a skip naming WHICH axis is missing — never a zero and
  never a break; an all-zero comparison is VACUOUS, not a pass; a
  present-but-null cell follows the rule's missing-value policy ("treat as
  zero" vs "do not run") (evaluate.py:21-29, 585-597, 660-695).
- **Arithmetic**: ``Point`` compares exactly (−0.0 folded onto 0.0);
  ``Interval`` allows the golden rounding tolerance
  atol 1e-6 + rtol 1e-9 · max(|lhs|,|rhs|) (evaluate.py:831-861).

An AST→SQL compiler (`rules_oracle_sql`) renders each parsed rule as DuckDB
SQL over the same facts estate, in the evaluator's own cell-traversal order
(lhs before rhs, sheets→rows→columns, left-to-right additions) so the two
engines agree bit-for-bit — the spec and the oracle derive from ONE parse.

Scale posture: rules evaluate over the cell FACTS of a template estate —
O(#cells), thousands at most, collected once — never over exposure rows;
the expensive part (computing the cells) is the one-pass aggregation in
reporting.compute_cells.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

STATUS_PASS = "PASS"
STATUS_FAIL = "FAIL"
STATUS_VACUOUS = "VACUOUS"
STATUS_NOT_EVALUATED = "NOT_EVALUATED"

ARITHMETIC_POINT = "Point"
ARITHMETIC_INTERVAL = "Interval"
MISSING_ZERO = "zero"  # EBA "If value missing: treat as zero" / BoE dv:0
MISSING_DO_NOT_RUN = "do_not_run"

DEFAULT_RTOL = 1e-9
DEFAULT_ATOL = 1e-6

SKIP_UNSUPPORTED_GRAMMAR = "unsupported_grammar"
SKIP_NO_EXPRESSION = "no_expression"
SKIP_MISSING_VALUE_DO_NOT_RUN = "missing_value_do_not_run"
SKIP_CELL_NOT_EMITTED = "cell_not_emitted"
SKIP_ROW_NOT_EMITTED = "row_not_emitted"
SKIP_COLUMN_NOT_EMITTED = "column_not_emitted"
SKIP_SHEET_NOT_EMITTED = "sheet_not_emitted"
SKIP_AMBIGUOUS_AXIS = "ambiguous_axis"
SKIP_NON_FINITE_VALUE = "non_finite_value"

#: Constructs deliberately refused, each with the recorded reason
#: (evaluate.py:88-101: "evaluating any of them approximately would produce
#: findings that look authoritative and are not").
_UNSUPPORTED_MARKERS = (
    ("if ", "conditional (if/then) rule"),
    ("then", "conditional (if/then) rule"),
    ("where(", "where(...) row filter"),
    ("count(", "count(...) aggregate"),
    ("isnull", "isNull(...) predicate"),
    ("true()", "boolean literal"),
    (" and ", "boolean conjunction"),
    (" or ", "boolean disjunction"),
    ("not(", "negated dimensional filter"),
)

_GEOGRAPHY_DIMENSION = "CEG"
_GEOGRAPHY_TOTAL_MEMBER = "eba_GA:x1"
GEOGRAPHY_TOTAL_SHEET = "TOTAL"
SINGLE_SHEET = "_"

_AGGREGATES = frozenset({"sum", "max", "min"})

_TOKEN = re.compile(
    r"(?P<ref>\{[^{}]*\})"
    r"|(?P<number>\d*\.?\d+\s*%?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<compare>==|>=|<=|!=|=|>|<)"
    r"|(?P<punct>[+\-*/(),])"
    r"|(?P<space>\s+)"
)
_EBA_AXIS = re.compile(r"^(?P<axis>[rcs])(?P<id>\d{3,5})$")
_EBA_SHEET_RANGE = re.compile(r"^\(s(?P<start>\d{3,4})\s*-\s*s?(?P<end>\d{3,4})\)$")
_BOE_KEY = re.compile(r"^(?P<key>[a-z]+)\s*:\s*(?P<value>.*)$", re.DOTALL)
_BOE_FILTER = re.compile(r"^\[eba_dim:(?P<dim>[A-Za-z_]+)\]\s*=\s*\[(?P<member>[^]]+)\]$")
_EBA_FILTER = re.compile(r"^\[(?P<dim>[A-Za-z_]+)\s*=\s*(?P<member>[^]]+)\]$")
_OPEN_ROW_WILDCARD = re.compile(r"\br[Nn]{2,}\b")


class UnsupportedExpression(Exception):
    def __init__(self, reason: str, detail: str = "") -> None:
        super().__init__(detail or reason)
        self.reason = reason
        self.detail = detail


class SkipCell(Exception):
    """This coordinate cannot be evaluated (absent cell, missing value)."""

    def __init__(self, reason: str, detail: str = "") -> None:
        super().__init__(detail or reason)
        self.reason = reason
        self.detail = detail


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Ref:
    """One {...} cell reference, normalised across both grammars. An axis
    left None binds to the coordinate, or (inside an aggregate) to every
    emitted value; `geography` names the TOTAL sheet a dimensional filter
    selects."""

    table: Optional[str]
    rows: Optional[tuple[str, ...]]
    columns: Optional[tuple[str, ...]]
    sheets: Optional[tuple[str, ...]]
    geography: Optional[str] = None


@dataclass(frozen=True)
class Number:
    value: float


@dataclass(frozen=True)
class EmptyLiteral:
    """The ``empty`` keyword — "this cell must not be reported"."""


@dataclass(frozen=True)
class Call:
    name: str
    args: tuple


@dataclass(frozen=True)
class BinOp:
    op: str
    lhs: object
    rhs: object


@dataclass(frozen=True)
class Compare:
    op: str
    lhs: object
    rhs: object


@dataclass(frozen=True)
class Expression:
    root: Compare
    needs_row_axis: bool
    needs_column_axis: bool
    needs_sheet_axis: bool


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------


def parse_expression(text: Optional[str]) -> Expression:
    """Parse a publisher formula into an Expression, refusing unsupported
    constructs by name (evaluate.py:270-299)."""
    if not text or not text.strip():
        raise UnsupportedExpression(SKIP_NO_EXPRESSION, "rule carries no formula")
    lowered = text.lower()
    for marker, detail in _UNSUPPORTED_MARKERS:
        if marker in lowered:
            raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, detail)
    if _OPEN_ROW_WILDCARD.search(text):
        raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, "open-row wildcard")
    parser = _Parser(_tokenise(text))
    root = parser.parse_comparison()
    refs = _refs_outside_aggregates(root)
    return Expression(
        root=root,
        needs_row_axis=any(r.rows is None for r in refs),
        needs_column_axis=any(r.columns is None for r in refs),
        # a ref that names its own sheet (positionally or via the geography
        # filter) does not make the coordinate grid iterate sheets
        needs_sheet_axis=any(r.sheets is None and r.geography is None for r in refs),
    )


def _tokenise(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            raise UnsupportedExpression(
                SKIP_UNSUPPORTED_GRAMMAR,
                f"unparseable at offset {pos}: {text[pos : pos + 20]!r}",
            )
        pos = m.end()
        if m.lastgroup != "space":
            tokens.append((m.lastgroup or "", m.group().strip()))
    return tokens


class _Parser:
    """Recursive descent: one comparison of two sum/product expressions."""

    def __init__(self, tokens: Sequence[tuple[str, str]]) -> None:
        self._t = tokens
        self._i = 0

    def parse_comparison(self) -> Compare:
        lhs = self._sum()
        kind, text = self._peek()
        if kind != "compare":
            raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, "no top-level comparison")
        self._next()
        rhs = self._sum()
        if self._i != len(self._t):
            raise UnsupportedExpression(
                SKIP_UNSUPPORTED_GRAMMAR, f"trailing tokens: {self._t[self._i:]}"
            )
        return Compare(text, lhs, rhs)

    def _sum(self):
        node = self._product()
        while self._peek() in (("punct", "+"), ("punct", "-")):
            op = self._next()[1]
            node = BinOp(op, node, self._product())
        return node

    def _product(self):
        node = self._unary()
        while self._peek() in (("punct", "*"), ("punct", "/")):
            op = self._next()[1]
            node = BinOp(op, node, self._unary())
        return node

    def _unary(self):
        kind, text = self._peek()
        if kind == "punct" and text in ("+", "-"):
            self._next()
            operand = self._unary()
            return operand if text == "+" else BinOp("-", Number(0.0), operand)
        return self._atom()

    def _atom(self):
        kind, text = self._next()
        if kind == "ref":
            return _parse_ref(text)
        if kind == "number":
            body = text.replace(" ", "")
            return Number(float(body[:-1]) / 100.0 if body.endswith("%") else float(body))
        if kind == "ident":
            return self._call(text)
        if kind == "punct" and text == "(":
            node = self._sum()
            self._expect(")")
            return node
        raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, f"unexpected token {text!r}")

    def _call(self, name: str):
        lowered = name.lower()
        if lowered == "empty":
            return EmptyLiteral()
        if self._peek() != ("punct", "("):
            raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, f"bare identifier {name!r}")
        self._next()
        args = [self._sum()]
        while self._peek() == ("punct", ","):
            self._next()
            args.append(self._sum())
        self._expect(")")
        if lowered not in _AGGREGATES and lowered != "abs":
            raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, f"function {name}(...)")
        return Call(lowered, tuple(args))

    def _peek(self):
        return self._t[self._i] if self._i < len(self._t) else ("", "")

    def _next(self):
        if self._i >= len(self._t):
            raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, "expression ended early")
        tok = self._t[self._i]
        self._i += 1
        return tok

    def _expect(self, text: str) -> None:
        kind, actual = self._next()
        if kind != "punct" or actual != text:
            raise UnsupportedExpression(
                SKIP_UNSUPPORTED_GRAMMAR, f"expected {text!r}, got {actual!r}"
            )


def _parse_ref(text: str) -> Ref:
    """Parse one {...} reference in either publisher's grammar
    (evaluate.py:463-527)."""
    body = text.strip("{}").strip()
    if not body:
        raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, "empty reference")
    table: Optional[str] = None
    rows: list[str] = []
    columns: list[str] = []
    sheets: list[str] = []
    geography: Optional[str] = None
    for token in (p.strip() for p in body.split(",")):
        if not token:
            continue
        keyed = _BOE_KEY.match(token)
        if keyed is not None and keyed.group("key") in (
            "t", "r", "c", "z", "dv", "seq", "id", "f", "fv", "filter",
        ):
            key, value = keyed.group("key"), keyed.group("value").strip()
            if key == "t":
                table = value
            elif key == "r":
                rows.extend(_split_ids(value))
            elif key == "c":
                columns.extend(_split_ids(value))
            elif key == "z":
                sheets.extend(_split_ids(value))
            elif key == "filter":
                geography = _parse_filter(_BOE_FILTER, value)
            continue
        if token.startswith("["):
            geography = _parse_filter(_EBA_FILTER, token)
            continue
        axis = _EBA_AXIS.match(token)
        if axis is not None:
            {"r": rows, "c": columns, "s": sheets}[axis.group("axis")].append(
                axis.group("id")
            )
            continue
        span = _EBA_SHEET_RANGE.match(token)
        if span is not None:
            start, end = span.group("start"), span.group("end")
            width = max(len(start), len(end))
            sheets.extend(str(c).zfill(width) for c in range(int(start), int(end) + 1))
            continue
        if table is None:
            table = token
            continue
        raise UnsupportedExpression(
            SKIP_UNSUPPORTED_GRAMMAR, f"unrecognised reference part {token!r}"
        )
    return Ref(
        table=table,
        rows=tuple(rows) or None,
        columns=tuple(columns) or None,
        sheets=tuple(sheets) or None,
        geography=geography,
    )


def _parse_filter(pattern: re.Pattern, text: str) -> str:
    """Only CEG = eba_GA:x1 (the all-geographies TOTAL) is understood;
    every other dimension/member is refused by name (evaluate.py:530-548)."""
    m = pattern.match(text.strip())
    if m is None:
        raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, f"dimensional filter {text!r}")
    dim, member = m.group("dim").strip(), m.group("member").strip()
    if dim != _GEOGRAPHY_DIMENSION or member != _GEOGRAPHY_TOTAL_MEMBER:
        raise UnsupportedExpression(
            SKIP_UNSUPPORTED_GRAMMAR, f"dimensional filter [{dim}] = [{member}]"
        )
    return GEOGRAPHY_TOTAL_SHEET


def _split_ids(value: str) -> list[str]:
    return [t.strip() for t in value.split(";") if t.strip()]


def _refs_outside_aggregates(node, aggregated: bool = False) -> list[Ref]:
    if isinstance(node, Ref):
        return [] if aggregated else [node]
    if isinstance(node, Call):
        inner = aggregated or node.name in _AGGREGATES
        return [r for a in node.args for r in _refs_outside_aggregates(a, inner)]
    if isinstance(node, (BinOp, Compare)):
        return _refs_outside_aggregates(node.lhs, aggregated) + _refs_outside_aggregates(
            node.rhs, aggregated
        )
    return []


# ---------------------------------------------------------------------------
# Template index (the facts estate)
# ---------------------------------------------------------------------------


@dataclass
class TemplateIndex:
    """Driver-side index over a cell-facts estate.

    Built from (template, sheet, row_id, col_id, value) rows — the long
    facts frame reporting.compute_cells emits (sheet None → the single-sheet
    key). A cell present in the estate with value None is REPORTED-EMPTY
    (the missing-value policy applies); an address with no row is ABSENT
    (always a skip, naming the missing axis). `sheet_codes` maps publisher
    positional sheet codes (``z: 0002`` / ``s0002``) onto sheet keys per
    template."""

    cells: dict = field(default_factory=dict)  # (t, s, r, c) -> value|None
    _rows: dict = field(default_factory=dict)  # (t, s) -> sorted tuple
    _cols: dict = field(default_factory=dict)
    _sheets: dict = field(default_factory=dict)  # t -> sorted tuple
    sheet_codes: dict = field(default_factory=dict)  # t -> {code: sheet}

    @classmethod
    def from_rows(cls, rows, sheet_codes: Optional[dict] = None) -> "TemplateIndex":
        idx = cls(sheet_codes=dict(sheet_codes or {}))
        rowsets: dict = {}
        colsets: dict = {}
        sheetsets: dict = {}
        for t, s, r, c, v in rows:
            s = SINGLE_SHEET if s is None else s
            idx.cells[(t, s, r, c)] = v
            rowsets.setdefault((t, s), set()).add(r)
            colsets.setdefault((t, s), set()).add(c)
            sheetsets.setdefault(t, set()).add(s)
        idx._rows = {k: tuple(sorted(v)) for k, v in rowsets.items()}
        idx._cols = {k: tuple(sorted(v)) for k, v in colsets.items()}
        idx._sheets = {k: tuple(sorted(v)) for k, v in sheetsets.items()}
        return idx

    def is_emitted(self, table: str) -> bool:
        return table in self._sheets

    def sheet_keys(self, table: str) -> tuple:
        return self._sheets.get(table, ())

    def row_refs(self, table: str, sheet: str) -> tuple:
        return self._rows.get((table, sheet), ())

    def column_refs(self, table: str, sheet: str) -> tuple:
        return self._cols.get((table, sheet), ())

    def present(self, table: str, sheet: str, row: str, col: str) -> bool:
        return (table, sheet, row, col) in self.cells

    def value(self, table: str, sheet: str, row: str, col: str):
        return self.cells.get((table, sheet, row, col))


@dataclass(frozen=True)
class Coordinate:
    table: str
    sheet: Optional[str] = None
    row: Optional[str] = None
    column: Optional[str] = None


@dataclass(frozen=True)
class Outcome:
    status: str
    lhs: Optional[float] = None
    rhs: Optional[float] = None
    reason: str = ""
    detail: str = ""


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


@dataclass
class _Context:
    index: TemplateIndex
    coordinate: Coordinate
    missing_value: str
    vacuous: bool = True

    def observe(self, value: float) -> None:
        if value != 0.0:
            self.vacuous = False


def evaluate_at(
    expression: Expression,
    coordinate: Coordinate,
    index: TemplateIndex,
    *,
    missing_value: str = MISSING_DO_NOT_RUN,
    arithmetic: str = ARITHMETIC_INTERVAL,
) -> Outcome:
    """Evaluate one parsed rule at one coordinate; never raises for a data
    condition (evaluate.py:302-335)."""
    ctx = _Context(index=index, coordinate=coordinate, missing_value=missing_value)
    root = expression.root
    try:
        if isinstance(root.lhs, EmptyLiteral) or isinstance(root.rhs, EmptyLiteral):
            return _evaluate_emptiness(root, ctx)
        lhs = _value_of(root.lhs, ctx, aggregated=False)
        rhs = _value_of(root.rhs, ctx, aggregated=False)
    except SkipCell as skip:
        return Outcome(STATUS_NOT_EVALUATED, reason=skip.reason, detail=skip.detail)
    if not (math.isfinite(lhs) and math.isfinite(rhs)):
        return Outcome(
            STATUS_NOT_EVALUATED, lhs, rhs, SKIP_NON_FINITE_VALUE, "NaN/inf operand"
        )
    if not _compare(root.op, lhs, rhs, arithmetic):
        return Outcome(STATUS_FAIL, lhs, rhs)
    if ctx.vacuous:
        return Outcome(STATUS_VACUOUS, lhs, rhs)
    return Outcome(STATUS_PASS, lhs, rhs)


def _value_of(node, ctx: _Context, *, aggregated: bool) -> float:
    if isinstance(node, Number):
        return node.value
    if isinstance(node, Ref):
        return sum(_resolve_cells(node, ctx, aggregated=aggregated))
    if isinstance(node, BinOp):
        lhs = _value_of(node.lhs, ctx, aggregated=aggregated)
        rhs = _value_of(node.rhs, ctx, aggregated=aggregated)
        if node.op == "+":
            return lhs + rhs
        if node.op == "-":
            return lhs - rhs
        if node.op == "*":
            return lhs * rhs
        if rhs == 0.0:
            raise SkipCell(SKIP_NON_FINITE_VALUE, "division by zero")
        return lhs / rhs
    if isinstance(node, Call):
        if node.name == "abs":
            return abs(_value_of(node.args[0], ctx, aggregated=aggregated))
        if node.name == "sum":
            return sum(_value_of(a, ctx, aggregated=True) for a in node.args)
        flat: list[float] = []
        for a in node.args:
            if isinstance(a, Ref):
                flat.extend(_resolve_cells(a, ctx, aggregated=True))
            else:
                flat.append(_value_of(a, ctx, aggregated=True))
        if not flat:
            raise SkipCell(SKIP_CELL_NOT_EMITTED, f"{node.name}(...) over no emitted cell")
        return max(flat) if node.name == "max" else min(flat)
    raise UnsupportedExpression(
        SKIP_UNSUPPORTED_GRAMMAR, f"cannot evaluate {type(node).__name__}"
    )


def _resolve_cells(ref: Ref, ctx: _Context, *, aggregated: bool) -> list[float]:
    """Read every cell a reference addresses, applying the missing-value
    policy; absent always skips, naming the missing axis
    (evaluate.py:660-695)."""
    table, sheets, rows, columns = _reference_axes(ref, ctx, aggregated=aggregated)
    out: list[float] = []
    for sheet in sheets:
        for row in rows:
            for col in columns:
                if not ctx.index.present(table, sheet, row, col):
                    raise _absence(ctx, table, sheet, row, col)
                v = ctx.index.value(table, sheet, row, col)
                if v is None:
                    if ctx.missing_value != MISSING_ZERO:
                        raise SkipCell(
                            SKIP_MISSING_VALUE_DO_NOT_RUN,
                            f"{table}[{sheet}][r{row}][c{col}] is not reported",
                        )
                    out.append(0.0)
                    continue
                ctx.observe(v)
                out.append(v)
    return out


def _absence(ctx: _Context, table: str, sheet: str, row: str, col: str) -> SkipCell:
    """Name WHICH axis is missing — a row the estate never emits is a scope
    statement, a missing column usually a framework-variant gap
    (evaluate.py:683-695)."""
    where = f"{table}[{sheet}][r{row}][c{col}]"
    if row not in ctx.index.row_refs(table, sheet):
        return SkipCell(SKIP_ROW_NOT_EMITTED, f"{where}: row {row} is not emitted")
    if col not in ctx.index.column_refs(table, sheet):
        return SkipCell(SKIP_COLUMN_NOT_EMITTED, f"{where}: column {col} is not emitted")
    return SkipCell(SKIP_CELL_NOT_EMITTED, f"{where} not emitted")


def _reference_axes(ref: Ref, ctx: _Context, *, aggregated: bool):
    coordinate = ctx.coordinate
    table = ref.table or coordinate.table
    if not ctx.index.is_emitted(table):
        raise SkipCell(SKIP_CELL_NOT_EMITTED, f"{table} not emitted")
    sheets = _reference_sheets(ref, table, ctx, aggregated=aggregated)
    rows = _axis(
        ref.rows, coordinate.row,
        lambda s: ctx.index.row_refs(table, s), sheets, aggregated, "row",
    )
    columns = _axis(
        ref.columns, coordinate.column,
        lambda s: ctx.index.column_refs(table, s), sheets, aggregated, "column",
    )
    return table, sheets, rows, columns


def _reference_sheets(ref: Ref, table: str, ctx: _Context, *, aggregated: bool):
    emitted = ctx.index.sheet_keys(table)
    if not emitted:
        raise SkipCell(SKIP_CELL_NOT_EMITTED, f"{table} has no emitted sheet")
    if emitted == (SINGLE_SHEET,):
        return emitted
    if ref.geography is not None:
        if ref.geography not in emitted:
            raise SkipCell(
                SKIP_SHEET_NOT_EMITTED, f"{table} has no {ref.geography} geography sheet"
            )
        return (ref.geography,)
    if ref.sheets is not None:
        code_map = ctx.index.sheet_codes.get(table)
        if code_map is None:
            raise SkipCell(SKIP_AMBIGUOUS_AXIS, f"{table} sheets are not indexed positionally")
        resolved = []
        for code in ref.sheets:
            sheet = code_map.get(code)
            if sheet is None or sheet not in emitted:
                raise SkipCell(
                    SKIP_SHEET_NOT_EMITTED, f"{table} sheet code {code} is not emitted"
                )
            resolved.append(sheet)
        return tuple(resolved)
    if ctx.coordinate.sheet in emitted:
        return (ctx.coordinate.sheet,)
    if aggregated:
        return emitted
    raise SkipCell(SKIP_AMBIGUOUS_AXIS, f"{table} sheet not fixed by the rule's scope")


def _axis(explicit, current, emitted_for, sheets, aggregated: bool, axis: str):
    if explicit is not None:
        return explicit
    if current is not None:
        return (current,)
    if not aggregated:
        raise SkipCell(SKIP_AMBIGUOUS_AXIS, f"{axis} not fixed by the rule's scope")
    values = emitted_for(sheets[0])
    if not values:
        raise SkipCell(SKIP_CELL_NOT_EMITTED, f"no {axis} emitted")
    return values


def _evaluate_emptiness(root: Compare, ctx: _Context) -> Outcome:
    """``{ref} = empty`` — asks whether the cell was REPORTED, so the
    missing-value policy does not apply (evaluate.py:788-828)."""
    ref = root.lhs if isinstance(root.rhs, EmptyLiteral) else root.rhs
    if not isinstance(ref, Ref):
        return Outcome(
            STATUS_NOT_EVALUATED,
            reason=SKIP_UNSUPPORTED_GRAMMAR,
            detail="empty compared to an expression",
        )
    try:
        table, sheets, rows, columns = _reference_axes(ref, ctx, aggregated=True)
    except SkipCell as skip:
        return Outcome(STATUS_NOT_EVALUATED, reason=skip.reason, detail=skip.detail)
    reported = [
        ctx.index.value(table, s, r, c)
        for s in sheets
        for r in rows
        for c in columns
        if ctx.index.present(table, s, r, c) and ctx.index.value(table, s, r, c) is not None
    ]
    is_empty = not reported
    passed = is_empty if root.op in ("=", "==") else not is_empty
    if not passed:
        return Outcome(
            STATUS_FAIL,
            lhs=float(len(reported)),
            rhs=0.0,
            detail=f"{len(reported)} cell(s) reported where the rule requires none",
        )
    return Outcome(STATUS_VACUOUS if is_empty else STATUS_PASS)


def _compare(op: str, lhs: float, rhs: float, arithmetic: str) -> bool:
    """Point compares exactly (−0.0 folded onto 0.0); Interval allows the
    golden rounding tolerance (evaluate.py:831-861)."""
    lhs += 0.0
    rhs += 0.0
    tol = (
        0.0
        if arithmetic == ARITHMETIC_POINT
        else DEFAULT_ATOL + DEFAULT_RTOL * max(abs(lhs), abs(rhs))
    )
    if op in ("=", "=="):
        return abs(lhs - rhs) <= tol
    if op == "!=":
        return abs(lhs - rhs) > tol
    if op == ">=":
        return lhs >= rhs - tol
    if op == "<=":
        return lhs <= rhs + tol
    if op == ">":
        return lhs > rhs - tol
    if op == "<":
        return lhs < rhs + tol
    raise UnsupportedExpression(SKIP_UNSUPPORTED_GRAMMAR, f"comparison operator {op!r}")


# ---------------------------------------------------------------------------
# Rule driver
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GrammarRule:
    rule_id: str
    source: str  # 'EBA' | 'BOE'
    formula: str
    arithmetic: str = ARITHMETIC_INTERVAL
    missing_value: str = MISSING_DO_NOT_RUN
    severity: str = "error"


def evaluate_rule(rule: GrammarRule, index: TemplateIndex) -> list[tuple]:
    """Evaluate one rule; returns (rule_id, source, coordinate, status,
    reason, lhs, rhs) rows — one per coordinate of the rule's grid. A rule
    whose axes are all bound yields exactly one row; unbound axes iterate
    the primary table's emitted ids (the reference's scope expansion,
    distilled)."""
    try:
        expr = parse_expression(rule.formula)
    except UnsupportedExpression as bad:
        return [
            (rule.rule_id, rule.source, "", STATUS_NOT_EVALUATED, bad.reason, None, None)
        ]
    primary = next(
        (r.table for r in _refs_outside_aggregates(expr.root) if r.table), None
    )
    coordinates = _coordinate_grid(expr, primary, index)
    out = []
    for coord in coordinates:
        o = evaluate_at(
            expr,
            coord,
            index,
            missing_value=rule.missing_value,
            arithmetic=rule.arithmetic,
        )
        label = "/".join(p for p in (coord.sheet, coord.row, coord.column) if p) or ""
        out.append((rule.rule_id, rule.source, label, o.status, o.reason, o.lhs, o.rhs))
    return out


def _coordinate_grid(
    expr: Expression, primary: Optional[str], index: TemplateIndex
) -> list[Coordinate]:
    table = primary or ""
    sheets: Sequence[Optional[str]] = [None]
    rows: Sequence[Optional[str]] = [None]
    cols: Sequence[Optional[str]] = [None]
    if table and index.is_emitted(table):
        emitted_sheets = index.sheet_keys(table)
        if expr.needs_sheet_axis and emitted_sheets != (SINGLE_SHEET,):
            sheets = list(emitted_sheets)
        base_sheet = emitted_sheets[0] if emitted_sheets else SINGLE_SHEET
        if expr.needs_row_axis:
            rows = list(index.row_refs(table, base_sheet))
        if expr.needs_column_axis:
            cols = list(index.column_refs(table, base_sheet))
    return [
        Coordinate(table=table, sheet=s, row=r, column=c)
        for s in sheets
        for r in rows
        for c in cols
    ]


# ---------------------------------------------------------------------------
# AST → DuckDB SQL compiler (the oracle seam)
# ---------------------------------------------------------------------------
#
# Renders each PARSED rule as SQL over the same facts estate, walking cells
# in the evaluator's own traversal order (lhs before rhs; sheets → rows →
# columns; left-to-right additions), so the Python evaluator and the DuckDB
# oracle derive from ONE parse and cannot drift. Division is refused at
# compile time (its div-by-zero skip has no clean SQL mirror); the
# evaluator itself supports it.


@dataclass(frozen=True)
class _EstateAxes:
    """Static axis description of one template, used ONLY to expand unbound
    axes inside aggregates at compile time (the runtime evaluator reads the
    same sets from the emitted index; both sort ascending)."""

    sheets: tuple[str, ...]
    rows: tuple[str, ...]
    columns: tuple[str, ...]


class _RuleCompiler:
    def __init__(self, estate: dict, sheet_codes: dict, missing_value: str) -> None:
        self.estate = estate  # table -> _EstateAxes
        self.sheet_codes = sheet_codes  # table -> {code: sheet}
        self.missing_value = missing_value
        self.skips: list[tuple[str, str]] = []  # (condition_sql, reason) in eval order
        self.nonzero: list[str] = []  # per-ref "a nonzero cell was observed" conds
        # distinct facts subqueries, interned once per rule: the compiled
        # status/reason/lhs/rhs expressions repeat every subquery many times
        # textually, and a catalogue-sized union of such selects is megabytes
        # of SQL with tens of thousands of scalar subqueries for DuckDB to
        # plan. Each subquery instead becomes ONE column of a per-rule
        # derived table and is referenced by alias — identical values
        # (scalar subqueries are deterministic over the materialized facts),
        # ~10x less SQL
        self.subs: dict[str, str] = {}

    def intern(self, sql: str) -> str:
        alias = self.subs.get(sql)
        if alias is None:
            alias = f"q{len(self.subs)}"
            self.subs[sql] = alias
        return alias

    def from_clause(self) -> str:
        if not self.subs:
            return ""
        cols = ", ".join(f"{sql} AS {alias}" for sql, alias in self.subs.items())
        return f" FROM (SELECT {cols}) AS f"

    # -- facts predicates ---------------------------------------------------

    @staticmethod
    def _match(t: str, s: str, r: str, c: str) -> str:
        return (
            f"template = '{t}' AND sheet = '{s}' "
            f"AND row_id = '{r}' AND col_id = '{c}'"
        )

    def _val(self, t: str, s: str, r: str, c: str) -> str:
        return self.intern(
            f"(SELECT value FROM facts WHERE {self._match(t, s, r, c)})"
        )

    def _exists(self, where: str) -> str:
        return self.intern(f"EXISTS(SELECT 1 FROM facts WHERE {where})")

    # -- ref resolution (compile-time mirror of _reference_axes) ------------

    def _resolve_ref(self, ref: Ref, aggregated: bool):
        table = ref.table
        if table is None:
            raise ValueError("compiled rules must bind every ref's table")
        axes = self.estate.get(table)
        self.skips.append(
            (f"NOT {self._exists(f'template = {table!r}')}", SKIP_CELL_NOT_EMITTED)
        )
        single_sheet = axes is None or axes.sheets == (SINGLE_SHEET,)
        if single_sheet:
            # mirror _reference_sheets (and evaluate.py:735-737): a
            # single-sheet template short-circuits BEFORE geography/z-code
            # handling — a sheeted ref against it binds to the one sheet,
            # it is not a sheet-not-emitted skip
            sheets: tuple[str, ...] = (SINGLE_SHEET,)
        elif ref.geography is not None:
            sheets = (ref.geography,)
        elif ref.sheets is not None:
            code_map = self.sheet_codes.get(table)
            if code_map is None:
                raise ValueError(f"{table} sheets are not indexed positionally")
            # an unknown positional code is the evaluator's
            # sheet_not_emitted skip, not a compile crash
            if any(c not in code_map for c in ref.sheets):
                self.skips.append(("TRUE", SKIP_SHEET_NOT_EMITTED))
                sheets = ()
            else:
                sheets = tuple(code_map[c] for c in ref.sheets)
        elif len(axes.sheets) > 1:
            if not aggregated:
                raise ValueError(f"{table} sheet not fixed by the rule's scope")
            sheets = axes.sheets
        else:
            sheets = (SINGLE_SHEET,)
        if not single_sheet and (ref.geography is not None or ref.sheets is not None):
            for s in sheets:
                self.skips.append(
                    (
                        f"NOT {self._exists(f'template = {table!r} AND sheet = {s!r}')}",
                        SKIP_SHEET_NOT_EMITTED,
                    )
                )
        rows = ref.rows
        rows_bound = rows is not None
        if rows is None:
            if not aggregated:
                raise ValueError("row not fixed by the rule's scope")
            rows = axes.rows if axes else ()
        cols = ref.columns
        cols_bound = cols is not None
        if cols is None:
            if not aggregated:
                raise ValueError("column not fixed by the rule's scope")
            cols = axes.columns if axes else ()
        # the sheet axis is CONSTRAINED whenever it did not expand from the
        # estate (geography / z-codes / single-sheet); an unbound multi-sheet
        # expansion addresses "every emitted sheet" at runtime
        sheets_bound = not (
            not single_sheet
            and ref.geography is None
            and ref.sheets is None
            and len(axes.sheets) > 1
        )
        return table, sheets, rows, cols, sheets_bound, rows_bound, cols_bound

    def _region(
        self, table, sheets, rows, cols, sheets_bound, rows_bound, cols_bound
    ) -> str:
        """WHERE fragment addressing the ref's region with ONLY its bound
        axes as predicates — an unbound axis means 'every emitted id', the
        evaluator's aggregate expansion (evaluate.py:763-785)."""
        def in_list(col: str, ids) -> str:
            # an empty bound set (unknown sheet code) addresses nothing
            if not ids:
                return "FALSE"
            return f"{col} IN (" + ", ".join(f"'{i}'" for i in ids) + ")"

        parts = [f"template = '{table}'"]
        if sheets_bound:
            parts.append(in_list("sheet", sheets))
        if rows_bound:
            parts.append(in_list("row_id", rows))
        if cols_bound:
            parts.append(in_list("col_id", cols))
        return " AND ".join(parts)

    def _cell_terms(self, ref: Ref, aggregated: bool) -> list[str]:
        """Per-cell value terms in traversal order, registering the skip
        conditions.

        Explicit-axis refs mirror `_resolve_cells` exactly: an absent cell
        is a skip naming WHICH axis is missing, a present-null cell follows
        the missing policy, cell by cell in traversal order. A ref with
        UNBOUND axes inside an aggregate addresses "every emitted id" — the
        evaluator never sees its absent cells — so its statically-expanded
        terms guard each cell with COALESCE(…, 0.0) (absent contributes
        nothing; x + 0.0 ≡ x keeps the addition chain bit-identical) and
        the do-not-run null check becomes one region-level EXISTS."""
        table, sheets, rows, cols, sb, rb, cb = self._resolve_ref(ref, aggregated)
        region = self._region(table, sheets, rows, cols, sb, rb, cb)
        # a ref whose axes are ALL explicit addresses exactly those cells —
        # per-cell absence/null checks in traversal order, aggregated or not
        # (aggregation changes axis EXPANSION, never absence handling)
        fully_bound = sb and rb and cb
        self.nonzero.append(
            self._exists(f"{region} AND coalesce(value, 0.0) <> 0.0")
        )
        if not fully_bound:
            self._bound_axis_checks(table, rows, cols, rb, cb)
            if self.missing_value != MISSING_ZERO:
                # one region-level null check — the evaluator raises at the
                # first present-null cell among the emitted set
                self.skips.append(
                    (
                        self._exists(f"{region} AND value IS NULL"),
                        SKIP_MISSING_VALUE_DO_NOT_RUN,
                    )
                )
        terms = []
        for s in sheets:
            for r in rows:
                for c in cols:
                    match = self._match(table, s, r, c)
                    val = self._val(table, s, r, c)
                    if fully_bound:
                        absent = f"NOT {self._exists(match)}"
                        row_emitted = self._exists(
                            f"template = '{table}' AND sheet = '{s}' AND row_id = '{r}'"
                        )
                        col_emitted = self._exists(
                            f"template = '{table}' AND sheet = '{s}' AND col_id = '{c}'"
                        )
                        # first-absent-cell-wins, naming WHICH axis is missing
                        self.skips.append(
                            (f"({absent}) AND NOT ({row_emitted})", SKIP_ROW_NOT_EMITTED)
                        )
                        self.skips.append(
                            (
                                f"({absent}) AND NOT ({col_emitted})",
                                SKIP_COLUMN_NOT_EMITTED,
                            )
                        )
                        self.skips.append((absent, SKIP_CELL_NOT_EMITTED))
                        if self.missing_value == MISSING_ZERO:
                            terms.append(f"coalesce({val}, 0.0)")
                        else:
                            self.skips.append(
                                (f"({val}) IS NULL", SKIP_MISSING_VALUE_DO_NOT_RUN)
                            )
                            terms.append(val)
                    else:
                        # unbound-axis expansion: the evaluator iterates the
                        # RUNTIME-emitted axis ids and raises absence for a
                        # cell whose row and column both exist but whose
                        # (row, col) cell was never emitted — BEFORE any
                        # missing-value policy applies (absent ≠ missing;
                        # evaluate.py:660-695). Mirror it: a static-axis id
                        # the runtime never emitted contributes nothing on
                        # either engine (coalesce-0 here, not-expanded
                        # there), but an emitted-row × emitted-column hole
                        # must refuse, not zero-fill.
                        absent = f"NOT {self._exists(match)}"
                        row_emitted = self._exists(
                            f"template = '{table}' AND sheet = '{s}' AND row_id = '{r}'"
                        )
                        col_emitted = self._exists(
                            f"template = '{table}' AND sheet = '{s}' AND col_id = '{c}'"
                        )
                        self.skips.append(
                            (
                                f"({absent}) AND ({row_emitted}) AND ({col_emitted})",
                                SKIP_CELL_NOT_EMITTED,
                            )
                        )
                        terms.append(f"coalesce({val}, 0.0)")
        return terms

    def _bound_axis_checks(self, table: str, rows, cols, rb: bool, cb: bool) -> None:
        """Emission checks for the EXPLICIT axes of a region-path ref: an
        explicit id absent from the whole template is the evaluator's
        first-traversal-cell absence, named by axis (rows before columns —
        the traversal meets a missing row before a missing column)."""
        if rb:
            for r in rows:
                row_emitted = self._exists(f"template = '{table}' AND row_id = '{r}'")
                self.skips.append((f"NOT {row_emitted}", SKIP_ROW_NOT_EMITTED))
        if cb:
            for c in cols:
                col_emitted = self._exists(f"template = '{table}' AND col_id = '{c}'")
                self.skips.append((f"NOT {col_emitted}", SKIP_COLUMN_NOT_EMITTED))

    def _aggregate_subquery(self, fn: str, ref: Ref) -> str:
        """``max``/``min`` over a ref compile to one SQL aggregate over the
        ref's region — order-independent, and 'every emitted cell' by
        construction. Registers the bound-axis emission checks, the
        do-not-run null check and the no-emitted-cell skip in the
        evaluator's order."""
        table, sheets, rows, cols, sb, rb, cb = self._resolve_ref(ref, True)
        region = self._region(table, sheets, rows, cols, sb, rb, cb)
        self.nonzero.append(
            self._exists(f"{region} AND coalesce(value, 0.0) <> 0.0")
        )
        self._bound_axis_checks(table, rows, cols, rb, cb)
        if self.missing_value != MISSING_ZERO:
            self.skips.append(
                (
                    self._exists(f"{region} AND value IS NULL"),
                    SKIP_MISSING_VALUE_DO_NOT_RUN,
                )
            )
            inner = "value"
        else:
            inner = "coalesce(value, 0.0)"
        self.skips.append(
            (f"NOT {self._exists(region)}", SKIP_CELL_NOT_EMITTED)
        )
        return self.intern(f"(SELECT {fn}({inner}) FROM facts WHERE {region})")

    # -- expression compile (mirror of _value_of) ---------------------------

    def compile_value(self, node, aggregated: bool = False) -> str:
        if isinstance(node, Number):
            return repr(node.value)
        if isinstance(node, Ref):
            terms = self._cell_terms(node, aggregated)
            if not terms:
                return "0.0"
            out = terms[0]
            for t in terms[1:]:
                out = f"({out} + {t})"
            return out
        if isinstance(node, BinOp):
            if node.op == "/":
                raise ValueError("division is not compilable to the oracle")
            lhs = self.compile_value(node.lhs, aggregated)
            rhs = self.compile_value(node.rhs, aggregated)
            return f"({lhs} {node.op} {rhs})"
        if isinstance(node, Call):
            if node.name == "abs":
                return f"abs({self.compile_value(node.args[0], aggregated)})"
            if node.name == "sum":
                parts = [self.compile_value(a, True) for a in node.args]
                out = parts[0]
                for p in parts[1:]:
                    out = f"({out} + {p})"
                return out
            # max / min: a single Ref argument compiles to one SQL
            # aggregate over its region — "every emitted cell" exactly, not
            # a static expansion (multi-argument forms would need the
            # evaluator's combined-empty semantics; refuse rather than
            # approximate)
            if len(node.args) == 1 and isinstance(node.args[0], Ref):
                fn = "max" if node.name == "max" else "min"
                return self._aggregate_subquery(fn, node.args[0])
            raise ValueError(f"only single-reference {node.name}(...) is compilable")
        raise ValueError(f"cannot compile {type(node).__name__}")


def rule_oracle_select(
    rule: "GrammarRule", estate: dict, sheet_codes: dict
) -> str:
    """One SELECT producing this rule's (rule_id, source, coordinate,
    status, reason, lhs, rhs) row over a `facts` CTE — identical to
    `evaluate_rule` on the same estate."""

    def const_row(status: str, reason: str) -> str:
        return (
            f"SELECT '{rule.rule_id}' AS rule_id, '{rule.source}' AS source, "
            f"'' AS coordinate, '{status}' AS status, '{reason}' AS reason, "
            "CAST(NULL AS DOUBLE) AS lhs, CAST(NULL AS DOUBLE) AS rhs"
        )

    try:
        expr = parse_expression(rule.formula)
    except UnsupportedExpression as bad:
        return const_row(STATUS_NOT_EVALUATED, bad.reason)

    root = expr.root
    if isinstance(root.lhs, EmptyLiteral) or isinstance(root.rhs, EmptyLiteral):
        return _empty_rule_select(rule, root, estate, sheet_codes)

    comp = _RuleCompiler(estate, sheet_codes, rule.missing_value)
    lhs_sql = comp.compile_value(root.lhs)
    rhs_sql = comp.compile_value(root.rhs)
    nonzero = " OR ".join(f"({c})" for c in comp.nonzero) or "FALSE"
    if rule.arithmetic == ARITHMETIC_POINT:
        tol = "0.0"
    else:
        tol = (
            f"({DEFAULT_ATOL!r} + {DEFAULT_RTOL!r} * "
            f"greatest(abs(({lhs_sql}) + 0.0), abs(({rhs_sql}) + 0.0)))"
        )
    l, r = f"(({lhs_sql}) + 0.0)", f"(({rhs_sql}) + 0.0)"
    op = root.op
    if op in ("=", "=="):
        ok = f"abs({l} - {r}) <= {tol}"
    elif op == "!=":
        ok = f"abs({l} - {r}) > {tol}"
    elif op == ">=":
        ok = f"{l} >= {r} - {tol}"
    elif op == "<=":
        ok = f"{l} <= {r} + {tol}"
    elif op == ">":
        ok = f"{l} > {r} - {tol}"
    else:
        ok = f"{l} < {r} + {tol}"
    skip_status = " ".join(
        f"WHEN {cond} THEN '{STATUS_NOT_EVALUATED}'" for cond, _ in comp.skips
    )
    skip_reason = " ".join(
        f"WHEN {cond} THEN '{reason}'" for cond, reason in comp.skips
    )
    any_skip = " OR ".join(f"({cond})" for cond, _ in comp.skips) or "FALSE"
    return (
        f"SELECT '{rule.rule_id}' AS rule_id, '{rule.source}' AS source, "
        f"'' AS coordinate, "
        f"CASE {skip_status} "
        f"WHEN NOT ({ok}) THEN '{STATUS_FAIL}' "
        f"WHEN NOT ({nonzero}) THEN '{STATUS_VACUOUS}' "
        f"ELSE '{STATUS_PASS}' END AS status, "
        f"CASE {skip_reason} ELSE '' END AS reason, "
        f"CASE WHEN {any_skip} THEN NULL ELSE ({lhs_sql}) END AS lhs, "
        f"CASE WHEN {any_skip} THEN NULL ELSE ({rhs_sql}) END AS rhs"
        f"{comp.from_clause()}"
    )


def _empty_rule_select(rule, root: Compare, estate: dict, sheet_codes: dict) -> str:
    """Compile the ``{ref} = empty`` nonexistence form. The resolver's
    collected skip conditions (table absent, sheet absent) gate the
    outcome exactly as ``_evaluate_emptiness``'s ``_reference_axes`` call
    does — dropping them would turn an unemitted sheet into VACUOUS/FAIL
    instead of NOT_EVALUATED."""
    ref = root.lhs if isinstance(root.rhs, EmptyLiteral) else root.rhs
    comp = _RuleCompiler(estate, sheet_codes, rule.missing_value)
    table, sheets, rows, cols, sb, rb, cb = comp._resolve_ref(ref, aggregated=True)
    region = comp._region(table, sheets, rows, cols, sb, rb, cb)
    reported = comp.intern(
        f"(SELECT count(*) FROM facts WHERE ({region}) AND value IS NOT NULL)"
    )
    skip_whens = " ".join(
        f"WHEN {cond} THEN '{STATUS_NOT_EVALUATED}'" for cond, _ in comp.skips
    )
    skip_reasons = " ".join(
        f"WHEN {cond} THEN '{reason}'" for cond, reason in comp.skips
    )
    any_skip = " OR ".join(f"({cond})" for cond, _ in comp.skips) or "FALSE"
    wants_empty = root.op in ("=", "==")
    if wants_empty:
        status = (
            f"CASE {skip_whens} "
            f"WHEN {reported} > 0 THEN '{STATUS_FAIL}' "
            f"ELSE '{STATUS_VACUOUS}' END"
        )
    else:
        status = (
            f"CASE {skip_whens} "
            f"WHEN {reported} > 0 THEN '{STATUS_PASS}' "
            f"ELSE '{STATUS_FAIL}' END"
        )
    reason = f"CASE {skip_reasons} ELSE '' END"
    # FAIL carries (reported-count, 0.0) — evaluate.py:820-827; PASS/VACUOUS
    # carry no figures
    fail_cond = f"{reported} > 0" if wants_empty else f"{reported} = 0"
    lhs = (
        f"CASE WHEN {any_skip} THEN NULL "
        f"WHEN {fail_cond} THEN CAST({reported} AS DOUBLE) ELSE NULL END"
    )
    rhs = (
        f"CASE WHEN {any_skip} THEN NULL "
        f"WHEN {fail_cond} THEN 0.0 ELSE NULL END"
    )
    return (
        f"SELECT '{rule.rule_id}' AS rule_id, '{rule.source}' AS source, "
        f"'' AS coordinate, {status} AS status, {reason} AS reason, "
        f"{lhs} AS lhs, {rhs} AS rhs{comp.from_clause()}"
    )


def rules_oracle_sql(
    rules: Sequence["GrammarRule"],
    facts_sql: str,
    estate: dict,
    sheet_codes: dict,
) -> str:
    """The full oracle: facts CTE + one compiled SELECT per rule."""
    selects = [rule_oracle_select(r, estate, sheet_codes) for r in rules]
    body = "\n    UNION ALL\n    ".join(selects)
    # MATERIALIZED is load-bearing: the compiled rules address facts through
    # hundreds of scalar subqueries, and without it DuckDB re-instantiates
    # the whole facts plan (and its parquet scans) per subquery — slow and
    # capable of exhausting file handles
    return f"WITH facts AS MATERIALIZED (\n{facts_sql}\n)\n    {body}"


# ---------------------------------------------------------------------------
# Rule lineage — drill an outcome to the cells that fed it
# ---------------------------------------------------------------------------


def rule_cell_lineage(
    rule: "GrammarRule", index: TemplateIndex, coordinate: Optional[Coordinate] = None
) -> list[tuple]:
    """Every cell a rule's formula addresses, with its present/value state —
    the reference's "a cell's lineage IS its spec" discipline
    (reporting/lineage.py) applied to validation rules: the drilldown
    re-resolves the rule's OWN references against the same index the
    evaluator read, never a second hand-maintained map. A triager reading a
    FAIL row gets the exact cells (and the absent/null ones explaining a
    NOT_EVALUATED) without re-deriving the grammar.

    Returns (rule_id, side, table, sheet, row_id, col_id, present, value)
    rows in the evaluator's traversal order; unparseable rules return []."""
    try:
        expr = parse_expression(rule.formula)
    except UnsupportedExpression:
        return []
    primary = next(
        (r.table for r in _refs_outside_aggregates(expr.root) if r.table), None
    )
    coord = coordinate or Coordinate(table=primary or "")
    ctx = _Context(index=index, coordinate=coord, missing_value=rule.missing_value)
    out: list[tuple] = []

    def _collect(node, side: str, aggregated: bool) -> None:
        if isinstance(node, Ref):
            try:
                table, sheets, rows, cols = _reference_axes(
                    node, ctx, aggregated=aggregated
                )
            except SkipCell:
                return
            for s in sheets:
                for r in rows:
                    for c in cols:
                        present = index.present(table, s, r, c)
                        out.append(
                            (
                                rule.rule_id, side, table, s, r, c, present,
                                index.value(table, s, r, c) if present else None,
                            )
                        )
            return
        if isinstance(node, Call):
            inner = aggregated or node.name in _AGGREGATES
            for a in node.args:
                _collect(a, side, inner)
            return
        if isinstance(node, (BinOp, Compare)):
            _collect(node.lhs, side, aggregated)
            _collect(node.rhs, side, aggregated)

    _collect(expr.root.lhs, "lhs", False)
    _collect(expr.root.rhs, "rhs", False)
    return out
