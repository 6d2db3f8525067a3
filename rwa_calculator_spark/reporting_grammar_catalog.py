"""Grammar-rule catalogue + template estate for the supervisory validation
evaluator (ref reporting/validations/rules.py — the publishers' rule lists
normalised onto one shape; evaluate.py for the semantics each rule
exercises).

The estate is the COREP cell catalog (C 02.00 / C 07.00 / C 08.01 /
C 09.01) computed by reporting.compute_cells in one pass, PLUS a sheeted
C 09.02 (one sheet per region + the TOTAL sheet emitted first — ref
reporting/corep/c09.py, the per-country dict the ``eba_GA:x1``
all-geographies member addresses). Rules are written in BOTH publishers'
syntaxes and chosen so every status and every refusal path is exercised:

PASS (EBA positional, BoE keyed multi-row, sum() unbound-axis expansion,
geography filter = z-axis sheet sum, abs() tie-out, percentage literal,
max() sheet expansion), FAIL (Point-arithmetic exactness, ``= empty`` on a
reported cell), VACUOUS (missing-zero over the never-populated cell — the
"vacuous ≠ pass" distinction; ``= empty`` on a reported-empty cell), and
NOT_EVALUATED (missing-value do-not-run, absent row named by axis,
conditional if/then refused by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum, sql_scaled_sum
from rwa_calculator_spark.reporting_grammar import (
    ARITHMETIC_INTERVAL,
    ARITHMETIC_POINT,
    GEOGRAPHY_TOTAL_SHEET,
    MISSING_DO_NOT_RUN,
    MISSING_ZERO,
    SINGLE_SHEET,
    GrammarRule,
    TemplateIndex,
    _EstateAxes,
    evaluate_rule,
    rules_oracle_sql,
)
from rwa_calculator_spark.reporting_templates import (
    _REGIONS,
    STAR_LEDGER_SQL,
    TEMPLATE_CELLS,
    star_ledger,
)

# ---------------------------------------------------------------------------
# Estate
# ---------------------------------------------------------------------------

#: Positional sheet codes (BoE ``z: 0001`` / EBA ``s0001``) → sheet keys for
#: the per-region C 09.02 (ref validations/scope.py SHEET_INDEX_MAPS).
C09_SHEET_CODES = {f"{i + 1:04d}": region for i, region in enumerate(_REGIONS)}

#: Static axis description per template — used by the SQL compiler to expand
#: unbound axes inside aggregates; must list ids in sorted order (the
#: runtime index sorts the same way).
_C0X_ROWS = tuple(f"{(i + 1) * 10:04d}" for i in range(5))
ESTATE_AXES = {
    "C02.00": _EstateAxes((SINGLE_SHEET,), ("0010", "0060", "0250"), ("0010",)),
    "C07.00": _EstateAxes((SINGLE_SHEET,), _C0X_ROWS + ("0090",), ("0010", "0020")),
    "C08.01": _EstateAxes((SINGLE_SHEET,), _C0X_ROWS, ("0010", "0020")),
    "C09.01": _EstateAxes((SINGLE_SHEET,), _C0X_ROWS, ("0010",)),
    "C09.02": _EstateAxes(
        tuple(sorted([*_REGIONS, GEOGRAPHY_TOTAL_SHEET])), ("0010",), ("0010",)
    ),
    "CR04": _EstateAxes((SINGLE_SHEET,), _C0X_ROWS, ("0010",)),
}


def grammar_estate(spark: SparkSession, sf_dir: str) -> TemplateIndex:
    """Compute the estate's cell facts (one aggregation pass for the flat
    catalog + one region groupBy for the sheeted C 09.02) and index them
    driver-side — O(#cells), never exposure rows."""
    from rwa_calculator_spark.reporting import compute_cells

    ledger = star_ledger(spark, sf_dir)
    flat = compute_cells(ledger, TEMPLATE_CELLS)
    rows = [
        (r.template, SINGLE_SHEET, r.row_id, r.col_id, r.value)
        for r in flat.collect()
    ]
    per_region = (
        ledger.groupBy("region").agg(scaled_sum(F.col("ead"), 2).alias("value"))
    ).collect()
    rows += [("C09.02", r.region, "0010", "0010", r.value) for r in per_region]
    total = ledger.agg(scaled_sum(F.col("ead"), 2).alias("value")).collect()[0]
    rows.append(("C09.02", GEOGRAPHY_TOTAL_SHEET, "0010", "0010", total.value))
    return TemplateIndex.from_rows(rows, sheet_codes={"C09.02": C09_SHEET_CODES})


def grammar_facts_sql() -> str:
    """DuckDB SQL for the identical facts estate (generated from the same
    cell data — spec and oracle cannot drift)."""
    selects = []
    for s in TEMPLATE_CELLS:
        m = 10**s.scale
        selects.append(
            f"SELECT '{s.template}' AS template, '{SINGLE_SHEET}' AS sheet, "
            f"'{s.row_id}' AS row_id, '{s.col_id}' AS col_id, "
            f"sum(CASE WHEN {s.filter_sql} THEN CAST(round(({s.measure_sql}) * {m}.0, 0) AS BIGINT) END) "
            f"/ CAST({m} AS DOUBLE) AS value FROM ledger WHERE {s.filter_sql}"
        )
    selects.append(
        f"SELECT 'C09.02', region, '0010', '0010', {sql_scaled_sum('ead', 2)} "
        "FROM ledger GROUP BY region"
    )
    selects.append(
        f"SELECT 'C09.02', '{GEOGRAPHY_TOTAL_SHEET}', '0010', '0010', "
        f"{sql_scaled_sum('ead', 2)} FROM ledger"
    )
    body = "\n        UNION ALL\n        ".join(selects)
    return f"    WITH ledger AS ({STAR_LEDGER_SQL})\n        {body}"


# ---------------------------------------------------------------------------
# Rule catalogue
# ---------------------------------------------------------------------------

GRAMMAR_RULES: tuple[GrammarRule, ...] = (
    # EBA positional syntax, Interval tolerance → PASS
    GrammarRule(
        "v_eba_c02_rollup", "EBA",
        "{C02.00, r0010, c0010} = {C02.00, r0060, c0010} + {C02.00, r0250, c0010}",
    ),
    # BoE keyed syntax with a ;-separated multi-row axis → PASS
    GrammarRule(
        "v_boe_c07_classes", "BOE",
        "{t: C02.00, r: 0060, c: 0010} = "
        "{t: C07.00, r: 0010; 0020; 0030; 0040; 0050, c: 0020}",
    ),
    # sum() expands the unbound row axis to every emitted C08.01 row → PASS
    GrammarRule(
        "v_eba_sum_unbound", "EBA",
        "{C02.00, r0250, c0010} = sum({C08.01, c0020})",
    ),
    # geography filter (all-geographies TOTAL sheet) vs explicit z-axis
    # sheet sum — the v8732_m identity: total = Σ country sheets → PASS
    GrammarRule(
        "v_boe_geo_total", "BOE",
        "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]} = "
        "{t: C09.02, r: 0010, c: 0010, z: 0001; 0002; 0003; 0004; 0005}",
    ),
    # Point arithmetic compares exactly: total ≠ SA subtotal → FAIL
    GrammarRule(
        "v_point_break", "EBA",
        "{C02.00, r0010, c0010} = {C02.00, r0060, c0010}",
        arithmetic=ARITHMETIC_POINT,
    ),
    # the never-populated DEFAULTED cell is reported-empty: do-not-run
    # → NOT_EVALUATED; treat-as-zero → 0 = 0 with nothing observed →
    # VACUOUS, never PASS (the "vacuous ≠ pass" distinction)
    GrammarRule(
        "v_missing_skip", "BOE",
        "{t: C07.00, r: 0090, c: 0010} = 0",
        missing_value=MISSING_DO_NOT_RUN,
    ),
    GrammarRule(
        "v_missing_zero", "BOE",
        "{t: C07.00, r: 0090, c: 0010} = 0",
        missing_value=MISSING_ZERO,
    ),
    # a row this estate never emits → NOT_EVALUATED naming the row axis
    GrammarRule(
        "v_absent_row", "EBA",
        "{C07.00, r9999, c0010} = 0",
    ),
    # conditional rules are refused by name, never approximated
    GrammarRule(
        "v_unsupported_if", "EBA",
        "if {C02.00, r0010, c0010} > 0 then {C02.00, r0060, c0010} >= 0",
    ),
    # nonexistence form: a reported cell where the rule requires none → FAIL
    GrammarRule(
        "v_empty_fail", "EBA",
        "{C02.00, r0010, c0010} = empty",
    ),
    # ...and a reported-empty cell → VACUOUS (empty ignores the missing
    # policy: null is the PASSING state, not a zero)
    GrammarRule(
        "v_empty_vacuous", "EBA",
        "{C07.00, r0090, c0010} = empty",
    ),
    # abs() over an arithmetic chain against a numeric literal → PASS
    GrammarRule(
        "v_abs_tieout", "EBA",
        "abs({C02.00, r0060, c0010} - ({C07.00, r0010, c0020} + {C07.00, r0020, c0020}"
        " + {C07.00, r0030, c0020} + {C07.00, r0040, c0020} + {C07.00, r0050, c0020}))"
        " <= 0.01",
    ),
    # percentage literal + multiplication → PASS
    GrammarRule(
        "v_pct_cap", "EBA",
        "{C02.00, r0060, c0010} <= 100% * {C02.00, r0010, c0010}",
    ),
    # max() expands the unbound sheet axis across every C09.02 sheet → PASS
    GrammarRule(
        "v_max_sheet", "BOE",
        "max({t: C09.02, r: 0010, c: 0010}) <= "
        "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]}",
    ),
)


def _generated_rules() -> tuple[GrammarRule, ...]:
    """The published-style rule FAMILIES, generated as data (the EBA/BoE
    packs the reference evaluates wholesale are machine-published lists —
    one member per template/row/column of a family stated once per shared
    coordinate; ref reporting/validations/rules.py + the c08.py note that
    identities are 'a family stated once per SHARED COLUMN, all live
    ERROR'). Four families over this estate:

    - sign rules — every reported money cell is non-negative (the largest
      published family; EBA v-rule shape ``{T, rX, cY} >= 0``), stated in
      EBA syntax per flat-estate cell and BoE syntax per C 09.02 sheet;
    - risk-weight band caps — class RWEA within [20%, 150%] of class EAD
      (the ledger's RW ladder bounds; percentage-literal grammar form);
    - cross-template population ties — CR04 whole-population EAD equals
      the C 07.00 (SA) + C 08.01 (IRB) split per class, stated in BOTH
      publishers' syntaxes (the boe_b0752/boe_b0814 twin-statement
      pattern), plus abs()-form twins with an explicit tolerance;
    - conservation / dominance — sum() over one partition equals sum()
      over another (class vs geography), max() ≤ sum() per axis.
    """
    out: list[GrammarRule] = []
    flat_cells = (
        [("C02.00", r, "0010") for r in ("0010", "0060", "0250")]
        + [("C07.00", r, c) for r in _C0X_ROWS for c in ("0010", "0020")]
        + [("C08.01", r, c) for r in _C0X_ROWS for c in ("0010", "0020")]
        + [("C09.01", r, "0010") for r in _C0X_ROWS]
        + [("CR04", r, "0010") for r in _C0X_ROWS]
    )
    for t, r, c in flat_cells:
        tkey = t.replace(".", "")
        out.append(
            GrammarRule(f"v_sign_{tkey}_r{r}_c{c}", "EBA", f"{{{t}, r{r}, c{c}}} >= 0")
        )
    # BoE syntax twins for the C 02.00 block (the twin-statement pattern)
    for r in ("0010", "0060", "0250"):
        out.append(
            GrammarRule(
                f"v_sign_boe_c0200_r{r}", "BOE", f"{{t: C02.00, r: {r}, c: 0010}} >= 0"
            )
        )
    # per-sheet C 09.02: sign + dominance vs the all-geographies TOTAL
    for i, _region in enumerate(_REGIONS):
        z = f"{i + 1:04d}"
        out.append(
            GrammarRule(
                f"v_sign_c0902_z{z}", "BOE",
                f"{{t: C09.02, r: 0010, c: 0010, z: {z}}} >= 0",
            )
        )
        out.append(
            GrammarRule(
                f"v_geo_le_total_z{z}", "BOE",
                f"{{t: C09.02, r: 0010, c: 0010, z: {z}}} <= "
                "{t: C09.02, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]}",
            )
        )
    # RW-band caps/floors per class row (ladder bounds 20%..150%)
    for t in ("C07.00", "C08.01"):
        tkey = t.replace(".", "")
        for r in _C0X_ROWS:
            out.append(
                GrammarRule(
                    f"v_rwcap_{tkey}_r{r}", "EBA",
                    f"{{{t}, r{r}, c0020}} <= 150% * {{{t}, r{r}, c0010}}",
                )
            )
            out.append(
                GrammarRule(
                    f"v_rwfloor_{tkey}_r{r}", "EBA",
                    f"{{{t}, r{r}, c0020}} >= 20% * {{{t}, r{r}, c0010}}",
                )
            )
    # CR04 population ties per class, in both grammars + abs() twin
    for r in _C0X_ROWS:
        out.append(
            GrammarRule(
                f"v_cr04_tie_r{r}", "EBA",
                f"{{CR04, r{r}, c0010}} = {{C07.00, r{r}, c0010}} + {{C08.01, r{r}, c0010}}",
            )
        )
        out.append(
            GrammarRule(
                f"v_cr04_tie_boe_r{r}", "BOE",
                f"{{t: CR04, r: {r}, c: 0010}} = "
                f"{{t: C07.00, r: {r}, c: 0010}} + {{t: C08.01, r: {r}, c: 0010}}",
            )
        )
        out.append(
            GrammarRule(
                f"v_cr04_abs_r{r}", "EBA",
                f"abs({{CR04, r{r}, c0010}} - ({{C07.00, r{r}, c0010}}"
                f" + {{C08.01, r{r}, c0010}})) <= 0.01",
            )
        )
    # BoE-syntax twins for EVERY flat-estate sign rule (the published
    # lists state identities once per publisher — boe_b0752/boe_b0814
    # restate EBA v-rules keyed; the C 02.00 block above started the
    # pattern, the round-6 widening completes it template-wide)
    for t, r, c in flat_cells:
        if t == "C02.00":
            continue  # stated above
        tkey = t.replace(".", "")
        out.append(
            GrammarRule(
                f"v_sign_boe_{tkey}_r{r}_c{c}", "BOE",
                f"{{t: {t}, r: {r}, c: {c}}} >= 0",
            )
        )
    # publisher-syntax consistency ties: the SAME cell referenced in both
    # grammars inside one formula must compare equal exactly (Point — one
    # cell read twice can never differ); exercises mixed-syntax parsing
    for t, r, c in flat_cells:
        tkey = t.replace(".", "")
        out.append(
            GrammarRule(
                f"v_syntax_tie_{tkey}_r{r}_c{c}", "EBA",
                f"{{{t}, r{r}, c{c}}} = {{t: {t}, r: {r}, c: {c}}}",
                arithmetic=ARITHMETIC_POINT,
            )
        )
    # geography cross-template equality: the C 09.01 per-region EAD rows
    # index the same populations as the C 09.02 z-axis sheets (ref
    # scope.py's sheet-index map — position i ↔ region i), exactly
    for i in range(len(_REGIONS)):
        r = f"{(i + 1) * 10:04d}"
        z = f"{i + 1:04d}"
        out.append(
            GrammarRule(
                f"v_geo_c0901_c0902_z{z}", "BOE",
                f"{{t: C09.01, r: {r}, c: 0010}} = "
                f"{{t: C09.02, r: 0010, c: 0010, z: {z}}}",
                arithmetic=ARITHMETIC_POINT,
            )
        )
    # ...and the same identity in the EBA positional s-axis syntax (the
    # two publishers index the identical z/s map — ref scope.py
    # SHEET_INDEX_MAPS: one map, two token spellings)
    for i in range(len(_REGIONS)):
        r = f"{(i + 1) * 10:04d}"
        z = f"{i + 1:04d}"
        out.append(
            GrammarRule(
                f"v_geo_eba_c0901_c0902_s{z}", "EBA",
                f"{{C09.01, r{r}, c0010}} = {{C09.02, r0010, c0010, s{z}}}",
                arithmetic=ARITHMETIC_POINT,
            )
        )
    # CR04 population ties restated POINT: fixed-point partition sums make
    # SA + IRB = whole-population EXACT, not merely within tolerance —
    # the catalogue states both the supervisory (Interval) and the
    # engine-conservation (Point) reading
    for r in _C0X_ROWS:
        out.append(
            GrammarRule(
                f"v_cr04_tie_point_r{r}", "EBA",
                f"{{CR04, r{r}, c0010}} = {{C07.00, r{r}, c0010}} + {{C08.01, r{r}, c0010}}",
                arithmetic=ARITHMETIC_POINT,
            )
        )
    # share-of-total dominance: every class cell is at most 100% of its
    # column's sum() (percentage literal × unbound-axis aggregate). C07
    # c0010's sum crosses the reported-empty 0090 member — zero-fill per
    # the EBA missing-value policy; C08.01 has no such member but the
    # policy is stated uniformly for the family
    for t, c in (("C07.00", "0010"), ("C08.01", "0010"), ("C08.01", "0020")):
        tkey = t.replace(".", "")
        for r in _C0X_ROWS:
            out.append(
                GrammarRule(
                    f"v_share_{tkey}_r{r}_c{c}", "EBA",
                    f"{{{t}, r{r}, c{c}}} <= 100% * sum({{{t}, c{c}}})",
                    missing_value=MISSING_ZERO,
                )
            )
    # min() floors per column — the fourth supported call, exercised as a
    # family (sum/max/abs already are): the smallest member of every money
    # column is non-negative
    for t, c in (("C09.01", "0010"), ("C07.00", "0010"), ("C08.01", "0010"),
                 ("C08.01", "0020"), ("CR04", "0010")):
        tkey = t.replace(".", "")
        out.append(
            GrammarRule(
                f"v_min_ge_zero_{tkey}_c{c}", "EBA",
                f"min({{{t}, c{c}}}) >= 0",
                missing_value=MISSING_ZERO,
            )
        )
    # strict positivity of the C 02.00 capital-requirement block — a
    # whole-book estate reporting zero total RWEA is a filing error
    for r in ("0010", "0060", "0250"):
        out.append(
            GrammarRule(
                f"v_positive_c0200_r{r}", "EBA", f"{{C02.00, r{r}, c0010}} > 0"
            )
        )
    # template-level RW band over the column sums (the per-row caps above,
    # restated at the aggregate where diversification cannot hide a breach)
    for t in ("C07.00", "C08.01"):
        tkey = t.replace(".", "")
        out.append(
            GrammarRule(
                f"v_rwcap_total_{tkey}", "EBA",
                f"sum({{{t}, c0020}}) <= 150% * sum({{{t}, c0010}})",
                missing_value=MISSING_ZERO,
            )
        )
    # conservation across partitions + per-axis dominance
    out.append(
        GrammarRule(
            "v_ead_conservation_class_vs_geo", "EBA",
            "sum({CR04, c0010}) = sum({C09.01, c0010})",
        )
    )
    for t, c in (("C09.01", "0010"), ("C07.00", "0010"), ("C07.00", "0020"),
                 ("C08.01", "0010"), ("C08.01", "0020"), ("CR04", "0010")):
        tkey = t.replace(".", "")
        out.append(
            GrammarRule(
                f"v_max_le_sum_{tkey}_c{c}", "EBA",
                f"max({{{t}, c{c}}}) <= sum({{{t}, c{c}}})",
                # the EBA "if value missing: treat as zero" policy: a
                # reported-empty member (C07.00 r0090/c0010) zero-fills —
                # a no-op in both max() and sum(). The c0020 member still
                # refuses with cell_not_emitted on BOTH engines: row 0090
                # and column 0020 each exist but their cell was never
                # emitted, and absence precedes any missing-value policy
                # (the absent ≠ missing distinction)
                missing_value=MISSING_ZERO,
            )
        )
    return tuple(out)


GRAMMAR_RULES = GRAMMAR_RULES + _generated_rules()


def evaluate_catalogue(index: TemplateIndex) -> list[tuple]:
    out: list[tuple] = []
    for rule in GRAMMAR_RULES:
        out.extend(evaluate_rule(rule, index))
    return out


def catalogue_oracle_sql() -> str:
    return rules_oracle_sql(
        GRAMMAR_RULES, grammar_facts_sql(), ESTATE_AXES, {"C09.02": C09_SHEET_CODES}
    )


def grammar_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the catalogue over the freshly-computed estate."""
    index = grammar_estate(spark, sf_dir)
    rows = evaluate_catalogue(index)
    return spark.createDataFrame(
        rows,
        "rule_id string, source string, coordinate string, status string, "
        "reason string, lhs double, rhs double",
    )


_SCOPED_SCHEMA = (
    "rule_id string, source string, coordinate string, status string, "
    "reason string, lhs double, rhs double, scope string"
)


def scoped_grammar_outcomes(
    spark: SparkSession, sf_dir: str, ctx, index: TemplateIndex | None = None
) -> DataFrame:
    """Evaluate the catalogue under a submission context (reporting_scope):
    out-of-scope rules emit one NOT_IN_SCOPE row and never reach the
    evaluator; every row carries the scope verdict. Pass a pre-built
    ``index`` to reuse one estate computation across consumers (the checker
    needs the same index again for template coverage)."""
    from rwa_calculator_spark.reporting_scope import scoped_outcomes

    if index is None:
        index = grammar_estate(spark, sf_dir)
    rows = scoped_outcomes(GRAMMAR_RULES, index, ctx)
    return spark.createDataFrame(rows, _SCOPED_SCHEMA)


def scoped_catalogue_oracle_sql(ctx) -> str:
    from rwa_calculator_spark.reporting_scope import scoped_oracle_sql

    return scoped_oracle_sql(
        GRAMMAR_RULES, grammar_facts_sql(), ESTATE_AXES,
        {"C09.02": C09_SHEET_CODES}, ctx,
    )
