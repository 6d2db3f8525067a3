"""COREP template library as data (ref reporting/corep/{c02,c07,c08,c09}.py,
reporting/validations/evaluate.py).

The reference declares each sheet as cell DATA (template, row, col, filter,
measure) executed by one kernel; validations are published EBA-style
expressions parsed from text, evaluated null-aware (absent cell ≠ zero,
vacuous ≠ pass). This module mirrors both: a multi-sheet cell catalog over a
star-schema exposure ledger, computed in ONE aggregation pass by
reporting.compute_cells, and a tiny parser for the published-rule grammar
`rule_id: {T,row,col} == {T,row,col} + {T,row,col} ... [tol X]`.

Cross-template tie-outs hold exactly because every cell rounds the measure
per-row at the same fixed-point scale before summing — integer arithmetic
makes class-row sums equal their C02.00 totals bit-for-bit.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.reporting import CellSpec, ValidationRule

# ---------------------------------------------------------------------------
# The exposure ledger the sheets aggregate (star-schema mapping)
# ---------------------------------------------------------------------------

_RW_SQL = (
    "CASE o_orderpriority WHEN '1-URGENT' THEN 0.2 WHEN '2-HIGH' THEN 0.5 "
    "WHEN '3-MEDIUM' THEN 0.75 WHEN '4-NOT SPECIFIED' THEN 1.0 ELSE 1.5 END"
)

STAR_LEDGER_SQL = f"""
    SELECT c.c_mktsegment AS exposure_class,
           CASE WHEN o.o_orderkey % 4 = 0 THEN 'IRB' ELSE 'SA' END AS approach,
           r.r_name AS region,
           o.o_totalprice AS ead,
           o.o_totalprice * ({_RW_SQL}) AS rwa
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def star_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rwa_calculator_spark.sources.star import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rw = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 0.2)
        .when(F.col("o_orderpriority") == "2-HIGH", 0.5)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 0.75)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 1.0)
        .otherwise(1.5)
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            F.col("c_mktsegment").alias("exposure_class"),
            F.when(F.col("o_orderkey") % 4 == 0, "IRB").otherwise("SA").alias("approach"),
            F.col("r_name").alias("region"),
            F.col("o_totalprice").alias("ead"),
            (F.col("o_totalprice") * rw).alias("rwa"),
        )
    )


# ---------------------------------------------------------------------------
# Sheet catalog (data, not code — ref reporting/corep/templates.py)
# ---------------------------------------------------------------------------

_CLASSES = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _build_catalog() -> list[CellSpec]:
    cells: list[CellSpec] = [
        # C 02.00 — own-funds requirements overview (ref corep/c02.py)
        CellSpec("C02.00", "0010", "0010", "true", "rwa"),
        CellSpec("C02.00", "0060", "0010", "approach = 'SA'", "rwa"),
        CellSpec("C02.00", "0250", "0010", "approach = 'IRB'", "rwa"),
    ]
    for i, cls in enumerate(_CLASSES):
        row = f"{(i + 1) * 10:04d}"
        # C 07.00 — SA by exposure class (cols: 0010 EAD, 0020 RWEA)
        cells.append(CellSpec("C07.00", row, "0010", f"approach = 'SA' AND exposure_class = '{cls}'", "ead"))
        cells.append(CellSpec("C07.00", row, "0020", f"approach = 'SA' AND exposure_class = '{cls}'", "rwa"))
        # C 08.01 — IRB by exposure class (ref corep/c08.py)
        cells.append(CellSpec("C08.01", row, "0010", f"approach = 'IRB' AND exposure_class = '{cls}'", "ead"))
        cells.append(CellSpec("C08.01", row, "0020", f"approach = 'IRB' AND exposure_class = '{cls}'", "rwa"))
    for i, reg in enumerate(_REGIONS):
        # C 09.01 — geographical breakdown (ref corep/c09.py)
        cells.append(CellSpec("C09.01", f"{(i + 1) * 10:04d}", "0010", f"region = '{reg}'", "ead"))
    for i, cls in enumerate(_CLASSES):
        # CR4-style whole-population sheet (Pillar 3 CR4 col a basis, ref
        # pillar3/cr4.py): per-class EAD across BOTH approaches — the
        # cross-template population tie the validation packs state against
        # the C 07.00 (SA) + C 08.01 (IRB) split
        cells.append(
            CellSpec("CR04", f"{(i + 1) * 10:04d}", "0010", f"exposure_class = '{cls}'", "ead")
        )
    # deliberately-absent cell: no DEFAULTED segment exists in the testdata —
    # the kernel must emit null (absent), never zero
    cells.append(CellSpec("C07.00", "0090", "0010", "exposure_class = 'DEFAULTED'", "ead"))
    return cells


TEMPLATE_CELLS: list[CellSpec] = _build_catalog()


def catalog_oracle_sql() -> str:
    """DuckDB SQL computing the identical facts frame (generated from the
    same cell data — spec and oracle can't drift apart)."""
    selects = []
    for s in TEMPLATE_CELLS:
        m = 10**s.scale
        selects.append(
            f"SELECT '{s.template}' AS template, '{s.row_id}' AS row_id, "
            f"'{s.col_id}' AS col_id, "
            f"sum(CASE WHEN {s.filter_sql} THEN CAST(round(({s.measure_sql}) * {m}.0, 0) AS BIGINT) END) "
            f"/ CAST({m} AS DOUBLE) AS value FROM ledger WHERE {s.filter_sql}"
        )
    body = "\n    UNION ALL\n    ".join(selects)
    return f"WITH ledger AS ({STAR_LEDGER_SQL})\n    {body}"


# ---------------------------------------------------------------------------
# Published-style validation rules, parsed from text
# ---------------------------------------------------------------------------

#: EBA-grammar-shaped tie-out rules across the sheets (ref
#: reporting/validations/rules.py — the publishers' own grammars normalised
#: onto one rule shape, WITH the publisher semantics: severity, the
#: missing-value policy (EBA "If value missing: treat as zero" / BoE dv:0),
#: and liveness (a deactivated rule with a reactivated date IS enforced; a
#: deleted rule never is).
VALIDATION_RULES_TEXT = """
v0200_1: {C02.00,0010,0010} == {C02.00,0060,0010} + {C02.00,0250,0010}
v0700_1: {C02.00,0060,0010} == {C07.00,0010,0020} + {C07.00,0020,0020} + {C07.00,0030,0020} + {C07.00,0040,0020} + {C07.00,0050,0020}
v0801_1: {C02.00,0250,0010} == {C08.01,0010,0020} + {C08.01,0020,0020} + {C08.01,0030,0020} + {C08.01,0040,0020} + {C08.01,0050,0020}
v0901_1: {C09.01,0010,0010} == {C09.01,0010,0010} tol 0.0
v_absent: {C07.00,0090,0010} == {C02.00,0010,0010}
v_absent_zero: {C07.00,0090,0010} == {C07.00,0090,0010} missing zero severity warning
v_react: {C02.00,0010,0010} == {C02.00,0060,0010} + {C02.00,0250,0010} status deactivated reactivated 2025-06-01
v_deleted: {C02.00,0010,0010} == {C09.01,0010,0010} status deleted
"""

_CELL_RE = re.compile(r"\{([^,}]+),([^,}]+),([^,}]+)\}")
_RULE_RE = re.compile(
    r"^\s*(?P<id>[\w.]+)\s*:\s*(?P<left>\{[^}]+\})\s*==\s*(?P<right>.+?)"
    r"\s*(?P<attrs>(?:(?:tol|severity|missing|status|reactivated)\s+\S+\s*)*)$"
)
_ATTR_RE = re.compile(r"(tol|severity|missing|status|reactivated)\s+(\S+)")


def _cell_id(token: str) -> str:
    m = _CELL_RE.fullmatch(token.strip())
    if not m:
        raise ValueError(f"bad cell reference: {token!r}")
    return "|".join(p.strip() for p in m.groups())


def parse_validation_rules(text: str) -> list[ValidationRule]:
    """Parse the published-rule grammar: one rule per line,
    `rule_id: {T,row,col} == {T,row,col} + ... [tol X] [severity S]
    [missing zero|skip] [status live|deactivated|deleted]
    [reactivated YYYY-MM-DD]`. Unparseable non-empty lines or unknown
    attribute values are hard errors (the reference refuses to silently
    skip or misread supervisory rules)."""
    rules: list[ValidationRule] = []
    for line in text.splitlines():
        if not line.strip():
            continue
        m = _RULE_RE.match(line)
        if not m:
            raise ValueError(f"unparseable validation rule: {line!r}")
        right = [_cell_id(tok) for tok in m.group("right").split("+")]
        attrs = dict(_ATTR_RE.findall(m.group("attrs") or ""))
        severity = attrs.get("severity", "error")
        missing = attrs.get("missing", "skip")
        liveness = attrs.get("status", "live")
        if severity not in ("error", "warning"):
            raise ValueError(f"bad severity in rule: {line!r}")
        if missing not in ("skip", "zero"):
            raise ValueError(f"bad missing policy in rule: {line!r}")
        if liveness not in ("live", "deactivated", "deleted"):
            raise ValueError(f"bad status in rule: {line!r}")
        rules.append(
            ValidationRule(
                rule_id=m.group("id"),
                left=_cell_id(m.group("left")),
                right=right,
                tolerance=float(attrs.get("tol", 0.01)),
                severity=severity,
                liveness=liveness,
                reactivated_on=attrs.get("reactivated"),
                missing_policy=missing,
            )
        )
    return rules
