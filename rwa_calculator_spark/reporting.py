"""COREP-style reporting kernel (ref reporting/cellspec.py,
reporting/kernel/*, reporting/facts.py, reporting/validations/evaluate.py).

Cells are DATA: (template, row, col, filter, measure) specs. The kernel
computes every cell of a template in ONE scan — each cell is a conditional
fixed-point sum inside a single aggregation — then unpivots the wide row to
the long (template, row_id, col_id, value) facts frame the reference emits.
At 100 TB this matters: N cells cost one pass, not N passes.

Validation rules follow the reference's published-rule semantics: an
absent cell is NOT zero (null propagates, vacuous rules don't pass).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CellSpec:
    template: str
    row_id: str
    col_id: str
    filter_sql: str  # Spark SQL boolean expression over the source frame
    measure_sql: str  # Spark SQL numeric expression
    scale: int = 2

    @property
    def cell_id(self) -> str:
        return f"{self.template}|{self.row_id}|{self.col_id}"


def compute_cells(df: DataFrame, specs: Sequence[CellSpec]) -> DataFrame:
    """All cells in one aggregation pass → long facts frame
    (template, row_id, col_id, value). Empty filter → null cell (absent),
    not zero — distinguished via the conditional count."""
    aggs = []
    for i, s in enumerate(specs):
        cond = F.expr(s.filter_sql)
        m = float(10**s.scale)
        val = (
            F.sum(F.when(cond, F.round(F.expr(s.measure_sql) * m, 0).cast("long"))) / F.lit(m)
        ).alias(f"v{i}")
        aggs.append(val)
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{s.cell_id}', v{i}" for i, s in enumerate(specs))
    long = wide.selectExpr(f"stack({len(specs)}, {stack_args}) AS (cell_id, value)")
    parts = F.split("cell_id", "\\|")
    return long.select(
        parts.getItem(0).alias("template"),
        parts.getItem(1).alias("row_id"),
        parts.getItem(2).alias("col_id"),
        "value",
    )


@dataclass(frozen=True)
class ValidationRule:
    """left == sum(right cells) within tolerance, carrying the publisher
    semantics the reference normalises onto ONE rule shape (ref
    reporting/validations/rules.py):

    - ``missing_policy``: the publisher's missing-value policy. ``"skip"``
      (the default) is null-aware — any absent referenced cell makes the
      rule 'not_evaluable', never 'pass' (absent-cell ≠ zero, vacuous ≠
      pass). ``"zero"`` is the EBA "If value missing: treat as zero" /
      BoE ``dv: 0`` policy — absent cells substitute 0 and the rule still
      evaluates.
    - ``severity``: publisher severity ('error' rejects a submission,
      'warning' flags it).
    - ``liveness`` + ``reactivated_on``: publication status. A rule is
      *currently enforced* when it is live **or** carries a reactivated
      date, in both cases excluding deleted — filtering on liveness alone
      silently drops rules that were deactivated and later switched back
      on (the reference's 153-EBA-rule trap).
    """

    rule_id: str
    left: str  # cell_id
    right: Sequence[str]  # cell_ids summed
    tolerance: float = 0.01
    severity: str = "error"  # error | warning
    liveness: str = "live"  # live | deactivated | deleted
    reactivated_on: str | None = None  # ISO date the rule was switched back on
    missing_policy: str = "skip"  # skip -> not_evaluable; zero -> treat as 0

    @property
    def enforced(self) -> bool:
        """Currently enforced: live OR reactivated, excluding deleted."""
        if self.liveness == "deleted":
            return False
        return self.liveness == "live" or self.reactivated_on is not None


def evaluate_validations(
    facts: DataFrame, rules: Sequence[ValidationRule]
) -> DataFrame:
    """Returns (rule_id, severity, status, left_value, right_value, diff)
    per ENFORCED rule (deleted / deactivated-and-never-reactivated rules
    are excluded up front, mirroring the reference's liveness filter).
    status ∈ {pass, fail, not_evaluable}."""
    spark = facts.sparkSession
    cells = {
        f"{r.template}|{r.row_id}|{r.col_id}": r.value
        for r in facts.collect()  # facts are O(#cells) — driver-sized by design
    }
    rows = []
    for rule in rules:
        if not rule.enforced:
            continue
        lv = cells.get(rule.left)
        rvs = [cells.get(c) for c in rule.right]
        if rule.missing_policy == "zero":
            lv = 0.0 if lv is None else lv
            rvs = [0.0 if v is None else v for v in rvs]
        if lv is None or any(v is None for v in rvs):
            rows.append((rule.rule_id, rule.severity, "not_evaluable", lv, None, None))
            continue
        rv = sum(rvs)
        diff = lv - rv
        status = "pass" if abs(diff) <= rule.tolerance else "fail"
        rows.append((rule.rule_id, rule.severity, status, lv, rv, diff))
    return spark.createDataFrame(
        rows,
        "rule_id string, severity string, status string, "
        "left_value double, right_value double, diff double",
    )


def cell_lineage(
    df: DataFrame, spec: CellSpec, key_cols: Sequence[str], limit: int = 1000
) -> tuple[DataFrame, float | None]:
    """Drill a reported cell back to the ledger legs that fed it (ref
    reporting/lineage.py — "a cell's lineage IS its spec": the drilldown
    re-runs the cell's own predicate over the same frame the kernel
    aggregated, never a second hand-maintained copy that could silently
    disagree with the reported figure).

    Returns (legs DataFrame ordered by |contribution| descending, the
    cell's value recomputed from the SAME fixed-point arithmetic as
    compute_cells — None when the cell is absent). The legs frame carries
    `contribution` so Σ legs reconciles to the cell value exactly.
    """
    cond = F.expr(spec.filter_sql)
    m = float(10**spec.scale)
    legs = (
        df.where(cond)
        .select(
            *key_cols,
            (F.round(F.expr(spec.measure_sql) * m, 0).cast("long") / F.lit(m)).alias(
                "contribution"
            ),
        )
        .orderBy(F.abs(F.col("contribution")).desc(), *key_cols)
        .limit(limit)
    )
    total_row = (
        df.agg(
            (
                F.sum(
                    F.when(cond, F.round(F.expr(spec.measure_sql) * m, 0).cast("long"))
                )
                / F.lit(m)
            ).alias("v")
        )
        .collect()[0]
    )
    return legs, (None if total_row["v"] is None else float(total_row["v"]))
