"""Cross-engine-deterministic float aggregation.

Float sums are order-dependent; Spark sums per-partition then merges, so the
same query can produce last-ulp-different totals run-to-run and will rarely
bit-match an independent engine (the DuckDB oracle). The reference dodged
this by being single-threaded Polars; at 100 TB we cannot.

The fix: aggregate in fixed-point. Each row is rounded to an integer number
of 10^-scale units (LONG), summed exactly (integer addition is associative,
so partitioning/AQE/merge order never matters), then divided back to DOUBLE.
Spark `round` (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB
`round` (half away from zero) agree everywhere except values within half an
ulp of a .5 boundary — probability ~1e-10 per row.

This is also the scale-correct design: a 1000-executor sum of 10^12 rows is
reproducible, which the reference's reconciliation workflows (SURVEY §3.3)
require of any two runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_sum(col: Column, scale: int = 2) -> Column:
    """Exact, order-independent sum of a double column at 10^-scale units."""
    m = float(10**scale)
    return F.sum(F.round(col * F.lit(m), 0).cast("long")) / F.lit(m)


def scaled_avg(col: Column, scale: int = 2) -> Column:
    """Deterministic mean: exact scaled sum divided by count of non-nulls."""
    m = float(10**scale)
    total = F.sum(F.round(col * F.lit(m), 0).cast("long"))
    n = F.count(col)
    return (total / F.lit(m)) / F.nullif(n, F.lit(0))


def sql_scaled_sum(expr: str, scale: int = 2) -> str:
    """DuckDB SQL emitting the identical fixed-point sum as `scaled_sum`."""
    m = 10**scale
    return f"sum(CAST(round(({expr}) * {m}.0, 0) AS BIGINT)) / CAST({m} AS DOUBLE)"


def sql_scaled_avg(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return (
        f"(sum(CAST(round(({expr}) * {m}.0, 0) AS BIGINT)) / CAST({m} AS DOUBLE))"
        f" / nullif(count({expr}), 0)"
    )
