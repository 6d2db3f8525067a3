"""SEC-SA SSFA tranche risk weight (BCBS CRE41 / CRR Art.261-262).

The reference declares the securitisation RWA framework out of scope and
reports a placeholder per-pool RWA (ref engine/aggregator/_securitisation.py
module docstring: "SEC-SA, SEC-IRBA ... is out of scope"). This module goes
beyond the reference with the full SSFA closed form, expressed through the
same V-node generator as functions/stats.py so the Spark engine plan and
the DuckDB oracle run identical arithmetic.

Formula (public Basel III, CRE41.16-41.18 / CRR Art.261):
  K_A    = (1 − W)·K_SA + 0.5·W        (delinquency-adjusted pool capital)
  a      = −1 / (p·K_A)
  u      = D − K_A
  l      = max(A − K_A, 0)
  K_SSFA = (e^{a·u} − e^{a·l}) / (a·(u − l))
  RW     = 1250%                                     when D ≤ K_A
         = 12.5·K_SSFA                               when A ≥ K_A
         = 12.5·[(K_A−A) + (D−K_A)·K_SSFA]/(D−A)     when A < K_A < D
  floored at 15% (CRR Art.261(1)).

All branches are pure exp/arithmetic → whole-stage codegen on Spark,
plain SQL in DuckDB; residual cross-engine noise is exp libm last-ulp,
absorbed by output rounding in the driver query.
"""

from __future__ import annotations

from pyspark.sql import Column

from rwa_calculator_spark.functions.stats import SparkB, SqlB, V, _exp, _where


def k_a_v(w: V, ksa) -> V:
    return (1.0 - w) * ksa + 0.5 * w


def ssfa_rw_v(attach: V, detach: V, w: V, ksa, p, floor) -> V:
    """Floored SSFA risk weight as a decimal (12.5 == 1250%).

    attach/detach are tranche attachment/detachment points in [0, 1] with
    detach > attach; w is the pool delinquency ratio W; ksa, p, floor are
    regime scalars (rulepack values, folded as literals in both engines).
    """
    b = attach.b
    k_a = k_a_v(w, ksa)
    a = -1.0 / (p * k_a)
    u = detach - k_a
    low_raw = attach - k_a
    low = _where(low_raw > 0.0, low_raw, V(b, b.lit(0.0)))
    # shared across both non-flat branches: in the straddle branch l
    # clamps to 0 so u−l = D−K_A; in the A ≥ K_A branch u−l = D−A.
    k_ssfa = (_exp(a * u) - _exp(a * low)) / (a * (u - low))
    straddle = ((k_a - attach) + (detach - k_a) * k_ssfa) * 12.5 / (detach - attach)
    raw = _where(
        detach <= k_a,
        V(b, b.lit(12.5)),
        _where(attach < k_a, straddle, 12.5 * k_ssfa),
    )
    return _where(raw < floor, V(b, b.lit(float(floor))), raw)


# --- Spark Column surface --------------------------------------------------


def ssfa_risk_weight(
    attach: Column, detach: Column, w: Column, ksa: float, p: float, floor: float
) -> Column:
    return ssfa_rw_v(
        V(SparkB, attach), V(SparkB, detach), V(SparkB, w), ksa, p, floor
    ).v


def ssfa_risk_weight_cols(
    attach: Column, detach: Column, w: Column, k: Column, p: Column, floor: float
) -> Column:
    """SSFA with COLUMN-valued pool capital and supervisory p — the
    SEC-IRBA surface (CRR Art.259: K = K_IRB per pool, p from the
    supervisory formula). Same closed form; the V nodes are polymorphic
    over scalar and column operands so the generated plan is identical."""
    return ssfa_rw_v(
        V(SparkB, attach),
        V(SparkB, detach),
        V(SparkB, w),
        V(SparkB, k),
        V(SparkB, p),
        floor,
    ).v


# --- DuckDB SQL surface ----------------------------------------------------


def sql_ssfa_rw(
    attach: str, detach: str, w: str, ksa: float, p: float, floor: float
) -> str:
    return ssfa_rw_v(V(SqlB, attach), V(SqlB, detach), V(SqlB, w), ksa, p, floor).v


def sql_ssfa_rw_cols(
    attach: str, detach: str, w: str, k: str, p: str, floor: float
) -> str:
    return ssfa_rw_v(
        V(SqlB, attach), V(SqlB, detach), V(SqlB, w), V(SqlB, k), V(SqlB, p), floor
    ).v
