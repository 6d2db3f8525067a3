"""Component reconciliation (ref analysis/reconciliation.py:184-1120,
api/service.py `calc.reconcile`).

Two per-exposure result sets — ours vs a legacy/parallel run — full-outer
joined on a composite key, then each numeric component bucketed
exact / within-tolerance / break / missing, with per-component summaries
and a materiality-sorted break worklist. Pure DataFrame ops: the same
reconciliation runs over 10^11-row ledgers unchanged (the join shuffles on
the composite key; summaries are partial-aggregated).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum


@dataclass(frozen=True)
class ReconComponent:
    name: str
    abs_tol: float = 0.01
    rel_tol: float = 0.0


@dataclass(frozen=True)
class ReconciliationResult:
    detail: DataFrame  # one row per key × component with bucket + diff
    summary: DataFrame  # per component × bucket: n, total_abs_diff
    worklist: DataFrame  # breaks sorted by materiality (|diff| desc)


def reconcile(
    ours: DataFrame,
    theirs: DataFrame,
    keys: Sequence[str],
    components: Sequence[ReconComponent],
) -> ReconciliationResult:
    l = ours.select(*keys, *[F.col(c.name).alias(f"l_{c.name}") for c in components])
    r = theirs.select(
        *[F.col(k).alias(f"r_{k}") for k in keys],
        *[F.col(c.name).alias(f"r_{c.name}") for c in components],
    )
    cond = None
    for k in keys:
        piece = l[k] == r[f"r_{k}"]
        cond = piece if cond is None else cond & piece
    j = l.join(r, cond, "full")
    key_cols = [F.coalesce(l[k], r[f"r_{k}"]).alias(k) for k in keys]
    present_l = l[keys[0]].isNotNull()
    present_r = r[f"r_{keys[0]}"].isNotNull()

    frames = []
    for c in components:
        lv, rv = F.col(f"l_{c.name}"), F.col(f"r_{c.name}")
        diff = lv - rv
        bucket = (
            F.when(~present_l, "missing_ours")
            .when(~present_r, "missing_theirs")
            .when(F.abs(diff) <= c.abs_tol, "exact")
            .when(F.abs(diff) <= c.rel_tol * F.greatest(F.abs(lv), F.abs(rv)), "tolerance")
            .otherwise("break")
        )
        frames.append(
            j.select(
                *key_cols,
                F.lit(c.name).alias("component"),
                lv.alias("ours"),
                rv.alias("theirs"),
                F.coalesce(diff, F.lit(None)).alias("diff"),
                bucket.alias("bucket"),
            )
        )
    detail = frames[0]
    for f in frames[1:]:
        detail = detail.unionByName(f)

    summary = detail.groupBy("component", "bucket").agg(
        F.count("*").alias("n"),
        scaled_sum(F.abs(F.coalesce("diff", F.lit(0.0))), 6).alias("total_abs_diff"),
    )
    worklist = (
        detail.where(F.col("bucket") == "break")
        .orderBy(F.abs("diff").desc_nulls_last(), *keys)
    )
    return ReconciliationResult(detail=detail, summary=summary, worklist=worklist)
