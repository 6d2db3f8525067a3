"""Parallel-run reconciliation registry (ref analysis/recon_registry.py +
analysis/reconciliation.py).

The canonical catalogue of result components that can be reconciled
legacy-vs-ours: each component carries its kind (numeric → delta +
tolerance; categorical → normalised equality), the preference-ordered
candidate columns on OUR audit ledger, the explain columns surfacing our
rationale ("why did we get this value") and the raw input drivers ("bad
input data vs engine logic"), tolerances, and whether the value is additive
across sub-rows. ``LegacyColumnMapping`` maps an external calculator's
output columns onto those components and validates the names in-module (no
cross-layer import), exactly the reference's shape.

Spark-first: the reconciliation itself is ONE full-outer join on the
composite key followed by per-component bucket expressions — it runs over
10^11-row ledgers unchanged (shuffle on the key, partial-aggregated
summaries), unlike a collect-and-compare harness.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum


@dataclass(frozen=True)
class ReconcilableComponent:
    """One canonical result component (ref recon_registry.py
    ReconcilableComponent): 'numeric' buckets by delta + tolerance,
    'categorical' by normalised (upper/trim) equality."""

    name: str
    kind: str  # "numeric" | "categorical"
    our_columns: tuple[str, ...]  # preference order; first present wins
    explain_columns: tuple[str, ...] = ()
    input_columns: tuple[str, ...] = ()
    abs_tol: float = 0.01
    rel_tol: float = 0.0
    additive: bool = False


#: The canonical component registry over the engine's audit ledger
#: (_RESULT_COLS, engine/stages/calculators.py). Components, not columns:
#: the legacy mapping targets these names, never raw column names.
COMPONENT_REGISTRY: dict[str, ReconcilableComponent] = {
    c.name: c
    for c in (
        ReconcilableComponent(
            "ead", "numeric", ("ead_after_crm", "ead"),
            input_columns=("drawn_amount", "undrawn_amount", "ccf"),
            additive=True,
        ),
        ReconcilableComponent(
            "rwa", "numeric", ("rwa",),
            explain_columns=("rw_source",),
            input_columns=("risk_weight", "ead_after_crm"),
            rel_tol=1e-5, additive=True,
        ),
        ReconcilableComponent(
            "rw", "numeric", ("risk_weight",),
            explain_columns=("rw_source",), abs_tol=1e-6,
        ),
        ReconcilableComponent(
            "pd", "numeric", ("pd_used", "pd"), abs_tol=1e-8,
        ),
        ReconcilableComponent(
            "lgd", "numeric", ("lgd_used", "lgd"), abs_tol=1e-8,
        ),
        ReconcilableComponent(
            "expected_loss", "numeric", ("expected_loss",), additive=True,
        ),
        ReconcilableComponent("approach", "categorical", ("approach",)),
        ReconcilableComponent(
            "exposure_class", "categorical", ("exposure_class",),
            explain_columns=("rw_source",),
        ),
    )
}


@dataclass(frozen=True)
class LegacyColumnMapping:
    """Maps legacy output columns -> component names; validates against the
    registry in-module (unknown component names are configuration errors,
    caught at construction — ref recon_registry.py LegacyColumnMapping)."""

    columns: Mapping[str, str]  # legacy column name -> component name
    registry: Mapping[str, ReconcilableComponent] = field(
        default_factory=lambda: COMPONENT_REGISTRY
    )

    def __post_init__(self) -> None:
        unknown = sorted(set(self.columns.values()) - set(self.registry))
        if unknown:
            raise ValueError(f"unknown reconciliation components: {unknown}")


@dataclass(frozen=True)
class ParallelRunRecon:
    detail: DataFrame  # key × component: ours/theirs (display), diff, bucket
    summary: DataFrame  # component × bucket: n, total_abs_diff
    worklist: DataFrame  # breaks by materiality


def select_ours(
    df: DataFrame, components: Sequence[ReconcilableComponent], keys: Sequence[str]
) -> DataFrame:
    """Project OUR ledger onto canonical component names: the first present
    candidate column wins (preference order); a component with no candidate
    present is a configuration error, not a silent skip."""
    cols = list(df.columns)
    sel = [F.col(k) for k in keys]
    for c in components:
        src = next((col for col in c.our_columns if col in cols), None)
        if src is None:
            raise ValueError(f"no candidate column for component {c.name!r}")
        sel.append(F.col(src).alias(c.name))
    return df.select(*sel)


def select_legacy(
    df: DataFrame, mapping: LegacyColumnMapping, keys: Sequence[str]
) -> DataFrame:
    sel = [F.col(k) for k in keys]
    sel += [F.col(src).alias(comp) for src, comp in mapping.columns.items()]
    return df.select(*sel)


def reconcile_parallel_run(
    ours: DataFrame,
    legacy: DataFrame,
    keys: Sequence[str],
    components: Sequence[ReconcilableComponent],
) -> ParallelRunRecon:
    """One full-outer join, per-component buckets:
    numeric → exact (≤abs_tol) / tolerance (≤rel_tol·max|·|) / break;
    categorical → normalised equality (upper/trim) exact / break;
    one-sided rows → missing_ours / missing_theirs for every component."""
    l = ours.select(*keys, *[F.col(c.name).alias(f"l_{c.name}") for c in components])
    r = legacy.select(
        *[F.col(k).alias(f"r_{k}") for k in keys],
        *[F.col(c.name).alias(f"r_{c.name}") for c in components],
    )
    cond = None
    for k in keys:
        piece = l[k].eqNullSafe(r[f"r_{k}"])
        cond = piece if cond is None else cond & piece
    j = l.join(r, cond, "full")
    key_cols = [F.coalesce(l[k], r[f"r_{k}"]).alias(k) for k in keys]
    present_l = l[keys[0]].isNotNull()
    present_r = r[f"r_{keys[0]}"].isNotNull()

    frames = []
    for c in components:
        lv, rv = F.col(f"l_{c.name}"), F.col(f"r_{c.name}")
        if c.kind == "numeric":
            diff = lv - rv
            bucket = (
                F.when(~present_l, "missing_ours")
                .when(~present_r, "missing_theirs")
                .when(F.abs(diff) <= c.abs_tol, "exact")
                .when(
                    F.abs(diff)
                    <= c.rel_tol * F.greatest(F.abs(lv), F.abs(rv)),
                    "tolerance",
                )
                .otherwise("break")
            )
        else:
            diff = F.lit(None).cast("double")
            norm_eq = F.upper(F.trim(lv.cast("string"))) == F.upper(
                F.trim(rv.cast("string"))
            )
            bucket = (
                F.when(~present_l, "missing_ours")
                .when(~present_r, "missing_theirs")
                .when(norm_eq, "exact")
                .otherwise("break")
            )
        frames.append(
            j.select(
                *key_cols,
                F.lit(c.name).alias("component"),
                lv.cast("string").alias("ours"),
                rv.cast("string").alias("theirs"),
                diff.alias("diff"),
                bucket.alias("bucket"),
            )
        )
    detail = frames[0]
    for f in frames[1:]:
        detail = detail.unionByName(f)

    summary = detail.groupBy("component", "bucket").agg(
        F.count("*").alias("n"),
        scaled_sum(F.abs(F.coalesce("diff", F.lit(0.0))), 2).alias("total_abs_diff"),
    )
    worklist = detail.where(F.col("bucket") == "break").orderBy(
        F.abs(F.coalesce("diff", F.lit(0.0))).desc(), "component", *keys
    )
    return ParallelRunRecon(detail=detail, summary=summary, worklist=worklist)
