"""Scope stage: reporting-entity population filtering (ref
engine/stages/scope/resolver.py:84-446 resolve_scope — entity-subtree
membership, book→entity attribution, intragroup elimination, guarantee
internal-protection drop; CRR Part One Title II Art.6/11-18).

Semantics reproduced:
- membership: the requested entity's inclusive subtree for a consolidated /
  sub-consolidated run (the two differ only in filing label), the entity
  alone for an individual run;
- booking filter: exposure rows keep only book_codes that map to a member
  entity; blank/unmapped books are excluded and surface as SCP001 errors;
- intragroup elimination (consolidated only): rows whose
  intragroup_entity_reference names a member are dropped — solo books keep
  them;
- guarantees whose guarantor is a member are internal protection at the
  consolidated level and are dropped there (no book_code on protection);
- reference frames (ratings, provisions, collateral, mappings) are never
  filtered — dropped exposures simply stop joining to them;
- SCP002 (mapping to unknown entity) and SCP006 (requested entity not in
  the registry → empty scope) populate the error channel.

Scale posture: the registry and book mapping are dimension tables; subtree
membership is the iterative broadcast-join closure (operators/graph), the
booking filter is a broadcast semi-join per fact frame, and intragroup /
guarantor drops are broadcast anti-joins. No fact-table shuffle anywhere;
error frames aggregate DISTINCT book codes (dimension-sized), never
exposure rows.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.operators.graph import ancestor_closure_iterative

# shared error-channel schema (code, severity, stage, key, message) — the
# reference's CalculationError distilled to a frame row (ref
# contracts/errors.py, engine/orchestrator.py:174-191)
ERRORS_SCHEMA = "code string, severity string, stage string, key string, message string"

# driver-walk guard for the registry BFS (mirrors operators/graph.py
# MAX_LOCAL_EDGES — entity registries are organisational-sized)
_MAX_LOCAL_REGISTRY = 100_000


def _error_frame(df: DataFrame, code: str, severity: str, stage: str, key_col, message: str) -> DataFrame:
    return df.select(
        F.lit(code).alias("code"),
        F.lit(severity).alias("severity"),
        F.lit(stage).alias("stage"),
        key_col.cast("string").alias("key"),
        F.lit(message).alias("message"),
    )


def resolve_scope(
    raw: RawBundle, reporting_entity: str, basis: str = "consolidated", pack=None
) -> tuple[RawBundle, DataFrame]:
    """Filter the bundle to the reporting scope; returns (filtered bundle,
    SCP error frame). Requires raw.reporting_entities
    (entity_reference, parent_entity_reference) and raw.book_entity_mappings
    (book_code, entity_reference).

    When `pack` enables intragroup_zero_rw and the registry carries
    core_uk_group, individual-basis runs additionally set the
    `intragroup_zero_rw_eligible` carrier on lending rows whose
    intragroup_entity_reference names a core-UK-group member — the CRR
    Art.113(6) 0% RW override fires in run_sa (ref
    engine/stages/scope/resolver.py:233 _cug_eligibility). The carrier is
    OVERWRITTEN on every run the stage sees (False everywhere it doesn't
    apply), closing the user-loadable bypass."""
    spark = raw.counterparties.sparkSession
    reg = raw.reporting_entities.select("entity_reference", "parent_entity_reference")
    mapping = raw.book_entity_mappings.select("book_code", "entity_reference")

    errors = spark.createDataFrame([], ERRORS_SCHEMA)

    # SCP006: requested entity absent from the registry → empty scope
    requested_known = (
        reg.where(F.col("entity_reference") == reporting_entity).limit(1).count() > 0
    )
    if not requested_known:
        errors = errors.unionByName(
            spark.createDataFrame(
                [
                    (
                        "SCP006",
                        "error",
                        "scope",
                        reporting_entity,
                        "requested reporting entity is not in the registry; "
                        "all exposures excluded",
                    )
                ],
                ERRORS_SCHEMA,
            )
        )
        members = spark.createDataFrame([], "member string")
    elif basis == "individual":
        members = spark.createDataFrame([(reporting_entity,)], "member string")
    else:
        # inclusive subtree. Entity registries are organisational-sized
        # (10²-10⁴ rows), so the default is the reference's own shape — a
        # guarded driver BFS (resolver.py _descendants) — which avoids
        # re-executing a 10-round lazy join chain once per downstream
        # broadcast. Registries above the guard take the distributed
        # closure (operators/graph), the 100 TB fallback.
        edge_rows = (
            reg.where(F.col("parent_entity_reference").isNotNull())
            .select("entity_reference", "parent_entity_reference")
            .limit(_MAX_LOCAL_REGISTRY + 1)
            .collect()
        )
        if len(edge_rows) <= _MAX_LOCAL_REGISTRY:
            children: dict[str, list[str]] = {}
            for r in edge_rows:
                children.setdefault(r.parent_entity_reference, []).append(
                    r.entity_reference
                )
            seen, stack = set(), [reporting_entity]
            while stack:
                node = stack.pop()
                if node in seen:
                    continue
                seen.add(node)
                stack.extend(children.get(node, []))
            members = spark.createDataFrame([(m,) for m in sorted(seen)], "member string")
        else:
            edges = reg.where(F.col("parent_entity_reference").isNotNull()).select(
                F.col("entity_reference").alias("child"),
                F.col("parent_entity_reference").alias("parent"),
            )
            closure = ancestor_closure_iterative(edges)
            members = (
                closure.where(F.col("ancestor") == reporting_entity)
                .select(F.col("descendant").alias("member"))
                .unionByName(
                    spark.createDataFrame([(reporting_entity,)], "member string")
                )
                .distinct()
            )

    # SCP002: mapping rows naming an unregistered entity (ignored for
    # attribution, surfaced as errors)
    unknown_map = mapping.join(
        reg.select(F.col("entity_reference").alias("_reg_ref")),
        mapping.entity_reference == F.col("_reg_ref"),
        "anti",
    )
    errors = errors.unionByName(
        _error_frame(
            unknown_map.select("entity_reference").distinct(),
            "SCP002",
            "error",
            "scope",
            F.col("entity_reference"),
            "book mapping names an unregistered entity",
        )
    )

    valid_mapping = mapping.join(
        reg.select(F.col("entity_reference").alias("_reg_ref")),
        mapping.entity_reference == F.col("_reg_ref"),
        "semi",
    )
    member_books = valid_mapping.join(
        F.broadcast(members), valid_mapping.entity_reference == F.col("member"), "semi"
    ).select("book_code").distinct()
    all_books = mapping.select("book_code").distinct()

    drop_intragroup = basis != "individual"
    members_b = F.broadcast(members)
    books_b = F.broadcast(member_books)

    def _booking(df: DataFrame | None) -> DataFrame | None:
        if df is None or "book_code" not in df.columns:
            return df
        return df.join(books_b, "book_code", "semi")

    def _intragroup(df: DataFrame | None) -> DataFrame | None:
        if df is None or not drop_intragroup or "intragroup_entity_reference" not in df.columns:
            return df
        # anti-join on equality: null tags never match → kept (solo rows)
        return df.join(
            members_b, df.intragroup_entity_reference == F.col("member"), "anti"
        )

    # CRR Art.113(6) core-UK-group eligibility (individual basis only —
    # consolidated runs eliminate intragroup rows before weighting, so the
    # override cannot fire there; ref resolver.py _cug_eligibility)
    cug_active = (
        pack is not None
        and "intragroup_zero_rw_enabled" in pack.scalars
        and pack.scalar("intragroup_zero_rw_enabled") >= 1.0
        and "core_uk_group" in raw.reporting_entities.columns
        and basis == "individual"
        and requested_known
    )
    if cug_active:
        cug = raw.reporting_entities.where(
            F.coalesce("core_uk_group", F.lit(False))
        ).select(F.col("entity_reference").alias("_cug"))
        # condition 2: the reporting entity must itself be in the core group
        requested_in_cug = (
            cug.where(F.col("_cug") == reporting_entity).limit(1).count() > 0
        )
        cug_b = F.broadcast(cug)
    else:
        requested_in_cug = False
        cug_b = None

    def _cug_carrier(df: DataFrame | None) -> DataFrame | None:
        if df is None:
            return None
        if (
            cug_active
            and requested_in_cug
            and "intragroup_entity_reference" in df.columns
        ):
            df = df.join(
                cug_b, df.intragroup_entity_reference == F.col("_cug"), "left"
            )
            return df.withColumn(
                "intragroup_zero_rw_eligible", F.col("_cug").isNotNull()
            ).drop("_cug")
        # authoritative clear everywhere the override cannot fire
        if "intragroup_zero_rw_eligible" in df.columns or (
            cug_active and "intragroup_entity_reference" in df.columns
        ):
            return df.withColumn("intragroup_zero_rw_eligible", F.lit(False))
        return df

    def _lending(df: DataFrame | None) -> DataFrame | None:
        return _cug_carrier(_intragroup(_booking(df)))

    # SCP001: unattributable books on lending frames (blank or unmapped) —
    # aggregated at DISTINCT book grain, not exposure grain
    for frame in (raw.loans, raw.contingents, raw.facilities):
        if frame is None or "book_code" not in frame.columns:
            continue
        orphan_books = (
            frame.select("book_code")
            .distinct()
            .join(F.broadcast(all_books), "book_code", "anti")
        )
        errors = errors.unionByName(
            _error_frame(
                orphan_books,
                "SCP001",
                "error",
                "scope",
                F.coalesce(F.col("book_code"), F.lit("<blank>")),
                "book_code not mapped to any registered entity; rows excluded",
            )
        )

    guarantees = raw.guarantees
    if (
        guarantees is not None
        and drop_intragroup
        and "guarantor_entity_reference" in guarantees.columns
    ):
        guarantees = guarantees.join(
            members_b, guarantees.guarantor_entity_reference == F.col("member"), "anti"
        )

    filtered = replace(
        raw,
        loans=_lending(raw.loans),
        contingents=_lending(raw.contingents),
        facilities=_lending(raw.facilities),
        equity_exposures=_booking(raw.equity_exposures),
        guarantees=guarantees,
        # CCR/SFT filter at netting-set/trade grain (ref resolver.py
        # _filter_ccr/_filter_sft — booking + intragroup on the set)
        trades=_lending(raw.trades),
        sft_trades=_lending(raw.sft_trades),
        ciu_holdings=_booking(raw.ciu_holdings),
        failed_trades=_booking(raw.failed_trades),
    )
    return filtered, errors
