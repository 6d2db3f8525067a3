"""Model-permission resolution and approach routing (ref
engine/stages/classify/permissions.py resolve_model_permissions /
build_permission_exprs and engine/stages/classify/approach.py
assign_approach / _apply_b31_approach_restrictions).

Semantics (CRR Art.143/148/150, Art.147(3)-(4); PS1/26 Art.147A):
- each exposure's ``model_id`` (from its internal rating, parent-inherited
  with the PD) left-joins the ``model_permissions`` table; a permission row
  is valid when the exposure class matches, the geography filter passes
  (null country list = all geographies; a null counterparty country can
  never prove scope-in, so it FAILS a non-null filter — conservative), and
  the book code is not excluded (null needle coerced to not-excluded);
- SA precedence (CRR Art.150(1) PPU carve-out): a valid SA row for the
  model blocks every IRB flag — AIRB-wins-via-max would silently expand
  IRB scope beyond the firm's permission; the SA row's ``ppu_reason``
  survives as provenance;
- AIRB additionally requires a modelled LGD; FIRB-routed rows have their
  LGD cleared so the supervisory value applies downstream;
- exposures with no valid match fall back to SA, with a per-cause CLS006
  diagnostic (null_model_id / unmatched_model_id / filter_rejected);
- Basel 3.1 Art.147A restrictions (pack Feature
  ``b31_approach_restrictions``): FSE and large-corporate counterparties
  lose A-IRB (revenue taken at the highest level of consolidation —
  group-rolled; conservative when unknown), genuine institution exposures
  are F-IRB-only, and sovereign-like entity types are SA-only.

Scale posture: model_permissions is a model-registry-sized table (hundreds
of rows) — broadcast; the per-exposure roll-up is window aggregation over
``exposure_reference`` (one shuffle on the exposure key), then a
row_number first-wins dedup on the same window — no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.rulepack import RulePack

_SOVEREIGN_LIKE = ("sovereign", "central_bank", "rgla", "pse")


def _ensure(df: DataFrame, name: str, dtype: str) -> DataFrame:
    if name not in df.columns:
        df = df.withColumn(name, F.lit(None).cast(dtype))
    return df


def resolve_model_permissions(
    exposures: DataFrame, model_permissions: DataFrame
) -> DataFrame:
    """Per-exposure permission flags from the model-permissions registry.

    exposures: exposure_reference, model_id, exposure_class
    [, country, book_code] (absent optional columns become typed nulls —
    the reference seals them at the loader edge the same way).
    model_permissions: model_id, exposure_class, approach
    (AIRB|FIRB|SLOTTING|SA) [, country_codes, excluded_book_codes,
    ppu_reason] — list filters are substring-matched comma lists, as in
    the reference.

    Adds: model_airb_permitted, model_firb_permitted,
    model_slotting_permitted (booleans), ppu_reason,
    permission_diagnostic (null on the happy path).
    """
    for name, dt in (
        ("model_id", "string"),
        ("country", "string"),
        ("book_code", "string"),
    ):
        exposures = _ensure(exposures, name, dt)
    for name in ("country_codes", "excluded_book_codes", "ppu_reason"):
        model_permissions = _ensure(model_permissions, name, "string")

    mp = model_permissions.select(
        F.col("model_id").alias("mp_model_id"),
        F.col("exposure_class").alias("mp_class"),
        F.col("approach").alias("mp_approach"),
        F.col("country_codes").alias("mp_countries"),
        F.col("excluded_book_codes").alias("mp_excl_books"),
        F.col("ppu_reason").alias("mp_ppu"),
    )
    j = exposures.join(
        F.broadcast(mp), exposures["model_id"] == F.col("mp_model_id"), "left"
    ).drop("mp_model_id")

    # null-safe filters (ref permissions.py P1.114): contains(null needle)
    # is three-valued — guard each branch explicitly
    class_match = F.col("exposure_class") == F.col("mp_class")
    geo_passes = F.col("mp_countries").isNull() | (
        F.col("country").isNotNull()
        & F.col("mp_countries").contains(F.col("country"))
    )
    book_ok = F.col("mp_excl_books").isNull() | ~F.coalesce(
        F.col("mp_excl_books").contains(F.col("book_code")), F.lit(False)
    )
    valid = class_match & geo_passes & book_ok

    # coalesce to False: an unmatched left join yields null mp_* columns
    # and three-valued null flags that would poison the bool_or roll-up
    def _flag(cond):
        return F.coalesce(cond, F.lit(False))

    j = (
        j.withColumn("_joined", F.col("mp_class").isNotNull())
        .withColumn("_airb", _flag(valid & (F.col("mp_approach") == "AIRB")))
        .withColumn("_firb", _flag(valid & (F.col("mp_approach") == "FIRB")))
        .withColumn("_slot", _flag(valid & (F.col("mp_approach") == "SLOTTING")))
        .withColumn("_sa", _flag(valid & (F.col("mp_approach") == "SA")))
        .withColumn("_sa_ppu", F.when(valid & (F.col("mp_approach") == "SA"), F.col("mp_ppu")))
    )

    w = W.partitionBy("exposure_reference")
    sa_block = F.bool_or("_sa").over(w)
    j = (
        j.withColumn("model_airb_permitted", F.bool_or("_airb").over(w) & ~sa_block)
        .withColumn("model_firb_permitted", F.bool_or("_firb").over(w) & ~sa_block)
        .withColumn("model_slotting_permitted", F.bool_or("_slot").over(w) & ~sa_block)
        .withColumn("ppu_reason", F.max("_sa_ppu").over(w))
        .withColumn("_joined_any", F.bool_or("_joined").over(w))
    )
    any_match = (
        F.col("model_airb_permitted")
        | F.col("model_firb_permitted")
        | F.col("model_slotting_permitted")
    )
    j = j.withColumn(
        "permission_diagnostic",
        F.when(any_match, F.lit(None).cast("string"))
        .when(F.col("model_id").isNull(), "null_model_id")
        .when(~F.col("_joined_any"), "unmatched_model_id")
        .otherwise("filter_rejected"),
    )
    # deterministic first-wins dedup back to one row per exposure (ref
    # P1.145 step 3 — survival must not depend on physical parquet order);
    # all kept columns are window-rolled, so any row is value-identical,
    # but the total-order key keeps the PLAN deterministic cross-run
    rn = F.row_number().over(
        w.orderBy(
            F.col("mp_approach").asc_nulls_last(),
            F.col("mp_countries").asc_nulls_last(),
            F.col("mp_excl_books").asc_nulls_last(),
        )
    )
    return (
        j.withColumn("_rn", rn)
        .where(F.col("_rn") == 1)
        .drop(
            "_rn", "_joined", "_joined_any", "_airb", "_firb", "_slot", "_sa",
            "_sa_ppu", "mp_class", "mp_approach", "mp_countries", "mp_excl_books",
            "mp_ppu",
        )
    )


def permission_warnings(resolved: DataFrame) -> DataFrame:
    """CLS006 warnings: internally-rated exposures routed to SA, one row
    per failure cause with the affected count (ref permissions.py
    emit_model_permission_diagnostics)."""
    counts = (
        resolved.where(F.col("pd").isNotNull() & F.col("permission_diagnostic").isNotNull())
        .groupBy("permission_diagnostic")
        .agg(F.count("*").alias("n"))
    )
    return counts.select(
        F.lit("CLS006").alias("code"),
        F.lit("warning").alias("severity"),
        F.lit("classify").alias("stage"),
        F.col("permission_diagnostic").alias("key"),
        F.concat(
            F.col("n").cast("string"),
            F.lit(" internally-rated exposure(s) routed to SA: "),
            F.col("permission_diagnostic"),
            F.lit(" (CRR Art.143/148/150)"),
        ).alias("message"),
    )


def apply_model_permissions(
    exposures: DataFrame, model_permissions: DataFrame, pack: RulePack
) -> tuple[DataFrame, DataFrame]:
    """Route each classified exposure's approach from the permission
    registry (ref approach.py assign_approach steps 1-2 + 4).

    Overwrites ``has_irb_permission`` (the org-wide counterparty flag)
    with the model-level grant, clears LGD on F-IRB-routed rows (FIRB
    uses supervisory LGD), and withdraws slotting routing where the model
    registry grants none. Returns (exposures, CLS006 warnings frame).
    """
    exp = resolve_model_permissions(exposures, model_permissions)
    warnings = permission_warnings(exp)

    has_internal_rating = F.col("pd").isNotNull()
    has_modelled_lgd = F.col("lgd").isNotNull()
    airb = F.col("model_airb_permitted") & has_internal_rating & has_modelled_lgd
    firb = F.col("model_firb_permitted") & has_internal_rating

    # Basel 3.1 Art.147A restrictions (data-dependent; Feature-gated so CRR
    # runs are untouched — ref approach.py _apply_b31_approach_restrictions)
    if pack.scalars.get("b31_approach_restrictions") is not None and pack.scalar(
        "b31_approach_restrictions"
    ) >= 1.0:
        exp = _ensure(exp, "is_financial_sector_entity", "boolean")
        exp = _ensure(exp, "total_assets", "double")
        is_fse = F.coalesce("is_financial_sector_entity", F.lit(False))
        # Art.147(4C)(b)(ii): revenue at the highest level of consolidation
        # — roll the counterparty's own turnover up its resolved group
        group_revenue = F.max("annual_revenue").over(W.partitionBy("group_reference"))
        rev_thr = pack.lit("large_corporate_revenue_threshold")
        bs_thr = pack.lit("sme_balance_sheet_threshold")
        is_large_corp = (F.col("entity_type") == "corporate") & (
            F.when(group_revenue > 0, group_revenue > rev_thr)
            .when(F.col("total_assets").isNotNull(), F.col("total_assets") >= bs_thr)
            .otherwise(F.lit(True))  # unknown → conservatively large
        )
        no_airb = is_fse | is_large_corp | (F.col("exposure_class") == "institution")
        sa_only = F.col("entity_type").isin(*_SOVEREIGN_LIKE)
        airb = airb & ~no_airb & ~sa_only
        firb = firb & ~sa_only

    exp = (
        exp.withColumn("_airb_route", airb)
        .withColumn("_firb_route", firb & ~airb)
        .withColumn("has_irb_permission", airb | firb)
        # FIRB LGD clearing: supervisory LGD applies downstream (run_irb
        # coalesces a null LGD to the F-IRB supervisory value)
        .withColumn(
            "lgd",
            F.when(F.col("_firb_route"), F.lit(None).cast("double")).otherwise(
                F.col("lgd")
            ),
        )
        .withColumn(
            "irb_subapproach",
            F.when(F.col("_airb_route"), "airb")
            .when(F.col("_firb_route"), "firb")
            .otherwise(F.lit(None).cast("string")),
        )
        # slotting requires a registry grant once model permissions exist;
        # withdrawn → the row leaves the slotting branch and lands on SA
        .withColumn(
            "is_specialised",
            F.col("is_specialised") & F.coalesce("model_slotting_permitted", F.lit(False)),
        )
        .drop("_airb_route", "_firb_route")
    )
    return exp, warnings
