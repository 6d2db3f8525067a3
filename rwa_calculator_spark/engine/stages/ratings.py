"""Rating resolution: external CQS via the CRR Art.138 second-best rule,
internal PD with ultimate-parent inheritance (ref
engine/stages/hierarchy/ratings.py:32-215 build_rating_inheritance_lazy).

Semantics (CRR Art.135/136/138, Art.171(1)/175(3)):
- short-term assessments are issue-specific and excluded from the
  counterparty-level aggregate;
- repeated assessments from one agency reduce to the most recent first;
- across agencies: 1 assessment -> use it; >=2 -> use the second-best CQS
  (the higher-RW side of the two lowest; CQS ranking == RW ranking because
  the CQS->RW map is monotone within each SA class);
- internal ratings (PD) inherit from the ultimate parent when the entity
  has none of its own; external ratings NEVER inherit.

Scale posture: ratings tables are per-counterparty dimensions — orders of
magnitude smaller than facts. Both resolution passes are two windowed
row_numbers over (counterparty[, agency]), one shuffle each on the
counterparty key; the result joins the counterparty dim (broadcast-sized)
before the single fact enrich join in run_hierarchy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def resolve_external_cqs(ratings: DataFrame) -> DataFrame:
    """Art.138-resolved external CQS per counterparty.

    ratings columns: counterparty_reference, rating_type, is_short_term,
    rating_agency, rating_date, rating_reference, cqs.
    Returns (counterparty_reference, external_cqs).
    """
    ext = ratings.where(
        (~F.coalesce("is_short_term", F.lit(False)))
        & (F.col("rating_type") == "external")
        & F.col("cqs").isNotNull()
        & F.col("counterparty_reference").isNotNull()
    )
    # per-agency dedup to the most recent assessment (deterministic
    # tiebreak on rating_reference so both engines agree on same-day rows)
    w_latest = W.partitionBy("counterparty_reference", "rating_agency").orderBy(
        F.col("rating_date").desc(), F.col("rating_reference").desc()
    )
    latest = (
        ext.withColumn("_rn", F.row_number().over(w_latest))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # rank CQS ascending (best first); agency tiebreak keeps the ordinal
    # rank deterministic cross-engine
    w_rank = W.partitionBy("counterparty_reference").orderBy(
        F.col("cqs").asc(), F.col("rating_agency").asc()
    )
    w_cp = W.partitionBy("counterparty_reference")
    ranked = latest.withColumn("_rank", F.row_number().over(w_rank)).withColumn(
        "_n", F.count("*").over(w_cp)
    )
    picked = ranked.where(
        ((F.col("_n") == 1) & (F.col("_rank") == 1))
        | ((F.col("_n") >= 2) & (F.col("_rank") == 2))
    )
    return picked.select(
        "counterparty_reference",
        F.col("cqs").cast("int").alias("external_cqs"),
        # the agency behind the Art.138 pick — the ledger's
        # sa_rating_source audit carrier (ref schemas.py:3025)
        F.col("rating_agency").alias("external_rating_agency"),
    )


def resolve_internal_pd(ratings: DataFrame, ultimate_parents: DataFrame | None) -> DataFrame:
    """Best (most recent) internal PD per counterparty, inherited from the
    ultimate parent when the entity has no own internal rating
    (CRR Art.171(1)/175(3); external ratings are NOT inherited).

    ultimate_parents: (counterparty_reference, group_reference) or None.
    Returns (counterparty_reference, internal_pd).
    """
    internal = ratings.where(
        (~F.coalesce("is_short_term", F.lit(False)))
        & (F.col("rating_type") == "internal")
        & F.col("pd").isNotNull()
        & F.col("counterparty_reference").isNotNull()
    )
    if "model_id" not in internal.columns:
        internal = internal.withColumn("model_id", F.lit(None).cast("string"))
    w_latest = W.partitionBy("counterparty_reference").orderBy(
        F.col("rating_date").desc(), F.col("rating_reference").desc()
    )
    own = (
        internal.withColumn("_rn", F.row_number().over(w_latest))
        .where(F.col("_rn") == 1)
        # model_id travels WITH the winning rating (ref permissions.py:
        # "model_id originates on internal ratings and is propagated by
        # the rating inheritance pipeline")
        .select("counterparty_reference", F.col("pd").alias("internal_pd"), "model_id")
    )
    if ultimate_parents is None:
        return own

    parent_pd = own.select(
        F.col("counterparty_reference").alias("_p_ref"),
        F.col("internal_pd").alias("parent_internal_pd"),
        F.col("model_id").alias("parent_model_id"),
    )
    with_parent = (
        ultimate_parents.select("counterparty_reference", "group_reference")
        .join(own, "counterparty_reference", "left")
        .join(parent_pd, F.col("group_reference") == F.col("_p_ref"), "left")
    )
    return with_parent.select(
        "counterparty_reference",
        F.coalesce("internal_pd", "parent_internal_pd").alias("internal_pd"),
        # the model inherits with the PD: an exposure rated only via its
        # parent's model resolves that model's permission row
        F.when(F.col("internal_pd").isNotNull(), F.col("model_id"))
        .otherwise(F.col("parent_model_id"))
        .alias("model_id"),
    ).where(F.col("internal_pd").isNotNull())
