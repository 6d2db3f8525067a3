"""RWA flow-statement attribution (Pillar 3 CR8; ref
reporting/pillar3/cr8.py:140 generate_cr8 + PRA PS1/26 Annex XXII §11).

The reference's CR8 takes the current-period IRB ledger and an EXTERNAL
prior-period frame (a previously saved run output) and reports:

- row 1 opening RWEA  = the prior period's sum (null with no prior frame),
- row 9 closing RWEA  = the current period's sum,
- row 8 Other         = the signed residual closing − opening,
- rows 2-7 per-driver flow components — which the reference leaves NULL
  because "they need exposure-level period-over-period lineage two
  point-in-time snapshots cannot provide" (cr8.py:22-24).

This module supplies exactly that lineage when the prior frame IS at
exposure grain: a full outer join on the exposure key (the reference's
two-run reconciliation shape, analysis/reconciliation.py:184) buckets every
row as matched / current-only / prior-only:

- row 2 asset size   = Σ RWA of current-only rows − Σ prior RWA of
  prior-only rows (net new business minus disposals/maturities),
- row 4 model updates = Σ (RWA_now − RWA_prior) over matched rows whose
  ``model_id`` CHANGED between the runs — the whole delta is attributed to
  the model migration (PS1/26 Annex XXII: "changes to the model scope or
  rating system"); needs the ``model_id`` carrier on BOTH frames,
- row 7 FX movements = over matched same-model rows carrying an
  ``fx_rate`` carrier (the exposure-currency → reporting-currency
  translation rate), the rate-change component of the exact two-factor
  split RWA = RWA_local × fx:
      Δ = L_c·f_c − L_p·f_p = L_c·(f_c − f_p)  +  f_p·(L_c − L_p)
            [row 7: FX at current local book]   [row 3: drift at prior rate]
  so rows 3 + 4 + 7 partition the matched-row delta with NO hidden
  residual (up to per-row fixed-point rounding),
- row 3 asset quality = the remaining matched-row drift (the full delta
  when no model/FX carriers are present — the round-4 behaviour),
- row 8 other        = ((closing − opening) − Σ rows 2,3,4,7) — exactly
  0.0 up to fixed-point rounding, by construction.

Rows 5-6 (methodology, acquisitions) remain honestly null: the ledger
carries no rulebook-version or entity-perimeter carriers.

Scale posture: one equi-join on the exposure key (shuffle both sides by the
key — the natural partitioning for any two-run diff at 100 TB) followed by a
single fixed-point aggregation; the 9-row template is built driver-side from
the 1-row aggregate, never from exposure rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum

#: (row_ref, flow_driver) in PS1/26 Annex XXII CR8 order.
CR8_ROWS = (
    ("1", "opening_rwea"),
    ("2", "asset_size"),
    ("3", "asset_quality"),
    ("4", "model_updates"),
    ("5", "methodology"),
    ("6", "acquisitions_disposals"),
    ("7", "fx_movements"),
    ("8", "other"),
    ("9", "closing_rwea"),
)

_ALWAYS_NULL = {"5", "6"}


def rwa_flow_statement(
    current: DataFrame,
    prior: DataFrame,
    key_col: str = "exposure_reference",
    rwa_col: str = "rwa",
    model_col: str = "model_id",
    fx_col: str = "fx_rate",
) -> DataFrame:
    """CR8 flow statement from two exposure-grain ledgers.

    `current` and `prior` each need (key_col, rwa_col). When BOTH frames
    also carry `model_col`, matched rows whose model changed attribute
    their whole delta to row 4; when BOTH carry `fx_col`, the remaining
    matched rows split their delta exactly between row 7 (rate change at
    the current local book) and row 3 (local drift at the prior rate).
    Returns the 9-row (row_ref, flow_driver, rwea) frame; a driver row
    whose carriers are absent is null, never zero.
    """
    has_model = model_col in current.columns and model_col in prior.columns
    has_fx = fx_col in current.columns and fx_col in prior.columns

    cur_cols = [F.col(key_col).alias("_k"), F.col(rwa_col).alias("_rwa_cur")]
    pri_cols = [F.col(key_col).alias("_pk"), F.col(rwa_col).alias("_rwa_pri")]
    if has_model:
        cur_cols.append(F.col(model_col).alias("_m_cur"))
        pri_cols.append(F.col(model_col).alias("_m_pri"))
    if has_fx:
        cur_cols.append(F.col(fx_col).alias("_fx_cur"))
        pri_cols.append(F.col(fx_col).alias("_fx_pri"))
    joined = current.select(*cur_cols).join(
        prior.select(*pri_cols), F.col("_k") == F.col("_pk"), "full"
    )

    matched = F.col("_k").isNotNull() & F.col("_pk").isNotNull()
    cur_only = F.col("_pk").isNull()
    pri_only = F.col("_k").isNull()
    delta = F.col("_rwa_cur") - F.col("_rwa_pri")
    # null-safe "the model changed" — a null-to-value migration counts
    model_changed = (
        matched & ~F.col("_m_cur").eqNullSafe(F.col("_m_pri"))
        if has_model
        else F.lit(False)
    )
    # FX split on matched same-model rows with BOTH rates present & usable
    fx_usable = (
        matched
        & ~model_changed
        & F.col("_fx_cur").isNotNull()
        & F.col("_fx_pri").isNotNull()
        & (F.col("_fx_cur") != 0.0)
        if has_fx
        else F.lit(False)
    )
    # RWA = L·fx  ⇒  Δ = L_c·(f_c − f_p) + f_p·(L_c − L_p), where
    # L_c = _rwa_cur / _fx_cur (the current local-currency book). Guarded
    # behind has_fx: a column reference inside an even-constant-false when()
    # still must RESOLVE, so carrier-less frames need literal zeros here.
    if has_fx:
        fx_component = (F.col("_rwa_cur") / F.col("_fx_cur")) * (
            F.col("_fx_cur") - F.col("_fx_pri")
        )
        quality_fx = (F.col("_rwa_cur") / F.col("_fx_cur")) * F.col(
            "_fx_pri"
        ) - F.col("_rwa_pri")
    else:
        fx_component = F.lit(0.0)
        quality_fx = F.lit(0.0)

    agg = joined.agg(
        scaled_sum(F.coalesce("_rwa_cur", F.lit(0.0)), 2).alias("closing"),
        scaled_sum(F.coalesce("_rwa_pri", F.lit(0.0)), 2).alias("opening"),
        (
            scaled_sum(F.when(cur_only, F.col("_rwa_cur")).otherwise(0.0), 2)
            - scaled_sum(F.when(pri_only, F.col("_rwa_pri")).otherwise(0.0), 2)
        ).alias("asset_size"),
        scaled_sum(F.when(model_changed, delta).otherwise(0.0), 2).alias(
            "model_updates"
        ),
        scaled_sum(F.when(fx_usable, fx_component).otherwise(0.0), 2).alias("fx"),
        scaled_sum(
            F.when(fx_usable, quality_fx)
            .when(matched & ~model_changed, delta)
            .otherwise(0.0),
            2,
        ).alias("asset_quality"),
        # grain guard: a duplicate key fans out through the full join and
        # silently double-counts the matched-row drift — refuse it
        F.count("_k").alias("_n_cur"),
        F.countDistinct("_k").alias("_n_cur_d"),
        F.count("_pk").alias("_n_pri"),
        F.countDistinct("_pk").alias("_n_pri_d"),
    )
    s = agg.collect()[0]  # 1 row by construction — driver-sized by design
    if s._n_cur != s._n_cur_d or s._n_pri != s._n_pri_d:
        raise ValueError(
            "rwa_flow_statement needs exposure-grain ledgers: duplicate "
            f"{key_col} rows would double-count through the full join "
            f"(current {s._n_cur} rows / {s._n_cur_d} keys, "
            f"prior {s._n_pri} rows / {s._n_pri_d} keys)"
        )
    # an empty side sums to NULL — an empty book's flow is zero, not a crash
    closing = s.closing or 0.0
    opening = s.opening or 0.0
    asset_size = s.asset_size if s.asset_size is not None else 0.0
    asset_quality = s.asset_quality or 0.0
    model_updates = s.model_updates or 0.0
    fx = s.fx or 0.0
    other = (
        (((closing - opening) - asset_size) - asset_quality) - model_updates
    ) - fx
    values: dict[str, float | None] = {
        "1": opening,
        "2": asset_size,
        "3": asset_quality,
        # a carrier-less driver reports null, never a masked 0.0
        "4": model_updates if has_model else None,
        "7": fx if has_fx else None,
        "8": other,
        "9": closing,
    }
    rows = [
        (ref, driver, None if ref in _ALWAYS_NULL else values.get(ref))
        for ref, driver in CR8_ROWS
    ]
    return current.sparkSession.createDataFrame(
        rows, "row_ref string, flow_driver string, rwea double"
    )
