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
row as matched / current-only / prior-only, so rows 2 (asset size) and 3
(asset quality) become computable and row 8 shrinks to the genuine residual:

- asset size     = Σ RWA of current-only rows − Σ prior RWA of prior-only
  rows (net new business minus disposals/maturities),
- asset quality  = Σ (RWA_now − RWA_prior) over matched rows (parameter
  drift on the surviving book),
- other          = ((closing − opening) − asset_size) − asset_quality —
  exactly 0.0 up to fixed-point rounding, by construction.

Rows 4-7 (model updates, methodology, acquisitions, FX) remain honestly
null: the ledger carries no model-version or FX-decomposition carriers yet.

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

_COMPUTED = {"1", "2", "3", "8", "9"}


def rwa_flow_statement(
    current: DataFrame,
    prior: DataFrame,
    key_col: str = "exposure_reference",
    rwa_col: str = "rwa",
) -> DataFrame:
    """CR8 flow statement from two exposure-grain ledgers.

    `current` and `prior` each need (key_col, rwa_col). Returns the 9-row
    (row_ref, flow_driver, rwea) frame; rows 4-7 are null.
    """
    cur = current.select(
        F.col(key_col).alias("_k"), F.col(rwa_col).alias("_rwa_cur")
    )
    pri = prior.select(F.col(key_col).alias("_pk"), F.col(rwa_col).alias("_rwa_pri"))
    joined = cur.join(pri, cur._k == pri._pk, "full")
    matched = F.col("_k").isNotNull() & F.col("_pk").isNotNull()
    cur_only = F.col("_pk").isNull()
    pri_only = F.col("_k").isNull()
    agg = joined.agg(
        scaled_sum(F.coalesce("_rwa_cur", F.lit(0.0)), 2).alias("closing"),
        scaled_sum(F.coalesce("_rwa_pri", F.lit(0.0)), 2).alias("opening"),
        (
            scaled_sum(F.when(cur_only, F.col("_rwa_cur")).otherwise(0.0), 2)
            - scaled_sum(F.when(pri_only, F.col("_rwa_pri")).otherwise(0.0), 2)
        ).alias("asset_size"),
        scaled_sum(
            F.when(matched, F.col("_rwa_cur") - F.col("_rwa_pri")).otherwise(0.0), 2
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
    other = ((closing - opening) - asset_size) - asset_quality
    values = {
        "1": opening,
        "2": asset_size,
        "3": asset_quality,
        "8": other,
        "9": closing,
    }
    rows = [
        (ref, driver, float(values[ref]) if ref in _COMPUTED else None)
        for ref, driver in CR8_ROWS
    ]
    return current.sparkSession.createDataFrame(
        rows, "row_ref string, flow_driver string, rwea double"
    )
