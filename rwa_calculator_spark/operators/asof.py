"""As-of joins — an operator Spark lacks natively (pyspark guide: bucketize
or merge_asof per group; DuckDB has native ASOF JOIN, which oracles it).

Two implementations with identical semantics:

- `asof_join_window` (the 100 TB path): union probe+build rows, one window
  pass per user ordered by event time carrying the last build-side value
  forward (last ignorenulls). One shuffle on the partition key, no
  per-group Python.
- `asof_join_pandas`: groupBy(key).applyInPandas with pd.merge_asof — the
  guide's fallback shape, Arrow-batched; used to cross-check and for logic
  too awkward to window.

Ordering is directly on the event-time column, so both TIMESTAMP and
TIMESTAMP_NTZ inputs work unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_window(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = (),
) -> DataFrame:
    """For each probe row, attach the most recent build row (per key) with
    build.ts ≤ probe.ts. Returns probe columns + asof_ts (+ asof_<value>)."""
    p = probe.withColumn("_side", F.lit(1))
    b = build.select(
        key, ts, *[F.col(c).alias(f"_bv_{c}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    u = p.unionByName(b, allowMissingColumns=True)
    # build rows sort before probe rows at identical timestamps (_side asc)
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    build_ts = F.when(F.col("_side") == 0, F.col(ts))
    out = u.withColumn("asof_ts", F.last(build_ts, ignorenulls=True).over(w))
    for c in value_cols:
        out = out.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(f"_bv_{c}")), ignorenulls=True).over(w),
        )
    return out.where(F.col("_side") == 1).drop("_side", *[f"_bv_{c}" for c in value_cols])


def asof_join_pandas(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Same semantics via per-group pd.merge_asof (Arrow-batched)."""
    from rwa_calculator_spark.utils import ensure_workers_can_import

    ensure_workers_can_import(probe.sparkSession)
    p = probe.select(key, ts).withColumn("_side", F.lit(1))
    b = build.select(key, ts, *value_cols).withColumn("_side", F.lit(0))
    u = p.unionByName(b, allowMissingColumns=True)
    out_schema = f"{key} long, {ts} timestamp, asof_ts timestamp" + "".join(
        f", asof_{c} double" for c in value_cols
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        probe_pdf = pdf[pdf["_side"] == 1].sort_values(ts)
        build_pdf = pdf[pdf["_side"] == 0].sort_values(ts)
        build_pdf = build_pdf.rename(
            columns={ts: "asof_ts", **{c: f"asof_{c}" for c in value_cols}}
        )
        merged = pd.merge_asof(
            probe_pdf[[key, ts]],
            build_pdf[["asof_ts", *[f"asof_{c}" for c in value_cols]]],
            left_on=ts,
            right_on="asof_ts",
            direction="backward",
        )
        return merged

    return u.groupBy(key).applyInPandas(per_group, schema=out_schema)
