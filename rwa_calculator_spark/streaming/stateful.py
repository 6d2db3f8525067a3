"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.12 / pyspark guide: the escape hatch for operators Spark's
built-in windows can't express).

`running_user_totals` maintains per-user running (count, sum, max-value)
state across micro-batches — the minimal shape of a feature-store /
per-entity accumulator. State is explicit and watermark-bounded in a real
deployment; GroupStateTimeout handles eviction.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _update(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running aggregates with explicit state (update mode)."""
    from rwa_calculator_spark.utils import ensure_workers_can_import

    ensure_workers_can_import(events.sparkSession)
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
