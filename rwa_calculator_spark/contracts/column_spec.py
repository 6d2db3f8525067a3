"""Schema contract shim.

Re-expresses the reference's `ColumnSpec(dtype, default, required)` +
`ensure_columns` + edge-`conform` machinery (reference:
data/column_spec.py:33-126, contracts/edges.py) on Spark DataFrames:

- missing optional columns are injected as typed literals (defaults),
- present columns are cast to the declared type,
- `conform` projects to exactly the contract's columns (dropping scratch),
  which in Spark doubles as column pruning for everything upstream.

All of this is pure `select`/`withColumn` — Catalyst folds the literals, so
a contract costs nothing at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class ColumnSpec:
    dtype: T.DataType
    default: Any = None
    required: bool = False


def ensure_columns(df: DataFrame, specs: Mapping[str, ColumnSpec]) -> DataFrame:
    """Cast present columns; inject absent optional columns with their typed
    default; raise on absent required columns (reference
    data/column_spec.py:51-67 semantics)."""
    present = set(df.columns)
    missing_required = [c for c, s in specs.items() if s.required and c not in present]
    if missing_required:
        raise ValueError(f"missing required columns: {missing_required}")
    cols = []
    for name, spec in specs.items():
        if name in present:
            cols.append(F.col(name).cast(spec.dtype).alias(name))
        else:
            cols.append(F.lit(spec.default).cast(spec.dtype).alias(name))
    passthrough = [c for c in df.columns if c not in specs]
    return df.select(*cols, *passthrough)


def conform(df: DataFrame, specs: Mapping[str, ColumnSpec]) -> DataFrame:
    """Seal a stage edge: ensure + project to exactly the contract columns
    in contract order (reference contracts/edges.py `EdgeContract.conform`)."""
    return ensure_columns(df, specs).select(*specs.keys())
