"""Order-insensitive result comparison mirroring the driver's oracle check
(row-count + schema + value-hash on name-sorted columns).

Strict by default: cells must match bit-for-bit (floats compared via hex).
The engine is deliberately built so this holds cross-engine — see
functions/exact.py. Tolerant mode exists for queries tagged 'tolerant'
(libm-dependent paths like exp/ln) and compares floats to 1e-9.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pandas as pd


def _canon_cell(v: Any) -> Any:
    if v is None:
        return "∅"
    if isinstance(v, (np.floating, float)):
        if math.isnan(v):
            return "∅"
        return float(v).hex()
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"i{int(v)}"
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(out, key=repr)


def _tolerant_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False, name=None):
        rows.append(
            tuple(
                round(float(v), 6)
                if isinstance(v, (np.floating, float)) and not math.isnan(v)
                else _canon_cell(v)
                for v in row
            )
        )
    return sorted(rows, key=repr)


def assert_frames_match(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str, tolerant: bool = False
) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = canonical(spark_pdf), canonical(duck_pdf)
    if a == b:
        return
    if tolerant:
        ta, tb = _tolerant_rows(spark_pdf), _tolerant_rows(duck_pdf)
        if ta == tb:
            return
        a, b = ta, tb
    diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
    raise AssertionError(
        f"{name}: value mismatch ({len(diffs)}+ differing rows shown)\n"
        + "\n".join(f"  spark={x}\n  duck ={y}" for x, y in diffs)
    )
