"""Vector similarity primitives over array<float> embedding columns.

Dot products are unrolled fixed-dimension left-associated expression chains
(dim is schema-known), generated for both Spark Columns and DuckDB SQL from
the same loop — bit-identical across engines, stays in WholeStageCodegen,
and never materialises a Python object per row. For very high dim swap the
chain for F.aggregate/zip_with (same semantics, log-free fold) or a Pandas
UDF; at 64-dim the unrolled form wins.

LSH hyperplanes are pseudo-random literals derived from md5 in *Python* at
plan-build time, so both engines see identical constants (the rulepack
compile-to-literals pattern, SURVEY §1.1).
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBED_DIM = 64


def spark_dot(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    terms = [a.getItem(i).cast("double") * b.getItem(i).cast("double") for i in range(dim)]
    return reduce(lambda x, y: x + y, terms)


def sql_dot(a: str, b: str, dim: int = EMBED_DIM) -> str:
    out = f"({a}[1]::DOUBLE * {b}[1]::DOUBLE)"
    for i in range(2, dim + 1):
        out = f"({out} + ({a}[{i}]::DOUBLE * {b}[{i}]::DOUBLE))"
    return out


def hyperplane(j: int, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane coefficients in [-1, 1]."""
    return [
        (int(hashlib.md5(f"h{j}:{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000) / 1000.0
        for i in range(dim)
    ]


def spark_projection(v: Column, coeffs: list[float]) -> Column:
    terms = [F.lit(c) * v.getItem(i).cast("double") for i, c in enumerate(coeffs)]
    return reduce(lambda x, y: x + y, terms)


def sql_projection(v: str, coeffs: list[float]) -> str:
    out = f"({coeffs[0]!r} * {v}[1]::DOUBLE)"
    for i, c in enumerate(coeffs[1:], start=2):
        out = f"({out} + ({c!r} * {v}[{i}]::DOUBLE))"
    return out


def spark_lsh_bucket(v: Column, n_planes: int, dim: int = EMBED_DIM) -> Column:
    bucket = None
    for j in range(n_planes):
        bit = F.when(spark_projection(v, hyperplane(j, dim)) > 0, F.lit(1 << j)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def sql_lsh_bucket(v: str, n_planes: int, dim: int = EMBED_DIM) -> str:
    bits = [
        f"(CASE WHEN {sql_projection(v, hyperplane(j, dim))} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    ]
    return "(" + " + ".join(bits) + ")::BIGINT"
