"""Vector similarity primitives over array<float> embedding columns.

Dot products are zip_with/aggregate folds seeded with the first product —
the exact left-associated addition order of the DuckDB oracle's unrolled
chain (bit-identical, verified over every corpus pair at all SFs), in a
4-node expression instead of a 255-node tree. The round-9 optimization
profile measured the unrolled chain at ~2× the fold's cost at 64-dim
(255 virtual expression evals per row vs one tight loop) and the giant
trees also bloated plan/codegen size in every similarity query.

LSH hyperplanes are pseudo-random literals derived from md5 in *Python* at
plan-build time, so both engines see identical constants (the rulepack
compile-to-literals pattern, SURVEY §1.1).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBED_DIM = 64


def spark_dot(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    """Left-associated dot product as a zip_with/aggregate fold.

    Bit-identical to the unrolled chain ``(a0·b0 + a1·b1) + …`` (the fold
    is seeded with the FIRST product, so the addition order is exactly the
    chain's — verified exhaustively over every corpus pair at all three
    SFs), but ~2× faster at 64-dim and a 4-node expression instead of a
    255-node tree: the unrolled form pays one virtual getItem/cast eval
    per term in the row-oriented evaluator, while the fold runs a tight
    loop over the zipped array (guide §1.2 per-task work)."""
    z = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(F.slice(z, 2, dim - 1), F.element_at(z, 1), lambda acc, x: acc + x)


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
    """Same fold rewrite as spark_dot (coeffs become an array literal);
    seeded with the first product so addition order matches the unrolled
    chain bit-for-bit."""
    z = F.zip_with(
        F.array(*[F.lit(c) for c in coeffs]), v, lambda c, x: c * x.cast("double")
    )
    return F.aggregate(
        F.slice(z, 2, len(coeffs) - 1), F.element_at(z, 1), lambda acc, x: acc + x
    )


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
