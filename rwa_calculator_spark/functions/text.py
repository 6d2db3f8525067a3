"""Text primitives shared by the LLM-pipeline operators, with exact DuckDB
mirrors (every helper has a sql_* twin emitting identical semantics).

The cross-engine hash primitive is the first 8 hex chars of md5 parsed as a
32-bit integer — both engines produce identical values, unlike their
built-in hash() functions (murmur3 vs duckdb-hash). 32 bits keeps the parse
inside BIGINT range on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash32(col: Column) -> Column:
    """Deterministic 32-bit hash of a string column, identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def sql_hash32(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def seeded_hash32(seed: int, col: Column) -> Column:
    return hash32(F.concat(F.lit(f"s{seed}:"), col))


def sql_seeded_hash32(seed: int, expr: str) -> str:
    return sql_hash32(f"'s{seed}:' || {expr}")


def words(col: Column) -> Column:
    """Whitespace tokenisation (documents.text is single-space separated)."""
    return F.split(col, " ")


SQL_WORDS = "string_split({expr}, ' ')"


def sql_words(expr: str) -> str:
    return SQL_WORDS.format(expr=expr)
