"""Skew-handling primitives (SURVEY §7.1 '100 TB posture').

AQE's skew-join handling (on in session.py) covers sort-merge joins; these
helpers cover the two cases AQE doesn't: skewed *aggregations* and skewed
broadcast-probe joins where one hot key floods a single task.

`salted_sum`: two-phase aggregation — salt the group key with N shards,
partially aggregate per (key, salt), then aggregate the partials. The
fixed-point discipline (functions/exact.py) makes the two-phase result
bit-identical to the one-phase one, so salting is a pure physical rewrite.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    out: str,
    scale: int = 2,
    n_salts: int = 16,
) -> DataFrame:
    """Σ value per keys, two-phase via a synthetic salt: phase 1 sums scaled
    longs per (keys, salt) — spreading a hot key over n_salts tasks —
    phase 2 sums the exact partials. Integer partials ⇒ result is identical
    to the unsalted sum regardless of shard assignment."""
    m = float(10**scale)
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.sum(F.round(value * F.lit(m), 0).cast("long")).alias("_partial")
    )
    return phase1.groupBy(*keys).agg((F.sum("_partial") / F.lit(m)).alias(out))


def explode_salt_join(
    facts: DataFrame, dim: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skewed equi-join: replicate the dim side n_salts× (explode) and salt
    the fact side, so a hot key's probes spread across n_salts partitions.
    Classic salting — use when the dim is too big to broadcast but a few
    fact keys are hot."""
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_facts = facts.withColumn(
        "_salt", (F.rand(seed=11) * n_salts).cast("int")
    )
    out = salted_facts.join(salted_dim, on=[key, "_salt"], how="left")
    return out.drop("_salt")
