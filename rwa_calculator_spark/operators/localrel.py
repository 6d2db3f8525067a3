"""Literal dimension frames that never touch the Python worker pool.

``spark.createDataFrame(rows, schema)`` ships tiny lookup tables through
``sc.parallelize`` — a ParallelCollectionRDD sliced to the default
parallelism whose evaluation is a PythonRDD. On a 32-core local session a
20-row pack table therefore executes as 32 tasks, each paying a Python
worker round-trip, and every broadcast build of such a dim re-runs them.
The bench profile showed six pack-table broadcasts burning ~40 s of task
time at ~0 CPU on exactly this (stages 43-48, round-9 note).

``local_literal_df`` instead compiles the rows into the plan itself:
``range(1) -> inline(array(struct(lit(...), ...)))`` — a pure-JVM,
single-partition generator Catalyst can constant-fold and broadcast
without ever consulting Python. This is also the honest cluster shape for
regime-as-data tables: the values are plan literals, exactly like the
scalar ``pack.lit`` path, not distributed data.

Guard rails: tuples-only rows and a row cap — anything bigger or richer
falls back to ``createDataFrame`` (expression-tree size is driver-side
cost, and large data should be data, not plan).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Dimension-sized tables only: beyond this the expression tree stops being
# "a few literals" and plan build/optimize time outweighs the worker wins.
MAX_LITERAL_ROWS = 1024


def local_literal_df(
    spark: SparkSession, schema: str | StructType, rows: Iterable[Sequence]
) -> DataFrame:
    """A small lookup table as a JVM-side literal relation (no PythonRDD)."""
    rows = [tuple(r) for r in rows]
    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    if not rows or len(rows) > MAX_LITERAL_ROWS:
        return spark.createDataFrame(rows, schema)
    structs = [
        F.struct(
            *[F.lit(v).cast(f.dataType).alias(f.name) for v, f in zip(r, st.fields)]
        )
        for r in rows
    ]
    # numPartitions=1: spark.range defaults to default.parallelism splits,
    # so every broadcast build of a literal dim would launch N-1 empty
    # tasks (32-task ghost stages in the round-9 profile) — a literal
    # relation is one partition by construction
    return spark.range(0, 1, numPartitions=1).select(F.inline(F.array(*structs)))
