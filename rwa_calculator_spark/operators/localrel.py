"""Literal dimension frames that never touch the Python worker pool.

``spark.createDataFrame(rows, schema)`` ships tiny lookup tables through
``sc.parallelize`` — a ParallelCollectionRDD sliced to the default
parallelism whose evaluation is a PythonRDD. On a 32-core local session a
20-row pack table therefore executes as 32 tasks, each paying a Python
worker round-trip, and every broadcast build of such a dim re-runs them.
The bench profile showed six pack-table broadcasts burning ~40 s of task
time at ~0 CPU on exactly this (stages 43-48, round-9 note).

``local_literal_df`` instead compiles the rows into the plan itself as a
foldable SQL ``VALUES`` table — a true ``LocalRelation`` Catalyst can
constant-fold, fold filters into, and broadcast WITHOUT scheduling a job
(``LocalTableScan.executeCollect`` is driver-side). This is also the
honest cluster shape for regime-as-data tables: the values are plan
literals, exactly like the scalar ``pack.lit`` path, not distributed
data.

Guard rails: tuples-only rows and a row cap — anything bigger or richer
falls back to ``createDataFrame`` (expression-tree size is driver-side
cost, and large data should be data, not plan).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Dimension-sized tables only: beyond this the expression tree stops being
# "a few literals" and plan build/optimize time outweighs the worker wins.
MAX_LITERAL_ROWS = 1024


def _sql_literal(v) -> str | None:
    """Render one Python value as a SQL literal whose parse is bit-identical
    to ``F.lit(v)`` after the column cast. None = not renderable (caller
    falls back to the Column path)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if not math.isfinite(v):
            return None
        # repr round-trips binary64; the decimal parse keeps every digit and
        # the cast to DOUBLE rounds back to the identical bits
        return repr(v)
    if isinstance(v, str):
        if "\\" in v or "\0" in v:
            return None  # escape-sequence semantics differ; fall back
        return "'" + v.replace("'", "''") + "'"
    return None


def local_literal_df(
    spark: SparkSession, schema: str | StructType, rows: Iterable[Sequence]
) -> DataFrame:
    """A small lookup table as a JVM-side literal relation (no PythonRDD)."""
    rows = [tuple(r) for r in rows]
    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    if not rows or len(rows) > MAX_LITERAL_ROWS:
        return spark.createDataFrame(rows, schema)
    # Compile the whole relation into ONE SQL string: a row-by-row Column
    # build costs hundreds of py4j round-trips per table (lit + cast +
    # alias per value), which the round-9 build profile showed as ~0.3 s
    # per pack table of pure driver chatter. A foldable VALUES table is one
    # gateway call AND resolves to a true LocalRelation — unlike the
    # earlier range(1)->inline(array(named_struct(...))) shape, whose
    # Generate node is not a LocalRelation, so every broadcast build of it
    # scheduled a real 1-task job. LocalTableScan.executeCollect is
    # driver-side: broadcasting a pack dim launches NO job at all, and
    # ConvertToLocalRelation folds pack-table filters at optimize time.
    # CAST(<literal> AS <type>) parses bit-identically in both shapes
    # (exactness audit in tests/test_localrel.py).
    types = [f.dataType.simpleString() for f in st.fields]
    names = [f.name for f in st.fields]
    tuples = []
    for r in rows:
        cells = []
        for v, t in zip(r, types):
            s = _sql_literal(v)
            # The float rendering is bit-identical only when the target is a
            # floating-point column: for e.g. decimal(p,s), CAST('2.675')
            # rounds the exact decimal text while F.lit rounds the binary
            # double — different paths, different digits. Fall back.
            if s is None or (isinstance(v, float) and t not in ("double", "float")):
                return _column_literal_df(spark, st, rows)
            cells.append(f"CAST({s} AS {t})")
        tuples.append(f"({', '.join(cells)})")
    cols = ", ".join("`{}`".format(n.replace("`", "``")) for n in names)
    return spark.sql(
        f"SELECT * FROM (VALUES {', '.join(tuples)}) AS _litrel({cols})"
    )


def _column_literal_df(spark: SparkSession, st: StructType, rows) -> DataFrame:
    """Column-API fallback for values the SQL renderer refuses."""
    structs = [
        F.struct(
            *[F.lit(v).cast(f.dataType).alias(f.name) for v, f in zip(r, st.fields)]
        )
        for r in rows
    ]
    return spark.range(0, 1, numPartitions=1).select(F.inline(F.array(*structs)))
