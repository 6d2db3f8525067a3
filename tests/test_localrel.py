"""local_literal_df: the VALUES-backed literal relation must be a true
LocalRelation (broadcast builds run driver-side, no job) and bit-identical
to the Column-API fallback path for every pack table."""

from __future__ import annotations

import math
import struct

from pyspark.sql.types import StructType

from rwa_calculator_spark.engine.rulepack import B31_PACK, CRR_PACK, _to_py
from rwa_calculator_spark.operators.localrel import (
    _column_literal_df,
    local_literal_df,
)


def _canon(rows):
    out = []
    for r in rows:
        cells = []
        for v in r:
            if isinstance(v, float):
                cells.append("nan" if math.isnan(v) else struct.pack(">d", v).hex())
            else:
                cells.append(repr(v))
        out.append(tuple(cells))
    return sorted(out)


def test_every_pack_table_bit_identical_to_column_path(spark):
    for pack in (CRR_PACK, B31_PACK):
        for name, (schema, rows) in pack.tables.items():
            pyrows = [tuple(_to_py(v) for v in r) for r in rows]
            st = StructType.fromDDL(schema)
            got = local_literal_df(spark, schema, pyrows)
            ref = _column_literal_df(spark, st, pyrows)
            assert got.schema == ref.schema, f"{pack.regime}.{name}: schema"
            assert _canon(got.collect()) == _canon(ref.collect()), (
                f"{pack.regime}.{name}: values differ between VALUES and Column paths"
            )


def test_literal_df_is_local_relation(spark):
    df = local_literal_df(
        spark,
        "bucket string, cqs int, rw double, flag boolean",
        [("AAA", 1, 0.2, True), ("B'B", None, 1.5e-17, False)],
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.startswith("LocalRelation"), opt
    # collect of a LocalRelation is driver-side: no Spark job scheduled
    tracker = spark.sparkContext.statusTracker()
    before = max(tracker.getJobIdsForGroup(None) or [-1])
    rows = df.collect()
    after = max(tracker.getJobIdsForGroup(None) or [-1])
    assert after == before, "LocalRelation collect scheduled a job"
    assert rows[1].cqs is None and rows[1].bucket == "B'B"


def test_fallbacks_keep_working(spark):
    # non-finite float -> Column fallback; >MAX rows -> createDataFrame
    df = local_literal_df(spark, "x double", [(float("nan"),), (1.0,)])
    vals = [r.x for r in df.collect()]
    assert math.isnan(vals[0]) and vals[1] == 1.0
    df2 = local_literal_df(spark, "x string", [("a\\b",)])
    assert df2.collect()[0].x == "a\\b"


def test_float_to_decimal_falls_back_to_column_path(spark):
    # The SQL renderer's float guarantee is double/float-only: a float
    # targeting e.g. decimal(p,s) must route through the Column fallback
    # so both entry points agree by construction.
    df = local_literal_df(spark, "x decimal(3,2)", [(2.675,)])
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert not opt.startswith("LocalRelation"), "expected Column fallback"
    ref = _column_literal_df(
        spark, StructType.fromDDL("x decimal(3,2)"), [(2.675,)]
    )
    assert df.collect()[0].x == ref.collect()[0].x


def test_backtick_in_column_name(spark):
    st = StructType.fromDDL("`a``b` int")
    df = local_literal_df(spark, st, [(1,), (2,)])
    assert df.columns == ["a`b"]
    assert sorted(r["a`b"] for r in df.collect()) == [1, 2]
