from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rwa_calculator_spark.contracts import ColumnSpec, conform, ensure_columns


def test_ensure_columns_injects_defaults_and_casts(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    specs = {
        "id": ColumnSpec(T.LongType(), required=True),
        "name": ColumnSpec(T.StringType()),
        "flag": ColumnSpec(T.BooleanType(), default=False),
        "amount": ColumnSpec(T.DoubleType()),
    }
    out = ensure_columns(df, specs)
    row = out.collect()[0]
    assert row.id == 1 and row.flag is False and row.amount is None
    assert dict(out.dtypes)["id"] == "bigint"


def test_ensure_columns_missing_required_raises(spark):
    df = spark.createDataFrame([("a",)], "name string")
    with pytest.raises(ValueError, match="missing required"):
        ensure_columns(df, {"id": ColumnSpec(T.LongType(), required=True)})


def test_conform_projects_contract_columns_only(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, name string, scratch double")
    specs = {"id": ColumnSpec(T.LongType()), "name": ColumnSpec(T.StringType())}
    out = conform(df, specs)
    assert out.columns == ["id", "name"]
