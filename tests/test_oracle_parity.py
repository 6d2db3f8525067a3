"""Every registered query with an oracle must match DuckDB bit-for-bit at
sf0.001 — the local mirror of the driver's CORRECTNESS gate (run at sf0.01
by the driver; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to mirror
exactly)."""

from __future__ import annotations

import pytest

from rwa_calculator_spark.plans import load_all
from tests.util_compare import assert_frames_match

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name, tolerant="tolerant" in spec.tags)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
