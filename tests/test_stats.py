"""Validate normal_cdf/normal_ppf without scipy: stdlib math.erf/erfc is the
independent oracle for Φ; Φ⁻¹ is checked by round-trip and against pinned
constants (the reference pins G(0.999), ref engine/irb/formulas.py:52)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from rwa_calculator_spark.functions.stats import (
    G_999,
    py_normal_cdf,
    py_normal_ppf,
)


def test_g999_matches_reference_pin():
    assert abs(G_999 - 3.0902323061678132) < 5e-16  # ≤1 ulp


@given(st.floats(min_value=-8, max_value=8, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_cdf_vs_stdlib_erfc(x):
    ref = 0.5 * math.erfc(-x / math.sqrt(2))
    got = py_normal_cdf(x)
    assert abs(got - ref) <= max(1e-13 * ref, 5e-17)


@given(st.floats(min_value=1e-6, max_value=1 - 1e-6, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_ppf_roundtrip(p):
    assert abs(py_normal_cdf(py_normal_ppf(p)) - p) < 1e-12


def test_known_quantiles():
    assert abs(py_normal_ppf(0.975) - 1.959963984540054) < 1e-12
    assert abs(py_normal_ppf(0.5)) < 1e-15
    # independently derived by bisection against stdlib erfc
    assert abs(py_normal_ppf(0.0003) - (-3.4316144036232696)) < 1e-12


def test_spark_column_matches_python(spark):
    """The Spark Column implementation and the PyB backend produce the same
    doubles (same formula, JVM libm vs C libm within 1e-14)."""
    from pyspark.sql import functions as F

    from rwa_calculator_spark.functions.stats import normal_cdf, with_normal_ppf

    pts = [(i, (2 * i + 1) / 52.0, (i - 12) / 4.0) for i in range(25)]
    df = spark.createDataFrame(pts, "i int, p double, x double")
    out = with_normal_ppf(df, "p", "ppf").withColumn("cdf", normal_cdf(F.col("x")))
    for r in out.collect():
        assert abs(r.ppf - py_normal_ppf(r.p)) < 1e-12
        assert abs(r.cdf - py_normal_cdf(r.x)) < 1e-13
