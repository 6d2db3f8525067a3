"""Property-based tests, the reference's layer 4 (ref tests/properties/:
conservation, monotonicity on perturbation ladders). The IRB properties run
on the PyB float backend — same arithmetic as the Spark Columns, no JVM."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rwa_calculator_spark.functions.irb import capital_k_v, correlation_v, maturity_adj_v
from rwa_calculator_spark.functions.stats import PyB, V, py_normal_ppf


def _k(pd: float, lgd: float) -> float:
    return capital_k_v(V(PyB, pd), V(PyB, lgd), V(PyB, py_normal_ppf(pd))).v


@given(st.floats(min_value=0.0005, max_value=0.15), st.floats(min_value=0.05, max_value=0.9))
@settings(max_examples=200, deadline=None)
def test_k_monotonic_in_pd(pd, lgd):
    """Capital K rises with PD in the IRB-relevant band (the reference's
    monotonicity ladder, tests/properties/test_monotonicity.py)."""
    assert _k(pd * 1.10, lgd) >= _k(pd, lgd) - 1e-12


@given(st.floats(min_value=0.0005, max_value=0.5), st.floats(min_value=0.05, max_value=0.85))
@settings(max_examples=200, deadline=None)
def test_k_monotonic_in_lgd(pd, lgd):
    assert _k(pd, lgd * 1.05) >= _k(pd, lgd) - 1e-12


@given(st.floats(min_value=0.0003, max_value=0.99))
@settings(max_examples=200, deadline=None)
def test_correlation_bounds(pd):
    r = correlation_v(V(PyB, pd)).v
    assert 0.12 - 1e-12 <= r <= 0.24 + 1e-12


@given(
    st.floats(min_value=0.0005, max_value=0.2),
    st.floats(min_value=1.0, max_value=5.0),
)
@settings(max_examples=200, deadline=None)
def test_maturity_adjustment_increases_with_m(pd, m):
    a = maturity_adj_v(V(PyB, pd), V(PyB, m)).v
    b = maturity_adj_v(V(PyB, pd), V(PyB, min(m + 0.5, 5.0))).v
    assert b >= a - 1e-12


@given(st.floats(min_value=0.0005, max_value=0.5))
@settings(max_examples=100, deadline=None)
def test_k_bounded_by_lgd(pd):
    """K ≤ LGD (capital can't exceed loss-given-default)."""
    for lgd in (0.25, 0.45, 0.75):
        assert 0.0 <= _k(pd, lgd) <= lgd + 1e-12
