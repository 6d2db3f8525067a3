"""The driver-walk (reference shape) and the iterative-join (100 TB shape)
hierarchy resolutions must agree (SURVEY §2.10)."""

from __future__ import annotations

import pytest

from rwa_calculator_spark.operators.graph import (
    resolve_ultimate_parent_iterative,
    resolve_ultimate_parent_local,
)


@pytest.fixture()
def edges(spark):
    rows = [(c, c // 7) for c in range(7, 400)]
    return spark.createDataFrame(rows, "child long, parent long")


def test_local_and_iterative_agree(spark, edges):
    a = {
        r.node: (r.ultimate_parent, r.depth, r.truncated)
        for r in resolve_ultimate_parent_local(edges).collect()
    }
    b = {
        r.node: (r.ultimate_parent, r.depth, r.truncated)
        for r in resolve_ultimate_parent_iterative(edges).collect()
    }
    assert a == b
    assert a[343] == (1, 3, False)  # 343 → 49 → 7 → 1
    assert a[48] == (6, 1, False)


def test_cycle_guard_truncates(spark):
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "child long, parent long")
    out = {r.node: r.truncated for r in resolve_ultimate_parent_local(cyc).collect()}
    assert all(out.values())
    out_it = {r.node: r.truncated for r in resolve_ultimate_parent_iterative(cyc).collect()}
    assert all(out_it.values())


def test_pointer_jumping_matches_iterative(spark, edges):
    from rwa_calculator_spark.operators.graph import (
        resolve_ultimate_parent_pointer_jumping,
    )

    it = {
        r.node: r.ultimate_parent
        for r in resolve_ultimate_parent_iterative(edges).collect()
    }
    pj = {
        r.node: r.ultimate_parent
        for r in resolve_ultimate_parent_pointer_jumping(edges).collect()
    }
    assert it == pj
