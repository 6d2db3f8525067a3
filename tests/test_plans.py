"""Physical-plan regression gates (SURVEY §4): filters and projections must
reach the parquet scan, dims must broadcast, aggregates must map-side
combine, top-k must plan as TakeOrdered. A plan that silently loses one of
these properties is a 100 TB regression even if results stay correct."""

from __future__ import annotations

import pytest

from rwa_calculator_spark.plans import load_all

REGISTRY = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "project_filter")
    # predicate reached the scan (plan strings truncate long filter lists,
    # so match the stable prefix)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp>"
        in plan
    )  # 4 of 11 columns read


def test_dimension_joins_broadcast(spark, sf_dir):
    for name in ("flagship_revenue_by_nation", "join_left_enrich", "irb_capital_k"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, f"{name}: dim join degenerated to SMJ"


def test_aggregation_is_partial(spark, sf_dir):
    assert "partial_" in _plan(spark, sf_dir, "agg_sum_by_key")


def test_topk_plans_as_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in _plan(spark, sf_dir, "topk_limit")


def test_scans_are_schema_pruned_in_llm_path(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_exact")
    # only lang + text reach the scan, not the whole documents schema
    assert "ReadSchema: struct<text:string,lang:string>" in plan or (
        "ReadSchema: struct<lang:string,text:string>" in plan
    )
