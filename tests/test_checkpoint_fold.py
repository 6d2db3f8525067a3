"""Width-aware checkpoint (operators/checkpoint.py): constant columns are
split off the barrier and re-attached as literals, bit-identically."""

from __future__ import annotations

from pyspark.sql import functions as F

from rwa_calculator_spark.operators.checkpoint import (
    localcheckpoint_folded,
    split_foldable_output,
)


def _mixed_frame(spark):
    return (
        spark.range(5)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("data_col"),
            F.lit(0.0).alias("zero_fill"),
            F.lit(None).cast("string").alias("null_fill"),
            F.lit("comprehensive").alias("method"),
            F.array().cast("array<string>").alias("empty_list"),
            F.lit(True).alias("flag"),
        )
    )


def test_split_detects_constants_and_keeps_data(spark):
    df = _mixed_frame(spark)
    narrow, consts = split_foldable_output(df)
    assert set(consts) == {"zero_fill", "null_fill", "method", "empty_list", "flag"}
    assert set(narrow.columns) == {"k", "data_col"}


def test_folded_checkpoint_bit_identical(spark):
    df = _mixed_frame(spark)
    plain = df.localCheckpoint(eager=True)
    folded = localcheckpoint_folded(df, eager=True)
    assert folded.schema == plain.schema  # names, order, types, nullability
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, plain.collect()))


def test_nan_literal_stays_in_frame(spark):
    df = spark.range(3).select(
        F.col("id").alias("k"), F.lit(float("nan")).alias("nan_col")
    )
    narrow, consts = split_foldable_output(df)
    # NaN does not round-trip through the SQL parser — must not be split off
    assert "nan_col" not in consts
    assert "nan_col" in narrow.columns
    out = localcheckpoint_folded(df, eager=True)
    vals = [r.nan_col for r in out.collect()]
    assert all(v != v for v in vals)  # still NaN


def test_non_project_top_node_falls_back(spark):
    df = (
        spark.range(10)
        .select((F.col("id") % 3).alias("g"), F.lit(1.0).alias("c"))
        .groupBy("g")
        .count()
    )
    narrow, consts = split_foldable_output(df)
    # Aggregate on top: conservative no-split, plain checkpoint behaviour
    out = localcheckpoint_folded(df, eager=True)
    assert out.schema == df.schema
    assert out.count() == 3


def test_pipeline_edge_folds_absent_frame_carriers(spark, sf_dir):
    """The bench book carries no collateral/guarantees/provisions — its CRM
    lit-fill carriers must come off the checkpoint and fold downstream."""
    from rwa_calculator_spark.engine.rulepack import CRR_PACK
    from rwa_calculator_spark.engine.stages.classify import run_classify
    from rwa_calculator_spark.engine.stages.crm import run_crm
    from rwa_calculator_spark.engine.stages.hierarchy import run_hierarchy
    from rwa_calculator_spark.engine.stages.re_split import run_re_split
    from rwa_calculator_spark.plans.rwa import _star_bundle

    bundle = _star_bundle(spark, sf_dir, irb=True)
    h = run_hierarchy(bundle, CRR_PACK)
    c = run_classify(h, CRR_PACK)
    edge = run_re_split(run_crm(bundle, c, CRR_PACK), bundle, CRR_PACK).exposures
    narrow, consts = split_foldable_output(edge)
    # the guarantee lit-fills are the canonical absent-frame carriers
    assert {"g_coverage", "g_class", "g_cqs"} <= set(consts)
    assert len(narrow.columns) + len(consts) == len(edge.columns)
    folded = localcheckpoint_folded(edge, eager=False)
    assert folded.schema == edge.schema
