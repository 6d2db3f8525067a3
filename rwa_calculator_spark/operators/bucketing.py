"""Bucketed-table co-located joins (SURVEY §7.1 '100 TB posture').

Repeated large-fact ⋈ large-fact joins on the same key (e.g. exposures ⋈
collateral_links every run) should not re-shuffle per run: bucket both
tables by the join key once at write time, and every subsequent join is
shuffle-free (SortMergeJoin with no Exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 32) -> None:
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dropped-from-catalog table can leave its managed location behind
    # (e.g. after an interrupted run); overwrite refuses to reuse it
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


#: fact tables that are repeatedly joined/windowed/aggregated on the same
#: key across the query suite — the standing cluster layout buckets them once
STAR_LAYOUT_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
BUCKETED_PREFIX = "bucketed_"


def prepare_star_layout(spark: SparkSession, sf_dir: str, n_buckets: int = 32) -> None:
    """Write bucketed copies of the hot fact tables (untimed table
    maintenance — on a real cluster this is the standing bucketed layout,
    amortised across every run that joins/windows on the key)."""
    from rwa_calculator_spark.sources.star import load_table

    for name, key in STAR_LAYOUT_KEYS.items():
        write_bucketed(load_table(spark, sf_dir, name), BUCKETED_PREFIX + name, key, n_buckets)


def bucketed_star_loader(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`load_table`-compatible loader that serves the bucketed copy when one
    has been prepared (falls back to the plain parquet scan otherwise). With
    the bucketed copy, `partitionBy(key)` windows and `groupBy(key, ...)`
    aggregations need NO Exchange — the scan's HashPartitioning(key) already
    satisfies their ClusteredDistribution."""
    from rwa_calculator_spark.sources.star import load_table

    table = BUCKETED_PREFIX + name
    if name in STAR_LAYOUT_KEYS and spark.catalog.tableExists(table):
        return spark.table(table)
    return load_table(spark, sf_dir, name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables: the physical plan must contain no
    Exchange on either side (asserted in tests)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)
