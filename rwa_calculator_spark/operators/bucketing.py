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


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables: the physical plan must contain no
    Exchange on either side (asserted in tests)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)
