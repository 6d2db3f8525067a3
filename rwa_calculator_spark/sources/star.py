"""Driver star-schema testdata source (TESTDATA.md).

Mirrors the reference's loader discipline (`engine/loader.py:814-876`
ParquetLoader): every table has a *declared* schema; reads are
schema-projected so Catalyst prunes columns and pushes filters into the
parquet scan rather than trusting file metadata. At 100 TB the explicit
schema also skips footer-schema-merge planning cost across many files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_S = T.StringType()
_D = T.DoubleType()
_I = T.IntegerType()
_L = T.LongType()
_TS = T.TimestampType()


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


STAR_SCHEMAS: dict[str, T.StructType] = {
    "region": _st(("r_regionkey", _I), ("r_name", _S)),
    "nation": _st(("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I)),
    "customer": _st(
        ("c_custkey", _L), ("c_name", _S), ("c_nationkey", _I),
        ("c_acctbal", _D), ("c_mktsegment", _S),
    ),
    "supplier": _st(("s_suppkey", _L), ("s_name", _S), ("s_nationkey", _I), ("s_acctbal", _D)),
    "part": _st(
        ("p_partkey", _L), ("p_name", _S), ("p_brand", _S),
        ("p_type", _S), ("p_size", _I), ("p_retailprice", _D),
    ),
    "orders": _st(
        ("o_orderkey", _L), ("o_custkey", _L), ("o_orderstatus", _S),
        ("o_totalprice", _D), ("o_orderdate", _TS), ("o_orderpriority", _S),
    ),
    "lineitem": _st(
        ("l_orderkey", _L), ("l_partkey", _L), ("l_suppkey", _L),
        ("l_linenumber", _I), ("l_quantity", _D), ("l_extendedprice", _D),
        ("l_discount", _D), ("l_tax", _D), ("l_returnflag", _S),
        ("l_linestatus", _S), ("l_shipdate", _TS),
    ),
    # ts is TIMESTAMP_MICROS (isAdjustedToUTC=false) in the parquet files —
    # verified with pyarrow across all sf dirs — so Spark 4 reads it natively
    # as TIMESTAMP_NTZ. Session timezone is pinned UTC (session.py), so NTZ
    # event-time windowing matches the DuckDB oracle bit-for-bit.
    "events": _st(
        ("event_id", _L), ("ts", T.TimestampNTZType()), ("user_id", _L),
        ("event_type", _S), ("value", _D), ("props", _S),
    ),
    "documents": _st(
        ("doc_id", _L), ("text", _S), ("lang", _S), ("source", _S), ("n_chars", _L),
    ),
    "embeddings": _st(
        ("vec_id", _L), ("embedding", T.ArrayType(T.FloatType())), ("label", _I),
    ),
}

TABLE_NAMES = tuple(STAR_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-declared parquet scan of one star-schema table."""
    return spark.read.schema(STAR_SCHEMAS[name]).parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Above this input size a scan parallelises naturally (many splits/files) and
# the fan-out exchange would be pure overhead — so the helper is a no-op.
_FAN_OUT_CAP_BYTES = 1 << 30
_DEFAULT_SPLIT_BYTES = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes default


def load_table_fanned(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`load_table` + a deterministic round-robin fan-out for scans too small
    to parallelise naturally.

    The bench testdata is one parquet file with ONE row group per table, so
    a scan stage is a single task no matter the core count — every map-side
    operator above it (explodes, hash chains, join probes, partial
    aggregation) runs serial. On a cluster-sized input the scan yields
    (bytes / maxPartitionBytes) tasks and this helper is a no-op; the gate
    is derived from the input size, not tuned to local[32] (guide §2:
    partitioning must be scale-adaptive, §6 input split size).

    Only worth using where per-row compute above the scan dominates; the
    fan-out pays one exchange of the scanned bytes."""
    df = load_table(spark, sf_dir, name)
    try:
        nbytes = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
    except OSError:
        return df
    cores = spark.sparkContext.defaultParallelism
    natural_tasks = max(1, nbytes // _DEFAULT_SPLIT_BYTES)
    if nbytes < _FAN_OUT_CAP_BYTES and natural_tasks < cores:
        return df.repartition(cores)
    return df


def csv_mirror_path(sf_dir: str, name: str) -> str:
    """Materialise a CSV copy of a parquet table (once per sf_dir) so the
    CSV reader path (reference CSVLoader, `engine/loader.py:878-943`) can be
    exercised against the same oracle views. Written outside the read-only
    testdata tree."""
    import duckdb

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join("/tmp", "rwa_spark_csv", tag)
    out = os.path.join(out_dir, f"{name}.csv")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        tmp = out + ".tmp"
        con = duckdb.connect()
        src = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}')) TO '{tmp}' (HEADER, DELIMITER ',')"
        )
        con.close()
        os.replace(tmp, out)
    return out


def load_table_csv(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """CSV scan with the declared schema (no inference — prod discipline)."""
    return spark.read.csv(csv_mirror_path(sf_dir, name), header=True, schema=STAR_SCHEMAS[name])
