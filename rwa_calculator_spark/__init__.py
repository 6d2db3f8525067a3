"""rwa_calculator_spark — a PySpark-native analytics engine.

From-scratch rebuild of the query/data-processing capabilities of
OpenAfterHours/rwa_calculator (a Polars-based Basel RWA calculator; see
SURVEY.md), re-expressed as idiomatic Spark DataFrame/SQL plans optimised
by Catalyst + AQE, extended with LLM-data-pipeline operators and
Structured Streaming, and designed for 100 TB scale.

Layout:
  session     SparkSession factory (AQE on, Arrow on, UTC)
  contracts   ColumnSpec schema shim (reference: data/column_spec.py)
  sources     schema-enforced readers + the driver star-schema testdata
  functions   Column-level helpers: exact sums, normal_cdf/ppf, text
  operators   composed kernels: allocation, waterfall, dedup, graph, recon
  plans       the named query registry backing __spark_entry__.py
  streaming   Structured Streaming pipelines over the events table
"""

__version__ = "0.1.0"
