from rwa_calculator_spark.sources.star import STAR_SCHEMAS, load_table  # noqa: F401
