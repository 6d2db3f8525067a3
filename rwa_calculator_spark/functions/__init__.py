from rwa_calculator_spark.functions.exact import (  # noqa: F401
    scaled_avg,
    scaled_sum,
    sql_scaled_avg,
    sql_scaled_sum,
)
