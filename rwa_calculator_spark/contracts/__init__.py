from rwa_calculator_spark.contracts.column_spec import (  # noqa: F401
    ColumnSpec,
    conform,
    ensure_columns,
)
