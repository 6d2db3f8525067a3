from rwa_calculator_spark.plans.registry import REGISTRY, QuerySpec, load_all, query  # noqa: F401
