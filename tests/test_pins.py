"""Pin the two pyspark internals the session tuning relies on, so an
environment bump fails loudly instead of silently re-inflating cost
(VERDICT r09 "What's wrong" item 2 / "Next round" item 7).

- ``utils.disable_dataframe_debugging`` pre-seeds the documented
  Python-side cache ``pyspark.errors.utils._enable_debugging_cache``; if a
  pyspark upgrade renames it, the helper degrades to a no-op and every
  DataFrame/Column call silently pays 3 extra py4j round trips again.
- ``utils.allow_cached_plan_repartitioning`` assumes
  ``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` is a
  RUNTIME conf (settable per session); if it became static the guarded
  conf.set would raise and the except would hide the regression.
"""

from __future__ import annotations


def test_dataframe_debugging_cache_attribute_exists():
    import pyspark.errors.utils as eu

    assert hasattr(eu, "_enable_debugging_cache"), (
        "pyspark renamed _enable_debugging_cache: disable_dataframe_debugging "
        "is now a no-op — update utils.disable_dataframe_debugging"
    )


def test_cached_plan_repartitioning_conf_is_runtime_settable(spark):
    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    original = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "false")
        assert spark.conf.get(key) == "false"
        spark.conf.set(key, "true")
        assert spark.conf.get(key) == "true"
    finally:
        if original is not None:
            spark.conf.set(key, original)
