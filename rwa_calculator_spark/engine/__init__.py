from rwa_calculator_spark.engine.pipeline import run_pipeline  # noqa: F401
from rwa_calculator_spark.engine.rulepack import CRR_PACK, B31_PACK, RulePack  # noqa: F401
