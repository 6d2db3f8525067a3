"""Scratch: per-variant timing of the IRB pipeline at sf0.1."""
import time

from pyspark import StorageLevel
from rwa_calculator_spark.session import build_session
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK
from rwa_calculator_spark.plans.rwa import _star_bundle
from rwa_calculator_spark.engine.bundles import CRMOutput
from rwa_calculator_spark.engine.stages.hierarchy import run_hierarchy
from rwa_calculator_spark.engine.stages.classify import run_classify
from rwa_calculator_spark.engine.stages.crm import run_crm
from rwa_calculator_spark.engine.stages.calculators import run_irb, run_sa
from rwa_calculator_spark.engine.stages.aggregate import run_aggregate

SF = "/root/testdata/sf0.1"
spark = build_session(app_name='profile')


def timeit(label, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s")
    return best


def run_variant(mode):
    bundle = _star_bundle(spark, SF, irb=True)
    h = run_hierarchy(bundle)
    classified = run_classify(h, CRR_PACK)
    crm = run_crm(bundle, classified, CRR_PACK)
    exposures = crm.exposures
    if mode == "checkpoint":
        exposures = exposures.localCheckpoint(eager=False)
    elif mode == "persist":
        exposures = exposures.persist(StorageLevel.MEMORY_ONLY)
    crm = CRMOutput(exposures=exposures)
    out = run_aggregate(run_sa(crm, CRR_PACK), run_irb(crm, CRR_PACK, dictionary=True), pack=CRR_PACK)
    out.summary_by_approach.collect()
    if mode == "persist":
        exposures.unpersist()


# warm up JVM/IO
run_variant("checkpoint")

for mode in ("checkpoint", "persist", "none"):
    timeit(mode, lambda m=mode: run_variant(m))

# per-stage timing (checkpoint variant): materialise each edge via count
bundle = _star_bundle(spark, SF, irb=True)
t0 = time.perf_counter()
h = run_hierarchy(bundle)
h.exposures.count()
t1 = time.perf_counter()
classified = run_classify(h, CRR_PACK)
classified.exposures.count()
t2 = time.perf_counter()
crm = run_crm(bundle, classified, CRR_PACK)
crm.exposures.count()
t3 = time.perf_counter()
exposures = crm.exposures.localCheckpoint(eager=True)
t4 = time.perf_counter()
crm2 = CRMOutput(exposures=exposures)
out = run_aggregate(run_sa(crm2, CRR_PACK), run_irb(crm2, CRR_PACK, dictionary=True), pack=CRR_PACK)
out.summary_by_approach.collect()
t5 = time.perf_counter()
print(f"hierarchy {t1-t0:.3f} classify {t2-t1:.3f} crm {t3-t2:.3f} "
      f"checkpoint {t4-t3:.3f} calc+agg {t5-t4:.3f}")
