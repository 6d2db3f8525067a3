"""Scratch: per-stage execution timing of the full bench pipeline at sf0.1.

Times what BENCH actually runs (rwa_pipeline_irb / rwa_pipeline_sa through
run_pipeline with persist_edges=True), materialising each stage edge with a
noop write so the deltas are execution cost, not plan-build cost.
"""
import time

from rwa_calculator_spark.session import build_session
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK
from rwa_calculator_spark.plans.rwa import _star_bundle, release_cached_blocks

SF = "/root/testdata/sf0.1"
spark = build_session(app_name="profile-r8")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def full(irb: bool):
    release_cached_blocks(spark)
    bundle = _star_bundle(spark, SF, irb=irb)
    out = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK, persist_edges=True))
    noop(out.summary_by_approach if irb else out.summary_by_class)


# warm
full(True)
full(False)

for label, irb in (("irb", True), ("sa", False)):
    best = min(
        (lambda t0: (full(irb), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    print(f"rwa_pipeline_{label}: best {best:.3f}s")

# staged: materialise each edge
from rwa_calculator_spark.engine.stages.hierarchy import run_hierarchy
from rwa_calculator_spark.engine.stages.classify import run_classify
from rwa_calculator_spark.engine.stages.crm import run_crm
from rwa_calculator_spark.engine.stages.re_split import run_re_split
from rwa_calculator_spark.engine.stages.calculators import run_irb, run_sa
from rwa_calculator_spark.engine.stages.aggregate import run_aggregate
from rwa_calculator_spark.engine.bundles import CRMOutput

for rep in range(2):
    release_cached_blocks(spark)
    bundle = _star_bundle(spark, SF, irb=True)
    t0 = time.perf_counter()
    h = run_hierarchy(bundle, CRR_PACK)
    noop(h.exposures)
    t1 = time.perf_counter()
    classified = run_classify(h, CRR_PACK)
    noop(classified.exposures)
    t2 = time.perf_counter()
    crm = run_crm(bundle, classified, CRR_PACK)
    crm = run_re_split(crm, bundle, CRR_PACK)
    noop(crm.exposures)
    t3 = time.perf_counter()
    ncols = len(crm.exposures.columns)
    edge = crm.exposures.localCheckpoint(eager=True)
    t4 = time.perf_counter()
    crm2 = CRMOutput(exposures=edge)
    out = run_aggregate(
        run_sa(crm2, CRR_PACK), run_irb(crm2, CRR_PACK, dictionary=True), pack=CRR_PACK
    )
    noop(out.summary_by_approach)
    t5 = time.perf_counter()
    print(
        f"rep{rep}: hierarchy {t1-t0:.3f} classify {t2-t1:.3f} crm+resplit {t3-t2:.3f} "
        f"checkpoint({ncols} cols) {t4-t3:.3f} calc+agg {t5-t4:.3f} total {t5-t0:.3f}"
    )
