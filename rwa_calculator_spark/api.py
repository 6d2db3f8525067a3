"""Service façade (ref api/service.py `CreditRiskCalc`, api/results_cache.py,
api/export.py — the §3.1 query lifecycle).

`CreditRiskCalc(spark, bundle, pack).calculate()` runs the pipeline, writes
the per-exposure results ledger + summaries to a parquet results cache, and
returns a response exposing lazy re-scans and CSV/JSON export. The cache is
the reference's pattern: results persist as columnar files, every downstream
consumer (REST layer, reconciliation, exports) re-scans lazily rather than
holding frames in memory — on a cluster the cache directory is object
storage and nothing ever passes through the driver.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
from rwa_calculator_spark.engine.rulepack import CRR_PACK, RulePack


@dataclass(frozen=True)
class CalculationResponse:
    spark: SparkSession
    cache_dir: str
    run_manifest: dict

    def scan_results(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.cache_dir, "results"))

    def scan_summary(self, dimension: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.cache_dir, f"summary_{dimension}"))

    def export_csv(self, out_dir: str) -> str:
        """Results ledger as CSV (ref api/export.py:88-473; Excel/workbook
        exports need xlsxwriter, not in this container — CSV/JSON only)."""
        path = os.path.join(out_dir, "results_csv")
        self.scan_results().write.mode("overwrite").option("header", True).csv(path)
        return path

    def export_summary_json(self, dimension: str) -> str:
        rows = [r.asDict() for r in self.scan_summary(dimension).collect()]
        return json.dumps(rows, sort_keys=True)


class CreditRiskCalc:
    def __init__(
        self,
        spark: SparkSession,
        bundle: RawBundle,
        pack: RulePack = CRR_PACK,
        cache_dir: str | None = None,
    ):
        self.spark = spark
        self.bundle = bundle
        self.pack = pack
        self.cache_dir = cache_dir or os.path.join("/tmp", "rwa_results_cache", str(os.getpid()))

    def calculate(self, persist_edges: bool = True) -> CalculationResponse:
        t0 = time.perf_counter()
        out = run_pipeline(self.bundle, PipelineConfig(pack=self.pack, persist_edges=persist_edges))
        os.makedirs(self.cache_dir, exist_ok=True)
        out.results.write.mode("overwrite").parquet(os.path.join(self.cache_dir, "results"))
        out.summary_by_class.write.mode("overwrite").parquet(
            os.path.join(self.cache_dir, "summary_class")
        )
        out.summary_by_approach.write.mode("overwrite").parquet(
            os.path.join(self.cache_dir, "summary_approach")
        )
        manifest = {
            "regime": self.pack.regime,
            "rulepack_hash": self.pack.content_hash(),
            "wall_sec": round(time.perf_counter() - t0, 3),
        }
        with open(os.path.join(self.cache_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)
        return CalculationResponse(self.spark, self.cache_dir, manifest)
