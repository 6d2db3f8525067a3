"""Service façade round-trip: calculate → parquet results cache → lazy
re-scan → export (ref api/service.py lifecycle, SURVEY §3.1)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rwa_calculator_spark.api import CreditRiskCalc
from rwa_calculator_spark.engine.rulepack import CRR_PACK


def test_calculate_cache_scan_export(spark, tmp_path):
    from tests.engine_fixtures import build_bundle

    bundle = build_bundle(spark, n_cp=100)
    calc = CreditRiskCalc(spark, bundle, CRR_PACK, cache_dir=str(tmp_path / "cache"))
    resp = calc.calculate()

    assert resp.run_manifest["regime"] == "crr"
    assert len(resp.run_manifest["rulepack_hash"]) == 16

    results = resp.scan_results()
    n = results.count()
    assert n == bundle.loans.count() + bundle.contingents.count()

    # cached summary equals re-derivation from the cached ledger
    cached = {r.exposure_class: r.total_rwa for r in resp.scan_summary("class").collect()}
    rederived = {
        r.exposure_class: round(r.s, 2)
        for r in results.groupBy("exposure_class")
        .agg((F.sum(F.round(F.col("rwa") * 100.0, 0).cast("long")) / 100.0).alias("s"))
        .collect()
    }
    for k, v in rederived.items():
        assert abs(cached[k] - v) < 0.011, k

    csv_path = resp.export_csv(str(tmp_path))
    assert os.path.isdir(csv_path)
    back = spark.read.option("header", True).csv(csv_path)
    assert back.count() == n

    js = json.loads(resp.export_summary_json("approach"))
    assert {row["approach"] for row in js} <= {"SA", "IRB"}
