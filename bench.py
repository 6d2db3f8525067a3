#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "suite_wall_sec", "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes its full plan via the no-op sink (no driver collect,
mirroring a cluster write) — so the timing measures scan+shuffle+compute,
not result transfer. JVM/session startup is excluded per BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rwa_calculator_spark.plans import load_all
    from rwa_calculator_spark.session import build_session

    registry = load_all()
    suite = {n: s for n, s in sorted(registry.items()) if s.bench}

    spark = build_session(app_name="rwa-spark-bench")
    # Warm up the JVM/codegen paths outside the timed region.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in suite.items():
        df = spec.fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
