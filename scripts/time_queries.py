#!/usr/bin/env python
"""Best-of-N noop-sink timing for specific registry queries (bench.py
semantics: plan build untimed, warm once at sf0.001, min over repeats).

Usage: [N=5] python scripts/time_queries.py <query> [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rwa_calculator_spark.plans import load_all
from rwa_calculator_spark.session import build_session


def main() -> None:
    names = sys.argv[1:]
    n = int(os.environ.get("N", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        spec = registry[name]
        try:
            spec.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
        times = []
        for _ in range(n):
            df = spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        ts = " ".join(f"{t:.3f}" for t in times)
        print(f"{name}: min {min(times):.3f}  med {sorted(times)[len(times)//2]:.3f}  [{ts}]")
    spark.stop()


if __name__ == "__main__":
    main()
