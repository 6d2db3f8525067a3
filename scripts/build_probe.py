#!/usr/bin/env python
"""Plan-build cost probe: wall + py4j command count for spec.fn() per query.

The py4j command count is a STRUCTURAL metric (load-insensitive — the box
throttles, wall-clock swings 3x): each count is one synchronous driver
round-trip, the thing the engine build cost is made of.

Usage: [PROFILE=1] python scripts/build_probe.py <query> [query ...]
PROFILE=1 additionally prints the top cumulative-time Python frames.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import py4j.java_gateway as jg

from rwa_calculator_spark.plans import load_all
from rwa_calculator_spark.session import build_session

_COUNT = {"n": 0}
_orig = jg.GatewayClient.send_command


def _counting(self, *a, **k):
    _COUNT["n"] += 1
    return _orig(self, *a, **k)


jg.GatewayClient.send_command = _counting


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    registry = load_all()
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = build_session(app_name="build-probe")
    spark.sparkContext.setLogLevel("ERROR")
    profile = os.environ.get("PROFILE") == "1"
    for name in names:
        spec = registry[name]
        n0, t0 = _COUNT["n"], time.perf_counter()
        if profile:
            import cProfile
            import pstats

            pr = cProfile.Profile()
            pr.enable()
            df = spec.fn(spark, sf_dir)
            pr.disable()
        else:
            df = spec.fn(spark, sf_dir)
        build_wall = time.perf_counter() - t0
        build_cmds = _COUNT["n"] - n0
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        exec_wall = time.perf_counter() - t1
        print(
            f"{name}: build {build_wall:.2f}s / {build_cmds} py4j cmds; "
            f"exec {exec_wall:.2f}s"
        )
        if profile:
            stats = pstats.Stats(pr)
            stats.sort_stats("cumulative")
            stats.print_stats(30)
            stats.print_callers("send_command")
    spark.stop()


if __name__ == "__main__":
    main()
