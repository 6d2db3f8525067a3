#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: e.g. "before" / "after" -> plans/r09/<query>_<suffix>.txt
  with no query names, captures the bench suite.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rwa_calculator_spark.plans import load_all
from rwa_calculator_spark.session import build_session

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_TAG", "r10"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    if not names:
        names = sorted(n for n, s in registry.items() if s.bench)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = build_session(app_name="capture-plans")
    for name in names:
        spec = registry[name]
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, Exchange x{n_exch} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
