"""Audit cache + run index (ref observability/audit_cache.py,
api/run_index.py): opt-in no-op default, atomic sink, swallow-and-log,
newest-N prune; conservative stat-based fingerprints, successful-run-only
registration, eviction, persistence round-trip, and the REST reuse path."""

from __future__ import annotations

import os
import time

from rwa_calculator_spark.observability import (
    RunIndex,
    compute_fingerprint,
    prune_audit_cache,
    sink_audit,
)


def test_sink_audit_noop_and_atomic(spark, tmp_path):
    df = spark.range(5).toDF("n")
    # opt-out default: no dir -> no-op, no files anywhere
    sink_audit(df, None, "r1", "edge")
    root = str(tmp_path / "audit")
    sink_audit(df, root, "r1", "edge")
    dst = os.path.join(root, "r1", "edge")
    assert os.path.isdir(dst) and not os.path.exists(dst + ".tmp")
    assert spark.read.parquet(dst).count() == 5
    # overwrite replaces the previous artifact atomically
    sink_audit(spark.range(3).toDF("n"), root, "r1", "edge")
    assert spark.read.parquet(dst).count() == 3


def test_sink_audit_swallows_failures(spark, tmp_path):
    # a sink failure must never break a real run: unwritable destination
    bad = str(tmp_path / "file_not_dir")
    with open(bad, "w") as f:
        f.write("x")
    sink_audit(spark.range(1).toDF("n"), bad, "r1", "edge")  # must not raise


def test_prune_keeps_newest(spark, tmp_path):
    root = str(tmp_path / "audit")
    for i in range(4):
        sink_audit(spark.range(1).toDF("n"), root, f"run_{i}", "edge")
        now = time.time() + i  # strictly increasing mtimes
        os.utime(os.path.join(root, f"run_{i}"), (now, now))
    removed = prune_audit_cache(root, max_runs=2)
    assert sorted(removed) == ["run_0", "run_1"]
    assert sorted(os.listdir(root)) == ["run_2", "run_3"]


def test_fingerprint_conservative(tmp_path):
    d = tmp_path / "inputs"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"aaaa")
    params = {"regime": "crr", "irb": True}
    f1 = compute_fingerprint(params, [str(d)])
    assert f1 == compute_fingerprint(params, [str(d)])  # stable
    assert f1 != compute_fingerprint({**params, "irb": False}, [str(d)])
    # any input change, addition or removal produces a new fingerprint
    (d / "a.parquet").write_bytes(b"bbbbb")
    f2 = compute_fingerprint(params, [str(d)])
    assert f2 != f1
    (d / "b.parquet").write_bytes(b"c")
    assert compute_fingerprint(params, [str(d)]) != f2


def test_run_index_reuse_eviction_persistence(tmp_path):
    state = str(tmp_path / "state")
    idx = RunIndex(state_dir=state, max_runs=2)
    d = tmp_path / "inputs"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"aaaa")
    params = {"regime": "crr"}
    fp = compute_fingerprint(params, [str(d)])
    assert idx.find_reusable(fp) is None
    idx.register(fp, {"job_id": "J1"})
    assert idx.find_reusable(fp, params, [str(d)])["job_id"] == "J1"
    # freshness re-verification: input mutated after registration -> stale,
    # never reused (the stored pre-run signature no longer matches)
    (d / "a.parquet").write_bytes(b"mutated")
    assert idx.find_reusable(fp, params, [str(d)]) is None
    # eviction: oldest dropped past the cap
    idx.register("f2", {"job_id": "J2"})
    idx.register("f3", {"job_id": "J3"})
    assert idx.find_reusable(fp) is None  # evicted
    assert idx.find_reusable("f3")["job_id"] == "J3"
    # persistence round-trip: a new index reloads the survivors
    idx2 = RunIndex(state_dir=state)
    assert idx2.find_reusable("f2")["job_id"] == "J2"
    assert idx2.find_reusable("f3")["job_id"] == "J3"


def test_pipeline_audit_hook_points(spark, tmp_path):
    """The orchestrator hands the stage intermediates to the sink at its
    hook points; with the sink wired through the service façade the audit
    cache fills per run_id and the manifest carries the run id."""
    from rwa_calculator_spark.api import CreditRiskCalc
    from tests.engine_fixtures import build_bundle

    bundle = build_bundle(spark, n_cp=50)
    root = str(tmp_path / "audit")
    calc = CreditRiskCalc(
        spark,
        bundle,
        cache_dir=str(tmp_path / "cache"),
        audit_cache_dir=root,
    )
    resp = calc.calculate()
    run_id = resp.run_manifest["run_id"]
    names = sorted(os.listdir(os.path.join(root, run_id)))
    assert names == [
        "classified_exposures",
        "post_crm_exposures",
        "unified_exposures",
    ]
    audited = spark.read.parquet(os.path.join(root, run_id, "post_crm_exposures"))
    assert audited.count() == resp.scan_results().count()


def test_run_context_correlates_log_records():
    """ref observability/context.py: records emitted inside run_context
    carry the active run_id; outside, the '-' placeholder."""
    import logging

    from rwa_calculator_spark.observability import (
        RunIdFilter,
        configure_logging,
        current_run_id,
        run_context,
    )

    configure_logging()
    f = RunIdFilter()
    rec = logging.LogRecord("x", logging.INFO, "f", 1, "m", (), None)
    f.filter(rec)
    assert rec.run_id == "-"
    with run_context("run_abc"):
        assert current_run_id() == "run_abc"
        rec2 = logging.LogRecord("x", logging.INFO, "f", 1, "m", (), None)
        f.filter(rec2)
        assert rec2.run_id == "run_abc"
    assert current_run_id() is None


def test_resolve_pack_reports_every_problem():
    """ref rulebook/resolve.py: a regime layer must supply every entry the
    engine reads, each with a citation — ALL problems reported at once."""
    from dataclasses import replace

    import pytest

    from rwa_calculator_spark.engine.rulepack import (
        B31_PACK,
        CRR_PACK,
        RuleEntry,
        resolve_pack,
    )

    assert resolve_pack(CRR_PACK) is CRR_PACK
    assert resolve_pack(B31_PACK) is B31_PACK
    from decimal import Decimal

    broken = replace(
        CRR_PACK,
        scalars={
            **CRR_PACK.scalars,
            "retail_rw": RuleEntry(Decimal("0.75"), ""),  # citation stripped
        },
        tables={k: v for k, v in CRR_PACK.tables.items() if k != "ccf"},
    )
    with pytest.raises(ValueError) as ei:
        resolve_pack(broken)
    msg = str(ei.value)
    assert "retail_rw" in msg and "ccf" in msg  # both problems, one report
