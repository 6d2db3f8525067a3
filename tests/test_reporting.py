"""Reporting kernel: one-pass cell computation, absent-cell semantics,
validation identities (ref reporting/* test shapes: cell re-derivation,
supervisory validations where vacuous ≠ pass)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rwa_calculator_spark.reporting import (
    CellSpec,
    ValidationRule,
    compute_cells,
    evaluate_validations,
)
from rwa_calculator_spark.sources.star import load_table

SPECS = [
    CellSpec("C07.00", "0010", "0010", "l_returnflag = 'A'", "l_extendedprice"),
    CellSpec("C07.00", "0020", "0010", "l_returnflag = 'N'", "l_extendedprice"),
    CellSpec("C07.00", "0030", "0010", "l_returnflag = 'R'", "l_extendedprice"),
    CellSpec("C07.00", "0099", "0010", "true", "l_extendedprice"),  # total row
    CellSpec("C07.00", "0010", "0020", "l_returnflag = 'X'", "l_extendedprice"),  # absent
]

RULES = [
    ValidationRule(
        "v0001",
        left="C07.00|0099|0010",
        right=["C07.00|0010|0010", "C07.00|0020|0010", "C07.00|0030|0010"],
    ),
    ValidationRule("v0002", left="C07.00|0010|0020", right=["C07.00|0099|0010"]),
    ValidationRule("v0003_fails", left="C07.00|0010|0010", right=["C07.00|0099|0010"]),
]


def test_cells_one_pass_and_rederivation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    facts = compute_cells(li, SPECS)
    cells = {f"{r.template}|{r.row_id}|{r.col_id}": r.value for r in facts.collect()}
    # re-derive cell 0010/0010 independently
    expected = li.where(F.col("l_returnflag") == "A").agg(
        (F.sum(F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")) / 100.0).alias("v")
    ).collect()[0].v
    assert cells["C07.00|0010|0010"] == pytest.approx(expected, abs=1e-9)
    # absent cell (no matching rows) is null, not zero
    assert cells["C07.00|0010|0020"] is None


def test_validations_null_aware(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    facts = compute_cells(li, SPECS)
    statuses = {r.rule_id: r.status for r in evaluate_validations(facts, RULES).collect()}
    assert statuses["v0001"] == "pass"  # flags partition the total
    assert statuses["v0002"] == "not_evaluable"  # absent cell never passes
    assert statuses["v0003_fails"] == "fail"


def test_template_library_tieouts(spark, sf_dir):
    """The parsed EBA-grammar rules must tie the C02.00 overview to the
    C07.00/C08.01 class sheets exactly (fixed-point conservation), and the
    absent-cell rule must be not_evaluable."""
    from rwa_calculator_spark.reporting_templates import (
        TEMPLATE_CELLS,
        VALIDATION_RULES_TEXT,
        parse_validation_rules,
        star_ledger,
    )

    facts = compute_cells(star_ledger(spark, sf_dir), TEMPLATE_CELLS)
    rules = parse_validation_rules(VALIDATION_RULES_TEXT)
    rows = evaluate_validations(facts, rules).collect()
    statuses = {r.rule_id: r.status for r in rows}
    assert statuses == {
        "v0200_1": "pass",
        "v0700_1": "pass",
        "v0801_1": "pass",
        "v0901_1": "pass",
        # skip policy: absent cell never passes
        "v_absent": "not_evaluable",
        # EBA treat-as-zero policy: the same absent cell evaluates as 0
        "v_absent_zero": "pass",
        # deactivated-then-reactivated rule IS enforced (the liveness trap)
        "v_react": "pass",
        # v_deleted must be absent entirely — deleted rules are never run
    }
    severities = {r.rule_id: r.severity for r in rows}
    assert severities["v_absent_zero"] == "warning"
    assert severities["v0200_1"] == "error"


def test_rule_liveness_and_policy_semantics():
    """The publisher-semantics truth table (ref validations/rules.py): a
    rule is enforced when live OR reactivated, excluding deleted; unknown
    attribute values are hard parse errors."""
    from rwa_calculator_spark.reporting_templates import parse_validation_rules

    r = parse_validation_rules(
        "v1: {T,1,1} == {T,2,1} status deactivated reactivated 2025-06-01"
    )[0]
    assert r.enforced and r.liveness == "deactivated"
    assert not parse_validation_rules("v2: {T,1,1} == {T,2,1} status deactivated")[0].enforced
    assert not parse_validation_rules("v3: {T,1,1} == {T,2,1} status deleted")[0].enforced
    assert parse_validation_rules("v4: {T,1,1} == {T,2,1}")[0].enforced
    with pytest.raises(ValueError):
        parse_validation_rules("v5: {T,1,1} == {T,2,1} missing maybe")
    with pytest.raises(ValueError):
        parse_validation_rules("v6: {T,1,1} == {T,2,1} severity fatal")


def test_validation_parser_rejects_garbage():
    from rwa_calculator_spark.reporting_templates import parse_validation_rules

    with pytest.raises(ValueError):
        parse_validation_rules("v1: {C02.00,0010,0010} = {bad}")


def test_cell_lineage_reconciles_to_cell_value(spark):
    """Drilldown legs must re-sum to the reported figure bit-exactly (ref
    reporting/lineage.py honesty rules: the clicked number is ground truth;
    contribution_total reconciles explicitly)."""
    from rwa_calculator_spark.reporting import CellSpec, cell_lineage, compute_cells

    df = spark.createDataFrame(
        [
            ("E1", "corporate", 100.25),
            ("E2", "corporate", 50.50),
            ("E3", "retail", 10.00),
        ],
        "exposure_reference string, exposure_class string, rwa double",
    )
    spec = CellSpec("C02.00", "r0010", "c0010", "exposure_class = 'corporate'", "rwa")
    facts = compute_cells(df, [spec])
    reported = facts.collect()[0]["value"]
    legs, total = cell_lineage(df, spec, ["exposure_reference"])
    rows = legs.collect()
    assert total == reported == 150.75
    assert [r["exposure_reference"] for r in rows] == ["E1", "E2"]  # |contribution| desc
    assert sum(r["contribution"] for r in rows) == reported
    # absent cell (empty population) → None, empty legs — never zero
    empty_spec = CellSpec("C02.00", "r0020", "c0010", "exposure_class = 'sovereign'", "rwa")
    legs2, total2 = cell_lineage(df, empty_spec, ["exposure_reference"])
    assert total2 is None and legs2.count() == 0


def test_rwa_flow_statement_buckets(spark):
    """CR8 attribution buckets (reporting_flow.rwa_flow_statement): new
    business (current-only), disposals (prior-only — the bucket the
    registered query's derived prior frame never exercises), and matched-row
    drift, with row 8 the exact fixed-point residual (zero here)."""
    from rwa_calculator_spark.reporting_flow import rwa_flow_statement

    cur = spark.createDataFrame(
        [("E1", 100.0), ("E2", 250.0), ("E_NEW", 40.0)],
        "exposure_reference string, rwa double",
    )
    prior = spark.createDataFrame(
        [("E1", 80.0), ("E2", 260.0), ("E_GONE", 55.0)],
        "exposure_reference string, rwa double",
    )
    rows = {r.row_ref: r for r in rwa_flow_statement(cur, prior).collect()}
    assert rows["1"].rwea == 395.0          # opening = 80 + 260 + 55
    assert rows["9"].rwea == 390.0          # closing = 100 + 250 + 40
    assert rows["2"].rwea == 40.0 - 55.0    # asset size: new 40 − disposed 55
    assert rows["3"].rwea == (100.0 - 80.0) + (250.0 - 260.0)  # drift = +10
    assert rows["8"].rwea == 0.0            # residual closes exactly
    for ref in ("4", "5", "6", "7"):
        assert rows[ref].rwea is None       # honestly-null drivers
    assert [r for r in rows] == [str(i) for i in range(1, 10)]


def test_c08_templates_foot_and_tie(spark, sf_dir):
    """C 08.02 → C 08.01 footing (the boe_b0752/boe_b0814 family: the band
    rows must sum to the class row on every shared sum column) and the
    C 08.01 ↔ C 08.07 scope tie (the Total exposure value equals the IRB
    numerator of the scope-of-use template — same sealed population)."""
    from rwa_calculator_spark.plans import load_all

    reg = load_all()
    c1 = {r["row_label"]: r for r in reg["corep_c08_01"].fn(spark, sf_dir).collect()}
    c2 = reg["corep_c08_02"].fn(spark, sf_dir).collect()
    sum_cols = [
        "orig_exposure_0020", "exposure_value_0110", "off_bs_ev_0120",
        "defaulted_ev_0125", "rwea_0260", "defaulted_rwea_0265",
        "sa_equiv_rwea_0276", "expected_loss_0280",
    ]
    classes = {r["row_label"] for r in c2}
    assert classes  # sparse rows exist
    for cls in classes:
        bands = [r for r in c2 if r["row_label"] == cls]
        for col in sum_cols:
            assert sum(r[col] for r in bands) == pytest.approx(
                c1[cls][col], abs=1e-6
            ), f"C08.02 {cls} bands do not foot to C08.01 on {col}"
    # Total row re-aggregates from grain; fixed-point makes Σ classes ≡ total
    for col in sum_cols:
        assert sum(
            c1[k][col] for k in c1 if k != "total"
        ) == pytest.approx(c1["total"][col], abs=1e-6)
    # scope tie: C 08.07's total ead_irb is the same population's EAD
    c7 = {r["row_label"]: r for r in reg["corep_c08_07"].fn(spark, sf_dir).collect()}
    assert c1["total"]["exposure_value_0110"] == pytest.approx(
        c7["total"]["ead_irb"], abs=1e-6
    )


def test_rwa_flow_statement_model_and_fx_rows(spark):
    """CR8 rows 4/7 (round-5 lineage carriers): a matched row whose
    model_id changed attributes its WHOLE delta to row 4; a same-model
    row whose fx_rate moved splits exactly into row 7 (rate change at the
    current local book) and row 3 (local drift at the prior rate); the
    residual row 8 still closes to 0 up to fixed-point rounding."""
    from rwa_calculator_spark.reporting_flow import rwa_flow_statement

    schema = "exposure_reference string, rwa double, model_id string, fx_rate double"
    cur = spark.createDataFrame(
        [
            ("E1", 110.0, "M1", 1.0),   # plain drift → row 3 (+10)
            ("E2", 230.0, "M2", 1.0),   # model M1→M2 → row 4 (+30)
            ("E3", 150.0, "M1", 1.25),  # fx 1.0→1.25: L 100→120
            ("E_NEW", 40.0, "M1", 1.0),
        ],
        schema,
    )
    prior = spark.createDataFrame(
        [
            ("E1", 100.0, "M1", 1.0),
            ("E2", 200.0, "M1", 1.0),
            ("E3", 100.0, "M1", 1.0),
            ("E_GONE", 55.0, "M1", 1.0),
        ],
        schema,
    )
    rows = {r.row_ref: r.rwea for r in rwa_flow_statement(cur, prior).collect()}
    assert rows["1"] == 455.0 and rows["9"] == 530.0
    assert rows["2"] == 40.0 - 55.0
    assert rows["4"] == 30.0                      # model-update delta
    # E3 fx split: L_c = 150/1.25 = 120 → fx = 120·0.25 = 30, drift = 20
    assert rows["7"] == pytest.approx(30.0, abs=1e-9)
    assert rows["3"] == pytest.approx(10.0 + 20.0, abs=1e-9)
    assert rows["8"] == pytest.approx(0.0, abs=1e-6)  # residual closes
    assert rows["5"] is None and rows["6"] is None     # honestly null


def test_c08_04_foots_to_cr8(spark, sf_dir):
    """C 08.04's class sheets tie to CR8's whole-book rows: Σ class opening
    ≡ CR8 row 1 and Σ class closing ≡ CR8 row 9 (both derive the same
    synthetic prior period; fixed-point sums make the tie exact)."""
    from rwa_calculator_spark.plans import load_all

    reg = load_all()
    c4 = reg["corep_c08_04"].fn(spark, sf_dir).collect()
    cr8 = {r.row_ref: r.rwea for r in reg["pillar3_cr8"].fn(spark, sf_dir).collect()}
    opening = sum(r.rwea for r in c4 if r.row_ref == "0010")
    closing = sum(r.rwea for r in c4 if r.row_ref == "0090")
    assert opening == pytest.approx(cr8["1"], abs=1e-6)
    assert closing == pytest.approx(cr8["9"], abs=1e-6)


def test_c08_06_foots_to_cr10_1(spark, sf_dir):
    """C 08.06 and UK CR10.1 run the same slotting-routed star book, so
    every (category, maturity band) cell must carry identical EAD, RWEA
    and expected loss; CR10.1's display weight is the category's FIXED
    Art.153(5) Table A value, never the book's effective density."""
    from rwa_calculator_spark.plans import load_all
    from rwa_calculator_spark.plans.corep_c08 import _SL_RW_LONG, _SL_RW_SHORT

    reg = load_all()
    key = lambda r: (r["slot_category"], r["maturity_band"])
    c6 = {key(r): r for r in reg["corep_c08_06"].fn(spark, sf_dir).collect()}
    cr10 = {key(r): r for r in reg["pillar3_cr10_1"].fn(spark, sf_dir).collect()}
    assert set(c6) == set(cr10) and c6  # same populated sparse cells
    for k, r6 in c6.items():
        r10 = cr10[k]
        assert r10["ead_post"] == pytest.approx(r6["exposure_value_0010"], abs=1e-6)
        assert r10["rwea"] == pytest.approx(r6["rwea_0080"], abs=1e-6)
        assert r10["expected_loss"] == pytest.approx(
            r6["expected_loss_0090"], abs=1e-6
        )
        table_a = _SL_RW_SHORT if k[1] == "short" else _SL_RW_LONG
        assert r10["regulatory_rw"] == table_a[k[0]]


def test_c08_05_rate_conventions(spark, sf_dir):
    """C 08.05's rendered rate honours the reference's conventions: col
    0040 ≡ 0030/0020 wherever the cohort is non-empty, recorded 0.0 when
    it is, defaults never exceed the cohort, and the cohort excludes
    obligors that joined during the observation year."""
    from rwa_calculator_spark.plans import load_all

    rows = load_all()["corep_c08_05"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["defaulted_during_0030"] <= r["obligors_start_0020"]
        if r["obligors_start_0020"] > 0:
            assert r["observed_rate_0040"] == pytest.approx(
                round(r["defaulted_during_0030"] / r["obligors_start_0020"], 10),
                abs=1e-12,
            )
        else:
            assert r["observed_rate_0040"] == 0.0
        assert 0.0 <= r["observed_rate_0040"] <= 1.0
