"""Composed domain operators (SURVEY §2.10 graph, §2.13 composed pipelines)
re-expressed over the star schema.

Each query is the *shape* of a reference composition — CCF lookup × EAD,
banded haircut join, pro-rata allocation, portfolio floor with pro-rata
uplift, guarantee substitution, COREP cell facts, hierarchy resolution —
with deterministic parameters so a DuckDB oracle can pin it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum, sql_scaled_sum
from rwa_calculator_spark.operators.graph import (
    ancestor_closure_iterative,
    resolve_ultimate_parent_iterative,
)
from rwa_calculator_spark.plans.registry import query
from rwa_calculator_spark.sources.star import load_table

_SQL_EDGES = "SELECT c_custkey AS child, c_custkey // 7 AS parent FROM customer WHERE c_custkey >= 7"


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic org hierarchy over customers: parent = custkey // 7 — a
    deterministic tree of depth ~log₇|customers| standing in for the
    reference's org_mappings edges (ref data/schemas.py:1066)."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_custkey") >= 7).select(
        F.col("c_custkey").alias("child"),
        F.floor(F.col("c_custkey") / 7).cast("long").alias("parent"),
    )


@query(
    "graph_ultimate_parent",
    oracle=f"""
    WITH RECURSIVE edges AS ({_SQL_EDGES}),
    walk AS (
        SELECT child AS node, parent AS anc, 1 AS depth FROM edges
        UNION ALL
        SELECT w.node, e.parent, w.depth + 1
        FROM walk w JOIN edges e ON w.anc = e.child
    )
    SELECT node, anc AS ultimate_parent, depth, CAST(FALSE AS BOOLEAN) AS truncated
    FROM walk
    QUALIFY row_number() OVER (PARTITION BY node ORDER BY depth DESC) = 1
    """,
    tags=("graph",),
)
def graph_ultimate_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ultimate-parent resolution, distributed ≤10-round iterative join
    (ref engine/stages/hierarchy/graph.py:530-606 driver dict walk; the
    iterative form is the 100 TB path — SURVEY §2.10)."""
    return resolve_ultimate_parent_iterative(_edges(spark, sf_dir), max_depth=10)


@query(
    "graph_closure",
    oracle=f"""
    WITH RECURSIVE edges AS ({_SQL_EDGES}),
    nodes AS (
        -- explicit DISTINCT: inside WITH RECURSIVE DuckDB gives a bare
        -- UNION recursive-union (append) semantics, i.e. no dedup
        SELECT DISTINCT node FROM (
            SELECT child AS node FROM edges UNION ALL SELECT parent FROM edges)
    ),
    clos AS (
        SELECT node AS descendant, node AS ancestor, 0 AS depth FROM nodes
        UNION ALL
        SELECT c.descendant, e.parent, c.depth + 1
        FROM clos c JOIN edges e ON c.ancestor = e.child
    )
    SELECT descendant, count(*) AS n_ancestors,
           string_agg(ancestor, ',' ORDER BY ancestor) AS ancestors
    FROM clos GROUP BY descendant
    """,
    tags=("graph",),
)
def graph_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor transitive closure incl. self, aggregated to sorted ancestor
    lists (ref graph.py:240-305,609-665 → collect_list)."""
    clos = ancestor_closure_iterative(_edges(spark, sf_dir), max_depth=10)
    agg = clos.groupBy("descendant").agg(
        F.count("*").alias("n_ancestors"),
        F.sort_array(F.collect_list("ancestor")).alias("anc_sorted"),
    )
    return agg.select(
        "descendant",
        "n_ancestors",
        F.concat_ws(",", F.transform(F.col("anc_sorted"), lambda x: x.cast("string"))).alias(
            "ancestors"
        ),
    )


_SQL_CCF = """CASE o_orderpriority
    WHEN '1-URGENT' THEN 1.0 WHEN '2-HIGH' THEN 0.75 WHEN '3-MEDIUM' THEN 0.5
    WHEN '4-NOT SPECIFIED' THEN 0.2 ELSE 0.1 END"""


@query(
    "ccf_ead",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_scaled_sum(f'o_totalprice * 0.6 + CAST(({_SQL_CCF}) AS DOUBLE) * (o_totalprice * 0.4)', 4)} AS total_ead,
           count(*) AS n_exposures
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("domain",),
)
def ccf_ead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCF lookup × undrawn + drawn → EAD (ref engine/ccf.py,
    engine/crm/processor.py): the case-when CCF table applied to a 60/40
    drawn/undrawn split."""
    o = load_table(spark, sf_dir, "orders")
    ccf = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1.0)
        .when(F.col("o_orderpriority") == "2-HIGH", 0.75)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 0.5)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 0.2)
        .otherwise(0.1)
        .cast("double")
    )
    ead = F.col("o_totalprice") * 0.6 + ccf * (F.col("o_totalprice") * 0.4)
    return o.groupBy("o_orderpriority").agg(
        scaled_sum(ead, 4).alias("total_ead"), F.count("*").alias("n_exposures")
    )


_HAIRCUTS = [
    ("short", "A", 0.005), ("short", "N", 0.02), ("short", "R", 0.15),
    ("mid", "A", 0.02), ("mid", "N", 0.04), ("mid", "R", 0.15),
    ("long", "A", 0.04), ("long", "N", 0.08), ("long", "R", 0.25),
]
_SQL_HAIRCUTS = "(VALUES " + ", ".join(f"('{b}', '{t}', {h})" for b, t, h in _HAIRCUTS) + ") AS hc(band, ctype, haircut)"


@query(
    "haircut_fccm",
    oracle=f"""
    WITH coll AS (
        SELECT CASE WHEN l_quantity < 10 THEN 'short'
                    WHEN l_quantity < 30 THEN 'mid' ELSE 'long' END AS band,
               l_returnflag AS ctype, l_extendedprice AS value
        FROM lineitem
    )
    SELECT c.band, c.ctype,
           {sql_scaled_sum('c.value * (1 - CAST(hc.haircut AS DOUBLE))', 4)} AS adjusted_value,
           count(*) AS n_items
    FROM coll c JOIN {_SQL_HAIRCUTS} ON c.band = hc.band AND c.ctype = hc.ctype
    GROUP BY c.band, c.ctype
    """,
    tags=("domain",),
)
def haircut_fccm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervisory-haircut FCCM: banded lookup join (maturity band × type)
    then arithmetic (ref engine/crm/haircuts.py + haircut_tables.py 635 LoC
    of banded tables). The lookup is a literal broadcast dim — the rulepack
    compile-to-data pattern (SURVEY §1.1 Rulepack)."""
    li = load_table(spark, sf_dir, "lineitem")
    from rwa_calculator_spark.operators.localrel import local_literal_df

    hc = local_literal_df(spark, "band string, ctype string, haircut double", _HAIRCUTS)
    band = (
        F.when(F.col("l_quantity") < 10, "short")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("long")
    )
    coll = li.select(
        band.alias("band"), F.col("l_returnflag").alias("ctype"), F.col("l_extendedprice").alias("value")
    )
    j = coll.join(F.broadcast(hc), ["band", "ctype"])
    return j.groupBy("band", "ctype").agg(
        scaled_sum(F.col("value") * (1 - F.col("haircut")), 4).alias("adjusted_value"),
        F.count("*").alias("n_items"),
    )


@query(
    "pro_rata_allocation",
    oracle=f"""
    WITH shares AS (
        SELECT l.l_returnflag, o.o_totalprice,
               l.l_extendedprice / nullif(
                   sum(CAST(round(l.l_extendedprice * 100.0, 0) AS BIGINT))
                       OVER (PARTITION BY l.l_orderkey) / CAST(100 AS DOUBLE), 0) AS share
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT l_returnflag,
           {sql_scaled_sum('o_totalprice * share', 2)} AS allocated,
           count(*) AS n_rows
    FROM shares GROUP BY l_returnflag
    """,
    tags=("domain", "window"),
    bench=True,
)
def pro_rata_allocation(spark: SparkSession, sf_dir: str, loader=load_table) -> DataFrame:
    """Pro-rata allocation: spread a parent amount over children by weight
    share — the workhorse kernel under CRM/provisions/guarantees
    (ref engine/kernels/allocation.py:163-352). Denominator is the exact
    windowed fixed-point sum; conservation (Σallocated = Σparent) is pinned
    in tests. With `loader=bucketed_star_loader` the l_orderkey window needs
    no Exchange (prepared-layout path)."""
    from pyspark.sql import Window as W

    li = loader(spark, sf_dir, "lineitem")
    o = loader(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    w = W.partitionBy("l_orderkey")
    denom = F.sum(F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")).over(w) / F.lit(
        100.0
    )
    share = F.col("l_extendedprice") / F.nullif(denom, F.lit(0.0))
    shares = j.select("l_returnflag", "o_totalprice", share.alias("share"))
    return shares.groupBy("l_returnflag").agg(
        scaled_sum(F.col("o_totalprice") * F.col("share"), 2).alias("allocated"),
        F.count("*").alias("n_rows"),
    )


@query(
    "output_floor",
    oracle=f"""
    WITH rows_ AS (
        SELECT c.c_mktsegment, o.o_totalprice * 0.55 AS modelled, o.o_totalprice * 0.9 AS std
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), tot AS (
        SELECT {sql_scaled_sum('modelled', 2)} AS mod_total,
               {sql_scaled_sum('std', 2)} AS std_total
        FROM rows_
    ), factored AS (
        SELECT r.c_mktsegment, r.modelled,
               greatest(t.mod_total, 0.725 * t.std_total) / nullif(t.mod_total, 0) AS uplift
        FROM rows_ r CROSS JOIN tot t
    )
    SELECT c_mktsegment,
           {sql_scaled_sum('modelled', 2)} AS rwa_modelled,
           {sql_scaled_sum('modelled * uplift', 2)} AS rwa_floored,
           count(*) AS n_exposures
    FROM factored GROUP BY c_mktsegment
    """,
    tags=("domain",),
)
def output_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basel 3.1 output floor: portfolio scalar agg → cross-join back →
    pro-rata uplift (ref engine/aggregator/_floor.py). The 1-row total is
    broadcast, so the 'apply a portfolio scalar to every row' pattern is
    shuffle-free at scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows_ = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        (F.col("o_totalprice") * 0.55).alias("modelled"),
        (F.col("o_totalprice") * 0.9).alias("std"),
    )
    tot = rows_.agg(
        scaled_sum(F.col("modelled"), 2).alias("mod_total"),
        scaled_sum(F.col("std"), 2).alias("std_total"),
    )
    factored = rows_.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        "modelled",
        (
            F.greatest(F.col("mod_total"), F.lit(0.725) * F.col("std_total"))
            / F.nullif(F.col("mod_total"), F.lit(0.0))
        ).alias("uplift"),
    )
    return factored.groupBy("c_mktsegment").agg(
        scaled_sum(F.col("modelled"), 2).alias("rwa_modelled"),
        scaled_sum(F.col("modelled") * F.col("uplift"), 2).alias("rwa_floored"),
        F.count("*").alias("n_exposures"),
    )


@query(
    "crm_substitution",
    oracle=f"""
    WITH expo AS (
        SELECT n.n_name,
               CAST(CASE o.o_orderpriority WHEN '1-URGENT' THEN 0.5 WHEN '2-HIGH' THEN 0.75
                    ELSE 1.0 END AS DOUBLE) AS own_rw,
               CAST(CASE r.r_name WHEN 'EUROPE' THEN 0.2 WHEN 'ASIA' THEN 0.5
                    ELSE 1.0 END AS DOUBLE) AS g_rw,
               o.o_totalprice AS ead
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT n_name,
           {sql_scaled_sum('(0.6 * least(own_rw, g_rw) + 0.4 * own_rw) * ead', 2)} AS rwa_after_crm,
           {sql_scaled_sum('own_rw * ead', 2)} AS rwa_before_crm,
           count(*) AS n_exposures
    FROM expo GROUP BY n_name
    """,
    tags=("domain",),
)
def crm_substitution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarantee substitution: covered portion takes min(own RW, guarantor
    RW) (ref engine/crm/guarantees.py substitution approach). 60% covered /
    40% retained split."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    own_rw = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 0.5)
        .when(F.col("o_orderpriority") == "2-HIGH", 0.75)
        .otherwise(1.0)
    )
    g_rw = (
        F.when(F.col("r_name") == "EUROPE", 0.2)
        .when(F.col("r_name") == "ASIA", 0.5)
        .otherwise(1.0)
    )
    expo = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            "n_name", own_rw.alias("own_rw"), g_rw.alias("g_rw"), F.col("o_totalprice").alias("ead")
        )
    )
    eff = F.lit(0.6) * F.least("own_rw", "g_rw") + F.lit(0.4) * F.col("own_rw")
    return expo.groupBy("n_name").agg(
        scaled_sum(eff * F.col("ead"), 2).alias("rwa_after_crm"),
        scaled_sum(F.col("own_rw") * F.col("ead"), 2).alias("rwa_before_crm"),
        F.count("*").alias("n_exposures"),
    )


@query(
    "corep_cells",
    oracle=f"""
    WITH c1 AS (
        SELECT {sql_scaled_sum('l_extendedprice', 2)} AS value FROM lineitem WHERE l_returnflag = 'A'
    ), c2 AS (
        SELECT {sql_scaled_sum('l_extendedprice * (1 - l_discount)', 4)} AS value
        FROM lineitem WHERE l_linestatus = 'O'
    ), c3 AS (
        SELECT CAST(count(*) AS DOUBLE) AS value FROM lineitem WHERE l_discount > 0.05
    )
    SELECT 'C07.00' AS template, '0010' AS row_id, '0010' AS col_id, value FROM c1
    UNION ALL
    SELECT 'C07.00', '0020', '0010', value FROM c2
    UNION ALL
    SELECT 'C08.01', '0010', '0020', value FROM c3
    """,
    tags=("domain", "reporting"),
)
def corep_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COREP cell engine: per-cell (template, row, col) filtered measures
    unioned into a long facts frame (ref reporting/cellspec.py,
    reporting/kernel/*, facts.py). Three representative cell specs."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = [
        ("C07.00", "0010", "0010",
         li.where(F.col("l_returnflag") == "A").agg(scaled_sum(F.col("l_extendedprice"), 2).alias("value"))),
        ("C07.00", "0020", "0010",
         li.where(F.col("l_linestatus") == "O").agg(
             scaled_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("value"))),
        ("C08.01", "0010", "0020",
         li.where(F.col("l_discount") > 0.05).agg(F.count("*").cast("double").alias("value"))),
    ]
    frames = [
        df.select(
            F.lit(t).alias("template"), F.lit(r).alias("row_id"), F.lit(col).alias("col_id"), "value"
        )
        for t, r, col, df in cells
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.union(f)
    return out


def _template_library_oracle() -> str:
    from rwa_calculator_spark.reporting_templates import catalog_oracle_sql

    return catalog_oracle_sql()


def _validation_rules_oracle() -> str:
    """Generated from the SAME parsed rule catalogue the Spark query
    evaluates (like catalog_oracle_sql — spec and oracle cannot drift)."""
    from rwa_calculator_spark.reporting_templates import (
        VALIDATION_RULES_TEXT,
        catalog_oracle_sql,
        parse_validation_rules,
    )

    rules = [r for r in parse_validation_rules(VALIDATION_RULES_TEXT) if r.enforced]

    def cell_sq(cid: str) -> str:
        t, row, col = cid.split("|")
        return (
            f"(SELECT value FROM facts WHERE template = '{t}' "
            f"AND row_id = '{row}' AND col_id = '{col}')"
        )

    selects = []
    for r in rules:
        lv = cell_sq(r.left)
        rvs = [cell_sq(c) for c in r.right]
        if r.missing_policy == "zero":
            lv = f"coalesce({lv}, 0.0)"
            rvs = [f"coalesce({v}, 0.0)" for v in rvs]
        rsum = " + ".join(rvs)  # left-to-right: same fp op order as Python sum
        any_null = " OR ".join(f"({v}) IS NULL" for v in [lv, *rvs])
        selects.append(
            f"SELECT '{r.rule_id}' AS rule_id, '{r.severity}' AS severity, "
            f"CASE WHEN {any_null} THEN 'not_evaluable' "
            f"WHEN abs(({lv}) - ({rsum})) <= {r.tolerance!r} THEN 'pass' "
            f"ELSE 'fail' END AS status, "
            f"{lv} AS left_value, "
            f"CASE WHEN {any_null} THEN NULL ELSE ({rsum}) END AS right_value, "
            f"CASE WHEN {any_null} THEN NULL ELSE (({lv}) - ({rsum})) END AS diff"
        )
    body = "\n    UNION ALL\n    ".join(selects)
    return f"WITH facts AS ({catalog_oracle_sql()})\n    {body}"


@query(
    "report_validation_rules",
    oracle=_validation_rules_oracle(),
    tags=("domain", "reporting"),
)
def report_validation_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervisory validation-rule catalogue evaluated over the template
    estate (ref reporting/validations/{rules,evaluate}.py): the parsed
    EBA-grammar rules with publisher semantics — liveness (live OR
    reactivated, excluding deleted; a deleted rule never runs), severity
    (error/warning), and the per-rule missing-value policy (skip →
    not_evaluable, zero → EBA treat-as-zero / BoE dv:0). One row per
    ENFORCED rule."""
    from rwa_calculator_spark.reporting import compute_cells, evaluate_validations
    from rwa_calculator_spark.reporting_templates import (
        TEMPLATE_CELLS,
        VALIDATION_RULES_TEXT,
        parse_validation_rules,
        star_ledger,
    )

    facts = compute_cells(star_ledger(spark, sf_dir), TEMPLATE_CELLS)
    rules = parse_validation_rules(VALIDATION_RULES_TEXT)
    return evaluate_validations(facts, rules)


def _grammar_oracle() -> str:
    from rwa_calculator_spark.reporting_grammar_catalog import (
        scoped_catalogue_oracle_sql,
    )
    from rwa_calculator_spark.reporting_scope import FULL_SUBMISSION

    return scoped_catalogue_oracle_sql(FULL_SUBMISSION)


@query(
    "report_validation_grammar",
    oracle=_grammar_oracle(),
    tags=("domain", "reporting"),
)
def report_validation_grammar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervisory validation rules in BOTH publishers' reference grammars,
    parsed and evaluated with the publisher semantics (ref
    reporting/validations/evaluate.py:1-861): EBA positional
    ``{C 08.01, r0070, c0020}`` and BoE keyed ``{t: ..., r: ..., z: ...}``
    references normalise onto one AST; dimensional filters resolve the
    all-geographies TOTAL sheet (``eba_GA:x1``) and refuse every other
    member by name; ``sum``/``max`` expand unbound axes to every emitted
    id; a structurally absent cell is a skip NAMING the missing axis —
    never a zero and never a break; an all-zero comparison is VACUOUS, not
    a pass; present-but-null cells follow the rule's missing-value policy
    (treat-as-zero vs do-not-run); Point rules compare exactly where
    Interval rules take the rounding tolerance; if/then conditionals are
    refused by name, never approximated. The oracle is COMPILED from the
    same parse (reporting_grammar.rules_oracle_sql) in the evaluator's own
    cell-traversal order, so Python and DuckDB agree bit-for-bit. Rows
    carry the scope verdict of the FULL submission (every filing module
    filed — all in scope); `report_validation_scope` exercises the reduced
    filing. Rendered THROUGH the checker entry point (reporting_checker.
    run_checker — ref validations/checker.py): scope → evaluate →
    aggregate; the outcome frame is the checker's own."""
    from rwa_calculator_spark.reporting_checker import run_checker
    from rwa_calculator_spark.reporting_scope import FULL_SUBMISSION

    return run_checker(spark, sf_dir, FULL_SUBMISSION).outcomes


def _scope_oracle() -> str:
    from rwa_calculator_spark.reporting_grammar_catalog import (
        scoped_catalogue_oracle_sql,
    )
    from rwa_calculator_spark.reporting_scope import COREP_ONLY_SUBMISSION

    return scoped_catalogue_oracle_sql(COREP_ONLY_SUBMISSION)


@query(
    "report_validation_scope",
    oracle=_scope_oracle(),
    tags=("domain", "reporting", "validation"),
)
def report_validation_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation-rule SCOPING under a reduced filing (ref
    reporting/validations/scope.py — per-template applicability + module
    filing scope): the same grammar catalogue evaluated for a submission
    that files ONLY the COREP own-funds module. Every rule referencing the
    Pillar 3 CR04 table — including the cross-module population ties where
    only one side is filed (the reference's prerequisite-table skip) —
    emits exactly one NOT_IN_SCOPE row naming the unfiled module, and is
    NEVER handed to the evaluator (NOT_IN_SCOPE ≠ NOT_EVALUATED: "not
    applicable to this filing" vs "applicable but this estate couldn't run
    it"). The oracle derives the same scope verdict IN SQL from the
    (rule, template) reference pairs and the module map. Rendered THROUGH
    the checker entry point (reporting_checker.run_checker)."""
    from rwa_calculator_spark.reporting_checker import run_checker
    from rwa_calculator_spark.reporting_scope import COREP_ONLY_SUBMISSION

    return run_checker(spark, sf_dir, COREP_ONLY_SUBMISSION).outcomes


@query(
    "corep_template_library",
    oracle=_template_library_oracle(),
    tags=("domain", "reporting"),
)
def corep_template_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-sheet COREP library (C 02.00 overview, C 07.00 SA, C 08.01 IRB,
    C 09.01 geography) declared as cell DATA and computed in ONE aggregation
    pass over the exposure ledger by the cellspec kernel (ref
    reporting/corep/{c02,c07,c08,c09}.py + cellspec.py). Includes a
    deliberately-absent cell (null, not zero). Cross-sheet tie-outs are
    enforced by the parsed EBA-grammar validation rules in
    tests/test_reporting.py."""
    from rwa_calculator_spark.reporting import compute_cells
    from rwa_calculator_spark.reporting_templates import TEMPLATE_CELLS, star_ledger

    return compute_cells(star_ledger(spark, sf_dir), TEMPLATE_CELLS)
