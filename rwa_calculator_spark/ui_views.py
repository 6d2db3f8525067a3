"""Analyst-facing server-rendered views (ref ui/views/ — the reference's
analyst UI over the run store; ~8k LoC of Streamlit views distilled to the
two the verdicts rank first: the portfolio overview and the two-run
reconciliation forensics page, rendered stdlib-only on the existing REST
layer like the /ui dashboard).

Shape notes (Spark-first, 100 TB-safe):
- every table rendered is an AGGREGATE of the cached run parquet (per
  class / per approach / per bucket) or an explicitly-limited top-N — the
  views never collect exposure rows unbounded;
- the reconciliation page reads through one reconcile() pass and renders
  its tier-1 headline tie-outs (per-component totals, ref
  ui/views/reconciliation.py:264 headline_stats), the per-component bucket
  summary (:281 summary_by_component_table), the by-class segment table
  (:297 segment_tables) and the capped break worklist;
- share bars are pure CSS width percentages — no chart library.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass
from html import escape as h

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.exact import scaled_sum

_STYLE = (
    "<style>body{font-family:sans-serif;margin:24px}"
    "table{border-collapse:collapse;margin:8px 0 24px}"
    "td,th{border:1px solid #999;padding:4px 10px;font-family:monospace;"
    "text-align:right}th{background:#eee}td.l,th.l{text-align:left}"
    ".bar{display:inline-block;height:10px;background:#69c;vertical-align:middle}"
    ".stat{display:inline-block;margin-right:32px}"
    ".stat b{display:block;font-size:22px}</style>"
)


def _page(title: str, body: list[str]) -> str:
    return (
        f"<!doctype html><html><head><title>{h(title)}</title>{_STYLE}</head>"
        f"<body><h1>{h(title)}</h1>" + "".join(body) + "</body></html>"
    )


def _table(rows: list[dict], cols: list[str], left: set[str] = frozenset()) -> str:
    out = ["<table><tr>"]
    out.append(
        "".join(
            f'<th class="l">{h(c)}</th>' if c in left else f"<th>{h(c)}</th>"
            for c in cols
        )
    )
    out.append("</tr>")
    for r in rows:
        cells = []
        for c in cols:
            v = r.get(c)
            txt = "" if v is None else (f"{v:,.2f}" if isinstance(v, float) else str(v))
            cells.append(
                f'<td class="l">{txt}</td>' if c in left else f"<td>{h(txt)}</td>"
            )
        out.append("<tr>" + "".join(cells) + "</tr>")
    out.append("</table>")
    return "".join(out)


def _bar(pct: float) -> str:
    return f'<span class="bar" style="width:{max(0.0, min(100.0, pct)):.1f}px"></span> {pct:.1f}%'


def render_portfolio(spark: SparkSession, job: dict, job_id: str) -> str:
    """Portfolio overview of one cached run: class allocation with RWA
    density and share-of-total, approach split, top risk drivers."""
    results = spark.read.parquet(os.path.join(job["cache_dir"], "results"))
    aggs = [
        F.count("*").alias("n"),
        scaled_sum(F.col("ead_after_crm"), 2).alias("ead"),
        scaled_sum(F.col("rwa"), 2).alias("rwa"),
        scaled_sum(F.col("expected_loss"), 2).alias("el"),
    ]
    by_class = [r.asDict() for r in results.groupBy("exposure_class").agg(*aggs).collect()]
    by_approach = [r.asDict() for r in results.groupBy("approach").agg(*aggs).collect()]
    total_rwa = sum(r["rwa"] for r in by_class) or 1.0
    total_ead = sum(r["ead"] for r in by_class)
    for rows in (by_class, by_approach):
        for r in rows:
            r["density_pct"] = round(100.0 * r["rwa"] / r["ead"], 1) if r["ead"] else None
            r["share"] = _bar(100.0 * r["rwa"] / total_rwa)
    by_class.sort(key=lambda r: -r["rwa"])
    by_approach.sort(key=lambda r: -r["rwa"])
    # top risk drivers: an explicit LIMIT, the only exposure-grain read
    top = [
        r.asDict()
        for r in results.select(
            "exposure_reference", "exposure_class", "approach",
            "ead_after_crm", "rwa", "rw_source",
        )
        .orderBy(F.col("rwa").desc(), "exposure_reference")
        .limit(15)
        .collect()
    ]
    body = [
        '<div class="stat"><b>%s</b>total RWEA</div>' % f"{total_rwa:,.0f}",
        '<div class="stat"><b>%s</b>total EAD</div>' % f"{total_ead:,.0f}",
        '<div class="stat"><b>%.1f%%</b>portfolio density</div>'
        % (100.0 * total_rwa / total_ead if total_ead else 0.0),
        "<h2>allocation by exposure class</h2>",
        _table(
            by_class,
            ["exposure_class", "n", "ead", "rwa", "el", "density_pct", "share"],
            left={"exposure_class", "share"},
        ),
        "<h2>allocation by approach</h2>",
        _table(
            by_approach,
            ["approach", "n", "ead", "rwa", "el", "density_pct", "share"],
            left={"approach", "share"},
        ),
        "<h2>top risk drivers (by RWEA, first 15)</h2>",
        _table(
            top,
            ["exposure_reference", "exposure_class", "approach",
             "ead_after_crm", "rwa", "rw_source"],
            left={"exposure_reference", "exposure_class", "approach", "rw_source"},
        ),
    ]
    return _page(f"portfolio — job {job_id}", body)


def _grain(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.parquet(path)
        .groupBy("exposure_reference")
        .agg(
            scaled_sum(F.col("ead"), 2).alias("ead"),
            scaled_sum(F.col("rwa"), 2).alias("rwa"),
            F.max("exposure_class").alias("exposure_class"),
        )
    )


def render_reconciliation(
    spark: SparkSession, job_a: dict, job_b: dict, label_a: str, label_b: str,
    workspace: str | None = None,
) -> str:
    """Two-run reconciliation forensics (ref ui/views/reconciliation.py):
    tier-1 headline tie-outs per component, per-component bucket summary,
    break concentration by exposure class, capped worklist."""
    from rwa_calculator_spark.operators.recon import ReconComponent, reconcile

    ours = _grain(spark, os.path.join(job_a["cache_dir"], "results"))
    theirs = _grain(spark, os.path.join(job_b["cache_dir"], "results"))
    res = reconcile(
        ours,
        theirs,
        keys=["exposure_reference"],
        components=[ReconComponent("ead"), ReconComponent("rwa")],
    )
    detail = res.detail.cache()
    try:
        # tier 1 — one tie-out stat per component (headline_stats)
        headline = [
            r.asDict()
            for r in detail.groupBy("component")
            .agg(
                scaled_sum(F.coalesce("ours", F.lit(0.0)), 2).alias("our_total"),
                scaled_sum(F.coalesce("theirs", F.lit(0.0)), 2).alias("their_total"),
            )
            .collect()
        ]
        for r in headline:
            r["delta"] = round(r["our_total"] - r["their_total"], 2)
            r["delta_pct"] = (
                round(100.0 * r["delta"] / r["their_total"], 6)
                if r["their_total"]
                else None
            )
        summary = [
            r.asDict()
            for r in res.summary.orderBy("component", "bucket").collect()
        ]
        # tier 2 — where breaks concentrate, by exposure class (the class
        # joins back from the run grains — reconcile()'s detail carries
        # keys + components only)
        class_map = (
            ours.select("exposure_reference", "exposure_class")
            .unionByName(theirs.select("exposure_reference", "exposure_class"))
            .groupBy("exposure_reference")
            .agg(F.max("exposure_class").alias("exposure_class"))
        )
        by_class = [
            r.asDict()
            for r in detail.where(F.col("bucket") == "break")
            .join(class_map, "exposure_reference", "left")
            .groupBy("exposure_class", "component")
            .agg(
                F.count("*").alias("n_breaks"),
                scaled_sum(F.abs(F.col("diff")), 2).alias("total_abs_diff"),
            )
            .orderBy(F.col("total_abs_diff").desc())
            .limit(20)
            .collect()
        ]
        worklist = [
            r.asDict()
            for r in res.worklist.limit(20).collect()
        ]
    finally:
        detail.unpersist()
    # analyst dispositions (ref ui/app/recon_signoff.py → the worklist's
    # disposition column): merge the persisted decisions for this
    # workspace; a decision whose fingerprint no longer matches the break
    # renders `stale`, an undecided break renders `open`
    if workspace is not None:
        from rwa_calculator_spark.recon_signoff import (
            break_fingerprint,
            disposition,
            load_decisions,
        )

        decisions = load_decisions(workspace)
        for r in worklist:
            key = f"{r['exposure_reference']}|{r['component']}"
            fp = break_fingerprint(r.get("ours"), r.get("theirs"), r.get("diff"))
            r["recon_key"] = key
            r["fingerprint"] = fp
            r["disposition"], r["reason"] = disposition(decisions.get(key), fp)
    body = [
        f"<p>comparing <b>{h(label_a)}</b> (ours) vs <b>{h(label_b)}</b> (theirs)</p>",
        "<h2>headline tie-outs</h2>",
        _table(
            headline,
            ["component", "our_total", "their_total", "delta", "delta_pct"],
            left={"component"},
        ),
        "<h2>buckets by component</h2>",
        _table(summary, ["component", "bucket", "n", "total_abs_diff"],
               left={"component", "bucket"}),
        "<h2>break concentration by exposure class</h2>",
        _table(by_class,
               ["exposure_class", "component", "n_breaks", "total_abs_diff"],
               left={"exposure_class", "component"}),
        "<h2>worklist (largest breaks, first 20)</h2>",
        _table(worklist,
               ["exposure_reference", "component", "ours", "theirs", "diff",
                "bucket"]
               + (["disposition", "reason"] if workspace is not None else []),
               left={"exposure_reference", "component", "bucket",
                     "disposition", "reason"}),
    ]
    return _page("reconciliation", body)


# ---------------------------------------------------------------------------
# Method-split sections (ref ui/views/method_split.py)
# ---------------------------------------------------------------------------

#: Presentation order of the methodology sections (ref method_split.py:40
#: METHOD_ORDER — the reference's engine vocabulary is STD/FIRB/AIRB/
#: SLOTTING/EQUITY; this engine's aggregator emits SA/IRB/SLOTTING/EQUITY).
#: Labels present in the data but not listed are appended alphabetically so
#: nothing is dropped (method_split.py:109-115).
METHOD_ORDER: tuple[str, ...] = ("SA", "IRB", "SLOTTING", "EQUITY")


def _finite(raw) -> float:
    """null / non-finite → 0.0 (ref method_split.py:164-169)."""
    import math

    if raw is None:
        return 0.0
    v = float(raw)
    return v if math.isfinite(v) else 0.0


def ordered_methods(present: list) -> list[str]:
    """Distinct methods in METHOD_ORDER, then unknowns alphabetically."""
    known = [m for m in METHOD_ORDER if m in present]
    return known + sorted(m for m in present if m is not None and m not in METHOD_ORDER)


def method_sections(
    rows: list[dict],
    value_cols: Sequence[str],
    label_col: str = "exposure_class",
    method_col: str = "approach",
) -> list[dict]:
    """Split a class × method summary into one section per methodology with
    ONE bar scale shared across every section and series (ref
    method_split.py:63 `_shared_max` — "a small method reads as genuinely
    small next to a large one", never per-section rescaling). Returns
    ``[{method, items: [(label, [(col, value, pct)])]}]`` in METHOD_ORDER;
    ``[]`` when the rows are empty or a required column is absent, so the
    caller falls back to the combined table."""
    import math

    need = {label_col, method_col, *value_cols}
    if not rows or not need <= set(rows[0]):
        return []
    shared = max(
        (
            abs(float(r[c]))
            for r in rows
            for c in value_cols
            if r.get(c) is not None and math.isfinite(float(r[c]))
        ),
        default=0.0,
    ) or 1.0
    sections = []
    for method in ordered_methods(sorted({r[method_col] for r in rows})):
        mine = [r for r in rows if r[method_col] == method]
        mine.sort(key=lambda r: -max(abs(_finite(r.get(c))) for c in value_cols))
        items = [
            (
                str(r[label_col]),
                [
                    (c, _finite(r.get(c)), 100.0 * abs(_finite(r.get(c))) / shared)
                    for c in value_cols
                ],
            )
            for r in mine
        ]
        if items:
            sections.append({"method": method, "items": items})
    return sections


def render_method_split(spark: SparkSession, job: dict, job_id: str) -> str:
    """Per-methodology split of one cached run (ref ui/views/
    method_split.py): one section per approach in presentation order, each
    a per-class RWEA + EAD bar table sharing one scale across ALL sections
    so methods stay visually comparable."""
    results = spark.read.parquet(os.path.join(job["cache_dir"], "results"))
    rows = [
        r.asDict()
        for r in results.groupBy("approach", "exposure_class")
        .agg(
            F.count("*").alias("n"),
            scaled_sum(F.col("ead_after_crm"), 2).alias("ead"),
            scaled_sum(F.col("rwa"), 2).alias("rwa"),
        )
        .collect()
    ]
    sections = method_sections(rows, ("rwa", "ead"))
    body = []
    for sec in sections:
        body.append(f"<h2>{h(sec['method'])}</h2><table>")
        body.append(
            '<tr><th class="l">exposure_class</th><th>series</th>'
            '<th>value</th><th class="l">scale (shared)</th></tr>'
        )
        for label, series in sec["items"]:
            for col, value, pct in series:
                body.append(
                    f'<tr><td class="l">{h(label)}</td><td>{h(col)}</td>'
                    f"<td>{value:,.2f}</td>"
                    f'<td class="l">{_bar_abs(pct)}</td></tr>'
                )
        body.append("</table>")
    if not sections:
        body.append("<p>no rows to plot</p>")
    return _page(f"method split — job {job_id}", body)


def _bar_abs(pct: float) -> str:
    width = max(0.0, min(100.0, pct)) * 3.0  # 300px = shared max
    return f'<span class="bar" style="width:{width:.1f}px"></span>'


# ---------------------------------------------------------------------------
# Reporting-hierarchy tree (ref ui/views/hierarchy.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EntityNode:
    """One reporting entity and the subtree it heads (ref hierarchy.py:53
    EntityNode). `is_apex` is True only for a true group apex (no parent
    link) — an unattached row whose parent is merely unknown is NOT an
    apex. `scopes` are the reporting bases the node can head."""

    reference: str
    is_apex: bool
    scopes: tuple[str, ...]
    children: tuple["EntityNode", ...] = ()


@dataclass(frozen=True)
class HierarchyView:
    """Rooted forest + clearly-labelled unattached subtrees (ref
    hierarchy.py:89)."""

    roots: tuple[EntityNode, ...]
    unattached: tuple[tuple[EntityNode, str], ...]
    entity_count: int


def _scopes_for(is_apex: bool, has_children: bool) -> tuple[str, ...]:
    """Every node can head an individual submission; a parent additionally
    heads consolidated (apex) or sub-consolidated (below) (ref
    hierarchy.py:285-296)."""
    scopes = []
    if has_children:
        scopes.append("consolidated" if is_apex else "sub_consolidated")
    scopes.append("individual")
    return tuple(scopes)


def build_hierarchy(rows: list[dict]) -> HierarchyView:
    """Fold registry rows (entity_reference, parent_entity_reference) into
    a HierarchyView (ref hierarchy.py:139-204): a true apex (blank parent)
    heads the forest; blank/duplicate references, self/unknown parents and
    parent CYCLES each become a labelled unattached subtree so a malformed
    registry renders loudly rather than crashing or dropping rows."""

    def _clean(v) -> str | None:
        if v is None:
            return None
        s = str(v).strip()
        return s or None

    by_ref: dict[str, str | None] = {}
    invalid: list[tuple[str, str]] = []
    for row in rows:
        ref = _clean(row.get("entity_reference"))
        if ref is None:
            invalid.append(("(missing reference)", "missing entity_reference"))
        elif ref in by_ref:
            invalid.append((ref, "duplicate entity_reference"))
        else:
            by_ref[ref] = _clean(row.get("parent_entity_reference"))

    children: dict[str, list[str]] = {r: [] for r in by_ref}
    apexes: list[str] = []
    orphan_tops: list[tuple[str, str]] = []
    for ref, parent in by_ref.items():
        if parent is None:
            apexes.append(ref)
        elif parent == ref:
            orphan_tops.append((ref, "entity is its own parent"))
        elif parent not in by_ref:
            orphan_tops.append((ref, f"unknown parent '{parent}'"))
        else:
            children[parent].append(ref)

    visited: set[str] = set()

    def _node(ref: str) -> EntityNode:
        visited.add(ref)
        kids = tuple(
            _node(c) for c in sorted(children.get(ref, ())) if c not in visited
        )
        is_apex = by_ref[ref] is None
        return EntityNode(ref, is_apex, _scopes_for(is_apex, bool(kids)), kids)

    roots = tuple(_node(r) for r in sorted(apexes))
    unattached = [(_node(r), reason) for r, reason in sorted(orphan_tops)]
    # members of a parent cycle are valid rows none of which is a display
    # root — surface each once with its reachable subtree (hierarchy.py:188)
    for ref in sorted(by_ref):
        if ref not in visited:
            unattached.append((_node(ref), "parent cycle"))
    for label, reason in invalid:
        unattached.append((EntityNode(label, False, (), ()), reason))

    def _count(n: EntityNode) -> int:
        return 1 + sum(_count(c) for c in n.children)

    total = sum(_count(n) for n in roots) + sum(_count(n) for n, _ in unattached)
    return HierarchyView(roots, tuple(unattached), total)


def render_hierarchy(rows: list[dict]) -> str:
    """Server-rendered /ui/hierarchy page: the rooted entity forest with
    scope-headship badges, then any unattached subtrees with their reasons
    (registry rows are config-scale — always driver-sized)."""
    view = build_hierarchy(rows)

    def _li(n: EntityNode) -> str:
        badge = " ".join(f"<small>[{h(s)}]</small>" for s in n.scopes)
        kids = "".join(_li(c) for c in n.children)
        kids = f"<ul>{kids}</ul>" if kids else ""
        apex = " <b>(apex)</b>" if n.is_apex else ""
        return f"<li><code>{h(n.reference)}</code>{apex} {badge}{kids}</li>"

    body = [f"<p>{view.entity_count} entities</p><ul>"]
    body += [_li(n) for n in view.roots]
    body.append("</ul>")
    if view.unattached:
        body.append("<h2>unattached subtrees</h2><ul>")
        for node, reason in view.unattached:
            body.append(f"<li>{h(reason)}: {_li(node)}</li>")
        body.append("</ul>")
    return _page("reporting hierarchy", body)


# ---------------------------------------------------------------------------
# Cell-lineage drilldown panel (ref ui/views/lineage.py)
# ---------------------------------------------------------------------------


def render_lineage(spark: SparkSession, job: dict, job_id: str, cell: str) -> str:
    """Drill one reported template cell to the ledger legs that fed it
    (ref ui/views/lineage.py LineagePanel over reporting/lineage.py): the
    cell's criteria ARE its spec (filter + measure rendered verbatim — the
    drilldown re-runs the spec, never a hand-maintained copy), the
    recomputed cell value, a reconciles flag (Σ legs ≡ value only when the
    worklist was not truncated — lineage.py:176-189 returns None rather
    than a false tick when legs were capped), and the top legs by
    |contribution|."""
    from rwa_calculator_spark.reporting import cell_lineage
    from rwa_calculator_spark.reporting_templates import TEMPLATE_CELLS

    spec = next((s for s in TEMPLATE_CELLS if s.cell_id == cell), None)
    if spec is None:
        return _page("cell lineage", [f"<p>unknown cell <code>{h(cell)}</code></p>"])
    df = spark.read.parquet(os.path.join(job["cache_dir"], "results"))
    limit = 20
    try:
        legs_df, total = cell_lineage(df, spec, ["exposure_reference"], limit=limit)
        legs = [r.asDict() for r in legs_df.collect()]
    except Exception as exc:  # spec references columns this ledger lacks
        return _page(
            "cell lineage",
            [
                f"<p>cell <code>{h(cell)}</code> has no lineage over this "
                f"ledger: <code>{h(str(exc).splitlines()[0][:200])}</code></p>"
            ],
        )
    legs_sum = round(sum(r["contribution"] for r in legs), 2)
    truncated = len(legs) >= limit
    if total is None:
        reconciles = "cell absent"
    elif truncated:
        reconciles = "n/a (worklist truncated — not a failure)"
    else:
        reconciles = "yes" if abs(legs_sum - total) < 0.005 else "NO"
    body = [
        "<h2>criteria</h2><ul>",
        f"<li>template: <code>{h(spec.template)}</code></li>",
        f"<li>filter: <code>{h(spec.filter_sql)}</code></li>",
        f"<li>measure: <code>{h(spec.measure_sql)}</code> (scale {spec.scale})</li>",
        "</ul>",
        '<div class="stat"><b>%s</b>cell value</div>'
        % ("absent" if total is None else f"{total:,.2f}"),
        '<div class="stat"><b>%s</b>Σ shown legs</div>' % f"{legs_sum:,.2f}",
        f'<div class="stat"><b>{h(reconciles)}</b>reconciles</div>',
        f"<h2>legs (top {len(legs)} by |contribution|)</h2>",
        _table(legs, ["exposure_reference", "contribution"], left={"exposure_reference"}),
    ]
    return _page(f"lineage — {cell}", body)


# ---------------------------------------------------------------------------
# Dual-framework comparison page (ref ui/views/comparison.py)
# ---------------------------------------------------------------------------


def render_comparison(spark: SparkSession, sf_dir: str) -> str:
    """CRR vs Basel 3.1 comparison page (ref ui/views/comparison.py
    executive_summary + class table): headline totals with the RWA delta
    and average risk weights, then the per-class delta table with
    shared-scale direction bars. Reads the class-grain dual-framework
    delta — never exposure rows."""
    from rwa_calculator_spark.plans.rwa import dual_framework_delta

    rows = [
        r.asDict()
        for r in dual_framework_delta(spark, sf_dir).orderBy("exposure_class").collect()
    ]
    crr = sum(_finite(r.get("rwa_crr")) for r in rows)
    b31 = sum(_finite(r.get("rwa_b31")) for r in rows)
    delta = round(b31 - crr, 2)
    shared = max((abs(_finite(r.get("delta"))) for r in rows), default=0.0) or 1.0
    for r in rows:
        d = _finite(r.get("delta"))
        r["direction"] = ("▲" if d > 0 else "▼" if d < 0 else "=") + f" {_bar_abs(100.0 * abs(d) / shared)}"
    body = [
        '<div class="stat"><b>%s</b>CRR RWEA</div>' % f"{crr:,.0f}",
        '<div class="stat"><b>%s</b>Basel 3.1 RWEA</div>' % f"{b31:,.0f}",
        '<div class="stat"><b>%s</b>Δ RWEA</div>' % f"{delta:,.0f}",
        '<div class="stat"><b>%.2f%%</b>Δ</div>' % (100.0 * delta / crr if crr else 0.0),
        "<h2>by exposure class</h2>",
        _table(
            rows,
            ["exposure_class", "rwa_crr", "rwa_b31", "delta", "direction"],
            left={"exposure_class", "direction"},
        ),
    ]
    return _page("CRR vs Basel 3.1", body)


# ---------------------------------------------------------------------------
# Template sheet-grid view (ref ui/views/report_templates.py)
# ---------------------------------------------------------------------------


def render_template_sheet(template_id: str, cells: list[dict]) -> str:
    """Render one COREP/Pillar-3 template's computed cell facts as the
    official sheet grid (ref ui/views/report_templates.py — rows × columns
    with the publisher's ids): absent cells (null value — "this cell is
    not reported") render as an em-dash, never as 0.00, mirroring the
    grammar evaluator's absent-≠-zero rule. Input is the driver-sized
    long facts list from compute_cells."""
    mine = [c for c in cells if c["template"] == template_id]
    if not mine:
        return _page(f"template {template_id}", ["<p>no cells</p>"])
    row_ids = sorted({c["row_id"] for c in mine})
    col_ids = sorted({c["col_id"] for c in mine})
    by_rc = {(c["row_id"], c["col_id"]): c["value"] for c in mine}
    out = ["<table><tr><th class=\"l\">row</th>"]
    out += [f"<th>{h(c)}</th>" for c in col_ids]
    out.append("</tr>")
    for r in row_ids:
        out.append(f'<tr><td class="l">{h(r)}</td>')
        for c in col_ids:
            v = by_rc.get((r, c))
            out.append("<td>—</td>" if v is None else f"<td>{v:,.2f}</td>")
        out.append("</tr>")
    out.append("</table>")
    n_absent = sum(1 for v in by_rc.values() if v is None)
    body = [
        f"<p>{len(mine)} cells, {n_absent} absent (— = not reported, never zero)</p>",
        "".join(out),
    ]
    return _page(f"template {template_id}", body)


def render_validations(outcomes: list[dict]) -> str:
    """Validation-outcome board (ref ui/app main validations tab): one row
    per evaluated rule with its status badge; the four-status vocabulary
    (PASS / FAIL / VACUOUS / NOT_EVALUATED) renders with the skip reason
    so an unevaluated rule is visibly different from a passing one."""
    order = {"FAIL": 0, "NOT_EVALUATED": 1, "VACUOUS": 2, "PASS": 3}
    outcomes = sorted(
        outcomes, key=lambda r: (order.get(str(r.get("status")), 9), str(r.get("rule_id")))
    )
    counts: dict[str, int] = {}
    for r in outcomes:
        counts[str(r.get("status"))] = counts.get(str(r.get("status")), 0) + 1
    body = [
        "".join(
            f'<div class="stat"><b>{counts.get(s, 0)}</b>{h(s)}</div>'
            for s in ("PASS", "FAIL", "VACUOUS", "NOT_EVALUATED")
        ),
        _table(
            outcomes,
            list(outcomes[0]) if outcomes else [],
            left={"rule_id", "source", "status", "reason", "severity"},
        ),
    ]
    return _page("validation outcomes", body)
