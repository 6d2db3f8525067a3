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
    spark: SparkSession, job_a: dict, job_b: dict, label_a: str, label_b: str
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
               ["exposure_reference", "component", "ours", "theirs", "diff", "bucket"],
               left={"exposure_reference", "component", "bucket"}),
    ]
    return _page("reconciliation", body)
