"""REST layer end-to-end over real HTTP (stdlib client ↔ stdlib server):
the SURVEY §3.2 lifecycle — validate → calculate (background job) → poll →
results/summary/lineage/export → templates/validations → reconcile two runs
→ dual-framework comparison."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from rwa_calculator_spark.rest import RwaRestServer


def _get(base: str, path: str) -> tuple[int, dict]:
    try:
        with urllib.request.urlopen(base + path) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _post(base: str, path: str, body: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _wait_done(base: str, job_id: str, timeout: float = 180.0) -> dict:
    deadline = time.time() + timeout
    while time.time() < deadline:
        status, job = _get(base, f"/jobs/{job_id}")
        assert status == 200
        if job["status"] == "done":
            return job
        assert job["status"] == "running", f"job failed: {job}"
        time.sleep(0.5)
    raise AssertionError("job did not finish in time")


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    with RwaRestServer(spark, sf_dir) as base:
        yield base


@pytest.fixture(scope="module")
def done_job(server):
    status, resp = _post(server, "/api/calculate", {"regime": "crr", "irb": True})
    assert status == 202
    return _wait_done(server, resp["job_id"])


def test_health(server):
    status, body = _get(server, "/api/health")
    assert status == 200 and body["status"] == "ok"


def test_validate(server):
    status, body = _post(server, "/api/validate", {})
    assert status == 200
    assert body["valid"] is True
    assert body["checks"]["DQ_orphan_loans"] == 0


def test_results_page(server, done_job):
    status, body = _get(server, f"/api/results?job={done_job['job_id']}&limit=7")
    assert status == 200 and body["n_returned"] == 7
    row = body["rows"][0]
    assert {"exposure_reference", "approach", "ead", "rwa"} <= set(row)


def test_summary_and_conservation(server, done_job):
    status, by_class = _get(server, f"/api/results/summary/class?job={done_job['job_id']}")
    assert status == 200
    status, by_app = _get(server, f"/api/results/summary/approach?job={done_job['job_id']}")
    assert status == 200
    # the two summaries partition the same ledger — totals must tie out
    t1 = sum(r["total_rwa"] for r in by_class["rows"])
    t2 = sum(r["total_rwa"] for r in by_app["rows"])
    assert abs(t1 - t2) < 1e-6


def test_summary_unknown_dimension_400(server, done_job):
    status, _ = _get(server, f"/api/results/summary/bogus?job={done_job['job_id']}")
    assert status == 400


def test_results_unfinished_job_409_and_missing_404(server):
    status, _ = _get(server, "/api/results?job=nonexistent")
    assert status == 404


def test_lineage(server, done_job):
    status, body = _get(server, f"/api/lineage?job={done_job['job_id']}")
    assert status == 200
    assert body["manifest"]["regime"] == "crr"
    assert len(body["manifest"]["rulepack_hash"]) == 16
    assert "crm" in body["stages"]


def test_export_csv(server, done_job):
    import glob

    status, body = _get(server, f"/api/export/csv?job={done_job['job_id']}")
    assert status == 200
    assert glob.glob(body["path"] + "/*.csv")


def test_templates_and_cells(server):
    status, body = _get(server, "/api/templates")
    assert status == 200 and "C07.00" in body["templates"]
    status, body = _get(server, "/api/templates/C07.00")
    assert status == 200
    cells = {(c["row_id"], c["col_id"]): c["value"] for c in body["cells"]}
    assert ("0010", "0010") in cells
    # the deliberately-absent DEFAULTED cell must be null, never zero
    assert cells[("0090", "0010")] is None
    status, _ = _get(server, "/api/templates/C99.99")
    assert status == 404


def test_validations(server):
    status, body = _get(server, "/api/validations")
    assert status == 200
    by_id = {r["rule_id"]: r["status"] for r in body["results"]}
    assert by_id["v0200_1"] == "pass"
    assert by_id["v_absent"] == "not_evaluable"


def test_validations_checker_full_submission(server):
    # the one supervisory entry point (ref validations/checker.py): scope →
    # evaluate → aggregate. The green estate executes rules, has coverage,
    # and raises NO blocking findings.
    status, body = _get(server, "/api/validations/checker")
    assert status == 200
    assert body["rules_executed"] > 0
    assert body["coverage_sufficient"] is True
    assert body["status_counts"].get("PASS", 0) > 0
    # the catalogue carries deliberately-failing rules (v_point_break et
    # al — the evaluator's own negative fixtures): every FAIL adapts onto
    # the error channel as exactly one VAL001/VAL002 finding, never raised
    val_findings = [
        f for f in body["findings"] if f["code"] in ("VAL001", "VAL002")
    ]
    assert len(val_findings) == body["status_counts"].get("FAIL", 0)
    assert all(f["rule_id"] and f["message"] for f in val_findings)
    # no fail-open VAL003 on a covered estate
    assert [f for f in body["findings"] if f["code"] == "VAL003"] == []
    # nothing is out of scope under the full submission
    assert body["status_counts"].get("NOT_IN_SCOPE", 0) == 0


def test_validations_checker_scoped_submission(server):
    # a COREP-only filing drops every CR04-referencing rule out of scope
    status, body = _get(server, "/api/validations/checker?modules=corep_of")
    assert status == 200
    assert body["filed_modules"] == ["corep_of"]
    assert body["status_counts"].get("NOT_IN_SCOPE", 0) > 0
    # an unknown module is a 400, never silently out-of-scope
    status, body = _get(server, "/api/validations/checker?modules=nope")
    assert status == 400


def test_reconcile_self_is_exact(server, done_job):
    status, body = _post(
        server,
        "/api/reconcile",
        {"job_a": done_job["job_id"], "job_b": done_job["job_id"]},
    )
    assert status == 200
    buckets = {(r["component"], r["bucket"]): r["n"] for r in body["summary"]}
    assert all(b == "exact" for (_, b) in buckets)
    assert body["worklist"] == []


def test_reconcile_cross_regime_breaks(server, done_job):
    status, resp = _post(server, "/api/calculate", {"regime": "b31", "irb": True})
    assert status == 202
    job_b = _wait_done(server, resp["job_id"])
    status, body = _post(
        server,
        "/api/reconcile",
        {"job_a": done_job["job_id"], "job_b": job_b["job_id"]},
    )
    assert status == 200
    buckets = {(r["component"], r["bucket"]) for r in body["summary"]}
    # SME supporting-factor removal under B3.1 must surface rwa breaks
    assert ("rwa", "break") in buckets


def test_comparison(server):
    status, body = _get(server, "/api/comparison")
    assert status == 200
    assert len(body["rows"]) > 0


def test_errors_endpoint(server, done_job):
    """GET /api/errors surfaces the run's merged DQ/SCP channel (empty for
    the clean star bundle, but the endpoint and schema are live)."""
    status, body = _get(server, f"/api/errors?job={done_job['job_id']}")
    assert status == 200
    assert body["job_id"] == done_job["job_id"]
    assert isinstance(body["errors"], list)
    for row in body["errors"]:
        assert {"code", "severity", "stage", "key", "message"} <= set(row)


def _get_raw(base: str, path: str) -> tuple[int, str, str]:
    with urllib.request.urlopen(base + path) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read().decode()


def test_ui_dashboard(server, done_job):
    """Server-rendered HTML dashboard (ref ui/app/main.py): the run index
    lists jobs; the per-job page renders both summary tables."""
    status, ctype, html = _get_raw(server, "/ui")
    assert status == 200 and ctype.startswith("text/html")
    assert done_job["job_id"] in html
    status, ctype, html = _get_raw(server, f"/ui?job={done_job['job_id']}")
    assert status == 200 and ctype.startswith("text/html")
    assert "summary by class" in html and "summary by approach" in html
    assert "total_rwa" in html
    # unknown job renders a message, not a 500
    status, _ctype, html = _get_raw(server, "/ui?job=nope")
    assert status == 200 and "no such job" in html


def test_export_xlsx(server, done_job):
    """Workbook export via the stdlib OOXML writer, re-read with the
    stdlib reader — numbers tie out with the JSON summary endpoint."""
    from rwa_calculator_spark.sources.xlsx import read_xlsx

    status, body = _get(server, f"/api/export/xlsx?job={done_job['job_id']}")
    assert status == 200 and body["format"] == "xlsx"
    back = read_xlsx(body["path"])
    assert set(back) == {"summary_class", "summary_approach"}
    _status, js = _get(
        server, f"/api/results/summary/class?job={done_job['job_id']}"
    )
    by_class = {r["exposure_class"]: r["total_rwa"] for r in js["rows"]}
    header = back["summary_class"][0]
    ci, cv = header.index("exposure_class"), header.index("total_rwa")
    for row in back["summary_class"][1:]:
        assert by_class[row[ci]] == row[cv]


def test_lineage_cell_drilldown(server, done_job):
    """Cell drilldown over real HTTP: the legs re-sum to the cell value
    (reporting/lineage.py honesty rule), unknown cells 404."""
    jid = done_job["job_id"]
    cell = "C02.00|0060|0010"  # SA total RWA
    status, body = _get(
        server, f"/api/lineage/cell?job={jid}&cell={urllib.parse.quote(cell)}"
    )
    assert status == 200 and body["cell"] == cell
    assert body["n_legs"] > 0
    assert round(sum(l["contribution"] for l in body["legs"]), 2) <= round(
        body["cell_value"], 2
    )  # top-100 legs never exceed the full total
    status, _body = _get(server, f"/api/lineage/cell?job={jid}&cell=NOPE")
    assert status == 404


def test_calculate_run_index_reuse(server, done_job):
    """ref api/run_index.py: an identical request with unchanged inputs is
    handed the cached run (200 + reused), never re-run; force overrides."""
    status, resp = _post(server, "/api/calculate", {"regime": "crr", "irb": True})
    assert status == 200
    assert resp["reused"] is True
    assert resp["job_id"] == done_job["job_id"]
    status2, resp2 = _post(
        server, "/api/calculate", {"regime": "crr", "irb": True, "force": True}
    )
    assert status2 == 202  # forced: a fresh background job
    assert resp2["job_id"] != done_job["job_id"]


def _get_html(base: str, path: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(base + path) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, (e.read() or b"").decode()


def test_ui_portfolio_view(server, done_job):
    """Analyst portfolio view (ref ui/views/): class/approach allocation
    with density + share bars and the capped top-risk-drivers table, all
    server-rendered from the cached run."""
    status, html = _get_html(server, f"/ui/portfolio?job={done_job['job_id']}")
    assert status == 200
    assert "allocation by exposure class" in html
    assert "allocation by approach" in html
    assert "top risk drivers" in html
    assert "total RWEA" in html and 'class="bar"' in html
    # a run computed through the pipeline always has corporate legs
    assert "corporate" in html


def test_ui_reconciliation_view(server, done_job):
    """Two-run reconciliation forensics (ref ui/views/reconciliation.py):
    self-reconciliation ties out exactly — every bucket row is 'exact',
    headline deltas are zero, worklist empty."""
    jid = done_job["job_id"]
    status, html = _get_html(server, f"/ui/reconciliation?job_a={jid}&job_b={jid}")
    assert status == 200
    assert "headline tie-outs" in html
    assert "exact" in html and "break concentration" in html
    # an unknown job is a JSON 404, not a hang or a 500
    status, _body = _get_html(server, "/ui/reconciliation?job_a=nope&job_b=nope")
    assert status == 404


def test_ui_portfolio_unknown_job_404(server):
    status, _ = _get_html(server, "/ui/portfolio?job=missing")
    assert status == 404


def test_runs_registry(server, done_job):
    """/api/runs (ref api/run_index.py entries()): lists the session's jobs
    with status + wall time and the persisted reuse index — the completed
    job appears in both."""
    status, body = _get(server, "/api/runs")
    assert status == 200
    jid = done_job["job_id"]
    jobs = {j["job_id"]: j for j in body["jobs"]}
    assert jid in jobs and jobs[jid]["status"] == "done"
    assert jobs[jid]["wall_sec"] is not None
    assert any(e.get("job_id") == jid for e in body["indexed"])


def test_ui_method_split_view(server, done_job):
    """Per-methodology split (ref ui/views/method_split.py): one section
    per approach in METHOD_ORDER, bars scale against ONE shared max so
    methods stay visually comparable (the section order is asserted by
    position in the rendered HTML)."""
    status, html = _get_html(server, f"/ui/method-split?job={done_job['job_id']}")
    assert status == 200
    assert "<h2>SA</h2>" in html and "<h2>IRB</h2>" in html
    assert html.index("<h2>SA</h2>") < html.index("<h2>IRB</h2>")
    assert 'class="bar"' in html and "scale (shared)" in html


def test_ui_hierarchy_view(server):
    """Reporting-hierarchy tree (ref ui/views/hierarchy.py): the star
    registry's apex heads a consolidated scope, regions head
    sub-consolidated, nations are individual leaves; no unattached
    subtrees in a well-formed registry."""
    status, html = _get_html(server, "/ui/hierarchy")
    assert status == 200
    assert "EGROUP" in html and "(apex)" in html
    assert "[consolidated]" in html and "[sub_consolidated]" in html
    assert "[individual]" in html
    assert "unattached" not in html


def test_ui_lineage_view(server, done_job):
    """HTML cell drilldown (ref ui/views/lineage.py): criteria rendered
    from the spec verbatim, a reconciles verdict that is honest about
    truncation, unknown cells render a clear message (200, not a 500)."""
    jid = done_job["job_id"]
    cell = urllib.parse.quote("C02.00|0060|0010")
    status, html = _get_html(server, f"/ui/lineage?job={jid}&cell={cell}")
    assert status == 200
    assert "criteria" in html and "cell value" in html
    assert "reconciles" in html and "contribution" in html
    status, html = _get_html(server, f"/ui/lineage?job={jid}&cell=NOPE")
    assert status == 200 and "unknown cell" in html


def test_ui_comparison_view(server):
    """CRR vs Basel 3.1 page (ref ui/views/comparison.py): headline RWEA
    under both frameworks with the delta, per-class direction bars."""
    status, html = _get_html(server, "/ui/comparison")
    assert status == 200
    assert "CRR RWEA" in html and "Basel 3.1 RWEA" in html
    assert "by exposure class" in html
    assert ("▲" in html) or ("▼" in html) or ("=" in html)


def test_build_hierarchy_pure_semantics():
    """build_hierarchy (ref ui/views/hierarchy.py:139-204) — malformed
    registries render loudly: self-parent / unknown-parent / duplicate /
    blank rows and parent CYCLES each become a labelled unattached
    subtree; a true apex heads the forest; scope headships follow
    apex/parent/leaf position; nothing is dropped (entity_count counts
    every row)."""
    from rwa_calculator_spark.ui_views import build_hierarchy

    rows = [
        {"entity_reference": "APEX", "parent_entity_reference": None},
        {"entity_reference": "MID", "parent_entity_reference": "APEX"},
        {"entity_reference": "LEAF", "parent_entity_reference": "MID"},
        {"entity_reference": "SELF", "parent_entity_reference": "SELF"},
        {"entity_reference": "ORPH", "parent_entity_reference": "GHOST"},
        {"entity_reference": "CYC_A", "parent_entity_reference": "CYC_B"},
        {"entity_reference": "CYC_B", "parent_entity_reference": "CYC_A"},
        {"entity_reference": "APEX", "parent_entity_reference": None},  # dup
        {"entity_reference": "  ", "parent_entity_reference": None},  # blank
    ]
    view = build_hierarchy(rows)
    assert [r.reference for r in view.roots] == ["APEX"]
    apex = view.roots[0]
    assert apex.is_apex and apex.scopes == ("consolidated", "individual")
    mid = apex.children[0]
    assert not mid.is_apex and mid.scopes == ("sub_consolidated", "individual")
    assert mid.children[0].scopes == ("individual",)
    reasons = {n.reference: reason for n, reason in view.unattached}
    assert reasons["SELF"] == "entity is its own parent"
    assert reasons["ORPH"] == "unknown parent 'GHOST'"
    assert reasons["APEX"] == "duplicate entity_reference"
    assert reasons["(missing reference)"] == "missing entity_reference"
    # exactly one cycle member surfaces as the display root of the cycle,
    # carrying the other as its reachable subtree — nothing dropped
    cyc = [n for n, reason in view.unattached if reason == "parent cycle"]
    assert len(cyc) == 1 and cyc[0].reference == "CYC_A"
    assert [c.reference for c in cyc[0].children] == ["CYC_B"]
    assert view.entity_count == 9


def test_method_sections_shared_scale():
    """method_sections (ref method_split.py): sections come out in
    METHOD_ORDER then unknowns alphabetically; every bar percentage is
    computed against ONE shared max across all sections and series; null
    values render as 0.0 and non-finite values cannot poison the scale."""
    from rwa_calculator_spark.ui_views import method_sections

    rows = [
        {"approach": "IRB", "exposure_class": "corporate", "rwa": 50.0, "ead": 100.0},
        {"approach": "SA", "exposure_class": "retail", "rwa": 200.0, "ead": None},
        {"approach": "ZZZ", "exposure_class": "other", "rwa": float("inf"), "ead": 10.0},
    ]
    secs = method_sections(rows, ("rwa", "ead"))
    assert [s["method"] for s in secs] == ["SA", "IRB", "ZZZ"]
    flat = {
        (s["method"], label, col): (value, pct)
        for s in secs
        for label, series in s["items"]
        for col, value, pct in series
    }
    # shared max is 200 (inf is dropped from the scale, None → 0.0)
    assert flat[("SA", "retail", "rwa")] == (200.0, 100.0)
    assert flat[("SA", "retail", "ead")] == (0.0, 0.0)
    assert flat[("IRB", "corporate", "rwa")] == (50.0, 25.0)
    assert flat[("ZZZ", "other", "rwa")][0] == 0.0  # non-finite renders 0.0
    assert method_sections([], ("rwa",)) == []  # empty → caller fallback


def test_ui_template_sheet_view(server):
    """Sheet-grid rendering (ref ui/views/report_templates.py): absent
    cells render as an em-dash, never 0.00 — the absent-≠-zero rule made
    visible; unknown templates 404."""
    status, html = _get_html(server, "/ui/templates/C02.00")
    assert status == 200
    assert "<table>" in html and "cells" in html
    status, _ = _get_html(server, "/ui/templates/NOPE")
    assert status == 404


def test_ui_validations_board(server):
    """Validation board: status badges use the evaluator vocabulary and a
    count strip leads the page."""
    status, html = _get_html(server, "/ui/validations")
    assert status == 200
    assert "PASS" in html and "rule_id" in html


def test_export_corep_workbook_endpoint(server):
    """GET /api/export/corep?only=... (ref corep/generator.py → Excel):
    writes the filtered quarterly-return workbook and lists its sheets;
    an unknown filter is a 400, not an empty workbook."""
    status, body = _get(server, "/api/export/corep?only=" + urllib.parse.quote("C 08.04"))
    assert status == 200
    assert body["sheets"] == ["metadata", "C 08.04"]
    import zipfile

    assert zipfile.is_zipfile(body["path"])
    status, _ = _get(server, "/api/export/corep?only=NOPE")
    assert status == 400


# ---------------------------------------------------------------------------
# Reconciliation sign-off workflow (ref ui/app/recon_signoff.py:51-263)
# ---------------------------------------------------------------------------

import os


@pytest.fixture(scope="module")
def signoff_state_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("signoff")
    os.environ["RWA_SPARK_STATE_DIR"] = str(d)
    yield str(d)
    del os.environ["RWA_SPARK_STATE_DIR"]


@pytest.fixture(scope="module")
def b31_job(server):
    # 202 = new background job; 200 = the server's cache-reuse path (an
    # identical b31 run already exists from the cross-regime recon test)
    status, resp = _post(server, "/api/calculate", {"regime": "b31", "irb": True})
    assert status in (200, 202)
    return _wait_done(server, resp["job_id"])


def test_recon_signoff_upsert_render_clear(server, done_job, b31_job, signoff_state_dir):
    """upsert → the worklist renders the disposition → clear reopens it;
    a moved break renders stale; bad actions are 400s."""
    ja, jb = done_job["job_id"], b31_job["job_id"]
    _, recon = _post(server, "/api/reconcile", {"job_a": ja, "job_b": jb})
    brk = next(r for r in recon["worklist"] if r["bucket"] == "break")
    key = f"{brk['exposure_reference']}|{brk['component']}"

    status, resp = _post(server, "/api/reconcile/decisions", {
        "job_a": ja, "job_b": jb, "action": "accept", "recon_key": key,
        "reason": "known regime delta",
    })
    assert status == 200
    assert resp["decisions"][key]["status"] == "accepted"
    workspace = resp["workspace"]

    status, html = _get_html(server, f"/ui/reconciliation?job_a={ja}&job_b={jb}")
    assert status == 200
    assert "disposition" in html
    assert "accepted" in html and "known regime delta" in html

    # a decision whose fingerprint no longer matches the break is STALE —
    # a moved difference is never waved through under an old approval
    status, _ = _post(server, "/api/reconcile/decisions", {
        "job_a": ja, "job_b": jb, "action": "reject", "recon_key": key,
        "reason": "moved", "fingerprint": "deadbeefdeadbeef",
    })
    status, html = _get_html(server, f"/ui/reconciliation?job_a={ja}&job_b={jb}")
    assert "stale" in html and "rejected" not in html

    # clear → the row reopens
    status, resp = _post(server, "/api/reconcile/decisions", {
        "job_a": ja, "job_b": jb, "action": "clear", "recon_key": key,
    })
    assert status == 200 and key not in resp["decisions"]
    status, html = _get_html(server, f"/ui/reconciliation?job_a={ja}&job_b={jb}")
    assert "stale" not in html and "accepted" not in html

    # validation: unknown action / missing key
    status, _ = _post(server, "/api/reconcile/decisions", {
        "job_a": ja, "job_b": jb, "action": "bless", "recon_key": key,
    })
    assert status == 400
    status, _ = _post(server, "/api/reconcile/decisions", {
        "job_a": ja, "job_b": jb, "action": "accept",
    })
    assert status == 400

    # leave one decision in place for the restart test below
    status, resp = _post(server, "/api/reconcile/decisions", {
        "job_a": ja, "job_b": jb, "action": "accept", "recon_key": key,
        "reason": "sticky",
    })
    assert status == 200 and resp["decisions"][key]["reason"] == "sticky"
    assert workspace == resp["workspace"]


def test_recon_signoff_survives_server_restart(spark, sf_dir, signoff_state_dir,
                                               done_job, b31_job):
    """A NEW server (fresh job index, fresh run ids) re-running the same
    regime pair lands on the same workspace — the decision recorded above
    is still there (the store is file-backed and keyed by the runs'
    semantic identity, never by job/run ids)."""
    with RwaRestServer(spark, sf_dir) as base2:
        _, r1 = _post(base2, "/api/calculate", {"regime": "crr", "irb": True})
        a2 = _wait_done(base2, r1["job_id"])["job_id"]
        _, r2 = _post(base2, "/api/calculate", {"regime": "b31", "irb": True})
        b2 = _wait_done(base2, r2["job_id"])["job_id"]
        status, body = _get(base2, f"/api/reconcile/decisions?job_a={a2}&job_b={b2}")
        assert status == 200
        assert any(d["reason"] == "sticky" for d in body["decisions"].values())


def test_job_event_stream_long_poll(server, signoff_state_dir):
    """Incremental progress streaming (ref ui/app/progress.py + the
    reference's /jobs/{id}/events): chained long-polls observe stage
    plan-build and seal events WHILE the run is in flight — at least two
    polls return events before done, and ≥3 stage/seal events arrive."""
    status, resp = _post(server, "/api/calculate",
                         {"regime": "crr", "irb": True, "force": True})
    assert status == 202
    jid = resp["job_id"]
    cursor, collected, polls_with_events_while_running = 0, [], 0
    for _ in range(300):
        status, body = _get(server, f"/jobs/{jid}/events?since={cursor}&wait=5")
        assert status == 200
        if body["events"] and not body["done"]:
            polls_with_events_while_running += 1
        collected += [e["msg"] for e in body["events"]]
        cursor = body["next_cursor"]
        if body["done"]:
            break
    stagey = [m for m in collected if m.startswith(("stage ", "sealed "))]
    assert len(stagey) >= 3, collected
    assert any(m.startswith("stage ") for m in collected)
    assert any(m.startswith("sealed results") for m in collected)
    assert polls_with_events_while_running >= 2, collected
    assert collected and collected[-1].startswith("pipeline done")
    # unknown job → 404, cursor past the end → empty immediately
    status, _ = _get(server, "/jobs/nope/events")
    assert status == 404
    status, body = _get(server, f"/jobs/{jid}/events?since={cursor}&wait=0")
    assert status == 200 and body["events"] == [] and body["done"]
