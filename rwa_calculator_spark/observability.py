"""Audit cache + calculation run index (ref observability/audit_cache.py,
api/run_index.py).

Audit cache: an opt-in, cross-cutting diagnostics sink. Pipeline stages hand
intermediate frames to a sink callable at existing hook points; when the
user opted in (``audit_cache_dir`` set) each frame persists as
``<audit_cache_dir>/<run_id>/<name>/`` parquet, written atomically
(``<name>.tmp`` + ``os.replace``) with swallow-and-log failure semantics —
audit caching must never perturb or break a real run. ``prune_audit_cache``
trims the cache to the newest N run subdirectories.

Run index: "has this exact calculation already been run?" A calculation
request is fingerprinted from its run parameters plus a stat-based
signature (relative path, size, mtime_ns) of every input file — reuse is
conservative by construction: any input change, addition or removal
produces a different fingerprint. Successful runs register by fingerprint
(latest wins, capped with oldest-evicted); callers compute the fingerprint
BEFORE running and look up before re-running. Optionally persists to
``<state_dir>/run_index.json`` so reuse survives restarts.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import shutil
from collections import OrderedDict
from typing import Mapping, Sequence

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

MAX_INDEXED_RUNS = 64


# ---------------------------------------------------------------------------
# Audit cache (ref observability/audit_cache.py)
# ---------------------------------------------------------------------------


def sink_audit(
    frame: DataFrame, audit_cache_dir: str | None, run_id: str, name: str
) -> None:
    """Persist a frame as ``<audit_cache_dir>/<run_id>/<name>/`` parquet.

    No-ops when ``audit_cache_dir`` is None (the default — opt-in).
    Atomic: writes to ``<name>.tmp`` then ``os.replace``; a previous
    artifact at the destination is overwritten. Failures are swallowed and
    logged — a diagnostics side-effect must never break a real run."""
    if audit_cache_dir is None:
        return
    try:
        run_dir = os.path.join(audit_cache_dir, run_id)
        os.makedirs(run_dir, exist_ok=True)
        tmp = os.path.join(run_dir, f"{name}.tmp")
        dst = os.path.join(run_dir, name)
        frame.write.mode("overwrite").parquet(tmp)
        if os.path.exists(dst):
            shutil.rmtree(dst, ignore_errors=True)
        os.replace(tmp, dst)
    except Exception:  # noqa: BLE001 — swallow-and-log by contract
        logger.warning("audit-cache sink failed for %s/%s", run_id, name, exc_info=True)


def prune_audit_cache(audit_cache_dir: str, max_runs: int = 20) -> list[str]:
    """Trim the cache to the ``max_runs`` NEWEST run subdirectories (by
    mtime); returns the removed run ids. Swallow-and-log per directory."""
    try:
        entries = [
            (e.stat().st_mtime, e.name, e.path)
            for e in os.scandir(audit_cache_dir)
            if e.is_dir()
        ]
    except OSError:
        return []
    entries.sort(reverse=True)
    removed = []
    for _, name, path in entries[max_runs:]:
        try:
            shutil.rmtree(path)
            removed.append(name)
        except OSError:
            logger.warning("audit-cache prune failed for %s", path, exc_info=True)
    return removed


# ---------------------------------------------------------------------------
# Run index (ref api/run_index.py)
# ---------------------------------------------------------------------------


def _input_signature(input_paths: Sequence[str]) -> list[list]:
    """Stat-based signature of every input file the loader would read:
    (relative name, size, mtime_ns), files under a directory enumerated
    sorted. Conservative by construction — any change, addition or removal
    of an input changes the signature."""
    sig: list[list] = []
    for p in sorted(input_paths):
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    sig.append([os.path.relpath(fp, p), st.st_size, st.st_mtime_ns])
        else:
            st = os.stat(p)
            sig.append([os.path.basename(p), st.st_size, st.st_mtime_ns])
    return sig


def compute_fingerprint(params: Mapping, input_paths: Sequence[str]) -> str:
    """Fingerprint = run parameters + input-file stat signature."""
    payload = {
        "params": {k: params[k] for k in sorted(params)},
        "inputs": _input_signature(input_paths),
    }
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True, default=str).encode()
    ).hexdigest()[:32]


class RunIndex:
    """Index completed, successful runs by fingerprint (latest wins) so a
    caller can reuse the cached response instead of re-running. Capped at
    ``MAX_INDEXED_RUNS`` with oldest-evicted; optionally persisted to
    ``<state_dir>/run_index.json`` (written through on every registration,
    reloaded at construction)."""

    def __init__(self, state_dir: str | None = None, max_runs: int = MAX_INDEXED_RUNS):
        self._runs: OrderedDict[str, dict] = OrderedDict()
        self._max = max_runs
        self._state_path = (
            os.path.join(state_dir, "run_index.json") if state_dir else None
        )
        if self._state_path and os.path.exists(self._state_path):
            try:
                with open(self._state_path) as f:
                    self._runs = OrderedDict(json.load(f))
            except (OSError, ValueError):
                logger.warning("run-index reload failed", exc_info=True)

    def register(self, fingerprint: str, payload: dict) -> None:
        """Register a SUCCESSFUL run. Latest wins; oldest evicted past the
        cap (index entry only — run artifacts are never deleted here, a
        results page may still be serving them)."""
        self._runs.pop(fingerprint, None)
        self._runs[fingerprint] = payload
        while len(self._runs) > self._max:
            self._runs.popitem(last=False)
        if self._state_path:
            try:
                os.makedirs(os.path.dirname(self._state_path), exist_ok=True)
                tmp = self._state_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(list(self._runs.items()), f, sort_keys=True)
                os.replace(tmp, self._state_path)
            except OSError:
                logger.warning("run-index persist failed", exc_info=True)

    def entries(self) -> list[tuple[str, dict]]:
        """All indexed runs, oldest first (ref api/run_index.py:220
        entries() — the run-registry listing the /api/runs surface and the
        ops tooling read; payloads only, artifacts stay on disk)."""
        return list(self._runs.items())

    def find_reusable(
        self,
        fingerprint: str,
        params: Mapping | None = None,
        input_paths: Sequence[str] | None = None,
    ) -> dict | None:
        """Return the cached payload for ``fingerprint``, re-verifying
        freshness when the caller supplies params + input_paths: if an
        input file changed since registration the recomputed fingerprint
        no longer matches and the stale run is never reused."""
        payload = self._runs.get(fingerprint)
        if payload is None:
            return None
        if params is not None and input_paths is not None:
            if compute_fingerprint(params, input_paths) != fingerprint:
                return None
        return payload


# ---------------------------------------------------------------------------
# Run-id correlation context (ref observability/context.py +
# logging_setup.py): every LogRecord emitted during a pipeline run carries
# the active run_id, so logs, audit-cache subdirectories and the run
# manifest all correlate on one id.
# ---------------------------------------------------------------------------

import contextlib
import contextvars

_current_run_id: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "rwa_run_id", default=None
)


def current_run_id() -> str | None:
    return _current_run_id.get()


@contextlib.contextmanager
def run_context(run_id: str):
    """Bind the active run id for the duration of a pipeline run."""
    token = _current_run_id.set(run_id)
    try:
        yield run_id
    finally:
        _current_run_id.reset(token)


class RunIdFilter(logging.Filter):
    """Attach ``run_id`` to every record (or '-' outside a run) — install
    once on the root handler; format with ``%(run_id)s``."""

    def filter(self, record: logging.LogRecord) -> bool:
        record.run_id = current_run_id() or "-"
        return True


def configure_logging(level: int = logging.INFO) -> logging.Logger:
    """Idempotent logging setup with the run-id correlation filter (ref
    observability/logging_setup.py)."""
    root = logging.getLogger("rwa_calculator_spark")
    if not any(isinstance(f, RunIdFilter) for f in root.filters):
        root.addFilter(RunIdFilter())
    root.setLevel(level)
    return root
