"""Per-workspace sign-off store for reconciliation breaks (ref
ui/app/recon_signoff.py:51-263 — the analyst's accept/reject disposition
workflow, re-keyed for this engine's two-run reconciliations).

Semantics carried over from the reference:

- **Decisions survive restarts and re-runs.** The store is a JSON file
  (atomic temp-file + ``os.replace`` writes); the workspace id hashes the
  SEMANTIC identity of a reconciliation — here the dataset directory, the
  two runs' regimes + rulepack content hashes and the join keys — so
  re-running the same comparison (new job ids, new run ids) lands on the
  same stored decisions, while two different regime pairs never collide.
- **Only terminal dispositions persist.** ``accepted`` / ``rejected``;
  ``open`` is the implicit, unstored default.
- **Fingerprint staleness.** Each decision snapshots what the break looked
  like (ours/theirs/diff). When a later run shows a DIFFERENT break under
  the same key, the worklist renders the decision ``stale`` rather than
  waving a moved difference through under an old approval; an empty
  fingerprint never goes stale.
- **IO never breaks the click.** Saving/loading swallows errors (a missing
  or corrupt store is an empty decision set; one invalid record is skipped,
  never blanking the worklist).

Store path: ``$RWA_SPARK_STATE_DIR/reconciliation_signoff.json`` when set
(the test seam), else ``~/.rwa_calculator_spark/…``.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

STATE_DIR_ENV_VAR = "RWA_SPARK_STATE_DIR"
_STATE_FILENAME = "reconciliation_signoff.json"

STATUS_OPEN = "open"
STATUS_STALE = "stale"
VALID_STATUSES = frozenset({"accepted", "rejected"})


@dataclass(frozen=True)
class Decision:
    status: str
    reason: str
    decided_at: str
    fingerprint: str = ""


def workspace_id(
    sf_dir: str,
    regime_a: str,
    hash_a: str,
    regime_b: str,
    hash_b: str,
    keys: tuple[str, ...] = ("exposure_reference",),
) -> str:
    """Stable id for "this dataset reconciled under these two rule sets".

    Built from resolved inputs, never job/run ids — a re-run of the same
    comparison (even after a server restart) maps to the same decisions
    (ref recon_signoff.py workspace_id: "the semantic identity of a
    reconciliation")."""
    canonical = "\n".join(
        [str(Path(sf_dir).expanduser().resolve()), regime_a, hash_a, regime_b,
         hash_b, "|".join(keys)]
    )
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()[:16]


def break_fingerprint(ours, theirs, diff) -> str:
    """Snapshot of a break's shape at sign-off time (staleness detection)."""
    payload = f"{ours!r}|{theirs!r}|{diff!r}"
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:16]


def load_decisions(workspace: str) -> dict[str, Decision]:
    entry = _load_store().get(workspace)
    if not isinstance(entry, dict):
        return {}
    raw = entry.get("decisions")
    if not isinstance(raw, dict):
        return {}
    out: dict[str, Decision] = {}
    for key, rec in raw.items():
        d = _decision_from_raw(rec)
        if d is not None:
            out[str(key)] = d
    return out


def upsert_decision(
    workspace: str, recon_key: str, status: str, reason: str, fingerprint: str = ""
) -> None:
    """Record (or overwrite) one disposition. Invalid status is a caller
    bug (the route validates first); IO failure is logged and swallowed so
    a sign-off click can never surface a 500."""
    if status not in VALID_STATUSES:
        raise ValueError(f"status must be one of {sorted(VALID_STATUSES)}, got {status!r}")
    try:
        store = _load_store()
        entry = store.get(workspace)
        if not isinstance(entry, dict):
            entry = {}
        decisions = entry.get("decisions")
        if not isinstance(decisions, dict):
            decisions = {}
        decisions[recon_key] = {
            "status": status,
            "reason": reason,
            "fingerprint": fingerprint,
            "decided_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        }
        entry["decisions"] = decisions
        store[workspace] = entry
        _save_store(store)
    except (OSError, TypeError):
        logger.warning("could not save reconciliation sign-off", exc_info=True)


def clear_decision(workspace: str, recon_key: str) -> None:
    """The *reopen* action; missing workspace/key is a no-op."""
    try:
        store = _load_store()
        entry = store.get(workspace)
        if isinstance(entry, dict) and isinstance(entry.get("decisions"), dict):
            entry["decisions"].pop(recon_key, None)
            _save_store(store)
    except (OSError, TypeError):
        logger.warning("could not clear reconciliation sign-off", exc_info=True)


def clear_all_decisions(workspace: str) -> None:
    try:
        store = _load_store()
        if workspace in store:
            store.pop(workspace, None)
            _save_store(store)
    except (OSError, TypeError):
        logger.warning("could not clear reconciliation sign-offs", exc_info=True)


def disposition(
    decision: Optional[Decision], current_fingerprint: str
) -> tuple[str, str]:
    """(disposition, reason) a worklist row renders: ``open`` with no
    decision; the decided status while the break still looks the same;
    ``stale`` when the break has MOVED since sign-off (a changed difference
    is never waved through under an old approval). Pre-fingerprint
    decisions (empty fingerprint) cannot tell, so they never go stale."""
    if decision is None:
        return STATUS_OPEN, ""
    if decision.fingerprint and decision.fingerprint != current_fingerprint:
        return STATUS_STALE, decision.reason
    return decision.status, decision.reason


# -- private ------------------------------------------------------------------


def _decision_from_raw(rec) -> Optional[Decision]:
    if not isinstance(rec, dict):
        return None
    status = rec.get("status")
    reason = rec.get("reason", "")
    decided_at = rec.get("decided_at", "")
    fingerprint = rec.get("fingerprint", "")
    if (
        status not in VALID_STATUSES
        or not isinstance(reason, str)
        or not isinstance(decided_at, str)
        or not isinstance(fingerprint, str)
    ):
        return None
    return Decision(status, reason, decided_at, fingerprint)


def _load_store() -> dict:
    path = _state_file()
    if not path.exists():
        return {}
    try:
        raw = json.loads(path.read_text(encoding="utf-8"))
    except (OSError, ValueError):
        logger.warning("ignoring unreadable sign-off store", exc_info=True)
        return {}
    return raw if isinstance(raw, dict) else {}


def _save_store(store: dict) -> None:
    path = _state_file()
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(json.dumps(store, indent=2, sort_keys=True), encoding="utf-8")
    os.replace(tmp, path)


def _state_file() -> Path:
    override = os.environ.get(STATE_DIR_ENV_VAR)
    base = Path(override) if override else Path.home() / ".rwa_calculator_spark"
    return base / _STATE_FILENAME
