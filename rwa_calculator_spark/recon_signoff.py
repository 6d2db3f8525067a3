"""Per-workspace sign-off store for reconciliation breaks.

Same analyst workflow the reference ships (ref ui/app/recon_signoff.py:
51-263 — accept/reject dispositions that survive restarts, fingerprint
staleness, IO that never breaks the click), re-designed for this engine:

- **Semantic workspace identity.** The workspace id hashes WHAT was
  reconciled — dataset directory, the two runs' regimes + rulepack content
  hashes and the join keys — never job/run ids, so a re-run of the same
  comparison lands on the same stored decisions while two different regime
  pairs never collide.
- **Run-registry storage layout.** Unlike the reference's nested
  per-workspace dict, the store is a flat, append-ordered record log
  (``{"version": 1, "records": [...]}``) in the spirit of this repo's
  parquet run registry: each record is one fully-self-describing
  disposition event ``(workspace, key, status, reason, fingerprint,
  decided_at)``; load replays the log last-write-wins and a cleared key is
  a ``status: "reopened"`` event, so the file is also a coarse audit trail
  of WHO overrode WHAT (the reference keeps only the final state).
- **Only terminal dispositions render.** ``accepted`` / ``rejected``;
  ``open`` is the implicit default; ``reopened`` tombstones suppress
  earlier records at load.
- **Fingerprint staleness.** A decision snapshots the break's shape; when
  a later run shows a DIFFERENT break under the same key the worklist
  renders ``stale`` instead of waving a moved difference through. An empty
  fingerprint never goes stale.
- **IO never breaks the click.** A missing/corrupt store reads as empty;
  a malformed record is skipped; write failures log and swallow.

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
from typing import Iterator, Optional

logger = logging.getLogger(__name__)

STATE_DIR_ENV_VAR = "RWA_SPARK_STATE_DIR"
_STATE_FILENAME = "reconciliation_signoff.json"

STATUS_OPEN = "open"
STATUS_STALE = "stale"
_REOPENED = "reopened"  # tombstone event, never rendered
VALID_STATUSES = frozenset({"accepted", "rejected"})
_RECORD_FIELDS = ("workspace", "key", "status", "reason", "fingerprint", "decided_at")


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
    """Stable id for "this dataset reconciled under these two rule sets"."""
    canonical = "\n".join(
        [str(Path(sf_dir).expanduser().resolve()), regime_a, hash_a, regime_b,
         hash_b, "|".join(keys)]
    )
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()[:16]


def break_fingerprint(ours, theirs, diff) -> str:
    """Snapshot of a break's shape at sign-off time (staleness detection)."""
    payload = f"{ours!r}|{theirs!r}|{diff!r}"
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:16]


def disposition(
    decision: Optional[Decision], current_fingerprint: str
) -> tuple[str, str]:
    """(disposition, reason) a worklist row renders: ``open`` with no
    decision; the decided status while the break still looks the same;
    ``stale`` when the break has MOVED since sign-off. Pre-fingerprint
    decisions (empty fingerprint) cannot tell, so they never go stale."""
    if decision is None:
        return STATUS_OPEN, ""
    if decision.fingerprint and decision.fingerprint != current_fingerprint:
        return STATUS_STALE, decision.reason
    return decision.status, decision.reason


# -- record-log store ----------------------------------------------------------


class _RecordLog:
    """Flat disposition-event log with last-write-wins replay."""

    def __init__(self, path: Path):
        self.path = path

    def replay(self, workspace: str) -> dict[str, Decision]:
        """Fold the log into the workspace's live decisions: later records
        win, ``reopened`` tombstones delete."""
        live: dict[str, Decision] = {}
        for rec in self._events():
            if rec["workspace"] != workspace:
                continue
            if rec["status"] == _REOPENED:
                live.pop(rec["key"], None)
            else:
                live[rec["key"]] = Decision(
                    status=rec["status"],
                    reason=rec["reason"],
                    decided_at=rec["decided_at"],
                    fingerprint=rec["fingerprint"],
                )
        return live

    def append(self, workspace: str, key: str, status: str,
               reason: str = "", fingerprint: str = "") -> None:
        events = list(self._events())
        events.append({
            "workspace": workspace,
            "key": key,
            "status": status,
            "reason": reason,
            "fingerprint": fingerprint,
            "decided_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        })
        self._write(events)

    def drop_workspace(self, workspace: str) -> None:
        kept = [e for e in self._events() if e["workspace"] != workspace]
        self._write(kept)

    # A malformed record (wrong shape, unknown status, non-string field)
    # is skipped — one bad event must never blank the worklist.
    def _events(self) -> Iterator[dict]:
        for candidate in self._raw_records():
            rec = self._conform(candidate)
            if rec is not None:
                yield rec

    @staticmethod
    def _conform(candidate) -> Optional[dict]:
        try:
            rec = {f: candidate[f] for f in _RECORD_FIELDS}
        except (TypeError, KeyError, IndexError):
            return None
        if rec["status"] not in VALID_STATUSES | {_REOPENED}:
            return None
        if any(not isinstance(v, str) for v in rec.values()):
            return None
        return rec

    def _raw_records(self) -> list:
        try:
            with self.path.open(encoding="utf-8") as fh:
                doc = json.load(fh)
            records = doc["records"]
            return records if isinstance(records, list) else []
        except FileNotFoundError:
            return []
        except (OSError, ValueError, TypeError, KeyError):
            logger.warning("ignoring unreadable sign-off store", exc_info=True)
            return []

    def _write(self, events: list[dict]) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        doc = {"version": 1, "records": events}
        tmp = self.path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(doc, indent=1), encoding="utf-8")
        os.replace(tmp, self.path)


def _log() -> _RecordLog:
    override = os.environ.get(STATE_DIR_ENV_VAR)
    base = Path(override) if override else Path.home() / ".rwa_calculator_spark"
    return _RecordLog(base / _STATE_FILENAME)


# -- public API (consumed by rest.py worklist routes) --------------------------


def load_decisions(workspace: str) -> dict[str, Decision]:
    return _log().replay(workspace)


def upsert_decision(
    workspace: str, recon_key: str, status: str, reason: str, fingerprint: str = ""
) -> None:
    """Record one disposition event. Invalid status is a caller bug (the
    route validates first); IO failure is logged and swallowed so a
    sign-off click can never surface a 500."""
    if status not in VALID_STATUSES:
        raise ValueError(
            f"status must be one of {sorted(VALID_STATUSES)}, got {status!r}"
        )
    try:
        _log().append(workspace, recon_key, status, reason, fingerprint)
    except OSError:
        logger.warning("could not save reconciliation sign-off", exc_info=True)


def clear_decision(workspace: str, recon_key: str) -> None:
    """The *reopen* action — appends a tombstone; missing key is harmless."""
    try:
        _log().append(workspace, recon_key, _REOPENED)
    except OSError:
        logger.warning("could not clear reconciliation sign-off", exc_info=True)


def clear_all_decisions(workspace: str) -> None:
    try:
        _log().drop_workspace(workspace)
    except OSError:
        logger.warning("could not clear reconciliation sign-offs", exc_info=True)
