"""Cross-template consistency (tie-out) checker (ref reporting/tieouts.py).

The reference reshapes one sealed per-leg ledger into many fixed-format
templates (COREP C 02.00 / C 07.00 / C 08.01, Pillar 3 OV1) and then asserts
an EXPLICIT, curated list of genuinely comparable aggregate pairs foots
across the independently-generated templates — never a blind equality sweep,
because per-template reporting bases differ BY REGULATION. Pairs that must
NOT be tied are recorded as ``NonComparablePair`` with the regulatory reason,
so a future maintainer does not "close the gap" with a naive equality that
would flag a correct figure as a break.

Spark-first shape: every template aggregate is produced by the engine's
fixed-point ``scaled_sum`` (functions/exact.py), so group-then-sum equals
total bit-for-bit regardless of partitioning — the ties are exact here even
though the reference needs rtol=1e-9 for its eager/lazy float-sum paths. The
tolerance machinery is kept anyway (per-tie rtol/atol): a tie is an identity
between template cells, not an implementation detail of today's arithmetic.

Findings go on the error channel (accumulate-don't-throw): a broken tie is a
``TIE001`` row, an absent template/cell SKIPS the tie (absent ≠ break, and
vacuous ≠ pass — skipped ties are reported with status 'skipped').
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

# Golden tolerance convention (ref tieouts.py DEFAULT_RTOL/DEFAULT_ATOL):
# relative 1e-9 with a small absolute floor for near-zero sums.
DEFAULT_RTOL = 1e-9
DEFAULT_ATOL = 1e-6

ERROR_CROSS_TEMPLATE_INCONSISTENCY = "TIE001"

# A tie extractor reads one scalar aggregate out of the (COREP, Pillar 3)
# cell-dict pair, or None to signal "this template / cell was not produced".
_Extractor = Callable[
    [Mapping[str, float], Mapping[str, float]], Optional[float]
]


@dataclass(frozen=True)
class TieOut:
    """One curated cross-template identity that must hold within tolerance.

    ``lhs``/``rhs`` are pure extractors over the (COREP, Pillar 3) cell
    dicts. Each returns a scalar or None when its template/cell is absent —
    in which case the whole tie is SKIPPED (an absent template is not a
    break). A tie fires a finding only when both sides resolve and disagree
    by more than ``atol + rtol * max(|lhs|, |rhs|)``.
    """

    name: str
    description: str
    regulatory_reference: str
    templates: tuple[str, ...]
    lhs_label: str
    rhs_label: str
    lhs: _Extractor
    rhs: _Extractor
    rtol: float = DEFAULT_RTOL
    atol: float = DEFAULT_ATOL


@dataclass(frozen=True)
class NonComparablePair:
    """A pair of templates that must NOT be tied, with the regulatory reason
    (ref tieouts.py NonComparablePair — asserting equality between templates
    whose reporting bases differ by regulation would flag a CORRECT figure
    as a break)."""

    pair: tuple[str, str]
    reason: str
    regulatory_reference: str


def _cell(cells: Mapping[str, float], key: str) -> Optional[float]:
    return cells.get(key)


def _sum_prefix(
    cells: Mapping[str, float], prefix: str, scale: int = 2
) -> Optional[float]:
    """Fixed-point sum of a template's sheets at the estate's cell scale —
    order-independent, so the tie evaluation never depends on dict/collect
    ordering (the same reason the engine aggregates via scaled_sum)."""
    m = 10**scale
    vals = [v for k, v in cells.items() if k.startswith(prefix) and v is not None]
    if not vals:
        return None
    return sum(int(round(v * m)) for v in vals) / m


# Curated ties over the template estate this repo produces. Cell keys:
#   COREP dict:   "C02.00|total", "C02.00|sa", "C02.00|irb",
#                 "C07.00|<class>" (SA RWEA per class),
#                 "C08.01|<class>" (IRB RWEA per class)
#   Pillar3 dict: "OV1|credit_risk_sa", "OV1|credit_risk_irb", "OV1|total"
TIE_OUTS: tuple[TieOut, ...] = (
    TieOut(
        name="total_rwea_c02_vs_ov1",
        description="C 02.00 [0010] total RWEA equals the OV1 total row.",
        regulatory_reference="CRR Art.92(3); COREP Annex II C 02.00; CRR Art.438 OV1",
        templates=("C 02.00", "OV1"),
        lhs_label="C 02.00 [0010] (total RWEA)",
        rhs_label="OV1 [29] (total)",
        lhs=lambda c, p: _cell(c, "C02.00|total"),
        rhs=lambda c, p: _cell(p, "OV1|total"),
    ),
    TieOut(
        name="credit_risk_rollup_c02",
        description=(
            "C 02.00 [0010] equals the SA of-which plus the IRB of-which row"
            " (total credit risk roll-up)."
        ),
        regulatory_reference="CRR Art.92(3)(a); COREP Annex II C 02.00 rows 0060/0250",
        templates=("C 02.00",),
        lhs_label="C 02.00 [0010]",
        rhs_label="C 02.00 [0060] + [0250]",
        lhs=lambda c, p: _cell(c, "C02.00|total"),
        rhs=lambda c, p: (
            None
            if _cell(c, "C02.00|sa") is None or _cell(c, "C02.00|irb") is None
            else _cell(c, "C02.00|sa") + _cell(c, "C02.00|irb")
        ),
    ),
    TieOut(
        name="sa_rwea_c07_vs_c02",
        description=(
            "Aggregate SA RWEA across the C 07.00 exposure-class sheets"
            " equals the C 02.00 SA of-which row."
        ),
        regulatory_reference="COREP Annex II C 07.00 col 0220 vs C 02.00 row 0060",
        templates=("C 07.00", "C 02.00"),
        lhs_label="Σ C 07.00 sheets (SA RWEA)",
        rhs_label="C 02.00 [0060] (SA of-which)",
        lhs=lambda c, p: _sum_prefix(c, "C07.00|"),
        rhs=lambda c, p: _cell(c, "C02.00|sa"),
    ),
    TieOut(
        name="irb_rwea_c08_01_vs_c02",
        description=(
            "Aggregate IRB RWEA across the C 08.01 class sheets equals the"
            " C 02.00 IRB of-which row."
        ),
        regulatory_reference="COREP Annex II C 08.01 col 0260 vs C 02.00 row 0250",
        templates=("C 08.01", "C 02.00"),
        lhs_label="Σ C 08.01 sheets (IRB RWEA)",
        rhs_label="C 02.00 [0250] (IRB of-which)",
        lhs=lambda c, p: _sum_prefix(c, "C08.01|"),
        rhs=lambda c, p: _cell(c, "C02.00|irb"),
    ),
    TieOut(
        name="irb_rwea_c08_01_vs_ov1",
        description=(
            "Aggregate IRB RWEA across the C 08.01 class sheets equals the"
            " OV1 IRB row."
        ),
        regulatory_reference="COREP Annex II C 08.01; CRR Art.438 OV1 rows 3-5",
        templates=("C 08.01", "OV1"),
        lhs_label="Σ C 08.01 sheets (IRB RWEA)",
        rhs_label="OV1 (credit risk IRB)",
        lhs=lambda c, p: _sum_prefix(c, "C08.01|"),
        rhs=lambda c, p: _cell(p, "OV1|credit_risk_irb"),
    ),
    # --- full C 02.00 row-set identities (round 7: corep_c02 renders the
    # whole CRR layout; these foot the template internally so every class
    # sheet reconciles INTO it — ref c02.py _warn_if_irb_detail_strands) ---
    TieOut(
        name="sa_class_rows_partition_c02",
        description=(
            "The SA Art.112 class rows 0070-0211 (incl. the defaulted row"
            " 0160) partition the SA of-which row 0060 exactly."
        ),
        regulatory_reference="COREP Annex II §1.3.1 C 02.00 rows 0070-0211",
        templates=("C 02.00",),
        lhs_label="Σ C 02.00 class rows [0070-0211]",
        rhs_label="C 02.00 [0060]",
        lhs=lambda c, p: _cell(c, "C02.00|sa_class_sum"),
        rhs=lambda c, p: _cell(c, "C02.00|row|0060"),
    ),
    TieOut(
        name="airb_class_rows_partition_c02",
        description=(
            "The A-IRB class rows 0310-0410 partition the A-IRB of-which"
            " row 0300, and F-IRB + A-IRB partition the IRB row 0220."
        ),
        regulatory_reference="COREP Annex II C 02.00 rows 0240/0300",
        templates=("C 02.00",),
        lhs_label="Σ C 02.00 A-IRB class rows + [0240]",
        rhs_label="C 02.00 [0220]",
        lhs=lambda c, p: (
            None
            if _cell(c, "C02.00|row|0240") is None
            or _cell(c, "C02.00|airb_class_sum") is None
            else _cell(c, "C02.00|airb_class_sum")
            + _cell(c, "C02.00|row|0240")
        ),
        rhs=lambda c, p: _cell(c, "C02.00|row|0220"),
    ),
    TieOut(
        name="own_funds_requirement_8pct",
        description="C 02.00 [0040] equals 8% of the total REA row 0010.",
        regulatory_reference="CRR Art.92(1)(c)/(3); COREP Annex II C 02.00 row 0040",
        templates=("C 02.00",),
        lhs_label="C 02.00 [0040]",
        rhs_label="8% × C 02.00 [0010]",
        lhs=lambda c, p: _cell(c, "C02.00|row|0040"),
        rhs=lambda c, p: (
            None
            if _cell(c, "C02.00|row|0010") is None
            else _cell(c, "C02.00|row|0010") * 0.08
        ),
    ),
)

# Deliberately un-tied pairs, recorded with the regulatory reason (ref
# tieouts.py NON_COMPARABLE_PAIRS — the guard against naive equality sweeps).
NON_COMPARABLE_PAIRS: tuple[NonComparablePair, ...] = (
    NonComparablePair(
        pair=("UK CR6", "C 08.01"),
        reason=(
            "CR6 buckets RWEA by PD band under the obligor's ORIGIN class"
            " while C 08.01 reports post-substitution class RWEA; the two"
            " diverge whenever guarantee substitution moves an exposure"
            " across classes, so no CR6 class aggregate may be equated with"
            " a C 08.01 sheet."
        ),
        regulatory_reference="PS1/26 Annex XXII; CRR Art.235/236",
    ),
    NonComparablePair(
        pair=("UK CR4", "C 07.00"),
        reason=(
            "CR4 reports pre- and post-CCF/CRM exposure values on the"
            " obligor basis with both on- and off-balance columns; C 07.00"
            " reports the post-CRM EAD under the applied class. Only the"
            " final RWEA column is comparable, and that tie is carried via"
            " C 02.00 row 0060 instead."
        ),
        regulatory_reference="EBA ITS Annex I CR4; COREP Annex II C 07.00",
    ),
    NonComparablePair(
        pair=("UK CR5", "C 07.00"),
        reason=(
            "CR5 splits SA exposure by risk-weight band on the pre-CRM"
            " basis (two-basis geographic and RW splits); C 07.00 is"
            " post-CRM per class. Equating band sums with class sums would"
            " break whenever CRM moves exposure across risk weights."
        ),
        regulatory_reference="EBA ITS Annex I CR5; CRR Art.444",
    ),
)


@dataclass(frozen=True)
class TieFinding:
    """One evaluated tie: status ∈ {tie, break, skipped}."""

    code: str
    name: str
    status: str
    lhs_label: str
    rhs_label: str
    lhs: Optional[float]
    rhs: Optional[float]
    diff: Optional[float]


def check_cross_template_consistency(
    corep: Mapping[str, float],
    pillar3: Mapping[str, float],
    ties: Sequence[TieOut] = TIE_OUTS,
) -> list[TieFinding]:
    """Evaluate the curated ties; accumulate findings, never raise (ref
    tieouts.py check_cross_template_consistency). A tie whose lhs or rhs
    extractor returns None is 'skipped' — a missing template is not an
    inconsistency; only both-resolved disagreement beyond tolerance is a
    TIE001 'break'."""
    findings: list[TieFinding] = []
    for tie in ties:
        lhs = tie.lhs(corep, pillar3)
        rhs = tie.rhs(corep, pillar3)
        if lhs is None or rhs is None:
            findings.append(
                TieFinding(
                    ERROR_CROSS_TEMPLATE_INCONSISTENCY, tie.name, "skipped",
                    tie.lhs_label, tie.rhs_label, lhs, rhs, None,
                )
            )
            continue
        tol = tie.atol + tie.rtol * max(abs(lhs), abs(rhs))
        diff = lhs - rhs
        status = "tie" if abs(diff) <= tol else "break"
        findings.append(
            TieFinding(
                ERROR_CROSS_TEMPLATE_INCONSISTENCY, tie.name, status,
                tie.lhs_label, tie.rhs_label, lhs, rhs, diff,
            )
        )
    return findings


_FINDINGS_SCHEMA = (
    "tie_name string, status string, lhs_label string, rhs_label string, "
    "lhs double, rhs double"
)


def findings_frame(spark: SparkSession, findings: Sequence[TieFinding]) -> DataFrame:
    """Findings as a (tiny, driver-sized by design) DataFrame for the error
    channel / driver query surface."""
    rows = [
        (f.name, f.status, f.lhs_label, f.rhs_label, f.lhs, f.rhs)
        for f in findings
    ]
    return spark.createDataFrame(rows, _FINDINGS_SCHEMA)
