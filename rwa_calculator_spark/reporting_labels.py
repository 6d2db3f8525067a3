"""Supervisor-facing template metadata: titles, legal bases, DPM column
codes and column labels (ref corep/templates.py — the reference's 2,134-LoC
cell-label/DPM catalogue, distilled to the template estate this repo ships).

All content is public-regulation text: COREP template titles and column
labels follow Reg (EU) 2021/451 Annex I/II (as onshored) and PRA PS1/26
Annex II instructions; the Pillar 3 sheets follow PS1/26 Annex XXII (UK
OV1/CR*/CMS*/CCR* disclosure templates). The catalogue exists so the
quarterly-return workbook renders sheets a supervisor can read without the
query registry open: each sheet carries its long title + legal basis and a
per-column (DPM code, label) row above the machine header.

Column resolution is name-driven: registry queries already encode the DPM
column code in their output names (``avg_pd_0010`` → ``0010``), so labels
attach without a second hand-maintained mapping of query outputs — the
code IS the join key, and semantic (non-DPM) columns fall back to a shared
glossary keyed by name.
"""

from __future__ import annotations

import re

#: sheet title → (long supervisory title, legal basis). Titles are the
#: published template names (Reg (EU) 2021/451 Annex I; PS1/26 Annex XXII).
TEMPLATE_TITLES: dict[str, tuple[str, str]] = {
    "C 07.00": (
        "Credit and counterparty credit risks and free deliveries: "
        "Standardised Approach to capital requirements",
        "Reg (EU) 2021/451 Annex I; CRR Part Three Title II Chapter 2",
    ),
    "C 08.01": (
        "Credit and counterparty credit risks and free deliveries: IRB "
        "Approach to capital requirements",
        "Reg (EU) 2021/451 Annex I; CRR Part Three Title II Chapter 3",
    ),
    "C 08.02": (
        "Credit risk IRB Approach: breakdown by obligor grade or pool (PD "
        "master-scale rows)",
        "Reg (EU) 2021/451 Annex I; CRR Art.142-191",
    ),
    "C 08.03": (
        "Credit risk IRB Approach: breakdown by PD ranges",
        "Reg (EU) 2021/451 Annex I",
    ),
    "C 08.04": (
        "Credit risk IRB Approach: RWEA flow statements",
        "Reg (EU) 2021/451 Annex I; CRR Art.92(3)(a)",
    ),
    "C 08.05": (
        "Credit risk IRB Approach: back-testing of PD",
        "Reg (EU) 2021/451 Annex I; CRR Art.180",
    ),
    "C 08.06": (
        "Credit risk IRB Approach: specialised lending slotting approach",
        "Reg (EU) 2021/451 Annex I; CRR Art.153(5)",
    ),
    "C 08.07": (
        "Credit risk IRB Approach: scope of use of IRB and SA approaches",
        "Reg (EU) 2021/451 Annex I; CRR Art.148-150",
    ),
    "C 09.00": (
        "Geographical breakdown of exposures by residence of the obligor",
        "Reg (EU) 2021/451 Annex I; CRR Art.112",
    ),
    "C 34.00": (
        "Counterparty credit risk exposures",
        "Reg (EU) 2021/451 Annex I; CRR Part Three Title II Chapter 6",
    ),
    "OF 02.00": (
        "Own funds requirements",
        "PS1/26 Annex II (OF templates); CRR Art.92",
    ),
    "CRM substitution": (
        "Credit risk mitigation: substitution effects by destination "
        "exposure class",
        "CRR Art.193-236 (inflow/outflow presentation)",
    ),
    "UK OV1": ("Overview of risk weighted exposure amounts", "PS1/26 Annex XXII"),
    "UK CR4": (
        "Standardised approach: credit risk exposure and CRM effects",
        "PS1/26 Annex XXII",
    ),
    "UK CR5": ("Standardised approach: exposures by risk weight", "PS1/26 Annex XXII"),
    "UK CR6": (
        "IRB approach: credit risk exposures by exposure class and PD range",
        "PS1/26 Annex XXII",
    ),
    "UK CR6-A": ("Scope of the use of IRB and SA approaches", "PS1/26 Annex XXII"),
    "UK CR7": (
        "IRB approach: effect on the RWEA of credit derivatives used as CRM",
        "PS1/26 Annex XXII",
    ),
    "UK CR7-A": ("IRB approach: disclosure of the extent of the use of CRM "
                 "techniques", "PS1/26 Annex XXII"),
    "UK CR8": ("RWEA flow statements of credit risk exposures under the IRB "
               "approach", "PS1/26 Annex XXII"),
    "UK CR9": ("IRB approach: back-testing of PD per exposure class", "PS1/26 Annex XXII"),
    "UK CR10": ("Specialised lending exposures under the slotting approach",
                "PS1/26 Annex XXII"),
    "UK CR10.1": ("Specialised lending: project finance slotting detail",
                  "PS1/26 Annex XXII"),
    "UK CMS1": ("Comparison of modelled and standardised RWEA at risk level",
                "PS1/26 Annex XXII"),
    "UK CMS2": ("Comparison of modelled and standardised RWEA for credit risk "
                "at asset-class level", "PS1/26 Annex XXII"),
    "UK CCR2": ("Transactions subject to own funds requirements for CVA risk",
                "PS1/26 Annex XXII"),
    "IRB scope": ("IRB permission scope summary", "CRR Art.143-150"),
    "SA scope": ("Standardised approach scope summary", "CRR Art.111-141"),
}

#: DPM column code → published column label (Reg (EU) 2021/451 Annex II,
#: C 07.00 / C 08.xx column instructions). One flat map — the codes are
#: unique within the credit-risk family this estate ships.
DPM_COLUMN_LABELS: dict[str, str] = {
    "0010": "PD assigned to the obligor grade or pool (%) / exposure value",
    "0020": "Original exposure pre conversion factors",
    "0110": "Exposure value",
    "0120": "Of which: arising from off-balance sheet items",
    "0125": "Of which: arising from defaulted exposures",
    "0220": "Of which: with double default treatment (unfunded credit protection)",
    "0230": "Exposure weighted average LGD (%)",
    "0250": "Exposure-weighted average maturity value (days)",
    "0260": "Risk weighted exposure amount",
    "0265": "Of which: defaulted exposures",
    "0276": "Risk weighted exposure amount on the standardised (output floor) basis",
    "0280": "Expected loss amount",
    "0300": "Number of obligors",
}

#: Semantic (non-DPM-coded) column glossary shared by the Pillar 3 /
#: summary sheets — keyed by the registry queries' column names.
SEMANTIC_LABELS: dict[str, str] = {
    "row_label": "Template row",
    "exposure_class": "Exposure class",
    "approach": "Regulatory approach",
    "pd_band": "PD range (master-scale band)",
    "ead": "Exposure value (EAD)",
    "total_ead": "Total exposure value (EAD)",
    "rwa": "Risk weighted exposure amount",
    "rwea": "Risk weighted exposure amount",
    "total_rwa": "Total risk weighted exposure amount",
    "n_exposures": "Number of exposures",
    "n_obligors": "Number of obligors",
    "expected_loss": "Expected loss amount",
    "el": "Expected loss amount",
    "risk_weight": "Risk weight (%)",
    "avg_pd": "Exposure weighted average PD (%)",
    "avg_lgd": "Exposure weighted average LGD (%)",
    "slot_category": "Slotting category (CRR Art.153(5))",
    "region": "Geographical area (obligor residence)",
    "component": "Reconciliation component",
    "density": "RWEA density (%)",
}

_CODE_SUFFIX = re.compile(r"_(\d{4})$")


def column_label(col_name: str) -> tuple[str, str]:
    """(dpm_code, label) for one query output column.

    A trailing ``_NNNN`` suffix is the DPM column code (how the registry
    names coded columns); coded columns label from the published Annex II
    map, semantic columns from the glossary, and anything else humanises
    its own name — a label is never absent, merely less official."""
    m = _CODE_SUFFIX.search(col_name)
    if m:
        code = m.group(1)
        return code, DPM_COLUMN_LABELS.get(code, col_name[: m.start()].replace("_", " "))
    if col_name in SEMANTIC_LABELS:
        return "", SEMANTIC_LABELS[col_name]
    base = col_name
    for prefix, label in SEMANTIC_LABELS.items():
        if base.startswith(prefix + "_") or base.endswith("_" + prefix):
            return "", label
    return "", base.replace("_", " ")


def sheet_title(sheet: str) -> tuple[str, str]:
    """(long title, legal basis) — unknown sheets fall back to their own
    name with no basis rather than failing an export."""
    return TEMPLATE_TITLES.get(sheet, (sheet, ""))
