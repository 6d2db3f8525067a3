"""Regime-as-data rulepacks (ref rulebook/model.py, resolve.py, compile.py).

Every regulatory value — risk-weight tables, CCFs, floors, haircuts,
supporting factors — lives in a versioned, citation-carrying, Decimal-valued
pack that is content-hashed per run; calculations never embed literals.
The pack compiles once per run into Spark artefacts:

- small lookup tables → literal DataFrames, broadcast-joined (zero shuffle);
- scalar parameters → folded into F.lit at plan build (Catalyst constant-
  folds them, the reference's 'only Decimal→float boundary').

Values below are the public CRR / Basel 3.1 standardised tables (the same
ones the reference encodes at engine/sa/risk_weights.py and rulebook/).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RuleEntry:
    value: Decimal
    citation: str


@dataclass(frozen=True)
class RulePack:
    regime: str
    version: str
    scalars: Mapping[str, RuleEntry]
    # table name -> list of (key tuple ..., value) rows; schema per table
    tables: Mapping[str, tuple[str, tuple]]  # (schema_ddl, rows)

    def content_hash(self) -> str:
        payload = {
            "regime": self.regime,
            "version": self.version,
            "scalars": {k: [str(v.value), v.citation] for k, v in sorted(self.scalars.items())},
            "tables": {k: [self.tables[k][0], [list(map(str, r)) for r in self.tables[k][1]]] for k in sorted(self.tables)},
        }
        return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]

    def scalar(self, name: str) -> float:
        """The Decimal→float boundary: happens exactly once, here."""
        return float(self.scalars[name].value)

    def lit(self, name: str):
        return F.lit(self.scalar(name))

    def table_df(self, spark: SparkSession, name: str) -> DataFrame:
        schema, rows = self.tables[name]
        return spark.createDataFrame([tuple(_to_py(v) for v in r) for r in rows], schema)

    def broadcast_table(self, spark: SparkSession, name: str) -> DataFrame:
        return F.broadcast(self.table_df(spark, name))


def _to_py(v):
    return float(v) if isinstance(v, Decimal) else v


_D = Decimal

# CRR standardised risk weights by (exposure_class, cqs); cqs 0 = unrated.
# Public CRR Art. 114-122 tables (ref engine/sa/risk_weights.py).
_SA_RW_ROWS = tuple(
    (cls, cqs, _D(rw))
    for cls, row in {
        "sovereign": {1: "0.0", 2: "0.2", 3: "0.5", 4: "1.0", 5: "1.0", 6: "1.5", 0: "1.0"},
        "institution": {1: "0.2", 2: "0.5", 3: "0.5", 4: "1.0", 5: "1.0", 6: "1.5", 0: "0.5"},
        "corporate": {1: "0.2", 2: "0.5", 3: "1.0", 4: "1.0", 5: "1.5", 6: "1.5", 0: "1.0"},
    }.items()
    for cqs, rw in row.items()
)

# CCF by off-balance risk bucket (CRR Annex I).
_CCF_ROWS = (
    ("full_risk", _D("1.0")),
    ("medium_risk", _D("0.5")),
    ("medium_low_risk", _D("0.2")),
    ("low_risk", _D("0.0")),
)

# Supervisory slotting risk weights (CRR Art.153(5)).
_SLOTTING_ROWS = (
    ("strong", _D("0.7")),
    ("good", _D("0.9")),
    ("satisfactory", _D("1.15")),
    ("weak", _D("2.5")),
    ("default", _D("0.0")),
)

CRR_PACK = RulePack(
    regime="crr",
    version="2026-01",
    scalars={
        "retail_rw": RuleEntry(_D("0.75"), "CRR Art.123"),
        "retail_threshold": RuleEntry(_D("1000000"), "CRR Art.123(c)"),
        "re_secured_rw": RuleEntry(_D("0.35"), "CRR Art.125"),
        "defaulted_rw": RuleEntry(_D("1.5"), "CRR Art.127"),
        "defaulted_rw_secured": RuleEntry(_D("1.0"), "CRR Art.127(1)"),
        "unrated_corp_rw": RuleEntry(_D("1.0"), "CRR Art.122(2)"),
        "sme_supporting_factor": RuleEntry(_D("0.7619"), "CRR Art.501"),
        "infra_supporting_factor": RuleEntry(_D("0.75"), "CRR Art.501a"),
        "pd_floor": RuleEntry(_D("0.0003"), "CRR Art.160(1)"),
        "lgd_floor_unsecured": RuleEntry(_D("0.0"), "CRR Art.161"),
        "output_floor_alpha": RuleEntry(_D("0.0"), "n/a in CRR"),
        "fx_haircut": RuleEntry(_D("0.08"), "CRR Art.224"),
        "equity_listed_rw": RuleEntry(_D("1.9"), "CRR Art.155(2)"),
        "equity_other_rw": RuleEntry(_D("3.7"), "CRR Art.155(2)"),
    },
    tables={
        "sa_rw": ("exposure_class string, cqs int, rw double", _SA_RW_ROWS),
        "ccf": ("risk_bucket string, ccf double", _CCF_ROWS),
        "slotting_rw": ("slot_category string, rw double", _SLOTTING_ROWS),
    },
)

B31_PACK = RulePack(
    regime="b31",
    version="2026-01",
    scalars={
        "retail_rw": RuleEntry(_D("0.75"), "BCBS CRE20.65"),
        "retail_threshold": RuleEntry(_D("1000000"), "BCBS CRE20.65"),
        "re_secured_rw": RuleEntry(_D("0.30"), "BCBS CRE20.71 (LTV<60%)"),
        "defaulted_rw": RuleEntry(_D("1.5"), "BCBS CRE20.104"),
        "defaulted_rw_secured": RuleEntry(_D("1.0"), "BCBS CRE20.105"),
        "unrated_corp_rw": RuleEntry(_D("1.0"), "BCBS CRE20.25"),
        "sme_supporting_factor": RuleEntry(_D("1.0"), "removed in B3.1"),
        "infra_supporting_factor": RuleEntry(_D("1.0"), "removed in B3.1"),
        "pd_floor": RuleEntry(_D("0.0005"), "BCBS CRE36.79 (B3.1)"),
        "lgd_floor_unsecured": RuleEntry(_D("0.25"), "BCBS CRE36.86"),
        "output_floor_alpha": RuleEntry(_D("0.725"), "BCBS RBC20.11"),
        "fx_haircut": RuleEntry(_D("0.08"), "BCBS CRE22.52"),
        "equity_listed_rw": RuleEntry(_D("2.5"), "BCBS CRE20.57"),
        "equity_other_rw": RuleEntry(_D("4.0"), "BCBS CRE20.57"),
    },
    tables={
        "sa_rw": ("exposure_class string, cqs int, rw double", _SA_RW_ROWS),
        "ccf": ("risk_bucket string, ccf double", _CCF_ROWS),
        "slotting_rw": ("slot_category string, rw double", _SLOTTING_ROWS),
    },
)
