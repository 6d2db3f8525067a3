"""Declared input-table data dictionary + bundle sealing (ref
data/schemas.py — the reference's 40-schema dictionary, 3,268 LoC, distilled
to the columns this engine consumes — and engine/loader.py:108-196: column
NAME NORMALISATION (lowercase, trimmed, separators unified) plus ALIAS
TRANSLATION, cast-to-declared-type, typed-default injection for absent
optional columns, and required-column enforcement. The reference guards
`enforce_schemas=False` behind an env var "because it silently changes RWA"
— sealing is the contract that a migrating user's CSV/parquet extracts,
whatever their vendor headers, land in the engine with one meaning).

Sealing is OPT-IN at the bundle boundary: `seal_bundle(raw)` conforms every
present frame and leaves the engine's column-gated plans untouched for
callers that build frames programmatically (tests, the driver queries).
Cost at 100 TB: pure `select` + literal injection — Catalyst folds it into
the scan projection; no shuffle, no UDF.
"""

from __future__ import annotations

import re
from dataclasses import replace as dc_replace
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from rwa_calculator_spark.contracts.column_spec import ColumnSpec, ensure_columns
from rwa_calculator_spark.engine.bundles import RawBundle

_S = T.StringType()
_D = T.DoubleType()
_I = T.IntegerType()
_B = T.BooleanType()


def _req(dtype) -> ColumnSpec:
    return ColumnSpec(dtype, required=True)


#: Distilled input schemas, one per RawBundle frame (reference
#: data/schemas.py file:line in comments). Required columns are the join
#: keys and principal amounts; everything else injects a typed default
#: (None unless the engine treats absence as a specific value — Boolean
#: carriers default False, the reference's Boolean-only null-fill policy,
#: data/column_spec.py:79-126).
INPUT_SCHEMAS: dict[str, Mapping[str, ColumnSpec]] = {
    # ref schemas.py:565 COUNTERPARTY_SCHEMA (26 cols)
    "counterparties": {
        "counterparty_reference": _req(_S),
        "entity_type": ColumnSpec(_S, "corporate"),
        "cqs": ColumnSpec(_I),
        "is_managed_as_retail": ColumnSpec(_B, False),
        "annual_revenue": ColumnSpec(_D, 0.0),
        "has_irb_permission": ColumnSpec(_B, False),
        "country": ColumnSpec(_S),
        "sovereign_cqs": ColumnSpec(_I),
        "scra_grade": ColumnSpec(_S),
        "retail_subtype": ColumnSpec(_S),
        "is_large_financial": ColumnSpec(_B, False),
        "is_infrastructure": ColumnSpec(_B, False),
        # PS1/26 Art.124E(1)(b) three-property limit input (ref
        # schemas.py:615 qualifying_property_count Int32)
        "qualifying_property_count": ColumnSpec(_I),
        # PS1/26 Art.139(2B): whether the resolved external rating is
        # issue-specific (inferred/issuer-level assessments are disapplied
        # for the Art.122B SA specialised-lending routing)
        "external_rating_is_issue_specific": ColumnSpec(_B),
        # CRR Art.4(1)(128D) SME size test second limb (ref schemas.py:604
        # total_assets) and the PS1/26 Art.124L(c) registered social
        # housing flag (ref schemas.py:616)
        "total_assets": ColumnSpec(_D, 0.0),
        "is_social_housing": ColumnSpec(_B, False),
    },
    # ref schemas.py:310 LOAN_SCHEMA (41 cols)
    "loans": {
        "loan_reference": _req(_S),
        "counterparty_reference": _req(_S),
        "drawn_amount": ColumnSpec(_D, 0.0),
        "is_defaulted": ColumnSpec(_B, False),
        "pd": ColumnSpec(_D),
        "lgd": ColumnSpec(_D),
        "effective_maturity": ColumnSpec(_D),
        "el_be": ColumnSpec(_D),
        "currency": ColumnSpec(_S),
        "book_code": ColumnSpec(_S),
        "is_covered_bond": ColumnSpec(_B, False),
        "cb_cqs": ColumnSpec(_I),
        "borrower_income_currency": ColumnSpec(_S),
        "is_hedged": ColumnSpec(_B, False),
        "hedge_coverage_ratio": ColumnSpec(_D),
        "is_revolving": ColumnSpec(_B, False),
        "facility_limit": ColumnSpec(_D),
        "due_diligence_override_rw": ColumnSpec(_D),
        # real-estate route + PS1/26 Art.124E-124I treatment carriers
        "is_property_secured": ColumnSpec(_B, False),
        "ltv": ColumnSpec(_D),
        "is_income_producing": ColumnSpec(_B, False),
        "is_commercial_re": ColumnSpec(_B, False),
        "is_junior_lien": ColumnSpec(_B, False),
        "is_adc": ColumnSpec(_B, False),
        "is_presold": ColumnSpec(_B, False),
        "is_other_re": ColumnSpec(_B, False),
        # Art.124F(2): prior/pari-passu charges as a fraction of property
        # value — reduces the loan-split secured threshold and marks the
        # position junior when positive (ref b31_risk_weight_tables.py:526)
        "prior_charge_ltv": ColumnSpec(_D),
    },
    # ref schemas.py:456 CONTINGENT_SCHEMA (42 cols)
    "contingents": {
        "contingent_reference": _req(_S),
        "counterparty_reference": _req(_S),
        "nominal_amount": ColumnSpec(_D, 0.0),
        "risk_bucket": ColumnSpec(_S, "full_risk"),
        "is_defaulted": ColumnSpec(_B, False),
        "pd": ColumnSpec(_D),
        "lgd": ColumnSpec(_D),
        "effective_maturity": ColumnSpec(_D),
        "currency": ColumnSpec(_S),
        "book_code": ColumnSpec(_S),
        "is_obs_commitment": ColumnSpec(_B, False),
        "is_short_term_trade_lc": ColumnSpec(_B, False),
        "original_maturity_years": ColumnSpec(_D),
    },
    # ref schemas.py:670 COLLATERAL_SCHEMA (40 cols)
    "collateral": {
        "collateral_reference": _req(_S),
        "collateral_type": ColumnSpec(_S),
        "market_value": ColumnSpec(_D, 0.0),
        "haircut": ColumnSpec(_D),
        "currency_mismatch": ColumnSpec(_B, False),
        "collateral_cqs": ColumnSpec(_I),
        "residual_maturity": ColumnSpec(_D),
        "currency": ColumnSpec(_S),
    },
    # ref schemas.py:836 COLLATERAL_LINK_SCHEMA (5 cols). Direct types
    # (exposure/loan/contingent, or a null type) resolve on
    # exposure_reference; "facility"/"counterparty" resolve on the pooled
    # beneficiary_reference, mirroring the reference's collateral cascade.
    "collateral_links": {
        "collateral_reference": _req(_S),
        "exposure_reference": _req(_S),
        "beneficiary_type": ColumnSpec(_S),
        "beneficiary_reference": ColumnSpec(_S),
    },
    # ref schemas.py:852 GUARANTEE_SCHEMA (20 cols)
    "guarantees": {
        "exposure_reference": _req(_S),
        "coverage_pct": ColumnSpec(_D, 0.0),
        "guarantor_reference": ColumnSpec(_S),
        "guarantor_class": ColumnSpec(_S),
        "guarantor_cqs": ColumnSpec(_I),
        "guarantor_pd": ColumnSpec(_D),
        "guarantor_seniority": ColumnSpec(_S),
        "guarantor_is_fse": ColumnSpec(_B, False),
        "currency": ColumnSpec(_S),
        "guarantee_amount": ColumnSpec(_D),
    },
    # ref schemas.py:916 (8 cols)
    "provisions": {
        "beneficiary_reference": _req(_S),
        "beneficiary_type": ColumnSpec(_S, "exposure"),
        "amount": ColumnSpec(_D, 0.0),
        "currency": ColumnSpec(_S),
        # ref schemas.py:917-918: the provision's own id (→ the ledger's
        # provision_references) and its IFRS 9 SCRA/GCRA class (domain
        # schemas.py:2144; undeclared counts as SCRA — conservative, only
        # specific provisions reduce the SA exposure value)
        "provision_reference": ColumnSpec(_S),
        "provision_type": ColumnSpec(_S, "scra"),
    },
    # ref schemas.py:927 RATING_SCHEMA (16 cols)
    "ratings": {
        "counterparty_reference": _req(_S),
        "rating_type": ColumnSpec(_S, "external"),
        "cqs": ColumnSpec(_I),
        "pd": ColumnSpec(_D),
        "rating_agency": ColumnSpec(_S),
        "is_short_term": ColumnSpec(_B, False),
        "model_id": ColumnSpec(_S),
    },
    # ref schemas.py:962 (5 cols)
    "specialised_lending": {
        "counterparty_reference": _req(_S),
        # null for SA-only SL entries (PS1/26 Art.122A-122B routing needs
        # no slotting category; ref schemas.py:962-974 + :2528)
        "slot_category": ColumnSpec(_S),
        "is_hvcre": ColumnSpec(_B, False),
        "sl_type": ColumnSpec(_S),
        "sl_project_phase": ColumnSpec(_S),
    },
    # ref schemas.py:975 EQUITY_SCHEMA (23 cols)
    "equity_exposures": {
        "exposure_reference": _req(_S),
        "counterparty_reference": ColumnSpec(_S),
        "market_value": ColumnSpec(_D, 0.0),
        "is_exchange_traded": ColumnSpec(_B, False),
        "is_diversified_pe": ColumnSpec(_B, False),
        "is_speculative": ColumnSpec(_B, False),
        "use_pd_lgd": ColumnSpec(_B, False),
        "currency": ColumnSpec(_S),
    },
    # ref schemas.py:1036 (5 cols)
    "ciu_holdings": {
        "fund_reference": _req(_S),
        "holding_reference": _req(_S),
        "underlying_class": ColumnSpec(_S, "equity"),
        "value": ColumnSpec(_D, 0.0),
        "holding_cqs": ColumnSpec(_I),
        "counterparty_reference": ColumnSpec(_S),
    },
    # ref schemas.py:1049 (3 cols)
    "fx_rates": {
        "currency": _req(_S),
        "rate_to_reporting": _req(_D),
    },
    # ref schemas.py:1060 (3 cols)
    "facility_mappings": {
        "parent_facility_reference": _req(_S),
        "child_reference": _req(_S),
        "child_type": ColumnSpec(_S, "loan"),
    },
    # ref schemas.py:166 FACILITY_SCHEMA (42 cols)
    "facilities": {
        "facility_reference": _req(_S),
        "counterparty_reference": _req(_S),
        "limit": ColumnSpec(_D, 0.0),
        "committed": ColumnSpec(_B, True),
        "risk_bucket": ColumnSpec(_S, "medium_risk"),
        "currency": ColumnSpec(_S),
    },
    # ref schemas.py:1066 (2 cols)
    "org_mappings": {
        "child_reference": _req(_S),
        "parent_reference": _req(_S),
    },
    # ref schemas.py:1071 (2 cols)
    "lending_mappings": {
        "parent_counterparty_reference": _req(_S),
        "child_counterparty_reference": _req(_S),
    },
    # ref schemas.py:1099 / :1121
    "reporting_entities": {
        "entity_reference": _req(_S),
        "parent_entity_reference": ColumnSpec(_S),
    },
    "book_entity_mappings": {
        "book_code": _req(_S),
        "entity_reference": _req(_S),
    },
    # ref schemas.py:1204 (6 cols)
    "model_permissions": {
        "model_id": _req(_S),
        "approach": _req(_S),
        "exposure_classes": ColumnSpec(_S),
        "countries": ColumnSpec(_S),
        "book_codes": ColumnSpec(_S),
        "active": ColumnSpec(_B, True),
    },
    # ref schemas.py:1281 TRADE_SCHEMA (35 cols)
    "trades": {
        "trade_reference": _req(_S),
        "netting_set_reference": _req(_S),
        "counterparty_reference": _req(_S),
        "mtm": ColumnSpec(_D, 0.0),
        "notional": ColumnSpec(_D, 0.0),
        "asset_class": ColumnSpec(_S, "ir"),
        "maturity_years": ColumnSpec(_D),
        "is_specific_wwr": ColumnSpec(_B, False),
        "has_general_wwr_flag": ColumnSpec(_B, False),
        "book_code": ColumnSpec(_S),
    },
    # ref schemas.py:1424 (15 cols)
    "margin_agreements": {
        "netting_set_reference": _req(_S),
        "threshold": ColumnSpec(_D, 0.0),
        "mta": ColumnSpec(_D, 0.0),
        "nica": ColumnSpec(_D, 0.0),
        "remargin_days": ColumnSpec(_I),
        "has_disputes": ColumnSpec(_B, False),
    },
    # ref schemas.py:1506 (11 cols)
    "ccr_collateral": {
        "netting_set_reference": _req(_S),
        "value": ColumnSpec(_D, 0.0),
        "haircut": ColumnSpec(_D),
    },
    # ref schemas.py:1558 (21 cols)
    "sft_trades": {
        "netting_set_reference": _req(_S),
        "counterparty_reference": _req(_S),
        "leg": _req(_S),
        "value": ColumnSpec(_D, 0.0),
        "haircut": ColumnSpec(_D),
        "book_code": ColumnSpec(_S),
    },
    # ref schemas.py:1236 (7 cols)
    "securitisation_allocations": {
        "exposure_reference": _req(_S),
        "pool_reference": _req(_S),
        "allocation_pct": ColumnSpec(_D, 0.0),
    },
    "securitisation_tranches": {
        "pool_reference": _req(_S),
        "tranche_reference": _req(_S),
        "attachment": ColumnSpec(_D),
        "detachment": ColumnSpec(_D),
        "w_delinquent": ColumnSpec(_D),
        "k_irb": ColumnSpec(_D),
        "pool_n": ColumnSpec(_D),
        "pool_lgd": ColumnSpec(_D),
        "pool_maturity": ColumnSpec(_D),
        "is_sts": ColumnSpec(_B, False),
    },
    # ref schemas.py:1716 (13 cols)
    "failed_trades": {
        "trade_reference": _req(_S),
        "counterparty_reference": ColumnSpec(_S),
        "amount": ColumnSpec(_D, 0.0),
        "days_late": ColumnSpec(_I, 0),
    },
}

#: Vendor-header → canonical-name translation (ref engine/loader.py alias
#: translation). Keys are POST-normalisation (lowercased, separators
#: unified), per table; '*' aliases apply everywhere.
ALIASES: dict[str, dict[str, str]] = {
    "*": {
        "cpty_ref": "counterparty_reference",
        "cpty_reference": "counterparty_reference",
        "counterparty_id": "counterparty_reference",
        "obligor_reference": "counterparty_reference",
        "ccy": "currency",
    },
    "counterparties": {
        "credit_quality_step": "cqs",
        "turnover": "annual_revenue",
        "sales": "annual_revenue",
    },
    "loans": {
        "loan_id": "loan_reference",
        "outstanding_balance": "drawn_amount",
        "balance": "drawn_amount",
        "default_flag": "is_defaulted",
        "maturity": "effective_maturity",
        "best_estimate_el": "el_be",
    },
    "contingents": {
        "contingent_id": "contingent_reference",
        "notional": "nominal_amount",
        "ccf_bucket": "risk_bucket",
    },
    "collateral": {
        "collateral_id": "collateral_reference",
        "value": "market_value",
        "type": "collateral_type",
    },
    "guarantees": {
        "coverage": "coverage_pct",
        "guarantee_coverage": "coverage_pct",
    },
    "fx_rates": {"rate": "rate_to_reporting"},
}

_SEP = re.compile(r"[\s\-./]+")


def normalize_name(name: str) -> str:
    """Lowercase, trim, unify separators to underscores (reference loader
    name normalisation)."""
    return _SEP.sub("_", name.strip().lower()).strip("_")


def normalize_columns(df: DataFrame, table: str) -> DataFrame:
    """Normalise every column name and translate known aliases."""
    aliases = {**ALIASES.get("*", {}), **ALIASES.get(table, {})}
    renames = {}
    for c in df.columns:
        canon = normalize_name(c)
        canon = aliases.get(canon, canon)
        if canon != c:
            renames[c] = canon
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


def seal_table(df: DataFrame, table: str) -> DataFrame:
    """Normalise + alias-translate + cast + default-fill one input table."""
    if table not in INPUT_SCHEMAS:
        raise KeyError(f"unknown input table: {table!r}")
    return ensure_columns(normalize_columns(df, table), INPUT_SCHEMAS[table])


def seal_bundle(raw: RawBundle) -> RawBundle:
    """Seal every present frame of a RawBundle against its declared schema
    (the reference's `RawDataBundle` seal, contracts/bundles.py:100-122)."""
    updates = {}
    for table in INPUT_SCHEMAS:
        frame = getattr(raw, table, None)
        if frame is not None:
            updates[table] = seal_table(frame, table)
    return dc_replace(raw, **updates)
