"""Input validation stage: non-finite scrub + orphan-FK detection feeding
the pipeline error channel (ref contracts/validation.py:742,767 anti-join
orphan detection, engine/pipeline.py:255-269 DQ011 non-finite scrub,
engine/orchestrator.py:174-191 halt="immediate"/"merged" semantics).

Codes follow the reference's shape: DQ011 non-finite value scrubbed to
null (row-grain — non-finite rows are rare by construction), DQ002 orphan
counterparty FK (aggregated at DISTINCT counterparty grain, never exposure
grain). Errors merge onto AggregatedOutput.errors; halt="immediate" makes
run_pipeline raise PipelineHalt on the first error instead (the one
deliberate driver-side action in the pipeline, documented at the call
site).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import RawBundle
from rwa_calculator_spark.engine.stages.scope import ERRORS_SCHEMA, _error_frame

_NUMERIC_SCRUB_COLS = ("drawn_amount", "nominal_amount", "pd", "lgd", "effective_maturity", "el_be")


class PipelineHalt(RuntimeError):
    """Raised under halt='immediate' when validation/scope errors exist."""


def _nonfinite(col: Column) -> Column:
    return F.isnan(col) | (F.abs(col) == float("inf"))


def run_validation(raw: RawBundle) -> tuple[RawBundle, DataFrame]:
    """Scrub non-finite numerics and detect orphan FKs. Returns (scrubbed
    bundle, error frame in ERRORS_SCHEMA)."""
    spark = raw.counterparties.sparkSession
    errors = spark.createDataFrame([], ERRORS_SCHEMA)

    # --- DQ011 non-finite scrub (errors computed pre-scrub) ---------------
    def scrub(df: DataFrame | None, ref_col: str, name: str):
        nonlocal errors
        if df is None:
            return None
        present = [c for c in _NUMERIC_SCRUB_COLS if c in df.columns]
        if not present:
            return df
        any_bad = None
        for c in present:
            bad = _nonfinite(F.coalesce(F.col(c), F.lit(0.0)))
            any_bad = bad if any_bad is None else (any_bad | bad)
        errors = errors.unionByName(
            _error_frame(
                df.where(any_bad),
                "DQ011",
                "warning",
                "validate",
                F.col(ref_col),
                f"non-finite value in {name} scrubbed to null",
            )
        )
        return df.withColumns(
            {
                c: F.when(
                    _nonfinite(F.coalesce(F.col(c), F.lit(0.0))),
                    F.lit(None).cast("double"),
                ).otherwise(F.col(c))
                for c in present
            }
        )

    loans = scrub(raw.loans, "loan_reference", "loans")
    contingents = scrub(raw.contingents, "contingent_reference", "contingents")

    # --- DQ002 orphan counterparty FKs (distinct-key grain) ---------------
    cp_dim = raw.counterparties.select("counterparty_reference")
    for frame, name in ((loans, "loans"), (contingents, "contingents")):
        if frame is None:
            continue
        orphans = (
            frame.select("counterparty_reference")
            .distinct()
            .join(cp_dim, "counterparty_reference", "anti")
        )
        errors = errors.unionByName(
            _error_frame(
                orphans,
                "DQ002",
                "warning",
                "validate",
                F.col("counterparty_reference"),
                f"{name} reference a counterparty absent from the registry",
            )
        )

    # --- DQ003 value-domain checks (ref contracts/validation.py VALID_*
    # sets — distinct-offending-value grain, never exposure grain) ---------
    cps = raw.counterparties
    if "entity_type" in cps.columns:
        bad_entity = (
            cps.select("entity_type")
            .where(
                F.col("entity_type").isNotNull()
                # the full classifier ladder incl. the Art.115 RGLA values
                # run_classify supports (rgla_sovereign → CGCB ladder,
                # rgla → institution treatment)
                & ~F.col("entity_type").isin(
                    "corporate",
                    "individual",
                    "institution",
                    "sovereign",
                    "rgla",
                    "rgla_sovereign",
                )
            )
            .distinct()
        )
        errors = errors.unionByName(
            _error_frame(
                bad_entity, "DQ003", "warning", "validate",
                F.col("entity_type"), "entity_type outside the valid domain",
            )
        )
    if "cqs" in cps.columns:
        bad_cqs = (
            cps.select("counterparty_reference", "cqs")
            .where(F.col("cqs").isNotNull() & ~F.col("cqs").between(0, 6))
        )
        errors = errors.unionByName(
            _error_frame(
                bad_cqs, "DQ003", "warning", "validate",
                F.col("counterparty_reference"), "cqs outside 0-6",
            )
        )
    if contingents is not None and "risk_bucket" in contingents.columns:
        bad_bucket = (
            contingents.select("risk_bucket")
            .where(
                F.col("risk_bucket").isNotNull()
                & ~F.col("risk_bucket").isin(
                    "full_risk", "medium_risk", "medium_low_risk", "low_risk"
                )
            )
            .distinct()
        )
        errors = errors.unionByName(
            _error_frame(
                bad_bucket, "DQ003", "warning", "validate",
                F.col("risk_bucket"), "risk_bucket outside the CCF domain",
            )
        )
    if raw.guarantees is not None and "coverage_pct" in raw.guarantees.columns:
        # the guarantee key is exposure_reference on single-level books,
        # beneficiary_reference on multi-level (cascade) books
        _gkey = (
            "exposure_reference"
            if "exposure_reference" in raw.guarantees.columns
            else "beneficiary_reference"
        )
        bad_cov = raw.guarantees.select(
            F.col(_gkey).alias("exposure_reference"), "coverage_pct"
        ).where(
            F.col("coverage_pct").isNotNull()
            & ~F.col("coverage_pct").between(0.0, 1.0)
        )
        errors = errors.unionByName(
            _error_frame(
                bad_cov, "DQ003", "warning", "validate",
                F.col("exposure_reference"), "guarantee coverage_pct outside [0,1]",
            )
        )

    # --- DQ004 duplicate keys (ref engine/stages/hierarchy/graph.py:437-488
    # first-row-wins edge dedup with DQ004 warnings) -----------------------
    if loans is not None and "loan_reference" in loans.columns:
        dup_loans = (
            loans.groupBy("loan_reference")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > 1)
        )
        errors = errors.unionByName(
            _error_frame(
                dup_loans, "DQ004", "warning", "validate",
                F.col("loan_reference"),
                "duplicate loan_reference rows (amounts will double-count)",
            )
        )
    org_mappings = raw.org_mappings
    if org_mappings is not None:
        dup_edges = (
            org_mappings.groupBy("child_reference")
            .agg(
                F.count("*").alias("_n"),
                F.min("parent_reference").alias("parent_reference"),
            )
        )
        errors = errors.unionByName(
            _error_frame(
                dup_edges.where(F.col("_n") > 1),
                "DQ004",
                "warning",
                "validate",
                F.col("child_reference"),
                "duplicate org hierarchy edge; deterministic first edge kept",
            )
        )
        # dedup to one parent per child so the closure cannot row-explode
        # (Spark has no input-order 'first' without an order column — the
        # deterministic winner is min(parent_reference); ref keeps first by
        # input order, SURVEY §7.2 hard-part 2). localCheckpoint: the edge
        # table is dimension-sized and the iterative hierarchy resolver
        # re-reads it ~10×/run — without truncation the dedup groupBy
        # re-executes every round (measured +0.3-0.5 s on the bench
        # pipelines at sf0.1).
        org_mappings = dup_edges.select(
            "child_reference", "parent_reference"
        ).localCheckpoint(eager=False)

        # DQ013: hierarchy depth cap / cycle (ref graph.py:559-576 cycle
        # guard + truncated flag — the reference emits a DQ warning per
        # truncated walk; the iterative resolver's flag otherwise dies
        # inside run_hierarchy). Lazy edge-table-sized frame, only
        # evaluated when the error channel is consumed.
        from rwa_calculator_spark.operators.graph import (
            resolve_ultimate_parent_iterative,
        )

        truncated = resolve_ultimate_parent_iterative(
            org_mappings.select(
                F.col("child_reference").alias("child"),
                F.col("parent_reference").alias("parent"),
            )
        ).where(F.col("truncated"))
        errors = errors.unionByName(
            _error_frame(
                truncated, "DQ013", "warning", "validate",
                F.col("node"),
                "org hierarchy walk hit the depth cap or a cycle; "
                "ultimate parent truncated at the cap",
            )
        )

    # --- DQ005 orphan CRM links (ref contracts/validation.py:742,767
    # anti-join orphan detection): a collateral link naming an unknown item
    # or an unknown exposure silently vanishes in CRM's inner joins — the
    # validation surfaces each distinct dangling reference instead ---------
    if raw.collateral_links is not None:
        links = raw.collateral_links
        if raw.collateral is not None:
            dangling_item = (
                links.select("collateral_reference")
                .distinct()
                .join(
                    raw.collateral.select("collateral_reference"),
                    "collateral_reference",
                    "anti",
                )
            )
            errors = errors.unionByName(
                _error_frame(
                    dangling_item, "DQ005", "warning", "validate",
                    F.col("collateral_reference"),
                    "collateral link references an item absent from the collateral table",
                )
            )
        exp_keys = None
        if loans is not None:
            exp_keys = loans.select(
                F.col("loan_reference").alias("exposure_reference")
            )
        if contingents is not None:
            ck = contingents.select(
                F.col("contingent_reference").alias("exposure_reference")
            )
            exp_keys = ck if exp_keys is None else exp_keys.unionByName(ck)
        if exp_keys is not None:
            dangling_exp = (
                links.select("exposure_reference")
                .distinct()
                .join(exp_keys, "exposure_reference", "anti")
            )
            errors = errors.unionByName(
                _error_frame(
                    dangling_exp, "DQ005", "warning", "validate",
                    F.col("exposure_reference"),
                    "collateral link references an unknown exposure",
                )
            )

    # --- DQ012 negative principal amounts (warning; CRM clips downstream
    # per the Art.111 greatest(drawn,0) basis) -----------------------------
    if loans is not None and "drawn_amount" in loans.columns:
        neg = loans.select("loan_reference", "drawn_amount").where(
            F.col("drawn_amount") < 0
        )
        errors = errors.unionByName(
            _error_frame(
                neg, "DQ012", "warning", "validate",
                F.col("loan_reference"), "negative drawn_amount",
            )
        )

    # --- DQ006 risk-parameter domains (ref contracts/validation.py VALID_*
    # probability/ratio domains): PD and LGD must sit in [0, 1] and
    # effective maturity must be positive — an out-of-range parameter
    # silently floors/caps downstream, so the DQ row is the only trace ----
    def param_domain(frame, ref_col: str, name: str):
        nonlocal errors
        if frame is None:
            return
        checks = []
        if "pd" in frame.columns:
            checks.append((~F.col("pd").between(0.0, 1.0), "pd outside [0,1]"))
        if "lgd" in frame.columns:
            checks.append((~F.col("lgd").between(0.0, 1.0), "lgd outside [0,1]"))
        if "effective_maturity" in frame.columns:
            checks.append(
                (F.col("effective_maturity") <= 0.0, "non-positive effective_maturity")
            )
        for cond, msg in checks:
            bad = frame.select(ref_col).where(cond)
            errors = errors.unionByName(
                _error_frame(
                    bad, "DQ006", "warning", "validate",
                    F.col(ref_col), f"{name}: {msg}",
                )
            )

    param_domain(loans, "loan_reference", "loans")
    param_domain(contingents, "contingent_reference", "contingents")

    # --- DQ007 securitisation allocation domain: each slice in (0, 1] and
    # the per-exposure total ≤ 1 — an over-allocated exposure would leave
    # the retained share negative (ref engine/securitisation/allocator.py
    # retained = 1 − Σ allocation_pct) ------------------------------------
    if raw.securitisation_allocations is not None:
        alloc = raw.securitisation_allocations
        if "allocation_pct" in alloc.columns:
            bad_pct = alloc.select("exposure_reference", "allocation_pct").where(
                F.col("allocation_pct").isNotNull()
                & ~(
                    (F.col("allocation_pct") > 0.0)
                    & (F.col("allocation_pct") <= 1.0)
                )
            )
            errors = errors.unionByName(
                _error_frame(
                    bad_pct, "DQ007", "warning", "validate",
                    F.col("exposure_reference"),
                    "allocation_pct outside (0,1]",
                )
            )
            over = (
                alloc.groupBy("exposure_reference")
                .agg(F.sum("allocation_pct").alias("_tot"))
                .where(F.col("_tot") > 1.0)
            )
            errors = errors.unionByName(
                _error_frame(
                    over, "DQ007", "error", "validate",
                    F.col("exposure_reference"),
                    "allocations exceed 100% of the exposure",
                )
            )

    # --- DQ008 CCR/SFT input domains (ref contracts/validation.py trade
    # domains): SA-CCR asset classes must be supervisory-factor-mapped,
    # SFT legs must be 'lent'|'collateral' (an unknown leg silently drops
    # out of the netting), SFT haircuts in [0, 1) --------------------------
    if raw.trades is not None and "asset_class" in raw.trades.columns:
        bad_ac = (
            raw.trades.select("asset_class")
            .where(
                F.col("asset_class").isNotNull()
                & ~F.col("asset_class").isin("ir", "fx", "credit", "equity", "commodity")
            )
            .distinct()
        )
        errors = errors.unionByName(
            _error_frame(
                bad_ac, "DQ008", "warning", "validate",
                F.col("asset_class"),
                "asset_class outside the SA-CCR supervisory-factor domain",
            )
        )
    if raw.sft_trades is not None and "leg" in raw.sft_trades.columns:
        bad_leg = (
            raw.sft_trades.select("netting_set_reference", "leg")
            .where(F.col("leg").isNotNull() & ~F.col("leg").isin("lent", "collateral"))
        )
        errors = errors.unionByName(
            _error_frame(
                bad_leg, "DQ008", "warning", "validate",
                F.col("netting_set_reference"),
                "sft leg outside {lent, collateral} — row will not net",
            )
        )
        if "haircut" in raw.sft_trades.columns:
            bad_hc = raw.sft_trades.select("netting_set_reference", "haircut").where(
                F.col("haircut").isNotNull()
                & ~((F.col("haircut") >= 0.0) & (F.col("haircut") < 1.0))
            )
            errors = errors.unionByName(
                _error_frame(
                    bad_hc, "DQ008", "warning", "validate",
                    F.col("netting_set_reference"), "sft haircut outside [0,1)",
                )
            )

    # --- DQ009 slotting / collateral categorical domains ------------------
    if (
        raw.specialised_lending is not None
        and "slot_category" in raw.specialised_lending.columns
    ):
        bad_slot = (
            raw.specialised_lending.select("counterparty_reference", "slot_category")
            .where(
                F.col("slot_category").isNotNull()
                & ~F.col("slot_category").isin(
                    "strong", "good", "satisfactory", "weak", "default"
                )
            )
        )
        errors = errors.unionByName(
            _error_frame(
                bad_slot, "DQ009", "error", "validate",
                F.col("counterparty_reference"),
                "slot_category outside the Art.153(5) category set",
            )
        )
    if raw.collateral is not None and "collateral_type" in raw.collateral.columns:
        bad_ct = (
            raw.collateral.select("collateral_type")
            .where(
                F.col("collateral_type").isNotNull()
                & ~F.col("collateral_type").isin(
                    "cash", "gold", "govt_bond", "corp_bond", "securitisation",
                    "equity_main", "equity_other", "real_estate",
                    "life_insurance", "third_party_deposit",
                )
            )
            .distinct()
        )
        errors = errors.unionByName(
            _error_frame(
                bad_ct, "DQ009", "warning", "validate",
                F.col("collateral_type"),
                "collateral_type outside the eligible-collateral domain "
                "(unknown types take the conservative fallback haircut)",
            )
        )

    # --- DQ003 categorical long tail (ref data/schemas.py
    # COLUMN_VALUE_CONSTRAINTS + contracts/validation.py
    # validate_bundle_values — the declarative {table: {column: domain}}
    # registry, evaluated at DISTINCT-offending-value grain per column so
    # the error channel is dimension-sized however many rows offend). The
    # domains are the published value sets for the columns THIS engine
    # consumes; model_permissions.approach uses this engine's registry
    # labels (permissions.py), the rest are the reference's sets verbatim.
    for bundle_field, column, domain in _VALUE_DOMAINS:
        frame = getattr(raw, bundle_field, None)
        if frame is None or column not in frame.columns:
            continue
        bad = (
            frame.select(column)
            .where(F.col(column).isNotNull() & ~F.col(column).isin(*domain))
            .distinct()
        )
        errors = errors.unionByName(
            _error_frame(
                bad, "DQ003", "warning", "validate",
                F.col(column),
                f"{bundle_field}.{column} outside the valid domain",
            )
        )

    # --- DQ014 Art.162(3) maturity range: M is clipped to [1d, 5y]
    # downstream; the flag is the firm's only trace of the mismatch (ref
    # contracts/validation.py _validate_effective_maturity_range) ----------
    for frame, ref_col, name in (
        (loans, "loan_reference", "loans"),
        (contingents, "contingent_reference", "contingents"),
    ):
        if frame is None or "effective_maturity" not in frame.columns:
            continue
        over = frame.select(ref_col).where(F.col("effective_maturity") > 5.0)
        errors = errors.unionByName(
            _error_frame(
                over, "DQ014", "warning", "validate",
                F.col(ref_col),
                f"{name} effective_maturity above the Art.162(3) 5-year cap "
                "(clipped downstream)",
            )
        )

    # --- DQ015 securitisation tranche structure: attachment/detachment in
    # [0,1] with D > A — an inverted tranche makes the SSFA thickness
    # non-positive and the closed form divides by it (functions/secsa.py) --
    if raw.securitisation_tranches is not None:
        tr = raw.securitisation_tranches
        if "attachment" in tr.columns and "detachment" in tr.columns:
            bad_tr = tr.select("pool_reference", "tranche_reference").where(
                ~F.col("attachment").between(0.0, 1.0)
                | ~F.col("detachment").between(0.0, 1.0)
                | (F.col("detachment") <= F.col("attachment"))
            )
            errors = errors.unionByName(
                _error_frame(
                    bad_tr, "DQ015", "error", "validate",
                    F.concat_ws("/", "pool_reference", "tranche_reference"),
                    "tranche attachment/detachment outside [0,1] or D ≤ A",
                )
            )

    # --- DQ008 margined-CSA / settlement numeric domains (ref trade-domain
    # checks): negative CSA terms flip the Art.275(2) RC floor's sign;
    # negative settlement inputs silently band to no charge ---------------
    if raw.margin_agreements is not None:
        ma = raw.margin_agreements
        checks = [
            ("threshold", F.col("threshold") < 0.0, "negative threshold"),
            ("mta", F.col("mta") < 0.0, "negative mta"),
        ]
        if "remargin_days" in ma.columns:
            checks.append(
                ("remargin_days", F.col("remargin_days") <= 0.0,
                 "non-positive remargin_days")
            )
        for col, cond, msg in checks:
            if col not in ma.columns:
                continue
            bad_ma = ma.select("netting_set_reference").where(cond)
            errors = errors.unionByName(
                _error_frame(
                    bad_ma, "DQ008", "warning", "validate",
                    F.col("netting_set_reference"), f"margin agreement: {msg}",
                )
            )
    if raw.ccr_collateral is not None and "haircut" in raw.ccr_collateral.columns:
        bad_ch = raw.ccr_collateral.select("netting_set_reference").where(
            F.col("haircut").isNotNull()
            & ~((F.col("haircut") >= 0.0) & (F.col("haircut") < 1.0))
        )
        errors = errors.unionByName(
            _error_frame(
                bad_ch, "DQ008", "warning", "validate",
                F.col("netting_set_reference"), "ccr collateral haircut outside [0,1)",
            )
        )
    if raw.failed_trades is not None:
        ft = raw.failed_trades
        if "amount" in ft.columns:
            bad_amt = ft.select("trade_reference").where(F.col("amount") < 0.0)
            errors = errors.unionByName(
                _error_frame(
                    bad_amt, "DQ008", "warning", "validate",
                    F.col("trade_reference"), "failed trade: negative amount",
                )
            )
        if "days_late" in ft.columns:
            bad_dl = ft.select("trade_reference").where(F.col("days_late") < 0)
            errors = errors.unionByName(
                _error_frame(
                    bad_dl, "DQ008", "warning", "validate",
                    F.col("trade_reference"), "failed trade: negative days_late",
                )
            )

    # --- DQ012 negative contingent nominals (the loans check's off-BS twin)
    if contingents is not None and "nominal_amount" in contingents.columns:
        neg_nom = contingents.select("contingent_reference").where(
            F.col("nominal_amount") < 0
        )
        errors = errors.unionByName(
            _error_frame(
                neg_nom, "DQ012", "warning", "validate",
                F.col("contingent_reference"), "negative nominal_amount",
            )
        )

    return (
        replace(raw, loans=loans, contingents=contingents, org_mappings=org_mappings),
        errors,
    )


#: The declarative categorical-domain registry (ref data/schemas.py:2335
#: COLUMN_VALUE_CONSTRAINTS, built from the VALID_* sets at :1868-2333).
#: (bundle_field, column, valid values). Columns absent from a supplied
#: frame are skipped — the registry follows the tolerant-carrier
#: convention, it never makes a column required.
_VALUE_DOMAINS: tuple[tuple[str, str, tuple[str, ...]], ...] = (
    # counterparties (VALID_SCRA_GRADES; VALID_CCR_COUNTERPARTY_TYPES —
    # the Art.274(2) alpha carve-out discriminator)
    ("counterparties", "scra_grade", ("A", "A_ENHANCED", "B", "C")),
    (
        "counterparties",
        "counterparty_type",
        ("financial", "non_financial", "pension_scheme", "pension_default_comp"),
    ),
    # exposure tables (VALID_SENIORITY)
    ("loans", "seniority", ("senior", "subordinated")),
    ("contingents", "seniority", ("senior", "subordinated")),
    ("facilities", "seniority", ("senior", "subordinated")),
    # PS1/26 Art.161(1)(e)/(f)/(g) purchased-receivables F-IRB LGD
    # sub-types (VALID_PURCHASED_RECEIVABLES_SUBTYPES, ref schemas.py)
    (
        "loans",
        "purchased_receivables_subtype",
        ("senior", "subordinated", "dilution_risk"),
    ),
    # guarantees (VALID_PROTECTION_TYPES, VALID_BENEFICIARY_TYPES,
    # VALID_LOOK_THROUGH_ELECTIONS — PS1/26 Art.191A(2)(e)(i))
    ("guarantees", "protection_type", ("guarantee", "credit_derivative")),
    (
        "guarantees",
        "beneficiary_type",
        ("counterparty", "loan", "facility", "contingent", "guarantee"),
    ),
    ("guarantees", "look_through_election", ("none", "funded_only", "both")),
    # provisions (VALID_PROVISION_TYPES)
    ("provisions", "provision_type", ("scra", "gcra")),
    (
        "provisions",
        "beneficiary_type",
        ("counterparty", "loan", "facility", "contingent", "guarantee"),
    ),
    # ratings (VALID_RATING_TYPES, VALID_RATING_SCOPE_TYPES)
    ("ratings", "rating_type", ("internal", "external")),
    ("ratings", "scope_type", ("facility", "loan", "contingent")),
    # equity (VALID_EQUITY_TYPES)
    (
        "equity_exposures",
        "equity_type",
        (
            "central_bank", "subordinated_debt", "listed", "exchange_traded",
            "government_supported", "unlisted", "speculative", "private_equity",
            "private_equity_diversified", "ciu", "other",
        ),
    ),
    # CIU (VALID_CIU_APPROACHES, Art.132)
    ("ciu_holdings", "ciu_approach", ("look_through", "mandate_based", "fallback")),
    # model permissions — THIS engine's registry labels
    # (engine/stages/permissions.py) + the Art.150/148 ppu_reason basis
    # (VALID_PPU_REASONS)
    ("model_permissions", "approach", ("AIRB", "FIRB", "SLOTTING", "SA")),
    (
        "model_permissions",
        "ppu_reason",
        (
            "art_150_1_a", "art_150_1_b", "art_150_1_c", "art_150_1_d",
            "art_150_1_e", "art_150_1_f", "art_150_1_g", "art_150_1_h",
            "art_150_1_i", "art_150_1_j", "art_148_rollout",
        ),
    ),
    # securitisation allocations (VALID_SECURITISATION_EXPOSURE_TYPES,
    # VALID_TRANSFER_TYPES — Art.244/245)
    (
        "securitisation_allocations",
        "exposure_type",
        ("loan", "contingent", "facility"),
    ),
    ("securitisation_allocations", "transfer_type", ("traditional", "synthetic")),
    # collateral side columns (VALID_PROPERTY_TYPES, VALID_ISSUER_TYPES,
    # VALID_VALUATION_TYPES — collateral_type itself is DQ009 above)
    ("collateral", "property_type", ("residential", "commercial", "adc")),
    ("collateral", "issuer_type", ("sovereign", "pse", "corporate", "securitisation")),
    ("collateral", "valuation_type", ("market", "indexed", "independent")),
)
