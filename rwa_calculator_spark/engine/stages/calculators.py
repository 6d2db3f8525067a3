"""SA and IRB calculators (ref engine/sa/risk_weights.py,
engine/irb/formulas.py) + approach routing (ref engine/stages/calc.py:
filter-split by approach, compute branches, recombine by unionByName).

SA: rulepack RW lookup on (class, cqs) broadcast-joined, override ladder
(defaulted / RE-secured / retail / unrated), guarantee substitution on the
covered portion, supporting factors.

IRB: the staged K pipeline from functions/irb (codegen-friendly Φ/Φ⁻¹),
PD/LGD floors from the rulepack; defaulted exposures bypass Vasicek
entirely (CRR Art.153(1)(ii)/154(1)(i), ref engine/irb/adjustments.py
apply_defaulted_treatment): A-IRB K = max(0, LGD − BEEL), F-IRB K = 0,
no maturity adjustment. EL shortfall/excess vs allocated provisions
(CRR Art.158-159, ref adjustments.py compute_el_shortfall_excess).

Every branch emits the same audit-ledger columns (_RESULT_COLS — the
reference's 162-column CALCULATION_OUTPUT_SCHEMA distilled to its
load-bearing component buckets: EAD pre/post CRM, provisions, collateral,
guarantee coverage, RW provenance, EL decomposition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from rwa_calculator_spark.engine.bundles import CalcOutput, CRMOutput
from rwa_calculator_spark.engine.rulepack import RulePack
from rwa_calculator_spark.functions.irb import (
    FI_CORRELATION_MULTIPLIER,
    R_RETAIL_MORTGAGE,
    R_RETAIL_QRRE,
    irb_maturity_adj,
    irb_maturity_b,
    spark_correlation,
    spark_correlation_other_retail,
    spark_sme_size_adjustment,
    with_irb_k_r,
)
from rwa_calculator_spark.functions.stats import with_normal_ppf
from rwa_calculator_spark.operators.dictionary import dictionary_apply


def _colset(df: DataFrame) -> frozenset:
    """ONE schema fetch for a stage's carrier-presence probes.

    Each ``df.columns`` access is a py4j schema call (~10-15 ms on a
    ~160-column frame: the full schema JSON crosses the gateway); the
    calculator stages probe optional INPUT carriers ~50 times per branch,
    so they snapshot once at entry. Only valid while the probed names are
    input-level (the stage itself never adds or drops a probed name
    between snapshot and probe) — stage-internal columns (_dd_elig) are
    tracked with local flags instead."""
    return frozenset(df.columns)

# The audit ledger every calculator branch emits (ref CALCULATION_OUTPUT_
# SCHEMA, data/schemas.py:2877 — distilled). Asserted by tests/test_contracts.
_RESULT_COLS = [
    "exposure_reference",
    "counterparty_reference",
    "exposure_class",
    "approach",
    # gross pre-CF/CCF carriers (Pillar 3 CR4 cols a/b, COREP C07 col 0010
    # "original exposure" — ref reporting/pillar3/cr4.py gross on/off-BS)
    "drawn_amount",
    "undrawn_amount",
    "ead",
    "ead_after_crm",
    "provision_allocated",
    "collateral_value",
    "g_coverage",
    "risk_weight",
    "rw_source",
    "rwa_before_sf",
    "rwa",
    "expected_loss",
    "el_shortfall",
    "el_excess",
    # parameter components actually used (reconciliation buckets: CCF, PD,
    # LGD, M per exposure — null where the approach has no such input)
    "ccf",
    "pd_used",
    "lgd_used",
    "maturity_used",
    # the exposure's RWA under the STANDARDISED approach — the Art.92(3)
    # output-floor base (own rwa for SA-family branches; IRB rows re-weighted
    # through the real SA ladder, not a flat proxy)
    "rwa_sa_equivalent",
    # stage-provenance carriers (round 4, toward the reference's 162-col
    # CALCULATION_OUTPUT_SCHEMA): which classifier branch fired, the CMS1/
    # CCR-vs-credit risk-type discriminator, and the Art.224/239 haircut
    # decomposition (gross − quality − fx − mismatch ≡ collateral_value)
    "class_reason",
    "risk_type",
    "collateral_value_gross",
    "haircut_quality",
    "haircut_fx",
    "haircut_maturity_mismatch",
    # obligor country of residence — the COREP C 09.01 geography axis (ref
    # reporting/corep/c09.py: sheets key the counterparty country); null when
    # the counterparty dim carries none
    "country",
    # guarantor destination class — the CRM-substitution inflow routing key
    # (ref reporting/corep/crm_substitution.py: the per-destination-class
    # inflow is computed once over the WHOLE population and routed to the
    # template that reports the substituted leg); null when unguaranteed
    "g_class",
    # the hypothetical NO-SUBSTITUTION RWA — the carrier the reference
    # RECORDS as its F7 follow-up ("the m-side needs a pre-substitution
    # RWA carrier", reporting/pillar3/cr7a.py:36-41; cr7.py:16-21 records
    # the a=b approximation it forces). SA: EAD × own-ladder RW × factor
    # (post-base B3.1 adjustments not re-applied — recorded scope); IRB:
    # EAD × pre-guarantee-blend Vasicek RW; substitution-free branches
    # carry their actual rwa
    "rwa_pre_crm_substitution",
    # round-5 period-over-period lineage carriers: the rating model that
    # priced the row (sealed from the model-permission stage's model_id
    # when the bundle routes permissions — CR8 row 4 "model updates" keys
    # a matched row whose model changed between runs) and the exposure→
    # reporting currency translation rate (CR8 row 7's exact two-factor
    # FX split; null when the bundle carries no FX inputs). Ref
    # reporting/pillar3/cr8.py:22-24 — the carriers whose absence kept
    # the reference's rows 4-7 null.
    "model_id",
    "fx_rate",
    # the assigned Art.153(5) slotting category (ref
    # CALCULATION_OUTPUT_SCHEMA's slotting carriers) — the C 08.06 / CR10
    # row axis; null where the counterparty has no slotting assignment
    "slot_category",
    # round-5 widening toward the reference's 162-col
    # CALCULATION_OUTPUT_SCHEMA (data/schemas.py:2877) — each carrier is a
    # value the pipeline already computes, surfaced instead of dropped:
    # the resolved group apex + walk depth (hierarchy stage),
    "ultimate_parent_reference",
    "hierarchy_depth",
    # the Art.4(1)(39) connected-clients group and its aggregate exposure
    # (the Art.123 retail-threshold base), plus whether that test decided
    # the row's class (classify stage),
    "lending_group_reference",
    "group_exposure",
    "retail_threshold_applied",
    # retail sub-portfolio + commercial-property routing carriers (ref: the
    # reference's class enum IS the subtype — retail_mortgage/retail_qrre/
    # retail_other — and property_type; this ledger keeps class 'retail'
    # with the subtype alongside, consumed by the Art.164(4) portfolio
    # LGD-floor check and the per-class parameter floors)
    "retail_subtype",
    "is_commercial_re",
    # the obligor default flag (ref schemas.py:2525 is_defaulted) — the
    # C 02.00 row-0160 / CR template defaulted-memo axis,
    "is_defaulted",
    # identity/provenance fringe (ref :2877 block headers): the pre-split
    # source reference (RE-split stage; own reference when never split),
    # the source row type, the obligor's IMMEDIATE org parent + flag
    # (hierarchy dim), and whether the Art.123 retail test decided on a
    # group base (classify),
    "source_exposure_reference",
    "exposure_type",
    # denomination currency input (rides from the loader; ref schemas.py
    # currency — the Art.141 test input, reported as supplied),
    "currency",
    # the borrower's income currency as supplied (ref :3082 — the Art.123A
    # mismatch test input the SA chain consumes),
    "borrower_income_currency",
    "parent_counterparty_reference",
    "counterparty_has_parent",
    "retail_eligible_via_group",
    # identity long tail (ref :2885-2905): the pre-guarantor-split parent
    # (this engine keeps guarantee portions ON-ROW, never row-splits, so
    # the parent is the row's own reference — recorded narrowing), the
    # book/portfolio code and contractual maturity date as supplied, the
    # internal-model PD fed by the Art.171/175 inheritance channel, and
    # the Art.138-resolved external CQS kept under its own name,
    "parent_exposure_reference",
    "book_code",
    "original_maturity_date",
    "internal_pd",
    "external_cqs",
    # approach permission grant consulted by routing (ref :2935
    # approach_permitted; permissions stage grants where present, else the
    # bundle's has_irb_permission flag),
    "approach_permitted",
    # CRR Art.159(1)(c)/(d) Pool-B components (ref data/schemas.py:405-413:
    # per-exposure AVAs / other own-funds reductions, null when unreported
    # — absence of data must not imply a zero AVA),
    "ava_amount",
    "other_own_funds_reductions",
    # CRR Art.195/219 on-balance-sheet netting benefit allocated to this
    # exposure (ref :2961; crm stage netting kernel) and the agreement it
    # came through (audit carrier),
    "on_bs_netting_amount",
    "netting_agreement_reference",
    # facility-structure provenance block (ref CALCULATION_OUTPUT_SCHEMA
    # :2911-2918): whether the exposure hangs off a facility, its direct
    # parent, the ordered ancestor chain (parent→root), the hierarchy
    # root, levels below root (0 = standalone), and the full root→exposure
    # path — all sealed by the hierarchy stage's broadcast closure,
    "exposure_has_parent",
    "parent_facility_reference",
    "ancestor_facilities",
    "root_facility_reference",
    "facility_hierarchy_depth",
    "facility_hierarchy_path",
    # CRM inheritance provenance (ref :2922-2929): WHERE in the hierarchy
    # each mitigant came from, which entity it was inherited from, and how
    # it was allocated down (crm stage),
    "collateral_source_level",
    "collateral_inherited_from",
    "collateral_allocation_method",
    "guarantee_source_level",
    "guarantee_inherited_from",
    "provision_source_level",
    "provision_inherited_from",
    "crm_allocation_notes",
    # warning / DQ list carriers (ref schemas.py calculation_warnings /
    # data_quality_flags): machine codes + human-readable twins collected
    # from the stage gates (today the Art.194(4) own-issue exclusions),
    "data_quality_flags",
    "calculation_warnings",
    # supporting-factor decomposition (ref schemas.py sme_supporting_factor
    # / infra_supporting_factor / supporting_factor_benefit): SA branch
    # seals the applied factors and the RWEA saved; IRB rows carry null
    # (this engine prices Art.501/501a on the SA chain only — recorded),
    "sme_supporting_factor",
    "infra_supporting_factor",
    "supporting_factor_benefit",
    # WHICH CCF rule fired (Annex I bucket / OC original-maturity split /
    # F-IRB Art.166(8) bespoke / issued fallback — crm stage),
    "ccf_source",
    # who provides the unfunded protection (crm stage; null unguaranteed),
    "guarantor_reference",
    # guarantee-impact block (ref CALCULATION_OUTPUT_SCHEMA :2972-3005):
    # the protection instrument and its Art.233(3) value haircuts (crm
    # stage), the covered/retained EAD split, substitute weight, isolated
    # benefit, and the status/method enums plus pre/post-substitution
    # counterparty tracking (SA and IRB calculators). guarantee_references
    # carries the FULL priority-ordered stack (both channels price every
    # leg since the round-7 multi-guarantee fold); the 0/1-element fill is
    # only the fallback for direct-call frames without the crm stack.
    "guarantee_references",
    # guarantor counterparty ids as a list (ref :2973 guarantor_references
    # — same stack ordering as guarantee_references),
    "guarantor_references",
    "protection_type",
    "guarantee_coverage_pct",
    "guarantee_effective_coverage_pct",
    "guarantee_fx_haircut",
    "guarantee_restructuring_haircut",
    "guarantor_risk_weight",
    "is_guaranteed",
    "guaranteed_portion",
    "unguaranteed_portion",
    "pre_crm_risk_weight",
    "guarantee_benefit_rw",
    "guarantee_benefit",
    "guarantee_status",
    "guarantee_method_used",
    "pre_crm_counterparty_reference",
    "pre_crm_exposure_class",
    "post_crm_counterparty_guaranteed",
    "post_crm_exposure_class_guaranteed",
    # provision-impact block (ref :3005-3008): WHICH provisions were
    # applied (all three allocation levels, sorted + duplicate-free), the
    # IFRS 9 SCRA/GCRA split of the allocated total (scra + gcra ≡
    # provision_allocated), and the amount that actually reduced the SA
    # exposure value (zero on IRB rows — their provisions route to the EL
    # shortfall/excess comparison instead)
    "provision_references",
    "scra_provision_amount",
    "gcra_provision_amount",
    "provision_capped_amount",
    # EAD-calculation block (ref :3010-3014): converted off-BS amount,
    # gross (pre-provision) EAD, the post-collateral value BEFORE any RE
    # split re-partitions it, the final figure RWA priced on, and which
    # collateral method the run elected
    "converted_undrawn",
    "gross_ead",
    "ead_after_collateral",
    "final_ead",
    "ead_calculation_method",
    # IRB parameter decomposition (ref :3026-3041): raw-vs-floor PD/LGD
    # provenance, the LGD basis (modelled/supervisory), effective
    # maturity, routed correlation R, the Art.153(1) maturity slope b,
    # capital K, and the pre-substitution Vasicek weight — every value
    # the kernel already computed, surfaced instead of dropped
    "irb_pd_original",
    "irb_pd_floor",
    "irb_pd_floored",
    "irb_lgd_type",
    "irb_lgd_original",
    "irb_lgd_floor",
    "irb_lgd_floored",
    "irb_maturity_m",
    "irb_correlation_r",
    "irb_maturity_adj_b",
    "irb_capital_k",
    "irb_risk_weight",
    # SA decision block (ref :3021-3025): the CQS consulted, the base
    # ladder weight, the final weight after every override, their delta
    # (rw_source remains the which-branch-fired reason carrier)
    "sa_cqs",
    "sa_base_risk_weight",
    "sa_final_risk_weight",
    "sa_rw_adjustment",
    # the remaining SA decision strings (ref :3025-3030): which rating
    # channel supplied the CQS (agency name / "internal" / null unrated),
    # why the final weight moved off the base ladder, and the CRR / PS1/26
    # article the pricing branch carries,
    "sa_rating_source",
    "sa_rw_adjustment_reason",
    "sa_rw_regulatory_ref",
    # currency-mismatch decomposition (ref :3066-3068): the pre-multiplier
    # snapshot and whether the Art.123A ×1.5 actually applied
    "risk_weight_pre_currency_mismatch",
    "currency_mismatch_multiplier_applied",
    # RE decision block (ref :3045-3053): property type/LTV, the band the
    # income track priced on, the Art.124A qualification outcome, the
    # cash-flow dependency that routed the row, the raw income/ADC input
    # flags, and the RW the RE treatment assigned
    "property_type",
    "property_ltv",
    "ltv_band",
    "is_income_producing",
    "is_adc",
    "is_qualifying_re",
    "materially_dependent_on_property",
    "mortgage_risk_weight",
    # PS1/26 Art.153(5A)/154(4A)/158(6A) post-model adjustments (ref
    # :3070-3076): pre-PMA RWEA, the mortgage-floor increase applied
    # FIRST, the general-PMA/unrecognised scalars on the post-floor base,
    # and the EL twins (expected_loss keeps the pre-PMA value;
    # el_after_adjustment carries the floored-at-zero adjusted figure).
    # IRB-branch columns; zeros under CRR, null on non-IRB branches.
    "rwa_pre_adjustments",
    "mortgage_rw_floor_adjustment",
    "post_model_adjustment_rwa",
    "unrecognised_exposure_adjustment",
    "el_pre_adjustment",
    "post_model_adjustment_el",
    "el_after_adjustment",
    # FCSM decomposition (ref :3016-3018) — simple-method collateral
    # value/substitute weight and the pre-substitution RW snapshot
    "fcsm_collateral_value",
    "fcsm_collateral_rw",
    "pre_fcsm_risk_weight",
    # SL + equity decomposition (ref :3042-3045): the input carriers under
    # the reference's names and each branch's assigned weight
    "sl_type",
    "sl_project_phase",
    "sl_risk_weight",
    "equity_type",
    "equity_risk_weight",
    "equity_higher_risk",
    # PRA Rules 4.1-4.10 equity transitional carriers (ref calculator.py
    # :1110-1126): the COREP OF 07.00 approach annotation and the resolved
    # floor weight; null outside the B3.1 transition window,
    "equity_transitional_approach",
    "equity_transitional_rw",
    # WHY the approach routed as it did (permission diagnostic where the
    # model-permission stage ran, branch rule otherwise — calculators)
    "approach_reason",
    # round-6 widening (ref data/schemas.py:2954-2955, :3098-3100):
    # WHICH collateral items secured the row (sorted, duplicate-free —
    # deterministic under shuffle; crm stage), and the CRR Art.153(3)/
    # 202-203 double-default decomposition — the Art.202 eligibility gate
    # outcome, the guaranteed portion under DD (COREP C 08.01 col 0220),
    # and the LGD the DD formula used (the obligor's own — DD modifies K
    # through PD_g, never LGD). CRR-only: B3.1 rows carry the honest
    # false/null (PS1/26 did not onshore double default).
    "collateral_references",
    "collateral_types",
    # per-type decomposition of the allocated (post-haircut) collateral
    # value (ref data/schemas.py:2963-2968 "Per-type collateral tracking
    # for COREP C 08.01 cols 0170-0210"): financial + receivables + other
    # ≡ collateral_value exactly (RE never enters the FCCM channel — its
    # carrier is sealed by the RE-split stage instead); cash is a reported
    # SUBSET of financial
    "collateral_financial_value",
    "collateral_cash_value",
    "collateral_re_value",
    "collateral_receivables_value",
    "collateral_other_physical_value",
    "is_double_default_eligible",
    "double_default_unfunded_protection",
    "irb_lgd_double_default",
]

# exposure_type → CMS1-style risk-type discriminator (ref
# reporting/pillar3/cms1.py _CCR_RISK_TYPES: the CCR rows key by risk_type,
# never by approach label — under CRR the CCR legs carry approach
# 'standardised' and an approach-based rule would no-op)
_RISK_TYPE_BY_ETYPE = {
    "ccr": "CCR_DERIVATIVE",
    "sft": "CCR_SFT",
    "securitisation_pool": "SECURITISATION",
}


def _provenance_cols(exp: DataFrame, default_risk_type: str = "CREDIT") -> DataFrame:
    """Ensure the round-4 provenance carriers exist on a branch's frame.

    `risk_type` derives from exposure_type where the unified ledger carries
    one (CCR/SFT synthetic netting-set rows, securitisation pools); branches
    built outside the hierarchy union (equity, CIU, settlement) pass their
    own default. `class_reason` defaults to the branch marker when the frame
    never went through run_classify."""
    # one JVM schema fetch: each `df.columns` access is a py4j schema
    # call (~3.5 ms on a wide frame); this helper makes ~115 membership
    # checks, so probe a local set instead
    cols = set(exp.columns)
    # ONE batched withColumns call: a per-column withColumn chain copies
    # and re-analyses the (wide) plan once per column — at 70+ fill
    # candidates the driver-side analysis cost dominates small-SF runs
    _fill: dict[str, Column] = {}
    if "risk_type" not in cols:
        if "exposure_type" in cols:
            rt = F.lit(default_risk_type)
            for etype, label in _RISK_TYPE_BY_ETYPE.items():
                rt = F.when(F.col("exposure_type") == etype, label).otherwise(rt)
            _fill["risk_type"] = rt
        else:
            _fill["risk_type"] = F.lit(default_risk_type)
    if "class_reason" not in cols:
        _fill["class_reason"] = F.lit("CLS_BRANCH_DIRECT")
    if "country" not in cols:
        _fill["country"] = F.lit(None).cast("string")
    if "g_class" not in cols:
        _fill["g_class"] = F.lit(None).cast("string")
    if "model_id" not in cols:
        _fill["model_id"] = F.lit(None).cast("string")
    if "fx_rate" not in cols:
        _fill["fx_rate"] = F.lit(None).cast("double")
    if "slot_category" not in cols:
        _fill["slot_category"] = F.lit(None).cast("string")
    # round-5 carriers: copy from the stage column where the frame went
    # through the hierarchy/classify/crm stages, else honest null
    if "ultimate_parent_reference" not in cols:
        _fill["ultimate_parent_reference"] = (
            F.col("group_reference")
            if "group_reference" in cols
            else F.lit(None).cast("string")
        )
    for name, dtype in (
        ("hierarchy_depth", "int"),
        ("lending_group_reference", "string"),
        ("group_exposure", "double"),
        ("retail_threshold_applied", "boolean"),
        ("retail_subtype", "string"),
        ("is_commercial_re", "boolean"),
        ("is_defaulted", "boolean"),
        ("exposure_type", "string"),
        ("currency", "string"),
        ("parent_counterparty_reference", "string"),
        ("counterparty_has_parent", "boolean"),
        ("retail_eligible_via_group", "boolean"),
        ("exposure_has_parent", "boolean"),
        ("parent_facility_reference", "string"),
        ("ancestor_facilities", "array<string>"),
        ("root_facility_reference", "string"),
        ("facility_hierarchy_depth", "int"),
        ("facility_hierarchy_path", "array<string>"),
        ("collateral_source_level", "string"),
        ("collateral_inherited_from", "string"),
        ("collateral_allocation_method", "string"),
        ("guarantee_source_level", "string"),
        ("guarantee_inherited_from", "string"),
        ("provision_source_level", "string"),
        ("provision_inherited_from", "string"),
        ("crm_allocation_notes", "string"),
        ("data_quality_flags", "array<string>"),
        ("calculation_warnings", "array<string>"),
        ("sme_supporting_factor", "double"),
        ("infra_supporting_factor", "double"),
        ("supporting_factor_benefit", "double"),
        ("ccf_source", "string"),
        ("guarantor_reference", "string"),
        ("approach_reason", "string"),
        ("book_code", "string"),
        ("original_maturity_date", "date"),
        ("approach_permitted", "string"),
        ("borrower_income_currency", "string"),
        ("netting_agreement_reference", "string"),
        ("internal_pd", "double"),
        ("external_cqs", "int"),
        ("ava_amount", "double"),
        ("other_own_funds_reductions", "double"),
        ("sa_rating_source", "string"),
        ("sa_rw_adjustment_reason", "string"),
        ("sa_rw_regulatory_ref", "string"),
        ("collateral_references", "array<string>"),
        ("collateral_types", "array<string>"),
        ("collateral_financial_value", "double"),
        ("collateral_cash_value", "double"),
        ("collateral_re_value", "double"),
        ("collateral_receivables_value", "double"),
        ("collateral_other_physical_value", "double"),
        ("protection_type", "string"),
        ("guarantee_fx_haircut", "double"),
        ("guarantee_restructuring_haircut", "double"),
        ("guarantor_risk_weight", "double"),
        ("is_guaranteed", "boolean"),
        ("guaranteed_portion", "double"),
        ("unguaranteed_portion", "double"),
        ("pre_crm_risk_weight", "double"),
        ("guarantee_benefit_rw", "double"),
        ("guarantee_benefit", "double"),
        ("guarantee_status", "string"),
        ("guarantee_method_used", "string"),
        ("pre_crm_counterparty_reference", "string"),
        ("pre_crm_exposure_class", "string"),
        ("post_crm_counterparty_guaranteed", "string"),
        ("post_crm_exposure_class_guaranteed", "string"),
        ("provision_references", "array<string>"),
        ("scra_provision_amount", "double"),
        ("gcra_provision_amount", "double"),
        ("provision_capped_amount", "double"),
        ("converted_undrawn", "double"),
        ("gross_ead", "double"),
        ("ead_after_collateral", "double"),
        ("ead_calculation_method", "string"),
        ("irb_pd_original", "double"),
        ("irb_pd_floor", "double"),
        ("irb_pd_floored", "double"),
        ("irb_lgd_type", "string"),
        ("irb_lgd_original", "double"),
        ("irb_lgd_floor", "double"),
        ("irb_lgd_floored", "double"),
        ("irb_maturity_m", "double"),
        ("irb_correlation_r", "double"),
        ("irb_maturity_adj_b", "double"),
        ("irb_capital_k", "double"),
        ("irb_risk_weight", "double"),
        ("sa_cqs", "int"),
        ("sa_base_risk_weight", "double"),
        ("sa_final_risk_weight", "double"),
        ("sa_rw_adjustment", "double"),
        ("risk_weight_pre_currency_mismatch", "double"),
        ("currency_mismatch_multiplier_applied", "boolean"),
        ("property_type", "string"),
        ("property_ltv", "double"),
        ("ltv_band", "string"),
        ("is_income_producing", "boolean"),
        ("is_adc", "boolean"),
        ("is_qualifying_re", "boolean"),
        ("materially_dependent_on_property", "boolean"),
        ("mortgage_risk_weight", "double"),
        ("rwa_pre_adjustments", "double"),
        ("mortgage_rw_floor_adjustment", "double"),
        ("post_model_adjustment_rwa", "double"),
        ("unrecognised_exposure_adjustment", "double"),
        ("el_pre_adjustment", "double"),
        ("post_model_adjustment_el", "double"),
        ("el_after_adjustment", "double"),
        ("fcsm_collateral_value", "double"),
        ("fcsm_collateral_rw", "double"),
        ("pre_fcsm_risk_weight", "double"),
        ("sl_type", "string"),
        ("sl_project_phase", "string"),
        ("sl_risk_weight", "double"),
        ("equity_type", "string"),
        ("equity_risk_weight", "double"),
        ("equity_higher_risk", "boolean"),
        ("equity_transitional_approach", "string"),
        ("equity_transitional_rw", "double"),
        ("is_double_default_eligible", "boolean"),
        ("double_default_unfunded_protection", "double"),
        ("irb_lgd_double_default", "double"),
    ):
        if name not in cols:
            _fill[name] = F.lit(None).cast(dtype)
    if _fill:
        exp = exp.withColumns(_fill)
        cols |= _fill.keys()
    # identity fills, one more batched withColumns (same plan-copy
    # rationale as the null fill above):
    # - source_exposure_reference: a never-split row is its own source
    # - facility-structure identities for bundles with no facility data
    #   (no parent, depth 0, own 1-element path; ref schemas.py:2911-2915)
    # - guarantee_references: 0/1-element list from the crm stage's scalar
    #   (single first-wins guarantee per exposure — recorded narrowing)
    # - guarantee_coverage_pct carries the DECLARED '% guaranteed' (ref
    #   contract); the Art.233(3) post-haircut figure seals separately as
    #   guarantee_effective_coverage_pct
    # - final_ead: the figure RWA actually priced on
    _ident: dict[str, Column] = {}
    has_ref = "exposure_reference" in cols
    if has_ref:
        _ident["source_exposure_reference"] = F.coalesce(
            *(
                [F.col("source_exposure_reference")]
                if "source_exposure_reference" in cols
                else []
            ),
            F.col("exposure_reference"),
        )
    elif "source_exposure_reference" not in cols:
        _ident["source_exposure_reference"] = F.lit(None).cast("string")
    _ident["exposure_has_parent"] = F.coalesce(
        "exposure_has_parent", F.lit(False)
    )
    _ident["facility_hierarchy_depth"] = F.coalesce(
        "facility_hierarchy_depth", F.lit(0)
    )
    if has_ref:
        _ident["facility_hierarchy_path"] = F.coalesce(
            "facility_hierarchy_path", F.array(F.col("exposure_reference"))
        )
    # parent_exposure_reference (ref :2885 "original exposure before
    # multi-guarantor split"): this engine never row-splits on guarantors
    # (portions stay on-row), so the parent IS the row's own reference
    if has_ref:
        _ident["parent_exposure_reference"] = F.coalesce(
            *(
                [F.col("parent_exposure_reference")]
                if "parent_exposure_reference" in cols
                else []
            ),
            F.col("exposure_reference"),
        )
    elif "parent_exposure_reference" not in cols:
        _ident["parent_exposure_reference"] = F.lit(None).cast("string")
    # approach_permitted (ref :2935): the permission grant routing
    # consulted — model-permission grants where that stage ran, else the
    # bundle's blanket has_irb_permission flag
    if "model_airb_permitted" in cols:
        _ident["approach_permitted"] = (
            F.when(F.coalesce("model_airb_permitted", F.lit(False)), "AIRB")
            .when(F.coalesce("model_firb_permitted", F.lit(False)), "FIRB")
            .when(F.coalesce("model_slotting_permitted", F.lit(False)), "SLOTTING")
            .otherwise("SA")
        )
    elif "has_irb_permission" in cols:
        _ident["approach_permitted"] = F.when(
            F.coalesce("has_irb_permission", F.lit(False)), "AIRB"
        ).otherwise("SA")
    # guarantor id list (ref :2973 — 0/1-element, same narrowing as
    # guarantee_references); guarantor_reference was null-filled above
    _ident["guarantor_references"] = F.coalesce(
        *(
            [F.col("guarantor_references")]
            if "guarantor_references" in cols
            else []
        ),
        F.when(
            F.col("guarantor_reference").isNotNull(),
            F.array(F.col("guarantor_reference")),
        ),
    )
    if "guarantee_references" not in cols:
        _ident["guarantee_references"] = (
            F.when(
                F.col("guarantee_reference").isNotNull(),
                F.array(F.col("guarantee_reference")),
            )
            if "guarantee_reference" in cols
            else F.lit(None).cast("array<string>")
        )
    if "guarantee_coverage_pct" not in cols:
        _ident["guarantee_coverage_pct"] = (
            F.col("g_coverage_declared")
            if "g_coverage_declared" in cols
            else (
                F.col("g_coverage")
                if "g_coverage" in cols
                else F.lit(None).cast("double")
            )
        )
    if "guarantee_effective_coverage_pct" not in cols:
        _ident["guarantee_effective_coverage_pct"] = (
            F.col("g_coverage")
            if "g_coverage" in cols
            else F.lit(None).cast("double")
        )
    if "final_ead" not in cols:
        _ident["final_ead"] = (
            F.col("ead_after_crm")
            if "ead_after_crm" in cols
            else (
                F.col("ead") if "ead" in cols else F.lit(None).cast("double")
            )
        )
    # substitution-free branches: the hypothetical equals the actual (only
    # frames that already carry rwa — SA/IRB set their own upstream)
    if "rwa_pre_crm_substitution" not in cols and "rwa" in cols:
        _ident["rwa_pre_crm_substitution"] = F.col("rwa")
    return exp.withColumns(_ident)


def _param_cols(
    exp: DataFrame, pd_col=None, lgd_col=None, m_col=None, cols=None
) -> DataFrame:
    if cols is None:
        cols = _colset(exp)
    return exp.withColumns(
        {
            "ccf": F.col("ccf").cast("double")
            if "ccf" in cols
            else F.lit(None).cast("double"),
            "pd_used": pd_col if pd_col is not None else F.lit(None).cast("double"),
            "lgd_used": lgd_col
            if lgd_col is not None
            else F.lit(None).cast("double"),
            "maturity_used": m_col
            if m_col is not None
            else F.lit(None).cast("double"),
        }
    )


def _crm_carry(exp: DataFrame) -> DataFrame:
    """Ensure the CRM component columns exist (zero when the branch input
    never went through run_crm, e.g. equity)."""
    exp = exp.withColumns(
        {
            c: (F.coalesce(c, F.lit(0.0)) if c in exp.columns else F.lit(0.0))
            for c in (
                "provision_allocated",
                "collateral_value",
                "g_coverage",
                "collateral_value_gross",
                "haircut_quality",
                "haircut_fx",
                "haircut_maturity_mismatch",
                "on_bs_netting_amount",
            )
        }
    )
    return _provenance_cols(exp)


def _el_columns(
    exp: DataFrame, expected_loss: Column, pool_b_extras: bool = False, cols=None
) -> DataFrame:
    """EL + shortfall/excess vs the CRR Art.159(1) Pool B: allocated
    provisions plus, on the IRB legs only (pool_b_extras=True) and when the
    loader supplied them, the per-exposure Art.159(1)(c)/(d) components —
    additional value adjustments (Art.34/105 AVAs) and other own-funds
    reductions (ref engine/irb/adjustments.py
    compute_el_shortfall_excess:306-353 — components enter the pool exactly
    once, at this stage; null inputs contribute 0 to the POOL but stay null
    on their ledger carriers)."""
    pool_b = F.coalesce("provision_allocated", F.lit(0.0))
    if pool_b_extras:
        if cols is None:
            cols = _colset(exp)
        for extra in ("ava_amount", "other_own_funds_reductions"):
            if extra in cols:
                pool_b = pool_b + F.coalesce(extra, F.lit(0.0))
    # shortfall/excess inline the expected_loss expression (identical
    # arithmetic DAG) so all three land in one projection
    return exp.withColumns(
        {
            "expected_loss": expected_loss,
            "el_shortfall": F.greatest(expected_loss - pool_b, F.lit(0.0)),
            "el_excess": F.greatest(pool_b - expected_loss, F.lit(0.0)),
        }
    )


def _pd_floor_class_expr(pack: RulePack, df: DataFrame, cols=None) -> Column:
    """Per-exposure-class IRB PD floor (ref engine/irb/formulas.py
    _pd_floor_expression + rulebook/packs "pd_floors"): under CRR the 0.03%
    floor reaches corporates/institutions (Art.160(1)) and retail
    (Art.163(1)) but NO article reaches central governments/central banks —
    the sovereign floor is 0. B3.1 (PS1/26 / BCBS CRE30.55) differentiates:
    retail mortgages and QRRE revolvers 0.10%, QRRE transactors and
    everything else 0.05%. Frames without an is_qrre_transactor carrier
    take the conservative revolver floor (the reference's
    has_transactor_col=False path); unknown classes default to the
    corporate floor (the reference's fill_null('CORPORATE'))."""
    f = pack.table_map("pd_floor_by_class")
    if cols is None:
        cols = _colset(df)
    sub = (
        F.col("retail_subtype")
        if "retail_subtype" in cols
        else F.lit(None).cast("string")
    )
    trans = (
        F.coalesce(F.col("is_qrre_transactor"), F.lit(False))
        if "is_qrre_transactor" in cols
        else F.lit(False)
    )
    # Art.147(3)/(4)(b): floors key on the IRB-equivalent class where the
    # caller has routed one (run_irb seals irb_exposure_class)
    cls = (
        F.col("irb_exposure_class")
        if "irb_exposure_class" in cols
        else F.col("exposure_class")
    )
    is_retail = cls == "retail"
    return (
        F.when(cls == "sovereign", F.lit(f["sovereign"]))
        .when(is_retail & (sub == "mortgage"), F.lit(f["retail_mortgage"]))
        .when(
            is_retail & (sub == "qrre") & trans,
            F.lit(f["retail_qrre_transactor"]),
        )
        .when(is_retail & (sub == "qrre"), F.lit(f["retail_qrre_revolver"]))
        .when(is_retail, F.lit(f["retail_other"]))
        .when(cls == "institution", F.lit(f["institution"]))
        .otherwise(F.lit(f["corporate"]))
    )


def _guarantor_pd_floor_expr(pack: RulePack, gclass: Column) -> Column:
    """PD floor for a substituted guarantor PD, keyed on the GUARANTOR's
    own class (CRR Art.160(4) / ref _pd_floor_expression's
    guarantor_exposure_class routing — the covered portion is a direct
    exposure to the guarantor, so the guarantor's class floor governs;
    sovereign guarantors are unfloored under CRR)."""
    f = pack.table_map("pd_floor_by_class")
    return (
        F.when(gclass == "sovereign", F.lit(f["sovereign"]))
        .when(gclass == "institution", F.lit(f["institution"]))
        .otherwise(F.lit(f["corporate"]))
    )


def _lgd_floor_expr(pack: RulePack, df: DataFrame, cols=None) -> Column:
    """A-IRB LGD input floor (feature-gated; ref engine/irb/formulas.py
    _lgd_floor_expression / _lgd_floor_blended_expression, PS1/26
    Art.161(5) corporate + Art.164(4) retail; CRR returns 0 — no A-IRB
    floors). Flat class floor (25% corporate / 5% retail-RRE / 50% QRRE /
    30% other-retail) for unprotected rows; where recognised funded
    protection is present the Art.161(5)(b)/164(4)(c) floor is the blend
    of per-collateral-type LGDS and the class LGDU, weighted over the
    Art.230(1) CCF=100% basis E = drawn + undrawn — the per-type
    allocations are the CRM stage's own sealed decomposition (financial /
    receivables / other-physical; RE rides collateral_re_value). Retail
    mortgages keep the flat 5% (Art.164(4)(a) — the reference's blend
    deny-list). F-IRB rows are never floored (supervisory LGDs)."""
    if pack.scalar("airb_lgd_floor") < 1.0:
        return F.lit(0.0)
    f = pack.table_map("lgd_floors")
    have = set(df.columns) if cols is None else cols
    sub = (
        F.col("retail_subtype")
        if "retail_subtype" in have
        else F.lit(None).cast("string")
    )
    cls = (
        F.col("irb_exposure_class")
        if "irb_exposure_class" in have
        else F.col("exposure_class")
    )
    is_retail = cls == "retail"
    is_mortgage = is_retail & (sub == "mortgage")
    lgdu = (
        F.when(is_mortgage, F.lit(f["retail_rre"]))
        .when(is_retail & (sub == "qrre"), F.lit(f["retail_qrre_unsecured"]))
        .when(is_retail, F.lit(f["retail_other_unsecured"]))
        .otherwise(F.lit(f["unsecured"]))
    )
    floor = lgdu
    if "collateral_value" in have and "collateral_financial_value" in have:
        fin = F.coalesce("collateral_financial_value", F.lit(0.0))
        recv = (
            F.coalesce("collateral_receivables_value", F.lit(0.0))
            if "collateral_receivables_value" in have
            else F.lit(0.0)
        )
        oth = (
            F.coalesce("collateral_other_physical_value", F.lit(0.0))
            if "collateral_other_physical_value" in have
            else F.lit(0.0)
        )
        re_v = (
            F.coalesce("collateral_re_value", F.lit(0.0))
            if "collateral_re_value" in have
            else F.lit(0.0)
        )
        tot = F.coalesce("collateral_value", F.lit(0.0)) + re_v
        raw_basis = (
            F.coalesce("drawn_amount", F.lit(0.0))
            + F.coalesce("undrawn_amount", F.lit(0.0))
            if "drawn_amount" in have
            else F.coalesce("ead", F.lit(0.0))
        )
        # convexity guard: allocations never exceed the basis they were
        # allocated against, but a basis narrower than total protection
        # (bundle shapes without drawn/undrawn carriers) must not produce
        # negative unsecured weight
        basis = F.greatest(raw_basis, tot)
        unsec = F.greatest(basis - tot, F.lit(0.0))
        blend = (
            unsec * lgdu
            + fin * F.lit(f["financial_collateral"])
            + recv * F.lit(f["receivables"])
            + re_v * F.lit(f["residential_real_estate"])
            + oth * F.lit(f["other_physical"])
        ) / F.nullif(basis, F.lit(0.0))
        floor = F.when(
            (tot > 0) & ~is_mortgage, F.coalesce(blend, lgdu)
        ).otherwise(lgdu)
    if "irb_subapproach" in have:
        floor = F.when(
            F.coalesce(F.col("irb_subapproach"), F.lit("airb")) == "firb",
            F.lit(0.0),
        ).otherwise(floor)
    return floor


def _irb_guarantee_adjust(
    perf: DataFrame, pack: RulePack, spark, cols=None
) -> tuple[DataFrame, Column]:
    """IRB unfunded-protection treatment (ref engine/irb/guarantee.py
    apply_guarantee_substitution, 902 LoC distilled to its dataflow):

    - SA guarantor (no internal PD): RW substitution — the covered leg takes
      the guarantor's SA risk weight (CRR Art.235 / Basel 3.1 SA guarantors).
    - IRB guarantor (``guarantor_pd`` supplied): parameter substitution —
      the covered leg re-prices through the full Vasicek kernel with the
      guarantor's floored PD, the Art.161(1) supervisory LGD selected by
      seniority/FSE status, and the guarantor-PD corporate correlation
      (CRR Art.161(3) / B3.1 CRE22.70-85). The reference's Art.160(4)
      "no better than direct" floor is an identity here because the PSM LGD
      IS the direct supervisory LGD (psm_lgd_source=option_ii distilled).
    - Double default (CRR Art.153(3)/202-203, pack-gated — CRR only):
      RW_dd = RW_obligor × (0.15 + 160·PD_g) when the underlying is
      corporate, the guarantor is an institution/sovereign/MDB or a
      CQS≤2 corporate with an internal PD, and the row is A-IRB routed;
      taken when lower than the substitution RW.
    - Art.193(1) benefit gate: the guarantee is DECLINED (not capped)
      unless guarantor RW < borrower IRB RW; beneficial rows blend
      RWA = (1−g)·RW_own + g·RW_guarantor over EAD.
    - EL (ref _adjust_expected_loss): SA guarantor keeps only the retained
      share's EL; PD substitution adds PD_g·LGD_g on the covered leg;
      double default retains full obligor EL (DD modifies K, not EL).

    Returns the adjusted frame plus the EL expression for _el_columns.
    """
    el_own = F.col("pd_floored") * F.col("lgd_floored") * F.col("ead_after_crm")
    if cols is None:
        cols = _colset(perf)
    if "g_class" not in cols:
        return perf, el_own
    # rank-1 scalars price the n<=1 books bit-for-bit and feed the
    # priority-1 audit carriers; exposures with 2+ guarantees take the
    # multi-leg stack fold below (every leg through its own channel)
    g = F.coalesce("g_coverage", F.lit(0.0))

    grw = pack.table_df(spark, "sa_rw").select(
        F.col("exposure_class").alias("_gi_class"),
        F.col("cqs").alias("_gi_cqs"),
        F.col("rw").alias("_g_rw_sa"),
    )
    perf = perf.join(
        F.broadcast(grw),
        (F.col("g_class") == F.col("_gi_class"))
        & (F.coalesce(F.col("g_cqs"), F.lit(0)) == F.col("_gi_cqs")),
        "left",
    ).drop("_gi_class", "_gi_cqs")
    guarantor_rw = F.col("_g_rw_sa")
    method = F.when(F.col("_g_rw_sa").isNotNull(), F.lit("sub_sa")).otherwise(
        F.lit(None).cast("string")
    )

    has_gpd = "guarantor_pd" in cols
    has_dd_carrier = False  # _dd_elig is stage-internal: tracked, not probed
    if has_gpd:
        sen = (
            F.coalesce(F.col("guarantor_seniority"), F.lit("senior"))
            if "guarantor_seniority" in cols
            else F.lit("senior")
        )
        fse = (
            F.coalesce(F.col("guarantor_is_fse"), F.lit(False))
            if "guarantor_is_fse" in cols
            else F.lit(False)
        )
        perf = perf.withColumns(
            {
                "_pd_g_fl": F.greatest(
                    F.col("guarantor_pd"),
                    _guarantor_pd_floor_expr(pack, F.col("g_class")),
                ),
                "_lgd_g": F.when(
                    sen == "subordinated", pack.lit("firb_lgd_subordinated")
                )
                .when(fse, pack.lit("firb_lgd_senior_fse"))
                .otherwise(pack.lit("firb_lgd_senior")),
            }
        )
        perf = with_normal_ppf(perf, "_pd_g_fl", "_g_gpd")
        perf = perf.withColumn("_r_g", spark_correlation("_pd_g_fl"))
        perf = with_irb_k_r(perf, "_pd_g_fl", "_lgd_g", "_g_gpd", "_r_g", "_k_g")
        rw_irb_g = (
            F.col("_k_g")
            * irb_maturity_adj(F.col("_pd_g_fl"), F.col("m_eff"))
            * F.lit(12.5)
            * pack.lit("irb_scaling_factor")
        )
        guarantor_rw = F.when(F.col("guarantor_pd").isNotNull(), rw_irb_g).otherwise(
            guarantor_rw
        )
        method = F.when(F.col("guarantor_pd").isNotNull(), F.lit("sub_pd")).otherwise(
            method
        )
        if pack.scalar("double_default_available") >= 1.0:
            is_airb = (
                F.coalesce(F.col("irb_subapproach"), F.lit("")) == "airb"
                if "irb_subapproach" in cols
                else F.lit(False)
            )
            elig_g_type = F.coalesce(F.col("g_class"), F.lit("")).isin(
                "institution", "sovereign", "mdb"
            ) | (
                (F.col("g_class") == "corporate")
                & (F.coalesce(F.col("g_cqs"), F.lit(99)) <= 2)
            )
            dd_elig = (
                (g > 0)
                & (F.col("exposure_class") == "corporate")
                & elig_g_type
                & F.col("guarantor_pd").isNotNull()
                & is_airb
            )
            rw_dd = F.col("risk_weight") * (
                pack.lit("dd_k_base") + pack.lit("dd_k_slope") * F.col("_pd_g_fl")
            )
            dd_applies = dd_elig & (
                rw_dd < F.coalesce(guarantor_rw, F.lit(float("inf")))
            )
            guarantor_rw = F.when(dd_applies, rw_dd).otherwise(guarantor_rw)
            method = F.when(dd_applies, F.lit("dd")).otherwise(method)
            # eligibility carrier staged here (where the gate is known);
            # the APPLIED carriers seal after the Art.193(1) benefit test
            # below, which can still decline the guarantee
            perf = perf.withColumn("_dd_elig", dd_elig)
            has_dd_carrier = True

    # _g_ben re-uses the guarantor_rw Column object (same JVM expression,
    # identical value to reading the _g_rw column) so all three land in one
    # projection
    perf = perf.withColumns(
        {
            "_g_rw": guarantor_rw,
            "_g_method": method,
            "_g_ben": (g > 0)
            & guarantor_rw.isNotNull()
            & (guarantor_rw < F.col("risk_weight")),
        }
    )

    # --- multi-guarantee stack on the IRB channel (closes the rank-1
    # narrowing; ref engine/irb/guarantee.py multi-leg waterfall): the crm
    # stage's priority-ordered `_mg` structs now carry each leg's modelled
    # carriers (pd/seniority/FSE/class/CQS), so EVERY leg prices through
    # its own channel — SA RW substitution from the pre-resolved ladder
    # weight, parameter substitution through the full Vasicek kernel with
    # the leg's floored PD + Art.161(1) LGD, double default per leg where
    # Art.202/203 eligible — entirely in array expressions (zero new
    # shuffle; the per-leg Φ/Φ⁻¹ route through the same generated-Java
    # kernel as the scalar path, pure-Column Cody/Acklam fallback).
    # Gated on size>1: books with at most one guarantee per exposure keep
    # the legacy rank-1 expressions bit-for-bit. The rank-1 scalar
    # carriers (guarantor_risk_weight, the method enums, the DD block)
    # keep describing the PRIORITY-1 leg — the stack's pricing is total,
    # its audit detail per-leg lives in guarantee_references order.
    has_mg = "_mg" in cols
    if has_mg:
        from rwa_calculator_spark.functions.irb import correlation_v
        from rwa_calculator_spark.functions.jvm_kernel import (
            CDF_FN,
            PPF_FN,
            ensure_jvm_kernel,
        )
        from rwa_calculator_spark.functions.stats import (
            G_999,
            SparkB,
            V,
            norm_cdf_v,
            norm_ppf_v,
        )

        _mg_arr = F.coalesce(
            F.col("_mg"), F.array().cast(perf.schema["_mg"].dataType)
        )
        _is_multi = F.size(_mg_arr) > 1
        _own0 = F.col("risk_weight")
        _kern = ensure_jvm_kernel(spark)
        _row_airb = (
            F.coalesce(F.col("irb_subapproach"), F.lit("")) == "airb"
            if "irb_subapproach" in cols
            else F.lit(False)
        )
        _dd_pack = pack.scalar("double_default_available") >= 1.0

        def _leg_params(x):
            pdfl = F.when(
                x["pd"].isNotNull(),
                F.greatest(x["pd"], _guarantor_pd_floor_expr(pack, x["gclass"])),
            )
            lgdg = (
                F.when(
                    F.coalesce(x["sen"], F.lit("senior")) == "subordinated",
                    pack.lit("firb_lgd_subordinated"),
                )
                .when(
                    F.coalesce(x["fse"], F.lit(False)),
                    pack.lit("firb_lgd_senior_fse"),
                )
                .otherwise(pack.lit("firb_lgd_senior"))
            )
            gq = (
                F.call_function(PPF_FN, pdfl)
                if _kern
                else norm_ppf_v(V(SparkB, pdfl)).v
            )
            return F.struct(
                x["slice"].alias("slice"),
                x["rw"].alias("rw"),
                pdfl.alias("pdfl"),
                lgdg.alias("lgdg"),
                x["gclass"].alias("gclass"),
                x["gcqs"].alias("gcqs"),
                gq.alias("gq"),
                correlation_v(V(SparkB, pdfl)).v.alias("r"),
            )

        perf = perf.withColumn(
            "_mgl", F.when(_is_multi, F.transform(_mg_arr, _leg_params))
        )

        def _leg_rw(x):
            arg = (x["gq"] + F.sqrt(x["r"]) * F.lit(G_999)) / F.sqrt(
                F.lit(1.0) - x["r"]
            )
            phi = (
                F.call_function(CDF_FN, arg)
                if _kern
                else norm_cdf_v(V(SparkB, arg)).v
            )
            k_leg = x["lgdg"] * phi - x["pdfl"] * x["lgdg"]
            rw_irb = (
                k_leg
                * irb_maturity_adj(x["pdfl"], F.col("m_eff"))
                * F.lit(12.5)
                * pack.lit("irb_scaling_factor")
            )
            rw_sub = F.when(x["pdfl"].isNotNull(), rw_irb).otherwise(x["rw"])
            meth = F.when(x["pdfl"].isNotNull(), F.lit("sub_pd")).otherwise(
                F.when(x["rw"].isNotNull(), F.lit("sub_sa"))
            )
            if _dd_pack:
                elig_t = F.coalesce(x["gclass"], F.lit("")).isin(
                    "institution", "sovereign", "mdb"
                ) | (
                    (x["gclass"] == "corporate")
                    & (F.coalesce(x["gcqs"], F.lit(99)) <= 2)
                )
                dd_elig = (
                    (x["slice"] > 0)
                    & (F.col("exposure_class") == "corporate")
                    & elig_t
                    & x["pdfl"].isNotNull()
                    & _row_airb
                )
                rw_dd = _own0 * (
                    pack.lit("dd_k_base") + pack.lit("dd_k_slope") * x["pdfl"]
                )
                dd_app = dd_elig & (
                    rw_dd < F.coalesce(rw_sub, F.lit(float("inf")))
                )
                rw_sub = F.when(dd_app, rw_dd).otherwise(rw_sub)
                meth = F.when(dd_app, F.lit("dd")).otherwise(meth)
            return F.struct(
                x["slice"].alias("slice"),
                rw_sub.alias("rwl"),
                x["pdfl"].alias("pdfl"),
                x["lgdg"].alias("lgdg"),
                meth.alias("meth"),
            )

        perf = perf.withColumn("_mgl", F.transform(F.col("_mgl"), _leg_rw))

        # priority-ordered left fold (deterministic addition order — the
        # oracle mirrors it term-by-term): per leg the covered slice takes
        # min(own, leg RW) — each slice individually neutral-or-beneficial
        # (Art.193(1) per leg) — and the EL rate follows the leg's channel:
        # DD retains full obligor EL, parameter substitution re-prices the
        # slice at PD_g·LGD_g, SA substitution drops the slice's EL,
        # a non-beneficial leg keeps the obligor rate.
        _el_rate_own = F.col("pd_floored") * F.col("lgd_floored")
        _mg_fold = F.aggregate(
            F.coalesce(F.col("_mgl"), F.array().cast(perf.schema["_mgl"].dataType)),
            F.struct(
                F.lit(0.0).alias("g"),
                F.lit(0.0).alias("t"),
                F.lit(0.0).alias("el"),
            ),
            lambda acc, x: F.struct(
                (acc["g"] + x["slice"]).alias("g"),
                (
                    acc["t"]
                    + x["slice"] * F.least(_own0, F.coalesce(x["rwl"], _own0))
                ).alias("t"),
                (
                    acc["el"]
                    + F.when(
                        F.coalesce(x["rwl"] < _own0, F.lit(False)),
                        F.when(x["meth"] == "dd", x["slice"] * _el_rate_own)
                        .when(
                            x["meth"] == "sub_pd",
                            x["slice"] * x["pdfl"] * x["lgdg"],
                        )
                        .otherwise(F.lit(0.0)),
                    ).otherwise(x["slice"] * _el_rate_own)
                ).alias("el"),
            ),
        )
        perf = perf.withColumn("_mgf", F.when(_is_multi, _mg_fold))
        _mg_g = F.col("_mgf").getField("g")
        _mg_t = F.col("_mgf").getField("t")
    else:
        _is_multi = F.lit(False)
        _mg_g = F.lit(0.0)
        _mg_t = F.lit(0.0)

    perf = perf.withColumn("pre_crm_risk_weight", F.col("risk_weight"))
    # every expression BELOW the blend references the sealed snapshot —
    # F.col("risk_weight") would re-resolve to the mutated value
    _own_p = F.col("pre_crm_risk_weight")
    _mg_ben = _is_multi & (_mg_t < _mg_g * _own_p)
    # both expressions read the PRE-blend risk_weight/rw_source — one
    # batched projection preserves that (withColumns evaluates against the
    # input frame)
    perf = perf.withColumns(
        {
            "risk_weight": F.when(_is_multi, _mg_t + (F.lit(1.0) - _mg_g) * _own_p)
            .when(
                F.col("_g_ben"),
                (F.lit(1.0) - g) * F.col("risk_weight") + g * F.col("_g_rw"),
            )
            .otherwise(F.col("risk_weight")),
            "rw_source": F.when(
                _mg_ben, F.concat(F.col("rw_source"), F.lit("+gmulti"))
            )
            .when(_is_multi | ~F.col("_g_ben"), F.col("rw_source"))
            .otherwise(
                F.concat(F.col("rw_source"), F.lit("+g"), F.col("_g_method"))
            ),
        }
    )
    # guarantee-impact ledger block, IRB side (ref
    # engine/irb/guarantee.py:865-903 _add_guarantee_status_columns +
    # CALCULATION_OUTPUT_SCHEMA :2972-3005). Method semantics follow the
    # reference exactly: the PSM path is RECORDED whenever an IRB
    # guarantor's parameter substitution was traversed (PS1/26
    # Art.236(1)(a)), independent of the Art.193(1) benefit outcome — the
    # non-beneficial signal lives on guarantee_status; DD and SA RW
    # substitution report only where they actually repriced the row.
    _g_m = F.coalesce(F.col("_g_method"), F.lit(""))
    # is_guaranteed means protection EXISTS (ref crm/guarantees.py:183
    # guaranteed_portion > 0; aggregator.py:706-707 warns the beneficial
    # test is a separate downstream gate) — the Art.193(1) benefit outcome
    # lives on guarantee_status / guarantee_method_used, never here.
    # Multi-guarantee rows: the portion/benefit columns cover the WHOLE
    # stack (Σ slices, aggregate RW relief); the method/status enums and
    # guarantor_risk_weight keep describing the priority-1 leg (same
    # convention as the SA channel).
    _g_eff = F.when(_is_multi, _mg_g).otherwise(g)
    _ben_eff = F.when(_is_multi, _mg_ben).otherwise(F.col("_g_ben"))
    # guarantee_benefit re-uses guarantee_benefit_rw's expression inline
    # (same value) so the whole carrier block lands in ONE projection —
    # every other expression reads only pre-block columns
    _ben_rw = F.when(
        _ben_eff, F.col("pre_crm_risk_weight") - F.col("risk_weight")
    ).otherwise(0.0)
    perf = perf.withColumns(
        {
            "is_guaranteed": _g_eff > 0,
            "guaranteed_portion": F.when(
                _g_eff > 0, _g_eff * F.col("ead_after_crm")
            ).otherwise(0.0),
            "unguaranteed_portion": F.col("ead_after_crm")
            - F.when(_g_eff > 0, _g_eff * F.col("ead_after_crm")).otherwise(0.0),
            "guarantor_risk_weight": F.when(_g_eff > 0, F.col("_g_rw")),
            "guarantee_benefit_rw": _ben_rw,
            "guarantee_benefit": _ben_rw * F.col("ead_after_crm"),
            "guarantee_status": F.when(~(_g_eff > 0), "NO_GUARANTEE")
            .when(~_ben_eff, "GUARANTEE_NOT_APPLIED_NON_BENEFICIAL")
            .when(_g_m == "dd", "DOUBLE_DEFAULT")
            .when(_g_m == "sub_pd", "PD_PARAMETER_SUBSTITUTION")
            .otherwise("SA_RW_SUBSTITUTION"),
            "guarantee_method_used": F.when(
                _ben_eff & (_g_m == "dd"), "DOUBLE_DEFAULT"
            )
            .when((_g_eff > 0) & (_g_m == "sub_pd"), "PD_PARAMETER_SUBSTITUTION")
            .when(_ben_eff, "SA_RW_SUBSTITUTION")
            .otherwise("NO_SUBSTITUTION"),
            "pre_crm_counterparty_reference": F.col("counterparty_reference"),
            "pre_crm_exposure_class": F.col("exposure_class"),
            "post_crm_counterparty_guaranteed": F.when(
                g > 0,
                F.col("guarantor_reference")
                if "guarantor_reference" in cols
                else F.lit(None).cast("string"),
            ),
            "post_crm_exposure_class_guaranteed": F.when(g > 0, F.col("g_class")),
        }
    )

    # double-default audit carriers (ref CALCULATION_OUTPUT_SCHEMA
    # :3098-3100): eligibility is the Art.202/203 gate outcome; the applied
    # carriers seal only where DD actually priced the row (benefit test
    # passed AND the DD K beat substitution) — the guaranteed portion
    # (g × EAD, the COREP 0220 figure) and the LGD the DD formula used
    # (= the obligor's own floored LGD; DD modifies K through PD_g, not LGD)
    if has_dd_carrier:
        dd_on = F.col("_g_ben") & (F.col("_g_method") == "dd")
        perf = perf.withColumns(
            {
                "is_double_default_eligible": F.coalesce(
                    F.col("_dd_elig"), F.lit(False)
                ),
                "double_default_unfunded_protection": F.when(
                    dd_on, g * F.col("ead_after_crm")
                ),
                "irb_lgd_double_default": F.when(dd_on, F.col("lgd_floored")),
            }
        ).drop("_dd_elig")

    if has_gpd:
        el = (
            F.when(F.col("_g_ben") & (F.col("_g_method") == "dd"), el_own)
            .when(
                F.col("_g_ben") & (F.col("_g_method") == "sub_pd"),
                (F.lit(1.0) - g) * el_own
                + F.col("_pd_g_fl") * F.col("_lgd_g") * g * F.col("ead_after_crm"),
            )
            .when(F.col("_g_ben"), (F.lit(1.0) - g) * el_own)
            .otherwise(el_own)
        )
    else:
        el = F.when(F.col("_g_ben"), (F.lit(1.0) - g) * el_own).otherwise(el_own)
    if has_mg:
        # stack EL: the fold accumulated per-unit-EAD rates leg by leg in
        # priority order; the uncovered remainder keeps the obligor rate
        _el_multi = (
            F.col("_mgf").getField("el")
            + (F.lit(1.0) - _mg_g)
            * (F.col("pd_floored") * F.col("lgd_floored"))
        ) * F.col("ead_after_crm")
        el = F.when(_is_multi, _el_multi).otherwise(el)
    return perf, el


def _supporting_factor_exprs(pack: RulePack, threshold_scale: float, columns):
    """CRR2 Art.501 tiered SME factor + Art.501a infrastructure factor
    (ref engine/supporting_factors.py SupportingFactorCalculator — the
    reference applies them on EVERY branch: sa/factors_output.py,
    irb/calculator.py:168, slotting/calculator.py:176). Returns
    (sme_f, infra_f, sf = most-beneficial min).

    Art.501(2)(b): defaulted exposures are excluded from the SME factor
    (ref supporting_factors.py sme_eligible ~is_defaulted); the
    infrastructure factor carries no defaulted exclusion. Both collapse to
    1.0 under B3.1 (factors removed — pack scalars are 1.0)."""
    f1 = pack.scalar("sme_supporting_factor")
    f2 = pack.scalar("sme_factor_above_threshold")
    thr = pack.scalar("sme_exposure_threshold") * threshold_scale
    revenue_cap = pack.scalar("sme_revenue_cap") * threshold_scale
    # column-presence guards: direct-call CRM-shaped frames (guarantee /
    # double-default test books) skip classify and may not carry the
    # group aggregate — they price factor 1.0 exactly as before
    if not {"exposure_class", "annual_revenue", "is_defaulted"} <= set(columns):
        return F.lit(1.0), F.lit(1.0), F.lit(1.0)
    sme_cond = (
        (F.col("exposure_class") == "corporate")
        & (F.col("annual_revenue") > 0)
        & (F.col("annual_revenue") <= revenue_cap)
        & ~F.col("is_defaulted")
    )
    if (f1 >= 1.0 and f2 >= 1.0) or "group_drawn" not in columns:
        sme_f = F.lit(1.0)  # factors removed (B3.1) / no group aggregate
    else:
        gd = F.col("group_drawn")
        blended = F.when(
            gd > 0,
            (
                F.least(gd, F.lit(thr)) * F.lit(f1)
                + F.greatest(gd - F.lit(thr), F.lit(0.0)) * F.lit(f2)
            )
            / gd,
        ).otherwise(F.lit(f1))
        sme_f = F.when(sme_cond, blended).otherwise(F.lit(1.0))
    if "is_infrastructure" in columns:
        infra_f = F.when(
            F.col("is_infrastructure"), pack.lit("infra_supporting_factor")
        ).otherwise(F.lit(1.0))
    else:
        infra_f = F.lit(1.0)
    return sme_f, infra_f, F.least(sme_f, infra_f)


def run_sa(
    crm: CRMOutput,
    pack: RulePack,
    threshold_scale: float = 1.0,
    use_ig_assessment: bool = False,
) -> CalcOutput:
    spark = crm.exposures.sparkSession
    exp = crm.exposures.where(
        ~F.col("has_irb_permission")
        & ~F.col("is_specialised")
        & (F.col("exposure_class") != "securitisation")
    )
    exp = _crm_carry(exp)
    cols = _colset(exp)

    rw_table = pack.broadcast_table(spark, "sa_rw")
    exp = exp.join(
        rw_table,
        (exp.exposure_class == rw_table.exposure_class) & (F.coalesce(exp.cqs, F.lit(0)) == rw_table.cqs),
        "left",
    ).drop(rw_table.exposure_class).drop(rw_table.cqs)

    base_rw = (
        F.when(
            F.col("is_defaulted") & (F.col("exposure_class") == "re_secured"),
            pack.lit("defaulted_rw_secured"),
        )
        .when(F.col("is_defaulted"), pack.lit("defaulted_rw"))
        .when(F.col("exposure_class") == "re_secured", pack.lit("re_secured_rw"))
        .when(F.col("exposure_class") == "retail", pack.lit("retail_rw"))
        .when(F.col("rw").isNotNull(), F.col("rw"))
        .otherwise(pack.lit("unrated_corp_rw"))
    )
    rw_source = (
        F.when(
            F.col("is_defaulted") & (F.col("exposure_class") == "re_secured"),
            "sa_defaulted_secured",
        )
        .when(F.col("is_defaulted"), "sa_defaulted")
        .when(F.col("exposure_class") == "re_secured", "sa_re_secured")
        .when(F.col("exposure_class") == "retail", "sa_retail")
        .when(F.col("rw").isNotNull(), "sa_cqs_lookup")
        .otherwise("sa_unrated")
    )
    # SA decision-block carriers (ref :3021-3025): the CQS consulted and
    # the BASE ladder weight before any branch override — the final weight
    # and their delta seal at the end of this function, after every
    # adjustment (covered-bond/RE/sovereign-derived/ccymm/due-diligence/
    # intragroup) has run; rw_source remains the adjustment-reason carrier
    exp = exp.withColumns(
        {
            "sa_cqs": F.coalesce(F.col("cqs"), F.lit(0)),
            "sa_base_risk_weight": base_rw,
        }
    )
    # CRR Art.129 covered bonds (ref engine/sa/covered_bond.py): rated
    # bonds price on the bond's OWN CQS (Art.129(4) Table 6A); unrated
    # bonds derive from the issuing institution's senior unsecured weight
    # (the class-ladder RW already joined above) through the regime's
    # derivation table — the tables genuinely diverge (CRR (5)(b) maps a
    # 50% issuer weight to 20%, PS1/26 to 25%), which is why the table is
    # pack data, never shared code.
    if "is_covered_bond" in cols:
        cbt = pack.table_df(spark, "covered_bond_rw").select(
            F.col("cqs").alias("_cb_cqs_t"), F.col("rw").alias("_cb_rated_rw")
        )
        exp = exp.join(
            F.broadcast(cbt),
            F.coalesce(F.col("cb_cqs"), F.lit(0)) == F.col("_cb_cqs_t"),
            "left",
        ).drop("_cb_cqs_t")
        der = pack.table_df(spark, "covered_bond_unrated_derivation").select(
            F.col("issuer_rw").alias("_cb_issuer_rw"),
            F.col("cb_rw").alias("_cb_derived"),
        )
        exp = exp.join(
            F.broadcast(der), F.col("rw") == F.col("_cb_issuer_rw"), "left"
        ).drop("_cb_issuer_rw")
        is_cb = F.coalesce(F.col("is_covered_bond"), F.lit(False)) & ~F.col(
            "is_defaulted"
        )
        base_rw = (
            F.when(is_cb & F.col("_cb_rated_rw").isNotNull(), F.col("_cb_rated_rw"))
            # derivation default 1.00 (CRR Art.129(5) residual sub-para)
            .when(is_cb, F.coalesce(F.col("_cb_derived"), F.lit(1.0)))
            .otherwise(base_rw)
        )
        rw_source = (
            F.when(is_cb & F.col("_cb_rated_rw").isNotNull(), "sa_covered_bond_rated")
            .when(is_cb, "sa_covered_bond_unrated_derived")
            .otherwise(rw_source)
        )

    # PS1/26 Art.124E-124I revised real-estate treatment (ref
    # engine/sa/b31_risk_weight_tables.py + rulebook/packs/b31.py:1249-1308):
    # income-producing RE prices WHOLE-LOAN off the LTV band table
    # (Art.124G Table 6B RRE / Art.124I CRE; junior RRE charges ×1.25 above
    # 50% LTV); general (owner-occupied) RE loan-splits — the portion
    # secured up to 55% of property value takes the preferential weight
    # (20% RRE / 60% CRE), the remainder prices as an exposure to the
    # counterparty (Art.124F(1)(b): retail weight for natural persons,
    # else the obligor's ladder weight). Pack-gated via the table's
    # presence (CRR keeps flat Art.125/126) and carrier-gated on ltv;
    # bands compile to a when-chain from the pack rows (pure literals —
    # band-count work, never a join against the fact table).
    if "re_ltv_rw" in pack.tables and "ltv" in cols:
        ltv = F.col("ltv")
        # the class gate; the LTV-dependent limbs (bands, split) require a
        # usable LTV on top — ADC and Art.124J other-RE price without one
        # (a non-qualifying property may carry NO independent valuation),
        # and a qualifying-RE row with no LTV falls through to the pack's
        # flat re_secured weight rather than guessing a band
        re_row = (F.col("exposure_class") == "re_secured") & ~F.col("is_defaulted")
        ltv_ok = ltv.isNotNull() & (ltv > 0)

        def _flag(name):
            return (
                F.coalesce(F.col(name), F.lit(False))
                if name in cols
                else F.lit(False)
            )

        commercial = _flag("is_commercial_re")
        explicit_income = _flag("is_income_producing")
        # Art.124E(1)(b)/(2) three-property limit: a natural person
        # financing strictly more than the pack limit of residential
        # properties is materially dependent on property cash flows and
        # re-routes to the Art.124G income-producing whole-loan track (ref
        # classify/attributes.py:560-598 _build_has_income_cover_expr;
        # strict > — count 3 stays owner-occupied, 4 re-routes; null
        # counts never breach; an explicit upstream income flag wins)
        if (
            "qualifying_property_count" in cols
            and "b31_rre_three_property_limit" in pack.scalars
        ):
            three_prop = (F.col("entity_type") == "individual") & (
                F.coalesce(F.col("qualifying_property_count"), F.lit(0)).cast(
                    "double"
                )
                > pack.lit("b31_rre_three_property_limit")
            )
        else:
            three_prop = F.lit(False)
        income = explicit_income | three_prop
        # Art.124F(2) prior/pari-passu charges: reduce the loan-split
        # secured threshold; a positive prior charge also marks the
        # position junior (ref b31_risk_weight_tables.py:526 is_junior)
        prior_chg = (
            F.coalesce(F.col("prior_charge_ltv"), F.lit(0.0))
            if "prior_charge_ltv" in cols
            else F.lit(0.0)
        )
        junior = _flag("is_junior_lien") | (prior_chg > 0)
        # Art.124K ADC (land acquisition / development / construction):
        # 150% flat; 100% only for qualifying RESIDENTIAL pre-sold —
        # commercial ADC has no pre-sold concession (ref
        # b31_risk_weight_tables.py:641-662 b31_adc_rw_expr)
        adc = _flag("is_adc")
        presold = _flag("is_presold")
        # Art.124J "other" (non-qualifying) RE — fails the Art.124A
        # criteria: income-dependent 150% flat; non-dependent RESI takes
        # the counterparty weight with no floor; non-dependent CRE floors
        # it at 60% (ref b31_risk_weight_tables.py:665-713
        # b31_other_re_rw_expr — its Art.124L four-limb counterparty table
        # narrows here to the person-retail-75% / ladder split the bundle's
        # carriers can discriminate; SME-85% and social-housing limbs need
        # carriers the dictionary does not yet declare)
        other_re = _flag("is_other_re")

        def _band_chain(track: str):
            rows = sorted(
                ((float(u), float(w)) for t, u, w in pack.tables["re_ltv_rw"][1] if t == track),
            )
            chain = F.lit(rows[-1][1])  # open catch-all band
            for upper, w in reversed(rows[:-1]):
                chain = F.when(ltv <= F.lit(upper), F.lit(w)).otherwise(chain)
            return chain

        rre_income_rw = _band_chain("rre_income") * F.when(
            junior & (ltv > pack.lit("b31_re_income_junior_ltv_threshold")),
            pack.lit("b31_re_income_junior_multiplier"),
        ).otherwise(F.lit(1.0))
        cre_income_base = _band_chain("cre_income")
        # Art.124I(3): junior income-CRE takes ABSOLUTE risk weights that
        # replace the base bands (not multipliers — contrast Art.124G(2)
        # RRE; ref b31_risk_weight_tables.py:605-613)
        if "b31_cre_income_junior_rw_low" in pack.scalars:
            cre_income_rw = F.when(
                junior,
                F.when(ltv <= F.lit(0.60), pack.lit("b31_cre_income_junior_rw_low"))
                .when(ltv <= F.lit(0.80), pack.lit("b31_cre_income_junior_rw_mid"))
                .otherwise(pack.lit("b31_cre_income_junior_rw_high")),
            ).otherwise(cre_income_base)
        else:
            cre_income_rw = cre_income_base
        # Art.124F(1)(b)/124H(1)(b) remainder: the counterparty's own weight
        # — retail for natural persons, the CORPORATE ladder for the
        # obligor's CQS otherwise (the class-ladder join above keyed on
        # 're_secured', which the sa_rw table deliberately has no row for)
        cp_ladder = pack.table_df(spark, "sa_rw").where(
            F.col("exposure_class") == "corporate"
        ).select(F.col("cqs").alias("_re_cqs"), F.col("rw").alias("_re_cp_rw"))
        exp = exp.join(
            F.broadcast(cp_ladder),
            F.coalesce(exp.cqs, F.lit(0)) == F.col("_re_cqs"),
            "left",
        ).drop("_re_cqs")
        cp_rw = F.when(
            (F.col("entity_type") == "individual") | F.col("is_managed_as_retail"),
            pack.lit("retail_rw"),
        ).otherwise(F.coalesce(F.col("_re_cp_rw"), pack.lit("unrated_corp_rw")))
        # Art.124L counterparty-type table for the split RESIDUAL and the
        # Art.124J non-dependent other-RE weight (ref
        # b31_risk_weight_tables.py:760-799 _b31_art_124l_cp_rw_expr):
        # natural person / retail-qualifying SME 75% (limb a), other SME
        # 85% (limb b), registered social housing max(75%, unsecured cp RW)
        # (limb c), full unsecured counterparty RW otherwise (d/e). The
        # is_sme / qualifies_as_retail inputs are the classify stage's CRR
        # Art.4(1)(128D) size test and Art.123 outcome; pack-gated so the
        # CRR regime (no Art.124L) keeps the plain residual.
        is_person = F.col("entity_type") == "individual"
        sme = _flag("is_sme")
        retail_q = _flag("qualifies_as_retail")
        social = _flag("is_social_housing")
        if "b31_rre_residual_rw_person" in pack.scalars:
            cp_rw_124l = (
                F.when(is_person | (sme & retail_q), pack.lit("b31_rre_residual_rw_person"))
                .when(sme, pack.lit("b31_rre_residual_rw_other_sme"))
                .when(
                    social,
                    F.greatest(pack.lit("b31_rre_residual_rw_social_floor"), cp_rw),
                )
                .otherwise(cp_rw)
            )
        else:
            cp_rw_124l = cp_rw
        # Art.124F(2): prior charges shrink the preferential secured cap
        eff_cap = F.greatest(F.lit(0.0), pack.lit("b31_re_split_cap") - prior_chg)
        secured_share = F.least(eff_cap / ltv, F.lit(1.0))
        split_rw = (
            F.when(commercial, pack.lit("b31_cre_split_secured_rw")).otherwise(
                pack.lit("b31_rre_split_secured_rw")
            )
            * secured_share
            + cp_rw_124l * (F.lit(1.0) - secured_share)
        )
        # Art.124H(3): general CRE to counterparties OTHER than natural
        # persons / SMEs takes max(60%, min(counterparty RW, Art.124I(1)/(2)
        # BASE income RW)) instead of the loan split — so large corporates
        # cannot reach the preferential split (ref
        # b31_risk_weight_tables.py:590-637; the cap deliberately uses the
        # base bands, not the Art.124I(3) junior override). The gate is
        # natural-person OR SME (any SME, not just retail-qualifying —
        # ref :594 is_person_or_sme), with the retail-managed carrier kept
        # as a person-equivalent alias for bundles that declare no sizes.
        person_or_sme = (
            (F.col("entity_type") == "individual")
            | F.coalesce(F.col("is_managed_as_retail"), F.lit(False))
            | sme
        )
        cre_h3_rw = F.greatest(
            pack.lit("b31_cre_split_secured_rw"), F.least(cp_rw, cre_income_base)
        )
        base_rw = (
            F.when(re_row & adc & ~commercial & presold, pack.lit("b31_adc_presold_rw"))
            .when(re_row & adc, pack.lit("b31_adc_rw"))
            .when(re_row & other_re & income, pack.lit("b31_other_re_income_rw"))
            # Art.124J non-dependent limbs price at the Art.124L
            # counterparty-type weight (ref b31_risk_weight_tables.py:
            # 674-683) — CRE floored at 60%, RESI unfloored
            .when(
                re_row & other_re & commercial,
                F.greatest(pack.lit("b31_other_re_cre_floor_rw"), cp_rw_124l),
            )
            .when(re_row & other_re, cp_rw_124l)
            .when(re_row & ltv_ok & income & commercial, cre_income_rw)
            .when(re_row & ltv_ok & income, rre_income_rw)
            .when(re_row & ltv_ok & commercial & ~person_or_sme, cre_h3_rw)
            .when(re_row & ltv_ok, split_rw)
            .otherwise(base_rw)
        )
        rw_source = (
            F.when(re_row & adc & ~commercial & presold, "b31_adc_presold")
            .when(re_row & adc, "b31_adc")
            .when(re_row & other_re & income, "b31_other_re_income")
            .when(re_row & other_re & commercial, "b31_other_re_cre")
            .when(re_row & other_re, "b31_other_re_resi")
            .when(re_row & ltv_ok & income & commercial, "b31_cre_income_ltv")
            .when(re_row & ltv_ok & explicit_income, "b31_rre_income_ltv")
            # derived income (three-property re-route) keeps its own leg so
            # the audit trail shows WHY the loan left the owner-occupied
            # track (priced identically to b31_rre_income_ltv)
            .when(re_row & ltv_ok & income, "b31_rre_three_property")
            .when(re_row & ltv_ok & commercial & ~person_or_sme, "b31_cre_art124h3")
            .when(re_row & ltv_ok & commercial, "b31_cre_loan_split")
            .when(re_row & ltv_ok, "b31_rre_loan_split")
            .otherwise(rw_source)
        )
        # RE decision carriers only the band chain knows (ref :3047-3052):
        # the LTV band the income track priced on (a label derived from
        # the same pack rows as the weights — no second table to drift),
        # the Art.124A qualification outcome, and the cash-flow dependency
        # that routed the row (explicit flag OR three-property re-route)
        def _band_label(track: str):
            rows = sorted(
                (float(u), float(w))
                for t, u, w in pack.tables["re_ltv_rw"][1]
                if t == track
            )
            chain = F.lit(f"{track}:>{rows[-2][0]:g}")
            for upper, _w in reversed(rows[:-1]):
                chain = F.when(
                    ltv <= F.lit(upper), F.lit(f"{track}:<={upper:g}")
                ).otherwise(chain)
            return chain

        exp = (
            exp.withColumn(
                "ltv_band",
                F.when(
                    re_row & ltv_ok & income & commercial, _band_label("cre_income")
                ).when(re_row & ltv_ok & income, _band_label("rre_income")),
            )
            .withColumn("is_qualifying_re", F.when(re_row, ~other_re))
            .withColumn(
                "materially_dependent_on_property", F.when(re_row, income)
            )
        )

    # Unrated-institution RW: CRR Art.121 derives it from the CENTRAL
    # GOVERNMENT's credit step (sovereign_cqs carrier); Basel 3.1 removed
    # that method in favour of SCRA grading (PS1/26 Art.121A: Grade A 40%,
    # B 75%, C 150%). Feature-gated per pack, column-gated per bundle.
    _unrated_inst = (
        (F.col("exposure_class") == "institution")
        & (F.coalesce(F.col("cqs"), F.lit(0)) == 0)
        & ~F.col("is_defaulted")
    )
    if (
        "sovereign_cqs" in cols
        and "sovereign_derived_institutions" in pack.scalars
        and pack.scalar("sovereign_derived_institutions") >= 1.0
    ):
        sd = pack.table_df(spark, "institution_rw_sovereign_derived").select(
            F.col("cqs").alias("_sd_cqs"), F.col("rw").alias("_sd_rw")
        )
        exp = exp.join(
            F.broadcast(sd), F.col("sovereign_cqs") == F.col("_sd_cqs"), "left"
        ).drop("_sd_cqs")
        sd_match = _unrated_inst & F.col("_sd_rw").isNotNull()
        base_rw = F.when(sd_match, F.col("_sd_rw")).otherwise(base_rw)
        rw_source = F.when(sd_match, "sa_sovereign_derived").otherwise(rw_source)
    if "scra_grade" in cols and "institution_scra_rw" in pack.tables:
        sc = pack.table_df(spark, "institution_scra_rw").select(
            F.col("grade").alias("_scra_grade_t"), F.col("rw").alias("_scra_rw")
        )
        exp = exp.join(
            F.broadcast(sc), F.col("scra_grade") == F.col("_scra_grade_t"), "left"
        ).drop("_scra_grade_t")
        scra_match = _unrated_inst & F.col("_scra_rw").isNotNull()
        base_rw = F.when(scra_match, F.col("_scra_rw")).otherwise(base_rw)
        rw_source = F.when(scra_match, "sa_scra").otherwise(rw_source)

    # PS1/26 Art.122A-122B: UNRATED SA specialised lending takes type-
    # specific risk weights instead of the unrated-corporate 100% — object/
    # commodities 100%, project finance 130% pre-operational / 100%
    # operational / 80% high-quality (rated SL keeps its Art.122A(3)
    # corporate CQS weight; ref engine/sa/risk_weights.py:1188-1196 +
    # b31_risk_weight_tables.py:716-747 b31_sa_sl_rw_expr). Pack-gated
    # (CRR has no Art.122A — unrated SL stays at the corporate 100%) and
    # carrier-gated on sl_type; weights compile from pack rows to literal
    # when-chains — never a fact-table join.
    if "b31_sa_sl_rw" in pack.tables and "sl_type" in cols:
        slw = {k: float(v) for k, v in pack.tables["b31_sa_sl_rw"][1]}
        sl = F.lower(F.coalesce(F.col("sl_type"), F.lit("")))
        phase = (
            F.lower(F.coalesce(F.col("sl_project_phase"), F.lit("")))
            if "sl_project_phase" in cols
            else F.lit("")
        )
        # Art.139(2B): an SL exposure whose only external assessment is
        # NOT issue-specific (inferred / issuer-level) is treated as
        # unrated for this routing — ordinary rated corporates untouched
        cqs_eff = F.coalesce(F.col("cqs"), F.lit(0))
        if (
            "external_rating_is_issue_specific" in cols
            and "sa_sl_inferred_rating_disapplied" in pack.scalars
            and pack.scalar("sa_sl_inferred_rating_disapplied") >= 1.0
        ):
            cqs_eff = F.when(
                ~F.coalesce(F.col("external_rating_is_issue_specific"), F.lit(True)),
                F.lit(0),
            ).otherwise(cqs_eff)
        sl_row = (
            (F.col("exposure_class") == "corporate")
            & (sl != "")
            & (cqs_eff <= 0)
            & ~F.col("is_defaulted")
        )
        sl_key = (
            F.when(sl.contains("object"), F.lit("object_finance"))
            .when(sl.contains("commodit"), F.lit("commodities_finance"))
            .when(
                sl.contains("project"),
                F.when(phase.contains("pre"), F.lit("project_finance_pre_operational"))
                .when(phase.contains("high"), F.lit("project_finance_high_quality"))
                .otherwise(F.lit("project_finance_operational")),
            )
            .otherwise(F.lit("unknown"))
        )
        sl_rw = F.lit(1.0)  # unknown SL type falls back to corporate 100%
        for key, w in sorted(slw.items()):
            sl_rw = F.when(sl_key == key, F.lit(w)).otherwise(sl_rw)
        base_rw = F.when(sl_row, sl_rw).otherwise(base_rw)
        rw_source = F.when(
            sl_row, F.concat(F.lit("b31_sa_sl_"), sl_key)
        ).otherwise(rw_source)

    # --- PS1/26 short-term institution / corporate ECAI routing (ref
    # engine/sa/risk_weights.py _b31_append_institution_maturity_branches +
    # _b31_append_corporate_maturity_branches). Pack-gated (the CRR has no
    # short-term tables) and column-gated per bundle; all four tables are
    # dim-sized broadcast lookups. Precedence mirrors the reference chain:
    # dedicated short-term ECAI (Table 4A) beats the long-term-rating
    # short-term window (Table 4); SCRA-ST beats the long-term SCRA
    # override above (applied later wins).
    _nd = ~F.col("is_defaulted")
    _rated = F.coalesce(F.col("cqs"), F.lit(0)) > 0
    _inst = F.col("exposure_class") == "institution"
    _has_st_ecai = (
        F.coalesce(F.col("has_short_term_ecai"), F.lit(False))
        if "has_short_term_ecai" in cols
        else F.lit(False)
    )
    if "original_maturity_years" in cols:
        _om = F.coalesce(F.col("original_maturity_years"), F.lit(1.0))
        _st_lc = (
            F.coalesce(F.col("is_short_term_trade_lc"), F.lit(False))
            if "is_short_term_trade_lc" in cols
            else F.lit(False)
        )
        # Art.120(2)/121(5): original maturity <= 3m, or trade finance <= 6m
        _st_window = (_om <= 0.25) | (_st_lc & (_om <= 0.5))
    else:
        _st_window = F.lit(False)
    if "ecra_short_term_rw" in pack.tables and "original_maturity_years" in cols:
        t4 = pack.table_df(spark, "ecra_short_term_rw").select(
            F.col("cqs").alias("_t4_cqs"), F.col("rw").alias("_t4_rw")
        )
        exp = exp.join(
            F.broadcast(t4), F.col("cqs") == F.col("_t4_cqs"), "left"
        ).drop("_t4_cqs")
        m_t4 = _inst & _rated & ~_has_st_ecai & _st_window & _nd
        base_rw = F.when(m_t4, F.coalesce(F.col("_t4_rw"), F.lit(1.5))).otherwise(
            base_rw
        )
        rw_source = F.when(m_t4, "sa_ecra_short_term").otherwise(rw_source)
    if "scra_short_term_rw" in pack.tables and "scra_grade" in cols:
        sst = pack.table_df(spark, "scra_short_term_rw").select(
            F.col("grade").alias("_sst_grade"), F.col("rw").alias("_sst_rw")
        )
        exp = exp.join(
            F.broadcast(sst), F.col("scra_grade") == F.col("_sst_grade"), "left"
        ).drop("_sst_grade")
        m_sst = (
            _inst
            & (F.coalesce(F.col("cqs"), F.lit(0)) == 0)
            & _st_window
            & _nd
            & F.col("_sst_rw").isNotNull()
        )
        base_rw = F.when(m_sst, F.col("_sst_rw")).otherwise(base_rw)
        rw_source = F.when(m_sst, "sa_scra_short_term").otherwise(rw_source)
    if (
        "ecra_short_term_ecai_rw" in pack.tables
        and "has_short_term_ecai" in cols
    ):
        t4a = pack.table_df(spark, "ecra_short_term_ecai_rw").select(
            F.col("cqs").alias("_t4a_cqs"), F.col("rw").alias("_t4a_rw")
        )
        exp = exp.join(
            F.broadcast(t4a), F.col("cqs") == F.col("_t4a_cqs"), "left"
        ).drop("_t4a_cqs")
        m_t4a = _inst & _rated & _has_st_ecai & _nd
        base_rw = F.when(m_t4a, F.coalesce(F.col("_t4a_rw"), F.lit(1.5))).otherwise(
            base_rw
        )
        rw_source = F.when(m_t4a, "sa_ecra_st_ecai").otherwise(rw_source)
    if "corporate_st_ecai_rw" in pack.tables and "has_short_term_ecai" in cols:
        t6a = pack.table_df(spark, "corporate_st_ecai_rw").select(
            F.col("cqs").alias("_t6a_cqs"), F.col("rw").alias("_t6a_rw")
        )
        exp = exp.join(
            F.broadcast(t6a), F.col("cqs") == F.col("_t6a_cqs"), "left"
        ).drop("_t6a_cqs")
        # SME corporates stay on the dedicated 85% path (ref excludes the
        # SME class from Table 6A)
        m_t6a = (
            (F.col("exposure_class") == "corporate")
            & _rated
            & _has_st_ecai
            & ~F.coalesce(F.col("is_sme"), F.lit(False))
            & _nd
        )
        base_rw = F.when(m_t6a, F.coalesce(F.col("_t6a_rw"), F.lit(1.5))).otherwise(
            base_rw
        )
        rw_source = F.when(m_t6a, "sa_corp_st_ecai").otherwise(rw_source)

    # --- PS1/26 Art.122(11) unrated corporate SME 85% and Art.122(6)/(8)
    # investment-grade assessment (65% IG / 135% non-IG, active only under
    # the firm's PRA permission — use_ig_assessment). Pack-gated: the CRR
    # prices unrated corporates flat at Art.122(2) 100%.
    _unrated_corp = (
        (F.col("exposure_class") == "corporate")
        & (F.coalesce(F.col("cqs"), F.lit(0)) == 0)
        & _nd
    )
    _is_sme = F.coalesce(F.col("is_sme"), F.lit(False))
    if "corporate_sme_rw" in pack.scalars:
        m_sme = _unrated_corp & _is_sme
        base_rw = F.when(m_sme, pack.lit("corporate_sme_rw")).otherwise(base_rw)
        rw_source = F.when(m_sme, "sa_corporate_sme").otherwise(rw_source)
    if (
        use_ig_assessment
        and "corporate_ig_rw" in pack.scalars
        and "is_investment_grade" in cols
    ):
        _ig = F.coalesce(F.col("is_investment_grade"), F.lit(False))
        m_ig = _unrated_corp & ~_is_sme & _ig
        m_nig = _unrated_corp & ~_is_sme & ~_ig
        base_rw = (
            F.when(m_ig, pack.lit("corporate_ig_rw"))
            .when(m_nig, pack.lit("corporate_non_ig_rw"))
            .otherwise(base_rw)
        )
        rw_source = (
            F.when(m_ig, "sa_corporate_ig")
            .when(m_nig, "sa_corporate_non_ig")
            .otherwise(rw_source)
        )

    # --- Art.123 retail product branches: payroll/pension 35% (CRR2 F68 /
    # PS1/26 Art.123(4)), QRRE transactor 45% (PS1/26 Art.123(2), B3.1
    # only — transactor applied after payroll so it wins ties, mirroring
    # the reference chain order)
    _retail_nd = (F.col("exposure_class") == "retail") & _nd
    if "retail_payroll_rw" in pack.scalars and "is_payroll_loan" in cols:
        m_pay = _retail_nd & F.coalesce(F.col("is_payroll_loan"), F.lit(False))
        base_rw = F.when(m_pay, pack.lit("retail_payroll_rw")).otherwise(base_rw)
        rw_source = F.when(m_pay, "sa_retail_payroll").otherwise(rw_source)
    if "retail_transactor_rw" in pack.scalars and "is_qrre_transactor" in cols:
        m_tx = _retail_nd & F.coalesce(F.col("is_qrre_transactor"), F.lit(False))
        base_rw = F.when(m_tx, pack.lit("retail_transactor_rw")).otherwise(base_rw)
        rw_source = F.when(m_tx, "sa_retail_transactor").otherwise(rw_source)

    # --- CRR Art.116-118 / Art.137 sovereign-family branches (ref
    # engine/sa/risk_weights.py PSE/RGLA/MDB/IO chain + _eca_meip_rw_expr).
    # All lookups are pack-dim broadcast joins; fallbacks are the cited
    # Art.116(1)/117(1) conservative defaults.
    if "io_rw" in pack.scalars:
        m_io = (F.col("exposure_class") == "international_organisation") & _nd
        base_rw = F.when(m_io, pack.lit("io_rw")).otherwise(base_rw)
        rw_source = F.when(m_io, "sa_art118_io").otherwise(rw_source)
    if "mdb_rw_table2b" in pack.tables:
        t2b = pack.table_df(spark, "mdb_rw_table2b").select(
            F.col("cqs").alias("_2b_cqs"), F.col("rw").alias("_2b_rw")
        )
        exp = exp.join(
            F.broadcast(t2b),
            F.coalesce(F.col("cqs"), F.lit(0)) == F.col("_2b_cqs"),
            "left",
        ).drop("_2b_cqs")
        _mdb = (F.col("exposure_class") == "mdb") & _nd
        m_named = _mdb & (F.col("entity_type") == "mdb_named")
        m_2b = _mdb & (F.col("entity_type") != "mdb_named")
        base_rw = (
            F.when(m_named, pack.lit("mdb_named_rw"))
            .when(m_2b, F.coalesce(F.col("_2b_rw"), pack.lit("mdb_unrated_rw")))
            .otherwise(base_rw)
        )
        rw_source = (
            F.when(m_named, "sa_mdb_named")
            .when(m_2b, "sa_mdb_table2b")
            .otherwise(rw_source)
        )
    if "pse_own_rating_rw" in pack.tables:
        por = pack.table_df(spark, "pse_own_rating_rw").select(
            F.col("cqs").alias("_por_cqs"), F.col("rw").alias("_por_rw")
        )
        exp = exp.join(
            F.broadcast(por), F.col("cqs") == F.col("_por_cqs"), "left"
        ).drop("_por_cqs")
        if "sovereign_cqs" in cols:
            psd = pack.table_df(spark, "pse_sovereign_derived_rw").select(
                F.col("cqs").alias("_psd_cqs"), F.col("rw").alias("_psd_rw")
            )
            exp = exp.join(
                F.broadcast(psd),
                F.col("sovereign_cqs") == F.col("_psd_cqs"),
                "left",
            ).drop("_psd_cqs")
            _psd_rw = F.col("_psd_rw")
        else:
            _psd_rw = F.lit(None).cast("double")
        _pse = (F.col("exposure_class") == "pse") & _nd
        # Art.116(5): an EXPLICIT non-equivalence flag prices 100%; null is
        # permissive (no Treasury determination recorded ≠ negative one)
        _pse_ne = (
            ~F.coalesce(F.col("pse_jurisdiction_equivalent"), F.lit(True))
            if "pse_jurisdiction_equivalent" in cols
            else F.lit(False)
        )
        _pse_st = (
            F.coalesce(F.col("original_maturity_years"), F.lit(1.0)) <= 0.25
            if "original_maturity_years" in cols
            else F.lit(False)
        )
        base_rw = (
            F.when(_pse & _pse_ne, pack.lit("pse_non_equivalent_rw"))
            .when(_pse & _pse_st, pack.lit("pse_short_term_rw"))
            .when(
                _pse & (F.coalesce(F.col("cqs"), F.lit(0)) == 0),
                F.coalesce(_psd_rw, pack.lit("pse_unrated_rw")),
            )
            .when(_pse, F.coalesce(F.col("_por_rw"), pack.lit("pse_unrated_rw")))
            .otherwise(base_rw)
        )
        rw_source = (
            F.when(_pse & _pse_ne, "sa_pse_non_equivalent")
            .when(_pse & _pse_st, "sa_pse_short_term")
            .when(
                _pse & (F.coalesce(F.col("cqs"), F.lit(0)) == 0),
                "sa_pse_sovereign_derived",
            )
            .when(_pse, "sa_pse_own_rating")
            .otherwise(rw_source)
        )
    if "rgla_own_rating_rw" in pack.tables:
        r1b = pack.table_df(spark, "rgla_own_rating_rw").select(
            F.col("cqs").alias("_1b_cqs"), F.col("rw").alias("_1b_rw")
        )
        exp = exp.join(
            F.broadcast(r1b), F.col("cqs") == F.col("_1b_cqs"), "left"
        ).drop("_1b_cqs")
        if "sovereign_cqs" in cols:
            r1a = pack.table_df(spark, "rgla_sovereign_derived_rw").select(
                F.col("cqs").alias("_1a_cqs"), F.col("rw").alias("_1a_rw")
            )
            exp = exp.join(
                F.broadcast(r1a),
                F.col("sovereign_cqs") == F.col("_1a_cqs"),
                "left",
            ).drop("_1a_cqs")
            _r1a_rw = F.col("_1a_rw")
        else:
            _r1a_rw = F.lit(None).cast("double")
        _rgla = (F.col("exposure_class") == "rgla") & _nd
        # Art.115(5): sterling-domestic UK RGLAs take the flat 20% — the
        # 'GB'/'GBP' carrier convention; non-UK domestic-currency RGLAs
        # fall through to the (1) rating tables (the reference deliberately
        # does NOT reuse the composite EU-domestic flag here)
        _rgla_dom = (
            (F.col("country") == "GB") & (F.col("currency") == "GBP")
            if "country" in cols and "currency" in cols
            else F.lit(False)
        )
        base_rw = (
            F.when(_rgla & _rgla_dom, pack.lit("rgla_domestic_rw"))
            .when(
                _rgla & (F.coalesce(F.col("cqs"), F.lit(0)) == 0),
                F.coalesce(_r1a_rw, pack.lit("pse_unrated_rw")),
            )
            .when(_rgla, F.coalesce(F.col("_1b_rw"), pack.lit("pse_unrated_rw")))
            .otherwise(base_rw)
        )
        rw_source = (
            F.when(_rgla & _rgla_dom, "sa_rgla_domestic")
            .when(
                _rgla & (F.coalesce(F.col("cqs"), F.lit(0)) == 0),
                "sa_rgla_sovereign_derived",
            )
            .when(_rgla, "sa_rgla_own_rating")
            .otherwise(rw_source)
        )
    if "eca_meip_rw" in pack.tables and "eca_meip_score" in cols:
        eca = pack.table_df(spark, "eca_meip_rw").select(
            F.col("score").alias("_eca_score"), F.col("rw").alias("_eca_rw")
        )
        exp = exp.join(
            F.broadcast(eca),
            F.col("eca_meip_score") == F.col("_eca_score"),
            "left",
        ).drop("_eca_score")
        m_eca = (
            (F.col("exposure_class") == "sovereign")
            & (F.coalesce(F.col("cqs"), F.lit(0)) == 0)
            & _nd
            & F.col("_eca_rw").isNotNull()
        )
        base_rw = F.when(m_eca, F.col("_eca_rw")).otherwise(base_rw)
        rw_source = F.when(m_eca, "sa_eca_meip").otherwise(rw_source)

    # --- Art.112 Table A2 rows 3-4: subordinated debt / high-risk classes.
    # Both outrank the defaulted rule (priority 3/4 > 5, ref
    # risk_weights.py "_uc != HIGH_RISK" defaulted gate), so neither is
    # gated on ~is_defaulted and both are excluded from the provision
    # override below. The B3.1 pack prices them (Art.133A / Art.128); the
    # CRR omitted Art.128 — its high-risk rows take the residual 100%,
    # including defaulted ones (the Table A2 precedence, not an oversight).
    if "subordinated_debt_rw" in pack.scalars:
        m_sd = F.col("exposure_class") == "subordinated_debt"
        base_rw = F.when(m_sd, pack.lit("subordinated_debt_rw")).otherwise(base_rw)
        rw_source = F.when(m_sd, "sa_subordinated_debt").otherwise(rw_source)
    m_hr = F.col("exposure_class") == "high_risk"
    if "high_risk_rw" in pack.scalars:
        base_rw = F.when(m_hr, pack.lit("high_risk_rw")).otherwise(base_rw)
        rw_source = F.when(m_hr, "sa_high_risk").otherwise(rw_source)
    else:
        base_rw = F.when(m_hr, pack.lit("unrated_corp_rw")).otherwise(base_rw)
        rw_source = F.when(m_hr, "sa_unrated").otherwise(rw_source)

    # --- Art.127 defaulted provision test (ref engine/sa/risk_weights.py
    # _apply_defaulted_risk_weight): the unsecured defaulted part takes
    # 100% where specific provisions >= 20% of the denominator, 150%
    # below. Denominator is regime data: CRR = pre-provision EXPOSURE
    # VALUE (post-CRM EAD + the provision that reduced it), B3.1 = gross
    # outstanding (the defaulted_denom_gross_outstanding Feature). B3.1
    # additionally prices ALL defaulted RE-secured rows through the test
    # except general (non-income) residential RE, which stays flat 100%
    # (Art.127(3)/CRE20.88); the CRR keeps the flat Art.127(3)/(4) secured
    # leg from the base chain. Applied LAST so the provision-based weight
    # overrides every non-defaulted branch above, like the reference's
    # unconditional Art.127 overwrite.
    if "defaulted_provision_threshold" in pack.scalars:
        _prov = F.coalesce(F.col("provision_allocated"), F.lit(0.0))
        _gross_basis = (
            "defaulted_denom_gross_outstanding" in pack.scalars
            and pack.scalar("defaulted_denom_gross_outstanding") >= 1.0
        )
        _denom = (
            F.col("gross_ead")
            if _gross_basis
            else F.col("ead_after_crm")
            + F.coalesce(F.col("provision_capped_amount"), F.lit(0.0))
        )
        _high = _prov >= pack.lit("defaulted_provision_threshold") * _denom
        _prov_rw = F.when(_high, pack.lit("defaulted_rw_high_provision")).otherwise(
            pack.lit("defaulted_rw_low_provision")
        )
        _re_sec = F.col("exposure_class") == "re_secured"
        if "defaulted_resi_re_non_income_rw" in pack.scalars:
            _comm = (
                F.coalesce(F.col("is_commercial_re"), F.lit(False))
                if "is_commercial_re" in cols
                else F.lit(False)
            )
            _inc = (
                F.coalesce(F.col("is_income_producing"), F.lit(False))
                if "is_income_producing" in cols
                else F.lit(False)
            )
            # ADC / other-RE are their own classes in the reference's
            # Art.127(3) carve-out (residential only) — they join the
            # provision test like income/commercial rows
            _adc = (
                F.coalesce(F.col("is_adc"), F.lit(False))
                if "is_adc" in cols
                else F.lit(False)
            )
            _oth = (
                F.coalesce(F.col("is_other_re"), F.lit(False))
                if "is_other_re" in cols
                else F.lit(False)
            )
            # general resi RE stays flat 100% (the base chain's secured
            # leg); income-producing / commercial / ADC / other-RE secured
            # rows join the provision test
            m_prov = F.col("is_defaulted") & ~(
                _re_sec & ~_comm & ~_inc & ~_adc & ~_oth
            )
        else:
            m_prov = F.col("is_defaulted") & ~_re_sec
        # Table A2 rows 3-4 outrank the defaulted rule (see above)
        m_prov = m_prov & ~F.col("exposure_class").isin(
            "high_risk", "subordinated_debt"
        )
        base_rw = F.when(m_prov, _prov_rw).otherwise(base_rw)
        rw_source = F.when(
            m_prov,
            F.when(_high, F.lit("sa_defaulted_high_provision")).otherwise(
                F.lit("sa_defaulted")
            ),
        ).otherwise(rw_source)

    # CRR/PS1/26 Art.114(3): exposures to the ECB take an UNCONDITIONAL
    # 0% risk weight — no currency test, no rating test, both regimes
    # (ref engine/sa/central_bank.py ecb_rw_expr; 'central_bank_ecb' is
    # the documented entity-type convention — the ECB is supranational,
    # so no country code can identify it)
    if "entity_type" in cols:
        _is_ecb = F.col("entity_type") == "central_bank_ecb"
        base_rw = F.when(_is_ecb, F.lit(0.0)).otherwise(base_rw)
        rw_source = F.when(_is_ecb, "ecb_art114_3").otherwise(rw_source)

    # CRR Art.306(1) / BCBS CRE54.14-15: trade exposures to a QUALIFYING
    # CCP take 2% (clearing member's own trades, (1)(a)) or 4% (client-
    # cleared through a clearing member, (1)(c)), overriding the
    # institution ladder the Art.107(2)(a) class demotion put them on; a
    # non-qualifying CCP simply stays on that ladder (ref engine/ccr/
    # ccp.py apply_ccp_risk_weight + engine/sa/cqs_lift.py). Carrier- and
    # pack-gated; defaulted rows keep the defaulted treatment.
    if "is_qccp" in cols and "qccp_trade_rw" in pack.scalars:
        _qccp = (
            (F.col("entity_type") == "ccp")
            & ~F.col("is_defaulted")
            & F.coalesce("is_qccp", F.lit(False))
        )
        _cleared = (
            F.coalesce("is_client_cleared", F.lit(False))
            if "is_client_cleared" in cols
            else F.lit(False)
        )
        base_rw = (
            F.when(_qccp & _cleared, pack.lit("qccp_client_cleared_rw"))
            .when(_qccp, pack.lit("qccp_trade_rw"))
            .otherwise(base_rw)
        )
        rw_source = (
            F.when(_qccp & _cleared, "sa_qccp_client_cleared_art306_1c")
            .when(_qccp, "sa_qccp_trade_art306_1a")
            .otherwise(rw_source)
        )

    # CRR Art.114(4)/(7) + Art.141: EU central-government exposures
    # denominated in the member state's domestic currency take 0% RW,
    # overriding the CQS ladder (ref engine/eu_sovereign.py — consumed by
    # the SA risk-weight path; the country→currency map is pack data).
    if "country" in cols and "currency" in cols:
        eu = pack.broadcast_table(spark, "eu_domestic_ccy").select(
            F.col("country").alias("_eu_country"),
            F.col("domestic_ccy").alias("_eu_ccy"),
        )
        exp = exp.join(eu, exp.country == F.col("_eu_country"), "left")
        eu_match = (
            (F.col("exposure_class") == "sovereign")
            & ~F.col("is_defaulted")
            & F.col("_eu_ccy").isNotNull()
            & (F.col("currency") == F.col("_eu_ccy"))
        )
        base_rw = F.when(eu_match, F.lit(0.0)).otherwise(base_rw)
        rw_source = F.when(eu_match, "sovereign_eu_domestic").otherwise(rw_source)
        exp = exp.withColumns({"own_rw": base_rw, "rw_source": rw_source}).drop(
            "_eu_country", "_eu_ccy"
        )
    else:
        exp = exp.withColumns({"own_rw": base_rw, "rw_source": rw_source})

    # guarantee substitution on the covered share (ref crm/guarantees.py)
    g_rw_table = pack.table_df(spark, "sa_rw").select(
        F.col("exposure_class").alias("g_class_t"),
        F.col("cqs").alias("g_cqs_t"),
        F.col("rw").alias("g_rw"),
    )
    exp = exp.join(
        F.broadcast(g_rw_table),
        (F.col("g_class") == F.col("g_class_t"))
        & (F.coalesce(F.col("g_cqs"), F.lit(0)) == F.col("g_cqs_t")),
        "left",
    ).drop("g_class_t", "g_cqs_t")
    # CRR Art.235(3) + Art.114(4)/(7): a central-government guarantee from
    # an EU member state, DENOMINATED and FUNDED in that state's domestic
    # currency, extends the sovereign 0% to the covered portion — the
    # guarantor's own CQS ladder weight is bypassed (ref engine/sa/
    # rw_adjustments.py _build_domestic_guarantor_expr +
    # build_domestic_cgcb_guarantor_expr). Denomination falls back to the
    # exposure's currency when the guarantee declares none; the funding
    # limb is null-PERMISSIVE (funding_currency absent = funded in the
    # denomination). Carrier-gated on the guarantor country column.
    if "g_country" in cols:
        _gd = pack.broadcast_table(spark, "eu_domestic_ccy").select(
            F.col("country").alias("_gd_country"),
            F.col("domestic_ccy").alias("_gd_ccy"),
        )
        exp = exp.join(_gd, F.col("g_country") == F.col("_gd_country"), "left")
        _den_cands = [
            c for c in ("g_currency", "currency") if c in cols
        ]
        _g_den = (
            F.coalesce(*[F.col(c) for c in _den_cands])
            if _den_cands
            else F.lit(None).cast("string")
        )
        _g_fund = (
            F.coalesce(F.col("funding_currency"), _g_den)
            if "funding_currency" in cols
            else _g_den
        )
        _g_dom = (
            (F.col("g_class") == "sovereign")
            & F.col("_gd_ccy").isNotNull()
            & (_g_den == F.col("_gd_ccy"))
            & (_g_fund == F.col("_gd_ccy"))
        )
        exp = exp.withColumn(
            "g_rw", F.when(_g_dom, F.lit(0.0)).otherwise(F.col("g_rw"))
        ).drop("_gd_country", "_gd_ccy")
    # multi-guarantee fold (crm stage `_mg`: priority-ordered (slice, rw)
    # structs, slices capped at 100% coverage): G = Σ slice, and the
    # covered term Σ slice·least(own, rw) — each slice individually
    # neutral-or-beneficial, exactly the legacy least() semantics per
    # guarantee. Gated on size>1 so single-guarantee books keep the
    # legacy expressions bit-for-bit.
    _own = F.col("own_rw")
    if "_mg" in cols:
        _fold = F.aggregate(
            F.coalesce(F.col("_mg"), F.array().cast(exp.schema["_mg"].dataType)),
            F.struct(F.lit(0.0).alias("g"), F.lit(0.0).alias("t")),
            lambda acc, x: F.struct(
                (acc.g + x.slice).alias("g"),
                (
                    acc.t
                    + x.slice * F.least(_own, F.coalesce(x.rw, _own))
                ).alias("t"),
            ),
        )
        _is_multi = F.size(F.coalesce(F.col("_mg"), F.array())) > 1
        _mg_g, _mg_t = _fold.getField("g"), _fold.getField("t")
    else:
        _is_multi = F.lit(False)
        _mg_g, _mg_t = F.lit(0.0), F.lit(0.0)
    # total coverage / covered-term for the ledger portions below: the
    # rank-1 scalars on the n≤1 path, the fold on the multi path
    _g_total = F.when(_is_multi, _mg_g).otherwise(F.col("g_coverage"))
    eff_rw = F.when(_is_multi, _mg_t + (1 - _mg_g) * _own).otherwise(
        F.col("g_coverage") * F.least(F.col("own_rw"), F.coalesce("g_rw", F.col("own_rw")))
        + (1 - F.col("g_coverage")) * F.col("own_rw")
    )
    # the hypothetical no-substitution weight starts at the own ladder and
    # tracks every NON-substitution adjustment below (ccymm multiplier,
    # due-diligence override, Art.113(6) intragroup) in lockstep — only
    # the guarantee/OFCP substitution steps themselves are undone, so
    # CR7/CR7-A never misattribute a post-base override to CRM relief
    exp = exp.withColumns(
        {
            "risk_weight": eff_rw,
            "_rw_nosubst": F.col("own_rw"),
            "rw_source": F.when(
                F.when(_is_multi, _mg_t < _mg_g * _own).otherwise(
                    (F.col("g_coverage") > 0)
                    & (F.coalesce("g_rw", F.col("own_rw")) < F.col("own_rw"))
                ),
                F.concat(F.col("rw_source"), F.lit("+guarantee")),
            ).otherwise(F.col("rw_source")),
        }
    )
    # guarantee-impact ledger block (ref CALCULATION_OUTPUT_SCHEMA
    # :2972-3005 + engine/irb/guarantee.py:865-903
    # _add_guarantee_status_columns): the covered/retained EAD split, the
    # substitute weight, the isolated RW/RWA benefit of the guarantee step
    # (the blend continues mutating risk_weight after — OFCP, ccy-mismatch,
    # overrides — so the benefit is computed directly as g·(own − g_rw),
    # never as a later difference), and the status/method enums. Pre/post
    # substitution tracking: the borrower-side identity and the
    # guarantor-side destination the CRM-substitution router reports.
    _g_has = _g_total > 0
    _g_ben_sa = F.when(_is_multi, _mg_t < _mg_g * _own).otherwise(
        (F.col("g_coverage") > 0)
        & (F.coalesce("g_rw", F.col("own_rw")) < F.col("own_rw"))
    )
    # is_guaranteed = protection exists (ref crm/guarantees.py:183); the
    # beneficial outcome is guarantee_status's job (aggregator.py:706-707).
    # one batched projection: guarantee_benefit inlines benefit_rw's
    # expression (same value); everything else reads pre-block columns only
    _ben_rw_sa = (
        F.when(_is_multi, F.greatest(_mg_g * _own - _mg_t, F.lit(0.0)))
        .when(_g_ben_sa, F.col("g_coverage") * (F.col("own_rw") - F.col("g_rw")))
        .otherwise(0.0)
    )
    exp = exp.withColumns(
        {
            "is_guaranteed": _g_has,
            "guaranteed_portion": F.when(
                _g_has, _g_total * F.col("ead_after_crm")
            ).otherwise(0.0),
            "unguaranteed_portion": F.col("ead_after_crm")
            - F.when(_g_has, _g_total * F.col("ead_after_crm")).otherwise(0.0),
            "guarantor_risk_weight": F.when(_g_has, F.col("g_rw")),
            "pre_crm_risk_weight": F.col("own_rw"),
            "guarantee_benefit_rw": _ben_rw_sa,
            "guarantee_benefit": _ben_rw_sa * F.col("ead_after_crm"),
            "guarantee_status": F.when(~_g_has, "NO_GUARANTEE")
            .when(~_g_ben_sa, "GUARANTEE_NOT_APPLIED_NON_BENEFICIAL")
            .otherwise("SA_RW_SUBSTITUTION"),
            "guarantee_method_used": F.when(
                _g_ben_sa, "SA_RW_SUBSTITUTION"
            ).otherwise("NO_SUBSTITUTION"),
            "pre_crm_counterparty_reference": F.col("counterparty_reference"),
            "pre_crm_exposure_class": F.col("exposure_class"),
            "post_crm_counterparty_guaranteed": F.when(
                _g_has,
                F.col("guarantor_reference")
                if "guarantor_reference" in cols
                else F.lit(None).cast("string"),
            ),
            "post_crm_exposure_class_guaranteed": F.when(_g_has, F.col("g_class")),
        }
    )

    # other-funded-protection RW substitution (CRR Art.222/232; ref
    # engine/crm/{simple_method,life_insurance,third_party_deposit}.py):
    # each channel's covered fraction takes min(own RW, substitute RW) —
    # the blend composes as a subtraction of each channel's benefit from
    # the guarantee-blended RW; channels claim the unguaranteed remainder
    # in order (life insurance, third-party deposit, FCSM)
    if "li_value" in cols:
        own = F.col("own_rw")
        ead_nz = F.nullif(F.col("ead_after_crm"), F.lit(0.0))
        avail = F.greatest(1 - _g_total, F.lit(0.0))
        benefit = F.lit(0.0)
        # FCSM decomposition carriers (ref :3016-3018): the simple-method
        # collateral value, its substitute weight, and the RW snapshot
        # before any funded-substitution channel subtracted its benefit
        exp = exp.withColumns(
            {
                "pre_fcsm_risk_weight": F.col("risk_weight"),
                "fcsm_collateral_value": F.coalesce("fcsm_value", F.lit(0.0)),
                "fcsm_collateral_rw": F.col("fcsm_rw"),
            }
        )
        for vcol, rcol in (
            ("li_value", "li_rw"),
            ("tpd_value", "tpd_rw"),
            ("fcsm_value", "fcsm_rw"),
        ):
            frac = F.least(
                F.coalesce(F.col(vcol) / ead_nz, F.lit(0.0)), avail
            )
            benefit = benefit + frac * F.greatest(
                own - F.coalesce(F.col(rcol), own), F.lit(0.0)
            )
            avail = avail - frac
        exp = exp.withColumns(
            {
                "risk_weight": F.col("risk_weight") - benefit,
                "rw_source": F.when(
                    benefit > 0, F.concat(F.col("rw_source"), F.lit("+ofcp"))
                ).otherwise(F.col("rw_source")),
            }
        )

    # PS1/26 Art.123B (B3.1 only, Feature-gated): ×1.5 RW multiplier for
    # retail / residential-RE exposures whose currency mismatches the
    # borrower's income currency, capped at 150%. Waived when hedged —
    # either the is_hedged flag or ≥90% effective coverage, where a
    # revolving facility's firm-supplied coverage ratio (measured on the
    # current drawn balance) is rescaled onto the fully-drawn committed
    # base per Art.123B(2A) (ref engine/sa/rw_adjustments.py
    # apply_currency_mismatch_multiplier).
    if (
        pack.scalar("sa_currency_mismatch_multiplier") >= 1.0
        and "borrower_income_currency" in cols
        and "currency" in cols
    ):
        in_scope = F.col("exposure_class").isin("retail", "re_secured")
        mismatch = F.col("borrower_income_currency").isNotNull() & (
            F.col("borrower_income_currency") != F.col("currency")
        )
        hedged = (
            F.coalesce("is_hedged", F.lit(False))
            if "is_hedged" in cols
            else F.lit(False)
        )
        if "hedge_coverage_ratio" in cols:
            raw_cov = F.coalesce("hedge_coverage_ratio", F.lit(0.0))
            revolving = (
                F.coalesce("is_revolving", F.lit(False))
                if "is_revolving" in cols
                else F.lit(False)
            )
            drawn = F.coalesce("drawn_amount", F.lit(0.0))
            limit = (
                F.coalesce(F.col("facility_limit"), drawn)
                if "facility_limit" in cols
                else drawn
            )
            full_draw = F.greatest(drawn, limit)
            eff_cov = F.when(
                revolving & (full_draw > 0), raw_cov * drawn / full_draw
            ).otherwise(raw_cov)
            cov_ok = eff_cov >= pack.lit("currency_mismatch_hedge_floor")
        else:
            cov_ok = F.lit(False)
        ccymm = in_scope & mismatch & ~(hedged | cov_ok)
        # ledger carriers (ref :3066-3068): the pre-multiplier snapshot and
        # whether the ×1.5 actually applied — every expression reads the
        # PRE-block columns, so the whole block is one batched projection
        # (the _rw_nosubst mirror is NOT a substitution effect)
        exp = exp.withColumns(
            {
                "risk_weight_pre_currency_mismatch": F.col("risk_weight"),
                "currency_mismatch_multiplier_applied": F.coalesce(
                    ccymm, F.lit(False)
                ),
                "risk_weight": F.when(
                    ccymm,
                    F.least(
                        F.col("risk_weight")
                        * pack.lit("currency_mismatch_multiplier"),
                        pack.lit("currency_mismatch_cap"),
                    ),
                ).otherwise(F.col("risk_weight")),
                "_rw_nosubst": F.when(
                    ccymm,
                    F.least(
                        F.col("_rw_nosubst")
                        * pack.lit("currency_mismatch_multiplier"),
                        pack.lit("currency_mismatch_cap"),
                    ),
                ).otherwise(F.col("_rw_nosubst")),
                "rw_source": F.when(
                    ccymm, F.concat(F.col("rw_source"), F.lit("+ccymm"))
                ).otherwise(F.col("rw_source")),
            }
        )

    # PS1/26 Art.110A (B3.1 only, Feature-gated): where the firm's due
    # diligence found the calculated weight understates the risk, the
    # firm-assessed override replaces it — increase-only, applied after
    # every standard RW step but BEFORE the Art.113(6) intragroup
    # override, which is a hard permission and deliberately wins.
    if (
        pack.scalar("sa_due_diligence_override") >= 1.0
        and "due_diligence_override_rw" in cols
    ):
        ddq = F.col("due_diligence_override_rw").isNotNull() & (
            F.col("due_diligence_override_rw") > F.col("risk_weight")
        )
        # one withColumns: both outputs must read the PRE-override weight
        # (a second chained withColumn would re-evaluate ddq against the
        # already-overridden column and never tag the source)
        exp = exp.withColumns(
            {
                "risk_weight": F.when(
                    ddq, F.col("due_diligence_override_rw")
                ).otherwise(F.col("risk_weight")),
                # NOT a substitution effect — mirrored onto the hypothetical
                # (increase-only against ITS OWN level)
                "_rw_nosubst": F.when(
                    F.col("due_diligence_override_rw").isNotNull()
                    & (F.col("due_diligence_override_rw") > F.col("_rw_nosubst")),
                    F.col("due_diligence_override_rw"),
                ).otherwise(F.col("_rw_nosubst")),
                "rw_source": F.when(
                    ddq, F.concat(F.col("rw_source"), F.lit("+ddq"))
                ).otherwise(F.col("rw_source")),
            }
        )

    # CRR Art.113(6): 0% RW for core-UK-group intragroup exposures on an
    # individual-basis run. The carrier is set (and authoritatively
    # cleared) ONLY by resolve_scope — see engine/stages/scope.py (ref
    # engine/sa/rw_adjustments.py apply_intragroup_zero_rw).
    if "intragroup_zero_rw_eligible" in cols:
        elig = F.coalesce("intragroup_zero_rw_eligible", F.lit(False))
        # a hard permission, not a substitution — the hypothetical is
        # 0% too (CR7 must not report phantom CD relief on Art.113(6));
        # all three read pre-block columns — one batched projection
        exp = exp.withColumns(
            {
                "risk_weight": F.when(
                    elig, pack.lit("intragroup_zero_rw_pct")
                ).otherwise(F.col("risk_weight")),
                "_rw_nosubst": F.when(
                    elig, pack.lit("intragroup_zero_rw_pct")
                ).otherwise(F.col("_rw_nosubst")),
                "rw_source": F.when(elig, "intragroup_art113_6").otherwise(
                    F.col("rw_source")
                ),
            }
        )

    # CRR2 Art.501 tiered SME factor blended over the group drawn amount,
    # combined with the Art.501a infrastructure factor by most-beneficial
    # min (ref supporting_factors.py get_effective_factor). Round 9: the
    # shared helper adds the Art.501(2)(b) defaulted exclusion and is the
    # SAME expression the IRB and slotting branches now apply — the
    # reference runs SupportingFactorCalculator on every branch.
    sme_f, infra_f, sf = _supporting_factor_exprs(
        pack, threshold_scale, cols
    )

    # routing provenance: the permission stage's diagnostic / PPU reason
    # where it ran (ref permissions.py approach_selection), else the
    # pipeline's default SA routing rule
    reason = F.lit("sa_no_irb_permission")
    if "ppu_reason" in cols:
        reason = F.coalesce(F.col("ppu_reason"), reason)
    if "permission_diagnostic" in cols:
        reason = F.coalesce(F.col("permission_diagnostic"), reason)
    # one batched projection; supporting_factor_benefit inlines the exact
    # rwa_before_sf/rwa expressions (identical arithmetic DAG, bit-equal)
    exp = exp.withColumns(
        {
            "approach": F.lit("SA"),
            "approach_reason": reason,
            "rwa_before_sf": F.col("ead_after_crm") * F.col("risk_weight"),
            "rwa": F.col("ead_after_crm") * F.col("risk_weight") * sf,
            # the CR7/CR7-A hypothetical: the own-ladder RW with every
            # NON-substitution adjustment mirrored (_rw_nosubst tracks
            # ccymm/ddq/intragroup), at the same supporting factor
            "rwa_pre_crm_substitution": F.col("ead_after_crm")
            * F.col("_rw_nosubst")
            * sf,
            # supporting-factor decomposition (ref CALCULATION_OUTPUT_SCHEMA
            # sme_supporting_factor / infra_supporting_factor /
            # supporting_factor_benefit + supporting_factors.py
            # get_effective_factor): each factor under its own name — 1.0
            # where it did not apply — and the RWEA the most-beneficial
            # min saved
            "sme_supporting_factor": sme_f,
            "infra_supporting_factor": infra_f,
            "supporting_factor_benefit": (
                F.col("ead_after_crm") * F.col("risk_weight")
            )
            - (F.col("ead_after_crm") * F.col("risk_weight") * sf),
        }
    )
    exp = _el_columns(exp, F.lit(0.0))  # EL treatment is IRB-only; SA deducts
    exp = _param_cols(exp, cols=cols)  # SA uses CCF only
    # SA decision block, final leg (ref :3024-3025): the weight every
    # adjustment landed on and its delta from the base ladder value —
    # batched with the decision strings below into one projection
    _sa_adj = F.col("risk_weight") - F.col("sa_base_risk_weight")
    # SA decision strings (ref :3025-3030). sa_rating_source: the Art.138
    # pick's agency where the ratings channel resolved the CQS, "internal"
    # where the counterparty-supplied mapping was consulted, null unrated.
    _rated = F.col("sa_cqs") > 0
    if "external_rating_agency" in cols:
        _rating_src = F.when(
            F.col("external_rating_agency").isNotNull() & _rated,
            F.col("external_rating_agency"),
        ).when(_rated, F.lit("internal"))
    else:
        _rating_src = F.when(_rated, F.lit("internal"))
    # sa_rw_adjustment_reason: the branch that moved the weight off the
    # base ladder (rw_source IS the which-branch carrier, incl. the
    # +guarantee substitution suffix), plus the Art.123A currency-mismatch
    # multiplier when it fired on top; null when nothing moved.
    _adj_reason = F.when(
        _sa_adj != 0,
        F.concat_ws(
            "+",
            F.col("rw_source"),
            F.when(
                F.coalesce("currency_mismatch_multiplier_applied", F.lit(False)),
                F.lit("art123a_ccy_mismatch"),
            ),
        ),
    )
    # sa_rw_regulatory_ref: the CRR / PS1/26 article each pricing branch
    # carries (same citations as the branch comments above; the CQS-ladder
    # and unrated rows resolve per Art.112 class).
    _src = F.regexp_replace(F.col("rw_source"), r"\+.*$", "")
    _cls = F.col("exposure_class")
    _reg_ref = (
        F.when(_src == "sa_defaulted_secured", "CRR Art.127(1)(b)")
        .when(_src == "sa_defaulted", "CRR Art.127(1)")
        .when(_src == "sa_re_secured", "CRR Art.125-126")
        .when(_src == "sa_retail", "CRR Art.123")
        .when(_src == "sa_covered_bond_rated", "CRR Art.129(4)")
        .when(_src == "sa_covered_bond_unrated_derived", "CRR Art.129(5)")
        .when(_src == "sa_sovereign_derived", "CRR Art.121")
        .when(_src == "sa_scra", "PS1/26 Art.121A")
        .when(_src == "sovereign_eu_domestic", "CRR Art.114(4)")
        .when(_src == "ecb_art114_3", "CRR Art.114(3)")
        .when(_src.isin("b31_adc", "b31_adc_presold"), "PS1/26 Art.124K")
        .when(
            _src.isin("b31_other_re_income", "b31_other_re_cre", "b31_other_re_resi"),
            "PS1/26 Art.124J",
        )
        .when(_src == "b31_cre_income_ltv", "PS1/26 Art.124I")
        .when(_src == "b31_rre_income_ltv", "PS1/26 Art.124G")
        .when(_src == "b31_rre_three_property", "PS1/26 Art.124E(2)")
        .when(_src == "b31_cre_art124h3", "PS1/26 Art.124H(3)")
        .when(_src == "b31_cre_loan_split", "PS1/26 Art.124H")
        .when(_src == "b31_rre_loan_split", "PS1/26 Art.124F")
        .when(_src.startswith("b31_sa_sl_"), "PS1/26 Art.122A-122B")
        .when(
            _src == "sa_cqs_lookup",
            # the ladder table includes the unrated CQS-0 row, so split on
            # ratedness: rated rows cite the per-class assessment article,
            # unrated rows its unrated limb
            F.when(
                _rated,
                F.when(_cls == "sovereign", F.lit("CRR Art.114"))
                .when(_cls == "institution", F.lit("CRR Art.120"))
                .otherwise(F.lit("CRR Art.122")),
            )
            .when(_cls == "institution", F.lit("CRR Art.121"))
            .otherwise(F.lit("CRR Art.122(2)")),
        )
        .when(
            _src == "sa_unrated",
            F.when(_cls == "institution", F.lit("CRR Art.121")).otherwise(
                F.lit("CRR Art.122(2)")
            ),
        )
    )
    exp = exp.withColumns(
        {
            "rwa_sa_equivalent": F.col("rwa"),
            "sa_final_risk_weight": F.col("risk_weight"),
            "sa_rw_adjustment": _sa_adj,
            "sa_rating_source": _rating_src,
            "sa_rw_adjustment_reason": _adj_reason,
            "sa_rw_regulatory_ref": _reg_ref,
        }
    )
    # RE decision block (ref :3045-3053): sealed generically so the CRR
    # flat Art.125 branch carries them too; the LTV-band label seals in
    # the B3.1 block where the band chain runs
    _re = F.col("exposure_class") == "re_secured"
    exp = exp.withColumns(
        {
            "mortgage_risk_weight": F.when(_re, F.col("risk_weight")),
            "property_type": F.when(
                _re,
                F.when(
                    F.coalesce(F.col("is_commercial_re"), F.lit(False)),
                    "commercial",
                ).otherwise("residential")
                if "is_commercial_re" in cols
                else F.lit("residential"),
            ),
            "property_ltv": F.when(_re, F.col("ltv"))
            if "ltv" in cols
            else F.lit(None).cast("double"),
        }
    )
    return CalcOutput(results=exp.select(*_RESULT_COLS))


def _apply_pma(df: DataFrame, pack: RulePack, pma, cols=None) -> DataFrame:
    """PS1/26 Art.153(5A)/154(4A)/158(6A) post-model adjustments on the
    IRB branch (ref engine/irb/adjustments.py:122-279
    apply_post_model_adjustments). B3.1-only (pack Feature); CRR rows
    carry the zero columns for schema consistency.

    Sequencing per Art.154(4A) — it is load-bearing: (b) the 10%
    residential-mortgage RW floor applies FIRST and establishes the
    post-floor RWEA base; (a) the general-PMA and unrecognised-exposure
    scalars then multiply THAT base, so capital on floored rows is not
    understated. EL PMAs are floored at zero (Art.158(6A) — a PMA can
    never decrease expected loss); expected_loss keeps the pre-PMA value
    and el_after_adjustment carries the adjusted figure, mirroring the
    reference's column contract."""
    pma_rwa, pma_el, pma_unrec = pma
    zero = F.lit(0.0)
    if (
        "post_model_adjustments" not in pack.scalars
        or pack.scalar("post_model_adjustments") < 1.0
    ):
        return df.withColumns(
            {
                "rwa_pre_adjustments": F.col("rwa"),
                "mortgage_rw_floor_adjustment": zero,
                "post_model_adjustment_rwa": zero,
                "unrecognised_exposure_adjustment": zero,
                "el_pre_adjustment": F.col("expected_loss"),
                "post_model_adjustment_el": zero,
                "el_after_adjustment": F.col("expected_loss"),
            }
        )
    floor = pack.lit("mortgage_rw_floor")
    # Art.154(4A)(b) scopes the 10% floor to RESIDENTIAL mortgages only
    # (ref irb/adjustments.py is_mortgage = class contains
    # MORTGAGE|RESIDENTIAL): a commercial-RE-secured re_secured row is out.
    is_mortgage = F.col("exposure_class") == "re_secured"
    if cols is None:
        cols = _colset(df)
    if "is_commercial_re" in cols:
        is_mortgage = is_mortgage & ~F.coalesce(
            F.col("is_commercial_re"), F.lit(False)
        )
    if "retail_subtype" in cols:
        is_mortgage = is_mortgage | (
            (F.col("exposure_class") == "retail")
            & (F.col("retail_subtype") == "mortgage")
        )
    mortgage_adj = F.when(
        is_mortgage,
        F.greatest(zero, floor - F.col("risk_weight")) * F.col("ead_after_crm"),
    ).otherwise(zero)
    # the Art.154(4A) sequencing is preserved by expression NESTING instead
    # of column chaining (same arithmetic DAG, bit-identical): rwa_floored
    # is the (b) post-floor base, the (a) scalars multiply THAT base, and
    # the reused Column objects keep one JVM expression per step — the
    # whole adjustment block is one projection instead of nine chained
    # withColumn re-analyses of the ~160-column plan
    rwa_floored = F.col("rwa") + mortgage_adj
    pma_rwa_col = rwa_floored * F.lit(pma_rwa)
    unrec_col = rwa_floored * F.lit(pma_unrec)
    el_pma = F.greatest(zero, F.col("expected_loss") * F.lit(pma_el))
    return df.withColumns(
        {
            "rwa_pre_adjustments": F.col("rwa"),
            "mortgage_rw_floor_adjustment": mortgage_adj,
            "post_model_adjustment_rwa": pma_rwa_col,
            "unrecognised_exposure_adjustment": unrec_col,
            "rwa": rwa_floored + pma_rwa_col + unrec_col,
            "el_pre_adjustment": F.col("expected_loss"),
            "post_model_adjustment_el": el_pma,
            "el_after_adjustment": F.col("expected_loss") + el_pma,
        }
    )


def run_irb(
    crm: CRMOutput,
    pack: RulePack,
    dictionary: bool = True,
    pma: tuple = (0.0, 0.0, 0.0),
    firb_fixed_maturity: bool = False,
    reporting_date: str | None = None,
    threshold_scale: float = 1.0,
) -> CalcOutput:
    spark = crm.exposures.sparkSession
    exp = crm.exposures.where(
        F.col("has_irb_permission")
        & ~F.col("is_specialised")
        & (F.col("exposure_class") != "securitisation")
    )
    exp = _crm_carry(exp)
    cols = set(_colset(exp))
    if "el_be" not in cols:
        exp = exp.withColumn("el_be", F.lit(None).cast("double"))
        cols.add("el_be")
    # CRR Art.147(3)/(4)(b) IRB class equivalence (ref rulebook/packs/
    # common.py entity_type_to_irb_class + engine/entity_class_maps.py):
    # MDBs and international organisations take the central-government
    # treatment under IRB (Art.147(3)); the institution-leg RGLA/PSE
    # classes take the institution treatment (Art.147(4)(b)). The SA class
    # on exposure_class is untouched — this routes IRB floors/curves only
    # (the sovereign-equivalent RGLA leg already classifies as sovereign).
    exp = exp.withColumn(
        "irb_exposure_class",
        F.when(
            F.col("exposure_class").isin("mdb", "international_organisation"),
            F.lit("sovereign"),
        )
        .when(F.col("exposure_class").isin("pse", "rgla"), F.lit("institution"))
        .otherwise(F.col("exposure_class")),
    )
    cols.add("irb_exposure_class")

    # standardised-equivalent RWA for the Art.92(3) output floor: the SAME
    # SA ladder the SA branch runs (class × CQS lookup + overrides), so the
    # floor base is a genuine dual-framework number, not a flat proxy
    sa_rw_table = pack.table_df(spark, "sa_rw").select(
        F.col("exposure_class").alias("_sa_class"),
        F.col("cqs").alias("_sa_cqs"),
        F.col("rw").alias("_sa_rw"),
    )
    exp = exp.join(
        F.broadcast(sa_rw_table),
        (exp.exposure_class == F.col("_sa_class"))
        & (F.coalesce(exp.cqs, F.lit(0)) == F.col("_sa_cqs")),
        "left",
    ).drop("_sa_class", "_sa_cqs")
    sa_equiv_rw = (
        F.when(F.col("is_defaulted"), pack.lit("defaulted_rw"))
        .when(F.col("exposure_class") == "re_secured", pack.lit("re_secured_rw"))
        .when(F.col("exposure_class") == "retail", pack.lit("retail_rw"))
        .when(F.col("_sa_rw").isNotNull(), F.col("_sa_rw"))
        .otherwise(pack.lit("unrated_corp_rw"))
    )
    exp = exp.withColumn(
        "rwa_sa_equivalent", F.col("ead_after_crm") * sa_equiv_rw
    ).drop("_sa_rw")
    # per-class PD floor + feature-gated A-IRB LGD floor, staged as real
    # columns so pd_floored/lgd_floored AND the irb_*_floor audit carriers
    # read the same expression (ref _pd_floor_expression /
    # _lgd_floor_blended_expression in engine/irb/formulas.py)
    exp = exp.withColumns(
        {
            "_pd_floor_in": _pd_floor_class_expr(pack, exp, cols=cols),
            "_lgd_floor_in": _lgd_floor_expr(pack, exp, cols=cols),
        }
    )
    # F-IRB supervisory LGD for rows with no own estimate (ref
    # engine/irb/transforms.py apply_firb_lgd): seniority-routed senior/
    # subordinated with the B3.1 Art.161(1)(aa) FSE split, OVERRIDDEN by
    # the Art.161(1)(e)/(f)/(g) purchased-receivables sub-type rates when
    # purchased_receivables_subtype is set — subtype dispatch, not
    # seniority (subordinated purchased receivables carry 100%, dilution
    # risk 75% CRR / 100% B3.1). The subtype rates bind on BOTH approaches
    # for the Art.160(2)/(6) top-down population: a row carrying a subtype
    # with no own LGD is that population by construction, and the ref
    # records that gating them on approach==FIRB was anti-conservative.
    _sen_sub = (
        F.coalesce(F.col("seniority"), F.lit("senior")).contains("sub")
        if "seniority" in cols
        else F.lit(False)
    )
    _fse_flag = (
        F.coalesce(F.col("is_financial_sector_entity"), F.lit(False))
        if "is_financial_sector_entity" in cols
        else F.lit(False)
    )
    _supervisory_lgd = F.when(_sen_sub, pack.lit("firb_lgd_subordinated")).otherwise(
        F.when(_fse_flag, pack.lit("firb_lgd_senior_fse")).otherwise(
            pack.lit("firb_lgd_senior")
        )
    )
    if "purchased_receivables_subtype" in cols:
        _prs = F.col("purchased_receivables_subtype")
        _supervisory_lgd = (
            F.when(_prs == "senior", pack.lit("firb_lgd_pr_senior"))
            .when(_prs == "subordinated", pack.lit("firb_lgd_pr_subordinated"))
            .when(_prs == "dilution_risk", pack.lit("firb_lgd_dilution"))
            .otherwise(_supervisory_lgd)
        )
    _floored_cols = {
        "pd_floored": F.when(F.col("is_defaulted"), F.lit(1.0)).otherwise(
            F.greatest(F.coalesce("pd", F.lit(1.0)), F.col("_pd_floor_in"))
        ),
        "lgd_floored": F.greatest(
            F.coalesce(F.col("lgd"), _supervisory_lgd), F.col("_lgd_floor_in")
        ),
    }
    # Art.162 maturity priority chain (ref engine/irb/transforms.py
    # _build_maturity_exprs — highest rung wins):
    #   1. supplied effective_maturity = the firm's own Art.162(2) figure,
    #      trusted to the [1 day, 5y] clip (the 1-year floor is the firm's
    #      to apply; carve-outs may legitimately sit below it)
    #   2. the Art.162(3) one-day carve-out flag — explicit column, or
    #      derived under the CRR-only Art.162(3)(b) feature from
    #      self-liquidating short-term trade finance with residual <= 1y
    #   3. B3.1 revolvers price to the facility termination date
    #      (PS1/26 Art.162(2A)(k), feature-gated, needs reporting_date)
    #   4. F-IRB fixed supervisory 2.5y (CRR Art.162(1) first sentence;
    #      only under the firm's Art.143 election — config, default off)
    #   5. fallback 2.5y
    _one_day = (
        F.coalesce("has_one_day_maturity_floor", F.lit(False))
        if "has_one_day_maturity_floor" in cols
        else F.lit(False)
    )
    if (
        pack.scalar("one_day_maturity_floor") >= 1.0
        and "is_short_term_trade_lc" in cols
    ):
        _resid_cands = [
            c
            for c in ("residual_maturity_years", "original_maturity_years")
            if c in cols
        ]
        if _resid_cands:
            _resid = F.coalesce(*[F.col(c) for c in _resid_cands])
            _one_day = _one_day | (
                F.coalesce("is_short_term_trade_lc", F.lit(False))
                & (_resid <= 1.0)
            )
    _m_base = F.lit(2.5)
    if (
        pack.scalar("revolving_uses_termination_maturity") >= 1.0
        and reporting_date is not None
        and "is_revolving" in cols
        and "facility_termination_date" in cols
    ):
        _term_y = (
            F.datediff(
                F.col("facility_termination_date").cast("date"),
                F.lit(reporting_date).cast("date"),
            )
            / F.lit(365.0)
        )
        _m_base = F.when(
            F.coalesce("is_revolving", F.lit(False)) & _term_y.isNotNull(),
            F.least(F.greatest(_term_y, F.lit(1.0)), F.lit(5.0)),
        ).otherwise(_m_base)
    if (
        firb_fixed_maturity
        and pack.scalar("firb_fixed_supervisory_maturity") >= 1.0
        and "irb_subapproach" in cols
    ):
        _m_base = F.when(
            F.col("irb_subapproach") == "firb",
            pack.lit("firb_fixed_supervisory_maturity_years"),
        ).otherwise(_m_base)
    # pd_floored / lgd_floored / m_eff all read columns present after the
    # floor-in projection — one batched projection instead of three
    _floored_cols["m_eff"] = (
        F.when(
            F.col("effective_maturity").isNotNull(),
            F.least(
                F.greatest(F.col("effective_maturity"), F.lit(1.0 / 365.0)),
                F.lit(5.0),
            ),
        )
        .when(_one_day, F.lit(1.0 / 365.0))
        .otherwise(_m_base)
    )
    exp = exp.withColumns(_floored_cols)

    perf = exp.where(F.col("pd_floored") < 1.0)

    # Asset-class correlation routing (CRR Art.153(2)/(4), Art.154; ref
    # engine/irb/formulas.py _correlation_expr_from_pd + the retail
    # calculators): retail takes its own curves (mortgage 0.15, QRRE 0.04
    # when a retail_subtype carrier is present, else the other-retail
    # 0.03–0.16/35-decay curve) and NO maturity adjustment; corporates
    # subtract the Art.153(4) SME size adjustment when annual sales ≤ €50m
    # (unknown sales ⇒ S=50 ⇒ zero adjustment); large/unregulated
    # financial-sector entities multiply R by 1.25 (Art.153(2),
    # is_large_financial carrier).
    r_corp = spark_correlation("pd_floored")
    r_other_retail = spark_correlation_other_retail("pd_floored")
    sme_adj = F.when(
        (F.col("exposure_class") == "corporate")
        & (F.col("annual_revenue") > 0.0)
        & (F.col("annual_revenue") <= 50_000_000.0),
        spark_sme_size_adjustment("(annual_revenue / 1000000.0D)"),
    ).otherwise(F.lit(0.0))
    if "retail_subtype" in cols:
        r_retail = (
            F.when(F.col("retail_subtype") == "mortgage", F.lit(R_RETAIL_MORTGAGE))
            .when(F.col("retail_subtype") == "qrre", F.lit(R_RETAIL_QRRE))
            .otherwise(r_other_retail)
        )
    else:
        r_retail = r_other_retail
    r_nonretail = r_corp - sme_adj
    if "is_large_financial" in cols:
        r_nonretail = F.when(
            F.coalesce(F.col("is_large_financial"), F.lit(False)),
            r_nonretail * F.lit(FI_CORRELATION_MULTIPLIER),
        ).otherwise(r_nonretail)
    perf = perf.withColumns(
        {
            "_irb_r_in": F.when(
                F.col("exposure_class") == "retail", r_retail
            ).otherwise(r_nonretail),
            "_no_ma": F.col("exposure_class") == "retail",
        }
    )

    # With routed correlations R is a function of (PD, class, sales, FI
    # flag) — sales is continuous, so a dictionary keyed on R would grow
    # toward row-count and its broadcast-back would melt at scale. Split
    # the kernel instead: Φ⁻¹(PD) — the widest expression — still
    # dictionary-evaluates on the banded PD master scale alone; Φ (K) and
    # the maturity adjustment run per-row inside whole-stage codegen.
    if dictionary:
        perf = dictionary_apply(
            perf,
            ["pd_floored"],
            lambda d: with_normal_ppf(d, "pd_floored", "g_pd"),
        )
    else:
        perf = with_normal_ppf(perf, "pd_floored", "g_pd")
    perf = with_irb_k_r(perf, "pd_floored", "lgd_floored", "g_pd", "_irb_r_in", "k")
    # IRB parameter decomposition carriers (ref CALCULATION_OUTPUT_SCHEMA
    # :3030-3041): the routed correlation and the Art.153(1) maturity
    # slope b, sealed HERE where the kernel inputs still exist as columns
    # (retail rows carry no b — they take no maturity adjustment).
    # ma and both carriers read pre-chain columns only — one projection
    perf = perf.withColumns(
        {
            "ma": F.when(F.col("_no_ma"), F.lit(1.0)).otherwise(
                irb_maturity_adj(F.col("pd_floored"), F.col("m_eff"))
            ),
            "irb_correlation_r": F.col("_irb_r_in"),
            "irb_maturity_adj_b": F.when(
                F.col("_no_ma"), F.lit(None).cast("double")
            ).otherwise(irb_maturity_b(F.col("pd_floored"))),
        }
    )
    perf = perf.drop("g_pd", "_irb_r_in", "_no_ma")
    # CRR Art.153(1): ×1.06 scaling on non-defaulted IRB (B3.1 sets it to
    # 1.0 — the attribution waterfall decomposes exactly this removal)
    perf = perf.withColumns(
        {
            "risk_weight": F.col("k")
            * F.col("ma")
            * 12.5
            * pack.lit("irb_scaling_factor"),
            # permission-routed runs record WHICH IRB variant priced the
            # row (airb = own LGD, firb = supervisory LGD) — the
            # model-permissions stage sets irb_subapproach
            "rw_source": (
                F.when(
                    F.col("irb_subapproach").isNotNull(),
                    F.concat(F.lit("irb_vasicek_"), F.col("irb_subapproach")),
                ).otherwise("irb_vasicek")
                if "irb_subapproach" in cols
                else F.lit("irb_vasicek")
            ),
        }
    )
    # the rest of the decomposition block (ref :3026-3041): raw-vs-floor
    # parameter provenance, the LGD basis, and the kernel outputs K and
    # the pre-substitution Vasicek weight — every value the kernel already
    # computed, surfaced instead of dropped
    _sub = (
        F.coalesce(F.col("irb_subapproach"), F.lit(""))
        if "irb_subapproach" in cols
        else F.lit("")
    )
    # one batched withColumns — every carrier copies a pre-existing column,
    # so a per-column chain would re-analyse the wide plan 10× for nothing
    perf = perf.withColumns(
        {
            "irb_pd_original": F.col("pd"),
            "irb_pd_floor": F.col("_pd_floor_in"),
            "irb_pd_floored": F.col("pd_floored"),
            "irb_lgd_original": F.col("lgd"),
            "irb_lgd_floor": F.col("_lgd_floor_in"),
            "irb_lgd_floored": F.col("lgd_floored"),
            "irb_lgd_type": F.when(
                F.col("lgd").isNotNull() & (_sub != "firb"), "modelled"
            ).otherwise("supervisory"),
            "irb_maturity_m": F.col("m_eff"),
            "irb_capital_k": F.col("k"),
            "irb_risk_weight": F.col("risk_weight"),
        }
    )
    # IRB unfunded protection: substitution / parameter substitution /
    # double default on the covered leg, Art.193 benefit gate, EL blend.
    # The pre-blend Vasicek weight is stashed first — it is the CR7/CR7-A
    # "RWEA without substitution effects" hypothetical
    perf = perf.withColumn("_rw_pre_subst", F.col("risk_weight"))
    perf, el_expr = _irb_guarantee_adjust(perf, pack, spark, cols=cols)
    perf = _el_columns(perf, el_expr, pool_b_extras=True, cols=cols)

    # defaulted bypasses Vasicek (CRR Art.153(1)(ii)/154(1)(i), CRE31.3):
    # A-IRB (own BEEL supplied): K = max(0, LGD − BEEL), no MA, no 1.06;
    # F-IRB: K = 0 — capital is held through provisions
    dflt = exp.where(F.col("pd_floored") >= 1.0)
    k_dflt = F.when(
        F.col("el_be").isNotNull(),
        F.greatest(F.col("lgd_floored") - F.col("el_be"), F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    # decomposition carriers on the defaulted leg: PD is pinned at 1
    # (no floor consulted), the Vasicek quantities (R, b) never exist,
    # and K is the Art.153(1)(ii) max(0, LGD − E·L_BE) — sealed from
    # the same expression that priced the row. One batched projection:
    # irb_risk_weight reuses risk_weight's expression object (identical
    # arithmetic DAG, bit-equal to reading the chained column)
    _rw_dflt = k_dflt * 12.5
    dflt = dflt.withColumns(
        {
            "risk_weight": _rw_dflt,
            "rw_source": F.when(
                F.col("el_be").isNotNull(), "irb_defaulted_airb"
            ).otherwise("irb_defaulted_firb"),
            "irb_pd_original": F.col("pd"),
            "irb_pd_floored": F.col("pd_floored"),
            "irb_lgd_original": F.col("lgd"),
            "irb_lgd_floor": F.col("_lgd_floor_in"),
            "irb_lgd_floored": F.col("lgd_floored"),
            "irb_lgd_type": F.when(
                F.col("el_be").isNotNull(), "modelled"
            ).otherwise("supervisory"),
            "irb_maturity_m": F.col("m_eff"),
            "irb_capital_k": k_dflt,
            "irb_risk_weight": _rw_dflt,
        }
    )
    dflt = _el_columns(
        dflt,
        F.coalesce("el_be", F.col("lgd_floored")) * F.col("ead_after_crm"),
        pool_b_extras=True,
        cols=cols,
    )

    # defaulted rows never substitute — the hypothetical equals the actual
    dflt = dflt.withColumn("_rw_pre_subst", F.col("risk_weight"))

    def _finish(df):
        # routing provenance: which IRB variant the permission stage
        # granted (airb/firb), else the bundle-level permission flag
        irb_reason = (
            F.concat(
                F.lit("irb_permission_"),
                F.coalesce(F.col("irb_subapproach"), F.lit("granted")),
            )
            if "irb_subapproach" in cols
            else F.lit("irb_permission_granted")
        )
        _sme_f, _infra_f, _sf = _supporting_factor_exprs(
            pack, threshold_scale, cols
        )
        # one batched projection; supporting_factor_benefit inlines the
        # exact rwa_before_sf/rwa expressions (identical DAG, bit-equal)
        df = df.withColumns(
            {
                "approach": F.lit("IRB"),
                "approach_reason": irb_reason,
                "rwa_before_sf": F.col("ead_after_crm") * F.col("risk_weight"),
                "rwa": F.col("ead_after_crm") * F.col("risk_weight") * _sf,
                "rwa_pre_crm_substitution": F.col("ead_after_crm")
                * F.col("_rw_pre_subst")
                * _sf,
                # supporting-factor decomposition on the IRB branch (CRR
                # Art.501/501a apply per RWEA regardless of approach — ref
                # irb/calculator.py:168 SupportingFactorCalculator)
                "sme_supporting_factor": _sme_f,
                "infra_supporting_factor": _infra_f,
                "supporting_factor_benefit": (
                    F.col("ead_after_crm") * F.col("risk_weight")
                )
                - (F.col("ead_after_crm") * F.col("risk_weight") * _sf),
            }
        )
        df = _param_cols(
            df,
            pd_col=F.col("pd_floored"),
            lgd_col=F.col("lgd_floored"),
            m_col=F.col("m_eff"),
            cols=cols,
        )
        df = _apply_pma(df, pack, pma, cols=cols)
        return df.select(*_RESULT_COLS)

    return CalcOutput(results=_finish(perf).unionByName(_finish(dflt)))


def run_secsa(crm: CRMOutput, pack: RulePack) -> CalcOutput:
    """SEC-SA branch for securitisation pool rows.

    Pool-grain rows (no tranche attributes) take the flat distillation
    RW = max(floor, 12.5·K_SA·p) (ref engine/aggregator/_securitisation.py
    declares the framework out of scope; the routing/floor shape is real).
    Tranche-grain rows (attachment/detachment present, emitted by
    run_securitisation when the bundle carries securitisation_tranches)
    take the FULL SSFA closed form (BCBS CRE41 / CRR Art.261-262,
    functions/secsa.py) — beyond the reference. Pure exp/arithmetic, so
    the branch stays inside whole-stage codegen."""
    exp = _crm_carry(crm.exposures.where(F.col("exposure_class") == "securitisation"))
    cols = _colset(exp)
    flat_rw = F.greatest(
        pack.lit("secsa_floor_rw"),
        pack.lit("secsa_ksa") * F.lit(12.5) * pack.lit("secsa_p"),
    )
    if "attachment" in cols:
        from rwa_calculator_spark.functions.secsa import (
            ssfa_risk_weight_cols,
        )

        # STS pools take the halved supervisory p (CRR Art.262(1));
        # column-valued so STS and non-STS tranches share one plan
        p_sa = (
            F.when(F.col("is_sts"), pack.lit("secsa_p_sts")).otherwise(
                pack.lit("secsa_p")
            )
            if "is_sts" in cols
            else pack.lit("secsa_p")
        )
        rw_sa = ssfa_risk_weight_cols(
            F.col("attachment"),
            F.col("detachment"),
            F.coalesce("w_delinquent", F.lit(0.0)),
            pack.lit("secsa_ksa"),
            p_sa,
            floor=pack.scalar("secsa_floor_rw"),
        )
        rw = F.when(F.col("attachment").isNotNull(), rw_sa).otherwise(flat_rw)
        rw_src = F.when(F.col("attachment").isNotNull(), "sec_sa_ssfa").otherwise(
            "sec_sa"
        )
        # Art.92(3) floor base: SEC-IRBA rows floor against their SEC-SA
        # equivalent, so the SA-side RW is kept regardless of routing
        sa_equiv_rw = rw
        if "k_irb" in cols:
            # SEC-IRBA (CRR Art.259): same SSFA closed form with the
            # pool's own K_IRB and the supervisory p-formula
            # p = max(floor, A + B/N + C·K_IRB + D·LGD + E·M_T).
            # K_IRB already reflects pool quality, so W does not re-adjust.
            p_irba = F.greatest(
                pack.lit("secirba_p_floor"),
                pack.lit("secirba_coef_a")
                + pack.lit("secirba_coef_b") / F.col("pool_n")
                + pack.lit("secirba_coef_c") * F.col("k_irb")
                + pack.lit("secirba_coef_d") * F.col("pool_lgd")
                + pack.lit("secirba_coef_e") * F.col("pool_maturity"),
            )
            rw_irba = ssfa_risk_weight_cols(
                F.col("attachment"),
                F.col("detachment"),
                F.lit(0.0),
                F.col("k_irb"),
                p_irba,
                floor=pack.scalar("secsa_floor_rw"),
            )
            rw = F.when(F.col("k_irb").isNotNull(), rw_irba).otherwise(rw)
            rw_src = F.when(F.col("k_irb").isNotNull(), "sec_irba_ssfa").otherwise(
                rw_src
            )
            approach_col = F.when(F.col("k_irb").isNotNull(), "SEC-IRBA").otherwise(
                F.lit("SEC-SA")
            )
    else:
        rw = flat_rw
        rw_src = F.lit("sec_sa")
        sa_equiv_rw = rw
    if "k_irb" not in cols:
        approach_col = F.lit("SEC-SA")
    exp = exp.withColumns(
        {
            "approach": approach_col,
            "risk_weight": rw,
            "rw_source": rw_src,
            "rwa_before_sf": F.col("ead_after_crm") * rw,
            "rwa": F.col("ead_after_crm") * rw,
        }
    )
    exp = _el_columns(exp, F.lit(0.0))
    exp = _param_cols(exp, cols=cols)
    exp = exp.withColumns(
        {
            "rwa_sa_equivalent": F.col("ead_after_crm") * sa_equiv_rw,
            "rwa_pre_crm_substitution": F.col("rwa"),
        }
    )
    return CalcOutput(results=exp.select(*_RESULT_COLS))


def run_slotting(
    crm: CRMOutput, pack: RulePack, threshold_scale: float = 1.0
) -> CalcOutput:
    """Specialised-lending supervisory slotting: exposures of counterparties
    in the specialised_lending table take the slot-category RW from the
    rulepack, with the table's EL rate feeding expected loss
    (CRR Art.153(5)/158(6); ref engine/slotting/)."""
    spark = crm.exposures.sparkSession
    exp = _crm_carry(crm.exposures.where(F.col("is_specialised")))
    cols = _colset(exp)
    # Art.153(5) Table A keys on (category, maturity band, HVCRE): the
    # preferential short row applies below 2.5y remaining maturity;
    # unknown maturity conservatively takes the long row. Joining on the
    # full key matters — a category-only join against the 20-row table
    # fans every slotted exposure out 4×.
    exp = exp.withColumn(
        "_sl_short",
        F.coalesce(F.col("effective_maturity") < F.lit(2.5), F.lit(False)),
    ).withColumn(
        "_sl_hvcre",
        (
            F.coalesce("is_hvcre", F.lit(False))
            if "is_hvcre" in cols
            else F.lit(False)
        ),
    )
    slot_rw = pack.table_df(spark, "slotting_rw").select(
        F.col("slot_category").alias("_sl_cat_t"),
        F.col("is_short").alias("_sl_short_t"),
        F.col("is_hvcre").alias("_sl_hvcre_t"),
        "rw",
        "el_rate",
    )
    exp = exp.join(
        F.broadcast(slot_rw),
        (F.col("slot_category") == F.col("_sl_cat_t"))
        & (F.col("_sl_short") == F.col("_sl_short_t"))
        & (F.col("_sl_hvcre") == F.col("_sl_hvcre_t")),
        "left",
    ).drop("_sl_cat_t", "_sl_short_t", "_sl_hvcre_t").withColumn(
        "risk_weight",
        F.when(F.col("is_defaulted"), F.lit(0.0)).otherwise(
            F.coalesce("rw", pack.lit("unrated_corp_rw"))
        ),
    )
    # SL decomposition (ref :3042-3045): the category's assigned weight
    # under its own name (sl_type/sl_project_phase ride through as input
    # carriers where the bundle declares them). All read pre-chain columns
    # (risk_weight landed in the previous projection) — one batched call
    exp = exp.withColumns(
        {
            "exposure_class": F.lit("specialised"),
            "approach": F.lit("SLOTTING"),
            "approach_reason": F.lit("slotting_category_assigned"),
            "rw_source": F.when(
                F.col("is_defaulted"), "slotting_defaulted"
            ).otherwise("slotting"),
            "rwa_before_sf": F.col("ead_after_crm") * F.col("risk_weight"),
            "rwa": F.col("ead_after_crm") * F.col("risk_weight"),
            "sl_risk_weight": F.col("risk_weight"),
        }
    )
    # CRR Art.501/501a on the slotting branch (ref slotting/calculator.py
    # :146 _apply_supporting_factors — infrastructure project finance in
    # slotting qualifies for the 0.75 factor; B3.1 disables both)
    _sme_f, _infra_f, _sf = _supporting_factor_exprs(
        pack, threshold_scale, cols
    )
    # one batched projection: supporting_factor_benefit inlines the exact
    # post-factor rwa expression (identical arithmetic DAG, bit-equal to
    # reading the chained column)
    _rwa_sf = F.col("rwa") * _sf
    exp = exp.withColumns(
        {
            "rwa": _rwa_sf,
            "sme_supporting_factor": _sme_f,
            "infra_supporting_factor": _infra_f,
            "supporting_factor_benefit": F.col("rwa_before_sf") - _rwa_sf,
        }
    )
    exp = _el_columns(
        exp, F.coalesce("el_rate", F.lit(0.0)) * F.col("ead_after_crm")
    )
    # carry the maturity the band keyed on (Pillar 3 CR10 splits every
    # category into <2.5y / ≥2.5y rows on exactly this input)
    exp = _param_cols(exp, cols=cols, m_col=F.col("effective_maturity").cast("double"))
    exp = exp.withColumns(
        {
            "rwa_sa_equivalent": F.col("rwa"),
            "rwa_pre_crm_substitution": F.col("rwa"),
        }
    )
    return CalcOutput(results=exp.select(*_RESULT_COLS))


def _equity_pd_lgd(equity: DataFrame, pack: RulePack) -> DataFrame:
    """CRR Art.155(3) PD/LGD equity approach (ref engine/equity/
    calculator.py _apply_equity_weights_pd_lgd): the corporate Vasicek K
    formula with the Art.165 supervisory parameters — PD floored at 0.40%
    for exchange-traded / 1.25% for all other equity, LGD 65% for
    sufficiently-diversified private equity else 90%, M fixed at 5 years
    — times the Art.153(1) scaling, with a ×1.5 risk-weight scaling where
    the firm lacks Art.178 default-definition data, and the Art.155(3)
    cap EL·12.5 + RWEA ≤ EAD·12.5 clamped at zero. The risk_weight
    column stays uncapped (the reference discloses it that way); only
    rwa is capped."""
    mv = F.coalesce("market_value", F.lit(0.0))
    listed = F.coalesce("is_exchange_traded", F.lit(False))
    pe_div = (
        F.coalesce("is_diversified_pe", F.lit(False))
        if "is_diversified_pe" in equity.columns
        else F.lit(False)
    )
    has_dd = (
        F.coalesce("has_default_definition_info", F.lit(False))
        if "has_default_definition_info" in equity.columns
        else F.lit(False)
    )
    eq = equity.withColumn(
        "_pd_eq",
        F.when(listed, pack.lit("equity_pdlgd_pd_floor_listed")).otherwise(
            pack.lit("equity_pdlgd_pd_floor_other")
        ),
    ).withColumn(
        "_lgd_eq",
        F.when(pe_div, pack.lit("equity_pdlgd_lgd_diversified")).otherwise(
            pack.lit("equity_pdlgd_lgd_other")
        ),
    )
    eq = with_normal_ppf(eq, "_pd_eq", "_g_eq")
    eq = eq.withColumn("_r_eq", spark_correlation("_pd_eq"))
    eq = with_irb_k_r(eq, "_pd_eq", "_lgd_eq", "_g_eq", "_r_eq", "_k_eq")
    rw = (
        (
            (F.col("_k_eq") * irb_maturity_adj(F.col("_pd_eq"), pack.lit("equity_pdlgd_maturity")))
            * F.lit(12.5)
        )
        * pack.lit("irb_scaling_factor")
    ) * F.when(has_dd, F.lit(1.0)).otherwise(pack.lit("equity_pdlgd_no_dd_scaling"))
    el = (F.col("_pd_eq") * F.col("_lgd_eq")) * mv
    eq = eq.withColumn("_rw_eq", rw).withColumn("_el_eq", el)
    rwa_cap = F.greatest((mv * F.lit(12.5)) - (F.col("_el_eq") * F.lit(12.5)), F.lit(0.0))
    rwa = F.least(F.col("_rw_eq") * mv, rwa_cap)
    return eq.select(
        "exposure_reference",
        "counterparty_reference",
        F.lit("equity").alias("exposure_class"),
        F.lit("EQUITY").alias("approach"),
        mv.alias("drawn_amount"),
        F.lit(0.0).alias("undrawn_amount"),
        mv.alias("ead"),
        mv.alias("ead_after_crm"),
        F.lit(0.0).alias("provision_allocated"),
        F.lit(0.0).alias("collateral_value"),
        F.lit(0.0).alias("g_coverage"),
        F.col("_rw_eq").alias("risk_weight"),
        F.lit("equity_pd_lgd").alias("rw_source"),
        rwa.alias("rwa_before_sf"),
        rwa.alias("rwa"),
        F.col("_el_eq").alias("expected_loss"),
        F.col("_el_eq").alias("el_shortfall"),
        F.lit(0.0).alias("el_excess"),
        F.lit(None).cast("double").alias("ccf"),
        F.col("_pd_eq").alias("pd_used"),
        F.col("_lgd_eq").alias("lgd_used"),
        pack.lit("equity_pdlgd_maturity").alias("maturity_used"),
        rwa.alias("rwa_sa_equivalent"),
        F.lit("pd_lgd").alias("equity_type"),
        F.col("_rw_eq").alias("equity_risk_weight"),
        (F.col("_rw_eq") >= F.lit(4.0)).alias("equity_higher_risk"),
    )


def run_equity(
    equity: DataFrame, pack: RulePack, reporting_date: str | None = None
) -> CalcOutput:
    """Equity holdings, regime-aware.

    CRR: IRB simple risk-weight method (Art.155(2); ref
    engine/equity/calculator.py:760-762) — diversified PE 190%,
    exchange-traded 290%, other 370%, EL 0.8%/0.8%/2.4% (Art.158(7)) —
    with non-trading-book short positions netted against longs in the
    same stock first (Art.155(2); ref calculator.py:829
    _net_short_positions) — or, for rows electing it via `use_pd_lgd`,
    the Art.155(3) PD/LGD approach (_equity_pd_lgd), which bypasses both
    netting and the transitional floor (ref calculator.py:249-251).
    B3.1: IRB equity removed (PS1/26 Art.133) — SA 250% standard,
    400% speculative unlisted, no EL charge; the PD/LGD election is
    ignored (ref calculator.py: "the equity_pd_lgd flag is ignored
    under Basel 3.1"), and the PRA Rules 4.1-4.10 transitional RW floor
    phases the weights in from 2027 (ref calculator.py:1023
    _apply_transitional_floor + rulebook/packs/b31.py:740 schedules).
    """
    if (
        "use_pd_lgd" in equity.columns
        and pack.scalar("equity_irb_available") >= 1.0
    ):
        elect = F.coalesce("use_pd_lgd", F.lit(False))
        simple_out = _equity_simple(equity.where(~elect), pack, reporting_date)
        pdlgd_out = _equity_pd_lgd(equity.where(elect), pack)
        return CalcOutput(
            results=_crm_carry(
                _provenance_cols(
                    # the PD/LGD leg carries no netting/transitional
                    # columns (it bypasses both) — union fills them null
                    simple_out.unionByName(pdlgd_out, allowMissingColumns=True),
                    "EQUITY",
                )
            ).select(*_RESULT_COLS)
        )
    return CalcOutput(
        results=_crm_carry(
            _provenance_cols(_equity_simple(equity, pack, reporting_date), "EQUITY")
        ).select(*_RESULT_COLS)
    )


def _net_short_ead(equity: DataFrame) -> DataFrame:
    """CRR Art.155(2) non-trading-book net-short netting (ref
    engine/equity/calculator.py:829-894 _net_short_positions): an
    explicitly-hedged (≥1y) short may offset longs in the SAME individual
    stock. Net long per issuer = max(0, Σ signed position_value) over the
    eligible rows, redistributed pro-rata to each row's gross long value;
    absorbed shorts (and longs in a net-short group) collapse to 0.
    Ineligible rows keep the absolute-value market_value chain. Adds
    `_eq_ead`; column-absence defensive — without position_value/
    issuer_reference the frame passes through unchanged."""
    mv = F.coalesce("market_value", F.lit(0.0))
    if (
        "position_value" not in equity.columns
        or "issuer_reference" not in equity.columns
    ):
        return equity.withColumn("_eq_ead", mv)
    hedged = (
        F.coalesce("is_explicitly_hedged", F.lit(False))
        if "is_explicitly_hedged" in equity.columns
        else F.lit(False)
    )
    eligible = (
        F.col("issuer_reference").isNotNull()
        & F.col("position_value").isNotNull()
        & hedged
    )
    signed = F.coalesce("position_value", F.lit(0.0))
    gross_long = F.when(eligible & (signed > 0), signed).otherwise(F.lit(0.0))
    w_iss = W.partitionBy("issuer_reference")
    net_long = F.greatest(
        F.sum(F.when(eligible, signed).otherwise(F.lit(0.0))).over(w_iss),
        F.lit(0.0),
    )
    gross_long_iss = F.sum(gross_long).over(w_iss)
    share = F.when(gross_long_iss > 0, gross_long / gross_long_iss).otherwise(
        F.lit(0.0)
    )
    return equity.withColumn(
        "_eq_ead", F.when(eligible, net_long * share).otherwise(mv)
    )


def _equity_transitional_schedule(
    pack: RulePack, reporting_date: str | None
) -> tuple[float, float] | None:
    """Resolve the PRA Rules 4.2/4.3 transitional (std, higher-risk) RWs
    for the reporting date — driver-side O(1) over the pack Schedule rows
    (ref rulebook/packs/b31.py:740-761). None when the Feature is off,
    no date was supplied, or the date precedes the first step (the
    reference's explicit "no transition → skip" contract)."""
    if reporting_date is None:
        return None
    entry = pack.scalars.get("equity_transitional")
    if entry is None or float(entry.value) < 1.0:
        return None
    rows = sorted(pack.tables["equity_transitional_rw"][1])
    hit = [r for r in rows if str(r[0]) <= reporting_date]
    if not hit:
        return None
    _, std_rw, hr_rw = hit[-1]
    return float(std_rw), float(hr_rw)


def _equity_simple(
    equity: DataFrame, pack: RulePack, reporting_date: str | None = None
) -> DataFrame:
    # Art.155(2) net-short netting is IRB-Simple machinery: the PD/LGD
    # branch bypasses it (ref calculator.py:249-251) and the B3.1 SA
    # weights fn never calls it (ref calculator.py:775 — the call sits
    # inside _apply_equity_weights_irb_simple only)
    if pack.scalar("equity_irb_available") >= 1.0:
        equity = _net_short_ead(equity)
    else:
        equity = equity.withColumn(
            "_eq_ead", F.coalesce("market_value", F.lit(0.0))
        )
    listed = F.coalesce("is_exchange_traded", F.lit(False))
    # optional flags (absent in minimal bundles → default false)
    pe_div = (
        F.coalesce("is_diversified_pe", F.lit(False))
        if "is_diversified_pe" in equity.columns
        else F.lit(False)
    )
    spec = (
        F.coalesce("is_speculative", F.lit(False))
        if "is_speculative" in equity.columns
        else F.lit(False)
    )
    if pack.scalar("equity_irb_available") >= 1.0:
        rw = (
            F.when(pe_div, pack.lit("equity_pe_diversified_rw"))
            .when(listed, pack.lit("equity_exchange_traded_rw"))
            .otherwise(pack.lit("equity_other_rw"))
        )
        el_rate = F.when(pe_div | listed, pack.lit("equity_el_standard")).otherwise(
            pack.lit("equity_el_other")
        )
        src = F.lit("equity_irb_simple")
    else:
        rw = F.when(spec, pack.lit("equity_speculative_rw")).otherwise(
            pack.lit("equity_standard_rw")
        )
        el_rate = F.lit(0.0)
        src = F.lit("equity_sa")
    # PRA Rules 4.1-4.10 transitional floor (B3.1 pack Feature + date
    # schedule; ref calculator.py:1023-1127): final RW = max(assigned,
    # transitional), with the higher-risk leg for speculative or young
    # unlisted PE (Art.133(4); null business age is conservative) and the
    # Rule 4.2/4.3 carve-outs (central-bank holdings, subordinated debt)
    # floored at 0. Under CRR the Feature is off and this is a no-op.
    trans = _equity_transitional_schedule(pack, reporting_date)
    if trans is not None:
        std_rw, hr_rw = trans
        age_hr = (
            F.col("business_age_years").isNull()
            | (F.col("business_age_years") < 5.0)
            if "business_age_years" in equity.columns
            else F.lit(True)
        )
        is_hr = spec | (pe_div & ~listed & age_hr)
        sub = (
            F.lower(F.coalesce("equity_subtype", F.lit("")))
            if "equity_subtype" in equity.columns
            else F.lit("")
        )
        excluded = sub.isin("central_bank", "subordinated_debt")
        trans_rw = (
            F.when(excluded, F.lit(0.0))
            .when(is_hr, F.lit(hr_rw))
            .otherwise(F.lit(std_rw))
        )
        rw = F.greatest(rw, trans_rw)
        # B3.1 has no IRB equity approaches, so the COREP OF 07.00 label
        # is always the SA transitional leg (ref calculator.py:1111-1119)
        trans_approach = F.lit("sa_transitional")
        hr_flag = is_hr
    else:
        trans_rw = F.lit(None).cast("double")
        trans_approach = F.lit(None).cast("string")
        hr_flag = None
    mv = F.col("_eq_ead")
    out = equity.select(
        "exposure_reference",
        "counterparty_reference",
        F.lit("equity").alias("exposure_class"),
        F.lit("EQUITY").alias("approach"),
        mv.alias("drawn_amount"),
        F.lit(0.0).alias("undrawn_amount"),
        mv.alias("ead"),
        mv.alias("ead_after_crm"),
        F.lit(0.0).alias("provision_allocated"),
        F.lit(0.0).alias("collateral_value"),
        F.lit(0.0).alias("g_coverage"),
        rw.alias("risk_weight"),
        src.alias("rw_source"),
        (mv * rw).alias("rwa_before_sf"),
        (mv * rw).alias("rwa"),
        (mv * el_rate).alias("expected_loss"),
        (mv * el_rate).alias("el_shortfall"),
        F.lit(0.0).alias("el_excess"),
        F.lit(None).cast("double").alias("ccf"),
        F.lit(None).cast("double").alias("pd_used"),
        F.lit(None).cast("double").alias("lgd_used"),
        F.lit(None).cast("double").alias("maturity_used"),
        (mv * rw).alias("rwa_sa_equivalent"),
        # equity decomposition (ref :3042-3045): WHICH category priced the
        # holding, its weight under its own name, and the higher-risk flag
        # (≥400% — speculative/venture under either regime)
        (
            F.when(pe_div, "diversified_pe")
            .when(listed, "exchange_traded")
            .otherwise("other")
            if pack.scalar("equity_irb_available") >= 1.0
            else F.when(spec, "speculative").otherwise("standard")
        ).alias("equity_type"),
        rw.alias("equity_risk_weight"),
        # when the transitional machinery ran, the higher-risk flag is the
        # Art.133(4) determination it used (ref calculator.py:1125);
        # otherwise the ≥400% heuristic stands
        (hr_flag if hr_flag is not None else (rw >= F.lit(4.0))).alias(
            "equity_higher_risk"
        ),
        # COREP OF 07.00 rows 0371-0374 annotation + the resolved floor
        # value itself (ref calculator.py:1110-1126 equity_transitional_
        # approach carrier)
        trans_approach.alias("equity_transitional_approach"),
        trans_rw.alias("equity_transitional_rw"),
    )
    return out
