"""Classifier stage: exposure-class decision ladder (ref
engine/stages/classify/* — the 1,692-LoC case-when surface distilled to its
decision structure, driven by rulepack thresholds, not literals).

The retail threshold is a *group-level* test: total exposure of the
obligor's lending group ≤ threshold (CRR Art.123(c)). When the bundle
carries lending_mappings, the aggregate windows over
lending_group_reference with a group-of-one (per-counterparty) fallback
for unmapped obligors (CRR Art.4(1)(39); ref
engine/stages/hierarchy/enrich.py:440-530 enrich_with_lending_group —
including the null-partition guard so unmapped rows never pool together).
Without lending_mappings the org-hierarchy group is the grouping key.
Either way it is a window sum over a resolved key — no collapse, no
second join.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import ClassifiedOutput, HierarchyOutput
from rwa_calculator_spark.engine.rulepack import RulePack


def _cents_sum_over(expr, w):
    return F.sum(F.round(expr * 100.0, 0).cast("long")).over(w) / F.lit(100.0)


def run_classify(
    h: HierarchyOutput,
    pack: RulePack,
    threshold_scale: float = 1.0,
    enforce_retail_granularity: bool = False,
) -> ClassifiedOutput:
    """threshold_scale: the run's EUR→reporting conversion applied to
    EUR-based CRR monetary thresholds (ref engine/thresholds.py — "CRR
    thresholds are EUR base × rate; Basel 3.1 thresholds are native").
    1.0 when the pack's thresholds_fx_derived Feature is off or no EUR
    rate is supplied."""
    exp = h.exposures
    amount = F.col("drawn_amount") + F.col("undrawn_amount")

    if "lending_group_reference" in exp.columns:
        w_lg = W.partitionBy("lending_group_reference")
        w_cp = W.partitionBy("counterparty_reference")
        # null-partition guard: rows with no lending group fall back to the
        # obligor's own aggregate rather than pooling in the null bucket
        total_exposure = F.when(
            F.col("lending_group_reference").isNotNull(), _cents_sum_over(amount, w_lg)
        ).otherwise(_cents_sum_over(amount, w_cp))
        group_drawn = F.when(
            F.col("lending_group_reference").isNotNull(),
            _cents_sum_over(F.col("drawn_amount"), w_lg),
        ).otherwise(_cents_sum_over(F.col("drawn_amount"), w_cp))
    else:
        w_grp = W.partitionBy("group_reference")
        total_exposure = _cents_sum_over(amount, w_grp)
        group_drawn = _cents_sum_over(F.col("drawn_amount"), w_grp)
    # group total + group DRAWN total — the CRR2 Art.501 SME-factor tier
    # base (E*: drawn owed by the group of connected clients; ref
    # supporting_factors.py compute_e_star_group_drawn) — one projection
    exp = exp.withColumns(
        {"group_exposure": total_exposure, "group_drawn": group_drawn}
    )

    retail_candidate = (F.col("entity_type") == "individual") | F.col(
        "is_managed_as_retail"
    )
    is_retail = retail_candidate & (
        F.col("group_exposure") <= pack.lit("retail_threshold") * F.lit(threshold_scale)
    )
    # PS1/26 Art.123A(1)(b)(ii) / BCBS CRE20.66 granularity limb: no single
    # obligor's aggregate may exceed 0.2% of the regulatory-retail
    # portfolio (ref classify/attributes.py _build_qualifies_as_retail_expr
    # granularity_fail). Gated on the caller flag — OFF by default, the
    # reference's own config.enforce_retail_granularity suppression under
    # CRE20.66's national-discretion clause — and on the pack feature (the
    # CRR has no granularity limb). The portfolio total is ONE scalar agg
    # (each group counted once via its row count) broadcast back; the
    # per-row test stays codegen-resident.
    if enforce_retail_granularity and "retail_granularity_limit" in pack.scalars:
        _grp_key = F.coalesce(F.col("group_reference"), F.col("counterparty_reference"))
        _nrows = F.count(F.lit(1)).over(W.partitionBy(_grp_key))
        _contrib = F.when(
            retail_candidate, F.col("group_exposure") / _nrows
        ).otherwise(F.lit(0.0))
        _tot = (
            exp.withColumn("_g_contrib", _contrib)
            .agg(
                (
                    F.sum(F.round(F.col("_g_contrib") * 100.0, 0).cast("long"))
                    / 100.0
                ).alias("_retail_portfolio_total")
            )
        )
        exp = (
            exp.crossJoin(F.broadcast(_tot))
            .withColumn(
                "retail_granularity_applied",
                retail_candidate
                & (F.col("_retail_portfolio_total") > 0)
                & (
                    F.col("group_exposure") / F.col("_retail_portfolio_total")
                    > pack.lit("retail_granularity_limit")
                ),
            )
            .drop("_retail_portfolio_total")
        )
        is_retail = is_retail & ~F.col("retail_granularity_applied")
        gran_applied = F.col("retail_granularity_applied")
    else:
        gran_applied = F.lit(False)
    # ledger carrier (ref CALCULATION_OUTPUT_SCHEMA retail_threshold_applied):
    # true where the Art.123 aggregate-exposure test DECIDED the class —
    # the row was a retail candidate, so passing/failing the threshold is
    # what routed it; false for rows the test never touched
    exp = exp.withColumn(
        "retail_threshold_applied", F.coalesce(retail_candidate, F.lit(False))
    )

    # CRR Art.4(1)(128D) / 2003/361/EC Art.2(1) SME size test (ref
    # classify/attributes.py:470-497 is_sme_by_size_expr): SME on EITHER
    # criterion — turnover below the cap, or (where turnover is absent)
    # balance-sheet total below ITS cap; zero/absent on both → False. EUR
    # caps scale with the run's EUR rate exactly like the retail
    # threshold. Sealed as a ledger carrier and consumed by the Art.124L
    # counterparty-type table in the calculators RE block.
    turnover = (
        F.coalesce(F.col("annual_revenue"), F.lit(0.0))
        if "annual_revenue" in exp.columns
        else F.lit(0.0)
    )
    assets = (
        F.coalesce(F.col("total_assets"), F.lit(0.0))
        if "total_assets" in exp.columns
        else F.lit(0.0)
    )
    scale = F.lit(threshold_scale)
    is_sme = F.when(
        turnover > 0, turnover < pack.lit("sme_revenue_cap") * scale
    ).otherwise(
        (assets > 0) & (assets < pack.lit("sme_balance_sheet_cap") * scale)
    )
    exp = exp.withColumn("is_sme", F.coalesce(is_sme, F.lit(False)))
    # the Art.123 qualification OUTCOME — distinct from
    # retail_threshold_applied (which records that the test ran); the
    # Art.124L(a) retail-qualifying-SME limb keys on it.
    # Under B3.1 the attribute takes the full Art.123A two-path form (ref
    # classify/attributes.py _build_qualifies_as_retail_expr): threshold
    # fail disqualifies; SMEs then AUTO-qualify by the Art.4(1)(128D) size
    # test with no pool attestation (limb (a)) and skip the granularity
    # limb; non-SMEs fail on the granularity cap or on an explicit
    # managed-as-retail=False (null KEEPS qualification — the reference's
    # documented backward-compatible default); everything else qualifies.
    # CRR keeps the plain Art.123 outcome (candidate AND under-threshold).
    # The retail CLASS route (is_retail) is unchanged in both regimes —
    # corporate->retail reclassification still needs the managed-as-retail
    # attestation, mirroring the reference's reclassify_corporate_to_retail.
    if pack.scalars.get("retail_art_123a_two_path") is not None and pack.scalar(
        "retail_art_123a_two_path"
    ) >= 1.0:
        _managed = (
            F.col("is_managed_as_retail")
            if "is_managed_as_retail" in exp.columns
            else F.lit(None).cast("boolean")
        )
        _under = F.col("group_exposure") <= pack.lit("retail_threshold") * F.lit(
            threshold_scale
        )
        q123a = (
            F.when(~_under, F.lit(False))
            .when(F.col("is_sme"), F.lit(True))
            .when(gran_applied, F.lit(False))
            .when(~F.coalesce(_managed, F.lit(True)), F.lit(False))
            .otherwise(F.lit(True))
        )
        exp = exp.withColumn("qualifies_as_retail", q123a)
    else:
        exp = exp.withColumn(
            "qualifies_as_retail", F.coalesce(is_retail, F.lit(False))
        )
    # ref CALCULATION_OUTPUT_SCHEMA retail_eligible_via_group: the Art.123
    # aggregate ran over a CONNECTED-CLIENTS base (a lending group, or a
    # resolved parent group beyond the obligor itself), not just the
    # obligor's own book
    _grp_base = F.lit(False)
    if "lending_group_reference" in exp.columns:
        _grp_base = _grp_base | F.col("lending_group_reference").isNotNull()
    if "group_reference" in exp.columns:
        _grp_base = _grp_base | (
            F.col("group_reference") != F.col("counterparty_reference")
        )
    exp = exp.withColumn(
        "retail_eligible_via_group",
        F.col("qualifies_as_retail") & F.coalesce(_grp_base, F.lit(False)),
    )

    # property-secured carrier: a loan declared secured on real estate
    # routes to the RE class directly (ref data/schemas.py
    # crr_exposure_class 'secured_by_mortgages' — the loader-declared
    # class; the collateral-driven Art.124(2) split in re_split.py remains
    # the route for books that declare RE via collateral links instead)
    prop = (
        F.coalesce(F.col("is_property_secured"), F.lit(False))
        if "is_property_secured" in exp.columns
        else F.lit(False)
    )
    subdebt = (
        F.coalesce(F.col("is_subordinated_debt"), F.lit(False))
        if "is_subordinated_debt" in exp.columns
        and "subordinated_debt_rw" in pack.scalars
        else F.lit(False)
    )
    highrisk = (
        F.coalesce(F.col("is_high_risk"), F.lit(False))
        if "is_high_risk" in exp.columns
        else F.lit(False)
    )
    # PS1/26 Art.114(2A) (B3.1-feature-gated; ref engine/sa/central_bank.py
    # lift_central_bank_cqs): an UNRATED central bank reads across its
    # government's ECAI assessment — the sovereign_cqs carrier the Art.121
    # sovereign-derived institution path already consumes
    if (
        pack.scalar("central_bank_uses_sovereign_cqs") >= 1.0
        and "sovereign_cqs" in exp.columns
    ):
        exp = exp.withColumn(
            "cqs",
            F.when(
                (F.col("entity_type") == "central_bank")
                & F.col("cqs").isNull(),
                F.col("sovereign_cqs"),
            ).otherwise(F.col("cqs")),
        )
    cls = (
        F.when(F.col("exposure_type") == "securitisation_pool", "securitisation")
        .when(F.col("entity_type") == "sovereign", "sovereign")
        # CRR Art.114(2): central banks sit on the SAME central-government
        # ladder (ref engine/sa/central_bank.py — 'central_bank_ecb' is
        # the documented data convention for the supranational ECB, whose
        # Art.114(3) unconditional 0% the SA calculator overrides)
        .when(
            F.col("entity_type").isin("central_bank", "central_bank_ecb"),
            "sovereign",
        )
        # CRR Art.115(2)/(4): RGLAs on the equivalence lists are "treated
        # as exposures to the central government" — priced on the Art.114
        # CGCB ladder, NOT pinned to 0% (ref engine/sa/rgla.py: 0% only
        # arrives via Table 1 at CQS1)
        .when(F.col("entity_type") == "rgla_sovereign", "sovereign")
        # Art.115(1): every other RGLA is its own class — own-rating Table
        # 1B / sovereign-derived Table 1A / the (5) sterling-domestic 20%
        # (ref engine/sa/rgla.py; was flattened to the institution
        # treatment through round 7 — Table 1B equals the CRR institution
        # ladder, but diverges from the B3.1 Table 3 at CQS2)
        .when(F.col("entity_type") == "rgla", "rgla")
        .when(F.col("entity_type") == "institution", "institution")
        # CRR Art.107(2)(a): exposures to a CCP take the institution
        # treatment as their CLASS — qualifying CCPs then price their
        # trade exposures at the Art.306(1) 2%/4% override in run_sa,
        # non-qualifying CCPs stay on the institution ladder (ref
        # engine/sa/cqs_lift.py lift_institution_cqs + ccr/ccp.py)
        .when(F.col("entity_type") == "ccp", "institution")
        # CRR Art.116: public sector entities are their own class — priced
        # on the sovereign-derived Table 2 / own-rating Table 2A / the (3)
        # short-term 20% / the (5) non-equivalent-jurisdiction 100%
        .when(F.col("entity_type") == "pse", "pse")
        # CRR Art.117: multilateral development banks ('mdb_named' = the
        # Art.117(2) zero-weight list, the documented data convention)
        .when(F.col("entity_type").isin("mdb", "mdb_named"), "mdb")
        # CRR Art.118: international organisations, unconditional 0%
        .when(
            F.col("entity_type") == "international_organisation",
            "international_organisation",
        )
        # Art.112 Table A2 rows 3-4 (ref risk_weights.py priority note):
        # subordinated debt then high-risk items sit ABOVE the RE route and
        # the retail test. The sub-debt class exists only where the pack
        # prices it (PS1/26 Art.133A — B3.1); the high-risk class is a
        # property of the exposure in BOTH regimes, but only the B3.1 pack
        # carries the Art.128 150% branch — UK CRR omitted Art.128
        # (SI 2021/1078), so CRR high-risk rows price through the residual
        # 100% AND keep their Table A2 precedence over the defaulted rule
        .when(subdebt, "subordinated_debt")
        .when(highrisk, "high_risk")
        # the RE route sits BELOW the entity-type gates: only the
        # corporate/retail/individual book reclassifies on property
        # security — a property-secured loan to a sovereign stays on the
        # Art.114 ladder (the reference only flags RE reclassification
        # candidates out of the corporate/retail book; ADVICE r5)
        .when(prop, "re_secured")
        .when(is_retail, "retail")
        .otherwise("corporate")
    )
    # classification reason code — the WHICH-branch-fired audit carrier the
    # reference's 162-col ledger records per exposure (ref
    # data/schemas.py:2877 classification provenance; same ladder order as
    # `cls`, so reason and class can never disagree)
    reason = (
        F.when(F.col("exposure_type") == "securitisation_pool", "CLS_SEC_POOL")
        .when(F.col("entity_type") == "sovereign", "CLS_ENTITY_SOVEREIGN")
        .when(F.col("entity_type") == "central_bank_ecb", "CLS_ENTITY_ECB")
        .when(F.col("entity_type") == "central_bank", "CLS_ENTITY_CENTRAL_BANK")
        .when(F.col("entity_type") == "rgla_sovereign", "CLS_RGLA_EQUIVALENCE")
        .when(F.col("entity_type") == "rgla", "CLS_RGLA_ART115")
        .when(F.col("entity_type") == "institution", "CLS_ENTITY_INSTITUTION")
        .when(F.col("entity_type") == "ccp", "CLS_ENTITY_CCP_ART107")
        .when(F.col("entity_type") == "pse", "CLS_ENTITY_PSE")
        .when(F.col("entity_type").isin("mdb", "mdb_named"), "CLS_ENTITY_MDB")
        .when(
            F.col("entity_type") == "international_organisation",
            "CLS_ENTITY_IO",
        )
        .when(subdebt, "CLS_SUBORDINATED_DEBT")
        .when(highrisk, "CLS_HIGH_RISK")
        .when(prop, "CLS_PROPERTY_SECURED")
        .when(
            is_retail & (F.col("entity_type") == "individual"), "CLS_RETAIL_INDIVIDUAL"
        )
        .when(is_retail, "CLS_RETAIL_MANAGED")
        # over-threshold would-be retail is its own reason: the Art.123(c)
        # group test failing is the single most-asked "why is this
        # corporate?" lineage question
        .when(gran_applied, "CLS_RETAIL_GRANULARITY")
        .when(
            (F.col("entity_type") == "individual") | F.col("is_managed_as_retail"),
            "CLS_RETAIL_OVER_THRESHOLD",
        )
        .otherwise("CLS_CORPORATE_RESIDUAL")
    )
    return ClassifiedOutput(
        exposures=exp.withColumns(
            {"exposure_class": cls, "class_reason": reason}
        )
    )
