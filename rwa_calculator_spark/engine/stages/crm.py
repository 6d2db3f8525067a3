"""CRM stage: EAD (CCF), collateral FCCM with supervisory haircuts and
pro-rata link allocation, guarantee substitution
(ref engine/ccf.py, engine/crm/{haircuts,collateral,link_allocation,
guarantees}.py — the 3,000-LoC CRM surface reduced to its dataflow shapes,
parameterised by the rulepack).

Shapes and their scale posture:
- CCF: broadcast lookup join on risk_bucket (rulepack table);
- link allocation: one collateral item split across beneficiary exposures
  pro-rata by exposure EAD — window sum denominator, no collapse;
- FCCM: E* = max(0, EAD − Σ allocated collateral × (1 − haircut));
- guarantees: covered portion takes min(own RW, guarantor RW) downstream
  (the guarantee columns ride along to the SA stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.bundles import ClassifiedOutput, CRMOutput, RawBundle
from rwa_calculator_spark.engine.rulepack import RulePack


def _resolve_provisions(
    exp: DataFrame,
    provisions: DataFrame,
    facility_mappings: DataFrame | None = None,
) -> DataFrame:
    """Multi-level provision allocation (ref engine/crm/provisions.py:37-110
    resolve_provisions + kernels/allocation.py allocate_multi_level):

    1. direct — beneficiary_reference names the exposure: full amount;
    2. facility — beneficiary names a facility: cascades over the named
       facility's DESCENDANT subtree (closure over facility edges), pro-rata
       by the CCF-weighted basis of member exposures;
    3. counterparty — beneficiary names the obligor: pro-rata over the
       obligor's exposures.

    The allocation basis is clip(drawn, 0) + CCF·undrawn (the reference's
    CCF-weighted basis — an unclipped negative drawn would give a sibling
    >100% of the pot). Provision rows with a null/unknown beneficiary_type
    are DROPPED, not defaulted to direct (ref provisions.py typed-row
    filter). Levels combine additively into provision_allocated."""
    if "beneficiary_type" in provisions.columns:
        btype = F.when(
            F.col("beneficiary_type").isin("loan", "exposure", "contingent", "direct"),
            "direct",
        ).when(F.col("beneficiary_type").isin("facility", "counterparty"), F.col("beneficiary_type"))
    else:
        btype = F.lit("direct")
    # per-type split + applied-provision identity carriers (ref
    # CALCULATION_OUTPUT_SCHEMA :3005-3007 provision_references /
    # scra_provision_amount / gcra_provision_amount; provision_type domain
    # schemas.py:2144 {scra, gcra}): a typed amount rides the SAME
    # allocation fractions as the total (one extra conditional sum per
    # level, no new shuffle); an undeclared type counts as SCRA (specific)
    # — the conservative reading, since only specific provisions reduce
    # the SA exposure value under Art.110/111(2)
    ptype = (
        F.lower(F.coalesce("provision_type", F.lit("scra")))
        if "provision_type" in provisions.columns
        else F.lit("scra")
    )
    pref = (
        F.col("provision_reference")
        if "provision_reference" in provisions.columns
        else F.lit(None).cast("string")
    )
    items = (
        provisions.select(
            "beneficiary_reference",
            btype.alias("_lvl"),
            F.coalesce("amount", F.lit(0.0)).alias("_amt"),
            F.when(ptype == "gcra", F.coalesce("amount", F.lit(0.0)))
            .otherwise(F.lit(0.0))
            .alias("_amt_g"),
            pref.alias("_pref"),
        )
        .where(F.col("_lvl").isNotNull())
    )
    per_level = items.groupBy("_lvl", "beneficiary_reference").agg(
        F.sum("_amt").alias("_prov"),
        F.sum("_amt_g").alias("_prov_g"),
        F.sort_array(F.collect_set("_pref")).alias("_prefs"),
    )

    # CCF-weighted allocation basis, drawn clipped at zero
    basis = F.greatest(F.col("drawn_amount"), F.lit(0.0)) + F.col("ccf") * F.col(
        "undrawn_amount"
    )
    exp = exp.withColumn("_basis", basis)

    # direct: full amount onto the named exposure
    direct = per_level.where(F.col("_lvl") == "direct").select(
        F.col("beneficiary_reference").alias("exposure_reference"),
        F.col("_prov").alias("_prov_direct"),
        F.col("_prov_g").alias("_prov_direct_g"),
        F.col("_prefs").alias("_prefs_direct"),
    )
    exp = exp.join(F.broadcast(direct), "exposure_reference", "left")

    # counterparty: pro-rata by basis within the obligor
    cp = per_level.where(F.col("_lvl") == "counterparty").select(
        F.col("beneficiary_reference").alias("counterparty_reference"),
        F.col("_prov").alias("_prov_cp_total"),
        F.col("_prov_g").alias("_prov_cp_total_g"),
        F.col("_prefs").alias("_prefs_cp"),
    )
    exp = exp.join(F.broadcast(cp), "counterparty_reference", "left")
    w_cp = W.partitionBy("counterparty_reference")
    cp_denom = F.sum(F.round(F.col("_basis") * 100.0, 0).cast("long")).over(w_cp) / F.lit(
        100.0
    )
    _cp_share = F.col("_basis") / cp_denom
    prov_cp = F.when(
        F.col("_prov_cp_total").isNotNull() & (cp_denom > 0),
        F.col("_prov_cp_total") * _cp_share,
    ).otherwise(F.lit(0.0))
    prov_cp_g = F.when(
        F.col("_prov_cp_total_g").isNotNull() & (cp_denom > 0),
        F.col("_prov_cp_total_g") * _cp_share,
    ).otherwise(F.lit(0.0))

    # facility: cascade the named beneficiary over its descendant facility
    # subtree (ref provisions.py facility cascade), then pro-rata across
    # every exposure whose direct parent is in that subtree. Computed as a
    # side aggregate at (provision × member-exposure) grain so overlapping
    # subtrees sum instead of duplicating exposure rows.
    if "parent_facility_reference" in exp.columns:
        fac_prov = per_level.where(F.col("_lvl") == "facility").select(
            F.col("beneficiary_reference").alias("_ben"),
            F.col("_prov").alias("_prov_fac"),
            F.col("_prov_g").alias("_prov_fac_g"),
            F.col("_prefs").alias("_prefs_fac"),
        )
        if facility_mappings is not None:
            from rwa_calculator_spark.operators.graph import ancestor_closure_iterative

            fac_edges = facility_mappings.where(
                F.col("child_type") == "facility"
            ).select(
                F.col("child_reference").alias("child"),
                F.col("parent_facility_reference").alias("parent"),
            )
            closure = (
                ancestor_closure_iterative(fac_edges)
                .select(
                    F.col("ancestor").alias("_cl_ben"),
                    F.col("descendant").alias("_cl_fac"),
                )
                .dropDuplicates(["_cl_ben", "_cl_fac"])
            )
            expand = fac_prov.join(
                F.broadcast(closure), fac_prov._ben == F.col("_cl_ben"), "left"
            ).select(
                "_ben",
                "_prov_fac",
                "_prov_fac_g",
                "_prefs_fac",
                F.coalesce("_cl_fac", F.col("_ben")).alias("_fac_ref"),
            )
        else:
            expand = fac_prov.select(
                "_ben", "_prov_fac", "_prov_fac_g", "_prefs_fac",
                F.col("_ben").alias("_fac_ref"),
            )
        members = exp.select(
            "exposure_reference",
            F.col("parent_facility_reference").alias("_pfac"),
            F.col("_basis").alias("_mbasis"),
        ).where(F.col("_pfac").isNotNull())
        matched = members.join(
            F.broadcast(expand), members._pfac == F.col("_fac_ref"), "inner"
        )
        w_ben = W.partitionBy("_ben")
        ben_denom = F.sum(
            F.round(F.col("_mbasis") * 100.0, 0).cast("long")
        ).over(w_ben) / F.lit(100.0)
        _fac_share = F.col("_mbasis") / ben_denom
        alloc = matched.withColumn(
            "_alloc",
            F.when(ben_denom > 0, F.col("_prov_fac") * _fac_share).otherwise(
                F.lit(0.0)
            ),
        ).withColumn(
            "_alloc_g",
            F.when(ben_denom > 0, F.col("_prov_fac_g") * _fac_share).otherwise(
                F.lit(0.0)
            ),
        )
        per_exp_fac = alloc.groupBy("exposure_reference").agg(
            F.sum("_alloc").alias("_prov_fac_alloc"),
            F.sum("_alloc_g").alias("_prov_fac_alloc_g"),
            # a facility pot only NAMES its provisions where it actually
            # allocated an amount to this exposure (same allocated>0 gate
            # as the counterparty level) — collect_list drops the nulls
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.when(F.col("_alloc") > 0, F.col("_prefs_fac"))
                    )
                )
            ).alias("_prefs_fac_all"),
            # which facility pot the allocation was inherited from (min =
            # deterministic when several pots contribute)
            F.min(F.when(F.col("_alloc") > 0, F.col("_ben"))).alias(
                "_prov_fac_src"
            ),
        )
        exp = exp.join(per_exp_fac, "exposure_reference", "left")
        prov_fac = F.coalesce("_prov_fac_alloc", F.lit(0.0))
        prov_fac_g = F.coalesce("_prov_fac_alloc_g", F.lit(0.0))
        prefs_fac = F.col("_prefs_fac_all")
        prov_fac_src = F.col("_prov_fac_src")
    else:
        prov_fac = F.lit(0.0)
        prov_fac_g = F.lit(0.0)
        prefs_fac = F.lit(None).cast("array<string>")
        prov_fac_src = F.lit(None).cast("string")

    # per-type ledger carriers: GCRA rides the allocation fractions, SCRA
    # is the exact complement (so scra + gcra ≡ provision_allocated);
    # provision_references unions the applied provisions of all three
    # levels — sorted + duplicate-free, deterministic under shuffle.
    # provenance carriers (ref schemas.py:2927-2928): the first
    # contributing level in direct → facility → counterparty priority, and
    # the entity an inherited allocation came from (null when direct).
    # scra reuses the provision_allocated/gcra Column objects (identical
    # arithmetic DAG), so the whole block is one batched projection.
    prov_all = F.coalesce("_prov_direct", F.lit(0.0)) + prov_fac + prov_cp
    gcra = F.coalesce("_prov_direct_g", F.lit(0.0)) + prov_fac_g + prov_cp_g
    _empty = F.array().cast("array<string>")
    _pd_amt = F.coalesce("_prov_direct", F.lit(0.0))
    exp = exp.withColumns(
        {
            "provision_allocated": prov_all,
            "gcra_provision_amount": gcra,
            "scra_provision_amount": prov_all - gcra,
            "provision_references": F.sort_array(
                F.array_distinct(
                    F.concat(
                        F.when(
                            F.coalesce("_prov_direct", F.lit(0.0)) > 0,
                            F.coalesce("_prefs_direct", _empty),
                        ).otherwise(_empty),
                        F.coalesce(prefs_fac, _empty),
                        F.when(
                            prov_cp > 0, F.coalesce("_prefs_cp", _empty)
                        ).otherwise(_empty),
                    )
                )
            ),
            "provision_source_level": F.when(_pd_amt > 0, "exposure")
            .when(prov_fac > 0, "facility")
            .when(prov_cp > 0, "counterparty"),
            "provision_inherited_from": F.when(
                _pd_amt > 0, F.lit(None).cast("string")
            )
            .when(prov_fac > 0, prov_fac_src)
            .when(prov_cp > 0, F.col("counterparty_reference")),
        }
    )
    return exp.drop(
        "_basis", "_prov_direct", "_prov_cp_total", "_prov_fac_alloc",
        "_prov_direct_g", "_prov_cp_total_g", "_prov_fac_alloc_g",
        "_prefs_direct", "_prefs_cp", "_prefs_fac_all", "_prov_fac_src",
    )


_OFCP_TYPES = ("life_insurance", "third_party_deposit")


def _expand_guarantee_beneficiaries(
    g_src: DataFrame, exp: DataFrame, raw: RawBundle
) -> DataFrame:
    """Multi-level guarantee resolution (closes the recorded round-7
    narrowing — guarantees now cascade down the facility tree and pool over
    the obligor, mirroring the collateral/provision kernels; ref
    engine/crm/guarantees.py:594-655 _expand_guarantee_beneficiaries):

    1. direct (beneficiary_type null/loan/exposure/contingent/direct) —
       beneficiary names the exposure; coverage unchanged;
    2. facility — the guarantee cascades over the named facility's whole
       descendant subtree (same closure kernel as collateral/provisions);
       a DECLARED % passes through unchanged (it applies equally to each
       child's EAD, ref guarantees.py:602-604), an amount allocates
       pro-rata by ead_after_collateral — which folds to the uniform
       fraction amount/Σead per member;
    3. counterparty — pools over the obligor's exposures, same semantics.

    Every expanded row carries WHERE it came from (_g_src_level /
    _g_src_ref) for the guarantee provenance carriers. All expansion joins
    broadcast the SMALL guarantee/closure/denominator side; the exposure
    fact never shuffles — the only aggregations are map-side-combinable
    groupBys that collapse to facility-/counterparty-dim results."""
    from rwa_calculator_spark.functions.exact import scaled_sum

    _gnull = F.lit(None).cast("string")
    cols = g_src.columns
    gb = g_src.withColumn(
        "_gbt", F.lower(F.coalesce(F.col("beneficiary_type"), F.lit("exposure")))
    )
    ben = F.col("beneficiary_reference") if "beneficiary_reference" in cols else _gnull
    exp_ref = (
        F.coalesce(F.col("exposure_reference"), ben)
        if "exposure_reference" in cols
        else ben
    )
    attrs = [
        c
        for c in cols
        if c not in ("exposure_reference", "beneficiary_type", "beneficiary_reference")
    ]
    # narrow membership projection, materialised once: the cascade joins
    # must not re-embed the full exposure lineage into the stage plan
    has_fac = "parent_facility_reference" in exp.columns
    mem_cols = [
        F.col("exposure_reference").alias("_m_exp"),
        F.col("counterparty_reference").alias("_m_cp"),
        F.col("ead_after_collateral").alias("_m_ead"),
    ]
    if has_fac:
        mem_cols.append(F.col("parent_facility_reference").alias("_m_pfac"))
    mem = exp.select(*mem_cols).localCheckpoint()

    direct_g = gb.where(~F.col("_gbt").isin("facility", "counterparty")).withColumn(
        "_g_exp", exp_ref
    )
    parts = [
        mem.join(F.broadcast(direct_g), F.col("_m_exp") == F.col("_g_exp")).select(
            *attrs,
            F.col("_m_exp").alias("exposure_reference"),
            F.lit("exposure").alias("_g_src_level"),
            _gnull.alias("_g_src_ref"),
            F.col("_m_ead").alias("_gden"),
        )
    ]

    if has_fac:
        fac_g = gb.where(F.col("_gbt") == "facility").withColumn("_g_ben", ben)
        fset = fac_g.select(F.col("_g_ben").alias("_gf")).distinct()
        if raw.facility_mappings is not None:
            from rwa_calculator_spark.operators.graph import ancestor_closure_iterative

            fac_edges = raw.facility_mappings.where(
                F.col("child_type") == "facility"
            ).select(
                F.col("child_reference").alias("child"),
                F.col("parent_facility_reference").alias("parent"),
            )
            closure = (
                ancestor_closure_iterative(fac_edges)
                .select(
                    F.col("ancestor").alias("_gf_anc"),
                    F.col("descendant").alias("_gf_desc"),
                )
                .dropDuplicates(["_gf_anc", "_gf_desc"])
                # facility-dim sized — keep the closure's union-join plan
                # out of the wide exposure tree
                .localCheckpoint()
            )
            fmap = fset.join(
                F.broadcast(closure), F.col("_gf") == F.col("_gf_anc"), "left"
            ).select("_gf", F.coalesce("_gf_desc", F.col("_gf")).alias("_gfd"))
        else:
            fmap = fset.withColumn("_gfd", F.col("_gf"))
        memf = mem.where(F.col("_m_pfac").isNotNull()).join(
            F.broadcast(fmap), F.col("_m_pfac") == F.col("_gfd")
        )
        # pro-rata denominator = Σ ead_after_collateral over the subtree;
        # per-FACILITY (not per guarantee row), so two guarantees pledged
        # at the same facility share one membership sum. Map-side partial
        # agg collapses to a facility-dim frame — broadcast back.
        denf = memf.groupBy("_gf").agg(scaled_sum(F.col("_m_ead"), 2).alias("_gden"))
        parts.append(
            memf.join(F.broadcast(denf), "_gf")
            .join(F.broadcast(fac_g), F.col("_gf") == F.col("_g_ben"))
            .select(
                *attrs,
                F.col("_m_exp").alias("exposure_reference"),
                F.lit("facility").alias("_g_src_level"),
                F.col("_g_ben").alias("_g_src_ref"),
                F.col("_gden"),
            )
        )

    cp_g = gb.where(F.col("_gbt") == "counterparty").withColumn("_g_ben", ben)
    memc = mem.join(
        F.broadcast(cp_g.select(F.col("_g_ben").alias("_gc")).distinct()),
        F.col("_m_cp") == F.col("_gc"),
    )
    denc = memc.groupBy("_gc").agg(scaled_sum(F.col("_m_ead"), 2).alias("_gden"))
    parts.append(
        memc.join(F.broadcast(denc), "_gc")
        .join(F.broadcast(cp_g), F.col("_gc") == F.col("_g_ben"))
        .select(
            *attrs,
            F.col("_m_exp").alias("exposure_reference"),
            F.lit("counterparty").alias("_g_src_level"),
            F.col("_g_ben").alias("_g_src_ref"),
            F.col("_gden"),
        )
    )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)

    # final coverage: declared % wins; an amount-based guarantee derives
    # the uniform fraction amount/denominator (per-member pro-rata amount
    # divided by the member's own EAD), capped at full coverage
    pct = (
        F.col("coverage_pct")
        if "coverage_pct" in attrs
        else F.lit(None).cast("double")
    )
    amt_cols = [c for c in ("guarantee_amount", "amount") if c in attrs]
    if amt_cols:
        amt = F.coalesce(*[F.col(c) for c in amt_cols])
        derived = F.least(
            amt / F.nullif(F.col("_gden"), F.lit(0.0)), F.lit(1.0)
        )
        out = out.withColumn("coverage_pct", F.coalesce(pct, derived, F.lit(0.0)))
    else:
        out = out.withColumn("coverage_pct", F.coalesce(pct, F.lit(0.0)))
    return out.drop("_gden", "_gbt", "_g_exp", "_g_ben")


def _allocate_items(exp: DataFrame, items: DataFrame, links: DataFrame):
    """Pro-rata allocation of item values across linked exposures by EAD,
    returning per-exposure (value total, value-weighted item RW) — the
    kernels/allocation.py shape shared by every funded-protection channel.
    items: (collateral_reference, _val, _item_rw)."""
    linked = links.join(
        exp.select("exposure_reference", "ead"), "exposure_reference"
    ).join(F.broadcast(items), "collateral_reference")
    wcoll = W.partitionBy("collateral_reference")
    denom = F.sum(F.round(F.col("ead") * 100.0, 0).cast("long")).over(wcoll) / F.lit(100.0)
    allocated = linked.withColumn(
        "_alloc_val",
        F.col("_val") * (F.col("ead") / F.nullif(denom, F.lit(0.0))),
    )
    return allocated.groupBy("exposure_reference").agg(
        F.sum("_alloc_val").alias("_ch_value"),
        (
            F.sum(F.col("_alloc_val") * F.col("_item_rw"))
            / F.nullif(F.sum("_alloc_val"), F.lit(0.0))
        ).alias("_ch_rw"),
    )


def _join_issuer_rw(df: DataFrame, pack: RulePack, cls_col, cqs_col, out: str) -> DataFrame:
    """Broadcast sa_rw lookup: (issuer class, CQS) → SA risk weight."""
    spark = df.sparkSession
    tbl = pack.table_df(spark, "sa_rw").select(
        F.col("exposure_class").alias("_irw_cls"),
        F.col("cqs").alias("_irw_cqs"),
        F.col("rw").alias(out),
    )
    return df.join(
        F.broadcast(tbl),
        (cls_col == F.col("_irw_cls"))
        & (F.coalesce(cqs_col.cast("int"), F.lit(0)) == F.col("_irw_cqs")),
        "left",
    ).drop("_irw_cls", "_irw_cqs")


def run_crm(
    raw: RawBundle,
    c: ClassifiedOutput,
    pack: RulePack,
    collateral_method: str = "comprehensive",
) -> CRMOutput:
    spark = c.exposures.sparkSession
    exp = c.exposures

    # CCF joins FIRST: the provision allocation basis is CCF-weighted
    # (ref engine/ccf.py + provisions.py basis)
    ccf = pack.broadcast_table(spark, "ccf")
    exp = exp.join(ccf, "risk_bucket", "left").withColumns(
        {
            # ledger carrier (ref CALCULATION_OUTPUT_SCHEMA ccf_source):
            # WHICH rule set the factor — both expressions read the joined
            # (pre-coalesce) ccf, so one batched projection preserves the
            # read-before-the-coalesce-erases-the-miss ordering
            "ccf_source": F.when(
                F.col("ccf").isNotNull(), F.lit("sa_annex_i_bucket")
            ).otherwise(F.lit("default_full_conversion")),
            "ccf": F.coalesce("ccf", F.lit(1.0)),
        }
    )

    # CRR Annex I items 2(b)/3(b): "other commitments" split on ORIGINAL
    # maturity — the conservative 50% MR default drops to 20% only when an
    # original-maturity source exists at or below one year (ref
    # engine/ccf.py _apply_oc_original_maturity_ccf). Carrier-gated: a
    # bundle without the column keeps the flat Annex I rates.
    if (
        pack.scalar("sa_oc_maturity_split") >= 1.0
        and "original_maturity_years" in exp.columns
    ):
        oc_short = F.col("original_maturity_years").isNotNull() & (
            F.col("original_maturity_years") * F.lit(365.0) <= F.lit(365.0)
        )
        # SA rows only: the Art.166(10) F-IRB fallback states its own flat
        # 50%/20% rates with no maturity split
        sa_row = ~(F.col("has_irb_permission") & ~F.col("is_specialised"))
        oc_fires = sa_row & (F.col("risk_bucket") == "medium_risk") & oc_short
        exp = exp.withColumns(
            {
                "ccf": F.when(
                    oc_fires, pack.lit("oc_short_maturity_ccf")
                ).otherwise(F.col("ccf")),
                "ccf_source": F.when(
                    oc_fires, F.lit("oc_annex_i_short_maturity")
                ).otherwise(F.col("ccf_source")),
            }
        )

    # CRR Art.166(8)/(10): F-IRB CCFs for IRB-routed rows (ref
    # engine/ccf.py _firb_ccf_for_col) — 75% for commitments / credit
    # lines / NIFs / RUFs, the 20% short-term trade-LC carve-out winning
    # over the commitment split, Annex I fallback (= the SA table already
    # joined) for issued items; FR 100% and LR 0% converge under either
    # clause. Carrier-gated on is_obs_commitment (the reference's
    # crm-exit sentinel column), so bundles without the commitment split
    # keep Annex I CCFs on every row.
    if (
        pack.scalar("firb_ccf_bespoke") >= 1.0
        and "is_obs_commitment" in exp.columns
    ):
        irb_row = F.col("has_irb_permission") & ~F.col("is_specialised")
        commitment = F.coalesce("is_obs_commitment", F.lit(True))
        trade_lc = (
            F.coalesce("is_short_term_trade_lc", F.lit(False))
            if "is_short_term_trade_lc" in exp.columns
            else F.lit(False)
        )
        firb_ccf = (
            F.when(
                (F.col("risk_bucket") == "medium_low_risk") & trade_lc,
                pack.lit("firb_trade_lc_ccf"),
            )
            .when(
                commitment
                & F.col("risk_bucket").isin("medium_risk", "medium_low_risk"),
                pack.lit("firb_credit_line_ccf"),
            )
            .otherwise(F.col("ccf"))
        )
        firb_src = (
            F.when(
                (F.col("risk_bucket") == "medium_low_risk") & trade_lc,
                F.lit("firb_trade_lc_art166_8"),
            )
            .when(
                commitment
                & F.col("risk_bucket").isin("medium_risk", "medium_low_risk"),
                F.lit("firb_credit_line_art166_8"),
            )
            # Art.166(10) issued items fall back to the Annex I table —
            # the label keeps the underlying source visible
            .otherwise(F.concat(F.lit("firb_issued_fallback:"), F.col("ccf_source")))
        )
        exp = exp.withColumns(
            {
                "ccf": F.when(
                    irb_row & F.col("risk_bucket").isNotNull(), firb_ccf
                ).otherwise(F.col("ccf")),
                "ccf_source": F.when(
                    irb_row & F.col("risk_bucket").isNotNull(), firb_src
                ).otherwise(F.col("ccf_source")),
            }
        )

    # PS1/26 Art.111(1) Table A1 Row 4(b): UK residential-mortgage
    # commitments take a fixed 50% CCF unless already in the Row 7 UCC 10%
    # or Row 1/2 100% carve-out — tested against the RESOLVED factor, not
    # the bucket (ref engine/ccf.py _apply_uk_residential_mortgage_ccf).
    # Art.166C(1) reads the same factor into the F-IRB exposure value, and
    # under B3.1 the F-IRB carrier IS the SA table (firb_ccf_bespoke off),
    # so one override patches both. Pack- and carrier-gated.
    if (
        "uk_resi_mortgage_commitment_ccf" in pack.scalars
        and "is_uk_residential_mortgage_commitment" in exp.columns
    ):
        _resi = F.coalesce("is_uk_residential_mortgage_commitment", F.lit(False))
        _carve = F.col("ccf").isin(
            pack.scalar("pr_revolving_ucc_ccf"), 1.0
        )
        resi_fires = _resi & ~_carve
        exp = exp.withColumns(
            {
                "ccf": F.when(
                    resi_fires, pack.lit("uk_resi_mortgage_commitment_ccf")
                ).otherwise(F.col("ccf")),
                "ccf_source": F.when(
                    resi_fires, F.lit("uk_resi_commitment_row4b")
                ).otherwise(F.col("ccf_source")),
            }
        )

    # PS1/26 Art.166E(5): a REVOLVING purchased-receivables purchase
    # commitment routes to the Row 5 OC 40% regardless of its generic
    # bucket, dropping to the Row 7 UCC 10% where unconditionally
    # cancellable (low_risk bucket) — ref engine/ccf.py
    # _apply_purchased_receivable_ccf. Pack- and carrier-gated.
    if (
        "pr_revolving_commitment_ccf" in pack.scalars
        and "is_purchased_receivable_commitment" in exp.columns
    ):
        _revolving = (
            F.coalesce("is_revolving", F.lit(False))
            if "is_revolving" in exp.columns
            else F.lit(False)
        )
        pr_fires = (
            F.coalesce("is_purchased_receivable_commitment", F.lit(False))
            & _revolving
        )
        pr_ccf = F.when(
            F.col("risk_bucket") == "low_risk", pack.lit("pr_revolving_ucc_ccf")
        ).otherwise(pack.lit("pr_revolving_commitment_ccf"))
        exp = exp.withColumns(
            {
                "ccf": F.when(pr_fires, pr_ccf).otherwise(F.col("ccf")),
                "ccf_source": F.when(
                    pr_fires, F.lit("pr_revolving_art166e5")
                ).otherwise(F.col("ccf_source")),
            }
        )

    # --- provisions: multi-level allocation + SA drawn-first deduction ----
    # (CRR Art.110-111(2); ref engine/crm/provisions.py resolve_provisions)
    if raw.provisions is not None:
        exp = _resolve_provisions(exp, raw.provisions, raw.facility_mappings)
    else:
        exp = exp.withColumns(
            {
                "provision_allocated": F.lit(0.0),
                "scra_provision_amount": F.lit(0.0),
                "gcra_provision_amount": F.lit(0.0),
                "provision_references": F.lit(None).cast("array<string>"),
            }
        )

    # SA rows deduct drawn-first; IRB/slotting rows pass provisions through
    # to EL shortfall/excess instead (ref provisions.py IRB pass-through,
    # now consumed by calculators._el_columns)
    is_sa = ~F.col("has_irb_permission") & ~F.col("is_specialised")
    floored_drawn = F.greatest(F.col("drawn_amount"), F.lit(0.0))
    prov_on_drawn = F.when(
        is_sa, F.least(F.col("provision_allocated"), floored_drawn)
    ).otherwise(F.lit(0.0))
    # provision split, the capped-amount carrier (ref CALCULATION_OUTPUT_
    # SCHEMA :3008), the EAD formula (drawn − prov) + CCF × (undrawn −
    # prov) (ref engine/ccf.py) and the EAD-calculation carriers
    # (:3010-3014) — dependent steps expressed by reusing the SAME Column
    # objects (identical arithmetic DAG to the former seven-link chain),
    # landing the whole block in one projection
    prov_on_nominal = F.when(
        is_sa,
        F.least(
            F.col("provision_allocated") - prov_on_drawn,
            F.col("undrawn_amount"),
        ),
    ).otherwise(F.lit(0.0))
    converted_undrawn = F.col("ccf") * F.col("undrawn_amount")
    exp = exp.withColumns(
        {
            "provision_on_drawn": prov_on_drawn,
            "provision_on_nominal": prov_on_nominal,
            "provision_capped_amount": prov_on_drawn + prov_on_nominal,
            "ead": (F.col("drawn_amount") - prov_on_drawn)
            + F.col("ccf") * (F.col("undrawn_amount") - prov_on_nominal),
            "converted_undrawn": converted_undrawn,
            "gross_ead": F.col("drawn_amount") + converted_undrawn,
            "ead_calculation_method": F.lit(collateral_method),
        }
    )

    # --- collateral: supervisory haircut then pro-rata allocation ---------
    # real-estate items are NOT FCCM-netted — they route to the RE-split
    # stage instead (ref engine/stages/re_split; CRR Art.124-126), so the
    # same property can never both reduce EAD here and secure a tranche
    if (
        raw.collateral is not None
        and raw.collateral_links is not None
        and collateral_method != "simple"
    ):
        fin_coll = raw.collateral
        if "collateral_type" in fin_coll.columns:
            # real estate routes to RE-split; life insurance and
            # third-party deposits are OTHER funded protection (RW
            # substitution channels below, CRR Art.232) — none may also
            # FCCM-net, or the same item would count twice
            fin_coll = fin_coll.where(
                ~F.coalesce("collateral_type", F.lit("")).isin(
                    "real_estate", *_OFCP_TYPES
                )
            )

        # haircut: supplied column wins; else the banded supervisory lookup
        # (type × CQS × maturity band — CRR Art.224 Table 1, ref
        # engine/crm/haircut_tables.py) derives it from item attributes
        supplied = (
            F.col("haircut")
            if "haircut" in fin_coll.columns
            else F.lit(None).cast("double")
        )
        resid = (
            F.col("residual_maturity")
            if "residual_maturity" in fin_coll.columns
            else F.lit(None).cast("double")
        )
        if "collateral_type" in fin_coll.columns:
            is_bond = F.col("collateral_type").isin(
                "govt_bond", "corp_bond", "securitisation"
            )
            # the band STRUCTURE is pack data (CRR 3 bands / B3.1 5 bands,
            # PS1/26 Art.224 Table 1) — a broadcast range join on the tiny
            # (band, lo, hi) table, not a hardcoded when-chain
            bands = pack.broadcast_table(spark, "haircut_bands").select(
                F.col("maturity_band").alias("_band_name"),
                F.col("lo").alias("_band_lo"),
                F.col("hi").alias("_band_hi"),
            )
            fin_coll = fin_coll.withColumn(
                "_m_band", F.coalesce(resid, F.lit(0.0))
            ).join(
                bands,
                (F.col("_m_band") > F.col("_band_lo"))
                & (F.col("_m_band") <= F.col("_band_hi")),
                "left",
            )
            band_key = F.when(~is_bond, F.lit("any")).otherwise(
                F.coalesce("_band_name", F.lit("any"))
            )
            cqs_key = F.when(~is_bond, F.lit(0)).otherwise(
                F.coalesce(F.col("collateral_cqs").cast("int"), F.lit(4))
                if "collateral_cqs" in fin_coll.columns
                else F.lit(4)
            )
            hc_table = pack.broadcast_table(spark, "collateral_haircuts").select(
                F.col("collateral_type").alias("_hc_type"),
                F.col("cqs").alias("_hc_cqs"),
                F.col("maturity_band").alias("_hc_band"),
                F.col("haircut").alias("_hc_lookup"),
            )
            fin_coll = (
                fin_coll.withColumn("_band_key", band_key)
                .withColumn("_cqs_key", cqs_key)
                .join(
                    hc_table,
                    (F.col("collateral_type") == F.col("_hc_type"))
                    & (F.col("_cqs_key") == F.col("_hc_cqs"))
                    & (F.col("_band_key") == F.col("_hc_band")),
                    "left",
                )
                # unknown types take the worst equity haircut (conservative)
                .withColumn(
                    "_hc_derived",
                    F.coalesce("_hc_lookup", F.lit(0.25)),
                )
                .drop(
                    "_hc_type", "_hc_cqs", "_hc_band", "_band_key", "_cqs_key",
                    "_hc_lookup", "_band_name", "_band_lo", "_band_hi", "_m_band",
                )
            )
        else:
            fin_coll = fin_coll.withColumn("_hc_derived", F.lit(0.0))

        ccy_mm = (
            F.coalesce("currency_mismatch", F.lit(False))
            if "currency_mismatch" in fin_coll.columns
            else F.lit(False)
        )
        hc_eff = F.coalesce(supplied, F.col("_hc_derived"))
        fxh = F.when(ccy_mm, pack.lit("fx_haircut")).otherwise(0.0)
        mv = F.coalesce("market_value", F.lit(0.0))
        coll = fin_coll.select(
            "collateral_reference",
            (
                F.col("collateral_type")
                if "collateral_type" in fin_coll.columns
                else F.lit(None).cast("string")
            ).alias("_coll_type"),
            resid.alias("_coll_maturity"),
            (mv * (1 - hc_eff) * (1 - fxh)).alias("adjusted_value"),
            # haircut decomposition carriers (ref the reference's 162-col
            # ledger haircut components, data/schemas.py:2877): the raw
            # market value plus the value LOST to each adjustment, so
            # gross − quality − fx − mismatch ≡ allocated, exactly
            mv.alias("_gross_value"),
            (mv * hc_eff).alias("_quality_loss"),
            (mv * (1 - hc_eff) * fxh).alias("_fx_loss"),
            # own-issue eligibility input (CRR/PS1-26 Art.194(4); ref
            # crm/processor.py:838 _apply_own_issue_collateral_gate) —
            # null is PERMISSIVE, the gate never fires on existing data
            (
                F.col("issuer_counterparty_reference")
                if "issuer_counterparty_reference" in fin_coll.columns
                else F.lit(None).cast("string")
            ).alias("_coll_issuer"),
        )
        # --- beneficiary-level link resolution (ref COLLATERAL_LINK_SCHEMA
        # schemas.py:836-850 + crm/processor.py _build_exposure_lookups):
        # direct types resolve on exposure_reference; a "facility" link
        # cascades over the named facility's descendant subtree (closure,
        # same kernel as facility provisions); a "counterparty" link pools
        # over the obligor's exposures. Each resolved pair carries WHERE it
        # came from (_src_level/_src_ref) for the CRM-inheritance carriers
        # (ref CALCULATION_OUTPUT_SCHEMA :2922-2924). All expansion joins
        # broadcast the SMALL link/closure side; the exposure fact never
        # shuffles here.
        link_cols = raw.collateral_links.columns
        _lnull = F.lit(None).cast("string")
        if "beneficiary_type" in link_cols:
            lk = raw.collateral_links.withColumn(
                "_btype", F.lower(F.coalesce(F.col("beneficiary_type"), F.lit("exposure")))
            )
            _ben_ref = (
                F.col("beneficiary_reference")
                if "beneficiary_reference" in link_cols
                else _lnull
            )
            _exp_ref = (
                F.coalesce(F.col("exposure_reference"), _ben_ref)
                if "exposure_reference" in link_cols
                else _ben_ref
            )
            links = lk.where(~F.col("_btype").isin("facility", "counterparty")).select(
                "collateral_reference",
                _exp_ref.alias("exposure_reference"),
                F.lit("exposure").alias("_src_level"),
                _lnull.alias("_src_ref"),
                F.lit(0).alias("_lvl_rank"),
            )
            # one NARROW, materialised membership projection feeds both
            # cascade expansions — without it each expansion would carry
            # its own full copy of the exposure lineage into the stage
            # plan (Catalyst tree size, the 1g-driver hazard)
            _mem_cols = ["exposure_reference", "counterparty_reference"]
            if "parent_facility_reference" in exp.columns:
                _mem_cols.append("parent_facility_reference")
            _members = exp.select(*_mem_cols).localCheckpoint()
            fac_rows = lk.where(F.col("_btype") == "facility").select(
                "collateral_reference", _ben_ref.alias("_cben")
            )
            if "parent_facility_reference" in exp.columns:
                if raw.facility_mappings is not None:
                    from rwa_calculator_spark.operators.graph import (
                        ancestor_closure_iterative,
                    )

                    fac_edges = raw.facility_mappings.where(
                        F.col("child_type") == "facility"
                    ).select(
                        F.col("child_reference").alias("child"),
                        F.col("parent_facility_reference").alias("parent"),
                    )
                    closure = (
                        ancestor_closure_iterative(fac_edges)
                        .select(
                            F.col("ancestor").alias("_cl_ben"),
                            F.col("descendant").alias("_cl_fac"),
                        )
                        .dropDuplicates(["_cl_ben", "_cl_fac"])
                        # facility-dim sized — materialise eagerly so the
                        # closure's union-join plan never multiplies into
                        # the wide exposure plan (Catalyst tree size, not
                        # data size, is the 1g-driver hazard here)
                        .localCheckpoint()
                    )
                    fac_expand = fac_rows.join(
                        F.broadcast(closure), fac_rows._cben == F.col("_cl_ben"), "left"
                    ).select(
                        "collateral_reference",
                        "_cben",
                        F.coalesce("_cl_fac", F.col("_cben")).alias("_fac_ref"),
                    )
                else:
                    fac_expand = fac_rows.select(
                        "collateral_reference", "_cben", F.col("_cben").alias("_fac_ref")
                    )
                links = links.unionByName(
                    _members.select(
                        "exposure_reference",
                        F.col("parent_facility_reference").alias("_pfac"),
                    )
                    .where(F.col("_pfac").isNotNull())
                    .join(F.broadcast(fac_expand), F.col("_pfac") == F.col("_fac_ref"))
                    .select(
                        "collateral_reference",
                        "exposure_reference",
                        F.lit("facility").alias("_src_level"),
                        F.col("_cben").alias("_src_ref"),
                        F.lit(1).alias("_lvl_rank"),
                    )
                )
            cp_rows = lk.where(F.col("_btype") == "counterparty").select(
                "collateral_reference", _ben_ref.alias("_cben")
            )
            links = links.unionByName(
                _members.select("exposure_reference", "counterparty_reference")
                .join(
                    F.broadcast(cp_rows),
                    F.col("counterparty_reference") == F.col("_cben"),
                )
                .select(
                    "collateral_reference",
                    "exposure_reference",
                    F.lit("counterparty").alias("_src_level"),
                    F.col("_cben").alias("_src_ref"),
                    F.lit(2).alias("_lvl_rank"),
                )
            )
        else:
            links = raw.collateral_links.select(
                "collateral_reference",
                "exposure_reference",
                F.lit("exposure").alias("_src_level"),
                _lnull.alias("_src_ref"),
                F.lit(0).alias("_lvl_rank"),
            )
        # pro-rata by beneficiary EAD (ref engine/kernels/allocation.py),
        # with the maturity-mismatch adjustment applied per (item, exposure)
        # pair: P_adj = P·(t−0.25)/(T−0.25), protection under 3 months
        # ineligible (CRR Art.239; ref engine/crm/haircuts.py mismatch path)
        linked = links.join(
            exp.select(
                "exposure_reference",
                "ead",
                "effective_maturity",
                "counterparty_reference",
                *(
                    [F.col("group_reference").alias("_obligor_ult")]
                    if "group_reference" in exp.columns
                    else []
                ),
            ),
            "exposure_reference",
        ).join(F.broadcast(coll), "collateral_reference")
        # --- own-issue collateral gate (CRR/PS1-26 Art.194(4); ref
        # crm/processor.py:499-535 + :838-929): collateral issued by the
        # obligor or a member of the obligor's group is ineligible funded
        # protection. Resolved per (item, exposure) pair BEFORE the
        # pro-rata denominator, so a gated pair yields no CRM benefit by
        # any path; the issuer's group apex resolves against the book's
        # own (cp → ultimate parent) map. Null issuer is PERMISSIVE.
        _iss = F.col("_coll_issuer")
        _obl = F.col("counterparty_reference")
        _has_issuers = "issuer_counterparty_reference" in fin_coll.columns
        if _has_issuers and raw.org_mappings is not None:
            # the issuer's group apex from the SAME org graph the
            # hierarchy stage used (covers issuers with no exposures of
            # their own); a tiny dim — 10 broadcast-join rounds, built
            # only when the book actually declares issuers
            from rwa_calculator_spark.operators.graph import (
                resolve_ultimate_parent_iterative,
            )

            up_iss = (
                resolve_ultimate_parent_iterative(
                    raw.org_mappings.select(
                        F.col("child_reference").alias("child"),
                        F.col("parent_reference").alias("parent"),
                    )
                )
                .select(
                    F.col("node").alias("_iss_cp"),
                    F.col("ultimate_parent").alias("_iss_ult"),
                )
                # tiny org dim — materialise, keep the resolver's iterative
                # join plan out of the exposure tree
                .localCheckpoint()
            )
            linked = linked.join(
                F.broadcast(up_iss), _iss == F.col("_iss_cp"), "left"
            ).drop("_iss_cp")
            _iss_ult = F.col("_iss_ult")
        else:
            _iss_ult = F.lit(None).cast("string")
        _obl_ult = (
            F.col("_obligor_ult")
            if "group_reference" in exp.columns
            else F.lit(None).cast("string")
        )
        _own = _iss.isNotNull() & F.coalesce(
            (_iss == _obl)
            | (_iss == _obl_ult)
            | (_obl == _iss_ult)
            | (_iss_ult.isNotNull() & (_iss_ult == _obl_ult)),
            F.lit(False),
        )
        linked = linked.withColumn("_own_issue", _own)
        t_exp = F.least(F.coalesce("effective_maturity", F.lit(2.5)), F.lit(5.0))
        t_coll = F.least(F.coalesce("_coll_maturity", t_exp), t_exp)
        mm = F.when(
            t_coll < t_exp,
            F.greatest(t_coll - F.lit(0.25), F.lit(0.0)) / (t_exp - F.lit(0.25)),
        ).otherwise(F.lit(1.0))
        linked = linked.withColumn("_mm", mm)
        wcoll = W.partitionBy("collateral_reference")
        # an exposure-level item linked to a single beneficiary is a
        # "direct" allocation; one split across beneficiaries — or any
        # facility/counterparty cascade — is "pro_rata" (ref
        # collateral_allocation_method, schemas.py:2924). Own-issue pairs
        # count toward neither the split test nor the denominator.
        _ok = ~F.col("_own_issue")
        linked = linked.withColumn(
            "_pair_shared",
            F.sum(F.when(_ok, 1).otherwise(0)).over(wcoll) > F.lit(1),
        )
        denom = F.sum(
            F.when(_ok, F.round(F.col("ead") * 100.0, 0).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).over(wcoll) / F.lit(100.0)
        # the share is the single gate: every downstream product (allocated
        # value, gross, haircut losses, mismatch loss) zeroes for an
        # own-issue pair through it; the downstream entries reuse the SAME
        # share Column object (identical DAG) in one batched projection
        _share = F.when(
            _ok, F.col("ead") / F.nullif(denom, F.lit(0.0))
        ).otherwise(F.lit(0.0))
        allocated = linked.withColumns(
            {
                "_share": _share,
                "allocated_value": F.col("adjusted_value") * F.col("_mm") * _share,
                # per-pair decomposition at the SAME share: the mismatch
                # loss is the haircut-adjusted value forfeited to Art.239
                # pro-rating
                "_mm_loss": F.col("adjusted_value")
                * (F.lit(1.0) - F.col("_mm"))
                * _share,
            }
        )
        # per-type decomposition of the SAME allocated (post-haircut,
        # post-mismatch) value — conditional sums inside the one existing
        # aggregation, zero additional shuffle (ref CALCULATION_OUTPUT_SCHEMA
        # data/schemas.py:2963-2968 "Per-type collateral tracking for COREP
        # C 08.01 cols 0170-0210"): financial (Art.197 eligible instruments;
        # cash/deposits reported again as their own subset), receivables
        # (Art.199(5)), everything else — including undeclared types, which
        # the haircut lookup already priced as unknown — other physical
        # (Art.199(6)). Real estate never enters this channel (it routes to
        # the RE-split stage, which seals collateral_re_value itself), so
        # financial + receivables + other ≡ collateral_value exactly.
        _t = F.col("_coll_type")
        _is_cash = _t.isin("cash", "deposit")
        _is_fin = _is_cash | _t.isin(
            "govt_bond", "corp_bond", "securitisation", "equity", "gold", "fund"
        )
        _is_recv = _t == "receivables"
        _alloc = F.col("allocated_value")
        per_exposure = allocated.groupBy("exposure_reference").agg(
            F.sum("allocated_value").alias("collateral_value"),
            F.sum(F.when(_is_fin, _alloc).otherwise(0.0)).alias(
                "collateral_financial_value"
            ),
            F.sum(F.when(_is_cash, _alloc).otherwise(0.0)).alias(
                "collateral_cash_value"
            ),
            F.sum(F.when(_is_recv, _alloc).otherwise(0.0)).alias(
                "collateral_receivables_value"
            ),
            F.sum(
                F.when(~F.coalesce(_is_fin | _is_recv, F.lit(False)), _alloc).otherwise(
                    0.0
                )
            ).alias("collateral_other_physical_value"),
            F.sum(F.col("_gross_value") * F.col("_share")).alias(
                "collateral_value_gross"
            ),
            F.sum(F.col("_quality_loss") * F.col("_share")).alias("haircut_quality"),
            F.sum(F.col("_fx_loss") * F.col("_share")).alias("haircut_fx"),
            F.sum("_mm_loss").alias("haircut_maturity_mismatch"),
            # ledger carriers (ref CALCULATION_OUTPUT_SCHEMA
            # collateral_references / collateral_types, data/schemas.py:
            # 2954-2955): WHICH items secured the row. sort_array +
            # collect_set for a deterministic, duplicate-free list — same
            # audit answer, stable value hash (collect order is
            # shuffle-dependent otherwise); nulls (undeclared types) drop.
            F.sort_array(
                F.collect_set(
                    F.when(~F.col("_own_issue"), F.col("collateral_reference"))
                )
            ).alias("collateral_references"),
            F.sort_array(
                F.collect_set(F.when(~F.col("_own_issue"), F.col("_coll_type")))
            ).alias("collateral_types"),
            # Art.194(4) DQ channel (ref processor.py:499 CRM015 warning
            # per dropped item): WHICH pledges were excluded as own-issue
            F.sort_array(
                F.collect_set(
                    F.when(
                        F.col("_own_issue"),
                        F.concat(F.lit("CRM015:"), F.col("collateral_reference")),
                    )
                )
            ).alias("_dq_own_issue"),
            # CRM-inheritance provenance (ref schemas.py:2922-2924): the
            # highest-priority contributing level (exposure < facility <
            # counterparty), the beneficiary each inherited level came
            # from (min = deterministic under shuffle), and whether any
            # direct-level item was split across beneficiaries — all
            # conditional aggs inside the ONE existing groupBy, zero
            # additional shuffle
            F.min(F.when(~F.col("_own_issue"), F.col("_lvl_rank"))).alias(
                "_coll_rank"
            ),
            F.min(
                F.when(
                    ~F.col("_own_issue") & (F.col("_lvl_rank") == 1),
                    F.col("_src_ref"),
                )
            ).alias("_coll_src_fac"),
            F.min(
                F.when(
                    ~F.col("_own_issue") & (F.col("_lvl_rank") == 2),
                    F.col("_src_ref"),
                )
            ).alias("_coll_src_cp"),
            F.max(
                F.when(
                    ~F.col("_own_issue") & (F.col("_lvl_rank") == 0),
                    F.col("_pair_shared").cast("int"),
                )
            ).alias("_coll_shared0"),
        )
        exp = exp.join(per_exposure, "exposure_reference", "left")
        _cr = F.col("_coll_rank")
        exp = exp.withColumns(
            {
                "collateral_source_level": F.when(_cr == 0, "exposure")
                .when(_cr == 1, "facility")
                .when(_cr == 2, "counterparty"),
                "collateral_inherited_from": F.when(
                    _cr == 1, F.col("_coll_src_fac")
                ).when(_cr == 2, F.col("_coll_src_cp")),
                "collateral_allocation_method": F.when(
                    _cr == 0,
                    F.when(F.col("_coll_shared0") == 1, "pro_rata").otherwise(
                        "direct"
                    ),
                ).when(_cr.isNotNull(), F.lit("pro_rata")),
            }
        ).drop("_coll_rank", "_coll_src_fac", "_coll_src_cp", "_coll_shared0")
        _coal: dict = {
            c: F.coalesce(c, F.lit(0.0))
            for c in (
                "collateral_value",
                "collateral_value_gross",
                "haircut_quality",
                "haircut_fx",
                "haircut_maturity_mismatch",
                "collateral_financial_value",
                "collateral_cash_value",
                "collateral_receivables_value",
                "collateral_other_physical_value",
            )
        }
        for c in ("collateral_references", "collateral_types", "_dq_own_issue"):
            _coal[c] = F.coalesce(c, F.array().cast("array<string>"))
        exp = exp.withColumns(_coal)
    else:
        _zeros: dict = {
            c: F.lit(0.0)
            for c in (
                "collateral_value",
                "collateral_value_gross",
                "haircut_quality",
                "haircut_fx",
                "haircut_maturity_mismatch",
                "collateral_financial_value",
                "collateral_cash_value",
                "collateral_receivables_value",
                "collateral_other_physical_value",
            )
        }
        for c in ("collateral_references", "collateral_types", "_dq_own_issue"):
            _zeros[c] = F.array().cast("array<string>")
        for c in (
            "collateral_source_level",
            "collateral_inherited_from",
            "collateral_allocation_method",
        ):
            _zeros[c] = F.lit(None).cast("string")
        exp = exp.withColumns(_zeros)

    # --- CRR Art.195/219 on-balance-sheet netting (ref engine/crm/
    # collateral.py:170 generate_netting_collateral + processor.py:445
    # _join_netting_amounts): a negative-drawn LOAN (deposit / credit
    # balance) carrying a netting_agreement_reference becomes synthetic
    # cash collateral for the positive-drawn LOAN siblings of the SAME
    # (agreement, counterparty) — Art.195 limits set-off to mutual claims
    # with a single counterparty, Art.219 to drawn loans and deposits
    # (contingents / facility_undrawn rows are off-balance-sheet and never
    # participate). Pools key (agreement, counterparty, currency) so an
    # FX haircut prices when the deposit currency differs; the pool
    # carries the EARLIEST deposit maturity (conservative single-value
    # summary) and the Art.238-239 mismatch factor applies against each
    # beneficiary's own residual maturity, zeroing below the Art.237(1)
    # 0.25y gate. Allocation is pro-rata by the drawn portion in exact
    # cents. Plan shape: two groupBys + joins over the NETTED-LOAN subset
    # only — the full fact joins the (sparse) per-exposure allocation on
    # its primary key, which AQE broadcast-converts when small; books
    # whose loader never supplies the column skip the block entirely. ---
    if "netting_agreement_reference" in exp.columns:
        _n_ccy = (
            F.col("currency") if "currency" in exp.columns else F.lit(None).cast("string")
        )
        _n_mat = (
            F.col("effective_maturity")
            if "effective_maturity" in exp.columns
            else F.lit(None).cast("double")
        )
        nl = exp.where(
            F.col("netting_agreement_reference").isNotNull()
            & (F.col("exposure_type") == "loan")
        ).select(
            "exposure_reference",
            "netting_agreement_reference",
            "counterparty_reference",
            _n_ccy.alias("_n_ccy"),
            "drawn_amount",
            _n_mat.alias("_n_mat"),
        )
        # Art.195 single-counterparty boundary: an agreement spanning >1
        # counterparty is a CRM016 data-quality condition — the offset is
        # disallowed, so cross-counterparty pools must not form (pools and
        # beneficiaries key on (agreement, counterparty) which already
        # prevents it; the flag makes the invisible disallowance visible)
        spans = (
            nl.groupBy("netting_agreement_reference")
            .agg(F.count_distinct("counterparty_reference").alias("_n_cp"))
            .where(F.col("_n_cp") > 1)
            .select("netting_agreement_reference", F.lit(True).alias("_crm016"))
        )
        _cents = lambda c: (  # noqa: E731 — exact-cent pool sums
            F.sum(F.round(c * 100.0, 0).cast("long")) / F.lit(100.0)
        )
        pools = (
            nl.where(F.col("drawn_amount") < 0)
            .groupBy(
                "netting_agreement_reference", "counterparty_reference", "_n_ccy"
            )
            .agg(
                _cents(-F.col("drawn_amount")).alias("_pool_value"),
                F.min("_n_mat").alias("_pool_mat"),
            )
            .withColumnRenamed("_n_ccy", "_pool_ccy")
        )
        bens = nl.where(F.col("drawn_amount") > 0)
        tot = bens.groupBy(
            "netting_agreement_reference", "counterparty_reference"
        ).agg(_cents(F.col("drawn_amount")).alias("_tot_drawn"))
        _share = F.col("drawn_amount") / F.nullif(F.col("_tot_drawn"), F.lit(0.0))
        _alloc = F.col("_pool_value") * _share
        _fx_h = F.when(
            F.col("_pool_ccy").isNotNull()
            & F.col("_n_ccy").isNotNull()
            & (F.col("_pool_ccy") != F.col("_n_ccy")),
            pack.lit("fx_haircut"),
        ).otherwise(F.lit(0.0))
        # Art.238-239 against the DEPOSIT residual t and the loan residual
        # T; null maturities are permissive (no mismatch establishable —
        # the same convention ordinary financial collateral follows)
        _t, _T = F.col("_pool_mat"), F.col("_n_mat")
        _mm = (
            F.when(_t.isNull() | _T.isNull() | (_t >= _T), F.lit(1.0))
            .when(_t < 0.25, F.lit(0.0))
            .otherwise((_t - 0.25) / F.greatest(_T - 0.25, F.lit(1e-9)))
        )
        per_exp = (
            bens.join(tot, ["netting_agreement_reference", "counterparty_reference"])
            .join(
                pools, ["netting_agreement_reference", "counterparty_reference"]
            )
            .select(
                "exposure_reference",
                _alloc.alias("_a"),
                (_alloc * (1 - _fx_h) * _mm).alias("_adj"),
                (_alloc * _fx_h).alias("_fxa"),
                (_alloc * (1 - _fx_h) * (1 - _mm)).alias("_mma"),
            )
            .groupBy("exposure_reference")
            .agg(
                _cents(F.col("_a")).alias("_net_alloc"),
                _cents(F.col("_adj")).alias("_net_adj"),
                _cents(F.col("_fxa")).alias("_net_fx"),
                _cents(F.col("_mma")).alias("_net_mm"),
            )
        )
        exp = exp.join(per_exp, "exposure_reference", "left").join(
            F.broadcast(spans), "netting_agreement_reference", "left"
        )
        _na = F.coalesce("_net_alloc", F.lit(0.0))
        _nj = F.coalesce("_net_adj", F.lit(0.0))
        _is_dep = (
            F.col("netting_agreement_reference").isNotNull()
            & (F.col("exposure_type") == "loan")
            & (F.col("drawn_amount") < 0)
        )
        exp = exp.withColumns(
            {
                # the COREP col-0035 carrier: the pre-haircut pool value
                # allocated to this exposure (ref processor.py:456)
                "on_bs_netting_amount": _na,
                # the synthetic cash collateral flows through FCCM exactly
                # like any funded protection (Art.219 → cash collateral)
                "collateral_value": F.col("collateral_value") + _nj,
                "collateral_value_gross": F.col("collateral_value_gross") + _na,
                "collateral_cash_value": F.col("collateral_cash_value") + _nj,
                "collateral_financial_value": F.col("collateral_financial_value")
                + _nj,
                "haircut_fx": F.col("haircut_fx") + F.coalesce("_net_fx", F.lit(0.0)),
                "haircut_maturity_mismatch": F.col("haircut_maturity_mismatch")
                + F.coalesce("_net_mm", F.lit(0.0)),
                # the deposit leg's credit balance IS the protection — it
                # leaves the RWA base rather than pricing at negative EAD
                "ead": F.when(_is_dep, F.greatest(F.col("ead"), F.lit(0.0))).otherwise(
                    F.col("ead")
                ),
                "_dq_netting": F.when(
                    F.coalesce("_crm016", F.lit(False)),
                    F.array(
                        F.lit(
                            "CRM016: netting agreement spans multiple"
                            " counterparties (Art.195 mutual-claims boundary)"
                        )
                    ),
                ).otherwise(F.array().cast("array<string>")),
            }
        ).drop("_net_alloc", "_net_adj", "_net_fx", "_net_mm", "_crm016")
    else:
        exp = exp.withColumns(
            {
                "on_bs_netting_amount": F.lit(0.0),
                "_dq_netting": F.array().cast("array<string>"),
            }
        )

    # FCCM: effective exposure after collateral (capped at zero), plus the
    # ledger carrier (ref :3011 ead_after_collateral): the value at THIS
    # step — before any Art.124(2) RE split re-partitions ead_after_crm
    # across tranche rows (the split parts keep the parent's figure here,
    # mirroring the pre/post provenance style of collateral_re_value).
    # The carrier reuses the same Column object — identical value.
    _ead_post_coll = F.greatest(
        F.col("ead") - F.col("collateral_value"), F.lit(0.0)
    )
    exp = exp.withColumns(
        {"ead_after_crm": _ead_post_coll, "ead_after_collateral": _ead_post_coll}
    )

    # --- other funded credit protection: RW-substitution channels ---------
    # (no EAD reduction — the value carries a substitute risk weight that
    # the SA calculator blends over the covered fraction)
    li_done = tpd_done = fcsm_done = False
    if (
        raw.collateral is not None
        and raw.collateral_links is not None
        and "collateral_type" in raw.collateral.columns
    ):
        links = raw.collateral_links.select(
            "collateral_reference", "exposure_reference"
        )
        coll = raw.collateral
        ccy_mm = (
            F.coalesce("currency_mismatch", F.lit(False))
            if "currency_mismatch" in coll.columns
            else F.lit(False)
        )
        cqs_col = (
            F.col("collateral_cqs")
            if "collateral_cqs" in coll.columns
            else F.lit(None).cast("int")
        )

        # life insurance (CRR Art.232(3)/233(3); ref engine/crm/
        # life_insurance.py): surrender value less the 8% FX volatility
        # haircut on currency mismatch; the insurer's institution RW maps
        # through the Art.232(3) table to the secured-portion RW
        li = coll.where(F.col("collateral_type") == "life_insurance")
        li = _join_issuer_rw(li, pack, F.lit("institution"), cqs_col, "_insurer_rw")
        li_map = pack.table_df(spark, "life_ins_rw_map").select(
            F.col("insurer_rw").alias("_lim_in"),
            F.col("secured_rw").alias("_lim_out"),
        )
        li = li.join(
            F.broadcast(li_map), F.col("_insurer_rw") == F.col("_lim_in"), "left"
        ).select(
            "collateral_reference",
            (
                F.coalesce("market_value", F.lit(0.0))
                * (1 - F.when(ccy_mm, pack.lit("fx_haircut")).otherwise(0.0))
            ).alias("_val"),
            # unmapped insurer RW falls back to itself (identity — the
            # map only ever improves; ref life_insurance.py table misses)
            F.coalesce("_lim_out", "_insurer_rw", F.lit(1.5)).alias("_item_rw"),
        )
        exp = exp.join(
            _allocate_items(exp, li, links)
            .withColumnRenamed("_ch_value", "li_value")
            .withColumnRenamed("_ch_rw", "li_rw"),
            "exposure_reference",
            "left",
        )
        li_done = True

        # third-party deposit (CRR Art.200(a)/232(2); ref engine/crm/
        # third_party_deposit.py): cash held at a THIRD-party institution
        # is a guarantee by the holder — the holder's own institution RW
        # substitutes; it is NOT 0%-haircut own-bank cash
        tpd = coll.where(F.col("collateral_type") == "third_party_deposit")
        tpd = _join_issuer_rw(
            tpd, pack, F.lit("institution"), cqs_col, "_holder_rw"
        ).select(
            "collateral_reference",
            F.coalesce("market_value", F.lit(0.0)).alias("_val"),
            F.coalesce("_holder_rw", F.lit(0.5)).alias("_item_rw"),
        )
        exp = exp.join(
            _allocate_items(exp, tpd, links)
            .withColumnRenamed("_ch_value", "tpd_value")
            .withColumnRenamed("_ch_rw", "tpd_rw"),
            "exposure_reference",
            "left",
        )
        tpd_done = True

        # financial collateral simple method (CRR Art.222; ref engine/crm/
        # simple_method.py): raw market value (no haircuts), collateral RW
        # from issuer class × CQS floored at 20% per item, same-currency
        # cash at 0% (Art.222(4)); no EAD reduction
        if collateral_method == "simple":
            fc = coll.where(
                ~F.coalesce("collateral_type", F.lit("")).isin(
                    "real_estate", *_OFCP_TYPES
                )
            )
            issuer_cls = (
                F.when(F.col("collateral_type") == "govt_bond", "sovereign")
                .when(F.col("collateral_type") == "corp_bond", "corporate")
                .when(F.col("collateral_type") == "securitisation", "corporate")
                .otherwise(F.lit(None).cast("string"))
            )
            fc = _join_issuer_rw(fc, pack, issuer_cls, cqs_col, "_iss_rw")
            item_rw = (
                F.when(
                    (F.col("collateral_type") == "cash") & ~ccy_mm, F.lit(0.0)
                )
                .when(F.col("collateral_type") == "cash", pack.lit("fcsm_rw_floor"))
                .otherwise(
                    F.greatest(
                        F.coalesce("_iss_rw", F.lit(1.0)),
                        pack.lit("fcsm_rw_floor"),
                    )
                )
            )
            fc = fc.select(
                "collateral_reference",
                F.coalesce("market_value", F.lit(0.0)).alias("_val"),
                item_rw.alias("_item_rw"),
            )
            exp = exp.join(
                _allocate_items(exp, fc, links)
                .withColumnRenamed("_ch_value", "fcsm_value")
                .withColumnRenamed("_ch_rw", "fcsm_rw"),
                "exposure_reference",
                "left",
            )
            fcsm_done = True
    # Only materialise the channel columns when at least one channel ran:
    # bundles without typed collateral keep their pre-OFCP plan (and the SA
    # blend, gated on the columns, stays out of the when-tree entirely)
    if li_done or tpd_done or fcsm_done:
        for flag, (vcol, rcol) in (
            (li_done, ("li_value", "li_rw")),
            (tpd_done, ("tpd_value", "tpd_rw")),
            (fcsm_done, ("fcsm_value", "fcsm_rw")),
        ):
            if not flag:
                exp = exp.withColumn(vcol, F.lit(0.0)).withColumn(
                    rcol, F.lit(None).cast("double")
                )
            else:
                exp = exp.withColumn(vcol, F.coalesce(vcol, F.lit(0.0)))

    # --- guarantees: coverage share + guarantor class ---------------------
    if raw.guarantees is not None:
        # Optional modelled-guarantor carriers (ref engine/irb/guarantee.py:
        # a guarantor internal PD routes the IRB leg to parameter
        # substitution / double default instead of SA RW substitution;
        # seniority + FSE status pick the Art.161(1) supervisory LGD)
        gcols = [
            "exposure_reference",
            F.coalesce("coverage_pct", F.lit(0.0)).alias("g_coverage"),
            F.col("guarantor_class").alias("g_class"),
            F.col("guarantor_cqs").cast("int").alias("g_cqs"),
        ]
        for opt, out in (
            ("guarantor_pd", "guarantor_pd"),
            ("guarantor_seniority", "guarantor_seniority"),
            ("guarantor_is_fse", "guarantor_is_fse"),
            # ledger carrier (ref CALCULATION_OUTPUT_SCHEMA
            # guarantor_reference) — who provides the protection
            ("guarantor_reference", "guarantor_reference"),
            ("guarantee_reference", "guarantee_reference"),
            # Art.235(3) domestic CGCB-guarantor inputs (ref
            # sa/rw_adjustments.py _build_domestic_guarantor_expr): the
            # guarantor's member state and the guarantee's denomination
            ("guarantor_country_code", "g_country"),
            ("guarantee_currency", "g_currency"),
        ):
            if opt in raw.guarantees.columns:
                gcols.append(F.col(opt).alias(out))
        # unfunded-protection value haircuts (ref GUARANTEE_SCHEMA
        # protection_type/includes_restructuring, data/schemas.py:862-863;
        # CRR Art.233(3)): a credit derivative whose credit events do NOT
        # include restructuring loses 40% of its protection value; a
        # currency mismatch between protection and exposure applies the
        # supervisory FX haircut. Both reduce the EFFECTIVE coverage share
        # and both seal as ledger carriers (guarantee_restructuring_haircut
        # / guarantee_fx_haircut, :2978-2979). Column-gated: bundles that
        # declare neither keep haircut 0 and their exact coverage.
        ptype = (
            F.coalesce(F.col("protection_type"), F.lit("guarantee"))
            if "protection_type" in raw.guarantees.columns
            else F.lit("guarantee")
        )
        restr = (
            F.coalesce(F.col("includes_restructuring"), F.lit(False))
            if "includes_restructuring" in raw.guarantees.columns
            else F.lit(False)
        )
        g_ccy_mm = (
            F.coalesce(F.col("currency_mismatch"), F.lit(False))
            if "currency_mismatch" in raw.guarantees.columns
            else F.lit(False)
        )
        restr_hc = F.when(
            (ptype == "credit_derivative") & ~restr,
            pack.lit("cds_restructuring_haircut"),
        ).otherwise(F.lit(0.0))
        fx_hc = F.when(g_ccy_mm, pack.lit("fx_haircut")).otherwise(F.lit(0.0))
        gcols.append(ptype.alias("protection_type"))
        gcols.append(restr_hc.alias("guarantee_restructuring_haircut"))
        gcols.append(fx_hc.alias("guarantee_fx_haircut"))
        # Art.213(1)(c)(i) UCP eligibility gate (ref crm/guarantees.py:258
        # _gate_unilateral_protection): protection the provider can
        # unilaterally CANCEL is ineligible under both regimes; protection
        # whose terms the provider can unilaterally CHANGE (raising its
        # effective cost) is additionally ineligible under PS1/26 — the
        # change arm is the pack-gated ucp_unilateral_change_ineligible
        # feature. Nulls are permissive (no known defect => eligible).
        # Dropped guarantees leave the exposure un-guaranteed and flag
        # CRM012 into the data-quality list carriers.
        g_src = raw.guarantees
        # multi-level beneficiary cascade (facility subtree / obligor pool)
        # — column-gated: books that key guarantees on exposure_reference
        # alone keep the legacy single-level path bit-identically
        _g_cascade = "beneficiary_type" in g_src.columns
        if _g_cascade:
            g_src = _expand_guarantee_beneficiaries(g_src, exp, raw)
            gcols.append(F.col("_g_src_level").alias("g_src_level"))
            gcols.append(F.col("_g_src_ref").alias("g_src_ref"))
        _ucp_dq = None
        _has_cancel = "is_unilaterally_cancellable" in g_src.columns
        _has_change = "is_unilaterally_changeable" in g_src.columns
        if _has_cancel or _has_change:
            _inel = F.lit(False)
            if _has_cancel:
                _inel = _inel | F.coalesce(
                    "is_unilaterally_cancellable", F.lit(False)
                )
            if (
                _has_change
                and pack.scalar("ucp_unilateral_change_ineligible") >= 1.0
            ):
                _inel = _inel | F.coalesce(
                    "is_unilaterally_changeable", F.lit(False)
                )
            _gref = (
                F.col("guarantee_reference")
                if "guarantee_reference" in g_src.columns
                else F.lit("guarantee")
            )
            _ucp_dq = (
                g_src.where(_inel)
                .groupBy("exposure_reference")
                .agg(
                    F.sort_array(
                        F.collect_set(F.concat(F.lit("CRM012:"), _gref))
                    ).alias("_dq_ucp")
                )
            )
            g_src = g_src.where(~_inel)
        g = g_src.select(*gcols)
        # the DECLARED '% of exposure guaranteed' survives as its own
        # column (ref guarantee_coverage_pct contract — declared, not
        # effective); the Art.233(3) haircuts fold into the pricing
        # coverage only, so the ledger can reconstruct either figure
        g = g.withColumn("g_coverage_declared", F.col("g_coverage"))
        g = g.withColumn(
            "g_coverage",
            F.col("g_coverage")
            * (F.lit(1.0) - F.col("guarantee_fx_haircut"))
            * (F.lit(1.0) - F.col("guarantee_restructuring_haircut")),
        )
        # guarantee priority: highest post-haircut coverage first (the
        # legacy first-wins order, with the reference id as a full
        # deterministic tiebreak where supplied)
        _worder = [F.col("g_coverage").desc(), F.col("g_class")]
        if "guarantee_reference" in g.columns:
            _worder.append(F.col("guarantee_reference"))
        wg = W.partitionBy("exposure_reference").orderBy(*_worder)
        g = g.withColumn("rn", F.row_number().over(wg))
        # --- multi-guarantee stacking (closes the round-≤6 single-
        # guarantee narrowing for the SA substitution channel; ref
        # engine/irb/guarantee.py multi-leg waterfall, re-expressed on-row):
        # guarantees stack in priority order, each claiming the coverage
        # slice still uncovered (capped at 100% of the exposure); each
        # guarantee's SA ladder weight resolves HERE from the same pack
        # table the calculators use, so the calculators can fold the
        # priority-ordered (slice, rw) array without another join. The
        # rank-1 scalars below stay exactly the legacy columns — books
        # with at most one guarantee per exposure price bit-identically.
        _mg_tab = pack.table_df(spark, "sa_rw").select(
            F.col("exposure_class").alias("_mg_class"),
            F.col("cqs").alias("_mg_cqs"),
            F.col("rw").alias("_mg_rw"),
        )
        g = g.join(
            F.broadcast(_mg_tab),
            (F.col("g_class") == F.col("_mg_class"))
            & (F.coalesce(F.col("g_cqs"), F.lit(0)) == F.col("_mg_cqs")),
            "left",
        ).drop("_mg_class", "_mg_cqs")
        _wcum = wg.rowsBetween(W.unboundedPreceding, W.currentRow)
        _cum = F.sum("g_coverage").over(_wcum)
        g = g.withColumn(
            "_mg_slice",
            F.greatest(
                F.least(
                    F.col("g_coverage"), F.lit(1.0) - (_cum - F.col("g_coverage"))
                ),
                F.lit(0.0),
            ),
        )
        # per-leg modelled-guarantor carriers ride inside the stack struct
        # (typed nulls when the bundle declares none) so the IRB channel
        # can price EVERY leg — parameter substitution needs the leg's
        # internal PD + Art.161(1) seniority/FSE LGD pick, double default
        # its class/CQS — without another join (ref engine/irb/guarantee.py
        # multi-leg waterfall)
        _leg_pd = (
            F.col("guarantor_pd").cast("double")
            if "guarantor_pd" in g.columns
            else F.lit(None).cast("double")
        )
        _leg_sen = (
            F.col("guarantor_seniority")
            if "guarantor_seniority" in g.columns
            else F.lit(None).cast("string")
        )
        _leg_fse = (
            F.col("guarantor_is_fse").cast("boolean")
            if "guarantor_is_fse" in g.columns
            else F.lit(None).cast("boolean")
        )
        _gm_aggs = [
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "rn",
                        "_mg_slice",
                        "_mg_rw",
                        _leg_pd.alias("_mg_pd"),
                        _leg_sen.alias("_mg_sen"),
                        _leg_fse.alias("_mg_fse"),
                        F.col("g_class").alias("_mg_gclass"),
                        F.col("g_cqs").alias("_mg_gcqs"),
                    )
                )
            ).alias("_mg_raw")
        ]
        if "guarantee_reference" in g.columns:
            _gm_aggs.append(
                F.sort_array(
                    F.collect_list(F.struct("rn", F.col("guarantee_reference")))
                ).alias("_mg_gref")
            )
        if "guarantor_reference" in g.columns:
            _gm_aggs.append(
                F.sort_array(
                    F.collect_list(F.struct("rn", F.col("guarantor_reference")))
                ).alias("_mg_gtor")
            )
        gm = g.groupBy("exposure_reference").agg(*_gm_aggs)
        _gm_cols = [
            "exposure_reference",
            F.transform(
                F.col("_mg_raw"),
                lambda s: F.struct(
                    s._mg_slice.alias("slice"),
                    s._mg_rw.alias("rw"),
                    s._mg_pd.alias("pd"),
                    s._mg_sen.alias("sen"),
                    s._mg_fse.alias("fse"),
                    s._mg_gclass.alias("gclass"),
                    s._mg_gcqs.alias("gcqs"),
                ),
            ).alias("_mg"),
        ]
        if "guarantee_reference" in g.columns:
            _gm_cols.append(
                F.transform(F.col("_mg_gref"), lambda s: s.guarantee_reference).alias(
                    "guarantee_references"
                )
            )
        if "guarantor_reference" in g.columns:
            _gm_cols.append(
                F.transform(F.col("_mg_gtor"), lambda s: s.guarantor_reference).alias(
                    "guarantor_references"
                )
            )
        gm = gm.select(*_gm_cols)
        g1 = g.where(F.col("rn") == 1).drop("rn", "_mg_slice", "_mg_rw")
        exp = exp.join(F.broadcast(g1), "exposure_reference", "left").join(
            F.broadcast(gm), "exposure_reference", "left"
        )
        if _ucp_dq is not None:
            exp = exp.join(F.broadcast(_ucp_dq), "exposure_reference", "left")
    else:
        exp = exp.withColumns(
            {
                "g_coverage": F.lit(0.0),
                "g_coverage_declared": F.lit(0.0),
                "g_class": F.lit(None).cast("string"),
                "g_cqs": F.lit(None).cast("int"),
            }
        )
    exp = exp.withColumns(
        {
            "g_coverage": F.coalesce("g_coverage", F.lit(0.0)),
            "g_coverage_declared": F.coalesce("g_coverage_declared", F.lit(0.0)),
        }
    )
    # guarantee provenance (ref schemas.py:2925-2926): where in the
    # hierarchy the priced guarantee came from. Books without a
    # beneficiary_type column resolve on exposure_reference only, so their
    # level is always 'exposure' and never inherited; cascade books seal
    # the rank-1 leg's level + the beneficiary it cascaded from
    if "g_src_level" in exp.columns:
        # inherited_from reuses the source-level Column object (same value
        # as reading the just-added column) — one batched projection
        _g_lvl = F.when(
            F.col("g_coverage_declared") > 0,
            F.coalesce(F.col("g_src_level"), F.lit("exposure")),
        )
        exp = exp.withColumns(
            {
                "guarantee_source_level": _g_lvl,
                "guarantee_inherited_from": F.when(
                    (F.col("g_coverage_declared") > 0)
                    & (_g_lvl != "exposure"),
                    F.col("g_src_ref"),
                ),
            }
        ).drop("g_src_level", "g_src_ref")
    else:
        exp = exp.withColumns(
            {
                "guarantee_source_level": F.when(
                    F.col("g_coverage_declared") > 0, F.lit("exposure")
                ),
                "guarantee_inherited_from": F.lit(None).cast("string"),
            }
        )

    # crm_allocation_notes (ref schemas.py:2929 + processor.py:1408
    # _add_crm_audit): one human-readable line naming each mitigant's
    # source level, allocation method and inheritance source
    if "provision_source_level" not in exp.columns:
        exp = exp.withColumns(
            {
                "provision_source_level": F.lit(None).cast("string"),
                "provision_inherited_from": F.lit(None).cast("string"),
            }
        )
    _inh = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.concat(F.lit("<-"), F.col(c))
    ).otherwise(F.lit(""))
    _notes = F.concat_ws(
        "; ",
        F.when(
            F.col("collateral_source_level").isNotNull(),
            F.concat(
                F.lit("collateral@"),
                F.col("collateral_source_level"),
                F.lit("/"),
                F.col("collateral_allocation_method"),
                _inh("collateral_inherited_from"),
            ),
        ),
        F.when(
            F.col("guarantee_source_level").isNotNull(),
            F.concat(
                F.lit("guarantee@"),
                F.col("guarantee_source_level"),
                F.lit("/substitution"),
                _inh("guarantee_inherited_from"),
            ),
        ),
        F.when(
            F.col("provision_source_level").isNotNull(),
            F.concat(
                F.lit("provision@"),
                F.col("provision_source_level"),
                _inh("provision_inherited_from"),
            ),
        ),
    )
    exp = exp.withColumn(
        "crm_allocation_notes", F.when(F.length(_notes) > 0, _notes)
    )

    # warning / DQ list carriers (ref CALCULATION_OUTPUT_SCHEMA
    # calculation_warnings / data_quality_flags; processor.py:499 CRM015,
    # collateral.py:194 CRM016): machine codes and their human-readable
    # twins, fed by the Art.194(4) own-issue gate and the Art.195
    # cross-counterparty netting check; later stage warnings append here
    _empty = F.array().cast("array<string>")
    _dq_parts = [
        F.coalesce(F.col(c), _empty)
        for c in ("_dq_own_issue", "_dq_netting", "_dq_ucp")
        if c in exp.columns
    ]
    _dq = F.concat(*_dq_parts) if _dq_parts else _empty
    # calculation_warnings reuses the _dq Column object (identical value to
    # reading the just-added column) — one batched projection
    exp = exp.withColumns(
        {
            "data_quality_flags": _dq,
            "calculation_warnings": F.transform(
                _dq,
            lambda s: F.when(
                s.startswith("CRM015"),
                F.concat(
                    F.lit("CRM015 own-issue collateral excluded (Art.194(4)): "),
                    F.regexp_replace(s, "^CRM015:", ""),
                ),
            )
            .when(
                s.startswith("CRM012"),
                F.concat(
                    F.lit(
                        "CRM012 guarantee ineligible — unilateral"
                        " cancel/change clause (Art.213(1)(c)(i)): "
                    ),
                    F.regexp_replace(s, "^CRM012:", ""),
                ),
            )
            .otherwise(s),
            ),
        }
    )
    exp = exp.drop(
        *[
            c
            for c in ("_dq_own_issue", "_dq_netting", "_dq_ucp")
            if c in exp.columns
        ]
    )

    return CRMOutput(exposures=exp)
