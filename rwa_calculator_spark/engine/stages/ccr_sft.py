"""CCR and SFT pipeline stages: netting-set EADs emitted as synthetic
exposure rows into the unified ledger (ref engine/stages/ccr.py:160 and
engine/stages/sft.py:116 — both stages fold into the 11-stage registry at
engine/registry.py:46-58 and their rows flow through classify → CRM →
calculators like any loan).

SA-CCR (BCBS CRE52 / CRR Art.274): EAD = α · (RC + PFE) per netting set,
RC = max(Σ MTM, 0), PFE = Σ per-asset-class supervisory-factor add-ons.
SFT FCCM (CRR Art.223): E* = max(0, Σ lent − Σ collateral·(1−haircut)).

Scale posture: trades are fact-sized; each stage is one or two keyed
group-bys on the netting set (map-side partial sums), a broadcast join for
the supervisory-factor table, then dimension-sized synthetic rows. The
synthetic row count equals the netting-set count — orders of magnitude
below the trade count — so the union into the exposure ledger is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rwa_calculator_spark.engine.rulepack import RulePack
from rwa_calculator_spark.functions.exact import scaled_sum


def _exposure_shape(df: DataFrame, ref_col, etype: str, lgd_col=None) -> DataFrame:
    """Project to the unified exposure-union shape used by run_hierarchy."""
    return df.select(
        ref_col.alias("exposure_reference"),
        F.lit(etype).alias("exposure_type"),
        "counterparty_reference",
        F.col("ead").alias("drawn_amount"),
        F.lit(0.0).alias("undrawn_amount"),
        F.lit(None).cast("string").alias("risk_bucket"),
        F.lit(False).alias("is_defaulted"),
        F.lit(None).cast("double").alias("pd"),
        (F.lit(None).cast("double") if lgd_col is None else lgd_col.cast("double")).alias(
            "lgd"
        ),
        F.lit(None).cast("double").alias("effective_maturity"),
    )


def wwr_gate(trades: DataFrame):
    """Wrong-way-risk identification gate (CRR Art.291; ref
    engine/ccr/wwr.py): each specific-WWR trade (Art.291(1)(b)) breaks out
    into its own single-trade synthetic netting set
    `<ns>__wwr__<trade>` (Art.291(5)(a)) carrying an LGD = 100% override
    (Art.291(5)(c)); general-WWR netting sets are flagged diagnostically.
    Returns (re-keyed trades, error frame | None) — CCR010 per original
    netting set with ≥1 specific-WWR trade, CCR011 per general-WWR set,
    both aggregated at netting-set grain (never trade grain)."""
    has_spec = "is_specific_wwr" in trades.columns
    has_gen = "has_general_wwr_flag" in trades.columns
    if not has_spec and not has_gen:
        return trades, None

    from rwa_calculator_spark.engine.stages.scope import _error_frame

    spark = trades.sparkSession
    errors = spark.createDataFrame(
        [], "code string, severity string, stage string, key string, message string"
    )
    out = trades
    if has_spec:
        spec = F.coalesce("is_specific_wwr", F.lit(False))
        errors = errors.unionByName(
            _error_frame(
                trades.where(spec).select("netting_set_reference").distinct(),
                "CCR010",
                "warning",
                "ccr",
                F.col("netting_set_reference"),
                "specific wrong-way-risk trades carved into own netting sets "
                "with LGD=100% (Art.291(5))",
            )
        )
        out = out.withColumn(
            "netting_set_reference",
            F.when(
                spec,
                F.concat(
                    F.col("netting_set_reference"),
                    F.lit("__wwr__"),
                    F.col("trade_reference"),
                ),
            ).otherwise(F.col("netting_set_reference")),
        ).withColumn(
            "_wwr_lgd_override",
            F.when(spec, F.lit(1.0)).cast("double"),
        )
    if has_gen:
        errors = errors.unionByName(
            _error_frame(
                trades.where(F.coalesce("has_general_wwr_flag", F.lit(False)))
                .select("netting_set_reference")
                .distinct(),
                "CCR011",
                "warning",
                "ccr",
                F.col("netting_set_reference"),
                "netting set flagged for general wrong-way risk (Art.291(6))",
            )
        )
    return out, errors


def ccr_exposures(
    trades: DataFrame,
    pack: RulePack,
    margin_agreements: DataFrame | None = None,
    ccr_collateral: DataFrame | None = None,
) -> DataFrame:
    """SA-CCR synthetic exposures, one per netting set.

    trades: (trade_reference, netting_set_reference, counterparty_reference,
    mtm, notional, asset_class). The supervisory factor joins from the
    rulepack saccr_sf table (broadcast); unknown asset classes take the
    worst factor in the table via coalesce to credit-level 5%.

    When margin_agreements / ccr_collateral are supplied, the full RC and
    PFE treatment applies (ref engine/ccr/rc.py, pfe.py):
      C           = Σ collateral value · (1 − haircut) per set
      RC          = max(V−C, TH+MTA−NICA, 0)   margined (CRR Art.275(2))
                  = max(V−C, 0)                unmargined (Art.275(1))
      multiplier  = min(1, F + (1−F)·e^{(V−C)/(2(1−F)·AddOn)})  (Art.278(3))
      EAD         = α·(RC + multiplier·AddOn)
    Both side frames are netting-set-grain (dimension-sized) → broadcast
    joins; the trade-grain work stays two keyed partial-agg group-bys.
    """
    spark = trades.sparkSession
    sf_table = pack.broadcast_table(spark, "saccr_sf")
    t = trades.join(sf_table, "asset_class", "left").withColumn(
        "sf", F.coalesce("sf", F.lit(0.05))
    )
    has_wwr = "_wwr_lgd_override" in t.columns
    # MPOR cascade inputs (CRR Art.285; ref engine/ccr/maturity_factor.py):
    # engaged only when the margin frame carries remargin_days — bundles
    # without margining cadence keep the distilled MF = 1 shape
    has_mpor = (
        margin_agreements is not None
        and "remargin_days" in margin_agreements.columns
    )
    class_aggs = [
        scaled_sum(F.col("mtm"), 2).alias("class_mtm"),
        scaled_sum(F.col("sf") * F.col("notional"), 2).alias("class_addon"),
        F.max("counterparty_reference").alias("counterparty_reference"),
    ]
    set_aggs = [
        scaled_sum(F.col("class_mtm"), 2).alias("set_mtm"),
        scaled_sum(F.col("class_addon"), 2).alias("aggregate_addon"),
        F.max("counterparty_reference").alias("counterparty_reference"),
    ]
    if has_wwr:
        class_aggs.append(F.max("_wwr_lgd_override").alias("_wwr_lgd_override"))
        set_aggs.append(F.max("_wwr_lgd_override").alias("_wwr_lgd_override"))
    if has_mpor:
        illiquid = (
            F.coalesce("is_illiquid", F.lit(False))
            if "is_illiquid" in t.columns
            else F.lit(False)
        )
        disputed = (
            F.coalesce("is_disputed", F.lit(False)).cast("int")
            if "is_disputed" in t.columns
            else F.lit(0)
        )
        class_aggs += [
            F.count("*").alias("class_n_trades"),
            F.bool_or(illiquid).alias("class_illiquid"),
            F.sum(disputed).alias("class_disputes"),
        ]
        set_aggs += [
            F.sum("class_n_trades").alias("set_n_trades"),
            F.bool_or("class_illiquid").alias("set_illiquid"),
            F.sum("class_disputes").alias("set_disputes"),
        ]
    per_class = t.groupBy("netting_set_reference", "asset_class").agg(*class_aggs)
    per_set = per_class.groupBy("netting_set_reference").agg(*set_aggs)

    if ccr_collateral is not None:
        hc = (
            F.coalesce("haircut", F.lit(0.0))
            if "haircut" in ccr_collateral.columns
            else F.lit(0.0)
        )
        c = ccr_collateral.groupBy("netting_set_reference").agg(
            scaled_sum(F.col("value") * (1 - hc), 2).alias("c_net")
        )
        per_set = per_set.join(F.broadcast(c), "netting_set_reference", "left")
    else:
        per_set = per_set.withColumn("c_net", F.lit(None).cast("double"))
    per_set = per_set.withColumn("c_net", F.coalesce("c_net", F.lit(0.0)))

    v_minus_c = F.col("set_mtm") - F.col("c_net")
    if margin_agreements is not None:
        ma_cols = [
            "netting_set_reference",
            F.col("threshold").cast("double").alias("_th"),
            F.col("mta").cast("double").alias("_mta"),
            F.col("nica").cast("double").alias("_nica"),
        ]
        if has_mpor:
            ma_cols.append(
                F.col("remargin_days").cast("double").alias("_remargin_days")
            )
            ma_cols.append(
                (
                    F.col("mpor_floor_days").cast("double")
                    if "mpor_floor_days" in margin_agreements.columns
                    else F.lit(None).cast("double")
                ).alias("_mpor_floor")
            )
        ma = margin_agreements.select(*ma_cols)
        per_set = per_set.join(F.broadcast(ma), "netting_set_reference", "left")
        rc = F.when(
            F.col("_th").isNotNull(),
            F.greatest(
                v_minus_c,
                F.col("_th") + F.coalesce("_mta", F.lit(0.0)) - F.coalesce("_nica", F.lit(0.0)),
                F.lit(0.0),
            ),
        ).otherwise(F.greatest(v_minus_c, F.lit(0.0)))
    else:
        rc = F.greatest(v_minus_c, F.lit(0.0))

    # Art.278(3) PFE multiplier: <1 only when V−C < 0; AddOn = 0
    # degenerates to 1 (no PFE to scale). Engages only when CSA data was
    # supplied — trades-only bundles keep the distilled α·(RC+AddOn) shape
    # (C is unknown without a collateral feed, so a multiplier computed
    # from V alone would overstate the benefit of negative MTM).
    if margin_agreements is not None or ccr_collateral is not None:
        fl = pack.lit("pfe_multiplier_floor")
        mult = F.when(
            (v_minus_c < 0) & (F.col("aggregate_addon") > 0),
            F.least(
                F.lit(1.0),
                fl
                + (1 - fl)
                * F.exp(v_minus_c / (2 * (1 - fl) * F.col("aggregate_addon"))),
            ),
        ).otherwise(F.lit(1.0))
    else:
        mult = F.lit(1.0)

    # Art.285(2)-(5) MPOR cascade → Art.279c(2) margined maturity factor
    # MF = 1.5·√(MPOR_eff/250), scaling the netting-set add-on (the MPOR is
    # a netting-set attribute, so set-level scaling ≡ per-trade scaling).
    # Unmargined sets (null threshold/remargin) keep MF = 1.
    if has_mpor:
        base = F.when(
            (F.col("set_n_trades") > 5000) | F.col("set_illiquid"), F.lit(20.0)
        ).otherwise(F.lit(10.0))
        doubled = F.when(F.col("set_disputes") > 2, F.lit(2.0)).otherwise(F.lit(1.0)) * base
        mpor_eff = F.greatest(
            doubled + F.col("_remargin_days") - 1,
            F.coalesce("_mpor_floor", F.lit(0.0)),
        )
        mf = F.when(
            F.col("_th").isNotNull() & F.col("_remargin_days").isNotNull(),
            F.lit(1.5) * F.sqrt(mpor_eff / F.lit(250.0)),
        ).otherwise(F.lit(1.0))
    else:
        mf = F.lit(1.0)

    # CRR Art.274(2) second sub-paragraph: alpha = 1.0 (not 1.4) for
    # netting sets whose counterparty is a non-financial counterparty
    # (EMIR Art.2(9)), a pension scheme arrangement (Art.2(10)) or a
    # pension-scheme default-fund position. Carrier-gated on the trades
    # frame's counterparty_type (the COLUMN_VALUE_CONSTRAINTS
    # discriminator, ref data/schemas.py:2193/2219 VALID_CCR_COUNTERPARTY_
    # TYPES + CCR_ALPHA_CARVE_OUT_COUNTERPARTY_TYPES); absent → the
    # standard alpha for every set.
    if "counterparty_type" in trades.columns:
        cp_type = trades.groupBy("netting_set_reference").agg(
            F.max("counterparty_type").alias("_cp_type")
        )
        per_set = per_set.join(F.broadcast(cp_type), "netting_set_reference", "left")
        alpha = F.when(
            F.col("_cp_type").isin(
                "non_financial", "pension_scheme", "pension_default_comp"
            ),
            F.lit(1.0),
        ).otherwise(pack.lit("saccr_alpha"))
    else:
        alpha = pack.lit("saccr_alpha")
    ead = per_set.withColumn(
        "ead", alpha * (rc + mult * mf * F.col("aggregate_addon"))
    )
    return _exposure_shape(
        ead,
        F.concat(F.col("netting_set_reference"), F.lit("_CCR")),
        "ccr",
        lgd_col=F.col("_wwr_lgd_override") if has_wwr else None,
    )


def sft_exposures(sft_trades: DataFrame, pack: RulePack) -> DataFrame:
    """SFT FCCM synthetic exposures, one per netting set.

    sft_trades: (netting_set_reference, counterparty_reference,
    leg 'lent'|'collateral', value, haircut). E* = max(0, Σ lent·(1+HE) −
    Σ collateral·(1−haircut)) — collateral received is haircut-reduced
    before it nets (CRR Art.223(5)).

    HE — the Art.223(5) EXPOSURE-side volatility haircut for lent
    SECURITIES (ref engine/crm/haircuts.py apply_exposure_haircut): when
    the lent legs declare (security_type, security_residual_maturity_years
    [, security_cqs]) the haircut derives from the same Art.224 Table 1 as
    the collateral side, scaled to the Art.224(2)(c) 5-day SFT liquidation
    period via Art.226(2) H5 = H10·sqrt(5/10). Cash lent (no/unknown type)
    and legacy books without the columns keep HE = 0 — the prior shape,
    bit-for-bit.
    """
    spark = sft_trades.sparkSession
    he = F.lit(0.0)
    if {"security_type", "security_residual_maturity_years"} <= set(
        sft_trades.columns
    ):
        bands = pack.broadcast_table(spark, "haircut_bands").select(
            F.col("maturity_band").alias("_band_name"),
            F.col("lo").alias("_band_lo"),
            F.col("hi").alias("_band_hi"),
        )
        sft_trades = sft_trades.withColumn(
            "_he_m", F.coalesce("security_residual_maturity_years", F.lit(0.0))
        ).join(
            bands,
            (F.col("_he_m") > F.col("_band_lo"))
            & (F.col("_he_m") <= F.col("_band_hi")),
            "left",
        )
        _he_cqs = (
            F.coalesce(F.col("security_cqs").cast("int"), F.lit(4))
            if "security_cqs" in sft_trades.columns
            else F.lit(1)
        )
        he_table = pack.broadcast_table(spark, "collateral_haircuts").select(
            F.col("collateral_type").alias("_he_type"),
            F.col("cqs").alias("_he_cqs_t"),
            F.col("maturity_band").alias("_he_band"),
            F.col("haircut").alias("_he_lookup"),
        )
        sft_trades = sft_trades.join(
            he_table,
            (F.col("security_type") == F.col("_he_type"))
            & (_he_cqs == F.col("_he_cqs_t"))
            & (F.coalesce("_band_name", F.lit("any")) == F.col("_he_band")),
            "left",
        )
        # Art.226(2): 10-day base scaled to the 5-day SFT window
        he = F.coalesce("_he_lookup", F.lit(0.0)) * F.sqrt(F.lit(5.0 / 10.0))
    legs = sft_trades.select(
        "netting_set_reference",
        "counterparty_reference",
        F.when(F.col("leg") == "lent", F.col("value") * (1 + he))
        .otherwise(0.0)
        .alias("lent"),
        F.when(
            F.col("leg") == "collateral",
            F.col("value") * (1 - F.coalesce("haircut", F.lit(0.0))),
        )
        .otherwise(0.0)
        .alias("received_adj"),
    )
    per_set = legs.groupBy("netting_set_reference").agg(
        scaled_sum(F.col("lent"), 2).alias("lent_total"),
        scaled_sum(F.col("received_adj"), 2).alias("received_total"),
        F.max("counterparty_reference").alias("counterparty_reference"),
    )
    ead = per_set.withColumn(
        "ead",
        F.greatest(F.col("lent_total") - F.col("received_total"), F.lit(0.0)),
    )
    return _exposure_shape(
        ead, F.concat(F.col("netting_set_reference"), F.lit("_SFT")), "sft"
    )
