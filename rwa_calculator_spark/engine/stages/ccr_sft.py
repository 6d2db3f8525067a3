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


def _exposure_shape(df: DataFrame, ref_col, etype: str) -> DataFrame:
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
        F.lit(None).cast("double").alias("lgd"),
        F.lit(None).cast("double").alias("effective_maturity"),
    )


def ccr_exposures(trades: DataFrame, pack: RulePack) -> DataFrame:
    """SA-CCR synthetic exposures, one per netting set.

    trades: (trade_reference, netting_set_reference, counterparty_reference,
    mtm, notional, asset_class). The supervisory factor joins from the
    rulepack saccr_sf table (broadcast); unknown asset classes take the
    worst factor in the table via coalesce to credit-level 5%.
    """
    spark = trades.sparkSession
    sf_table = pack.broadcast_table(spark, "saccr_sf")
    t = trades.join(sf_table, "asset_class", "left").withColumn(
        "sf", F.coalesce("sf", F.lit(0.05))
    )
    per_class = t.groupBy("netting_set_reference", "asset_class").agg(
        scaled_sum(F.col("mtm"), 2).alias("class_mtm"),
        scaled_sum(F.col("sf") * F.col("notional"), 2).alias("class_addon"),
        F.max("counterparty_reference").alias("counterparty_reference"),
    )
    per_set = per_class.groupBy("netting_set_reference").agg(
        scaled_sum(F.col("class_mtm"), 2).alias("set_mtm"),
        scaled_sum(F.col("class_addon"), 2).alias("aggregate_addon"),
        F.max("counterparty_reference").alias("counterparty_reference"),
    )
    ead = per_set.withColumn(
        "ead",
        pack.lit("saccr_alpha")
        * (F.greatest(F.col("set_mtm"), F.lit(0.0)) + F.col("aggregate_addon")),
    )
    return _exposure_shape(
        ead, F.concat(F.col("netting_set_reference"), F.lit("_CCR")), "ccr"
    )


def sft_exposures(sft_trades: DataFrame, pack: RulePack) -> DataFrame:
    """SFT FCCM synthetic exposures, one per netting set.

    sft_trades: (netting_set_reference, counterparty_reference,
    leg 'lent'|'collateral', value, haircut). E* = max(0, Σ lent −
    Σ collateral·(1−haircut)) — collateral received is haircut-reduced
    before it nets (CRR Art.223(5)).
    """
    legs = sft_trades.select(
        "netting_set_reference",
        "counterparty_reference",
        F.when(F.col("leg") == "lent", F.col("value")).otherwise(0.0).alias("lent"),
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
