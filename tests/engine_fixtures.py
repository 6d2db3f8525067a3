"""Synthetic input-bundle generator for the domain engine — the reference's
benchmark generator shape (ref tests/benchmarks/data_generators.py: numpy,
seed 42, entity mix corporate 35% / retail 30% / institution 15% /
sovereign 10% / specialised 10%, hierarchy depth ≥ 2)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from rwa_calculator_spark.engine.bundles import RawBundle

ENTITY_TYPES = np.array(["corporate", "individual", "institution", "sovereign", "corporate"])
ENTITY_P = np.array([0.35, 0.30, 0.15, 0.10, 0.10])


def build_bundle(spark: SparkSession, n_cp: int = 1000, seed: int = 42) -> RawBundle:
    rng = np.random.default_rng(seed)
    cp_ref = np.array([f"CP{i:07d}" for i in range(n_cp)])
    entity = ENTITY_TYPES[rng.choice(len(ENTITY_TYPES), size=n_cp, p=ENTITY_P)]
    cps = pd.DataFrame(
        {
            "counterparty_reference": cp_ref,
            "entity_type": entity,
            "cqs": rng.integers(0, 7, size=n_cp).astype("int32"),
            "is_managed_as_retail": (entity == "individual") & (rng.random(n_cp) < 0.9),
            "annual_revenue": np.round(rng.lognormal(16, 1.5, size=n_cp), 2),
            "has_irb_permission": rng.random(n_cp) < 0.3,
        }
    )

    n_loans = n_cp * 2
    loans = pd.DataFrame(
        {
            "loan_reference": [f"L{i:08d}" for i in range(n_loans)],
            "counterparty_reference": cp_ref[rng.integers(0, n_cp, size=n_loans)],
            "drawn_amount": np.round(rng.lognormal(11, 1.2, size=n_loans), 2),
            "is_defaulted": rng.random(n_loans) < 0.03,
            "pd": np.round(np.clip(rng.beta(1, 60, size=n_loans), 1e-5, 0.99), 6),
            "lgd": np.round(rng.uniform(0.1, 0.8, size=n_loans), 4),
            "effective_maturity": np.round(rng.uniform(0.5, 6.0, size=n_loans), 2),
        }
    )

    n_cont = n_cp
    contingents = pd.DataFrame(
        {
            "contingent_reference": [f"C{i:08d}" for i in range(n_cont)],
            "counterparty_reference": cp_ref[rng.integers(0, n_cp, size=n_cont)],
            "nominal_amount": np.round(rng.lognormal(11, 1.0, size=n_cont), 2),
            "risk_bucket": np.array(["full_risk", "medium_risk", "medium_low_risk", "low_risk"])[
                rng.integers(0, 4, size=n_cont)
            ],
            "is_defaulted": rng.random(n_cont) < 0.01,
            "pd": np.round(np.clip(rng.beta(1, 60, size=n_cont), 1e-5, 0.99), 6),
            "lgd": np.round(rng.uniform(0.1, 0.8, size=n_cont), 4),
            "effective_maturity": np.round(rng.uniform(0.5, 6.0, size=n_cont), 2),
        }
    )

    n_coll = n_cp // 2
    collateral = pd.DataFrame(
        {
            "collateral_reference": [f"COL{i:07d}" for i in range(n_coll)],
            "market_value": np.round(rng.lognormal(10.5, 1.0, size=n_coll), 2),
            "haircut": np.round(rng.uniform(0.0, 0.3, size=n_coll), 4),
            "currency_mismatch": rng.random(n_coll) < 0.2,
        }
    )
    links = pd.DataFrame(
        {
            "collateral_reference": collateral["collateral_reference"],
            "exposure_reference": loans["loan_reference"].iloc[
                rng.integers(0, n_loans, size=n_coll)
            ].values,
        }
    )

    n_g = n_cp // 4
    guarantees = pd.DataFrame(
        {
            "exposure_reference": loans["loan_reference"].iloc[
                rng.integers(0, n_loans, size=n_g)
            ].values,
            "coverage_pct": np.round(rng.uniform(0.2, 1.0, size=n_g), 4),
            "guarantor_class": np.array(["sovereign", "institution", "corporate"])[
                rng.integers(0, 3, size=n_g)
            ],
            "guarantor_cqs": rng.integers(1, 5, size=n_g).astype("int32"),
        }
    )

    # 60% of counterparties sit in a hierarchy of depth ≥ 2
    child_idx = rng.choice(n_cp, size=int(n_cp * 0.6), replace=False)
    parent_idx = child_idx // 7
    mask = parent_idx != child_idx
    org = pd.DataFrame(
        {
            "child_reference": cp_ref[child_idx[mask]],
            "parent_reference": cp_ref[parent_idx[mask]],
        }
    )

    return RawBundle(
        counterparties=spark.createDataFrame(cps),
        loans=spark.createDataFrame(loans),
        contingents=spark.createDataFrame(contingents),
        collateral=spark.createDataFrame(collateral),
        collateral_links=spark.createDataFrame(links),
        guarantees=spark.createDataFrame(guarantees),
        org_mappings=spark.createDataFrame(org),
    )
