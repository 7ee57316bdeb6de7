"""Seeded weather-cube fixtures (FIXTURES.md §2).

A deterministic miniature of the reference's data model
(SURVEY.md §1): multi-region multi-product frame streams on a 15-min
grid with deliberate gaps, fill values, a midnight-spanning day, and
known-weight ensemble predictions — everything the star schema can't
exercise. Tiny 8×8 grids stand in for 256×256; the pipeline code is
scale-free.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
H = W = 8
REGIONS = ("R1", "R2")
# product → variable (datasets.py:182-196)
PRODUCT_VARS = {
    "CTTH": "temperature",
    "CRR": "crr_intensity",
    "ASII": "asii_turb_trop_prob",
    "CMA": "cma",
}
# variable → (valid_lo, valid_hi, fill_code, quant_hi)
# (decode datasets.py:91-97; postproc_scaling datasets.py:379-384)
VARIABLE_META = {
    "temperature": (0.0, 22000.0, -1.0, 65535),
    "crr_intensity": (0.0, 500.0, -1.0, 65535),
    "asii_turb_trop_prob": (0.0, 100.0, -1.0, 255),
    "cma": (0.0, 1.0, -1.0, 255),
}
# Canonical channel order of the submission (T,C,H,W) array: the
# reference scorer reads channels positionally in target_vars order
# (datasets.py:415), NOT alphabetically. VARIABLE_META insertion order
# is that contract.
TARGET_VARS = tuple(VARIABLE_META)
N_SLOTS = 60
# Start 21:00 so the stream crosses midnight (day-boundary handling,
# datasets.py:450-454).
T0 = dt.datetime(2019, 7, 23, 21, 0, 0)
CADENCE = dt.timedelta(minutes=15)
# Missing slots for R2 (sequence-validity gaps, datasets.py:39-47).
GAP_SLOTS_R2 = {10, 11}
# Fill-value frames for temperature (impute semantics, datasets.py:65-71).
PARTIAL_FILL_SLOT = 5
ALL_FILL_SLOT = 6

ENSEMBLE_K = 3
TRUE_WEIGHTS = (0.5, 0.3, 0.2)


def _slots(region: str) -> list[int]:
    gaps = GAP_SLOTS_R2 if region == "R2" else set()
    return [i for i in range(N_SLOTS) if i not in gaps]


def frames_pdf() -> pd.DataFrame:
    """Long-layout frame table (region, subset, product, variable, ts,
    y, x, value); NULL value = fill pixel."""
    rng = np.random.default_rng(SEED)
    rows = []
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for region in REGIONS:
        for product, variable in PRODUCT_VARS.items():
            lo, hi, _, _ = VARIABLE_META[variable]
            for i in _slots(region):
                ts = T0 + i * CADENCE
                vals = rng.uniform(lo, hi, size=(H, W)).astype(np.float32)
                if variable == "cma":
                    vals = np.round(vals).astype(np.float32)
                mask = np.zeros((H, W), dtype=bool)
                if variable == "temperature" and i == PARTIAL_FILL_SLOT:
                    mask = rng.uniform(size=(H, W)) < 0.3
                if variable == "temperature" and i == ALL_FILL_SLOT:
                    mask[:] = True
                rows.append(
                    pd.DataFrame(
                        {
                            "region": region,
                            "subset": "training",
                            "product": product,
                            "variable": variable,
                            "ts": ts,
                            "y": yy.ravel(),
                            "x": xx.ravel(),
                            "value": np.where(mask.ravel(), np.nan, vals.ravel()),
                        }
                    )
                )
    out = pd.concat(rows, ignore_index=True)
    out["value"] = out["value"].astype("float64")
    return out


def variable_meta_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        [
            {"variable": v, "valid_lo": lo, "valid_hi": hi, "fill_code": fc, "quant_hi": qh}
            for v, (lo, hi, fc, qh) in VARIABLE_META.items()
        ]
    )


def static_grid_pdf() -> pd.DataFrame:
    """Per-pixel lat/lon/elevation with negative elevations
    (clamp semantics, datasets.py:148)."""
    rng = np.random.default_rng(SEED + 1)
    rows = []
    for region in REGIONS:
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        rows.append(
            pd.DataFrame(
                {
                    "region": region,
                    "y": yy.ravel(),
                    "x": xx.ravel(),
                    "latitude": rng.uniform(23, 86, H * W),
                    "longitude": rng.uniform(-76, 76, H * W),
                    "elevation": rng.uniform(-200, 3000, H * W),
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def region_dim_pdf() -> pd.DataFrame:
    """Crop anchors (region_coordinates, datasets.py:113-127)."""
    return pd.DataFrame(
        [
            {"region": "R1", "j0": 935, "i0": 400, "h": H, "w": W},
            {"region": "R2", "j0": 1270, "i0": 930, "h": H, "w": W},
        ]
    )


def predictions_pdf() -> pd.DataFrame:
    """k pseudo-model outputs with truth = Σ wᵢ·predᵢ + ε so the ridge
    fit is assertable (FIXTURES.md §2.5)."""
    rng = np.random.default_rng(SEED + 2)
    n = 4000
    preds = rng.uniform(0.05, 0.95, size=(n, ENSEMBLE_K))
    truth = preds @ np.array(TRUE_WEIGHTS) + rng.normal(0, 0.005, n)
    # Unique (region, ts, y, x) keys: idx decomposes as
    # slot·(H·W) + x·H + y within each region half.
    idx = np.arange(n) % (n // 2)
    base = pd.DataFrame(
        {
            "region": np.where(np.arange(n) < n // 2, "R1", "R2"),
            "ts": [T0 + int(i // (H * W)) * CADENCE for i in idx],
            "variable": "asii_turb_trop_prob",
            "y": idx % H,
            "x": (idx // H) % W,
            "truth": truth,
        }
    )
    frames = []
    for k in range(ENSEMBLE_K):
        f = base.copy()
        f["model_id"] = k
        f["pred"] = preds[:, k]
        frames.append(f)
    return pd.concat(frames, ignore_index=True)


def ensemble_weights_pdf() -> pd.DataFrame:
    """Shipped weight constants as a dim table (main.py:10-33 shape)."""
    rows = []
    for scheme, weights in {
        "equal": [1.0 / ENSEMBLE_K] * ENSEMBLE_K,
        "ridge": list(TRUE_WEIGHTS),
    }.items():
        for k, w in enumerate(weights):
            rows.append(
                {
                    "variable": "asii_turb_trop_prob",
                    "model_id": k,
                    "weight": w,
                    "scheme": scheme,
                }
            )
    return pd.DataFrame(rows)


_FIXTURE_CACHE: dict[str, dict[str, DataFrame]] = {}


def load_fixtures(spark: SparkSession) -> dict[str, DataFrame]:
    """Deterministic fixture tables, memoized per session — ~20
    registry queries consume them, and the pandas→Arrow conversion
    need only happen once per driver run. Keyed by applicationId
    (unique per SparkContext): an ``id(spark)`` key could alias a new
    session allocated at a dead session's recycled address and hand
    out DataFrames bound to a stopped context."""
    key = spark.sparkContext.applicationId
    if key not in _FIXTURE_CACHE:
        _FIXTURE_CACHE.clear()  # one live session at a time
        _FIXTURE_CACHE[key] = {
            "frames": spark.createDataFrame(frames_pdf()),
            "variable_meta": spark.createDataFrame(variable_meta_pdf()),
            "static_grid": spark.createDataFrame(static_grid_pdf()),
            "region_dim": spark.createDataFrame(region_dim_pdf()),
            "predictions": spark.createDataFrame(predictions_pdf()),
            "ensemble_weights": spark.createDataFrame(ensemble_weights_pdf()),
        }
    return _FIXTURE_CACHE[key]
