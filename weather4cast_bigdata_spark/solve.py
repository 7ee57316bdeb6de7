"""Driver-side ridge solvers for ensemble weights.

The distributed part (Gram statistics) is
``operators.aggregates.gram_matrix`` — a single Spark aggregation.
What remains is a p×p solve with p ≤ 5 (ensemble size,
``main.py:10-33``), which belongs on the driver.

Reference: ensemble.py:38,44-57.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def gram_row_to_matrices(row, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Unpack the one-row gram_matrix() result into (ATA, ATy)."""
    ata = np.empty((k, k), dtype=np.float64)
    for i in range(k):
        for j in range(k):
            lo, hi = min(i, j), max(i, j)
            ata[i, j] = row[f"ata_{lo}_{hi}"]
    aty = np.array([row[f"aty_{i}"] for i in range(k)], dtype=np.float64)
    return ata, aty


def solve_ridge(ata: np.ndarray, aty: np.ndarray, reg_scale: float = 1e-4) -> np.ndarray:
    """Ridge weights: ``(ATA + λI)⁻¹ ATy`` with λ = reg_scale·mean(diag ATA).

    Reference: ensemble.py:38,44-46.
    """
    lam = reg_scale * float(np.mean(np.diag(ata)))
    return np.linalg.solve(ata + lam * np.eye(len(aty)), aty)


def solve_ridge_sum1(ata: np.ndarray, aty: np.ndarray, reg_scale: float = 1e-4) -> np.ndarray:
    """Ridge with Σw = 1 constraint via a bordered (Lagrange) system.

    Reference: ensemble.py:49-57. Two reference quirks, both resolved
    to intended semantics (SURVEY.md §2.8 policy): (a) the reference's
    ``-0.5*q`` upper-right block only rescales the Lagrange
    multiplier — the weight solution is identical to this symmetric
    bordered form; (b) the reference *accepts* a ``regularization``
    argument but never applies it in the sum1 body (unlike the
    unconstrained solver at ensemble.py:44-46) — we regularize
    consistently in both.
    """
    k = len(aty)
    lam = reg_scale * float(np.mean(np.diag(ata)))
    bordered = np.zeros((k + 1, k + 1), dtype=np.float64)
    bordered[:k, :k] = ata + lam * np.eye(k)
    bordered[:k, k] = 1.0
    bordered[k, :k] = 1.0
    rhs = np.concatenate([aty, [1.0]])
    return np.linalg.solve(bordered, rhs)[:k]


def fit_ensemble_weights(
    df: DataFrame, pred_cols: list[str], truth_col: str, sum1: bool = False
) -> np.ndarray:
    """End-to-end: Spark Gram aggregation → driver ridge solve."""
    from weather4cast_bigdata_spark.operators.aggregates import gram_matrix

    row = gram_matrix(df, pred_cols, truth_col).collect()[0]
    ata, aty = gram_row_to_matrices(row, len(pred_cols))
    return solve_ridge_sum1(ata, aty) if sum1 else solve_ridge(ata, aty)
