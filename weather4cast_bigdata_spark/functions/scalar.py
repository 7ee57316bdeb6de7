"""Scalar projection / predicate / imputation column functions.

Each function rebuilds one scalar transform from the reference as a
pure Catalyst ``Column`` expression (whole-stage-codegen'd JVM-side,
never a Python UDF). Reference citations are ``file:line`` into
``/root/reference/weather4cast/``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- normalization ----------------------------------------------------------


def minmax_normalize(col: Column, lo: float, hi: float) -> Column:
    """``(x - lo) / (hi - lo)`` → [0,1]. Reference: datasets.py:62-64."""
    return (col - F.lit(float(lo))) / F.lit(float(hi) - float(lo))


def minmax_denormalize(col: Column, lo: float, hi: float) -> Column:
    """Inverse of :func:`minmax_normalize`. Reference: datasets.py:387-392."""
    return col * F.lit(float(hi) - float(lo)) + F.lit(float(lo))


def affine(col: Column, offset: float, scale: float) -> Column:
    """``(x + offset) / scale`` — the lat/lon geo-normalization shape.

    Reference: datasets.py:142-143 (lon←(lon+76)/152, lat←(lat−23)/63).
    """
    return (col + F.lit(float(offset))) / F.lit(float(scale))


def clamp_nonneg(col: Column) -> Column:
    """``max(x, 0)`` — elevation clamp. Reference: datasets.py:148."""
    return F.greatest(col, F.lit(0.0))


def log_clamp(col: Column, floor: float = 2e-4) -> Column:
    """``log(max(x, floor))`` — CRR-intensity input transform.

    Reference: models.py:104-106,158-161.
    """
    return F.log(F.greatest(col, F.lit(float(floor))))


# --- logit family -----------------------------------------------------------


def logit(col: Column) -> Column:
    """``log(x / (1-x))``. Reference: ensemble.py:7-8, models.py:289-290."""
    return F.log(col / (F.lit(1.0) - col))


def _logit_const(x: float) -> float:
    return math.log(x / (1.0 - x))


def normlogit(col: Column, lo: float = 0.003, hi: float = 0.997) -> Column:
    """Clip to [lo,hi], logit, rescale back to [0,1].

    Reference: ensemble.py:11-15 (and twins models.py:293-299,
    ensemble.py:64-68). The rescale maps logit(lo)→0, logit(hi)→1.
    """
    llo, lhi = _logit_const(lo), _logit_const(hi)
    clipped = F.least(F.greatest(col, F.lit(float(lo))), F.lit(float(hi)))
    return (logit(clipped) - F.lit(llo)) / F.lit(lhi - llo)


def inv_normlogit(col: Column, lo: float = 0.003, hi: float = 0.997) -> Column:
    """Inverse of :func:`normlogit` (sigmoid-based). Reference: ensemble.py:71-78."""
    llo, lhi = _logit_const(lo), _logit_const(hi)
    z = col * F.lit(lhi - llo) + F.lit(llo)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


# --- fill / imputation ------------------------------------------------------


def fill_detect(col: Column, fill_value: float) -> Column:
    """``x == _FillValue`` mask. Reference: datasets.py:61."""
    return col == F.lit(fill_value)


def impute_constant(col: Column, constant: float = 0.0) -> Column:
    """NULL (decoded fill) → constant. Reference: datasets.py:51,70-71."""
    return F.coalesce(col, F.lit(float(constant)))


def null_if_fill(col: Column, is_fill: Column) -> Column:
    """Decode step: fill pixels become NULL so Spark null-semantics
    (avg skips nulls, coalesce imputes) replace explicit masks."""
    return F.when(~is_fill, col)


# --- quantization -----------------------------------------------------------


def quantize(col: Column, lo: float, hi: float, half_even: bool = False) -> Column:
    """[0,1] → integer code: ``round(x*(hi-lo)+lo)`` cast to int.

    Reference: datasets.py:379-394 (postproc_scaling + uint16 cast;
    Parquet has no u16 so we store int32 — SURVEY.md §4 item 4).
    The reference's ``ndarray.round()`` is round-half-to-EVEN; the
    default here is half-up because the DuckDB oracle shares that
    mode, so cross-engine checks are exact. The two differ only at
    exact .5 ties (≤1 code unit); pass ``half_even=True`` (Spark
    ``bround``) for bit-exact numpy parity.
    """
    denorm = minmax_denormalize(col, lo, hi)
    rounded = F.bround(denorm) if half_even else F.round(denorm)
    return rounded.cast("int")


# --- conditionals -----------------------------------------------------------


def conditional_where(cond: Column, if_true: Column, if_false: Column) -> Column:
    """Row-level branch between two inputs — ``tf.where`` analog.

    Reference: models.py:271 (the wet/dry CRR regime switch).
    """
    return F.when(cond, if_true).otherwise(if_false)
