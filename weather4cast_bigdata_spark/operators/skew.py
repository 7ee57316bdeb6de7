"""Skew mitigation: two-stage salted aggregation (SCALING.md §3).

A power-law key (one hot region, one event-heavy user) puts its whole
group in one reducer. Salting splits each group into ``n_salts``
sub-groups — stage 1 aggregates on (key, salt), stage 2 merges the
sub-aggregates without the salt. Both stages stay partial-aggregable
(map-side combine), so the exchange volume is unchanged; only the
reducer-side hot spot is split. Works for any algebraically
decomposable aggregate; avg is carried as (sum, count) and finished
in stage 2 so the result is bit-identical to the unsalted groupBy up
to float summation order (covered by the engine's rounding policy).

No analog in the reference (single-process, no shuffles); this is
scale infrastructure for the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (stage-1 partial expr builder, stage-2 merge expr builder) per agg.
_DECOMPOSABLE = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-stage salted groupBy.

    ``aggs`` maps output column name → (agg, input column), with agg
    one of sum/count/min/max/avg. ``salt_on`` defaults to a
    deterministic hash of the whole row spread via
    ``spark_partition_id`` — any column expression with high
    cardinality inside hot groups works.

    >>> salted_agg(events, ["event_type"], {"total": ("sum", "value"),
    ...                                     "mean": ("avg", "value")})
    """
    salt = (
        salt_on
        if salt_on is not None
        else F.pmod(F.hash(F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(n_salts))
    )
    stage1_exprs: list[Column] = []
    stage2_exprs: list[Column] = []
    for out, (kind, col) in aggs.items():
        if kind == "avg":
            # Carry (sum, count); finish in stage 2.
            stage1_exprs += [
                F.sum(col).alias(f"__{out}_s"),
                F.count(col).alias(f"__{out}_c"),
            ]
            stage2_exprs.append(
                (F.sum(f"__{out}_s") / F.sum(f"__{out}_c")).alias(out)
            )
        elif kind in _DECOMPOSABLE:
            partial, merge = _DECOMPOSABLE[kind]
            stage1_exprs.append(partial(col).alias(f"__{out}_p"))
            stage2_exprs.append(merge(f"__{out}_p").alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {kind!r}")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*stage1_exprs)
    return stage1.groupBy(*keys).agg(*stage2_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe shuffle join: replicate-and-salt (SCALING.md §3).

    When the probe side has a hot key AND the build side is too big
    to broadcast, a plain shuffle join lands every hot-key row in one
    reducer. Salting splits it: the fact side gets a deterministic
    salt in [0, n_salts) derived from its unique row id (NOT the join
    key — hot-key rows spread uniformly), the dim side is replicated
    n_salts times (explode of a literal sequence — a narrow per-row
    expansion, no shuffle of its own), and the join runs on
    (key, salt). Every reducer sees ≤ 1/n_salts of any key's rows;
    exchange volume grows only by the dim replication factor.

    Result is row-identical to ``fact.join(dim, key)`` — the salt
    never changes which pairs match, only where they are computed.
    """
    if n_salts < 1:
        raise ValueError(f"salted_join: n_salts must be >= 1, got {n_salts}")
    f_cols = [c for c in fact.columns]
    d_cols = [c for c in dim.columns if c != key]
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in f_cols]), F.lit(n_salts)).cast("int"),
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_fact.join(salted_dim, on=[key, "_salt"], how="inner")
        .select(*f_cols, *d_cols)
    )
