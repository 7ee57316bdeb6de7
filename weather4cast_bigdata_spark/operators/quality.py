"""Data-quality auditing: declarative constraint checks and numeric
profiling in single aggregation passes (a Deequ-style layer, sized
for 100 TB).

Not a reference operator (its validation is defensive CLI asserts,
``main.py:11,260-272``); added because corpus curation lives on
constraint dashboards — null rates, domain violations, key
uniqueness, value distributions — and the scale discipline is that an
audit of N rules costs ONE scan with map-side-combined counters, not
N scans.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def constraint_audit(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate named row-level constraints in one aggregation pass.

    Each rule is a boolean Column; a row VIOLATES the rule unless the
    predicate is TRUE — a NULL predicate counts as a violation (the
    conservative read: an unverifiable row is not a verified row).
    Returns the long form ``(rule, n_violations, n_rows)``, one row
    per rule, emitted via a zero-shuffle unpivot of the single
    aggregate row.
    """
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    return wide.unpivot(["n_rows"], list(rules), "rule", "n_violations").select(
        "rule", "n_violations", "n_rows"
    )


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows in excess of one per key — the primary-key duplication
    count: ``n_rows − n_distinct_keys``. One shuffle on the key
    (map-side combined count per key would also work; the two-phase
    distinct aggregate lets Catalyst pick)."""
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys])).alias(
            "n_duplicate_rows"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def numeric_histogram(df: DataFrame, col: str, n_bins: int = 10) -> DataFrame:
    """Fixed-width histogram over the column's [min, max] span:
    ``(bin, bin_lo, bin_hi, n)``. Two passes — a 1-row min/max
    aggregate broadcast back, then a map-side-combined bin count —
    which is the floor for a data-dependent binning. The top edge is
    closed (x == max lands in the last bin). NULLs are excluded.
    """
    span = df.where(F.col(col).isNotNull()).agg(
        F.min(col).alias("__lo"), F.max(col).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    binned = (
        df.where(F.col(col).isNotNull())
        .crossJoin(F.broadcast(span))
        .select(
            F.least(
                F.floor((F.col(col) - F.col("__lo")) / width).cast("bigint"),
                F.lit(n_bins - 1).cast("bigint"),
            ).alias("bin"),
            "__lo",
            "__hi",
        )
    )
    return (
        binned.groupBy("bin", "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))).alias("bin_lo"),
            (F.col("__lo") + (F.col("bin") + 1) * (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))).alias("bin_hi"),
            "n",
        )
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass column profiler (Deequ/Glue-crawler shape): per
    column — row count, null count, exact distinct count, min, max —
    unpivoted to the long (column, metric, value) dashboard form.
    Values surface as strings so heterogeneous column types share one
    output schema.

    ONE aggregation: the k count-distincts plan as a single
    expand+aggregate (k× map-side row fan-out, still one shuffle);
    min/max/counts ride the same pass. An N-column profile must never
    cost N scans of a 100 TB table.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    pairs = []
    for c in cols:
        for m in ("rows", "nulls", "distinct", "min", "max"):
            pairs += [
                F.lit(c), F.lit(m), F.col(f"{c}__{m}").cast("string"),
            ]
    return row.select(
        F.explode(
            # stack() needs a SQL string; build the (col, metric, value)
            # triples as an array of structs instead — same expansion,
            # no string templating
            F.array(*[
                F.struct(
                    pairs[i].alias("column"),
                    pairs[i + 1].alias("metric"),
                    pairs[i + 2].alias("value"),
                )
                for i in range(0, len(pairs), 3)
            ])
        ).alias("_p")
    ).select("_p.column", "_p.metric", "_p.value")


def entropy(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact Shannon entropy (nats) of a categorical distribution per
    group: ``−Σ p·ln p`` over the value frequencies — the
    concentration signal profilers pair with distinct counts (0 =
    constant column; ln(k) = uniform over k values).

    Two cascaded aggregations on one scan — (group, value) counts,
    then the entropy fold — both map-side combined; output rounded
    per the engine numeric policy (transcendental aggregate).
    """
    c = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy(group_col)
    p = c.withColumn("_p", F.col("n") / F.sum("n").over(tot))
    return p.groupBy(group_col).agg(
        F.round(-F.sum(F.col("_p") * F.log("_p")) + F.lit(1e-9), 6).alias("entropy"),
        F.count(F.lit(1)).alias("n_values"),
    )


def model_quality_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    reg_param: float = 0.1,
    max_iter: int = 20,
) -> DataFrame:
    """Model-based quality filtering: train a logistic-regression
    quality classifier on cheap text features and score every doc —
    the fastText/classifier gate of production curation stacks
    (GPT-3's WebText-similarity filter, CCNet's LM filter), with the
    label here synthesized from the corpus itself (above-median token
    count) so the pipeline is self-contained and deterministic.

    Distributed by construction via ``pyspark.ml``: L-BFGS fitting is
    one treeAggregate (gradient + loss) over the data per iteration —
    no per-row Python, no driver-side data; scoring is a narrow
    map over the assembled feature vector. Swapping the synthetic
    label for human/LLM quality labels changes nothing structural.
    Deterministic given the data (convex problem + fixed iteration
    budget; coefficients agree across partitionings to ~1e-14, and
    scores are rounded well above that noise).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from weather4cast_bigdata_spark.functions import text as textfn

    toks = textfn.token_count(F.col(text_col)).cast("double")
    feats = docs.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        (F.length(text_col) / (toks + F.lit(1.0))).alias("avg_tok_len"),
        (
            F.length(F.regexp_replace(text_col, r"[^ ]", "")) / (F.length(text_col) + F.lit(1.0))
        ).alias("space_frac"),
    )
    med = feats.approxQuantile("n_tokens", [0.5], 0.0)[0]
    labeled = feats.withColumn(
        "label", (F.col("n_tokens") > F.lit(med)).cast("double")
    )
    va = VectorAssembler(
        inputCols=["avg_tok_len", "space_frac"], outputCol="features"
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    )
    model = lr.fit(va.transform(labeled))
    scored = model.transform(va.transform(labeled))
    from pyspark.ml.functions import vector_to_array

    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        id_col,
        "n_tokens",
        F.round(p1 + F.lit(1e-9), 6).alias("quality_prob"),
        (p1 >= 0.5).alias("keep"),
    )
