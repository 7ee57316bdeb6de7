"""Driver-facing query registry: SURVEY.md §2 operator IDs → runnable
(Spark query, DuckDB oracle SQL) pairs on the star-schema testdata.

Each entry demonstrates one engine operator bound to the driver's
tables. The Spark side calls the library operators
(``weather4cast_bigdata_spark.functions`` / ``.operators``); the
oracle is independent ANSI SQL. Column names and rounding are aligned
on both sides because the driver's compare hashes values after
sorting columns by name.

Numeric policy: every derived double is rounded (6-9 decimals) on
BOTH sides so JVM-vs-libm ulp differences can't break hash equality;
integers, strings, and timestamps are emitted exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.functions import scalar, strings, text
from weather4cast_bigdata_spark.operators import (
    aggregates,
    dedup,
    joins,
    setops,
    similarity,
    windows,
)
from weather4cast_bigdata_spark.sources.catalog import load_table


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, QueryDef] = {}


def qdef(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# DuckDB 15-min slot expression (naive timestamp, matches Spark's
# unix_timestamp floor with session tz = UTC).
SLOT_SQL = "make_timestamp(CAST(floor(epoch(ts)/900) AS BIGINT)*900*1000000)"


# =====================================================================
# §2.1 Scans / sources
# =====================================================================


@qdef(
    "scan_file_index",
    oracle=f"""
    SELECT event_id,
           'CTTH_MSG4_' || strftime(ts, '%Y%m%dT%H%M%S') || 'Z.nc' AS filename,
           strptime(strftime(ts, '%Y%m%dT%H%M%S'), '%Y%m%dT%H%M%S') AS file_ts
    FROM events
    """,
)
def q_scan_file_index(spark, sf_dir):
    """Filename ↔ timestamp codec: build the reference's frame
    filename then parse the stamp back (datasets.py:26-36)."""
    events = _t(spark, sf_dir, "events")
    fname = strings.format_ts_filename(F.col("ts"), "CTTH_MSG4_")
    return events.select(
        "event_id",
        fname.alias("filename"),
        strings.parse_filename_ts(fname).alias("file_ts"),
    )


@qdef(
    "partition_subset_select",
    oracle="""
    SELECT event_id, user_id, ts, value
    FROM events
    WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-10 00:00:00'
    """,
)
def q_partition_subset_select(spark, sf_dir):
    """Partition-pruned subset selection (datasets.py:233,263-265;
    main.py:48-52): a pure filter Catalyst pushes to the scan."""
    events = _t(spark, sf_dir, "events")
    return events.where(
        (F.col("event_type") == "purchase") & (F.col("ts") >= F.lit("2024-01-10 00:00:00"))
    ).select("event_id", "user_id", "ts", "value")


@qdef(
    "scan_fallback_source",
    oracle=f"""
    WITH p AS (
        SELECT user_id, {SLOT_SQL} AS slot, avg(value) AS value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    a AS (
        SELECT user_id, {SLOT_SQL} AS slot, avg(value) AS value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.user_id, p.slot,
           round(coalesce(p.value, a.value), 6) AS value
    FROM p LEFT JOIN a ON a.user_id = p.user_id AND a.slot = p.slot
    """,
)
def q_scan_fallback_source(spark, sf_dir):
    """Primary-source scan with alternate fallback: MSG4→MSG2
    (datasets.py:86-89) as left join + coalesce."""
    events = _t(spark, sf_dir, "events")
    slotted = windows.with_time_slot(events, "ts", 15)

    def chan(t):
        return (
            slotted.where(F.col("event_type") == t)
            .groupBy("user_id", "slot")
            .agg(F.avg("value").alias("value"))
        )

    out = joins.join_fallback(chan("purchase"), chan("click"), on=["user_id", "slot"], value_col="value")
    return out.select("user_id", "slot", F.round("value", 6).alias("value"))


# =====================================================================
# §2.2 Projections / filters / predicates
# =====================================================================


@qdef(
    "project_minmax_normalize",
    oracle="""
    SELECT event_id, round((value - 0.0) / 400.0, 9) AS norm_value
    FROM events
    """,
)
def q_project_minmax_normalize(spark, sf_dir):
    """(x-lo)/(hi-lo) → [0,1] (datasets.py:62-64)."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.round(scalar.minmax_normalize(F.col("value"), 0.0, 400.0), 9).alias("norm_value"),
    )


@qdef(
    "predicate_fill_detect",
    oracle="""
    SELECT event_id, CAST(round(value) AS INT) = 0 AS is_fill
    FROM events
    """,
)
def q_predicate_fill_detect(spark, sf_dir):
    """data == _FillValue mask (datasets.py:61) on the quantized value."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        scalar.fill_detect(F.round(F.col("value")).cast("int"), 0).alias("is_fill"),
    )


@qdef(
    "impute_mean_nonfill",
    oracle="""
    SELECT event_id,
           round(CASE WHEN value < 1.0
                 THEN coalesce(avg(CASE WHEN value >= 1.0 THEN value END)
                               OVER (PARTITION BY event_type), 0.0)
                 ELSE value END, 6) AS imputed
    FROM events
    """,
)
def q_impute_mean_nonfill(spark, sf_dir):
    """Fill pixels ← mean of non-fill pixels of the same frame;
    all-fill frame ← 0 (datasets.py:65-69). Frame ≈ event_type,
    fill sentinel ≈ value < 1."""
    from pyspark.sql import Window

    events = _t(spark, sf_dir, "events")
    is_fill = F.col("value") < 1.0
    grp = Window.partitionBy("event_type")
    mean_ok = aggregates.mean_nonfill(F.col("value"), is_fill).over(grp)
    imputed = F.when(is_fill, F.coalesce(mean_ok, F.lit(0.0))).otherwise(F.col("value"))
    return events.select("event_id", F.round(imputed, 6).alias("imputed"))


@qdef(
    "impute_constant",
    oracle="""
    SELECT event_id,
           coalesce(CASE WHEN value < 1.0 THEN NULL ELSE value END, 0.0) AS imputed
    FROM events
    """,
)
def q_impute_constant(spark, sf_dir):
    """Non-temperature fill ← 0.0 (datasets.py:51,70-71): decode fill
    to NULL then coalesce."""
    events = _t(spark, sf_dir, "events")
    nulled = scalar.null_if_fill(F.col("value"), F.col("value") < 1.0)
    return events.select("event_id", scalar.impute_constant(nulled, 0.0).alias("imputed"))


@qdef(
    "project_affine_geo",
    oracle="""
    SELECT event_id,
           round((value + 76.0) / 152.0, 9) AS lon_norm,
           round((value - 23.0) / 63.0, 9) AS lat_norm
    FROM events
    """,
)
def q_project_affine_geo(spark, sf_dir):
    """lon←(lon+76)/152, lat←(lat−23)/63 (datasets.py:142-143)."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.round(scalar.affine(F.col("value"), 76.0, 152.0), 9).alias("lon_norm"),
        F.round(scalar.affine(F.col("value"), -23.0, 63.0), 9).alias("lat_norm"),
    )


@qdef(
    "project_clamp_scale",
    oracle="""
    SELECT event_id,
           round(greatest(value - 200.0, 0.0)
                 / (SELECT max(greatest(value - 200.0, 0.0)) FROM events), 9) AS elev_norm
    FROM events
    """,
)
def q_project_clamp_scale(spark, sf_dir):
    """Elevation: clamp negatives to 0, divide by global max
    (datasets.py:148-149). Global max via agg + broadcast cross join
    (never a single-partition window at scale)."""
    events = _t(spark, sf_dir, "events")
    clamped = events.select("event_id", scalar.clamp_nonneg(F.col("value") - 200.0).alias("clamped"))
    gmax = clamped.agg(F.max("clamped").alias("gmax"))
    return clamped.crossJoin(F.broadcast(gmax)).select(
        "event_id", F.round(F.col("clamped") / F.col("gmax"), 9).alias("elev_norm")
    )


@qdef(
    "project_log_clamp",
    oracle="""
    SELECT event_id, round(ln(greatest(value / 400.0, 0.0002)), 9) AS log_crr
    FROM events
    """,
)
def q_project_log_clamp(spark, sf_dir):
    """log(max(x, 2e-4)) CRR transform (models.py:104-106,158-161)."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.round(scalar.log_clamp(F.col("value") / 400.0), 9).alias("log_crr"),
    )


@qdef(
    "project_logit",
    oracle="""
    SELECT event_id, round(ln(x / (1.0 - x)), 9) AS logit_v
    FROM (SELECT event_id, least(greatest(value/400.0, 0.01), 0.99) AS x FROM events)
    """,
)
def q_project_logit(spark, sf_dir):
    """log(x/(1-x)) (ensemble.py:7-8, models.py:289-290); input clipped
    into the open-(0,1) domain as every reference call site does
    before logit (ensemble.py:12)."""
    events = _t(spark, sf_dir, "events")
    x = F.least(F.greatest(F.col("value") / 400.0, F.lit(0.01)), F.lit(0.99))
    return events.select("event_id", F.round(scalar.logit(x), 9).alias("logit_v"))


@qdef(
    "project_normlogit",
    oracle="""
    SELECT event_id,
           round((ln(x/(1.0-x)) - ln(0.003/0.997))
                 / (ln(0.997/0.003) - ln(0.003/0.997)), 9) AS nl
    FROM (SELECT event_id,
                 least(greatest(value/400.0, 0.003), 0.997) AS x
          FROM events)
    """,
)
def q_project_normlogit(spark, sf_dir):
    """Clip→logit→rescale to [0,1] (ensemble.py:11-15)."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.round(scalar.normlogit(F.col("value") / 400.0), 9).alias("nl"),
    )


@qdef(
    "project_inv_normlogit",
    oracle="""
    SELECT event_id,
           round(1.0 / (1.0 + exp(-((value/400.0) * (ln(0.997/0.003) - ln(0.003/0.997))
                                    + ln(0.003/0.997)))), 9) AS inl
    FROM events
    """,
)
def q_project_inv_normlogit(spark, sf_dir):
    """Sigmoid-based inverse of normlogit (ensemble.py:71-78)."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.round(scalar.inv_normlogit(F.col("value") / 400.0), 9).alias("inl"),
    )


@qdef(
    "project_quantize",
    oracle="""
    SELECT e.event_id,
           CAST(round((e.value/400.0) * (c.hi - c.lo) + c.lo) AS INT) AS qv
    FROM events e
    JOIN (VALUES ('click', 0.0, 22000.0), ('view', 0.0, 500.0),
                 ('purchase', 0.0, 100.0), ('signup', 0.0, 1.0),
                 ('error', 0.0, 1.0)) AS c(event_type, lo, hi)
      ON c.event_type = e.event_type
    """,
)
def q_project_quantize(spark, sf_dir):
    """round(x*(hi-lo)+lo) cast int, per-variable constants from a
    broadcast lookup (datasets.py:379-394; u16→int32 per SURVEY §4)."""
    events = _t(spark, sf_dir, "events")
    consts = events.sparkSession.createDataFrame(
        [("click", 0.0, 22000.0), ("view", 0.0, 500.0), ("purchase", 0.0, 100.0),
         ("signup", 0.0, 1.0), ("error", 0.0, 1.0)],
        ["event_type", "lo", "hi"],
    )
    j = joins.join_static_broadcast(events, consts, on=["event_type"])
    qv = F.round((F.col("value") / 400.0) * (F.col("hi") - F.col("lo")) + F.col("lo")).cast("int")
    return j.select("event_id", qv.alias("qv"))


@qdef(
    "project_channel_select",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'view'
    """,
)
def q_project_channel_select(spark, sf_dir):
    """Restrict to one (product, variable) channel
    (datasets.py:344-346,359-376)."""
    events = _t(spark, sf_dir, "events")
    return events.where(F.col("event_type") == "view").select("event_id", "user_id", "value")


@qdef(
    "conditional_where",
    oracle="""
    SELECT event_id,
           round(CASE WHEN value > 100.0 THEN value * 2.0 ELSE value / 2.0 END, 6) AS branched
    FROM events
    """,
)
def q_conditional_where(spark, sf_dir):
    """tf.where row-level branch (models.py:271)."""
    events = _t(spark, sf_dir, "events")
    out = scalar.conditional_where(
        F.col("value") > 100.0, F.col("value") * 2.0, F.col("value") / 2.0
    )
    return events.select("event_id", F.round(out, 6).alias("branched"))


@qdef(
    "filter_region_membership",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE user_id IN (1, 2, 3, 7, 8)
    """,
)
def q_filter_region_membership(spark, sf_dir):
    """Region whitelist filter (main.py:48-52; intended semantics of
    the missing-return quirk, SURVEY §2.2)."""
    events = _t(spark, sf_dir, "events")
    return events.where(F.col("user_id").isin(1, 2, 3, 7, 8)).select(
        "event_id", "user_id", "event_type"
    )


@qdef(
    "filter_valid_sequence",
    oracle=f"""
    WITH slots AS (
        SELECT DISTINCT event_type, {SLOT_SQL} AS slot FROM events
    ),
    nexts AS (
        SELECT event_type, slot,
               lead(slot, 1) OVER (PARTITION BY event_type ORDER BY slot) AS s1,
               lead(slot, 2) OVER (PARTITION BY event_type ORDER BY slot) AS s2,
               lead(slot, 3) OVER (PARTITION BY event_type ORDER BY slot) AS s3
        FROM slots
    )
    SELECT event_type, slot FROM nexts
    WHERE s1 = slot + INTERVAL 15 MINUTES
      AND s2 = slot + INTERVAL 30 MINUTES
      AND s3 = slot + INTERVAL 45 MINUTES
    """,
)
def q_filter_valid_sequence(spark, sf_dir):
    """Sequence-validity filter: keep start slots with all 4
    consecutive 15-min slots present (datasets.py:39-47). Keyed by
    event_type ≈ (product, region) stream."""
    events = _t(spark, sf_dir, "events")
    slotted = windows.with_time_slot(events, "ts", 15)
    return windows.filter_valid_sequence(slotted, keys=["event_type"], n_slots=4)


@qdef(
    "predicate_rain_event",
    oracle="""
    SELECT user_id, bool_or(value > 250.0) AS has_rain
    FROM events GROUP BY user_id
    """,
)
def q_predicate_rain_event(spark, sf_dir):
    """ANY(x > threshold) per sample (models.py:268-270)."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        aggregates.bool_any(F.col("value") > 250.0).alias("has_rain")
    )


# =====================================================================
# Flagship (M0)
# =====================================================================

from weather4cast_bigdata_spark.plans.flagship import (  # noqa: E402
    FLAGSHIP_ORACLE_SQL,
    flagship_evaluate,
)

REGISTRY["flagship_evaluate"] = QueryDef(
    "flagship_evaluate",
    flagship_evaluate,
    FLAGSHIP_ORACLE_SQL,
    "Evaluate-analog: per-variable persistence MSE with inverse-variance weights.",
)
