"""Structured Streaming forms of the batch pipeline (SURVEY.md §2.5
streaming note, §7 M6).

The reference's cadence is one frame / 15 min / (region, product)
(``datasets.py:175``); the live reading of its pipeline is:

- file-arrival micro-batches over the same partitioned lake,
- sliding 36-slot windows (9 h span, 15-min slide) for sequence
  assembly, with a ~24 h watermark covering the previous-day
  fallback tolerance (``datasets.py:430-435``),
- update-mode running aggregates for the ensemble's incremental
  Gram statistics (``ensemble.py:26-41``).

Because the batch operators are pure DataFrame transforms, they
compose onto ``readStream`` unchanged — that is the payoff of the
DataFrame-pure design.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from weather4cast_bigdata_spark.operators.aggregates import gram_matrix_exprs

_DURATION_UNIT_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 604_800_000,
}


def _duration_ms(spec: str) -> int:
    """Parse a CalendarInterval-style duration ("24 hours", "15 minutes")
    into milliseconds — the unit ``GroupState.setTimeoutTimestamp``
    expects."""
    amount_str, unit = spec.strip().split()
    unit = unit.rstrip("s").lower()
    if unit not in _DURATION_UNIT_MS:
        raise ValueError(f"unsupported duration unit in {spec!r}")
    return int(float(amount_str) * _DURATION_UNIT_MS[unit])


def frame_stream(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet"
) -> DataFrame:
    """File-arrival source over the decoded frame lake (one new file
    per cadence tick ≈ the reference's scan loop)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 32)
        .load(path)
    )


def sliding_sequence_windows(
    stream: DataFrame,
    keys: Sequence[str] = ("region",),
    ts_col: str = "ts",
    span: str = "9 hours",
    slide: str = "15 minutes",
    watermark: str = "24 hours",
    value_col: str = "value",
) -> DataFrame:
    """Sliding sequence windows: each window is one candidate
    4+32-frame sequence (36 × 15 min = 9 h, datasets.py:16,173);
    emits per-(key, window) frame counts so completeness
    (= filter_valid_sequence) is a downstream filter ``n_frames ==
    expected``. Late frames up to the watermark still land in their
    window — the streaming form of the previous-day fallback."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.window(ts_col, span, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.avg(value_col).alias("mean_value"),
        )
    )


def running_gram_stats(
    stream: DataFrame,
    pred_cols: Sequence[str],
    truth_col: str,
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Update-mode running Gram statistics — the incremental
    ``(k·A + A_batch)/(k+1)`` mean (ensemble.py:26-41) expressed as
    Spark's native partial+final streaming aggregation."""
    return stream.withWatermark(ts_col, watermark).groupBy().agg(
        *gram_matrix_exprs(pred_cols, truth_col),
        F.count(F.lit(1)).alias("n_rows"),
    )


def stateful_sequence_assembly(
    stream: DataFrame,
    n_past: int = 4,
    ts_col: str = "ts",
    value_col: str = "mean_value",
    state_ttl: str = "24 hours",
    watermark: str = "24 hours",
) -> DataFrame:
    """Custom stateful operator: per-region rolling buffer of the last
    ``n_past`` frame aggregates, emitting a completed predictor window
    per arriving frame (``applyInPandasWithState``). State is bounded
    (n_past rows per key) and expired on EVENT-time timeout: a key's
    state dies when the watermark passes ``state_ttl`` beyond its last
    frame ≈ the previous-day fallback tolerance (datasets.py:430-435)
    — the streaming twin of ``window_past_sequence``.

    Event-time (not processing-time) timeout is deliberate: with
    processing-time timeouts the engine must keep scheduling
    timeout-check batches on the wall clock, so an availableNow /
    processAllAvailable run over a finite lake never terminates; with
    event-time timeouts expiry is driven by the watermark and the
    query drains and stops.

    Expects a pre-aggregated per-(region, ts) frame stream (one row
    per frame), e.g. ``groupBy(region, ts).agg(avg(value))``.
    """
    ttl_ms = _duration_ms(state_ttl)
    out_schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "region", "type": "string", "nullable": True, "metadata": {}},
                {"name": "seq_end_ts", "type": "timestamp", "nullable": True, "metadata": {}},
                {"name": "seq_values", "type": {"type": "array", "elementType": "double", "containsNull": True}, "nullable": True, "metadata": {}},
            ],
        }
    )
    state_schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "ts_list", "type": {"type": "array", "elementType": "long", "containsNull": True}, "nullable": True, "metadata": {}},
                {"name": "val_list", "type": {"type": "array", "elementType": "double", "containsNull": True}, "nullable": True, "metadata": {}},
                {"name": "em_list", "type": {"type": "array", "elementType": "boolean", "containsNull": True}, "nullable": True, "metadata": {}},
            ],
        }
    )

    def assemble(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        if state.hasTimedOut:
            state.remove()
            return
        ts_list, val_list, em_list = state.get if state.exists else ([], [], [])
        ts_list, val_list, em_list = list(ts_list), list(val_list), list(em_list)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for r in pdf.itertuples(index=False):
                ts_us = int(pd.Timestamp(getattr(r, ts_col)).value // 1000)
                # insert in EVENT-time order: a late frame (inside the
                # watermark) lands at its true position, so emitted
                # windows are always time-ordered and end at the
                # arriving frame — never a buffer in arrival order
                idx = bisect.bisect_left(ts_list, ts_us)
                ts_list.insert(idx, ts_us)
                val_list.insert(idx, float(getattr(r, value_col)))
                em_list.insert(idx, False)
                # an interior insert (gap fill) can complete windows
                # ending at ALREADY-buffered later frames, not just the
                # window ending at the arriving frame — scan forward
                # and emit every complete, not-yet-emitted window
                # (append mode: first complete emission wins, no
                # retraction of earlier windows over the same tail)
                for j in range(max(idx, n_past - 1), len(ts_list)):
                    if not em_list[j]:
                        rows.append(
                            {
                                "region": key[0],
                                "seq_end_ts": pd.Timestamp(ts_list[j] * 1000),
                                "seq_values": list(val_list[j + 1 - n_past : j + 1]),
                            }
                        )
                        em_list[j] = True
                if len(ts_list) > n_past:
                    drop = len(ts_list) - n_past
                    ts_list = ts_list[drop:]
                    val_list = val_list[drop:]
                    em_list = em_list[drop:]
        state.update((ts_list, val_list, em_list))
        if ts_list:
            # expire when the watermark passes last_frame + TTL
            state.setTimeoutTimestamp(ts_list[-1] // 1000 + ttl_ms)
        if rows:
            yield pd.DataFrame(rows)

    return stream.withWatermark(ts_col, watermark).groupBy(
        "region"
    ).applyInPandasWithState(
        assemble,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def ewma_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    lookback: int = 8,
    watermark: str = "24 hours",
    state_ttl: str = "48 hours",
) -> DataFrame:
    """Streaming EWMA per region — the live twin of
    ``operators.windows.ewma``: each arriving frame emits the
    exponentially weighted average of the last ``lookback`` frames in
    EVENT-time order, head renormalized over the available prefix.

    Same state discipline as ``stateful_sequence_assembly``: a
    per-region buffer of the last ``lookback`` frames kept sorted by
    event time (late frames inside the watermark insert at their true
    position and trigger emission for every later not-yet-emitted
    frame), append-mode emit-once (no retraction of already-emitted
    scores when a later-arriving interior frame would have changed
    them — first emission wins), event-time TTL so a finite
    availableNow drain terminates. The arithmetic mirrors the batch
    lag-chain term-for-term (sequential k = 0..lookback−1
    accumulation), so a deterministic in-order drain is bit-identical
    to the batch SQL before the shared 6-decimal round.
    """
    ttl_ms = _duration_ms(state_ttl)
    out_schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "region", "type": "string", "nullable": True, "metadata": {}},
                {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
                {"name": "raw_ewma", "type": "double", "nullable": True, "metadata": {}},
            ],
        }
    )
    state_schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "ts_list", "type": {"type": "array", "elementType": "long", "containsNull": True}, "nullable": True, "metadata": {}},
                {"name": "val_list", "type": {"type": "array", "elementType": "double", "containsNull": True}, "nullable": True, "metadata": {}},
                {"name": "em_list", "type": {"type": "array", "elementType": "boolean", "containsNull": True}, "nullable": True, "metadata": {}},
            ],
        }
    )

    def score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        if state.hasTimedOut:
            state.remove()
            return
        ts_list, val_list, em_list = state.get if state.exists else ([], [], [])
        ts_list, val_list, em_list = list(ts_list), list(val_list), list(em_list)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for r in pdf.itertuples(index=False):
                ts_us = int(pd.Timestamp(getattr(r, ts_col)).value // 1000)
                idx = bisect.bisect_left(ts_list, ts_us)
                ts_list.insert(idx, ts_us)
                val_list.insert(idx, float(getattr(r, value_col)))
                em_list.insert(idx, False)
                for j in range(idx, len(ts_list)):
                    if em_list[j]:
                        continue
                    # mirror the batch lag-chain accumulation order
                    num, den = 0.0, 0.0
                    for k in range(min(lookback, j + 1)):
                        w = alpha**k
                        num += val_list[j - k] * w
                        den += w
                    rows.append(
                        {
                            "region": key[0],
                            "ts": pd.Timestamp(ts_list[j] * 1000),
                            "raw_ewma": num / den,
                        }
                    )
                    em_list[j] = True
                if len(ts_list) > lookback:
                    drop = len(ts_list) - lookback
                    ts_list = ts_list[drop:]
                    val_list = val_list[drop:]
                    em_list = em_list[drop:]
        state.update((ts_list, val_list, em_list))
        if ts_list:
            state.setTimeoutTimestamp(ts_list[-1] // 1000 + ttl_ms)
        if rows:
            yield pd.DataFrame(rows)

    return stream.withWatermark(ts_col, watermark).groupBy(
        "region"
    ).applyInPandasWithState(
        score,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def session_windows(
    stream: DataFrame,
    keys: Sequence[str] = ("region",),
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "24 hours",
    value_col: str = "value",
) -> DataFrame:
    """Event-time session windows: frames closer than ``gap`` merge
    into one session per key (``F.session_window`` — state merges
    adjacent sessions as late frames arrive, bounded by the
    watermark). The native streaming twin of the batch
    ``operators.windows.sessionize`` lag+cumsum form: a cadence gap >
    ``gap`` (a dropped satellite feed) closes the session, so session
    count per key is an outage monitor for the 15-min stream
    (datasets.py:175)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.session_window(ts_col, gap).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.avg(value_col).alias("mean_value"),
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str] = ("region", "ts"),
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Idempotent ingest: drop re-delivered frames by key, keeping
    state only within the watermark (``dropDuplicatesWithinWatermark``
    — state is bounded by watermark horizon × key cardinality, unlike
    an unbounded ``dropDuplicates``). The streaming guard for the
    at-least-once file sources the reference's scan loop retries
    (``datasets.py:86-89,430-435``): a replayed satellite frame must
    not double-count in downstream windows or Gram statistics."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def enrich_with_static(
    stream: DataFrame, static: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against
    the broadcast dim snapshot — the standard pattern for attaching
    slowly-changing metadata (region weights, channel calibration,
    source tiers) to a live stream. Stateless: no streaming state, no
    watermark requirement (the static side is re-resolved per batch,
    so a dim refresh is picked up at the next trigger). The broadcast
    hint keeps every batch shuffle-free — the stream side never
    exchanges."""
    return stream.join(F.broadcast(static), on=on, how="inner")


def lsh_ingest(
    spark: SparkSession,
    src: str,
    schema: StructType,
    index_dir: str,
    matches_dir: str,
    ckpt_dir: str,
) -> None:
    """Incremental near-dup ingest as a stream: each arriving
    micro-batch of documents (a) pairs within itself, (b) probes the
    PERSISTED band index built from everything ingested before it,
    then (c) appends its own banded MinHash keys to that index —
    ``sink_lsh_index``'s lifecycle driven by Structured Streaming
    ``foreachBatch`` instead of a manual job per corpus drop.

    The emitted pair set is BATCH-INVARIANT: a colliding pair is
    found within a batch or across the index probe, whichever ingest
    order produced — so the drained result equals the one-shot batch
    LSH join no matter how arrivals were chunked (that identity is
    the oracle). At lake scale the per-batch cost is the batch's own
    bands plus an equi-probe of matching index keys — never a re-scan
    of the accumulated corpus.

    Exactly-once under at-least-once replay: each batch writes to
    ``batch_id=N`` hive subdirs with overwrite — a replayed batch
    (Structured Streaming re-runs foreachBatch after a failure)
    either skips (both outputs already committed) or rewrites its own
    subpaths, never duplicating bands or pairs. The index read checks
    path existence explicitly instead of swallowing exceptions, so a
    corrupt or half-written index FAILS the batch (and the retry
    re-resolves it) rather than silently dropping cross-batch pairs.
    """
    import os

    from pyspark.sql import functions as F

    from weather4cast_bigdata_spark.operators import dedup

    def _hadoop_exists(sess: SparkSession, path: str) -> bool:
        jvm = sess._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(sess._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        out_matches = os.path.join(matches_dir, f"batch_id={batch_id}")
        out_index = os.path.join(index_dir, f"batch_id={batch_id}")
        done_m = os.path.join(out_matches, "_SUCCESS")
        done_i = os.path.join(out_index, "_SUCCESS")
        if _hadoop_exists(sess, done_m) and _hadoop_exists(sess, done_i):
            return  # replayed batch: both outputs already committed
        sig = dedup.minhash_signatures_docs(batch_df)
        bands = dedup.banded_signatures(sig).persist()
        matches = dedup.lsh_candidate_pairs(sig)
        # Prior-batch index shards are batch_id=K siblings of this
        # batch's own (possibly half-written, pre-_SUCCESS) subdir —
        # exclude self so a replay never probes its own partial bands.
        jvm = sess._jvm
        glob = jvm.org.apache.hadoop.fs.Path(
            os.path.join(index_dir, "batch_id=*")
        )
        fs = glob.getFileSystem(sess._jsc.hadoopConfiguration())
        prior = [
            st.getPath().toString()
            for st in fs.globStatus(glob) or []
            if st.getPath().getName() != f"batch_id={batch_id}"
        ]
        if prior:
            idx = sess.read.parquet(*prior)
            cross = (
                bands.alias("n")
                .join(idx.alias("o"), on=["band_idx", "band_key"])
                .select(
                    F.least("n.doc_id", "o.doc_id").alias("id_a"),
                    F.greatest("n.doc_id", "o.doc_id").alias("id_b"),
                )
                .where(F.col("id_a") != F.col("id_b"))
            )
            matches = matches.unionByName(cross)
        matches.distinct().write.mode("overwrite").parquet(out_matches)
        bands.write.mode("overwrite").parquet(out_index)
        bands.unpersist()

    q = (
        frame_stream(spark, src, schema)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def submission_ingest(
    spark: SparkSession,
    src: str,
    schema: StructType,
    staging_dir: str,
    submission_dir: str,
    manifest_dir: str,
    ckpt_dir: str,
    variables: Sequence[str],
    grid: tuple[int, int] = (8, 8),
) -> None:
    """The live form of the competition submit path
    (``sink_submission_h5``): quantized cells arrive in micro-batches
    and the per-(region, day) scorer files (reference
    datasets.py:444-459) are maintained incrementally.

    A (region, day) group can span micro-batches, so a per-batch
    writer alone would publish partial files. Instead each batch
    (a) stages its cells under ``staging_dir/batch_id=N`` partitioned
    by the file axes, then (b) REWRITES the submission files for just
    the groups this batch touched, reading the accumulated staged
    cells for those groups only (partition-pruned — never a full
    corpus re-scan), and (c) records the rewrite's manifest under
    ``manifest_dir/batch_id=N``. After the stream drains, every
    group's file was last rewritten by the final batch that touched
    it, from the complete staged cell set — so the drained file tree
    is BATCH-INVARIANT: byte-identical to the one-shot batch export
    regardless of how arrivals were chunked (that identity is the
    oracle; tests pin it plus replay idempotence).

    Exactly-once under at-least-once replay: every write is a
    deterministic overwrite of batch_id-scoped paths or of the
    group's own file, so a replayed batch rewrites identical bytes;
    fully-committed batches (staging AND manifest ``_SUCCESS``) skip
    outright.
    """
    import os
    from urllib.parse import unquote

    from weather4cast_bigdata_spark.sources import hdf5

    def _exists(sess: SparkSession, path: str) -> bool:
        jvm = sess._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(sess._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        stage = os.path.join(staging_dir, f"batch_id={batch_id}")
        mani = os.path.join(manifest_dir, f"batch_id={batch_id}")
        if _exists(sess, os.path.join(stage, "_SUCCESS")) and _exists(
            sess, os.path.join(mani, "_SUCCESS")
        ):
            return  # replayed, fully committed batch
        (
            batch_df.write.partitionBy("region", "day")
            .mode("overwrite")
            .parquet(stage)
        )
        # Touched groups this batch, recovered from the staged
        # write's OWN directory tree: the static overwrite just
        # materialized exactly this batch's (region, day) groups as
        # partition directories, so one bounded two-level FS listing
        # answers "which groups" without a second Spark job scanning
        # batch_df (r12, guide §1.2 — the old
        # `batch_df.select(region, day).distinct().collect()` re-read
        # every batch row to learn what the write already knows).
        # Listing happens after the write commits, so a replayed
        # batch lists its own rewrite — replay/idempotence unchanged.
        # Values round-trip through Spark's partition-path escaping
        # (%-encoded specials; day is a bare int) via unquote.
        jpath = sess._jvm.org.apache.hadoop.fs.Path
        fs = jpath(stage).getFileSystem(sess._jsc.hadoopConfiguration())
        touched = []
        for rdir in fs.listStatus(jpath(stage)):
            rname = rdir.getPath().getName()
            if not (rdir.isDirectory() and rname.startswith("region=")):
                continue
            for ddir in fs.listStatus(rdir.getPath()):
                dname = ddir.getPath().getName()
                if ddir.isDirectory() and dname.startswith("day="):
                    touched.append(
                        (unquote(rname[len("region="):]),
                         int(dname[len("day="):]))
                    )
        touched.sort()
        if not touched:
            # an empty (replay-tail) batch touches no files; commit an
            # empty manifest so the _SUCCESS skip still works
            sess.createDataFrame([], hdf5.MANIFEST_SCHEMA).write.mode(
                "overwrite"
            ).parquet(mani)
            return
        # single-root read of the staging lake: batch_id / region /
        # day all recover as hive partition columns, one listing
        staged = sess.read.parquet(staging_dir).drop("batch_id")
        pred = None
        for region, day in touched:
            c = (F.col("region") == region) & (F.col("day") == day)
            pred = c if pred is None else (pred | c)
        # equality predicates on partition columns -> partition
        # pruning: only the touched groups' staged files are read
        manifest = hdf5.write_submission_h5(
            staged.where(pred), submission_dir, list(variables), grid
        )
        manifest.write.mode("overwrite").parquet(mani)

    q = (
        frame_stream(spark, src, schema)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def submission_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """Final per-file manifest of a drained ``submission_ingest``:
    the LAST rewrite of each (region, day) saw the group's complete
    staged cell set, so per group the highest-batch_id manifest row
    describes the file on disk. Reading the parent dir (not a glob)
    recovers ``batch_id`` as a hive partition column."""
    from pyspark.sql import Window

    rows = spark.read.parquet(manifest_dir)
    w = Window.partitionBy("region", "day").orderBy(F.col("batch_id").desc())
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup_ingest(
    spark: SparkSession,
    src: str,
    schema: StructType,
    index_dir: str,
    matches_dir: str,
    ckpt_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental EXACT dedup as a stream — the md5 twin of
    :func:`lsh_ingest` and the live form of ``sink_exact_dedup_index``:
    each arriving micro-batch of documents (a) pairs exact duplicates
    within itself, (b) probes the PERSISTED hash index built from
    everything ingested before it, then (c) appends its own
    (text_hash, id) rows to that index. The emitted pair set is
    BATCH-INVARIANT (a duplicate pair is found within a batch or
    across the index probe, whichever ingest order produced), so the
    drained result equals the one-shot exact self-join however
    arrivals were chunked — that identity is the oracle. Per-batch
    cost is the batch's own hashes plus an equi probe of matching
    index keys; the accumulated corpus is never re-hashed or
    re-scanned.

    Exactly-once under at-least-once replay: batch_id-subdir writes
    with overwrite plus a both-outputs ``_SUCCESS`` skip, identical
    to ``lsh_ingest``.
    """
    import os

    from pyspark.sql import functions as F

    def _exists(sess: SparkSession, path: str) -> bool:
        jvm = sess._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(sess._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        out_matches = os.path.join(matches_dir, f"batch_id={batch_id}")
        out_index = os.path.join(index_dir, f"batch_id={batch_id}")
        if _exists(sess, os.path.join(out_matches, "_SUCCESS")) and _exists(
            sess, os.path.join(out_index, "_SUCCESS")
        ):
            return  # replayed batch: both outputs already committed
        hashed = batch_df.select(
            F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col)
        ).persist()
        within = (
            hashed.alias("x")
            .join(hashed.alias("y"), on="text_hash")
            .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(
                F.col(f"x.{id_col}").alias("id_a"),
                F.col(f"y.{id_col}").alias("id_b"),
            )
        )
        jvm = sess._jvm
        glob = jvm.org.apache.hadoop.fs.Path(
            os.path.join(index_dir, "batch_id=*")
        )
        fs = glob.getFileSystem(sess._jsc.hadoopConfiguration())
        prior = [
            st.getPath().toString()
            for st in fs.globStatus(glob) or []
            if st.getPath().getName() != f"batch_id={batch_id}"
        ]
        matches = within
        if prior:
            idx = sess.read.parquet(*prior)
            cross = (
                hashed.alias("n")
                .join(idx.alias("o"), on="text_hash")
                .select(
                    F.least(
                        F.col(f"n.{id_col}"), F.col(f"o.{id_col}")
                    ).alias("id_a"),
                    F.greatest(
                        F.col(f"n.{id_col}"), F.col(f"o.{id_col}")
                    ).alias("id_b"),
                )
                .where(F.col("id_a") != F.col("id_b"))
            )
            matches = matches.unionByName(cross)
        matches.distinct().write.mode("overwrite").parquet(out_matches)
        hashed.write.mode("overwrite").parquet(out_index)
        hashed.unpersist()

    q = (
        frame_stream(spark, src, schema)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
