"""M5/M6 surface tests: NetCDF-lake ETL plumbing, batched inference,
multimodal stubs, and the Structured Streaming forms."""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.operators import inference, multimodal
from weather4cast_bigdata_spark.sources import netcdf
from weather4cast_bigdata_spark.streaming import pipeline as streaming


# --- NetCDF lake ETL --------------------------------------------------------


@pytest.fixture(scope="module")
def fake_lake(tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    for region in ("R1", "R2"):
        for product in ("CTTH", "CRR"):
            d = root / "w4c" / region / "training" / "2019204" / product
            d.mkdir(parents=True, exist_ok=True)
            for hhmm in ("060000", "061500", "063000"):
                name = f"S_NWC_{product}_MSG4_{region}-VISIR_20190723T{hhmm}Z.nc"
                (d / name).write_bytes(os.urandom(256))
    return str(root)


def test_scan_and_decode(spark, fake_lake):
    scanned = netcdf.scan_frame_files(spark, f"{fake_lake}/w4c/*/*/*/*/*.nc")
    rows = scanned.select("region", "subset", "product", "ts").collect()
    assert len(rows) == 12
    assert {r["region"] for r in rows} == {"R1", "R2"}
    assert all(r["ts"].minute in (0, 15, 30) for r in rows)

    decoded = netcdf.decode_frames(
        scanned,
        product_vars={"CTTH": ["temperature"], "CRR": ["crr_intensity"]},
        grid=(8, 8),
    )
    n = decoded.count()
    assert n == 12 * 8 * 8  # one variable per product per file
    # Deterministic decode: same plan twice → identical content hash.
    h = lambda df: df.agg(F.sum(F.hash("region", "variable", "y", "x", "value"))).collect()[0][0]
    assert h(decoded) == h(
        netcdf.decode_frames(
            scanned,
            product_vars={"CTTH": ["temperature"], "CRR": ["crr_intensity"]},
            grid=(8, 8),
        )
    )


def test_etl_partitioned_sink(spark, fake_lake, tmp_path):
    scanned = netcdf.scan_frame_files(spark, f"{fake_lake}/w4c/*/*/*/*/*.nc")
    decoded = netcdf.decode_frames(scanned, {"CTTH": ["temperature"]}, grid=(4, 4))
    out = str(tmp_path / "frames")
    netcdf.etl_to_parquet(decoded, out)
    back = spark.read.parquet(out)
    assert back.count() == 6 * 16
    # Hive partitioning restored partition columns; pruning applies.
    assert {"region", "subset", "day", "product"} <= set(back.columns)
    plan = back.where(F.col("region") == "R1")._jdf.queryExecution().executedPlan().toString()
    assert "R1" in plan  # partition filter reached the scan


# --- Inference --------------------------------------------------------------


def test_predict_frames_linear(spark):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 0.01).alias("f1"),
        (F.col("id") * 0.02).alias("f2"),
    )
    w = np.array([2.0, -1.0])
    out = inference.predict_frames(
        df, ["f1", "f2"], lambda: inference.linear_stub_model(w)
    )
    bad = out.where(
        F.abs(F.col("pred") - (F.col("f1") * 2.0 - F.col("f2"))) > 1e-12
    ).count()
    assert bad == 0


def test_crr_combo_switch(spark):
    rows = [
        ("s1", 0.5, 10.0, 20.0),   # rain in sample s1 (0.5 > 0.026)
        ("s1", 0.0, 11.0, 21.0),
        ("s2", 0.001, 12.0, 22.0),  # no rain in s2
        ("s2", 0.002, 13.0, 23.0),
    ]
    df = spark.createDataFrame(rows, ["sample", "crr_intensity", "wet", "dry"])
    out = inference.crr_combo_switch(df, ["sample"], "wet", "dry").collect()
    got = {(r["sample"], r["pred"]) for r in out}
    assert got == {("s1", 10.0), ("s1", 11.0), ("s2", 22.0), ("s2", 23.0)}


# --- Multimodal -------------------------------------------------------------


def test_image_features_contract(spark):
    rows = [
        (1, "image", b"fakejpegbytes1", "image/jpeg", 640, 480, None),
        (2, "image", b"fakejpegbytes2", "image/jpeg", 800, 600, None),
        (3, "audio", b"fakewav", "audio/wav", None, None, 2000),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    feats = multimodal.decode_image_features(media, resize_to=(16, 16), n_features=8)
    out = feats.collect()
    assert len(out) == 2  # audio row filtered by the image stage
    for r in out:
        assert len(r["features"]) == 8
        assert 0.0 <= r["mean_luma"] <= 1.0
    # Determinism: content-seeded fake decode.
    again = multimodal.decode_image_features(media, resize_to=(16, 16), n_features=8).collect()
    assert sorted(r["features"] for r in again) == sorted(r["features"] for r in out)


def test_frame_sample_plan(spark):
    rows = [
        (1, "video", b"v1", "video/mp4", None, None, 3500),
        (2, "image", b"i1", "image/png", 10, 10, None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    frames = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ms"] for r in frames] == [0, 1000, 2000, 3000]


# --- Streaming --------------------------------------------------------------


@pytest.fixture()
def frame_stream_dir(spark, tmp_path):
    t0 = dt.datetime(2019, 7, 23, 21, 0, 0)
    rows = [
        ("R1", t0 + i * dt.timedelta(minutes=15), float(i))
        for i in range(12)
    ] + [
        ("R2", t0 + i * dt.timedelta(minutes=15), float(100 + i))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["region", "ts", "value"])
    path = str(tmp_path / "stream_in")
    df.coalesce(2).write.parquet(path)
    return path, df.schema


def _run_stream(q_df, name):
    q = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name.startswith("agg") else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_sliding_sequence_windows(spark, frame_stream_dir):
    path, schema = frame_stream_dir
    stream = streaming.frame_stream(spark, path, schema)
    assert stream.isStreaming
    win = streaming.sliding_sequence_windows(
        stream, span="1 hour", slide="15 minutes"
    )
    _run_stream(win, "agg_windows")
    out = spark.sql("SELECT * FROM agg_windows").collect()
    assert out
    # A fully-covered 1h window holds 4 frames — completeness filter.
    full = [r for r in out if r["n_frames"] == 4 and r["region"] == "R1"]
    assert full


def test_running_gram_stats_stream(spark, frame_stream_dir):
    path, schema = frame_stream_dir
    stream = streaming.frame_stream(spark, path, schema).select(
        "ts",
        (F.col("value") / 100.0).alias("p1"),
        (F.col("value") / 200.0).alias("p2"),
        (F.col("value") / 50.0).alias("y"),
    )
    g = streaming.running_gram_stats(stream, ["p1", "p2"], "y")
    _run_stream(g, "agg_gram")
    row = spark.sql("SELECT * FROM agg_gram").collect()[0]
    assert row["n_rows"] == 18
    assert row["ata_0_0"] > 0


def test_stateful_sequence_assembly(spark, frame_stream_dir):
    path, schema = frame_stream_dir
    stream = streaming.frame_stream(spark, path, schema).select(
        "region", "ts", F.col("value").alias("mean_value")
    )
    seqs = streaming.stateful_sequence_assembly(stream, n_past=4)
    _run_stream(seqs, "seq_assembly")
    out = spark.sql("SELECT * FROM seq_assembly").collect()
    by_region = {}
    for r in out:
        by_region.setdefault(r["region"], []).append(r)
    # R1: 12 frames → 9 completed 4-windows; R2: 6 → 3.
    assert len(by_region["R1"]) == 9
    assert len(by_region["R2"]) == 3
    assert all(len(r["seq_values"]) == 4 for r in out)


def test_dedup_within_watermark_drops_replay(spark, tmp_path):
    """A re-delivered (region, ts) frame — the at-least-once file
    source replaying — must reach downstream exactly once."""
    t0 = dt.datetime(2019, 7, 23, 21, 0, 0)
    rows = [("R1", t0 + i * dt.timedelta(minutes=15), float(i)) for i in range(4)]
    dup = [rows[1], rows[2]]  # replayed frames
    df = spark.createDataFrame(rows + dup, ["region", "ts", "value"])
    path = str(tmp_path / "replay_in")
    df.coalesce(1).write.parquet(path)
    stream = streaming.frame_stream(spark, path, df.schema)
    out = streaming.dedup_within_watermark(stream, keys=["region", "ts"])
    _run_stream(out, "append_dedup")
    got = spark.sql("SELECT region, ts, value FROM append_dedup").collect()
    assert len(got) == 4
    assert len({(r.region, r.ts) for r in got}) == 4


def test_session_windows_split_on_gap(spark, tmp_path):
    """A cadence gap larger than the session gap closes the session:
    8 frames with one 45-min hole yield exactly two sessions."""
    t0 = dt.datetime(2019, 7, 23, 21, 0, 0)
    times = [0, 15, 30, 45, 105, 120, 135, 150]  # minutes; 45→105 gap
    rows = [("R1", t0 + dt.timedelta(minutes=m), 1.0) for m in times]
    df = spark.createDataFrame(rows, ["region", "ts", "value"])
    path = str(tmp_path / "gap_in")
    df.coalesce(1).write.parquet(path)
    st = streaming.frame_stream(spark, path, df.schema)
    out = streaming.session_windows(st, gap="30 minutes")
    _run_stream(out, "agg_sessions")
    got = spark.sql("SELECT n_frames FROM agg_sessions ORDER BY n_frames").collect()
    assert [r.n_frames for r in got] == [4, 4]


def test_jsonl_corrupt_line_quarantined(spark, tmp_path):
    """One malformed JSONL line must neither kill the scan nor vanish:
    PERMISSIVE mode lands it in _corrupt_record; clean reads drop it."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from weather4cast_bigdata_spark.sources import jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also good"}\n'
    )
    schema = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])
    clean = jsonl.read_jsonl(spark, str(p), schema)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    kept = jsonl.read_jsonl(spark, str(p), schema, keep_corrupt=True)
    corrupt = [r for r in kept.collect() if r[jsonl.CORRUPT_COL] is not None]
    assert len(corrupt) == 1 and "NOT JSON" in corrupt[0][jsonl.CORRUPT_COL]


def test_csv_roundtrip_quotes_newlines_nulls(spark, tmp_path):
    """write_csv/read_csv must share ONE quoting convention: text with
    embedded double quotes, commas, newlines, an empty string, and a
    true NULL all survive the round-trip bit-exact (no silent
    DROPMALFORMED row loss from a writer/reader escape mismatch)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from weather4cast_bigdata_spark.sources import jsonl

    rows = [
        (1, 'she said "hi, there"'),
        (2, "line one\nline two"),
        (3, ""),
        (4, None),
        (5, 'trailing quote"'),
    ]
    schema = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "docs_csv")
    jsonl.write_csv(df, out)
    back = jsonl.read_csv(spark, out, schema)
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == {r[0]: r[1] for r in rows}


def test_stateful_assembly_orders_late_frames(spark, tmp_path):
    """A frame delivered late (but inside the watermark) lands at its
    event-time position: emitted windows are time-ordered and end at
    the late frame, never an arrival-ordered buffer."""
    t0 = dt.datetime(2019, 7, 23, 21, 0, 0)
    m = dt.timedelta(minutes=15)
    batch1 = [("R1", t0 + i * m, float(i)) for i in (0, 1, 3)]
    late = [("R1", t0 + 2 * m, 2.0)]
    df1 = spark.createDataFrame(batch1, ["region", "ts", "mean_value"])
    df2 = spark.createDataFrame(late, ["region", "ts", "mean_value"])
    path = str(tmp_path / "late_in")
    df1.coalesce(1).write.parquet(path)
    df2.coalesce(1).write.mode("append").parquet(path)
    st = (
        spark.readStream.format("parquet")
        .schema(df1.schema)
        # one file per micro-batch: the late frame MUST ride a later
        # batch than t0/t1/t3, exercising the interior-gap-fill path
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    seqs = streaming.stateful_sequence_assembly(st, n_past=4)
    _run_stream(seqs, "append_late")
    got = spark.sql("SELECT seq_end_ts, seq_values FROM append_late").collect()
    # regardless of which micro-batch the late frame rode in, any
    # emitted full window must be in time order
    for r in got:
        assert r.seq_values == sorted(r.seq_values) or len(set(r.seq_values)) < 4
    full = [r for r in got if len(r.seq_values) == 4]
    # the interior t2 fill completes the window ending at the
    # ALREADY-buffered t3 — it must be emitted, not dropped
    assert len(full) == 1
    assert full[0].seq_values == [0.0, 1.0, 2.0, 3.0]
    assert full[0].seq_end_ts == t0 + 3 * m


def test_audio_features_null_row_skipped(spark):
    """A NULL-content / NULL-duration media row is skipped, not a
    stage-killing crash."""
    rows = [
        (1, "audio", b"real bytes", "audio/wav", 0, 0, 1000),
        (2, "audio", None, "audio/wav", 0, 0, None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_audio_features(media).collect()
    assert [r.media_id for r in out] == [1]


class _FakePILImage:
    """Minimal PIL.Image stand-in proving the REAL decode branch:
    open() parses a tiny 'P2h,w:' header + raw bytes; convert/resize
    behave like PIL's API surface used by _image_pixels."""

    def __init__(self, arr):
        self.arr = arr

    @staticmethod
    def open(buf):
        raw = buf.read()
        if not raw.startswith(b"P2"):
            raise OSError("cannot identify image file")
        header, payload = raw.split(b":", 1)
        h, w = (int(x) for x in header[2:].split(b","))
        a = np.frombuffer(payload[: h * w], dtype=np.uint8).reshape(h, w)
        return _FakePILImage(a)

    def convert(self, mode):
        assert mode == "L"
        return self

    def resize(self, size):
        w, h = size
        # nearest-neighbor resize, enough to prove the plumbing
        ys = (np.arange(h) * self.arr.shape[0] // h).clip(0, self.arr.shape[0] - 1)
        xs = (np.arange(w) * self.arr.shape[1] // w).clip(0, self.arr.shape[1] - 1)
        return _FakePILImage(self.arr[np.ix_(ys, xs)])

    def __array__(self, dtype=None, copy=None):
        return self.arr.astype(dtype or np.uint8)


def test_image_pixels_real_pil_branch(monkeypatch):
    """With a codec library present the REAL branch runs: bytes are
    decoded (not hash-faked), grayscale-resized to (h, w); corrupt
    bytes skip (None), never raise."""
    monkeypatch.setattr(multimodal, "Image", _FakePILImage)
    monkeypatch.setattr(multimodal, "HAVE_PIL", True)
    src = np.arange(64, dtype=np.uint8).reshape(8, 8)
    content = b"P28,8:" + src.tobytes()
    px = multimodal._image_pixels(content, 4, 4)
    assert px is not None and px.shape == (4, 4) and px.dtype == np.uint8
    # real decode: pixels come from the payload, not the md5 fake
    assert px[0, 0] == src[0, 0]
    assert not np.array_equal(px, multimodal._fake_pixels(content, 4, 4))
    assert multimodal._image_pixels(b"not an image", 4, 4) is None


class _FakeSoundfile:
    @staticmethod
    def read(buf, dtype="float32"):
        raw = buf.read()
        if not raw.startswith(b"RIFF"):
            raise RuntimeError("File contains data in an unknown format")
        data = np.frombuffer(raw[4:], dtype=np.float32)
        return data.reshape(-1, 2), 16_000  # stereo, to prove downmix


def test_audio_waveform_real_soundfile_branch(monkeypatch):
    monkeypatch.setattr(multimodal, "soundfile", _FakeSoundfile)
    monkeypatch.setattr(multimodal, "HAVE_SOUNDFILE", True)
    stereo = np.array([[1.0, 0.0], [0.5, 0.5], [-1.0, 0.0]], dtype=np.float32)
    content = b"RIFF" + stereo.tobytes()
    wav = multimodal._audio_waveform(content, n_fallback=999)
    assert wav is not None and wav.dtype == np.float32
    # stereo downmixed to mono, length from the DECODED data (not the
    # duration-derived fallback)
    assert wav.shape == (3,)
    np.testing.assert_allclose(wav, [0.5, 0.5, -0.5])
    assert multimodal._audio_waveform(b"garbage", n_fallback=4) is None


def test_ewma_stream_late_frame_emits_once(spark, tmp_path):
    """The streaming EWMA mirrors the assembly's late-frame rules: a
    late interior frame is scored at its event-time position, and an
    already-emitted later score is NOT retracted (append-mode
    emit-once: the t3 score keeps the value computed before t2
    arrived)."""
    t0 = dt.datetime(2019, 7, 23, 21, 0, 0)
    m = dt.timedelta(minutes=15)
    batch1 = [("R1", t0 + i * m, float(i)) for i in (0, 1, 3)]
    late = [("R1", t0 + 2 * m, 2.0)]
    df1 = spark.createDataFrame(batch1, ["region", "ts", "value"])
    df2 = spark.createDataFrame(late, ["region", "ts", "value"])
    path = str(tmp_path / "ewma_late_in")
    df1.coalesce(1).write.parquet(path)
    df2.coalesce(1).write.mode("append").parquet(path)
    st = (
        spark.readStream.format("parquet")
        .schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    scored = streaming.ewma_stream(st, alpha=0.5, lookback=8)
    _run_stream(scored, "ewma_late")
    got = {r.ts: r.raw_ewma for r in spark.sql("SELECT ts, raw_ewma FROM ewma_late").collect()}
    assert len(got) == 4  # every frame scored exactly once
    assert got[t0] == 0.0
    # t3 scored on arrival over {0,1,_,3}: (3 + .5*1 + .25*0)/1.75
    assert abs(got[t0 + 3 * m] - 3.5 / 1.75) < 1e-9
    # the late t2 scored at its true position over {0,1,2}
    assert abs(got[t0 + 2 * m] - (2 + 0.5 * 1 + 0.25 * 0) / 1.75) < 1e-9


# --- incremental LSH ingest (lsh_ingest) ------------------------------------


def _lsh_dirs(tmp_path, tag):
    d = tmp_path / tag
    return (
        str(d / "index"),
        str(d / "matches"),
        str(d / "ckpt"),
    )


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Documents with guaranteed near-dup structure: the sf corpus
    plus exact copies under shifted ids, so the LSH pair set is
    non-empty and known to include every (i, i+10000) pair."""
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    dups = docs.withColumn("doc_id", F.col("doc_id") + F.lit(10000))
    return docs.unionByName(dups)


def _pairs(df):
    return {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in df.select("id_a", "id_b").collect()
    }


def test_lsh_ingest_batch_invariant(spark, tmp_path, dup_docs):
    """Drained incremental ingest == one-shot batch LSH join, however
    arrivals were chunked (the documented batch-invariance oracle)."""
    from weather4cast_bigdata_spark.operators import dedup

    src = str(tmp_path / "src")
    # >32 files => maxFilesPerTrigger=32 splits the corpus into
    # multiple micro-batches, exercising the cross-batch index probe
    dup_docs.repartition(96).write.parquet(src)
    index_dir, matches_dir, ckpt = _lsh_dirs(tmp_path, "run1")
    streaming.lsh_ingest(
        spark, src, dup_docs.schema, index_dir, matches_dir, ckpt
    )
    got = _pairs(spark.read.parquet(matches_dir))
    want = _pairs(
        dedup.lsh_candidate_pairs(dedup.minhash_signatures_docs(dup_docs))
    )
    assert want, "oracle pair set is empty - fixture broken"
    assert got == want


def test_lsh_ingest_replay_idempotent(spark, tmp_path, dup_docs):
    """A replayed batch (same batch_id, fresh checkpoint) must not
    duplicate bands in the index or pairs in matches: re-running the
    whole ingest against the same output dirs leaves the drained
    result byte-identical (foreachBatch exactly-once pattern)."""
    src = str(tmp_path / "src2")
    dup_docs.repartition(64).write.parquet(src)
    index_dir, matches_dir, ckpt1 = _lsh_dirs(tmp_path, "run2")
    streaming.lsh_ingest(
        spark, src, dup_docs.schema, index_dir, matches_dir, ckpt1
    )
    before_pairs = spark.read.parquet(matches_dir).count()
    before_idx = spark.read.parquet(index_dir).count()
    # fresh checkpoint, same sinks -> every batch replays with the
    # same batch_id sequence; the _SUCCESS guard must skip them all
    ckpt2 = str(tmp_path / "run2" / "ckpt_replay")
    streaming.lsh_ingest(
        spark, src, dup_docs.schema, index_dir, matches_dir, ckpt2
    )
    assert spark.read.parquet(matches_dir).count() == before_pairs
    assert spark.read.parquet(index_dir).count() == before_idx


# --- incremental submission export (submission_ingest) -----------------------


@pytest.fixture(scope="module")
def sub_cells(spark):
    """Quantized submission cells from the seeded weather fixtures —
    the exact input of the batch h5 export (sink_submission_h5)."""
    from weather4cast_bigdata_spark.plans import weather
    from weather4cast_bigdata_spark.sources import weather_fixtures

    fx = dict(weather_fixtures.load_fixtures(spark))
    dec = weather.impute(
        weather.decode_normalize(fx["frames"], fx["variable_meta"])
    )
    dec = dec.withColumn("norm", F.least(F.col("norm"), F.lit(1.0)))
    q = weather.quantize_for_submission(dec, fx["variable_meta"])
    return q.select("region", "day", "variable", "ts", "y", "x", "qv")


_SUB_VARS = ["temperature", "crr_intensity", "asii_turb_trop_prob", "cma"]


def _sub_dirs(tmp_path, tag):
    d = tmp_path / tag
    return (
        str(d / "staging"),
        str(d / "submission"),
        str(d / "manifest"),
        str(d / "ckpt"),
    )


def _file_arrays(sub_dir):
    import glob

    from weather4cast_bigdata_spark.sources import hdf5

    out = {}
    for p in sorted(
        glob.glob(f"{sub_dir}/*/test/*.np*") + glob.glob(f"{sub_dir}/*/test/*.h5")
    ):
        rel = os.path.relpath(p, sub_dir)
        out[rel] = hdf5.read_submission(p)
    return out


def test_submission_ingest_batch_invariant(spark, tmp_path, sub_cells):
    """Drained incremental export == one-shot batch export,
    byte-identical per file, however arrivals were chunked — cells of
    one (region, day) deliberately span every micro-batch."""
    from weather4cast_bigdata_spark.sources import hdf5

    src = str(tmp_path / "src")
    # 96 files, randomly assigned rows -> every (region, day) group
    # spans all three 32-file micro-batches
    sub_cells.repartition(96).write.parquet(src)
    staging, sub_dir, mani, ckpt = _sub_dirs(tmp_path, "run1")
    streaming.submission_ingest(
        spark, src, sub_cells.schema, staging, sub_dir, mani, ckpt, _SUB_VARS
    )
    oneshot_dir = str(tmp_path / "oneshot")
    oneshot = {
        (r["region"], r["day"]): r
        for r in hdf5.write_submission_h5(
            sub_cells, oneshot_dir, variables=_SUB_VARS
        ).collect()
    }
    got, want = _file_arrays(sub_dir), _file_arrays(oneshot_dir)
    assert set(got) == set(want) and want
    for rel in want:
        assert np.array_equal(got[rel], want[rel]), rel
    final = {
        (r["region"], r["day"]): r
        for r in streaming.submission_manifest(spark, mani).collect()
    }
    assert set(final) == set(oneshot)
    for k, r in oneshot.items():
        assert final[k]["n_cells"] == r["n_cells"]
        assert final[k]["qv_sum"] == r["qv_sum"]
        assert final[k]["n_times"] == r["n_times"]


def test_submission_ingest_replay_idempotent(spark, tmp_path, sub_cells):
    """Re-running the drained stream against the same sinks (fresh
    checkpoint => every batch replays with the same batch_id sequence)
    leaves the file tree byte-identical and the manifest unchanged."""
    src = str(tmp_path / "src2")
    sub_cells.repartition(64).write.parquet(src)
    staging, sub_dir, mani, ckpt1 = _sub_dirs(tmp_path, "run2")
    streaming.submission_ingest(
        spark, src, sub_cells.schema, staging, sub_dir, mani, ckpt1, _SUB_VARS
    )
    before = _file_arrays(sub_dir)
    before_mani = sorted(
        map(tuple, streaming.submission_manifest(spark, mani)
            .select("region", "day", "n_cells", "qv_sum").collect())
    )
    ckpt2 = str(tmp_path / "run2" / "ckpt_replay")
    streaming.submission_ingest(
        spark, src, sub_cells.schema, staging, sub_dir, mani, ckpt2, _SUB_VARS
    )
    after = _file_arrays(sub_dir)
    assert set(after) == set(before)
    for rel in before:
        assert np.array_equal(after[rel], before[rel]), rel
    after_mani = sorted(
        map(tuple, streaming.submission_manifest(spark, mani)
            .select("region", "day", "n_cells", "qv_sum").collect())
    )
    assert after_mani == before_mani


def test_submission_ingest_two_staggered_waves(spark, tmp_path, sub_cells):
    """Two SEPARATE drains against the same source/checkpoint (a
    second arrival wave lands after the first drain finished): the
    second run continues the batch_id sequence from the checkpoint,
    re-touched (region, day) groups are rewritten from the FULL
    accumulated staging lake, and submission_manifest's window picks
    the later batch_id per group — final tree byte-identical to the
    one-shot export of the union. Pins the cross-drain half of the
    manifest contract (pipeline.submission_manifest) that the
    single-drain tests never exercise."""
    from weather4cast_bigdata_spark.sources import hdf5

    src = str(tmp_path / "src_waves")
    wave1 = sub_cells.where(F.pmod(F.xxhash64("ts", "y", "x"), F.lit(2)) == 0)
    wave2 = sub_cells.where(F.pmod(F.xxhash64("ts", "y", "x"), F.lit(2)) == 1)
    # every (region, day) group must appear in BOTH waves for the
    # cross-batch rewrite to be exercised
    g1 = {(r["region"], r["day"]) for r in wave1.select("region", "day").distinct().collect()}
    g2 = {(r["region"], r["day"]) for r in wave2.select("region", "day").distinct().collect()}
    assert g1 and g1 == g2
    wave1.repartition(33).write.parquet(src)
    staging, sub_dir, mani, ckpt = _sub_dirs(tmp_path, "waves")
    streaming.submission_ingest(
        spark, src, sub_cells.schema, staging, sub_dir, mani, ckpt, _SUB_VARS
    )
    mani1 = {
        (r["region"], r["day"]): r["batch_id"]
        for r in streaming.submission_manifest(spark, mani).collect()
    }
    # wave 2 arrives as NEW files in the same source; the SAME
    # checkpoint makes the file source pick up only the new files and
    # continue the batch_id sequence
    wave2.repartition(33).write.mode("append").parquet(src)
    streaming.submission_ingest(
        spark, src, sub_cells.schema, staging, sub_dir, mani, ckpt, _SUB_VARS
    )
    final = {
        (r["region"], r["day"]): r["batch_id"]
        for r in streaming.submission_manifest(spark, mani).collect()
    }
    # the window picked the LATER batch_id for every re-touched group
    assert set(final) == set(mani1)
    assert all(final[k] > mani1[k] for k in final)
    # drained tree == one-shot export of the union
    oneshot_dir = str(tmp_path / "oneshot_waves")
    hdf5.write_submission_h5(sub_cells, oneshot_dir, variables=_SUB_VARS).collect()
    got, want = _file_arrays(sub_dir), _file_arrays(oneshot_dir)
    assert set(got) == set(want) and want
    for rel in want:
        assert np.array_equal(got[rel], want[rel]), rel


# --- incremental exact-dedup ingest (exact_dedup_ingest) ---------------------


@pytest.fixture(scope="module")
def exdup_docs(spark):
    """sf corpus plus exact copies under shifted ids: every (i,
    i+10000) pair is an exact duplicate, nothing else is."""
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    dups = docs.withColumn("doc_id", F.col("doc_id") + F.lit(10000))
    return docs.unionByName(dups)


def test_exact_dedup_ingest_batch_invariant(spark, tmp_path, exdup_docs):
    """Drained incremental exact dedup == one-shot md5 self-join,
    however arrivals were chunked (orig and copy usually land in
    different micro-batches, exercising the cross-batch probe)."""
    src = str(tmp_path / "exsrc")
    exdup_docs.repartition(96).write.parquet(src)
    d = tmp_path / "exrun1"
    streaming.exact_dedup_ingest(
        spark, src, exdup_docs.schema,
        str(d / "index"), str(d / "matches"), str(d / "ckpt"),
    )
    got = _pairs(spark.read.parquet(str(d / "matches")))
    one = exdup_docs.select(F.md5("text").alias("h"), "doc_id")
    want = _pairs(
        one.alias("x").join(one.alias("y"), "h")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
    )
    assert want and got == want


def test_exact_dedup_ingest_replay_idempotent(spark, tmp_path, exdup_docs):
    src = str(tmp_path / "exsrc2")
    exdup_docs.repartition(64).write.parquet(src)
    d = tmp_path / "exrun2"
    args = (spark, src, exdup_docs.schema,
            str(d / "index"), str(d / "matches"))
    streaming.exact_dedup_ingest(*args, str(d / "ckpt1"))
    before_m = spark.read.parquet(str(d / "matches")).count()
    before_i = spark.read.parquet(str(d / "index")).count()
    streaming.exact_dedup_ingest(*args, str(d / "ckpt_replay"))
    assert spark.read.parquet(str(d / "matches")).count() == before_m
    assert spark.read.parquet(str(d / "index")).count() == before_i


def test_watermark_boundary_drops_beyond_late_frame(spark, tmp_path):
    """The drop/keep boundary of the 24h-class watermark, pinned
    across TWO triggers (VERDICT r7 item 7): a frame later than the
    watermark allows is DROPPED from the state-bound windowed
    aggregation (its window was already finalized and emitted), while
    the batch twin of the same union corpus retains it. Wave 1
    advances the watermark past window A's end; wave 2 delivers one
    frame INSIDE window A but beyond the watermark plus one fresh
    in-watermark frame. Append mode + checkpoint restart = the
    production replay path."""
    t0 = dt.datetime(2019, 7, 23, 21, 0, 0)
    m = dt.timedelta(minutes=15)
    src = str(tmp_path / "wm_in")
    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")
    wave1 = [
        ("R1", t0, 1.0),                       # window A [21:00, 21:15)
        ("R1", t0 + dt.timedelta(minutes=5), 2.0),  # window A
        ("R1", t0 + 4 * m, 3.0),               # [22:00, 22:15)
        ("R1", t0 + 10 * m, 4.0),              # 23:30 -> watermark 22:30
    ]
    df1 = spark.createDataFrame(wave1, ["region", "ts", "value"])
    df1.coalesce(1).write.parquet(src)

    def drain():
        st = streaming.frame_stream(spark, src, df1.schema)
        win = streaming.sliding_sequence_windows(
            st, span="15 minutes", slide="15 minutes", watermark="1 hour"
        ).select("region", "win.start", "win.end", "n_frames")
        q = (
            win.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # wave 1: watermark advances to 22:30 at batch end
    wave2 = [
        # inside window A but OLDER than the watermark -> must be
        # dropped from the aggregation state (window A already final)
        ("R1", t0 + dt.timedelta(minutes=10), 99.0),
        # fresh frame, advances the watermark past every open window
        ("R1", t0 + 16 * m, 5.0),  # 01:00 next day -> watermark 00:00
    ]
    df2 = spark.createDataFrame(wave2, ["region", "ts", "value"])
    df2.coalesce(1).write.mode("append").parquet(src)
    drain()  # wave 2: late frame filtered, finalized windows emitted

    got = {
        r["start"]: r["n_frames"]
        for r in spark.read.parquet(out).collect()
    }
    # window A was finalized with its two in-watermark frames; the
    # beyond-watermark frame did NOT resurrect or grow it
    assert got[t0] == 2
    # the 22:00 and 23:30 windows finalized with their single frames
    assert got[t0 + 4 * m] == 1 and got[t0 + 10 * m] == 1
    assert list(got.values()).count(2) == 1
    # the batch twin over the SAME union corpus retains the late
    # frame — the documented batch/streaming divergence at the
    # watermark boundary
    batch = (
        spark.read.parquet(src)
        .groupBy("region", F.window("ts", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .where(F.col("win.start") == t0)
        .collect()
    )
    assert batch[0]["n_frames"] == 3
