"""Edge semantics for the extension window operators: as-of join
visibility/tie rules and sessionization gap boundaries."""

from __future__ import annotations

import datetime as dt

from weather4cast_bigdata_spark.operators import windows

T0 = dt.datetime(2021, 6, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_join_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [("u1", _ts(0), "l0"), ("u1", _ts(10), "l1"), ("u2", _ts(5), "l2")],
        ["k", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [("u1", _ts(0), 100.0), ("u1", _ts(7), 200.0), ("u2", _ts(6), 300.0)],
        ["k", "ts", "v"],
    )
    out = windows.join_asof(left, right, keys=["k"], ts_col="ts", right_val_cols=["v"])
    got = {r["lid"]: r["v_asof"] for r in out.collect()}
    # Exact-ts right row IS visible (l0 at ts=0 sees v=100).
    assert got["l0"] == 100.0
    # Latest prior wins (l1 at ts=10 sees ts=7's 200, not ts=0's 100).
    assert got["l1"] == 200.0
    # No right row at or before the left ts → null.
    assert got["l2"] is None


def test_join_asof_right_ts_passthrough(spark):
    left = spark.createDataFrame([("u1", _ts(10), 1)], ["k", "ts", "x"])
    right = spark.createDataFrame([("u1", _ts(3), 9.0)], ["k", "ts", "v"])
    out = windows.join_asof(
        left, right, keys=["k"], ts_col="ts", right_val_cols=["v"], right_ts_as="src_ts"
    ).collect()[0]
    assert out["src_ts"] == _ts(3)
    assert out["x"] == 1  # left payload columns survive


def test_sessionize_gap_boundary(spark):
    rows = [
        ("u1", _ts(0)),
        ("u1", _ts(30)),        # gap == 30 min exactly → SAME session (strict >)
        ("u1", _ts(60.5)),      # gap 30.5 min → new session
        ("u2", _ts(0)),         # separate key → its own session numbering
    ]
    df = spark.createDataFrame(rows, ["user", "ts"])
    out = windows.sessionize(df, keys=["user"], ts_col="ts", gap_minutes=30)
    got = {(r["user"], r["ts"]): r["session_id"] for r in out.collect()}
    assert got[("u1", _ts(0))] == 1
    assert got[("u1", _ts(30))] == 1
    assert got[("u1", _ts(60.5))] == 2
    assert got[("u2", _ts(0))] == 1


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=4 of 8 cells must recover most of the exact
    top-5 (spot recall bound; exact when nprobe == n_centroids)."""
    from pyspark.sql import functions as F

    from weather4cast_bigdata_spark.operators import similarity
    from weather4cast_bigdata_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["item_id"])
        for r in similarity.cosine_topk(queries, emb, k=5).collect()
    }
    cents = similarity.kmeans_centroids(emb, k=8, iters=5, seed=42)
    approx = {
        (r["query_id"], r["item_id"])
        for r in similarity.ivf_cosine_topk(queries, emb, cents, k=5, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"
    # nprobe == n_centroids ⇒ every pair scored ⇒ exact equality.
    full = {
        (r["query_id"], r["item_id"])
        for r in similarity.ivf_cosine_topk(queries, emb, cents, k=5, nprobe=8).collect()
    }
    assert full == exact


def test_rot90_remap_matches_numpy(spark):
    """The rot90 coordinate remap must agree with np.rot90 k=1 on
    axes (y, x) — the exact call the reference makes
    (datasets.py:291-292). Both-sides-consistent oracle checks cannot
    catch a flipped rotation direction; numpy is the ground truth."""
    import numpy as np
    from pyspark.sql import functions as F

    n = 4
    grid = np.arange(n * n).reshape(n, n)
    rot = np.rot90(grid, k=1)
    rows = [(int(y), int(x), int(grid[y, x])) for y in range(n) for x in range(n)]
    df = spark.createDataFrame(rows, ["y", "x", "v"])
    remapped = df.select(
        (F.lit(n - 1) - F.col("x")).alias("ry"),
        F.col("y").alias("rx"),
        "v",
    ).collect()
    for r in remapped:
        assert rot[r.ry, r.rx] == r.v


def test_flip_remaps_match_numpy(spark):
    """flipud/fliplr coordinate remaps pinned against the numpy calls
    the reference makes (datasets.py:293-297)."""
    import numpy as np
    from pyspark.sql import functions as F

    n = 4
    grid = np.arange(n * n).reshape(n, n)
    rows = [(int(y), int(x), int(grid[y, x])) for y in range(n) for x in range(n)]
    df = spark.createDataFrame(rows, ["y", "x", "v"])
    ud = df.select((F.lit(n - 1) - F.col("y")).alias("ry"), F.col("x").alias("rx"), "v").collect()
    lr = df.select(F.col("y").alias("ry"), (F.lit(n - 1) - F.col("x")).alias("rx"), "v").collect()
    fud, flr = np.flipud(grid), np.fliplr(grid)
    assert all(fud[r.ry, r.rx] == r.v for r in ud)
    assert all(flr[r.ry, r.rx] == r.v for r in lr)


# --- resample / gap-fill -----------------------------------------------------


def test_resample_interpolate_bridges_and_edges(spark):
    """Interior gaps take the linear interpolant between bounding
    observations; leading/trailing gaps hold the nearest observation
    flat; observed slots pass through untouched."""
    from datetime import datetime

    from weather4cast_bigdata_spark.operators.windows import resample_interpolate

    t = lambda m: datetime(2020, 1, 1, 0, m)
    rows = [  # observations at :15, :60 (45-min gap), value 10 -> 40
        ("a", t(15), 10.0),
        ("a", t(0).replace(hour=1), 40.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {r["ts"].minute + 60 * r["ts"].hour: r for r in resample_interpolate(df, ["k"], "ts", "value").collect()}
    assert len(out) == 4  # :15 :30 :45 :60
    assert out[15]["value"] == 10.0 and out[15]["is_observed"]
    assert out[60]["value"] == 40.0 and out[60]["is_observed"]
    assert not out[30]["is_observed"] and abs(out[30]["value"] - 20.0) < 1e-6
    assert not out[45]["is_observed"] and abs(out[45]["value"] - 30.0) < 1e-6


def test_resample_interpolate_single_observation(spark):
    """One observation per key: the lattice is one slot, no NULLs, no
    division hazards."""
    from datetime import datetime

    from weather4cast_bigdata_spark.operators.windows import resample_interpolate

    df = spark.createDataFrame(
        [("a", datetime(2020, 1, 1, 0, 7), 5.0)], "k string, ts timestamp, value double"
    )
    out = resample_interpolate(df, ["k"], "ts", "value").collect()
    assert len(out) == 1 and out[0]["value"] == 5.0 and out[0]["is_observed"]


def test_fuzzy_blocked_join_blocking_is_recall_only(spark):
    """Every emitted pair passed the exact distance test (precision),
    and a true match split across blocks is missed (recall knob) —
    the documented contract."""
    import pyspark.sql.functions as F

    from weather4cast_bigdata_spark.operators.joins import fuzzy_self_join_blocked

    rows = [(1, "abcde"), (2, "abcdX"), (3, "abcdef"), (4, "Xbcde")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = fuzzy_self_join_blocked(
        df, "id", "name", block=F.substring("name", 1, 3), max_dist=1
    ).collect()
    got = {(r["a_id"], r["b_id"]): r["edit_dist"] for r in out}
    # (1,2): same block, dist 1 -> kept. (1,3): same block, dist 1 (insert) -> kept.
    # (2,3): same block, dist 2 -> rejected by the exact test.
    # (1,4): dist 1 but DIFFERENT block -> missed (recall loss, by design).
    assert got == {(1, 2): 1, (1, 3): 1}
