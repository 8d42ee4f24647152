"""As-of join and LTTB downsampling tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from atsc_spark.asof import asof_join, lttb_downsample
from atsc_spark.fixtures import monitoring_series


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "user long, ts long, tag string",
    ).select("user", F.timestamp_seconds("ts").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 9, 300.0)],
        "user long, ts long, quote double",
    ).select("user", F.timestamp_seconds("ts").alias("ts"), "quote")

    out = (
        asof_join(left, right, on="ts", by=["user"], value_cols=["quote"])
        .select("tag", "quote_asof")
        .toPandas()
        .set_index("tag")["quote_asof"]
    )
    assert out["a"] == 100.0  # ts=10 -> right@8
    assert out["b"] == 200.0  # ts=20 -> right@15
    assert np.isnan(out["c"])  # ts=5 -> nothing before
    assert np.isnan(out["d"])  # user 2 ts=7 -> right@9 is after


def test_asof_join_same_instant(spark):
    left = spark.createDataFrame([(1, 10)], "user long, ts long").select(
        "user", F.timestamp_seconds("ts").alias("ts")
    )
    right = spark.createDataFrame([(1, 10, 7.0)], "user long, ts long, q double").select(
        "user", F.timestamp_seconds("ts").alias("ts"), "q"
    )
    out = asof_join(left, right, by=["user"], value_cols=["q"]).collect()
    assert out[0].q_asof == 7.0  # <= semantics: same instant matches


def test_lttb_keeps_extremes(spark):
    s = monitoring_series(spark, n_series=4, samples_per_series=2000)
    out = lttb_downsample(s, n_out=100).toPandas()
    orig = s.toPandas()
    for conv, grp in out.groupby("conv_id"):
        og = orig[orig.conv_id == conv].sort_values("bucket_ts")
        assert len(grp) <= 100
        # first and last points always kept
        assert grp.bucket_ts.min() == og.bucket_ts.min()
        assert grp.bucket_ts.max() == og.bucket_ts.max()
        # selected points are a subset of the original
        merged = grp.merge(og, on=["conv_id", "metric", "bucket_ts", "value"])
        assert len(merged) == len(grp)


def test_histogram_quantile_known_values(spark):
    """Deterministic check of the in-bucket interpolation: 100 values
    uniform over [0,100) with 16 bins -> p50 lands where the rank falls
    inside the covering bucket; degenerate one-bucket histogram
    interpolates within that bucket; empty histogram yields NULL."""
    import datetime

    from atsc_spark.rollup import histogram_quantile

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        # uniform-ish: hist with equal counts 4 per bin, n=64
        ("c", "m", ts, [4] * 16, 64),
        # all mass in bin 3 ([18.75, 25)): p50 interpolates inside it
        ("d", "m", ts, [0, 0, 0, 8] + [0] * 12, 8),
        ("e", "m", ts, [0] * 16, 0),
    ]
    hists = spark.createDataFrame(
        rows,
        "conv_id string, metric string, bucket_ts timestamp, hist array<long>, n long",
    )
    got = {r.conv_id: r.q for r in histogram_quantile(hists, 0.5, out_col="q").collect()}
    # c: rank 32, bucket 8 covers cum 32..36 exactly at its start:
    # first bucket with cum >= 32 is bucket 7 (cum 32), frac (32-28)/4=1
    assert got["c"] == round(0.0 + 6.25 * (7 + (0.5 * 64 - 28) / 4), 4)
    # d: rank 4 in bin 3: 18.75 + 6.25 * 4/8 = 21.875
    assert got["d"] == 21.875
    assert got["e"] is None


def test_histogram_quantile_matches_numpy_reference(spark):
    """200 random histograms x 3 quantiles in ONE Spark job, each row
    checked against an independent numpy implementation of the same
    semantics (rank q*n, first covering bucket, linear interpolation)."""
    import datetime

    import numpy as np

    from atsc_spark.rollup import histogram_quantile

    rng = np.random.default_rng(11)
    ts = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        bins = int(rng.choice([4, 8, 16]))
        hist = rng.integers(0, 20, size=bins)
        if i % 17 == 0:
            hist[:] = 0  # empty histogram -> NULL
        if i % 5 == 0:
            hist[rng.integers(0, bins)] = 0  # holes
        rows.append((f"g{i}", "m", ts, [int(x) for x in hist], int(hist.sum())))
    hists = spark.createDataFrame(
        rows,
        "conv_id string, metric string, bucket_ts timestamp, hist array<long>, n long",
    )

    def ref(hist, q, lo=0.0, hi=100.0):
        hist = np.asarray(hist, dtype=np.int64)
        n = hist.sum()
        if n == 0:
            return None
        width = (hi - lo) / len(hist)
        cums = np.cumsum(hist)
        rank = q * n
        j = int((cums < rank).sum())
        prev = 0 if j == 0 else int(cums[j - 1])
        v = lo + width * (j + (rank - prev) / hist[j])
        return np.floor(v * 10_000 + 0.5) / 10_000  # HALF_UP like Spark round()

    for q in (0.5, 0.95, 0.99):
        got = {
            r.conv_id: r.q
            for r in histogram_quantile(hists, q, out_col="q").collect()
        }
        for cid, _m, _ts, hist, _n in rows:
            want = ref(hist, q)
            assert got[cid] == want, (q, cid, hist, got[cid], want)


def test_interval_join_matches_naive_range_join(spark):
    """Bucketed formulation == the naive range join, including
    boundary semantics ([start, end)), multi-bucket spans, overlapping
    intervals (duplicate matches) and unmatched points (dropped)."""
    import datetime

    from atsc_spark.asof import interval_join

    t0 = datetime.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    pts = spark.createDataFrame(
        [(f"p{m}", ts(m)) for m in range(0, 600, 7)], "pid string, bucket_ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            ("a", ts(0), ts(90)),       # spans 2 hour-buckets
            ("b", ts(60), ts(61)),      # sub-bucket sliver
            ("c", ts(30), ts(150)),     # overlaps a
            ("d", ts(400), ts(400)),    # empty [x, x)
        ],
        "iid string, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(pts, iv, bucket_s=3600).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pts.join(
            iv,
            (pts.bucket_ts >= iv.start_ts) & (pts.bucket_ts < iv.end_ts),
        ).collect()
    )
    assert got == naive and len(got) > 0


def test_interval_join_plans_equi_join(spark):
    """The whole point: the plan must contain a real equi-join on the
    bucket key, never BroadcastNestedLoopJoin."""
    import datetime
    import io
    from contextlib import redirect_stdout

    from atsc_spark.asof import interval_join

    t0 = datetime.datetime(2024, 1, 1)
    pts = spark.createDataFrame([("p", t0)], "pid string, bucket_ts timestamp")
    iv = spark.createDataFrame(
        [("i", t0, t0 + datetime.timedelta(hours=2))],
        "iid string, start_ts timestamp, end_ts timestamp",
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        interval_join(pts, iv).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_gap_fill_max_gap_bounds_fill_reach(spark):
    """max_gap_s: fills stay NULL across outages longer than the bound
    — locf measures to the last observation, linear to the surrounding
    observed pair (edges to their single anchor); observed buckets are
    never affected."""
    import datetime

    from atsc_spark.rollup import gap_fill

    t0 = datetime.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # observations at minutes 0, 2, 30 (28-minute outage), grid = 1m
    rows = [("c", "m", ts(m), float(m)) for m in (0, 2, 30)]
    s = spark.createDataFrame(
        rows, "conv_id string, metric string, bucket_ts timestamp, value double"
    )

    locf = {
        int((r.bucket_ts - t0).total_seconds() // 60): r.value
        for r in gap_fill(s, interval_s=60, strategy="locf", max_gap_s=300).collect()
    }
    assert locf[0] == 0.0 and locf[2] == 2.0 and locf[30] == 30.0  # observed kept
    assert locf[1] == 0.0            # 1 min after obs@0: within bound
    assert locf[7] == 2.0            # 5 min after obs@2: at the bound
    assert locf[8] is None           # 6 min after obs@2: beyond
    assert locf[29] is None          # just before obs@30: stale by 27 min

    lin = {
        int((r.bucket_ts - t0).total_seconds() // 60): r.value
        for r in gap_fill(s, interval_s=60, strategy="linear", max_gap_s=300).collect()
    }
    assert lin[1] == 1.0             # inside the 2-minute observed span
    assert lin[10] is None           # inside the 28-minute span: beyond bound
    assert lin[30] == 30.0

    # unbounded behaviour unchanged
    locf_all = {
        int((r.bucket_ts - t0).total_seconds() // 60): r.value
        for r in gap_fill(s, interval_s=60, strategy="locf").collect()
    }
    assert locf_all[29] == 2.0


def test_interval_join_randomized_vs_naive(spark):
    """500 random points x 80 random intervals (spans from sub-bucket
    slivers to multi-day, plus empty and touching-boundary cases) in
    one batch: bucketed result == naive range join exactly."""
    import datetime

    import numpy as np

    from atsc_spark.asof import interval_join

    rng = np.random.default_rng(3)
    t0 = datetime.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [
            (int(i), t0 + datetime.timedelta(seconds=int(rng.integers(0, 7 * 86400))))
            for i in range(500)
        ],
        "pid long, bucket_ts timestamp",
    )
    ivs = []
    for i in range(80):
        start = int(rng.integers(0, 7 * 86400))
        span = int(rng.choice([0, 1, 59, 3600, 5401, 86400 * 2]))
        ivs.append(
            (
                int(i),
                t0 + datetime.timedelta(seconds=start),
                t0 + datetime.timedelta(seconds=start + span),
            )
        )
    iv = spark.createDataFrame(ivs, "iid long, start_ts timestamp, end_ts timestamp")
    got = sorted(
        (r.pid, r.iid) for r in interval_join(pts, iv, bucket_s=3600).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pts.join(
            iv, (pts.bucket_ts >= iv.start_ts) & (pts.bucket_ts < iv.end_ts)
        ).collect()
    )
    assert got == naive and len(got) > 100
