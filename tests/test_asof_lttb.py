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
