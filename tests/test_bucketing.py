"""Storage-level bucketing: the exchange-free co-located join,
plan-asserted (the 100-TB join cost lever — shuffle once at write
time, never again)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from atsc_spark import bucketing
from atsc_spark.fixtures import transcripts
from atsc_spark.frames import fit_frames
from atsc_spark.series import derive_series


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_plans_without_exchange(spark, tmp_path):
    """series <-> frames joined on (conv_id, metric): unbucketed plans
    two hash Exchanges; the same join over same-bucketed tables plans
    with ZERO Exchange and zero extra Sort, and returns identical
    rows."""
    t = transcripts(spark, n_convs=40, window_days=1)
    series = derive_series(t, include_global=False)
    frames = fit_frames(series, max_error=0.03).select(
        "conv_id", "metric", "frame_idx", "compressor", "sample_count"
    )
    keys = ["conv_id", "metric"]
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # baseline: joining the raw frames shuffles both sides
        base_plan = _plan(series.join(frames, keys))
        assert "Exchange" in base_plan

        bucketing.write_bucketed(
            series, "b_series", str(tmp_path / "s"), keys, n_buckets=8
        )
        bucketing.write_bucketed(
            frames, "b_frames", str(tmp_path / "f"), keys, n_buckets=8
        )
        bs = bucketing.read_table(spark, "b_series")
        bf = bucketing.read_table(spark, "b_frames")
        joined = bs.join(bf, keys)
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # same rows as the unbucketed join
        want = series.join(frames, keys).count()
        assert joined.count() == want
        # the scan itself carries the bucket spec
        assert "Bucketed: true" in _plan(bs.join(bf, keys))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        bucketing.drop_table(spark, "b_series")
        bucketing.drop_table(spark, "b_frames")


def test_bucketed_aggregation_skips_exchange(spark, tmp_path):
    """A groupBy on the bucket key over a bucketed table also plans
    without a shuffle — the partial/final aggregate collapses."""
    t = transcripts(spark, n_convs=30, window_days=1)
    series = derive_series(t, include_global=False)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketing.write_bucketed(
            series, "b_series_agg", str(tmp_path / "sa"), ["conv_id"], n_buckets=4
        )
        bs = bucketing.read_table(spark, "b_series_agg")
        agg = bs.groupBy("conv_id").agg(F.count("*").alias("n"))
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == series.select("conv_id").distinct().count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        bucketing.drop_table(spark, "b_series_agg")
