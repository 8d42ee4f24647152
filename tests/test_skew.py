"""Skew-handling operator tests."""

import pytest
from pyspark.sql import functions as F

from atsc_spark.fixtures import transcripts
from atsc_spark.skew import hot_keys, salted_repartition, two_phase_count_distinct


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf conversation lengths guarantee hot conversations
    df = transcripts(spark, n_convs=300, window_days=2).cache()
    df.count()
    return df


def test_salted_repartition_spreads_hot_key(spark, skewed):
    hot = (
        skewed.groupBy("conv_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    one_conv = skewed.filter(F.col("conv_id") == hot.conv_id)
    before = one_conv.repartition("conv_id").rdd.glom().map(len).filter(lambda n: n > 0).count()
    after = (
        salted_repartition(one_conv, ["conv_id"], salt_buckets=8, num_partitions=32)
        .rdd.glom()
        .map(len)
        .filter(lambda n: n > 0)
        .count()
    )
    assert before == 1  # a hot conv pins a single partition unsalted
    assert after > 1  # salting spreads it
    # no rows lost
    assert (
        salted_repartition(one_conv, ["conv_id"], salt_buckets=8).count()
        == one_conv.count()
    )


def test_hot_keys_detects_zipf_head(spark, skewed):
    report = hot_keys(skewed, ["conv_id"], fraction=0.5, threshold_ratio=5.0)
    rows = report.collect()
    assert len(rows) >= 1
    # detected keys are genuinely hot
    true_counts = {r.conv_id: r["count"] for r in skewed.groupBy("conv_id").count().collect()}
    mean = sum(true_counts.values()) / len(true_counts)
    for r in rows:
        assert true_counts[r.conv_id] > mean


def test_two_phase_count_distinct_matches_exact(spark, skewed):
    got = {
        r.role: r.n_distinct
        for r in two_phase_count_distinct(skewed, ["role"], "conv_id").collect()
    }
    exact = {
        r.role: r.n
        for r in skewed.groupBy("role").agg(F.countDistinct("conv_id").alias("n")).collect()
    }
    assert got == exact


def test_fit_path_flat_tasks_on_hot_corpus(spark):
    """The north rule's explicit-skew mandate, measured: with ONE
    conversation holding half of all turns, the derive+fit job's
    heaviest stage keeps max/median task runtime < 3x (the fit group
    key includes the day, so no group outgrows one series-day; hash
    partitioning spreads the hot conv's groups).  Uses the UI REST
    task metrics via task_skew_probe; warm worker pool first so the
    one-off Python daemon fork doesn't masquerade as a straggler."""
    from atsc_spark.fixtures import hot_transcripts, monitoring_series
    from atsc_spark.frames import fit_frames
    from atsc_spark.series import derive_series
    from atsc_spark.skew import task_skew_probe

    fit_frames(monitoring_series(spark, n_series=4, samples_per_series=64)).count()

    hot = hot_transcripts(spark, n_convs=32, total_turns=120_000, hot_share=0.5)
    stages = task_skew_probe(
        spark,
        lambda: fit_frames(derive_series(hot, include_global=False)).count(),
        group="test-fit-skew",
    )
    assert stages, "UI REST task metrics unavailable"
    heavy = stages[0]
    assert heavy["n_tasks"] > 4  # the probe found a real parallel stage
    assert heavy["skew_ratio"] < 3.0, f"straggler in fit path: {heavy}"
