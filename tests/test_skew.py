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
