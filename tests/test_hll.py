"""HyperLogLog composable distinct sketch: error bound + composability."""

import os

import pytest
from pyspark.sql import functions as F

from atsc_spark.rollup import hll_estimate, hll_merge, hll_registers

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not available"
)


def test_hll_estimate_error_bound(spark):
    """Estimate within ~3x the theoretical stderr (1.04/sqrt(1024) ≈
    3.3%) of the exact distinct count across 3 cardinality scales."""
    for n_distinct in (500, 5_000, 50_000):
        df = spark.range(n_distinct * 3).select(
            (F.col("id") % n_distinct).alias("v"), F.lit("g").alias("g")
        )
        regs = hll_registers(df, ["g"], "v", p=10)
        est = hll_estimate(regs, ["g"], p=10).collect()[0].approx_distinct
        rel = abs(est - n_distinct) / n_distinct
        assert rel < 0.10, f"n={n_distinct}: est {est} rel err {rel:.3f}"


def test_hll_merge_equals_direct(spark):
    """merge(per-day sketches) == direct(whole-range sketch), register
    for register — max is associative, so the sketch is EXACTLY safe
    in a rollup cascade (unlike any sampling-based distinct)."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    fine = hll_registers(e, ["event_type", "day"], "user_id", p=10)
    merged = hll_merge(fine, ["event_type"])
    direct = hll_registers(e, ["event_type"], "user_id", p=10)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_hll_estimate_vs_exact_on_events(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r.event_type: r.d
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    est = {
        r.event_type: r.approx_distinct
        for r in hll_estimate(
            hll_registers(e, ["event_type"], "user_id", p=10), ["event_type"], p=10
        ).collect()
    }
    for k, d in exact.items():
        assert abs(est[k] - d) / max(d, 1) < 0.10, (k, d, est[k])
