"""Physical-plan audits: the scale posture as executable assertions.

These pin the properties that make the engine viable at 100 TB —
filter/column pushdown into the parquet scan, broadcast joins for
small dimensions, and the shuffle counts of the hot paths — so a
refactor that silently regresses the plan fails CI, not production.
"""

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not available"
)


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def n_exchanges(df) -> int:
    """Count physical Exchange operators (formatted explain prints each
    node once in the tree and once in the details — count the
    numbered detail headers only)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan_of(df), re.M))


def test_parquet_scan_pushdown_and_pruning(spark):
    """A filtered 2-column projection must push the predicates into the
    scan and read ONLY those columns."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    q = e.filter(
        (F.col("event_type") == "click") & (F.col("ts") >= "2024-01-02")
    ).select("ts", "value")
    plan = plan_of(q)
    assert "PushedFilters" in plan
    assert "IsNotNull(event_type)" in plan or "EqualTo(event_type,click)" in plan
    # ReadSchema holds only the projected+filtered columns, never props/user_id
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "value" in read_schema and "props" not in read_schema and "user_id" not in read_schema


def test_small_dimension_join_broadcasts(spark):
    """nation/region-sized dimensions must broadcast, never shuffle the
    fact side onto the join key."""
    import __spark_entry__ as entry

    q = entry.queries()["revenue_by_nation"](spark, SF_DIR)
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decode_frames_shuffle_contract(spark, tmp_path):
    """Frames are self-describing, so decoding a file-backed frames
    table adds ZERO exchanges (the 100 TB tier read path).  A lazy
    decode(fit(...)) chain adds exactly ONE — the granularity
    repartition of the (tiny, compressed) frame rows, which keeps the
    upstream fit at full parallelism instead of letting a coalesce
    collapse it (see frames.decode_granularity)."""
    from atsc_spark.fixtures import monitoring_series
    from atsc_spark.frames import decode_frames, fit_frames

    frames = fit_frames(monitoring_series(spark, n_series=4, samples_per_series=128))
    n_fit = n_exchanges(frames)
    assert n_exchanges(decode_frames(frames)) == n_fit + 1

    path = str(tmp_path / "frames_pq")
    frames.write.parquet(path)
    stored = spark.read.parquet(path)
    assert n_exchanges(decode_frames(stored)) == 0, "file-backed decode must not shuffle"

    cached = frames.cache()
    try:
        assert n_exchanges(decode_frames(cached)) == n_fit, "cached decode must coalesce, not shuffle"
    finally:
        cached.unpersist()


def test_span_prune_pushes_to_parquet_scan(spark, tmp_path):
    """Materialized span columns make a time-range prune a plain long
    comparison that reaches the parquet scan as PushedFilters — the
    row-group min/max statistics then skip whole groups before any
    payload byte is read.  The pushed path must keep exactly the same
    frames as the legacy array-expression fallback."""
    from atsc_spark.fixtures import monitoring_series
    from atsc_spark.frames import fit_frames, prune_frames_to_range

    # 5 days of frames per series (4320 samples/day at 20 s cadence):
    # day-grouped fitting yields frames with DISTINCT spans to prune
    frames = fit_frames(
        monitoring_series(spark, n_series=2, samples_per_series=5 * 4320)
    )
    path = str(tmp_path / "span_frames")
    frames.write.parquet(path)
    stored = spark.read.parquet(path)
    assert "span_start_s" in stored.columns  # fit materializes the span

    lo, hi = stored.agg(
        F.min("span_start_s"), F.max("span_end_s")
    ).collect()[0]
    t0 = lo + (hi - lo) // 3
    t1 = lo + (hi - lo) // 2

    pruned = prune_frames_to_range(stored, t0, t1)
    plan = plan_of(pruned)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "span_" in pushed[0], f"span filter not pushed: {pushed}"

    # identical frame set vs the array-metadata fallback path
    legacy = prune_frames_to_range(
        stored.drop("span_start_s", "span_end_s"), t0, t1
    )
    a = sorted(
        (r.conv_id, r.metric, r.frame_idx)
        for r in pruned.select("conv_id", "metric", "frame_idx").collect()
    )
    b = sorted(
        (r.conv_id, r.metric, r.frame_idx)
        for r in legacy.select("conv_id", "metric", "frame_idx").collect()
    )
    assert a == b and 0 < len(a) < stored.count()


def test_fit_frames_single_shuffle(spark):
    """The fit pipeline shuffles exactly once: the pinned hash
    repartition on the group key; the groupBy reuses that partitioning."""
    from atsc_spark.fixtures import monitoring_series
    from atsc_spark.frames import fit_frames

    series = monitoring_series(spark, n_series=4, samples_per_series=128)
    base = n_exchanges(series)
    fitted = n_exchanges(fit_frames(series))
    assert fitted == base + 1, f"fit added {fitted - base} exchanges, want 1"


def test_rollup_cascade_single_shuffle_per_level(spark):
    from atsc_spark.fixtures import monitoring_series
    from atsc_spark.rollup import rollup, rollup_cascade_step

    series = monitoring_series(spark, n_series=4, samples_per_series=128)
    base = n_exchanges(series)
    r1m = rollup(series, "1 minute")
    r1h = rollup_cascade_step(r1m, "1 hour")
    assert n_exchanges(r1m) == base + 1
    assert n_exchanges(r1h) == base + 2


def test_ivf_corpus_assignment_shuffle_free(spark):
    """Corpus cell assignment must be an argmax projection over the
    constant centroid matrix — no crossJoin row amplification, no
    row_number window shuffle on neighbor_id (r2 VERDICT: at 100 TB
    that shuffle IS the job).  The only Exchange in the whole IVF plan
    is the final per-query top-k."""
    from atsc_spark.datapipe.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)  # no-Exchange query side
    q = ivf_topk(emb, queries, k=5, nlist=4, nprobe=4)
    assert n_exchanges(q) == 1, "IVF plan must shuffle only for the final top-k"


def test_pq_plan_shuffle_contract(spark):
    """PQ encode is an argmin projection over codebook literals (no
    crossJoin, no window); ADC scoring broadcasts the query LUTs.  The
    only Exchange in the whole plan is the final per-query top-k."""
    from atsc_spark.datapipe.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    q = pq_topk(emb, queries, k=5, nsub=4, codebook_k=8)
    assert n_exchanges(q) == 1, "PQ plan must shuffle only for the final top-k"


def test_sketch_aggregate_shuffle_contracts(spark):
    """Composable-aggregate shuffle budgets: histogram build is ONE
    hash agg (the two-level build re-shuffled — partitioning on
    (…, bin) does not satisfy (…) clustering); quantile is
    projection-only on top; merges/estimates re-key and legitimately
    add one; hll register build and ohlc are one each."""
    from atsc_spark.fixtures import monitoring_series
    from atsc_spark.rollup import (
        hll_estimate,
        hll_merge,
        hll_registers,
        histogram_merge,
        histogram_quantile,
        histogram_rollup,
        ohlc,
    )

    s = monitoring_series(spark, n_series=4, samples_per_series=128)
    base = n_exchanges(s)
    h1 = histogram_rollup(s, "1 hour")
    assert n_exchanges(h1) == base + 1
    assert n_exchanges(histogram_quantile(h1, 0.95)) == base + 1
    assert n_exchanges(histogram_merge(h1, "1 day")) == base + 2
    assert n_exchanges(ohlc(s, "1 hour")) == base + 1

    docs = spark.range(100).select(F.col("id").alias("doc_id"), F.lit("g").alias("g"))
    regs = hll_registers(docs, ["g"], "doc_id")
    assert n_exchanges(regs) == 1
    assert n_exchanges(hll_merge(regs, ["g"])) == 2
    assert n_exchanges(hll_estimate(regs, ["g"])) == 2


def test_ivfpq_plan_shuffle_contract(spark):
    """The IVF×PQ composition keeps the same contract as its halves:
    cell assignment + residual encode is one shuffle-free mapInPandas
    pass, probes/LUTs broadcast, and the only Exchange in the whole
    plan is the final per-query top-k."""
    from atsc_spark.datapipe.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    q = ivfpq_topk(emb, queries, k=5, nlist=4, nprobe=2, nsub=4, codebook_k=8)
    assert n_exchanges(q) == 1, "IVF×PQ plan must shuffle only for the final top-k"
