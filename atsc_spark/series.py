"""Series derivation: transcripts -> per-conversation numeric series.

The engine's equivalent of the reference's CSV/WavBrro ingestion
(`/root/reference/atsc/src/csv.rs`, `csv-compressor/src/metric.rs`):
instead of one file per signal, every `(conv_id, metric)` pair is a
series and the rows are `(conv_id, metric, bucket_ts, value)`.

All derivation is declarative DataFrame API — one hash aggregation
(partial + final, Catalyst-planned) then a zero-shuffle unpivot.
Metrics mirror FIXTURES.md §2:

- turn_rate:   turns per bucket              (cpu_utilization analogue)
- text_len:    sum of char lengths per bucket (heap-gauge analogue)
- tool_calls:  non-null tool turns per bucket (iowait analogue)
- active_convs: distinct conversations per bucket, one global series
  (memory_used analogue)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GLOBAL_CONV = "__global__"
PER_CONV_METRICS = ("turn_rate", "text_len", "tool_calls")


def derive_series(
    transcripts: DataFrame,
    bucket: str = "20 seconds",
    include_global: bool = True,
) -> DataFrame:
    """Return `(conv_id, metric, bucket_ts, value double)`.

    One shuffle for the per-conversation aggregate; the metric unpivot
    is a projection (stack), not a second shuffle.  The global
    distinct-conversation series needs its own aggregate because
    count-distinct does not compose with the per-conv grouping.
    """
    per_conv = (
        transcripts.groupBy("conv_id", F.window("ts", bucket).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("turn_rate"),
            F.sum(F.length("text")).cast("double").alias("text_len"),
            F.count("tool").cast("double").alias("tool_calls"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("bucket_ts"),
            F.expr(
                "stack(3, 'turn_rate', turn_rate, 'text_len', text_len,"
                " 'tool_calls', tool_calls) as (metric, value)"
            ),
        )
        .select("conv_id", "metric", "bucket_ts", "value")
    )
    if not include_global:
        return per_conv

    global_series = (
        transcripts.groupBy(F.window("ts", bucket).alias("w"))
        .agg(F.countDistinct("conv_id").cast("double").alias("value"))
        .select(
            F.lit(GLOBAL_CONV).alias("conv_id"),
            F.lit("active_convs").alias("metric"),
            F.col("w.start").alias("bucket_ts"),
            "value",
        )
    )
    return per_conv.unionByName(global_series)


def series_from_events(events: DataFrame, bucket: str = "1 minute") -> DataFrame:
    """Adapter for the driver's `events` testdata table: treat
    `event_type` as the series key and aggregate `value` per bucket.

    Returns the same shape as :func:`derive_series` so the whole frame
    pipeline runs unchanged on driver testdata.
    """
    return (
        events.groupBy(F.col("event_type").alias("conv_id"), F.window("ts", bucket).alias("w"))
        .agg(F.sum("value").cast("double").alias("value"))
        .select(
            "conv_id",
            F.lit("value_sum").alias("metric"),
            F.col("w.start").alias("bucket_ts"),
            "value",
        )
    )
