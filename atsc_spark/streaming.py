"""Structured Streaming ingestion: incremental series derivation with
late-data handling.

The reference's VSRI index is append-only — points in the past are
rejected (`/root/reference/vsri/src/lib.rs:249-284`).  The streaming
equivalent is a watermark: buckets older than the watermark are final
and late turns are dropped, which gives the same "no rewriting history"
contract while tolerating bounded disorder.

Batch remains the primary path (the reference is a batch CLI); this
module makes the derive stage incremental:

    stream = readStream(transcripts) -> watermark(ts) ->
             windowed counts per conv -> append sink

Frame fitting stays batch over closed buckets (foreachBatch), because
ATSC frames are functions of a *completed* chunk — exactly like the
reference compresses finished files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def derive_series_stream(
    transcripts_stream: DataFrame,
    bucket: str = "20 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming version of series.derive_series (per-conv metrics).

    Append-mode compatible: aggregates close when the watermark passes
    the window end.  The unpivot happens per emitted row.
    """
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", bucket).alias("w"))
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
    )


def stream_series_to_frames(
    spark: SparkSession,
    input_path: str,
    store_base: str,
    schema: str = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    bucket: str = "20 seconds",
    watermark: str = "2 minutes",
    max_error: float = 0.03,
):
    """File-source streaming job: watch `input_path` for new transcript
    parquet, maintain the series table, and frame-fit each closed
    micro-batch via foreachBatch.

    Returns the StreamingQuery (caller owns awaitTermination/stop).
    """
    from .frames import fit_frames

    stream = (
        spark.readStream.schema(schema).parquet(input_path)
    )
    series = derive_series_stream(stream, bucket, watermark)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(f"{store_base}/series_stream")
        fit_frames(batch_df, max_error=max_error).write.mode("append").parquet(
            f"{store_base}/frames_stream"
        )

    return (
        series.writeStream.outputMode("append")
        .option("checkpointLocation", f"{store_base}/stream_checkpoint")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
