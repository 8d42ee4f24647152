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


def running_conv_state(
    transcripts_stream: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-conversation running profile maintained across micro-batches —
    the streaming analogue of VSRI's append-only per-series state
    (`vsri/src/lib.rs:249-284`): total turns, total text chars, last
    turn timestamp, and segment count (a new segment opens when the gap
    to the previous turn exceeds 10x the running mean gap).

    Output (one row per conv per batch):
      (conv_id, n_turns, n_chars, n_segments, last_ts)
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "conv_id string, n_turns long, n_chars long, n_segments long, last_ts timestamp"
    )
    state_schema = "n_turns long, n_chars long, n_segments long, last_epoch double, mean_gap double"

    def update(key, pdfs, state):
        (conv_id,) = key
        if state.exists:
            n_turns, n_chars, n_segments, last_epoch, mean_gap = state.get
        else:
            n_turns, n_chars, n_segments, last_epoch, mean_gap = 0, 0, 0, None, 20.0
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            epochs = pdf["ts"].astype("int64").to_numpy() / 1e9
            lens = pdf["text"].str.len().to_numpy()
            for e, ln in zip(epochs, lens):
                if last_epoch is None:
                    n_segments += 1
                else:
                    gap = e - last_epoch
                    if gap > 10.0 * mean_gap:
                        n_segments += 1
                    mean_gap = 0.9 * mean_gap + 0.1 * max(gap, 1.0)
                last_epoch = float(e)
                n_turns += 1
                n_chars += int(ln)
        state.update((n_turns, n_chars, n_segments, last_epoch, mean_gap))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n_turns],
                "n_chars": [n_chars],
                "n_segments": [n_segments],
                "last_ts": [pd.to_datetime(last_epoch, unit="s")],
            }
        )

    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
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


def stream_transcripts_to_store(
    spark: SparkSession,
    input_path: str,
    store,
    schema: str = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    bucket: str = "20 seconds",
    watermark: str = "2 minutes",
):
    """Continuous ingestion INTO the tiered store: watch ``input_path``
    for new transcript parquet, derive watermark-closed series buckets,
    and append them to the store's raw tier — from where the normal
    ``retention_pass`` cadence ages them through gorilla/frames/rollup.

    Exactly-once input accounting comes from the file source +
    checkpointLocation (a restarted query resumes at the committed
    offset and never re-reads a processed file).  The raw-tier append
    inside ``foreachBatch`` is guarded by a per-``batch_id`` marker
    file created AFTER the append: a replayed batch whose marker exists
    is skipped, narrowing duplication to a crash landing exactly
    between the append and the marker create.  That residual window is
    REAL — rows appended then are double-counted (the retention pass
    dedupes duplicate DAYS across tiers, not duplicate rows within
    one) — and closing it needs a transactional sink: the Iceberg
    writer (atsc_spark.iceberg) commits data + marker in one snapshot.

    Returns the StreamingQuery (caller owns awaitTermination/stop).
    """
    stream = spark.readStream.schema(schema).parquet(input_path)
    series = derive_series_stream(stream, bucket, watermark)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fs, marker = store._fs(f"{store.base}/_stream_batches/{batch_id}")
        if fs.exists(marker):
            return  # replayed batch already appended — skip
        store.write_raw(batch_df)
        fs.mkdirs(marker.getParent())
        fs.create(marker, True).close()

    return (
        series.writeStream.outputMode("append")
        .option("checkpointLocation", f"{store.base}/_stream_checkpoint")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
