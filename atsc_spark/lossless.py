"""Spark layer for the lossless (tier-0) Gorilla blocks.

Same distribution shape as the lossy frames: fit is a ``mapInPandas``
over hash-partitioned, sorted batches with NumPy group-boundary
splitting (shared skeleton with ``frames.fit_frames`` — applyInPandas
pays ~5-10 ms of overhead per group, decisive at 10^4..10^6 series-day
groups), and decode is a shuffle-free ``mapInPandas``.  Blocks
roundtrip bit-exactly (timestamps and values), which is what lets the
retention layer replace raw rows with tier-0 blocks without violating
the per-row invariant.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core.gorilla import gorilla_decode, gorilla_encode
from .frames import make_keyed_batch_fn

BLOCK_SCHEMA = (
    "conv_id string, metric string, day date, sample_count int, "
    "payload binary, payload_bytes int, raw_bytes long"
)

DECODED_SCHEMA = "conv_id string, metric string, epoch_s long, value double"

_BLOCK_COLS = [
    "conv_id", "metric", "day", "sample_count", "payload", "payload_bytes", "raw_bytes",
]


def _fit_block(conv_id, metric, day, values: np.ndarray, ts: np.ndarray, rows: list) -> None:
    blob = gorilla_encode(ts, values)
    rows.append(
        {
            "conv_id": conv_id,
            "metric": metric,
            "day": day,
            "sample_count": len(values),
            "payload": blob,
            "payload_bytes": len(blob),
            "raw_bytes": len(values) * 16,
        }
    )


def fit_lossless(series: DataFrame, num_tasks: int | None = None) -> DataFrame:
    """series (conv_id, metric, bucket_ts, value) -> gorilla blocks.

    Explicit repartition for the same reason as frames.fit_frames:
    AQE's byte-based coalescing would serialize this compute-dense,
    byte-light stage.  Sorted within partitions so the mapInPandas
    boundary splitter sees contiguous groups.
    """
    with_day = series.withColumn("day", F.to_date("bucket_ts"))
    if num_tasks is None:
        num_tasks = series.sparkSession.sparkContext.defaultParallelism * 8
    partitioned = with_day.repartition(
        num_tasks, "conv_id", "metric", "day"
    ).sortWithinPartitions("conv_id", "metric", "day", "bucket_ts")
    fit = make_keyed_batch_fn(_fit_block, _BLOCK_COLS)
    return partitioned.select(
        "conv_id", "metric", "day", "bucket_ts", "value"
    ).mapInPandas(fit, BLOCK_SCHEMA)


def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        outs = []
        for row in pdf.itertuples(index=False):
            ts, values = gorilla_decode(bytes(row.payload))
            outs.append(
                pd.DataFrame(
                    {
                        "conv_id": row.conv_id,
                        "metric": row.metric,
                        "epoch_s": ts,
                        "value": values,
                    }
                )
            )
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(columns=["conv_id", "metric", "epoch_s", "value"])
        )


def decode_lossless(blocks: DataFrame) -> DataFrame:
    decoded = blocks.select(
        "conv_id", "metric", "sample_count", "payload"
    ).mapInPandas(_decode, DECODED_SCHEMA)
    return decoded.select(
        "conv_id", "metric", F.timestamp_seconds("epoch_s").alias("bucket_ts"), "value"
    )
