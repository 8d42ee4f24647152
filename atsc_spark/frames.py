"""Distributed ATSC frame fitting and decoding.

The reference compresses one series per process
(`/root/reference/atsc/src/main.rs:50-68` is a sequential directory
loop); here the same pure frame math (``atsc_spark.core``) runs inside
Arrow-batched pandas UDFs:

- :func:`fit_frames` — ``groupBy(conv_id, metric, day).applyInPandas``.
  One shuffle on the group key; group size is bounded (<= 86,400
  samples per series-day, ~0.7 MB), so executor memory is safe at any
  total scale and hot conversations cannot create a giant group.
- :func:`decode_frames` — ``mapInPandas`` over frame rows.  Frames are
  self-describing (sample_count + payload + time segments), so decode
  needs **no shuffle at all**.

Timestamps are not stored per sample: each frame carries VSRI-style
piecewise-linear segments ``(interval_s, start_ts, n)`` — the same
``ts = m*x + b`` model as `vsri/src/lib.rs:101-108` — computed
vectorized from gap detection rather than streaming appends
(`vsri/src/lib.rs:249-284`).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core.frame import (
    AUTO,
    COMPRESSOR_IDS,
    COMPRESSOR_NAMES,
    compress_frame,
    decompress_frame,
    get_chunk_sizes,
)

FRAME_SCHEMA = (
    "conv_id string, metric string, day date, frame_idx int, "
    "compressor string, compressor_id int, sample_count int, "
    "segments array<struct<interval_s: long, start_ts: long, n: int>>, "
    "payload binary, error double, payload_bytes int, raw_bytes long"
)

DECODED_SCHEMA = "conv_id string, metric string, epoch_s long, value double"


def time_segments(ts: np.ndarray) -> list[dict]:
    """Split a sorted int64 epoch-seconds array into constant-interval
    segments (the VSRI model, `vsri/src/lib.rs:101-108`).

    Run-based splitting: a new segment starts wherever the inter-sample
    interval changes.  Every timestamp is exactly recoverable as
    ``start_ts + i * interval_s``.
    """
    n = len(ts)
    if n == 0:
        return []
    if n == 1:
        return [{"interval_s": 0, "start_ts": int(ts[0]), "n": 1}]
    d = np.diff(ts)
    change = np.flatnonzero(d[1:] != d[:-1]) + 1
    starts = np.concatenate([[0], change + 1])
    ends = np.concatenate([starts[1:], [n]])
    return [
        {
            "interval_s": int(d[s]) if e - s > 1 else 0,
            "start_ts": int(ts[s]),
            "n": int(e - s),
        }
        for s, e in zip(starts, ends)
    ]


def segments_to_ts(segments: Iterable) -> np.ndarray:
    """Inverse of :func:`time_segments` (`vsri/src/lib.rs:352-362`)."""
    parts = [
        np.int64(seg["start_ts"]) + np.int64(seg["interval_s"]) * np.arange(seg["n"], dtype=np.int64)
        for seg in segments
    ]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def _make_fit_fn(compressor_id: int, max_error: float, speed: int):
    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        values = pdf["value"].to_numpy(dtype=np.float64)
        ts = (pdf["bucket_ts"].astype("int64") // 10**9).to_numpy()
        # NaN/inf cleaning drops the sample AND its timestamp (the
        # reference drops values pre-plan, `optimizer/mod.rs:64-71`;
        # we keep ts aligned since our frames carry a time index).
        keep = np.isfinite(values)
        values, ts = values[keep], ts[keep]
        conv_id = pdf["conv_id"].iloc[0]
        metric = pdf["metric"].iloc[0]
        day = pdf["day"].iloc[0]

        rows = []
        offset = 0
        for frame_idx, size in enumerate(get_chunk_sizes(len(values))):
            chunk = values[offset : offset + size]
            res = compress_frame(chunk, compressor_id, max_error, speed)
            rows.append(
                {
                    "conv_id": conv_id,
                    "metric": metric,
                    "day": day,
                    "frame_idx": frame_idx,
                    "compressor": COMPRESSOR_NAMES[res.compressor],
                    "compressor_id": res.compressor,
                    "sample_count": res.sample_count,
                    "segments": time_segments(ts[offset : offset + size]),
                    "payload": res.payload,
                    "error": float(res.error) if np.isfinite(res.error) else None,
                    "payload_bytes": len(res.payload),
                    "raw_bytes": int(size) * 8,
                }
            )
            offset += size
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "metric", "day", "frame_idx", "compressor",
                "compressor_id", "sample_count", "segments", "payload",
                "error", "payload_bytes", "raw_bytes",
            ],
        )

    return fit


def fit_frames(
    series: DataFrame,
    max_error: float = 0.03,
    compressor: str = "auto",
    speed: int = 0,
    num_tasks: int | None = None,
) -> DataFrame:
    """series ``(conv_id, metric, bucket_ts, value)`` -> frames table.

    The group key includes the day so group size stays bounded; at 20 s
    cadence one series-day is <= 4,320 samples -> chunk plan
    [4096, 224].  Everything inside the UDF is numpy over one Arrow
    batch.

    Partitioning note: frame fitting is compute-dense but byte-light
    (aggregated series), so AQE's byte-based partition coalescing would
    collapse it to a handful of tasks and serialize the CPU work.  We
    pin an explicit hash repartition on the group key — AQE preserves
    user-specified counts, and the groupBy reuses the partitioning (no
    second shuffle).
    """
    comp_id = COMPRESSOR_IDS[compressor] if isinstance(compressor, str) else compressor
    fit = _make_fit_fn(comp_id, max_error, speed)
    with_day = series.withColumn("day", F.to_date("bucket_ts"))
    if num_tasks is None:
        num_tasks = series.sparkSession.sparkContext.defaultParallelism * 8
    partitioned = with_day.repartition(num_tasks, "conv_id", "metric", "day")
    return partitioned.groupBy("conv_id", "metric", "day").applyInPandas(fit, FRAME_SCHEMA)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        outs = []
        for row in pdf.itertuples(index=False):
            values = decompress_frame(
                int(row.compressor_id), int(row.sample_count), bytes(row.payload)
            )
            ts = segments_to_ts(row.segments)
            m = min(len(values), len(ts))
            outs.append(
                pd.DataFrame(
                    {
                        "conv_id": row.conv_id,
                        "metric": row.metric,
                        "epoch_s": ts[:m],
                        "value": values[:m],
                    }
                )
            )
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(columns=["conv_id", "metric", "epoch_s", "value"])
        )


def decode_frames(frames: DataFrame) -> DataFrame:
    """frames table -> ``(conv_id, metric, bucket_ts, value)``.

    ``mapInPandas``: zero shuffle, scales linearly with frame count.
    Mirrors `CompressedStream::decompress` + the VSRI zip
    (`data.rs:104-109`, `csv-compressor/src/metric.rs:88-98`).
    """
    decoded = frames.select(
        "conv_id", "metric", "compressor_id", "sample_count", "segments", "payload"
    ).mapInPandas(_decode_batches, DECODED_SCHEMA)
    return decoded.select(
        "conv_id",
        "metric",
        F.timestamp_seconds("epoch_s").alias("bucket_ts"),
        "value",
    )


def compression_report(frames: DataFrame) -> DataFrame:
    """Per-(metric, compressor) ratio/error summary — the engine-side
    equivalent of the paper's Table I reporting."""
    return (
        frames.groupBy("metric", "compressor")
        .agg(
            F.count(F.lit(1)).alias("frames"),
            F.sum("sample_count").alias("samples"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("payload_bytes").alias("payload_bytes"),
            F.max("error").alias("max_error"),
        )
        .withColumn(
            "ratio", F.col("raw_bytes") / F.greatest(F.col("payload_bytes"), F.lit(1))
        )
    )
