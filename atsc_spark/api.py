"""Public API with the reference CLI's knob names
(`/root/reference/atsc/src/main.rs:174-232`):

    compress(values, compressor="auto", error=3, compression_speed=0)
    decompress(stream_bytes)

plus the DataFrame-level equivalents (`compress_df`/`decompress_df`)
that run the same math distributed.
"""

from __future__ import annotations

import numpy as np

from .core.frame import (
    COMPRESSOR_IDS,
    compress_series,
    decompress_series,
    stream_from_bytes,
    stream_to_bytes,
)

VALID_COMPRESSORS = ("auto", "noop", "fft", "constant", "polynomial", "idw", "rle")


def compress(
    values,
    compressor: str = "auto",
    error: int = 3,
    compression_speed: int = 0,
) -> bytes:
    """One series -> `.bro` stream bytes.  `error` is a percentage
    (0..50) exactly like the CLI flag; internally error/100 like
    `main.rs:150-159`."""
    if compressor not in VALID_COMPRESSORS:
        raise ValueError(f"compressor must be one of {VALID_COMPRESSORS}")
    if not 0 <= error <= 50:
        raise ValueError("error must be within 0..50 (percent)")
    if not 0 <= compression_speed <= 6:
        raise ValueError("compression_speed must be within 0..6")
    frames = compress_series(
        np.asarray(values, dtype=np.float64),
        COMPRESSOR_IDS[compressor],
        max_error=error / 100.0,
        speed=compression_speed,
    )
    return stream_to_bytes(frames)


def decompress(stream: bytes) -> np.ndarray:
    """`.bro` stream bytes -> values (`main.rs:72-83`)."""
    return decompress_series(stream_from_bytes(stream))


def compress_df(series_df, compressor: str = "auto", error: int = 3, compression_speed: int = 0):
    """Distributed equivalent over a (conv_id, metric, bucket_ts, value)
    DataFrame -> frames table."""
    from .frames import fit_frames

    return fit_frames(
        series_df,
        max_error=error / 100.0,
        compressor=compressor,
        speed=compression_speed,
    )


def decompress_df(frames_df):
    from .frames import decode_frames

    return decode_frames(frames_df)
