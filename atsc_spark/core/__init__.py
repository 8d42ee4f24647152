"""Pure-NumPy frame codec core (no Spark dependency).

Everything in this package is a deterministic pure function of its
inputs, so the Spark layer can call it inside Arrow-batched pandas
UDFs with per-frame parallelism.
"""

from .errors import (
    calculate_error,
    error_mae,
    error_mape,
    error_mse,
    error_nmse,
    error_smape,
)
from .frame import (
    AUTO,
    CONSTANT,
    COMPRESSOR_IDS,
    COMPRESSOR_NAMES,
    FFT,
    IDW,
    MAX_FRAME_SIZE,
    MIN_FRAME_SIZE,
    NOOP,
    POLYNOMIAL,
    RLE,
    FrameResult,
    clean_data,
    compress_best,
    compress_frame,
    compress_series,
    decompress_frame,
    decompress_series,
    get_chunk_sizes,
    stream_from_bytes,
    stream_to_bytes,
)
from .stats import BITDEPTH_IDS, BITDEPTH_NAMES, DataStats, data_stats
from .utils import (
    DECIMAL_PRECISION,
    is_decomposable,
    next_size,
    prev_power_of_two,
    round_and_limit,
    round_f64,
)

__all__ = [name for name in dir() if not name.startswith("_")]
