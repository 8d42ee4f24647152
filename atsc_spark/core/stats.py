"""Single-pass frame statistics + storage bit-depth recommendation.

Mirrors `DataStats` in the reference
(`/root/reference/atsc/src/optimizer/utils.rs:39-113`): min/max (with
locations), mean, whether any value has a fractional part, and the
narrowest integer storage width that can hold the data
(U8 / I16 / I32, else F64).  The reference detects fractional parts
with a bit-level mantissa split (`optimizer/utils.rs:115-160`); we use
``np.modf``, which agrees on the "fraction != 0" predicate for all
finite inputs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Bincode enum variant indices (`optimizer/utils.rs:20-26`).
F64, I32, I16, U8 = 0, 1, 2, 3

BITDEPTH_NAMES = {F64: "f64", I32: "i32", I16: "i16", U8: "u8"}
BITDEPTH_IDS = {v: k for k, v in BITDEPTH_NAMES.items()}


@dataclass
class DataStats:
    min: float
    max: float
    min_loc: int
    max_loc: int
    mean: float
    bitdepth: int  # one of F64/I32/I16/U8
    fractional: bool


def _bitdepth(max_int: int, min_int: int) -> int:
    """`optimizer/utils.rs:91-113`."""
    if max_int <= 0xFF:
        depth = 8
    elif max_int <= 0x7FFF:
        depth = 16
    elif max_int <= 0x7FFFFFFF:
        depth = 32
    else:
        depth = 64

    if 0 <= min_int <= 0xFF:
        depth_signed = 8
    elif min_int >= -(2**15):
        depth_signed = 16
    elif min_int >= -(2**31):
        depth_signed = 32
    else:
        depth_signed = 64

    return {8: U8, 16: I16, 32: I32, 64: F64}[max(depth, depth_signed)]


def data_stats(data: np.ndarray) -> DataStats:
    """Vectorized equivalent of `DataStats::new` (`optimizer/utils.rs:39-89`).

    Location ties resolve to the first occurrence, like the reference's
    strict ``>``/``<`` comparisons during its forward walk.
    """
    v = np.asarray(data, dtype=np.float64)
    # argmin/argmax return the FIRST extremum, same tie rule as the
    # reference's strict-comparison walk; one pass each instead of
    # min + equality-scan + argmax
    min_loc = int(np.argmin(v))
    max_loc = int(np.argmax(v))
    vmin = float(v[min_loc])
    vmax = float(v[max_loc])
    mean = float(v.mean())
    fractional = bool(np.any(np.modf(v)[0] != 0.0))
    bitdepth = F64
    if not fractional:
        bitdepth = _bitdepth(int(vmax), int(vmin))
    return DataStats(vmin, vmax, min_loc, max_loc, mean, bitdepth, fractional)
