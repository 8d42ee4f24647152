"""Error metrics between an original and a reconstructed series.

NumPy re-expression of `/root/reference/atsc/src/utils/error.rs`.
MAPE is the default metric everywhere in the reference
(`error.rs:20-27,44-46`).  Note the reference's documented quirk: MAPE
is NaN/inf-prone when the original contains zeros (`error.rs:104-116`,
in-source TODO).  We reproduce that behaviour — NaN errors make a
candidate fail the ``error <= bound`` filter in auto-selection exactly
as Rust float comparisons do.
"""

from __future__ import annotations

import numpy as np


def _check(original: np.ndarray, generated: np.ndarray) -> None:
    if len(original) != len(generated):
        raise ValueError("Can't compute error! Arrays with different lengths.")


def error_mse(original, generated) -> float:
    o = np.asarray(original, dtype=np.float64)
    g = np.asarray(generated, dtype=np.float64)
    _check(o, g)
    return float(np.mean((o - g) ** 2))


def error_nmse(original, generated) -> float:
    o = np.asarray(original, dtype=np.float64)
    g = np.asarray(generated, dtype=np.float64)
    _check(o, g)
    return float(np.sum((g - o) ** 2) / np.sum(o**2))


def error_mae(original, generated) -> float:
    o = np.asarray(original, dtype=np.float64)
    g = np.asarray(generated, dtype=np.float64)
    _check(o, g)
    return float(np.mean(np.abs(g - o)))


def error_mape(original, generated) -> float:
    """`error.rs:104-116` — mean(|(g - o) / o|); NaN when o has zeros
    and the reconstruction differs there (0/0 -> NaN propagates).

    IEEE zero-division semantics are produced explicitly (masked divide
    + inf/NaN fill) instead of under np.errstate: this runs a couple
    hundred thousand times per fit task and the errstate context
    manager alone costs ~13 us/call.
    """
    o = np.asarray(original, dtype=np.float64)
    g = np.asarray(generated, dtype=np.float64)
    _check(o, g)
    diff = np.abs(g - o)
    nz = o != 0.0
    if nz.all():  # common case: plain division, no special values
        return float(np.sum(diff / np.abs(o)) / len(o))
    # 0/0 -> NaN, x/0 -> inf, exactly like unguarded IEEE division
    out = np.divide(diff, np.abs(o), out=np.full_like(diff, np.nan), where=nz)
    out[~nz & (diff > 0)] = np.inf
    return float(np.sum(out) / len(o))


def error_smape(original, generated) -> float:
    """`error.rs:122-137` — skips exact 0/0 pairs, divides by full n."""
    o = np.asarray(original, dtype=np.float64)
    g = np.asarray(generated, dtype=np.float64)
    _check(o, g)
    keep = ~((o == 0.0) & (g == 0.0))
    sum_up = np.float64(np.sum(np.abs(g[keep] - o[keep])))
    sum_down = np.float64(np.sum(np.abs(o[keep]) + np.abs(g[keep])))
    with np.errstate(divide="ignore", invalid="ignore"):
        # IEEE semantics (0/0 -> NaN), matching Rust f64 division
        return float((sum_up / sum_down) / np.float64(len(o)))


def calculate_error(original, generated) -> float:
    """Default error metric (`error.rs:44-46`): MAPE."""
    return error_mape(original, generated)
