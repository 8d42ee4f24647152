"""Polynomial (Catmull-Rom, id 0) and IDW (id 1) frame compressors.

NumPy re-expression of `/root/reference/atsc/src/compressor/polynomial.rs`.
Both compressors keep every ``step``-th sample (step = len // points,
min 1) plus always the last sample (`polynomial.rs:279-305`), storing
the kept values at the frame's recommended bit-depth.  They differ only
in reconstruction:

- Polynomial: a Catmull-Rom spline through the kept points, with Linear
  interpolation on the first segment and the last two segments (the
  spline needs one key behind and two ahead, `polynomial.rs:342-373`).
  The spline is a cubic Hermite with finite-difference tangents over
  the actual knot spacing, evaluated on per-segment normalized time —
  pinned by the reference's golden decoded vectors
  (`polynomial.rs:486-514`), including exact linearity on ramps.
- IDW: inverse-distance weighting with power 2 over the kept points,
  exact passthrough at kept positions (`polynomial.rs:375-393`; the
  power/exact-hit semantics are pinned by the reference's golden
  vectors at `polynomial.rs:538-569`).

Every reconstructed value is rounded to 5 decimals then clamped to
[min, max].  The bounded-error loop starts at max(3, len/100) points
and adds max(len/10, 1) on iterations 1-17, max(len/100, 1) on 18-22;
if the error bound is still unmet it stores *all* points and reports
error 0 (`polynomial.rs:209-277`).  ``point_step`` is stored as a u8 —
step > 255 truncates (reference quirk, `polynomial.rs:49,304`).
"""

from __future__ import annotations

import numpy as np

from .bincodec import Reader, Writer, ivarints_vec
from .errors import calculate_error
from .stats import I16, I32, U8
from .utils import round_and_limit, round_f64, saturating_cast

POLYNOMIAL_ID = 0
IDW_ID = 1
DECIMAL_PRECISION = 5


def _positions(frame_size: int, step: int) -> np.ndarray:
    """Kept-sample positions implied by (frame_size, step)
    (`polynomial.rs:329-340`): 0, step, 2*step, ... plus the last index."""
    pos = np.arange(0, frame_size, max(step, 1), dtype=np.int64)
    if pos[-1] != frame_size - 1:
        pos = np.append(pos, frame_size - 1)
    return pos


def catmull_rom_decode(
    positions: np.ndarray, values: np.ndarray, frame_size: int, vmin: float, vmax: float
) -> np.ndarray:
    """Evaluate the keyed spline at integer positions 0..frame_size-1.

    Segment i (keys i -> i+1) uses uniform Catmull-Rom when
    0 < i <= n_keys - 3, else Linear (`polynomial.rs:342-373`).
    """
    n_keys = len(positions)
    if n_keys == frame_size:
        # every sample is a key: the spline passes through keys exactly
        return round_and_limit(np.asarray(values, dtype=np.float64), vmin, vmax, DECIMAL_PRECISION)
    t = np.arange(frame_size, dtype=np.float64)
    # segment index for each sample: last key j with positions[j] <= t
    seg = np.searchsorted(positions, t, side="right") - 1
    seg = np.clip(seg, 0, n_keys - 2)
    p_lo = positions[seg].astype(np.float64)
    p_hi = positions[seg + 1].astype(np.float64)
    # masked divide instead of errstate: this runs once per bounded-fit
    # iteration and the errstate context alone costs ~13 us
    nt = np.divide(
        t - p_lo, p_hi - p_lo, out=np.zeros_like(t), where=p_hi > p_lo
    )

    v0 = values[seg]
    v1 = values[seg + 1]
    out = v0 + (v1 - v0) * nt  # linear default

    cr_mask = (seg > 0) & (seg <= n_keys - 3)
    if np.any(cr_mask):
        # Catmull-Rom as cubic Hermite with finite-difference tangents
        # over the actual knot spacing (the splines crate's sampling;
        # pinned by the reference's golden decoded vectors, including
        # exact linearity on linear ramps, `polynomial.rs:503-514`).
        s = seg[cr_mask]
        t0 = positions[s - 1].astype(np.float64)
        t1 = positions[s].astype(np.float64)
        t2 = positions[s + 1].astype(np.float64)
        t3 = positions[s + 2].astype(np.float64)
        vm1, va, vb, vp2 = values[s - 1], values[s], values[s + 1], values[s + 2]
        m0 = (vb - vm1) / (t2 - t0)
        m1 = (vp2 - va) / (t3 - t1)
        dt = t2 - t1
        u = nt[cr_mask]
        u2 = u * u
        u3 = u2 * u
        h00 = 2.0 * u3 - 3.0 * u2 + 1.0
        h10 = u3 - 2.0 * u2 + u
        h01 = -2.0 * u3 + 3.0 * u2
        h11 = u3 - u2
        out[cr_mask] = h00 * va + h10 * dt * m0 + h01 * vb + h11 * dt * m1

    # position == last key: clamped sample returns the last key's value
    out[t >= positions[-1]] = values[-1]
    return round_and_limit(out, vmin, vmax, DECIMAL_PRECISION)


def idw_decode(
    positions: np.ndarray, values: np.ndarray, frame_size: int, vmin: float, vmax: float
) -> np.ndarray:
    """Inverse-distance weighting, power 2, exact hit at kept points.

    The evaluation grid is processed in bounded chunks: a forced-IDW
    store-all frame can hold 131072 points, and the full
    frame_size x n_points distance matrix would be 131072^2 doubles
    (137 GB).  Chunking caps the working set at ~64 MB with identical
    results (each output row only reads its own distance row).
    """
    pos_f = positions.astype(np.float64)
    out = np.empty(frame_size, dtype=np.float64)
    max_cells = 8_000_000  # ~64 MB of f64 per temporary
    step = max(1, max_cells // max(len(pos_f), 1))
    for lo in range(0, frame_size, step):
        hi = min(lo + step, frame_size)
        x = np.arange(lo, hi, dtype=np.float64)
        d = x[:, None] - pos_f[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            w = 1.0 / (d * d)
            out[lo:hi] = (w @ values) / w.sum(axis=1)
    exact = np.isin(np.arange(frame_size), positions)
    out[exact] = values[np.searchsorted(positions, np.flatnonzero(exact))]
    return round_and_limit(out, vmin, vmax, DECIMAL_PRECISION)


class PolynomialFrame:
    def __init__(self, vmin: float, vmax: float, ptype: int, bitdepth: int) -> None:
        self.ptype = ptype  # POLYNOMIAL_ID or IDW_ID
        self.min = float(vmin)
        self.max = float(vmax)
        self.bitdepth = bitdepth
        self.values = np.empty(0, dtype=np.float64)
        self.point_step = 1
        self.error: float | None = None

    # ------------------------------------------------------------ compress

    def compress_hinted(self, data: np.ndarray, points: int) -> None:
        """`polynomial.rs:279-305`."""
        if self.max == self.min:
            return
        n = len(data)
        step = max(n // points, 1)
        pos = _positions(n, step)
        self.values = np.asarray(data, dtype=np.float64)[pos]
        self.point_step = step & 0xFF  # u8 truncation quirk

    def compress(self, data: np.ndarray) -> None:
        self.compress_hinted(data, max(3, len(data) // 100))

    def compress_bounded(self, data: np.ndarray, max_err: float) -> None:
        """`polynomial.rs:209-277` — same escalation schedule as the reference."""
        if self.max == self.min:
            self.error = None
            return
        data = np.asarray(data, dtype=np.float64)
        n = len(data)
        baseline = max(3, n // 100)
        current_err = max_err + 1.0
        jump = 0
        iterations = 0
        target = round_f64(max_err, 3)
        while target < round_f64(current_err, 4):
            iterations += 1
            self.compress_hinted(data, baseline + jump)
            if len(self.values) == n:
                # store-all: the loop always ends here with error forced
                # to 0, so the spline evaluation + MAPE of this (largest)
                # iteration are dead work — skip them.  Identical to the
                # reference's outcome (`polynomial.rs:262-268`).
                current_err = 0.0
                break
            out = self._decode(n)
            current_err = calculate_error(data, out)
            if 1 <= iterations <= 17:
                jump += max(n // 10, 1)
            elif 18 <= iterations <= 22:
                jump += max(n // 100, 1)
            elif target > round_f64(current_err, 4):
                break
            else:
                # bound unreachable: store everything, error becomes 0
                self.compress_hinted(data, n)
                current_err = 0.0
                break
        self.error = current_err

    # ------------------------------------------------------------ decode

    def _decode(self, frame_size: int) -> np.ndarray:
        if self.max == self.min:
            return np.full(frame_size, self.max, dtype=np.float64)
        pos = _positions(frame_size, self.point_step)
        # Stored values and implied positions can disagree in count only
        # through the u8 step truncation quirk; trust positions length.
        vals = self.values[: len(pos)]
        if self.ptype == IDW_ID:
            return idw_decode(pos[: len(vals)], vals, frame_size, self.min, self.max)
        return catmull_rom_decode(pos[: len(vals)], vals, frame_size, self.min, self.max)

    def to_data(self, frame_size: int) -> np.ndarray:
        return self._decode(frame_size)

    # ------------------------------------------------------------ bytes

    def to_bytes(self) -> bytes:
        """Payload layout per the manual Encode impl (`polynomial.rs:54-87`):
        id enum, bitdepth enum, points at bit-depth, min f64, max f64,
        point_step u8."""
        w = Writer()
        w.enum(self.ptype)
        w.enum(self.bitdepth)
        w.vec_len(len(self.values))
        if self.bitdepth == U8:
            w.raw(saturating_cast(self.values, np.uint8).tobytes())
        elif self.bitdepth == I16:
            w.raw(ivarints_vec(saturating_cast(self.values, np.int16)))
        elif self.bitdepth == I32:
            w.raw(ivarints_vec(saturating_cast(self.values, np.int32)))
        else:
            w.raw(np.asarray(self.values, dtype="<f8").tobytes())
        w.f64(self.min)
        w.f64(self.max)
        w.u8(self.point_step)
        return w.bytes()

    @classmethod
    def from_bytes(cls, payload: bytes) -> "PolynomialFrame":
        from .bincodec import parse_ivarints

        r = Reader(payload)
        ptype = r.enum()
        bitdepth = r.enum()
        n = r.vec_len()
        if bitdepth == U8:
            values = np.frombuffer(r.raw(n), dtype=np.uint8).astype(np.float64)
        elif bitdepth in (I16, I32):
            ints, pos = parse_ivarints(payload, n, r.pos)
            values = ints.astype(np.float64)
            r.pos = pos
        else:
            values = np.frombuffer(r.raw(8 * n), dtype="<f8").astype(np.float64)
        vmin = r.f64()
        vmax = r.f64()
        step = r.u8()
        frame = cls(vmin, vmax, ptype, bitdepth)
        frame.values = values
        frame.point_step = step
        return frame


def polynomial_compress(
    data: np.ndarray, max_error: float, stats, ptype: int = POLYNOMIAL_ID
) -> tuple[bytes, float]:
    """Bounded-error entry point (`polynomial.rs:415-425`)."""
    frame = PolynomialFrame(stats.min, stats.max, ptype, stats.bitdepth)
    frame.compress_bounded(data, max_error)
    return frame.to_bytes(), frame.error if frame.error is not None else 0.0


def polynomial_decompress(sample_count: int, payload: bytes) -> np.ndarray:
    return PolynomialFrame.from_bytes(payload).to_data(sample_count)
