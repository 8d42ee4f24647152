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


def catmull_eval_batched(
    data: np.ndarray, steps: np.ndarray, vmin: float, vmax: float
) -> np.ndarray:
    """Evaluate the Catmull-Rom reconstruction for MANY step sizes in
    one 2-D pass: row j is exactly ``catmull_rom_decode`` of the keys
    implied by ``steps[j]``.

    Bit-identical to the sequential evaluation because the kept
    positions are REGULAR — ``0, s, 2s, ...`` plus the final index —
    so ``searchsorted(positions, t)`` collapses to ``t // s`` (the
    appended last key never owns a segment start below n-1), position
    gathers become arithmetic, and every floating-point expression is
    the same elementwise formula the 1-D path computes.  Discarded
    lanes (linear fallback where the Hermite branch doesn't apply) are
    computed-then-dropped via ``np.where``; their divisors are provably
    nonzero, so no special-value pollution.
    """
    n = len(data)
    U = len(steps)
    out = np.empty((U, n), dtype=np.float64)
    # bound the working set: ~15 (chunk, n) temporaries at 8 bytes
    chunk = max(1, 4_000_000 // n)
    for lo in range(0, U, chunk):
        out[lo : lo + chunk] = _catmull_eval_rows(data, steps[lo : lo + chunk])
    return round_and_limit(out, vmin, vmax, DECIMAL_PRECISION)


def _catmull_eval_rows(data: np.ndarray, steps: np.ndarray) -> np.ndarray:
    n = len(data)
    s = steps[:, None]  # (U, 1)
    k0 = (n + steps - 1) // steps  # arange key count per row
    appended = ((k0 - 1) * steps) != (n - 1)
    n_keys = k0 + appended
    ti = np.arange(n, dtype=np.int64)[None, :]
    seg = np.minimum(ti // s, (n_keys - 2)[:, None])

    def pos(idx):  # key position for key index (appended key sits at n-1)
        return np.where(idx < k0[:, None], idx * s, n - 1)

    p_lo_i = seg * s  # seg < k0 always, so no appended-key case here
    p_hi_i = pos(seg + 1)
    t = ti.astype(np.float64)
    p_lo = p_lo_i.astype(np.float64)
    p_hi = p_hi_i.astype(np.float64)
    nt = np.divide(t - p_lo, p_hi - p_lo, out=np.zeros_like(p_lo), where=p_hi > p_lo)
    v0 = data[p_lo_i]
    v1 = data[p_hi_i]
    out = v0 + (v1 - v0) * nt

    cr = (seg > 0) & (seg <= (n_keys - 3)[:, None])
    if cr.any():
        t0i = (seg - 1) * s
        t3i = pos(seg + 2)
        vm1 = data[np.maximum(t0i, 0)]  # clip only the discarded seg==0 lanes
        vp2 = data[t3i]
        t0 = t0i.astype(np.float64)
        t3 = t3i.astype(np.float64)
        m0 = (v1 - vm1) / (p_hi - t0)
        m1 = (vp2 - v0) / (t3 - p_lo)
        dt = p_hi - p_lo
        u2 = nt * nt
        u3 = u2 * nt
        h00 = 2.0 * u3 - 3.0 * u2 + 1.0
        h10 = u3 - 2.0 * u2 + nt
        h01 = -2.0 * u3 + 3.0 * u2
        h11 = u3 - u2
        out = np.where(cr, h00 * v0 + h10 * dt * m0 + h01 * v1 + h11 * dt * m1, out)
    out[:, n - 1] = data[n - 1]
    return out


def _mape_rows(outs: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Row-wise ``error_mape`` with the reference's zero quirks
    (0/0 -> NaN, x/0 -> inf), summation matching the 1-D path
    bit-for-bit (contiguous-row pairwise sums)."""
    n = len(data)
    diff = np.abs(outs - data[None, :])
    nz = data != 0.0
    if nz.all():
        return (diff / np.abs(data)[None, :]).sum(axis=1) / n
    terms = np.divide(
        diff, np.abs(data)[None, :], out=np.full_like(diff, np.nan), where=nz[None, :]
    )
    zcols = np.flatnonzero(~nz)
    sub = terms[:, zcols]
    sub[diff[:, zcols] > 0] = np.inf
    terms[:, zcols] = sub
    return terms.sum(axis=1) / n


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

    @staticmethod
    def _point_schedule(n: int) -> list[int]:
        """The reference's 23-point escalation schedule
        (`polynomial.rs:209-277`): iteration k uses
        ``baseline + sum(increments through k-1)`` where increments are
        max(n/10, 1) for iterations 1-17 and max(n/100, 1) for 18-22."""
        baseline = max(3, n // 100)
        points = [baseline]
        jump = 0
        for it in range(1, 23):
            jump += max(n // 10, 1) if it <= 17 else max(n // 100, 1)
            points.append(baseline + jump)
        return points

    def compress_bounded(self, data: np.ndarray, max_err: float) -> None:
        """`polynomial.rs:209-277` — walk the escalation schedule until
        MAPE passes the bound, store-all (error forced to 0) if it
        never does.

        Measured negative result (round 3, BENCH.md): a batched 2-D
        schedule evaluation (:func:`catmull_eval_batched`, equivalence
        hypothesis-proven by ``test_poly_batched_equals_sequential``)
        is 6-56% SLOWER than this lazy loop across small/day/large
        frames — ~99% of passing frames exit by iteration 2 (eager
        evaluation is wasted work), the n/10 jump schedule caps live
        iterations at ~6 for any n, and the batched seg arithmetic
        (integer division + hermite-everywhere) costs more per element
        than searchsorted + masked hermite.  Unlike the FFT there is no
        cumsum structure to share across budgets, so the batch saves
        only call overhead that was never the cost.
        """
        self._compress_bounded_sequential(np.asarray(data, dtype=np.float64), max_err)

    def compress_bounded_batched(self, data: np.ndarray, max_err: float) -> None:
        """Batched-schedule variant, outcome-identical to
        :meth:`compress_bounded` (hypothesis-proven) — kept as the
        measured alternative; see compress_bounded's docstring."""
        if self.max == self.min:
            self.error = None
            return
        data = np.asarray(data, dtype=np.float64)
        n = len(data)
        if self.ptype != POLYNOMIAL_ID or n < 2:
            self._compress_bounded_sequential(data, max_err)
            return

        target = round_f64(max_err, 3)

        def exits(err: float) -> bool:
            # loop-condition complement: `while target < round4(err)`
            # (NaN compares False, so a NaN error exits keeping the
            # current frame — the MAPE zero quirk)
            return not (target < round_f64(err, 4))

        points = self._point_schedule(n)
        steps = [max(n // p, 1) for p in points]
        # first store-all iteration (step 1 <=> every sample is a key)
        first_store = next((k for k, s in enumerate(steps) if s == 1), None)
        live = steps if first_store is None else steps[:first_store]

        # phase 1: iterations 1-3 sequentially (where exits concentrate)
        err_by_step: dict[int, float] = {}
        for k in range(1, min(3, len(live)) + 1):
            step = live[k - 1]
            if step not in err_by_step:
                self.compress_hinted(data, points[k - 1])
                err_by_step[step] = calculate_error(data, self._decode(n))
            if exits(err_by_step[step]):
                self.compress_hinted(data, points[k - 1])
                self.error = err_by_step[step]
                return

        # phase 2: the deep tail in ONE batched evaluation over the
        # unique remaining steps — equal steps produce identical frames
        # and errors, so dedup can't change selection
        rest = live[3:]
        if rest:
            uniq = sorted(set(rest) - set(err_by_step), reverse=True)
            if uniq:
                outs = catmull_eval_batched(
                    data, np.asarray(uniq, dtype=np.int64), self.min, self.max
                )
                errs = _mape_rows(outs, data)
                err_by_step.update(zip(uniq, (float(e) for e in errs)))
            for k, step in enumerate(rest, start=4):
                err_k = err_by_step[step]
                if k <= 22 and exits(err_k):
                    self.compress_hinted(data, points[k - 1])
                    self.error = err_k
                    return
                if k == 23:
                    # iteration 23's post-fit branch is asymmetric:
                    # strict `target > round4(err)` keeps the frame,
                    # anything else (incl. equality and NaN) stores all
                    if target > round_f64(err_k, 4):
                        self.compress_hinted(data, points[22])
                        self.error = err_k
                        return

        # store-all: reached either by step hitting 1 mid-schedule or
        # by iteration 23 failing its strict check
        self.compress_hinted(data, n)
        self.error = 0.0

    def _compress_bounded_sequential(self, data: np.ndarray, max_err: float) -> None:
        """The literal reference loop (`polynomial.rs:209-277`) — the
        IDW path, and the equivalence anchor the batched path is
        hypothesis-tested against."""
        if self.max == self.min:
            self.error = None
            return
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
