"""FFT frame compressor (id 15).

NumPy re-expression of `/root/reference/atsc/src/compressor/fft.rs`.
The signal is transformed with a single-precision real FFT, the top-N
frequencies by norm are kept as ``(pos: u16, re: f32, im: f32)``
triples plus the frame's min/max as f32, and decompression mirrors the
half-spectrum, inverse-transforms, rounds to 5 decimals and clamps to
[min, max] (`fft.rs:426-462`).

Parity-relevant quirks preserved:

- arithmetic is f32 end-to-end (`fft.rs:173-180,221-228`);
- Gibbs padding to the next 2^N*3^M size with edge values split
  front/back when len >= 128 (`fft.rs:184-204,305-309`), trimmed on
  decompress (`fft.rs:432-444`);
- the bounded-error loop evaluates MAPE against the *padded* series
  (`fft.rs:341-345`) and compares at 3-decimal fixed point through a
  saturating ``as i32`` cast (`fft.rs:334`);
- iteration schedule: start at max(3, len/100) freqs, add
  max(max_freq/2, 1) on iterations 1-17, max(max_freq/10, 1) on 18-22,
  then stop (`fft.rs:346-352`);
- ``fft_trim`` with max_freq == 1 keeps the DC bin regardless of
  magnitude, and popping an exactly-zero frequency stops the selection
  (`fft.rs:231-257`).
"""

from __future__ import annotations

import numpy as np

from .bincodec import Reader, Writer
from .errors import calculate_error
from .utils import next_size, round_half_away, rust_f64_as_i32

FFT_ID = 15
DECIMAL_PRECISION = 5


def gibbs_sizing(data: np.ndarray) -> np.ndarray:
    """Pad to the next 2^N*3^M size with edge values (`fft.rs:184-204`)."""
    n = len(data)
    target = next_size(n)
    added = target - n
    prefix = added // 2
    suffix = added - prefix
    return np.concatenate(
        [np.full(prefix, data[0]), data, np.full(suffix, data[-1])]
    )


def _round_clamp(values_f32: np.ndarray, vmin_f32: float, vmax_f32: float) -> np.ndarray:
    """`FFT::round` (`fft.rs:208-218`): f32 -> f64, round 5 decimals, clamp."""
    x = values_f32.astype(np.float64)
    out = round_half_away(x * 1e5) / 1e5
    return np.clip(out, np.float64(np.float32(vmin_f32)), np.float64(np.float32(vmax_f32)))


class FreqSet:
    """The selected half-spectrum bins as parallel arrays.

    Array-native on purpose: the bounded-error loop re-selects and
    re-evaluates up to 23 times per frame, and list-of-tuples churn
    (build tuples, fromiter them back) was the single largest cost of
    the whole fit stage under the in-worker profiler.
    """

    __slots__ = ("pos", "re", "im")

    def __init__(self, pos: np.ndarray, re: np.ndarray, im: np.ndarray) -> None:
        self.pos = pos
        self.re = re
        self.im = im

    def __len__(self) -> int:
        return len(self.pos)

    def __iter__(self):  # tuple view (tests / to_bytes)
        return iter(zip(self.pos.tolist(), self.re, self.im))


def fft_trim(
    spectrum: np.ndarray, max_freq: int, order: np.ndarray | None = None
) -> FreqSet:
    """Keep the top ``max_freq`` bins by norm (`fft.rs:231-257`).

    Ties resolve by ascending position (stable sort); the reference's
    BinaryHeap tie order is unspecified, so exact-tie frames may select
    a different-but-equal-norm bin — decoded values are unaffected.

    ``order`` lets the bounded-error loop pass a precomputed norm
    argsort: the spectrum never changes between iterations, only the
    budget does, so sorting once per frame instead of once per
    iteration removes a dominant loop cost.
    """
    if max_freq == 1:
        c = spectrum[:1]
        return FreqSet(
            np.zeros(1, dtype=np.int64),
            c.real.astype(np.float32),
            c.imag.astype(np.float32),
        )
    if order is None:
        order = np.argsort(-np.abs(spectrum).astype(np.float64), kind="stable")
    sel = order[:max_freq]
    c = spectrum[sel]
    re = c.real.astype(np.float32, copy=False)
    im = c.imag.astype(np.float32, copy=False)
    # popping an exactly-zero frequency stops the selection (fft.rs:252)
    zero = (re == 0.0) & (im == 0.0)
    if zero.any():
        cut = int(np.argmax(zero))
        sel, re, im = sel[:cut], re[:cut], im[:cut]
    return FreqSet(sel.astype(np.int64), re, im)


def _mirror(freqs: FreqSet, length: int) -> np.ndarray:
    """Rebuild the full complex spectrum from the stored half
    (`fft.rs:401-422`): conjugate-mirror every non-DC bin.
    Vectorized scatter (runs up to 22x per bounded-error fit)."""
    full = np.zeros(length, dtype=np.complex64)
    if not len(freqs):
        return full
    pos, re, im = freqs.pos, freqs.re, freqs.im
    full[pos] = re + 1j * im
    nz = pos != 0
    full[length - pos[nz]] = re[nz] - 1j * im[nz]
    return full


def _ifft_real(freqs, length: int) -> np.ndarray:
    """Inverse FFT (normalized by len, like the reference's manual
    division, `fft.rs:338-344`), real part.

    The inverse transform runs in double precision over the f32-stored
    frequencies; the subsequent round-to-5-decimals absorbs the f32
    noise the reference's all-f32 pipeline carries.
    """
    full = _mirror(freqs, length).astype(np.complex128)
    return np.fft.ifft(full).real.astype(np.float32)


class FFTFrame:
    def __init__(self, vmin: float, vmax: float) -> None:
        self.min = np.float32(vmin)
        self.max = np.float32(vmax)
        e = np.empty(0, dtype=np.int64)
        self.freqs = FreqSet(e, e.astype(np.float32), e.astype(np.float32))
        self.error: float | None = None

    # ------------------------------------------------------------ compress

    def compress_hinted(self, data: np.ndarray, max_freq: int) -> None:
        """`fft.rs:262-282` — fixed frequency budget, no error loop."""
        if self.max == self.min:
            return
        # FFT in double precision, spectrum cast to f32 for storage —
        # matches rustfft's f32 results to the last ulp on the golden
        # vectors (rustfft accumulates less error than an all-f32
        # numpy transform would).
        buf = np.fft.fft(np.asarray(data, dtype=np.float64))
        half = buf[: len(buf) // 2 + 1].astype(np.complex64)
        self.freqs = fft_trim(half, max_freq)

    def compress(self, data: np.ndarray) -> None:
        """`fft.rs:366-388` — budget = max(3, len/100)."""
        self.compress_hinted(data, max(3, len(data) // 100))

    @staticmethod
    def _budget_schedule(max_freq: int) -> list[int]:
        """The reference's 23-point budget schedule (`fft.rs:346-352`):
        start at max_freq, +max(max_freq/2,1) on iterations 1-17,
        +max(max_freq/10,1) on 18-22."""
        budgets = [max_freq]
        jump = 0
        for it in range(1, 23):
            jump += max(max_freq // 2, 1) if it <= 17 else max(max_freq // 10, 1)
            budgets.append(max_freq + jump)
        return budgets

    def compress_bounded(self, data: np.ndarray, max_err: float) -> None:
        """`fft.rs:288-362` — walk the budget schedule until MAPE <=
        max_err (first passing budget wins, like the reference's loop).

        Two-phase evaluation: the first budget is tried alone (most
        compressible frames converge immediately); if it fails, the
        remaining 22 schedule points are evaluated in ONE batched pass
        (incremental spectra via cumsum + one matrix inverse FFT) —
        bit-identical to iterating, because every spectrum cell is
        written exactly once (no float-order effects), at ~1/20th the
        per-call numpy overhead.  test_property_codec pins equality
        against the sequential reference loop.
        """
        if self.max == self.min:
            return
        max_freq = max(3, len(data) // 100)
        g_data = gibbs_sizing(data) if len(data) >= 128 else np.asarray(data, dtype=np.float64)
        buf = np.fft.fft(g_data)
        half = buf[: len(buf) // 2 + 1].astype(np.complex64)
        order = np.argsort(-np.abs(half).astype(np.float64), kind="stable")
        self._compress_bounded_pre(g_data, half, order, max_freq, max_err)

    def _compress_bounded_pre(
        self,
        g_data: np.ndarray,
        half: np.ndarray,
        order: np.ndarray,
        max_freq: int,
        max_err: float,
        skip_first: bool = False,
    ) -> None:
        """Bounded loop body over a precomputed (padded data, half
        spectrum, norm argsort) — lets the cross-frame batched phase-1
        (core/batchfit.py) hand off failing frames without recomputing
        the FFT.  ``skip_first`` jumps straight to phase 2 when the
        caller already evaluated (and failed) the first budget."""
        length = len(g_data)
        budgets = self._budget_schedule(max_freq)
        bound = rust_f64_as_i32(max_err * 1000.0)

        def fails(err: float) -> bool:
            return bound < rust_f64_as_i32(err * 1000.0)

        # phase 1: first budget alone
        if not skip_first:
            self.freqs = fft_trim(half, budgets[0], order=order)
            out = _round_clamp(_ifft_real(self.freqs, length), self.min, self.max)
            self.error = calculate_error(g_data, out)
            if not fails(self.error):
                return

        # phase 2: batch the remaining schedule points
        re_all = half.real.astype(np.float32)
        im_all = half.imag.astype(np.float32)
        zero = (re_all[order] == 0.0) & (im_all[order] == 0.0)
        cut = int(np.argmax(zero)) if zero.any() else len(order)
        caps = np.minimum(np.asarray(budgets[1:], dtype=np.int64), cut)
        base = min(budgets[0], cut)
        k = len(caps)

        M = np.zeros((k, length), dtype=np.complex128)
        top = int(caps[-1])
        if top > base:
            idxs = np.arange(base, top, dtype=np.int64)
            rows = np.searchsorted(caps, idxs, side="right")
            sel = order[idxs]
            vals = (re_all[sel].astype(np.float64) + 1j * im_all[sel].astype(np.float64))
            selfm = (sel != 0) & (2 * sel == length)  # Nyquist self-mirror
            plain = ~selfm
            # direct cells (overwritten by conj at self-mirror positions,
            # matching _mirror's scatter-then-overwrite order)
            M[rows[plain], sel[plain]] = vals[plain]
            M[rows[selfm], sel[selfm]] = np.conj(vals[selfm])
            mir = plain & (sel != 0)
            M[rows[mir], length - sel[mir]] = np.conj(vals[mir])
            M = np.cumsum(M, axis=0)
        M += _mirror(fft_trim(half, base, order=order), length).astype(np.complex128)[None, :]

        outs = np.fft.ifft(M, axis=1).real.astype(np.float32)
        outs = _round_clamp(outs, self.min, self.max)
        diff = np.abs(outs - g_data[None, :])
        nz = g_data != 0.0
        if nz.all():
            errs = (diff / np.abs(g_data)[None, :]).sum(axis=1) / length
        else:
            terms = np.divide(
                diff, np.abs(g_data)[None, :], out=np.full_like(diff, np.nan),
                where=nz[None, :],
            )
            zcols = np.flatnonzero(~nz)
            sub = terms[:, zcols]
            sub[diff[:, zcols] > 0] = np.inf
            terms[:, zcols] = sub
            errs = terms.sum(axis=1) / length
        for j in range(k):
            if not fails(float(errs[j])):
                self.freqs = fft_trim(half, int(budgets[1 + j]), order=order)
                self.error = float(errs[j])
                return
        self.freqs = fft_trim(half, int(budgets[-1]), order=order)
        self.error = float(errs[-1])

    # ------------------------------------------------------------ bytes

    def to_bytes(self) -> bytes:
        """Payload layout per the reference's manual Encode impl
        (`fft.rs:119-130`): id, Vec<FrequencyPoint>, max f32, min f32.
        The error field is deliberately not persisted.

        Positions are standard bincode varints.  The reference stores
        ``pos: u16`` (`fft.rs:36`) and only tolerates the cast because
        its frames cap at 65535 samples; varint encoding is
        byte-identical for pos <= 65535, and for our larger 131072
        frames (Gibbs-padded to 139968, positions up to 69984) we write
        the full varint — ``from_bytes`` reads full varints, so large
        frames round-trip instead of silently wrapping onto low bins.
        """
        w = Writer()
        w.u8(FFT_ID)
        w.vec_len(len(self.freqs))
        for pos, re, im in self.freqs:
            w.uvarint(pos)
            w.f32(float(re))
            w.f32(float(im))
        w.f32(float(self.max))
        w.f32(float(self.min))
        return w.bytes()

    @classmethod
    def from_bytes(cls, payload: bytes) -> "FFTFrame":
        r = Reader(payload)
        cid = r.u8()
        assert cid == FFT_ID, cid
        n = r.vec_len()
        pos = np.empty(n, dtype=np.int64)
        re = np.empty(n, dtype=np.float32)
        im = np.empty(n, dtype=np.float32)
        for i in range(n):
            pos[i] = r.uvarint()
            re[i] = r.f32()
            im[i] = r.f32()
        vmax = r.f32()
        vmin = r.f32()
        frame = cls(vmin, vmax)
        frame.freqs = FreqSet(pos, re, im)
        return frame

    # ------------------------------------------------------------ decode

    def to_data(self, frame_size: int) -> np.ndarray:
        """`fft.rs:426-462`: mirror, inverse FFT, trim Gibbs pad, round+clamp."""
        if self.max == self.min:
            return np.full(frame_size, np.float64(self.max), dtype=np.float64)
        if frame_size >= 128:
            added = next_size(frame_size) - frame_size
            prefix, suffix = added // 2, added - added // 2
        else:
            prefix = suffix = 0
        padded_size = frame_size + prefix + suffix
        out = _ifft_real(self.freqs, padded_size)
        out = out[prefix : padded_size - suffix]
        return _round_clamp(out, self.min, self.max)


def fft_compress(data: np.ndarray, max_error: float, stats) -> tuple[bytes, float]:
    """Bounded-error entry point (`fft.rs:516-524`)."""
    frame = FFTFrame(stats.min, stats.max)
    frame.compress_bounded(data, max_error)
    return frame.to_bytes(), frame.error if frame.error is not None else 0.0


def fft_decompress(sample_count: int, payload: bytes) -> np.ndarray:
    return FFTFrame.from_bytes(payload).to_data(sample_count)
