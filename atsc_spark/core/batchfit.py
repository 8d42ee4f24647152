"""Cross-frame batched auto tournament.

The per-frame tournament (`frame.compress_best`) costs ~0.5 ms of
numpy fixed overhead on a small frame — and a transcripts fit batch is
dominated by tens of thousands of SMALL frames (Zipf conversation
lengths), so the per-call overhead, not the math, is the fit wall.
This module runs the tournament for MANY same-length frames at once:

- frames are bucketed by length; each cohort shares its FFT pad size,
  budget schedule and polynomial point schedule, so phase-1 FFT
  (2-D ``np.fft`` — bit-identical to per-row 1-D on pocketfft, pinned
  by test) and each polynomial escalation step become one (F, n)
  vectorized pass over the cohort;
- every per-frame decision (pass/fail, store-all, candidate selection,
  payload bytes) replays the sequential code paths exactly — the
  arithmetic is the same elementwise formulas on stacked rows, and
  ``test_batchfit_equals_sequential`` pins result equality (compressor
  choice, payload bytes, reported error) against
  :func:`frame.compress_best` frame by frame;
- frames the batch cannot express (FFT zero-frequency early-stop,
  phase-2 escalation) fall back to the per-frame path, reusing the
  cohort's precomputed spectra (`FFTFrame._compress_bounded_pre`).

Only the AUTO + speed-0 path batches (that is the fit default and the
only shape the flagship queries use); anything else routes to the
existing per-frame functions unchanged.
"""

from __future__ import annotations

import numpy as np

from .fft import FFTFrame, fft_trim, gibbs_sizing
from .frame import CONSTANT, FFT, POLYNOMIAL, RLE, FrameResult, compress_best
from .polynomial import POLYNOMIAL_ID, PolynomialFrame
from .simple import (
    constant_compress,
    rle_compress_batch,
    rle_min_bytes,
)
from .stats import data_stats
from .utils import round_f64, round_half_away, rust_f64_as_i32


def _mape_rows_paired(outs: np.ndarray, data_mat: np.ndarray) -> np.ndarray:
    """Row-wise ``error_mape(data_mat[i], outs[i])`` with the
    reference's zero quirks (0/0 -> NaN, x/0 -> inf); contiguous-row
    pairwise sums match the 1-D path bit-for-bit."""
    n = outs.shape[1]
    diff = np.abs(outs - data_mat)
    nz = data_mat != 0.0
    if nz.all():
        return (diff / np.abs(data_mat)).sum(axis=1) / n
    terms = np.divide(diff, np.abs(data_mat), out=np.full_like(diff, np.nan), where=nz)
    terms[~nz & (diff > 0)] = np.inf
    return terms.sum(axis=1) / n

#: only batch cohorts where the (F, n) working set stays small; larger
#: frames amortize their own numpy calls anyway
MAX_BATCH_FRAME = 4096
MAX_COHORT_CELLS = 250_000


def compress_frames_batch(datas: list[np.ndarray], max_error: float) -> list[FrameResult]:
    """AUTO/speed-0 tournament for a list of frames; results are
    index-aligned with ``datas`` and identical to
    ``[compress_best(d, max_error) for d in datas]``."""
    results: list[FrameResult | None] = [None] * len(datas)
    cohorts: dict[int, list[int]] = {}
    for i, d in enumerate(datas):
        n = len(d)
        if n == 0 or n > MAX_BATCH_FRAME:
            results[i] = compress_best(np.asarray(d, dtype=np.float64), max_error)
        else:
            cohorts.setdefault(n, []).append(i)
    for n, idxs in cohorts.items():
        chunk = max(1, MAX_COHORT_CELLS // n)
        for lo in range(0, len(idxs), chunk):
            part = idxs[lo : lo + chunk]
            mat = np.stack([np.asarray(datas[i], dtype=np.float64) for i in part])
            for j, res in zip(part, _cohort_tournament(mat, max_error)):
                results[j] = res
    return results  # type: ignore[return-value]


def _cohort_tournament(mat: np.ndarray, max_error: float) -> list[FrameResult]:
    """Tournament for F frames of identical length n (rows of mat)."""
    F_, n = mat.shape
    stats = [data_stats(mat[i]) for i in range(F_)]
    results: list[FrameResult | None] = [None] * F_

    live: list[int] = []
    for i in range(F_):
        if stats[i].min == stats[i].max:
            payload, err = constant_compress(mat[i], stats[i])
            results[i] = FrameResult(CONSTANT, n, payload, err)
        else:
            live.append(i)
    if not live:
        return results  # type: ignore[return-value]

    has_zero = [bool((mat[i] == 0.0).any()) for i in live]
    fft_rows = [i for i, z in zip(live, has_zero) if not z]

    fft_cand = _fft_batch(mat, fft_rows, stats, max_error) if fft_rows else {}
    poly_cand = _poly_batch(mat, live, stats, max_error)

    # RLE pre-check per frame: rle_min_bytes lower-bounds its payload,
    # its error is always 0.0 (so `passing` is never empty), and the
    # (fft, poly, rle) candidate order means it must be STRICTLY
    # smaller than a passing earlier candidate to win.  When a passing
    # candidate is already <= that bound, the full encode is provably
    # dead work and is skipped; the selection result is identical
    # either way.  The needed encodes then run as ONE cross-frame
    # batch (rle_compress_batch, byte-identical per frame) — on
    # small-frame-heavy workloads the per-frame encoder's fixed numpy
    # overhead was ~1/3 of the tournament wall.
    base_cand: dict[int, list] = {}
    rle_rows: list[int] = []
    for i in live:
        candidates = []
        if i in fft_cand:
            candidates.append((fft_cand[i], FFT))
        candidates.append((poly_cand[i], POLYNOMIAL))
        base_cand[i] = candidates
        passing_pre = [(r, c) for r, c in candidates if r[1] <= max_error]
        if passing_pre:
            best_sz = min(len(r[0]) for r, _ in passing_pre)
            if rle_min_bytes(mat[i]) >= best_sz:
                continue
        rle_rows.append(i)
    if rle_rows:
        encoded = rle_compress_batch(
            [mat[i] for i in rle_rows], [stats[i] for i in rle_rows]
        )
        for i, res in zip(rle_rows, encoded):
            base_cand[i].append((res, RLE))
    for i in live:
        candidates = base_cand[i]
        # selection identical to compress_best's full-frame branch:
        # strict float pass filter (NaN fails), min payload size with
        # candidate-order tie-break
        passing = [(r, c) for r, c in candidates if r[1] <= max_error]
        pool = passing if passing else candidates
        (payload, err), chosen = min(pool, key=lambda rc: len(rc[0][0]))
        results[i] = FrameResult(chosen, n, payload, err)
    return results  # type: ignore[return-value]


def _fft_batch(mat, rows, stats, max_error) -> dict[int, tuple[bytes, float]]:
    """FFT bounded fit for the given rows (no zeros in these frames):
    batched phase 1; per-frame phase 2 over the precomputed spectra."""
    n = mat.shape[1]
    out: dict[int, tuple[bytes, float]] = {}
    # FFTFrame stores min/max as f32 and its bounded fit early-returns
    # (empty frame, reported error 0.0) when they compare equal —
    # including f64-distinct values that underflow to the same f32
    live_rows = []
    for i in rows:
        if np.float32(stats[i].min) == np.float32(stats[i].max):
            frame = FFTFrame(stats[i].min, stats[i].max)
            out[i] = (frame.to_bytes(), 0.0)
        else:
            live_rows.append(i)
    rows = live_rows
    if not rows:
        return out
    sub = mat[rows]
    F_ = len(rows)
    max_freq = max(3, n // 100)

    if n >= 128:
        g = np.stack([gibbs_sizing(sub[k]) for k in range(F_)])
    else:
        g = sub
    length = g.shape[1]
    buf = np.fft.fft(g, axis=1)
    half = buf[:, : length // 2 + 1].astype(np.complex64)
    order = np.argsort(-np.abs(half).astype(np.float64), axis=1, kind="stable")

    bound = rust_f64_as_i32(max_error * 1000.0)

    # phase 1 batched: first-budget selection, mirror, inverse FFT
    sel = order[:, :max_freq]
    re = np.real(half)[np.arange(F_)[:, None], sel].astype(np.float32, copy=False)
    im = np.imag(half)[np.arange(F_)[:, None], sel].astype(np.float32, copy=False)
    # rows hitting the zero-frequency early-stop quirk take the
    # sequential path (the stop truncates the selection mid-budget)
    zero_stop = ((re == 0.0) & (im == 0.0)).any(axis=1)

    full = np.zeros((F_, length), dtype=np.complex64)
    ridx = np.repeat(np.arange(F_), sel.shape[1])  # slice may clamp < max_freq
    pos = sel.ravel()
    vals = (re + 1j * im).ravel()
    full[ridx, pos] = vals
    nz = pos != 0
    full[ridx[nz], length - pos[nz]] = np.conj(vals[nz])
    outs = np.fft.ifft(full.astype(np.complex128), axis=1).real.astype(np.float32)

    vmins = np.array([np.float64(np.float32(stats[i].min)) for i in rows])
    vmaxs = np.array([np.float64(np.float32(stats[i].max)) for i in rows])
    dec = round_half_away(outs.astype(np.float64) * 1e5) / 1e5
    dec = np.clip(dec, vmins[:, None], vmaxs[:, None])
    errs = _mape_rows_paired(dec, g)

    for k, i in enumerate(rows):
        frame = FFTFrame(stats[i].min, stats[i].max)
        if zero_stop[k]:
            # the zero-frequency early-stop truncates the selection
            # mid-budget — replay sequentially on the precomputed row
            frame._compress_bounded_pre(g[k], half[k], order[k], max_freq, max_error)
        else:
            err = float(errs[k])
            if not (bound < rust_f64_as_i32(err * 1000.0)):
                frame.freqs = fft_trim(half[k], max_freq, order=order[k])
                frame.error = err
            else:
                frame._compress_bounded_pre(
                    g[k], half[k], order[k], max_freq, max_error, skip_first=True
                )
                if frame.error is None:  # phase 2 sets it; guard anyway
                    frame.error = err
        out[i] = (frame.to_bytes(), frame.error if frame.error is not None else 0.0)
    return out


def _poly_batch(mat, rows, stats, max_error) -> dict[int, tuple[bytes, float]]:
    """Catmull-Rom bounded fit for the given rows: the escalation
    schedule is shared by the cohort (same n), so each live step is one
    (F_alive, n) evaluation.  Exit decisions replay
    ``PolynomialFrame._compress_bounded_sequential`` per frame."""
    n = mat.shape[1]
    target = round_f64(max_error, 3)

    def exits(err: float) -> bool:
        return not (target < round_f64(err, 4))

    points = PolynomialFrame._point_schedule(n)
    steps = [max(n // p, 1) for p in points]

    out: dict[int, tuple[bytes, float]] = {}

    def finish(i: int, pts: int, err: float) -> None:
        f = PolynomialFrame(stats[i].min, stats[i].max, POLYNOMIAL_ID, stats[i].bitdepth)
        f.compress_hinted(mat[i], pts)
        f.error = err
        out[i] = (f.to_bytes(), err)

    alive = list(rows)
    err_now: dict[int, float] = {}
    prev_step = None
    for k, step in enumerate(steps, start=1):
        if not alive:
            break
        if step == 1:
            # store-all: error forced to 0, spline eval skipped
            for i in alive:
                finish(i, n, 0.0)
            alive = []
            break
        if step != prev_step:
            sub = mat[alive]
            dec = _catmull_eval_frames(sub, step, stats, alive)
            errs = _mape_rows_paired(dec, sub)
            for k2, i in enumerate(alive):
                err_now[i] = float(errs[k2])
        # (equal step => identical fit and error; reuse err_now)
        if k <= 22:
            still = []
            for i in alive:
                if exits(err_now[i]):
                    finish(i, points[k - 1], err_now[i])
                else:
                    still.append(i)
            alive = still
        else:  # k == 23: strict keep, else store-all
            for i in alive:
                if target > round_f64(err_now[i], 4):
                    finish(i, points[22], err_now[i])
                else:
                    finish(i, n, 0.0)
            alive = []
        prev_step = step
    for i in alive:  # schedule exhausted without store-all (n tiny)
        finish(i, n, 0.0)
    return out


def _catmull_eval_frames(sub: np.ndarray, step: int, stats, rows) -> np.ndarray:
    """Evaluate the step-``step`` Catmull-Rom reconstruction for every
    row of ``sub`` at once — the positions/segments/interpolation
    parameters are shared by the cohort (same n, same step), only the
    value gathers are per-row.  Elementwise formulas identical to
    ``catmull_rom_decode``."""
    from .polynomial import _positions

    F_, n = sub.shape
    positions = _positions(n, step)
    n_keys = len(positions)
    vmins = np.array([stats[i].min for i in rows], dtype=np.float64)
    vmaxs = np.array([stats[i].max for i in rows], dtype=np.float64)
    if n_keys == n:
        # every sample is a key: exact passthrough (round + clamp only)
        return round_and_limit_rows(sub, vmins, vmaxs)

    t = np.arange(n, dtype=np.float64)
    seg = np.searchsorted(positions, t, side="right") - 1
    seg = np.clip(seg, 0, n_keys - 2)
    p_lo = positions[seg].astype(np.float64)
    p_hi = positions[seg + 1].astype(np.float64)
    nt = np.divide(t - p_lo, p_hi - p_lo, out=np.zeros_like(t), where=p_hi > p_lo)

    vals = sub[:, positions]  # (F, n_keys)
    v0 = vals[:, seg]
    v1 = vals[:, seg + 1]
    outm = v0 + (v1 - v0) * nt[None, :]

    cr = (seg > 0) & (seg <= n_keys - 3)
    if np.any(cr):
        s = seg[cr]
        t0 = positions[s - 1].astype(np.float64)
        t1 = positions[s].astype(np.float64)
        t2 = positions[s + 1].astype(np.float64)
        t3 = positions[s + 2].astype(np.float64)
        vm1, va, vb, vp2 = vals[:, s - 1], vals[:, s], vals[:, s + 1], vals[:, s + 2]
        m0 = (vb - vm1) / (t2 - t0)[None, :]
        m1 = (vp2 - va) / (t3 - t1)[None, :]
        dt = (t2 - t1)[None, :]
        u = nt[cr][None, :]
        u2 = u * u
        u3 = u2 * u
        h00 = 2.0 * u3 - 3.0 * u2 + 1.0
        h10 = u3 - 2.0 * u2 + u
        h01 = -2.0 * u3 + 3.0 * u2
        h11 = u3 - u2
        outm[:, cr] = h00 * va + h10 * dt * m0 + h01 * vb + h11 * dt * m1
    outm[:, t >= positions[-1]] = vals[:, -1:]
    return round_and_limit_rows(outm, vmins, vmaxs)


def round_and_limit_rows(x: np.ndarray, vmins: np.ndarray, vmaxs: np.ndarray) -> np.ndarray:
    """Vectorized ``round_and_limit`` with per-row bounds."""
    out = round_half_away(x * 1e5) / 1e5
    return np.clip(out, vmins[:, None], vmaxs[:, None])
