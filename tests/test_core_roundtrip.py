"""Property-style roundtrip tests on deterministic synthetic series.

Mirrors the reference's e2e acceptance (`atsc/tests/e2e.rs:158-164,
244-264`): lossy compressors must satisfy MAPE <= bound; lossless
paths must roundtrip exactly.
"""

import numpy as np
import pytest

from atsc_spark.core import (
    calculate_error,
    compress_series,
    decompress_series,
)
from atsc_spark.core.frame import (
    AUTO,
    CONSTANT,
    FFT,
    IDW,
    NOOP,
    POLYNOMIAL,
    RLE,
    compress_best,
    compress_bounded,
    compress_frame,
    decompress_frame,
)


def _series(kind: str, n: int = 2854) -> np.ndarray:
    """Deterministic series shaped like the reference corpora
    (FIXTURES.md §2): noisy gauge, near-zero spiky, large integral
    gauge, constant."""
    rng = np.random.default_rng(42)
    t = np.arange(n, dtype=np.float64)
    if kind == "cpu_like":
        # noisy percentage gauge with a flat tail, like cpu_utilization.csv
        base = 40 + 20 * np.sin(t / 120.0) + rng.normal(0, 0.8, n)
        base[int(n * 0.8) :] = base[int(n * 0.8)]
        return np.round(np.abs(base), 2) + 1.0
    if kind == "iowait_like":
        # near-zero spiky fractions, like iowait.csv
        v = np.abs(rng.normal(0.02, 0.005, n))
        spikes = rng.random(n) > 0.97
        v[spikes] += rng.random(spikes.sum()) * 2
        return np.round(v, 4) + 0.01
    if kind == "heap_like":
        # large, slowly-varying integral gauge, like go_gc_heap_goal_bytes
        return np.round(1e8 + 1e6 * np.sin(t / 300.0) + rng.integers(0, 1e5, n))
    if kind == "uptime_like":
        return np.full(n, 12345.0)
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["cpu_like", "iowait_like", "heap_like"])
@pytest.mark.parametrize("bound", [0.01, 0.03, 0.05])
def test_auto_respects_error_bound(kind, bound):
    data = _series(kind)
    frames = compress_series(data, AUTO, max_error=bound)
    out = decompress_series(frames)
    assert len(out) == len(data)
    assert calculate_error(data, out) <= bound + 1e-12


@pytest.mark.parametrize("compressor", [FFT, POLYNOMIAL, IDW])
def test_lossy_bounded_per_frame(compressor):
    data = _series("cpu_like", 1024)
    frame = compress_frame(data, compressor, max_error=0.05)
    out = decompress_frame(frame.compressor, frame.sample_count, frame.payload)
    # per the reference, the reported error can be measured against the
    # Gibbs-padded series for FFT; check the real reconstruction error
    assert calculate_error(data, out) <= 0.06


def test_constant_exact_on_constant():
    data = _series("uptime_like")
    frames = compress_series(data, AUTO, max_error=0.0)
    assert all(f.compressor == CONSTANT for f in frames)
    assert decompress_series(frames).tolist() == data.tolist()


def test_rle_exact():
    data = np.repeat([1.0, 5.0, 5.0, 2.0, 2.0, 2.0], 200)
    frame = compress_frame(data, RLE)
    out = decompress_frame(frame.compressor, frame.sample_count, frame.payload)
    assert out.tolist() == data.tolist()


def test_noop_exact_on_integral():
    data = _series("heap_like", 777)
    frame = compress_frame(data, NOOP)
    out = decompress_frame(frame.compressor, frame.sample_count, frame.payload)
    assert out.tolist() == data.tolist()


def test_auto_error_zero_roundtrips_exactly():
    # error=0 forces auto to pick a lossless candidate (RLE) unless a
    # lossy one achieves literal zero error
    data = np.repeat(np.arange(16.0), 64)  # 1024 samples, step plateaus
    frames = compress_series(data, AUTO, max_error=0.0)
    assert decompress_series(frames).tolist() == data.tolist()


def test_nan_inf_cleaning_changes_count():
    data = np.array([1.0, np.nan, 2.0, np.inf, 3.0, -np.inf, 4.0])
    frames = compress_series(data, AUTO, max_error=0.03)
    out = decompress_series(frames)
    assert len(out) == 4  # NaN/inf dropped pre-plan, like the reference


def test_compression_ratio_sanity():
    """The headline property: smooth series compress far below raw size
    (reference reports 17x-880x depending on signal; BASELINE.md)."""
    data = _series("cpu_like", 4096)
    frames = compress_series(data, AUTO, max_error=0.03)
    compressed = sum(len(f.payload) for f in frames)
    raw = data.nbytes
    assert compressed * 10 < raw, f"ratio only {raw / compressed:.1f}x"


def test_fft_large_frame_positions_roundtrip():
    """Regression (r2 ADVICE high): a 131072-sample frame Gibbs-pads to
    139968, so selected spectrum positions reach 69984 — beyond u16.
    Positions must round-trip as full varints; the old `pos & 0xFFFF`
    mask wrapped them onto low bins and silently corrupted the decode
    while the reported fit error still passed the bound."""
    from atsc_spark.core.errors import calculate_error
    from atsc_spark.core.fft import (
        FFTFrame,
        _ifft_real,
        _round_clamp,
        fft_decompress,
        gibbs_sizing,
    )

    n = 131072
    x = np.arange(n)
    sig = 50.0 + 10.0 * np.sin(2 * np.pi * x / 7.3) + 5.0 * np.sin(2 * np.pi * x * 0.49)
    f = FFTFrame(sig.min(), sig.max())
    f.compress_bounded(sig, 0.03)
    assert int(f.freqs.pos.max()) > 0xFFFF  # the case the mask corrupted

    # decode must bit-equal the output the bounded fit evaluated
    g = gibbs_sizing(sig)
    out = _round_clamp(_ifft_real(f.freqs, len(g)), f.min, f.max)
    added = len(g) - n
    trimmed = out[added // 2 : len(g) - (added - added // 2)]
    dec = fft_decompress(n, f.to_bytes())
    assert np.array_equal(dec, trimmed)
    assert calculate_error(sig, dec) <= 0.03


def test_auto_zero_frame_polynomial_can_win():
    """Regression (r2 ADVICE medium): with a zero in the evaluated
    slice, POLYNOMIAL's bounded loop escalates to store-all (error
    forced to 0.0, `polynomial.rs:262-268`) and can beat RLE on size —
    the old shortcut dropped it from the tournament entirely."""
    rng = np.random.default_rng(7)
    data = rng.integers(1, 9, 300).astype(np.float64)
    data[137] = 0.0
    r = compress_best(data, 0.03)
    assert r.compressor == POLYNOMIAL
    out = decompress_frame(r.compressor, r.sample_count, r.payload)
    assert out.tolist() == data.tolist()  # store-all is exact
    rle_payload, _ = compress_bounded(RLE, data, 0.03)
    assert len(r.payload) < len(rle_payload)
