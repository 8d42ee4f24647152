"""Property-based tests (hypothesis) for the frame codec and the
lossless tier: arbitrary finite f64 arrays must roundtrip within the
error bound (lossy) or exactly (lossless), and payloads must decode to
the same length they encoded."""

import numpy as np
from hypothesis import given, settings, strategies as st

from atsc_spark.core import calculate_error, compress_series, decompress_series
from atsc_spark.core.frame import (
    CONSTANT,
    IDW,
    NOOP,
    POLYNOMIAL,
    RLE,
    compress_frame,
    decompress_frame,
)
from atsc_spark.core.gorilla import gorilla_decode, gorilla_encode

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12, width=64
)


@st.composite
def float_arrays(draw, min_size=1, max_size=700):
    values = draw(st.lists(finite_floats, min_size=min_size, max_size=max_size))
    return np.asarray(values, dtype=np.float64)


@given(float_arrays())
@settings(max_examples=60, deadline=None)
def test_rle_exact_roundtrip(data):
    frame = compress_frame(data, RLE)
    out = decompress_frame(frame.compressor, frame.sample_count, frame.payload)
    # value equality (-0.0 == 0.0): integral data narrows to int
    # bit-depths in the reference too, which drops the sign of -0.0
    assert np.array_equal(out, data)
    # at f64 bit-depth the roundtrip is bit-exact
    from atsc_spark.core.stats import data_stats, F64

    if data_stats(data).bitdepth == F64:
        assert out.view(np.uint64).tolist() == data.view(np.uint64).tolist()


@given(float_arrays())
@settings(max_examples=40, deadline=None)
def test_auto_error_bound_or_exact(data):
    frames = compress_series(data, max_error=0.05)
    out = decompress_series(frames)
    assert len(out) == len(data)
    err = calculate_error(data, out)
    if np.isnan(err) or err > 0.05 + 1e-9:
        # Documented reference quirks kick in here:
        # - MAPE is NaN when originals contain zeros (error.rs:114 TODO);
        # - polynomial "store everything" claims error 0 without
        #   re-measuring (polynomial.rs:257-262), but its decode still
        #   rounds to 5 decimals and clamps — so sub-1e-5 values are
        #   only 5-decimal-exact.
        # Either way, the reconstruction must equal the original after
        # the reference's own round-to-5-decimals+clamp, or be an
        # exactly-lossless (RLE/constant) payload.
        from atsc_spark.core.utils import round_and_limit

        lo, hi = float(np.min(data)), float(np.max(data))
        # FFT frames quantize the clamp bounds through f32
        # (`fft.rs:173-180`), so sub-f32-denormal values clamp to 0 —
        # also reference behaviour.
        lo32, hi32 = float(np.float32(lo)), float(np.float32(hi))
        ok = (
            np.array_equal(out, data)
            or np.allclose(out, round_and_limit(data, lo, hi, 5), rtol=0, atol=0)
            or np.allclose(out, round_and_limit(data, lo32, hi32, 5), rtol=0, atol=0)
        )
        assert ok, (data, out)


@given(float_arrays(max_size=300))
@settings(max_examples=40, deadline=None)
def test_polynomial_decode_length(data):
    frame = compress_frame(data, POLYNOMIAL, 0.05)
    out = decompress_frame(frame.compressor, frame.sample_count, frame.payload)
    assert len(out) == len(data)


@given(float_arrays(max_size=300))
@settings(max_examples=40, deadline=None)
def test_idw_decode_length(data):
    frame = compress_frame(data, IDW, 0.05)
    out = decompress_frame(frame.compressor, frame.sample_count, frame.payload)
    assert len(out) == len(data)


@given(st.lists(st.integers(min_value=-(2**53), max_value=2**53), min_size=1, max_size=500))
@settings(max_examples=60, deadline=None)
def test_noop_integral_roundtrip(ints):
    data = np.asarray(ints, dtype=np.float64)
    frame = compress_frame(data, NOOP)
    out = decompress_frame(frame.compressor, frame.sample_count, frame.payload)
    assert out.tolist() == data.tolist()


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400),
    float_arrays(min_size=1, max_size=400),
)
@settings(max_examples=60, deadline=None)
def test_gorilla_exact(ts_raw, values):
    n = min(len(ts_raw), len(values))
    ts = np.sort(np.asarray(ts_raw[:n], dtype=np.int64))
    v = values[:n]
    ts2, v2 = gorilla_decode(gorilla_encode(ts, v))
    assert ts2.tolist() == ts.tolist()
    assert v2.view(np.uint64).tolist() == v.view(np.uint64).tolist()


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=2, max_size=400))
@settings(max_examples=80, deadline=None)
def test_gorilla_xor_adversarial_bit_patterns(raws):
    """Arbitrary u64 bit patterns as f64 (opposite signs, NaN payloads,
    near-full-width XORs): the integer leading-zero path must be exact
    where float log2 rounded up within half an ulp of 2^k."""
    from atsc_spark.core.gorilla import xor_decode, xor_encode

    v = np.asarray(raws, dtype=np.uint64).view(np.float64)
    out = xor_decode(xor_encode(v))
    assert out.view(np.uint64).tolist() == v.view(np.uint64).tolist()
