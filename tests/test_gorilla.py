"""Lossless-tier tests: exact roundtrips + ratio sanity."""

import numpy as np
import pytest

from atsc_spark.core.gorilla import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
    xor_decode,
    xor_encode,
)


def test_dod_regular_cadence():
    ts = np.arange(0, 86400, 20, dtype=np.int64)
    blob = dod_encode(ts)
    assert dod_decode(blob).tolist() == ts.tolist()
    # regular cadence: ~1 bit per timestamp
    assert len(blob) < len(ts) / 6


def test_dod_irregular():
    rng = np.random.default_rng(42)
    gaps = rng.integers(1, 100000, 5000)
    ts = np.cumsum(gaps).astype(np.int64)
    assert dod_decode(dod_encode(ts)).tolist() == ts.tolist()


def test_dod_edges():
    for arr in ([], [5], [5, 25], [5, 25, 45], [0, 1, 10**15]):
        ts = np.asarray(arr, dtype=np.int64)
        assert dod_decode(dod_encode(ts)).tolist() == ts.tolist()


def test_xor_constant():
    v = np.full(10000, 3.14159)
    blob = xor_encode(v)
    assert xor_decode(blob).tolist() == v.tolist()
    assert len(blob) < 10000 / 6


def test_xor_gauge():
    rng = np.random.default_rng(42)
    v = np.round(100 + np.cumsum(rng.normal(0, 0.1, 4096)), 2)
    out = xor_decode(xor_encode(v))
    assert out.tolist() == v.tolist()


def test_xor_special_values():
    v = np.array([0.0, -0.0, np.inf, -np.inf, 1e-308, 1e308, np.nan, 1.0])
    out = xor_decode(xor_encode(v))
    assert np.array_equal(out, v, equal_nan=True)
    # bit-exactness including the sign of -0.0
    assert out.view(np.uint64).tolist() == v.view(np.uint64).tolist()


def test_gorilla_block_roundtrip():
    rng = np.random.default_rng(7)
    ts = np.cumsum(rng.integers(15, 25, 4320)).astype(np.int64)
    values = np.round(50 + 10 * np.sin(np.arange(4320) / 100) + rng.normal(0, 0.3, 4320), 3)
    blob = gorilla_encode(ts, values)
    ts2, v2 = gorilla_decode(blob)
    assert ts2.tolist() == ts.tolist()
    assert v2.tolist() == values.tolist()
    raw = len(ts) * 16
    assert len(blob) < raw, f"no compression: {len(blob)} vs {raw}"


def test_gorilla_ratio_on_slow_gauge():
    """Paper reports 2x-8x for the lossless tier (BASELINE.md LPC row);
    a slow integral gauge should land in that range."""
    ts = np.arange(0, 20 * 4320, 20, dtype=np.int64)
    values = np.round(1e6 + np.repeat(np.arange(270.0), 16))
    blob = gorilla_encode(ts, values)
    ratio = (len(ts) * 16) / len(blob)
    assert ratio >= 4, f"ratio {ratio:.2f}"
