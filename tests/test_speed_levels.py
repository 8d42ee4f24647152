"""Compression-speed-level integration tests.

Mirrors the reference's `atsc/tests/integration_test.rs:59-106`: every
speed level 0..6 must produce a decodable stream satisfying the error
bound.  Levels >= 1 sample a prefix for compressor selection
(COMPRESSION_SPEED thresholds, `frame/mod.rs:22`), so the chosen
compressor may differ from level 0 — but the bound must still hold on
the full frame.
"""

import numpy as np
import pytest

from atsc_spark.api import compress, decompress
from atsc_spark.core import calculate_error
from atsc_spark.io import read_samples_csv

REF_CSV = "/root/reference/atsc/tests/csv/cpu_utilization.csv"


def _series(n=5432):
    rng = np.random.default_rng(3)
    t = np.arange(n, dtype=np.float64)
    return np.round(np.abs(60 + 25 * np.sin(t / 150) + rng.normal(0, 0.6, n)), 2) + 1


@pytest.mark.parametrize("speed", range(7))
def test_all_speed_levels_roundtrip(speed):
    data = _series()
    blob = compress(data, "auto", error=3, compression_speed=speed)
    out = decompress(blob)
    assert len(out) == len(data)
    assert calculate_error(data, out) <= 0.03 + 1e-12


@pytest.mark.parametrize("speed", [0, 3, 6])
def test_speed_levels_on_reference_fixture(speed):
    import os

    if not os.path.exists(REF_CSV):
        pytest.skip("reference fixture unavailable")
    _, values = read_samples_csv(REF_CSV)
    blob = compress(values, "auto", error=5, compression_speed=speed)
    out = decompress(blob)
    assert calculate_error(values, out) <= 0.05 + 1e-12


def test_sampled_selection_uses_prefix():
    """At speed 6 (threshold 128) a 4096-frame tournament judges on the
    first 128 samples only — construct data where the prefix is
    constant but the tail is not; selection must still produce a
    decodable, bounded result on the full frame."""
    data = np.concatenate([np.full(128, 5.0), _series(3968)])
    blob = compress(data, "auto", error=3, compression_speed=6)
    out = decompress(blob)
    assert len(out) == len(data)
    assert calculate_error(data, out) <= 0.03 + 1e-12
