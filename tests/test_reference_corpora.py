"""Parity on the reference's own test corpora.

Mirrors `atsc/tests/e2e.rs` + `integration_test.rs`: run the engine on
the exact CSV/WavBrro fixtures shipped in the reference repo and
assert the same acceptance criteria (lossy MAPE <= bound at --error N;
exact roundtrip on the lossless paths).  Read-only access to
/root/reference (test inputs only; no code is ported from there).
"""

import os

import numpy as np
import pytest

from atsc_spark.api import compress, decompress
from atsc_spark.core import calculate_error
from atsc_spark.io import read_samples_csv, read_wbro, read_vsri, write_vsri, vsri_timestamps, VsriSegment

REF = "/root/reference/atsc/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpora not available"
)


def _corpus(name):
    if name.endswith(".csv"):
        headered = "no_headers" not in name
        _, values = read_samples_csv(f"{REF}/csv/{name}", headered=headered)
        return values
    return read_wbro(f"{REF}/wbros/{name}")


@pytest.mark.parametrize(
    "name,n",
    [
        ("cpu_utilization.csv", 2854),
        ("cpu_utilization_no_headers_only_values.csv", 2854),
        ("iowait.csv", 2891),
        ("go_gc_heap_goal_bytes.wbro", None),
        ("memory_used.wbro", None),
        ("uptime.wbro", None),
    ],
)
def test_corpus_loads(name, n):
    values = _corpus(name)
    assert len(values) > 0
    if n:
        assert len(values) == n
    # memory_used.wbro contains non-finite raw samples — the reference
    # drops them pre-plan (`optimizer/mod.rs:64-71`), so only require
    # that *some* samples are finite here.
    assert np.isfinite(values).any()


@pytest.mark.parametrize(
    "name",
    ["cpu_utilization.csv", "iowait.csv", "go_gc_heap_goal_bytes.wbro",
     "memory_used.wbro", "uptime.wbro"],
)
@pytest.mark.parametrize("error_pct", [1, 3, 5])
def test_lossy_error_bound_on_reference_corpora(name, error_pct):
    """e2e.rs:244-264 acceptance: auto at --error N -> MAPE <= N/100."""
    values = _corpus(name)
    blob = compress(values, "auto", error=error_pct)
    out = decompress(blob)
    clean = values[np.isfinite(values)]
    assert len(out) == len(clean)
    err = calculate_error(clean, out)
    if np.isnan(err):  # zeros in original (documented reference quirk)
        err = float(np.nanmean(np.abs((out - clean) / np.where(clean == 0, np.nan, clean))))
    assert err <= error_pct / 100.0 + 1e-12


@pytest.mark.parametrize("name", ["uptime.wbro", "go_gc_heap_goal_bytes.wbro"])
def test_error_zero_roundtrip(name):
    """e2e.rs:158-164: --error 0 must roundtrip exactly (auto picks a
    lossless candidate or a perfect fit)."""
    values = _corpus(name)
    out = decompress(compress(values, "auto", error=0))
    assert np.array_equal(out, values)


def test_reference_corpora_ratios():
    """Achieved ratios at the paper's 3% default.

    These fixtures are deliberately hard: the CSV series are noisy
    enough that the bounded-error schedules cannot reach 3% MAPE, so
    auto falls back to store-everything / RLE — the *reference's own
    algorithm* lands in the same place by construction (identical
    tournament and iteration schedules).  The paper's 17x-146x
    per-signal numbers come from its production corpus, whose shapes
    our monitoring_series benchmark reproduces (BENCH.md: ~43x
    aggregate).  Floors here pin the per-fixture behaviour class:
    constant >100x, slow gauges mid-single-digit, noisy ~1x."""
    ratios = {}
    for name in ["cpu_utilization.csv", "iowait.csv",
                 "go_gc_heap_goal_bytes.wbro", "memory_used.wbro", "uptime.wbro"]:
        values = _corpus(name)
        blob = compress(values, "auto", error=3)
        ratios[name] = len(values) * 8 / len(blob)
    assert ratios["uptime.wbro"] > 100, ratios
    assert ratios["go_gc_heap_goal_bytes.wbro"] > 8, ratios
    assert ratios["memory_used.wbro"] > 3, ratios
    assert ratios["cpu_utilization.csv"] >= 1.0, ratios
    assert ratios["iowait.csv"] >= 0.8, ratios


def test_vsri_text_roundtrip(tmp_path):
    """Golden segment example from `vsri/src/lib.rs:36-40`."""
    segs = [VsriSegment(15, 0, 55745, 166), VsriSegment(15, 166, 58505, 63)]
    path = str(tmp_path / "t.vsri")
    write_vsri(path, segs)
    with open(path) as fh:
        content = fh.read().splitlines()
    assert content[0] == "55745"
    assert content[1] == "59435"  # 58505 + 15*(63-1)
    assert content[2] == "15,0,55745,166"
    back = read_vsri(path)
    assert back == segs
    ts = vsri_timestamps(back)
    assert len(ts) == 229 and ts[0] == 55745 and ts[-1] == 59435


def test_reference_bro_fixture_file():
    """A committed `.bro` stream whose bytes come verbatim from the
    reference's own e2e expectation (`atsc/src/data.rs:145-154`:
    CompressedStream of 1024x 1.0 under Constant): decode the FILE
    through stream_from_bytes -> values, and re-encode to the identical
    bytes."""
    import os

    import numpy as np

    from atsc_spark.core.frame import (
        decompress_frame,
        stream_from_bytes,
        stream_to_bytes,
    )

    path = os.path.join(os.path.dirname(__file__), "fixtures", "constant_1024.bro")
    with open(path, "rb") as fh:
        blob = fh.read()
    frames = stream_from_bytes(blob)
    assert len(frames) == 1
    f = frames[0]
    values = decompress_frame(f.compressor, f.sample_count, f.payload)
    assert f.sample_count == 1024
    assert np.array_equal(values, np.ones(1024))
    assert stream_to_bytes(frames) == blob


def test_write_wbro_roundtrip(tmp_path):
    """write_wbro produces the same archive layout read_wbro (validated
    against the reference corpora) parses — multi-chunk + tail."""
    import numpy as np

    from atsc_spark.io import read_wbro, write_wbro

    rng = np.random.default_rng(5)
    for n in (0, 1, 2048, 2953, 5000):
        v = rng.normal(size=n)
        p = str(tmp_path / f"t{n}.wbro")
        write_wbro(p, v)
        out = read_wbro(p)
        assert np.array_equal(out, v), n


def test_wbro_layout_matches_reference_file(tmp_path):
    """Re-encoding a reference-produced .wbro byte-identically."""
    from atsc_spark.io import read_wbro, write_wbro

    src = "/root/reference/atsc/tests/wbros/go_gc_heap_goal_bytes.wbro"
    v = read_wbro(src)
    p = str(tmp_path / "re.wbro")
    write_wbro(p, v)
    with open(src, "rb") as a, open(p, "rb") as b:
        assert a.read() == b.read()


def test_wav2wbro_recombination(tmp_path):
    """Golden recombination: 4xu16 limbs -> f64 bits, LSB-first
    (`wav2wbro.rs:62-72`), via a synthesized legacy WAV file."""
    import struct

    import numpy as np

    from atsc_spark.io import read_legacy_wav, wav2wbro, read_wbro

    values = np.array([1.0, -2.5, 0.0, 3.141592653589793, float("inf")])
    limbs = values.view(np.uint64)
    ints = np.empty((len(values), 4), dtype="<i2")
    for c in range(4):
        ints[:, c] = ((limbs >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.uint16).view(np.int16)
    data = ints.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 4, 8000, 8000 * 8, 8, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav_path = str(tmp_path / "legacy.wav")
    with open(wav_path, "wb") as fh:
        fh.write(wav)
    out = read_legacy_wav(wav_path)
    assert out.view(np.uint64).tolist() == limbs.tolist()
    wbro_path = str(tmp_path / "out.wbro")
    assert wav2wbro(wav_path, wbro_path) == 5
    assert read_wbro(wbro_path).view(np.uint64).tolist() == limbs.tolist()
