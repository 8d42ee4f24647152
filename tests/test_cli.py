"""Reference-CLI parity layer (`atsc_spark.cli`): the `atsc` and
`csv-compressor` binaries as module entry points, exercised on the
reference's own test corpora plus the VSRI greedy-builder quirks."""

import os
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from atsc_spark.cli import compress_data, main_atsc, main_csv_compressor  # noqa: E402
from atsc_spark.core import calculate_error, clean_data  # noqa: E402
from atsc_spark.io import (  # noqa: E402
    VsriSegment,
    day_elapsed_seconds,
    read_samples_csv,
    read_vsri,
    read_wbro,
    vsri_from_timestamps,
    vsri_get_time,
    vsri_timestamps,
    write_samples_csv,
)

WBROS = "/root/reference/atsc/tests/wbros"
CSVS = "/root/reference/atsc/tests/csv"


# ------------------------------------------------------------- `atsc`


def test_atsc_wbro_roundtrip_and_engine_byte_parity(tmp_path):
    src = tmp_path / "memory_used.wbro"
    shutil.copy(f"{WBROS}/memory_used.wbro", src)
    assert main_atsc([str(src), "--compressor", "auto", "--error", "3"]) == 0
    blob = (tmp_path / "memory_used.bro").read_bytes()
    # the CLI is the same core the Spark fit path runs: byte-identical
    orig = read_wbro(f"{WBROS}/memory_used.wbro")
    assert blob == compress_data(orig, "auto", 3, 0)
    assert main_atsc(["-u", str(tmp_path / "memory_used.bro")]) == 0
    back = read_wbro(str(tmp_path / "memory_used.wbro"))
    err = calculate_error(clean_data(orig), back)
    assert err <= 0.03 + 1e-12


def test_atsc_error_zero_exact(tmp_path):
    src = tmp_path / "uptime.wbro"
    shutil.copy(f"{WBROS}/uptime.wbro", src)
    assert main_atsc([str(src), "--error", "0"]) == 0
    assert main_atsc(["-u", str(tmp_path / "uptime.bro")]) == 0
    orig = clean_data(read_wbro(f"{WBROS}/uptime.wbro"))
    back = read_wbro(str(tmp_path / "uptime.wbro"))
    np.testing.assert_array_equal(orig, back)


def test_atsc_csv_headered_with_fields(tmp_path):
    src = tmp_path / "data.csv"
    src.write_text("when,cpu\n1,10.5\n2,11.5\n3,12.5\n4,13.5\n")
    assert main_atsc([str(src), "--csv", "--fields", "when,cpu", "--error", "0"]) == 0
    assert main_atsc(["-u", str(tmp_path / "data.bro")]) == 0
    back = read_wbro(str(tmp_path / "data.wbro"))
    np.testing.assert_array_equal(back, [10.5, 11.5, 12.5, 13.5])


def test_atsc_csv_headerless(tmp_path):
    src = tmp_path / "vals.csv"
    shutil.copy(f"{CSVS}/cpu_utilization_no_headers_only_values.csv", src)
    assert main_atsc([str(src), "--csv", "--no-header", "--error", "3"]) == 0
    assert (tmp_path / "vals.bro").exists()


def test_atsc_directory_walk(tmp_path):
    for name in ("uptime.wbro", "go_gc_heap_goal_bytes.wbro"):
        shutil.copy(f"{WBROS}/{name}", tmp_path / name)
    assert main_atsc([str(tmp_path), "--error", "3"]) == 0
    assert (tmp_path / "uptime.bro").exists()
    assert (tmp_path / "go_gc_heap_goal_bytes.bro").exists()


def test_atsc_missing_input_is_an_error(tmp_path):
    assert main_atsc([str(tmp_path / "nope.wbro")]) == 1


# ------------------------------------------- VSRI greedy construction


def test_vsri_greedy_pairs_points_after_rate_change():
    """`update_for_point` semantics (`vsri/src/lib.rs:249-284`): the
    two points after a rate change form ONE segment (fake -> fixed),
    unlike the run-based `time_segment_arrays` split.  The gap here
    (30 -> 75) is big enough that integer division cannot truncate it
    onto the next index — see the false-fit test for the case where
    it can."""
    segs = vsri_from_timestamps([0, 10, 20, 30, 75, 90])
    assert [(s.sample_rate, s.first_idx, s.first_ts, s.n_samples) for s in segs] == [
        (10, 0, 0, 4),
        (15, 4, 75, 2),
    ]
    np.testing.assert_array_equal(vsri_timestamps(segs), [0, 10, 20, 30, 75, 90])


def test_vsri_greedy_point_in_past_raises():
    with pytest.raises(ValueError, match="point in the past"):
        vsri_from_timestamps([100, 50])


def test_vsri_greedy_duplicate_ts_opens_fake_segment():
    # y == max_ts passes the reference's `y < max_ts` check and lands
    # in a new fake segment (lib.rs:252-261 + fits_segment miss)
    segs = vsri_from_timestamps([0, 10, 10])
    assert [(s.sample_rate, s.first_idx, s.first_ts, s.n_samples) for s in segs] == [
        (10, 0, 0, 2),
        (0, 2, 10, 1),
    ]


def test_vsri_greedy_integer_division_false_fit():
    """The reference's own "TODO: Can return float" bug: 31 truncates
    onto index 3 of a 10-rate segment and is absorbed as if it were 30
    (then reads back as 30)."""
    segs = vsri_from_timestamps([0, 10, 20, 31])
    assert [(s.sample_rate, s.first_idx, s.first_ts, s.n_samples) for s in segs] == [
        (10, 0, 0, 4),
    ]
    np.testing.assert_array_equal(vsri_timestamps(segs), [0, 10, 20, 30])


def test_vsri_get_time_mirrors_reference_including_global_x_bug():
    segs = [VsriSegment(10, 0, 0, 4), VsriSegment(15, 4, 100, 3)]
    # ends: x=0 -> min, x=sample_count -> max (lib.rs:333-336)
    assert vsri_get_time(segs, 0) == 0
    assert vsri_get_time(segs, 7) == 100 + 15 * 2
    assert vsri_get_time(segs, 8) is None
    # interior of segment 1: correct (first_idx == 0)
    assert vsri_get_time(segs, 2) == 20
    # interior of segment 2: the reference computes y0 + m*x with the
    # GLOBAL x (missing -m*x0, lib.rs:340-346) -> 100 + 15*5, not
    # 100 + 15*(5-4).  Pinned on purpose: the csv-compressor's
    # decompress-to-CSV output is defined by this behavior.
    assert vsri_get_time(segs, 5) == 100 + 15 * 5


def test_day_elapsed_seconds():
    # 1730419200 is a UTC midnight; 20s later is 20 in-day seconds
    assert day_elapsed_seconds(1730419200) == 0
    assert day_elapsed_seconds(1730419220) == 20


# --------------------------------------------------- `csv-compressor`


def _write_metric_csv(path, t0_ms=1730419200_000, n=300, step_ms=20_000):
    rows = ["timestamp,value"]
    for i in range(n):
        rows.append(f"{t0_ms + i * step_ms},{50 + (i % 7) * 0.5}")
    path.write_text("\n".join(rows) + "\n")


def test_csv_compressor_end_to_end(tmp_path):
    src = tmp_path / "metric.csv"
    _write_metric_csv(src)
    assert main_csv_compressor(
        [str(src), "--output-vsri", "--output-wavbrro", "--error", "3"]
    ) == 0
    # sic: the reference writes ".wavbro" here, not ".wbro" (main.rs:186)
    assert (tmp_path / "metric.wavbro").exists()
    segs = read_vsri(str(tmp_path / "metric.vsri"))
    assert [(s.sample_rate, s.n_samples) for s in segs] == [(20, 300)]

    out = tmp_path / "decoded"
    assert main_csv_compressor(
        ["-u", str(tmp_path / "metric.bro"), "--output-csv", "-o", str(out)]
    ) == 0
    _, v_in = read_samples_csv(
        str(src), time_field="timestamp", zero_timestamps=False
    )
    v_back = read_wbro(str(tmp_path / "decoded.wbro"))
    assert calculate_error(clean_data(v_in), v_back) <= 0.03 + 1e-12
    ts_csv, _ = read_samples_csv(
        str(tmp_path / "decoded.csv"), time_field="timestamp", zero_timestamps=False
    )
    np.testing.assert_array_equal(ts_csv, 20 * np.arange(300))


def test_csv_compressor_no_compression(tmp_path):
    src = tmp_path / "metric.csv"
    _write_metric_csv(src, n=50)
    assert main_csv_compressor([str(src), "--no-compression", "--output-wavbrro"]) == 0
    assert not (tmp_path / "metric.bro").exists()
    assert len(read_wbro(str(tmp_path / "metric.wavbro"))) == 50


def test_csv_compressor_day_crossing_raises(tmp_path):
    """A metric crossing UTC midnight folds to decreasing in-day
    seconds; the reference's update_for_point errors out — so do we."""
    src = tmp_path / "metric.csv"
    t0_ms = (1730419200 - 40) * 1000  # 40s before midnight, 20s cadence
    _write_metric_csv(src, t0_ms=t0_ms, n=5)
    with pytest.raises(ValueError, match="point in the past"):
        main_csv_compressor([str(src)])


# --------------------------------------------------------- `wav2wbro`


def _write_legacy_wav(path, values):
    import struct

    limbs = np.asarray(values, dtype=np.float64).view(np.uint64)
    ints = np.empty((len(limbs), 4), dtype="<i2")
    for c in range(4):
        ints[:, c] = (
            ((limbs >> np.uint64(16 * c)) & np.uint64(0xFFFF))
            .astype(np.uint16)
            .view(np.int16)
        )
    data = ints.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 4, 8000, 8000 * 8, 8, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    path.write_bytes(blob)


def test_wav2wbro_cli_drops_nans_and_names_output(tmp_path):
    from atsc_spark.cli import main_wav2wbro

    src = tmp_path / "legacy.wav"
    _write_legacy_wav(src, [1.0, float("nan"), 2.5, float("inf")])
    assert main_wav2wbro([str(src)]) == 0
    back = read_wbro(str(tmp_path / "legacy.wbro"))
    # NaN dropped (wav2wbro.rs:94-98); infinity KEPT
    np.testing.assert_array_equal(back, [1.0, 2.5, np.inf])


def test_wav2wbro_cli_validate(tmp_path, capsys):
    from atsc_spark.cli import main_wav2wbro

    clean = tmp_path / "clean.wav"
    _write_legacy_wav(clean, [1.0, 2.0, 3.0])
    assert main_wav2wbro([str(clean), "--validate"]) == 0
    # sic: the reference prints its "doesn't match" line on SUCCESS
    assert "doesn't match" in capsys.readouterr().out

    dirty = tmp_path / "dirty.wav"
    _write_legacy_wav(dirty, [1.0, float("nan"), 3.0])
    with pytest.raises(AssertionError):
        # any NaN input trips validate: the comparison is against the
        # UNfiltered samples, exactly like the reference's assert_eq
        main_wav2wbro([str(dirty), "--validate"])


def test_wav2wbro_cli_rejects_non_wav_name(tmp_path):
    from atsc_spark.cli import main_wav2wbro

    p = tmp_path / "legacy.bin"
    _write_legacy_wav(p, [1.0])
    assert main_wav2wbro([str(p)]) == 1


def test_wav2wbro_cli_rejects_bad_magic(tmp_path):
    # reference asserts is_wav_file (RIFF/WAVE header) before anything
    # else (wav2wbro.rs:90) — even a ".wav"-named non-WAV is refused
    from atsc_spark.cli import main_wav2wbro

    p = tmp_path / "fake.wav"
    p.write_bytes(b"NOTAWAVFILE!" * 4)
    assert main_wav2wbro([str(p)]) == 1


def test_write_then_read_samples_csv_roundtrip(tmp_path):
    p = tmp_path / "s.csv"
    write_samples_csv(str(p), np.array([1, 5]), np.array([1.01, 1.22]))
    assert p.read_text() == "timestamp,value\n1,1.01\n5,1.22\n"
    ts, vs = read_samples_csv(str(p), time_field="timestamp", zero_timestamps=False)
    np.testing.assert_array_equal(ts, [1, 5])
    np.testing.assert_array_equal(vs, [1.01, 1.22])
