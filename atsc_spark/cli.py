"""Reference-CLI parity: the `atsc` and `csv-compressor` binaries as
module entry points, same knob names, same file-extension behavior.

    python -m atsc_spark file.wbro --compressor auto --error 3
    python -m atsc_spark -u file.bro
    python -m atsc_spark data.csv --csv --fields time,value
    python -m atsc_spark.csv_compressor input.csv --output-vsri --output-wavbrro
    python -m atsc_spark.csv_compressor -u input.bro --output-csv

These run the pure-NumPy codec core (`atsc_spark.core`) directly — a
single file needs no SparkSession, and the core is the exact same code
the Arrow-batched Spark fit path executes, so CLI output and engine
output are byte-identical.  Directory/at-scale processing is the
engine API (`frames.fit_frames` over a DataFrame); the CLI mirrors the
reference's single-node surface (`atsc/src/main.rs:174-232`,
`csv-compressor/src/main.rs:36-92`).

Parity notes (each mirrored verbatim, with the reference cite at the
implementation site):

- compress writes ``<input>.bro`` next to the input (extension
  REPLACED, `main.rs:112,129`); ``-u`` writes ``<input>.wbro``;
- lossy compressors (auto/fft/polynomial/idw) take the error bound and
  selection sample level; noop/constant/rle compress unbounded
  (`main.rs:149-163`);
- directory inputs process every file non-recursively; a failing file
  is logged and retried once, and a second failure aborts the walk —
  the reference's own control flow (`main.rs:50-68`);
- the csv-compressor reads ``timestamp,value`` headers with epoch-ms
  timestamps, folds each into in-day seconds
  (`csv-compressor/src/metric.rs:57-60`), and builds the VSRI with the
  greedy per-point update (`io.vsri_from_timestamps`); its uncompress
  path reads ``<input>.vsri`` and emits CSV through the reference's
  ``get_time`` (bug included — see ``io.vsri_get_time``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from .core import COMPRESSOR_IDS, compress_series, decompress_series
from .core import stream_from_bytes, stream_to_bytes
from .io import (
    day_elapsed_seconds,
    read_samples_csv,
    read_wbro,
    vsri_from_timestamps,
    vsri_get_time,
    write_samples_csv,
    write_vsri,
    write_wbro,
    read_vsri,
)

_LOSSY = {"auto", "fft", "polynomial", "idw"}


def compress_data(values: np.ndarray, compressor: str, error_pct: int, sample_level: int) -> bytes:
    """`main.rs:130-165`: plan + per-chunk compression; lossy
    compressors bounded at error/100 with the selection sample level,
    noop/constant/rle unbounded."""
    cid = COMPRESSOR_IDS[compressor]
    if compressor in _LOSSY:
        frames = compress_series(
            values, compressor=cid, max_error=error_pct / 100.0, speed=sample_level
        )
    else:
        frames = compress_series(values, compressor=cid, max_error=0.0, speed=0)
    return stream_to_bytes(frames)


def decompress_data(blob: bytes) -> np.ndarray:
    return decompress_series(stream_from_bytes(blob))


# ------------------------------------------------------------- `atsc`


def _atsc_single_file(path: Path, args) -> None:
    """`main.rs:70-128` (process_single_file)."""
    if args.uncompress:
        blob = path.read_bytes()
        values = decompress_data(blob)
        if args.verbose:
            print(f"Output={list(values)}")
        write_wbro(str(path.with_suffix(".wbro")), values)
    elif args.csv:
        if args.no_header:
            _, values = read_samples_csv(str(path), headered=False)
        else:
            t_field, v_field = (s.strip() for s in args.fields.split(",", 1))
            _, values = read_samples_csv(
                str(path), headered=True, time_field=t_field, value_field=v_field
            )
        if args.verbose:
            print(f"Input={list(values)}")
        blob = compress_data(
            values, args.compressor, args.error, args.compression_selection_sample_level
        )
        path.with_suffix(".bro").write_bytes(blob)
    else:
        values = read_wbro(str(path))
        if args.verbose:
            print(f"Input={list(values)}")
        blob = compress_data(
            values, args.compressor, args.error, args.compression_selection_sample_level
        )
        path.with_suffix(".bro").write_bytes(blob)


def main_atsc(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="atsc", description="A Time-Series compressor (PySpark engine CLI)"
    )
    p.add_argument("input", type=Path)
    p.add_argument(
        "--compressor",
        choices=["auto", "noop", "fft", "constant", "polynomial", "idw", "rle"],
        default="auto",
    )
    p.add_argument("-e", "--error", type=int, default=3, choices=range(0, 51),
                   metavar="0..50")
    p.add_argument("-u", dest="uncompress", action="store_true",
                   help="uncompress the input file/directory")
    p.add_argument("-c", "--compression-selection-sample-level", type=int,
                   default=0, choices=range(0, 7), metavar="0..6")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--csv", action="store_true")
    p.add_argument("--no-header", action="store_true")
    p.add_argument("--fields", default="time,value")
    args = p.parse_args(argv)

    if args.input.is_file():
        _atsc_single_file(args.input, args)
    elif args.input.is_dir():
        # `main.rs:50-68`: walk non-recursively; a failure is logged,
        # the file retried once, and a second failure aborts the walk
        for child in sorted(args.input.iterdir()):
            if not child.is_file():
                continue
            try:
                _atsc_single_file(child, args)
                continue
            except Exception as exc:  # noqa: BLE001 - mirrored control flow
                print(f"error: {exc} File: {child}", file=sys.stderr)
            _atsc_single_file(child, args)
    else:
        print("The provided path is neither a file nor a directory.", file=sys.stderr)
        return 1
    return 0


# --------------------------------------------------- `csv-compressor`


def _trunc_div_1000(t: int) -> int:
    """Rust i64 `/ 1000` truncates toward zero; Python // floors."""
    return t // 1000 if t >= 0 else -((-t) // 1000)


def main_csv_compressor(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="csv-compressor",
        description="A Time-Series compressor utilizing the frame codec for CSV format",
    )
    p.add_argument("input", type=Path)
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("-u", dest="uncompress", action="store_true")
    p.add_argument("--no-compression", action="store_true")
    p.add_argument("--output-vsri", action="store_true")
    p.add_argument("--output-wavbrro", action="store_true")
    p.add_argument("--output-csv", action="store_true")
    p.add_argument(
        "--compressor",
        choices=["auto", "noop", "fft", "constant", "polynomial", "idw"],
        default="auto",
    )
    p.add_argument("-e", "--error", type=int, default=5, choices=range(0, 51),
                   metavar="0..50")
    p.add_argument("-c", "--compression-selection-sample-level", type=int,
                   default=0, choices=range(0, 7), metavar="0..6")
    args = p.parse_args(argv)

    if not args.input.is_file():
        print("Input is not a file", file=sys.stderr)
        return 1
    out_base = args.output if args.output is not None else args.input

    if args.uncompress:
        # `csv-compressor/src/main.rs:147-179`: .bro -> values; the
        # index is read from the INPUT's sibling .vsri; CSV timestamps
        # go through the reference's get_time (quirk preserved)
        values = decompress_data(args.input.read_bytes())
        segments = read_vsri(str(args.input.with_suffix(".vsri")))
        write_wbro(str(out_base.with_suffix(".wbro")), values)
        if args.output_csv:
            ts = np.asarray(
                [vsri_get_time(segments, i) for i in range(len(values))],
                dtype=np.int64,
            )
            write_samples_csv(str(out_base.with_suffix(".csv")), ts, values)
        return 0

    # compress path (`main.rs:180-210`)
    ts_ms, values = read_samples_csv(
        str(args.input), headered=True, zero_timestamps=False,
        time_field="timestamp", value_field="value",
    )
    in_day = [day_elapsed_seconds(_trunc_div_1000(int(t))) for t in ts_ms]
    segments = vsri_from_timestamps(in_day)  # raises on out-of-order, like the reference
    if args.output_wavbrro:
        # sic: the csv-compressor writes ".wavbro", not ".wbro"
        # (`main.rs:186-188`)
        write_wbro(str(out_base.with_suffix(".wavbro")), values)
    if args.output_vsri:
        write_vsri(str(out_base.with_suffix(".vsri")), segments)
    if not args.no_compression:
        blob = compress_data(
            values, args.compressor, args.error, args.compression_selection_sample_level
        )
        out_base.with_suffix(".bro").write_bytes(blob)
    return 0


# --------------------------------------------------------- `wav2wbro`


def main_wav2wbro(argv: list[str] | None = None) -> int:
    """The `wav2wbro` migration binary (`tools/src/bin/wav2wbro.rs`):
    legacy 4xu16-limb WAV -> WavBrro, NaNs dropped.  Quirks mirrored:
    the output name is the input with its trailing "wav" replaced by
    "wbro" (`format!("{}wbro", strip_suffix("wav"))`, rs:101 — an
    input not ending in "wav" is a hard error, like the unwrap), and
    ``--validate``'s success message really does say the data doesn't
    match (rs:103-106: the assert panics on an actual mismatch — any
    NaN in the input trips it, since the comparison is against the
    UNfiltered samples — and the println only runs after it passes)."""
    from .io import read_legacy_wav, wav2wbro

    p = argparse.ArgumentParser(prog="wav2wbro", description="WAV to WAVBRRO converter")
    p.add_argument("input", type=Path)
    p.add_argument("--validate", action="store_true")
    args = p.parse_args(argv)

    name = str(args.input)
    # reference order: the RIFF/WAVE magic assert (is_wav_file, rs:90)
    # fires before the name-suffix unwrap (rs:101)
    with open(name, "rb") as fh:
        header = fh.read(12)
    if len(header) < 12 or header[:4] != b"RIFF" or header[8:12] != b"WAVE":
        print(f"error: {name!r} is not a RIFF/WAVE file", file=sys.stderr)
        return 1
    if not name.endswith("wav"):
        print(f"error: input {name!r} does not end in 'wav'", file=sys.stderr)
        return 1
    out = name[: -len("wav")] + "wbro"
    wav2wbro(name, out)
    if args.validate:
        wav_data = read_legacy_wav(name)
        back = read_wbro(out)
        if len(wav_data) != len(back) or not (
            (wav_data == back) | (np.isnan(wav_data) & np.isnan(back))
        ).all():
            raise AssertionError("wav2wbro validate: data mismatch")
        # sic — the reference prints this on SUCCESS (rs:103-106)
        print(
            "File generated but data doesn't match! "
            "Tip: Check if NaN or Infinite is in the data."
        )
    return 0
