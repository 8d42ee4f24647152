"""Reference-format I/O: CSV (S1-S4), WavBrro (S5), VSRI text (S10),
BRO streams (S7-S8).

These exist for parity testing against the reference's own corpora and
for migration — production ingest is the Iceberg/parquet transcripts
table, not these single-series files.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# ----------------------------------------------------------------- CSV


def read_samples_csv(
    path: str,
    headered: bool = True,
    zero_timestamps: bool = True,
    time_field: str = "time",
    value_field: str = "value",
):
    """CSV -> (timestamps int64, values float64).

    Mirrors `atsc/src/csv.rs:36-98`: the headered reader locates the
    time/value columns by name (overridable, the CLI's ``--fields``
    knob — the timestamp column must EXIST but its values go unused
    when ``zero_timestamps``, exactly the reference's quirk of
    checking the position then storing 0, `csv.rs:44-69`); the
    csv-compressor path keeps timestamps
    (`csv-compressor/src/csv.rs:43-47`).
    """
    ts: list[int] = []
    values: list[float] = []
    with open(path) as fh:
        lines = [line.strip() for line in fh if line.strip()]
    if headered:
        header = [c.strip() for c in lines[0].split(",")]
        t_idx = header.index(time_field)
        v_idx = header.index(value_field)
        rows = lines[1:]
    else:
        t_idx, v_idx = None, 0
        rows = lines
    for line in rows:
        parts = line.split(",")
        values.append(float(parts[v_idx]))
        if t_idx is not None:
            ts.append(0 if zero_timestamps else int(float(parts[t_idx])))
        else:
            ts.append(0)
    return np.asarray(ts, dtype=np.int64), np.asarray(values, dtype=np.float64)


def write_samples_csv(path: str, ts: np.ndarray, values: np.ndarray) -> None:
    """`csv-compressor/src/csv.rs:50-58`."""
    with open(path, "w") as fh:
        fh.write("timestamp,value\n")
        for t, v in zip(ts, values):
            fh.write(f"{int(t)},{v}\n")


# ------------------------------------------------------------- WavBrro


def read_wbro(path: str) -> np.ndarray:
    """Read a reference `.wbro` file (values only).

    Layout (empirically validated against the reference's test corpora;
    producer: rkyv-serialized `WavBrro{sample_count u32, bitdepth u8,
    chunks Vec<Vec<f64>>}` behind a 12-byte `WBRO0000WBRO` magic,
    `wavbrro/src/wavbrro.rs:24-46`, `read.rs:23-37`):

    - bytes 0..12: magic;
    - chunk payloads: little-endian f64 runs (2048 samples per chunk);
    - an entry table of (rel_ptr i32, len u32) per chunk;
    - 16-byte archived root at EOF: (chunks_rel_ptr i32, chunks_len
      u32, sample_count u32, bitdepth u8 + padding).
    """
    with open(path, "rb") as fh:
        blob = fh.read()
    if blob[:4] != b"WBRO" or blob[8:12] != b"WBRO":
        raise ValueError("not a WavBrro file (magic mismatch)")
    root_off = len(blob) - 16
    chunks_ptr, chunks_len, sample_count, bitdepth = struct.unpack_from(
        "<iIIB", blob, root_off
    )
    entries_pos = root_off + chunks_ptr
    parts = []
    for i in range(chunks_len):
        ep = entries_pos + 8 * i
        rel, ln = struct.unpack_from("<iI", blob, ep)
        parts.append(np.frombuffer(blob, dtype="<f8", count=ln, offset=ep + rel))
    out = np.concatenate(parts) if parts else np.empty(0, dtype=np.float64)
    if len(out) != sample_count:
        raise ValueError(f"wbro: expected {sample_count} samples, got {len(out)}")
    return out


# ------------------------------------------------------------ VSRI text


@dataclass
class VsriSegment:
    sample_rate: int  # m
    first_idx: int  # x0
    first_ts: int  # y0
    n_samples: int


def read_vsri(path: str) -> list[VsriSegment]:
    """Text format: `min_ts\\nmax_ts\\n` then `m,x0,y0,n` lines
    (`vsri/src/lib.rs:428-453`)."""
    with open(path) as fh:
        lines = [line.strip() for line in fh if line.strip()]
    segments = []
    for line in lines[2:]:
        m, x0, y0, n = (int(x) for x in line.split(","))
        segments.append(VsriSegment(m, x0, y0, n))
    return segments


def write_vsri(path: str, segments: list[VsriSegment]) -> None:
    """`vsri/src/lib.rs:457-491`."""
    if segments:
        min_ts = segments[0].first_ts
        last = segments[-1]
        max_ts = last.first_ts + last.sample_rate * (last.n_samples - 1)
    else:
        min_ts = max_ts = 0
    with open(path, "w") as fh:
        fh.write(f"{min_ts}\n{max_ts}\n")
        for s in segments:
            fh.write(f"{s.sample_rate},{s.first_idx},{s.first_ts},{s.n_samples}\n")


def vsri_timestamps(segments: list[VsriSegment]) -> np.ndarray:
    """`get_all_timestamps` (`vsri/src/lib.rs:352-362`)."""
    parts = [
        s.first_ts + s.sample_rate * np.arange(s.n_samples, dtype=np.int64)
        for s in segments
    ]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def day_elapsed_seconds(timestamp_sec: int) -> int:
    """Seconds since UTC midnight (`vsri/src/lib.rs:50-58`) — the
    csv-compressor folds every epoch timestamp into its in-day seconds
    before indexing (`csv-compressor/src/metric.rs:57-60`)."""
    return int(timestamp_sec) % 86_400


def vsri_from_timestamps(ts) -> list[VsriSegment]:
    """Greedy per-point VSRI construction — the reference's
    ``Vsri::update_for_point`` applied in sequence
    (`vsri/src/lib.rs:249-284`, helpers lib.rs:370-419): a lone first
    point opens a zero-rate "fake" segment; the second point fixes the
    segment's sample_rate (`generate_segment`); later points extend
    the segment while their computed index lands exactly one past the
    end (`fits_segment`), else open a new fake segment.

    Reference quirks preserved verbatim:

    - a point in the past (``y < max_ts``) raises, like
      ``Err(UpdateIndexForPointError)`` (lib.rs:252-259) — note a
      DUPLICATE of max_ts passes the check and opens a fake segment;
    - ``fits_segment`` computes the index with truncating integer
      division (the reference's own "TODO: Can return float"), so an
      off-grid point that truncates onto the next index is absorbed as
      if it sat on the grid (e.g. 31 extends a 10-second-rate segment
      ending at 20 and is thereafter read back as 30).

    The distributed counterpart is ``frames.time_segment_arrays``
    (run-based split, same exact-reconstruction property for on-grid
    data, but a different — also valid — segmentation: the greedy
    builder pairs the two points after a rate change into one segment
    where the run-split leaves singletons).
    """
    segments: list[VsriSegment] = []
    max_ts = None
    for y in (int(t) for t in ts):
        if max_ts is not None and y < max_ts:
            raise ValueError(
                f"VSRI: trying to index a point in the past: {max_ts}, provided: {y}"
            )
        max_ts = y
        if not segments:
            segments.append(VsriSegment(0, 0, y, 1))
            continue
        last = segments[-1]
        if last.sample_rate == 0:  # fake segment -> fix its rate now
            segments[-1] = VsriSegment(y - last.first_ts, last.first_idx, last.first_ts, 2)
        else:
            b = last.first_ts - last.sample_rate * last.first_idx
            # truncating integer division, exactly like Rust's `/` on
            # positive i32 (the false-fit quirk documented above)
            x_value = (y - b) // last.sample_rate
            if x_value == last.first_idx + last.n_samples:
                segments[-1] = VsriSegment(
                    last.sample_rate, last.first_idx, last.first_ts, last.n_samples + 1
                )
            else:
                segments.append(
                    VsriSegment(0, last.first_idx + last.n_samples, y, 1)
                )
    return segments


def vsri_get_time(segments: list[VsriSegment], x: int) -> int | None:
    """Sample index -> timestamp, mirroring ``Vsri::get_time``
    (`vsri/src/lib.rs:330-349`) INCLUDING its bug: the interior branch
    computes ``y0 + m * x`` with the GLOBAL index (the ``- m * x0``
    term of the line equation is missing, unlike ``get_sample`` which
    goes through ``calculate_b``), so for any segment with
    ``first_idx > 0`` the interior timestamps come back shifted.  The
    ``x == 0`` / ``x == sample_count`` shortcuts mask it at the ends,
    and single-segment indexes (the csv-compressor's common case —
    one day of one-rate samples) are unaffected.  Mirrored verbatim
    because the csv-compressor's decompress-to-CSV path is defined by
    it (`csv-compressor/src/metric.rs:87-97`)."""
    if not segments:
        return None if x != 0 else 0
    if x == 0:
        return segments[0].first_ts
    last = segments[-1]
    sample_count = last.first_idx + last.n_samples
    if x > sample_count:
        return None
    if x == sample_count:
        return last.first_ts + last.sample_rate * (last.n_samples - 1)
    for s in segments:
        if s.first_idx <= x < s.first_idx + s.n_samples:
            return s.first_ts + s.sample_rate * x  # sic: global x (see above)
    return None


def write_wbro(path: str, values: np.ndarray, chunk: int = 2048) -> None:
    """Write a `.wbro` file in the reference's rkyv archive layout
    (inverse of :func:`read_wbro`; `wavbrro/src/wavbrro.rs:24-60`):
    12-byte magic, sequential 2048-sample f64 chunk payloads, an
    (rel_ptr i32, len u32) entry per chunk, then the 16-byte root with
    the reference's hardcoded bitdepth 5 (`wavbrro.rs:60`)."""
    v = np.asarray(values, dtype=np.float64)
    chunks = [v[i : i + chunk] for i in range(0, len(v), chunk)] or [v]
    parts = [b"WBRO0000WBRO"]
    offsets = []
    pos = 12
    for c in chunks:
        offsets.append(pos)
        b = c.astype("<f8").tobytes()
        parts.append(b)
        pos += len(b)
    entries_pos = pos
    for i, (c, off) in enumerate(zip(chunks, offsets)):
        ep = entries_pos + 8 * i
        parts.append(struct.pack("<iI", off - ep, len(c)))
    root_off = entries_pos + 8 * len(chunks)
    parts.append(
        struct.pack("<iIIB3x", entries_pos - root_off, len(chunks), len(v), 5)
    )
    with open(path, "wb") as fh:
        fh.write(b"".join(parts))


# ---------------------------------------------------- legacy WAV (S11)


def read_legacy_wav(path: str) -> np.ndarray:
    """Port of the legacy brro "wav" reader
    (`tools/src/bin/wav2wbro.rs:35-72`): an N<=4-channel 16-bit PCM WAV
    where each frame's channel samples are the u16 limbs of one f64 bit
    pattern, LSB-first (`join_u16_into_f64`, `wav2wbro.rs:62-72`).
    Channels beyond those present stay zero, matching the reference's
    zero-initialized holder."""
    with open(path, "rb") as fh:
        blob = fh.read()
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", blob, pos + 8)
        elif cid == b"data":
            data = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    _, channels, _, _, _, bits = fmt
    if bits != 16 or channels < 1 or channels > 4:
        raise ValueError(f"legacy wav expects <=4 x 16-bit channels, got {channels}x{bits}")
    ints = np.frombuffer(data, dtype="<i2").astype(np.uint16)
    n = len(ints) - len(ints) % channels
    mat = ints[:n].reshape(-1, channels).astype(np.uint64)
    u64 = np.zeros(len(mat), dtype=np.uint64)
    for c in range(channels):
        u64 |= mat[:, c] << np.uint64(16 * c)
    return u64.view(np.float64)


def wav2wbro(wav_path: str, wbro_path: str) -> int:
    """Legacy migration tool (`tools/src/bin/wav2wbro.rs:86-108`):
    read the 4xu16-encoded WAV, write WavBrro.  NaN samples are
    dropped on the way in (`wav2wbro.rs:94-98`; infinities are KEPT —
    the reference only filters `is_nan`).  Returns written count."""
    values = read_legacy_wav(wav_path)
    values = values[~np.isnan(values)]
    write_wbro(wbro_path, values)
    return len(values)
