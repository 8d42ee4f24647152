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


def read_samples_csv(path: str, headered: bool = True, zero_timestamps: bool = True):
    """CSV -> (timestamps int64, values float64).

    Mirrors `atsc/src/csv.rs:36-98`: the headered reader locates the
    `time`/`value` columns by name; the main binary's quirk of parsing
    timestamps and then storing 0 (`csv.rs:59-69`) is reproduced when
    ``zero_timestamps`` (the csv-compressor path keeps them,
    `csv-compressor/src/csv.rs:43-47`).
    """
    ts: list[int] = []
    values: list[float] = []
    with open(path) as fh:
        lines = [line.strip() for line in fh if line.strip()]
    if headered:
        header = [c.strip() for c in lines[0].split(",")]
        t_idx = header.index("time")
        v_idx = header.index("value")
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
    read the 4xu16-encoded WAV, write WavBrro.  Returns sample count."""
    values = read_legacy_wav(wav_path)
    write_wbro(wbro_path, values)
    return len(values)
