"""ISO base media file format (MP4) container parsing in pure stdlib.

Replaces the r2-r6 "MP4 is fully stubbed" state in :mod:`multimodal`
with the real, published container layer (ISO/IEC 14496-12): box
walking, movie/track headers, handler types, sample descriptions and
the full sample tables (stts/stsz/stsc/stco/co64).  With those tables
every coded sample's TIMESTAMP and BYTE RANGE is exact — so video
metadata extraction and frame-sample plumbing (which frame, at what
time, hashing the actual coded bytes) are real.  Only the codec layer
(H.264/H.265/AAC bitstream decode) remains honestly out of scope: no
PyAV/ffmpeg in this container, and a from-scratch AVC decoder is not
this engine's job.

Scale note: parsing touches only the box headers and sample tables
(a few KB even for hour-long movies; mdat is never copied) and runs
inside the same ``mapInPandas`` batches as the image paths — per-blob,
embarrassingly parallel, no shuffle.

The fixture builder (:func:`build_mp4`) assembles a minimal valid
ftyp+moov+mdat tree with real sample tables, the same
self-produced-fixture strategy the JPEG/PNG/WAV codecs use.
"""

from __future__ import annotations

import struct
from typing import Iterator

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta", b"mvex",
}


def _walk(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); validates sizes so a corrupt blob raises ValueError
    rather than looping or over-reading."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4: box header cut off")
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        payload = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4: largesize cut off")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            payload = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < payload - pos or pos + size > end:
            raise ValueError(f"invalid MP4: box {btype!r} size {size} out of range")
        yield btype, payload, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes) -> tuple[int, int] | None:
    for t, s, e in _walk(data, start, end):
        if t == btype:
            return s, e
    return None


def _fullbox(data: bytes, start: int) -> tuple[int, int]:
    """(version, flags) of a full box payload."""
    v = data[start]
    flags = int.from_bytes(data[start + 1:start + 4], "big")
    return v, flags


def _parse_mvhd(data: bytes, s: int, e: int) -> dict:
    v, _ = _fullbox(data, s)
    if v == 1:
        timescale, duration = struct.unpack(">IQ", data[s + 20:s + 32])
    else:
        timescale, duration = struct.unpack(">II", data[s + 12:s + 20])
    return {"timescale": timescale, "duration": duration}


def _parse_tkhd(data: bytes, s: int, e: int) -> dict:
    v, _ = _fullbox(data, s)
    if v == 1:
        (track_id,) = struct.unpack(">I", data[s + 20:s + 24])
        fixed_off = s + 4 + 8 + 8 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
    else:
        (track_id,) = struct.unpack(">I", data[s + 12:s + 16])
        fixed_off = s + 4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
    width, height = struct.unpack(">II", data[fixed_off:fixed_off + 8])
    return {"track_id": track_id, "width": width >> 16, "height": height >> 16}


def _parse_mdhd(data: bytes, s: int, e: int) -> dict:
    v, _ = _fullbox(data, s)
    if v == 1:
        timescale, duration = struct.unpack(">IQ", data[s + 20:s + 32])
    else:
        timescale, duration = struct.unpack(">II", data[s + 12:s + 20])
    return {"timescale": timescale, "duration": duration}


def _parse_stts(data: bytes, s: int, e: int) -> list[tuple[int, int]]:
    (n,) = struct.unpack(">I", data[s + 4:s + 8])
    out = []
    for i in range(n):
        cnt, delta = struct.unpack(">II", data[s + 8 + 8 * i:s + 16 + 8 * i])
        out.append((cnt, delta))
    return out


def _parse_stsz(data: bytes, s: int, e: int) -> tuple[int, list[int]]:
    fixed, count = struct.unpack(">II", data[s + 4:s + 12])
    if fixed:
        # sanity-bound the expansion: the samples must fit inside the
        # file, so a crafted header claiming ~2^32 samples fails fast
        # like any other malformed box instead of allocating GBs
        if count * fixed > len(data):
            raise ValueError(
                f"stsz: {count} samples x {fixed} B exceed file size {len(data)}"
            )
        return count, [fixed] * count
    sizes = list(
        struct.unpack(f">{count}I", data[s + 12:s + 12 + 4 * count])
    )
    return count, sizes


def _parse_stsc(data: bytes, s: int, e: int) -> list[tuple[int, int]]:
    (n,) = struct.unpack(">I", data[s + 4:s + 8])
    out = []
    for i in range(n):
        first, per, _desc = struct.unpack(
            ">III", data[s + 8 + 12 * i:s + 20 + 12 * i]
        )
        out.append((first, per))
    return out


def _parse_stco(data: bytes, s: int, e: int, wide: bool) -> list[int]:
    (n,) = struct.unpack(">I", data[s + 4:s + 8])
    if wide:
        return list(struct.unpack(f">{n}Q", data[s + 8:s + 8 + 8 * n]))
    return list(struct.unpack(f">{n}I", data[s + 8:s + 8 + 4 * n]))


def sample_layout(
    stts: list[tuple[int, int]],
    sizes: list[int],
    stsc: list[tuple[int, int]],
    chunk_offsets: list[int],
) -> list[tuple[int, int, int]]:
    """Per-sample (timestamp_ticks, file_offset, size) from the four
    sample tables — the exact byte range of every coded frame (ISO
    14496-12 8.7): stsc runs assign samples to chunks, offsets within
    a chunk accumulate sample sizes, timestamps accumulate stts deltas."""
    n = len(sizes)
    # timestamps
    ts, t = [], 0
    for cnt, delta in stts:
        for _ in range(cnt):
            if len(ts) == n:
                break
            ts.append(t)
            t += delta
    while len(ts) < n:  # stts shorter than stsz: extend with last delta
        ts.append(t)
        t += stts[-1][1] if stts else 1
    # chunk assignment: expand stsc runs over the real chunk list
    out: list[tuple[int, int, int]] = []
    si = 0
    n_chunks = len(chunk_offsets)
    for ri, (first, per) in enumerate(stsc):
        last = stsc[ri + 1][0] - 1 if ri + 1 < len(stsc) else n_chunks
        for ci in range(first - 1, last):
            off = chunk_offsets[ci]
            for _ in range(per):
                if si >= n:
                    return out
                out.append((ts[si], off, sizes[si]))
                off += sizes[si]
                si += 1
    return out


def parse_mp4(content: bytes) -> dict:
    """Container metadata + per-track sample layout for an ISO BMFF
    blob.  Returns ``{brand, duration_ms, tracks: [{track_id, kind,
    codec, width, height, timescale, duration_ms, n_samples,
    samples: [(ts_ms, offset, size), ...]}]}``.  Raises ValueError on
    non-MP4 / corrupt input (dispatchers catch and fall back)."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF stream (no ftyp)")
    brand = content[8:12].decode("latin-1")
    moov = _find(content, 0, len(content), b"moov")
    if moov is None:
        raise ValueError("invalid MP4: no moov box")
    ms, me = moov
    mvhd = _find(content, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("invalid MP4: no mvhd box")
    mv = _parse_mvhd(content, *mvhd)
    movie_scale = max(mv["timescale"], 1)
    tracks = []
    for t, s, e in _walk(content, ms, me):
        if t != b"trak":
            continue
        tkhd = _find(content, s, e, b"tkhd")
        mdia = _find(content, s, e, b"mdia")
        if tkhd is None or mdia is None:
            raise ValueError("invalid MP4: trak missing tkhd/mdia")
        tk = _parse_tkhd(content, *tkhd)
        ds, de = mdia
        mdhd = _find(content, ds, de, b"mdhd")
        hdlr = _find(content, ds, de, b"hdlr")
        minf = _find(content, ds, de, b"minf")
        if mdhd is None or hdlr is None or minf is None:
            raise ValueError("invalid MP4: mdia missing mdhd/hdlr/minf")
        md = _parse_mdhd(content, *mdhd)
        handler = content[hdlr[0] + 8:hdlr[0] + 12].decode("latin-1")
        kind = {"vide": "video", "soun": "audio"}.get(handler, handler)
        stbl = _find(content, minf[0], minf[1], b"stbl")
        if stbl is None:
            raise ValueError("invalid MP4: minf missing stbl")
        bs, be = stbl
        stsd = _find(content, bs, be, b"stsd")
        codec = ""
        if stsd is not None:
            # first sample entry's format fourcc
            codec = content[stsd[0] + 12:stsd[0] + 16].decode("latin-1")
        stts_box = _find(content, bs, be, b"stts")
        stsz_box = _find(content, bs, be, b"stsz")
        stsc_box = _find(content, bs, be, b"stsc")
        stco_box = _find(content, bs, be, b"stco")
        co64_box = _find(content, bs, be, b"co64")
        stts = _parse_stts(content, *stts_box) if stts_box else []
        n_samples, sizes = _parse_stsz(content, *stsz_box) if stsz_box else (0, [])
        stsc = _parse_stsc(content, *stsc_box) if stsc_box else []
        if co64_box:
            offsets = _parse_stco(content, *co64_box, wide=True)
        elif stco_box:
            offsets = _parse_stco(content, *stco_box, wide=False)
        else:
            offsets = []
        scale = max(md["timescale"], 1)
        layout = sample_layout(stts, sizes, stsc, offsets)
        tracks.append(
            {
                "track_id": tk["track_id"],
                "kind": kind,
                "codec": codec,
                "width": tk["width"],
                "height": tk["height"],
                "timescale": md["timescale"],
                "duration_ms": int(md["duration"] * 1000 // scale),
                "n_samples": n_samples,
                "samples": [
                    (int(ts * 1000 // scale), off, size)
                    for ts, off, size in layout
                ],
            }
        )
    return {
        "brand": brand,
        "duration_ms": int(mv["duration"] * 1000 // movie_scale),
        "tracks": tracks,
    }


# ------------------------------------------------------ fixture builder


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


def build_mp4(
    width: int = 64,
    height: int = 48,
    n_frames: int = 10,
    fps: int = 5,
    frame_payloads: list[bytes] | None = None,
    codec: bytes = b"avc1",
    samples_per_chunk: int = 4,
) -> bytes:
    """Minimal valid single-video-track MP4 with REAL sample tables:
    ``n_frames`` coded samples (caller-supplied or deterministic
    bytes) laid out in chunks of ``samples_per_chunk``.  The coded
    bytes are opaque (no real AVC) — the point is exercising the
    container layer end to end, like the self-made JPEG fixtures."""
    timescale = fps * 1000
    delta = 1000  # ticks per frame -> exactly fps frames/sec
    if frame_payloads is None:
        frame_payloads = [
            bytes([(i * 37 + j) % 256 for j in range(40 + (i % 3) * 10)])
            for i in range(n_frames)
        ]
    sizes = [len(p) for p in frame_payloads]
    duration = n_frames * delta

    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_frames, delta))
    stsd_entry = struct.pack(">I", 8 + 78) + codec + bytes(6) + struct.pack(">H", 1)
    stsd_entry += bytes(16) + struct.pack(">HH", width, height) + bytes(50)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n_frames) + struct.pack(f">{n_frames}I", *sizes),
    )
    n_chunks = -(-n_frames // samples_per_chunk)
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, samples_per_chunk, 1))

    # assemble mdat first so chunk offsets are exact
    mdat_payload = b"".join(frame_payloads)
    # chunk offsets are absolute file offsets; compute after headers are
    # sized — build moov with placeholder offsets, then patch
    def moov_bytes(chunk_offsets: list[int]) -> bytes:
        stco = _full(
            b"stco", 0, 0,
            struct.pack(">I", n_chunks) + struct.pack(f">{n_chunks}I", *chunk_offsets),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _full(b"vmhd", 0, 1, bytes(8))
        dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
        dinf = _box(b"dinf", dref)
        minf = _box(b"minf", vmhd + dinf + stbl)
        hdlr = _full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12) + b"v\x00")
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", duration)
            + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + bytes(8)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + bytes(24)
            + struct.pack(">I", 2),
        )
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    placeholder = moov_bytes([0] * n_chunks)
    mdat_start = len(ftyp) + len(placeholder) + 8  # mdat header is 8 bytes
    chunk_offsets = []
    off = mdat_start
    for ci in range(n_chunks):
        chunk_offsets.append(off)
        for si in range(ci * samples_per_chunk,
                        min((ci + 1) * samples_per_chunk, n_frames)):
            off += sizes[si]
    moov = moov_bytes(chunk_offsets)
    assert len(moov) == len(placeholder)
    return ftyp + moov + _box(b"mdat", mdat_payload)
