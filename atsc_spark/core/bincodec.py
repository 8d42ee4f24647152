"""Minimal bincode-v2 "standard config" compatible codec.

The reference serializes every frame payload with bincode's standard
configuration — little-endian, variable-length integers
(`/root/reference/atsc/src/compressor/mod.rs:122-131`).  We emit the
same byte layout so the frames table's ``payload`` column is
byte-identical to the reference's `.bro` frame bodies, which lets the
parity tests assert the reference's golden byte vectors verbatim.

Encoding rules implemented (only what the frames need):

- ``u8``: one raw byte.
- unsigned varint (u16/u32/u64/usize): < 251 one byte; ``0xFB`` + 2-byte
  LE for <= u16::MAX; ``0xFC`` + 4-byte LE for <= u32::MAX; ``0xFD`` +
  8-byte LE otherwise.
- signed ints: zigzag then unsigned varint.
- ``f32``/``f64``: fixed 4/8 LE bytes.
- enum: variant index as u32 varint.
- ``Vec<T>``: length as u64 varint, then elements.
"""

from __future__ import annotations

import struct


import numpy as np


def uvarints_vec(values) -> bytes:
    return uvarints_vec_with_lens(values)[0]


def uvarints_vec_with_lens(values) -> tuple[bytes, "np.ndarray"]:
    """Vectorized bincode unsigned-varint encoding of an integer array.

    Same bytes as Writer.uvarint per element, assembled with NumPy
    scatter writes instead of a Python loop — the hot path for RLE
    index lists and polynomial point arrays inside the tournament.
    Returns (bytes, per-element byte lengths).
    """
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b"", np.empty(0, dtype=np.int64)
    if v.max() < 251:
        # fast path: every value is a single-byte varint (true for all
        # RLE indices/counts of frames up to 251 samples — the common
        # transcript series-day case)
        return v.astype(np.uint8).tobytes(), np.ones(len(v), dtype=np.int64)
    lens = np.select(
        [v < 251, v <= 0xFFFF, v <= 0xFFFFFFFF], [1, 3, 5], default=9
    ).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out = np.zeros(int(lens.sum()), dtype=np.uint8)

    m1 = v < 251
    out[offs[m1]] = v[m1]

    m3 = (~m1) & (v <= 0xFFFF)
    if m3.any():
        o = offs[m3]
        out[o] = 0xFB
        out[o + 1] = (v[m3] & np.uint64(0xFF)).astype(np.uint8)
        out[o + 2] = ((v[m3] >> np.uint64(8)) & np.uint64(0xFF)).astype(np.uint8)

    m5 = (v > 0xFFFF) & (v <= 0xFFFFFFFF)
    if m5.any():
        o = offs[m5]
        out[o] = 0xFC
        for b in range(4):
            out[o + 1 + b] = ((v[m5] >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8)

    m9 = v > 0xFFFFFFFF
    if m9.any():
        o = offs[m9]
        out[o] = 0xFD
        for b in range(8):
            out[o + 1 + b] = ((v[m9] >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8)

    return out.tobytes(), lens


def ivarints_vec(values) -> bytes:
    """Vectorized signed (zigzag) varints."""
    return ivarints_vec_with_lens(values)[0]


def ivarints_vec_with_lens(values) -> tuple[bytes, "np.ndarray"]:
    v = np.asarray(values, dtype=np.int64)
    zz = (v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64)
    return uvarints_vec_with_lens(zz)


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


class Writer:
    def __init__(self) -> None:
        self._parts: list[bytes] = []

    def bytes(self) -> bytes:
        return b"".join(self._parts)

    def raw(self, b: bytes) -> "Writer":
        self._parts.append(b)
        return self

    def u8(self, v: int) -> "Writer":
        return self.raw(bytes((v,)))

    def uvarint(self, v: int) -> "Writer":
        if v < 251:
            return self.raw(bytes((v,)))
        if v <= 0xFFFF:
            return self.raw(b"\xfb" + struct.pack("<H", v))
        if v <= 0xFFFFFFFF:
            return self.raw(b"\xfc" + struct.pack("<I", v))
        return self.raw(b"\xfd" + struct.pack("<Q", v))

    def ivarint(self, v: int) -> "Writer":
        return self.uvarint(zigzag(v))

    def f32(self, v: float) -> "Writer":
        return self.raw(struct.pack("<f", v))

    def f64(self, v: float) -> "Writer":
        return self.raw(struct.pack("<d", v))

    def enum(self, variant: int) -> "Writer":
        return self.uvarint(variant)

    def vec_len(self, n: int) -> "Writer":
        return self.uvarint(n)


def parse_uvarints(buf: bytes, n: int, pos: int) -> tuple["np.ndarray", int]:
    """Parse `n` unsigned varints starting at `pos`.

    Tight local-variable loop (varint streams are inherently
    sequential); ~3x faster than going through Reader per value.
    Returns (uint64 array, new position).
    """
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        tag = buf[pos]
        pos += 1
        if tag < 251:
            out[i] = tag
        elif tag == 0xFB:
            out[i] = buf[pos] | (buf[pos + 1] << 8)
            pos += 2
        elif tag == 0xFC:
            out[i] = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            out[i] = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
    return out, pos


def parse_ivarints(buf: bytes, n: int, pos: int) -> tuple["np.ndarray", int]:
    """Parse `n` zigzag varints -> int64 array."""
    u, pos = parse_uvarints(buf, n, pos)
    out = (u >> np.uint64(1)).astype(np.int64) ^ -(u & np.uint64(1)).astype(np.int64)
    return out, pos


class Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def raw(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("bincode: truncated input")
        self.pos += n
        return b

    def u8(self) -> int:
        return self.raw(1)[0]

    def uvarint(self) -> int:
        tag = self.u8()
        if tag < 251:
            return tag
        if tag == 0xFB:
            return struct.unpack("<H", self.raw(2))[0]
        if tag == 0xFC:
            return struct.unpack("<I", self.raw(4))[0]
        if tag == 0xFD:
            return struct.unpack("<Q", self.raw(8))[0]
        raise ValueError(f"bincode: bad varint tag {tag}")

    def ivarint(self) -> int:
        return unzigzag(self.uvarint())

    def f32(self) -> float:
        return struct.unpack("<f", self.raw(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.raw(8))[0]

    def enum(self) -> int:
        return self.uvarint()

    def vec_len(self) -> int:
        return self.uvarint()
