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
