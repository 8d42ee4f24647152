"""Lossless tier: delta-of-delta timestamps + Gorilla-style XOR values.

Algorithms follow the Gorilla paper (Pelkonen et al., VLDB'15 —
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", §4.1),
which the reference's paper cites for its lossless roadmap
(`/root/reference/paper/`, README "Roadmap: Lossless compression").
The reference itself ships no lossless tier; this module supplies the
one the north rule requires, so the byte layout is ours to choose.

Layout: structure-of-arrays, not the paper's interleaved bitstream.
The paper interleaves control bits, (lz, mlen) headers and meaningful
bits per value, which forces a sequential boundary scan on decode (you
cannot know where record *i+1* starts without parsing record *i*).  We
store three separately-packed sections instead —

- a 1-bit-per-value control stream (repeat / changed),
- a fixed-width header stream (11-bit ``lz:5 | mlen-1:6`` per changed
  value; 2-bit delta-of-delta bucket tags on the timestamp side),
- one concatenated meaningful-bits stream whose per-record offsets are
  a ``cumsum`` of the header lengths —

so BOTH encode and decode are pure NumPy: fixed-width sections unpack
with a reshape, the ragged section with one vectorized gather+packbits,
and the sequential recurrences collapse to prefix scans
(``np.bitwise_xor.accumulate`` for XOR deltas — XOR is associative —
and ``np.cumsum`` twice for delta-of-delta).  Per-value cost is
identical to the paper's scheme minus one control bit per changed
value; only the section framing (a few fixed bytes per block) differs.

Timestamp buckets (paper §4.1.1, collapsed to 4 tags so the tag stream
is fixed 2-bit): dod 0 | [-63,64] 7b | [-2047,2048] 12b | raw 64b.

Format history: ``GORB`` (current, SoA sections as above) replaced the
pre-release interleaved ``GORA`` layout in round 2.  GORA was never
shipped in a tagged release and no persisted tier-0 data predates the
break (every store in this repo is (re)written by the same code that
reads it); decoders therefore reject unknown magics loudly instead of
carrying a legacy branch.  Both sections are magic-guarded — ``GORB``
on the timestamp section, ``XORB`` on the value section — so a stale
or foreign blob fails fast with a versioned error rather than
decoding garbage.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GORB"
_XOR_MAGIC = b"XORB"


def _check_magic(got: bytes, want: bytes, section: str) -> None:
    if got != want:
        legacy = " (pre-release GORA layout is not supported)" if got == b"GORA" else ""
        raise ValueError(
            f"gorilla {section} section: bad magic {got!r}, expected {want!r}{legacy}"
        )


# ------------------------------------------------------- bit packing


def _pack_varbits(chunks: np.ndarray, lengths: np.ndarray) -> bytes:
    """Pack per-element (value, nbits) pairs MSB-first into bytes.

    chunks: uint64 values (only the low `lengths` bits are used);
    lengths: int array of bit counts (0..64). Left-aligns each field at
    the MSB, explodes to a bit matrix with one C-level unpackbits, then
    ragged-selects the real prefixes. No per-bit uint64 shifting.
    """
    n = len(chunks)
    if n == 0:
        return b""
    lens = np.asarray(lengths, dtype=np.uint64)
    left = np.asarray(chunks, dtype=np.uint64) << (np.uint64(64) - lens)
    bitmat = np.unpackbits(left.astype(">u8").view(np.uint8).reshape(n, 8), axis=1)
    mask = np.arange(64, dtype=np.uint64)[None, :] < lens[:, None]
    return np.packbits(bitmat[mask]).tobytes()


def _extract_fields(buf: bytes | np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized ragged bit-field extraction from a byte buffer.

    buf: packed MSB-first bitstream; starts/lengths: per-record bit
    offset and width (0..64). Returns one uint64 per record.

    Per record: gather the 9 bytes covering any 64-bit window at any
    bit phase, assemble a big-endian u64 aligned to the field's first
    bit, and shift down to the field width — (k, 9) byte gathers
    instead of a (k, 64) bit matrix.
    """
    k = len(starts)
    if k == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    b = np.concatenate([b, np.zeros(9, dtype=np.uint8)])
    byte_off = (starts >> 3).astype(np.int64)
    nine = b[byte_off[:, None] + np.arange(9, dtype=np.int64)[None, :]].astype(np.uint64)
    u64 = np.zeros(k, dtype=np.uint64)
    for j in range(8):
        u64 |= nine[:, j] << np.uint64(8 * (7 - j))
    sh = (starts & 7).astype(np.uint64)
    aligned = (u64 << sh) | (nine[:, 8] >> (np.uint64(8) - sh))  # sh=0: >>8 == 0
    lens = lengths.astype(np.uint64)
    down = np.where(lens > 0, np.uint64(64) - lens, np.uint64(0))
    return np.where(lens > 0, aligned >> down, np.uint64(0))


def _pack_fixed(values: np.ndarray, width: int) -> bytes:
    """Pack k values of `width` bits each, MSB-first, contiguously."""
    k = len(values)
    if k == 0:
        return b""
    left = np.asarray(values, dtype=np.uint64) << np.uint64(64 - width)
    bitmat = np.unpackbits(left.astype(">u8").view(np.uint8).reshape(k, 8), axis=1)
    return np.packbits(bitmat[:, :width].ravel()).tobytes()


def _unpack_fixed(buf: bytes, width: int, k: int) -> np.ndarray:
    """Inverse of _pack_fixed: k fixed-width fields -> uint64 array."""
    if k == 0:
        return np.empty(0, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=width * k)
    mat = bits.reshape(k, width).astype(np.uint64)
    w = np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (mat * w).sum(axis=1, dtype=np.uint64)


def _floor_log2_u64(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for x > 0, vectorized binary search over
    the uint64 bit positions (6 shift/compare passes). Float log2 is
    NOT safe here: it rounds up within half an ulp of 2^k (worst case
    2^64, wrapping 63-hi in uint64) and silently truncates bits."""
    v = x.copy()
    n = np.zeros(len(v), dtype=np.uint64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        m = v >= (np.uint64(1) << s)
        n[m] += s
        v[m] >>= s
    return n


# ------------------------------------------------------- timestamps

_DOD_BITS = np.array([7, 12, 64], dtype=np.int64)
_DOD_BIAS = np.array([63, 2047, 0], dtype=np.int64)


def dod_encode(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 seconds array (SoA layout)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    head = struct.pack("<I", n)
    if n == 0:
        return _MAGIC + head
    head += struct.pack("<q", int(ts[0]))
    if n == 1:
        return _MAGIC + head
    head += struct.pack("<q", int(ts[1] - ts[0]))
    if n == 2:
        return _MAGIC + head

    dod = np.diff(np.diff(ts))  # length n-2
    nz = dod != 0
    ctrl_bytes = np.packbits(nz).tobytes()
    dnz = dod[nz]
    tags = np.select(
        [(dnz >= -63) & (dnz <= 64), (dnz >= -2047) & (dnz <= 2048)],
        [0, 1],
        default=2,
    ).astype(np.int64)
    tag_bytes = _pack_fixed(tags, 2)
    lengths = _DOD_BITS[tags]
    payload = (dnz + _DOD_BIAS[tags]).view(np.uint64)  # tag2 = raw i64 bits
    body = _pack_varbits(payload, lengths)
    return _MAGIC + head + ctrl_bytes + tag_bytes + body


def dod_decode(blob: bytes) -> np.ndarray:
    _check_magic(blob[:4], _MAGIC, "timestamp")
    n = struct.unpack("<I", blob[4:8])[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t0 = struct.unpack("<q", blob[8:16])[0]
    if n == 1:
        return np.asarray([t0], dtype=np.int64)
    d0 = struct.unpack("<q", blob[16:24])[0]
    if n == 2:
        return np.asarray([t0, t0 + d0], dtype=np.int64)

    m = n - 2
    ctrl_len = (m + 7) // 8
    ctrl = np.unpackbits(np.frombuffer(blob[24 : 24 + ctrl_len], dtype=np.uint8), count=m)
    k = int(ctrl.sum())
    tag_len = (2 * k + 7) // 8
    tags = _unpack_fixed(blob[24 + ctrl_len : 24 + ctrl_len + tag_len], 2, k).astype(np.int64)
    lengths = _DOD_BITS[tags]
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if k else np.empty(0, dtype=np.int64)
    raw = _extract_fields(blob[24 + ctrl_len + tag_len :], starts, lengths)
    dod = np.zeros(m, dtype=np.int64)
    dod[ctrl == 1] = raw.view(np.int64) - _DOD_BIAS[tags]  # tag2 bias 0: i64 reinterpret
    deltas = d0 + np.concatenate([[0], np.cumsum(dod)])  # length n-1
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1:] = t0 + np.cumsum(deltas)
    return out


# ------------------------------------------------------------ values


def xor_encode(values: np.ndarray) -> bytes:
    """Gorilla-style XOR encode an f64 array (vectorized, SoA layout)."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    head = _XOR_MAGIC + struct.pack("<I", n)
    if n == 0:
        return head
    bits = v.view(np.uint64)
    head += struct.pack("<Q", int(bits[0]))
    if n == 1:
        return head

    x = bits[1:] ^ bits[:-1]
    nz = x != 0
    xv = x[nz]
    hi = _floor_log2_u64(xv)
    lz = np.minimum(np.uint64(31), np.uint64(63) - hi)  # cap at 31 (5 bits)
    low = xv & (~xv + np.uint64(1))  # lowest set bit (power of two)
    tz = _floor_log2_u64(low)
    mlen = np.uint64(64) - lz - tz
    meaning = xv >> tz

    ctrl_bytes = np.packbits(nz).tobytes()
    hdr = (lz << np.uint64(6)) | (mlen - np.uint64(1))
    hdr_bytes = _pack_fixed(hdr, 11)
    body = _pack_varbits(meaning, mlen.astype(np.int64))
    return head + ctrl_bytes + hdr_bytes + body


def xor_decode(blob: bytes) -> np.ndarray:
    _check_magic(blob[:4], _XOR_MAGIC, "value")
    n = struct.unpack("<I", blob[4:8])[0]
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = struct.unpack("<Q", blob[8:16])[0]
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(first)
    if n == 1:
        return out.view(np.float64)

    ctrl_len = (n - 1 + 7) // 8
    ctrl = np.unpackbits(
        np.frombuffer(blob[16 : 16 + ctrl_len], dtype=np.uint8), count=n - 1
    )
    k = int(ctrl.sum())
    hdr_len = (11 * k + 7) // 8
    hdr = _unpack_fixed(blob[16 + ctrl_len : 16 + ctrl_len + hdr_len], 11, k)
    lz = hdr >> np.uint64(6)
    mlen = (hdr & np.uint64(63)) + np.uint64(1)
    tz = np.uint64(64) - lz - mlen

    lengths = mlen.astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if k else np.empty(0, dtype=np.int64)
    meaning = _extract_fields(blob[16 + ctrl_len + hdr_len :], starts, lengths)

    # XOR is associative: the prev^delta recurrence is a prefix scan.
    deltas = np.zeros(n - 1, dtype=np.uint64)
    deltas[ctrl == 1] = meaning << tz
    out[1:] = np.uint64(first) ^ np.bitwise_xor.accumulate(deltas)
    return out.view(np.float64)


# ---------------------------------------------------------- combined


def gorilla_encode(ts: np.ndarray, values: np.ndarray) -> bytes:
    """One lossless block: dod(ts) + xor(values)."""
    t = dod_encode(ts)
    v = xor_encode(values)
    return struct.pack("<I", len(t)) + t + v


def gorilla_decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    tlen = struct.unpack("<I", blob[:4])[0]
    ts = dod_decode(blob[4 : 4 + tlen])
    values = xor_decode(blob[4 + tlen :])
    return ts, values
