"""Vectorized XXH64 primitives, bit-exact with Spark's ``xxhash64``.

Spark evaluates ``xxhash64(col, ...)`` with
``org.apache.spark.sql.catalyst.expressions.XxHash64`` (seed 42),
which chains per-child hashes: ``hash = seed; for child: hash =
hash_<type>(value, hash)`` — strings hash their UTF-8 bytes with the
reference XXH64 byte algorithm, longs and ints use the dedicated
8-/4-byte finalizers.  These NumPy ports reproduce those functions
exactly (pinned against Spark over randomized inputs in
``tests/test_property_datapipe.py``), so hash-heavy operators (minhash
signatures) can run as one vectorized kernel instead of per-element
interpreted JVM lambdas.

All arithmetic is uint64 with Java wrap-around semantics (NumPy uint64
overflow wraps identically); results are reinterpreted as int64 at the
boundary because Spark longs are signed — signed order matters to
consumers like ``array_min``.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

_SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(value: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashLong — Spark's per-field hash for LongType."""
    v = np.asarray(value).astype(np.int64).view(np.uint64)
    h = np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(8)
    h = h ^ (_rotl(v * _P2, 31) * _P1)
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def hash_int(value: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashInt — Spark's per-field hash for IntegerType."""
    v = np.asarray(value).astype(np.int64).view(np.uint64) & np.uint64(0xFFFFFFFF)
    h = np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(4)
    h = h ^ (v * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def hash_bytes_fixed(mat: np.ndarray, length: int, seed=_SPARK_SEED) -> np.ndarray:
    """XXH64.hashUnsafeBytes over R byte-rows of identical ``length``
    (``mat`` is (R, length) uint8, little-endian platform reads like
    Spark's ``Platform.getLong/getInt``).  Implements the full
    algorithm including >= 32-byte stripes, vectorized across rows —
    the per-row work is straight-line because the length is shared.
    """
    mat = np.ascontiguousarray(mat, dtype=np.uint8)
    R = len(mat)
    seed = np.asarray(seed, dtype=np.uint64)

    def le64(off: int) -> np.ndarray:
        return mat[:, off : off + 8].copy().view("<u8").reshape(R)

    def le32(off: int) -> np.ndarray:
        return mat[:, off : off + 4].copy().view("<u4").reshape(R).astype(np.uint64)

    off = 0
    remaining = length
    if remaining >= 32:
        # seed-derived constants via Python ints (numpy warns on
        # SCALAR uint64 overflow even though it wraps correctly)
        m = (1 << 64) - 1
        v1 = np.full(R, (int(seed) + int(_P1) + int(_P2)) & m, dtype=np.uint64)
        v2 = np.full(R, (int(seed) + int(_P2)) & m, dtype=np.uint64)
        v3 = np.full(R, int(seed), dtype=np.uint64)
        v4 = np.full(R, (int(seed) - int(_P1)) & m, dtype=np.uint64)
        while remaining >= 32:
            v1 = _rotl(v1 + le64(off) * _P2, 31) * _P1
            v2 = _rotl(v2 + le64(off + 8) * _P2, 31) * _P1
            v3 = _rotl(v3 + le64(off + 16) * _P2, 31) * _P1
            v4 = _rotl(v4 + le64(off + 24) * _P2, 31) * _P1
            off += 32
            remaining -= 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
    else:
        h = np.full(
            R, (int(seed) + int(_P5)) & ((1 << 64) - 1), dtype=np.uint64
        )
    h = h + np.uint64(length)
    while remaining >= 8:
        h = _rotl(h ^ (_rotl(le64(off) * _P2, 31) * _P1), 27) * _P1 + _P4
        off += 8
        remaining -= 8
    if remaining >= 4:
        h = _rotl(h ^ (le32(off) * _P1), 23) * _P2 + _P3
        off += 4
        remaining -= 4
    while remaining > 0:
        h = _rotl(h ^ (mat[:, off].astype(np.uint64) * _P5), 11) * _P1
        off += 1
        remaining -= 1
    return _fmix(h)


def spark_xxhash64_string_fixed(mat: np.ndarray, length: int) -> np.ndarray:
    """``xxhash64(s)`` for R strings whose UTF-8 byte rows are ``mat``
    (identical ``length``), as int64."""
    return hash_bytes_fixed(mat, length).view(np.int64)


def spark_xxhash64_long_int(h: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """``xxhash64(h, s)`` for LongType column ``h`` and IntegerType
    literal(s) ``s`` — Spark chains: hashInt(s, hashLong(h, 42)).
    Returns int64 of shape (len(seeds), len(h))."""
    g = hash_long(np.asarray(h), _SPARK_SEED)
    out = np.empty((len(seeds), len(g)), dtype=np.uint64)
    for j, s in enumerate(seeds):
        out[j] = hash_int(np.full(len(g), s, dtype=np.int64), g)
    return out.view(np.int64)
