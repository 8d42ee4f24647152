"""JPEG (JFIF) codec in pure numpy + stdlib: baseline + progressive.

Closes the long-standing "JPEG is stubbed" gap in
:mod:`multimodal` (rounds 2-5: no Pillow/cv2 in this container, so
JPEG blobs fell through to the deterministic fake).  JPEG DCT coding
is a fully published format (ITU-T T.81 / ISO 10918-1): marker
segments, canonical Huffman tables, zigzag'd 8x8 quantized DCT
blocks, interleaved MCUs with chroma subsampling, optional restart
markers.  All of that is implemented here directly.

Decoder (:func:`decode_jpeg`) supports: baseline DCT (SOF0/SOF1) and
— since r7 — progressive DCT (SOF2: spectral selection, successive
approximation DC/AC refinement scans, end-of-band run coding,
per-scan restart intervals).  8-bit precision, 1- or 3-component
scans, arbitrary H/V sampling factors (4:4:4, 4:2:0, 4:2:2, ...),
multiple DQT/DHT segments, 16-bit quantizer entries, restart markers
(DRI/RSTn), 0xFF00 byte stuffing, fill bytes.  Arithmetic coding,
lossless and hierarchical processes raise ``NotImplementedError`` —
those remain honestly out of scope.

Encoder (:func:`encode_jpeg`) produces baseline JFIF with the Annex-K
example tables (scaled by a quality knob the same way libjpeg scales
them), 4:4:4 or 4:2:0 subsampling, optional restart intervals, and —
with ``progressive=True`` — an SOF2 multi-scan stream carrying the
SAME quantized coefficients (shared :func:`_prepare_components`
front half), so decoding either encoding of one input is
pixel-identical: the progressive decoder's correctness oracle.  It
exists so the decoder can be exercised against self-produced
fixtures AND against hand-computed expectations (a DC-only block's
decoded value is computable by hand: pixel = F00/8 + 128 for an
all-ones quantizer).

Scale/perf note: this is a per-blob decode that runs inside the same
``mapInPandas`` batches as the PNG/GIF paths — embarrassingly
parallel, no shuffle.  The Huffman stage is a Python bit loop
(~hundreds of KB/s per core): fine for the plumbing tests and small
assets this repo processes; a production deployment would swap
Pillow/libjpeg-turbo into :func:`multimodal.decode_image`'s dispatch
without moving any distribution shape.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- shared

#: zigzag index of each (row-major) coefficient position: ZIGZAG[k] is
#: the row-major index of the k-th coefficient in zigzag order.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

def _dct_matrix() -> np.ndarray:
    # A[u, x] = 0.5 * C(u) * cos((2x+1) u pi / 16), C(0) = 1/sqrt(2)
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a

_A = _dct_matrix()          # forward:  F = A f A^T
_AT = _A.T                  # inverse:  f = A^T F A

#: Annex K (ITU-T T.81, tables K.1/K.2) example quantizers, row-major.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K example Huffman specs: (BITS counts per length 1..16, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """(length, code) -> symbol lookup built from BITS/VALS."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers are consumed by :meth:`restart`."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy stream ended early")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: dangling 0xFF at end of stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: T.81 pads the prior
                # interval with 1-bits; feed 1s until restart() is called
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
            else:
                # EOI or next segment: pad with 1-bits
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, huff: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = huff.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG: huffman code longer than 16 bits")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while True:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: expected restart marker")
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                break
            self.pos += 1
        self.pos += 2


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JFIF blob
    to uint8 pixels: (H, W, 3) RGB for 3-component images, (H, W) for
    grayscale.  Raises ``NotImplementedError`` for
    arithmetic-coded/lossless/hierarchical streams and ``ValueError``
    for malformed ones."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (H, W, [(cid, h, v, tq)])
    progressive = False
    saw_scan = False
    coefs: dict[int, np.ndarray] = {}  # cid -> (by, bx, 64) zigzag coefs
    n = len(content)
    while pos < n:
        if pos + 1 >= n:
            raise ValueError("truncated JPEG: marker stream ended early")
        if content[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > n:
            raise ValueError("truncated JPEG: segment length cut off")
        (seglen,) = struct.unpack(">H", content[pos:pos + 2])
        seg = content[pos + 2:pos + seglen]
        end_of_segment = pos + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                quant[tq] = vals  # stored in ZIGZAG order
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            if marker == 0xC2:
                progressive = True
                hmax = max(ch for _, ch, _, _ in comps)
                vmax = max(cv for _, _, cv, _ in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                for cid, ch, cv, _tq in comps:
                    coefs[cid] = np.zeros(
                        (mcus_y * cv, mcus_x * ch, 64), dtype=np.int64
                    )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            if not progressive:
                return _decode_scan(
                    content, end_of_segment, frame, scan, quant,
                    huff_dc, huff_ac, restart_interval,
                )
            ss, se, ahl = seg[1 + 2 * ns:4 + 2 * ns]
            pos = _decode_progressive_scan(
                content, end_of_segment, frame, scan, coefs,
                huff_dc, huff_ac, restart_interval,
                ss, se, ahl >> 4, ahl & 0xF,
            )
            saw_scan = True
            continue
        pos = end_of_segment
    if progressive:
        if not saw_scan:
            raise ValueError("progressive JPEG without scans")
        return _finish_progressive(frame, coefs, quant)
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval):
    height, width, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = {}
    for cid, h, v, tq in comps:
        planes[cid] = np.zeros((mcus_y * v * 8, mcus_x * h * 8), dtype=np.float64)
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan:
                h, v, tq = by_id[cid]
                q = quant[tq]
                for bv in range(v):
                    for bh in range(h):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(huff_dc[td])
                        diff = _extend(reader.receive(s), s)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[ta])
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.receive(sz), sz)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = (zz * q).astype(np.float64)
                        block = block.reshape(8, 8)
                        px = _AT @ block @ _A + 128.0
                        y0 = (my * v + bv) * 8
                        x0 = (mx * h + bh) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and crop
    out_planes = []
    for cid, h, v, tq in comps:
        p = planes[cid]
        if h != hmax or v != vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        out_planes.append(p[:height, :width])
    return _planes_to_pixels(out_planes)


def _planes_to_pixels(out_planes: list[np.ndarray]) -> np.ndarray:
    """Full-resolution component planes -> uint8 pixels (shared by the
    baseline and progressive finish paths so both produce bit-identical
    output from identical coefficients)."""
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------- progressive decode (SOF2)
#
# T.81 Annex G: the frame's DCT coefficients accumulate across many
# scans — DC first/refinement (spectral band 0, successive
# approximation Ah/Al) and per-component AC first/refinement scans
# (band Ss..Se) with shared end-of-band (EOBn) run coding.  Decoding
# keeps one int64 zigzag coefficient array per component and applies
# each scan in place; dequantization + IDCT happen once at EOI.


def _comp_block_dims(frame, cid: int) -> tuple[int, int]:
    """Non-interleaved block grid of one component: the blocks needed
    to cover ceil(W*h/hmax) x ceil(H*v/vmax) samples (T.81 A.2.2) —
    SMALLER than the MCU-padded grid used by interleaved scans."""
    height, width, comps = frame
    by_id = {c: (h, v) for c, h, v, _tq in comps}
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    h, v = by_id[cid]
    cw = -(-width * h // hmax)
    ch = -(-height * v // vmax)
    return -(-ch // 8), -(-cw // 8)


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past any remaining entropy bytes / RSTn markers to the
    next true marker boundary (the 0xFF of the next segment)."""
    n = len(data)
    p = pos
    while p + 1 < n:
        if data[p] == 0xFF:
            nxt = data[p + 1]
            if nxt == 0x00:  # stuffed data byte
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker inside this scan
                p += 2
                continue
            if nxt == 0xFF:  # fill byte
                p += 1
                continue
            return p
        p += 1
    raise ValueError("truncated JPEG: no marker after scan data")


def _dc_scan_progressive(reader, frame, scan, coefs, huff_dc, ri, ah, al):
    height, width, comps = frame
    by_id = {cid: (h, v) for cid, h, v, _tq in comps}
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)

    def one_block(blk, td, pred, cid):
        if ah == 0:
            s = reader.decode_symbol(huff_dc[td])
            diff = _extend(reader.receive(s), s)
            pred[cid] += diff
            blk[0] = pred[cid] << al
        elif reader.read_bit():
            blk[0] |= 1 << al

    pred = {cid: 0 for cid, _, _ in scan}
    cnt = 0
    if len(scan) > 1:  # interleaved MCU order over the full padded grid
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if ri and cnt and cnt % ri == 0:
                    reader.restart()
                    pred = {cid: 0 for cid in pred}
                for cid, td, _ta in scan:
                    h, v = by_id[cid]
                    for bv in range(v):
                        for bh in range(h):
                            one_block(coefs[cid][my * v + bv, mx * h + bh], td, pred, cid)
                cnt += 1
    else:  # single component: raster over its own (unpadded) grid
        cid, td, _ta = scan[0]
        by, bx = _comp_block_dims(frame, cid)
        for yb in range(by):
            for xb in range(bx):
                if ri and cnt and cnt % ri == 0:
                    reader.restart()
                    pred = {cid: 0}
                one_block(coefs[cid][yb, xb], td, pred, cid)
                cnt += 1


def _ac_first_block(blk, reader, huff, ss, se, al, eobrun):
    """First AC pass for one block (T.81 G.2.2): returns the updated
    pending end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(huff)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run past end of band")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(blk, reader, huff, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (T.81
    G.2.2 / the classic jdphuff structure): zero-history runs select
    where new +-1<<Al coefficients land; every nonzero-history
    coefficient passed on the way reads one correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(huff)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:  # EOBn: the FULL run, including this
                    # block's tail — the correction-bits branch below
                    # consumes the current block and decrements
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid magnitude in AC refinement scan")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        # inside an end-of-band run: correction bits only
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    data, pos, frame, scan, coefs, huff_dc, huff_ac,
    restart_interval, ss, se, ah, al,
):
    """Apply one progressive scan to the coefficient arrays; returns
    the byte offset of the next marker."""
    reader = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        _dc_scan_progressive(
            reader, frame, scan, coefs, huff_dc, restart_interval, ah, al
        )
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cid, _td, ta = scan[0]
        by, bx = _comp_block_dims(frame, cid)
        huff = huff_ac.get(ta)
        if huff is None:
            raise ValueError(f"missing AC huffman table {ta}")
        eobrun = 0
        cnt = 0
        for yb in range(by):
            for xb in range(bx):
                if restart_interval and cnt and cnt % restart_interval == 0:
                    reader.restart()
                    eobrun = 0
                blk = coefs[cid][yb, xb]
                if ah == 0:
                    eobrun = _ac_first_block(blk, reader, huff, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(blk, reader, huff, ss, se, al, eobrun)
                cnt += 1
    return _skip_to_marker(data, reader.pos)


def _finish_progressive(frame, coefs, quant):
    """Dequantize + IDCT the accumulated coefficients (same per-block
    math as the baseline path) and assemble pixels."""
    height, width, comps = frame
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    out_planes = []
    for cid, h, v, tq in comps:
        if tq not in quant:
            raise ValueError(f"missing quantization table {tq}")
        q = quant[tq]
        arr = coefs[cid]
        by, bx, _ = arr.shape
        plane = np.zeros((by * 8, bx * 8), dtype=np.float64)
        for yb in range(by):
            for xb in range(bx):
                block = np.zeros(64, dtype=np.float64)
                block[ZIGZAG] = (arr[yb, xb] * q).astype(np.float64)
                block = block.reshape(8, 8)
                plane[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] = _AT @ block @ _A + 128.0
        if h != hmax or v != vmax:
            plane = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        out_planes.append(plane[:height, :width])
    return _planes_to_pixels(out_planes)


# ---------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1-bits


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex-K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) for a DC diff / AC value per T.81 F.1.2."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _prepare_components(px, quality, subsampling):
    """Color-convert, subsample, MCU-pad and quantize: returns
    ``(gray, h, w, samp, qtabs, qy, qc, mcus_y, mcus_x, coefs)`` where
    ``coefs[ci]`` is the (mcus_y*v, mcus_x*h, 64) int64 array of
    ZIGZAG-ordered quantized DCT coefficients — the shared front half
    of both the baseline and progressive encoders, guaranteeing the
    two emit the SAME coefficients (the pixel-exactness test's
    foundation)."""
    px = np.asarray(px)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    sh, sv = (1, 1) if gray else subsampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("subsampling factors must be 1 or 2")
    qy = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        qtabs = [0]
    else:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if (sh, sv) != (1, 1):
            pad_h = (-h) % sv
            pad_w = (-w) % sh
            def sub(p):
                p = np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge")
                return p.reshape(p.shape[0] // sv, sv, p.shape[1] // sh, sh).mean(axis=(1, 3))
            cb, cr = sub(cb), sub(cr)
        planes = [y, cb, cr]
        samp = [(sh, sv), (1, 1), (1, 1)]
        qtabs = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qz = [qy.reshape(8, 8), qc.reshape(8, 8)]  # row-major divisor tables
    coefs = []
    for ci, (p, (ch, cv)) in enumerate(zip(planes, samp)):
        th, tw = mcus_y * cv * 8, mcus_x * ch * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        dct_q = qz[qtabs[ci]]
        arr = np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)
        for yb in range(mcus_y * cv):
            for xb in range(mcus_x * ch):
                block = p[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] - 128.0
                coef = _A @ block @ _AT
                qd = np.round(coef / dct_q).astype(np.int64)
                arr[yb, xb] = qd.reshape(-1)[ZIGZAG]
        coefs.append(arr)
    return gray, h, w, samp, qtabs, qy, qc, mcus_y, mcus_x, coefs


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """JFIF encoder (Annex-K tables scaled by ``quality``).

    ``px``: (H, W, 3) uint8 RGB or (H, W) grayscale.  ``subsampling``
    (1, 1) = 4:4:4, (2, 2) = 4:2:0 (chroma averaged 2x2).
    ``progressive=True`` emits the same quantized coefficients as an
    SOF2 multi-scan stream (DC first -> per-component spectral AC
    bands -> DC/AC successive-approximation refinements), so a decode
    of both encodings of the same input is pixel-identical.  Exists so
    :func:`decode_jpeg` has real in-repo fixtures; also a legitimate
    sink for the multimodal pipeline's resize outputs."""
    (gray, h, w, samp, qtabs, qy, qc,
     mcus_y, mcus_x, coefs) = _prepare_components(px, quality, subsampling)
    if progressive:
        return _assemble_progressive(
            gray, h, w, samp, qtabs, qy, qc, mcus_y, mcus_x, coefs,
            restart_interval,
        )
    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0] * len(coefs)
    mcu_count = 0
    n_restarts = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (n_restarts % 8)])
                n_restarts += 1
                pred = [0] * len(coefs)
            for ci, (ch, cv) in enumerate(samp):
                tabi = 0 if ci == 0 else 1
                dcc, acc = dc_codes[tabi], ac_codes[tabi]
                for bv in range(cv):
                    for bh in range(ch):
                        zz = coefs[ci][my * cv + bv, mx * ch + bh]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s, bits = _magnitude(diff)
                        code, ln = dcc[s]
                        bw.write(code, ln)
                        if s:
                            bw.write(bits, s)
                        nz = np.nonzero(zz[1:])[0]
                        k = 1
                        for idx in nz:
                            j = int(idx) + 1
                            run = j - k
                            while run > 15:
                                code, ln = acc[0xF0]
                                bw.write(code, ln)
                                run -= 16
                            s, bits = _magnitude(int(zz[j]))
                            code, ln = acc[(run << 4) | s]
                            bw.write(code, ln)
                            bw.write(bits, s)
                            k = j + 1
                        if k < 64:
                            code, ln = acc[0x00]  # EOB
                            bw.write(code, ln)
            mcu_count += 1
    bw.flush()

    # ---- assemble segments
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT payloads are in ZIGZAG order (T.81 B.2.4.1)
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qy[ZIGZAG]))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(int(v) for v in qc[ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        ch, cv = samp[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, qtabs[ci]])
    out += seg(0xC0, bytes(sof))
    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        tabi = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tabi << 4) | tabi])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------- progressive encode (SOF2)

#: AC Huffman table for progressive scans: the Annex-K AC tables lack
#: the EOBn symbols (0x10..0xE0) that end-of-band run coding needs, so
#: progressive streams carry this custom table — every symbol we can
#: emit (EOB0..EOB14, ZRL, and (run, size) for run 0..15 / size 1..10)
#: as a flat 9-bit canonical code.  176/512 leaves the all-ones code
#: unused (T.81 forbids it) and keeps the encoder trivially correct;
#: compactness is not the fixture encoder's job.
PROG_AC_VALS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
PROG_AC_BITS = [0] * 16
PROG_AC_BITS[8] = len(PROG_AC_VALS)  # all codes 9 bits long


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.2): divide by 2^Al truncating
    toward zero (arithmetic shift of the magnitude)."""
    return -((-v) >> al) if v < 0 else v >> al


def _emit_eobrun(bw: _BitWriter, ac, eobrun: int, be_bits: list[int]) -> None:
    """EOBn symbol (+ extra run bits) followed by the correction bits
    buffered while the run grew (refinement scans only)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(eobrun - (1 << nbits), nbits)
    for b in be_bits:
        bw.write(b, 1)


def _encode_dc_scan(coefs, samp, dc_codes, mcus_y, mcus_x, ah, al, ri):
    """Progressive DC scan, interleaved over all components: first pass
    (Ah=0) codes diffs of dc >> Al; refinement passes emit the single
    next bit per block."""
    bw = _BitWriter()
    pred = [0] * len(coefs)
    cnt = 0
    nrst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and cnt and cnt % ri == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (nrst % 8)])
                nrst += 1
                pred = [0] * len(coefs)
            for ci, (ch, cv) in enumerate(samp):
                dcc = dc_codes[0 if ci == 0 else 1]
                for bv in range(cv):
                    for bh in range(ch):
                        dc = int(coefs[ci][my * cv + bv, mx * ch + bh, 0])
                        if ah == 0:
                            v = dc >> al  # arithmetic shift (G.1.2.1)
                            diff = v - pred[ci]
                            pred[ci] = v
                            s, bits = _magnitude(diff)
                            code, ln = dcc[s]
                            bw.write(code, ln)
                            if s:
                                bw.write(bits, s)
                        else:
                            bw.write((dc >> al) & 1, 1)
            cnt += 1
    bw.flush()
    return bw.out


def _encode_ac_first_scan(arr, blocks_y, blocks_x, ac, ss, se, al, ri):
    """First AC pass over one component's band: baseline-style
    run/size coding plus cross-block end-of-band runs."""
    bw = _BitWriter()
    eobrun = 0
    cnt = 0
    nrst = 0

    def flush():
        nonlocal eobrun
        _emit_eobrun(bw, ac, eobrun, [])
        eobrun = 0

    for yb in range(blocks_y):
        for xb in range(blocks_x):
            if ri and cnt and cnt % ri == 0:
                flush()
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (nrst % 8)])
                nrst += 1
            band = [_pt_ac(int(v), al) for v in arr[yb, xb, ss:se + 1]]
            nz = [i for i, v in enumerate(band) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
            else:
                flush()
                k = 0
                for j in nz:
                    run = j - k
                    while run > 15:
                        code, ln = ac[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s, bits = _magnitude(band[j])
                    code, ln = ac[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(bits, s)
                    k = j + 1
                if k <= se - ss:  # trailing zeros: EOB joins the run
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush()
            cnt += 1
    flush()
    bw.flush()
    return bw.out


def _encode_ac_refine_scan(arr, blocks_y, blocks_x, ac, ss, se, al, ri):
    """AC successive-approximation refinement pass (the classic
    jcphuff structure, re-derived from T.81 G.1.2.3): newly-significant
    coefficients are coded as (zero-history run, 1) + sign; coefficients
    already significant contribute one buffered correction bit each;
    all-insignificant tails fold into end-of-band runs whose buffered
    correction bits follow the EOBn symbol."""
    bw = _BitWriter()
    eobrun = 0
    be_bits: list[int] = []
    cnt = 0
    nrst = 0

    def flush():
        nonlocal eobrun, be_bits
        _emit_eobrun(bw, ac, eobrun, be_bits)
        eobrun = 0
        be_bits = []

    for yb in range(blocks_y):
        for xb in range(blocks_x):
            if ri and cnt and cnt % ri == 0:
                flush()
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (nrst % 8)])
                nrst += 1
            vals = [int(v) for v in arr[yb, xb, ss:se + 1]]
            absv = [abs(v) >> al for v in vals]
            eob = -1
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i
            r = 0
            br: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    flush()
                    code, ln = ac[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for b in br:
                        bw.write(b, 1)
                    br = []
                if t > 1:  # already significant: correction bit
                    br.append(t & 1)
                    continue
                flush()  # newly significant at zero-history run r
                code, ln = ac[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(0 if vals[i] < 0 else 1, 1)
                for b in br:
                    bw.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:  # rest of band folds into the EOB run
                eobrun += 1
                be_bits.extend(br)
                if eobrun == 0x7FFF:
                    flush()
            cnt += 1
    flush()
    bw.flush()
    return bw.out


def _assemble_progressive(
    gray, h, w, samp, qtabs, qy, qc, mcus_y, mcus_x, coefs, restart_interval
):
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    ncomp = 1 if gray else 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qy[ZIGZAG]))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(int(v) for v in qc[ZIGZAG]))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        ch, cv = samp[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, qtabs[ci]])
    out += seg(0xC2, bytes(sof))  # SOF2: progressive DCT
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(1, 0, PROG_AC_BITS, PROG_AC_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)

    def sos(comps_spec, ss, se, ah, al):
        body = bytearray([len(comps_spec)])
        for cid, td, ta in comps_spec:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(body))

    def block_dims(ci):
        ch, cv = samp[ci]
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        return -(-chh // 8), -(-cw // 8)

    ri = restart_interval
    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]
    # scan script: DC first (Al=1) -> spectral AC bands (Al=1, luma
    # split 1-5 / 6-63) -> DC refinement -> full-band AC refinements
    out += sos(all_comps, 0, 0, 0, 1)
    out += _encode_dc_scan(coefs, samp, dc_codes, mcus_y, mcus_x, 0, 1, ri)
    bands = [(0, 1, 5), (0, 6, 63)] + [(ci, 1, 63) for ci in range(1, ncomp)]
    for ci, ss_, se_ in bands:
        by, bx = block_dims(ci)
        out += sos([(ci + 1, 0, 0)], ss_, se_, 0, 1)
        out += _encode_ac_first_scan(coefs[ci], by, bx, ac, ss_, se_, 1, ri)
    out += sos(all_comps, 0, 0, 1, 0)
    out += _encode_dc_scan(coefs, samp, dc_codes, mcus_y, mcus_x, 1, 0, ri)
    for ci in range(ncomp):
        by, bx = block_dims(ci)
        out += sos([(ci + 1, 0, 0)], 1, 63, 1, 0)
        out += _encode_ac_refine_scan(coefs[ci], by, bx, ac, 1, 63, 0, ri)
    out += b"\xff\xd9"
    return bytes(out)
