"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested.  Decoding:

- **real decoders** (pure numpy + stdlib, no external libs): binary
  PPM (P6) images, PNG (stdlib zlib inflate + numpy unfilter, all five
  filter types, color types 0/2/3/4/6), and PCM WAV (RIFF,
  8/16/32-bit) audio.  These run on actual bytes end-to-end.
- JPEG/MP4 remain STUBBED: their codecs (DCT/entropy, H.26x) are not
  in this container and are not reasonably reimplementable here, so
  those either raise NotImplementedError (strict mode) or produce a
  deterministic fake derived from the bytes.  Swapping in Pillow/PyAV
  is a one-function change; nothing in the distribution shape moves.

Scale notes:
- media blobs ride in the `content` binary column; Arrow transfers
  them zero-copy per batch.  `media_repartition` bounds the bytes per
  task so a partition of 100 MB+ blobs cannot blow executor memory.
- feature extraction returns fixed-width arrays (embedding-like), so
  downstream joins/ANN reuse the similarity operators unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, content binary"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, sha256 string, features array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame_sha string"

AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, rms double, features array<float>"
)

STRICT = False  # set True to surface NotImplementedError instead of fakes


def decode_ppm(content: bytes) -> np.ndarray:
    """Real decode of a binary PPM (P6) image -> (h, w, 3) uint8.

    Pure numpy: parse the ASCII header (magic, dims, maxval, with
    comment lines allowed), then one frombuffer + reshape.
    """
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            pos = content.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(content) and not content[end : end + 1].isspace():
            end += 1
        fields.append(int(content[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    px = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def encode_ppm(px: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm` (fixture/test helper)."""
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """Real decode of a PCM RIFF/WAV blob -> (sample_rate, float64
    samples in [-1, 1], channel-averaged).  Pure numpy chunk walk;
    handles 8-bit unsigned, 16/32-bit signed PCM."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM supported, got format {audio_format}")
    if bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return sample_rate, x


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """16-bit mono PCM WAV encode (fixture/test helper)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1, 1)
    ints = np.round(pcm * 32767.0).astype("<i2")
    data = ints.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> np.ndarray:
    """Real decode of a PNG image -> (h, w, 3) uint8, zero new deps.

    PNG = zlib-compressed (stdlib) filtered scanlines; the per-row
    unfilter is numpy.  Supports the common web shapes: bit depth 8,
    color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA), non-interlaced.  Alpha is dropped and gray replicated so
    the featurizer always sees (h, w, 3).
    """
    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")

    import zlib

    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    lines = rows[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = filters[y]
        line = lines[y]
        if ft == 0:  # None
            cur = line.copy()
        elif ft == 2:  # Up
            cur = line + prev
        elif ft == 1:  # Sub — running sum per bpp lane (uint8 wraps)
            cur = np.add.accumulate(
                line.reshape(w, channels), axis=0, dtype=np.uint8
            ).reshape(stride)
        else:  # Average (3) / Paeth (4): left-neighbor recurrence
            cur = np.empty(stride, dtype=np.uint8)
            lp = line.reshape(w, channels)
            pp = prev.reshape(w, channels).astype(np.int64)
            cp = cur.reshape(w, channels)
            left = np.zeros(channels, dtype=np.int64)
            if ft == 3:
                for x in range(w):
                    left = (lp[x] + ((left + pp[x]) >> 1)).astype(np.uint8)
                    cp[x] = left
                    left = left.astype(np.int64)
            elif ft == 4:
                ul = np.zeros(channels, dtype=np.int64)
                for x in range(w):
                    up = pp[x]
                    p = left + up - ul
                    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                    )
                    px = (lp[x] + pred).astype(np.uint8)
                    cp[x] = px
                    left = px.astype(np.int64)
                    ul = up
            else:
                raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur
        prev = cur

    px = out.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[px[:, :, 0]]
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray+alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA->RGB


def encode_png(px: np.ndarray, filter_mix: bool = True) -> bytes:
    """PNG encode (fixture/test helper): 8-bit RGB, one zlib stream.
    ``filter_mix`` cycles through all five filter types row by row so
    the decoder's every unfilter branch is exercised by real bytes."""
    import zlib

    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(h, w * 3).astype(np.int64)
    scan = bytearray()
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        ft = (y % 5) if filter_mix else 0
        line = flat[y]
        if ft == 0:
            enc = line
        elif ft == 1:
            left = np.concatenate([np.zeros(3, dtype=np.int64), line[:-3]])
            enc = line - left
        elif ft == 2:
            enc = line - prev
        elif ft == 3:
            left = np.concatenate([np.zeros(3, dtype=np.int64), line[:-3]])
            enc = line - ((left + prev) >> 1)
        else:  # paeth
            left = np.concatenate([np.zeros(3, dtype=np.int64), line[:-3]])
            ul = np.concatenate([np.zeros(3, dtype=np.int64), prev[:-3]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = line - pred
        scan.append(ft)
        scan.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def _fake_pixels(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: pseudo-pixels seeded by the blob
    digest.  Stands in for Pillow/cv2 (not installed here)."""
    if STRICT:
        raise NotImplementedError("image decoding requires Pillow/cv2 (not in container)")
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """Decode dispatch: real paths for PPM (P6) and PNG blobs
    (:func:`decode_png`, stdlib zlib + numpy unfilter); only JPEG etc.
    still fall through to the stub (no codec libs in this container)."""
    if content.startswith(b"P6"):
        return decode_ppm(content)
    if content.startswith(_PNG_SIG):
        return decode_png(content)
    return _fake_pixels(content, width, height)


def decode_and_featurize_images(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """binary content -> fixed-width feature vector per image.

    mapInPandas: one Arrow batch in, one out; decode + channel-stat
    features are vectorized numpy per image.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                px = decode_image(content, int(row.width), int(row.height))
                # channel means/stds + downsampled grid -> fixed width
                feats = np.concatenate(
                    [
                        px.mean(axis=(0, 1)) / 255.0,
                        px.std(axis=(0, 1)) / 255.0,
                        np.resize(px.mean(axis=2), feature_dim - 6) / 255.0,
                    ]
                ).astype(np.float32)
                rows.append(
                    {
                        "media_id": row.media_id,
                        "width": int(row.width),
                        "height": int(row.height),
                        "sha256": hashlib.sha256(content).hexdigest(),
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "sha256", "features"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def decode_and_featurize_audio(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """binary WAV content -> (sample_rate, n_samples, rms, band
    features).  Real decode for PCM WAV; the band features are mean
    absolute amplitude over `n_bands` equal time slices — fixed width,
    vectorized numpy per blob inside mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                sr, x = decode_wav(bytes(row.content))
                n = len(x)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                pad = (-n) % n_bands
                bands = np.abs(
                    np.concatenate([x, np.zeros(pad)])
                ).reshape(n_bands, -1).mean(axis=1) if n else np.zeros(n_bands)
                rows.append(
                    {
                        "media_id": row.media_id,
                        "sample_rate": int(sr),
                        "n_samples": n,
                        "rms": rms,
                        "features": bands.astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "n_samples", "rms", "features"]
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled frame with a
    deterministic per-frame digest (the stub for actual PyAV frame
    extraction).  Row explosion happens executor-side in the UDF, so a
    long video never materializes as one driver row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if STRICT:
                    raise NotImplementedError("video decoding requires PyAV")
                content = bytes(row.content)
                duration = int(row.duration_ms or 0)
                for i, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    digest = hashlib.sha256(content + struct.pack("<I", i)).hexdigest()[:16]
                    rows.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": i,
                            "frame_ts_ms": ts,
                            "frame_sha": digest,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_sha"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def media_repartition(media: DataFrame, target_bytes_per_task: int = 128 << 20) -> DataFrame:
    """Size partitions by *bytes*, not rows: blobs are wildly variable.

    For file-backed inputs the total size comes from FILE METADATA
    (``inputFiles`` + FileSystem status — no data scan); only
    in-memory/synthesized frames fall back to a one-pass
    ``sum(length(content))``.  The earlier always-scan version was fine
    once but paid a full read of the blobs every time it was composed
    into a larger plan.
    """
    total = 0
    try:
        files = media.inputFiles()
    except Exception:
        files = []
    if files:
        jvm = media.sparkSession._jvm
        hconf = media.sparkSession._jsc.hadoopConfiguration()
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    else:
        total = (
            media.agg(F.sum(F.length("content")).alias("b")).collect()[0].b or 1
        )
    parts = max(1, int(total // target_bytes_per_task) + 1)
    return media.repartition(parts, "media_id")


def synthetic_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests (no external data): images
    are REAL binary PPM blobs, audio REAL 16-bit PCM WAV blobs (both
    decode through the real numpy paths); video stays opaque bytes for
    the stubbed frame sampler."""
    rows = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        kind = ["image", "video", "audio"][i % 3]
        w, h = (int(rng.integers(16, 64)), int(rng.integers(16, 64)))
        mime = {"video": "video/mp4", "audio": "audio/wav"}.get(kind)
        if kind == "image":
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            # alternate real PNG and real PPM blobs (mime matches bytes)
            if i % 2 == 0:
                content, mime = encode_png(px), "image/png"
            else:
                content, mime = encode_ppm(px), "image/x-portable-pixmap"
        elif kind == "audio":
            content = encode_wav(rng.uniform(-0.8, 0.8, size=int(rng.integers(256, 4096))))
        else:
            content = bytes(
                rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8)
            )
        rows.append(
            (
                i,
                kind,
                mime,
                w,
                h,
                int(rng.integers(1000, 10000)) if kind != "image" else 0,
                content,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
