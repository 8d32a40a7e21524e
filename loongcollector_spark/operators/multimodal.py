"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media are opaque ``binary`` payload columns plus a typed metadata struct —
the Spark-side schema, partitioning, Arrow batch shape, and UDF signatures are
real and tested. Container-header probing (PNG/GIF/JPEG/WAV/MP4), PNG pixel
decode (stdlib zlib) and WAV PCM sample decode (stdlib struct) are REAL;
only codec work that needs native libs (JPEG entropy decode, MP3/AAC,
video frame extract) is STUBBED with a clearly-marked deterministic fake.
Swapping in PIL/librosa/pyav changes ONLY the marked inner functions — the
distributed plumbing is identical.

Design rules for 100 TB:
* media rows flow through ``mapInPandas`` / ``mapInArrow`` so the binary
  payloads stay in Arrow buffers (no per-row Python object churn);
* features come back as fixed-width ``array<float>`` columns so downstream
  dedup/ANN reuse the embedding operators;
* ``media_repartition`` sizes partitions by BYTES (payloads are wildly
  skewed), not row counts — row-count partitioning is wrong for media.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes; sizes skewed)."""
    rows = []
    for i in range(n_rows):
        h = hashlib.sha256(f"{seed}-{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        size = 64 + (int.from_bytes(h[:2], "big") % 4000)
        payload = (h * ((size // len(h)) + 1))[:size]
        rows.append(
            (
                f"m-{i:08d}",
                kind,
                bytearray(payload),
                {
                    "mime": {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 640 if kind != "audio" else None,
                    "height": 480 if kind != "audio" else None,
                    "duration_ms": 5000 if kind != "image" else None,
                    "n_bytes": size,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- REAL container-header probe (pure stdlib — NOT a stub) -----------------

_JPEG_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def probe_media_bytes(b: bytes) -> dict:
    """Parse REAL media container headers with stdlib struct only:

    * PNG   — IHDR width/height (big-endian at offset 16)
    * GIF   — logical screen descriptor (little-endian at offset 6)
    * JPEG  — marker walk to the first SOFn frame header
    * WAV   — RIFF chunk walk: fmt (channels/rate/block-align) + data length
              → duration_ms
    * MP4   — ftyp brand detection (dimensions live in codec-specific boxes,
              left to the decode stub)

    Only the PIXEL/SAMPLE decode is stubbed in this module; byte-level
    container parsing is real and covered by a real-bytes contract test."""
    none = {"width": None, "height": None, "duration_ms": None}
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return {"mime": "image/png", "width": w, "height": h, "duration_ms": None}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"mime": "image/gif", "width": w, "height": h, "duration_ms": None}
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF_MARKERS and i + 9 <= len(b):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return {"mime": "image/jpeg", "width": w, "height": h, "duration_ms": None}
            i += 2 + seglen
        return {"mime": "image/jpeg", **none}
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i, sr, block_align, data_len = 12, None, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 22 <= len(b):
                sr = struct.unpack("<I", b[i + 12 : i + 16])[0]
                block_align = struct.unpack("<H", b[i + 20 : i + 22])[0]
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)
        dur = None
        if sr and block_align and data_len is not None:
            dur = int(round(data_len / (sr * block_align) * 1000))
        return {"mime": "audio/wav", "width": None, "height": None, "duration_ms": dur}
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return {"mime": "video/mp4", **none}
    return {"mime": "application/octet-stream", **none}


_MIME_KIND = {"image": "image", "audio": "audio", "video": "video"}


def media_probe(df: DataFrame) -> DataFrame:
    """Fill ``kind`` and the meta struct from the ACTUAL payload bytes (the
    real header parse above) via mapInPandas — the ingest step that turns an
    opaque binary column into a typed media table."""

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, kinds = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                m = probe_media_bytes(raw)
                m["n_bytes"] = len(raw)
                metas.append(m)
                kinds.append(_MIME_KIND.get(m["mime"].split("/")[0], "binary"))
            out = pdf.copy()
            out["kind"] = kinds
            out["meta"] = metas
            yield out

    return df.mapInPandas(_proc, MEDIA_SCHEMA)


# --- codecs: real PNG decode; other formats stubbed -------------------------

def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9, filters 0-4). None/Sub/Up are
    vectorized (Sub is a mod-256 cumsum over the pixel axis); Average/Paeth
    carry a within-row data dependency and loop per pixel — fine at test
    sizes, and real 100 TB pipelines decode via PIL/libpng anyway (this
    stdlib path exists so the container has ZERO native-lib dependencies)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    row_len = stride + 1
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(raw[y * row_len + 1 : (y + 1) * row_len], dtype=np.uint8)
        ftype = raw[y * row_len]
        if ftype == 0:  # None
            cur = row.copy()
        elif ftype == 1:  # Sub
            px = row.reshape(-1, bpp).astype(np.uint64)
            cur = (np.cumsum(px, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            cur = row + prev
        elif ftype == 3:  # Average
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out


def _decode_png(payload: bytes) -> "np.ndarray | None":
    """REAL PNG pixel decode with stdlib zlib + the unfilter above → H×W×3
    RGB uint8. Supports bit depth 8, color types 0/2/3/4/6, non-interlaced
    (the overwhelming majority of real PNGs); returns None otherwise so the
    caller can fall back."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + crc
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        return None
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        return None
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color == 3:  # palette lookup
        if plte is None:
            return None
        return plte[px[:, :, 0]]
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA→RGB


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """PNG payloads decode for REAL (stdlib zlib, see _decode_png — verified
    against known pixel values in the contract test). Other formats (JPEG
    entropy decode needs libjpeg): deterministic fake 8×8×3 derived from the
    payload digest, clearly labeled."""
    arr = _decode_png(payload)
    if arr is not None:
        return arr
    d = hashlib.sha256(payload).digest()
    arr = np.frombuffer((d * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3)


def _decode_wav(payload: bytes) -> "np.ndarray | None":
    """REAL WAV PCM decode, stdlib struct only: RIFF chunk walk → fmt + data,
    8-bit unsigned / 16-bit / 32-bit signed PCM and 32-bit IEEE float →
    mono-mixed float32 in [-1, 1]. Returns None for non-WAV or compressed
    codecs (ADPCM/MP3-in-WAV need real codec libs) so the caller falls back."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])  # tag, ch, sr, Bps, align, bits
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        return None
    tag, n_ch, _sr, _bps, _align, bits = fmt
    if n_ch < 1:
        return None
    if tag == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif tag == 1 and bits == 16:
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.float32) / 32768.0
    elif tag == 1 and bits == 32:
        x = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4").astype(np.float32) / 2147483648.0
    elif tag == 3 and bits == 32:
        x = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4").astype(np.float32)
    else:
        return None
    n_frames = x.size // n_ch
    return x[: n_frames * n_ch].reshape(n_frames, n_ch).mean(axis=1).astype(np.float32)


def _decode_audio_stub(payload: bytes, sr: int = 16000) -> np.ndarray:
    """WAV PCM payloads decode for REAL (stdlib struct, see _decode_wav —
    verified against known sample values in the contract test). Compressed
    formats (MP3/AAC/OGG need codec libs): deterministic fake 10ms clip
    derived from the payload digest, clearly labeled."""
    samples = _decode_wav(payload)
    if samples is not None:
        return samples
    d = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(struct.unpack("<Q", d[:8])[0])
    return rng.standard_normal(sr // 100).astype(np.float32)  # 10ms clip


def _sample_video_frames_stub(payload: bytes, n_frames: int) -> list[np.ndarray]:
    """STUB: real impl = pyav keyframe iteration. Fake: n deterministic
    pseudo-frames."""
    return [_decode_image_stub(payload + bytes([i])) for i in range(n_frames)]


FEATURE_DIM = 16


def _feature_from_array(arr: np.ndarray) -> np.ndarray:
    """Tiny deterministic 'embedding': moments + histogram (stands in for a
    real vision/audio encoder; fixed FEATURE_DIM output)."""
    flat = arr.astype(np.float64).ravel()
    hist, _ = np.histogram(flat, bins=FEATURE_DIM - 2, range=(flat.min(), flat.max() + 1e-9))
    v = np.concatenate([[flat.mean(), flat.std()], hist / max(1, flat.size)])
    return v.astype(np.float32)


# --- distributed operators --------------------------------------------------

def media_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """payload → FEATURE_DIM float feature vector via mapInPandas.

    Output schema: (media_id, kind, feature array<float>, n_bytes long).
    The iterator-of-batches form keeps peak memory at one Arrow batch of
    payloads per worker."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                if kind == "image":
                    arr = _decode_image_stub(raw)
                elif kind == "audio":
                    arr = _decode_audio_stub(raw)
                else:
                    arr = np.stack(_sample_video_frames_stub(raw, 3))
                feats.append(_feature_from_array(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(_proc, out_schema)


def image_resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: payload → resized payload. STUB resize = sha-derived
    bytes of the target size (real impl: PIL resize + re-encode); schema and
    batching are the production shape."""
    out_schema = df.schema

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _rz(p: bytes) -> bytes:
                d = hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
                n = max(64, width * height // 128)
                return (d * ((n // len(d)) + 1))[:n]

            pdf = pdf.copy()
            mask = pdf["kind"] == "image"
            pdf.loc[mask, "payload"] = pdf.loc[mask, "payload"].map(_rz)
            yield pdf

    return df.mapInPandas(_proc, out_schema)


def media_repartition(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Byte-aware repartition: partitions sized by payload BYTES, not rows.
    Uses the total/target ratio for the partition count with a uniform hash
    key on media_id — expected bytes per task ≈ target regardless of the
    (wildly skewed) per-row payload sizes; a single payload larger than the
    target is an indivisible row and bounds the tail either way."""
    total = df.agg(F.sum(F.length("payload"))).collect()[0][0] or 0
    nparts = max(1, int(total / target_bytes))
    return df.repartition(nparts, F.xxhash64("media_id"))
