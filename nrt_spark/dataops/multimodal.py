"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Real decode is implemented in pure numpy for the UNCOMPRESSED container
formats (they are header + raw array, zero external deps):

- **BMP** (Windows V3 ``BITMAPINFOHEADER``, 24-bit ``BI_RGB``,
  bottom-up or top-down) — https://en.wikipedia.org/wiki/BMP_file_format
- **PPM** (binary ``P6``, maxval <= 255) — the netpbm family
- **WAV** (RIFF/WAVE, PCM 8- or 16-bit, any channel count, mono-mixed)

Compressed formats (JPEG/PNG/MP3/...) still need codec libraries that
are not in this container: :func:`media_features` raises a loud
``ValueError`` naming the sniffed magic, and ``decode_features(...,
fake=True)`` keeps the deterministic sha256 stand-in for plumbing-only
tests.  Features are deliberately simple deterministic signals — mean
luma per segment for images, per-segment RMS for audio — so the duckdb
twin (:func:`nrt_spark.oracle.multimodal_features_oracle`) can recompute
them with the very same functions and certify the DISTRIBUTED decode
(Arrow batching, byte handling, schema) bit-for-bit.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType()),       # image|audio|video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]), True),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


# ---------------------------------------------------------------------------
# pure-numpy codecs (uncompressed formats only)
# ---------------------------------------------------------------------------

def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError(f"PPM needs 3 channels, got {c}")
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8.  Handles whitespace and
    ``#`` comments in the header per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (missing P6 magic)")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":              # comment to EOL
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                # single whitespace after maxval
    w, h, maxval = fields
    if not (0 < maxval <= 255):
        raise ValueError(f"PPM maxval {maxval} unsupported (1 byte/sample)")
    need = w * h * 3
    raw = payload[pos:pos + need]
    if len(raw) != need:
        raise ValueError(f"PPM truncated: need {need} bytes, got {len(raw)}")
    return np.frombuffer(raw, np.uint8).reshape(h, w, 3)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> 24-bit BI_RGB BMP (bottom-up, 4-byte row pad)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError(f"BMP needs 3 channels, got {c}")
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    img[:, :w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (h, w, 3) uint8 (bottom-up or top-down)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} unsupported (< V3)")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB BMPs decode without codec libs "
            f"(got bpp={bpp}, compression={compression})")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raw = payload[offset:offset + need]
    if len(raw) != need:
        raise ValueError(f"BMP truncated: need {need} bytes, got {len(raw)}")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)[:, :w * 3]
    rgb = rows.reshape(h, w, 3)[:, :, ::-1]            # BGR -> RGB
    return rgb if top_down else rgb[::-1]


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """RIFF/WAVE PCM -> (mono float64 samples in [-1, 1], sample_rate).
    8-bit (unsigned) and 16-bit (signed LE) PCM; channels mono-mixed."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], \
            struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)                   # chunks are padded
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(
            f"only 8/16-bit PCM WAVs decode without codec libs "
            f"(got format={audio_format}, bits={bits})")
    if bits == 16:
        x = np.frombuffer(data[:len(data) // 2 * 2], "<i2") / 32768.0
    else:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128) / 128.0
    if channels > 1:
        x = x[:len(x) // channels * channels] \
            .reshape(-1, channels).mean(axis=1)
    return np.asarray(x, dtype=np.float64), int(rate)


def sniff_media(payload: bytes) -> str:
    """'bmp' | 'ppm' | 'wav' | hex of the unknown magic."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return payload[:4].hex()


# ---------------------------------------------------------------------------
# features (deterministic, twin-recomputable)
# ---------------------------------------------------------------------------

def _segment_stat(x: np.ndarray, dim: int, rms: bool) -> np.ndarray:
    """``dim`` per-segment means (or RMS) over x, empty segments -> 0.
    Both the Spark UDF and the duckdb twin call THIS function, so fold
    order is identical by construction — no cross-engine float drift."""
    out = np.zeros(dim)
    bounds = (np.arange(dim + 1) * len(x)) // dim
    for i in range(dim):
        seg = x[bounds[i]:bounds[i + 1]]
        if len(seg):
            out[i] = np.sqrt(np.mean(seg * seg)) if rms else np.mean(seg)
    return out


def image_features(rgb: np.ndarray, dim: int) -> np.ndarray:
    """Mean Rec.601 luma (in [0, 1]) per segment of the row-major
    flattened image — a crude but deterministic content signal."""
    f = rgb.astype(np.float64)
    luma = (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
            + 0.114 * f[:, :, 2]).ravel() / 255.0
    return _segment_stat(luma, dim, rms=False)


def audio_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Per-segment RMS energy over the mono signal."""
    return _segment_stat(np.asarray(samples, dtype=np.float64), dim,
                         rms=True)


def media_features(payload: bytes, dim: int) -> np.ndarray:
    """Sniff + decode + featurize one payload (the per-row kernel the
    Arrow batches call).  Raises ``ValueError`` naming the magic for
    formats that need codec libraries."""
    kind = sniff_media(payload)
    if kind == "bmp":
        return image_features(decode_bmp(payload), dim)
    if kind == "ppm":
        return image_features(decode_ppm(payload), dim)
    if kind == "wav":
        return audio_features(decode_wav(payload)[0], dim)
    raise ValueError(
        f"unsupported media magic 0x{kind}: only uncompressed BMP/PPM/WAV "
        f"decode without codec libraries (JPEG/PNG/MP3 need libs not in "
        f"this container)")


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for plumbing tests: treat document text bytes as an
    opaque payload with synthetic metadata (NOT a decodable format —
    pair with ``decode_features(..., fake=True)``)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def _hash_stream(key: str, n: int) -> np.ndarray:
    """n deterministic pseudo-random bytes: sha256(key|counter) blocks."""
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.sha256(f"{key}|{c}".encode()).digest()
        c += 1
    return np.frombuffer(bytes(out[:n]), np.uint8).copy()


#: synthetic media geometry (small on purpose: the certification target
#: is the decode path, not pixel volume)
SYNTH_W, SYNTH_H, SYNTH_SAMPLES, SYNTH_RATE = 8, 6, 64, 8000


def synth_media_payload(media_id: str, kind: str) -> bytes:
    """Deterministic REAL media bytes for ``media_id``: a BMP or PPM
    image with sha256-stream pixels, or a PCM16 WAV with sha256-stream
    samples.  Pure function of (media_id, kind) — any process (the
    Spark executors, the duckdb twin, a test) regenerates identical
    payloads."""
    stream = _hash_stream(f"media|{media_id}|{kind}",
                          max(SYNTH_W * SYNTH_H * 3, SYNTH_SAMPLES * 2))
    if kind in ("bmp", "ppm"):
        rgb = stream[:SYNTH_W * SYNTH_H * 3].reshape(SYNTH_H, SYNTH_W, 3)
        return encode_bmp(rgb) if kind == "bmp" else encode_ppm(rgb)
    if kind == "wav":
        samples = stream[:SYNTH_SAMPLES * 2].view("<i2")
        return encode_wav(samples, SYNTH_RATE)
    raise ValueError(f"unknown synthetic media kind {kind!r}")


def docs_as_synth_media(docs: DataFrame) -> DataFrame:
    """One REAL media payload per document row: kind cycles
    bmp/ppm/wav by ``doc_id % 3``; bytes are the deterministic
    :func:`synth_media_payload`.  This is the decodable-media twin of
    :func:`docs_as_media` — it exercises the real decoders end to end
    on the distributed path."""
    kinds = ("bmp", "ppm", "wav")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            kind = [kinds[int(i) % 3] for i in ids]
            yield pd.DataFrame({
                "media_id": ids.astype(str),
                "payload": [synth_media_payload(str(i), k)
                            for i, k in zip(ids, kind)],
                "meta": [
                    {"kind": "audio" if k == "wav" else "image",
                     "width": None if k == "wav" else SYNTH_W,
                     "height": None if k == "wav" else SYNTH_H,
                     "sample_rate": SYNTH_RATE if k == "wav" else None,
                     "n_frames": 1}
                    for k in kind],
            })

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: sha256 expansion of the payload."""
    out = np.empty(dim, dtype=np.float32)
    h = hashlib.sha256(payload)
    block = b""
    for d in range(dim):
        if d % 4 == 0:
            h.update(b"x")
            block = h.digest()
        v = int.from_bytes(block[(d % 4) * 8:(d % 4) * 8 + 8], "big")
        out[d] = v / 2 ** 63 - 1.0
    return out


def decode_features(media: DataFrame, dim: int = 16, fake: bool = False,
                    on_error: str = "raise") -> DataFrame:
    """Decode payloads and emit a feature vector per media row.

    The REAL path (default) sniffs each payload and decodes
    BMP/PPM/WAV in pure numpy (:func:`media_features`); ``fake=True``
    substitutes the sha256 stand-in so arbitrary bytes exercise the
    plumbing.  ``on_error``: 'raise' fails the job on an undecodable
    payload (a corrupt row in a curated table is a data bug);
    'null' emits NULL features for it instead (crawl-grade inputs).
    NULL payloads always yield (n_bytes=0, features=NULL).
    """
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', "
                         f"got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                b = bytes(p)
                try:
                    f = (_fake_feature(b, dim) if fake
                         else media_features(b, dim))
                    feats.append(np.asarray(f, np.float32).tolist())
                except (ValueError, struct.error):
                    # struct.error: a payload that passes the magic
                    # sniff but is truncated mid-header raises from
                    # unpack_from, NOT ValueError — 'null' mode must
                    # survive it (crawl-grade bytes are exactly where
                    # truncation happens)
                    if on_error == "raise":
                        raise
                    feats.append(None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [len(bytes(p)) if p is not None else 0
                            for p in pdf["payload"]],
                "features": feats,
            })

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one output row per kept frame index
    (pure Catalyst: the frame grid comes from metadata, payload slicing
    is the decoder's job)."""
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"),
    )
