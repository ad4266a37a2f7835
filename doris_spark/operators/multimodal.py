"""Multimodal (image/audio/video) column processing.

LLM-pipeline extension (BASELINE.json north star): media are opaque
`binary` columns with typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over mapInPandas —
the only sane shape for Python-side media work at scale (one Python
process per partition, columnar Arrow transfer, no per-row overhead).

The actual codec libraries (PIL/torchvision/ffmpeg) are NOT in this
container, so the decode kernels are STUBS: a deterministic fake decoder
parses our own 16-byte header format, and the real-library paths raise
NotImplementedError behind an import-guard. Everything Spark-side —
schemas, batch iteration, partitioning, UDF signatures — is real and
tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Fake on-disk media format: b"DSMM" + u32 width + u32 height + u16 channels
# + u16 kind + payload bytes. Deterministic stand-in for real codecs.
_MAGIC = b"DSMM"
HEADER_LEN = 16

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_digest", StringType()),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

_KINDS = ("image", "audio", "video")


def encode_fake_media(media_id: int, kind: str, body: bytes) -> bytes:
    """Pack `body` into the fake container format (test fixture helper)."""
    w = 64 + (media_id % 192)
    h = 64 + ((media_id * 7) % 192)
    ch = 3 if kind == "image" else 1
    return _MAGIC + struct.pack(">IIHH", w, h, ch, _KINDS.index(kind)) + body


def _decode_header(payload: bytes) -> tuple[int, int, int, str] | None:
    if payload is None or len(payload) < HEADER_LEN or payload[:4] != _MAGIC:
        return None
    w, h, ch, kind_i = struct.unpack(">IIHH", payload[4:HEADER_LEN])
    if kind_i >= len(_KINDS):
        return None
    return w, h, ch, _KINDS[kind_i]


def decode_media(df: DataFrame) -> DataFrame:
    """media(payload binary) → decoded metadata rows via mapInPandas.

    Real decoders (PIL.Image.open etc.) would slot into `_decode_header`;
    the Spark plan — arrow batches, per-partition python workers, pruned
    input columns — is production-shaped.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                hdr = _decode_header(payload)
                if hdr is None:
                    continue  # undecodable rows are dropped (dead-letter in prod)
                w, h, ch, hdr_kind = hdr
                body = payload[HEADER_LEN:]
                rows.append(
                    {
                        "media_id": mid,
                        "kind": hdr_kind,
                        "width": w,
                        "height": h,
                        "channels": ch,
                        "n_bytes": len(body),
                        "content_digest": hashlib.md5(body).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(decode, DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """payload → fixed-dim float feature vector (deterministic md5-fold
    stub; a real model would batch through ONNX/torch here — the Arrow
    batch boundary is exactly where the GPU handoff happens)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = (payload or b"")[HEADER_LEN:]
                vec = []
                for i in range(FEATURE_DIM):
                    h = hashlib.md5(body + bytes([i])).digest()
                    (u,) = struct.unpack(">q", h[:8])
                    vec.append(float(u) / float(1 << 63))
                out.append({"media_id": mid, "feature": vec})
            yield pd.DataFrame(out, columns=["media_id", "feature"])

    return df.select("media_id", "payload").mapInPandas(feats, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize requires PIL — stubbed per the environment
    contract. The function exists so the API surface is complete."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "resize_images requires Pillow, which is not available in this "
            "container; the mapInPandas plumbing is identical to decode_media"
        ) from e
    raise NotImplementedError("real resize kernel not implemented")


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — deterministic stub: emits one row per sampled
    'frame' index derived from payload length (a real impl would demux via
    ffmpeg per Arrow batch)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_digest", StringType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = (payload or b"")[HEADER_LEN:]
                n_frames = max(len(body) // 32, 1)
                for idx in range(0, n_frames, every_n):
                    chunk = body[idx * 32 : (idx + 1) * 32]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": idx,
                            "frame_digest": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_digest"])

    return df.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        frames, schema
    )


def media_from_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from a text corpus (each doc's UTF-8 bytes as
    payload) — the ingestion half of the multimodal pipeline, same
    mapInPandas/Arrow shape as decode_media."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [_KINDS[i % 3] for i in ids],
                    "payload": [
                        encode_fake_media(i, _KINDS[i % 3], t.encode("utf-8"))
                        for i, t in zip(ids, pdf[text_col])
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(build, MEDIA_SCHEMA)


# ====================================================================
# Real codecs, zero dependencies: PPM (P6) images and PCM WAV audio.
# These parse actual interchange formats byte-for-byte — a user can feed
# genuine .ppm/.wav payloads — so decode/resize/frame-sample are REAL
# kernels on these formats; PIL/ffmpeg remain gated for JPEG/MP4.
# ====================================================================

PPM_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", FloatType()),
        StructField("mean_g", FloatType()),
        StructField("mean_b", FloatType()),
    ]
)

WAV_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", FloatType()),
        StructField("rms", FloatType()),
    ]
)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Standard binary PPM (P6): ASCII header + raw RGB triplets."""
    assert len(rgb) == width * height * 3
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _parse_ppm(payload: bytes):
    if not payload or not payload.startswith(b"P6"):
        return None
    # header: magic, whitespace-separated width/height/maxval, one
    # whitespace, then raw pixels (comments with # allowed)
    idx, fields = 2, []
    while len(fields) < 3 and idx < len(payload):
        while idx < len(payload) and payload[idx : idx + 1].isspace():
            idx += 1
        if payload[idx : idx + 1] == b"#":
            while idx < len(payload) and payload[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < len(payload) and not payload[idx : idx + 1].isspace():
            idx += 1
        fields.append(int(payload[start:idx]))
    idx += 1  # single whitespace after maxval
    if len(fields) < 3:
        return None
    w, h, _maxval = fields
    pixels = payload[idx : idx + w * h * 3]
    if len(pixels) < w * h * 3:
        return None
    return w, h, pixels


def decode_images_ppm(df: DataFrame) -> DataFrame:
    """(media_id, payload) with real P6 PPM bytes → dims + per-channel
    means. numpy over the Arrow batch; undecodable rows drop."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_ppm(bytes(payload) if payload is not None else None)
                if parsed is None:
                    continue
                w, h, pixels = parsed
                a = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, 3)
                m = a.mean(axis=0)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "mean_r": float(m[0]),
                        "mean_g": float(m[1]),
                        "mean_b": float(m[2]),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PPM_DECODED_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(decode, PPM_DECODED_SCHEMA)


def resize_images_ppm(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of P6 PPM payloads, re-encoded as PPM.
    Pure numpy index mapping — the real thing, not a stub."""
    import numpy as np

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_ppm(bytes(payload) if payload is not None else None)
                if parsed is None:
                    continue
                w, h, pixels = parsed
                a = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                out = a[ys][:, xs].tobytes()
                rows.append({"media_id": mid, "payload": encode_ppm(out_w, out_h, out)})
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return df.select("media_id", "payload").mapInPandas(resize, schema)


def encode_wav(sample_rate: int, samples_u8: bytes) -> bytes:
    """Standard 8-bit mono PCM WAV via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(1)
        wv.setframerate(sample_rate)
        wv.writeframes(samples_u8)
    return buf.getvalue()


def decode_audio_wav(df: DataFrame) -> DataFrame:
    """(media_id, payload) with real RIFF/WAV bytes → rate, frames,
    duration, RMS amplitude (8-bit PCM centered at 128)."""
    import io
    import math
    import wave

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as wv:
                        rate = wv.getframerate()
                        n = wv.getnframes()
                        raw = wv.readframes(n)
                except (wave.Error, EOFError, TypeError):
                    continue
                a = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": rate,
                        "n_frames": n,
                        "duration_s": float(n) / rate,
                        "rms": float(math.sqrt((a * a).mean())) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in WAV_DECODED_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(decode, WAV_DECODED_SCHEMA)
