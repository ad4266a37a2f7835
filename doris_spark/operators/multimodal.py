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
