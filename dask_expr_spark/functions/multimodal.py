"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque `binary` columns + typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas UDFs over mapInPandas so bytes never round-trip through Python
row-by-row. The actual codec work is STUBBED (Pillow/torchaudio/ffmpeg
are not in this container): `decode_image_meta` derives deterministic
fake metadata from the bytes, and `sample_frames` slices byte windows.
The Spark-side contract — schemas, batch iteration, partitioning —
is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB decode — deterministic metadata from byte length.
    Replace with PIL.Image.open(io.BytesIO(payload)) when the codec
    libraries are available."""
    n = len(payload)
    return (n % 1024, (n * 7) % 768, "png" if n % 2 == 0 else "jpeg")


def decode_image_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """binary column → typed metadata struct via mapInPandas
    (Arrow-batched; one Python roundtrip per batch, not per row)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            meta = [_fake_decode(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, IMAGE_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, id_col: str, bin_col: str,
                  frame_size: int = 64, every_n: int = 4) -> DataFrame:
    """video-style frame sampling STUB: emit every Nth `frame_size`-byte
    window of the payload as a row. Real implementation would seek
    keyframes via ffmpeg; the fan-out shape (1 row → M frame rows,
    schema, batching) is the part that matters for the pipeline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, nos = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                payload = payload or b""
                for i, off in enumerate(range(0, len(payload), frame_size * every_n)):
                    ids.append(int(doc_id))
                    nos.append(i)
                    frames.append(payload[off : off + frame_size])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_no": pd.Series(nos, dtype="int64"),
                 "frame_bytes": frames}
            )

    return df.select(id_col, bin_col).mapInPandas(batches, FRAME_SCHEMA)


def embed_binary(df: DataFrame, id_col: str, bin_col: str, dim: int = 16) -> DataFrame:
    """feature-extraction STUB: deterministic pseudo-embedding from
    byte content (md5-seeded), returned as array<float>. Stands in for
    a real vision/audio encoder; downstream similarity ops consume it
    unchanged."""
    import hashlib
    import struct

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = []
            for payload in pdf[bin_col]:
                h = hashlib.md5(payload or b"").digest()
                vals = []
                for i in range(dim):
                    (u,) = struct.unpack_from("<I", h * ((4 * dim) // 16 + 1), 4 * i)
                    vals.append((u % 2_000_000) / 1_000_000.0 - 1.0)
                embs.append(vals)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "embedding": embs}
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema)
