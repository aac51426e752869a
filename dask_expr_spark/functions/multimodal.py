"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque `binary` columns + typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas UDFs over mapInPandas so bytes never round-trip through Python
row-by-row.

Decode levels (auto-selected):
- **Pillow**, when importable (optional dependency) — full decode.
- **pure-stdlib header parsing** otherwise — real width/height/format
  from PNG IHDR, JPEG SOFn markers, GIF logical screen, BMP header and
  WEBP VP8/VP8L/VP8X chunks. No codec library needed; unrecognized
  payloads get null dimensions and format 'unknown'.
Full pixel work beyond Pillow (video keyframes via ffmpeg, audio via
torchaudio) remains stubbed: `sample_frames` slices byte windows with
the real 1→M fan-out shape.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional full decoder
    from PIL import Image as _PILImage  # pragma: no cover
except ImportError:
    _PILImage = None

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def _parse_image_header(p: bytes) -> tuple[int | None, int | None, str]:
    """(width, height, format) from the container header — pure stdlib,
    no pixel decode. Covers PNG / JPEG / GIF / BMP / WEBP."""
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
            w, h = struct.unpack(">II", p[16:24])
            return w, h, "png"
        if p[:2] == b"\xff\xd8":  # JPEG: scan for a SOFn marker
            i = 2
            while i + 9 < len(p):
                if p[i] != 0xFF:
                    i += 1
                    continue
                marker = p[i + 1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                    return w, h, "jpeg"
                seglen = struct.unpack(">H", p[i + 2 : i + 4])[0]
                i += 2 + seglen
            return None, None, "jpeg"
        if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
            w, h = struct.unpack("<HH", p[6:10])
            return w, h, "gif"
        if p[:2] == b"BM" and len(p) >= 26:
            w, h = struct.unpack("<ii", p[18:26])
            return abs(w), abs(h), "bmp"
        if p[:4] == b"RIFF" and p[8:12] == b"WEBP" and len(p) >= 30:
            chunk = p[12:16]
            if chunk == b"VP8X":
                w = int.from_bytes(p[24:27], "little") + 1
                h = int.from_bytes(p[27:30], "little") + 1
                return w, h, "webp"
            if chunk == b"VP8L":
                bits = int.from_bytes(p[21:25], "little")
                return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp"
            if chunk == b"VP8 ":
                w, h = struct.unpack("<HH", p[26:30])
                return w & 0x3FFF, h & 0x3FFF, "webp"
            return None, None, "webp"
    except (struct.error, IndexError):
        pass
    return None, None, "unknown"


def _decode_one(p: bytes) -> tuple[int | None, int | None, str]:
    if _PILImage is not None:
        import io
        try:
            with _PILImage.open(io.BytesIO(p)) as im:
                return im.width, im.height, (im.format or "unknown").lower()
        except Exception:
            return None, None, "unknown"
    return _parse_image_header(p)


def decode_image_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """binary column → typed metadata struct via mapInPandas
    (Arrow-batched; one Python roundtrip per batch, not per row).
    Uses Pillow when installed, stdlib header parsing otherwise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            meta = [_decode_one(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "width": pd.array([m[0] for m in meta], dtype="Int64"),
                    "height": pd.array([m[1] for m in meta], dtype="Int64"),
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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("image_bytes", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BooleanType()),
        T.StructField("stubbed", T.BooleanType()),
    ]
)


def resize_images(df: DataFrame, id_col: str, bin_col: str,
                  max_side: int = 256) -> DataFrame:
    """image resize step: payloads whose decoded max dimension exceeds
    `max_side` are downscaled preserving aspect ratio.  With Pillow
    installed this is a REAL resize (re-encoded PNG); without it the
    payload passes through unchanged and the row is marked
    stubbed=true / resized=false with width/height describing the
    PAYLOAD'S actual dims (never the unapplied target dims), so
    downstream consumers can't mistake a stub for a real resize.  The
    Spark-side plumbing — schema, Arrow batching, pass-through of
    small images — is exercised either way.  Rows whose payload can't
    be decoded pass through untouched (resized=false, stubbed=false)."""

    def _target(w: int, h: int) -> tuple[int, int]:
        m = max(w, h)
        if m <= max_side:
            return w, h
        return max(1, (w * max_side) // m), max(1, (h * max_side) // m)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            out_b, out_w, out_h, out_r, out_s = [], [], [], [], []
            for payload in pdf[bin_col]:
                payload = payload or b""
                w, h, _fmt = _decode_one(payload)
                if w is None or h is None:
                    out_b.append(payload)
                    out_w.append(None)
                    out_h.append(None)
                    out_r.append(False)
                    out_s.append(False)
                    continue
                tw, th = _target(int(w), int(h))
                if (tw, th) == (w, h):
                    out_b.append(payload)
                    out_w.append(w)
                    out_h.append(h)
                    out_r.append(False)
                    out_s.append(False)
                elif _PILImage is not None:
                    try:
                        with _PILImage.open(io.BytesIO(payload)) as im:
                            buf = io.BytesIO()
                            im.resize((tw, th)).save(buf, format="PNG")
                            out_b.append(buf.getvalue())
                            out_w.append(tw)
                            out_h.append(th)
                            out_r.append(True)
                            out_s.append(False)
                    except Exception:
                        out_b.append(payload)
                        out_w.append(w)
                        out_h.append(h)
                        out_r.append(False)
                        out_s.append(False)
                else:
                    # no Pillow: payload kept, so width/height report the
                    # payload's REAL dims and stubbed flags the skipped
                    # resize (never resized=true with unapplied target dims)
                    out_b.append(payload)
                    out_w.append(w)
                    out_h.append(h)
                    out_r.append(False)
                    out_s.append(True)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"),
                 "image_bytes": out_b,
                 "width": pd.array(out_w, dtype="Int32"),
                 "height": pd.array(out_h, dtype="Int32"),
                 "resized": pd.Series(out_r, dtype="bool"),
                 "stubbed": pd.Series(out_s, dtype="bool")}
            )

    return df.select(id_col, bin_col).mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def _parse_wav_header(p: bytes):
    """real stdlib RIFF/WAVE parse: channels, sample rate, bit depth,
    duration from the fmt and data chunks. Returns None for non-WAV."""
    import struct

    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (csize,) = struct.unpack_from("<I", p, pos + 4)
        # csize >= 16 matters, not just buffer length: a fmt chunk
        # declaring fewer bytes would otherwise be parsed into the
        # following chunk's header
        if cid == b"fmt " and csize >= 16 and pos + 8 + 16 <= len(p):
            _audio_fmt, nch, rate = struct.unpack_from("<HHI", p, pos + 8)
            bits = struct.unpack_from("<H", p, pos + 8 + 14)[0]
            fmt = (nch, rate, bits)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)
    if fmt is None:
        return None
    nch, rate, bits = fmt
    dur = None
    if data_size is not None and rate and nch and bits:
        # duration in the bit domain so non-byte-aligned depths
        # (e.g. 12-bit) don't round through bits//8
        dur = (data_size * 8) / (rate * nch * bits)
    return nch, rate, bits, dur


def decode_audio_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """audio analogue of decode_image_meta: binary column → typed
    metadata via mapInPandas. WAV/RIFF headers are parsed for REAL
    (stdlib struct — channels, sample rate, bit depth, duration);
    compressed codecs (mp3/ogg/flac) are recognized by magic bytes
    only, their decode being the documented external-library stub."""

    def _one(p: bytes):
        wav = _parse_wav_header(p)
        if wav is not None:
            nch, rate, bits, dur = wav
            return "wav", nch, rate, bits, dur
        if p[:3] == b"ID3" or p[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2"):
            return "mp3", None, None, None, None
        if p[:4] == b"OggS":
            return "ogg", None, None, None, None
        if p[:4] == b"fLaC":
            return "flac", None, None, None, None
        return "unknown", None, None, None, None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [p if p is not None else b"" for p in pdf[bin_col]]
            meta = [_one(p) for p in payloads]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"),
                 "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                 "format": [m[0] for m in meta],
                 "n_channels": pd.array([m[1] for m in meta], dtype="Int32"),
                 "sample_rate": pd.array([m[2] for m in meta], dtype="Int32"),
                 "bits_per_sample": pd.array([m[3] for m in meta], dtype="Int32"),
                 "duration_s": pd.array([m[4] for m in meta], dtype="Float64")}
            )

    return df.select(id_col, bin_col).mapInPandas(batches, AUDIO_META_SCHEMA)
