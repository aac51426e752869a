"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas — schema, fan-out, real header parsing (stdlib path; full
pixel decode needs the optional Pillow)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from dask_expr_spark.functions import multimodal as MM
from dask_expr_spark.sources.io import read_parquet


def _with_payload(spark, sf_dir):
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))


def _png(w, h):
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x08\x06" + b"\x00" * 10


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8


def _jpeg(w, h):
    # SOI + APP0 stub + SOF0 with height/width
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_decode_meta_schema_and_values(spark, sf_dir):
    src = _with_payload(spark, sf_dir)
    meta = MM.decode_image_meta(src, "doc_id", "payload")
    assert [f.name for f in meta.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "format"]
    rows = meta.collect()
    assert len(rows) == src.count()
    for r in rows[:50]:
        # utf-8 text payloads are not images → parsed as unknown
        assert r.format == "unknown" and r.width is None


def test_decode_meta_real_headers(spark):
    payloads = [
        (1, _png(640, 480), "png", 640, 480),
        (2, _gif(12, 34), "gif", 12, 34),
        (3, _jpeg(800, 600), "jpeg", 800, 600),
        (4, b"not an image", "unknown", None, None),
    ]
    sdf = spark.createDataFrame(
        [(i, p) for i, p, *_ in payloads], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in MM.decode_image_meta(sdf, "doc_id", "payload").collect()}
    for i, p, fmt, w, h in payloads:
        assert got[i].format == fmt
        assert got[i].width == w and got[i].height == h
        assert got[i].n_bytes == len(p)


def test_frame_sampling_fanout(spark, sf_dir):
    src = _with_payload(spark, sf_dir).limit(20)
    frames = MM.sample_frames(src, "doc_id", "payload", frame_size=64, every_n=4)
    rows = frames.collect()
    assert len(rows) >= 20  # every doc emits at least one frame
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, fr in by_doc.items():
        nos = sorted(f.frame_no for f in fr)
        assert nos == list(range(len(fr)))  # dense frame numbering
        assert all(len(f.frame_bytes) <= 64 for f in fr)


def test_embed_binary_deterministic(spark, sf_dir):
    src = _with_payload(spark, sf_dir).limit(50)
    a = {r.doc_id: tuple(r.embedding) for r in MM.embed_binary(src, "doc_id", "payload").collect()}
    b = {r.doc_id: tuple(r.embedding) for r in MM.embed_binary(src, "doc_id", "payload").collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    assert all(-1.0 <= x <= 1.0 for v in a.values() for x in v)


def test_resize_images_plumbing(spark):
    """resize step: big images get aspect-preserving target dims, small
    ones pass through, undecodable payloads pass through untouched.
    Without Pillow (or when Pillow raises on the header-only fixture)
    the payload passes through and width/height report its REAL dims —
    resized=true only ever accompanies an actually re-encoded payload;
    the no-Pillow skip is flagged stubbed=true instead."""
    payloads = [
        (1, _png(640, 480)),
        (2, _png(100, 50)),
        (3, b"not an image"),
    ]
    sdf = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r.doc_id: r
           for r in MM.resize_images(sdf, "doc_id", "payload",
                                     max_side=256).collect()}
    r1 = got[1]
    if r1.resized:  # Pillow present and able to decode the fixture
        assert (r1.width, r1.height) == (256, 192)
        assert not r1.stubbed
        assert r1.image_bytes != payloads[0][1]
    else:  # no Pillow (stubbed=true) or Pillow raised (stubbed=false):
        # payload untouched, dims describe the payload
        assert (r1.width, r1.height) == (640, 480)
        assert r1.image_bytes == payloads[0][1]
    assert (got[2].width, got[2].height, got[2].resized,
            got[2].stubbed) == (100, 50, False, False)
    assert got[2].image_bytes == payloads[1][1]
    assert got[3].width is None and got[3].resized is False
    assert got[3].stubbed is False
    assert got[3].image_bytes == payloads[2][1]


def test_decode_audio_meta_wav_and_magic(spark):
    """real WAV header parse (stdlib) + magic-byte recognition for
    compressed codecs."""
    import struct

    def wav(nch, rate, bits, n_samples):
        data = b"\x00" * (n_samples * nch * (bits // 8))
        fmt = struct.pack("<HHIIHH", 1, nch, rate,
                          rate * nch * bits // 8, nch * bits // 8, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    payloads = [
        (1, wav(2, 44100, 16, 44100)),   # 1 second stereo
        (2, b"ID3" + b"\x00" * 40),
        (3, b"OggS" + b"\x00" * 40),
        (4, b"fLaC" + b"\x00" * 40),
        (5, b"who knows"),
    ]
    sdf = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r.doc_id: r
           for r in MM.decode_audio_meta(sdf, "doc_id", "payload").collect()}
    r = got[1]
    assert (r.format, r.n_channels, r.sample_rate, r.bits_per_sample) == \
        ("wav", 2, 44100, 16)
    assert abs(r.duration_s - 1.0) < 1e-9
    assert got[2].format == "mp3" and got[3].format == "ogg"
    assert got[4].format == "flac" and got[5].format == "unknown"


def test_wav_header_edge_cases():
    """csize gating + non-byte-aligned bit depth: a fmt chunk declaring
    <16 bytes must not be parsed into the next chunk, and 12-bit depth
    duration must come from the bit domain, not bits//8."""
    import struct

    from dask_expr_spark.functions.multimodal import _parse_wav_header

    def riff(chunks):
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    # 12-bit mono 8000 Hz: 8000 samples -> 12000 bytes of data = 1 s
    fmt12 = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 12 // 8, 2, 12)
    good = riff(b"fmt " + struct.pack("<I", len(fmt12)) + fmt12
                + b"data" + struct.pack("<I", 12000) + b"\x00" * 12000)
    nch, rate, bits, dur = _parse_wav_header(good)
    assert (nch, rate, bits) == (1, 8000, 12)
    assert abs(dur - 1.0) < 1e-9

    # fmt chunk declaring only 4 bytes: must NOT read format fields out
    # of the following data chunk's bytes
    short_fmt = riff(b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
                     + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    assert _parse_wav_header(short_fmt) is None
