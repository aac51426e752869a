"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas — schema, fan-out, determinism (decode itself is a stub)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_expr_spark.functions import multimodal as MM
from dask_expr_spark.sources.io import read_parquet


def _with_payload(spark, sf_dir):
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))


def test_decode_meta_schema_and_values(spark, sf_dir):
    src = _with_payload(spark, sf_dir)
    meta = MM.decode_image_meta(src, "doc_id", "payload")
    assert [f.name for f in meta.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "format"]
    rows = meta.collect()
    assert len(rows) == src.count()
    for r in rows[:50]:
        assert r.width == r.n_bytes % 1024
        assert r.format in ("png", "jpeg")


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
