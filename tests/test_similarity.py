"""Property tests for similarity search: LSH-bucketed ANN recall vs the
brute-force exact top-k; centroid shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_expr_spark.functions import similarity as SIM
from dask_expr_spark.sources.io import read_parquet


def _emb(spark, sf_dir):
    return read_parquet(spark, f"{sf_dir}/embeddings.parquet").to_spark()


def test_cosine_topk_shape_and_bounds(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    res = SIM.cosine_topk(emb, q, k=5).collect()
    n_q = q.count()
    assert len(res) == n_q * 5
    for r in res:
        assert -1.0001 <= r.cos <= 1.0001
        assert 1 <= r.rank <= 5
        assert r.query_id != r.neighbor_id


def test_lsh_bucketed_recall(spark, sf_dir):
    """bucketed ANN must recover a reasonable fraction of the true
    top-5 — multi-table LSH (16 tables x 4 planes); require >= 50% recall."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {(r.query_id, r.neighbor_id)
             for r in SIM.cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in SIM.lsh_bucketed_topk(emb, q, dim=64, k=5, num_tables=16, planes_per_table=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_centroids_shape(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = SIM.centroids_by_label(emb, "label", "embedding").collect()
    n_labels = emb.select("label").distinct().count()
    assert len(cents) == n_labels
    for r in cents:
        assert len(r.centroid) == 64
        assert r.n_vectors > 0


def test_hyperplane_signature_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    sig = SIM.hyperplane_signature(SIM.as_double(F.col("embedding")), dim=64, num_planes=8)
    a = {r.vec_id: r.s for r in emb.select("vec_id", sig.alias("s")).collect()}
    b = {r.vec_id: r.s for r in emb.select("vec_id", sig.alias("s")).collect()}
    assert a == b
    assert all(0 <= v < 256 for v in a.values())


def test_ivf_topk_recall(spark, sf_dir):
    """IVF with nprobe=8 of 16 cells scans ~half the corpus per query —
    require >= 60% of the true top-5."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {(r.query_id, r.neighbor_id)
             for r in SIM.cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in SIM.ivf_topk(emb, q, dim=64, k=5, num_cells=16, nprobe=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 200 == 0)
    a = sorted((r.query_id, r.rank, r.neighbor_id)
               for r in SIM.ivf_topk(emb, q, dim=64, k=3).collect())
    b = sorted((r.query_id, r.rank, r.neighbor_id)
               for r in SIM.ivf_topk(emb, q, dim=64, k=3).collect())
    assert a == b


def test_int8_quantized_ann_recall(spark, sf_dir):
    """int8-quantized brute-force top-k must agree with the exact path
    on >= 75% of neighbor picks. The synthetic embeddings are uniform
    random, so cosines cluster near 0 and near-ties are common —
    quantization (~0.4% noise/component) flips exactly those; on real
    embedding manifolds with separated neighbors agreement is near
    100%."""
    import os
    from pyspark.sql import functions as F
    from dask_expr_spark.functions.similarity import cosine_topk, cosine_topk_int8

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    exact = cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    quant = cosine_topk_int8(emb, queries, k=5).select("query_id", "neighbor_id")
    n_exact = exact.count()
    hits = exact.intersect(quant).count()
    assert n_exact > 0
    assert hits / n_exact >= 0.75, f"recall {hits}/{n_exact}"
