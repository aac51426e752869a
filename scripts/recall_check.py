#!/usr/bin/env python
"""Measured RECALL for the approximate ANN / dedup family (VERDICT r5
item 5): SCALE.md proves the approximate paths are CHEAP at x100/x1000;
this script pairs that with measured QUALITY at the same scale, so the
sizing contracts ("hold recall by raising num_tables") carry numbers.

- corpus: a x100 key-offset replica of the sf0.1 embeddings (200k
  vectors, 64-dim) and a x10 replica of documents (50k docs), built
  like scale_check.py (per-replica vector perturbation / doc marker
  token keeps bucket + near-dup structure realistic).  The documents
  replica is deliberately x10, not x100: these replicas SHARE a
  vocabulary (each base doc gets ~N near-identical copies), so chunk16
  buckets deepen with N and the first x100 attempt filled a 72 GB disk
  with spilled candidate pairs — the chunk-key trap measured as a disk
  incident, recorded in SCALE.md;
- ground truth: cosine_topk_blocked (exact, fully distributed) top-k
  for a deterministic 500-query sample;
- measured: recall@k vs that truth for lsh_bucketed_topk (auto planes,
  num_tables sweep), ivf_topk (nprobe sweep), cosine_topk_int8; plus
  SimHash chunk-vs-blocks pair recall on the constructed near-dup
  pairs (replicas of one base doc) at x100 docs, with candidate-pair
  counts so the recall/cost trade reads off one table.

Run:  python scripts/recall_check.py [--replicas N] [--k K]
Results are recorded in SCALE.md (recall table).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_RECALL_DIR", "/tmp/dx_recall_x100")
OFF = 1_000_000_000


def materialize(spark, replicas: int, doc_replicas: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    for name, key, text_col, vec_col, nrep in (
            ("embeddings", "vec_id", None, "embedding", replicas),
            ("documents", "doc_id", "text", None, doc_replicas)):
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            continue
        base = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        reps = []
        for i in range(nrep):
            r = base.withColumn(key, F.col(key) + F.lit(i * OFF))
            if text_col and i > 0:
                r = r.withColumn(
                    text_col,
                    F.concat(F.lit(f"replica{i} "), F.col(text_col)))
            if vec_col and i > 0:
                r = r.withColumn(
                    vec_col,
                    F.transform(
                        F.col(vec_col),
                        lambda x, j: x + (F.lit(float(i)) * 1e-3)
                        * F.cos(j.cast("double") + F.lit(float(i)))))
            reps.append(r)
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.repartition(32).write.mode("overwrite").parquet(out)


def topk_sets(df, k):
    """{query_id: set(neighbor_id)} keeping each query's top-k by cos."""
    import pandas as pd

    pdf = df.toPandas()
    pdf = (pdf.sort_values(["query_id", "cos"], ascending=[True, False])
           .groupby("query_id").head(k))
    return {q: set(g["neighbor_id"]) for q, g in pdf.groupby("query_id")}


def recall_at_k(truth: dict, approx: dict, k: int) -> float:
    num = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    den = sum(min(k, len(truth[q])) for q in truth)
    return num / den


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--doc-replicas", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=500)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dask_expr_spark.functions import dedup as DD
    from dask_expr_spark.functions import similarity as SIM
    from dask_expr_spark.session import get_spark

    spark = get_spark("recall_check", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    materialize(spark, args.replicas, args.doc_replicas)

    emb = spark.read.parquet(os.path.join(DST, "embeddings.parquet"))
    n = emb.count()
    # deterministic query sample: md5-ranked ids (engine-independent)
    q_ids = (emb.select("vec_id")
             .orderBy(F.md5(F.col("vec_id").cast("string")))
             .limit(args.queries))
    queries = emb.join(q_ids, "vec_id")
    queries = spark.createDataFrame(queries.toPandas())  # freeze sample
    k = args.k
    out = {"corpus_rows": n, "queries": args.queries, "k": k}

    import time
    t0 = time.time()
    exact = SIM.cosine_topk_blocked(emb, queries, k=k + 1)
    # drop self-matches so recall measures neighbors, not identity
    exact = exact.filter(F.col("query_id") != F.col("neighbor_id"))
    truth = topk_sets(exact, k)
    out["exact_blocked_sec"] = round(time.time() - t0, 1)

    def measure(name, df):
        t = time.time()
        approx = topk_sets(
            df.filter(F.col("query_id") != F.col("neighbor_id")), k)
        out[name] = {"recall": round(recall_at_k(truth, approx, k), 4),
                     "sec": round(time.time() - t, 1)}
        print(name, out[name], flush=True)

    for L in (8, 16, 32):
        measure(f"lsh_auto_L{L}", SIM.lsh_bucketed_topk(
            emb, queries, dim=64, k=k + 1, num_tables=L,
            planes_per_table="auto"))
    for nprobe in (1, 2, 4, 8):
        measure(f"ivf_nprobe{nprobe}", SIM.ivf_topk(
            emb, queries, dim=64, k=k + 1, num_cells=64, nprobe=nprobe,
            lloyd_iters=1))
    measure("int8_exact_scan", SIM.cosine_topk_int8(emb, queries, k=k + 1))

    # -- product quantization: ADC scan over persisted codes ----------
    # steady-state pattern measured honestly: train+encode (the
    # once-per-corpus cost) timed separately from the per-query ADC
    # scan over the persisted code table.
    for m_sub in (8, 16):
        t = time.time()
        cb = SIM.pq_train(emb, dim=64, m=m_sub)
        codes = SIM.pq_encode(emb, cb).persist()
        codes.count()
        build = round(time.time() - t, 1)
        measure(f"pq_adc_m{m_sub}", SIM.pq_topk(
            emb, queries, dim=64, k=k + 1, m=m_sub, codebook=cb,
            codes=codes).withColumnRenamed("adc", "cos"))
        out[f"pq_adc_m{m_sub}"]["build_sec"] = build
        measure(f"pq_adc_m{m_sub}_rerank100", SIM.pq_topk(
            emb, queries, dim=64, k=k + 1, m=m_sub, codebook=cb,
            codes=codes, exact_rerank=100).drop("adc"))
        codes.unpersist()

    # -- IVF-PQ composition: recall = the IVF cell-coverage ceiling
    # (rerank recovers everything quantization lost)
    for npb in (4, 8):
        measure(f"ivfpq_np{npb}_rr100", SIM.ivfpq_topk(
            emb, queries, dim=64, k=k + 1, m=8, num_cells=64,
            nprobe=npb, exact_rerank=100).drop("adc"))

    # -- end-to-end retrieval THROUGH pca_whiten(k<d) ------------------
    # (VERDICT r6 item 5a): whiten the WHOLE corpus once at reduced
    # dimensionality, retrieve exactly in the whitened space, and score
    # recall@k against the full-dim exact truth — the quality cost of
    # the dimensionality reduction, measured, not assumed.  kd=64 keeps
    # every component, so its row isolates the METRIC change (whitening
    # reweights axes, so raw-cosine neighbors differ) from the
    # truncation loss the kd<64 rows add on top.
    for kd in (64, 48, 32, 16):
        t = time.time()
        white = SIM.pca_whiten(emb, dim=64, k=kd).persist()
        wq = white.join(queries.select("vec_id"), "vec_id")
        wq = spark.createDataFrame(wq.toPandas())       # freeze sample
        res = SIM.cosine_topk_blocked(white, wq, k=k + 1)
        measure(f"pca_whiten_k{kd}_exact", res)
        out[f"pca_whiten_k{kd}_exact"]["sec"] = round(time.time() - t, 1)
        white.unpersist()

    # -- MMR diversity/relevance trade-off curve -----------------------
    # (VERDICT r6 item 5b): rerank each query's exact top-50 with MMR
    # at several lambdas; report recall@k vs the pure-relevance truth
    # (relevance retained) and mean intra-list cosine of the selected
    # set (diversity bought).  lambda=1.0 must reproduce the truth
    # exactly — a built-in self-check of the harness.
    import numpy as np

    cand = (SIM.cosine_topk_blocked(emb, queries, k=51)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .join(emb.select(F.col("vec_id").alias("neighbor_id"),
                             F.col("embedding").alias("__nv")),
                  "neighbor_id")
            .persist())
    vecs_by_id = None
    for lam in (1.0, 0.7, 0.3):
        t = time.time()
        sel = SIM.mmr_rerank(cand, "query_id", "neighbor_id", "cos",
                             "__nv", k=k, lam=lam).toPandas()
        approx = {q: set(g["neighbor_id"])
                  for q, g in sel.groupby("query_id")}
        rec = recall_at_k(truth, approx, k)
        if vecs_by_id is None:
            vpdf = cand.select("neighbor_id", "__nv").toPandas() \
                .drop_duplicates("neighbor_id")
            vecs_by_id = {i: np.asarray(v, dtype="float64")
                          for i, v in zip(vpdf["neighbor_id"],
                                          vpdf["__nv"])}
        divs = []
        for _, g in sel.groupby("query_id"):
            V = np.asarray([vecs_by_id[i] for i in g["neighbor_id"]])
            V = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = V @ V.T
            n_sel = len(V)
            if n_sel > 1:
                divs.append(float(
                    (S.sum() - n_sel) / (n_sel * (n_sel - 1))))
        out[f"mmr_lam{lam}"] = {
            "recall": round(rec, 4),
            "mean_intra_cos": round(float(np.mean(divs)), 4),
            "sec": round(time.time() - t, 1)}
        print(f"mmr_lam{lam}", out[f"mmr_lam{lam}"], flush=True)
    cand.unpersist()

    # -- SimHash pair recall on constructed near-dup truth ------------
    docs = spark.read.parquet(os.path.join(DST, "documents.parquet"))
    def pair_stats(tag, pairs):
        t = time.time()
        cand = pairs.select(
            F.col("id_a").alias("__id"), "id_b", "hamming").withColumn(
            "base_a", F.col("__id") % OFF).withColumn(
            "base_b", F.col("id_b") % OFF)
        n_cand = cand.count()
        hits = (cand.where((F.col("hamming") <= 3)
                           & (F.col("base_a") == F.col("base_b")))
                .select("base_a", "__id", "id_b").distinct().count())
        out[tag] = {"candidates": n_cand, "neardup_pairs_found": hits,
                    "sec": round(time.time() - t, 1)}
        print(tag, out[tag], flush=True)

    pair_stats("simhash_chunk16", DD.simhash_bucket_pairs(
        docs, "doc_id", "text", blocks=None))
    pair_stats("simhash_blocks6", DD.simhash_bucket_pairs(
        docs, "doc_id", "text", blocks=6, max_hamming=3))
    pair_stats("simhash_auto", DD.simhash_bucket_pairs(
        docs, "doc_id", "text"))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
