"""Interleaved A/B of bloom_fold_segments: OLD all-pandas fold vs NEW
JVM-split fold (dense zip_with + sparse pack).  One session, alternating
reps, on a realistic LSM layout: 1 dense version (x10-scale params) +
4 sparse delta segments.  Times fold->probe-count (the consumer shape:
read_key_bloom -> bloom_probe over a batch)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dask_expr_spark.session import get_spark  # noqa: E402
from dask_expr_spark.functions import sketches as S  # noqa: E402


def fold_old(segments: DataFrame) -> DataFrame:
    cols = segments.columns
    has_words = "words" in cols
    has_pos = "pos" in cols

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        nwords = int(pdf["m_bits"].iloc[0]) // 32
        arr = np.zeros(nwords, dtype=np.int64)
        if has_words:
            for w in pdf["words"]:
                if w is not None and len(w):
                    arr |= np.asarray(w, dtype=np.int64)
        if has_pos:
            for p in pdf["pos"]:
                if p is not None and len(p):
                    p = np.asarray(p, dtype=np.int64)
                    np.bitwise_or.at(arr, p >> 5,
                                     np.int64(1) << (p & np.int64(31)))
        return pd.DataFrame({
            "shard": [int(pdf["shard"].iloc[0])],
            "words": [arr.tolist()],
            "m_bits": [int(pdf["m_bits"].iloc[0])],
            "k": [int(pdf["k"].iloc[0])],
            "shards": [int(pdf["shards"].iloc[0])]})

    return segments.groupBy("shard").applyInPandas(
        _fold,
        schema="shard long, words array<long>, m_bits int, k int, "
               "shards int")


def main() -> None:
    spark = get_spark("exp_fold_ab")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))
    # x10-ish: 1.5M keys like the bench index
    keys = (orders.select((F.col("o_orderkey") + i * 10_000_000)
                          .cast("long").alias("key"))
            for i in range(10))
    base = None
    for k in keys:
        base = k if base is None else base.unionByName(k)
    dense = S.bloom_index(base, "key", fpp=1e-6)
    dense.write.mode("overwrite").parquet("/tmp/fold_ab/dense")
    dense_r = spark.read.parquet("/tmp/fold_ab/dense")
    row = dense_r.select("m_bits", "k", "shards").first()
    params = (int(row["m_bits"]), int(row["k"]), int(row["shards"]))
    print("params:", params)
    # 4 sparse segments of 15k keys each
    for i in range(4):
        seg = S.bloom_delta_segment(
            orders.where(F.col("o_orderkey") % 101 == i)
            .select((F.col("o_orderkey") + 90_000_000 + i * 1_000_000)
                    .cast("long").alias("key")),
            "key", params)
        seg.write.mode("overwrite").parquet(f"/tmp/fold_ab/seg{i}")
    dirs = ["/tmp/fold_ab/dense"] + [f"/tmp/fold_ab/seg{i}" for i in range(4)]
    segs = spark.read.option("mergeSchema", "true").parquet(*dirs)
    batch = orders.select(F.col("o_orderkey").cast("long").alias("key"))

    def run(tag, fold_fn):
        t0 = time.perf_counter()
        idx = fold_fn(segs).localCheckpoint(eager=False)
        probed = S.bloom_probe(batch, idx, "key")
        n = probed.where(F.col("maybe_in_index")).count()
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:6.2f} s  (hits={n})")
        return dt

    # warmup both
    run("warm new", S.bloom_fold_segments)
    run("warm old", fold_old)
    res = {"new": [], "old": []}
    for rep in range(3):
        res["old"].append(run("old", fold_old))
        res["new"].append(run("new", S.bloom_fold_segments))
    for tag, v in res.items():
        print(f"{tag}: median {sorted(v)[1]:.2f}  all {['%.2f' % x for x in v]}")

    # correctness: both folds produce identical bitmaps
    a = {r["shard"]: r["words"] for r in S.bloom_fold_segments(segs).collect()}
    b = {r["shard"]: r["words"] for r in fold_old(segs).collect()}
    assert set(a) == set(b) and all(a[s] == b[s] for s in a), "fold mismatch"
    print("folds identical:", len(a), "shards")


if __name__ == "__main__":
    main()
