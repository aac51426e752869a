"""Probe-shape A/B on the /tmp/fold_ab layout: the current forall()
higher-order probe vs an unrolled k-term codegen AND.  The phase
breakdown showed the probe at ~50 s for a 150k-row batch even against
a plain dense parquet index — HOFs are CodegenFallback, so every row
re-interprets k element_at tests over the multi-MB words array."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_expr_spark.session import get_spark  # noqa: E402
from dask_expr_spark.functions import sketches as S  # noqa: E402
from dask_expr_spark.functions.sketches import (  # noqa: E402
    _bf_mask, _bf_pos, _bf_shard)


def bloom_probe_unrolled(df, index, key_col,
                         result_col="maybe_in_index",
                         m_bits=None, k=None, num_shards=None,
                         seed="bf"):
    if m_bits is None or k is None or num_shards is None:
        row = index.select("m_bits", "k", "shards").first()
        m_bits, k, num_shards = int(row["m_bits"]), int(row["k"]), \
            int(row["shards"])
    key = F.col(key_col).cast("string")
    shard = _bf_shard(key, seed, num_shards)
    probed = df.withColumn("__shard", shard)
    idx = index.select(F.col("shard").alias("__shard"), "words")
    j = probed.join(F.broadcast(idx), "__shard", "left")

    def _bit(jj):
        pos = _bf_pos(key, F.lit(jj), seed, m_bits)
        word = F.element_at(F.col("words"), (pos / 32).cast("int") + 1)
        return word.bitwiseAND(_bf_mask(pos)) != 0

    hit = functools.reduce(lambda a, b: a & b,
                           [_bit(jj) for jj in range(k)])
    return (j.withColumn(
        result_col,
        F.when(F.col("words").isNull(), F.lit(False)).otherwise(hit))
        .drop("__shard", "words"))


def main() -> None:
    spark = get_spark("exp_probe_unroll")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))
    batch = orders.select(F.col("o_orderkey").cast("long").alias("key"))
    dense = spark.read.parquet("/tmp/fold_ab/dense")

    def run(tag, fn):
        t0 = time.perf_counter()
        n = (fn(batch, dense, "key")
             .where(F.col("maybe_in_index")).count())
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:6.2f} s  (hits={n})")
        return dt

    run("warm unrolled", bloom_probe_unrolled)
    run("warm forall  ", S.bloom_probe)
    res = {"forall": [], "unrolled": []}
    for rep in range(3):
        res["forall"].append(run("forall  ", S.bloom_probe))
        res["unrolled"].append(run("unrolled", bloom_probe_unrolled))
    for tag, v in res.items():
        print(f"{tag}: median {sorted(v)[1]:.2f}  all {['%.2f' % x for x in v]}")

    # correctness: identical verdicts
    a = S.bloom_probe(batch, dense, "key").where(
        F.col("maybe_in_index")).count()
    b = bloom_probe_unrolled(batch, dense, "key").where(
        F.col("maybe_in_index")).count()
    assert a == b, (a, b)
    n_total = batch.count()
    miss_a = S.bloom_probe(
        batch.select((F.col("key") + 500_000_000).alias("key")),
        dense, "key").where(F.col("maybe_in_index")).count()
    miss_b = bloom_probe_unrolled(
        batch.select((F.col("key") + 500_000_000).alias("key")),
        dense, "key").where(F.col("maybe_in_index")).count()
    assert miss_a == miss_b, (miss_a, miss_b)
    print(f"identical: hits {a}/{n_total}, novel-key hits {miss_a}")


if __name__ == "__main__":
    main()
