"""A/B of bloom_merge's JVM aggregate/zip_with fold vs the numpy
applyInPandas fold (bloom_fold_segments) on two dense x10-scale
indexes.  Same CodegenFallback question as the segment fold."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_expr_spark.session import get_spark  # noqa: E402
from dask_expr_spark.functions import sketches as S  # noqa: E402


def merge_via_fold(a, b):
    return S.bloom_fold_segments(a.unionByName(b))


def main() -> None:
    spark = get_spark("exp_merge_ab")
    dense = spark.read.parquet("/tmp/fold_ab/dense")
    other = dense  # self-merge: same bytes, same shape

    def run(tag, fn):
        t0 = time.perf_counter()
        n = fn(dense, other).select(F.sum(F.size("words"))).first()[0]
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:6.2f} s  (words={n})")
        return dt

    run("warm fold ", merge_via_fold)
    run("warm zipw ", S.bloom_merge)
    res = {"zipw": [], "fold": []}
    for rep in range(3):
        res["zipw"].append(run("zipw", S.bloom_merge))
        res["fold"].append(run("fold", merge_via_fold))
    for tag, v in res.items():
        print(f"{tag}: median {sorted(v)[1]:.2f}  all {['%.2f' % x for x in v]}")

    a = {r["shard"]: r["words"] for r in S.bloom_merge(dense, other).collect()}
    b = {r["shard"]: r["words"] for r in merge_via_fold(dense, other).collect()}
    assert set(a) == set(b) and all(a[s] == b[s] for s in a), "merge mismatch"
    print("merges identical:", len(a), "shards")


if __name__ == "__main__":
    main()
