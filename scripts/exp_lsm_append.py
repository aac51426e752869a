"""LSM segment-list A/B: per-batch bloom maintenance cost of the
round-10 sparse segment append (bloom_append_snapshot) vs the
pre-LSM dense path (read full index, build dense delta, zip_with OR
merge, rewrite the whole index), on a 1.5M-key x10-scale index with
15k-key batches.  Also times the read side (read_key_bloom fold) at
1 and 5 live segments."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_expr_spark.session import get_spark  # noqa: E402
from dask_expr_spark.functions import maintenance as M  # noqa: E402
from dask_expr_spark.functions import sketches as S  # noqa: E402


def main() -> None:
    spark = get_spark("exp_lsm_append")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))
    base = None
    for i in range(10):
        k = orders.select((F.col("o_orderkey") + i * 10_000_000)
                          .cast("long").alias("key"))
        base = k if base is None else base.unionByName(k)

    def batch(i):
        return (orders.where(F.col("o_orderkey") % 101 == i)
                .select((F.col("o_orderkey") + 90_000_000
                         + i * 1_000_000).cast("long").alias("key")))

    # --- LSM path: bootstrap + 4 sparse appends ---
    tmp = tempfile.mkdtemp(prefix="lsm_ab_")
    lsm = os.path.join(tmp, "lsm")
    t0 = time.perf_counter()
    M.bloom_append_snapshot(spark, lsm, base, ["key"], fpp=1e-6)
    print(f"lsm bootstrap (1.5M keys): {time.perf_counter()-t0:6.2f} s")
    for i in range(4):
        t0 = time.perf_counter()
        M.bloom_append_snapshot(spark, lsm, batch(i), ["key"], fpp=1e-6)
        print(f"lsm sparse append {i} (15k keys): "
              f"{time.perf_counter()-t0:6.2f} s")
    t0 = time.perf_counter()
    idx = M.read_key_bloom(spark, lsm)
    n = idx.count()
    print(f"lsm read fold (5 segments -> {n} shards): "
          f"{time.perf_counter()-t0:6.2f} s")

    # --- pre-LSM dense path (emulated): full read + dense delta +
    #     zip_with merge + full rewrite per batch ---
    dense_dir = os.path.join(tmp, "dense")
    t0 = time.perf_counter()
    full = S.bloom_index(base, "key", fpp=1e-6)
    M.snapshot_write(full, dense_dir)
    print(f"dense bootstrap: {time.perf_counter()-t0:6.2f} s")
    for i in range(4):
        t0 = time.perf_counter()
        cur = M.snapshot_read(spark, dense_dir)
        row = cur.select("m_bits", "k", "shards").first()
        params = (int(row["m_bits"]), int(row["k"]), int(row["shards"]))
        delta = S.bloom_index(batch(i), "key", params=params)
        M.snapshot_write(S.bloom_merge(cur, delta), dense_dir)
        print(f"dense rewrite append {i} (15k keys): "
              f"{time.perf_counter()-t0:6.2f} s")
    t0 = time.perf_counter()
    n = M.snapshot_read(spark, dense_dir).count()
    print(f"dense read ({n} shards): {time.perf_counter()-t0:6.2f} s")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
