"""A/B experiments for the pointer-bloom composite (guide §1):
1. file counts of the appended merge slice and the bloom snapshot;
2. bloom k/m trade: optimal-k at fpp=1e-6 (k=20) vs wide-m/low-k
   parameter points with equal-or-better fpp;
3. overlap: bloom delta-merge concurrent with the merge-slice write.
"""

from __future__ import annotations

import glob
import math
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dask_expr_spark.queries import collect_queries  # noqa: E402
from dask_expr_spark.queries._util import tbl  # noqa: E402
from dask_expr_spark.functions import maintenance as M  # noqa: E402
from dask_expr_spark.functions.sketches import (bloom_index, bloom_merge,
                                                bloom_probe)  # noqa: E402
from dask_expr_spark.session import get_spark  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label:48s} {time.perf_counter() - t0:7.2f} s", flush=True)
    return r


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp_pb1")
    registry = collect_queries()
    B._warm_session(spark, registry)
    x10 = B._ensure_x10(spark, sf_dir)
    o = tbl(spark, x10, "orders").to_spark()
    n = 1_500_000

    tmp = tempfile.mkdtemp(prefix="exp_pb1_")
    path = os.path.join(tmp, "t")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    M.manifest_bootstrap(path, "o_orderpriority")

    kdf = M.read_manifested(spark, path).select(
        M._key_str(["o_orderkey"]).alias("__k"))
    ins = (o.where((F.col("o_orderkey") % 101 == 0)
                   & (F.col("o_orderpriority") == "4-NOT SPECIFIED"))
           .withColumn("o_orderkey",
                       (F.col("o_orderkey") + F.lit(90000000))
                       .cast("long")))
    ins_k = ins.select(M._key_str(["o_orderkey"]).alias("__k"))
    probe_k = ins.select("o_orderkey").distinct().withColumn(
        "__mg_key", M._key_str(["o_orderkey"]))

    # ---- 2. k/m parameter points ------------------------------------
    LN2 = math.log(2.0)

    def params_for(bits_per_key, k):
        m_total = int(n * bits_per_key)
        shards = max(1, (m_total + (1 << 24) - 1) >> 24)
        m_shard = int(math.ceil(m_total / shards / 32.0)) * 32
        return (m_shard, k, shards)

    def fpp_of(bpk, k):
        return (1 - math.exp(-k / bpk)) ** k

    points = [("optimal fpp=1e-6 (k=20)", None),
              ("k=10 bpk=38.4", params_for(38.4, 10)),
              ("k=8  bpk=48", params_for(48.0, 8)),
              ("k=7  bpk=64", params_for(64.0, 7))]
    for label, params in points:
        bdir = os.path.join(tmp, "b_" + label.split()[0].replace("=", ""))
        if params is None:
            idx = bloom_index(kdf, "__k", fpp=1e-6)
        else:
            print(f"   ({label}: fpp={fpp_of(int(label.split('bpk=')[1]) if 0 else float(label.split('bpk=')[1]), params[1]):.2e})")
            idx = bloom_index(kdf, "__k", params=params)
        t(f"build+write {label}",
          lambda: M.snapshot_write(idx, bdir))
        files = glob.glob(os.path.join(bdir, "_v*", "*.parquet"))
        size = sum(os.path.getsize(f) for f in files)
        print(f"   bloom files={len(files)} bytes={size/1e6:.1f} MB")
        cur = M.snapshot_read(spark, bdir)
        pb = bloom_probe(probe_k, cur, "__mg_key", result_col="__m")
        hits = t(f"probe {label}",
                 lambda: pb.where(F.col("__m")).count())
        print(f"   maybe-hits={hits}")
        delta = bloom_index(
            ins_k, "__k",
            params=tuple(int(cur.select("m_bits", "k", "shards")
                             .first()[i]) for i in range(3)))
        t(f"merge+rewrite {label}",
          lambda: M.snapshot_write(bloom_merge(cur, delta), bdir))

    # ---- 1. merge-slice file shape -----------------------------------
    parts = ["4-NOT SPECIFIED"]
    target = M.read_manifested(spark, path,
                               partition_values=[(p,) for p in parts])
    merged = M.upsert(target, ins, ["o_orderkey"])
    man = M.read_commit(path)
    fs = M._resolve_fs(path, None)
    t("_append_and_flip (sequential)",
      lambda: M._append_and_flip(spark, path, merged, "o_orderpriority",
                                 man, fs, parts=[(p,) for p in parts]))
    head = M.read_commit(path)
    d = "o_orderpriority=4-NOT SPECIFIED"
    fresh = M.manifest_files(head, path, fs=fs, dirs=[d])
    sizes = [os.path.getsize(f) for f in fresh]
    print(f"   appended slice files={len(fresh)} "
          f"median={sorted(sizes)[len(sizes)//2]/1e3:.0f} KB "
          f"total={sum(sizes)/1e6:.1f} MB")

    # ---- 3. overlap bloom merge with slice write ---------------------
    bdir = os.path.join(tmp, "b_k10")
    ins2 = ins.withColumn("o_orderkey", F.col("o_orderkey") + 1)
    merged2 = M.upsert(M.read_manifested(
        spark, path, partition_values=[(p,) for p in parts]),
        ins2, ["o_orderkey"])
    man2 = M.read_commit(path)

    def bloom_job():
        cur = M.snapshot_read(spark, bdir)
        delta = bloom_index(
            ins2.select(M._key_str(["o_orderkey"]).alias("__k")), "__k",
            params=tuple(int(cur.select("m_bits", "k", "shards")
                             .first()[i]) for i in range(3)))
        M.snapshot_write(bloom_merge(cur, delta), bdir)

    def seq():
        bloom_job()
        M._append_and_flip(spark, path, merged2, "o_orderpriority",
                           man2, fs, parts=[(p,) for p in parts])

    t("bloom merge + flip SEQUENTIAL", seq)

    ins3 = ins.withColumn("o_orderkey", F.col("o_orderkey") + 2)
    merged3 = M.upsert(M.read_manifested(
        spark, path, partition_values=[(p,) for p in parts]),
        ins3, ["o_orderkey"])
    man3 = M.read_commit(path)

    def par():
        th = threading.Thread(target=bloom_job)
        th.start()
        M._append_and_flip(spark, path, merged3, "o_orderpriority",
                           man3, fs, parts=[(p,) for p in parts])
        th.join()

    t("bloom merge + flip OVERLAPPED", par)

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
