"""Capture .explain("formatted") for the maintenance-layer frames this
round's optimizations changed (the composites collect() internally, so
their returned frames explain as LocalRelations — the evidence lives
in the INTERNAL frames).  For the write-layout change the BEFORE shape
is emulated by bypassing _merge_write_layout (the round-start code
wrote the frame as-is).

Writes plans/r10/<name>_{before,after}.txt where both shapes are
reproducible, plans/r10/<name>_after.txt alone where the before code
no longer exists (bloom hash family — before shape described in
OPTIMIZATION_r10.md from the git history).
"""

from __future__ import annotations

import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from contextlib import redirect_stdout  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from dask_expr_spark.queries import collect_queries  # noqa: E402
from dask_expr_spark.queries._util import tbl  # noqa: E402
from dask_expr_spark.functions import maintenance as M  # noqa: E402
from dask_expr_spark.functions.sketches import (bloom_index,
                                                bloom_probe)  # noqa: E402
from dask_expr_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r10")


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, name + ".txt"), "w") as fh:
        fh.write(buf.getvalue())
    print("wrote", name)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_maint_plans")
    B._warm_session(spark, collect_queries())
    x10 = B._ensure_x10(spark, sf_dir)
    o = tbl(spark, x10, "orders").to_spark()

    tmp = tempfile.mkdtemp(prefix="plan_maint_")
    path = os.path.join(tmp, "t")
    (o.hint("rebalance", "o_orderpriority")
     .write.mode("overwrite").partitionBy("o_orderpriority")
     .parquet(path))
    M.manifest_bootstrap(path, "o_orderpriority")
    fs = M._resolve_fs(path, None)

    ins = (o.where((F.col("o_orderkey") % 101 == 0)
                   & (F.col("o_orderpriority") == "4-NOT SPECIFIED"))
           .withColumn("o_orderkey",
                       (F.col("o_orderkey") + F.lit(90000000))
                       .cast("long")))
    target = M.read_manifested(spark, path,
                               partition_values=[("4-NOT SPECIFIED",)])
    merged = M.upsert(target, ins, ["o_orderkey"])

    # 1. merge-slice append layout: before = raw frame (one sliver per
    #    task per dir), after = rebalance by the partition dirs
    dump("upsert_merge_append_before", merged)
    dump("upsert_merge_append_after",
         M._merge_write_layout(spark, path, merged,
                               ["o_orderpriority"], fs))

    # 2. bloom index build cells (wide-m/half-k, xxhash64): the
    #    round-start shape (md5+conv positions, optimal k) exists only
    #    in git history — see OPTIMIZATION_r10.md
    kdf = M.read_manifested(spark, path).select(
        M._key_str(["o_orderkey"]).alias("__k"))
    dump("bloom_index_build_after", bloom_index(kdf, "__k", fpp=1e-6))

    # 3. bloom probe (broadcast cells join + half-k forall loop)
    idx = bloom_index(kdf, "__k", fpp=1e-6).localCheckpoint(eager=True)
    probe = ins.select("o_orderkey").distinct().withColumn(
        "__mg_key", M._key_str(["o_orderkey"]))
    dump("bloom_probe_after",
         bloom_probe(probe, idx, "__mg_key", result_col="__maybe"))

    # 4. move-guard exact fallback: batch-sized candidate set
    #    broadcast against a streamed column-pruned table scan
    cand = ins.select("o_orderkey").limit(10)
    dump("move_guard_full_scan_after",
         M.read_manifested(spark, path).select("o_orderkey")
         .join(F.broadcast(cand), ["o_orderkey"], "left_semi")
         .distinct())

    # 5. generation CDC between pointer generations (pruned to
    #    differing dirs; result materializes via localCheckpoint in
    #    the query — this is the pre-checkpoint compute plan)
    M.upsert_partitioned(spark, path,
                         o.where((F.col("o_orderkey") % 53 == 0)
                                 & (F.col("o_orderpriority")
                                    == "2-HIGH"))
                         .withColumn("o_totalprice",
                                     F.col("o_totalprice") + 50.0),
                         ["o_orderkey"], "o_orderpriority",
                         commit="pointer")
    dump("manifested_cdc_after",
         M.manifested_cdc(spark, path, 0, 1, ["o_orderkey"],
                          compare_cols=["o_totalprice"]))

    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
