"""Sub-phase profile: where do upsert_insert (7.2s) and mover (3.8s)
go inside upsert_pointer_bloom?  Times each internal piece standalone
on the x10 corpus."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dask_expr_spark.queries import collect_queries  # noqa: E402
from dask_expr_spark.queries._util import tbl  # noqa: E402
from dask_expr_spark.functions import maintenance as M  # noqa: E402
from dask_expr_spark.session import get_spark  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label:42s} {time.perf_counter() - t0:7.2f} s")
    return r


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_pb_sub")
    registry = collect_queries()
    B._warm_session(spark, registry)
    x10 = B._ensure_x10(spark, sf_dir)

    o = tbl(spark, x10, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="pb_sub_")
    path = os.path.join(tmp, "t")
    bloom = os.path.join(tmp, "bloom")
    t("table write", lambda: o.write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(path))
    M.manifest_bootstrap(path, "o_orderpriority")
    t("bloom bootstrap build (fpp 1e-4)",
      lambda: M.bloom_append_snapshot(
          spark, bloom, M.read_manifested(spark, path),
          ["o_orderkey"], fpp=1e-6))

    ins = (o.where((F.col("o_orderkey") % 101 == 0)
                   & (F.col("o_orderpriority") == "4-NOT SPECIFIED"))
           .withColumn("o_orderkey",
                       (F.col("o_orderkey") + F.lit(90000000))
                       .cast("long")))

    # --- pieces of the guarded upsert ---
    parts = [r[0] for r in
             t("parts collect", lambda: ins.select("o_orderpriority")
               .distinct().collect())]
    target = t("read_manifested touched slice (lazy)",
               lambda: M.read_manifested(spark, path,
                                         partition_values=parts))
    cand = (ins.select("o_orderkey").distinct()
            .join(target.select("o_orderkey").distinct(),
                  ["o_orderkey"], "left_anti"))
    t("cand (distinct anti distinct) count", cand.count)
    idx = t("read_key_bloom", lambda: M.read_key_bloom(spark, bloom))
    from dask_expr_spark.functions.sketches import bloom_probe
    probed = bloom_probe(cand.withColumn("__mg_key",
                                         M._key_str(["o_orderkey"])),
                         idx, "__mg_key", result_col="__maybe")
    cand2 = probed.where(F.col("__maybe")).drop("__mg_key", "__maybe")
    t("probe + isEmpty (current guard)", cand2.isEmpty)

    # reordered guard: probe FIRST, anti-join only maybe-hits
    bk = ins.select("o_orderkey").distinct() \
        .withColumn("__mg_key", M._key_str(["o_orderkey"]))
    maybe = (bloom_probe(bk, idx, "__mg_key", result_col="__maybe")
             .where(F.col("__maybe")).drop("__mg_key", "__maybe"))
    t("reordered: probe-first isEmpty", maybe.isEmpty)

    merged = M.upsert(target, ins, ["o_orderkey"])
    t("bloom_append_snapshot delta merge",
      lambda: M.bloom_append_snapshot(spark, bloom, ins,
                                      ["o_orderkey"]))
    man = M.read_commit(path)
    t("_append_and_flip (merge write)",
      lambda: M._append_and_flip(spark, path, merged,
                                 "o_orderpriority", man,
                                 M._resolve_fs(path, None)))

    # --- mover full-scan shapes ---
    mover_key = (o.orderBy("o_orderkey").limit(1)
                 .select("o_orderkey"))
    full = M.read_manifested(spark, path)
    t("full scan CURRENT (distinct + semi)",
      lambda: mover_key.join(full.select("o_orderkey").distinct(),
                             ["o_orderkey"], "left_semi").count())
    t("full scan FLIPPED (bcast semi + distinct)",
      lambda: full.select("o_orderkey")
      .join(F.broadcast(mover_key), ["o_orderkey"], "left_semi")
      .distinct().count())

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
