"""Phase-level profile of the upsert_pointer_bloom composite on the
x10 corpus (guide §1: measure where the time goes before changing
anything).  Phases mirror the query body exactly."""

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_pointer_bloom")
    registry = collect_queries()
    B._warm_session(spark, registry)
    x10 = B._ensure_x10(spark, sf_dir)

    for rep in range(2):
        o = tbl(spark, x10, "orders").to_spark()
        tmp = tempfile.mkdtemp(prefix="pb_prof_")
        path = os.path.join(tmp, "t")
        bloom = os.path.join(tmp, "bloom")
        t = {}

        def phase(name):
            t[name] = time.perf_counter()

        phase("write")
        o.write.mode("overwrite").partitionBy("o_orderpriority") \
            .parquet(path)
        phase("bootstrap")
        M.manifest_bootstrap(path, "o_orderpriority")
        phase("bloom_build")
        M.bloom_append_snapshot(spark, bloom,
                                M.read_manifested(spark, path),
                                ["o_orderkey"], fpp=1e-6)
        phase("upsert_insert")
        ins = (o.where((F.col("o_orderkey") % 101 == 0)
                       & (F.col("o_orderpriority") == "4-NOT SPECIFIED"))
               .withColumn("o_orderkey",
                           (F.col("o_orderkey") + F.lit(90000000))
                           .cast("long")))
        M.upsert_partitioned(spark, path, ins, ["o_orderkey"],
                             "o_orderpriority", commit="pointer",
                             key_bloom_path=bloom)
        phase("mover")
        mover = (o.orderBy("o_orderkey").limit(1)
                 .withColumn("o_orderpriority",
                             F.when(F.col("o_orderpriority") == "1-URGENT",
                                    F.lit("2-HIGH"))
                             .otherwise(F.lit("1-URGENT"))))
        try:
            M.upsert_partitioned(spark, path, mover, ["o_orderkey"],
                                 "o_orderpriority", commit="pointer",
                                 key_bloom_path=bloom)
        except ValueError:
            pass
        phase("final_agg")
        from dask_expr_spark.queries._util import cent_sum
        agg = (M.read_manifested(spark, path)
               .groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total")))
        agg.collect()
        phase("end")

        names = list(t)
        print(f"--- rep {rep} ---")
        for a, b in zip(names, names[1:]):
            print(f"{a:16s} {t[b] - t[a]:7.2f} s")
        print(f"{'TOTAL':16s} {t['end'] - t['write']:7.2f} s")
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
