"""Phase profile of cdc_between_snapshots on the x10 corpus, plus
file-count audit of snapshot_write versions (guide §1/§6)."""

from __future__ import annotations

import glob
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
from dask_expr_spark.functions.maintenance import (snapshot_cdc,
                                                   snapshot_read,
                                                   snapshot_write,
                                                   upsert)  # noqa: E402
from dask_expr_spark.session import get_spark  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label:40s} {time.perf_counter() - t0:7.2f} s", flush=True)
    return r


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp_cdc_snap")
    registry = collect_queries()
    B._warm_session(spark, registry)
    x10 = B._ensure_x10(spark, sf_dir)

    o = (tbl(spark, x10, "orders").to_spark()
         .select(F.col("o_orderkey").alias("k"),
                 F.round(F.col("o_totalprice"), 2).alias("p")))
    tmp = tempfile.mkdtemp(prefix="exp_cdc_")
    path = os.path.join(tmp, "t")
    t("snapshot_write v0", lambda: snapshot_write(o, path))
    print("   v0 files:",
          len(glob.glob(os.path.join(path, "_v*", "*.parquet"))))
    chg = o.where(F.col("k") % 53 == 0)
    upd = (chg.unionByName(chg.withColumn("k", F.col("k") + 3000000))
           .withColumn("p", F.round(F.col("p") + 500.0, 2)))
    v1 = upsert(snapshot_read(spark, path, 0), upd, ["k"])
    t("snapshot_write v1 (upsert plan)", lambda: snapshot_write(v1, path))
    v2 = snapshot_read(spark, path, 1).where(F.col("k") % 5 != 0)
    t("snapshot_write v2 (filter plan)", lambda: snapshot_write(v2, path))
    out = (snapshot_cdc(spark, path, 0, 2, ["k"])
           .orderBy("change_type", "k"))
    rows = t("snapshot_cdc + collect", out.collect)
    print("   cdc rows:", len(rows))
    t("createDataFrame(rows)",
      lambda: spark.createDataFrame(rows, out.schema))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
