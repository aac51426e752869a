"""Three-decade probes for the round-8 families (SCALE.md
"Round-8 family probes" section).

What each probe is DESIGNED to show at 100 TB, and what would flag it:

- scd2_bootstrap_probe: the window-free bootstrap
  (streaming.scd2_bootstrap) must cost ≈ the plain bucketed WRITE of
  the snapshot, while the sink's first-batch path (upsert_scd2 against
  an empty history) pays a Window.partitionBy(keys) sort on top.  Flag
  = bootstrap growing faster than the write floor.
- pointer_commit_probe: a FIXED-size batch's pointer-commit upsert
  (append new files + one manifest write) must track the rename-swap
  upsert's cost (both are bounded by the touched-partition rewrite),
  with the manifest overhead flat across table decades.  Flag =
  pointer cost growing with TABLE size while the batch is fixed.

Run:  python scripts/scale_probe_r8.py [--decades 10 100]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_expr_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/dx_probe_r8")
OFF = 1_000_000_000


def materialize(spark, table, keys, n):
    """key-offset replica of an sf0.1 table, cached on disk per boot."""
    from pyspark.sql import functions as F

    out = os.path.join(WORK, f"{table}_x{n}.parquet")
    if not os.path.isdir(out):
        base = spark.read.parquet(os.path.join(SF, f"{table}.parquet"))
        r = base.repartition(32).withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        for k in keys:
            r = r.withColumn(k, F.col(k) + F.col("__r").cast("long")
                             * F.lit(OFF))
        r.drop("__r").repartition(32).write.mode("overwrite").parquet(out)
    return out


def t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def scd2_bootstrap_probe(spark, decades):
    import shutil

    from pyspark.sql import functions as F

    from dask_expr_spark.functions.maintenance import (scd2_init,
                                                       upsert_scd2,
                                                       write_bucketed)
    from dask_expr_spark.streaming.ops import scd2_bootstrap

    for n in decades:
        src = materialize(spark, "orders", ["o_orderkey"], n)
        snap = (spark.read.parquet(src)
                .select("o_orderkey", "o_totalprice", "o_orderstatus")
                .withColumn("eff", F.lit(0)))
        n_buckets = 64 * max(1, n // 10)
        base = os.path.join(WORK, f"scd2boot_x{n}")
        shutil.rmtree(base, ignore_errors=True)
        snap.count()     # warm the page cache so ordering can't bias

        # floor: the plain bucketed write of the snapshot
        floor = t(lambda: write_bucketed(
            snap.drop("eff"), os.path.join(base, "floor"),
            ["o_orderkey"], n_buckets))
        # fast path: scd2_bootstrap (no window; includes the
        # uniqueness guard agg)
        fast = t(lambda: scd2_bootstrap(
            spark, os.path.join(base, "fast"), snap, ["o_orderkey"],
            "eff", n_buckets=n_buckets))
        # sink first-batch path: upsert_scd2 against empty history
        # (the Window.partitionBy(keys) pass) + the same write
        def slow_path():
            target = scd2_init(snap.where(F.lit(False)), "eff")
            hist = upsert_scd2(target, snap, ["o_orderkey"], "eff",
                               retroactive="skip")
            cur = hist.where(F.col("is_current")) \
                .drop("valid_to", "is_current")
            write_bucketed(cur, os.path.join(base, "slow"),
                           ["o_orderkey"], n_buckets)
        slow = t(slow_path)
        print(f"scd2_bootstrap x{n}: write_floor={floor}s "
              f"bootstrap={fast}s window_path={slow}s")
        shutil.rmtree(base, ignore_errors=True)


def pointer_commit_probe(spark, decades):
    import shutil

    from pyspark.sql import functions as F

    from dask_expr_spark.functions import maintenance as M

    for n in decades:
        src = materialize(spark, "orders", ["o_orderkey"], n)
        o = spark.read.parquet(src)
        # fixed-size batch: ~15k rows in 2 of the 5 priority partitions
        batch = (o.where((F.col("o_orderkey") % (97 * n) == 0)
                         & F.col("o_orderpriority").isin(
                             "1-URGENT", "3-MEDIUM"))
                 .withColumn("o_totalprice",
                             F.col("o_totalprice") + 1.0))
        for mode in ("rename", "pointer"):
            path = os.path.join(WORK, f"ptr_{mode}_x{n}")
            shutil.rmtree(path, ignore_errors=True)
            o.write.mode("overwrite").partitionBy("o_orderpriority") \
                .parquet(path)
            if mode == "pointer":
                M.manifest_bootstrap(path, "o_orderpriority")
            dt = t(lambda: M.upsert_partitioned(
                spark, path, batch, ["o_orderkey"], "o_orderpriority",
                commit=mode))
            nb = batch.count()
            print(f"pointer_commit x{n} {mode}: {dt}s "
                  f"(batch={nb} rows)")
            shutil.rmtree(path, ignore_errors=True)


def delete_where_probe(spark, decades):
    """delete_where with a FIXED-size hit set (one priority partition's
    %k keys): cost must track the hit partition's rewrite, not the
    table.  Flag = delete cost growing with table size while the hit
    partition share is fixed."""
    import shutil

    from pyspark.sql import functions as F

    from dask_expr_spark.functions import maintenance as M

    for n in decades:
        src = materialize(spark, "orders", ["o_orderkey"], n)
        o = spark.read.parquet(src)
        pred = ((F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_orderkey") % 5 == 0))
        for mode in ("rename", "pointer"):
            path = os.path.join(WORK, f"del_{mode}_x{n}")
            shutil.rmtree(path, ignore_errors=True)
            o.write.mode("overwrite").partitionBy("o_orderpriority") \
                .parquet(path)
            if mode == "pointer":
                M.manifest_bootstrap(path, "o_orderpriority")
            dt = t(lambda: M.delete_where(
                spark, path, pred, "o_orderpriority", commit=mode))
            print(f"delete_where x{n} {mode}: {dt}s "
                  "(1 of 5 partitions hit)")
            shutil.rmtree(path, ignore_errors=True)


def main():
    decades = [int(x) for x in (sys.argv[sys.argv.index("--decades") + 1:]
                                if "--decades" in sys.argv else ["10", "100"])]
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark("scale_probe_r8", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    scd2_bootstrap_probe(spark, decades)
    pointer_commit_probe(spark, decades)
    delete_where_probe(spark, decades)


if __name__ == "__main__":
    main()
