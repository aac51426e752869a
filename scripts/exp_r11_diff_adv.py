"""A/B AQE advisory partition size for diff_after_upsert's full-outer
exchange (VERDICT r10 item 5).  Same session, interleaved arms so the
in-session aging class hits every arm equally.

Usage: python scripts/exp_r11_diff_adv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

from dask_expr_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("exp_diff", cpus=32)
    x100 = B._ensure_x100(spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                                "/root/testdata/sf0.1"))
    from dask_expr_spark.queries import collect_queries
    fn = collect_queries()["diff_after_upsert"][0]
    spark.read.parquet(f"{x100}/orders.parquet").count()
    fn(spark, x100).collect()    # warm the shape once

    arms = ["64m", "128m", "256m", "32m"]
    runs: dict[str, list[float]] = {a: [] for a in arms}
    for rep in range(4):
        for a in arms:
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", a)
            t0 = time.perf_counter()
            fn(spark, x100).collect()
            runs[a].append(time.perf_counter() - t0)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
    for a in arms:
        r = sorted(runs[a])
        print(f"advisory {a:5s} med {r[len(r)//2]:6.2f}s "
              f"{['%.2f' % x for x in runs[a]]}", flush=True)


if __name__ == "__main__":
    main()
