"""Phase breakdown of the fold->probe pipeline on the layout
exp_fold_ab.py left in /tmp/fold_ab: where do the ~47 s actually go?"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_expr_spark.session import get_spark  # noqa: E402
from dask_expr_spark.functions import sketches as S  # noqa: E402


def t(tag, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{tag:34s} {time.perf_counter() - t0:7.2f} s  -> {r}")
    return r


def main() -> None:
    spark = get_spark("exp_fold_phase")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))
    dirs = ["/tmp/fold_ab/dense"] + [f"/tmp/fold_ab/seg{i}" for i in range(4)]
    segs = spark.read.option("mergeSchema", "true").parquet(*dirs)
    batch = orders.select(F.col("o_orderkey").cast("long").alias("key"))

    # phase 1: fold alone (new impl), materialized via count
    t("fold(new).count", lambda: S.bloom_fold_segments(segs).count())
    t("fold(new).count again", lambda: S.bloom_fold_segments(segs).count())
    # phase 2: fold collected to driver (what the broadcast build does)
    t("fold(new).collect len",
      lambda: len(S.bloom_fold_segments(segs).collect()))
    # phase 3: checkpointed fold, then probe
    idx = S.bloom_fold_segments(segs).localCheckpoint(eager=True)
    t("probe vs checkpointed idx",
      lambda: S.bloom_probe(batch, idx, "key")
      .where(F.col("maybe_in_index")).count())
    t("probe again",
      lambda: S.bloom_probe(batch, idx, "key")
      .where(F.col("maybe_in_index")).count())
    # phase 4: probe with params passed (no first() job)
    row = idx.select("m_bits", "k", "shards").first()
    t("probe with explicit params",
      lambda: S.bloom_probe(batch, idx, "key",
                            m_bits=int(row["m_bits"]), k=int(row["k"]),
                            num_shards=int(row["shards"]))
      .where(F.col("maybe_in_index")).count())
    # phase 5: probe a plain parquet dense index (no fold at all)
    dense_r = spark.read.parquet("/tmp/fold_ab/dense")
    t("probe vs plain dense parquet",
      lambda: S.bloom_probe(batch, dense_r, "key")
      .where(F.col("maybe_in_index")).count())
    # phase 6: small batch probe (the upsert guard shape)
    small = batch.limit(15000).localCheckpoint(eager=True)
    t("probe 15k vs checkpointed idx",
      lambda: S.bloom_probe(small, idx, "key")
      .where(F.col("maybe_in_index")).count())


if __name__ == "__main__":
    main()
