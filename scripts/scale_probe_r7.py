#!/usr/bin/env python
"""Three-decade probes for the round-7 families (SCALE.md
discipline): SCD-2 upsert, row-level CDC, zone-map skipping, PQ
encode/ADC/rerank.  Tables are key-offset replicas of sf0.1 orders
(x10/x100/x1000 → 1.5M/15M/150M rows) and embeddings (x100/x1000 →
200k/2M vectors, per-replica perturbation).

What each probe is DESIGNED to show at 100 TB, and what would flag it:
- upsert_scd2 with a FIXED batch: total cost = one current-rows scan +
  batch-bounded window; per-TABLE-row cost must fall ~linearly with
  table growth (flat total).  Superlinear total = the window leaked to
  table scope.
- cdc_rows between two full states: one full-outer join; ns/row flat.
- build_zonemap: footer-only, cost ∝ files not rows.
- read_skipping with a FIXED-selectivity predicate: the read cost
  follows the MATCHING slice, not the table — the whole point.
- pq_encode: map-only linear.  pq ADC scan with fixed queries: linear
  in corpus with a tiny constant.  rerank join: candidate-sized.

Run:  python scripts/scale_probe_r7.py [--decades 10 100]
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.environ.get("SPARK_GRAFT_R7_SCALE_DIR", "/tmp/dx_r7_scale")
OFF = 1_000_000_000


def materialize(spark, table, key, n, vec_col=None):
    from pyspark.sql import functions as F
    out = os.path.join(ROOT, f"{table}_x{n}.parquet")
    if os.path.exists(out):
        return out
    base = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
    reps = []
    for i in range(n):
        r = base.withColumn(key, F.col(key) + F.lit(i * OFF))
        if vec_col and i > 0:
            r = r.withColumn(
                vec_col,
                F.transform(F.col(vec_col),
                            lambda x, j: x + (F.lit(float(i)) * 1e-3)
                            * F.cos(j.cast("double") + F.lit(float(i)))))
        reps.append(r)
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    u.repartition(max(32, n // 4)).write.mode("overwrite").parquet(out)
    return out


def t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main():
    from pyspark.sql import functions as F

    from dask_expr_spark.functions import maintenance as M
    from dask_expr_spark.functions import similarity as SIM
    from dask_expr_spark.session import get_spark
    from dask_expr_spark.sources import zonemap as Z

    ap = argparse.ArgumentParser()
    ap.add_argument("--decades", type=int, nargs="+",
                    default=[10, 100, 1000])
    args = ap.parse_args()
    spark = get_spark("r7_scale", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    os.makedirs(ROOT, exist_ok=True)
    res: dict = {}

    for n in args.decades:
        tag = f"x{n}"
        opath = materialize(spark, "orders", "o_orderkey", n)
        o = spark.read.parquet(opath).select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice"), 2).alias("price"))
        nrows = o.count()

        # ---- SCD-2: fixed ~15k-row batch against an n-decade history
        hist = M.scd2_init(
            o.withColumn("eff", F.lit(datetime.date(1995, 1, 1))),
            "eff")
        hist = hist.localCheckpoint(eager=True)  # realized history table
        batch = (o.where(F.col("k") % (10 * n) == 0)
                 .withColumn("price", F.round(F.col("price") + 1.0, 2))
                 .withColumn("eff", F.lit(datetime.date(1996, 1, 1))))
        res[f"scd2_upsert_{tag}"] = {
            "rows": nrows,
            "sec": t(lambda: M.upsert_scd2(hist, batch, ["k"], "eff")
                     .count())}
        print(f"scd2_upsert_{tag}", res[f"scd2_upsert_{tag}"], flush=True)

        # ---- CDC between two full states (worst case: all rows join)
        after = o.withColumn(
            "price", F.when(F.col("k") % 97 == 0,
                            F.round(F.col("price") + 5.0, 2))
            .otherwise(F.col("price")))
        res[f"cdc_rows_{tag}"] = {
            "rows": nrows,
            "sec": t(lambda: M.cdc_rows(o, after, ["k"]).count())}
        print(f"cdc_rows_{tag}", res[f"cdc_rows_{tag}"], flush=True)

        # ---- zone maps: build (footer-only) + fixed-slice pruned read
        zt = os.path.join(ROOT, f"orders_zm_x{n}")
        if not os.path.exists(zt):
            src = spark.read.parquet(opath)
            (src.repartitionByRange(max(16, n), "o_orderdate")
             .sortWithinPartitions("o_orderdate")
             .write.mode("overwrite").parquet(zt))
        nfiles = len(Z._data_files(zt))
        res[f"zonemap_build_{tag}"] = {
            "rows": nrows, "files": nfiles,
            "sec": t(lambda: Z.build_zonemap(spark, zt, ["o_orderdate"]))}
        print(f"zonemap_build_{tag}", res[f"zonemap_build_{tag}"],
              flush=True)
        preds = [("o_orderdate", "between",
                  (datetime.datetime(1996, 1, 1),
                   datetime.datetime(1996, 3, 31)))]
        surv, total = Z.zone_prune(spark, zt, preds)
        res[f"zonemap_read_{tag}"] = {
            "rows": nrows, "files_read": len(surv),
            "files_total": total,
            "sec": t(lambda: Z.read_skipping(spark, zt, preds)
                     .agg(F.count(F.lit(1)),
                          F.sum("o_totalprice")).collect()),
            "full_filter_sec": t(
                lambda: spark.read.parquet(zt)
                .where(Z.pred_filter(preds))
                .agg(F.count(F.lit(1)),
                     F.sum("o_totalprice")).collect())}
        print(f"zonemap_read_{tag}", res[f"zonemap_read_{tag}"],
              flush=True)

    # ---- PQ: embeddings decades
    for n in [d for d in args.decades if d >= 100]:
        tag = f"x{n}"
        epath = materialize(spark, "embeddings", "vec_id", n,
                            vec_col="embedding")
        emb = spark.read.parquet(epath)
        nvec = emb.count()
        q = spark.createDataFrame(
            emb.orderBy(F.md5(F.col("vec_id").cast("string")))
            .limit(200).toPandas())
        cb = SIM.pq_train(emb, dim=64, m=8)
        codes = SIM.pq_encode(emb, cb)
        enc_sec = t(lambda: codes.write.mode("overwrite").parquet(
            os.path.join(ROOT, f"codes_{tag}.parquet")))
        codes_p = spark.read.parquet(os.path.join(ROOT,
                                                  f"codes_{tag}.parquet"))
        res[f"pq_encode_{tag}"] = {"vectors": nvec, "sec": enc_sec}
        print(f"pq_encode_{tag}", res[f"pq_encode_{tag}"], flush=True)
        res[f"pq_adc_scan_{tag}"] = {
            "vectors": nvec,
            "sec": t(lambda: SIM.pq_topk(
                emb, q, dim=64, k=10, m=8, codebook=cb,
                codes=codes_p).count())}
        print(f"pq_adc_scan_{tag}", res[f"pq_adc_scan_{tag}"], flush=True)
        res[f"pq_rerank_{tag}"] = {
            "vectors": nvec,
            "sec": t(lambda: SIM.pq_topk(
                emb, q, dim=64, k=10, m=8, codebook=cb, codes=codes_p,
                exact_rerank=100).count())}
        print(f"pq_rerank_{tag}", res[f"pq_rerank_{tag}"], flush=True)

    import json
    print(json.dumps(res))


def scd2_sink_probe(decades=(10, 100)):
    """Streaming SCD-2 sink per-batch cost at scale: bootstrap a
    current table of n-decade rows THROUGH the sink, then time ONE
    20-key CDC micro-batch applied via a checkpoint-resumed query.
    With n_buckets following the sizing contract (buckets ∝ table, so
    per-bucket rows stay constant) the apply touches ≤20 bucket
    directories regardless of table size — flat batch cost is the
    claim; closed-history size never appears at all."""
    import json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dask_expr_spark.session import get_spark
    from dask_expr_spark.streaming import ops as S

    spark = get_spark("scd2_sink_probe", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    res = {}
    for n in decades:
        opath = materialize(spark, "orders", "o_orderkey", n)
        o = (spark.read.parquet(opath)
             .select(F.col("o_orderkey").alias("k"),
                     F.round(F.col("o_totalprice"), 2).alias("p")))
        nrows = o.count()
        n_buckets = 64 * max(1, n // 10)      # sizing contract
        root = tempfile.mkdtemp(prefix=f"scd2p_{n}_")
        src, table, ckpt = (os.path.join(root, d)
                            for d in ("src", "tbl", "ckpt"))
        (o.withColumn("eff", F.lit(0))
         .write.mode("overwrite").parquet(src))
        schema = spark.read.parquet(src).schema

        def start():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 10000).parquet(src))
            return S.scd2_sink(stream, table, ["k"], "eff",
                               n_buckets=n_buckets,
                               checkpoint_dir=ckpt)

        q = start()
        t0 = time.perf_counter()
        q.processAllAvailable()
        boot = round(time.perf_counter() - t0, 2)
        q.stop()
        # one 20-key CDC batch
        (o.limit(20).withColumn("p", F.col("p") + 1.0)
         .withColumn("eff", F.lit(1))
         .coalesce(1).write.mode("append").parquet(src))
        q = start()
        t0 = time.perf_counter()
        q.processAllAvailable()
        batch = round(time.perf_counter() - t0, 2)
        q.stop()
        res[f"scd2_sink_x{n}"] = {
            "rows": nrows, "n_buckets": n_buckets,
            "bootstrap_sec": boot, "batch20_sec": batch}
        print(f"scd2_sink_x{n}", res[f"scd2_sink_x{n}"], flush=True)
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_SCD2_SINK_PROBE"):
        scd2_sink_probe()
    else:
        main()
