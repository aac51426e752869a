import os, sys, time, datetime
sys.path.insert(0, "/root/repo")
from dask_expr_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("exp_scd2b", cpus=32)
x100 = "/tmp/dx_bench_x100"
from dask_expr_spark.sources.io import read_parquet
from dask_expr_spark.functions.maintenance import scd2_init, upsert_scd2

def tbl_orders():
    return (read_parquet(spark, f"{x100}/orders.parquet").to_spark()
            .select(F.col("o_orderkey").alias("k"),
                    F.round(F.col("o_totalprice"), 2).alias("price"),
                    F.col("o_orderstatus").alias("status")))

def build(n_upserts):
    o = tbl_orders()
    base = o.withColumn("eff", F.lit(datetime.date(1995,1,1)))
    hist = scd2_init(base, "eff")
    if n_upserts >= 1:
        u1 = (o.where(F.col("k")%7==0).withColumn("price", F.round(F.col("price")+100.0,2)))
        noop = o.where((F.col("k")%11==0)&(F.col("k")%7!=0))
        b1 = u1.unionByName(noop).withColumn("eff", F.lit(datetime.date(1996,1,1)))
        hist = upsert_scd2(hist, b1, ["k"], "eff")
    if n_upserts >= 2:
        b2 = (o.where(F.col("k")%21==0).withColumn("price", F.round(F.col("price")+300.0,2))
              .withColumn("eff", F.lit(datetime.date(1997,1,1))))
        hist = upsert_scd2(hist, b2, ["k"], "eff")
    return hist

spark.read.parquet(f"{x100}/orders.parquet").count()  # warm

def noop(df):
    df.where(F.col("k")%10==0).write.format("noop").mode("overwrite").save()

import time
for label, n in [("hist0", 0), ("hist1", 1), ("hist2", 2)]:
    for rep in range(2):
        t0=time.time(); noop(build(n)); print(f"{label} rep{rep}: {time.time()-t0:.2f}s")
