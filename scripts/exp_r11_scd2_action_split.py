import os, sys, time
sys.path.insert(0, "/root/repo")
from dask_expr_spark.session import get_spark
spark = get_spark("exp_scd2_tail", cpus=32)
x100 = "/tmp/dx_bench_x100"
spark.read.parquet(f"{x100}/orders.parquet").count()
from dask_expr_spark.queries.round7 import scd2_history_orders
df = scd2_history_orders(spark, x100)
t0=time.time(); n = df.count(); print(f"count: {n} rows {time.time()-t0:.2f}s")
df2 = scd2_history_orders(spark, x100)
t0=time.time(); df2.write.format("noop").mode("overwrite").save(); print(f"noop(sorted): {time.time()-t0:.2f}s")
df3 = scd2_history_orders(spark, x100)
t0=time.time(); rows = df3.collect(); print(f"collect: {len(rows)} rows {time.time()-t0:.2f}s")
