import os, sys, time
sys.path.insert(0, "/root/repo")
from dask_expr_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("exp_scd2", cpus=32)
x100 = "/tmp/dx_bench_x100"
from dask_expr_spark.queries.round7 import scd2_history_orders, _scd2_orders_history
import dask_expr_spark.functions.maintenance as M

# warm
spark.read.parquet(f"{x100}/orders.parquet").count()

def timed(label, fn):
    t0 = time.time(); r = fn(); print(f"{label}: {time.time()-t0:.2f}s"); return r

# full query, 3 reps (error mode = default)
for i in range(3):
    timed(f"full_error_{i}", lambda: scd2_history_orders(spark, x100).collect())

# monkeypatch: skip mode (same output on this data, no eager guard counts)
orig = M.upsert_scd2
def skip_scd2(*a, **kw):
    kw.setdefault("retroactive", "skip")
    return orig(*a, **kw)
import dask_expr_spark.queries.round7 as R7
M_upsert = M.upsert_scd2
M.upsert_scd2 = skip_scd2
# round7 imported upsert_scd2 inside function at call time? check: it does `from ..functions.maintenance import scd2_init, upsert_scd2` inside _scd2_orders_history -> monkeypatching module attr works
for i in range(3):
    timed(f"full_skip_{i}", lambda: scd2_history_orders(spark, x100).collect())
M.upsert_scd2 = M_upsert
