import os, sys, time
sys.path.insert(0, "/root/repo")
from dask_expr_spark.session import get_spark
import bench as B
from dask_expr_spark.queries import collect_queries
spark = get_spark("sizes", cpus=32)
reg = collect_queries()
x10 = B._ensure_x10(spark, "/root/testdata/sf0.1")
x100 = B._ensure_x100(spark, "/root/testdata/sf0.1")
# candidates: anything whose result might be non-aggregate
for name, d in [("scd2_history_orders", x100), ("cdc_between_snapshots", x10),
                ("cdc_between_generations", x10), ("dedup_substring_spans", "/root/testdata/sf0.1"),
                ("dedup_ngram_jaccard", "/root/testdata/sf0.1"),
                ("window_user_sessions", x10), ("asof_purchase_click", x10),
                ("resample_hourly", x100), ("sample_n_per_group_orders", x100),
                ("split_temporal_events", x100), ("cdc_apply_roundtrip", x10),
                ("dedup_incremental_minhash", "/root/testdata/sf0.1"),
                ("semantic_dedup_kept", "/root/testdata/sf0.1"),
                ("diff_after_upsert", x100), ("delete_where_orders", x10)]:
    try:
        n = reg[name][0](spark, d).count()
        print(f"{name}: {n}", flush=True)
    except Exception as e:
        print(f"{name}: ERR {str(e)[:80]}", flush=True)
