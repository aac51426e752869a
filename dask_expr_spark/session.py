"""SparkSession factory tuned for the dask_expr_spark engine.

One session config for correctness + scale:
- AQE on (runtime re-plan: skew joins, dynamic coalesce, broadcast
  conversion) — replaces the reference's hand-rolled split_out tuning
  (/root/reference/dask_expr/_groupby.py:229) and its broadcast-join
  partition-count heuristic (/root/reference/dask_expr/_merge.py:281).
- Arrow on for all pandas interchange (toPandas / createDataFrame /
  pandas UDFs).
- UTC session timezone so timestamp semantics match the parquet data
  and the DuckDB oracle.
- shuffle.partitions sized to local cores; on a real cluster AQE
  coalesces, and the 128 MB advisory partition size mirrors the
  reference's partition_size default
  (/root/reference/dask_expr/_shuffle.py:833).
- runtime bloom-filter join reduction stays at Spark defaults (ON,
  10 MB creation / 10 GB probe-scan thresholds): at 100 TB a shuffle
  join whose build side carries a selective filter gets a
  might_contain() probe-side pre-filter injected automatically —
  proven against this session config in
  tests/test_scale_ops.py::test_runtime_bloom_filter_reduces_shuffle_join.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _local_dir() -> str | None:
    """Shuffle/spill scratch placement (guide §2.1: local disk bandwidth
    can be the tighter shuffle limit).  This box's /tmp disk sustains
    ~333 MB/s and collapses under writeback (measured: a 150M-row
    full-outer join's median went 24.6 s → 4.7-6.1 s, and a bucketed
    upsert 84 s → 9.5 s, moving scratch to tmpfs — OPTIMIZATION_r10.md).

    tmpfs is OPT-IN (ADVICE r10 / VERDICT r10 item 9): shuffle spill
    exists to relieve memory pressure, and RAM-backed scratch fails
    with ENOSPC/OOM exactly when memory is already tight — a 100 TB
    shuffle must never land in tmpfs.  The default on an unconfigured
    box is therefore Spark's own default (/tmp).  Order:
    - SPARK_GRAFT_LOCAL_DIR (explicit path wins — on a real cluster
      point it at the instance-store NVMe mounts, comma-separated);
    - SPARK_GRAFT_TMPFS_SCRATCH=1 → /dev/shm, but only when the tmpfs
      has ≥16 GiB free (bench-scale shuffles peak well under that;
      anything bigger belongs on disk).  bench.py sets this flag for
      the local measured box and records the resolved dir in
      BENCH_DETAIL.json."""
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env:
        return env
    if (os.environ.get("SPARK_GRAFT_TMPFS_SCRATCH") == "1"
            and os.path.isdir("/dev/shm")
            and os.access("/dev/shm", os.W_OK)):
        try:
            st = os.statvfs("/dev/shm")
            free = st.f_bavail * st.f_frsize
        except OSError:
            free = 0
        if free >= 16 * 1024**3:
            return "/dev/shm/spark_local"
    return None


def get_spark(app_name: str = "dask_expr_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # 24g measured faster AND more stable than 90g on local[32] at
        # sf0.1 (large heaps → multi-second GC pauses that dominate
        # sub-second queries); override via SPARK_GRAFT_DRIVER_MEM for
        # bigger local scale factors
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # parquet TIMESTAMP(NANOS) (events.ts) is otherwise unreadable;
        # read as int64 nanos and convert at the source layer
        # (sources/io.py) — DuckDB equally truncates ns→µs on read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    ld = _local_dir()
    if ld:
        builder = builder.config("spark.local.dir", ld)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
