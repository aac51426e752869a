"""Round-7 batch: the durability / incremental-maintenance family
completed — profile-from-rollups (no raw rescan), key-bucketed upsert
(partition-pruned merges for unpartitioned tables), versioned
snapshots with time travel (manifest-pointer commits), per-directory
compaction targets, grouped KMV intersection (incl. the one-sided-
group fix), and the bucketed streaming CDC-apply sink.

Oracle discipline as in rounds 5/6: every md5-derived estimate
reproduces HASH-EXACTLY in SQL; rollup approximations carry tolerance
flags anchored to exact values computed on both sides.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ._util import cent_sum, cent_sum_sql, tbl

QUERIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


# -- profile_from_rollups (quality.profile_from_rollups over
#    sketches.moments_rollup + hist_rollup + hll_rollup): the full
#    per-column profile answered from rollups built at a FINER grain
#    (status × month) and merged — the raw table is never rescanned.
#    Exact anchors (n, nulls, min, max, cent-exact mean) hash-exact;
#    the rollup estimates carry tolerance flags -----------------------
_PB, _PLO, _PHI = 256, 800.0, 600000.0

PROFILE_ROLLUP_SQL = f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(0 AS BIGINT) AS nulls,
       min(o_totalprice) AS min_val, max(o_totalprice) AS max_val,
       round({cent_sum_sql('o_totalprice')} / count(*), 2) AS mean_r,
       TRUE AS mean_ok, TRUE AS std_ok, TRUE AS q50_ok,
       TRUE AS distinct_ok
FROM orders GROUP BY 1 ORDER BY 1
"""


@q("profile_from_rollups_orders", PROFILE_ROLLUP_SQL)
def profile_from_rollups_orders(spark, sf_dir):
    """maintain the three mergeable rollups at (status, month) grain,
    then profile at status grain from the rollups ALONE: counts/
    moments/min/max merge exactly (hash-checked vs the raw table), the
    histogram median lands within one bin width, and the HLL distinct
    within 10% — the incremental 'profile 100 TB without rescanning
    it' path."""
    from ..functions.quality import profile_from_rollups
    from ..functions.sketches import hist_rollup, hll_rollup, moments_rollup

    o = (tbl(spark, sf_dir, "orders").to_spark()
         .withColumn("month", F.date_trunc("month", F.col("o_orderdate"))))
    keys = ["o_orderstatus", "month"]
    mom = moments_rollup(o, keys, "o_totalprice")
    hst = hist_rollup(o, keys, "o_totalprice", bins=_PB, lo=_PLO, hi=_PHI)
    hll = hll_rollup(o.withColumn("__s", F.col("o_totalprice")
                                  .cast("string")), keys, "__s")
    prof = profile_from_rollups(mom, hst, hll, ["o_orderstatus"],
                                quantiles=(0.5,))
    exact = (o.groupBy("o_orderstatus")
             .agg((cent_sum(F.col("o_totalprice"))
                   / F.count(F.lit(1))).alias("__mean_x"),
                  F.stddev_samp("o_totalprice").alias("__std_x"),
                  F.expr("percentile(o_totalprice, 0.5)").alias("__p50_x"),
                  F.countDistinct("o_totalprice").alias("__d_x")))
    bin_w = (_PHI - _PLO) / _PB
    j = prof.join(exact, "o_orderstatus")
    return (j.select(
        "o_orderstatus", "n", "nulls", "min_val", "max_val",
        F.round(F.col("__mean_x"), 2).alias("mean_r"),
        (F.abs(F.col("mean") - F.col("__mean_x"))
         <= 1e-6 * F.abs(F.col("__mean_x"))).alias("mean_ok"),
        (F.abs(F.col("stddev") - F.col("__std_x"))
         <= 1e-6 * F.abs(F.col("__std_x"))).alias("std_ok"),
        (F.abs(F.col("q50") - F.col("__p50_x"))
         <= F.lit(bin_w)).alias("q50_ok"),
        (F.abs(F.col("distinct") - F.col("__d_x"))
         <= 0.10 * F.col("__d_x")).alias("distinct_ok"))
        .orderBy("o_orderstatus"))


# -- key-bucketed upsert (maintenance.write_bucketed/upsert_bucketed):
#    an unpartitioned table gets partition-pruned merges via md5 hive
#    buckets; the touched-bucket COUNT is md5-deterministic and
#    reproduces exactly in SQL, untouched bucket FILES are asserted
#    byte-identical ---------------------------------------------------
_NB = 16
_BKT_SQL_EXPR = ("('0x' || substr(md5('bkt:' || CAST({k} AS VARCHAR)), "
                 f"1, 15))::BIGINT % {_NB}")

UPSERT_BUCKETED_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 500.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 53 = 0
  UNION ALL
  SELECT o_orderkey + 3000000, o_custkey, o_orderstatus,
         o_totalprice + 500.0, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 53 = 0
),
merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u
                    WHERE u.o_orderkey = o.o_orderkey)
),
nb AS (
  SELECT CAST(count(DISTINCT {_BKT_SQL_EXPR.format(k='o_orderkey')})
              AS BIGINT) AS n_buckets_touched
  FROM upd
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       min(nb.n_buckets_touched) AS n_buckets_touched,
       TRUE AS untouched_ok
FROM merged, nb GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("upsert_bucketed_roundtrip", UPSERT_BUCKETED_SQL)
def upsert_bucketed_roundtrip(spark, sf_dir):
    import glob

    from ..functions.maintenance import (read_bucketed, upsert_bucketed,
                                         write_bucketed)

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="upsert_bkt_")
    path = os.path.join(tmp, "t")
    try:
        write_bucketed(o, path, ["o_orderkey"], _NB)
        before = {f: os.path.getsize(f)
                  for f in glob.glob(path + "/__bucket=*/*.parquet")}
        base = o.where(F.col("o_orderkey") % 53 == 0)
        updates = (base.unionByName(
            base.withColumn("o_orderkey", F.col("o_orderkey") + 3000000))
            .withColumn("o_totalprice", F.col("o_totalprice") + 500.0))
        touched = upsert_bucketed(spark, path, updates, ["o_orderkey"])
        after = {f: os.path.getsize(f)
                 for f in glob.glob(path + "/__bucket=*/*.parquet")}
        tdirs = tuple(f"__bucket={b}{os.sep}" for b in touched)
        untouched_ok = all(
            before.get(f) == sz for f, sz in after.items()
            if not any(d in f for d in tdirs)) and all(
            f in after for f in before
            if not any(d in f for d in tdirs))
        back = read_bucketed(spark, path)
        out = (back.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .withColumn("n_buckets_touched",
                           F.lit(len(touched)).cast("long"))
               .withColumn("untouched_ok", F.lit(bool(untouched_ok)))
               .orderBy("o_orderstatus"))
        # collect is QUERY-WRAPPER-only, bounded by the 3-row status
        # aggregate: the temp table is deleted in `finally`, so a lazy
        # frame would read a vanished path.  The operator itself
        # (upsert_bucketed) never collects — don't copy this pattern
        # into operator code for unbounded results.
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- versioned snapshots (maintenance.snapshot_write/read/vacuum): the
#    manifest-pointer commit protocol — three commits, every historic
#    version time-travel-readable, vacuum drops the oldest and keeps
#    the rest; per-version aggregates reconstruct in SQL from first
#    principles ------------------------------------------------------
SNAPSHOT_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_totalprice + 200.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey + 3000000, o_totalprice + 200.0
  FROM orders WHERE o_orderkey % 97 = 0
),
v1 AS (
  SELECT o_orderkey, o_totalprice FROM upd
  UNION ALL
  SELECT o.o_orderkey, o.o_totalprice FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u
                    WHERE u.o_orderkey = o.o_orderkey)
),
states AS (
  SELECT 0 AS version, o_orderkey, o_totalprice FROM orders
  UNION ALL
  SELECT 1, o_orderkey, o_totalprice FROM v1
  UNION ALL
  SELECT 2, o_orderkey, o_totalprice FROM v1 WHERE o_orderkey % 5 <> 0
)
SELECT CAST(version AS BIGINT) AS version,
       CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS vacuum_ok
FROM states GROUP BY version ORDER BY version
"""


@q("snapshot_time_travel", SNAPSHOT_SQL)
def snapshot_time_travel(spark, sf_dir):
    """three commits to a snapshot table (base, SCD-1 upsert, delete),
    read back by VERSION — time travel over the manifest pointer; then
    vacuum(keep=2) must drop exactly v0 and keep v1/v2 readable."""
    from ..functions.maintenance import (snapshot_read, snapshot_vacuum,
                                         snapshot_write, upsert)

    o = (tbl(spark, sf_dir, "orders").to_spark()
         .select("o_orderkey", "o_totalprice"))
    tmp = tempfile.mkdtemp(prefix="snap_tt_")
    path = os.path.join(tmp, "t")
    try:
        snapshot_write(o, path)
        base = o.where(F.col("o_orderkey") % 97 == 0)
        upd = (base.unionByName(
            base.withColumn("o_orderkey", F.col("o_orderkey") + 3000000))
            .withColumn("o_totalprice", F.col("o_totalprice") + 200.0))
        v1 = upsert(snapshot_read(spark, path, 0), upd, ["o_orderkey"])
        snapshot_write(v1, path)
        v2 = (snapshot_read(spark, path, 1)
              .where(F.col("o_orderkey") % 5 != 0))
        snapshot_write(v2, path)
        per_v = [
            snapshot_read(spark, path, v)
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total"))
            .withColumn("version", F.lit(v).cast("long"))
            for v in (0, 1, 2)]
        rows = per_v[0].unionByName(per_v[1]).unionByName(per_v[2]) \
            .collect()
        dropped = snapshot_vacuum(path, keep=2)
        v0_gone = False
        try:
            snapshot_read(spark, path, 0)
        except ValueError:
            v0_gone = True
        vacuum_ok = (dropped == [0] and v0_gone
                     and snapshot_read(spark, path, 1) is not None
                     and snapshot_read(spark, path, 2) is not None)
        out = spark.createDataFrame(
            [(r["version"], r["n"], r["total"], bool(vacuum_ok))
             for r in rows],
            "version long, n long, total double, vacuum_ok boolean")
        return out.orderBy("version")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- grouped KMV intersection with a ONE-SIDED group (the round-6
#    ADVICE fix): status P exists only on side A, so its intersection
#    must be 0 and its union the A-side estimate — the whole grouped
#    computation reproduces hash-exactly in SQL ----------------------
_K7 = 128
_SPACE7 = "1152921504606846976.0"  # 2^60

KMV_GROUPED_SQL = f"""
WITH src AS (
  SELECT 'a' AS side, o_orderstatus AS g, o_orderkey FROM orders
  WHERE o_totalprice < 150000
  UNION ALL
  SELECT 'b', o_orderstatus, o_orderkey FROM orders
  WHERE o_custkey % 3 = 0 AND o_orderstatus <> 'P'
),
h AS (
  SELECT DISTINCT side, g,
         ('0x' || substr(md5('kmv:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM src
),
r AS (SELECT side, g, hv,
             row_number() OVER (PARTITION BY side, g ORDER BY hv) AS rn
      FROM h),
sk AS (SELECT side, g, hv FROM r WHERE rn <= {_K7}),
uu AS (SELECT g, hv,
              row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
       FROM (SELECT DISTINCT g, hv FROM sk)),
u AS (SELECT g, hv FROM uu WHERE rn <= {_K7}),
stats AS (
  SELECT u.g, count(*) AS szu, max(u.hv) AS hku,
         count(*) FILTER (WHERE
           EXISTS (SELECT 1 FROM sk x
                   WHERE x.side = 'a' AND x.g = u.g AND x.hv = u.hv)
           AND EXISTS (SELECT 1 FROM sk y
                       WHERE y.side = 'b' AND y.g = u.g AND y.hv = u.hv)
         ) AS rho
  FROM u GROUP BY u.g
),
est AS (
  SELECT g, rho, szu,
         CASE WHEN szu < {_K7} THEN szu
              ELSE CAST(floor({_K7 - 1}.0 * {_SPACE7}
                              / CAST(hku AS DOUBLE)) AS BIGINT)
         END AS union_est
  FROM stats
)
SELECT g AS o_orderstatus,
       CAST(floor(CAST(rho AS DOUBLE) / CAST(szu AS DOUBLE)
                  * CAST(union_est AS DOUBLE)) AS BIGINT) AS inter_est,
       union_est
FROM est ORDER BY 1
"""


@q("kmv_intersect_grouped", KMV_GROUPED_SQL)
def kmv_intersect_grouped(spark, sf_dir):
    from ..functions.sketches import kmv_intersect, kmv_rollup

    o = tbl(spark, sf_dir, "orders").to_spark()
    a = o.where(F.col("o_totalprice") < 150000)
    b = o.where((F.col("o_custkey") % 3 == 0)
                & (F.col("o_orderstatus") != "P"))
    ra = kmv_rollup(a, ["o_orderstatus"], "o_orderkey", k=_K7)
    rb = kmv_rollup(b, ["o_orderstatus"], "o_orderkey", k=_K7)
    return (kmv_intersect(ra, rb, ["o_orderstatus"])
            .orderBy("o_orderstatus"))


# -- per-directory compaction targets (maintenance.compact_parquet
#    with partition_col, the round-6 ADVICE fix): each hive dir folds
#    to its own byte target (here: exactly 1 file), the data is
#    byte-identical, and the crash-safe swap leaves no debris ---------
COMPACT_PART_SQL = f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS per_dir_ok, TRUE AS reduced_ok
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("compact_partitioned_files", COMPACT_PART_SQL)
def compact_partitioned_files(spark, sf_dir):
    import glob

    from ..functions.maintenance import compact_parquet

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="compact_part_")
    path = os.path.join(tmp, "t")
    try:
        (o.repartition(24).write.mode("overwrite")
         .partitionBy("o_orderstatus").parquet(path))
        before, after = compact_parquet(spark, path, target_mb=512,
                                        partition_col="o_orderstatus")
        dirs = glob.glob(path + "/o_orderstatus=*")
        per_dir_ok = all(
            len(glob.glob(d + "/*.parquet")) == 1 for d in dirs)
        reduced_ok = (after == len(dirs) and before > after
                      and not os.path.isdir(path + "__new")
                      and not os.path.isdir(path + "__old"))
        back = spark.read.parquet(path)
        out = (back.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .withColumn("per_dir_ok", F.lit(bool(per_dir_ok)))
               .withColumn("reduced_ok", F.lit(bool(reduced_ok)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- bucketed streaming CDC-apply (streaming/ops.py upsert_sink with
#    n_buckets): the stream_upsert_snapshot scenario on a table with
#    NO natural partition column — each micro-batch prunes to the md5
#    bucket directories its keys hash into instead of rewriting the
#    snapshot; final state hash-exact from first principles ----------
STREAM_UPSERT_BKT_SQL = """
WITH fin AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 300.0
              ELSE o_totalprice END AS price
  FROM orders
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total,
       CAST(3 AS INT) AS last_v, TRUE AS layout_ok
FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("stream_upsert_bucketed", STREAM_UPSERT_BKT_SQL)
def stream_upsert_bucketed(spark, sf_dir):
    import time

    from ..functions.maintenance import is_bucketed, read_bucketed
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_ubkt_src_")
    tbl_dir = tempfile.mkdtemp(prefix="stream_ubkt_tbl_")
    table_path = os.path.join(tbl_dir, "t")
    ckpt = tempfile.mkdtemp(prefix="stream_ubkt_ckpt_")
    try:
        o = tbl(spark, sf_dir, "orders").to_spark()
        stamped: set = set()
        base_t = time.time() - 60
        for i in range(4):
            inserts = o.where((F.col("o_orderkey") % 4 == i)
                              & (F.col("o_orderkey") % 10 != 0))
            recrawl = (o.where(F.col("o_orderkey") % 10 == 0)
                       .withColumn("o_totalprice",
                                   F.col("o_totalprice") + 100.0 * i))
            (inserts.unionByName(recrawl)
             .withColumn("__v", F.lit(i))
             .coalesce(1).write.mode("append").parquet(src))
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in stamped:
                    t = base_t + i * 10
                    os.utime(os.path.join(src, f), (t, t))
                    stamped.add(f)
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q_ = S.upsert_sink(stream, table_path, ["o_orderkey"],
                           n_buckets=16, order_col="__v",
                           checkpoint_dir=ckpt)
        try:
            q_.processAllAvailable()
        finally:
            q_.stop()
        layout_ok = is_bucketed(table_path) and all(
            d.startswith(("__bucket=", "_", "."))
            for d in os.listdir(table_path))
        snap = read_bucketed(spark, table_path)
        out = (snap.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"),
                    F.max(F.when(F.col("o_orderkey") % 10 == 0,
                                 F.col("__v"))).alias("last_v"))
               .withColumn("layout_ok", F.lit(bool(layout_ok)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tbl_dir, ignore_errors=True)


# -- SCD-2 history upsert (maintenance.upsert_scd2): two update
#    batches over an initialized history — change detection, no-op
#    collapse, chained versioning (every %21 key is a %7 key, so it
#    versions twice) — the full history reconstructs in SQL from first
#    principles (the oracle enumerates the expected validity
#    intervals).  Slice to %10 keys for a bounded hash -------------
SCD2_HIST_SQL = """
WITH src AS (
  SELECT o_orderkey AS k, round(o_totalprice, 2) AS price
  FROM orders WHERE o_orderkey % 10 = 0
),
rows AS (
  SELECT k, price, DATE '1995-01-01' AS valid_from,
         CASE WHEN k % 7 = 0 THEN DATE '1996-01-01' END AS valid_to
  FROM src
  UNION ALL
  SELECT k, round(price + 100.0, 2), DATE '1996-01-01',
         CASE WHEN k % 21 = 0 THEN DATE '1997-01-01' END
  FROM src WHERE k % 7 = 0
  UNION ALL
  SELECT k, round(price + 300.0, 2), DATE '1997-01-01', NULL
  FROM src WHERE k % 21 = 0
)
SELECT k, price, CAST(valid_from AS TIMESTAMP) AS valid_from,
       CAST(valid_to AS TIMESTAMP) AS valid_to,
       valid_to IS NULL AS is_current
FROM rows ORDER BY k, valid_from
"""


def _scd2_orders_history(spark, sf_dir):
    import datetime

    from ..functions.maintenance import scd2_init, upsert_scd2

    o = (tbl(spark, sf_dir, "orders").to_spark()
         .select(F.col("o_orderkey").alias("k"),
                 F.round(F.col("o_totalprice"), 2).alias("price"),
                 F.col("o_orderstatus").alias("status")))
    base = o.withColumn("eff", F.lit(datetime.date(1995, 1, 1)))
    hist = scd2_init(base, "eff")
    u1 = (o.where(F.col("k") % 7 == 0)
          .withColumn("price", F.round(F.col("price") + 100.0, 2)))
    noop = o.where((F.col("k") % 11 == 0) & (F.col("k") % 7 != 0))
    b1 = (u1.unionByName(noop)
          .withColumn("eff", F.lit(datetime.date(1996, 1, 1))))
    hist = upsert_scd2(hist, b1, ["k"], "eff")
    b2 = (o.where(F.col("k") % 21 == 0)
          .withColumn("price", F.round(F.col("price") + 300.0, 2))
          .withColumn("eff", F.lit(datetime.date(1997, 1, 1))))
    return upsert_scd2(hist, b2, ["k"], "eff")


@q("scd2_history_orders", SCD2_HIST_SQL)
def scd2_history_orders(spark, sf_dir):
    """history-keeping upsert: init at 1995, +100 for %7 keys at 1996
    (plus a no-op batch for %11 keys — must COLLAPSE, changing
    nothing), +300-over-base for %21 keys at 1997 (a second version of
    keys already versioned once).  The oracle enumerates the exact
    expected (value, valid_from, valid_to, is_current) interval set —
    any wrong close-out date, lost row, or surviving no-op flips the
    hash."""
    hist = _scd2_orders_history(spark, sf_dir)
    return (hist.where(F.col("k") % 10 == 0)
            .select("k", "price",
                    F.col("valid_from").cast("timestamp_ntz")
                    .alias("valid_from"),
                    F.col("valid_to").cast("timestamp_ntz")
                    .alias("valid_to"),
                    "is_current")
            .orderBy("k", "valid_from"))


# -- scd2_asof: time travel over the same history — the state as of
#    mid-1996 must equal "base with +100 applied to %7 keys", which the
#    oracle computes directly --------------------------------------
SCD2_ASOF_SQL = f"""
WITH state AS (
  SELECT o_orderstatus AS status,
         CASE WHEN o_orderkey % 7 = 0
              THEN round(round(o_totalprice, 2) + 100.0, 2)
              ELSE round(o_totalprice, 2) END AS price
  FROM orders
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('price')} AS total
FROM state GROUP BY status ORDER BY status
"""


@q("scd2_asof_snapshot", SCD2_ASOF_SQL)
def scd2_asof_snapshot(spark, sf_dir):
    import datetime

    from ..functions.maintenance import scd2_asof

    hist = _scd2_orders_history(spark, sf_dir)
    asof = scd2_asof(hist, datetime.date(1996, 6, 1))
    return (asof.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("price")).alias("total"))
            .orderBy("status"))


# -- row-level CDC between snapshot versions (maintenance.snapshot_cdc
#    over snapshot_write time travel): v0 = base, v1 = SCD-1 upsert
#    (updates + inserts), v2 = delete %5 keys; cdc(v0 -> v2) must emit
#    exactly the insert/update/delete record set the oracle derives
#    from one full-outer join ---------------------------------------
CDC_SNAP_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, round(o_totalprice, 2) AS p FROM orders
),
upd AS (
  SELECT k, round(p + 500.0, 2) AS p FROM base WHERE k % 53 = 0
  UNION ALL
  SELECT k + 3000000, round(p + 500.0, 2) FROM base WHERE k % 53 = 0
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT b.* FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.k = b.k)
),
v2 AS (SELECT * FROM v1 WHERE k % 5 <> 0),
j AS (
  SELECT coalesce(a.k, b.k) AS k, a.p AS p_before, b.p AS p_after,
         a.k IS NOT NULL AS ina, b.k IS NOT NULL AS inb
  FROM base a FULL OUTER JOIN v2 b ON a.k = b.k
)
SELECT CASE WHEN NOT ina THEN 'insert'
            WHEN NOT inb THEN 'delete'
            ELSE 'update' END AS change_type,
       k, p_before, p_after
FROM j
WHERE NOT ina OR NOT inb OR p_before <> p_after
ORDER BY change_type, k
"""


@q("cdc_between_snapshots", CDC_SNAP_SQL)
def cdc_between_snapshots(spark, sf_dir):
    from ..functions.maintenance import (snapshot_cdc, snapshot_read,
                                         snapshot_write, upsert)

    o = (tbl(spark, sf_dir, "orders").to_spark()
         .select(F.col("o_orderkey").alias("k"),
                 F.round(F.col("o_totalprice"), 2).alias("p")))
    tmp = tempfile.mkdtemp(prefix="cdc_snap_")
    path = os.path.join(tmp, "t")
    try:
        snapshot_write(o, path)
        chg = o.where(F.col("k") % 53 == 0)
        upd = (chg.unionByName(
            chg.withColumn("k", F.col("k") + 3000000))
            .withColumn("p", F.round(F.col("p") + 500.0, 2)))
        v1 = upsert(snapshot_read(spark, path, 0), upd, ["k"])
        snapshot_write(v1, path)
        v2 = snapshot_read(spark, path, 1).where(F.col("k") % 5 != 0)
        snapshot_write(v2, path)
        out = (snapshot_cdc(spark, path, 0, 2, ["k"])
               .orderBy("change_type", "k"))
        # materialize JVM-side before `finally` deletes the snapshot
        # table: the old collect+createDataFrame wrapper shipped every
        # CDC record through the Python driver TWICE (guide §5 — 345k
        # rows at x10, ~4 s); localCheckpoint severs the lineage at
        # block-manager cost instead, no row ever crossing to Python.
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- zone-map data skipping (sources/zonemap.py): a date-clustered
#    table, one footer-only manifest build, then a range read that
#    provably opens FEWER FILES (pruned_ok) while returning exactly
#    the plain filter's rows — the oracle is the plain filter --------
ZONEMAP_SQL = f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS pruned_ok, TRUE AS files_ok
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                      AND TIMESTAMP '1996-12-31 23:59:59'
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("zonemap_skipping_dates", ZONEMAP_SQL)
def zonemap_skipping_dates(spark, sf_dir):
    import datetime

    from ..sources import zonemap as Z

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="zm_q_")
    path = os.path.join(tmp, "t")
    try:
        (o.repartitionByRange(16, "o_orderdate")
         .sortWithinPartitions("o_orderdate").write.parquet(path))
        Z.build_zonemap(spark, path, ["o_orderdate"])
        preds = [("o_orderdate", "between",
                  (datetime.datetime(1996, 1, 1),
                   datetime.datetime(1996, 12, 31, 23, 59, 59)))]
        surv, total = Z.zone_prune(spark, path, preds)
        got = Z.read_skipping(spark, path, preds)
        files_ok = (set(f.replace("file://", "")
                        for f in got.inputFiles()) == set(surv))
        out = (got.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .withColumn("pruned_ok",
                           F.lit(bool(0 < len(surv) < total)))
               .withColumn("files_ok", F.lit(bool(files_ok)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- product-quantized ANN (similarity.pq_train/pq_encode/pq_topk):
#    8-byte-per-vector ADC retrieval; deterministic seeded codebook →
#    deterministic coverage, so the same CONTAINMENT oracle as the
#    LSH/IVF paths applies (exact top-1 per query, kept only when the
#    PQ candidate set found it; full containment measured at both test
#    SFs, recall table in SCALE.md) ---------------------------------


def ann_pq_topk(spark, sf_dir):
    """PQ/ADC retrieval (m=16 sub-quantizers, 256 centroids each —
    16 bytes/vector, 32× smaller than the float64 column): codes
    stream through a lookup-table kernel, no float vector touched at
    scan time.  Containment oracle as in ann_lsh_bucketed: exact top-1
    per query, kept only when PQ's top-5 found it — seeded sample +
    seeded k-means make coverage a fixed property of the data."""
    from ..functions import similarity as SIM

    emb = tbl(spark, sf_dir, "embeddings").to_spark()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = SIM.pq_topk(emb, queries, dim=64, k=5, m=16) \
        .select("query_id", "neighbor_id")
    exact1 = SIM.cosine_topk(emb, queries, "vec_id", "embedding", k=1)
    return (exact1.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .select("query_id", "neighbor_id",
                    F.round(F.col("cos"), 6).alias("cos"))
            .orderBy("query_id"))


from .similarity import ANN_TOP1_SQL  # noqa: E402  (shared oracle)

QUERIES["ann_pq_topk"] = (ann_pq_topk, ANN_TOP1_SQL)


def ann_pq_rerank(spark, sf_dir):
    """PQ's second stage (exact_rerank=100): the ADC shortlist's float
    vectors join back candidate-sized and exact cosine re-ranks — the
    measured fix for the quantization-resolution limit (SCALE.md: 0.35
    → 1.0 recall on the near-dup corpus at ~1/20 the exact scan's
    cost).  Containment oracle: exact top-1 per query, kept only when
    the reranked top-5 found it."""
    from ..functions import similarity as SIM

    emb = tbl(spark, sf_dir, "embeddings").to_spark()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = SIM.pq_topk(emb, queries, dim=64, k=5, m=8,
                         exact_rerank=100) \
        .select("query_id", "neighbor_id")
    exact1 = SIM.cosine_topk(emb, queries, "vec_id", "embedding", k=1)
    return (exact1.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .select("query_id", "neighbor_id",
                    F.round(F.col("cos"), 6).alias("cos"))
            .orderBy("query_id"))


QUERIES["ann_pq_rerank"] = (ann_pq_rerank, ANN_TOP1_SQL)


# -- streaming SCD-2 CDC-apply (streaming/ops.py scd2_sink): four
#    micro-batches — %10 keys re-crawl with a new price every batch
#    (each change closes the old version and opens a new one), other
#    keys insert once in their k%4 batch — the FULL history aggregate
#    reconstructs in SQL from first principles (version counts, both
#    populations' cent-sums, and the closed rows' interval structure
#    via sums of the validity endpoints) -----------------------------
STREAM_SCD2_SQL = f"""
WITH ten AS (
  SELECT o_orderkey AS k, o_orderstatus AS s,
         round(o_totalprice, 2) AS p
  FROM orders WHERE o_orderkey % 10 = 0
),
others AS (
  SELECT o_orderkey AS k, o_orderstatus AS s,
         round(o_totalprice, 2) AS p,
         CAST(o_orderkey % 4 AS BIGINT) AS vf
  FROM orders WHERE o_orderkey % 10 <> 0
),
hist AS (
  SELECT k, s, round(p + 100.0 * g.i, 2) AS price,
         CAST(g.i AS BIGINT) AS vf,
         CASE WHEN g.i < 3 THEN CAST(g.i + 1 AS BIGINT) END AS vt
  FROM ten, (VALUES (0), (1), (2), (3)) AS g(i)
  UNION ALL
  SELECT k, s, p, vf, NULL FROM others
)
SELECT s AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE vt IS NULL) AS BIGINT) AS n_current,
       {cent_sum_sql('CASE WHEN vt IS NULL THEN price ELSE 0 END')}
         AS total_current,
       {cent_sum_sql('CASE WHEN vt IS NOT NULL THEN price ELSE 0 END')}
         AS total_closed,
       CAST(sum(vf) AS BIGINT) AS sum_vf,
       CAST(sum(vt) AS BIGINT) AS sum_vt
FROM hist GROUP BY s ORDER BY s
"""


@q("stream_scd2_history", STREAM_SCD2_SQL)
def stream_scd2_history(spark, sf_dir):
    import time

    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_scd2_src_")
    tbl_dir = tempfile.mkdtemp(prefix="stream_scd2_tbl_")
    table_path = os.path.join(tbl_dir, "t")
    ckpt = tempfile.mkdtemp(prefix="stream_scd2_ckpt_")
    try:
        o = (tbl(spark, sf_dir, "orders").to_spark()
             .select(F.col("o_orderkey").alias("k"),
                     F.col("o_orderstatus").alias("s"),
                     F.round(F.col("o_totalprice"), 2).alias("price")))
        stamped: set = set()
        base_t = time.time() - 60
        for i in range(4):
            inserts = o.where((F.col("k") % 4 == i)
                              & (F.col("k") % 10 != 0))
            recrawl = (o.where(F.col("k") % 10 == 0)
                       .withColumn("price", F.round(
                           F.col("price") + 100.0 * i, 2)))
            (inserts.unionByName(recrawl)
             .withColumn("eff", F.lit(i).cast("long"))
             .coalesce(1).write.mode("append").parquet(src))
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in stamped:
                    t = base_t + i * 10
                    os.utime(os.path.join(src, f), (t, t))
                    stamped.add(f)
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q_ = S.scd2_sink(stream, table_path, ["k"], "eff",
                         n_buckets=16, checkpoint_dir=ckpt)
        try:
            q_.processAllAvailable()
        finally:
            q_.stop()
        S.compact_scd2_closed(spark, table_path)
        hist = S.read_scd2(spark, table_path)
        out = (hist.groupBy("s")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.count_if(F.col("is_current")).alias("n_current"),
                    cent_sum(F.when(F.col("is_current"), F.col("price"))
                             .otherwise(0.0)).alias("total_current"),
                    cent_sum(F.when(~F.col("is_current"), F.col("price"))
                             .otherwise(0.0)).alias("total_closed"),
                    F.sum("valid_from").alias("sum_vf"),
                    F.sum("valid_to").alias("sum_vt"))
               .select(F.col("s").alias("o_orderstatus"), "n_rows",
                       "n_current", "total_current", "total_closed",
                       "sum_vf", "sum_vt")
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tbl_dir, ignore_errors=True)


def ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composition (similarity.ivfpq_topk): cells bound WHICH
    vectors score (nprobe/num_cells of the corpus), PQ codes bound
    WHAT ships through the cell join (m bytes vs dim floats — 64×
    less corpus shuffle at dim=64/m=8), and the exact re-rank stage
    restores float ordering over the shortlist.  Containment oracle as
    the other ANN paths (deterministic Lloyd seeding + seeded
    codebooks → deterministic coverage)."""
    from ..functions import similarity as SIM

    emb = tbl(spark, sf_dir, "embeddings").to_spark()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = SIM.ivfpq_topk(emb, queries, dim=64, k=5, m=16,
                            num_cells=16, nprobe=12, exact_rerank=100) \
        .select("query_id", "neighbor_id")
    exact1 = SIM.cosine_topk(emb, queries, "vec_id", "embedding", k=1)
    return (exact1.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .select("query_id", "neighbor_id",
                    F.round(F.col("cos"), 6).alias("cos"))
            .orderBy("query_id"))


QUERIES["ann_ivfpq_topk"] = (ann_ivfpq_topk, ANN_TOP1_SQL)


# -- temporal train/val split with embargo (sampling.split_temporal):
#    the leakage-safe split for event data — strictly-older train, a
#    dropped buffer around the boundary, reproducible from a literal
#    cutoff; the oracle is the same CASE from first principles -------
SPLIT_TEMPORAL_SQL = f"""
WITH s AS (
  SELECT CASE WHEN ts < TIMESTAMP '2024-01-20' - INTERVAL 3 DAY
              THEN 'train'
              WHEN ts >= TIMESTAMP '2024-01-20' THEN 'val'
              ELSE 'embargo' END AS split,
         value, user_id
  FROM events
)
SELECT split, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('value')} AS total,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM s GROUP BY split ORDER BY split
"""


@q("split_temporal_events", SPLIT_TEMPORAL_SQL)
def split_temporal_events(spark, sf_dir):
    import datetime

    from ..functions.sampling import split_temporal

    ev = tbl(spark, sf_dir, "events").to_spark()
    s = split_temporal(ev, "ts",
                       cutoff=datetime.datetime(2024, 1, 20),
                       embargo="3 days")
    return (s.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("value")).alias("total"),
                 F.countDistinct("user_id").alias("n_users"))
            .orderBy("split"))


# -- z-order layout × zone-map skipping, composed: the manifest over a
#    z-ordered table prunes a filter on the TRAILING sort dimension
#    (o_totalprice), where a lead-clustered layout reads everything —
#    the synthesis of sources/layout.py and sources/zonemap.py; the
#    oracle is the plain filter --------------------------------------
ZM_ZORDER_SQL = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS pruned_ok, TRUE AS files_ok
FROM orders WHERE o_totalprice > 450000
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@q("zonemap_zorder_trailing", ZM_ZORDER_SQL)
def zonemap_zorder_trailing(spark, sf_dir):
    from ..sources import zonemap as Z
    from ..sources.io import read_parquet

    o = tbl(spark, sf_dir, "orders")[
        ["o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"]]
    tmp = tempfile.mkdtemp(prefix="zm_zorder_")
    path = os.path.join(tmp, "t")
    try:
        o.to_parquet(path, sort_by=["o_orderdate", "o_totalprice"],
                     cluster=("zorder", 16))
        Z.build_zonemap(spark, path, ["o_orderdate", "o_totalprice"])
        preds = [("o_totalprice", ">", 450000.0)]
        surv, total = Z.zone_prune(spark, path, preds)
        got = Z.read_skipping(spark, path, preds)
        files_ok = (set(f.replace("file://", "")
                        for f in got.inputFiles()) == set(surv))
        out = (got.groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .withColumn("pruned_ok",
                           F.lit(bool(0 < len(surv) < total)))
               .withColumn("files_ok", F.lit(bool(files_ok)))
               .orderBy("o_orderpriority"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- schema evolution on merge (maintenance.upsert evolve_schema=True
#    via align_schemas): a re-crawl batch carries a NEW quality-score
#    column — old rows get null, the merge is otherwise the SCD-1
#    semantics; reconstructed in SQL with an explicit NULL column ----
UPSERT_EVOLVE_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, round(o_totalprice + 500.0, 2) AS o_totalprice,
         o_orderstatus,
         round(o_totalprice, 0) / 600000.0 AS quality
  FROM orders WHERE o_orderkey % 41 = 0
),
merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT o_orderkey, round(o_totalprice, 2), o_orderstatus,
         CAST(NULL AS DOUBLE)
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u
                    WHERE u.o_orderkey = o.o_orderkey)
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       CAST(count(quality) AS BIGINT) AS n_scored,
       round(avg(quality), 6) AS avg_quality
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("upsert_evolve_schema", UPSERT_EVOLVE_SQL)
def upsert_evolve_schema(spark, sf_dir):
    from ..functions.maintenance import upsert

    o = (tbl(spark, sf_dir, "orders").to_spark()
         .select("o_orderkey",
                 F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
                 "o_orderstatus"))
    upd = (o.where(F.col("o_orderkey") % 41 == 0)
           .withColumn("quality",
                       F.round(F.col("o_totalprice"), 0) / 600000.0)
           .withColumn("o_totalprice",
                       F.round(F.col("o_totalprice") + 500.0, 2)))
    merged = upsert(o, upd, ["o_orderkey"], evolve_schema=True)
    return (merged.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total"),
                 F.count("quality").alias("n_scored"),
                 F.round(F.avg("quality"), 6).alias("avg_quality"))
            .orderBy("o_orderstatus"))


# -- CDC loop closed (maintenance.cdc_apply): replay the change
#    records cdc_rows produced onto the before-state and land exactly
#    the after-state — change-sized shipping instead of snapshots; the
#    roundtrip is audited in-query with table_diff (all-unchanged) and
#    the oracle recomputes the after-state directly ------------------
CDC_APPLY_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k, round(o_totalprice, 2) AS p,
         o_orderstatus AS s
  FROM orders
),
upd AS (
  SELECT k, round(p + 500.0, 2) AS p, s FROM base WHERE k % 53 = 0
  UNION ALL
  SELECT k + 3000000, round(p + 500.0, 2), s FROM base WHERE k % 53 = 0
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT b.* FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.k = b.k)
),
after AS (SELECT * FROM v1 WHERE k % 5 <> 0)
SELECT s AS o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('p')} AS total, TRUE AS roundtrip_ok
FROM after GROUP BY s ORDER BY s
"""


@q("cdc_apply_roundtrip", CDC_APPLY_SQL)
def cdc_apply_roundtrip(spark, sf_dir):
    from ..functions.maintenance import (cdc_apply, cdc_rows,
                                         table_diff, upsert)

    before = (tbl(spark, sf_dir, "orders").to_spark()
              .select(F.col("o_orderkey").alias("k"),
                      F.round(F.col("o_totalprice"), 2).alias("p"),
                      F.col("o_orderstatus").alias("s")))
    chg = before.where(F.col("k") % 53 == 0)
    upd = (chg.unionByName(chg.withColumn("k", F.col("k") + 3000000))
           .withColumn("p", F.round(F.col("p") + 500.0, 2)))
    after = upsert(before, upd, ["k"]).where(F.col("k") % 5 != 0)
    # materialize the change records and the applied state once
    # (lazy localCheckpoint): the audit and the final aggregation both
    # consume `applied`, whose lineage embeds the full-outer cdc_rows
    # join — left lazy, that join (and the upsert under it) re-ran per
    # consumer.  The change records are exactly the artifact a real
    # CDC pipeline ships, so checkpointing them is the pattern, not a
    # cache trick (guide §5; A/B 8.2-13.1 s -> 4.6 s at x10).
    cdc = cdc_rows(before, after, ["k"]).localCheckpoint(eager=False)
    applied = cdc_apply(before, cdc, ["k"]).localCheckpoint(eager=False)
    audit = table_diff(applied, after, ["k"]).collect()[0]
    roundtrip_ok = (audit["n_added"] == 0 and audit["n_removed"] == 0
                    and audit["n_changed"] == 0)
    out = (applied.groupBy("s")
           .agg(F.count(F.lit(1)).alias("n"),
                cent_sum(F.col("p")).alias("total"))
           .select(F.col("s").alias("o_orderstatus"), "n", "total")
           .withColumn("roundtrip_ok", F.lit(bool(roundtrip_ok)))
           .orderBy("o_orderstatus"))
    return spark.createDataFrame(out.collect(), out.schema)
