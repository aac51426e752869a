"""Round-8 batch: the object-store-safe commit layer made visible —
the pointer-commit (manifest-flip) upsert protocol proven against the
DuckDB merge oracle with zero renames of table data, and zone maps
composed with snapshot time travel (a manifest built over a committed
version directory prunes reads of THAT version).

Oracle discipline as in rounds 5-7: merges reproduce exactly in SQL;
layout/commit invariants (untouched manifest entries, zero renames,
files_read == survivors) are asserted in-query as boolean columns the
oracle pins TRUE.
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


# -- pointer-commit upsert (maintenance.upsert_partitioned
#    commit="pointer"): the object-store protocol end-to-end — adopt a
#    hive table via manifest_bootstrap, merge a batch by APPENDING new
#    files + one atomic manifest flip, read back via read_manifested.
#    In-query invariants: no rename of any table path (os.rename /
#    os.replace instrumented for the call window), untouched
#    partitions keep their exact manifest file lists, and vacuum
#    removes the superseded files without changing the result --------
UPSERT_POINTER_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 750.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders
  WHERE o_orderkey % 61 = 0
    AND o_orderpriority IN ('2-HIGH', '5-LOW')
),
merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u
                    WHERE u.o_orderkey = o.o_orderkey)
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS no_renames, TRUE AS untouched_ok, TRUE AS vacuum_ok
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("upsert_pointer_roundtrip", UPSERT_POINTER_SQL)
def upsert_pointer_roundtrip(spark, sf_dir):
    from ..functions.maintenance import (manifest_bootstrap,
                                         read_manifested,
                                         upsert_partitioned,
                                         vacuum_manifested)

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="upsert_ptr_")
    path = os.path.join(tmp, "t")
    try:
        (o.hint("rebalance", "o_orderpriority")   # guide §6: dir-sized
         .write.mode("overwrite").partitionBy("o_orderpriority")
         .parquet(path))
        man0 = manifest_bootstrap(path, "o_orderpriority")
        updates = (o.where((F.col("o_orderkey") % 61 == 0)
                           & F.col("o_orderpriority").isin(
                               "2-HIGH", "5-LOW"))
                   .withColumn("o_totalprice",
                               F.col("o_totalprice") + 750.0))
        moves = []
        real_rename, real_replace = os.rename, os.replace

        def spy_rename(src, dst):
            if str(src).startswith(tmp):
                moves.append(src)
            return real_rename(src, dst)

        def spy_replace(src, dst):
            if str(src).startswith(tmp):
                moves.append(src)
            return real_replace(src, dst)

        os.rename, os.replace = spy_rename, spy_replace
        try:
            upsert_partitioned(spark, path, updates, ["o_orderkey"],
                               "o_orderpriority", commit="pointer")
        finally:
            os.rename, os.replace = real_rename, real_replace
        # NOTE: moves may contain the _commit.json temp-rename on the
        # local PosixFS (whose write_text_atomic IS temp+rename); data
        # paths must be rename-free
        no_renames = all(p.endswith(("_commit.json.tmp", "_commit.json"))
                         for p in moves)
        from ..functions.maintenance import read_commit
        man1 = read_commit(path)
        touched = {"o_orderpriority=2-HIGH", "o_orderpriority=5-LOW"}
        untouched_ok = all(
            man1["partitions"][d] == man0["partitions"][d]
            for d in man0["partitions"] if d not in touched)
        agg0 = (read_manifested(spark, path)
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"),
                     cent_sum(F.col("o_totalprice")).alias("total"))
                .orderBy("o_orderstatus"))
        rows0 = agg0.collect()
        removed = vacuum_manifested(path)
        rows1 = (read_manifested(spark, path)
                 .groupBy("o_orderstatus")
                 .agg(F.count(F.lit(1)).alias("n"),
                      cent_sum(F.col("o_totalprice")).alias("total"))
                 .orderBy("o_orderstatus").collect())
        vacuum_ok = (removed > 0) and (rows0 == rows1)
        out = (spark.createDataFrame(rows0, agg0.schema)
               .withColumn("no_renames", F.lit(bool(no_renames)))
               .withColumn("untouched_ok", F.lit(bool(untouched_ok)))
               .withColumn("vacuum_ok", F.lit(bool(vacuum_ok)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- multimodal resize stub contract (functions/multimodal.py
#    resize_images): this container has no Pillow, so the resize step
#    is a documented stub — and the CONTRACT of that stub is what the
#    oracle pins: every oversized payload passes through byte-
#    untouched with stubbed=true / resized=false and width/height
#    reporting the payload's REAL parsed dims (never the unapplied
#    target), small payloads pass with both flags false.  If Pillow
#    ever appears in the environment the hash flips loudly (n_resized
#    stops being 0), which is exactly the alarm wanted --------------
MM_RESIZE_STUB_SQL = """
WITH d AS (
  SELECT doc_id,
         doc_id % 1024 + 1 AS w,
         (doc_id * 7) % 768 + 1 AS h
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (greatest(w, h) > 256) AS BIGINT)
         AS n_stubbed,
       CAST(0 AS BIGINT) AS n_resized,
       CAST(count(*) FILTER (greatest(w, h) <= 256) AS BIGINT)
         AS n_passthrough,
       CAST(sum(w) AS BIGINT) AS sum_w,
       CAST(sum(h) AS BIGINT) AS sum_h
FROM d
"""


@q("multimodal_resize_stub", MM_RESIZE_STUB_SQL)
def multimodal_resize_stub(spark, sf_dir):
    import struct

    from ..functions import multimodal as MM

    @F.pandas_udf("binary")
    def payload(ids):
        def mk(i):
            i = int(i)
            w, h = i % 1024 + 1, (i * 7) % 768 + 1
            if i % 2 == 0:
                return (b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR"
                        + struct.pack(">II", w, h) + b"\x08\x06"
                        + b"\x00" * 10)
            return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8
        return ids.apply(mk)

    docs = tbl(spark, sf_dir, "documents").to_spark()
    with_bin = docs.select("doc_id", payload("doc_id").alias("payload"))
    out = MM.resize_images(with_bin, "doc_id", "payload", max_side=256)
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("stubbed")).alias("n_stubbed"),
        F.count_if(F.col("resized")).alias("n_resized"),
        F.count_if(~F.col("stubbed") & ~F.col("resized")
                   & F.col("width").isNotNull()).alias("n_passthrough"),
        F.sum("width").alias("sum_w"),
        F.sum("height").alias("sum_h"))


# -- zone maps × snapshot time travel (sources/zonemap.py over a
#    maintenance.snapshot_write version directory): each committed
#    version is its own immutable table, so a manifest builds over the
#    OLD version's directory and read_skipping answers a historical
#    range query opening only surviving files — the oracle is the old
#    version's content, which by construction is plain `orders` ------
ZM_SNAPSHOT_SQL = f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS pruned_ok, TRUE AS files_ok, TRUE AS version_ok
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01'
                      AND TIMESTAMP '1997-06-30 23:59:59'
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("zonemap_snapshot_version", ZM_SNAPSHOT_SQL)
def zonemap_snapshot_version(spark, sf_dir):
    """v0 commits the raw date-clustered orders; v1 commits a
    corrupted successor (prices +1e6 — a poison the query would
    surface instantly if time travel leaked).  The zone map builds
    over v0's directory, prunes the half-year range to fewer files,
    and the pruned read matches the plain-orders oracle — proving
    manifest, version isolation, and pruning compose."""
    import datetime

    from ..functions.maintenance import (snapshot_read,
                                         snapshot_version_dir,
                                         snapshot_write)
    from ..sources import zonemap as Z

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="zm_snap_")
    path = os.path.join(tmp, "t")
    try:
        v0_df = (o.repartitionByRange(16, "o_orderdate")
                 .sortWithinPartitions("o_orderdate"))
        snapshot_write(v0_df, path)
        snapshot_write(o.withColumn(
            "o_totalprice", F.col("o_totalprice") + 1e6), path)
        vdir = snapshot_version_dir(path, 0)
        Z.build_zonemap(spark, vdir, ["o_orderdate"])
        preds = [("o_orderdate", "between",
                  (datetime.datetime(1997, 1, 1),
                   datetime.datetime(1997, 6, 30, 23, 59, 59)))]
        surv, total = Z.zone_prune(spark, vdir, preds)
        got = Z.read_skipping(spark, vdir, preds)
        files_ok = (set(f.replace("file://", "")
                        for f in got.inputFiles()) == set(surv))
        # version isolation: the flagship anchor must match the
        # snapshot_read of v0, not the poisoned current version
        version_ok = (
            snapshot_read(spark, path, 0).where(
                Z.pred_filter(preds)).count() == got.count()
            and snapshot_read(spark, path).where(
                F.col("o_totalprice") > 9e5).count() > 0)
        out = (got.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .withColumn("pruned_ok",
                           F.lit(bool(0 < len(surv) < total)))
               .withColumn("files_ok", F.lit(bool(files_ok)))
               .withColumn("version_ok", F.lit(bool(version_ok)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- pointer-table compaction (maintenance.compact_manifested): the
#    lifecycle closer — four pointer upserts accrete small files in
#    one partition dir, compaction folds them to the per-dir target
#    with a single manifest flip, vacuum clears the superseded
#    originals, and rows hash-match the SQL merge throughout --------
COMPACT_PTR_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 111.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders
  WHERE o_orderkey % 71 = 0 AND o_orderpriority = '4-NOT SPECIFIED'
),
merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u
                    WHERE u.o_orderkey = o.o_orderkey)
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS compacted_ok, TRUE AS vacuum_ok
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("compact_manifested_files", COMPACT_PTR_SQL)
def compact_manifested_files(spark, sf_dir):
    from ..functions.maintenance import (compact_manifested,
                                         manifest_bootstrap,
                                         read_commit, read_manifested,
                                         upsert_partitioned,
                                         vacuum_manifested)

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="compact_ptr_")
    path = os.path.join(tmp, "t")
    try:
        (o.hint("rebalance", "o_orderpriority")   # guide §6: dir-sized
         .write.mode("overwrite").partitionBy("o_orderpriority")
         .parquet(path))
        manifest_bootstrap(path, "o_orderpriority")
        # four small upserts into one dir -> file accretion.  The
        # merge layout targets advisoryPartitionSizeInBytes, so at the
        # session's real advisory each upsert would land as ONE
        # right-sized file and compaction would have no work; shrink
        # the advisory for the setup writes to emulate the table
        # compaction exists for (an engine that wrote the dir with a
        # small advisory / many tiny slices), then compact under the
        # real one.  Result rows are unchanged — only the setup
        # table's file layout differs.
        upd = o.where((F.col("o_orderkey") % 71 == 0)
                      & (F.col("o_orderpriority")
                         == "4-NOT SPECIFIED"))
        _ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        adv = spark.conf.get(_ADV)
        spark.conf.set(_ADV, "1kb")
        try:
            for i in range(4):
                delta = 111.0 if i == 3 else float(100 + i)
                batch = upd.withColumn("o_totalprice",
                                       F.col("o_totalprice") + delta)
                upsert_partitioned(spark, path, batch, ["o_orderkey"],
                                   "o_orderpriority", commit="pointer")
        finally:
            spark.conf.set(_ADV, adv)
        man0 = read_commit(path)
        dirty = "o_orderpriority=4-NOT SPECIFIED"
        fb, fa = compact_manifested(spark, path, target_mb=512)
        man1 = read_commit(path)
        compacted_ok = (
            fa < fb
            and len(man1["partitions"][dirty]) == 1
            and man1["generation"] == man0["generation"] + 1
            and all(man1["partitions"][d] == man0["partitions"][d]
                    for d in man0["partitions"]
                    if len(man0["partitions"][d]) == 1))
        agg = (read_manifested(spark, path)
               .groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .orderBy("o_orderstatus"))
        rows0 = agg.collect()
        removed = vacuum_manifested(path)
        rows1 = (read_manifested(spark, path)
                 .groupBy("o_orderstatus")
                 .agg(F.count(F.lit(1)).alias("n"),
                      cent_sum(F.col("o_totalprice")).alias("total"))
                 .orderBy("o_orderstatus").collect())
        vacuum_ok = removed > 0 and rows0 == rows1
        out = (spark.createDataFrame(rows0, agg.schema)
               .withColumn("compacted_ok", F.lit(bool(compacted_ok)))
               .withColumn("vacuum_ok", F.lit(bool(vacuum_ok)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- streaming ingest with pointer commits (streaming/ops.py
#    upsert_sink commit="pointer"): the object-store CDC-apply
#    pattern — micro-batches append fresh bucket files + flip the
#    manifest; final state hash-exact from first principles and the
#    generation count proves per-batch commits ----------------------
STREAM_PTR_SQL = """
WITH fin AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 200.0
              ELSE o_totalprice END AS price
  FROM orders
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total,
       CAST(2 AS INT) AS last_v, TRUE AS pointer_ok
FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("stream_upsert_pointer", STREAM_PTR_SQL)
def stream_upsert_pointer(spark, sf_dir):
    import time

    from ..functions.maintenance import read_commit, read_manifested
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_ptr_src_")
    tbl_dir = tempfile.mkdtemp(prefix="stream_ptr_tbl_")
    table_path = os.path.join(tbl_dir, "t")
    ckpt = tempfile.mkdtemp(prefix="stream_ptr_ckpt_")
    try:
        o = tbl(spark, sf_dir, "orders").to_spark()
        stamped: set = set()
        base_t = time.time() - 60
        for i in range(3):
            inserts = o.where((F.col("o_orderkey") % 3 == i)
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
                           checkpoint_dir=ckpt, commit="pointer")
        try:
            q_.processAllAvailable()
        finally:
            q_.stop()
        man = read_commit(table_path)
        # gen 0 = first-batch bootstrap, then one flip per later batch
        pointer_ok = (man is not None
                      and man["partition_col"] == "__bucket"
                      and int(man["generation"]) == 2)
        snap = read_manifested(spark, table_path).drop("__bucket")
        out = (snap.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"),
                    F.max(F.when(F.col("o_orderkey") % 10 == 0,
                                 F.col("__v"))).alias("last_v"))
               .withColumn("pointer_ok", F.lit(bool(pointer_ok)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tbl_dir, ignore_errors=True)


# -- row-level DELETE (maintenance.delete_where): GDPR-erasure /
#    retention-expiry over a hive table, pruned to hit partitions,
#    run through BOTH commit protocols in-query (rename swap and
#    pointer flip must agree row-for-row); the 5-LOW partition deletes
#    EMPTY and must disappear entirely — the oracle is plain SQL
#    DELETE semantics (TRUE rows go, FALSE/NULL stay) ---------------
DELETE_WHERE_SQL = f"""
WITH kept AS (
  SELECT * FROM orders
  WHERE NOT COALESCE(o_orderkey % 7 = 0
                     OR o_orderpriority = '5-LOW', FALSE)
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS dir_dropped_ok, TRUE AS protocols_agree
FROM kept GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("delete_where_orders", DELETE_WHERE_SQL)
def delete_where_orders(spark, sf_dir):
    from ..functions.maintenance import (delete_where,
                                         manifest_bootstrap,
                                         read_manifested)

    o = tbl(spark, sf_dir, "orders").to_spark()
    pred = ((F.col("o_orderkey") % 7 == 0)
            | (F.col("o_orderpriority") == "5-LOW"))
    tmp = tempfile.mkdtemp(prefix="delete_where_")
    p_ren = os.path.join(tmp, "ren")
    p_ptr = os.path.join(tmp, "ptr")
    try:
        for p in (p_ren, p_ptr):
            (o.hint("rebalance", "o_orderpriority")   # guide §6
             .write.mode("overwrite").partitionBy("o_orderpriority")
             .parquet(p))
        manifest_bootstrap(p_ptr, "o_orderpriority")
        parts_r, n_r = delete_where(spark, p_ren, pred,
                                    "o_orderpriority", commit="rename")
        parts_p, n_p = delete_where(spark, p_ptr, pred,
                                    "o_orderpriority",
                                    commit="pointer")
        back_r = spark.read.parquet(p_ren)
        back_p = read_manifested(spark, p_ptr)
        dir_dropped_ok = (
            not os.path.isdir(
                os.path.join(p_ren, "o_orderpriority=5-LOW"))
            and back_p.where("o_orderpriority = '5-LOW'").count() == 0
            and sorted(parts_r) == sorted(parts_p) and n_r == n_p)
        agg = lambda df: sorted(map(tuple, (  # noqa: E731
            df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total"))
            .collect())))
        rows_r, rows_p = agg(back_r), agg(back_p)
        out = (spark.createDataFrame(
            [r + (bool(dir_dropped_ok), rows_r == rows_p)
             for r in rows_r],
            "o_orderstatus string, n long, total double, "
            "dir_dropped_ok boolean, protocols_agree boolean")
            .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- SCD-2 soft delete (maintenance.scd2_delete): withdrawn keys close
#    their CURRENT version at the delete time without a successor —
#    history before the delete reconstructs exactly (the takedown /
#    license-revocation pattern).  The oracle enumerates the full
#    expected interval set: the round-7 chained history with every
#    %35 key's open row closed at 1998-01-01 ------------------------
SCD2_DELETE_SQL = """
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
       CAST(CASE WHEN valid_to IS NOT NULL THEN valid_to
                 WHEN k % 35 = 0 THEN DATE '1998-01-01' END
            AS TIMESTAMP) AS valid_to,
       (valid_to IS NULL AND k % 35 != 0) AS is_current
FROM rows ORDER BY k, valid_from
"""


@q("scd2_delete_orders", SCD2_DELETE_SQL)
def scd2_delete_orders(spark, sf_dir):
    """soft delete over the chained round-7 history: %35 keys (a mix
    of once- and twice-versioned keys) are withdrawn at 1998 — their
    open rows close with NO successor, every other interval is
    byte-identical to the pre-delete history, and a key never in the
    table (the +9e9 synthetic) is silently ignored."""
    import datetime

    from ..functions.maintenance import scd2_delete
    from .round7 import _scd2_orders_history

    hist = _scd2_orders_history(spark, sf_dir)
    dels = (tbl(spark, sf_dir, "orders").to_spark()
            .where(F.col("o_orderkey") % 35 == 0)
            .select(F.col("o_orderkey").alias("k")))
    ghost = dels.select((F.col("k") + int(9e9)).alias("k"))
    dels = (dels.unionByName(ghost)
            .withColumn("eff", F.lit(datetime.date(1998, 1, 1))))
    out = scd2_delete(hist, dels, ["k"], "eff")
    return (out.where(F.col("k") % 10 == 0)
            .select("k", "price",
                    F.col("valid_from").cast("timestamp_ntz")
                    .alias("valid_from"),
                    F.col("valid_to").cast("timestamp_ntz")
                    .alias("valid_to"),
                    "is_current")
            .orderBy("k", "valid_from"))
