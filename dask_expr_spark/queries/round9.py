"""Round-9 batch: the multi-writer commit layer made visible — the
pointer protocol's generation CAS (exactly one concurrent writer
commits, the loser raises and re-runs), sharded per-directory
manifests (root stays O(#dirs), commits write only touched dirs'
shards), and zone maps that stay fresh across delete_where.

Oracle discipline as in rounds 5-8: merges/deletes reproduce exactly
in SQL; commit-layer invariants (shard pointers, probe-forward cache
recovery, loser-raised, files_read == survivors) are asserted
in-query as boolean columns the oracle pins TRUE.
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


# -- sharded manifests (maintenance MANIFEST_INLINE_MAX): with
#    sharding forced, every dir's committed file list lives in a
#    `_files.<id>.json` shard and the root manifest holds @pointers;
#    an upsert re-shards ONLY the touched dirs, the `_commit.json`
#    pointer cache is pure optimization (deleting it recovers from
#    the claim files), and vacuum clears superseded shards + claims --
SHARDED_UPSERT_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 333.0 AS o_totalprice, o_orderdate,
         o_orderpriority
  FROM orders
  WHERE o_orderkey % 53 = 0 AND o_orderpriority = '1-URGENT'
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
       TRUE AS sharded_ok, TRUE AS cache_recovery_ok, TRUE AS vacuum_ok
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("manifest_sharded_upsert", SHARDED_UPSERT_SQL)
def manifest_sharded_upsert(spark, sf_dir):
    from ..functions import maintenance as M

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="sharded_upsert_")
    path = os.path.join(tmp, "t")
    saved = M.MANIFEST_INLINE_MAX
    try:
        M.MANIFEST_INLINE_MAX = 0          # force shards at any size
        (o.hint("rebalance", "o_orderpriority")   # guide §6: dir-sized
         .write.mode("overwrite").partitionBy("o_orderpriority")
         .parquet(path))
        man0 = M.manifest_bootstrap(path, "o_orderpriority")
        updates = (o.where((F.col("o_orderkey") % 53 == 0)
                           & (F.col("o_orderpriority") == "1-URGENT"))
                   .withColumn("o_totalprice",
                               F.col("o_totalprice") + 333.0))
        M.upsert_partitioned(spark, path, updates, ["o_orderkey"],
                             "o_orderpriority", commit="pointer")
        man1 = M.read_commit(path)
        touched = "o_orderpriority=1-URGENT"
        sharded_ok = (
            all(isinstance(e, str) and e.startswith("@")
                for e in man1["partitions"].values())
            and man1["partitions"][touched]
            != man0["partitions"][touched]
            and all(man1["partitions"][d] == man0["partitions"][d]
                    for d in man0["partitions"] if d != touched))

        def agg_rows():
            a = (M.read_manifested(spark, path)
                 .groupBy("o_orderstatus")
                 .agg(F.count(F.lit(1)).alias("n"),
                      cent_sum(F.col("o_totalprice")).alias("total"))
                 .orderBy("o_orderstatus"))
            return a, a.collect()

        agg0, rows0 = agg_rows()
        # the `_commit.json` cache is an optimization, not the truth:
        # with it deleted, read_commit recovers the head from the
        # claim files and the table reads back identically
        os.remove(os.path.join(path, "_commit.json"))
        _, rows_rec = agg_rows()
        cache_recovery_ok = (rows_rec == rows0
                             and int(M.read_commit(path)["generation"])
                             == int(man1["generation"]))
        removed = M.vacuum_manifested(path)
        claims = [f for f in os.listdir(path) if M._CLAIM_RE.match(f)]
        shard0 = man0["partitions"][touched].lstrip("@")
        _, rows1 = agg_rows()
        vacuum_ok = (removed > 0 and rows1 == rows0
                     and claims == ["_commit.00000001.json"]
                     and not os.path.exists(
                         os.path.join(path, touched, shard0)))
        out = (spark.createDataFrame(rows0, agg0.schema)
               .withColumn("sharded_ok", F.lit(bool(sharded_ok)))
               .withColumn("cache_recovery_ok",
                           F.lit(bool(cache_recovery_ok)))
               .withColumn("vacuum_ok", F.lit(bool(vacuum_ok)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        M.MANIFEST_INLINE_MAX = saved
        shutil.rmtree(tmp, ignore_errors=True)


# -- multi-writer CAS (maintenance._write_commit) under STRICT
#    single-log serialization (rebase=False): the lost-update
#    interleaving, injected deterministically — writer B computes its
#    merge against generation g, writer A commits g+1 first, B's claim
#    must RAISE ConcurrentCommitError with the table showing exactly
#    A's commit; B re-runs against the new head and both batches land.
#    (The DEFAULT rebase=True path — disjoint-dir writers both land
#    with one data-compute each — is pinned by round10's
#    disjoint_rebase_upsert.)  The oracle enumerates the final
#    two-batch merge ------------------------------------------------
CONCURRENT_CAS_SQL = f"""
WITH upd_a AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 100.0 AS o_totalprice, o_orderdate,
         o_orderpriority
  FROM orders
  WHERE o_orderkey % 97 = 0 AND o_orderpriority = '3-MEDIUM'
),
upd_b AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 200.0 AS o_totalprice, o_orderdate,
         o_orderpriority
  FROM orders
  WHERE o_orderkey % 89 = 0 AND o_orderpriority = '1-URGENT'
),
merged AS (
  SELECT * FROM upd_a
  UNION ALL SELECT * FROM upd_b
  UNION ALL
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd_a u
                    WHERE u.o_orderkey = o.o_orderkey)
    AND NOT EXISTS (SELECT 1 FROM upd_b u
                    WHERE u.o_orderkey = o.o_orderkey)
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS loser_raised, TRUE AS winner_isolated
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("concurrent_upsert_cas", CONCURRENT_CAS_SQL)
def concurrent_upsert_cas(spark, sf_dir):
    from ..functions import maintenance as M

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="concurrent_cas_")
    path = os.path.join(tmp, "t")

    def batch(mod, prio, delta):
        return (o.where((F.col("o_orderkey") % mod == 0)
                        & (F.col("o_orderpriority") == prio))
                .withColumn("o_totalprice",
                            F.col("o_totalprice") + delta))

    real = M._write_commit
    try:
        (o.hint("rebalance", "o_orderpriority")   # guide §6: dir-sized
         .write.mode("overwrite").partitionBy("o_orderpriority")
         .parquet(path))
        M.manifest_bootstrap(path, "o_orderpriority")
        state = {"fired": False}

        def inject(p, man, fs, **kw):
            if not state["fired"]:
                state["fired"] = True        # A's inner claim is real
                M.upsert_partitioned(spark, path,
                                     batch(97, "3-MEDIUM", 100.0),
                                     ["o_orderkey"], "o_orderpriority",
                                     commit="pointer")
            return real(p, man, fs, **kw)

        M._write_commit = inject
        loser_raised = False
        try:
            M.upsert_partitioned(spark, path,
                                 batch(89, "1-URGENT", 200.0),
                                 ["o_orderkey"], "o_orderpriority",
                                 commit="pointer", rebase=False)
        except M.ConcurrentCommitError:
            loser_raised = True
        finally:
            M._write_commit = real
        # mid-state: exactly A's commit is visible (B's appended files
        # are unreferenced orphans): A's key set carries +100 each,
        # B's key set is byte-for-byte the base values
        a_keys = ((F.col("o_orderkey") % 97 == 0)
                  & (F.col("o_orderpriority") == "3-MEDIUM"))
        b_keys = ((F.col("o_orderkey") % 89 == 0)
                  & (F.col("o_orderpriority") == "1-URGENT"))

        def ksum(df, cond):
            r = df.where(cond).agg(
                cent_sum(F.col("o_totalprice")).alias("s"),
                F.count(F.lit(1)).alias("c")).first()
            return (r["s"] or 0.0, r["c"])

        mid = M.read_manifested(spark, path)
        (base_a, n_a), (base_b, n_b) = ksum(o, a_keys), ksum(o, b_keys)
        (mid_a, m_a), (mid_b, m_b) = ksum(mid, a_keys), ksum(mid, b_keys)
        winner_isolated = (
            m_a == n_a and m_b == n_b
            and abs(mid_a - (base_a + 100.0 * n_a)) < 1e-6
            and abs(mid_b - base_b) < 1e-6
            and mid.count() == o.count()
            and M.vacuum_manifested(path) > 0)
        # the loser re-runs against the new head; both batches land
        M.upsert_partitioned(spark, path, batch(89, "1-URGENT", 200.0),
                             ["o_orderkey"], "o_orderpriority",
                             commit="pointer")
        agg = (M.read_manifested(spark, path)
               .groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .orderBy("o_orderstatus"))
        out = (agg.withColumn("loser_raised", F.lit(bool(loser_raised)))
               .withColumn("winner_isolated",
                           F.lit(bool(winner_isolated)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        M._write_commit = real
        shutil.rmtree(tmp, ignore_errors=True)


# -- zone maps stay fresh across delete_where (VERDICT r8 item 6):
#    after a row-level delete on a zone-mapped pointer table, the
#    pruned read is still exact, the zone-map manifest lists exactly
#    the live committed files, and the scan's input files are exactly
#    the prune survivors — the pruning benefit survives the mutation
#    with no manual update_zonemap -----------------------------------
@q("zonemap_after_delete", f"""
WITH kept AS (
  SELECT * FROM orders WHERE NOT (o_orderdate < DATE '1993-01-01')
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS pruned_exact, TRUE AS manifest_fresh
FROM kept WHERE o_totalprice >= 300000.0
GROUP BY o_orderstatus ORDER BY o_orderstatus
""")
def zonemap_after_delete(spark, sf_dir):
    from ..functions import maintenance as M
    from ..sources import zonemap as Z

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="zonemap_delete_")
    path = os.path.join(tmp, "t")
    try:
        # range-cluster on the indexed column so zone maps can bite
        (o.repartitionByRange(8, "o_totalprice")
         .sortWithinPartitions("o_totalprice")
         .write.partitionBy("o_orderpriority").parquet(path))
        M.manifest_bootstrap(path, "o_orderpriority")
        Z.build_zonemap(spark, path, ["o_totalprice"])
        M.delete_where(spark, path,
                       F.col("o_orderdate") < F.lit("1993-01-01")
                       .cast("date"),
                       "o_orderpriority", commit="pointer")
        preds = [("o_totalprice", ">=", 300000.0)]
        surv, total = Z.zone_prune(spark, path, preds)
        pruned = Z.read_skipping(spark, path, preds)
        # the scan's inputs are exactly the prune survivors, pruning
        # actually bit, and the zone-map manifest is exactly the live
        # committed file set (refreshed inline by delete_where)
        from ..fsops import get_fs
        fs = get_fs(path)
        man_files = set(
            r["file"] for r in Z._read_manifest_df(
                spark, os.path.join(path, Z.ZONEMAP_DIR), fs)
            .select("file").collect())
        # inputFiles returns percent-encoded file: URIs — normalize
        # both sides to plain decoded paths before comparing
        import urllib.parse

        def norm(p):
            p = urllib.parse.unquote(p)
            return p[len("file://"):] if p.startswith("file://") else p

        pruned_exact = (0 < len(surv) < total
                        and {norm(f) for f in pruned.inputFiles()}
                        == {norm(f) for f in surv})
        manifest_fresh = man_files == set(Z._data_files(path, fs=fs))
        agg = (pruned.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .orderBy("o_orderstatus"))
        out = (agg.withColumn("pruned_exact", F.lit(bool(pruned_exact)))
               .withColumn("manifest_fresh", F.lit(bool(manifest_fresh)))
               .orderBy("o_orderstatus"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- multi-column pointer tables (maintenance partition_col=[...]):
#    a two-level hive layout (priority=…/status=…) under the pointer
#    protocol — bootstrap adopts the nested leaves, an upsert touches
#    only its (priority, status) leaves, delete_where prunes by leaf,
#    and tuple-valued manifest pruning bounds the read's file list.
#    The oracle enumerates merge-then-delete in SQL -----------------
MULTICOL_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 500.0 AS o_totalprice, o_orderdate,
         o_orderpriority
  FROM orders
  WHERE o_orderkey % 67 = 0 AND o_orderpriority = '1-URGENT'
),
merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u
                    WHERE u.o_orderkey = o.o_orderkey)
),
kept AS (
  SELECT * FROM merged
  WHERE NOT (o_orderdate < DATE '1993-06-01'
             AND o_orderstatus = 'F')
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS untouched_ok, TRUE AS tuple_pruned_ok
FROM kept GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@q("multicol_pointer_upsert", MULTICOL_SQL)
def multicol_pointer_upsert(spark, sf_dir):
    from ..functions import maintenance as M

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="multicol_ptr_")
    path = os.path.join(tmp, "t")
    pcols = ["o_orderpriority", "o_orderstatus"]
    try:
        # rebalance: without it the 15-leaf table lands as one sliver
        # per task per leaf (~480 tiny files) and every later phase —
        # bootstrap listing, merge target read, CDC discovery, final
        # agg — pays the per-file open cost (guide §6).  Same rows,
        # same oracle result; only the file layout changes.
        (o.hint("rebalance", *pcols)
         .write.mode("overwrite").partitionBy(*pcols).parquet(path))
        man0 = M.manifest_bootstrap(path, pcols)
        updates = (o.where((F.col("o_orderkey") % 67 == 0)
                           & (F.col("o_orderpriority") == "1-URGENT"))
                   .withColumn("o_totalprice",
                               F.col("o_totalprice") + 500.0))
        M.upsert_partitioned(spark, path, updates, ["o_orderkey"],
                             pcols, commit="pointer")
        man1 = M.read_commit(path)
        touched = {d for d in man1["partitions"]
                   if d.startswith("o_orderpriority=1-URGENT/")}
        untouched_ok = (
            bool(touched)
            and all(man1["partitions"][d] == man0["partitions"][d]
                    for d in man0["partitions"] if d not in touched))
        # tuple-valued manifest pruning bounds the file list
        pr = M.read_manifested(
            spark, path, partition_values=[("1-URGENT", "F")])
        tuple_pruned_ok = (
            pr.count() > 0
            and all("o_orderpriority=1-URGENT/o_orderstatus=F" in f
                    for f in pr.inputFiles()))
        M.delete_where(spark, path,
                       (F.col("o_orderdate")
                        < F.lit("1993-06-01").cast("date"))
                       & (F.col("o_orderstatus") == "F"),
                       pcols, commit="pointer")
        agg = (M.read_manifested(spark, path)
               .groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"))
               .orderBy("o_orderpriority"))
        out = (agg.withColumn("untouched_ok",
                              F.lit(bool(untouched_ok)))
               .withColumn("tuple_pruned_ok",
                           F.lit(bool(tuple_pruned_ok)))
               .orderBy("o_orderpriority"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
