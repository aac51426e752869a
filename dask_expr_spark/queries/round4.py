"""Round-4 batch: oracle queries for the remaining pytest-only §2 rows
(VERDICT r3 item 2) — writers (to_parquet/to_orc/to_table/JDBC), the
remaining literal sources (from_array, divisions repartition,
timeseries), partitioning invariance (repartition / shuffle(on) /
persist / enforce_runtime_divisions), driver-side converters
(to_records / iterrows), the lazy Len/Size footer, ToFrame, and the
recursive multi-frame merge.

Pattern: each query routes data through the operator under test and
finishes with a deterministic aggregate; the oracle computes the same
aggregate straight from the parquet views, so a bug anywhere in the
operator's data path flips the value hash."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ._util import cent_sum, cent_sum_sql, tbl

QUERIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


# -- to_parquet (partitioned) + read_parquet round-trip -----------------
# reference: ToParquet io/parquet.py; partition_by exercises the hive
# layout so partition values survive the directory-encoding round-trip.
PARQUET_RT_SQL = f"""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       {cent_sum_sql('l_extendedprice')} AS total_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


@q("parquet_roundtrip_lineitem", PARQUET_RT_SQL)
def parquet_roundtrip_lineitem(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")[
        ["l_orderkey", "l_returnflag", "l_linestatus", "l_extendedprice"]]
    path = os.path.join(tempfile.gettempdir(), "rt_lineitem_parquet")
    li.to_parquet(path, partition_by="l_returnflag")
    from ..sources.io import read_parquet
    back = read_parquet(spark, path)
    return (back.to_spark().groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("l_extendedprice")).alias("total_price")))


# -- to_orc + read_orc round-trip (reference: io/orc.py) ----------------
ORC_RT_SQL = f"""
SELECT s_nationkey, count(*) AS n,
       {cent_sum_sql('s_acctbal')} AS total_bal
FROM supplier GROUP BY s_nationkey
"""


@q("orc_roundtrip_supplier", ORC_RT_SQL)
def orc_roundtrip_supplier(spark, sf_dir):
    s = tbl(spark, sf_dir, "supplier")
    path = os.path.join(tempfile.gettempdir(), "rt_supplier_orc")
    s.to_orc(path)
    from ..sources.io import read_orc
    back = read_orc(spark, path)
    return (back.to_spark().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("s_acctbal")).alias("total_bal")))


# -- from_array (reference: FromArray, io/io.py:600) --------------------
FROM_ARRAY_SQL = """
SELECT CAST(i*3 AS BIGINT) AS a, CAST(i*3+1 AS BIGINT) AS b,
       CAST(i*3+2 AS BIGINT) AS c
FROM range(8) t(i)
"""


@q("sources_from_array", FROM_ARRAY_SQL)
def sources_from_array(spark, sf_dir):
    import numpy as np

    from ..sources.io import from_array
    arr = np.arange(24, dtype="int64").reshape(8, 3)
    df = from_array(spark, arr, columns=["a", "b", "c"], npartitions=2)
    return df.to_spark().select("a", "b", "c")


# -- divisions repartition (reference: FromPandasDivisions /
#    Repartition(divisions=), _repartition.py:21): content must be
#    preserved bit-for-bit across the range repartition ----------------
DIVISIONS_SQL = """
SELECT i % 5 AS g, CAST(sum((i*i) % 17) AS BIGINT) AS total, count(*) AS n
FROM range(100) t(i) GROUP BY i % 5
"""


@q("sources_divisions_repartition", DIVISIONS_SQL)
def sources_divisions_repartition(spark, sf_dir):
    import pandas as pd

    import dask_expr_spark as dx
    pdf = pd.DataFrame({"k": range(100), "v": [(i * i) % 17 for i in range(100)]})
    df = dx.from_pandas(spark, pdf, npartitions=3, index_col="k")
    df = df.repartition(divisions=[0, 25, 50, 75, 100])
    df = df.reset_index()
    df = df.assign(g=F.col("k") % 5)
    return (df.to_spark().groupBy("g")
            .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")))


# -- timeseries (reference: datasets.py:17 Timeseries): deterministic
#    per seed, so the oracle is the precomputed constant aggregate
#    (Murmur3 hashes aren't reproducible in DuckDB) --------------------
TIMESERIES_SQL = """
SELECT CAST(1440 AS BIGINT) AS n, CAST(706964 AS BIGINT) AS sum_id,
       CAST(18157 AS BIGINT) AS sum_name,
       CAST(-2550597 AS BIGINT) AS sum_x6, CAST(-3877864 AS BIGINT) AS sum_y6
"""


@q("timeseries_stats", TIMESERIES_SQL)
def timeseries_stats(spark, sf_dir):
    from ..sources.io import timeseries
    ts = timeseries(spark, "2000-01-01", "2000-01-02", freq_seconds=60, seed=7)
    return ts.to_spark().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("sum_id"),
        F.sum("name_code").alias("sum_name"),
        F.sum(F.round(F.col("x") * 1000000).cast("long")).alias("sum_x6"),
        F.sum(F.round(F.col("y") * 1000000).cast("long")).alias("sum_y6"))


# -- repartition invariance (reference: Repartition, _repartition.py:21):
#    count and column repartition must not change content --------------
REPARTITION_SQL = f"""
SELECT o_orderstatus, count(*) AS n,
       {cent_sum_sql('o_totalprice')} AS total
FROM orders GROUP BY o_orderstatus
"""


@q("repartition_invariance_orders", REPARTITION_SQL)
def repartition_invariance_orders(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    o = o.repartition(7).repartition(4, "o_orderstatus")
    return (o.to_spark().groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total")))


# -- shuffle(on) invariance (reference: RearrangeByColumn,
#    _shuffle.py:239) ---------------------------------------------------
SHUFFLE_SQL = f"""
SELECT l_linestatus, count(*) AS n,
       {cent_sum_sql('l_quantity')} AS total_qty
FROM lineitem GROUP BY l_linestatus
"""


@q("shuffle_on_invariance", SHUFFLE_SQL)
def shuffle_on_invariance(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")[
        ["l_suppkey", "l_linestatus", "l_quantity"]]
    li = li.shuffle(on="l_suppkey", npartitions=16)
    return (li.to_spark().groupBy("l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("l_quantity")).alias("total_qty")))


# -- persist / FromGraph (reference: FromGraph, _expr.py; persist
#    materializes the prefix — values must be unchanged) ---------------
PERSIST_SQL = f"""
SELECT c_mktsegment, count(*) AS n,
       {cent_sum_sql('c_acctbal')} AS total_bal
FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment
"""


@q("persist_cached_agg", PERSIST_SQL)
def persist_cached_agg(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    c = c[c["c_acctbal"] > 0].persist()
    return (c.to_spark().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("c_acctbal")).alias("total_bal")))


# -- enforce_runtime_divisions + sorted set_index/reset_index ----------
# reference: EnforceRuntimeDivisions (_expr.py), SetIndex sorted fast
# path — the runtime check must pass AND leave values untouched.
ENFORCE_SQL = f"""
SELECT count(*) AS n, {cent_sum_sql('o_totalprice')} AS total
FROM orders WHERE o_orderkey BETWEEN 1000 AND 50000
"""


@q("enforce_divisions_orders", ENFORCE_SQL)
def enforce_divisions_orders(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    o = o.set_index("o_orderkey", sorted=True).enforce_runtime_divisions()
    o = o.reset_index()
    o = o[(o["o_orderkey"] >= 1000) & (o["o_orderkey"] <= 50000)]
    return o.to_spark().agg(
        F.count(F.lit(1)).alias("n"),
        cent_sum(F.col("o_totalprice")).alias("total"))


# -- to_records + iterrows driver-side converters ----------------------
# reference: to_records _collection.py:1420, iterrows _collection.py:1378.
# Tiny dims (25 + 5 rows) round-trip through the driver and rebuild as a
# frame; the oracle is the straight join.
RECORDS_SQL = """
SELECT n.n_name, r.r_name AS region
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@q("records_roundtrip_nation", RECORDS_SQL)
def records_roundtrip_nation(spark, sf_dir):
    import pandas as pd

    import dask_expr_spark as dx
    nat_records = tbl(spark, sf_dir, "nation").to_records()
    nat = dx.from_pandas(spark, pd.DataFrame.from_records(nat_records).drop(
        columns=["index"], errors="ignore"), npartitions=1)
    reg_rows = [d for _i, d in tbl(spark, sf_dir, "region").iterrows()]
    reg = dx.from_pandas(spark, pd.DataFrame(reg_rows), npartitions=1)
    j = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    j = j.rename(columns={"r_name": "region"})
    return j.to_spark().select("n_name", "region")


# -- JDBC to_sql + read_jdbc round-trip (reference: io/sql.py) ----------
# Derby embedded (bundled with Spark for its Hive metastore) plays the
# database; partition_column exercises the 4-way parallel JDBC scan.
JDBC_SQL = f"""
SELECT s_nationkey, count(*) AS n,
       {cent_sum_sql('s_acctbal')} AS total_bal
FROM supplier GROUP BY s_nationkey
"""


@q("jdbc_roundtrip_supplier", JDBC_SQL)
def jdbc_roundtrip_supplier(spark, sf_dir):
    from ..sources.io import read_jdbc
    s = tbl(spark, sf_dir, "supplier")
    url = "jdbc:derby:memory:dx_q_jdbc;create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    s.to_sql("supplier_rt", url, mode="overwrite", **drv)
    hi = s["s_suppkey"].max().compute()
    back = read_jdbc(spark, url, "supplier_rt",
                     partition_column="s_suppkey", num_partitions=4,
                     lower_bound=0, upper_bound=int(hi) + 1, **drv)
    return (back.to_spark().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("s_acctbal")).alias("total_bal")))


# -- lazy Len / Size footer (reference: Len/Size, _expr.py; the plan is
#    a count-star footer, asserted in test_plans) ----------------------
SIZE_SQL = """
SELECT (SELECT count(*) * 6 FROM orders) AS orders_size,
       (SELECT count(*) FROM lineitem) AS li_rows
"""


@q("size_len_scalars", SIZE_SQL)
def size_len_scalars(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    sz = o.size.to_spark().withColumnRenamed("size", "orders_size")
    ln = (li["l_orderkey"].size.to_spark()
          .withColumnRenamed("size_l_orderkey", "li_rows"))
    return sz.crossJoin(ln)


# -- Series.to_frame (reference: ToFrame, _expr.py) --------------------
TOFRAME_SQL = f"""
SELECT count(*) AS n, {cent_sum_sql('l_extendedprice')} AS total
FROM lineitem
"""


@q("toframe_price_total", TOFRAME_SQL)
def toframe_price_total(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    f = li["l_extendedprice"].to_frame("price")
    return f.to_spark().agg(
        F.count(F.lit(1)).alias("n"),
        cent_sum(F.col("price")).alias("total"))


# -- bucketed catalog tables + exchange-free merge ---------------------
# reference: fully-indexed BlockwiseMerge (_merge.py) — to_table
# bucket_by pre-partitions both sides on the join key; the join then
# runs without an exchange (plan asserted in test_scale_ops).
BUCKETED_SQL = f"""
SELECT c_mktsegment, count(*) AS n,
       {cent_sum_sql('o_totalprice')} AS total
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
"""


@q("bucketed_join_orders", BUCKETED_SQL)
def bucketed_join_orders(spark, sf_dir):
    import shutil
    from urllib.parse import urlparse

    from ..sources.io import from_table
    for t in ("q_cust_b", "q_ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = urlparse(spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse")).path or "spark-warehouse"
        shutil.rmtree(os.path.join(loc, t), ignore_errors=True)
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    c.to_table("q_cust_b", bucket_by="c_custkey", num_buckets=8,
               sort_by="c_custkey")
    o.to_table("q_ord_b", bucket_by="o_custkey", num_buckets=8,
               sort_by="o_custkey")
    cb = from_table(spark, "q_cust_b")
    ob = from_table(spark, "q_ord_b")
    j = cb.merge(ob, left_on="c_custkey", right_on="o_custkey")
    return (j.to_spark().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total")))


# -- groupby(observed=False) (reference: groupby options,
#    _groupby.py:1496): unobserved explicit categories emit rows with
#    pandas' empty-group identities (count→0, sum→0) -------------------
OBSERVED_SQL = """
WITH cats(seg) AS (VALUES ('AUTOMOBILE'), ('BUILDING'), ('FURNITURE'),
                          ('HOUSEHOLD'), ('MACHINERY'), ('SPACE')),
agg AS (SELECT c_mktsegment AS seg, count(*) AS n,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS cents
        FROM customer GROUP BY c_mktsegment)
SELECT c.seg, coalesce(n, 0) AS n,
       CAST(coalesce(cents, 0) AS BIGINT) AS cents
FROM cats c LEFT JOIN agg USING (seg)
"""


@q("groupby_observed_false", OBSERVED_SQL)
def groupby_observed_false(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    c = c.assign(cents=F.round(F.col("c_acctbal") * 100).cast("long"))
    seg = c["c_mktsegment"].cat.set_categories(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
         "SPACE"])
    g = c.groupby(seg, observed=False).agg(
        n=("c_custkey", "count"), cents=("cents", "sum"))
    g = g.rename(columns={"c_mktsegment": "seg"})
    return g.to_spark().select("seg", "n", "cents")


# -- .dt.to_period labels (reference: _datetime.py:4 ToPeriod) ---------
PERIOD_SQL = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS pm,
       concat(CAST(year(o_orderdate) AS VARCHAR), 'Q',
              CAST(quarter(o_orderdate) AS VARCHAR)) AS pq,
       count(*) AS n, {cent_sum_sql('o_totalprice')} AS total
FROM orders GROUP BY 1, 2
"""


@q("period_monthly_revenue", PERIOD_SQL)
def period_monthly_revenue(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    o = o.assign(pm=o["o_orderdate"].dt.to_period("M"),
                 pq=o["o_orderdate"].dt.to_period("Q"))
    return (o.to_spark().groupBy("pm", "pq")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total")))


# -- salted skew ops (task extension, operators/skew.py): salting must
#    be RESULT-INVARIANT — the oracle is the plain SQL join/agg --------
SALTED_AGG_SQL = f"""
SELECT l_suppkey, count(*) AS n,
       {cent_sum_sql('l_extendedprice')} AS total,
       CAST(min(l_quantity) AS DOUBLE) AS lo,
       CAST(max(l_quantity) AS DOUBLE) AS hi
FROM lineitem GROUP BY l_suppkey
"""


@q("salted_agg_suppkey", SALTED_AGG_SQL)
def salted_agg_suppkey(spark, sf_dir):
    from ..operators.skew import salted_agg
    li = tbl(spark, sf_dir, "lineitem")
    li = li.assign(cents=F.round(F.col("l_extendedprice") * 100).cast("long"))
    out = salted_agg(
        li, "l_suppkey",
        {"n": ("l_orderkey", "count"), "cents": ("cents", "sum"),
         "lo": ("l_quantity", "min"), "hi": ("l_quantity", "max")},
        salts=16)
    return out.to_spark().select(
        "l_suppkey", "n",
        (F.col("cents").cast("double") / 100.0).alias("total"),
        F.col("lo").cast("double"), F.col("hi").cast("double"))


SALTED_MERGE_SQL = f"""
SELECT c_mktsegment, count(*) AS n,
       {cent_sum_sql('o_totalprice')} AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
"""


@q("salted_merge_orders", SALTED_MERGE_SQL)
def salted_merge_orders(spark, sf_dir):
    from ..operators.skew import salted_merge
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer").rename(
        columns={"c_custkey": "o_custkey"})
    j = salted_merge(o, c, on="o_custkey", salts=8, salt_from="o_orderkey")
    return (j.to_spark().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total")))


# -- end-to-end near-dedup RESOLUTION: pairs → groups → canonical corpus
#    (keep the min doc_id per duplicate group, drop the rest) ----------
DEDUP_RESOLVE_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM documents a JOIN documents b
    ON md5(lower(trim(a.text))) = md5(lower(trim(b.text)))
   AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
comp AS (
  SELECT s AS id, least(s, min(d)) AS root FROM reach GROUP BY s
),
dropped AS (SELECT id FROM comp WHERE id <> root)
SELECT count(*) AS kept,
       (SELECT count(*) FROM dropped) AS removed
FROM documents WHERE doc_id NOT IN (SELECT id FROM dropped)
"""


@q("dedup_resolve_corpus", DEDUP_RESOLVE_SQL)
def dedup_resolve_corpus(spark, sf_dir):
    """full dedup pipeline: exact-hash pairs → connected components →
    anti-join non-canonical docs out of the corpus (the resolution
    step a training pipeline runs after candidate generation)."""
    from ..functions.dedup import connected_components
    docs = tbl(spark, sf_dir, "documents").to_spark()
    key = F.md5(F.lower(F.trim(F.col("text"))))
    a = docs.select(F.col("doc_id").alias("id_a"), key.alias("__k"))
    b = docs.select(F.col("doc_id").alias("id_b"), key.alias("__k"))
    pairs = (a.join(b, "__k").where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
    comp = connected_components(pairs)
    dropped = (comp.filter(F.col("id") != F.col("comp"))
               .select("id").withColumn("__d", F.lit(1)))
    flagged = docs.join(dropped, docs["doc_id"] == dropped["id"], "left")
    d = F.coalesce(F.col("__d"), F.lit(0))
    return flagged.agg(
        (F.count(F.lit(1)) - F.sum(d)).alias("kept"),
        F.sum(d).alias("removed"))


# -- recursive multi-frame merge (reference: JoinRecursive,
#    _merge.py:701) ----------------------------------------------------
RECURSIVE_SQL = """
SELECT r.r_name AS region, count(*) AS n_suppliers
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@q("merge_recursive_regions", RECURSIVE_SQL)
def merge_recursive_regions(spark, sf_dir):
    from ..operators.merge import merge_recursive
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation").rename(
        columns={"n_nationkey": "s_nationkey"})
    r = tbl(spark, sf_dir, "region").rename(
        columns={"r_regionkey": "n_regionkey"})
    j = merge_recursive([s, n, r])
    j = j.rename(columns={"r_name": "region"})
    return (j.to_spark().groupBy("region")
            .agg(F.count(F.lit(1)).alias("n_suppliers")))
