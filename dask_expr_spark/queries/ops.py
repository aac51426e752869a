"""Operator micro-queries: one per row-op / reduction / groupby variant
from SURVEY.md §2.2, §2.4, §2.5, §2.7, §2.8. Each runs through the
pandas-style facade and has an exact DuckDB oracle.

Cross-engine dtype rules (learned the hard way, see tests/oracle.py):
ints are made BIGINT on both sides; decimal sums cast to DOUBLE before
any division; var/std/corr composed from decimal-exact component sums
so both engines execute identical IEEE double ops.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..collection import concat
from ._util import dec_avg, dec_avg_sql, dec_sum, dec_sum_sql, tbl


def filter_isin_between(spark, sf_dir):
    """Isin (_expr.py:1364) + Between (:1401) + And filter chain."""
    orders = tbl(spark, sf_dir, "orders")
    cond = orders.o_orderpriority.isin(["1-URGENT", "2-HIGH"]) & orders.o_totalprice.between(
        1000.0, 200000.0
    )
    res = (
        orders.filter(cond)
        .groupby("o_orderpriority")
        .agg(n=("o_orderkey", "count"), total=("o_totalprice", lambda c: dec_sum(c, 2)))
        .sort_values("o_orderpriority")
    )
    return res.to_spark()


FILTER_ISIN_SQL = f"""
SELECT o_orderpriority, count(o_orderkey) AS n, {dec_sum_sql('o_totalprice', 2)} AS total
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 1000.0 AND 200000.0
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def case_when_buckets(spark, sf_dir):
    """multi-branch conditional (reference: CaseWhen, _expr.py:1966)."""
    orders = tbl(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000.0, "low")
        .when(F.col("o_totalprice") < 150000.0, "mid")
        .otherwise("high")
    )
    res = (
        orders.assign(bucket=bucket)
        .groupby(["bucket", "o_orderstatus"])
        .agg(n=("o_orderkey", "count"), avg_price=("o_totalprice", lambda c: dec_avg(c, 2)))
        .sort_values(["bucket", "o_orderstatus"])
    )
    return res.to_spark()


CASE_WHEN_SQL = f"""
SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
            WHEN o_totalprice < 150000.0 THEN 'mid'
            ELSE 'high' END AS bucket,
       o_orderstatus,
       count(o_orderkey) AS n,
       {dec_avg_sql('o_totalprice', 2)} AS avg_price
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


def string_ops(spark, sf_dir):
    """.str accessor surface (reference: _str_accessor.py:22-75):
    regexp_extract, upper, length, contains, startswith."""
    cust = tbl(spark, sf_dir, "customer")
    res = (
        cust.assign(
            cust_num=lambda d: d["c_name"].str.extract(r"([0-9]+)$", 1).astype("long"),
            uname=lambda d: d["c_name"].str.upper(),
            name_len=lambda d: d["c_name"].str.len().astype("long"),
        )
        .filter(cust.c_name.str.contains("Customer#", regex=False))
        .groupby("c_mktsegment")
        .agg(
            n=("c_custkey", "count"),
            min_num=("cust_num", "min"),
            max_num=("cust_num", "max"),
            max_len=("name_len", "max"),
            min_uname=("uname", "min"),
        )
        .sort_values("c_mktsegment")
    )
    return res.to_spark()


STRING_OPS_SQL = """
SELECT c_mktsegment, count(c_custkey) AS n,
       min(CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)) AS min_num,
       max(CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)) AS max_num,
       max(CAST(length(c_name) AS BIGINT)) AS max_len,
       min(upper(c_name)) AS min_uname
FROM customer
WHERE contains(c_name, 'Customer#')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def date_ops(spark, sf_dir):
    """.dt accessor surface (reference: _datetime.py:4): year/quarter/
    month extraction + groupby."""
    orders = tbl(spark, sf_dir, "orders")
    res = (
        orders.assign(
            y=lambda d: d["o_orderdate"].dt.year.astype("long"),
            q=lambda d: d["o_orderdate"].dt.quarter.astype("long"),
        )
        .groupby(["y", "q"])
        .agg(n=("o_orderkey", "count"), total=("o_totalprice", lambda c: dec_sum(c, 2)))
        .sort_values(["y", "q"])
    )
    return res.to_spark()


DATE_OPS_SQL = f"""
SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
       count(o_orderkey) AS n, {dec_sum_sql('o_totalprice', 2)} AS total
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


def value_counts_flag(spark, sf_dir):
    """reference: ValueCounts, _reductions.py:1394."""
    li = tbl(spark, sf_dir, "lineitem")
    return li["l_returnflag"].value_counts(sort=False).to_spark()


VALUE_COUNTS_SQL = """
SELECT l_returnflag, count(*) AS count FROM lineitem GROUP BY l_returnflag
"""


def distinct_pairs(spark, sf_dir):
    """reference: DropDuplicates/Unique, _reductions.py:599,565."""
    li = tbl(spark, sf_dir, "lineitem")
    return li[["l_returnflag", "l_linestatus"]].distinct().to_spark()


DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def nunique_by_group(spark, sf_dir):
    """exact + approx distinct counts (reference: NUnique
    _collection.py:3808, NuniqueApprox _reductions.py:1295 — approx is
    rows-only checked via n>=0, exact is hash-checked)."""
    li = tbl(spark, sf_dir, "lineitem")
    res = (
        li.groupby("l_returnflag")
        .agg(
            n_parts=("l_partkey", "nunique"),
            n_supps=("l_suppkey", "nunique"),
            n_orders=("l_orderkey", "nunique"),
        )
        .sort_values("l_returnflag")
    )
    return res.to_spark()


NUNIQUE_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def topk_orders(spark, sf_dir):
    """top-k via sort+limit → Catalyst TakeOrderedAndProject
    (reference: NLargest, _reductions.py:1341)."""
    orders = tbl(spark, sf_dir, "orders")
    res = (
        orders[["o_orderkey", "o_custkey", "o_totalprice"]]
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(10)
    )
    return res.to_spark()


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def fillna_mask(spark, sf_dir):
    """null handling: Mask (_expr.py:1540), Fillna (:1349), IsNa (:1534)."""
    li = tbl(spark, sf_dir, "lineitem")
    res = (
        li.assign(
            t=lambda d: d["l_tax"].mask(d["l_tax"] == 0.0),
        )
        .assign(
            t_filled=lambda d: d["t"].fillna(-1.0),
            is_null=lambda d: d["t"].isna().astype("long"),
        )
        .groupby("l_returnflag")
        .agg(
            n=("l_orderkey", "count"),
            n_zero_tax=("is_null", "sum"),
            sum_filled=("t_filled", lambda c: dec_sum(c, 2)),
        )
        .sort_values("l_returnflag")
    )
    return res.to_spark()


FILLNA_SQL = f"""
SELECT l_returnflag, count(l_orderkey) AS n,
       CAST(sum(CASE WHEN nullif(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_tax,
       {dec_sum_sql('coalesce(nullif(l_tax, 0.0), -1.0)', 2)} AS sum_filled
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def union_concat(spark, sf_dir):
    """axis=0 concat (reference: Concat, _concat.py:25) via unionByName."""
    orders = tbl(spark, sf_dir, "orders")
    a = orders.filter(orders.o_orderstatus == "F").assign(src="fulfilled")
    b = orders.filter(orders.o_orderstatus == "O").assign(src="open")
    res = (
        concat([a, b])
        .groupby("src")
        .agg(n=("o_orderkey", "count"), total=("o_totalprice", lambda c: dec_sum(c, 2)))
        .sort_values("src")
    )
    return res.to_spark()


UNION_SQL = f"""
SELECT src, count(o_orderkey) AS n, {dec_sum_sql('o_totalprice', 2)} AS total
FROM (
  SELECT *, 'fulfilled' AS src FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT *, 'open' AS src FROM orders WHERE o_orderstatus = 'O'
) GROUP BY src ORDER BY src
"""


def pivot_status(spark, sf_dir):
    """reference: pivot_table, _reductions.py:655 — Spark groupBy().pivot
    with explicit values (no extra distinct scan)."""
    orders = tbl(spark, sf_dir, "orders")
    res = (
        orders.groupby("o_orderpriority")
        .pivot("o_orderstatus", values=["F", "O", "P"])
        .fillna(0)
        .sort_values("o_orderpriority")
    )
    return res.to_spark()


PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def minmax_by_group(spark, sf_dir):
    """idxmin/idxmax analogue (reference: IdxMin/IdxMax,
    _reductions.py:980) via min_by/max_by."""
    li = tbl(spark, sf_dir, "lineitem")
    # l_linenumber is NOT unique within an order in this testdata, so
    # tie-break with the value itself to keep arg_min deterministic
    key = F.col("l_linenumber").cast("long") * 10_000_000 + F.col("l_partkey")
    res = li.groupby("l_orderkey").agg(
        first_part=("l_partkey", lambda c: F.min_by(c, key)),
        last_part=("l_partkey", lambda c: F.max_by(c, key)),
        n_lines=("l_linenumber", "count"),
    )
    return res.to_spark()


MINMAX_BY_SQL = """
SELECT l_orderkey,
       arg_min(l_partkey, CAST(l_linenumber AS BIGINT) * 10000000 + l_partkey) AS first_part,
       arg_max(l_partkey, CAST(l_linenumber AS BIGINT) * 10000000 + l_partkey) AS last_part,
       count(l_linenumber) AS n_lines
FROM lineitem GROUP BY l_orderkey
"""


def quantiles_exact(spark, sf_dir):
    """exact percentiles (reference: SeriesQuantile, _quantile.py:14;
    Median _collection.py:3873). Both engines interpolate at rank
    p*(n-1); interpolation of 2-decimal values can't tie at 1e-4, so
    round(4) is hash-stable."""
    orders = tbl(spark, sf_dir, "orders")
    res = (
        orders.groupby("o_orderstatus")
        .agg(
            p50=("o_totalprice", lambda c: F.round(F.expr("percentile(o_totalprice, 0.5)"), 4)),
            p90=("o_totalprice", lambda c: F.round(F.expr("percentile(o_totalprice, 0.9)"), 4)),
            p99=("o_totalprice", lambda c: F.round(F.expr("percentile(o_totalprice, 0.99)"), 4)),
        )
        .sort_values("o_orderstatus")
    )
    return res.to_spark()


QUANTILES_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def stats_var_std(spark, sf_dir):
    """Var/Std (reference: _reductions.py:1116) composed from
    decimal-exact moment sums so both engines run identical double ops:
    var = (Σx² − (Σx)²/n) / (n−1)."""
    li = tbl(spark, sf_dir, "lineitem")
    res = (
        li.assign(q2=lambda d: d["l_quantity"] * d["l_quantity"])
        .groupby("l_returnflag")
        .agg(
            n=("l_quantity", "count"),
            sx=("l_quantity", lambda c: dec_sum(c, 2)),
            sxx=("q2", lambda c: dec_sum(c, 4)),
        )
        .assign(
            var_q=lambda d: (d["sxx"] - d["sx"] * d["sx"] / d["n"]) / (d["n"] - 1),
        )
        .assign(std_q=lambda d: d["var_q"].sqrt())
        .drop(["sx", "sxx"])
        .sort_values("l_returnflag")
    )
    return res.to_spark()


STATS_SQL = f"""
WITH m AS (
  SELECT l_returnflag, count(l_quantity) AS n,
         {dec_sum_sql('l_quantity', 2)} AS sx,
         {dec_sum_sql('l_quantity * l_quantity', 4)} AS sxx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (sxx - sx * sx / n) / (n - 1) AS var_q,
       sqrt((sxx - sx * sx / n) / (n - 1)) AS std_q
FROM m ORDER BY l_returnflag
"""


def corr_cov(spark, sf_dir):
    """Cov/Corr (reference: _reductions.py:1009,1035) from decimal-exact
    component sums: cov = (Σxy − ΣxΣy/n)/(n−1), corr = cov/(σx σy)."""
    li = tbl(spark, sf_dir, "lineitem")
    res = (
        li.assign(
            xy=lambda d: d["l_quantity"] * d["l_extendedprice"],
            x2=lambda d: d["l_quantity"] * d["l_quantity"],
            y2=lambda d: d["l_extendedprice"] * d["l_extendedprice"],
        )
        .groupby("l_returnflag")
        .agg(
            n=("l_quantity", "count"),
            sx=("l_quantity", lambda c: dec_sum(c, 2)),
            sy=("l_extendedprice", lambda c: dec_sum(c, 2)),
            sxy=("xy", lambda c: dec_sum(c, 4)),
            sxx=("x2", lambda c: dec_sum(c, 4)),
            syy=("y2", lambda c: dec_sum(c, 4)),
        )
        .assign(
            cov_qp=lambda d: ((d["sxy"] - d["sx"] * d["sy"] / d["n"]) / (d["n"] - 1)).round(4),
        )
        .assign(
            # chained double ops can differ in the last ULP across engines
            # (FMA contraction) — round to 6 to make the hash stable
            corr_qp=lambda d: (
                ((d["sxy"] - d["sx"] * d["sy"] / d["n"]) / (d["n"] - 1))
                / (
                    ((d["sxx"] - d["sx"] * d["sx"] / d["n"]) / (d["n"] - 1)).sqrt()
                    * ((d["syy"] - d["sy"] * d["sy"] / d["n"]) / (d["n"] - 1)).sqrt()
                )
            ).round(6),
        )
        .drop(["sx", "sy", "sxy", "sxx", "syy"])
        .sort_values("l_returnflag")
    )
    return res.to_spark()


CORR_SQL = f"""
WITH m AS (
  SELECT l_returnflag, count(l_quantity) AS n,
         {dec_sum_sql('l_quantity', 2)} AS sx,
         {dec_sum_sql('l_extendedprice', 2)} AS sy,
         {dec_sum_sql('l_quantity * l_extendedprice', 4)} AS sxy,
         {dec_sum_sql('l_quantity * l_quantity', 4)} AS sxx,
         {dec_sum_sql('l_extendedprice * l_extendedprice', 4)} AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((sxy - sx * sy / n) / (n - 1), 4) AS cov_qp,
       round(((sxy - sx * sy / n) / (n - 1))
         / (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))), 6) AS corr_qp
FROM m ORDER BY l_returnflag
"""


QUERIES = {
    "filter_isin_between": (filter_isin_between, FILTER_ISIN_SQL),
    "case_when_buckets": (case_when_buckets, CASE_WHEN_SQL),
    "string_ops": (string_ops, STRING_OPS_SQL),
    "date_ops": (date_ops, DATE_OPS_SQL),
    "value_counts_flag": (value_counts_flag, VALUE_COUNTS_SQL),
    "distinct_pairs": (distinct_pairs, DISTINCT_SQL),
    "nunique_by_group": (nunique_by_group, NUNIQUE_SQL),
    "topk_orders": (topk_orders, TOPK_SQL),
    "fillna_mask": (fillna_mask, FILLNA_SQL),
    "union_concat": (union_concat, UNION_SQL),
    "pivot_status": (pivot_status, PIVOT_SQL),
    "minmax_by_group": (minmax_by_group, MINMAX_BY_SQL),
    "quantiles_exact": (quantiles_exact, QUANTILES_SQL),
    "stats_var_std": (stats_var_std, STATS_SQL),
    "corr_cov": (corr_cov, CORR_SQL),
}


def transform_pct_of_group(spark, sf_dir):
    """groupby.transform: each row's share of its group total
    (reference: GroupByTransform, _groupby.py:1027) — window aggregate,
    exact decimal group totals → identical ratios."""
    li = tbl(spark, sf_dir, "lineitem")
    # NOTE: .over() must attach to the aggregate itself — cast AFTER
    t = li[["l_returnflag", "l_orderkey", "l_quantity"]].groupby("l_returnflag").transform(
        {"l_quantity": lambda c: F.sum(c.cast("decimal(27,2)"))},
        suffix="_grp",
    )
    sdf = t.to_spark().withColumn(
        "pct", F.col("l_quantity") / F.col("l_quantity_grp").cast("double")
    )
    return (
        sdf.groupBy("l_returnflag")
        .agg(
            F.round(F.max("pct"), 12).alias("max_pct"),
            F.round(F.min("pct"), 12).alias("min_pct"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


TRANSFORM_SQL = """
WITH t AS (
  SELECT l_returnflag,
         l_quantity / (CAST(sum(CAST(l_quantity AS DECIMAL(27,2)))
                       OVER (PARTITION BY l_returnflag) AS DOUBLE)) AS pct
  FROM lineitem
)
SELECT l_returnflag, round(max(pct), 12) AS max_pct, round(min(pct), 12) AS min_pct,
       count(*) AS n
FROM t GROUP BY l_returnflag ORDER BY l_returnflag
"""


def expanding_running_share(spark, sf_dir):
    """expanding window (cumulative count) per user via the facade's
    expanding() — checked as final expanding count == group size."""
    ev = tbl(spark, sf_dir, "events")
    r = ev.expanding(order_by=["ts", "event_id"], partition_by="user_id").count(["value"])
    sdf = r.to_spark()
    return (
        sdf.groupBy("user_id")
        .agg(
            F.max("value_rcount").alias("final_count"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


EXPANDING_SQL = """
SELECT user_id,
       count(value) AS final_count,
       count(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


QUERIES["transform_pct_of_group"] = (transform_pct_of_group, TRANSFORM_SQL)
QUERIES["expanding_running_share"] = (expanding_running_share, EXPANDING_SQL)


def categorize_segments(spark, sf_dir):
    """dictionary encoding (reference: categorize, _collection.py:3749;
    categoricals → label ints, SURVEY.md §1.3): codes assigned by
    sorted value order, then aggregated per code."""
    cust = tbl(spark, sf_dir, "customer")
    encoded, dicts = cust.categorize(["c_mktsegment"])
    return (
        encoded.groupby(["c_mktsegment", "c_mktsegment_code"])
        .agg(n=("c_custkey", "count"))
        .sort_values("c_mktsegment_code")
        .to_spark()
    )


CATEGORIZE_SQL = """
WITH dic AS (
  SELECT c_mktsegment AS val,
         CAST(row_number() OVER (ORDER BY c_mktsegment) - 1 AS INT) AS code
  FROM (SELECT DISTINCT c_mktsegment FROM customer)
)
SELECT c_mktsegment, code AS c_mktsegment_code, count(c_custkey) AS n
FROM customer JOIN dic ON c_mktsegment = dic.val
GROUP BY 1, 2 ORDER BY 2
"""


QUERIES["categorize_segments"] = (categorize_segments, CATEGORIZE_SQL)


def drop_dup_keep_first(spark, sf_dir):
    """drop_duplicates(subset, keep='first') with a deterministic order
    (reference: DropDuplicates keep=, _reductions.py:599): one order
    per customer — the earliest (orderdate, orderkey)."""
    sdf = tbl(spark, sf_dir, "orders").to_spark()
    # min_by with a composite (date, orderkey) key = keep='first' under
    # a deterministic order; NTZ needs a cast before unix_micros
    # epoch SECONDS (dates have no sub-second part) so the composite
    # fits in int64 on both engines
    key = (
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) * 100_000_000
        + F.col("o_orderkey")
    )
    first = sdf.groupBy("o_custkey").agg(
        F.min_by(F.col("o_orderkey"), key).alias("first_orderkey"),
        F.min("o_orderdate").alias("first_date"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return first.orderBy("o_custkey")


DROP_DUP_SQL = """
SELECT o_custkey,
       arg_min(o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) * 100000000 + o_orderkey) AS first_orderkey,
       min(o_orderdate) AS first_date,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey ORDER BY o_custkey
"""


def combine_first_balances(spark, sf_dir):
    """combine_first (reference: CombineFirst, _expr.py:1138): prefer
    the supplier's account balance, fall back to the customer's, over
    the shared nationkey-index of per-nation aggregates."""
    cust = tbl(spark, sf_dir, "customer")
    supp = tbl(spark, sf_dir, "supplier")
    # per-nation average balances from two different frames
    a = (
        supp.groupby("s_nationkey")
        .agg(bal=("s_acctbal", lambda c: F.sum(c.cast("decimal(27,2)")).cast("double")))
        .rename({"s_nationkey": "nk"}).set_index("nk")
    )
    b = (
        cust.groupby("c_nationkey")
        .agg(bal=("c_acctbal", lambda c: F.sum(c.cast("decimal(27,2)")).cast("double")))
        .rename({"c_nationkey": "nk"}).set_index("nk")
    )
    combined = a.combine_first(b)
    return combined.reset_index().to_spark().orderBy("nk")


COMBINE_FIRST_SQL = """
WITH s AS (
  SELECT s_nationkey AS nk,
         CAST(sum(CAST(s_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS bal
  FROM supplier GROUP BY 1
),
c AS (
  SELECT c_nationkey AS nk,
         CAST(sum(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS bal
  FROM customer GROUP BY 1
)
SELECT coalesce(s.nk, c.nk) AS nk, coalesce(s.bal, c.bal) AS bal
FROM s FULL OUTER JOIN c ON s.nk = c.nk
ORDER BY nk
"""


QUERIES["drop_dup_keep_first"] = (drop_dup_keep_first, DROP_DUP_SQL)
QUERIES["combine_first_balances"] = (combine_first_balances, COMBINE_FIRST_SQL)


def string_ops2(spark, sf_dir):
    """.str accessor batch 3 (reference: _str_accessor.py:22-75):
    translate, findall (regexp_extract_all), partition, rjust,
    match-at-start, istitle-style predicate."""
    part = tbl(spark, sf_dir, "part")
    res = (
        part.assign(
            vowels=lambda d: d["p_name"].str.translate("aeiou", "AEIOU"),
            n_words=lambda d: d["p_name"].str.count("[a-z]+").astype("long"),
            words=lambda d: d["p_name"].str.findall("[a-z]+").str.join(","),
            head=lambda d: d["p_name"].str.partition(" ").str.join("|"),
            padded=lambda d: d["p_name"].str.rjust(16, "."),
            two_words=lambda d: d["p_name"].str.match("[a-z]+ [a-z]+$"),
        )
        .groupby("p_brand")
        .agg(
            n=("p_partkey", "count"),
            n_two_words=("two_words", lambda c: F.sum(c.cast("long"))),
            sum_words=("n_words", "sum"),
            min_vowels=("vowels", "min"),
            min_words=("words", "min"),
            max_padded=("padded", "max"),
            min_head=("head", "min"),
        )
        .sort_values("p_brand")
    )
    return res.to_spark()


STRING_OPS2_SQL = """
SELECT p_brand, count(p_partkey) AS n,
       CAST(sum(CASE WHEN regexp_matches(p_name, '^[a-z]+ [a-z]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_two_words,
       CAST(sum(len(regexp_extract_all(p_name, '[a-z]+', 0))) AS BIGINT) AS sum_words,
       min(translate(p_name, 'aeiou', 'AEIOU')) AS min_vowels,
       min(array_to_string(regexp_extract_all(p_name, '[a-z]+', 0), ',')) AS min_words,
       max(lpad(p_name, 16, '.')) AS max_padded,
       min(CASE WHEN strpos(p_name, ' ') > 0
                THEN substr(p_name, 1, strpos(p_name, ' ') - 1) || '| |' ||
                     substr(p_name, strpos(p_name, ' ') + 1)
                ELSE p_name || '||' END) AS min_head
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def date_ops2(spark, sf_dir):
    """.dt accessor batch 3 (reference: _datetime.py:15-71):
    is_leap_year, is_quarter_end, is_year_end, round-to-hour,
    weekday alias — aggregated per event_type."""
    ev = tbl(spark, sf_dir, "events")
    res = (
        ev.assign(
            leap=lambda d: d["ts"].dt.is_leap_year,
            qend=lambda d: d["ts"].dt.is_quarter_end,
            yend=lambda d: d["ts"].dt.is_year_end,
            rhour=lambda d: d["ts"].dt.round("H"),
            wd=lambda d: d["ts"].dt.weekday,
        )
        .groupby("event_type")
        .agg(
            n=("event_id", "count"),
            n_leap=("leap", lambda c: F.sum(c.cast("long"))),
            n_qend=("qend", lambda c: F.sum(c.cast("long"))),
            n_yend=("yend", lambda c: F.sum(c.cast("long"))),
            n_hours=("rhour", "nunique"),
            max_rhour=("rhour", "max"),
            sum_wd=("wd", lambda c: F.sum(c.cast("long"))),
        )
        .sort_values("event_type")
    )
    return res.to_spark()


DATE_OPS2_SQL = """
SELECT event_type, count(event_id) AS n,
       CAST(sum(CASE WHEN (year(ts) % 4 = 0 AND (year(ts) % 100 <> 0 OR year(ts) % 400 = 0)) THEN 1 ELSE 0 END) AS BIGINT) AS n_leap,
       CAST(sum(CASE WHEN date_trunc('day', ts) = date_trunc('quarter', ts) + INTERVAL 3 MONTH - INTERVAL 1 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_qend,
       CAST(sum(CASE WHEN month(ts) = 12 AND day(ts) = 31 THEN 1 ELSE 0 END) AS BIGINT) AS n_yend,
       CAST(count(DISTINCT to_timestamp(CAST(round(epoch(ts)/3600) AS BIGINT)*3600)) AS BIGINT) AS n_hours,
       max(CAST(to_timestamp(CAST(round(epoch(ts)/3600) AS BIGINT)*3600) AS TIMESTAMP)) AS max_rhour,
       CAST(sum((dayofweek(ts) + 6) % 7) AS BIGINT) AS sum_wd
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES["string_ops2"] = (string_ops2, STRING_OPS2_SQL)
QUERIES["date_ops2"] = (date_ops2, DATE_OPS2_SQL)
