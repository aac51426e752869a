"""Approximate + index-slicing queries.

Round-3 upgrade: the three sketch/sampling queries carry
tolerance-checked oracles instead of rows-only checks. Sketch values
are engine-specific, so each query emits the EXACT statistic (hash-
checked against DuckDB) plus boolean flags asserting the approximate
value sits within its published error bound — an approximation drifting
out of tolerance now surfaces as a driver hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import dec_sum, dec_sum_sql, tbl

APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS parts_ok, TRUE AS orders_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def approx_distinct_parts(spark, sf_dir):
    """HyperLogLog distinct counts (reference: NuniqueApprox b=16,
    _reductions.py:1295). Output = exact counts (hash-checked) + flags
    that the HLL estimate is within 15% (= 3x the default 5% rsd)."""
    li = tbl(spark, sf_dir, "lineitem")
    g = (
        li.groupby("l_returnflag")
        .agg(
            approx_parts=("l_partkey", "approx_nunique"),
            approx_orders=("l_orderkey", "approx_nunique"),
            exact_parts=("l_partkey", "nunique"),
            exact_orders=("l_orderkey", "nunique"),
        )
        .sort_values("l_returnflag")
        .to_spark()
    )
    def ok(a, e):
        return (F.abs(F.col(a) - F.col(e))
                <= F.col(e).cast("double") * 0.15)
    return g.select(
        "l_returnflag", "exact_parts", "exact_orders",
        ok("approx_parts", "exact_parts").alias("parts_ok"),
        ok("approx_orders", "exact_orders").alias("orders_ok"),
    )


APPROX_QUANTILES_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
       round(quantile_cont(o_totalprice, 0.95), 2) AS exact_p95,
       TRUE AS p50_ok, TRUE AS p95_ok
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def approx_quantiles_price(spark, sf_dir):
    """percentile_approx sketch (reference: tdigest option of
    SeriesQuantile, _quantile.py:14). Output = exact interpolated
    quantiles (hash-checked) + flags that the sketch value lies inside
    the exact [q-0.01, q+0.01] rank band — the bound the sketch's
    accuracy parameter guarantees with margin."""
    orders = tbl(spark, sf_dir, "orders")
    g = (
        orders.groupby("o_orderstatus")
        .agg(
            p50=("o_totalprice", lambda c: F.percentile_approx(c, 0.5)),
            p95=("o_totalprice", lambda c: F.percentile_approx(c, 0.95)),
            lo50=("o_totalprice", lambda c: F.percentile(c, 0.49)),
            hi50=("o_totalprice", lambda c: F.percentile(c, 0.51)),
            lo95=("o_totalprice", lambda c: F.percentile(c, 0.94)),
            hi95=("o_totalprice", lambda c: F.percentile(c, 0.96)),
            exact_p50=("o_totalprice", lambda c: F.round(F.percentile(c, 0.5), 2)),
            exact_p95=("o_totalprice", lambda c: F.round(F.percentile(c, 0.95), 2)),
        )
        .sort_values("o_orderstatus")
        .to_spark()
    )
    return g.select(
        "o_orderstatus", "exact_p50", "exact_p95",
        F.col("p50").between(F.col("lo50"), F.col("hi50")).alias("p50_ok"),
        F.col("p95").between(F.col("lo95"), F.col("hi95")).alias("p95_ok"),
    )


SAMPLE_SQL = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS total, TRUE AS n_ok
FROM orders GROUP BY 1 ORDER BY 1
"""


def sample_orders(spark, sf_dir):
    """seeded Bernoulli sample (reference: Sample, _expr.py:1168).
    Sampling is engine- and partitioning-specific, so the oracle checks
    the exact per-group population (hash) and that the sampled count
    sits within a 5-sigma binomial band around p*total."""
    orders = tbl(spark, sf_dir, "orders")
    samp = (
        orders.sample(0.1, seed=42)
        .groupby("o_orderstatus")
        .agg(n=("o_orderkey", "count"))
    )
    totals = orders.groupby("o_orderstatus").agg(total=("o_orderkey", "count"))
    j = totals.merge(samp, on="o_orderstatus", how="left").to_spark()
    p = 0.1
    mean = F.col("total").cast("double") * p
    band = F.lit(5.0) * F.sqrt(F.col("total").cast("double") * p * (1 - p)) + F.lit(5.0)
    return j.select(
        "o_orderstatus", "total",
        (F.abs(F.coalesce(F.col("n"), F.lit(0)).cast("double") - mean) <= band)
        .alias("n_ok"),
    ).orderBy("o_orderstatus")


def loc_orderkey_slice(spark, sf_dir):
    """loc label-slice on a sorted index (reference: LocIndexer
    _indexing.py:64; inclusive stop per pandas)."""
    orders = tbl(spark, sf_dir, "orders").set_index("o_orderkey")
    sliced = orders.loc[1000:2000]
    return (
        sliced.reset_index()
        .groupby("o_orderstatus")
        .agg(n=("o_orderkey", "count"), total=("o_totalprice", lambda c: dec_sum(c, 2)))
        .sort_values("o_orderstatus")
        .to_spark()
    )


LOC_SQL = f"""
SELECT o_orderstatus, count(o_orderkey) AS n, {dec_sum_sql('o_totalprice', 2)} AS total
FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def series_map_status(spark, sf_dir):
    """Series.map dict lookup (reference: Series.map,
    _collection.py:4199) — unmapped keys → null."""
    orders = tbl(spark, sf_dir, "orders")
    mapped = orders.assign(
        status_name=lambda d: d["o_orderstatus"].map(
            {"O": "open", "F": "fulfilled"}
        )
    )
    return (
        mapped.groupby("status_name", dropna=False)
        .agg(n=("o_orderkey", "count"))
        .sort_values("status_name", na_position="last")
        .to_spark()
    )


SERIES_MAP_SQL = """
SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'fulfilled' END AS status_name,
       count(o_orderkey) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "approx_distinct_parts": (approx_distinct_parts, APPROX_DISTINCT_SQL),
    "approx_quantiles_price": (approx_quantiles_price, APPROX_QUANTILES_SQL),
    "sample_orders": (sample_orders, SAMPLE_SQL),
    "loc_orderkey_slice": (loc_orderkey_slice, LOC_SQL),
    "series_map_status": (series_map_status, SERIES_MAP_SQL),
}
