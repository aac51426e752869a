"""Approximate + index-slicing queries: HLL distinct counts,
approx percentiles, seeded sampling (engine-specific sketches →
rows-only checks), and exact loc/map queries with oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import dec_sum, dec_sum_sql, tbl


def approx_distinct_parts(spark, sf_dir):
    """HyperLogLog distinct counts (reference: NuniqueApprox b=16,
    _reductions.py:1295) — sketch values are engine-specific →
    rows-only check; the exact twin is nunique_by_group."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupby("l_returnflag")
        .agg(
            approx_parts=("l_partkey", "approx_nunique"),
            approx_orders=("l_orderkey", "approx_nunique"),
        )
        .sort_values("l_returnflag")
        .to_spark()
    )


def approx_quantiles_price(spark, sf_dir):
    """percentile_approx sketch (reference: tdigest option of
    SeriesQuantile, _quantile.py:14) — rows-only."""
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.groupby("o_orderstatus")
        .agg(
            p50=("o_totalprice", lambda c: F.percentile_approx(c, 0.5)),
            p95=("o_totalprice", lambda c: F.percentile_approx(c, 0.95)),
        )
        .sort_values("o_orderstatus")
        .to_spark()
    )


def sample_orders(spark, sf_dir):
    """seeded Bernoulli sample (reference: Sample, _expr.py:1168) —
    sampling is engine-specific → rows-only."""
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.sample(0.1, seed=42)
        .groupby("o_orderstatus")
        .agg(n=("o_orderkey", "count"))
        .sort_values("o_orderstatus")
        .to_spark()
    )


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
    "approx_distinct_parts": (approx_distinct_parts, None),
    "approx_quantiles_price": (approx_quantiles_price, None),
    "sample_orders": (sample_orders, None),
    "loc_orderkey_slice": (loc_orderkey_slice, LOC_SQL),
    "series_map_status": (series_map_status, SERIES_MAP_SQL),
}
