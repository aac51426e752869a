"""Statistical / reshape / cumulative operator queries (SURVEY.md §2.4,
§2.6): skew & kurtosis, pivot_table, per-group idxmax, pct_change +
cummax, rolling median.

Cross-engine exactness: higher moments are composed from decimal-exact
power sums (the established var/corr recipe in ops.py), and the final
double arithmetic is the SAME expression string fed to Spark selectExpr
and DuckDB — identical parse, identical IEEE op order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import dec_sum, dec_sum_sql, tbl

# shared double-arithmetic formulas over aliased moment sums
# (s1..s4 are decimal-exact power sums cast to double, n is the count)
_MEAN = "s1/n"
_M2 = f"s2/n - ({_MEAN})*({_MEAN})"
_M3 = f"s3/n - 3*({_MEAN})*(s2/n) + 2*({_MEAN})*({_MEAN})*({_MEAN})"
_M4 = (
    f"s4/n - 4*({_MEAN})*(s3/n) + 6*({_MEAN})*({_MEAN})*(s2/n)"
    f" - 3*({_MEAN})*({_MEAN})*({_MEAN})*({_MEAN})"
)
_SKEW = f"round(({_M3}) / (({_M2}) * sqrt({_M2})), 6)"
_KURT = f"round(({_M4}) / (({_M2})*({_M2})) - 3, 6)"


def stats_skew_kurt(spark, sf_dir):
    """population skewness g1 and excess kurtosis g2 per group
    (reference: Skew/Kurtosis, _reductions.py:1002,1022) from
    decimal-exact power sums Σq..Σq⁴ — one aggregation pass."""
    li = tbl(spark, sf_dir, "lineitem")
    moments = (
        li.assign(
            q2=lambda d: d["l_quantity"] * d["l_quantity"],
            q3=lambda d: d["l_quantity"] * d["l_quantity"] * d["l_quantity"],
            q4=lambda d: d["l_quantity"] * d["l_quantity"] * d["l_quantity"] * d["l_quantity"],
        )
        .groupby("l_returnflag")
        .agg(
            n=("l_quantity", "count"),
            s1=("l_quantity", lambda c: dec_sum(c, 2)),
            s2=("q2", lambda c: dec_sum(c, 4)),
            s3=("q3", lambda c: dec_sum(c, 6)),
            s4=("q4", lambda c: dec_sum(c, 8)),
        )
    )
    out = moments.to_spark().selectExpr(
        "l_returnflag", "n",
        f"{_SKEW} AS skew_q", f"{_KURT} AS kurt_q",
    ).orderBy("l_returnflag")
    return out


SKEW_KURT_SQL = f"""
WITH m AS (
  SELECT l_returnflag, count(l_quantity) AS n,
         {dec_sum_sql('l_quantity', 2)} AS s1,
         {dec_sum_sql('l_quantity * l_quantity', 4)} AS s2,
         {dec_sum_sql('l_quantity * l_quantity * l_quantity', 6)} AS s3,
         {dec_sum_sql('l_quantity * l_quantity * l_quantity * l_quantity', 8)} AS s4
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n, {_SKEW} AS skew_q, {_KURT} AS kurt_q
FROM m ORDER BY l_returnflag
"""


def pivot_table_priority(spark, sf_dir):
    """pivot_table (reference: _collection.py:5465): order revenue by
    priority × status. column_values pinned — no distinct-scan job,
    deterministic schema at any scale."""
    orders = tbl(spark, sf_dir, "orders")
    res = orders.pivot_table(
        "o_orderpriority", "o_orderstatus", "o_totalprice",
        aggfunc=lambda c: dec_sum(c, 2), column_values=["F", "O", "P"],
    ).sort_values("o_orderpriority")
    return res.to_spark()


PIVOT_TABLE_SQL = f"""
SELECT o_orderpriority,
       {dec_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2)} AS "F",
       {dec_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2)} AS "O",
       {dec_sum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 2)} AS "P"
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def idxmax_per_priority(spark, sf_dir):
    """per-group idxmax (reference: IdxMax, _groupby.py:1460): the
    orderkey of each priority's max totalprice, ties → smallest key.
    ONE ordinary aggregation — min of struct(-value, key) — instead of
    a window + filter pass."""
    orders = tbl(spark, sf_dir, "orders")
    res = (
        orders.groupby("o_orderpriority")
        .idxmax("o_totalprice", "o_orderkey")
        .sort_values("o_orderpriority")
    )
    return res.to_spark()


IDXMAX_SQL = """
SELECT o_orderpriority, o_orderkey AS idxmax_o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn = 1 ORDER BY o_orderpriority
"""


def daily_growth(spark, sf_dir):
    """pct_change + cummax over a daily revenue series (reference:
    pct_change _collection.py:2802, CumMax _cumulative.py:48).
    The heavy groupBy parallelizes; the ordered window then runs over
    the small aggregated series."""
    orders = tbl(spark, sf_dir, "orders")
    daily = (
        orders.groupby("o_orderdate")
        .agg(rev=("o_totalprice", lambda c: dec_sum(c, 2)))
        .assign(pct=lambda d: d["rev"], cmx=lambda d: d["rev"])
    )
    res = (
        daily.pct_change(columns=["pct"], order_by="o_orderdate")
        .cummax(["cmx"], order_by="o_orderdate")
        .sort_values("o_orderdate")
    )
    return res.to_spark()


DAILY_GROWTH_SQL = f"""
WITH d AS (
  SELECT o_orderdate, {dec_sum_sql('o_totalprice', 2)} AS rev
  FROM orders GROUP BY o_orderdate
)
SELECT o_orderdate, rev,
       (rev - lag(rev) OVER (ORDER BY o_orderdate))
         / lag(rev) OVER (ORDER BY o_orderdate) AS pct,
       max(rev) OVER (ORDER BY o_orderdate
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cmx
FROM d ORDER BY o_orderdate
"""


def rolling_median_rev(spark, sf_dir):
    """rolling 7-row median of daily revenue — JVM-side F.percentile
    window (no UDF; reference: RollingApply/median, _rolling.py:118).
    Rounded to 4: the true median has ≤3 decimals (cent sums or their
    midpoint), so rounding erases any interpolation-formula ULP."""
    orders = tbl(spark, sf_dir, "orders")
    daily = orders.groupby("o_orderdate").agg(
        rev=("o_totalprice", lambda c: dec_sum(c, 2))
    )
    res = (
        daily.rolling(7, order_by="o_orderdate", min_periods=1)
        .median(["rev"])
        .assign(rev_rmedian=lambda d: d["rev_rmedian"].round(4))
        .sort_values("o_orderdate")
    )
    return res.to_spark()


ROLLING_MEDIAN_SQL = f"""
WITH d AS (
  SELECT o_orderdate, {dec_sum_sql('o_totalprice', 2)} AS rev
  FROM orders GROUP BY o_orderdate
)
SELECT o_orderdate, rev,
       round(median(rev) OVER (ORDER BY o_orderdate
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
         AS rev_rmedian
FROM d ORDER BY o_orderdate
"""


def rolling_moments_daily(spark, sf_dir):
    """7-day rolling skewness, excess kurtosis, covariance, and
    correlation of daily order revenue vs order count (reference:
    RollingSkew/Kurt/Cov, _rolling.py:43 family). All four come from
    decimal-exact window power sums; the final double arithmetic is the
    SAME template string on both engines (operators/window.py ROLL_*_T),
    so the hash is bit-stable."""
    orders = tbl(spark, sf_dir, "orders")
    daily_sdf = (
        orders.to_spark()
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            dec_sum(F.col("o_totalprice"), 2).alias("rev"),
            F.count(F.lit(1)).cast("double").alias("n_orders"),
        )
    )
    from ..collection import DataFrame as _DF

    daily = _DF(daily_sdf)
    # fused multi-stat pass (round 5): one prepared window frame for
    # all four statistics — the chained single-stat form compiled to
    # 16 fact scans (each two-pass stage doubles its input subtree)
    res = daily.rolling(7, order_by="day").stats(
        moments={"rev": ["skew", "kurt"]},
        pairs=[("cov", "rev", "n_orders", "rev_orders_rcov"),
               ("corr", "rev", "n_orders", "rev_orders_rcorr")],
    )
    return (
        res.to_spark()
        .select("day", "rev", "rev_rskew", "rev_rkurt",
                "rev_orders_rcov", "rev_orders_rcorr")
        .orderBy("day")
    )


def _roll_moments_sql() -> str:
    from ..operators.window import (
        ROLL_CORR_T,
        ROLL_COV_T,
        ROLL_KURT_T,
        ROLL_SKEW_T,
    )

    one = {"n": "n", "s1": "s1", "s2": "s2", "s3": "s3", "s4": "s4"}
    pair = {"n": "n", "sx": "s1", "sy": "sy", "sxx": "s2", "syy": "syy",
            "sxy": "sxy"}
    return f"""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         {dec_sum_sql('o_totalprice', 2)} AS rev,
         CAST(count(*) AS DOUBLE) AS n_orders
  FROM orders GROUP BY day
), m AS (
  SELECT day, rev,
    CAST(count(rev) OVER w AS DOUBLE) AS n,
    CAST(sum(CAST(rev AS DECIMAL(38,4))) OVER w AS DOUBLE) AS s1,
    CAST(sum(CAST(rev*rev AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2,
    CAST(sum(CAST(rev*rev*rev AS DECIMAL(38,8))) OVER w AS DOUBLE) AS s3,
    CAST(sum(CAST(rev*rev*rev*rev AS DECIMAL(38,10))) OVER w AS DOUBLE) AS s4,
    CAST(sum(CAST(n_orders AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sy,
    CAST(sum(CAST(n_orders*n_orders AS DECIMAL(38,6))) OVER w AS DOUBLE) AS syy,
    CAST(sum(CAST(rev*n_orders AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxy
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, rev,
  CASE WHEN n >= 7 THEN {ROLL_SKEW_T.format(**one)} END AS rev_rskew,
  CASE WHEN n >= 7 THEN {ROLL_KURT_T.format(**one)} END AS rev_rkurt,
  CASE WHEN n >= 7 THEN {ROLL_COV_T.format(**pair)} END AS rev_orders_rcov,
  CASE WHEN n >= 7 THEN {ROLL_CORR_T.format(**pair)} END AS rev_orders_rcorr
FROM m ORDER BY day
"""


ROLLING_MOMENTS_SQL = _roll_moments_sql()




def rank_priority_totals(spark, sf_dir):
    """global value ranks with pandas tie semantics via Series.rank
    (average + dense methods; reference has no rank — extension per
    SURVEY §2.6 note), aggregated per order priority. The rank is
    computed on the distinct-value frame and joined back — no global
    per-row window (collection.py Series.rank)."""
    od = tbl(spark, sf_dir, "orders").set_index("o_orderkey")
    avg_r = od["o_totalprice"].rank().to_frame("avg_rank")
    dense_r = od["o_totalprice"].rank(method="dense").to_frame("dense_rank")
    pri = od[["o_orderpriority"]].reset_index()
    j = pri.merge(avg_r.reset_index(), on="o_orderkey").merge(
        dense_r.reset_index(), on="o_orderkey")
    sdf = (
        j.to_spark()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("avg_rank").cast("decimal(27,1)")).cast("double").alias("rank_sum"),
            F.max("dense_rank").alias("max_dense"),
        )
        .orderBy("o_orderpriority")
    )
    return sdf


RANK_SQL = """
WITH r AS (
  SELECT o_orderpriority,
         rank() OVER (ORDER BY o_totalprice)
           + (count(*) OVER (PARTITION BY o_totalprice) - 1) / 2.0 AS avg_rank,
         dense_rank() OVER (ORDER BY o_totalprice) AS dense_rank
  FROM orders
)
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(avg_rank AS DECIMAL(27,1))) AS DOUBLE) AS rank_sum,
       CAST(max(dense_rank) AS DOUBLE) AS max_dense
FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES = {
    "stats_skew_kurt": (stats_skew_kurt, SKEW_KURT_SQL),
    "rolling_moments_daily": (rolling_moments_daily, ROLLING_MOMENTS_SQL),
    "pivot_table_priority": (pivot_table_priority, PIVOT_TABLE_SQL),
    "idxmax_per_priority": (idxmax_per_priority, IDXMAX_SQL),
    "daily_growth": (daily_growth, DAILY_GROWTH_SQL),
    "rolling_median_rev": (rolling_median_rev, ROLLING_MEDIAN_SQL),
    "rank_priority_totals": (rank_priority_totals, RANK_SQL),
}
