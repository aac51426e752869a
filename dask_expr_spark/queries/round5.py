"""Round-5 batch: oracle coverage for the positional partition
accessor (``df.partitions[i]`` — one of the few §2 rows that was
pytest-only), following the round-4 invariance pattern: route the data
through the operator, finish with a deterministic aggregate, let the
value hash catch any lost/duplicated row."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import cent_sum, cent_sum_sql, tbl

QUERIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


# -- df.partitions[i] invariance (reference: FrameBase.partitions,
#    _collection.py:760) ------------------------------------------------
# Concatenating partitions[0], partitions[1:3] and partitions[3:] of a
# repartitioned frame must reproduce every row exactly once — a wrong
# spark_partition_id filter (off-by-one, overlap, gap) flips n or the
# exact total.
PARTITIONS_SQL = f"""
SELECT o_orderstatus, count(*) AS n,
       {cent_sum_sql('o_totalprice')} AS total
FROM orders GROUP BY o_orderstatus
"""


@q("partitions_concat_invariance", PARTITIONS_SQL)
def partitions_concat_invariance(spark, sf_dir):
    from .. import concat

    o = tbl(spark, sf_dir, "orders").repartition(6)
    pieces = [o.partitions[0], o.partitions[1:3], o.partitions[3:6]]
    u = concat(pieces)
    return (u.to_spark().groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total")))


# -- .dt.components on a day-time interval (round-5 accessor tail;
#    reference _datetime.py:25) ----------------------------------------
# interval = ts - epoch anchor; the component decomposition is integer
# math DuckDB reproduces from epoch seconds/microseconds exactly
# (timestamps are microsecond-precision, so double epoch is exact).
COMPONENTS_SQL = """
WITH iv AS (
  SELECT CAST(floor(extract(epoch FROM ts - TIMESTAMP '2024-01-01')) AS BIGINT) AS t,
         CAST(round((extract(epoch FROM ts - TIMESTAMP '2024-01-01')
               - floor(extract(epoch FROM ts - TIMESTAMP '2024-01-01'))) * 1000000) AS BIGINT) AS us
  FROM events
),
c AS (
  SELECT CAST(floor(t / 86400) AS INT) AS days,
         CAST(floor((t % 86400) / 3600) AS INT) AS hours,
         CAST(floor((t % 3600) / 60) AS INT) AS minutes,
         CAST(t % 60 AS INT) AS seconds,
         CAST(floor(us / 1000) AS INT) AS milliseconds,
         CAST(us % 1000 AS INT) AS microseconds
  FROM iv
)
SELECT hours, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(days) AS BIGINT) AS day_sum,
       CAST(sum(minutes) AS BIGINT) AS minute_sum,
       CAST(sum(seconds) AS BIGINT) AS second_sum,
       CAST(sum(milliseconds) AS BIGINT) AS ms_sum,
       CAST(sum(microseconds) AS BIGINT) AS us_sum
FROM c GROUP BY hours ORDER BY hours
"""


@q("timedelta_components_events", COMPONENTS_SQL)
def timedelta_components_events(spark, sf_dir):
    e = tbl(spark, sf_dir, "events")
    iv = e["ts"] - F.lit("2024-01-01 00:00:00").cast("timestamp")
    comp = iv.dt.components()
    return (comp.to_spark().groupBy("hours")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("days").cast("long").alias("day_sum"),
                 F.sum("minutes").cast("long").alias("minute_sum"),
                 F.sum("seconds").cast("long").alias("second_sum"),
                 F.sum("milliseconds").cast("long").alias("ms_sum"),
                 F.sum("microseconds").cast("long").alias("us_sum"))
            .orderBy("hours"))


# -- clustered parquet write (sort_by= + cluster=) ----------------------
# reference: to_parquet writes a sorted index with known divisions
# (io/parquet.py:337); the Spark analogue is range-partition + sort
# within files so footer min/max stats prune files/row-groups.  The
# oracle aggregates the same date slice straight from the source, so a
# row lost or duplicated by the range shuffle + sorted write flips the
# value hash.
CLUSTERED_RT_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY o_orderpriority
"""


@q("parquet_clustered_roundtrip", CLUSTERED_RT_SQL)
def parquet_clustered_roundtrip(spark, sf_dir):
    import os
    import tempfile

    o = tbl(spark, sf_dir, "orders")[
        ["o_orderdate", "o_orderpriority", "o_totalprice"]]
    path = os.path.join(tempfile.gettempdir(), "rt_orders_clustered")
    o.to_parquet(path, sort_by="o_orderdate", cluster=True)
    from ..sources.io import read_parquet

    back = read_parquet(spark, path)
    back = back[(back["o_orderdate"] >= "1995-01-01")
                & (back["o_orderdate"] < "1996-01-01")]
    return (back.to_spark().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total")))
