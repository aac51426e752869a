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
