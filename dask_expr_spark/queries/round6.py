"""Round-6 batch: oracle coverage for compute_current_divisions —
the last §2 row with a driver-checkable behavior that was pytest-only.
Pattern = the round-5 partitions_concat invariance: use the computed
divisions to SLICE the frame, concat the slices, and hash-check that
the union reproduces every row exactly once — a wrong boundary
(off-by-one, overlap, gap) flips n or the exact total.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import cent_sum, cent_sum_sql, tbl

QUERIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


DIVISIONS_SQL = f"""
SELECT o_orderstatus, count(*) AS n,
       {cent_sum_sql('o_totalprice')} AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("current_divisions_slice_concat", DIVISIONS_SQL)
def current_divisions_slice_concat(spark, sf_dir):
    """compute_current_divisions (reference: _collection.py:2303) on a
    range-partitioned sorted index, then loc-slice AT the computed
    boundaries and concat: divisions are per-partition [min, max], so
    loc[:d[k]] + loc[d[k]+1:] must reproduce the frame exactly (the
    index is the integer o_orderkey, so +1 is the next label).  The
    divisions collect is npartitions-bounded driver work — the same
    class as the reference's division sampling."""
    from .. import concat

    o = tbl(spark, sf_dir, "orders").set_index("o_orderkey")
    divs = o.compute_current_divisions()
    assert len(divs) >= 2 and list(divs) == sorted(divs)
    k = len(divs) // 2
    pieces = [o.loc[: divs[k]], o.loc[divs[k] + 1:]]
    u = concat(pieces).reset_index()
    return (u.to_spark().groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total"))
            .orderBy("o_orderstatus"))
