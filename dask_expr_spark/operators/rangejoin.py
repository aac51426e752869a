"""Range (interval) join — points matched to containing intervals.

A naive `left.p BETWEEN right.lo AND right.hi` join compiles to
BroadcastNestedLoopJoin (O(n·m) and a single broadcast side) — the
plan-guard test bans exactly that. The scale shape used here is range
binning, the same strategy behind Databricks' range-join hints and
the interval-join literature: pick a bin width, explode each interval
into the bins it covers, bin each point once, equi-join on the bin id
and post-filter exact containment. Cost is linear in points +
intervals·(avg_span/bin_width), shuffles on compact bin keys, skew
handled by AQE like any other equi-join.

Numeric and timestamp keys supported (timestamps via exact integer
microseconds)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def _as_num(c: Column, is_ts: bool) -> Column:
    return F.unix_micros(c.cast("timestamp")) if is_ts else c


def merge_range(
    left: SparkDF,
    right: SparkDF,
    point: str,
    lo: str,
    hi: str,
    bin_width=None,
    how: str = "inner",
    suffix: str = "_right",
) -> SparkDF:
    """Join left rows to every right interval [lo, hi] containing
    left.point (closed on both ends, pandas IntervalIndex 'both').

    bin_width defaults to the average interval span (sampled once at
    build time) — intervals then explode to ~2 bins each. Pass it
    explicitly when spans are wildly skewed; how='left' keeps
    unmatched points with null interval columns."""
    if how not in ("inner", "left"):
        raise ValueError("merge_range supports how='inner'|'left'")
    is_ts = dict(left.dtypes)[point].startswith(("timestamp", "date"))
    p = _as_num(F.col(point), is_ts)
    l_ = _as_num(F.col(lo), is_ts)
    h_ = _as_num(F.col(hi), is_ts)

    if bin_width is None:
        row = right.select(
            F.avg(_as_num(F.col(hi), is_ts) - _as_num(F.col(lo), is_ts))
            .alias("w")
        ).collect()[0]
        bin_width = max(float(row["w"] or 1.0), 1.0)
    w = float(bin_width)

    carry = {
        c: c + suffix if c in left.columns else c for c in right.columns
    }
    rtag = right.select(
        *[F.col(c).alias(carry[c]) for c in right.columns],
        F.explode(
            F.sequence(
                F.floor(l_ / w).cast("long"), F.floor(h_ / w).cast("long")
            )
        ).alias("__bin"),
    )
    ltag = left.withColumn("__bin", F.floor(p / w).cast("long"))
    lo_c, hi_c = F.col(carry[lo]), F.col(carry[hi])
    cond = (
        (ltag["__bin"] == rtag["__bin"])
        & (p >= _as_num(lo_c, is_ts))
        & (p <= _as_num(hi_c, is_ts))
    )
    joined = ltag.join(rtag, cond, how).drop("__bin")
    return joined
