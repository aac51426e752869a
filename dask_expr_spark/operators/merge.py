"""Join operators (reference: Merge, /root/reference/dask_expr/_merge.py:50).

Strategy selection is Catalyst's job: broadcast-hash for small sides
(bytes-based via spark.sql.autoBroadcastJoinThreshold + AQE runtime
conversion — strictly better than the reference's partition-count
heuristic at _merge.py:281-301), sort-merge / shuffled-hash otherwise,
exchange reuse for co-partitioned inputs (the reference's
partitioning-knowledge rewrite, _expr.py:409-438). We only implement
the pandas-semantics layer Spark lacks: suffix handling, indicator
columns, and the how= name mapping.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

from ..collection import DataFrame

_HOW = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full",
    "full": "full",
    "cross": "cross",
    "leftsemi": "left_semi",
    "left_semi": "left_semi",
    "leftanti": "left_anti",
    "left_anti": "left_anti",
}


def _as_list(x) -> list[str]:
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)


def merge(
    left: DataFrame,
    right: DataFrame,
    how: str = "inner",
    on: str | Sequence[str] | None = None,
    left_on: str | Sequence[str] | None = None,
    right_on: str | Sequence[str] | None = None,
    suffixes: tuple[str, str] = ("_x", "_y"),
    broadcast: bool | None = None,
    indicator: bool = False,
    left_index: bool = False,
    right_index: bool = False,
) -> DataFrame:
    """pandas.merge semantics on a Spark join
    (reference API: _collection.py:2847,5609). left_index/right_index
    join on the frames' set indexes (each normalizes to left_on/
    right_on — an index column is a plain key column here)."""
    if left_index:
        if not left._index_cols:
            raise ValueError("left_index=True needs set_index on the left")
        left_on = list(left._index_cols)
    if right_index:
        if not right._index_cols:
            raise ValueError("right_index=True needs set_index on the right")
        right_on = list(right._index_cols)
    if left_on is not None and right_on is not None and list(left_on) == list(right_on) and on is None:
        on, left_on, right_on = left_on, None, None
    spark_how = _HOW.get(how)
    if spark_how is None:
        raise ValueError(f"unsupported how={how!r}")

    lon, ron = _as_list(on or left_on), _as_list(on or right_on)
    if not lon and left.index_cols and right.index_cols:
        lon, ron = list(left.index_cols), list(right.index_cols)
    if len(lon) != len(ron) or not lon:
        raise ValueError("join keys unresolved")

    lsdf, rsdf = left.to_spark(), right.to_spark()

    semi_anti = spark_how in ("left_semi", "left_anti")
    same_keys = lon == ron

    # suffix non-key overlapping columns (pandas semantics)
    if not semi_anti:
        overlap = (set(lsdf.columns) & set(rsdf.columns)) - (
            set(lon) & set(ron) if same_keys else set()
        )
        if overlap:
            lsdf = lsdf.withColumnsRenamed({c: c + suffixes[0] for c in overlap})
            rsdf = rsdf.withColumnsRenamed({c: c + suffixes[1] for c in overlap})
            lon = [c + suffixes[0] if c in overlap else c for c in lon]
            ron = [c + suffixes[1] if c in overlap else c for c in ron]
            same_keys = lon == ron

    if indicator and not semi_anti:
        lsdf = lsdf.withColumn("__l__", F.lit(True))
        rsdf = rsdf.withColumn("__r__", F.lit(True))

    if broadcast:
        rsdf = F.broadcast(rsdf)

    if same_keys:
        joined = lsdf.join(rsdf, on=lon, how=spark_how)
    else:
        cond = None
        for lc, rc in zip(lon, ron):
            c = lsdf[lc].eqNullSafe(rsdf[rc]) if spark_how == "full" else (lsdf[lc] == rsdf[rc])
            cond = c if cond is None else (cond & c)
        joined = lsdf.join(rsdf, on=cond, how=spark_how)

    if indicator and not semi_anti:
        joined = joined.withColumn(
            "_merge",
            F.when(F.col("__l__") & F.col("__r__"), F.lit("both"))
            .when(F.col("__l__"), F.lit("left_only"))
            .otherwise(F.lit("right_only")),
        ).drop("__l__", "__r__")

    idx = tuple(c for c in left.index_cols if c in joined.columns)
    return DataFrame(joined, idx, False)


def merge_recursive(frames, on=None, how: str = "inner",
                    broadcast_tail: bool = True):
    """fold a list of frames into one join tree (reference:
    JoinRecursive, _merge.py:701). Catalyst re-orders/reshapes the
    fold — with CBO + AQE the written order is a hint, not a plan.
    broadcast_tail=True marks every frame after the first as
    broadcast-eligible (the common star-schema shape: one fact table,
    many dims); set False for chains of comparably-sized tables."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    out = frames[0]
    for f in frames[1:]:
        step_on = on
        if step_on is None:
            # pandas default: join on the column-name intersection
            step_on = [c for c in out.columns if c in set(f.columns)]
            if not step_on:
                raise ValueError("no common columns to merge on")
        out = merge(out, f, how=how, on=step_on,
                    broadcast=True if broadcast_tail else None)
    return out
