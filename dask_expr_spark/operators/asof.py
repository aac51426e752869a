"""merge_asof — nearest-key join (reference:
/root/reference/dask_expr/_merge_asof.py:17; API _collection.py:5702).

The reference range-partitions both sides and propagates boundary rows
between neighbor partitions via prefix/suffix reductions
(_merge_asof.py:287,368). The Spark-first design avoids per-partition
boundary bookkeeping entirely:

    union(left tagged, right tagged)
      → window last(right_value, ignorenulls) over
        (partition by `by` order by on, side)
      → keep left rows

One exchange on the `by` key, whole-stage-codegen window, no Python
UDF, no boundary copies — works at any partition count, and skew on
`by` is handled by AQE. Tolerance and allow_exact_matches are applied
as post-filters on the matched `on` value.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..collection import DataFrame


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))

    lsdf, rsdf = left.to_spark(), right.to_spark()
    right_cols = list(right_cols) if right_cols else [
        c for c in rsdf.columns if c != on and c not in by
    ]

    # rename carried right columns; carry the right-side `on` too so we
    # can evaluate tolerance afterwards
    carry = {c: c + suffix if c in lsdf.columns else c for c in right_cols}
    on_r = on + "__asof_on"

    rtag = rsdf.select(
        *[F.col(b) for b in by],
        F.col(on).alias(on),
        F.col(on).alias(on_r),
        *[F.col(c).alias(carry[c]) for c in right_cols],
    ).withColumn("__side", F.lit(0))

    ltag = lsdf.withColumn("__side", F.lit(1))
    for c in [on_r, *carry.values()]:
        ltag = ltag.withColumn(c, F.lit(None))
    unioned = ltag.unionByName(rtag, allowMissingColumns=True)

    # order: by `on`, right rows before left rows at equal `on` when exact
    # matches are allowed (so a left row can see a same-timestamp right
    # row), after them otherwise
    side_order = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()
    order = [F.col(on).asc(), side_order]
    if direction == "forward":
        order = [F.col(on).desc(), side_order]
    w = (
        Window.partitionBy(*by).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
        if by
        else Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )

    matched = unioned
    for c in [on_r, *carry.values()]:
        matched = matched.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))

    out = matched.filter(F.col("__side") == 1).drop("__side")

    if tolerance is not None:
        if direction == "backward":
            ok = F.col(on_r) >= F.col(on) - F.expr(f"INTERVAL {tolerance}") \
                if isinstance(tolerance, str) else F.col(on_r) >= F.col(on) - F.lit(tolerance)
        else:
            ok = F.col(on_r) <= F.col(on) + F.expr(f"INTERVAL {tolerance}") \
                if isinstance(tolerance, str) else F.col(on_r) <= F.col(on) + F.lit(tolerance)
        for c in [on_r, *carry.values()]:
            out = out.withColumn(c, F.when(ok, F.col(c)))

    out = out.withColumnRenamed(on_r, f"{on}{suffix}")
    return DataFrame(out, left.index_cols, False)
