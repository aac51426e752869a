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
    on: str | None = None,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    keep_match_on: bool = False,
    left_on: str | None = None,
    right_on: str | None = None,
    left_index: bool = False,
    right_index: bool = False,
    left_by: str | Sequence[str] | None = None,
    right_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """keep_match_on=True additionally emits the matched right-side
    `on` value as ``{on}{suffix}`` (pandas drops it; useful for gap
    computations). The pandas aliases left_on/right_on,
    left_index/right_index and left_by/right_by (reference:
    _merge_asof.py:17 signature) normalize onto on/by by renaming the
    right side."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
    if on is None:
        if left_index and right_index:
            if not left._index_cols or not right._index_cols:
                raise ValueError(
                    "left_index/right_index=True needs set_index on both sides")
            on, r_on = left._index_cols[0], right._index_cols[0]
        elif left_on and right_on:
            on, r_on = left_on, right_on
        else:
            raise ValueError("pass on=, left_on+right_on, or "
                             "left_index+right_index")
        if r_on != on:
            right = DataFrame(
                right.to_spark().withColumnRenamed(r_on, on),
                tuple(on if c == r_on else c for c in right._index_cols),
                right._known_sorted)
    if by is None and (left_by or right_by):
        lb = [left_by] if isinstance(left_by, str) else list(left_by or [])
        rb = [right_by] if isinstance(right_by, str) else list(right_by or [])
        if rb and rb != lb:
            rsdf0 = right.to_spark()
            for a_, b_ in zip(lb, rb):
                if a_ != b_:
                    rsdf0 = rsdf0.withColumnRenamed(b_, a_)
            right = DataFrame(rsdf0, right._index_cols, right._known_sorted)
        by = lb
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
    carry_all = [on_r, *carry.values()]

    def match_frame(passes):
        """Frame with columns ``c+tag`` = running last-non-null match
        for each (ascending, tag) pass. With `by`: one hash exchange,
        per-group window. Without `by`: range-bucketed two-pass carry
        (operators/ordered.py _fill_cols) — per-bucket window + tiny
        broadcast cross-bucket offsets, never a global single-partition
        window. Cross-bucket the side order is irrelevant: equal `on`
        values share a bucket, so carries from earlier buckets have
        strictly smaller `on`."""
        if by:
            out = unioned
            for ascending, tag in passes:
                order = [F.col(on).asc() if ascending else F.col(on).desc(),
                         side_order]
                w = (Window.partitionBy(*by).orderBy(*order)
                     .rowsBetween(Window.unboundedPreceding, 0))
                out = out.withColumns({
                    c + tag: F.last(F.col(c), ignorenulls=True).over(w)
                    for c in carry_all
                })
            return out
        from . import ordered
        sdfb, nb, _ = ordered.with_buckets(unioned, [on])
        copies = {c + tag: F.col(c) for _, tag in passes for c in carry_all
                  if tag}
        if copies:
            sdfb = sdfb.withColumns(copies)
        for ascending, tag in passes:
            order = [F.col(on).asc() if ascending else F.col(on).desc(),
                     side_order]
            sdfb = ordered._fill_cols(
                sdfb, nb, [c + tag for c in carry_all], order,
                F.struct(F.col(on)), back=ascending, drop_bucket=False,
            )
        return sdfb.drop(ordered.B)

    def tol_gate(cols: dict, frame, matched_on: str, back: bool):
        """null out a match farther than `tolerance`."""
        if tolerance is None:
            return frame
        delta = F.expr(f"INTERVAL {tolerance}") if isinstance(tolerance, str) \
            else F.lit(tolerance)
        ok = (F.col(matched_on) >= F.col(on) - delta) if back \
            else (F.col(matched_on) <= F.col(on) + delta)
        for c in cols:
            frame = frame.withColumn(c, F.when(ok, F.col(c)))
        return frame

    if direction == "nearest":
        # both window passes over the SAME union frame — one hash
        # exchange on `by`, two in-partition sorts, no self-join. The
        # closer match wins; ties go backward (pandas convention).
        matched = match_frame([(True, "__b"), (False, "__f")])
        bcols = [c + "__b" for c in carry_all]
        fcols = [c + "__f" for c in carry_all]
        out = matched.filter(F.col("__side") == 1).drop("__side")
        out = tol_gate(list(bcols), out, on_r + "__b", back=True)
        out = tol_gate(list(fcols), out, on_r + "__f", back=False)
        ob, of = F.col(on_r + "__b"), F.col(on_r + "__f")
        out = out.withColumn(
            "__use_fwd",
            ob.isNull() | (of.isNotNull() & ((of - F.col(on)) < (F.col(on) - ob))),
        )
        for c in [on_r, *carry.values()]:
            out = out.withColumn(
                c,
                F.when(F.col("__use_fwd"), F.col(c + "__f"))
                .otherwise(F.col(c + "__b")),
            ).drop(c + "__b", c + "__f")
        out = out.drop("__use_fwd")
    else:
        matched = match_frame([(direction == "backward", "")])
        out = matched.filter(F.col("__side") == 1).drop("__side")
        out = tol_gate(list(carry_all), out, on_r, back=direction == "backward")

    if keep_match_on:
        out = out.withColumnRenamed(on_r, f"{on}{suffix}")
    else:
        out = out.drop(on_r)
    return DataFrame(out, left.index_cols, False)
