"""Distributed ungrouped ordered operations (range-bucketed two-pass).

A global ``Window.orderBy()`` with no ``partitionBy`` funnels every row
through ONE partition — correct, but a scale-killer at 100 TB. The
reference proves a distributed form exists (its partition-serial
cumulative chain, /root/reference/dask_expr/_cumulative.py:11-145, and
its map_overlap boundary copies, _rolling.py). The Spark-first
re-expression used by every helper here:

  1. **sample** order-key boundaries once (bottom-k of a random key =
     uniform sample; quantiles computed driver-side from ~64 rows per
     bucket). One column-pruned scan, no global sort.
  2. **bucket** each row with a deterministic literal-comparison chain —
     equal keys NEVER split across buckets, so ties stay co-located.
  3. run the per-bucket window — ONE hash exchange on ``__ord_b``,
     B-way parallel, whole-stage-codegen.
  4. combine across buckets through a TINY per-bucket aggregate
     (B rows) whose running offsets are broadcast-joined back — the
     only single-partition work is over B rows, never the row stream.

Cumulative ops use per-bucket partials + broadcast offsets (step 4);
bounded ops (shift / diff / rolling / fill-with-limit) instead copy the
few boundary rows each bucket needs from its neighbors ("padding") and
drop them after the window — the reference's overlap copies, expressed
as one small union instead of a task graph.

Cost note (measured): the row-stream branch and the tiny
totals/edge branch are separate consumers of the bucketed frame, and
Catalyst's ReuseExchange does not match them after column pruning, so
the input is scanned/shuffled twice (column-pruned both times). This
is the deliberate cache-free trade-off — an InMemoryRelation build
measured ~6x the recompute at bench scale (same finding as
functions/dedup.py cache_shingles). At true 100 TB, checkpoint the
upstream frame to parquet first (one scan, pruned rereads), exactly
the reference's materialize-divisions guidance.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql.window import Window

B = "__ord_b"
PAD = "__ord_pad"


def _shuffle_partitions(sdf: SparkDF) -> int:
    try:
        return max(1, int(sdf.sparkSession.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return 32


def sample_bounds(sdf: SparkDF, order_col: str, num_buckets: int,
                  seed: int = 7, per_bucket: int = 64) -> list:
    """Range boundaries for `order_col` from a uniform sample.

    bottom-k rows by an iid random key == simple random sample of size
    k, fetched with TakeOrdered (per-partition top-k + driver merge —
    no global sort, scan prunes to the one column)."""
    if num_buckets <= 1:
        return []
    k = num_buckets * per_bucket
    samp = [
        r[0]
        for r in sdf.select(order_col)
        .where(F.col(order_col).isNotNull())
        .orderBy(F.rand(seed))
        .limit(k)
        .collect()
    ]
    if len(samp) < 2:
        return []
    samp.sort()
    out: list = []
    for i in range(1, num_buckets):
        v = samp[min(len(samp) - 1, i * len(samp) // num_buckets)]
        if not out or v > out[-1]:  # dedupe: skewed keys → fewer buckets
            out.append(v)
    return out


CHECKPOINT_CONF = "dask_expr_spark.ordered.checkpoint"

# Ceiling on the TOTAL value count an exact ungrouped expanding
# holistic op (median/quantile/apply) will accept — the last bucket's
# prefix array materializes every earlier value in one task, so this is
# the one §2 operation whose exact form cannot stay fully distributed
# (any engine pays it). 5e8 doubles ≈ 4 GB in a single task: generous
# for local/sf work, refused at true 100 TB scale where the
# approximate path is the right tool. Set to -1 to disable.
MAX_EXACT_EXPANDING_CONF = "dask_expr_spark.ordered.max_exact_expanding_rows"
_MAX_EXACT_EXPANDING_DEFAULT = 500_000_000


def _maybe_materialize(sdfb: SparkDF) -> SparkDF:
    """The documented 100 TB mitigation for the two-pass double-scan
    (module docstring 'Cost note'), as a one-flag action: with
    ``spark.conf.set("dask_expr_spark.ordered.checkpoint", "true")``
    the bucketed frame is spilled to parquet ONCE and both consumers
    (row-stream window + tiny totals/edges branch) reread it with
    column pruning — one scan of the upstream plan instead of two.

    EAGER at plan-build time (like the bounds sampling) and leaves the
    spill under the JVM's java.io.tmpdir until process exit — intended
    for one-shot large jobs, default off."""
    try:
        mode = sdfb.sparkSession.conf.get(CHECKPOINT_CONF, "false")
    except Exception:
        return sdfb
    if str(mode).lower() not in ("true", "parquet", "1"):
        return sdfb
    import tempfile
    path = tempfile.mkdtemp(prefix="des_ordered_ckpt_")
    sdfb.write.mode("overwrite").parquet(path)
    return sdfb.sparkSession.read.parquet(path)


def with_buckets(
    sdf: SparkDF, order_cols: Sequence[str], num_buckets: int | None = None,
    bounds: list | None = None,
) -> tuple[SparkDF, int, Callable[[Column], Column]]:
    """Add a deterministic range-bucket column ``__ord_b``.

    Buckets on the FIRST order column (later columns only break ties,
    and equal first-keys always share a bucket). Nulls land in bucket 0,
    matching Spark's asc-nulls-first window order. Returns
    (frame + __ord_b, n_buckets, bucket_fn) where bucket_fn maps any
    expression of the same type to its bucket id (used for value-offset
    padding, e.g. time-rolling reach)."""
    oc = order_cols[0]
    nb = num_buckets or _shuffle_partitions(sdf)
    dtype = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}[oc]
    if bounds is None:
        bounds = sample_bounds(sdf, oc, nb)
    # caller-provided bounds (facade memo): ANY bound list partitions
    # correctly — equal keys still share a bucket — bounds only steer
    # balance, so a memoized sample from an order-preserving ancestor
    # frame is both safe and saves the sampling job on derived plans
    if not bounds:
        return _maybe_materialize(sdf.withColumn(B, F.lit(0))), 1, lambda e: F.lit(0)
    # array + filter-count, not a when-chain: a chain of B branches
    # overflows whole-stage codegen's method limit around B≈1000; the
    # array form is one expression at any B (same pattern as
    # collection.map_overlap)
    barr = F.array(*[F.lit(v).cast(dtype) for v in bounds])

    def bucket_fn(e: Column) -> Column:
        return F.size(F.filter(barr, lambda b: e >= b))

    sdfb = _maybe_materialize(sdf.withColumn(B, bucket_fn(F.col(oc))))
    return sdfb, len(bounds) + 1, bucket_fn


def _asc(order_cols: Sequence[str]) -> list[Column]:
    return [F.col(c).asc() for c in order_cols]


def _desc(order_cols: Sequence[str]) -> list[Column]:
    return [F.col(c).desc() for c in order_cols]


def padded(sdfb: SparkDF, nb: int, order_cols: Sequence[str],
           before: int = 0, after: int = 0) -> SparkDF:
    """Flag frame with ``__ord_pad`` and copy each bucket's missing
    row-context in: the `before` nearest preceding rows (drawn from ANY
    earlier bucket, so buckets smaller than the window still see far
    enough back) and the `after` nearest following rows.

    Candidate pool = per-bucket head/tail rows (≤ n·B rows), fanned to
    every later/earlier bucket with sequence+explode (narrow, no join —
    far buckets are needed when intermediate buckets hold < n rows),
    then trimmed to the n nearest per target — all tiny relative to the
    row stream."""
    parts = [sdfb.withColumn(PAD, F.lit(False))]
    if nb > 1 and (before or after):
        for n, take_desc, earlier in ((before, True, True), (after, False, False)):
            if not n:
                continue
            order = _desc(order_cols) if take_desc else _asc(order_cols)
            w = Window.partitionBy(B).orderBy(*order)
            edge = (
                sdfb.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= n)
                .drop("__rn")
            )
            if earlier:
                edge = edge.filter(F.col(B) < nb - 1)
                tgts = F.sequence(F.col(B) + 1, F.lit(nb - 1))
            else:
                edge = edge.filter(F.col(B) > 0)
                tgts = F.sequence(F.lit(0), F.col(B) - 1)
            fanned = (
                edge.withColumn("__tgt", F.explode(tgts))
                .drop(B)
                .withColumnRenamed("__tgt", B)
            )
            w2 = Window.partitionBy(B).orderBy(*order)
            trimmed = (
                fanned.withColumn("__rn", F.row_number().over(w2))
                .filter(F.col("__rn") <= n)
                .drop("__rn")
            )
            parts.append(trimmed.withColumn(PAD, F.lit(True)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p.select(*parts[0].columns))
    return out


def padded_range(sdfb: SparkDF, nb: int, reach_bucket: Column) -> SparkDF:
    """Value-offset padding (time-rolling): copy each row into every
    LATER bucket whose range its reach [key, key+offset] touches.
    `reach_bucket` = bucket id of (key + offset), computed with the
    bucket_fn returned by `with_buckets`. With window-span ≪ bucket
    span (the 100 TB shape) only a boundary fringe duplicates."""
    base = sdfb.withColumn(PAD, F.lit(False))
    if nb <= 1:
        return base
    hi = F.least(reach_bucket, F.lit(nb - 1))
    # filter BEFORE sequence: Spark's sequence(a, b) with a > b counts
    # DOWN, which would fabricate a bogus target bucket
    dup = (
        sdfb.filter(hi > F.col(B))
        .withColumn("__tgt", F.explode(F.sequence(F.col(B) + 1, hi)))
        .drop(B)
        .withColumnRenamed("__tgt", B)
        .withColumn(PAD, F.lit(True))
    )
    return base.unionByName(dup.select(*base.columns))


_AGGS = {"sum": F.sum, "product": F.product, "max": F.max, "min": F.min}


def _combine(fn: str, loc: Column, off: Column) -> Column:
    if fn == "max":
        return F.greatest(loc, off)  # null-skipping, like the window agg
    if fn == "min":
        return F.least(loc, off)
    both = loc + off if fn == "sum" else loc * off
    return F.when(off.isNull(), loc).when(loc.isNull(), off).otherwise(both)


def cumulative(sdf: SparkDF, col_fns: dict[str, str],
               order_cols: Sequence[str], ascending: bool = True,
               num_buckets: int | None = None,
               mask_nulls: bool = False,
               bounds: list | None = None) -> SparkDF:
    """Replace each column in `col_fns` ({col: sum|product|max|min})
    with its running value over the global `order_cols` order.

    Two-pass: per-bucket running window, then per-bucket totals (B rows)
    whose running combination over earlier buckets is broadcast back —
    the reference's cumulative chain (_cumulative.py:11-145) without a
    serial task dependency.

    mask_nulls=True keeps the pandas cum* convention: the accumulation
    skips nulls but the OUTPUT at a null row stays null (expanding-sum
    style carries want False)."""

    def _mask(c: Column, v: Column) -> Column:
        return F.when(c.isNotNull(), v) if mask_nulls else v

    sdfb, nb, _ = with_buckets(sdf, order_cols, num_buckets, bounds=bounds)
    order = _asc(order_cols) if ascending else _desc(order_cols)
    w = (
        Window.partitionBy(B).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = sdfb.withColumns(
        {f"__loc_{c}": _AGGS[fn](F.col(c)).over(w) for c, fn in col_fns.items()}
    )
    if nb == 1:
        out = local.withColumns(
            {c: _mask(F.col(c), F.col(f"__loc_{c}")) for c in col_fns}
        )
        return out.drop(B, *[f"__loc_{c}" for c in col_fns])
    totals = sdfb.groupBy(B).agg(
        *[_AGGS[fn](F.col(c)).alias(c) for c, fn in col_fns.items()]
    )
    woff = (
        Window.orderBy(F.col(B).asc() if ascending else F.col(B).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        F.col(B),
        *[_AGGS[fn](F.col(c)).over(woff).alias(f"__off_{c}")
          for c, fn in col_fns.items()],
    )
    joined = local.join(F.broadcast(offs), B, "left")
    out = joined.withColumns(
        {c: _mask(F.col(c),
                  _combine(fn, F.col(f"__loc_{c}"), F.col(f"__off_{c}")))
         for c, fn in col_fns.items()}
    )
    return out.drop(
        B,
        *[f"__loc_{c}" for c in col_fns],
        *[f"__off_{c}" for c in col_fns],
    )


def with_lagged(sdf: SparkDF, cols: Sequence[str], order_cols: Sequence[str],
                periods: int, make: Callable[[Column, Column], Column],
                num_buckets: int | None = None,
                bounds: list | None = None) -> SparkDF:
    """shift/diff/pct_change core: per-bucket lag/lead with |periods|
    boundary rows padded in from neighboring buckets. make(col, lagged)
    produces the replacement column."""
    n = abs(periods)
    sdfb, nb, _ = with_buckets(sdf, order_cols, num_buckets, bounds=bounds)
    fr = padded(
        sdfb, nb, order_cols,
        before=n if periods >= 0 else 0,
        after=n if periods < 0 else 0,
    )
    w = Window.partitionBy(B).orderBy(*_asc(order_cols))
    fn = F.lag if periods >= 0 else F.lead
    out = fr.withColumns(
        {c: make(F.col(c), fn(F.col(c), n).over(w)) for c in cols}
    )
    return out.filter(~F.col(PAD)).drop(B, PAD)


def _fill_cols(sdfb: SparkDF, nb: int, cols: Sequence[str],
               order_exprs: Sequence[Column], nn_key: Column,
               back: bool, drop_bucket: bool = True) -> SparkDF:
    """Unlimited fill core over a pre-bucketed frame: per-bucket
    last-non-null (window) + per-bucket last-non-null VALUE (max_by /
    min_by on `nn_key`, null keys skipped) whose running carry over
    earlier (later for bfill) buckets is broadcast back."""
    w = (
        Window.partitionBy(B).orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = sdfb.withColumns(
        {f"__loc_{c}": F.last(F.col(c), ignorenulls=True).over(w) for c in cols}
    )
    if nb == 1:
        out = local.withColumns({c: F.col(f"__loc_{c}") for c in cols})
        out = out.drop(*[f"__loc_{c}" for c in cols])
        return out.drop(B) if drop_bucket else out
    mb = F.max_by if back else F.min_by
    lastvals = sdfb.groupBy(B).agg(
        *[mb(F.col(c), F.when(F.col(c).isNotNull(), nn_key)).alias(c)
          for c in cols]
    )
    woff = (
        Window.orderBy(F.col(B).asc() if back else F.col(B).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = lastvals.select(
        F.col(B),
        *[F.last(F.col(c), ignorenulls=True).over(woff).alias(f"__off_{c}")
          for c in cols],
    )
    joined = local.join(F.broadcast(offs), B, "left")
    out = joined.withColumns(
        {c: F.coalesce(F.col(f"__loc_{c}"), F.col(f"__off_{c}")) for c in cols}
    )
    out = out.drop(
        *[f"__loc_{c}" for c in cols],
        *[f"__off_{c}" for c in cols],
    )
    return out.drop(B) if drop_bucket else out


def fill(sdf: SparkDF, cols: Sequence[str], order_cols: Sequence[str],
         direction: str = "ffill", limit: int | None = None,
         num_buckets: int | None = None,
         bounds: list | None = None) -> SparkDF:
    """ffill/bfill over the global `order_cols` order (reference:
    FFill/BFill, _expr.py:3340,3373).

    limit=k becomes a BOUNDED window (last non-null within the previous
    k rows) over k padded boundary rows — no carry chain needed; the
    unlimited form runs the two-pass carry in `_fill_cols`."""
    back = direction == "ffill"
    sdfb, nb, _ = with_buckets(sdf, order_cols, num_buckets, bounds=bounds)
    order = _asc(order_cols) if back else _desc(order_cols)
    if limit is not None:
        fr = padded(
            sdfb, nb, order_cols,
            before=limit if back else 0,
            after=0 if back else limit,
        )
        w = (
            Window.partitionBy(B).orderBy(*order)
            .rowsBetween(-limit, 0)
        )
        out = fr.withColumns(
            {c: F.last(F.col(c), ignorenulls=True).over(w) for c in cols}
        )
        return out.filter(~F.col(PAD)).drop(B, PAD)
    key = F.struct(*[F.col(c) for c in order_cols])
    return _fill_cols(sdfb, nb, cols, order, key, back)


def expanding_holistic(sdf: SparkDF, value_cols: Sequence[str],
                       order_cols: Sequence[str], make_result,
                       out_fields: Sequence[tuple[str, str]],
                       ordered_prefix: bool = False,
                       num_buckets: int | None = None,
                       bounds: list | None = None) -> SparkDF:
    """Ungrouped expanding HOLISTIC ops (median / quantile / apply)
    with no global window on the row stream.

    Algebraic expanding aggs decompose into running sums
    (`cumulative`); median/quantile/apply need the entire value prefix
    by definition (reference: the pandas expanding semantics behind
    _rolling.py:43 with an unbounded start). Distributed form:

      1. range-bucket the rows (`with_buckets`);
      2. per-bucket VALUE arrays — one hash agg, nulls dropped,
         value-sorted (quantiles) or (order,value)-sorted when the
         caller needs positional order (`ordered_prefix`, apply);
      3. per-bucket PREFIX arrays: flatten earlier buckets' arrays
         with a window over the B-row arrays frame — the only
         single-partition stage, and it carries ≤B rows of
         value-only arrays, never the row stream;
      4. cogrouped applyInPandas per bucket: (bucket rows, prefix
         values) → exact pandas-side expanding computation.

    Parallelism is B-way. The prefix for the LAST bucket holds the
    whole column's values — 8 bytes/value, values only, never whole
    rows; that is the inherent cost of an EXACT holistic prefix (any
    engine pays it). At true 100 TB prefer grouped expanding or
    approximate quantiles (SCALE.md).

    make_result(prefix: dict[col, np.ndarray float64],
                rows: pd.DataFrame  # bucket rows in global order
               ) -> dict[out_name, array-like aligned to rows]
    out_fields: [(name, spark_type_ddl), ...]
    """
    sdfb, nb, _ = with_buckets(sdf, order_cols, num_buckets, bounds=bounds)
    aggs = []
    for c in value_cols:
        col = F.col(c).cast("double")
        if ordered_prefix:
            entry = F.when(
                col.isNotNull(),
                F.struct(*[F.col(o) for o in order_cols], col.alias("__v")),
            )
            arr = F.transform(
                F.array_sort(F.collect_list(entry)), lambda s: s["__v"]
            )
        else:
            arr = F.array_sort(F.collect_list(col))
        aggs.append(arr.alias(f"__arr_{c}"))
    arrs = sdfb.groupBy(B).agg(*aggs)
    wpre = Window.orderBy(B).rowsBetween(Window.unboundedPreceding, -1)
    # Scale guard (lazy, zero extra jobs): the last bucket's prefix
    # array holds every earlier value — ~8 B/value in ONE task. Above
    # the configured ceiling that is an OOM in waiting, so the total
    # value count (computed on the B-row arrays frame, already
    # single-partition here) is checked inside the prefix expression
    # itself with raise_error — same can't-be-pruned idiom as
    # collection._align_foreign. Disable with -1; the error points at
    # the O(bins) approximate path / grouped expanding (SCALE.md).
    try:
        max_rows = int(sdf.sparkSession.conf.get(
            MAX_EXACT_EXPANDING_CONF, str(_MAX_EXACT_EXPANDING_DEFAULT)))
    except Exception:
        max_rows = _MAX_EXACT_EXPANDING_DEFAULT
    wall = Window.orderBy(B).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    total_vals = F.sum(F.size(F.col(f"__arr_{value_cols[0]}"))).over(wall)
    too_big = F.lit(max_rows >= 0) & (total_vals > F.lit(max_rows))

    def _guarded(expr):
        return F.when(
            too_big,
            F.raise_error(F.concat(
                F.lit("exact ungrouped expanding holistic op over "),
                total_vals.cast("string"),
                F.lit(f" values exceeds {MAX_EXACT_EXPANDING_CONF}="
                      f"{max_rows}; use expanding().quantile(approx=True)"
                      " (O(bins) prefix), a grouped expanding, or raise"
                      " the limit (-1 disables) — see SCALE.md"),
            )),
        ).otherwise(expr)

    prefix = arrs.select(
        F.col(B),
        *[
            _guarded(
                F.flatten(F.collect_list(F.col(f"__arr_{c}")).over(wpre))
            ).alias(f"__pre_{c}")
            for c in value_cols
        ],
    )

    base_fields = [f"`{f.name}` {f.dataType.simpleString()}"
                   for f in sdf.schema.fields]
    out_schema = ", ".join(
        base_fields + [f"`{n}` {t}" for n, t in out_fields]
    )
    base_cols = [f.name for f in sdf.schema.fields]
    ocols = list(order_cols)
    vcols = list(value_cols)

    def fn(left, right):
        import numpy as np

        left = left.sort_values(ocols, kind="stable", na_position="first")
        pre = {}
        for c in vcols:
            if len(right):
                pre[c] = np.asarray(right[f"__pre_{c}"].iloc[0],
                                    dtype="float64")
            else:
                pre[c] = np.empty(0, dtype="float64")
        res = make_result(pre, left)
        out = left[base_cols].copy()
        for name, _ in out_fields:
            out[name] = res[name]
        return out

    return (
        sdfb.groupBy(B)
        .cogroup(prefix.groupBy(B))
        .applyInPandas(fn, out_schema)
    )


def expanding_approx_quantile(sdf: SparkDF, value_cols: Sequence[str],
                              order_cols: Sequence[str], q: float,
                              min_periods: int, suffixes: dict,
                              bins: int = 256,
                              num_buckets: int | None = None) -> SparkDF:
    """Approximate expanding quantile with O(bins) cross-bucket state —
    the TRUE 100 TB path for ungrouped expanding quantiles (the exact
    form, `expanding_holistic`, necessarily ships the whole value
    prefix; this ships a histogram).

      1. equi-depth-ish bin edges from one uniform sample
         (`sample_bounds` — the same eager, column-pruned job the
         bucketing itself uses);
      2. per-bucket per-bin counts + min/max (one small hash agg per
         column, rows ≤ B×bins);
      3. PREFIX histograms via a window PARTITIONED BY (col, bin) —
         fully parallel, no single-partition stage anywhere;
      4. cogrouped applyInPandas: each bucket starts from its prefix
         histogram, inserts its own values in order, and interpolates
         the quantile inside the covering bin.

    Rank error ≤ the largest bin's mass (~n/bins with equi-depth
    edges). Nulls skipped; min_periods counts non-null."""
    sdfb, nb, _ = with_buckets(sdf, order_cols, num_buckets)
    C, BIN = "__aq_c", "__aq_bin"

    edges: dict[str, list] = {}
    hists = []
    for ci, c in enumerate(value_cols):
        ed = sample_bounds(sdf, c, bins)
        edges[c] = [float(v) for v in ed]
        barr = F.array(*[F.lit(v).cast("double") for v in edges[c]]) \
            if edges[c] else F.array().cast("array<double>")
        col = F.col(c).cast("double")
        bin_idx = F.size(F.filter(barr, lambda b: col >= b))
        h = (
            sdfb.where(col.isNotNull())
            .groupBy(B, bin_idx.alias(BIN))
            .agg(F.count(F.lit(1)).alias("__cnt"),
                 F.min(col).alias("__vmin"),
                 F.max(col).alias("__vmax"))
            .withColumn(C, F.lit(ci))
        )
        hists.append(h)
    hist = hists[0]
    for h in hists[1:]:
        hist = hist.unionByName(h)
    # densify: a bucket needs the prefix count of every bin ANY earlier
    # bucket touched, not only the bins it holds itself — explode each
    # present (col, bin) combo across all bucket ids (≤ B×cols×bins
    # rows, tiny), then left-join the real counts back in
    combos = (
        hist.select(C, BIN).distinct()
        .withColumn(B, F.explode(F.sequence(F.lit(0), F.lit(nb - 1))))
    )
    filled = combos.join(hist, [B, C, BIN], "left")
    wpre = (
        Window.partitionBy(C, BIN).orderBy(B)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = filled.select(
        F.col(B), F.col(C), F.col(BIN),
        F.sum("__cnt").over(wpre).alias("__pcnt"),
        F.min("__vmin").over(wpre).alias("__pmin"),
        F.max("__vmax").over(wpre).alias("__pmax"),
    ).where(F.col("__pcnt").isNotNull())

    base_fields = [f"`{f.name}` {f.dataType.simpleString()}"
                   for f in sdf.schema.fields]
    out_schema = ", ".join(
        base_fields + [f"`{suffixes[c]}` double" for c in value_cols]
    )
    base_cols = [f.name for f in sdf.schema.fields]
    ocols = list(order_cols)
    vcols = list(value_cols)
    nedges = {c: len(edges[c]) for c in vcols}

    def fn(left, right):
        import numpy as np
        import pandas as pd

        left = left.sort_values(ocols, kind="stable", na_position="first")
        out = left[base_cols].copy()
        for ci, c in enumerate(vcols):
            ed = np.asarray(edges[c], dtype="float64")
            nb_ = nedges[c] + 1
            hist = np.zeros(nb_, dtype="int64")
            vmin, vmax = np.inf, -np.inf
            sub = right[right[C] == ci]
            for _, r in sub.iterrows():
                hist[int(r[BIN])] = int(r["__pcnt"])
                vmin = min(vmin, float(r["__pmin"]))
                vmax = max(vmax, float(r["__pmax"]))
            vals = pd.to_numeric(left[c], errors="coerce").astype("float64").to_numpy()
            res = np.full(len(vals), np.nan)
            n = int(hist.sum())
            # Fenwick tree over bins: the covering-bin search is
            # O(log bins) per row instead of a linear bin scan (which
            # made the "cheap" approximate path SLOWER than the exact
            # skiplist at 256 bins — 17 s vs 3.5 s at sf0.1)
            size = 1
            while size < nb_:
                size <<= 1
            tree = [0] * (size + 1)

            def bit_add(i, delta):
                i += 1
                while i <= size:
                    tree[i] += delta
                    i += i & (-i)

            for k0 in np.nonzero(hist)[0]:
                bit_add(int(k0), int(hist[k0]))

            for i, v in enumerate(vals):
                if not np.isnan(v):
                    k = int(np.searchsorted(ed, v, side="right"))
                    hist[k] += 1
                    bit_add(k, 1)
                    n += 1
                    vmin = min(vmin, v)
                    vmax = max(vmax, v)
                if n >= min_periods and n > 0:
                    r_ = q * (n - 1)
                    # descend: largest k with prefix(k) <= r_, i.e. the
                    # first bin where cum + hist[k] > r_ (same covering
                    # bin the linear scan found)
                    pos, cum, mask = 0, 0, size
                    while mask:
                        nxt = pos + mask
                        if nxt <= size and cum + tree[nxt] <= r_:
                            pos, cum = nxt, cum + tree[nxt]
                        mask >>= 1
                    k = pos
                    lo = ed[k - 1] if k > 0 else vmin
                    hi = ed[k] if k < nb_ - 1 else vmax
                    cnt = hist[k]
                    if cnt <= 0:
                        res[i] = lo
                    else:
                        res[i] = lo + (r_ - cum + 0.5) / cnt * (hi - lo)
            out[suffixes[c]] = res
        return out

    return (
        sdfb.groupBy(B)
        .cogroup(prefix.groupBy(B))
        .applyInPandas(fn, out_schema)
    )


def row_number_global(sdf: SparkDF, value_col: str,
                      tiebreaks: Sequence[str], ascending: bool,
                      out_col: str,
                      num_buckets: int | None = None) -> SparkDF:
    """Global row_number over (value, tiebreaks), nulls excluded (null
    rank), computed as per-bucket row_number + per-bucket offsets —
    rank(method='first') without a per-row global window.

    The offsets (≤B integers) are collected at build time and inlined
    as a literal map expression rather than broadcast-joined: one tiny
    job instead of a shuffle+broadcast, and it sidesteps a Catalyst
    self-join attribute-dedup bug (AQE + broadcast over shared lineage
    intermittently fails to rebind the pruned attributes)."""
    sdfb, nb, _ = with_buckets(sdf, [value_col], num_buckets)
    v = F.col(value_col)
    vord = v.asc_nulls_last() if ascending else v.desc_nulls_last()
    w = Window.partitionBy(B).orderBy(vord, *[F.col(c) for c in tiebreaks])
    local = sdfb.withColumn("__rn", F.row_number().over(w))
    if nb == 1:
        return (
            local.withColumn(out_col, F.when(v.isNotNull(), F.col("__rn")))
            .drop(B, "__rn")
        )
    counts = {
        int(r[0]): int(r[1])
        for r in sdfb.groupBy(B).agg(F.count(v).alias("__cnt")).collect()
    }
    acc, offs = 0, {}
    for b in sorted(counts, reverse=not ascending):
        offs[b] = acc
        acc += counts[b]
    pairs: list = []
    for b, o in offs.items():
        pairs.append(F.lit(b))
        pairs.append(F.lit(o))
    off = F.coalesce(F.element_at(F.create_map(*pairs), F.col(B)), F.lit(0))
    return (
        local.withColumn(out_col, F.when(v.isNotNull(), F.col("__rn") + off))
        .drop(B, "__rn")
    )
