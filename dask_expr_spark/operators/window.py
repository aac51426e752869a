"""Rolling / resample operators (reference: SURVEY.md §2.6;
/root/reference/dask_expr/_rolling.py:43, _resample.py:23).

The reference builds these on known-divisions + map_overlap (copying
boundary rows between partitions). On Spark the idiomatic equivalent is
a window function over the order key: Catalyst range-partitions on the
partition keys and sorts within partitions — one shuffle, no boundary
bookkeeping, and it scales to any partition count.

Cross-engine-exact note: windowed sums/means of doubles may be computed
with different association orders by different engines (segment trees
vs running sums), so the agg helpers accept a pre-cast decimal column
when bit-stable results are required (see queries/_util.dec_sum).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..collection import DataFrame


def window_weights(win_type: str, n: int, std: float | None = None):
    """Symmetric window weights (the scipy.signal.get_window shapes the
    reference accepts, _rolling.py:43-233) — computed here from the
    published closed forms so no scipy dependency is needed."""
    import numpy as np

    if win_type == "triang":
        if n % 2 == 0:
            k = np.arange(1, n // 2 + 1)
            w = (2 * k - 1.0) / n
            w = np.concatenate([w, w[::-1]])
        else:
            k = np.arange(1, (n + 1) // 2 + 1)
            w = 2.0 * k / (n + 1)
            w = np.concatenate([w, w[-2::-1]])
    elif win_type == "gaussian":
        if std is None:
            raise ValueError("win_type='gaussian' needs std= (pass to the agg, e.g. .mean(std=3))")
        k = np.arange(n) - (n - 1) / 2.0
        w = np.exp(-(k ** 2) / (2.0 * std * std))
    elif win_type == "boxcar":
        w = np.ones(n)
    elif win_type == "bartlett":
        k = np.arange(n)
        w = np.where(n == 1, 1.0, 1.0 - np.abs(2.0 * k / max(n - 1, 1) - 1.0))
    elif win_type == "hann":
        k = np.arange(n)
        w = 0.5 - 0.5 * np.cos(2 * np.pi * k / max(n - 1, 1))
    elif win_type == "hamming":
        k = np.arange(n)
        w = 0.54 - 0.46 * np.cos(2 * np.pi * k / max(n - 1, 1))
    elif win_type == "blackman":
        k = np.arange(n)
        w = (0.42 - 0.5 * np.cos(2 * np.pi * k / max(n - 1, 1))
             + 0.08 * np.cos(4 * np.pi * k / max(n - 1, 1)))
    # -- round 4: the scipy.signal long tail (reference _rolling.py:43
    #    delegates to scipy.signal.get_window(sym=True); same published
    #    closed forms here, numpy-only — kaiser via np.kaiser) ---------
    elif win_type == "kaiser":
        if std is None:
            raise ValueError("win_type='kaiser' needs beta= via the agg's "
                             "std= parameter (e.g. .mean(std=14))")
        w = np.kaiser(n, float(std))
    elif win_type == "exponential":
        tau = float(std) if std is not None else 1.0
        center = (n - 1) / 2.0  # symmetric (pandas requires sym windows)
        k = np.arange(n)
        w = np.exp(-np.abs(k - center) / tau)
    elif win_type == "tukey":
        alpha = float(std) if std is not None else 0.5
        k = np.arange(n)
        w = np.ones(n)
        if alpha > 0 and n > 1:
            edge = alpha * (n - 1) / 2.0
            lo = k < edge
            hi = k > (n - 1) - edge
            w[lo] = 0.5 * (1 + np.cos(np.pi * (2 * k[lo] / (alpha * (n - 1)) - 1)))
            w[hi] = 0.5 * (1 + np.cos(np.pi * (2 * k[hi] / (alpha * (n - 1))
                                               - 2 / alpha + 1)))
    elif win_type == "parzen":
        k = np.arange(n) - (n - 1) / 2.0
        nn = n / 2.0
        a = np.abs(k)
        w = np.where(
            a <= nn / 2.0,
            1 - 6 * (a / nn) ** 2 * (1 - a / nn),
            2 * (1 - a / nn) ** 3,
        )
    elif win_type == "bohman":
        x = np.abs(np.linspace(-1, 1, n)) if n > 1 else np.zeros(1)
        w = (1 - x) * np.cos(np.pi * x) + np.sin(np.pi * x) / np.pi
    elif win_type == "cosine":
        k = np.arange(n)
        w = np.sin(np.pi * (k + 0.5) / n)
    elif win_type in ("nuttall", "blackmanharris", "flattop"):
        coef = {
            "nuttall": [0.3635819, 0.4891775, 0.1365995, 0.0106411],
            "blackmanharris": [0.35875, 0.48829, 0.14128, 0.01168],
            "flattop": [0.21557895, 0.41663158, 0.277263158, 0.083578947,
                        0.006947368],
        }[win_type]
        k = np.arange(n)
        fac = 2 * np.pi * k / max(n - 1, 1)
        w = np.zeros(n)
        for j, a in enumerate(coef):
            w += ((-1) ** j) * a * np.cos(j * fac)
    elif win_type == "barthann":
        k = np.arange(n)
        x = np.abs(k / max(n - 1, 1) - 0.5)
        w = 0.62 - 0.48 * x + 0.38 * np.cos(2 * np.pi * x)
    else:
        raise NotImplementedError(
            f"win_type={win_type!r} not supported (triang/gaussian/boxcar/"
            "bartlett/hann/hamming/blackman/kaiser/exponential/tukey/"
            "parzen/bohman/cosine/nuttall/blackmanharris/flattop/barthann)"
        )
    return [float(v) for v in w]


class Rolling:
    """Row-count rolling frame (reference: RollingReduction,
    _rolling.py:43; `center`/time-based variants via rangeBetween;
    `win_type` weighted windows for sum/mean)."""

    def __init__(self, frame: DataFrame, window: int, order_by: str | Sequence[str],
                 partition_by: str | Sequence[str] | None = None,
                 min_periods: int | None = None, unbounded_start: bool = False,
                 center: bool = False, win_type: str | None = None):
        self._frame = frame
        self._window = window
        self._order = [order_by] if isinstance(order_by, str) else list(order_by)
        if not self._order:
            raise ValueError(
                "rolling/expanding needs an order column: set_index first "
                "or pass order_by= (an unordered cumulative window would "
                "be silently nondeterministic)"
            )
        pb = partition_by or []
        self._partition = [pb] if isinstance(pb, str) else list(pb)
        self._min_periods = min_periods if min_periods is not None else window
        self._unbounded_start = unbounded_start
        if center and unbounded_start:
            raise ValueError("center= is not defined for expanding windows")
        self._center = center
        if win_type and unbounded_start:
            raise ValueError("win_type= is not defined for expanding windows")
        self._win_type = win_type

    def _frame_bounds(self) -> tuple[int, int]:
        """window frame (start, end) in rows. center=True puts the
        label at the center, extra reach on the PAST side for even
        windows — pandas convention (reference: _rolling.py:43)."""
        if self._center:
            return -(self._window // 2), (self._window - 1) // 2
        return -(self._window - 1), 0

    def _numeric_cols(self) -> list:
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal", "boolean"}
        skip = set(self._order) | set(self._partition)
        return [
            f.name for f in self._frame.to_spark().schema.fields
            if f.name not in skip
            and f.dataType.simpleString().split("(")[0] in num
        ]

    def _prep(self):
        """(sdf, window, finish) for the window methods.

        Grouped: plain partitionBy window (one hash exchange, scales).
        Ungrouped bounded: range-bucket on the order key + pad window-1
        boundary rows from neighbors (operators/ordered.py), per-bucket
        window, drop pads — never a global single-partition window.
        Ungrouped expanding: never reaches here — algebraic aggs route
        through running-sum cumulants (`_exp_unq`, `_formula_exp`,
        `_pairwise_exp`) and the holistic ops through the bucketed
        prefix plan (`_exp_holistic_quantile` / `_exp_holistic_apply`).
        The global-window branch below remains ONLY for the raw
        `agg_expr` escape hatch on an ungrouped expanding frame."""
        sdf = self._frame.to_spark()
        if self._unbounded_start:
            start, end = Window.unboundedPreceding, 0
        else:
            start, end = self._frame_bounds()
        order = [F.col(c) for c in self._order]
        if self._partition:
            w = (Window.partitionBy(*self._partition).orderBy(*order)
                 .rowsBetween(start, end))
            return sdf, w, lambda out: out
        if self._unbounded_start:
            w = Window.orderBy(*order).rowsBetween(start, end)
            return sdf, w, lambda out: out
        from . import ordered
        sdfb, nb, _ = ordered.with_buckets(
                sdf, self._order,
                bounds=self._frame._ordered_bounds(sdf, self._order))
        fr = ordered.padded(sdfb, nb, self._order, before=-start, after=end)
        w = (Window.partitionBy(ordered.B).orderBy(*order)
             .rowsBetween(start, end))
        return fr, w, (
            lambda out: out.filter(~F.col(ordered.PAD)).drop(ordered.B, ordered.PAD)
        )

    def _wrap(self, sdf) -> DataFrame:
        return self._frame._wrap(
            sdf, known_sorted=None if self._partition else False
        )

    def _exp_unq_p(self) -> bool:
        return self._unbounded_start and not self._partition

    def _exp_unq(self, cols, suffix: str, kind: str) -> DataFrame:
        """Ungrouped expanding aggs from range-bucketed running sums
        (ordered.cumulative) — per-bucket prefix window + broadcast
        cross-bucket offsets, no global window."""
        from . import ordered
        sdf = self._frame.to_spark()
        temps, fns = {}, {}
        for c in cols:
            col = F.col(c)
            if kind in ("min", "max"):
                temps[f"__t1_{c}"] = col
                fns[f"__t1_{c}"] = kind
                if self._min_periods > 1:
                    # pandas gates min/max on min_periods too (round-5
                    # fused-stats differential caught this path skipping
                    # the gate): count non-nulls alongside the extremum
                    temps[f"__n_{c}"] = (F.when(col.isNotNull(), F.lit(1))
                                         .otherwise(0).cast("long"))
                    fns[f"__n_{c}"] = "sum"
                continue
            temps[f"__n_{c}"] = F.when(col.isNotNull(), F.lit(1)).otherwise(0).cast("long")
            fns[f"__n_{c}"] = "sum"
            if kind != "count":
                temps[f"__s1_{c}"] = col.cast("double")
                fns[f"__s1_{c}"] = "sum"
            if kind in ("var", "std"):
                temps[f"__s2_{c}"] = (col * col).cast("double")
                fns[f"__s2_{c}"] = "sum"
        sdf = ordered.cumulative(sdf.withColumns(temps), fns, self._order,
            bounds=self._frame._ordered_bounds(sdf, self._order))
        out = {}
        for c in cols:
            if kind in ("min", "max"):
                val = F.col(f"__t1_{c}")
                if self._min_periods > 1:
                    val = F.when(F.col(f"__n_{c}") >= self._min_periods, val)
                out[f"{c}_{suffix}"] = val
                continue
            n = F.col(f"__n_{c}")
            if kind == "count":
                val = n
            elif kind == "sum":
                val = F.col(f"__s1_{c}")
            elif kind == "mean":
                val = F.col(f"__s1_{c}") / F.nullif(n.cast("double"), F.lit(0.0))
            else:  # var / std
                nd = n.cast("double")
                v = (F.col(f"__s2_{c}") - F.col(f"__s1_{c}") * F.col(f"__s1_{c}") / nd) / (nd - 1)
                # clamp: float64 cancellation can go slightly negative
                v = F.when(n >= 2, F.greatest(v, F.lit(0.0)))
                val = F.sqrt(v) if kind == "std" else v
            if self._min_periods > 1:
                val = F.when(n >= self._min_periods, val)
            out[f"{c}_{suffix}"] = val
        return self._wrap(sdf.withColumns(out).drop(*temps.keys()))

    def _no_win_type(self):
        if self._win_type:
            raise NotImplementedError(
                "win_type windows support sum/mean/var/std "
                "(the subset pandas documents)"
            )

    def _apply(self, agg_fn, cols, suffix: str) -> DataFrame:
        self._no_win_type()
        cols = list(cols) if cols else self._numeric_cols()
        sdf, w, finish = self._prep()
        exprs = {}
        for c in cols:
            val = agg_fn(F.col(c), w)
            if self._min_periods > 1:
                val = F.when(
                    F.count(F.col(c)).over(w) >= self._min_periods, val
                )
            exprs[f"{c}_{suffix}"] = val
        return self._wrap(finish(sdf.withColumns(exprs)))

    def _weighted(self, kind: str, cols, std=None) -> DataFrame:
        """win_type weighted sum/mean (reference: _rolling.py:43-233,
        pandas roll_weighted_sum/mean semantics): each window position
        carries a fixed weight; NaN values are skipped; min_periods
        counts valid observations; mean normalizes by the valid
        weights' sum. Pure JVM higher-order functions (collect_list of
        structs keeps null positions so weights stay aligned) — no UDF,
        and the ungrouped form reuses the range-bucketed pad plan."""
        cols = list(cols) if cols else self._numeric_cols()
        n = self._window
        wvals = window_weights(self._win_type, n, std)
        warr = F.array(*[F.lit(v) for v in wvals])
        start, end = self._frame_bounds()

        sdf = self._frame.to_spark()
        order = [F.col(c) for c in self._order]
        if self._partition:
            base = Window.partitionBy(*self._partition).orderBy(*order)
            finish = lambda out: out  # noqa: E731
        else:
            from . import ordered
            sdfb, nb, _ = ordered.with_buckets(
                sdf, self._order,
                bounds=self._frame._ordered_bounds(sdf, self._order))
            sdf = ordered.padded(sdfb, nb, self._order, before=-start, after=end)
            base = Window.partitionBy(ordered.B).orderBy(*order)
            finish = lambda out: out.filter(~F.col(ordered.PAD)).drop(ordered.B, ordered.PAD)  # noqa: E731
        wfull = base.rowsBetween(start, end)
        wbefore = base.rowsBetween(start, -1)
        minp = self._min_periods

        exprs = {}
        for c in cols:
            arr = F.collect_list(F.struct(F.col(c).cast("double").alias("v"))).over(wfull)
            before = F.count(F.lit(1)).over(wbefore)
            m = F.size(arr)
            # rows clipped off the frame's front shift the weight slice:
            # element j of the frame sits at full-window position
            # (-start - before) + j
            wts = F.slice(warr, F.lit(-start) - before + F.lit(1), m)
            pairs = F.zip_with(
                arr, wts, lambda s, wt: F.struct(s["v"].alias("v"), wt.alias("w"))
            )
            valid = F.filter(pairs, lambda p: p["v"].isNotNull())
            cnt = F.size(valid)
            swx = F.aggregate(valid, F.lit(0.0), lambda a, p: a + p["v"] * p["w"])
            if kind == "sum":
                val = swx
            else:
                sw = F.aggregate(valid, F.lit(0.0), lambda a, p: a + p["w"])
                if kind == "mean":
                    val = swx / sw
                else:  # var / std: unbiased reliability-weight form
                    # Σw(x-μ)² / (Σw - Σw²/Σw)  — the published
                    # frequency/reliability-weighted sample variance
                    sw2 = F.aggregate(valid, F.lit(0.0),
                                      lambda a, p: a + p["w"] * p["w"])
                    swxx = F.aggregate(valid, F.lit(0.0),
                                       lambda a, p: a + p["v"] * p["v"] * p["w"])
                    num = swxx - swx * swx / sw
                    den = sw - sw2 / sw
                    v = F.when(cnt >= 2, F.greatest(num / den, F.lit(0.0)))
                    val = F.sqrt(v) if kind == "std" else v
            exprs[f"{c}_r{kind}"] = F.when(cnt >= F.lit(minp), val)
        return self._wrap(finish(sdf.withColumns(exprs)))

    def sum(self, cols=None, std=None):
        if self._win_type:
            return self._weighted("sum", cols, std)
        if self._exp_unq_p():
            return self._exp_unq(list(cols) if cols else self._numeric_cols(),
                                 "rsum", "sum")
        return self._apply(lambda c, w: F.sum(c).over(w), cols, "rsum")

    def mean(self, cols=None, std=None):
        if self._win_type:
            return self._weighted("mean", cols, std)
        if self._exp_unq_p():
            return self._exp_unq(list(cols) if cols else self._numeric_cols(),
                                 "rmean", "mean")
        return self._apply(lambda c, w: F.avg(c).over(w), cols, "rmean")

    def min(self, cols=None):
        if self._exp_unq_p():
            return self._exp_unq(list(cols) if cols else self._numeric_cols(),
                                 "rmin", "min")
        return self._apply(lambda c, w: F.min(c).over(w), cols, "rmin")

    def max(self, cols=None):
        if self._exp_unq_p():
            return self._exp_unq(list(cols) if cols else self._numeric_cols(),
                                 "rmax", "max")
        return self._apply(lambda c, w: F.max(c).over(w), cols, "rmax")

    def count(self, cols=None):
        if self._exp_unq_p():
            return self._exp_unq(list(cols) if cols else self._numeric_cols(),
                                 "rcount", "count")
        return self._apply(lambda c, w: F.count(c).over(w), cols, "rcount")

    def std(self, cols=None, std=None):
        if self._win_type:
            return self._weighted("std", cols, std)
        if self._exp_unq_p():
            return self._exp_unq(list(cols) if cols else self._numeric_cols(),
                                 "rstd", "std")
        return self._apply(lambda c, w: F.stddev_samp(c).over(w), cols, "rstd")

    def var(self, cols=None, std=None):
        if self._win_type:
            return self._weighted("var", cols, std)
        if self._exp_unq_p():
            return self._exp_unq(list(cols) if cols else self._numeric_cols(),
                                 "rvar", "var")
        return self._apply(lambda c, w: F.var_samp(c).over(w), cols, "rvar")

    def median(self, cols=None):
        """rolling median — F.percentile IS window-framable in Spark
        (F.median is not), JVM-side, no UDF. Ungrouped expanding
        median runs the bucketed prefix plan (`_exp_holistic_quantile`)."""
        if self._exp_unq_p():
            return self._exp_holistic_quantile(
                list(cols) if cols else self._numeric_cols(), 0.5, "rmedian"
            )
        return self._apply(
            lambda c, w: F.percentile(c, F.lit(0.5)).over(w), cols, "rmedian"
        )

    def quantile(self, q: float, cols, approx: bool = False, bins: int = 256):
        """rolling/expanding quantile. `approx=True` on an ungrouped
        expanding frame switches to the O(bins)-state histogram plan
        (ordered.expanding_approx_quantile) — the 100 TB form, whose
        cross-bucket state is a histogram instead of the value prefix
        and whose plan has NO single-partition stage at all."""
        suffix = f"rq{int(q * 100)}"
        if self._exp_unq_p():
            cols = list(cols)
            if approx:
                from . import ordered
                out = ordered.expanding_approx_quantile(
                    self._frame.to_spark(), cols, self._order, q,
                    self._min_periods,
                    {c: f"{c}_{suffix}" for c in cols}, bins=bins,
                )
                return self._wrap(out)
            return self._exp_holistic_quantile(cols, q, suffix)
        return self._apply(
            lambda c, w: F.percentile(c, F.lit(q)).over(w), cols, suffix
        )

    def _exp_holistic_quantile(self, cols, q: float, suffix: str) -> DataFrame:
        """Ungrouped expanding median/quantile without a global window:
        range-bucketed prefix-value arrays + per-bucket exact expanding
        quantile (operators/ordered.expanding_holistic). Linear
        interpolation, nulls skipped, min_periods counts non-null —
        pandas-exact BY pandas: the bucket computation concatenates
        (prefix values, bucket values) and runs pandas' Cython-skiplist
        expanding().quantile — O((p+m)·log) per bucket, NOT the
        O((p+m)·m) a per-row sorted-list insert costs (the sf1 probe
        measured that earlier form 2.1x superlinear at 10x data; this
        one is ~linear)."""
        minp = self._min_periods

        def make(pre, rows):
            import numpy as np
            import pandas as pd

            out = {}
            for c in cols:
                vals = pd.to_numeric(rows[c], errors="coerce").astype("float64").to_numpy()
                full = np.concatenate([pre[c], vals])
                r = (pd.Series(full)
                     .expanding(min_periods=max(minp, 1))
                     .quantile(q, interpolation="linear")
                     .to_numpy())
                out[f"{c}_{suffix}"] = r[len(pre[c]):]
            return out

        from . import ordered
        out = ordered.expanding_holistic(
            self._frame.to_spark(), cols, self._order, make,
            [(f"{c}_{suffix}", "double") for c in cols],
            bounds=self._frame._ordered_bounds(
                self._frame.to_spark(), self._order),
        )
        return self._wrap(out)

    def apply(self, func, cols: Sequence[str], return_type: str = "double") -> DataFrame:
        """rolling window with an arbitrary Python function (reference:
        RollingApply, _rolling.py:118). Spark shape: collect_list over
        the window frame (JVM), then ONE Arrow-batched pandas UDF maps
        func over each window array — vectorized transfer, no per-row
        Python round-trips. func receives a numpy array (nulls dropped,
        matching collect_list; min_periods gates on the non-null count).
        Ungrouped expanding apply runs the bucketed prefix plan."""
        import numpy as np

        if self._exp_unq_p():
            return self._exp_holistic_apply(func, list(cols), return_type)
        sdf, w, finish = self._prep()
        minp = self._min_periods

        def make_udf():
            @F.pandas_udf(return_type)
            def _roll(s):
                import pandas as pd
                return pd.Series(
                    [func(np.asarray(a)) if len(a) >= minp else None for a in s],
                    dtype="object",
                )
            return _roll

        udf = make_udf()
        out = {}
        for c in cols:
            out[f"{c}_rapply"] = udf(F.collect_list(F.col(c)).over(w))
        return self._wrap(finish(sdf.withColumns(out)))

    def _exp_holistic_apply(self, func, cols, return_type: str) -> DataFrame:
        """Ungrouped expanding apply: ordered prefix-value arrays +
        per-bucket func calls over the growing prefix (no global
        window). func sees the null-dropped values in global order —
        same contract as the bounded rolling apply above."""
        minp = self._min_periods

        def make(pre, rows):
            import numpy as np
            import pandas as pd

            out = {}
            for c in cols:
                vals = pd.to_numeric(rows[c], errors="coerce").astype("float64").to_numpy()
                nn = ~np.isnan(vals)
                combined = np.concatenate([pre[c], vals[nn]])
                cum = len(pre[c]) + np.cumsum(nn)
                out[f"{c}_rapply"] = [
                    func(combined[:k]) if k >= minp else None for k in cum
                ]
            return out

        from . import ordered
        out = ordered.expanding_holistic(
            self._frame.to_spark(), cols, self._order, make,
            [(f"{c}_rapply", return_type) for c in cols],
            ordered_prefix=True,
            bounds=self._frame._ordered_bounds(
                self._frame.to_spark(), self._order),
        )
        return self._wrap(out)

    def agg(self, spec):
        """pandas rolling/expanding .agg (reference: RollingAgg,
        _rolling.py:43 family): a method name, a list of names (each
        applied to every numeric column), or {col: name | [names]}.
        Desugars onto the named methods, so every spec rides the same
        scale-safe plans (bucketed ungrouped windows, cumulant
        expanding forms) — chained window passes share one exchange."""
        if isinstance(spec, str):
            return getattr(self, spec)()
        base_cols = self._numeric_cols()
        if isinstance(spec, (list, tuple)):
            pairs = [(list(base_cols), fn) for fn in spec]
        elif isinstance(spec, dict):
            pairs = [([c], fn)
                     for c, v in spec.items()
                     for fn in ([v] if isinstance(v, str) else v)]
        else:
            raise TypeError(f"unsupported rolling agg spec: {spec!r}")
        # fuse when every fn is algebraic (round 5): one prepared
        # window pass instead of chaining, which doubles the input
        # subtree per stat on the ungrouped two-pass paths
        fusable = self._STATS_PLAIN + ("skew", "kurt")
        if not self._win_type and all(fn in fusable for _c, fn in pairs):
            moments: dict[str, list[str]] = {}
            emit: list[str] = []
            for cols, fn in pairs:
                for c in cols:
                    if fn not in moments.setdefault(c, []):
                        moments[c].append(fn)
                    name = f"{c}_r{fn}"
                    if name not in emit:
                        emit.append(name)
            res = self.stats(moments=moments)
            # chained emission order is all-columns-per-stat; stats()
            # emits per-column — reorder so the fuse is a pure plan
            # upgrade for positional consumers too (round-5 advice)
            sdf = res.to_spark()
            keep = [c for c in sdf.columns if c not in set(emit)]
            return res._wrap(sdf.select(*keep, *emit))
        cur, out = self, None
        for cols, fn in pairs:
            out = getattr(cur, fn)(cols)
            cur = Rolling(out, self._window, self._order,
                          partition_by=self._partition,
                          min_periods=self._min_periods,
                          unbounded_start=self._unbounded_start,
                          center=self._center, win_type=self._win_type)
        return out

    _STATS_PLAIN = ("sum", "mean", "min", "max", "count", "var", "std")

    def stats(self, moments=None, pairs=(), scale: int = 2) -> DataFrame:
        """Fused multi-statistic pass: every requested per-column moment
        (sum/mean/min/max/count/var/std/skew/kurt) and pairwise stat
        (cov/corr) is computed over ONE prepared window frame — or, on
        an ungrouped expanding frame, one merged ``ordered.cumulative``
        running-sum pass.

        Why this exists (round-5 plan audit): chaining single-stat
        calls doubles the input subtree per op, because each ungrouped
        two-pass plan consumes its input twice — four chained rolling
        stats compiled to SIXTEEN fact scans.  The fused pass prepares
        the bucketed/padded frame once and emits all statistics from
        it.  Output column names match the single-stat methods exactly
        (``{col}_rskew``, ``{a}_{b}_rcov``, ...), so this is a drop-in
        plan upgrade, not a semantic change.

        moments: {col: fn | [fns]}; pairs: iterable of
        (kind, a, b[, name]) with kind in {"cov", "corr"}."""
        self._no_win_type()
        moments = {
            c: ([v] if isinstance(v, str) else list(v))
            for c, v in (moments or {}).items()
        }
        pairs = [
            (p[0], p[1], p[2],
             p[3] if len(p) > 3 else f"{p[1]}_{p[2]}_r{p[0]}")
            for p in pairs
        ]
        for c, fns in moments.items():
            bad = [f for f in fns
                   if f not in self._STATS_PLAIN + ("skew", "kurt")]
            if bad:
                raise ValueError(f"stats() cannot fuse {bad} on {c!r} — "
                                 "holistic ops (median/quantile/apply) "
                                 "need their own pass")
        if any(k not in ("cov", "corr") for k, *_ in pairs):
            raise ValueError("pairs kinds must be 'cov' or 'corr'")
        if self._exp_unq_p():
            return self._stats_exp(moments, pairs, scale)

        sdf, w, finish = self._prep()
        tmp: dict[str, Column] = {}
        out: dict[str, Column] = {}
        for c, fns in moments.items():
            order = max([3] * ("skew" in fns) + [4] * ("kurt" in fns),
                        default=0)
            if order:
                tmp.update(self._moment_sums(c, w, order, scale))
            for fn in fns:
                if fn in ("skew", "kurt"):
                    o = 3 if fn == "skew" else 4
                    names = {"n": f"_{c}_n"}
                    names.update({f"s{i}": f"_{c}_s{i}"
                                  for i in range(1, o + 1)})
                    t = ROLL_SKEW_T if fn == "skew" else ROLL_KURT_T
                    val = F.expr(t.format(**names))
                    gate = F.col(f"_{c}_n")
                else:
                    agg = {"sum": F.sum, "mean": F.avg, "min": F.min,
                           "max": F.max, "count": F.count,
                           "var": F.var_samp, "std": F.stddev_samp}[fn]
                    val = agg(F.col(c)).over(w)
                    gate = F.count(F.col(c)).over(w)
                if self._min_periods > 1:
                    val = F.when(gate >= self._min_periods, val)
                out[f"{c}_r{fn}"] = val
        for i, (kind, a, b, name) in enumerate(pairs):
            ps = {k.replace("_p_", f"_p{i}_"): v
                  for k, v in self._pair_sums(a, b, w, scale).items()}
            tmp.update(ps)
            names = {k: f"_p{i}_{k}"
                     for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
            t = ROLL_COV_T if kind == "cov" else ROLL_CORR_T
            val = F.expr(t.format(**names))
            if self._min_periods > 1:
                val = F.when(F.col(f"_p{i}_n") >= self._min_periods, val)
            out[name] = val
        sdf = sdf.withColumns(tmp)
        return self._wrap(finish(sdf.withColumns(out).drop(*tmp.keys())))

    def _stats_exp(self, moments, pairs, scale: int) -> DataFrame:
        """Fused ungrouped-expanding stats: one merged running-sum pass
        through ordered.cumulative for every requested statistic."""
        from . import ordered
        sdf = self._frame.to_spark()
        tmp: dict[str, Column] = {}
        fns: dict[str, str] = {}
        for c, fs in moments.items():
            col = F.col(c)
            if any(f in ("min", "max") for f in fs):
                for f in ("min", "max"):
                    if f in fs:
                        tmp[f"_{c}_{f}"] = col
                        fns[f"_{c}_{f}"] = f
            tmp[f"_{c}_n"] = (F.when(col.isNotNull(), F.lit(1))
                              .otherwise(0).cast("long"))
            fns[f"_{c}_n"] = "sum"
            # sum/mean/var/std accumulate in float64, matching the
            # single-stat _exp_unq path — a decimal(38,scale*i+2) cast
            # here would round small-magnitude inputs (~1e-5) to zero
            # before summing (round-5 advice)
            if any(f in ("sum", "mean", "var", "std") for f in fs):
                tmp[f"_{c}_d1"] = col.cast("double")
                fns[f"_{c}_d1"] = "sum"
            if any(f in ("var", "std") for f in fs):
                tmp[f"_{c}_d2"] = (col * col).cast("double")
                fns[f"_{c}_d2"] = "sum"
            # decimal power sums only for the higher moments, where the
            # bit-stable-across-engines convention already holds
            order = max([3] * ("skew" in fs) + [4] * ("kurt" in fs),
                        default=0)
            p = col
            for i in range(1, order + 1):
                digits = min(scale * i + 2, 18)
                tmp[f"_{c}_s{i}"] = p.cast(f"decimal(38,{digits})")
                fns[f"_{c}_s{i}"] = "sum"
                p = p * col
        for i, (kind, a, b, _name) in enumerate(pairs):
            ca, cb = F.col(a), F.col(b)
            d2 = min(2 * scale + 2, 18)
            d1 = min(scale + 2, 18)
            tmp.update({
                f"_p{i}_n": (F.when(ca.isNotNull(), F.lit(1))
                             .otherwise(0).cast("long")),
                f"_p{i}_sx": ca.cast(f"decimal(38,{d1})"),
                f"_p{i}_sy": cb.cast(f"decimal(38,{d1})"),
                f"_p{i}_sxx": (ca * ca).cast(f"decimal(38,{d2})"),
                f"_p{i}_syy": (cb * cb).cast(f"decimal(38,{d2})"),
                f"_p{i}_sxy": (ca * cb).cast(f"decimal(38,{d2})"),
            })
            for k in ("n", "sx", "sy", "sxx", "syy", "sxy"):
                fns[f"_p{i}_{k}"] = "sum"
        sdf = ordered.cumulative(sdf.withColumns(tmp), fns, self._order,
            bounds=self._frame._ordered_bounds(sdf, self._order))
        numeric = [k for k, f in fns.items() if f == "sum"]
        sdf = sdf.withColumns({k: F.col(k).cast("double") for k in numeric})
        out: dict[str, Column] = {}
        for c, fs in moments.items():
            n = F.col(f"_{c}_n")
            for f in fs:
                if f == "count":
                    val = n.cast("long")
                elif f == "sum":
                    val = F.col(f"_{c}_d1")
                elif f == "mean":
                    val = F.col(f"_{c}_d1") / F.nullif(n, F.lit(0.0))
                elif f in ("min", "max"):
                    val = F.col(f"_{c}_{f}")
                elif f in ("var", "std"):
                    v = (F.col(f"_{c}_d2")
                         - F.col(f"_{c}_d1") * F.col(f"_{c}_d1") / n) / (n - 1)
                    v = F.when(n >= 2, F.greatest(v, F.lit(0.0)))
                    val = F.sqrt(v) if f == "std" else v
                else:
                    o = 3 if f == "skew" else 4
                    names = {"n": f"_{c}_n"}
                    names.update({f"s{i}": f"_{c}_s{i}"
                                  for i in range(1, o + 1)})
                    t = ROLL_SKEW_T if f == "skew" else ROLL_KURT_T
                    val = F.expr(t.format(**names))
                if self._min_periods > 1:
                    val = F.when(n >= self._min_periods, val)
                out[f"{c}_r{f}"] = val
        for i, (kind, a, b, name) in enumerate(pairs):
            names = {k: f"_p{i}_{k}"
                     for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
            t = ROLL_COV_T if kind == "cov" else ROLL_CORR_T
            val = F.expr(t.format(**names))
            if self._min_periods > 1:
                val = F.when(F.col(f"_p{i}_n") >= self._min_periods, val)
            out[name] = val
        return self._wrap(sdf.withColumns(out).drop(*tmp.keys()))

    def agg_expr(self, **exprs: Column) -> DataFrame:
        """Escape hatch: arbitrary window aggregates over the rolling frame.
        Each value is a function Column→window→Column applied via .over()."""
        sdf, w, finish = self._prep()
        out = {name: e.over(w) for name, e in exprs.items()}
        return self._wrap(finish(sdf.withColumns(out)))

    # -- higher moments / pairwise (reference: RollingSkew/Kurt/Cov,
    #    _rolling.py:43 family). Computed from decimal-exact power sums
    #    over the window frame + the shared formula templates below, so
    #    results are bit-stable across engines (the window-sum order
    #    never touches a float). min_periods gating via windowed count.
    def _moment_sums(self, col: str, w, order: int, scale: int):
        c = F.col(col)
        sums = {f"_{col}_n": F.count(c).over(w).cast("double")}
        p = c
        for i in range(1, order + 1):
            digits = min(scale * i + 2, 18)
            sums[f"_{col}_s{i}"] = (
                F.sum(p.cast(f"decimal(38,{digits})")).over(w).cast("double")
            )
            p = p * c
        return sums

    def _formula(self, cols, order: int, scale: int, template: str, suffix: str) -> DataFrame:
        self._no_win_type()
        if self._exp_unq_p():
            return self._formula_exp(cols, order, scale, template, suffix)
        sdf, w, finish = self._prep()
        tmp: dict[str, Column] = {}
        out: dict[str, Column] = {}
        for c in cols:
            tmp.update(self._moment_sums(c, w, order, scale))
        sdf = sdf.withColumns(tmp)
        for c in cols:
            names = {"n": f"_{c}_n"}
            names.update({f"s{i}": f"_{c}_s{i}" for i in range(1, order + 1)})
            val = F.expr(template.format(**names))
            if self._min_periods > 1:
                val = F.when(F.col(f"_{c}_n") >= self._min_periods, val)
            out[f"{c}_{suffix}"] = val
        return self._wrap(finish(sdf.withColumns(out).drop(*tmp.keys())))

    def _formula_exp(self, cols, order: int, scale: int, template: str,
                     suffix: str) -> DataFrame:
        """Ungrouped expanding skew/kurt: the decimal power sums are
        RUNNING sums, so they route through ordered.cumulative
        (per-bucket prefix + broadcast offsets) — no global window."""
        from . import ordered
        sdf = self._frame.to_spark()
        tmp: dict[str, Column] = {}
        fns: dict[str, str] = {}
        for c in cols:
            col = F.col(c)
            tmp[f"_{c}_n"] = F.when(col.isNotNull(), F.lit(1)).otherwise(0).cast("long")
            fns[f"_{c}_n"] = "sum"
            p = col
            for i in range(1, order + 1):
                digits = min(scale * i + 2, 18)
                tmp[f"_{c}_s{i}"] = p.cast(f"decimal(38,{digits})")
                fns[f"_{c}_s{i}"] = "sum"
                p = p * col
        sdf = ordered.cumulative(sdf.withColumns(tmp), fns, self._order,
            bounds=self._frame._ordered_bounds(sdf, self._order))
        sdf = sdf.withColumns({k: F.col(k).cast("double") for k in tmp})
        out: dict[str, Column] = {}
        for c in cols:
            names = {"n": f"_{c}_n"}
            names.update({f"s{i}": f"_{c}_s{i}" for i in range(1, order + 1)})
            val = F.expr(template.format(**names))
            if self._min_periods > 1:
                val = F.when(F.col(f"_{c}_n") >= self._min_periods, val)
            out[f"{c}_{suffix}"] = val
        return self._wrap(sdf.withColumns(out).drop(*tmp.keys()))

    def skew(self, cols, scale: int = 2):
        """rolling population skewness g1 (same convention as the
        frame-level Skew reduction)."""
        return self._formula(cols, 3, scale, ROLL_SKEW_T, "rskew")

    def kurt(self, cols, scale: int = 2):
        """rolling excess kurtosis g2 (population)."""
        return self._formula(cols, 4, scale, ROLL_KURT_T, "rkurt")

    def _pair_sums(self, a: str, b: str, w, scale: int):
        ca, cb = F.col(a), F.col(b)
        d2 = min(2 * scale + 2, 18)
        d1 = min(scale + 2, 18)
        return {
            "_p_n": F.count(ca).over(w).cast("double"),
            "_p_sx": F.sum(ca.cast(f"decimal(38,{d1})")).over(w).cast("double"),
            "_p_sy": F.sum(cb.cast(f"decimal(38,{d1})")).over(w).cast("double"),
            "_p_sxx": F.sum((ca * ca).cast(f"decimal(38,{d2})")).over(w).cast("double"),
            "_p_syy": F.sum((cb * cb).cast(f"decimal(38,{d2})")).over(w).cast("double"),
            "_p_sxy": F.sum((ca * cb).cast(f"decimal(38,{d2})")).over(w).cast("double"),
        }

    def _pairwise(self, a: str, b: str, template: str, name: str, scale: int) -> DataFrame:
        self._no_win_type()
        if self._exp_unq_p():
            return self._pairwise_exp(a, b, template, name, scale)
        sdf, w, finish = self._prep()
        sdf = sdf.withColumns(self._pair_sums(a, b, w, scale))
        names = {"n": "_p_n", "sx": "_p_sx", "sy": "_p_sy",
                 "sxx": "_p_sxx", "syy": "_p_syy", "sxy": "_p_sxy"}
        val = F.expr(template.format(**names))
        if self._min_periods > 1:
            val = F.when(F.col("_p_n") >= self._min_periods, val)
        return self._wrap(finish(
            sdf.withColumn(name, val).drop(
                "_p_n", "_p_sx", "_p_sy", "_p_sxx", "_p_syy", "_p_sxy"
            )
        ))

    def _pairwise_exp(self, a: str, b: str, template: str, name: str,
                      scale: int) -> DataFrame:
        """Ungrouped expanding cov/corr via running pair sums
        (ordered.cumulative) — no global window. Same null convention
        as the windowed path (n counts non-null `a`)."""
        from . import ordered
        sdf = self._frame.to_spark()
        ca, cb = F.col(a), F.col(b)
        d2 = min(2 * scale + 2, 18)
        d1 = min(scale + 2, 18)
        tmp = {
            "_p_n": F.when(ca.isNotNull(), F.lit(1)).otherwise(0).cast("long"),
            "_p_sx": ca.cast(f"decimal(38,{d1})"),
            "_p_sy": cb.cast(f"decimal(38,{d1})"),
            "_p_sxx": (ca * ca).cast(f"decimal(38,{d2})"),
            "_p_syy": (cb * cb).cast(f"decimal(38,{d2})"),
            "_p_sxy": (ca * cb).cast(f"decimal(38,{d2})"),
        }
        fns = {k: "sum" for k in tmp}
        sdf = ordered.cumulative(sdf.withColumns(tmp), fns, self._order,
            bounds=self._frame._ordered_bounds(sdf, self._order))
        sdf = sdf.withColumns({k: F.col(k).cast("double") for k in tmp})
        names = {"n": "_p_n", "sx": "_p_sx", "sy": "_p_sy",
                 "sxx": "_p_sxx", "syy": "_p_syy", "sxy": "_p_sxy"}
        val = F.expr(template.format(**names))
        if self._min_periods > 1:
            val = F.when(F.col("_p_n") >= self._min_periods, val)
        return self._wrap(sdf.withColumn(name, val).drop(*tmp.keys()))

    def cov(self, a: str, b: str, scale: int = 2, name: str | None = None):
        """rolling sample covariance of two columns."""
        return self._pairwise(a, b, ROLL_COV_T, name or f"{a}_{b}_rcov", scale)

    def corr(self, a: str, b: str, scale: int = 2, name: str | None = None):
        """rolling Pearson correlation of two columns."""
        return self._pairwise(a, b, ROLL_CORR_T, name or f"{a}_{b}_rcorr", scale)


# Shared SQL formula templates over decimal-exact window power sums.
# Feed the SAME rendered string to Spark (F.expr/selectExpr) and the
# DuckDB oracle: identical parse → identical IEEE operation order →
# identical doubles. Placeholders: {n} {s1}.. or {n} {sx} {sy} {sxx}
# {syy} {sxy}.
_RM = "({s1}/{n})"
_RM2 = "({s2}/{n} - " + _RM + "*" + _RM + ")"
_RM3 = "({s3}/{n} - 3*" + _RM + "*({s2}/{n}) + 2*" + _RM + "*" + _RM + "*" + _RM + ")"
_RM4 = ("({s4}/{n} - 4*" + _RM + "*({s3}/{n}) + 6*" + _RM + "*" + _RM + "*({s2}/{n})"
        " - 3*" + _RM + "*" + _RM + "*" + _RM + "*" + _RM + ")")
ROLL_SKEW_T = ("round(" + _RM3 + " / nullif(" + _RM2 + " * sqrt" + _RM2
               + ", 0), 6)")
ROLL_KURT_T = "round(" + _RM4 + " / nullif(" + _RM2 + "*" + _RM2 + ", 0) - 3, 6)"
ROLL_COV_T = "round(({sxy} - {sx}*{sy}/{n}) / ({n} - 1), 6)"
_RVX = "(({sxx} - {sx}*{sx}/{n}) / ({n} - 1))"
_RVY = "(({syy} - {sy}*{sy}/{n}) / ({n} - 1))"
ROLL_CORR_T = ("round((({sxy} - {sx}*{sy}/{n}) / ({n} - 1))"
               " / nullif(sqrt(" + _RVX + " * " + _RVY + "), 0), 6)")


def rolling(frame: DataFrame, window: int, order_by, partition_by=None,
            min_periods: int | None = None) -> Rolling:
    return Rolling(frame, window, order_by, partition_by, min_periods)


class TimeRolling:
    """time-based rolling frame (reference: RollingReduction with a
    freq window like '2h', _rolling.py:43) — rangeBetween over
    microsecond timestamps: all rows within [t - window, t]."""

    def __init__(self, frame: DataFrame, window: str, on: str,
                 partition_by: str | Sequence[str] | None = None):
        self._frame = frame
        self._on = on
        unit_seconds = {"s": 1, "min": 60, "h": 3600, "d": 86400}
        num = "".join(ch for ch in window if ch.isdigit())
        unit = window[len(num):].strip()
        if unit not in unit_seconds:
            raise ValueError(f"unsupported time window {window!r} (use s/min/h/d)")
        self._micros = int(num) * unit_seconds[unit] * 1_000_000
        pb = partition_by or []
        self._partition = [pb] if isinstance(pb, str) else list(pb)

    def _prep(self):
        """(sdf, window, finish). Ungrouped time-rolling range-buckets
        on the timestamp and copies each row into the later buckets its
        [t, t+window] reach touches (ordered.padded_range) — per-bucket
        range window, no global single-partition window."""
        sdf = self._frame.to_spark()
        # cast: unix_micros rejects TIMESTAMP_NTZ (parquet timestamps)
        order = F.unix_micros(F.col(self._on).cast("timestamp"))
        if self._partition:
            w = (Window.partitionBy(*self._partition).orderBy(order)
                 .rangeBetween(-self._micros, 0))
            return sdf, w, lambda out: out
        from . import ordered
        sdfb, nb, bucket_fn = ordered.with_buckets(sdf, [self._on])
        dtype = dict(sdf.dtypes)[self._on]
        reach = bucket_fn(
            F.timestamp_micros(order + F.lit(self._micros)).cast(dtype)
        )
        fr = ordered.padded_range(sdfb, nb, reach)
        w = (Window.partitionBy(ordered.B).orderBy(order)
             .rangeBetween(-self._micros, 0))
        return fr, w, (
            lambda out: out.filter(~F.col(ordered.PAD)).drop(ordered.B, ordered.PAD)
        )

    def _w(self):
        """Grouped window spec for external aggregate expressions
        (decimal-exact sums in oracle-paired queries)."""
        if not self._partition:
            raise ValueError(
                "_w() is only defined for partitioned time-rolling; "
                "ungrouped frames go through _prep()'s bucketed plan"
            )
        order = F.unix_micros(F.col(self._on).cast("timestamp"))
        return (Window.partitionBy(*self._partition).orderBy(order)
                .rangeBetween(-self._micros, 0))

    def _apply(self, agg_fn, cols, suffix: str) -> DataFrame:
        if not cols:
            num = {"int", "bigint", "smallint", "tinyint", "double",
                   "float", "decimal", "boolean"}
            cols = [f.name for f in self._frame.to_spark().schema.fields
                    if f.name != self._on and f.name not in self._partition
                    and f.dataType.simpleString().split("(")[0] in num]
        sdf, w, finish = self._prep()
        exprs = {f"{c}_{suffix}": agg_fn(F.col(c), w) for c in cols}
        return self._frame._wrap(
            finish(sdf.withColumns(exprs)),
            known_sorted=None if self._partition else False,
        )

    def sum(self, cols=None): return self._apply(lambda c, w: F.sum(c).over(w), cols, "tsum")
    def mean(self, cols=None): return self._apply(lambda c, w: F.avg(c).over(w), cols, "tmean")
    def count(self, cols=None): return self._apply(lambda c, w: F.count(c).over(w), cols, "tcount")
    def min(self, cols=None): return self._apply(lambda c, w: F.min(c).over(w), cols, "tmin")
    def max(self, cols=None): return self._apply(lambda c, w: F.max(c).over(w), cols, "tmax")
    def var(self, cols=None): return self._apply(lambda c, w: F.var_samp(c).over(w), cols, "tvar")
    def std(self, cols=None): return self._apply(lambda c, w: F.stddev_samp(c).over(w), cols, "tstd")


def freq_micros(freq: str) -> int:
    """'15min' / '2h' / '1d' → microseconds (shared by shift(freq=) and
    TimeRolling)."""
    unit_seconds = {"s": 1, "min": 60, "t": 60, "h": 3600, "d": 86400,
                    "w": 7 * 86400}
    num = "".join(ch for ch in freq if ch.isdigit()) or "1"
    unit = freq[len(num):].strip().lower() if freq[:len(num)].isdigit() else freq.strip().lower()
    if unit not in unit_seconds:
        raise ValueError(f"unsupported freq {freq!r} (use s/min/h/d/w)")
    return int(num) * unit_seconds[unit] * 1_000_000


_FREQ_UNIT = {
    "s": "second", "S": "second", "min": "minute", "T": "minute",
    "h": "hour", "H": "hour", "d": "day", "D": "day",
    "w": "week", "W": "week", "M": "month", "MS": "month",
    "Q": "quarter", "Y": "year", "A": "year",
}


class Resampler:
    """Time-bin regridding (reference: ResampleReduction,
    _resample.py:23) — date_trunc + groupBy, fully parallel.

    closed/label follow pandas: closed='right' assigns a boundary
    timestamp to the PRECEDING interval (t0, t1]; label='right' labels
    each bin by its right edge."""

    def __init__(self, frame: DataFrame, freq: str, on: str,
                 closed: str = "left", label: str = "left"):
        import re

        self._frame = frame
        self._freq = freq
        self._on = on
        m = re.fullmatch(r"(\d*)\s*([a-zA-Z]+)", freq)
        n = int(m.group(1)) if m and m.group(1) else 1
        unit = _FREQ_UNIT.get(m.group(2)) if m else None
        if unit is None:
            raise ValueError(f"unsupported resample freq {freq!r}")
        if n > 1 and unit in ("month", "quarter", "year"):
            raise ValueError(
                f"multiples of calendar unit {unit!r} are not supported "
                f"(variable-length bins); use n=1")
        if closed not in ("left", "right") or label not in ("left", "right"):
            raise ValueError("closed/label must be 'left' or 'right'")
        self._unit = unit
        self._n = n
        _US = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
               "week": 604800}
        self._dur_us = n * _US[unit] * 1_000_000 if unit in _US else None
        self._closed = closed
        self._label = label

    def _bucket(self) -> Column:
        ts = F.col(self._on)
        if self._closed == "right":
            # boundary instants belong to the preceding bin: truncate
            # ts - 1µs (timestamps are µs precision engine-wide)
            ts = F.timestamp_micros(
                F.unix_micros(ts.cast("timestamp")) - 1
            ).cast(dict(self._frame.to_spark().dtypes)[self._on])
        if self._n > 1:
            # fixed-width multiple (e.g. "15min", "2h"): epoch-floor —
            # pandas' origin='start_day' alignment for UTC timestamps
            d = self._dur_us
            b = F.timestamp_micros(
                (F.unix_micros(ts.cast("timestamp")).cast("long") / d)
                .cast("long") * d)
        else:
            b = F.date_trunc(self._unit, ts)
        if self._label == "right":
            if self._n > 1:
                b = F.timestamp_micros(F.unix_micros(b) + self._dur_us)
            else:
                b = b + F.expr(f"INTERVAL 1 {self._unit.upper()}")
        return b

    def agg(self, spec=None, **named) -> DataFrame:
        sdf = self._frame.to_spark().withColumn(self._on, self._bucket())
        return DataFrame(sdf, (), False).groupby(self._on).agg(spec, **named)

    # -- convenience reductions over every numeric column (reference:
    #    Resample{Sum,Mean,Min,Max,Count,Var,Std,Median,First,Last,
    #    NUnique,Size}, _resample.py:23-291) --------------------------
    def _spec_agg(self, fn: str) -> DataFrame:
        sdf = self._frame.to_spark()
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal", "boolean"}
        cols = [
            f.name for f in sdf.schema.fields
            if f.name != self._on
            and (fn in ("count", "first", "last", "nunique")
                 or f.dataType.simpleString().split("(")[0] in num)
        ]
        if not cols:
            raise ValueError(f"no applicable columns for resample.{fn}")
        return self.agg({c: fn for c in cols})

    def sum(self): return self._spec_agg("sum")
    def mean(self): return self._spec_agg("mean")
    def min(self): return self._spec_agg("min")
    def max(self): return self._spec_agg("max")
    def count(self): return self._spec_agg("count")
    def var(self): return self._spec_agg("var")
    def std(self): return self._spec_agg("std")
    def median(self): return self._spec_agg("median")
    def first(self): return self._spec_agg("first")
    def last(self): return self._spec_agg("last")
    def nunique(self): return self._spec_agg("nunique")
    def prod(self): return self._spec_agg("prod")
    def sem(self): return self._spec_agg("sem")

    def quantile(self, q: float = 0.5) -> DataFrame:
        """per-bin interpolated quantile of every numeric column
        (reference: ResampleQuantile, _resample.py:278) — F.percentile
        is JVM-side and window/group-aggregable, no UDF."""
        sdf = self._frame.to_spark()
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal"}
        cols = [f.name for f in sdf.schema.fields
                if f.name != self._on
                and f.dataType.simpleString().split("(")[0] in num]
        if not cols:
            raise ValueError("no numeric columns for resample.quantile")
        out = (sdf.groupBy(self._bucket().alias(self._on))
               .agg(*[F.percentile(F.col(c), F.lit(float(q))).alias(c)
                      for c in cols]))
        return DataFrame(out)

    def size(self) -> DataFrame:
        sdf = self._frame.to_spark()
        out = (sdf.groupBy(self._bucket().alias(self._on))
               .agg(F.count(F.lit(1)).alias("size")))
        return DataFrame(out)

    def ohlc(self, col: str) -> DataFrame:
        """open/high/low/close (reference: ResampleOhlc, _resample.py)."""
        sdf = self._frame.to_spark()
        # first/last need a deterministic order — use min_by/max_by on the
        # raw timestamp (total order ties broken by value for determinism)
        out = (
            sdf.groupBy(self._bucket().alias(self._on))
            .agg(
                F.min_by(F.col(col), F.col(self._on)).alias("open"),
                F.max(F.col(col)).alias("high"),
                F.min(F.col(col)).alias("low"),
                F.max_by(F.col(col), F.col(self._on)).alias("close"),
            )
        )
        return DataFrame(out)


def resample(frame: DataFrame, freq: str, on: str, closed: str = "left",
             label: str = "left") -> Resampler:
    return Resampler(frame, freq, on, closed, label)
