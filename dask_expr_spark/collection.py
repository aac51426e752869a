"""Pandas-style lazy collections over PySpark DataFrames.

This is the engine's equivalent of the reference's ``FrameBase`` /
``DataFrame`` / ``Series`` / ``Scalar`` collections
(/root/reference/dask_expr/_collection.py:292,2677,4077,4783) — but with
NO expression tree of our own: every facade method immediately composes
the corresponding ``pyspark.sql`` operation and Catalyst is the
optimizer (projection/filter pushdown, join strategy, partial
aggregation, whole-stage codegen all come for free; see SURVEY.md §4).

Engine-level metadata we DO track (the one thing Spark lacks,
SURVEY.md §1.4):

- ``index_cols`` — the ordered-index columns, kept as ordinary columns
  in the Spark plan and re-attached as the pandas index on
  ``compute()``. Analogue of the reference's implicit partition index.
- ``known_sorted`` — True when the frame is range-partitioned and
  sorted by ``index_cols`` (the analogue of "known divisions",
  /root/reference/dask_expr/_expr.py:378). ``set_index`` /
  ``sort_values`` establish it; order-dependent ops (shift, diff,
  cumsum, rolling, asof) key off the index columns instead of
  positional order.

Series design: a ``Series`` holds a Spark *Column expression* anchored
to an owning Spark DataFrame. Operations between Series with the same
anchor compose column expressions (narrow, fused by codegen); Series
from different anchors are aligned by an index equi-join — the Spark
analogue of the reference's ``are_co_aligned`` check
(/root/reference/dask_expr/_expr.py:3140).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["DataFrame", "Series", "Scalar", "GroupBy", "from_spark", "concat"]


# pandas/numpy dtype names → Spark SQL type names (reference: AsType,
# _expr.py:1485 accepts pandas dtypes; SURVEY §1.3 type mapping)
_DTYPE_MAP = {
    "float64": "double", "float32": "float", "float16": "float",
    "int64": "bigint", "int32": "int", "int16": "smallint", "int8": "tinyint",
    "uint64": "bigint", "uint32": "bigint", "uint16": "int", "uint8": "smallint",
    "bool": "boolean", "object": "string", "str": "string", "string": "string",
    "datetime64[ns]": "timestamp", "datetime64[us]": "timestamp",
    "category": "string",
    "Int64": "bigint", "Int32": "int", "Float64": "double", "boolean": "boolean",
}


def _spark_type(t) -> str:
    if isinstance(t, type):
        # python builtins and numpy scalar TYPES (np.int64, float, ...)
        t = t.__name__
        t = {"int": "int64", "float": "float64"}.get(t, t)
    else:
        try:
            import numpy as _np
            t = _np.dtype(t).name if isinstance(t, _np.dtype) else str(t)
        except Exception:
            t = str(t)
    return _DTYPE_MAP.get(str(t), str(t))


# --------------------------------------------------------------------------
# aggregation spec mapping (reference: GroupbyAggregation spec normalization,
# /root/reference/dask_expr/_groupby.py:374-411; frame reductions
# /root/reference/dask_expr/_reductions.py:761-1545)
# --------------------------------------------------------------------------

def _agg_expr(func, col: str) -> Column:
    c = F.col(col)
    if callable(func):
        # custom aggregation expression (reference: custom Aggregation,
        # _groupby.py:95) — Column → Column
        return func(c)
    table: dict[str, Callable[[], Column]] = {
        "sum": lambda: F.sum(c),
        "prod": lambda: F.product(c),
        "product": lambda: F.product(c),
        "mean": lambda: F.avg(c),
        "avg": lambda: F.avg(c),
        "min": lambda: F.min(c),
        "max": lambda: F.max(c),
        "count": lambda: F.count(c),
        "size": lambda: F.count(F.lit(1)),
        "first": lambda: F.first(c, ignorenulls=True),
        "last": lambda: F.last(c, ignorenulls=True),
        "var": lambda: F.var_samp(c),
        "std": lambda: F.stddev_samp(c),
        "sem": lambda: F.stddev_samp(c) / F.sqrt(F.count(c)),
        "skew": lambda: F.skewness(c),
        "kurt": lambda: F.kurtosis(c),
        "median": lambda: F.median(c),
        "nunique": lambda: F.countDistinct(c),
        "approx_nunique": lambda: F.approx_count_distinct(c),
        "any": lambda: F.max(c.cast("boolean")),
        "all": lambda: F.min(c.cast("boolean")),
        "collect_list": lambda: F.collect_list(c),
        "collect_set": lambda: F.collect_set(c),
    }
    if func not in table:
        raise ValueError(f"unsupported aggregation {func!r}")
    return table[func]()


def _normalize_agg_spec(
    spec: Any, value_cols: Sequence[str], named: Mapping[str, tuple[str, str]] | None = None
) -> list[tuple[str, str, str]]:
    """Normalize pandas-style agg specs to [(out_name, col, func)]."""
    out: list[tuple[str, str, str]] = []
    if named:
        for out_name, (col, fn) in named.items():
            out.append((out_name, col, fn))
        return out
    if spec is None:
        raise ValueError("no aggregation spec given")
    if isinstance(spec, str):
        for col in value_cols:
            out.append((col, col, spec))
    elif isinstance(spec, Mapping):
        for col, fns in spec.items():
            if isinstance(fns, str):
                out.append((col, col, fns))
            else:
                for fn in fns:
                    out.append((f"{col}_{fn}", col, fn))
    elif isinstance(spec, (list, tuple)):
        for col in value_cols:
            for fn in spec:
                out.append((f"{col}_{fn}", col, fn))
    else:
        raise TypeError(f"unsupported agg spec {type(spec)}")
    return out


# --------------------------------------------------------------------------
# collections
# --------------------------------------------------------------------------


class FrameBase:
    """Shared base (reference: FrameBase, _collection.py:292)."""

    def __init__(self, sdf: SparkDF, index_cols: Sequence[str] = (), known_sorted: bool = False):
        self._sdf = sdf
        self._index_cols = tuple(index_cols)
        self._known_sorted = bool(known_sorted)

    def _ordered_bounds(self, sdf: SparkDF, order_cols: Sequence[str]) -> list:
        """Sample-and-memoize range-bucket bounds for the first order
        column (the eager job operators/ordered.py:sample_bounds runs —
        the analogue of the reference's division sampling,
        _shuffle.py:1335). The memo dict is SHARED with the results of
        order-preserving ops, so a chain like cumsum → shift → ffill
        samples ONCE instead of once per op — on a derived frame the
        per-op sampling would re-execute the whole upstream plan just
        to read the order column. Safe because bounds only steer bucket
        BALANCE: any bound list partitions correctly (equal keys always
        share a bucket), so reusing the ancestor's sample can never
        change results, only skew bucket sizes if a downstream op
        altered the distribution (ordered ops don't)."""
        from .operators import ordered
        cache = self.__dict__.setdefault("_bounds_cache", {})
        nb = ordered._shuffle_partitions(sdf)
        key = (order_cols[0], nb)
        if key not in cache:
            cache[key] = ordered.sample_bounds(sdf, order_cols[0], nb)
        return cache[key]

    def _share_bounds(self, res):
        """propagate the bounds memo to an order-preserving result."""
        res.__dict__["_bounds_cache"] = self.__dict__.setdefault(
            "_bounds_cache", {})
        return res

    # -- Spark-level access ------------------------------------------------
    def to_spark(self) -> SparkDF:
        return self._sdf

    @property
    def spark(self) -> SparkDF:
        return self._sdf

    @property
    def index_cols(self) -> tuple[str, ...]:
        return self._index_cols

    @property
    def known_sorted(self) -> bool:
        return self._known_sorted

    def explain(self, mode: str = "formatted") -> None:
        self._sdf.explain(mode)

    def __repr__(self) -> str:
        """lazy repr — schema only, never computes (reference:
        test_format.py expects a structural summary, not data)."""
        cols = ", ".join(
            f"{f.name}: {f.dataType.simpleString()}" for f in self._sdf.schema.fields
        )
        idx = f", index={list(self._index_cols)}" if self._index_cols else ""
        sort = ", sorted" if self._known_sorted else ""
        return f"<{type(self).__name__} [{cols}]{idx}{sort}>"

    # -- plan diagnostics (reference: pprint/simplify/optimize/analyze,
    #    _collection.py:399-451, diagnostics/_explain.py:18) ---------------
    # The reference exposes its Expr tree per optimizer stage; our plan IS
    # Catalyst's, so these render the matching Catalyst stage instead.
    def pprint(self) -> None:
        """print the unoptimized logical plan (reference: Expr.pprint)."""
        print(self._sdf._jdf.queryExecution().logical().toString())

    def simplify(self) -> "FrameBase":
        """reference returns the simplified expression; Catalyst's
        analogue (analyzed + optimized logical plan) is printed, and
        self is returned unchanged — optimization is not user-staged on
        Spark."""
        print(self._sdf._jdf.queryExecution().optimizedPlan().toString())
        return self

    optimize = simplify

    def lower_once(self) -> "FrameBase":
        """reference lowers logical→physical one step; print Spark's
        physical plan and return self."""
        print(self._sdf._jdf.queryExecution().executedPlan().toString())
        return self

    def analyze(self) -> None:
        """reference: runtime expression profiler (diagnostics/_analyze.py:35).
        Spark's equivalent lives in the UI/event log; print the formatted
        plan with codegen stage ids as the static part."""
        self._sdf.explain("formatted")

    def visualize(self, *_, **__) -> None:
        """reference renders the task graph; text plan is the Spark analogue."""
        self._sdf.explain("extended")

    def persist(self) -> "FrameBase":
        """reference: FromGraph / persist (io/io.py:37)."""
        return type(self)(self._sdf.cache(), self._index_cols, self._known_sorted)

    def checkpoint(self, eager: bool = True) -> "FrameBase":
        """materialize and TRUNCATE lineage (localCheckpoint) — the
        scale lever before fan-out consumers (the ordered two-pass,
        dedup self-joins): downstream branches reread the materialized
        partitions instead of recomputing the plan per branch (see
        SCALE.md 'known trade-off'). The reference's analogue is
        materialized divisions / persisted intermediates."""
        return type(self)(self._sdf.localCheckpoint(eager),
                          self._index_cols, self._known_sorted)

    def npartitions(self) -> int:
        return self._sdf.rdd.getNumPartitions()

    @property
    def partitions(self):
        """positional partition accessor (reference: FrameBase.partitions,
        _collection.py:760): ``df.partitions[i]`` → frame with only
        partition i (filter on spark_partition_id — pruned, not collected)."""
        return _PartitionAccessor(self)


class _PartitionAccessor:
    def __init__(self, frame: "FrameBase"):
        self._frame = frame

    def __getitem__(self, i):
        f = self._frame
        n = f.npartitions()
        if isinstance(i, slice):
            idx = range(*i.indices(n))
            cond = F.spark_partition_id().isin(list(idx))
        else:
            if i < 0:
                i += n
            cond = F.spark_partition_id() == int(i)
        return type(f)(f._sdf.filter(cond), f._index_cols, f._known_sorted)


class Scalar:
    """Lazy 0-d result (reference: Scalar, _collection.py:4783)."""

    def __init__(self, sdf: SparkDF):
        self._sdf = sdf  # 1 row x 1 col

    def compute(self):
        row = self._sdf.collect()
        return row[0][0] if row else None

    def to_column(self) -> Column:
        """lazy scalar-subquery Column (Spark 4 DataFrame.scalar) —
        usable inside any same-frame expression without executing the
        aggregate eagerly."""
        return self._sdf.scalar()

    def to_series(self, index=None) -> "pd.Series":
        """materialize as a 1-element pandas Series (reference:
        to_series, test_collection.py:2415)."""
        import pandas as pd
        v = self.compute()
        name = self._sdf.columns[0]
        return pd.Series([v], index=[index] if index is not None else None,
                         name=name)

    def to_spark(self) -> SparkDF:
        return self._sdf

    # -- lazy scalar algebra (reference: Scalar supports arithmetic,
    #    _collection.py:4783 family) — combining via scalar subqueries
    #    keeps everything one plan, no eager jobs ---------------------------
    def _binop(self, other, op):
        if isinstance(other, (Series, FrameBase)):
            # let Series' reflected operator handle Scalar <op> Series
            return NotImplemented
        name = self._sdf.columns[0]
        mine = F.col(name)
        o = other.to_column() if isinstance(other, Scalar) else F.lit(other)
        return Scalar(self._sdf.select(op(mine, o).alias(name)))

    def __add__(self, o): return self._binop(o, lambda a, b: a + b)
    def __radd__(self, o): return self._binop(o, lambda a, b: b + a)
    def __sub__(self, o): return self._binop(o, lambda a, b: a - b)
    def __rsub__(self, o): return self._binop(o, lambda a, b: b - a)
    def __mul__(self, o): return self._binop(o, lambda a, b: a * b)
    def __rmul__(self, o): return self._binop(o, lambda a, b: b * a)
    def __truediv__(self, o): return self._binop(o, lambda a, b: a / b)
    def __rtruediv__(self, o): return self._binop(o, lambda a, b: b / a)
    def __floordiv__(self, o): return self._binop(o, lambda a, b: F.floor(a / b))
    def __mod__(self, o): return self._binop(o, lambda a, b: a % b)
    def __neg__(self): return self._binop(0, lambda a, b: -a)
    def __abs__(self): return self._binop(0, lambda a, b: F.abs(a))
    def __eq__(self, o): return self._binop(o, lambda a, b: a == b)
    def __ne__(self, o): return self._binop(o, lambda a, b: a != b)
    def __lt__(self, o): return self._binop(o, lambda a, b: a < b)
    def __le__(self, o): return self._binop(o, lambda a, b: a <= b)
    def __gt__(self, o): return self._binop(o, lambda a, b: a > b)
    def __ge__(self, o): return self._binop(o, lambda a, b: a >= b)
    __hash__ = object.__hash__


def _data_cols(sdf: SparkDF, index_cols: Sequence[str]) -> list[str]:
    return [c for c in sdf.columns if c not in index_cols]


class DataFrame(FrameBase):
    """Lazy DataFrame facade (reference: DataFrame, _collection.py:2677)."""

    # -- schema ------------------------------------------------------------
    @property
    def columns(self) -> list[str]:
        return _data_cols(self._sdf, self._index_cols)

    @columns.setter
    def columns(self, names) -> None:
        """df.columns = [...] bulk rename (reference: ColumnsSetter,
        test_collection.py:2143 — pandas Length-mismatch error)."""
        old = _data_cols(self._sdf, self._index_cols)
        names = list(names)
        if len(names) != len(old):
            raise ValueError(
                f"Length mismatch: Expected axis has {len(old)} elements, "
                f"new values have {len(names)} elements")
        self._sdf = self._sdf.select(
            *self._index_cols,
            *[F.col(o).alias(str(n)) for o, n in zip(old, names)])

    def __contains__(self, key) -> bool:
        """'x' in df — column membership (pandas semantics)."""
        return key in self.columns

    @property
    def dtypes(self):
        return {f.name: f.dataType.simpleString() for f in self._sdf.schema.fields}

    def _wrap(self, sdf: SparkDF, known_sorted: bool | None = None) -> "DataFrame":
        idx = tuple(c for c in self._index_cols if c in sdf.columns)
        ks = self._known_sorted if known_sorted is None else known_sorted
        return DataFrame(sdf, idx, ks and len(idx) == len(self._index_cols))

    # -- projection / selection (reference: Projection, _expr.py:2048) ------
    def __getitem__(self, key):
        if isinstance(key, str):
            return Series(self._sdf, F.col(key), key, self._index_cols, self._known_sorted)
        if isinstance(key, Series):
            return self._wrap(self._sdf.filter(key._scol))
        if isinstance(key, (list, tuple)):
            keep = list(self._index_cols) + [c for c in key if c not in self._index_cols]
            return self._wrap(self._sdf.select(*keep))
        raise TypeError(f"cannot index with {type(key)}")

    def __delitem__(self, key: str) -> None:
        """del df[col] (reference: test_collection.py:55 test_del) —
        rebinds the wrapper's plan to a projection without the column."""
        if key not in self.columns:
            raise KeyError(key)
        self._sdf = self._sdf.drop(key)

    def __setitem__(self, key: str, value) -> None:
        """in-place column assignment (reference: Assign via
        __setitem__, _collection.py:679) — rebinds this wrapper's plan;
        previously-derived frames are unaffected (lazy plans are
        immutable, same as the reference's expression graph)."""
        if isinstance(value, Series):
            if value._anchor is not self._sdf:
                self._sdf = self._align_foreign(self._sdf, key, value)
                # the index equi-join re-shuffles rows: range order is
                # lost (mirror assign()'s `joined` handling)
                self._known_sorted = False
                return
            col = value._scol
        elif callable(value):
            col = value(self)._scol
        elif isinstance(value, Scalar):
            col = value.to_column()
        else:
            import numpy as _np
            import pandas as _pd
            if isinstance(value, (_pd.Series, _np.ndarray)):
                # same alignment rules as assign() — Series joins by
                # index, ndarray raises (no positional row order)
                new = self.assign(**{key: value})
                self._sdf = new._sdf
                self._known_sorted = new._known_sorted
                return
            col = F.lit(value)
        self._sdf = self._sdf.withColumn(key, col)

    def _align_foreign(self, sdf: SparkDF, key: str, value: "Series") -> SparkDF:
        """Align a Series from another frame by index equi-join
        (reference: are_co_aligned + OpAlignPartitions, _expr.py:3140,
        3632) — left join, unmatched labels yield null like pandas.
        Duplicate index labels on the source side would fan out the left
        frame's rows, so they raise at runtime (pandas: 'cannot reindex
        on an axis with duplicate labels'); the guard is a grouped
        right side + raise_error folded into the value expression, so
        it stays lazy and can't be pruned away."""
        if not self._index_cols or tuple(value._index_cols) != self._index_cols:
            raise ValueError(
                "assigning a series from a different frame requires both "
                "to share an index (set_index on the same column(s) first)"
            )
        idx = list(self._index_cols)
        right = (
            value._anchor
            .groupBy(*idx)
            .agg(F.first(value._scol).alias(key),
                 F.count(F.lit(1)).alias("__dup_cnt"))
            .select(
                *idx,
                F.when(
                    F.col("__dup_cnt") > 1,
                    F.raise_error(F.lit(
                        "cannot reindex on an axis with duplicate labels"
                    )),
                ).otherwise(F.col(key)).alias(key),
            )
        )
        return sdf.drop(key).join(right, on=idx, how="left")

    def __getattr__(self, name: str):
        # column access fallback (reference: _core.py:491-518)
        if not name.startswith("_") and name in self._sdf.columns:
            return self[name]
        raise AttributeError(name)

    def select(self, *cols: str) -> "DataFrame":
        return self[list(cols)]

    # -- filter (reference: Filter, _expr.py:1996) --------------------------
    def filter(self, cond) -> "DataFrame":
        cond = cond._scol if isinstance(cond, Series) else cond
        return self._wrap(self._sdf.filter(cond))

    def query(self, expr: str) -> "DataFrame":
        """pandas.query subset via Spark SQL expression
        (reference: Query, _expr.py:1186)."""
        return self._wrap(self._sdf.filter(F.expr(expr)))

    # -- assign / drop / rename (reference: Assign _expr.py:1852,
    #    Drop :1822, RenameFrame :1239) -------------------------------------
    def assign(self, **kwargs) -> "DataFrame":
        sdf = self._sdf
        exprs: dict[str, Column] = {}
        joined = False
        for name, val in kwargs.items():
            if isinstance(val, Series):
                if val._anchor is not self._sdf:
                    sdf = self._align_foreign(sdf, name, val)
                    joined = True
                    continue
                exprs[name] = val._scol
            elif isinstance(val, Column):
                exprs[name] = val
            elif isinstance(val, Scalar):
                # lazy aggregate result (df.assign(a=df.x.sum()) —
                # reference test_collection.py:1996): scalar subquery
                exprs[name] = val.to_column()
            elif callable(val):
                exprs[name] = val(self)._scol
            else:
                import numpy as _np
                import pandas as _pd
                if isinstance(val, _pd.Series):
                    # pandas Series aligns by INDEX (reference
                    # test_collection.py:2043) — route through the
                    # foreign-series join on a from_pandas frame
                    from .sources.io import from_pandas as _fp
                    f = _fp(self._sdf.sparkSession,
                            val.rename(name).to_frame().reset_index())
                    icol = val.index.name or "index"
                    ser = f.set_index(icol)[name]
                    sdf = self._align_foreign(sdf, name, ser)
                    joined = True
                    continue
                if isinstance(val, (_np.ndarray, list, tuple)) and not (
                        isinstance(val, (list, tuple)) and len(val) == 0):
                    raise TypeError(
                        f"assign({name}=<{type(val).__name__}>): positional "
                        "array assignment needs a row order a distributed "
                        "frame doesn't have — wrap it in a pandas Series "
                        "with the frame's index, or use F.lit(...) for a "
                        "per-row constant array")
                exprs[name] = F.lit(val)
        out = sdf.withColumns(exprs) if exprs else sdf
        # an index equi-join re-shuffles the rows; range order is lost
        return self._wrap(out, known_sorted=False if joined else None)

    def drop(self, columns: str | Sequence[str]) -> "DataFrame":
        cols = [columns] if isinstance(columns, str) else list(columns)
        return self._wrap(self._sdf.drop(*cols))

    def rename(self, columns) -> "DataFrame":
        if callable(columns):
            # pandas mapper-function form: df.rename(columns=str.upper)
            columns = {c: columns(c) for c in self.columns}
        sdf = self._sdf.withColumnsRenamed(dict(columns))
        idx = tuple(columns.get(c, c) for c in self._index_cols)
        return DataFrame(sdf, idx, self._known_sorted)

    def add_prefix(self, prefix: str) -> "DataFrame":
        return self.rename({c: prefix + c for c in self.columns})

    def add_suffix(self, suffix: str) -> "DataFrame":
        return self.rename({c: c + suffix for c in self.columns})

    def astype(self, dtypes: Mapping[str, str]) -> "DataFrame":
        return self._wrap(
            self._sdf.withColumns(
                {c: F.col(c).cast(_spark_type(t)) for c, t in dtypes.items()}
            )
        )

    # -- null handling (reference: IsNa/Fillna/Dropna, _expr.py:1534,1349,1108)
    # -- frame-level arithmetic (reference: _method_operators,
    #    test_collection.py:598 — add/sub/mul/div with scalars, an
    #    axis=0 Series broadcast, or another indexed frame) -----------------
    def _numeric_data_cols(self) -> list[str]:
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal"}
        types = {f.name: f.dataType.simpleString().split("(")[0]
                 for f in self._sdf.schema.fields}
        return [c for c in self.columns if types[c] in num]

    def _frame_binop(self, other, op, fill_value=None, reflect=False):
        def ap(a, b):
            if fill_value is not None:
                a = F.coalesce(a, F.lit(fill_value))
                b = F.coalesce(b, F.lit(fill_value))
            return op(b, a) if reflect else op(a, b)

        cols = self._numeric_data_cols()
        if isinstance(other, Series):
            if other._anchor is not self._sdf:
                raise ValueError(
                    "frame <op> Series needs a same-frame column (axis=0 "
                    "row broadcast); align foreign series with assign first")
            exprs = {c: ap(F.col(c), other._scol) for c in cols}
            return self._wrap(self._sdf.withColumns(exprs))
        if isinstance(other, DataFrame):
            idx = self._index_cols
            if not idx or other._index_cols != idx:
                raise ValueError(
                    "frame <op> frame aligns on the index — set_index the "
                    "same column(s) on both sides first")
            rcols = set(other._numeric_data_cols())
            left = self._sdf
            right = other._sdf.select(
                *idx, *[F.col(c).alias(f"__r_{c}") for c in rcols])
            joined = left.join(right, list(idx), "full")
            exprs = {}
            for c in sorted(set(cols) | rcols):
                lc = F.col(c) if c in cols else F.lit(None)
                rc = F.col(f"__r_{c}") if c in rcols else F.lit(None)
                exprs[c] = ap(lc, rc)
            out = joined.select(
                *idx, *[exprs[c].alias(c) for c in sorted(set(cols) | rcols)])
            return DataFrame(out, idx, False)
        if isinstance(other, Scalar):
            lit = other.to_column()
        else:
            lit = F.lit(other)
        return self._wrap(self._sdf.withColumns(
            {c: ap(F.col(c), lit) for c in cols}))

    def __add__(self, o): return self._frame_binop(o, lambda a, b: a + b)
    def __radd__(self, o): return self._frame_binop(o, lambda a, b: a + b)
    def __sub__(self, o): return self._frame_binop(o, lambda a, b: a - b)
    def __rsub__(self, o): return self._frame_binop(o, lambda a, b: a - b, reflect=True)
    def __mul__(self, o): return self._frame_binop(o, lambda a, b: a * b)
    def __rmul__(self, o): return self._frame_binop(o, lambda a, b: a * b)
    def __truediv__(self, o): return self._frame_binop(o, lambda a, b: a / b)
    def __rtruediv__(self, o): return self._frame_binop(o, lambda a, b: a / b, reflect=True)
    def __pow__(self, o): return self._frame_binop(o, lambda a, b: F.pow(a, b))
    def __mod__(self, o): return self._frame_binop(o, lambda a, b: a % b)

    def add(self, other, axis=0, fill_value=None):
        return self._frame_binop(other, lambda a, b: a + b, fill_value)

    def sub(self, other, axis=0, fill_value=None):
        return self._frame_binop(other, lambda a, b: a - b, fill_value)

    def mul(self, other, axis=0, fill_value=None):
        return self._frame_binop(other, lambda a, b: a * b, fill_value)

    def div(self, other, axis=0, fill_value=None):
        return self._frame_binop(other, lambda a, b: a / b, fill_value)

    truediv = div

    def floordiv(self, other, axis=0, fill_value=None):
        return self._frame_binop(other, lambda a, b: F.floor(a / b), fill_value)

    def mod(self, other, axis=0, fill_value=None):
        return self._frame_binop(other, lambda a, b: a % b, fill_value)

    def pow(self, other, axis=0, fill_value=None):
        return self._frame_binop(other, lambda a, b: F.pow(a, b), fill_value)

    def clip(self, lower=None, upper=None) -> "DataFrame":
        """pandas df.clip over the numeric columns."""
        exprs = {}
        for c in self._numeric_data_cols():
            e = F.col(c)
            if lower is not None:
                e = F.greatest(e, F.lit(lower))
            if upper is not None:
                e = F.least(e, F.lit(upper))
            exprs[c] = e
        return self._wrap(self._sdf.withColumns(exprs))

    def round(self, decimals=0) -> "DataFrame":
        """per-column rounding (pandas df.round; int or {col: n})."""
        num = {"double", "float", "decimal"}
        types = {f.name: f.dataType.simpleString().split("(")[0]
                 for f in self._sdf.schema.fields}
        dec = decimals if isinstance(decimals, Mapping) else {
            c: decimals for c in self.columns if types[c] in num}
        exprs = {c: F.round(F.col(c), int(n)) for c, n in dec.items()
                 if c in types}
        return self._wrap(self._sdf.withColumns(exprs))

    def fillna(self, value) -> "DataFrame":
        return self._wrap(self._sdf.fillna(value))

    def isin(self, values) -> "DataFrame":
        """per-cell membership → boolean frame (pandas df.isin; list or
        {col: values} dict — columns absent from the dict become
        all-False, like pandas)."""
        if isinstance(values, Mapping):
            exprs = {c: (F.col(c).isin(list(values[c])) if c in values
                         else F.lit(False)).alias(c)
                     for c in self.columns}
        else:
            vals = list(values)
            exprs = {c: F.col(c).isin(vals).alias(c) for c in self.columns}
        return self._wrap(self._sdf.select(
            *self._index_cols, *[exprs[c] for c in self.columns]))

    def dropna(self, how: str = "any", subset: Sequence[str] | None = None,
               thresh: int | None = None) -> "DataFrame":
        return self._wrap(self._sdf.dropna(how=how, thresh=thresh, subset=subset))

    def replace(self, to_replace, value) -> "DataFrame":
        return self._wrap(self._sdf.replace(to_replace, value))

    def isna(self) -> "DataFrame":
        return self._wrap(
            self._sdf.select(
                *self._index_cols,
                *[F.isnull(c).alias(c) for c in self.columns],
            )
        )

    isnull = isna

    def notna(self) -> "DataFrame":
        return self._wrap(
            self._sdf.select(
                *self._index_cols,
                *[(~F.isnull(c)).alias(c) for c in self.columns],
            )
        )

    notnull = notna

    # -- dedup / sampling (reference: DropDuplicates _reductions.py:599,
    #    Sample _expr.py:1168) ----------------------------------------------
    def drop_duplicates(self, subset: Sequence[str] | None = None,
                        keep: str = "first",
                        order_by: Sequence[str] | None = None) -> "DataFrame":
        if subset is None or keep not in ("first", "last"):
            return self._wrap(self._sdf.dropDuplicates(subset))
        if set(subset) >= set(self._sdf.columns):
            return self._wrap(self._sdf.dropDuplicates())
        # keep= semantics need a deterministic order — like every other
        # order-dependent op, refuse rather than silently pick arbitrary rows
        order_cols = list(order_by) if order_by else list(self._index_cols)
        if not order_cols:
            raise ValueError(
                f"drop_duplicates(keep={keep!r}) with subset= needs a known "
                "row order: call set_index(...) first or pass order_by="
            )
        order = [F.col(c).asc() if keep == "first" else F.col(c).desc()
                 for c in order_cols]
        w = Window.partitionBy(*subset).orderBy(*order)
        sdf = (
            self._sdf.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        return self._wrap(sdf)

    def duplicated(self, subset: Sequence[str] | None = None,
                   keep: str = "first",
                   order_by: Sequence[str] | None = None) -> "Series":
        """boolean dup marker (pandas duplicated). keep=False marks
        every member of a >1 group (one hash window, order-free);
        keep='first'/'last' needs a row order — same index/order_by
        requirement as drop_duplicates(keep=)."""
        subset = list(subset) if subset else self.columns
        if keep is False or keep == False:  # noqa: E712 — pandas API literal
            w = Window.partitionBy(*subset)
            out = self._sdf.withColumn(
                "__dup", F.count(F.lit(1)).over(w) > 1
            )
            return Series(out, F.col("__dup").alias("duplicated"),
                          "duplicated", self._index_cols, False)
        if keep not in ("first", "last"):
            raise ValueError("keep must be 'first', 'last', or False")
        order_cols = list(order_by) if order_by else list(self._index_cols)
        if not order_cols:
            raise ValueError(
                f"duplicated(keep={keep!r}) needs a known row order: "
                "set_index(...) first or pass order_by="
            )
        order = [F.col(c).asc() if keep == "first" else F.col(c).desc()
                 for c in order_cols]
        w = Window.partitionBy(*subset).orderBy(*order)
        out = self._sdf.withColumn(
            "__dup", F.row_number().over(w) > 1
        )
        return Series(out, F.col("__dup").alias("duplicated"),
                      "duplicated", self._index_cols, False)

    def distinct(self) -> "DataFrame":
        return self._wrap(self._sdf.distinct())

    def sample(self, frac: float | None = None, seed: int | None = None,
               n: int | None = None, replace: bool = False,
               random_state: int | None = None) -> "DataFrame":
        """reference: Sample, _expr.py:1168. n= raises like the
        reference (fraction-based only — an exact-n sample needs a
        global count); replace= maps to withReplacement."""
        if n is not None:
            raise ValueError(
                "sample does not support the number of sampled items n; "
                "use frac= instead (same restriction as the reference)"
            )
        if frac is None:
            raise ValueError("sample needs frac=")
        if random_state is not None and seed is None:
            seed = random_state
        return self._wrap(
            self._sdf.sample(withReplacement=replace, fraction=frac, seed=seed)
        )

    def random_split(self, weights: Sequence[float], seed: int | None = None):
        return [self._wrap(s) for s in self._sdf.randomSplit(list(weights), seed=seed)]

    # -- explode (reference: ExplodeFrame, _expr.py:1814) --------------------
    def explode(self, column, pos: str | None = None,
                outer: bool = False) -> "DataFrame":
        """one row per array element (reference: ExplodeSeries/Frame,
        _expr.py:1809). pos= adds the element's position column;
        outer=True keeps empty/null arrays as a null row. A LIST of
        columns explodes them aligned (pandas multi-column form —
        mismatched per-row lengths raise, like pandas)."""
        if isinstance(column, (list, tuple)) and not isinstance(column, str):
            cols = list(column)
            others = [c for c in self._sdf.columns if c not in cols]
            sizes = [F.size(F.col(c)) for c in cols]
            mismatch = sum(
                (sz != sizes[0]).cast("int") for sz in sizes[1:]) > 0
            # the guard is folded INTO the exploded expression (a
            # detached check column would be pruned away — same trick
            # as _align_foreign's duplicate-label guard)
            zipped = F.when(
                mismatch,
                F.raise_error(F.lit(
                    "columns must have matching element counts")),
            ).otherwise(F.arrays_zip(*[F.col(c).alias(c) for c in cols]))
            fn = F.posexplode_outer if outer else F.posexplode
            ex = self._sdf.select(
                *others, fn(zipped).alias("__pos", "__z"))
            out = ex.select(
                *others,
                *([F.col("__pos").alias(pos)] if pos else []),
                *[F.col(f"__z.{c}").alias(c) for c in cols])
            return self._wrap(out)
        others = [c for c in self._sdf.columns if c != column]
        if pos is not None:
            fn = F.posexplode_outer if outer else F.posexplode
            return self._wrap(
                self._sdf.select(
                    *others, fn(column).alias(pos, column)
                )
            )
        fn = F.explode_outer if outer else F.explode
        return self._wrap(self._sdf.select(*others, fn(column).alias(column)))

    # -- sorting / limits (reference: SortValues _shuffle.py:964,
    #    Head/Tail _expr.py:2421, NFirst/NLast _reductions.py:1373) ----------
    def sort_values(self, by: str | Sequence[str], ascending: bool | Sequence[bool] = True,
                    na_position: str = "last") -> "DataFrame":
        by = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(by) if isinstance(ascending, bool) else list(ascending)
        # presortedness: already range-partitioned + sorted on exactly
        # this ascending key → the physical layout IS the sort; skip
        # the exchange (reference: _calculate_divisions presorted
        # detection, _shuffle.py:1412-1423)
        if (self._known_sorted and list(self._index_cols) == by
                and all(asc)):
            return self
        cols = []
        for c, a in zip(by, asc):
            col = F.col(c)
            if a:
                cols.append(col.asc_nulls_last() if na_position == "last" else col.asc_nulls_first())
            else:
                cols.append(col.desc_nulls_last() if na_position == "last" else col.desc_nulls_first())
        return self._wrap(self._sdf.orderBy(*cols))

    def head(self, n: int = 5) -> "DataFrame":
        # after orderBy this is Catalyst TakeOrderedAndProject — the
        # analogue of the reference's head-of-sort → NFirst rewrite
        # (/root/reference/dask_expr/_shuffle.py:915-933)
        return self._wrap(self._sdf.limit(n))

    def limit(self, n: int) -> "DataFrame":
        return self._wrap(self._sdf.limit(n))

    def nlargest(self, n: int, columns: str | Sequence[str]) -> "DataFrame":
        return self.sort_values(columns, ascending=False).head(n)

    def nsmallest(self, n: int, columns: str | Sequence[str]) -> "DataFrame":
        return self.sort_values(columns, ascending=True).head(n)

    def between_time(self, start: str, end: str, on: str | None = None) -> "DataFrame":
        """rows whose TIME-OF-DAY falls in [start, end] (reference:
        between_time via map_partitions; pandas semantics). String
        compare on 'HH:mm:ss' — JVM-side, pushdown-friendly."""
        col = on or (self._index_cols[0] if self._index_cols else None)
        if col is None:
            raise ValueError("between_time needs a timestamp index or on=")
        tod = F.date_format(F.col(col), "HH:mm:ss")
        if start <= end:
            cond = (tod >= start) & (tod <= end)
        else:  # wraps midnight, pandas semantics
            cond = (tod >= start) | (tod <= end)
        return self._wrap(self._sdf.filter(cond))

    def at_time(self, time: str, on: str | None = None) -> "DataFrame":
        """rows at an exact time of day (reference: at_time)."""
        return self.between_time(time, time, on)

    # -- index & partitioning (SURVEY.md §1.4; reference: SetIndex
    #    _shuffle.py:795, Repartition _repartition.py:21) --------------------
    def set_index(self, col: str, sorted: bool = False, npartitions: int | None = None) -> "DataFrame":
        sdf = self._sdf
        # presortedness: re-indexing on the column we're already
        # range-sorted by is a metadata no-op (reference:
        # SetIndex._lower fast path, _shuffle.py:881-901)
        if self._index_cols == (col,) and self._known_sorted:
            return DataFrame(sdf, (col,), True)
        if not sorted:
            if npartitions:
                sdf = sdf.repartitionByRange(npartitions, F.col(col))
            else:
                sdf = sdf.repartitionByRange(F.col(col))
            sdf = sdf.sortWithinPartitions(col)
        return DataFrame(sdf, (col,), True)

    def reset_index(self, drop: bool = False) -> "DataFrame":
        sdf = self._sdf.drop(*self._index_cols) if drop else self._sdf
        return DataFrame(sdf, (), False)

    def repartition(self, npartitions: int | None = None, *cols: str,
                    divisions: Sequence | None = None,
                    partition_size: str | int | None = None,
                    freq: str | None = None) -> "DataFrame":
        """reference: Repartition (_repartition.py:21) — count, explicit
        divisions, target partition bytes, or time frequency.

        - divisions: boundary values over the index column; rows are
          bucketed by searchsorted bucket id, range-partitioned on it,
          and sorted within partitions. Contract: rows of one division
          bucket are never split across partitions and partition order
          follows division order; Spark's sampling may MERGE adjacent
          small buckets into one partition (the reference materializes
          exact divisions — an intentional divergence, AQE-friendly).
        - partition_size: '128MB'-style target; npartitions is derived
          from Catalyst's plan-size estimate (file statistics), the
          analogue of RepartitionSize's memory_usage sampling
          (_repartition.py:378).
        - freq: time-truncate the index and range-partition on it
          (RepartitionFreq, _repartition.py:405).
        """
        if sum(x is not None for x in (npartitions, divisions, partition_size, freq)) != 1:
            raise ValueError(
                "exactly one of npartitions, divisions, partition_size, freq"
            )
        if divisions is not None:
            if not self._index_cols:
                raise ValueError("divisions repartition needs an index")
            idx = F.col(self._index_cols[0])
            bucket = sum(
                (idx >= F.lit(b)).cast("int") for b in list(divisions)[1:-1]
            ) if len(divisions) > 2 else F.lit(0)
            n = max(len(divisions) - 1, 1)
            # range-partition on the bucket id ALONE: the partitioner's
            # value-based bounds then coincide with the bucket labels,
            # giving exactly division-aligned partitions (adding the
            # index as a secondary key would re-split buckets to
            # equalize rows)
            out = (
                self._sdf.withColumn("__div", bucket)
                .repartitionByRange(n, F.col("__div"))
                .sortWithinPartitions("__div", self._index_cols[0])
                .drop("__div")
            )
            return DataFrame(out, self._index_cols, True)
        if partition_size is not None:
            if isinstance(partition_size, str):
                units = {"kb": 1 << 10, "mb": 1 << 20, "gb": 1 << 30, "b": 1}
                ps = partition_size.strip().lower()
                for suffix, mult in sorted(units.items(), key=lambda kv: -len(kv[0])):
                    if ps.endswith(suffix):
                        size_bytes = float(ps[: -len(suffix)]) * mult
                        break
                else:
                    size_bytes = float(ps)
            else:
                size_bytes = float(partition_size)
            total = int(
                self._sdf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            n = max(1, -(-total // int(size_bytes)))
            return self._wrap(self._sdf.repartition(n), False)
        if freq is not None:
            if not self._index_cols:
                raise ValueError("freq repartition needs a datetime index")
            from .operators.window import _FREQ_UNIT
            unit = _FREQ_UNIT.get(freq, freq)
            idx = self._index_cols[0]
            out = (
                self._sdf.repartitionByRange(F.date_trunc(unit, F.col(idx)))
                .sortWithinPartitions(idx)
            )
            return DataFrame(out, self._index_cols, True)
        if cols:
            return self._wrap(self._sdf.repartition(npartitions, *[F.col(c) for c in cols]), False)
        return self._wrap(self._sdf.repartition(npartitions), False)

    def __dataframe__(self, *args, **kwargs):
        """DataFrame interchange protocol (reference: _interchange.py via
        __dataframe__, _collection.py:2722). Buffer access is inherently
        driver-side, so this materializes via Arrow and delegates to
        pandas' implementation."""
        return self.compute().__dataframe__(*args, **kwargs)

    def coalesce(self, npartitions: int) -> "DataFrame":
        return self._wrap(self._sdf.coalesce(npartitions))

    def shuffle(self, on: str | Sequence[str], npartitions: int | None = None) -> "DataFrame":
        """explicit hash partitioning (reference: RearrangeByColumn,
        _shuffle.py:239)."""
        on = [on] if isinstance(on, str) else list(on)
        cols = [F.col(c) for c in on]
        sdf = self._sdf.repartition(npartitions, *cols) if npartitions else self._sdf.repartition(*cols)
        return self._wrap(sdf, False)

    @property
    def loc(self) -> "LocIndexer":
        """label-based slicing on the index (reference: LocIndexer,
        _indexing.py:64). With known_sorted + parquet min/max stats the
        range predicate prunes partitions at the scan — the Spark
        analogue of division-based pruning."""
        return LocIndexer(self)

    def combine_first(self, other: "DataFrame") -> "DataFrame":
        """null-filling combine (reference: CombineFirst, _expr.py:1138):
        full-outer join on the index, self's values win when non-null."""
        if not self._index_cols or self._index_cols != other._index_cols:
            raise ValueError("combine_first requires both frames indexed alike")
        idx = list(self._index_cols)
        lsdf, rsdf = self._sdf, other._sdf
        shared = [c for c in lsdf.columns if c in rsdf.columns and c not in idx]
        lren = lsdf.withColumnsRenamed({c: c + "__l" for c in shared})
        rren = rsdf.withColumnsRenamed({c: c + "__r" for c in shared})
        joined = lren.join(rren, on=idx, how="full")
        out_cols = [F.col(c) for c in idx]
        for c in lsdf.columns:
            if c in idx:
                continue
            if c in shared:
                out_cols.append(F.coalesce(F.col(c + "__l"), F.col(c + "__r")).alias(c))
            else:
                out_cols.append(F.col(c))
        for c in rsdf.columns:
            if c not in idx and c not in shared:
                out_cols.append(F.col(c))
        return DataFrame(joined.select(*out_cols), self._index_cols, False)

    # -- groupby (reference: GroupBy, _groupby.py:1496) ----------------------
    def groupby(self, by=None, dropna: bool = True, level=None,
                sort: bool = False, observed: bool = True) -> "GroupBy":
        """reference: _clean_by_expr (_groupby.py:1322) — `by` accepts
        column name(s), Series expressions (``df.groupby(df.x // 7)``),
        raw Columns, and/or index levels via ``level=`` (position or
        name). A derived grouper is materialized as a key column named
        after the Series (its source column for expressions); if that
        name collides with an existing column the grouper REPLACES it —
        matching the pandas result for the usual selected-column case
        (``df.groupby(df.x // 7).y.sum()``).

        ``sort=True`` orders the aggregation output by the group keys.
        Unlike pandas the default is False: a distributed frame has no
        inherent row order, and the extra range exchange on every agg
        is wasted work unless the caller actually wants ordered output.

        ``observed=False`` (pandas categorical semantics: emit rows for
        unobserved category combinations, reference groupby options
        _groupby.py:1496) is supported when the categorical groupers
        carry EXPLICIT category lists (``s.cat.set_categories(...)`` /
        ``add_categories`` — functions/accessors.py): Spark itself only
        sees observed keys, but the explicit lists are plan-side
        metadata, so the aggregation output is left-joined onto the
        cross product of {category list | observed distinct} per key —
        a tiny broadcast frame — and count/size/nunique→0, sum→0,
        prod→1 fills applied (pandas' empty-group identities)."""
        items: list = []
        if level is not None:
            levels = [level] if isinstance(level, (int, str)) else list(level)
            for lv in levels:
                if isinstance(lv, int):
                    if not self._index_cols:
                        raise ValueError("groupby(level=) needs a set index")
                    items.append(self._index_cols[lv])
                else:
                    if lv not in self._index_cols:
                        raise KeyError(f"index level {lv!r} not found in "
                                       f"{list(self._index_cols)}")
                    items.append(lv)
        if by is not None:
            items.extend([by] if isinstance(by, (str, Series, Column)) else list(by))
        if not items:
            raise TypeError("groupby needs by= and/or level=")
        keys: list[str] = []
        cats: dict[str, list] = {}
        sdf = self._sdf
        for i, b in enumerate(items):
            if isinstance(b, str):
                if b not in sdf.columns:
                    raise KeyError(b)
                keys.append(b)
            elif isinstance(b, Series):
                name = b._name or f"__by{i}"
                if b._anchor is self._sdf:
                    sdf = sdf.withColumn(name, b._scol)
                else:
                    sdf = self._align_foreign(sdf, name, b)
                keys.append(name)
                explicit = getattr(b, "_cat_categories", None)
                if explicit is not None:
                    cats[name] = list(explicit)
            elif isinstance(b, Column):
                name = f"__by{i}"
                sdf = sdf.withColumn(name, b)
                keys.append(name)
            else:
                raise TypeError(
                    f"cannot group by {type(b).__name__}; pass column "
                    "name(s), Series, Column, or level="
                )
        if not observed and not cats:
            raise NotImplementedError(
                "observed=False needs at least one grouper with an "
                "explicit category list (s.cat.set_categories/"
                "add_categories); Spark only sees observed keys, so "
                "unobserved ones must come from plan-side metadata"
            )
        frame = self if sdf is self._sdf else self._wrap(sdf)
        return GroupBy(frame, keys, dropna=dropna, sort=sort,
                       unobserved=cats if not observed else None)

    def rollup(self, *cols: str) -> "GroupBy":
        """hierarchical grouping-sets agg — absent in the reference
        (SURVEY.md §2.5 note: free in Spark)."""
        return GroupBy(self, list(cols), dropna=False, mode="rollup")

    def cube(self, *cols: str) -> "GroupBy":
        return GroupBy(self, list(cols), dropna=False, mode="cube")

    # -- reshape ------------------------------------------------------------
    def melt(self, id_vars: Sequence[str] | None = None,
             value_vars: Sequence[str] | None = None,
             var_name: str = "variable", value_name: str = "value") -> "DataFrame":
        """reference: melt, _collection.py:4047 — Spark-native unpivot.
        id_vars/value_vars default like pandas: no ids / all non-id
        columns."""
        id_vars = list(id_vars) if id_vars is not None else []
        if value_vars is None:
            value_vars = [c for c in self.columns if c not in id_vars]
        types = {f.name: f.dataType.simpleString()
                 for f in self._sdf.schema.fields}
        vals = [F.col(c) for c in value_vars]
        if len({types[c] for c in value_vars}) > 1:
            # heterogeneous dtypes: pandas melts to object; Spark's
            # unpivot needs one type — string is the faithful analogue
            vals = [F.col(c).cast("string").alias(c) for c in value_vars]
        sdf = self._sdf.unpivot(
            [F.col(c) for c in id_vars], vals, var_name, value_name,
        )
        return DataFrame(sdf)

    def get_dummies(self, column: str, values: Sequence[str] | None = None,
                    prefix: str | None = None) -> "DataFrame":
        """one-hot encode (reference: get_dummies, _dummies.py:10).
        Pass explicit categories for a deterministic schema with no
        extra scan; values=None runs a distinct-collect first (one
        small driver round-trip — the schema depends on the data, same
        trade-off as the reference's requirement that the column be
        categorical)."""
        if values is None:
            # bounded driver round-trip: limit()+1 caps the collect so a
            # high-cardinality column errors instead of OOMing the driver
            cap = 10_000
            rows = (self._sdf.select(column).distinct()
                    .limit(cap + 1).collect())
            if len(rows) > cap:
                raise ValueError(
                    f"get_dummies({column!r}): more than {cap} distinct "
                    "values — pass values= explicitly (a one-hot schema "
                    "this wide is almost certainly a mistake)"
                )
            values = sorted(r[0] for r in rows if r[0] is not None)
        prefix = prefix if prefix is not None else column
        exprs = {
            f"{prefix}_{v}": (F.col(column) == v).cast("int") for v in values
        }
        return self._wrap(self._sdf.withColumns(exprs))

    def categorize(self, columns: Sequence[str],
                   suffix: str = "_code") -> tuple["DataFrame", dict[str, "DataFrame"]]:
        """dictionary-encode string columns to dense int codes
        (reference: categorize, _collection.py:3749; categoricals map
        to label ints on Spark — SURVEY.md §1.3). Codes are assigned by
        sorted value order (deterministic); returns (encoded frame,
        {col: dictionary frame}) — the dictionaries are tiny and
        broadcast into the join."""
        out = self._sdf
        dicts: dict[str, DataFrame] = {}
        for col in columns:
            dic = (
                self._sdf.select(F.col(col).alias("__val")).distinct()
                .withColumn(
                    "__code",
                    (F.row_number().over(Window.orderBy(F.col("__val"))) - 1).cast("int"),
                )
            )
            out = (
                out.join(
                    F.broadcast(dic), out[col] == dic["__val"], "left"
                )
                .drop("__val")
                .withColumnRenamed("__code", f"{col}{suffix}")
            )
            dicts[col] = DataFrame(
                dic.withColumnsRenamed({"__val": col, "__code": f"{col}{suffix}"})
            )
        return self._wrap(out), dicts

    def describe(self, columns: Sequence[str] | None = None,
                 percentiles: Sequence[float] | None = None,
                 include=None, exclude=None) -> "DataFrame":
        """reference: Describe, _describe.py:16 — count/mean/std/min/
        percentiles/max per numeric column, one row per statistic.
        percentiles defaults to pandas' [.25, .5, .75]; include/
        exclude filter by dtype group ('number'/'object' or Spark type
        names)."""
        def _grp(t: str) -> str:
            return ("number" if t in ("int", "bigint", "smallint", "tinyint",
                                      "double", "float", "decimal")
                    else "object")
        types = {f.name: f.dataType.simpleString().split("(")[0]
                 for f in self._sdf.schema.fields}
        if include == "object":
            # pandas object describe: count / unique / top / freq
            # (reference: _describe.py object path). top ties resolve
            # to the smallest value — deterministic on any engine.
            ocols = [c for c in (columns or self.columns)
                     if _grp(types[c]) == "object"]
            if not ocols:
                raise ValueError("describe(include='object'): no object columns")
            # per-value counts via per-column windows (each is a
            # grouped, fully parallel exchange), folded into ONE agg
            cnt = self._sdf.select(*[F.col(c) for c in ocols])
            for c in ocols:
                cnt = cnt.withColumn(
                    f"__n_{c}", F.count(F.lit(1)).over(Window.partitionBy(c)))
            aggs = []
            for c in ocols:
                aggs += [
                    F.count(F.col(c)).cast("string").alias(f"count_{c}"),
                    F.count_distinct(F.col(c)).cast("string").alias(f"uniq_{c}"),
                    F.min_by(F.col(c), F.struct(
                        (-F.col(f"__n_{c}")).alias("n"),
                        F.col(c).alias("v"))).alias(f"top_{c}"),
                    F.max(F.col(f"__n_{c}")).cast("string").alias(f"freq_{c}"),
                ]
            one = cnt.agg(*aggs)
            parts = []
            for label, pre in (("count", "count"), ("unique", "uniq"),
                               ("top", "top"), ("freq", "freq")):
                parts.append(one.select(
                    F.lit(label).alias("statistic"),
                    *[F.col(f"{pre}_{c}").alias(c) for c in ocols]))
            out = parts[0]
            for p_ in parts[1:]:
                out = out.unionByName(p_)
            return DataFrame(out)
        numeric = {c for c, t in types.items() if _grp(t) == "number"}
        cols = [c for c in (columns or self.columns) if c in numeric]
        if include is not None:
            inc = {include} if isinstance(include, str) else set(include)
            cols = [c for c in cols if types[c] in inc or _grp(types[c]) in inc]
        if exclude is not None:
            exc = {exclude} if isinstance(exclude, str) else set(exclude)
            cols = [c for c in cols if types[c] not in exc and _grp(types[c]) not in exc]
        pcts = [0.25, 0.5, 0.75] if percentiles is None else list(percentiles)
        stats = [
            ("count", lambda c: F.count(c).cast("double")),
            ("mean", F.avg),
            ("std", F.stddev_samp),
            ("min", lambda c: F.min(c).cast("double")),
            *[(f"{int(p*100)}%",
               (lambda p_: lambda c: F.percentile(c, F.lit(p_)))(p))
              for p in pcts],
            ("max", lambda c: F.max(c).cast("double")),
        ]
        rows = []
        for stat, fn in stats:
            rows.append(
                self._sdf.agg(
                    F.lit(stat).alias("statistic"),
                    *[fn(F.col(c)).cast("double").alias(c) for c in cols],
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return DataFrame(out)

    # -- set ops (absent in reference, SURVEY.md §2.8 — free in Spark) -------
    def intersect(self, other: "DataFrame") -> "DataFrame":
        return self._wrap(self._sdf.intersect(other._sdf))

    def except_all(self, other: "DataFrame") -> "DataFrame":
        return self._wrap(self._sdf.exceptAll(other._sdf))

    # -- joins (reference: Merge, _merge.py:50; API _collection.py:2847) -----
    def merge(
        self,
        right: "DataFrame",
        how: str = "inner",
        on: str | Sequence[str] | None = None,
        left_on: str | Sequence[str] | None = None,
        right_on: str | Sequence[str] | None = None,
        suffixes: tuple[str, str] = ("_x", "_y"),
        broadcast: bool | None = None,
        indicator: bool = False,
    ) -> "DataFrame":
        from .operators.merge import merge as _merge

        return _merge(self, right, how=how, on=on, left_on=left_on,
                      right_on=right_on, suffixes=suffixes,
                      broadcast=broadcast, indicator=indicator)

    def join(self, right: "DataFrame", how: str = "left", on: str | None = None) -> "DataFrame":
        on = on or (self._index_cols[0] if self._index_cols else None)
        if on is None:
            raise ValueError("join requires `on` or an index")
        return self.merge(right, how=how, on=on)

    # -- concat-axis-0 handled by module-level concat() ----------------------

    # -- reductions (frame-level; reference _reductions.py:761+) -------------
    def count(self, axis: int = 0):
        if axis in (1, "columns"):
            return self._row_reduce("count")
        return Scalar(self._sdf.select(F.count(F.lit(1)).alias("count")))

    def __len__(self) -> int:
        return self._sdf.count()

    def __dataframe__(self, *args, **kwargs):
        """DataFrame interchange protocol (reference: __dataframe__,
        _collection.py:2722 via _interchange.py). Interchange contracts
        require materialized buffers, so this computes — same as the
        reference, whose interchange object computes on first access."""
        return self.compute().__dataframe__(*args, **kwargs)

    @property
    def size(self) -> "Scalar":
        """rows x data-columns, lazily (reference: FrameBase.size,
        _collection.py:356 — pandas df.size semantics)."""
        ncols = max(1, len(self.columns))
        return Scalar(self._sdf.select(
            (F.count(F.lit(1)) * ncols).alias("size")))

    @classmethod
    def from_dict(cls, data: dict, npartitions: int | None = None,
                  spark=None) -> "DataFrame":
        """classmethod parity with the reference (FrameBase.from_dict,
        _collection.py:2381); delegates to sources.io.from_dict."""
        from .sources.io import from_dict as _fd
        from .session import get_spark
        return _fd(spark or get_spark(), data, npartitions=npartitions)

    def agg(self, spec=None, **named) -> "DataFrame":
        triples = _normalize_agg_spec(spec, self.columns, named or None)
        aggs = [_agg_expr(fn, col).alias(out) for out, col, fn in triples]
        return DataFrame(self._sdf.agg(*aggs))

    # -- frame-level reductions: one row, stat per applicable column
    #    (reference: Sum/Mean/... _reductions.py:761+ return a Series
    #    there). Booleans auto-cast to long for sum (pandas counts
    #    True), numeric-only stats skip string/timestamp columns. -----
    def _frame_reduce(self, fn: str, numeric_only: bool) -> "DataFrame":
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "boolean"}
        cols = []
        for f in self._sdf.schema.fields:
            if f.name in self._index_cols:
                continue
            t = f.dataType.simpleString()
            if numeric_only and t not in num:
                continue
            cols.append((f.name, t))
        if not cols:
            raise ValueError(f"no applicable columns for {fn}")
        aggs = []
        # Booleans count as 0/1 for every numeric reduction (pandas rule);
        # Spark's avg/var_samp/median reject BooleanType outright.  min/max
        # (numeric_only=False) keep native boolean semantics like pandas.
        bool_casts = {c: F.col(c).cast("long") for c, t in cols
                      if t == "boolean" and numeric_only}
        sdf = self._sdf.withColumns(bool_casts) if bool_casts else self._sdf
        for c, _t in cols:
            aggs.append(_agg_expr(fn, c).alias(c))
        return DataFrame(sdf.agg(*aggs))

    def quantile(self, q=0.5, axis: int = 0, numeric_only: bool = False,
                 method: str = "default") -> "DataFrame | Series":
        """reference: Frame.quantile (_collection.py:3819). axis=0 →
        one row per q with the interpolated percentile of each numeric
        column (method='tdigest'/'approx' uses the sketch, like the
        reference's tdigest option); axis=1 → per-row quantile across
        the numeric columns (JVM array sort + linear interpolation,
        no UDF)."""
        if axis in (1, "columns"):
            return self._row_quantile(float(q))
        qs = [float(q)] if isinstance(q, (int, float)) else [float(v) for v in q]
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal"}
        cols = [f.name for f in self._sdf.schema.fields
                if f.name not in self._index_cols
                and f.dataType.simpleString().split("(")[0] in num]
        if not cols:
            raise ValueError("no numeric columns for quantile")
        if method in ("tdigest", "approx"):
            fn = lambda c, p: F.percentile_approx(F.col(c), p)  # noqa: E731
        else:
            fn = lambda c, p: F.percentile(F.col(c), F.lit(p))  # noqa: E731
        rows = [
            self._sdf.agg(
                F.lit(p).alias("quantile"),
                *[fn(c, p).cast("double").alias(c) for c in cols],
            )
            for p in qs
        ]
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return DataFrame(out)

    def _row_quantile(self, q: float) -> "Series":
        """axis=1 quantile: sorted per-row array + linear interpolation
        at q*(n-1), pandas-style, nulls skipped."""
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal", "boolean"}
        cols = [f.name for f in self._sdf.schema.fields
                if f.name not in self._index_cols
                and f.dataType.simpleString().split("(")[0] in num]
        if not cols:
            raise ValueError("no numeric columns for quantile(axis=1)")
        arr = F.array_sort(F.filter(
            F.array(*[F.col(c).cast("double") for c in cols]),
            lambda x: ~x.isNull(),
        ))
        n = F.size(arr)
        idx = (n - 1).cast("double") * F.lit(q)
        lo = F.floor(idx).cast("int")
        frac = idx - lo.cast("double")
        base = F.element_at(arr, lo + 1)
        nxt = F.element_at(arr, F.least(lo + 2, n))
        name = f"q{int(q * 100)}"
        val = F.when(n > 0, base + frac * (nxt - base))
        return Series(self._sdf, val.alias(name), name, self._index_cols,
                      self._known_sorted)

    def _row_reduce(self, fn: str) -> "Series":
        """axis=1 reductions (reference: axis=1 branch of the frame
        reductions, _collection.py:2407) — pure JVM higher-order
        functions over a per-row array of the numeric columns; no UDF,
        stays inside whole-stage codegen."""
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal", "boolean"}
        cols = [f.name for f in self._sdf.schema.fields
                if f.name not in self._index_cols
                and f.dataType.simpleString().split("(")[0] in num]
        if not cols:
            raise ValueError(f"no numeric columns for {fn}(axis=1)")
        arr = F.array(*[F.col(c).cast("double") for c in cols])
        vals = F.filter(arr, lambda x: ~x.isNull())
        n = F.size(vals).cast("double")
        s = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x)
        if fn == "sum":
            out = s  # pandas: all-NaN row sums to 0.0 (min_count=0)
        elif fn == "count":
            out = n.cast("long")
        elif fn == "mean":
            out = F.when(n > 0, s / n)
        elif fn in ("min", "max"):
            out = F.array_min(arr) if fn == "min" else F.array_max(arr)
        elif fn in ("var", "std"):
            s2 = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x * x)
            # clamp at 0: float64 cancellation on large-magnitude values
            # can produce tiny negative variances (→ NaN std)
            v = F.when(n >= 2, F.greatest((s2 - s * s / n) / (n - 1), F.lit(0.0)))
            out = F.sqrt(v) if fn == "std" else v
        elif fn == "prod":
            out = F.aggregate(vals, F.lit(1.0), lambda acc, x: acc * x)
        elif fn == "nunique":
            # NUniqueColumns (reference _expr.py:1798)
            out = F.size(F.array_distinct(vals)).cast("long")
        elif fn in ("any", "all"):
            flags = F.filter(
                F.array(*[F.col(c).cast("boolean") for c in cols]),
                lambda x: ~x.isNull(),
            )
            hof = F.exists if fn == "any" else (
                lambda a, p: ~F.exists(a, lambda x: ~p(x)))
            out = hof(flags, lambda x: x)
        else:
            raise ValueError(f"unsupported axis=1 reduction {fn!r}")
        return Series(self._sdf, out.alias(fn), fn, self._index_cols,
                      self._known_sorted)

    def _reduce_dispatch(self, fn: str, axis, numeric_only: bool):
        if axis in (1, "columns"):
            return self._row_reduce(fn)
        return self._frame_reduce(fn, numeric_only)

    def _row_arg_extreme(self, largest: bool) -> "Series":
        """idxmin/idxmax(axis=1): per-row column NAME of the extreme
        numeric value — array_min/max over (value, name) structs, pure
        JVM, null values filtered out first (pandas skipna). Ties →
        first column in frame order (struct comparison breaks ties on
        the name position)."""
        num = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal", "boolean"}
        cols = [f.name for f in self._sdf.schema.fields
                if f.name not in self._index_cols
                and f.dataType.simpleString().split("(")[0] in num]
        if not cols:
            raise ValueError("no numeric columns for idxmin/idxmax(axis=1)")
        # position sign flips for max so ties resolve to the FIRST
        # column (pandas): max picks max(v) then max(p-term) = min p
        arr = F.array(*[
            F.struct(
                F.col(c).cast("double").alias("v"),
                F.lit(-i if largest else i).alias("p"),
            )
            for i, c in enumerate(cols)
        ])
        vals = F.filter(arr, lambda s: ~s.getField("v").isNull())
        ext = F.array_max(vals) if largest else F.array_min(vals)
        name_map = F.array(*[F.lit(c) for c in cols])
        pos = -ext.getField("p") if largest else ext.getField("p")
        out = F.when(F.size(vals) > 0, F.element_at(name_map, pos + 1))
        fn = "idxmax" if largest else "idxmin"
        return Series(self._sdf, out.alias(fn), fn, self._index_cols,
                      self._known_sorted)

    def idxmax(self, axis: int = 1) -> "Series":
        """row-wise argmax column name (the frame-level axis=0 form
        lives on Series/GroupBy, matching the reference's split)."""
        if axis not in (1, "columns"):
            raise ValueError("DataFrame.idxmax supports axis=1; use "
                             "Series.idxmax for per-column argmax")
        return self._row_arg_extreme(True)

    def idxmin(self, axis: int = 1) -> "Series":
        if axis not in (1, "columns"):
            raise ValueError("DataFrame.idxmin supports axis=1; use "
                             "Series.idxmin for per-column argmin")
        return self._row_arg_extreme(False)

    def sum(self, axis: int = 0): return self._reduce_dispatch("sum", axis, True)
    def mean(self, axis: int = 0): return self._reduce_dispatch("mean", axis, True)
    def var(self, axis: int = 0): return self._reduce_dispatch("var", axis, True)
    def std(self, axis: int = 0): return self._reduce_dispatch("std", axis, True)
    def median(self): return self._frame_reduce("median", True)
    def min(self, axis: int = 0): return self._reduce_dispatch("min", axis, False)
    def max(self, axis: int = 0): return self._reduce_dispatch("max", axis, False)

    # -- ordered / window ops (SURVEY.md §2.6) -------------------------------
    # Ungrouped ordered ops run the range-bucketed two-pass plans in
    # operators/ordered.py (sample bounds once, per-bucket window, tiny
    # broadcast combine) — never a global single-partition
    # Window.orderBy(). Reference: the partition-serial cumulative chain
    # (_cumulative.py:11-145) and map_overlap boundary copies
    # (_rolling.py), re-expressed without serial task dependencies.
    def _order_cols(self, order_by: str | Sequence[str] | None) -> list[str]:
        order_by = order_by or self._index_cols
        if not order_by:
            raise ValueError(
                "order-dependent op needs an index (set_index) or order_by="
            )
        return [order_by] if isinstance(order_by, str) else list(order_by)

    def shift(self, periods: int = 1, columns: Sequence[str] | None = None,
              order_by=None, freq: str | None = None) -> "DataFrame":
        """reference: Shift, _expr.py:3389 — global-order lag/lead,
        per-bucket with |periods| boundary rows padded from neighbors.
        freq= shifts the timestamp INDEX by periods*freq instead of
        displacing rows (reference: ShiftIndex, _expr.py:3433) — a
        monotone add, so sortedness is preserved."""
        from .operators import ordered
        if freq is not None:
            from .operators.window import freq_micros
            micros = freq_micros(freq) * periods
            idx = self._order_cols(order_by)
            dtypes = dict(self._sdf.dtypes)
            # only timestamp/date order columns move; integer tiebreak
            # columns in a composite order must not be routed through a
            # timestamp cast (it would corrupt their values)
            ts = [c for c in idx
                  if dtypes[c].split("(")[0] in ("timestamp", "timestamp_ntz", "date")]
            if not ts:
                raise TypeError(
                    f"shift(freq=) needs a timestamp/date order column; "
                    f"got {[(c, dtypes[c]) for c in idx]}"
                )
            out = self._sdf.withColumns({
                c: F.timestamp_micros(
                    F.unix_micros(F.col(c).cast("timestamp")) + F.lit(micros)
                ).cast(dtypes[c])
                for c in ts
            })
            return self._wrap(out)
        if periods == 0:
            return self._wrap(self._sdf)
        order = self._order_cols(order_by)
        out = ordered.with_lagged(
            self._sdf, columns or self.columns, order,
            periods, lambda c, l: l,
            bounds=self._ordered_bounds(self._sdf, order),
        )
        return self._share_bounds(self._wrap(out, known_sorted=False))

    def diff(self, periods: int = 1, columns: Sequence[str] | None = None,
             order_by=None) -> "DataFrame":
        """reference: Diff, _expr.py:3417."""
        from .operators import ordered
        order = self._order_cols(order_by)
        out = ordered.with_lagged(
            self._sdf, columns or self.columns, order,
            periods, lambda c, l: c - l,
            bounds=self._ordered_bounds(self._sdf, order),
        )
        return self._share_bounds(self._wrap(out, known_sorted=False))

    def _cum_frame(self, fn: str, columns, order_by) -> "DataFrame":
        from .operators import ordered
        order = self._order_cols(order_by)
        out = ordered.cumulative(
            self._sdf, {c: fn for c in (columns or self.columns)},
            order, mask_nulls=True,
            bounds=self._ordered_bounds(self._sdf, order),
        )
        return self._share_bounds(self._wrap(out, known_sorted=False))

    def cumsum(self, columns: Sequence[str] | None = None, order_by=None) -> "DataFrame":
        """reference: CumSum, _cumulative.py:11 (partition-serial chain) —
        per-bucket running window + broadcast per-bucket offsets."""
        return self._cum_frame("sum", columns, order_by)

    def cumprod(self, columns: Sequence[str] | None = None, order_by=None) -> "DataFrame":
        """reference: CumProd, _cumulative.py:30 — F.product is a true
        window/agg function in Spark, so this stays JVM-side (no log/exp
        trick, signs and zeros handled natively)."""
        return self._cum_frame("product", columns, order_by)

    def cummax(self, columns: Sequence[str] | None = None, order_by=None) -> "DataFrame":
        """reference: CumMax, _cumulative.py:48."""
        return self._cum_frame("max", columns, order_by)

    def cummin(self, columns: Sequence[str] | None = None, order_by=None) -> "DataFrame":
        """reference: CumMin, _cumulative.py:56."""
        return self._cum_frame("min", columns, order_by)

    def pct_change(self, periods: int = 1, columns: Sequence[str] | None = None,
                   order_by=None) -> "DataFrame":
        """fractional change vs the periods-th prior row (reference:
        pct_change, _collection.py:2802)."""
        from .operators import ordered
        order = self._order_cols(order_by)
        out = ordered.with_lagged(
            self._sdf, columns or self.columns, order,
            periods, lambda c, l: (c - l) / l,
            bounds=self._ordered_bounds(self._sdf, order),
        )
        return self._share_bounds(self._wrap(out, known_sorted=False))

    def ffill(self, columns: Sequence[str] | None = None, order_by=None,
              limit: int | None = None) -> "DataFrame":
        """reference: FFill, _expr.py:3340 (limit= matches)."""
        from .operators import ordered
        order = self._order_cols(order_by)
        out = ordered.fill(
            self._sdf, list(columns or self.columns), order, "ffill", limit,
            bounds=self._ordered_bounds(self._sdf, order),
        )
        return self._share_bounds(self._wrap(out, known_sorted=False))

    def bfill(self, columns: Sequence[str] | None = None, order_by=None,
              limit: int | None = None) -> "DataFrame":
        """reference: BFill, _expr.py:3373 (limit= matches)."""
        from .operators import ordered
        order = self._order_cols(order_by)
        out = ordered.fill(
            self._sdf, list(columns or self.columns), order, "bfill", limit,
            bounds=self._ordered_bounds(self._sdf, order),
        )
        return self._share_bounds(self._wrap(out, known_sorted=False))

    def rolling(self, window: int, order_by=None, partition_by=None,
                min_periods: int | None = None, center: bool = False,
                win_type: str | None = None):
        """reference: RollingReduction, _rolling.py:43 (center= and
        win_type= weighted windows match)."""
        from .operators.window import Rolling
        return Rolling(self, window, order_by or list(self._index_cols),
                       partition_by, min_periods, center=center,
                       win_type=win_type)

    def expanding(self, order_by=None, partition_by=None,
                  min_periods: int = 1):
        """expanding (cumulative) window — rolling with an unbounded
        start (reference exposes via cumulative ops, _cumulative.py)."""
        from .operators.window import Rolling

        return Rolling(self, window=1, order_by=order_by or list(self._index_cols),
                       partition_by=partition_by, min_periods=min_periods,
                       unbounded_start=True)

    def nunique(self, axis: int = 0):
        """distinct count per column (frame-level NUnique,
        _collection.py:3808); axis=1 = NUniqueColumns (_expr.py:1798)."""
        if axis in (1, "columns"):
            return self._row_reduce("nunique")
        return DataFrame(
            self._sdf.agg(*[F.countDistinct(c).alias(c) for c in self.columns])
        )

    def prod(self, axis: int = 0):
        if axis in (1, "columns"):
            return self._row_reduce("prod")
        return self._frame_reduce("prod", True)

    product = prod

    def resample(self, freq: str, on: str | None = None,
                 closed: str = "left", label: str = "left"):
        """reference: ResampleReduction, _resample.py:23 (closed/label
        options match pandas)."""
        from .operators.window import Resampler
        return Resampler(self, freq, on or self._index_cols[0],
                         closed, label)

    def merge_asof(self, right: "DataFrame", on: str | None = None, **kw) -> "DataFrame":
        """reference: merge_asof, _merge_asof.py:17."""
        from .operators.asof import merge_asof as _asof
        return _asof(self, right, on, **kw)

    # -- UDF escape hatches (reference: MapPartitions _expr.py:580) ----------
    def map_partitions(self, func: Callable, schema) -> "DataFrame":
        """Arrow-batched partition-wise UDF — the universal escape hatch
        (reference: map_partitions, _collection.py:985)."""
        return DataFrame(self._sdf.mapInPandas(func, schema=schema),
                         self._index_cols, False)

    def map_overlap(self, func: Callable, schema, order_col: str,
                    before, after, num_buckets: int = 32) -> "DataFrame":
        """partition-wise UDF with neighbor-row context (reference:
        MapOverlap, _expr.py:831; API _collection.py:1123).

        Spark-first design: instead of the reference's copy-rows-from-
        neighbor-partitions task graph, rows are bucketed by range over
        `order_col` (boundaries from approxQuantile — the same sampling
        the reference's divisions use) and each row whose key falls
        within `before`/`after` of a boundary is ALSO emitted into the
        neighbor bucket, flagged as padding. One explode + one shuffle,
        no sequential dependency — scales to any bucket count.

        `before`/`after` are order-key deltas (numeric or timedelta),
        not row counts — the value-based variant of the reference's
        freq-based overlap. func receives each padded pandas frame
        sorted by order_col; its output rows for padding positions are
        dropped via the `__is_main` column func must pass through.
        """
        import pandas as pd

        qs = [i / num_buckets for i in range(1, num_buckets)]
        bounds = self._sdf.approxQuantile(order_col, qs, 0.001)
        bounds = sorted(set(bounds))
        if not bounds:
            bounds = []

        barr = F.array(*[F.lit(b) for b in bounds])
        c = F.col(order_col)
        bucket = F.size(F.filter(barr, lambda b: b <= c))
        lower_ok = F.size(F.filter(barr, lambda b: b <= c + F.lit(after)))
        upper_ok = F.size(F.filter(barr, lambda b: b <= c - F.lit(before)))

        main = self._sdf.withColumn("__bucket", bucket).withColumn(
            "__is_main", F.lit(True)
        )
        to_next = (
            self._sdf.withColumn("__bucket", bucket + 1)
            .withColumn("__is_main", F.lit(False))
            .filter(lower_ok > bucket)
        )
        to_prev = (
            self._sdf.withColumn("__bucket", bucket - 1)
            .withColumn("__is_main", F.lit(False))
            .filter((upper_ok < bucket) & (bucket > 0))
        )
        padded = main.unionByName(to_next).unionByName(to_prev)

        def wrapper(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(order_col, kind="mergesort")
            out = func(pdf.drop(columns=["__bucket"]))
            return out[out["__is_main"]].drop(columns=["__is_main"])

        return DataFrame(
            padded.groupBy("__bucket").applyInPandas(wrapper, schema),
            self._index_cols, False,
        )

    def map_overlap_rows(self, func: Callable, schema, order_col: str,
                         before: int, after: int,
                         num_buckets: int = 32) -> "DataFrame":
        """row-count variant of map_overlap (the reference's native
        semantics: before/after are ROW counts, _expr.py:831).

        Scalable shape: rows are range-bucketed on `order_col`
        (approxQuantile boundaries — no global ordering); row numbers
        are computed WITHIN each bucket (partitioned window, parallel),
        and each bucket's last `before` / first `after` rows are also
        emitted into the neighbor bucket as padding. func sees each
        padded bucket as a pandas frame sorted by order_col and must
        pass the `__is_main` column through; padding rows are dropped
        from its output."""
        import pandas as pd  # noqa: F401

        qs = [i / num_buckets for i in range(1, num_buckets)]
        bounds = sorted(set(self._sdf.approxQuantile(order_col, qs, 0.001)))
        barr = F.array(*[F.lit(b) for b in bounds])
        c = F.col(order_col)
        bucket = F.size(F.filter(barr, lambda b: b <= c))

        base = self._sdf.withColumn("__bucket", bucket)
        w_asc = Window.partitionBy("__bucket").orderBy(F.col(order_col).asc())
        w_desc = Window.partitionBy("__bucket").orderBy(F.col(order_col).desc())
        base = base.withColumn("__rn_a", F.row_number().over(w_asc)).withColumn(
            "__rn_d", F.row_number().over(w_desc)
        )

        main = base.withColumn("__is_main", F.lit(True))
        to_next = (
            base.filter(F.col("__rn_d") <= before)
            .withColumn("__bucket", F.col("__bucket") + 1)
            .withColumn("__is_main", F.lit(False))
        )
        to_prev = (
            base.filter((F.col("__rn_a") <= after) & (F.col("__bucket") > 0))
            .withColumn("__bucket", F.col("__bucket") - 1)
            .withColumn("__is_main", F.lit(False))
        )
        max_bucket = len(bounds)
        to_next = to_next.filter(F.col("__bucket") <= max_bucket)
        padded = main.unionByName(to_next).unionByName(to_prev).drop("__rn_a", "__rn_d")

        def wrapper(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(order_col, kind="mergesort")
            out = func(pdf.drop(columns=["__bucket"]))
            return out[out["__is_main"]].drop(columns=["__is_main"])

        return DataFrame(
            padded.groupBy("__bucket").applyInPandas(wrapper, schema),
            self._index_cols, False,
        )

    def reduction(self, chunk: Callable, aggregate: Callable,
                  chunk_schema, agg_schema, combine: Callable | None = None,
                  combine_schema=None, split_every: int = 8) -> "DataFrame":
        """custom reduction (reference: CustomReduction,
        _reductions.py:835; API reduction() _collection.py:2120):
        chunk() per partition (parallel, Arrow-batched), optional
        combine() tree level (reference's combine=, fan-in
        `split_every`) shrinking the partials before aggregate() runs
        over the concatenated results in one small task."""
        import pandas as pd

        def chunk_wrapper(it):
            for pdf in it:
                yield chunk(pdf)

        def _merge_wrapper(fn):
            def run(it):
                parts = [p for p in it if len(p)]
                if not parts:
                    return
                yield fn(pd.concat(parts))
            return run

        partials = self._sdf.mapInPandas(chunk_wrapper, chunk_schema)
        if combine is not None:
            ncomb = max(1, int(self._sdf.sparkSession.conf.get(
                "spark.sql.shuffle.partitions", "32")) // max(split_every, 2))
            partials = partials.repartition(ncomb).mapInPandas(
                _merge_wrapper(combine), combine_schema or chunk_schema
            )
        out = partials.repartition(1).mapInPandas(
            _merge_wrapper(aggregate), agg_schema
        )
        return DataFrame(out)

    # -- materialization -----------------------------------------------------
    def compute(self):
        pdf = self._sdf.toPandas()
        if self._index_cols:
            pdf = pdf.set_index(list(self._index_cols))
        return pdf

    def collect(self):
        return self._sdf.collect()

    def to_parquet(self, path: str, mode: str = "overwrite", partition_by=None,
                   compression: str = "snappy", append: bool = False,
                   partition_on=None, sort_by=None,
                   cluster: bool | int | str = False) -> None:
        """reference: to_parquet (io/parquet.py:337) — compression=,
        append=, and partition_on= mirror the reference's knobs;
        partition_on is the reference's name for partition_by.

        sort_by= orders rows WITHIN each output file so parquet
        row-group min/max statistics are tight on those columns — the
        Spark analogue of the reference writing a sorted index with
        known divisions (its reader then prunes row groups from the
        statistics; Spark's scan does the same from the footer).
        cluster=True additionally range-partitions on sort_by first
        (repartitionByRange), making file ranges globally disjoint so a
        later filter on the leading sort column skips whole FILES at
        planning time, not just row groups.  At 100 TB, clustering the
        write on the dominant filter column is the cheapest read-side
        accelerator there is; it costs one range shuffle at write time.
        cluster=<int> pins the range-bucket count (True lets AQE pick —
        at scale that's right; an explicit count is for fixed layouts).
        cluster="zorder" interleaves quantile-bucket bits of ALL
        sort_by columns (Morton order, sources/layout.py) so footer
        stats prune files for a filter on ANY of them, not just the
        leading one — the Delta/Iceberg OPTIMIZE ZORDER BY layout from
        plain DataFrame ops.  Costs one extra column-pruned
        approxQuantile pass at write time.
        """
        if append:
            mode = "append"
        sdf = self._sdf
        if sort_by:
            cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
            zn = None  # ("zorder", n) pins the z-bucket count
            if (isinstance(cluster, (tuple, list)) and cluster
                    and cluster[0] == "zorder"):
                zn, cluster = int(cluster[1]), "zorder"
            if isinstance(cluster, str) and cluster == "zorder":
                if len(cols) < 2:
                    raise ValueError(
                        "cluster='zorder' needs >=2 sort_by columns; "
                        "for one column plain cluster=True is strictly "
                        "better (exact ranges, no bucketing)")
                from .sources.layout import zorder_key
                zk = zorder_key(sdf, cols)
                sdf = sdf.withColumn("__zorder", zk)
                sdf = (sdf.repartitionByRange(zn, F.col("__zorder")) if zn
                       else sdf.repartitionByRange(F.col("__zorder")))
                sdf = sdf.sortWithinPartitions("__zorder").drop("__zorder")
            elif cluster:
                if isinstance(cluster, bool):
                    sdf = sdf.repartitionByRange(*cols)
                else:
                    sdf = sdf.repartitionByRange(int(cluster), *cols)
                sdf = sdf.sortWithinPartitions(*cols)
            else:
                sdf = sdf.sortWithinPartitions(*cols)
        elif cluster:
            raise ValueError("cluster= requires sort_by=")
        w = sdf.write.mode(mode).option("compression", compression)
        pb = partition_by or partition_on
        if pb:
            w = w.partitionBy(pb)
        w.parquet(path)

    def to_csv(self, path: str, mode: str = "overwrite", header: bool = True,
               **options) -> None:
        """reference: to_csv, io/csv.py — distributed multi-part write."""
        self._sdf.write.mode(mode).options(**options).csv(path, header=header)

    def to_json(self, path: str, mode: str = "overwrite", **options) -> None:
        """reference: to_json, io/json.py — one JSON-lines file per task."""
        self._sdf.write.mode(mode).options(**options).json(path)

    def to_orc(self, path: str, mode: str = "overwrite") -> None:
        self._sdf.write.mode(mode).orc(path)

    def to_table(self, name: str, mode: str = "overwrite",
                 bucket_by: str | Sequence[str] | None = None,
                 num_buckets: int = 8,
                 sort_by: str | Sequence[str] | None = None) -> None:
        """catalog table write; bucket_by pre-partitions on the join
        key so later equi-joins between co-bucketed tables run
        EXCHANGE-FREE sort-merge (asserted in test_scale_ops) — the
        Spark analogue of the reference's fully-indexed merge."""
        w = self._sdf.write.mode(mode)
        if bucket_by:
            bucket_by = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
            w = w.bucketBy(num_buckets, *bucket_by)
            if sort_by:
                sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
                w = w.sortBy(*sort_by)
        w.saveAsTable(name)

    def to_xml(self, path: str, mode: str = "overwrite",
               row_tag: str = "row", root_tag: str = "rows",
               **options) -> None:
        """XML writer (Spark 4 built-in xml datasource)."""
        w = (self._sdf.write.format("xml").mode(mode)
             .option("rowTag", row_tag).option("rootTag", root_tag))
        for k, v in options.items():
            w = w.option(k, v)
        w.save(path)

    def pipe(self, func: Callable, *args, **kwargs):
        """reference: pipe, _collection.py:2126 — plain function chaining."""
        return func(self, *args, **kwargs)

    def copy(self) -> "DataFrame":
        """reference: copy, _collection.py:1026 — plans are immutable,
        so copy is free (same as the reference's shallow copy)."""
        return DataFrame(self._sdf, self._index_cols, self._known_sorted)

    def apply(self, func: Callable, axis: int = 1, out: str = "apply",
              return_type: str = "double") -> "DataFrame":
        """row-wise Python function → new column (reference:
        DataFrame.apply axis=1, _collection.py:2541). Arrow-batched:
        func receives each row as a pandas Series. The slow path by
        design — prefer assign() with Column expressions (JVM-side)."""
        if axis != 1:
            raise NotImplementedError("only axis=1 (row-wise)")
        cols = list(self._sdf.columns)

        def run(it):
            for pdf in it:
                res = pdf.apply(func, axis=1)
                yield pdf.assign(**{out: res})

        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in self._sdf.schema.fields
        ) + f", `{out}` {return_type}"
        return DataFrame(self._sdf.mapInPandas(run, schema),
                         self._index_cols, False)

    @property
    def ndim(self) -> int:
        return 2

    @property
    def shape(self):
        """(row count, columns) — row count is a job (reference: shape
        triggers compute too, _collection.py:686)."""
        return (self._sdf.count(), len(self.columns))

    @property
    def empty(self) -> bool:
        return self._sdf.isEmpty()

    def all(self, columns: Sequence[str] | None = None) -> "DataFrame":
        """reference: All, _reductions.py:1190 — per-column bool_and."""
        cols = columns or self.columns
        return DataFrame(self._sdf.agg(
            *[F.min(F.col(c).cast("boolean")).alias(c) for c in cols]))

    def any(self, columns: Sequence[str] | None = None) -> "DataFrame":
        """reference: Any, _reductions.py:1177."""
        cols = columns or self.columns
        return DataFrame(self._sdf.agg(
            *[F.max(F.col(c).cast("boolean")).alias(c) for c in cols]))

    def select_dtypes(self, include=None, exclude=None) -> "DataFrame":
        """reference: select_dtypes via meta, _collection.py:1320 —
        pure schema operation, no job."""
        inc = {include} if isinstance(include, str) else set(include or ())
        exc = {exclude} if isinstance(exclude, str) else set(exclude or ())
        groups = {
            "number": {"int", "bigint", "smallint", "tinyint", "double", "float"},
            "integer": {"int", "bigint", "smallint", "tinyint"},
            "floating": {"double", "float"},
            "object": {"string"}, "string": {"string"},
            "bool": {"boolean"}, "datetime": {"timestamp", "timestamp_ntz", "date"},
        }
        def expand(names):
            out = set()
            for n in names:
                out |= groups.get(n, {n})
            return out
        inc_t, exc_t = expand(inc), expand(exc)
        keep = []
        for f in self._sdf.schema.fields:
            if f.name in self._index_cols:
                continue
            t = f.dataType.simpleString()
            base = t.split("(")[0]
            if inc_t and base not in inc_t:
                continue
            if base in exc_t:
                continue
            keep.append(f.name)
        return self[keep]

    def rename_axis(self, name: str) -> "DataFrame":
        """reference: rename_axis, _collection.py:1121 — renames the
        index column."""
        if len(self._index_cols) != 1:
            raise ValueError("rename_axis needs exactly one index column")
        old = self._index_cols[0]
        return DataFrame(self._sdf.withColumnRenamed(old, name), (name,),
                         self._known_sorted)

    def pop(self, col: str):
        """reference: pop, _collection.py:1210 — returns (series, frame
        without the column); the facade is immutable so both are new."""
        return self[col], self.drop(col)

    def squeeze(self):
        """reference: squeeze, _collection.py:4928 — 1-column frame →
        Series."""
        if len(self.columns) == 1:
            return self[self.columns[0]]
        return self

    def to_series(self) -> "Series":
        if len(self.columns) != 1:
            raise ValueError("to_series needs exactly one data column")
        return self[self.columns[0]]

    def sort_index(self, ascending: bool = True) -> "DataFrame":
        """order rows by the index column(s) (pandas sort_index;
        reference sorts via SetIndex/SortValues). Range exchange + local
        sort — Spark's sampled range partitioner, same plan as
        sort_values on the index."""
        if not self._index_cols:
            raise ValueError("sort_index needs a set index")
        cols = [F.col(c).asc() if ascending else F.col(c).desc()
                for c in self._index_cols]
        return DataFrame(self._sdf.orderBy(*cols), self._index_cols,
                         ascending)

    def to_dict(self, orient: str = "dict") -> dict | list:
        """driver-side export (pandas to_dict; reference computes)."""
        return self.compute().to_dict(orient)

    def to_records(self):
        """reference: to_records, _collection.py:1420 — driver-side."""
        return self.compute().to_records()

    def to_bag(self, index: bool = False, format: str = "tuple"):
        """reference: to_bag (io/bag.py:7). The Spark analogue of a bag
        of tuples is the underlying RDD — lazy, partitioned, never
        collected here."""
        cols = ([*self._index_cols] if index else []) + self.columns
        rdd = self._sdf.select(cols).rdd
        if format == "dict":
            return rdd.map(lambda r: r.asDict())
        return rdd.map(tuple)

    def to_sql(self, table: str, url: str, mode: str = "error", **props) -> None:
        """reference: to_sql (io/sql.py:300) — JDBC writer, see
        sources.io.to_sql (no JDBC driver ships in this container)."""
        from .sources.io import to_sql as _to_sql

        _to_sql(self, url, table, mode=mode, **props)

    # -- divisions / partition diagnostics (reference: divisions
    #    _expr.py:378, compute_current_divisions _collection.py:2303,
    #    EnforceRuntimeDivisions _expr.py:1578). Our analogue of known
    #    divisions is the (index_cols, known_sorted) pair — boundary
    #    VALUES aren't tracked (Spark's range partitioning owns them),
    #    so `divisions` reports knownness, not numbers. ----------------
    @property
    def known_divisions(self) -> bool:
        return self._known_sorted

    @property
    def divisions(self) -> tuple:
        """(None, …) like the reference's unknown-divisions tuple;
        compute_current_divisions gives the actual boundaries."""
        return (None, None) if not self._known_sorted else ()

    def clear_divisions(self) -> "DataFrame":
        """reference: clear_divisions, _collection.py:829 — drop the
        sortedness claim (metadata-only, no job)."""
        return type(self)(self._sdf, self._index_cols, False)

    def compute_current_divisions(self):
        """reference: compute_current_divisions, _collection.py:2303 —
        per-partition (min, max) of the index column; one agg job."""
        if not self._index_cols:
            raise ValueError("no index column")
        idx = self._index_cols[0]
        rows = (
            self._sdf.select(F.spark_partition_id().alias("__pid"), idx)
            .groupBy("__pid")
            .agg(F.min(idx).alias("lo"), F.max(idx).alias("hi"))
            .orderBy("__pid")
            .collect()
        )
        if not rows:
            return ()
        return tuple(r["lo"] for r in rows) + (rows[-1]["hi"],)

    def enforce_runtime_divisions(self) -> "DataFrame":
        """reference: EnforceRuntimeDivisions, _expr.py:1578 — runtime
        assert that rows are sorted by index within partitions (raises
        at execution time if violated, like the reference)."""
        if not self._index_cols:
            raise ValueError("no index column")
        idx = self._index_cols[0]
        w = Window.partitionBy(F.spark_partition_id()).orderBy(idx)
        chk = F.when(
            F.lag(F.col(idx)).over(w) > F.col(idx),
            F.raise_error(F.lit("divisions violated: index not sorted")),
        ).otherwise(F.col(idx))
        return self._wrap(
            self._sdf.withColumn("__chk", chk).drop("__chk")
        )

    @property
    def axes(self):
        """reference: axes, _collection.py:4905."""
        return [list(self._index_cols), list(self.columns)]

    @property
    def index(self) -> "Series":
        """reference: index, _collection.py:624 — the index column as a
        Series."""
        if not self._index_cols:
            raise ValueError("no index column (set_index first)")
        c = self._index_cols[0]
        return Series(self._sdf, F.col(c), c)

    @property
    def iloc(self):
        """reference: iloc, _collection.py:3709 — COLUMN-positional
        only (`df.iloc[:, [0, 2]]`); positional ROW access is
        unsupported on an unordered engine, same restriction as the
        reference (_indexing.py:38)."""
        return _ILocIndexer(self)

    def info(self) -> str:
        """reference: info, _collection.py:1354 — schema summary
        (metadata-only, no job)."""
        lines = [f"<class '{type(self).__module__}.{type(self).__name__}'>"]
        lines.append(f"Columns: {len(self.columns)} entries")
        for f in self._sdf.schema.fields:
            lines.append(f"  {f.name}  {f.dataType.simpleString()}")
        if self._index_cols:
            lines.append(f"Index: {list(self._index_cols)} "
                         f"(known_sorted={self._known_sorted})")
        return "\n".join(lines)

    def to_string(self, max_rows: int = 10) -> str:
        """reference: to_string, _collection.py:4899 — driver-side
        head-only render (never materializes the full frame)."""
        return self._sdf.limit(max_rows).toPandas().to_string()

    def to_html(self, max_rows: int = 10) -> str:
        return self._sdf.limit(max_rows).toPandas().to_html()

    @property
    def values(self):
        """reference: values, _collection.py:722 (returns a dask
        array there) — driver-side numpy; prefer to_spark() for
        distributed work."""
        return self.compute().values

    def tail(self, n: int = 5, order_by=None) -> "DataFrame":
        """last n rows BY INDEX ORDER (reference: Tail, _expr.py:1723).
        A distributed frame has no physical tail; this is top-n on the
        reversed order — TakeOrderedAndProject, no full sort."""
        order = order_by or list(self._index_cols)
        if not order:
            raise ValueError("tail needs an index or order_by=")
        order = [order] if isinstance(order, str) else list(order)
        rev = self._sdf.orderBy(*[F.col(c).desc() for c in order]).limit(n)
        return self._wrap(rev.orderBy(*[F.col(c).asc() for c in order]))

    def get_partition(self, i: int) -> "DataFrame":
        """reference: get_partition, _collection.py:1469 — filter on
        spark_partition_id (scan stays distributed; only partition i's
        rows survive)."""
        return self._wrap(
            self._sdf.withColumn("__pid", F.spark_partition_id())
            .filter(F.col("__pid") == i).drop("__pid")
        )

    def iterrows(self):
        """driver-side row iteration via toLocalIterator — streams one
        partition at a time, never materializes the frame
        (reference: iterrows, _collection.py:1378)."""
        for row in self._sdf.toLocalIterator():
            d = row.asDict()
            idx = tuple(d.pop(c) for c in self._index_cols) or None
            yield (idx[0] if idx and len(idx) == 1 else idx), d

    def itertuples(self):
        """reference: itertuples, _collection.py:1392."""
        for row in self._sdf.toLocalIterator():
            yield tuple(row)

    def items(self):
        """column-wise iteration (reference: items, _collection.py:1365).
        Each yield computes ONE column — prefer compute() for small
        frames."""
        for c in self.columns:
            yield c, self[c]

    def memory_usage(self, deep: bool = False, index: bool = True) -> "DataFrame":
        """approximate bytes per column (reference: memory_usage /
        nbytes, _collection.py:1434) — single agg pass. index=False
        excludes the index column(s), as in pandas."""
        widths = {"bigint": 8, "double": 8, "int": 4, "float": 4,
                  "smallint": 2, "tinyint": 1, "boolean": 1,
                  "date": 4, "timestamp": 8, "timestamp_ntz": 8}
        aggs = []
        fields = [f for f in self._sdf.schema.fields
                  if index or f.name not in self._index_cols]
        for f in fields:
            t = f.dataType.simpleString()
            if t in widths and not deep:
                aggs.append((F.count(F.lit(1)) * widths[t]).alias(f.name))
            elif t in ("string", "binary") or deep:
                aggs.append(F.sum(F.coalesce(
                    F.length(F.col(f.name).cast("string")), F.lit(0))).alias(f.name))
            else:
                aggs.append((F.count(F.lit(1)) * 16).alias(f.name))
        return DataFrame(self._sdf.agg(*aggs))

    def nbytes(self) -> "Scalar":
        wide = self.memory_usage().to_spark()
        total = wide.select(
            sum([F.col(c) for c in wide.columns[1:]],
                F.col(wide.columns[0])).alias("nbytes"))
        return Scalar(total)

    def align(self, other: "DataFrame", join: str = "outer"):
        """index-align two frames (reference: align,
        _collection.py:2205): one outer/inner join on the shared index,
        then split back into two frames with null-filled gaps."""
        if not self._index_cols or self._index_cols != other._index_cols:
            raise ValueError("align requires both frames to share an index")
        idx = list(self._index_cols)
        lcols = {c: f"__l_{c}" for c in self.columns}
        rcols = {c: f"__r_{c}" for c in other.columns}
        left = self._sdf.select(*idx, *[F.col(c).alias(a) for c, a in lcols.items()])
        right = other._sdf.select(*idx, *[F.col(c).alias(a) for c, a in rcols.items()])
        how = {"outer": "full", "inner": "inner", "left": "left", "right": "right"}[join]
        joined = left.join(right, on=idx, how=how)
        la = joined.select(*idx, *[F.col(a).alias(c) for c, a in lcols.items()])
        ra = joined.select(*idx, *[F.col(a).alias(c) for c, a in rcols.items()])
        return (DataFrame(la, self._index_cols, False),
                DataFrame(ra, self._index_cols, False))

    def eval(self, expr: str) -> "DataFrame":
        """pandas.eval subset (reference: Eval, _expr.py:1173): one or
        more newline-separated `name = expression` assignments evaluated
        as Spark SQL expressions (JVM-side, optimizer-visible)."""
        out = self._sdf
        for line in expr.splitlines():
            line = line.strip()
            if not line:
                continue
            name, _, rhs = line.partition("=")
            if not _:
                raise ValueError(f"eval line {line!r} is not `name = expression`")
            out = out.withColumn(name.strip(), F.expr(rhs.strip()))
        return self._wrap(out)

    def partition_lengths(self) -> "DataFrame":
        """rows per physical partition (reference: Lengths,
        _expr.py:2145) — spark_partition_id groupBy, no collect."""
        return DataFrame(
            self._sdf.groupBy(F.spark_partition_id().alias("partition"))
            .agg(F.count(F.lit(1)).alias("rows"))
        )

    def memory_usage_per_partition(self, deep: bool = False) -> "DataFrame":
        """approximate bytes per partition (reference:
        MemoryUsagePerPartition, _expr.py:2129). deep=False estimates
        from the schema's fixed widths; deep=True measures the actual
        serialized row length (one extra scan, still distributed)."""
        if deep:
            row_bytes = F.length(F.to_json(F.struct(*[F.col(c) for c in self._sdf.columns])))
        else:
            widths = {"bigint": 8, "double": 8, "int": 4, "float": 4,
                      "smallint": 2, "tinyint": 1, "boolean": 1,
                      "date": 4, "timestamp": 8, "timestamp_ntz": 8}
            per_field = []
            for f in self._sdf.schema.fields:
                t = f.dataType.simpleString()
                if t in widths:
                    per_field.append(F.lit(widths[t]))
                elif t == "string" or t == "binary":
                    per_field.append(F.coalesce(F.length(F.col(f.name)), F.lit(0)))
                else:
                    per_field.append(F.lit(16))
            row_bytes = sum(per_field[1:], per_field[0])
        return DataFrame(
            self._sdf.select(F.spark_partition_id().alias("partition"),
                             row_bytes.alias("__b"))
            .groupBy("partition").agg(F.sum("__b").alias("bytes"))
        )

    def pivot_table(self, index: str | Sequence[str], columns: str,
                    values: str, aggfunc="mean",
                    column_values: Sequence[str] | None = None) -> "DataFrame":
        """reference: pivot_table, _collection.py:5465 — Spark-native
        groupBy().pivot().agg(). Pass column_values to skip the
        distinct-scan job and pin the output schema (required at scale:
        an unbounded pivot column is a driver OOM)."""
        idx = [index] if isinstance(index, str) else list(index)
        gb = GroupBy(self, idx)
        return gb.pivot(columns, values=column_values, agg=aggfunc,
                        value_col=values)

    def corr(self, columns: Sequence[str] | None = None,
             method: str = "pearson") -> "DataFrame":
        """pairwise Pearson correlation matrix in long form
        (col_x, col_y, corr) — ALL pairs in ONE aggregation pass
        (reference: DataFrame.corr, _collection.py:2948). Long form
        instead of a pandas matrix: k² grows, rows parallelize."""
        if method != "pearson":
            raise NotImplementedError("only pearson")
        cols = list(columns or self.columns)
        return self._pairwise(cols, F.corr, "corr")

    def cov(self, columns: Sequence[str] | None = None) -> "DataFrame":
        """pairwise sample covariance, long form (reference:
        DataFrame.cov, _collection.py:2938)."""
        cols = list(columns or self.columns)
        return self._pairwise(cols, F.covar_samp, "cov")

    def _pairwise(self, cols: Sequence[str], fn, out_name: str) -> "DataFrame":
        # all k(k+1)/2 pairs in ONE agg pass, then explode to long form
        pairs = []
        for i, a in enumerate(cols):
            for b in cols[i:]:
                pairs.append(F.struct(
                    F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
                    fn(F.col(a), F.col(b)).alias(out_name),
                ))
        wide = self._sdf.agg(F.array(*pairs).alias("__pairs"))
        return DataFrame(
            wide.select(F.explode("__pairs").alias("__r")).select("__r.*")
        )


class Series(FrameBase):
    """A column expression anchored to a Spark DataFrame
    (reference: Series, _collection.py:4077)."""

    def __init__(self, anchor: SparkDF, scol: Column, name: str,
                 index_cols: Sequence[str] = (), known_sorted: bool = False):
        super().__init__(anchor, index_cols, known_sorted)
        self._anchor = anchor
        self._scol = scol
        self._name = name

    @property
    def name(self) -> str:
        return self._name

    @property
    def dtype(self) -> str:
        """Spark type name of the column expression (reference: dtype,
        _collection.py:4143 — pandas dtype there)."""
        return self._anchor.select(self._scol).schema.fields[0].dataType.simpleString()

    def __repr__(self) -> str:
        try:
            dt = self.dtype
        except Exception:
            dt = "?"
        return f"<Series {self._name!r} [{dt}]>"

    def _new(self, scol: Column, name: str | None = None) -> "Series":
        return Series(self._anchor, scol, name or self._name,
                      self._index_cols, self._known_sorted)

    def alias(self, name: str) -> "Series":
        return Series(self._anchor, self._scol.alias(name), name,
                      self._index_cols, self._known_sorted)

    rename = alias

    # -- binary ops (reference: Binop family, _expr.py:2614-2853) ------------
    def _binop(self, other, op: Callable[[Column, Column], Column],
               name: str) -> "Series":
        if isinstance(other, Series):
            if other._anchor is not self._anchor:
                # cross-frame alignment (reference: are_co_aligned +
                # OpAlignPartitions, _expr.py:3140,3632): outer-join the
                # two series on their (identical) index columns, then
                # apply the op — unmatched labels yield null, matching
                # pandas' NaN-fill alignment.
                if not self._index_cols or self._index_cols != other._index_cols:
                    raise ValueError(
                        "binary op across frames requires both to share an "
                        "index (set_index on the same column(s) first)"
                    )
                idx = list(self._index_cols)
                left = self._anchor.select(*idx, self._scol.alias("__l"))
                right = other._anchor.select(*idx, other._scol.alias("__r"))
                joined = left.join(right, on=idx, how="full")
                return Series(
                    joined, op(F.col("__l"), F.col("__r")).alias(name), name,
                    self._index_cols, False,
                )
            return self._new(op(self._scol, other._scol), name)
        if isinstance(other, Scalar):
            # lazy scalar subquery (Spark 4 DataFrame.scalar) — the
            # aggregate runs once and feeds the expression JVM-side;
            # anchor unchanged, so df["z"] = s - s.min() stays a
            # same-frame assignment (pandas idiom, reference
            # test_collection.py:2736 binop_scalar_left)
            return self._new(op(self._scol, other.to_column()), name)
        return self._new(op(self._scol, F.lit(other)), name)

    def __add__(self, o):
        # pandas semantics: + on string series concatenates
        if self.dtype == "string":
            return self._binop(o, lambda a, b: F.concat(a, b), self._name)
        return self._binop(o, lambda a, b: a + b, self._name)

    def __radd__(self, o):
        if self.dtype == "string":
            return self._binop(o, lambda a, b: F.concat(b, a), self._name)
        return self._binop(o, lambda a, b: b + a, self._name)
    def __sub__(self, o): return self._binop(o, lambda a, b: a - b, self._name)
    def __rsub__(self, o): return self._binop(o, lambda a, b: b - a, self._name)
    def __mul__(self, o): return self._binop(o, lambda a, b: a * b, self._name)
    def __rmul__(self, o): return self._binop(o, lambda a, b: b * a, self._name)
    def __truediv__(self, o): return self._binop(o, lambda a, b: a / b, self._name)
    def __rtruediv__(self, o): return self._binop(o, lambda a, b: b / a, self._name)
    def __mod__(self, o): return self._binop(o, lambda a, b: a % b, self._name)
    def __pow__(self, o): return self._binop(o, lambda a, b: a ** b, self._name)
    def __floordiv__(self, o): return self._binop(o, lambda a, b: F.floor(a / b), self._name)
    def __lt__(self, o): return self._binop(o, lambda a, b: a < b, self._name)
    def __le__(self, o): return self._binop(o, lambda a, b: a <= b, self._name)
    def __gt__(self, o): return self._binop(o, lambda a, b: a > b, self._name)
    def __ge__(self, o): return self._binop(o, lambda a, b: a >= b, self._name)
    def __eq__(self, o): return self._binop(o, lambda a, b: a == b, self._name)  # type: ignore[override]
    def __ne__(self, o): return self._binop(o, lambda a, b: a != b, self._name)  # type: ignore[override]
    def __and__(self, o): return self._binop(o, lambda a, b: a & b, self._name)
    def __or__(self, o): return self._binop(o, lambda a, b: a | b, self._name)
    def __xor__(self, o): return self._binop(o, lambda a, b: a ^ b, self._name)
    def __invert__(self): return self._new(~self._scol)
    def __neg__(self): return self._new(-self._scol)

    # -- elementwise (reference: §2.2 table) ---------------------------------
    def abs(self): return self._new(F.abs(self._scol))
    def round(self, n: int = 0): return self._new(F.round(self._scol, n))
    def sqrt(self): return self._new(F.sqrt(self._scol))
    def clip(self, lower=None, upper=None):
        c = self._scol
        if lower is not None:
            c = F.greatest(c, F.lit(lower))
        if upper is not None:
            c = F.least(c, F.lit(upper))
        return self._new(c)
    def isin(self, values) -> "Series":
        """membership test. Literal lists compile to an IN list;
        a Series from ANOTHER frame becomes a correlated EXISTS
        subquery (Spark 4 DataFrame.exists) — Catalyst plans it as a
        left-semi join against the values' distinct set, the same
        shape the reference's isin fusion produces (_expr.py)."""
        if isinstance(values, Series):
            sub = values._anchor.select(values._scol.alias("__v"))
            return self._new(
                sub.where(F.col("__v") == self._scol.outer()).exists())
        return self._new(self._scol.isin(list(values)))
    def isna(self): return self._new(F.isnull(self._scol))
    isnull = isna
    def notnull(self): return self._new(~F.isnull(self._scol))
    notna = notnull
    # named arithmetic methods with fill_value (pandas Series.add/...;
    # reference: _method_operators, test_collection.py:598)
    def _named_arith(self, o, op, fill_value=None, reflect=False):
        def ap(a, b):
            if fill_value is not None:
                a = F.coalesce(a, F.lit(fill_value))
                b = F.coalesce(b, F.lit(fill_value))
            return op(b, a) if reflect else op(a, b)
        return self._binop(o, ap, self._name)

    def add(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a + b, fill_value)
    def sub(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a - b, fill_value)
    def mul(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a * b, fill_value)
    def div(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a / b, fill_value)
    truediv = div
    def floordiv(self, o, fill_value=None): return self._named_arith(o, lambda a, b: F.floor(a / b), fill_value)
    def mod(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a % b, fill_value)
    def pow(self, o, fill_value=None): return self._named_arith(o, lambda a, b: F.pow(a, b), fill_value)
    def radd(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a + b, fill_value, True)
    def rsub(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a - b, fill_value, True)
    def rmul(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a * b, fill_value, True)
    def rdiv(self, o, fill_value=None): return self._named_arith(o, lambda a, b: a / b, fill_value, True)
    rtruediv = rdiv

    # named comparison methods (reference: _comparison_op, _collection.py:661)
    def eq(self, o): return self._binop(o, lambda a, b: a == b, self._name)
    def ne(self, o): return self._binop(o, lambda a, b: a != b, self._name)
    def lt(self, o): return self._binop(o, lambda a, b: a < b, self._name)
    def le(self, o): return self._binop(o, lambda a, b: a <= b, self._name)
    def gt(self, o): return self._binop(o, lambda a, b: a > b, self._name)
    def ge(self, o): return self._binop(o, lambda a, b: a >= b, self._name)
    def fillna(self, v) -> "Series":
        """null replacement; accepts a scalar, a same-anchor Series
        (pandas: fill from another column), or a lazy Scalar."""
        return self._new(F.coalesce(self._scol, self._other_col(v)))
    def astype(self, t: str): return self._new(self._scol.cast(_spark_type(t)))
    def _other_col(self, other) -> Column:
        """where/mask replacement operand: same-anchor Series keeps its
        expression, Scalar becomes a subquery, anything else a literal."""
        if isinstance(other, Series):
            if other._anchor is not self._anchor:
                raise ValueError("where/mask other= must share the frame")
            return other._scol
        if isinstance(other, Scalar):
            return other.to_column()
        return F.lit(other)

    def case_when(self, caselist) -> "Series":
        """pandas 2.2 Series.case_when (reference: test_collection.py:1145):
        list of (condition, replacement) pairs — the FIRST matching
        condition wins (pandas applies the reversed list as masks);
        rows matching none keep the original value. Pure when-chain,
        JVM-side."""
        acc = self._scol
        for cond, repl in reversed(list(caselist)):
            c = cond._scol if isinstance(cond, Series) else cond
            r = repl._scol if isinstance(repl, Series) else F.lit(repl)
            acc = F.when(c, r).otherwise(acc)
        return self._new(acc)

    def to_numpy(self):
        """driver-side export (reference: to_numpy via compute)."""
        out = self.compute()
        return out.to_numpy() if hasattr(out, "to_numpy") else out

    def to_timestamp(self, freq: str = "M", how: str = "start") -> "Series":
        """period-label strings (.dt.to_period output) back to
        timestamps (reference: FrameBase.to_timestamp,
        _collection.py:1910; label-string divergence documented at
        functions/accessors.py to_period)."""
        from .functions.accessors import period_label_to_timestamp

        return self._new(period_label_to_timestamp(self._scol, freq, how))

    def tolist(self) -> list:
        return list(self.to_numpy())

    def mask(self, cond: "Series", other=None):
        return self._new(F.when(~cond._scol, self._scol)
                         .otherwise(self._other_col(other)))
    def where(self, cond: "Series", other=None):
        return self._new(F.when(cond._scol, self._scol)
                         .otherwise(self._other_col(other)))

    def apply(self, func: Callable, return_type: str = "double") -> "Series":
        """elementwise Python function via Arrow-batched pandas UDF
        (reference: Series.apply, _collection.py:4339). Slow path by
        design — prefer built-in Series methods (JVM-side)."""
        # non-decorator form: `from __future__ import annotations`
        # stringifies hints, which pandas_udf can't resolve here
        _u = F.pandas_udf(lambda s: s.map(func), return_type)
        return self._new(_u(self._scol))

    def map(self, mapping, return_type: str = "double") -> "Series":
        """value mapping (reference: Series.map, _collection.py:4199).
        Dict → literal map + element_at: JVM-side, missing keys → null
        (pandas NaN semantics). Callable → Arrow pandas UDF (the slow
        path; return_type= required when not double)."""
        if callable(mapping):
            return self.apply(mapping, return_type=return_type)
        pairs: list[Column] = []
        for k, v in mapping.items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(v))
        return self._new(F.element_at(F.create_map(*pairs), self._scol))

    @property
    def str(self):
        from .functions.accessors import StringMethods
        return StringMethods(self)

    @property
    def dt(self):
        from .functions.accessors import DatetimeMethods
        return DatetimeMethods(self)

    @property
    def cat(self):
        from .functions.accessors import CategoricalMethods
        return CategoricalMethods(self)

    @property
    def size(self) -> Scalar:
        """row count, lazily (pandas Series.size; reference
        FrameBase.size, _collection.py:356)."""
        return Scalar(self._anchor.select(
            F.count(F.lit(1)).alias(f"size_{self._name}")))

    def pipe(self, func, *args, **kwargs):
        """reference: pipe (chainable call; test_collection.py:368)."""
        return func(self, *args, **kwargs)

    def groupby(self, by) -> "GroupBy":
        """pandas s.groupby(df.k) — groups this column by a same-anchor
        key Series / column name (reference: Series groupby,
        _groupby.py); returns a column-restricted GroupBy."""
        sdf = self._anchor
        # materialize the KEY first (its expression must see the
        # original columns, not a rewritten value column), then the
        # value; a name collision (s.groupby(s // 2)) keeps the key
        # under a reserved name
        if isinstance(by, Series):
            if by._anchor is not self._anchor:
                raise ValueError(
                    "Series.groupby key must come from the same frame")
            kname = by._name if (by._name and by._name != self._name) \
                else "__by_key"
            sdf = sdf.withColumn(kname, by._scol)
            by = kname
        sdf = sdf.withColumn(self._name, self._scol)
        frame = DataFrame(sdf, self._index_cols, self._known_sorted)
        g = frame.groupby(by)
        return g[[self._name]]

    # -- reductions → Scalar (reference: Reduction, _reductions.py:761) ------
    def _reduce(self, col: Column, name: str) -> Scalar:
        return Scalar(self._anchor.select(col.alias(name)))

    def _numeric_scol(self) -> Column:
        # pandas sums/means booleans as ints; Spark's sum(boolean) is an
        # analysis error — cast when the resolved type is boolean
        # (schema-only check, no job)
        t = self._anchor.select(self._scol.alias("__t")).schema[0].dataType
        if t.simpleString() == "boolean":
            return self._scol.cast("long")
        return self._scol

    def sum(self, min_count: int = 0) -> Scalar:
        """reference: Sum with min_count (_reductions.py:860; pandas:
        null result when fewer than min_count non-null values)."""
        c = F.sum(self._numeric_scol())
        if min_count:
            c = F.when(F.count(self._scol) >= min_count, c)
        return self._reduce(c, f"sum_{self._name}")

    def mean(self): return self._reduce(F.avg(self._numeric_scol()), f"mean_{self._name}")
    def min(self): return self._reduce(F.min(self._scol), f"min_{self._name}")
    def max(self): return self._reduce(F.max(self._scol), f"max_{self._name}")
    def count(self): return self._reduce(F.count(self._scol), f"count_{self._name}")
    def _var_expr(self, ddof: int) -> Column:
        # pandas ddof semantics (reference: Var, _reductions.py:1116):
        # var_samp is ddof=1; general ddof rescales by (n-1)/(n-ddof)
        c = self._numeric_scol() if hasattr(self, "_numeric_scol") else self._scol
        if ddof == 1:
            return F.var_samp(c)
        if ddof == 0:
            return F.var_pop(c)
        n = F.count(c)
        return F.var_samp(c) * (n - 1) / (n - F.lit(ddof))

    def std(self, ddof: int = 1):
        return self._reduce(F.sqrt(self._var_expr(ddof)), f"std_{self._name}")

    def var(self, ddof: int = 1):
        return self._reduce(self._var_expr(ddof), f"var_{self._name}")
    def median(self): return self._reduce(F.median(self._scol), f"median_{self._name}")
    def nunique(self): return self._reduce(F.countDistinct(self._scol), f"nunique_{self._name}")
    def nunique_approx(self):
        """reference: NuniqueApprox (HyperLogLog), _reductions.py:1295."""
        return self._reduce(F.approx_count_distinct(self._scol), f"nunique_{self._name}")
    def quantile(self, q: float):
        return self._reduce(F.expr(f"percentile({self._name}, {q})"), f"q_{self._name}")
    def quantile_approx(self, q: float):
        return self._reduce(F.percentile_approx(self._scol, q), f"q_{self._name}")

    def sem(self, ddof: int = 1) -> Scalar:
        """standard error of the mean (reference: Sem,
        _reductions.py:1118)."""
        return self._reduce(
            F.sqrt(self._var_expr(ddof)) / F.sqrt(F.count(self._scol)),
            f"sem_{self._name}")

    def all(self) -> Scalar:
        return self._reduce(F.min(self._scol.cast("boolean")), f"all_{self._name}")

    def any(self) -> Scalar:
        return self._reduce(F.max(self._scol.cast("boolean")), f"any_{self._name}")

    def median_approximate(self) -> Scalar:
        """reference: median_approximate, _collection.py:4460 (t-digest
        there, KLL sketch here — same contract)."""
        return self._reduce(F.percentile_approx(self._scol, 0.5),
                            f"median_{self._name}")

    def combine(self, other: "Series", func, return_type: str = "double") -> "Series":
        """element-pair combine with a Python function (reference:
        combine, _collection.py:4251) — Arrow-batched over both columns."""
        _u = F.pandas_udf(
            lambda a, b: a.combine(b, func), return_type
        )
        return self._binop(other, lambda x, y: _u(x, y), self._name)

    def skew(self, bias: bool = False) -> Scalar:
        """sample skewness, pandas bias-corrected by default
        (reference: Skew, _reductions.py:1002; pandas G1 = g1 ·
        √(n(n−1))/(n−2), with Spark's F.skewness supplying g1).
        bias=True returns the population moment g1."""
        c = self._scol
        g1 = F.skewness(c)
        if bias:
            return self._reduce(g1, f"skew_{self._name}")
        n = F.count(c)
        corr = F.sqrt(n * (n - 1)) / (n - 2)
        return self._reduce(g1 * corr, f"skew_{self._name}")

    def kurtosis(self, bias: bool = False) -> Scalar:
        """sample excess kurtosis, pandas bias-corrected by default
        (reference: Kurtosis, _reductions.py:1022; pandas G2 =
        ((n+1)·g2 + 6)·(n−1)/((n−2)(n−3)), with Spark's F.kurtosis
        supplying g2). bias=True returns the population moment g2."""
        c = self._scol
        g2 = F.kurtosis(c)
        if bias:
            return self._reduce(g2, f"kurt_{self._name}")
        n = F.count(c)
        G2 = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
        return self._reduce(G2, f"kurt_{self._name}")

    kurt = kurtosis

    def prod(self, min_count: int = 0) -> Scalar:
        """reference: Prod, _reductions.py:925 — F.product aggregate;
        min_count as in sum."""
        c = F.product(self._scol)
        if min_count:
            c = F.when(F.count(self._scol) >= min_count, c)
        return self._reduce(c, f"prod_{self._name}")

    product = prod

    def cov(self, other: "Series") -> Scalar:
        """sample covariance with another column of the SAME frame
        (reference: Cov, _reductions.py:940). Cross-frame: merge first."""
        return self._reduce(F.covar_samp(self._scol, other._scol),
                            f"cov_{self._name}_{other._name}")

    def corr(self, other: "Series") -> Scalar:
        """Pearson correlation (reference: Corr, _reductions.py:953)."""
        return self._reduce(F.corr(self._scol, other._scol),
                            f"corr_{self._name}_{other._name}")

    def dot(self, other: "Series") -> Scalar:
        """inner product sum(x*y) (reference: Dot via _dot_series,
        _collection.py:5325) — map-side combine, no data movement."""
        return self._reduce(F.sum(self._scol * other._scol),
                            f"dot_{self._name}_{other._name}")

    def idxmax(self, order_by: str | None = None) -> Scalar:
        """index label of the maximum (reference: IdxMax,
        _reductions.py:1079). Ties resolve to the SMALLEST index (a
        total order — pandas' first-occurrence rule depends on row
        order, which a distributed frame doesn't have)."""
        return self._idx_extreme(F.max, F.min, order_by, "idxmax")

    def idxmin(self, order_by: str | None = None) -> Scalar:
        """reference: IdxMin, _reductions.py:1090; ties → smallest index."""
        return self._idx_extreme(F.min, F.min, order_by, "idxmin")

    def _idx_extreme(self, val_fn, tie_fn, order_by, label) -> Scalar:
        # scalable shape: 1-row global extreme, broadcast back as an
        # equi-join filter, then aggregate the tie-break — both scans
        # fully parallel (an empty-partitionBy window would single-
        # partition the whole frame)
        idx = order_by or (self._index_cols[0] if self._index_cols else None)
        if idx is None:
            raise ValueError(f"{label} needs an index or order_by=")
        m = self._anchor.agg(val_fn(self._scol).alias("__m"))
        sdf = (
            self._anchor.select(F.col(idx), self._scol.alias("__v"))
            .join(F.broadcast(m), F.col("__v") == F.col("__m"))
            .agg(tie_fn(F.col(idx)).alias(f"{label}_{self._name}"))
        )
        return Scalar(sdf)

    # -- numpy ufunc protocol (reference: UFuncElemwise _expr.py:713,
    #    elemwise _collection.py:6383) — np.sqrt(series) etc. dispatch
    #    to the JVM-side Column function, never materializing ------------
    _UFUNC_UNARY = {
        "sqrt": "sqrt", "exp": "exp", "log": "log", "log10": "log10",
        "log2": "log2", "log1p": "log1p", "expm1": "expm1",
        "sin": "sin", "cos": "cos", "tan": "tan",
        "arcsin": "asin", "arccos": "acos", "arctan": "atan",
        "sinh": "sinh", "cosh": "cosh", "tanh": "tanh",
        "floor": "floor", "ceil": "ceil", "absolute": "abs",
        "sign": "signum", "negative": None, "rint": "rint",
        "degrees": "degrees", "radians": "radians", "cbrt": "cbrt",
        "isnan": "isnan",
    }
    _UFUNC_BINARY = {
        "add": lambda a, b: a + b, "subtract": lambda a, b: a - b,
        "multiply": lambda a, b: a * b, "true_divide": lambda a, b: a / b,
        "divide": lambda a, b: a / b, "power": lambda a, b: a ** b,
        "mod": lambda a, b: a % b, "floor_divide": lambda a, b: F.floor(a / b),
        "maximum": lambda a, b: F.greatest(a, b),
        "minimum": lambda a, b: F.least(a, b),
        "arctan2": lambda a, b: F.atan2(a, b),
        "hypot": lambda a, b: F.hypot(a, b),
    }

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out") is not None:
            return NotImplemented
        name = ufunc.__name__
        cols = [i._scol if isinstance(i, Series) else F.lit(i) for i in inputs]
        if len(inputs) == 1 and name in self._UFUNC_UNARY:
            if name == "negative":
                return self._new(-cols[0], self._name)
            return self._new(getattr(F, self._UFUNC_UNARY[name])(cols[0]), self._name)
        if len(inputs) == 2 and name in self._UFUNC_BINARY:
            anchor = next(i for i in inputs if isinstance(i, Series))
            return anchor._new(self._UFUNC_BINARY[name](*cols), anchor._name)
        return NotImplemented

    # -- ordered ops (reference: Series shift/diff/cum*/ffill/bfill,
    #    _expr.py:3292-3433, _cumulative.py:11-145) — range-bucketed
    #    two-pass plans over the index order (operators/ordered.py),
    #    same machinery as the frame-level versions. The result is
    #    anchored on the two-pass output frame; assign/binops re-align
    #    it to other frames via the index equi-join rule. -----------------
    def _ordered_frame(self, order_by):
        """(projected frame, order cols, value col name) for the
        range-bucketed ordered machinery."""
        order = order_by or (self._index_cols[0] if self._index_cols else None)
        if order is None:
            raise ValueError(
                "order-dependent op needs an index (set_index) or order_by="
            )
        order = [order] if isinstance(order, str) else list(order)
        keep = list(dict.fromkeys([*self._index_cols, *order]))
        val = self._name if self._name not in keep else "__ord_val"
        return self._anchor.select(*keep, self._scol.alias(val)), order, val

    def _from_ordered(self, sdf: SparkDF, val: str) -> "Series":
        return Series(sdf, F.col(val).alias(self._name), self._name,
                      self._index_cols, False)

    def shift(self, periods: int = 1, order_by=None,
              freq: str | None = None) -> "Series":
        from .operators import ordered
        if freq is not None:
            # ShiftIndex (reference _expr.py:3433): move the timestamp
            # index labels, keep each value with its row
            from .operators.window import freq_micros
            micros = freq_micros(freq) * periods
            idx = order_by or (self._index_cols[0] if self._index_cols else None)
            if idx is None:
                raise ValueError("shift(freq=) needs an index or order_by=")
            if not isinstance(idx, str):  # composite order: shift the ts head
                idx = idx[0]
            dtypes = dict(self._anchor.dtypes)
            if dtypes[idx].split("(")[0] not in ("timestamp", "timestamp_ntz", "date"):
                raise TypeError(
                    f"shift(freq=) needs a timestamp/date order column; "
                    f"{idx!r} is {dtypes[idx]}"
                )
            anchor = self._anchor.withColumn(
                idx,
                F.timestamp_micros(
                    F.unix_micros(F.col(idx).cast("timestamp")) + F.lit(micros)
                ).cast(dtypes[idx]),
            )
            return Series(anchor, self._scol, self._name, self._index_cols,
                          self._known_sorted)
        if periods == 0:
            return self._new(self._scol, self._name)
        base, order, val = self._ordered_frame(order_by)
        out = ordered.with_lagged(base, [val], order, periods, lambda c, l: l,
                                  bounds=self._ordered_bounds(base, order))
        return self._share_bounds(self._from_ordered(out, val))

    def diff(self, periods: int = 1, order_by=None) -> "Series":
        from .operators import ordered
        base, order, val = self._ordered_frame(order_by)
        out = ordered.with_lagged(base, [val], order, periods,
                                  lambda c, l: c - l,
                                  bounds=self._ordered_bounds(base, order))
        return self._share_bounds(self._from_ordered(out, val))

    def pct_change(self, periods: int = 1, order_by=None) -> "Series":
        from .operators import ordered
        base, order, val = self._ordered_frame(order_by)
        out = ordered.with_lagged(base, [val], order, periods,
                                  lambda c, l: (c - l) / l,
                                  bounds=self._ordered_bounds(base, order))
        return self._share_bounds(self._from_ordered(out, val))

    def _cum(self, fn: str, order_by) -> "Series":
        from .operators import ordered
        base, order, val = self._ordered_frame(order_by)
        out = ordered.cumulative(base, {val: fn}, order, mask_nulls=True,
                                 bounds=self._ordered_bounds(base, order))
        return self._share_bounds(self._from_ordered(out, val))

    def cumsum(self, order_by=None) -> "Series":
        return self._cum("sum", order_by)

    def cumprod(self, order_by=None) -> "Series":
        return self._cum("product", order_by)

    def cummax(self, order_by=None) -> "Series":
        return self._cum("max", order_by)

    def cummin(self, order_by=None) -> "Series":
        return self._cum("min", order_by)

    def ffill(self, order_by=None, limit: int | None = None) -> "Series":
        from .operators import ordered
        base, order, val = self._ordered_frame(order_by)
        out = ordered.fill(base, [val], order, "ffill", limit,
                           bounds=self._ordered_bounds(base, order))
        return self._share_bounds(self._from_ordered(out, val))

    def bfill(self, order_by=None, limit: int | None = None) -> "Series":
        from .operators import ordered
        base, order, val = self._ordered_frame(order_by)
        out = ordered.fill(base, [val], order, "bfill", limit,
                           bounds=self._ordered_bounds(base, order))
        return self._share_bounds(self._from_ordered(out, val))

    def rank(self, method: str = "average", ascending: bool = True,
             pct: bool = False) -> "Series":
        """value rank with pandas tie semantics (average/min/max/first/
        dense). Scale design: ranks are computed on the DISTINCT-value
        frame (cumulative counts over values, a window over |distinct|
        rows, not |rows|) and equi-joined back — no global per-row
        window. method='first' additionally breaks ties by position; it
        runs the range-bucketed global row_number (per-bucket
        row_number + broadcast counts of better-ranked buckets,
        operators/ordered.py) keyed on the index order."""
        if method == "first":
            from .operators import ordered
            if not self._index_cols:
                raise ValueError(
                    "rank(method='first') needs an index (set_index) "
                    "for positional tie-breaking"
                )
            base = self._anchor.select(
                *self._index_cols, self._scol.alias("__v")
            )
            out = ordered.row_number_global(
                base, "__v", list(self._index_cols), ascending, "__rank"
            )
            if pct:
                # one column-pruned count at build time (the crossJoin
                # form trips Catalyst's attribute rewrite on the shared
                # lineage; a literal is also cheaper) — same eager
                # precedent as ordered.sample_bounds
                ntot = base.where(F.col("__v").isNotNull()).count()
                expr = (F.col("__rank") / F.lit(float(ntot))).alias(self._name)
            else:
                expr = F.col("__rank").cast("double").alias(self._name)
            return Series(out, expr, self._name, self._index_cols, False)
        # rank arithmetic over the DISTINCT-value frame: running count
        # of values below (and running distinct index for dense) come
        # from the bucketed cumulative — even the distinct frame never
        # funnels through one partition
        from .operators import ordered
        vals = (
            self._anchor.select(self._scol.alias("__v"))
            .filter(F.col("__v").isNotNull())
            .groupBy("__v")
            .agg(F.count(F.lit(1)).alias("__c"))
            .withColumn("__cum", F.col("__c"))
            .withColumn("__one", F.lit(1).cast("long"))
        )
        vals = ordered.cumulative(
            vals, {"__cum": "sum", "__one": "sum"}, ["__v"],
            ascending=ascending,
        )
        lt = F.col("__cum") - F.col("__c")  # count of better-ranked rows
        if method == "average":
            r = lt + (F.col("__c") + 1) / 2.0
        elif method == "min":
            r = (lt + 1).cast("double")
        elif method == "max":
            r = F.col("__cum").cast("double")
        elif method == "dense":
            r = F.col("__one").cast("double")
        else:
            raise ValueError(f"unsupported rank method {method!r}")
        if pct:
            # pandas: dense pct divides by the DISTINCT count, others by
            # the non-null row count — one broadcast row either way
            tot = vals.agg(
                F.sum("__c").alias("__tr"), F.max("__one").alias("__td")
            )
            vals = vals.crossJoin(F.broadcast(tot))
            r = r / (F.col("__td") if method == "dense" else F.col("__tr"))
        ranked = vals.select("__v", r.alias("__rank"))
        # plain equi-join back; AQE broadcasts when the distinct-value
        # frame is small (the common case)
        joined = self._anchor.join(
            ranked, self._scol == F.col("__v"), "left"
        ).drop("__v")
        # the equi-join re-shuffles the anchor; range order is lost, so the
        # result must not inherit _known_sorted (presorted fast paths would
        # elide a required sort downstream)
        return Series(joined, F.col("__rank").alias(self._name), self._name,
                      self._index_cols, False)

    def autocorr(self, lag: int = 1, order_by: str | None = None) -> Scalar:
        """lag-k autocorrelation (reference: autocorr,
        _collection.py:4547) — corr of the series with its lagged self
        over the index order."""
        from .operators import ordered
        order = order_by or (self._index_cols[0] if self._index_cols else None)
        if order is None:
            raise ValueError("autocorr needs an index or order_by=")
        base = self._anchor.select(
            F.col(order), self._scol.alias("__x"), self._scol.alias("__y")
        )
        sdf = ordered.with_lagged(base, ["__y"], [order], lag, lambda c, l: l)
        return Scalar(sdf.agg(F.corr("__x", "__y").alias(f"autocorr_{self._name}")))

    def is_monotonic_increasing(self, order_by: str | None = None) -> Scalar:
        """reference: IsMonotonicIncreasing, _reductions.py:1519 —
        window lag comparison + bool_and."""
        return self._is_monotonic(order_by, decreasing=False)

    def is_monotonic_decreasing(self, order_by: str | None = None) -> Scalar:
        """reference: IsMonotonicDecreasing, _reductions.py:1529."""
        return self._is_monotonic(order_by, decreasing=True)

    def _is_monotonic(self, order_by, decreasing: bool) -> Scalar:
        from .operators import ordered
        order = order_by or (self._index_cols[0] if self._index_cols else None)
        if order is None:
            raise ValueError("is_monotonic needs an index or order_by=")
        # bucketed lag: per-bucket comparison with one padded boundary
        # row — no global window for what is a one-pass predicate
        base = self._anchor.select(
            F.col(order), self._scol.alias("__x"), self._scol.alias("__prev")
        )
        lagged = ordered.with_lagged(base, ["__prev"], [order], 1,
                                     lambda c, l: l)
        prev, cur = F.col("__prev"), F.col("__x")
        cmp = (cur <= prev) if decreasing else (cur >= prev)
        ok = F.when(prev.isNull(), True).otherwise(cmp)
        sdf = lagged.select(ok.alias("__ok"))
        return Scalar(sdf.agg(F.min("__ok").alias("is_monotonic")))

    def mode(self, dropna: bool = True) -> Scalar:
        """most frequent value (reference: Mode, _reductions.py:1270).
        dropna=False lets the null bucket win like pandas."""
        if dropna:
            return self._reduce(F.mode(self._scol), f"mode_{self._name}")
        cnt = (self._anchor.groupBy(self._scol.alias("__v"))
               .agg(F.count(F.lit(1)).alias("__n"))
               .orderBy(F.col("__n").desc(), F.col("__v").asc_nulls_last())
               .limit(1).select(F.col("__v").alias(f"mode_{self._name}")))
        return Scalar(cnt)

    def nlargest(self, n: int = 5) -> "DataFrame":
        """top-n values with their index (reference: NLargest,
        _reductions.py:1218) — TakeOrderedAndProject, no full sort."""
        sdf = (self._anchor.select(*self._index_cols, self._scol.alias(self._name))
               .orderBy(F.col(self._name).desc()).limit(n))
        return DataFrame(sdf, self._index_cols, False)

    def nsmallest(self, n: int = 5) -> "DataFrame":
        """reference: NSmallest, _reductions.py:1232."""
        sdf = (self._anchor.select(*self._index_cols, self._scol.alias(self._name))
               .orderBy(F.col(self._name).asc()).limit(n))
        return DataFrame(sdf, self._index_cols, False)

    def value_counts(self, normalize: bool = False, sort: bool = True,
                     dropna: bool = True, ascending: bool = False) -> "DataFrame":
        """reference: ValueCounts, _reductions.py:1394. dropna=True
        (pandas default) excludes the null bucket; ascending= flips the
        count order like pandas."""
        anchor = self._anchor
        if dropna:
            anchor = anchor.filter(self._scol.isNotNull())
        out = anchor.groupBy(self._scol.alias(self._name)).agg(
            F.count(F.lit(1)).alias("count")
        )
        if normalize:
            total = F.sum("count").over(Window.partitionBy())
            out = out.withColumn("proportion", F.col("count") / total).drop("count")
        if sort:
            key = F.col("proportion" if normalize else "count")
            out = out.orderBy(key.asc() if ascending else key.desc())
        return DataFrame(out)

    def unique(self) -> "DataFrame":
        return DataFrame(self._anchor.select(self._scol.alias(self._name)).distinct())

    def to_frame(self, name: str | None = None) -> DataFrame:
        name = name or self._name
        return DataFrame(
            self._anchor.select(*self._index_cols, self._scol.alias(name)),
            self._index_cols, self._known_sorted,
        )

    def compute(self):
        pdf = self.to_frame().compute()
        return pdf[pdf.columns[0]] if len(pdf.columns) == 1 else pdf

    # -- Series-level parity batch (reference Series methods that are
    #    frame ops on one column) ---------------------------------------
    @property
    def ndim(self) -> int:
        return 1

    @property
    def shape(self) -> tuple:
        return (self._anchor.count(),)

    @property
    def axes(self):
        return [list(self._index_cols)]

    @property
    def nbytes(self):
        """estimated bytes of this column (one agg pass)."""
        t = self._anchor.select(self._scol).schema.fields[0].dataType.simpleString()
        fixed = {"bigint": 8, "double": 8, "int": 4, "float": 4,
                 "smallint": 2, "tinyint": 1, "boolean": 1,
                 "timestamp": 8, "timestamp_ntz": 8, "date": 4}
        if t in fixed:
            return Scalar(self._anchor.agg(
                (F.count(self._scol) * fixed[t]).alias("nbytes")))
        return Scalar(self._anchor.agg(
            F.sum(F.length(self._scol.cast("string"))).alias("nbytes")))

    def rename(self, name: str) -> "Series":
        return self.alias(name)

    def squeeze(self) -> "Series":
        return self

    def dropna(self) -> "Series":
        anchor = self._anchor.filter(~F.isnull(self._scol))
        return Series(anchor, self._scol, self._name,
                      self._index_cols, self._known_sorted)

    def drop_duplicates(self) -> "DataFrame":
        return self.unique()

    def explode(self) -> "DataFrame":
        """unnest an array-valued Series (reference: ExplodeSeries,
        _expr.py:1809); index columns ride along."""
        return DataFrame(
            self._anchor.select(
                *self._index_cols, F.explode(self._scol).alias(self._name)
            ),
            self._index_cols, False,
        )

    def between(self, left, right, inclusive: str = "both") -> "Series":
        c = self._scol
        ops = {
            "both": (c >= left) & (c <= right),
            "neither": (c > left) & (c < right),
            "left": (c >= left) & (c < right),
            "right": (c > left) & (c <= right),
        }
        return self._new(ops[inclusive], f"between_{self._name}")

    def describe(self) -> "DataFrame":
        """count/mean/std/min/max one-row summary."""
        return DataFrame(self._anchor.agg(
            F.count(self._scol).alias("count"),
            F.avg(self._scol).alias("mean"),
            F.stddev_samp(self._scol).alias("std"),
            F.min(self._scol).alias("min"),
            F.max(self._scol).alias("max"),
        ))

    def to_string(self, max_rows: int = 10) -> str:
        return (
            self._anchor.select(self._scol.alias(self._name))
            .limit(max_rows).toPandas()[self._name].to_string()
        )

    def add_prefix(self, prefix: str) -> "Series":
        return self.alias(f"{prefix}{self._name}")

    def add_suffix(self, suffix: str) -> "Series":
        return self.alias(f"{self._name}{suffix}")

    def expanding(self, order_by=None, min_periods: int = 1):
        """one-column expanding frame (pandas Series.expanding())."""
        return self.to_frame().expanding(
            order_by=order_by or list(self._index_cols),
            min_periods=min_periods,
        )

    def duplicated(self, keep: str = "first") -> "Series":
        """boolean marker of repeated values (pandas Series.duplicated)
        — delegates to the frame form on the value column."""
        return self.to_frame().duplicated(subset=[self._name], keep=keep)

    def resample(self, freq: str, closed: str = "left",
                 label: str = "left"):
        """one-column resampler over the (timestamp) index
        (reference: Series resample, _resample.py)."""
        if not self._index_cols:
            raise ValueError("Series.resample needs a timestamp index")
        return self.to_frame().resample(
            freq, on=self._index_cols[0], closed=closed, label=label
        )

    def rolling(self, window: int, order_by=None, min_periods: int | None = None,
                center: bool = False, win_type: str | None = None):
        """reference: Series.rolling (_collection.py:954) — one-column
        rolling frame over the index order."""
        return self.to_frame().rolling(
            window, order_by=order_by or list(self._index_cols),
            min_periods=min_periods, center=center, win_type=win_type,
        )


class _ILocIndexer:
    """reference: _indexing.py:38 — iloc restricted to COLUMN
    positions (`df.iloc[:, cols]`); row-positional raises, as in the
    reference."""

    def __init__(self, frame: DataFrame):
        self._frame = frame

    def __getitem__(self, key):
        if not (isinstance(key, tuple) and len(key) == 2):
            raise NotImplementedError(
                "iloc supports column selection only: df.iloc[:, positions]"
            )
        rows, cols = key
        if not (isinstance(rows, slice) and rows == slice(None)):
            raise NotImplementedError(
                "positional row selection is not supported (unordered "
                "engine) — use loc on the index instead"
            )
        names = self._frame.columns
        if isinstance(cols, int):
            return self._frame[names[cols]]
        if isinstance(cols, slice):
            return self._frame[list(names[cols])]
        return self._frame[[names[i] for i in cols]]


class LocIndexer:
    """reference: _indexing.py:64 — label slices on the index column.
    Column-selection iloc (the only iloc the reference supports,
    _indexing.py:38) is covered by DataFrame.__getitem__."""

    def __init__(self, frame: DataFrame):
        self._frame = frame

    def __getitem__(self, key):
        frame = self._frame
        if not frame._index_cols:
            raise ValueError("loc requires an index (set_index first)")
        if isinstance(key, tuple) and len(key) == 2:
            # df.loc[rows, cols] — row-select then project (index kept)
            rows, cols = key
            picked = self[rows]
            if isinstance(cols, slice):
                if cols != slice(None):
                    raise ValueError("loc column slices must be ':'")
                return picked
            cols = [cols] if isinstance(cols, str) else list(cols)
            return picked[[*cols]]
        if callable(key):
            # reference: loc accepts a callable of the frame
            # (_indexing.py via pandas semantics; test_indexing.py:134)
            return self[key(frame)]
        if isinstance(key, Series):
            # boolean-mask loc — same-anchor column predicate
            # (test_indexing.py:126)
            return frame._wrap(frame._sdf.filter(key._scol))
        idx = F.col(frame._index_cols[0])
        if isinstance(key, slice):
            if key.step is not None:
                raise ValueError("loc slices with step are unsupported")
            cond = None
            if key.start is not None:
                cond = idx >= key.start
            if key.stop is not None:
                # pandas .loc slices are INCLUSIVE of the stop label
                c2 = idx <= key.stop
                cond = c2 if cond is None else (cond & c2)
            return frame._wrap(frame._sdf.filter(cond) if cond is not None else frame._sdf)
        if isinstance(key, (list, tuple)):
            return frame._wrap(frame._sdf.filter(idx.isin(list(key))))
        return frame._wrap(frame._sdf.filter(idx == key))


class Aggregation:
    """user-defined groupby aggregation in chunk/agg/finalize form —
    API-compatible with the reference (Aggregation, _groupby.py:95).
    chunk and agg receive pandas SeriesGroupBy objects; finalize the
    aggregated series. See GroupBy._custom_agg for execution shape."""

    def __init__(self, name: str, chunk: Callable, agg: Callable,
                 finalize: Callable | None = None):
        self.chunk = chunk
        self.agg = agg
        self.finalize = finalize
        self.__name__ = name


class GroupBy:
    """reference: GroupBy, _groupby.py:1496.

    Spark does partial (map-side) aggregation + exchange + final
    automatically, so the reference's whole ACA/TreeReduce/ShuffleReduce
    machinery (_reductions.py:388) collapses to groupBy().agg().
    """

    def __init__(self, frame: DataFrame, by: list[str], dropna: bool = True,
                 mode: str = "groupby", sort: bool = False,
                 unobserved: dict[str, list] | None = None):
        self._frame = frame
        self._by = by
        self._dropna = dropna
        self._mode = mode
        self._sort = sort
        # observed=False: {key: explicit category list} for categorical
        # groupers; aggregation outputs are expanded to the full key
        # cross product (see _expand_unobserved)
        self._unobserved = unobserved or None

    def _finish(self, sdf: SparkDF) -> DataFrame:
        """apply the sort= contract to an aggregation output."""
        if self._sort:
            sdf = sdf.orderBy(*self._by)
        return DataFrame(sdf)

    def _sdf(self) -> SparkDF:
        sdf = self._frame._sdf
        if self._dropna:
            sdf = sdf.dropna(subset=self._by)
        return sdf

    def _grouped(self):
        sdf = self._sdf()
        if self._mode == "rollup":
            return sdf.rollup(*self._by)
        if self._mode == "cube":
            return sdf.cube(*self._by)
        return sdf.groupBy(*self._by)

    def __getitem__(self, cols) -> "GroupBy":
        """column-restricted groupby (reference: GroupBy.__getitem__ →
        SeriesGroupBy, _groupby.py:1602): ``df.groupby(k)[v].sum()``
        aggregates only ``v``. Restriction happens by projecting the
        underlying frame to (keys + selected) — Catalyst prunes the scan."""
        sel = [cols] if isinstance(cols, str) else list(cols)
        missing = [c for c in sel if c not in self._frame.columns]
        if missing:
            raise KeyError(missing)
        proj = self._frame[[*self._by, *sel]]
        return GroupBy(proj, self._by, self._dropna, self._mode, self._sort,
                       self._unobserved)

    def rolling(self, window: int, order_by=None, min_periods: int | None = None,
                center: bool = False, win_type: str | None = None):
        """reference: groupby().rolling(), _groupby.py:2136 — per-group
        rolling frame (window partitioned by the group keys)."""
        from .operators.window import Rolling
        return Rolling(self._frame, window,
                       order_by or list(self._frame._index_cols),
                       partition_by=list(self._by), min_periods=min_periods,
                       center=center, win_type=win_type)

    def expanding(self, order_by=None):
        """per-group expanding window — rolling with an unbounded start
        partitioned by the group keys (pandas groupby().expanding())."""
        from .operators.window import Rolling
        return Rolling(self._frame, window=1,
                       order_by=order_by or list(self._frame._index_cols),
                       partition_by=list(self._by), min_periods=1,
                       unbounded_start=True)

    def agg(self, spec=None, **named) -> DataFrame:
        value_cols = [c for c in self._frame.columns if c not in self._by]
        # route reference-style Aggregation objects (chunk/agg/finalize)
        # through the grouped-map path
        if isinstance(spec, Aggregation):
            return self._custom_agg([(spec.__name__, c, spec) for c in value_cols])
        if isinstance(spec, Mapping) and any(
            isinstance(v, Aggregation) for v in spec.values()
        ):
            customs = [(f"{c}_{v.__name__}" if len(spec) > 1 else v.__name__, c, v)
                       for c, v in spec.items() if isinstance(v, Aggregation)]
            rest = {c: v for c, v in spec.items() if not isinstance(v, Aggregation)}
            out = self._custom_agg(customs)
            if rest:
                out = out.merge(self.agg(rest), on=list(self._by))
            return out
        named_norm = {
            k: (v if isinstance(v, tuple) else (v[0], v[1]))
            for k, v in named.items()
        } if named else None
        triples = _normalize_agg_spec(spec, value_cols, named_norm)
        aggs = [_agg_expr(fn, col).alias(out) for out, col, fn in triples]
        agged = self._grouped().agg(*aggs)
        if self._unobserved and self._mode == "groupby":
            agged = self._expand_unobserved(
                agged, {out: fn for out, _c, fn in triples})
        return self._finish(agged)

    def _expand_unobserved(self, agged: SparkDF,
                           out_fns: Mapping[str, str]) -> SparkDF:
        """observed=False: left-join the aggregation output onto the
        full key cross product — explicit category lists (plan-side
        metadata, broadcast literal frames) for categorical keys,
        observed distincts for the rest — then apply pandas'
        empty-group identities (count/size/nunique→0, sum→0, prod→1;
        everything else stays null). The cross product is
        category-bounded, never row-stream-sized."""
        spark = agged.sparkSession
        dtypes = dict(agged.dtypes)
        full = None
        for k in self._by:
            if k in self._unobserved:
                kdf = spark.createDataFrame(
                    [(v,) for v in self._unobserved[k]], f"`{k}` {dtypes[k]}")
            else:
                kdf = agged.select(k).distinct()
            full = kdf if full is None else full.crossJoin(kdf)
        joined = F.broadcast(full).join(agged, on=list(self._by), how="left")
        fills = {"count": F.lit(0), "size": F.lit(0), "nunique": F.lit(0),
                 "sum": F.lit(0), "prod": F.lit(1), "product": F.lit(1)}
        out_cols = []
        for c in joined.columns:
            fn = out_fns.get(c)
            if c not in self._by and fn in fills:
                out_cols.append(
                    F.coalesce(F.col(c), fills[fn].cast(dtypes[c])).alias(c))
            else:
                out_cols.append(F.col(c))
        return joined.select(*out_cols)

    def _no_unobserved(self, what: str) -> None:
        """observed=False expansion only applies to built-in agg specs
        (_expand_unobserved needs the per-column agg kind for pandas'
        empty-group identities) — refuse rather than silently behave
        like observed=True."""
        if self._unobserved:
            raise NotImplementedError(
                f"groupby(observed=False).{what} is not supported; "
                "unobserved-category expansion covers built-in "
                "aggregation specs (agg/size and friends)"
            )

    def _custom_agg(self, aggs) -> DataFrame:
        """execute reference-style Aggregation objects (_groupby.py:95):
        chunk → agg (over chunk outputs grouped by key) → finalize.

        Spark-first shape: whole groups are colocated by one exchange
        (applyInPandas — the same physical plan as groupby.apply), so
        the chunk/agg chain runs once per group, which is semantically
        identical for any law-abiding Aggregation. The reference's
        multi-chunk tree exists because dask groups span partitions;
        on Spark, colocating the group IS the standard pattern. For
        huge low-cardinality groups prefer a callable Column spec
        (JVM-side partial aggregation) instead."""
        self._no_unobserved("agg(Aggregation)")
        import pandas as pd

        keys = list(self._by)

        def run_one(pdf: "pd.DataFrame", col: str, agg: "Aggregation"):
            sgb = pdf.groupby(keys, dropna=False)[col]
            inter = agg.chunk(sgb)
            inter = inter if isinstance(inter, tuple) else (inter,)
            regrouped = [s.groupby(level=list(range(len(keys)))) for s in inter]
            res = agg.agg(*regrouped)
            if agg.finalize is not None:
                res = res if isinstance(res, tuple) else (res,)
                res = agg.finalize(*res)
            if isinstance(res, pd.Series):
                return res.iloc[0]
            return res

        # infer output dtypes by emulating on a small sample (the
        # reference's _emulate trick, _expr.py:4055) — one tiny job
        sample = (
            self._sdf().select(*keys, *{c for _, c, _ in aggs})
            .limit(50).toPandas()
        )
        key_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in self._sdf().schema.fields if f.name in keys
        )
        out_types = []
        for out, col, agg in aggs:
            try:
                val = run_one(sample, col, agg) if len(sample) else 0.0
            except Exception:
                val = 0.0
            import numpy as np
            if isinstance(val, (bool, np.bool_)):
                t = "boolean"
            elif isinstance(val, (int, np.integer)):
                t = "bigint"
            else:
                t = "double"
            out_types.append((out, t))
        schema = key_schema + ", " + ", ".join(f"`{o}` {t}" for o, t in out_types)

        def apply_fn(key, pdf):
            row = {k: [v] for k, v in zip(keys, key)}
            for out, col, agg in aggs:
                row[out] = [run_one(pdf, col, agg)]
            return pd.DataFrame(row)

        return DataFrame(
            self._sdf().groupBy(*keys).applyInPandas(apply_fn, schema=schema)
        )

    def _simple(self, fn: str, numeric_only: bool = True) -> DataFrame:
        value_cols = [c for c in self._frame.columns if c not in self._by]
        if numeric_only and fn not in ("count", "first", "last", "min", "max"):
            numeric = {
                f.name for f in self._frame._sdf.schema.fields
                if f.dataType.simpleString() in
                ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")
                or f.dataType.simpleString().startswith("decimal")
            }
            value_cols = [c for c in value_cols if c in numeric]
        return self.agg({c: fn for c in value_cols})

    def aggregate(self, spec=None, **named) -> DataFrame:
        return self.agg(spec, **named)

    def sum(self): return self._simple("sum")
    def mean(self): return self._simple("mean")
    def min(self): return self._simple("min")
    def max(self): return self._simple("max")
    def count(self): return self._simple("count")
    def var(self): return self._simple("var")
    def std(self): return self._simple("std")
    def first(self): return self._simple("first")
    def last(self): return self._simple("last")
    def median(self): return self._simple("median")

    def size(self) -> DataFrame:
        agged = self._sdf().groupBy(*self._by).agg(
            F.count(F.lit(1)).alias("size"))
        if self._unobserved and self._mode == "groupby":
            agged = self._expand_unobserved(agged, {"size": "size"})
        return self._finish(agged)

    def nunique(self) -> DataFrame:
        value_cols = [c for c in self._frame.columns if c not in self._by]
        return self.agg({c: "nunique" for c in value_cols})

    def idxmax(self, value_col: str, index_col: str) -> DataFrame:
        """per-group index of the max value (reference: IdxMax via ACA,
        _groupby.py:1460). ONE ordinary aggregation (partial + final —
        no window, no second join): min of struct(-value, index), so
        ties resolve to the smallest index, matching Series.idxmax.
        value_col must be numeric (negation is the tie-break trick)."""
        pair = F.min(F.struct((-F.col(value_col)).alias("nv"),
                              F.col(index_col).alias("i")))
        return DataFrame(
            self._grouped().agg(pair.getField("i").alias(f"idxmax_{value_col}"))
        )

    def idxmin(self, value_col: str, index_col: str) -> DataFrame:
        """reference: IdxMin, _groupby.py:1466; ties → smallest index."""
        pair = F.min(F.struct(F.col(value_col).alias("v"),
                              F.col(index_col).alias("i")))
        return DataFrame(
            self._grouped().agg(pair.getField("i").alias(f"idxmin_{value_col}"))
        )

    def apply(self, func: Callable, schema) -> DataFrame:
        """Full-group UDF — exact analogue of the reference's
        GroupByApply (_groupby.py:872) via grouped-map Pandas UDF."""
        self._no_unobserved("apply")
        return DataFrame(self._sdf().groupBy(*self._by).applyInPandas(func, schema))

    def transform(self, spec, suffix: str = "_t") -> DataFrame:
        """group aggregate broadcast back onto every row (reference:
        GroupByTransform, _groupby.py:1027) — a window aggregate over
        the group keys: no second join, one shuffle. spec: a function
        name applied to every value column (pandas str form) or
        {col: fn}."""
        self._no_unobserved("transform")
        if isinstance(spec, str):
            spec = {c: spec for c in self._frame.columns
                    if c not in self._by}
        w = Window.partitionBy(*self._by)
        exprs = {}
        for col, fn in spec.items():
            exprs[f"{col}{suffix}"] = _agg_expr(fn, col).over(w)
        return self._frame._wrap(self._sdf().withColumns(exprs))

    @property
    def ngroups(self) -> Scalar:
        """number of distinct groups, lazily (pandas GroupBy.ngroups)."""
        return Scalar(self._sdf().select(*self._by).distinct()
                      .agg(F.count(F.lit(1)).alias("ngroups")))

    def get_group(self, value) -> DataFrame:
        """reference: get_group, _groupby.py:1095."""
        if len(self._by) == 1:
            cond = F.col(self._by[0]) == value
        else:
            vals = value if isinstance(value, (list, tuple)) else [value]
            cond = None
            for k, v in zip(self._by, vals):
                c = F.col(k) == v
                cond = c if cond is None else (cond & c)
        return self._frame._wrap(self._sdf().filter(cond))

    def head(self, n: int = 5, order_by: str | None = None) -> DataFrame:
        """reference: groupby head, _groupby.py:858."""
        frame = self._frame
        order = order_by or (frame._index_cols[0] if frame._index_cols else None)
        if order is None:
            raise ValueError("groupby.head needs an order column")
        w = Window.partitionBy(*self._by).orderBy(F.col(order))
        sdf = (
            self._sdf().withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= n).drop("__rn__")
        )
        return frame._wrap(sdf)

    def shift(self, periods: int = 1, order_by: str | None = None) -> DataFrame:
        frame = self._frame
        order = order_by or (frame._index_cols[0] if frame._index_cols else None)
        if order is None:
            raise ValueError("groupby.shift needs an order column")
        w = Window.partitionBy(*self._by).orderBy(F.col(order))
        cols = [c for c in frame.columns if c not in self._by and c != order]
        return frame._wrap(
            self._sdf().withColumns({c: F.lag(F.col(c), periods).over(w) for c in cols})
        )

    def pivot(self, col: str, values: Sequence[str] | None = None,
              agg=None, value_col: str | None = None) -> DataFrame:
        """reference: pivot_table, _reductions.py:655 — Spark-native
        groupBy().pivot(). Pass explicit `values` to avoid the extra
        distinct-scan job and keep output schema deterministic."""
        gdf = self._sdf().groupBy(*self._by).pivot(col, list(values) if values else None)
        if agg is None:
            out = gdf.count()
        elif isinstance(agg, str):
            out = gdf.agg(_agg_expr(agg, value_col))
        else:
            out = gdf.agg(agg(F.col(value_col)))
        return DataFrame(out)

    def rank(self, order_by: str, method: str = "row_number",
             ascending: bool = True, out: str = "rank") -> DataFrame:
        """ranking inside groups (absent in the reference — SURVEY.md
        §2.6 notes it's free via Spark Window)."""
        o = F.col(order_by).asc() if ascending else F.col(order_by).desc()
        w = Window.partitionBy(*self._by).orderBy(o)
        fn = {"row_number": F.row_number, "rank": F.rank,
              "dense_rank": F.dense_rank}[method]
        return self._frame._wrap(self._sdf().withColumn(out, fn().over(w)))

    def diff(self, periods: int = 1, order_by: str | None = None) -> DataFrame:
        frame = self._frame
        order = order_by or (frame._index_cols[0] if frame._index_cols else None)
        if order is None:
            raise ValueError("groupby.diff needs an order column")
        w = Window.partitionBy(*self._by).orderBy(F.col(order))
        numeric = {
            f.name for f in frame._sdf.schema.fields
            if f.dataType.simpleString() in ("int", "bigint", "double", "float")
        }
        cols = [c for c in frame.columns
                if c not in self._by and c != order and c in numeric]
        return frame._wrap(
            self._sdf().withColumns(
                {c: F.col(c) - F.lag(F.col(c), periods).over(w) for c in cols}
            )
        )

    def _ordered(self, order_by: str | None, what: str):
        frame = self._frame
        order = order_by or (frame._index_cols[0] if frame._index_cols else None)
        if order is None:
            raise ValueError(f"groupby.{what} needs an order column")
        return order, Window.partitionBy(*self._by).orderBy(F.col(order))

    def _numeric_value_cols(self, order: str) -> list[str]:
        numeric = {
            f.name for f in self._frame._sdf.schema.fields
            if f.dataType.simpleString() in ("int", "bigint", "double", "float")
        }
        return [c for c in self._frame.columns
                if c not in self._by and c != order and c in numeric]

    def _cum(self, agg_fn, order_by: str | None, what: str) -> DataFrame:
        order, w = self._ordered(order_by, what)
        w = w.rowsBetween(Window.unboundedPreceding, 0)
        cols = self._numeric_value_cols(order)
        # pandas null-masking: a null INPUT row yields a null result but
        # does not break the running aggregate for later rows (window
        # aggs already skip nulls; the mask restores the null position —
        # same contract as the ungrouped ordered.cumulative path)
        return self._frame._wrap(
            self._sdf().withColumns(
                {c: F.when(F.col(c).isNotNull(),
                           agg_fn(F.col(c)).over(w)) for c in cols}
            )
        )

    def cumsum(self, order_by: str | None = None) -> DataFrame:
        return self._cum(F.sum, order_by, "cumsum")

    def cumprod(self, order_by: str | None = None) -> DataFrame:
        """reference: GroupBy cumprod, _groupby.py:1575 — F.product
        window, JVM-side."""
        return self._cum(F.product, order_by, "cumprod")

    def cummax(self, order_by: str | None = None) -> DataFrame:
        return self._cum(F.max, order_by, "cummax")

    def cummin(self, order_by: str | None = None) -> DataFrame:
        return self._cum(F.min, order_by, "cummin")

    def cumcount(self, order_by: str | None = None) -> DataFrame:
        """0-based position within group (reference: cumcount,
        _groupby.py:1582)."""
        order, w = self._ordered(order_by, "cumcount")
        return self._frame._wrap(
            self._sdf().withColumn("cumcount", F.row_number().over(w) - 1)
        )

    def ffill(self, order_by: str | None = None) -> DataFrame:
        """per-group forward fill (reference: GroupBy bfill/ffill,
        _groupby.py:1623)."""
        order, w = self._ordered(order_by, "ffill")
        w = w.rowsBetween(Window.unboundedPreceding, 0)
        cols = [c for c in self._frame.columns
                if c not in self._by and c != order]
        return self._frame._wrap(
            self._sdf().withColumns(
                {c: F.last(F.col(c), ignorenulls=True).over(w) for c in cols})
        )

    def bfill(self, order_by: str | None = None) -> DataFrame:
        order, w = self._ordered(order_by, "bfill")
        w = w.rowsBetween(0, Window.unboundedFollowing)
        cols = [c for c in self._frame.columns
                if c not in self._by and c != order]
        return self._frame._wrap(
            self._sdf().withColumns(
                {c: F.first(F.col(c), ignorenulls=True).over(w) for c in cols})
        )

    def tail(self, n: int = 5, order_by: str | None = None) -> DataFrame:
        """last n rows per group by order (reference: groupby tail,
        _groupby.py:864) — reverse row_number, no global sort."""
        order, _ = self._ordered(order_by, "tail")
        w = Window.partitionBy(*self._by).orderBy(F.col(order).desc())
        sdf = (
            self._sdf().withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= n).drop("__rn__")
        )
        return self._frame._wrap(sdf)

    def prod(self) -> DataFrame:
        return self._simple("prod")

    product = prod

    def corr(self, col_x: str, col_y: str) -> DataFrame:
        """per-group Pearson correlation (reference: GroupBy corr,
        _groupby.py:1540)."""
        return DataFrame(self._grouped().agg(
            F.corr(F.col(col_x), F.col(col_y)).alias(f"corr_{col_x}_{col_y}")))

    def cov(self, col_x: str, col_y: str) -> DataFrame:
        return DataFrame(self._grouped().agg(
            F.covar_samp(F.col(col_x), F.col(col_y)).alias(f"cov_{col_x}_{col_y}")))

    def value_counts(self, col: str) -> DataFrame:
        """reference: GroupBy value_counts, _groupby.py:1352 — one
        groupBy over (keys + col)."""
        return DataFrame(
            self._sdf().groupBy(*self._by, col)
            .agg(F.count(F.lit(1)).alias("count"))
        )

    def unique(self, col: str) -> DataFrame:
        """distinct values per group as an array (reference: unique via
        agg, _groupby.py:1335) — collect_set with a deterministic sort."""
        return DataFrame(self._grouped().agg(
            F.array_sort(F.collect_set(F.col(col))).alias(f"unique_{col}")))


# --------------------------------------------------------------------------
# module-level constructors / combinators
# --------------------------------------------------------------------------

def from_spark(sdf: SparkDF, index_cols: Sequence[str] = (),
               known_sorted: bool = False) -> DataFrame:
    return DataFrame(sdf, index_cols, known_sorted)


def concat(frames: Sequence[DataFrame], join: str = "outer", axis: int = 0) -> DataFrame:
    """axis=0 union (reference: Concat, _concat.py:25); axis=1 aligns
    frames on their index columns (reference: ConcatIndexed,
    _concat.py:344) via a fold of index equi-joins — outer join keeps
    every index value (missing → null), inner keeps the intersection.
    Each join shuffles on the shared index key, so Catalyst plans one
    exchange per frame and reuses the partitioning across the fold.
    """
    if not frames:
        raise ValueError("no frames")
    if join not in ("inner", "outer"):
        # reference: test_concat.py test_invalid_joins — only these two
        raise ValueError(f"'join' must be 'inner' or 'outer', got {join!r}")
    import pandas as pd
    if any(isinstance(f, (pd.DataFrame, pd.Series)) for f in frames):
        # reference: concat accepts raw pandas objects mixed in
        # (test_concat.py:36) — convert against the first facade
        # frame's session
        anchor = next(f for f in frames if isinstance(f, FrameBase))
        from .sources.io import from_pandas as _fp
        spark = anchor._sdf.sparkSession
        frames = [
            _fp(spark, f.to_frame() if isinstance(f, pd.Series) else f)
            if isinstance(f, (pd.DataFrame, pd.Series)) else f
            for f in frames
        ]
    if axis == 1:
        idx = frames[0]._index_cols
        if not idx:
            raise ValueError("concat(axis=1) needs indexed frames (set_index)")
        how = "inner" if join == "inner" else "full_outer"
        out = frames[0]._sdf
        seen = set(out.columns)
        for f in frames[1:]:
            if list(f._index_cols) != list(idx):
                raise ValueError(
                    f"concat(axis=1) index mismatch: {f._index_cols} vs {idx}"
                )
            dup = [c for c in f._sdf.columns if c in seen and c not in idx]
            if dup:
                raise ValueError(f"concat(axis=1) duplicate columns {dup}")
            seen |= set(f._sdf.columns)
            # coalesce the index key so outer-join nulls don't split it
            out = out.join(f._sdf, on=list(idx), how=how)
        # the equi-joins shuffle-hash the rows; global range order is NOT
        # preserved, so never inherit _known_sorted from the inputs
        return DataFrame(out, tuple(idx), False)
    sdfs = [f._sdf for f in frames]
    if join == "inner":
        common = set(sdfs[0].columns)
        for s in sdfs[1:]:
            common &= set(s.columns)
        keep = [c for c in sdfs[0].columns if c in common]
        sdfs = [s.select(*keep) for s in sdfs]
        out = sdfs[0]
        for s in sdfs[1:]:
            out = out.unionByName(s)
    else:
        out = sdfs[0]
        for s in sdfs[1:]:
            out = out.unionByName(s, allowMissingColumns=True)
    return DataFrame(out)


# --------------------------------------------------------------------------
# module-level API (reference: module functions in _collection.py — users
# call dask_expr.merge / melt / to_datetime etc. as free functions)
# --------------------------------------------------------------------------


def isna(obj):
    """reference: isna (_collection.py:5583)."""
    return obj.isna()


def melt(frame: DataFrame, id_vars, value_vars, var_name: str = "variable",
         value_name: str = "value") -> DataFrame:
    """reference: melt (_collection.py:5588)."""
    return frame.melt(id_vars, value_vars, var_name=var_name, value_name=value_name)


def pivot_table(frame: DataFrame, index, columns: str, values, aggfunc: str = "mean",
                column_values=None) -> DataFrame:
    """reference: pivot_table (_collection.py:6054)."""
    return frame.pivot_table(index, columns, values, aggfunc=aggfunc,
                             column_values=column_values)


def repartition(frame: DataFrame, npartitions: int, *cols: str) -> DataFrame:
    """reference: repartition (_collection.py:6011)."""
    return frame.repartition(npartitions, *cols)


def map_partitions(func: Callable, frame: DataFrame, *others,
                   schema=None) -> DataFrame:
    """reference: map_partitions (_collection.py:6179; multi-frame form
    _expr.py:580 — func(df1, df2, ...) over co-partitioned frames).
    The schema may be passed as the last positional argument
    (single-frame form) or via schema=.

    Multi-frame Spark shape: the frames are co-located by a full-outer
    index equi-join (the engine's co-alignment rule — the reference
    instead requires equal divisions), then ONE mapInPandas splits each
    Arrow batch back into per-frame slices and calls func. Columns keep
    their frame-local names; a duplicate non-index name across frames
    is an error (same restriction as concat(axis=1))."""
    if others and not isinstance(others[-1], DataFrame):
        if schema is not None:
            raise TypeError("schema given both positionally and by keyword")
        schema, others = others[-1], others[:-1]
    if schema is None:
        raise TypeError("map_partitions requires schema")
    if not others:
        return frame.map_partitions(func, schema)
    idx = list(frame._index_cols)
    if not idx:
        raise ValueError(
            "multi-frame map_partitions needs indexed frames (set_index)"
        )
    frames = [frame, *others]
    colsets = []
    joined = None
    seen = set(idx)
    for f in frames:
        if list(f._index_cols) != idx:
            raise ValueError(
                f"map_partitions index mismatch: {f._index_cols} vs {idx}"
            )
        data_cols = [c for c in f._sdf.columns if c not in idx]
        dup = [c for c in data_cols if c in seen]
        if dup:
            raise ValueError(f"duplicate columns across frames: {dup}")
        seen |= set(data_cols)
        colsets.append(data_cols)
        joined = f._sdf if joined is None else joined.join(
            f._sdf, on=idx, how="full"
        )

    def split_call(it):
        for pdf in it:
            parts = [pdf[idx + cs] for cs in colsets]
            yield func(*parts)

    return DataFrame(joined.mapInPandas(split_call, schema=schema), idx, False)


def map_overlap(func: Callable, frame: DataFrame, schema, order_col: str,
                before: float, after: float, **kw) -> DataFrame:
    """reference: map_overlap (_collection.py:6247)."""
    return frame.map_overlap(func, schema, order_col, before, after, **kw)


def elemwise(op: Callable, *args, name: str | None = None) -> Series:
    """apply an elementwise Column function across Series/scalars
    (reference: elemwise, _collection.py:6383). All Series operands must
    share an anchor frame (the reference requires co-alignment)."""
    sers = [a for a in args if isinstance(a, Series)]
    if not sers:
        raise ValueError("elemwise needs at least one Series operand")
    anchor = sers[0]
    for s in sers[1:]:
        if s._anchor is not anchor._anchor:
            raise ValueError("elemwise operands must share an anchor frame")
    cols = [a._scol if isinstance(a, Series) else F.lit(a) for a in args]
    out_name = name or anchor._name
    return anchor._new(op(*cols).alias(out_name), out_name)


def to_datetime(s: Series, format: str | None = None, unit: str | None = None) -> Series:
    """reference: ToDatetime (_expr.py:1459). Strings parse via
    to_timestamp; numerics need an epoch unit ('s'/'ms')."""
    if unit is not None:
        factor = {"s": 1, "ms": 1_000, "us": 1_000_000}[unit]
        return s._new(F.timestamp_micros((s._scol.cast("double") * (1_000_000 // factor)).cast("long")), s._name)
    if format is not None:
        return s._new(F.to_timestamp(s._scol, format), s._name)
    return s._new(F.to_timestamp(s._scol), s._name)


def to_numeric(s: Series, errors: str = "raise") -> Series:
    """reference: ToNumeric (_expr.py:1440). ANSI cast raises on
    malformed input at execution (pandas errors='raise'); try_cast
    yields null (errors='coerce')."""
    if errors == "coerce":
        return s._new(s._scol.try_cast("double"), s._name)
    return s._new(s._scol.cast("double"), s._name)


def to_timedelta(s: Series, unit: str = "s") -> Series:
    """reference: to_timedelta (_collection.py:6168) → DayTimeInterval
    via make_dt_interval (SURVEY §2.2 mapping)."""
    factor = {"d": 86400.0, "h": 3600.0, "m": 60.0, "s": 1.0,
              "ms": 1e-3, "us": 1e-6}[unit]
    secs = (s._scol.cast("double") * factor).cast("decimal(27,9)")
    return s._new(F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs), s._name)
