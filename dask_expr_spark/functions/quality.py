"""Data-quality operators for training-data pipelines: one-pass table
profiling and declarative constraint validation (the deequ/
great-expectations niche, re-expressed as plain Spark aggregates —
training-pipeline extension; no reference analogue).

Scale shape: profile_table is ONE aggregation job regardless of how
many columns it profiles (every per-column statistic is an expression
in a single agg — map-side partial aggregation, one tiny exchange);
validate() is one aggregation for all row-level checks plus one
distinct-count per uniqueness key set.  Nothing is per-column jobs, so
profiling a 500-column table costs one scan, not 500.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  quantiles: tuple = (0.25, 0.5, 0.75),
                  exact_distinct: bool = False,
                  relative_error: float = 0.01) -> DataFrame:
    """Tidy per-column profile: one row per column with
    (column, dtype, n, nulls, distinct, min_val, max_val, mean,
    stddev, q25, q50, q75 …; quantile columns are named
    q{percent:g}) — numeric-only statistics are NULL for other types;
    min/max are string-rendered so mixed types share one schema.

    distinct is HLL-approximate by default (the 100 TB path; exact
    count-distinct per column would shuffle each column's domain);
    pass exact_distinct=True when the domain is known small or an
    exact audit is required.  Quantiles are approx_percentile at
    `relative_error` (set 0.0 for exact).  ONE aggregation job for the
    whole profile."""
    cols = columns or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__pt_n")]
    for c in cols:
        dt = df.schema[c].dataType
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__pt_nul_{c}"))
        aggs.append(
            (F.count_distinct(col) if exact_distinct
             else F.approx_count_distinct(col, relative_error))
            .alias(f"__pt_dst_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__pt_min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__pt_max_{c}"))
        if isinstance(dt, _NUMERIC):
            d = col.cast("double")
            aggs.append(F.avg(d).alias(f"__pt_avg_{c}"))
            aggs.append(F.stddev_samp(d).alias(f"__pt_std_{c}"))
            for qi, q in enumerate(quantiles):
                aggs.append(
                    F.percentile_approx(
                        d, float(q),
                        F.lit(2147483647 if relative_error <= 0
                              else max(2, int(1.0 / relative_error))))
                    .alias(f"__pt_qi{qi}_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__pt_avg_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__pt_std_{c}"))
            for qi, _q in enumerate(quantiles):
                aggs.append(F.lit(None).cast("double")
                            .alias(f"__pt_qi{qi}_{c}"))
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        entry = [F.lit(c).alias("column"), F.lit(dt).alias("dtype"),
                 F.col("__pt_n").alias("n"),
                 F.col(f"__pt_nul_{c}").alias("nulls"),
                 F.col(f"__pt_dst_{c}").cast("long").alias("distinct"),
                 F.col(f"__pt_min_{c}").alias("min_val"),
                 F.col(f"__pt_max_{c}").alias("max_val"),
                 F.col(f"__pt_avg_{c}").alias("mean"),
                 F.col(f"__pt_std_{c}").alias("stddev")]
        entry += [F.col(f"__pt_qi{qi}_{c}").alias(f"q{100 * q:g}")
                  for qi, q in enumerate(quantiles)]
        rows.append(F.struct(*entry))
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def profile_from_rollups(moments: DataFrame,
                         hist: DataFrame | None = None,
                         hll: DataFrame | None = None,
                         group_keys: list[str] | None = None,
                         quantiles: tuple = (0.25, 0.5, 0.75)) -> DataFrame:
    """profile_table's statistics WITHOUT rescanning the raw table —
    answered from the persisted mergeable rollups alone (the
    sketch-once-slice-forever completion: at 100 TB the rollup tables
    are maintained incrementally by the streaming sinks, and the
    profile of any slice union costs rollup-rows, not table-bytes).

    Inputs are the three rollup tables for ONE column at any finer
    slicing than `group_keys`:
    - `moments` (sketches.moments_rollup): n, nulls (n_rows − n),
      mean, stddev, min_val, max_val — exact under merging;
    - `hist` (sketches.hist_rollup, optional): q{percent} quantile
      estimates, error ≤ one bin width;
    - `hll` (sketches.hll_rollup, optional): distinct estimate — build
      it over the column CAST TO STRING for fractional types
      (hll_sketch_agg accepts int/long/string/binary only).

    Returns one row per group: (group_keys…, n, nulls, distinct,
    min_val, max_val, mean, stddev, q25, q50, q75 …) — the
    profile_table column layout, minus the per-column explode (this is
    the one-column incremental path; call once per profiled column).
    Joins are on the group keys (or a 1-row equi-key when ungrouped —
    a broadcast hash join, not a cartesian)."""
    from .sketches import hll_estimate, moments_merge, quantile_estimate

    gk = list(group_keys or [])
    jk = gk or ["__one"]

    def keyed(df: DataFrame) -> DataFrame:
        return df if gk else df.withColumn("__one", F.lit(1))

    m = moments_merge(moments, gk)
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) \
        / (F.col("n") - 1)
    out = keyed(m.select(
        *gk,
        F.col("n_rows").alias("n"),
        (F.col("n_rows") - F.col("n")).alias("nulls"),
        F.col("min_v").alias("min_val"),
        F.col("max_v").alias("max_val"),
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("stddev")))
    if hll is not None:
        d = keyed(hll_estimate(hll, gk)
                  .withColumnRenamed("distinct_est", "distinct"))
        out = out.join(d, jk)
    else:
        out = out.withColumn("distinct", F.lit(None).cast("long"))
    if hist is not None:
        for q in quantiles:
            qdf = keyed(quantile_estimate(hist, float(q), gk)
                        .withColumnRenamed("q_est", f"q{100 * q:g}"))
            out = out.join(qdf, jk)
    else:
        for q in quantiles:
            out = out.withColumn(f"q{100 * q:g}",
                                 F.lit(None).cast("double"))
    qcols = [f"q{100 * q:g}" for q in quantiles]
    return out.select(*gk, "n", "nulls", "distinct", "min_val",
                      "max_val", "mean", "stddev", *qcols)


def validate(df: DataFrame,
             row_checks: dict[str, Column] | None = None,
             complete: list[str] | None = None,
             unique: list[list[str] | str] | None = None) -> DataFrame:
    """Declarative constraint report: (check, passed, violations, n).

    - row_checks: {name: boolean Column} — a row VIOLATES when the
      condition is false or NULL (so ``col > 0`` also catches nulls,
      the usual audit intent; wrap with coalesce to opt out);
    - complete: columns that must be non-null;
    - unique: key column(s) (string or list) that must identify rows
      uniquely — violations counts the EXTRA rows beyond one per key.

    Plan: all row_checks + completeness fold into ONE aggregation;
    each uniqueness constraint is one count-distinct-style aggregate
    (n - distinct keys) in the same job via grouping-free exprs."""
    row_checks = dict(row_checks or {})
    for c in (complete or []):
        row_checks.setdefault(f"complete({c})", F.col(c).isNotNull())
    aggs = [F.count(F.lit(1)).alias("__pt_n")]
    names: list[str] = []
    for name, cond in row_checks.items():
        key = f"__v{len(names)}"
        aggs.append(F.count(
            F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(key))
        names.append(name)
    ukeys = []
    for u in (unique or []):
        kcols = [u] if isinstance(u, str) else list(u)
        key = f"__u{len(ukeys)}"
        aggs.append(
            (F.count(F.lit(1))
             - F.count_distinct(*[F.col(k) for k in kcols])).alias(key))
        ukeys.append("unique(" + ", ".join(kcols) + ")")
    one = df.agg(*aggs)
    entries = []
    for i, name in enumerate(names):
        entries.append(F.struct(
            F.lit(name).alias("check"),
            (F.col(f"__v{i}") == 0).alias("passed"),
            F.col(f"__v{i}").alias("violations"),
            F.col("__pt_n").alias("n")))
    for i, name in enumerate(ukeys):
        entries.append(F.struct(
            F.lit(name).alias("check"),
            (F.col(f"__u{i}") == 0).alias("passed"),
            F.col(f"__u{i}").alias("violations"),
            F.col("__pt_n").alias("n")))
    if not entries:
        raise ValueError("validate: no checks given")
    return one.select(F.explode(F.array(*entries)).alias("r")).select("r.*")
