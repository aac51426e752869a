"""Mergeable frequency sketches for high-cardinality columns
(training-pipeline extension; no reference analogue — dask-expr's
value_counts (_reductions.py) always shuffles the full distinct
domain).

At 100 TB a token / url / key column can hold billions of distinct
values; `groupBy(col).count()` shuffles that entire domain just to
find the handful of frequent ones.  `heavy_hitters` runs the classic
two-pass plan instead: a map-only Misra-Gries summary bounds the
candidate set to ceil(1/phi) values per partition, and a second scan
recounts only those candidates — both passes shuffle at most a few
thousand rows regardless of the domain size, and the result is EXACT
(guaranteed superset at pass 1, exact counts + exact threshold at
pass 2), so it oracles against plain `GROUP BY ... HAVING`.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitters(df: DataFrame, col: str, phi: float,
                  candidates_per_partition: int | None = None) -> DataFrame:
    """All values of `col` whose frequency strictly exceeds
    ``phi * n`` (n = number of non-null values), with EXACT counts.
    Returns a DataFrame ``(value, freq)``.

    Plan (two scans, no wide shuffle):

    - pass 1 — map-only, Arrow-batched ``mapInPandas``: each partition
      keeps a Misra-Gries summary with ``m = ceil(1/phi)`` counters
      (pandas value_counts per batch, merged into the summary; when the
      summary exceeds m entries, the (m+1)-th largest count is
      subtracted from every counter and non-positive entries dropped —
      the standard mergeable reduction, total decrement ≤ n_p/m).
      Guarantee by pigeonhole: if a value's GLOBAL frequency exceeds
      phi·n = n/m then in at least one partition its local frequency
      exceeds n_p/m, so it survives that partition's summary.  The
      union of partition summaries is therefore a superset of every
      global heavy hitter.  Each partition also emits one marker row
      carrying its non-null row count so the total n needs no extra
      scan.
    - pass 2 — exact recount restricted to the candidates: candidates
      and total n are folded into one single-row aggregate, exploded,
      and broadcast as an equality-join filter (≡ semi join, keys are
      distinct — and n rides along to the HAVING filter for free); the
      surviving rows are counted per value (map-side partial
      aggregation collapses them before the tiny exchange) — no
      driver-side action and no cached intermediate anywhere.

    False positives from pass 1 are removed by pass 2's exact filter;
    false negatives cannot occur (the superset guarantee), so the
    output equals ``GROUP BY col HAVING count(*) > phi * n`` exactly.

    NULLs are ignored (they are not a "value"); n counts non-nulls.
    `candidates_per_partition` overrides m for a wider pass-1 net
    (never needed for correctness — only if you want the pass-1
    summary reusable at a smaller phi).  It is clamped to at least
    ceil(1/phi): a smaller m would void pass 1's superset guarantee
    and silently break the EXACT contract.
    """
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    m = max(candidates_per_partition or 0, math.ceil(1.0 / phi))
    spark_type = df.schema[col].dataType
    # reserved-ish names so a source column called "val"/"n_part"
    # can't alias into the candidate join (the summary frame never
    # meets the source frame except through the semi-join condition)
    out_schema = T.StructType([
        T.StructField("__hh_val", spark_type),
        T.StructField("__hh_n", T.LongType()),
    ])

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        n_part = 0
        for pdf in batches:
            s = pdf[col].dropna()
            n_part += len(s)
            vc = s.value_counts()
            counters = (
                vc if counters.empty
                else pd.concat([counters, vc]).groupby(level=0).sum()
            )
            if len(counters) > m:
                # subtract the (m+1)-th largest count from everything;
                # ≤ m entries stay strictly positive
                t = counters.nlargest(m + 1).iloc[-1]
                counters = counters - t
                counters = counters[counters > 0]
        out = pd.DataFrame({"__hh_val": counters.index, "__hh_n": 0})
        marker = pd.DataFrame({"__hh_val": [None], "__hh_n": [n_part]})
        yield pd.concat([out, marker], ignore_index=True)

    summary = df.select(col).mapInPandas(_mg, schema=out_schema)
    # fold candidates + total into ONE single-row aggregate so the
    # summary subtree has exactly one consumer — no cache to leak
    # (round-5 advice: the old two-consumer .cache() pinned executor
    # storage for the session) and still one pass-1 scan per action.
    # collect_set drops the null marker values; the total sums the
    # marker rows (candidate rows carry __hh_n = 0).
    one = summary.agg(
        F.collect_set("__hh_val").alias("__hh_keys"),
        F.sum("__hh_n").alias("__hh_total"))
    keys = one.select(F.explode("__hh_keys").alias("__hh_val"),
                      "__hh_total")
    # inner broadcast join ≡ semi join (keys are distinct) but lets the
    # total ride along to the HAVING filter without a second consumer
    exact = (
        df.join(F.broadcast(keys), df[col] == F.col("__hh_val"), "inner")
        .groupBy(col, "__hh_total")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        exact.where(F.col("freq") > F.lit(float(phi)) * F.col("__hh_total"))
        .select(F.col(col).alias("value"), "freq")
    )


def hll_rollup(df: DataFrame, keys: list[str], col: str,
               lg_k: int = 12) -> DataFrame:
    """Pre-aggregated MERGEABLE distinct-count sketch table: one
    Datasketches HLL sketch (binary column ``hll``) per key group.

    The 100 TB pattern this enables: materialize the rollup ONCE at
    the finest slicing you'll ever query (e.g. per day × source), then
    answer "distinct users over any subset of slices" from the sketch
    table alone — a union-agg over a few thousand binary rows — never
    rescanning the raw corpus.  Plain ``count(DISTINCT)`` can't do
    this because exact distinct counts don't merge; sketches do.
    lg_k=12 → ~2.5% relative standard error at ~4 KB per sketch.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("hll"))


def hll_estimate(rollup: DataFrame, group_keys: list[str] | None = None) -> DataFrame:
    """Merge a sketch rollup down to `group_keys` (None = one global
    row) and estimate the distinct count (``distinct_est``).  Pure
    sketch-union — cost is proportional to the ROLLUP's row count, not
    the raw data."""
    if group_keys:
        merged = rollup.groupBy(*group_keys).agg(
            F.hll_union_agg(F.col("hll")).alias("hll"))
    else:
        merged = rollup.agg(F.hll_union_agg(F.col("hll")).alias("hll"))
    return merged.withColumn(
        "distinct_est", F.hll_sketch_estimate(F.col("hll")).cast("long")
    ).drop("hll")


def hist_rollup(df: DataFrame, keys: list[str], col: str, bins: int = 128,
                lo: float | None = None, hi: float | None = None) -> DataFrame:
    """Mergeable QUANTILE rollup: per key group, an equi-width histogram
    of `col` over [lo, hi] as a ``hist`` map<int,bigint> (bin → count)
    plus ``lo``/``hi``/``bins`` metadata columns.  Histograms merge by
    bin-count addition, so quantiles over ANY union of slices come from
    the rollup alone (quantile_estimate) with error bounded by one bin
    width — the percentile companion to hll_rollup (exact percentiles,
    like exact distincts, don't merge; histograms do).

    Completes the mergeable sketch-table trio for 100 TB slice
    analytics: distinct counts (hll_rollup), frequent values
    (heavy_hitters), and now quantiles.

    If lo/hi are omitted, one column-pruned min/max pass fixes the
    domain (a 2-value driver round-trip — the same bounded class as
    the ordered ops' bucket sampling).  Values outside [lo, hi] clamp
    into the edge bins; NULLs are skipped.  Plan: one groupBy on
    (keys, bin) with map-side partial counts, then a tiny (keys)-level
    map assembly."""
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        row = df.where(c.isNotNull()).agg(
            F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
        if row["lo"] is None or row["hi"] is None:
            raise ValueError(
                f"hist_rollup: column {col!r} has no non-null values, "
                "so lo/hi cannot be inferred — pass explicit bounds")
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if not hi > lo:
        hi = lo + 1.0  # degenerate domain: everything lands in bin 0
    width = (hi - lo) / bins
    bin_ = F.least(F.lit(bins - 1), F.greatest(
        F.lit(0), F.floor((c - F.lit(lo)) / F.lit(width)).cast("int")))
    per_bin = (df.where(c.isNotNull())
               .groupBy(*keys, bin_.alias("__bin"))
               .agg(F.count(F.lit(1)).alias("__cnt")))
    return (per_bin.groupBy(*keys)
            .agg(F.map_from_entries(
                F.array_sort(F.collect_list(
                    F.struct(F.col("__bin"), F.col("__cnt"))))).alias("hist"))
            .withColumn("lo", F.lit(float(lo)))
            .withColumn("hi", F.lit(float(hi)))
            .withColumn("bins", F.lit(int(bins))))


def quantile_estimate(rollup: DataFrame, q: float,
                      group_keys: list[str] | None = None) -> DataFrame:
    """Merge a hist_rollup down to `group_keys` (None = one global row)
    and estimate the q-quantile (``q_est``): bin counts are summed
    across slices, the target rank's bin located, and the value
    linearly interpolated inside it — error ≤ one bin width.  Cost is
    proportional to the ROLLUP's rows × bins, never the raw data."""
    exploded = rollup.select(
        *(group_keys or []), "lo", "hi", "bins",
        F.explode(F.col("hist")).alias("__bin", "__cnt"))
    merged = exploded.groupBy(*(group_keys or []), "lo", "hi", "bins",
                              "__bin").agg(F.sum("__cnt").alias("__cnt"))
    gw = (group_keys or []) + ["lo", "hi", "bins"]
    from pyspark.sql.window import Window
    w = Window.partitionBy(*gw).orderBy("__bin")
    cum = merged.withColumn("__cum", F.sum("__cnt").over(w)) \
                .withColumn("__tot", F.sum("__cnt").over(
                    Window.partitionBy(*gw)))
    target = F.lit(float(q)) * F.col("__tot")
    hit = (cum.where(F.col("__cum") >= target)
           .groupBy(*gw).agg(
               F.min_by(F.struct("__bin", "__cnt", "__cum"), F.col("__bin"))
               .alias("__h"),
               F.first("__tot").alias("__tot")))
    width = (F.col("hi") - F.col("lo")) / F.col("bins")
    frac = ((F.lit(float(q)) * F.col("__tot")
             - (F.col("__h.__cum") - F.col("__h.__cnt")))
            / F.col("__h.__cnt").cast("double"))
    est = (F.col("lo") + (F.col("__h.__bin") + frac) * width)
    return hit.select(*(group_keys or []),
                      est.alias("q_est"))


def psi_drift(roll_a: DataFrame, roll_b: DataFrame,
              group_keys: list[str] | None = None,
              eps: float = 1e-6) -> DataFrame:
    """Population Stability Index between two hist_rollup tables with
    the SAME (lo, hi, bins) domain — the standard train/serve or
    day-over-day distribution-drift score, answered from the sketch
    tables alone (raw data never re-read; the drift companion to
    quantile_estimate).

    Bin counts on each side merge by addition (fragment rollups fine),
    normalize to shares, and PSI = Σ (p_a − p_b)·ln(p_a / p_b) over
    bins with `eps` flooring for empty bins.  Rule-of-thumb reading:
    < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift.
    Returns (group_keys…, psi, n_a, n_b)."""
    gk = list(group_keys or [])

    def merged(roll, tag):
        return (roll.select(*gk, "lo", "hi", "bins",
                            F.explode("hist").alias("__bin", "__cnt"))
                .groupBy(*gk, "lo", "hi", "bins", "__bin")
                .agg(F.sum("__cnt").alias(f"__c{tag}")))

    a = merged(roll_a, "a")
    b = merged(roll_b, "b")
    from pyspark.sql.window import Window

    j = a.join(b, gk + ["lo", "hi", "bins", "__bin"], "full_outer") \
        .fillna({"__ca": 0, "__cb": 0})
    w = Window.partitionBy(*(gk + ["lo", "hi", "bins"]))
    j = (j.withColumn("__na", F.sum("__ca").over(w))
         .withColumn("__nb", F.sum("__cb").over(w)))
    pa = F.greatest(F.col("__ca") / F.col("__na"), F.lit(float(eps)))
    pb = F.greatest(F.col("__cb") / F.col("__nb"), F.lit(float(eps)))
    term = (pa - pb) * F.log(pa / pb)
    return (j.groupBy(*gk)
            .agg(F.sum(term).alias("psi"),
                 F.first("__na").alias("n_a"),
                 F.first("__nb").alias("n_b"))
            .select(*gk, "psi",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b")))
