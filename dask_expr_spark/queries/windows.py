"""Window / ordered-operation queries on the events table
(SURVEY.md §2.6: Shift/Diff/Cum*/Rolling/Resample, plus sessionization
and as-of join). DuckDB oracles use the identical window frames; sums
of doubles inside windows go through the decimal-exact cast (see
_util) because engines associate window sums differently.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import dec_sum, dec_sum_sql, tbl

# total order within a user: (ts, event_id) — ts alone can tie
_ORDER = ["ts", "event_id"]


def window_shift_diff(spark, sf_dir):
    """per-user lag + diff (reference: Shift _expr.py:3389,
    Diff :3292) then aggregate per event_type."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    sdf = ev.to_spark().withColumn(
        "dvalue",
        F.col("value").cast("decimal(27,6)")
        - F.lag(F.col("value").cast("decimal(27,6)")).over(w),
    )
    out = (
        sdf.groupBy("event_type")
        .agg(
            F.count("dvalue").alias("n_diffs"),
            F.sum(F.when(F.col("dvalue") > 0, 1).otherwise(0)).alias("n_up"),
            F.sum("dvalue").cast("double").alias("sum_diff"),
        )
        .orderBy("event_type")
    )
    return out


WINDOW_SHIFT_DIFF_SQL = """
WITH d AS (
  SELECT event_type,
         CAST(value AS DECIMAL(27,6))
           - lag(CAST(value AS DECIMAL(27,6)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dvalue
  FROM events
)
SELECT event_type,
       count(dvalue) AS n_diffs,
       CAST(sum(CASE WHEN dvalue > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(sum(dvalue) AS DOUBLE) AS sum_diff
FROM d GROUP BY event_type ORDER BY event_type
"""


def window_cumsum_user(spark, sf_dir):
    """running per-user total (reference: CumSum, _cumulative.py:11) —
    checked at the final row per user to keep output compact."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wfull = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    sdf = (
        ev.to_spark()
        .withColumn("running", F.sum(F.col("value").cast("decimal(27,6)")).over(w))
        .withColumn("__rn", F.row_number().over(wfull))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("running").cast("double").alias("final_running"),
        )
        .orderBy("user_id")
    )
    return sdf


WINDOW_CUMSUM_SQL = """
WITH r AS (
  SELECT user_id,
         sum(CAST(value AS DECIMAL(27,6)))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, CAST(running AS DOUBLE) AS final_running
FROM r WHERE rn = 1 ORDER BY user_id
"""


def window_rolling_mean(spark, sf_dir):
    """5-row rolling mean per user (reference: RollingMean,
    _rolling.py) — aggregated to per-user max to keep output small."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-4, 0)
    )
    sdf = (
        ev.to_spark()
        .withColumn(
            "rmean",
            F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double")
            / F.count("value").over(w),
        )
        .groupBy("user_id")
        .agg(
            F.max("rmean").alias("max_rmean"),
            F.min("rmean").alias("min_rmean"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )
    return sdf


WINDOW_ROLLING_SQL = """
WITH r AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(27,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
              / count(value)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rmean
  FROM events
)
SELECT user_id, max(rmean) AS max_rmean, min(rmean) AS min_rmean,
       count(*) AS n_events
FROM r GROUP BY user_id ORDER BY user_id
"""


def window_rank_latest(spark, sf_dir):
    """top-3 latest events per user via row_number (SURVEY.md §2.6 —
    ranking is a Spark-free extension over the reference)."""
    ev = tbl(spark, sf_dir, "events")
    res = (
        ev.groupby("user_id")
        .rank(order_by="event_id", ascending=False, out="rn")
        .filter(F.col("rn") <= 3)
    )
    out = (
        res.to_spark()
        .select("user_id", "event_id", "event_type", F.col("rn").cast("long").alias("rn"))
        .orderBy("user_id", "rn")
    )
    return out


WINDOW_RANK_SQL = """
SELECT user_id, event_id, event_type, rn FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn <= 3 ORDER BY user_id, rn
"""


def resample_hourly(spark, sf_dir):
    """time-bin regridding (reference: Resample*, _resample.py:23)."""
    ev = tbl(spark, sf_dir, "events")
    res = ev.resample("h", on="ts").agg(
        n=("value", "count"),
        total=("value", lambda c: dec_sum(c, 6)),
        vmin=("value", "min"),
        vmax=("value", "max"),
    )
    return res.sort_values("ts").to_spark()


RESAMPLE_SQL = f"""
SELECT date_trunc('hour', ts) AS ts,
       count(value) AS n,
       {dec_sum_sql('value', 6)} AS total,
       min(value) AS vmin, max(value) AS vmax
FROM events GROUP BY 1 ORDER BY 1
"""


def window_user_sessions(spark, sf_dir):
    """sessionization: >30-min gap starts a new session (greenfield
    streaming-adjacent op, SURVEY.md §2.10) — lag + cumulative sum."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    sdf = (
        ev.to_spark()
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.unix_micros(F.col("ts").cast("timestamp"))
                   - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                   > 1800 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(wcum))
    )
    out = (
        sdf.groupBy("user_id")
        .agg(
            F.max("sess_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )
    return out


SESSIONS_SQL = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM g
)
SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id
"""


def asof_purchase_click(spark, sf_dir):
    """merge_asof: for each purchase, the most recent prior-or-equal
    click of the same user (reference: MergeAsof, _merge_asof.py:17;
    ours is the union+window formulation in operators/asof.py).
    Output: per-user purchase count and total purchase→click gap."""
    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(ev.event_type == "purchase")[["user_id", "ts", "event_id"]]
    clicks = ev.filter(ev.event_type == "click")[["user_id", "ts"]]
    joined = purchases.merge_asof(
        clicks, on="ts", by="user_id", direction="backward",
        allow_exact_matches=True, right_cols=[], keep_match_on=True,
    )
    sdf = joined.to_spark().withColumn(
        "gap_s",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("ts_right").cast("timestamp")))
        / F.lit(1_000_000.0),
    )
    out = (
        sdf.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("gap_s").alias("n_matched"),
            F.sum(F.col("gap_s").cast("decimal(27,6)")).cast("double").alias("total_gap_s"),
        )
        .orderBy("user_id")
    )
    return out


ASOF_SQL = """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
     j AS (
       SELECT p.user_id, p.ts,
              (epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0 AS gap_s
       FROM p ASOF LEFT JOIN c
         ON p.user_id = c.user_id AND p.ts >= c.ts
     )
SELECT user_id, count(*) AS n_purchases, count(gap_s) AS n_matched,
       CAST(sum(CAST(gap_s AS DECIMAL(27,6))) AS DOUBLE) AS total_gap_s
FROM j GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "window_shift_diff": (window_shift_diff, WINDOW_SHIFT_DIFF_SQL),
    "window_cumsum_user": (window_cumsum_user, WINDOW_CUMSUM_SQL),
    "window_rolling_mean": (window_rolling_mean, WINDOW_ROLLING_SQL),
    "window_rank_latest": (window_rank_latest, WINDOW_RANK_SQL),
    "resample_hourly": (resample_hourly, RESAMPLE_SQL),
    "window_user_sessions": (window_user_sessions, SESSIONS_SQL),
    "asof_purchase_click": (asof_purchase_click, ASOF_SQL),
}


def window_ffill_gaps(spark, sf_dir):
    """forward-fill over nulls (reference: FFill, _expr.py:3340) —
    values of 'error' events masked to null, then last-observation
    carried forward per user; checked via per-user fill stats."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sdf = (
        ev.to_spark()
        .withColumn("v", F.when(F.col("event_type") != "error", F.col("value")))
        .withColumn("filled", F.last("v", ignorenulls=True).over(w))
    )
    return (
        sdf.groupBy("user_id")
        .agg(
            F.count("v").alias("n_obs"),
            F.count("filled").alias("n_filled"),
            F.sum(F.col("filled").cast("decimal(27,6)")).cast("double").alias("sum_filled"),
        )
        .orderBy("user_id")
    )


WINDOW_FFILL_SQL = """
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type <> 'error' THEN value END AS v
  FROM events
),
f AS (
  SELECT user_id, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
  FROM m
)
SELECT user_id, count(v) AS n_obs, count(filled) AS n_filled,
       CAST(sum(CAST(filled AS DECIMAL(27,6))) AS DOUBLE) AS sum_filled
FROM f GROUP BY user_id ORDER BY user_id
"""


QUERIES["window_ffill_gaps"] = (window_ffill_gaps, WINDOW_FFILL_SQL)


def rolling_time_window(spark, sf_dir):
    """time-based rolling: events in the trailing 30 minutes per user
    (reference: RollingReduction with freq window, _rolling.py:43) —
    rangeBetween on microseconds; checked via per-user max trailing
    count and decimal-exact trailing sum."""
    from ..operators.window import TimeRolling

    ev = tbl(spark, sf_dir, "events")
    tr = TimeRolling(ev, "30min", on="ts", partition_by="user_id")
    w = tr._w()
    sdf = (
        ev.to_spark()
        .withColumn("tcount", F.count("value").over(w))
        .withColumn(
            "tsum",
            F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double"),
        )
    )
    return (
        sdf.groupBy("user_id")
        .agg(
            F.max("tcount").alias("max_trailing_n"),
            F.max("tsum").alias("max_trailing_sum"),
        )
        .orderBy("user_id")
    )


ROLLING_TIME_SQL = """
WITH r AS (
  SELECT user_id,
         count(value) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS tcount,
         CAST(sum(CAST(value AS DECIMAL(27,6))) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS tsum
  FROM events
)
SELECT user_id, max(tcount) AS max_trailing_n, max(tsum) AS max_trailing_sum
FROM r GROUP BY user_id ORDER BY user_id
"""


QUERIES["rolling_time_window"] = (rolling_time_window, ROLLING_TIME_SQL)


def sliding_window_counts(spark, sf_dir):
    """sliding windows (1h window, 30min slide): each event lands in 2
    overlapping windows — Spark's F.window explode; the batch twin of
    streaming/ops.py sliding_means."""
    ev = tbl(spark, sf_dir, "events")
    sdf = (
        ev.to_spark()
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
        .orderBy("ws", "event_type")
    )
    return sdf


# every event belongs to windows starting at trunc30(ts) and
# trunc30(ts) - 30min (both epoch-aligned, exactly Spark's alignment)
SLIDING_SQL = """
WITH e AS (
  SELECT event_type, value,
         unnest([
           make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 * 1000000 AS BIGINT)),
           make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - 1800) * 1000000 AS BIGINT))
         ]) AS ws
  FROM events
)
SELECT ws, event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total
FROM e GROUP BY ws, event_type ORDER BY ws, event_type
"""


QUERIES["sliding_window_counts"] = (sliding_window_counts, SLIDING_SQL)
