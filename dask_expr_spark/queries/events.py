"""Event-analytics queries (funnel, cohort retention) — product-
analytics patterns a training-data/events pipeline needs; all window +
join + groupBy, no UDFs."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import tbl


def funnel_stages(spark, sf_dir):
    """funnel: per user, first ts of view → click → purchase; count
    users reaching each ordered stage."""
    ev = tbl(spark, sf_dir, "events").to_spark()
    firsts = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
        )
    )
    stage = (
        F.when(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & F.col("t_purchase").isNotNull()
            & (F.col("t_view") <= F.col("t_click"))
            & (F.col("t_click") <= F.col("t_purchase")),
            3,
        )
        .when(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_view") <= F.col("t_click")),
            2,
        )
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        firsts.withColumn("stage", stage)
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


FUNNEL_SQL = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY user_id
),
staged AS (
  SELECT CASE
    WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
         AND t_view <= t_click AND t_click <= t_purchase THEN 3
    WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_view <= t_click THEN 2
    WHEN t_view IS NOT NULL THEN 1
    ELSE 0 END AS stage
  FROM firsts
)
SELECT stage, count(*) AS n_users FROM staged GROUP BY stage ORDER BY stage
"""


def weekly_retention(spark, sf_dir):
    """cohort retention: users first active in week w0, still active
    k weeks later — (cohort_week, week_offset, n_users)."""
    ev = tbl(spark, sf_dir, "events").to_spark()
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = active.join(cohort, "user_id").withColumn(
        "week_offset",
        F.datediff(F.col("week"), F.col("cohort_week")).cast("long") / 7,
    )
    return (
        joined.withColumn("week_offset", F.col("week_offset").cast("long"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_SQL = """
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM active GROUP BY user_id
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM active a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "funnel_stages": (funnel_stages, FUNNEL_SQL),
    "weekly_retention": (weekly_retention, RETENTION_SQL),
}


def json_props_stats(spark, sf_dir):
    """semi-structured extraction: parse the JSON props column and
    aggregate the extracted field (Spark get_json_object — JVM-side
    JSON path, no UDF)."""
    ev = tbl(spark, sf_dir, "events")
    sdf = ev.to_spark().withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("long")
    )
    return (
        sdf.groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_PROPS_SQL = """
WITH j AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM j GROUP BY event_type ORDER BY event_type
"""


QUERIES["json_props_stats"] = (json_props_stats, JSON_PROPS_SQL)
