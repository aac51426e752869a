"""Streaming query surfaced through the driver contract: stages the
events table as a file-source stream, drains it through a watermarked
tumbling-window aggregation, and returns the materialized result.
Genuinely non-SQL-expressible as a batch oracle statement (stateful
micro-batch execution) → rows-only check; batch parity is asserted in
tests/test_streaming.py."""

from __future__ import annotations

import os
import tempfile


def stream_tumbling_counts(spark, sf_dir):
    from ..sources.io import read_parquet
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_q_")
    (
        read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        .to_spark()
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = S.read_event_stream(spark, src, max_files_per_trigger=2)
    name = "stream_tumbling_counts_out"
    q = S.run_to_memory(S.tumbling_counts(stream), name, output_mode="update")
    try:
        # snapshot the in-memory sink into a concrete DataFrame
        out = spark.sql(
            f"SELECT ws, event_type, max(n) AS n, count(*) AS n_updates "
            f"FROM {name} GROUP BY ws, event_type ORDER BY ws, event_type"
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
    return out


def stream_session_counts(spark, sf_dir):
    """session-window streaming aggregation (F.session_window + state
    store): sessions close after 30 min of user inactivity. Stateful
    micro-batch semantics → rows-only check; batch session parity is
    asserted in tests/test_streaming.py."""
    from ..sources.io import read_parquet
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_sq_")
    (
        read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        .to_spark()
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = S.read_event_stream(spark, src, max_files_per_trigger=2)
    name = "stream_session_counts_out"
    # session windows merge as events arrive → update mode is unsupported;
    # complete mode emits the final merged sessions
    q = S.run_to_memory(S.session_windows(stream), name, output_mode="complete")
    try:
        out = spark.sql(
            f"SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_events "
            f"FROM {name} GROUP BY user_id ORDER BY user_id LIMIT 500"
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
    return out


QUERIES = {
    "stream_tumbling_counts": (stream_tumbling_counts, None),
    "stream_session_counts": (stream_session_counts, None),
}


def stream_stateful_totals(spark, sf_dir):
    """custom stateful operator (applyInPandasWithState running
    per-user totals) drained through micro-batches. The FINAL state
    per user equals the batch groupBy — that final snapshot is what we
    surface, so this query, though executed with stateful streaming
    semantics, is value-checkable against a plain SQL oracle."""
    from pyspark.sql import functions as F

    from ..sources.io import read_parquet
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_st_")
    (
        read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        .to_spark()
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = S.read_event_stream(spark, src, max_files_per_trigger=2)
    name = "stream_stateful_totals_out"
    q = S.run_to_memory(S.running_user_totals(stream), name, output_mode="update")
    try:
        # last update per user = final state; totals rounded for a
        # stable cross-engine hash
        out = spark.sql(
            f"SELECT user_id, max(n_events) AS n_events, "
            f"round(max(total_value), 2) AS total_value "
            f"FROM {name} GROUP BY user_id ORDER BY user_id"
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
    return out


STREAM_STATEFUL_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY user_id ORDER BY user_id
"""

QUERIES["stream_stateful_totals"] = (stream_stateful_totals, STREAM_STATEFUL_SQL)
