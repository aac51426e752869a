"""Streaming queries surfaced through the driver contract.

All three stage the events table as a file-source stream, drain it
through Structured Streaming, and surface the FINAL state — which
equals a batch aggregation over the same files, so each one is
value-checkable against a plain SQL oracle (the
stream_stateful_totals pattern the round-2 verdict asked to extend).

For the watermarked update-mode query (tumbling counts) the staging
writes TIME-ORDERED files (4 contiguous ts ranges, written
sequentially so the file source replays them oldest-first): with
in-order arrival the 2-hour watermark never drops an event, so the
last update per window = the batch count. Out-of-order/late-drop
behavior is exercised separately in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _stage_time_ordered(spark, sf_dir, prefix: str, n_files: int = 4) -> str:
    """write events as n_files parquet files covering contiguous,
    ascending ts ranges, sequentially (ascending mod-times) — the file
    stream source then replays them in event-time order. The min/max
    collect is 2 values (bounded driver work, same class as the
    ordered-op bucket sampling)."""
    from ..sources.io import read_parquet

    import time

    src = tempfile.mkdtemp(prefix=prefix)
    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")).to_spark()
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / n_files
    stamped: set[str] = set()
    base_t = time.time() - n_files * 10
    for i in range(n_files):
        a = lo + span * i
        b = hi if i == n_files - 1 else lo + span * (i + 1)
        cond = (F.col("ts") >= F.lit(a)) & (
            F.col("ts") <= F.lit(b) if i == n_files - 1 else F.col("ts") < F.lit(b)
        )
        ev.filter(cond).coalesce(1).write.mode("append").parquet(src)
        # tie-proof the replay order: the file source processes the
        # initial listing in MOD-TIME order, and back-to-back writes
        # can land in one clock tick — then ties break on the random
        # part-file names and the replay arrives out of order, so the
        # watermark drops events (observed intermittently in round 6).
        # Stamp each range's files with explicit ascending mtimes.
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in stamped:
                t = base_t + i * 10
                os.utime(os.path.join(src, f), (t, t))
                stamped.add(f)
    return src


def stream_tumbling_counts(spark, sf_dir):
    """watermarked tumbling-window counts (streaming/ops.py
    tumbling_counts) drained in update mode over a time-ordered file
    replay; the last update per (window, event_type) is the final
    count, hash-checked against the batch hourly aggregation."""
    from ..streaming import ops as S

    src = _stage_time_ordered(spark, sf_dir, "stream_q_")
    stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
    name = "stream_tumbling_counts_out"
    q = S.run_to_memory(S.tumbling_counts(stream), name, output_mode="update")
    try:
        # max(n) per key = last (monotone) update = final window count
        out = spark.sql(
            f"SELECT ws, event_type, max(n) AS n, round(max(total), 2) AS total "
            f"FROM {name} GROUP BY ws, event_type ORDER BY ws, event_type"
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
    return out


STREAM_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS ws, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
FROM events GROUP BY 1, 2 ORDER BY ws, event_type
"""


def stream_session_counts(spark, sf_dir):
    """session-window streaming aggregation (F.session_window + state
    store): sessions close after 30 min of user inactivity. Complete
    mode keeps all state, so the final emitted sessions equal the
    batch gaps-and-islands sessionization — hash-checked against that
    SQL oracle."""
    from ..streaming import ops as S

    src = _stage_time_ordered(spark, sf_dir, "stream_sq_")
    stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
    name = "stream_session_counts_out"
    # session windows merge as events arrive → update mode is unsupported;
    # complete mode emits the final merged sessions
    q = S.run_to_memory(S.session_windows(stream), name, output_mode="complete")
    try:
        out = spark.sql(
            f"SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_events "
            f"FROM {name} GROUP BY user_id ORDER BY user_id"
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
    return out


# gaps-and-islands with a >= 30 min break rule: Spark's session_window
# is [start, last_ts + gap), so an event exactly gap after the previous
# one starts a NEW session.
STREAM_SESSION_SQL = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
per_session AS (
  SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY user_id, sid
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "stream_tumbling_counts": (stream_tumbling_counts, STREAM_TUMBLING_SQL),
    "stream_session_counts": (stream_session_counts, STREAM_SESSION_SQL),
}


def stream_stateful_totals(spark, sf_dir):
    """custom stateful operator (applyInPandasWithState running
    per-user totals) drained through micro-batches. The FINAL state
    per user equals the batch groupBy — that final snapshot is what we
    surface, so this query, though executed with stateful streaming
    semantics, is value-checkable against a plain SQL oracle."""
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


def stream_interval_join(spark, sf_dir):
    """stream-stream interval join (streaming/ops.py
    stream_stream_purchase_after_click): purchases matched to a click
    by the same user within the preceding hour, both sides file-source
    streams. INNER stream-stream joins emit each match as it is found
    (no watermark flush needed), and the 2h watermark cannot evict a
    click still inside the 1h join window under in-order replay — so
    the drained output equals the batch interval join exactly,
    hash-checked against that SQL oracle."""
    import tempfile

    from ..sources.io import read_parquet
    from ..streaming import ops as S

    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")).to_spark()
    side_dirs = {}
    for kind in ("click", "purchase"):
        d = tempfile.mkdtemp(prefix=f"stream_ij_{kind}_")
        (ev.filter(F.col("event_type") == kind)
           .select("user_id", "ts", "value").coalesce(1)
           .write.mode("overwrite").parquet(d))
        side_dirs[kind] = d
    schema = "user_id long, ts timestamp, value double"
    clicks = spark.readStream.schema(schema).parquet(side_dirs["click"])
    purchases = spark.readStream.schema(schema).parquet(side_dirs["purchase"])
    name = "stream_interval_join_out"
    q = S.run_to_memory(
        S.stream_stream_purchase_after_click(clicks, purchases),
        name, output_mode="append")
    try:
        out = spark.sql(
            f"SELECT c_user AS user_id, c_ts, p_ts, p_value FROM {name} "
            f"ORDER BY user_id, c_ts, p_ts")
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
    return out


STREAM_INTERVAL_SQL = """
SELECT c.user_id, c.ts AS c_ts, p.ts AS p_ts, p.value AS p_value
FROM events p JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY c.user_id, c_ts, p_ts
"""

QUERIES["stream_interval_join"] = (stream_interval_join, STREAM_INTERVAL_SQL)


def stream_semantic_dedup(spark, sf_dir):
    """streaming semantic-dedup candidates (streaming/ops.py
    semantic_dedup_candidates_stream): deterministic hyperplane-cell
    collisions flagged online via per-cell state. The cell signature
    uses inlined literal plane weights, so DuckDB reproduces the exact
    partition; with a single source batch the state handler's
    min-first rule makes every candidate (vec_id, cell-min, cell) and
    the FULL streaming output hash-matches the oracle.

    The oracle equivalence relies on the whole corpus arriving as ONE
    micro-batch (hence the coalesce(1) single-file source and no
    maxFilesPerTrigger): with multiple batches the min-first state
    rule would emit per-batch-prefix minima instead of the global
    cell minimum."""
    from ..sources.io import read_parquet
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_sem_")
    try:
        emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        emb.to_spark().select("vec_id", "embedding").coalesce(1) \
            .write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "vec_id long, embedding array<float>").parquet(src)
        name = "stream_semantic_dedup_out"
        q_ = S.run_to_memory(
            S.semantic_dedup_candidates_stream(stream, dim=64, num_planes=4,
                                               seed=7),
            name, output_mode="append",
        )
        try:
            out = spark.sql(
                f"SELECT vec_id, matched_vec, cell FROM {name} "
                "ORDER BY vec_id, cell"
            )
            out = spark.createDataFrame(out.collect(), out.schema)
        finally:
            q_.stop()
        return out
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _stream_sem_sql() -> str:
    from .similarity import _lsh_cell_sql

    return f"""
WITH cells AS (
  SELECT vec_id, CAST({_lsh_cell_sql(64, 4, 7)} AS BIGINT) AS cell
  FROM embeddings
),
g AS (
  SELECT vec_id, cell, min(vec_id) OVER (PARTITION BY cell) AS first
  FROM cells
)
SELECT vec_id, first AS matched_vec, cell FROM g
WHERE vec_id != first
ORDER BY vec_id, cell
"""


QUERIES["stream_semantic_dedup"] = (stream_semantic_dedup, _stream_sem_sql())


def stream_heavy_hitters(spark, sf_dir):
    """streaming Misra-Gries heavy-hitter sketch (streaming/ops.py
    heavy_hitter_candidates_stream — state bounded at m counters per
    shard forever) + offline exact recount: per-user event heavy
    hitters (> 0.8% of all events).  The stream supplies a GUARANTEED
    candidate superset (all occurrences of a user hash to one shard,
    so global freq > n_shard/m survives that shard's summary); the
    batch side recounts only those candidates and applies the exact
    threshold — the result equals plain GROUP BY/HAVING and
    hash-checks against DuckDB regardless of micro-batching."""
    from ..sources.io import read_parquet
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_hh_")
    try:
        (read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
         .to_spark().repartition(4).write.mode("overwrite").parquet(src))
        stream = S.read_event_stream(spark, src, max_files_per_trigger=2)
        name = "stream_hh_out"
        q_ = S.run_to_memory(
            S.heavy_hitter_candidates_stream(stream, "user_id", m=125,
                                             shards=8),
            name, output_mode="update",
        )
        try:
            # final snapshot per shard = the emission carrying that
            # shard's max n_seen (n_seen grows with every batch the
            # shard receives).  The memory sink holds ≤ shards × m
            # candidate rows per batch — driver-side selection is the
            # fixture materialization, not the data path.
            pdf = spark.table(name).toPandas()
            mx = pdf.groupby("shard")["n_seen"].transform("max")
            vals = sorted(set(pdf.loc[pdf["n_seen"] == mx, "value"]))
            # NOT named "value": events itself has a value column
            cand = spark.createDataFrame([(v,) for v in vals],
                                         "__hh_val string")
        finally:
            q_.stop()
    finally:
        shutil.rmtree(src, ignore_errors=True)
    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")).to_spark()
    total = ev.where(F.col("user_id").isNotNull()).agg(
        F.count(F.lit(1)).alias("__total"))
    exact = (
        ev.join(F.broadcast(cand),
                ev["user_id"].cast("string") == F.col("__hh_val"), "leftsemi")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("freq"))
    )
    return (exact.crossJoin(F.broadcast(total))
            .where(F.col("freq") > 0.008 * F.col("__total"))
            .select("user_id", "freq").orderBy("user_id"))


STREAM_HH_SQL = """
SELECT user_id, count(*) AS freq
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
HAVING count(*) > 0.008 * (SELECT count(*) FROM events WHERE user_id IS NOT NULL)
ORDER BY user_id
"""

QUERIES["stream_heavy_hitters"] = (stream_heavy_hitters, STREAM_HH_SQL)


def stream_windowed_distinct(spark, sf_dir):
    """streaming windowed approx-distinct (streaming/ops.py
    windowed_distinct_users — HLL++ state, bounded per window) drained
    in update mode over time-ordered replay; tolerance oracle: exact
    per-(hour, type) counts and distincts hash-checked, flags assert
    the sketch landed within 3x its 5% default rsd."""
    from ..streaming import ops as S

    src = _stage_time_ordered(spark, sf_dir, "stream_wd_")
    try:
        stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
        name = "stream_windowed_distinct_out"
        q_ = S.run_to_memory(S.windowed_distinct_users(stream), name,
                             output_mode="update")
        try:
            # last update per key = final window state
            out = spark.sql(
                f"SELECT ws, event_type, max(approx_users) AS approx_users, "
                f"max(n) AS n FROM {name} GROUP BY ws, event_type"
            )
            out = spark.createDataFrame(out.collect(), out.schema)
        finally:
            q_.stop()
    finally:
        shutil.rmtree(src, ignore_errors=True)
    from ..sources.io import read_parquet

    exact = (read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
             .to_spark()
             .groupBy(F.date_trunc("hour", F.col("ts")).alias("ws"),
                      "event_type")
             .agg(F.countDistinct("user_id").alias("exact_users"),
                  F.count(F.lit(1)).alias("exact_n")))
    return (exact.join(out, ["ws", "event_type"])
            .select("ws", "event_type", "exact_users",
                    (F.col("n") == F.col("exact_n")).alias("n_ok"),
                    (F.abs(F.col("approx_users") - F.col("exact_users"))
                     <= F.greatest(F.lit(1.0),
                                   F.col("exact_users") * 0.15))
                    .alias("distinct_ok"))
            .orderBy("ws", "event_type"))


STREAM_WD_SQL = """
SELECT date_trunc('hour', ts) AS ws, event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS n_ok, TRUE AS distinct_ok
FROM events GROUP BY 1, 2 ORDER BY ws, event_type
"""

QUERIES["stream_windowed_distinct"] = (stream_windowed_distinct, STREAM_WD_SQL)


def stream_hll_rollup(spark, sf_dir):
    """streaming → persistent mergeable sketch table (streaming/ops.py
    hll_rollup_sink + compact_hll_rollup): each micro-batch is
    HLL-sketched per (event_type, day) and appended to a rollup table;
    after the drain the table is compacted to one row per key and
    per-event_type distincts answered by sketch union ALONE — the raw
    events are never replayed.  Tolerance oracle (the hll_rollup_users
    pattern): exact distincts hash-checked + flags that each estimate
    sits within 3x the lg_k=12 published error (±7.5%), plus a flag
    that compaction reduced the table to exactly one row per key."""
    from ..functions.sketches import hll_estimate
    from ..sources.io import read_parquet
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_hll_src_")
    roll_path = tempfile.mkdtemp(prefix="stream_hll_roll_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="stream_hll_ckpt_")
    try:
        (read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
         .to_spark().repartition(4).write.mode("overwrite").parquet(src))
        stream = S.read_event_stream(spark, src, max_files_per_trigger=1) \
            .withColumn("day", F.to_date("ts"))
        q_ = S.hll_rollup_sink(stream, ["event_type", "day"], "user_id",
                               roll_path, lg_k=12, checkpoint_dir=ckpt)
        try:
            q_.processAllAvailable()
        finally:
            q_.stop()
        S.compact_hll_rollup(spark, roll_path, ["event_type", "day"])
        roll = spark.read.parquet(roll_path)
        n_keys = roll.count()
        compact_ok = (roll.groupBy("event_type", "day").count()
                      .where(F.col("count") > 1).count() == 0) and n_keys > 0
        est = hll_estimate(roll, ["event_type"])
        est = spark.createDataFrame(est.collect(), est.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(os.path.dirname(roll_path), ignore_errors=True)
    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")).to_spark()
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"))
    return (exact.join(est, "event_type")
            .select("event_type", "exact_users",
                    (F.abs(F.col("distinct_est") - F.col("exact_users"))
                     <= F.col("exact_users").cast("double") * 0.075)
                    .alias("est_ok"),
                    F.lit(bool(compact_ok)).alias("compact_ok"))
            .orderBy("event_type"))


STREAM_HLL_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS est_ok, TRUE AS compact_ok
FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["stream_hll_rollup"] = (stream_hll_rollup, STREAM_HLL_SQL)


def stream_hist_rollup(spark, sf_dir):
    """streaming → persistent mergeable HISTOGRAM rollup
    (streaming/ops.py hist_rollup_sink + compact_hist_rollup): each
    micro-batch histogrammed per (event_type, day), fragments appended,
    table compacted, per-event_type medians answered by bin-count merge
    alone — the quantile companion to stream_hll_rollup.  Tolerance
    oracle (the hist_rollup_price_quantiles pattern): exact medians
    hash-checked + one-bin-width flags + a one-row-per-key compaction
    flag."""
    from ..functions.sketches import quantile_estimate
    from ..sources.io import read_parquet
    from ..streaming import ops as S

    BINS, LO, HI = 256, 0.0, 1000.0
    src = tempfile.mkdtemp(prefix="stream_hist_src_")
    roll_path = tempfile.mkdtemp(prefix="stream_hist_roll_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="stream_hist_ckpt_")
    try:
        (read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
         .to_spark().repartition(4).write.mode("overwrite").parquet(src))
        stream = S.read_event_stream(spark, src, max_files_per_trigger=1) \
            .withColumn("day", F.to_date("ts"))
        q_ = S.hist_rollup_sink(stream, ["event_type", "day"], "value",
                                roll_path, bins=BINS, lo=LO, hi=HI,
                                checkpoint_dir=ckpt)
        try:
            q_.processAllAvailable()
        finally:
            q_.stop()
        S.compact_hist_rollup(spark, roll_path, ["event_type", "day"])
        roll = spark.read.parquet(roll_path)
        compact_ok = (roll.groupBy("event_type", "day").count()
                      .where(F.col("count") > 1).count() == 0) \
            and roll.count() > 0
        est = quantile_estimate(roll, 0.5, ["event_type"])
        est = spark.createDataFrame(est.collect(), est.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(os.path.dirname(roll_path), ignore_errors=True)
    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")).to_spark()
    exact = ev.groupBy("event_type").agg(
        F.round(F.expr(
            "percentile(least(greatest(value, 0.0d), 1000.0d), 0.5)"), 2)
        .alias("exact_p50"))
    bin_w = (HI - LO) / BINS
    return (exact.join(est, "event_type")
            .select("event_type", "exact_p50",
                    (F.abs(F.col("q_est") - F.col("exact_p50"))
                     <= F.lit(bin_w)).alias("est_ok"),
                    F.lit(bool(compact_ok)).alias("compact_ok"))
            .orderBy("event_type"))


STREAM_HIST_SQL = """
SELECT event_type,
       round(quantile_cont(least(greatest(value, 0.0), 1000.0), 0.5), 2)
         AS exact_p50,
       TRUE AS est_ok, TRUE AS compact_ok
FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["stream_hist_rollup"] = (stream_hist_rollup, STREAM_HIST_SQL)


def stream_exact_dedup(spark, sf_dir):
    """streaming ingest dedup (streaming/ops.py exact_dedup_sink):
    documents staged as ascending-doc_id files replay as micro-batches;
    each batch dedupes against the persistent exact-hash index, novel
    hashes append, survivors land in the kept table.  With ascending
    arrival the kept set equals EXACTLY the batch answer "min doc_id
    per md5(text)" — hash-exact oracle over the kept ids per source."""
    import time

    from ..sources.io import read_parquet
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_xd_src_")
    idx_path = tempfile.mkdtemp(prefix="stream_xd_idx_") + "/t"
    kept_path = tempfile.mkdtemp(prefix="stream_xd_kept_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="stream_xd_ckpt_")
    try:
        docs = read_parquet(spark,
                            os.path.join(sf_dir, "documents.parquet")
                            ).to_spark()
        lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        span = max(1, (hi - lo + 1) // 4)
        stamped: set = set()
        base_t = time.time() - 60
        for i in range(4):
            a = lo + span * i
            b = hi + 1 if i == 3 else lo + span * (i + 1)
            (docs.where((F.col("doc_id") >= a) & (F.col("doc_id") < b))
             .coalesce(1).write.mode("append").parquet(src))
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in stamped:
                    t = base_t + i * 10
                    os.utime(os.path.join(src, f), (t, t))
                    stamped.add(f)
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q_ = S.exact_dedup_sink(stream, "doc_id", "text", idx_path,
                                kept_path=kept_path, checkpoint_dir=ckpt)
        try:
            q_.processAllAvailable()
        finally:
            q_.stop()
        S.compact_exact_index(spark, idx_path)
        kept = spark.read.parquet(kept_path)
        out = (kept.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.sum("doc_id").alias("id_sum"))
               .orderBy("source"))
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        for p in (src, ckpt):
            shutil.rmtree(p, ignore_errors=True)
        shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)
        shutil.rmtree(os.path.dirname(kept_path), ignore_errors=True)
    return out


STREAM_XD_SQL = """
WITH kept AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(d.doc_id) AS BIGINT) AS id_sum
FROM documents d JOIN kept k ON d.doc_id = k.doc_id
GROUP BY d.source ORDER BY d.source
"""

QUERIES["stream_exact_dedup"] = (stream_exact_dedup, STREAM_XD_SQL)


def stream_drift_psi(spark, sf_dir):
    """streaming drift MONITOR: the end-to-end composition of
    hist_rollup_sink + psi_drift — a reference histogram rollup is
    built in batch over the first half-month of events, the second
    half streams through the sink as micro-batch fragments, and the
    PSI drift score per event_type is answered from the two SKETCH
    tables alone (psi_drift works directly on the un-compacted
    fragments; the raw events are never re-read for the score).  Batch
    boundaries don't matter because bin counts merge by addition, so
    the score is deterministic and the binning + PSI algebra reproduce
    hash-exactly in SQL after round(6)."""
    from ..functions.sketches import hist_rollup, psi_drift
    from ..sources.io import read_parquet
    from ..streaming import ops as S

    BINS, LO, HI = 64, 0.0, 500.0
    SPLIT = "2024-01-16"
    src = tempfile.mkdtemp(prefix="stream_psi_src_")
    roll_path = tempfile.mkdtemp(prefix="stream_psi_roll_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="stream_psi_ckpt_")
    try:
        ev = read_parquet(spark,
                          os.path.join(sf_dir, "events.parquet")).to_spark()
        ref = hist_rollup(ev.where(F.col("ts") < SPLIT), ["event_type"],
                          "value", bins=BINS, lo=LO, hi=HI)
        (ev.where(F.col("ts") >= SPLIT)
         .repartition(4).write.mode("overwrite").parquet(src))
        stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
        q_ = S.hist_rollup_sink(stream, ["event_type"], "value",
                                roll_path, bins=BINS, lo=LO, hi=HI,
                                checkpoint_dir=ckpt)
        try:
            q_.processAllAvailable()
        finally:
            q_.stop()
        live = spark.read.parquet(roll_path)
        out = (psi_drift(ref, live, ["event_type"])
               .select("event_type", F.round("psi", 6).alias("psi"),
                       "n_a", "n_b")
               .orderBy("event_type"))
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(os.path.dirname(roll_path), ignore_errors=True)
    return out


STREAM_PSI_SQL = """
WITH p AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END AS side,
         least(63, greatest(0,
           CAST(floor(value / (500.0 / 64)) AS INT))) AS bin
  FROM events WHERE value IS NOT NULL
),
c AS (
  SELECT event_type, bin,
         count(*) FILTER (WHERE side = 'a') AS ca,
         count(*) FILTER (WHERE side = 'b') AS cb
  FROM p GROUP BY 1, 2
),
t AS (
  SELECT event_type,
         sum(ca) OVER (PARTITION BY event_type) AS na,
         sum(cb) OVER (PARTITION BY event_type) AS nb,
         ca, cb
  FROM c
)
SELECT event_type,
       round(sum((greatest(ca / na, 1e-6) - greatest(cb / nb, 1e-6))
                 * ln(greatest(ca / na, 1e-6) / greatest(cb / nb, 1e-6))),
             6) AS psi,
       CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b
FROM t GROUP BY event_type ORDER BY event_type
"""

QUERIES["stream_drift_psi"] = (stream_drift_psi, STREAM_PSI_SQL)


def stream_upsert_snapshot(spark, sf_dir):
    """streaming CDC-apply (streaming/ops.py upsert_sink): orders
    arrive as 4 time-ordered files — each carries its quarter of novel
    keys plus a RE-CRAWL of every %10 key with the price bumped by
    100·batch — and each micro-batch SCD-1-merges into a
    hive-partitioned snapshot via the partition-pruned upsert.  After
    the drain, every key exists once and the %10 keys hold the LAST
    batch's price (+300) — the last-write-wins contract, hash-exact in
    SQL from first principles."""
    import time

    from ..sources.io import read_parquet
    from ..streaming import ops as S

    src = tempfile.mkdtemp(prefix="stream_ups_src_")
    tbl_dir = tempfile.mkdtemp(prefix="stream_ups_tbl_")
    table_path = os.path.join(tbl_dir, "t")
    ckpt = tempfile.mkdtemp(prefix="stream_ups_ckpt_")
    try:
        o = read_parquet(spark, os.path.join(sf_dir, "orders.parquet")
                         ).to_spark()
        stamped: set = set()
        base_t = time.time() - 60
        for i in range(4):
            inserts = o.where((F.col("o_orderkey") % 4 == i)
                              & (F.col("o_orderkey") % 10 != 0))
            recrawl = (o.where(F.col("o_orderkey") % 10 == 0)
                       .withColumn("o_totalprice",
                                   F.col("o_totalprice") + 100.0 * i))
            (inserts.unionByName(recrawl)
             .withColumn("__v", F.lit(i))
             .coalesce(1).write.mode("append").parquet(src))
            for f in os.listdir(src):
                if f.endswith(".parquet") and f not in stamped:
                    t = base_t + i * 10
                    os.utime(os.path.join(src, f), (t, t))
                    stamped.add(f)
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q_ = S.upsert_sink(stream, table_path, ["o_orderkey"],
                           partition_col="o_orderpriority",
                           order_col="__v", checkpoint_dir=ckpt)
        try:
            q_.processAllAvailable()
        finally:
            q_.stop()
        snap = spark.read.parquet(table_path)
        from ._util import cent_sum
        out = (snap.groupBy("o_orderstatus")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("o_totalprice")).alias("total"),
                    F.max(F.when(F.col("o_orderkey") % 10 == 0,
                                 F.col("__v"))).alias("last_v"))
               .orderBy("o_orderstatus"))
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tbl_dir, ignore_errors=True)
    return out


STREAM_UPSERT_SQL = """
WITH fin AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 300.0
              ELSE o_totalprice END AS price
  FROM orders
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total,
       CAST(3 AS INT) AS last_v
FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

QUERIES["stream_upsert_snapshot"] = (stream_upsert_snapshot,
                                     STREAM_UPSERT_SQL)
