"""Round-5 additions: frequency sketches and exact-n sampling
(functions/sketches.py, functions/sampling.py).  Both are scale
operators with exact cross-engine oracles — heavy_hitters' two-pass
Misra-Gries plan returns exactly the plain GROUP BY / HAVING answer,
and sample_n keys off the same md5 order the rest of the sampling
family uses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import sampling as S
from ..functions.sketches import heavy_hitters
from ._util import tbl


def heavy_hitter_tokens(spark, sf_dir):
    """Exact heavy hitters over the token stream of documents.text
    (freq > 0.2% of all tokens) via the two-pass Misra-Gries plan —
    never shuffles the token domain, only ≤ ceil(1/phi) candidates per
    partition."""
    docs = tbl(spark, sf_dir, "documents").to_spark()
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    return heavy_hitters(toks, "tok", phi=0.002).orderBy("value")


HEAVY_HITTER_SQL = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
SELECT tok AS value, count(*) AS freq
FROM toks
GROUP BY tok
HAVING count(*) > 0.002 * (SELECT count(*) FROM toks WHERE tok IS NOT NULL)
ORDER BY value
"""


def sample_n_orders(spark, sf_dir):
    """sample_n: exactly 50 orders, uniform without replacement by md5
    order (TakeOrderedAndProject — per-partition top-n heap, no full
    sort). Deterministic across engines/partitionings like the rest of
    the sampling family."""
    orders = tbl(spark, sf_dir, "orders").to_spark()
    samp = S.sample_n(orders, 50, "o_orderkey")
    return samp.select("o_orderkey", "o_orderstatus", "o_totalprice") \
        .orderBy("o_orderkey")


SAMPLE_N_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
  SELECT * FROM orders
  ORDER BY md5('s42' || CAST(o_orderkey AS VARCHAR)), o_orderkey
  LIMIT 50
) ORDER BY o_orderkey
"""


def parquet_zorder_roundtrip(spark, sf_dir):
    """Z-ordered write (cluster='zorder', sources/layout.py) → read
    back → filter on BOTH z dimensions → aggregate.  The oracle runs
    the same slice on the source table, so any row lost/duplicated by
    the quantile bucketing, bit interleave, or range shuffle flips the
    hash.  (File-level clustering quality is asserted separately in
    tests/test_io.py.)"""
    import os
    import tempfile

    from ..sources.io import read_parquet
    from ._util import cent_sum

    o = tbl(spark, sf_dir, "orders")[
        ["o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"]]
    path = os.path.join(tempfile.gettempdir(), "rt_orders_zorder")
    o.to_parquet(path, sort_by=["o_orderdate", "o_totalprice"],
                 cluster="zorder")
    back = read_parquet(spark, path)
    back = back[(back["o_orderdate"] >= "1995-01-01")
                & (back["o_orderdate"] < "1996-01-01")
                & (back["o_totalprice"] > 150000.0)]
    return (back.to_spark().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total"))
            .orderBy("o_orderpriority"))


ZORDER_RT_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  AND o_totalprice > 150000.0
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def hll_rollup_users(spark, sf_dir):
    """Mergeable HLL sketch rollup (functions/sketches.py hll_rollup /
    hll_estimate): sketch events per (event_type, day), then answer
    per-event_type distinct users by UNIONING the day sketches — the
    raw table is scanned once for the rollup, never for the estimates.
    Tolerance oracle (the approx_distinct_parts pattern): output =
    exact distincts (hash-checked) + flags that each sketch estimate
    sits within 3x the lg_k=12 published error (±7.5%)."""
    from ..functions.sketches import hll_estimate, hll_rollup

    ev = tbl(spark, sf_dir, "events").to_spark().withColumn(
        "day", F.to_date("ts"))
    roll = hll_rollup(ev, ["event_type", "day"], "user_id", lg_k=12)
    est = hll_estimate(roll, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"))
    return (
        exact.join(est, "event_type")
        .select(
            "event_type", "exact_users",
            (F.abs(F.col("distinct_est") - F.col("exact_users"))
             <= F.col("exact_users").cast("double") * 0.075)
            .alias("est_ok"))
        .orderBy("event_type")
    )


HLL_ROLLUP_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS est_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


def dedup_incremental_minhash(spark, sf_dir):
    """Incremental dedup (functions/dedup.py minhash_index /
    minhash_dedup_against): the corpus is split deterministically into
    an indexed 90% (doc_id % 10 != 0) and a 'new batch' 10%; the batch
    is deduped against the index ONLY — no self-join over the combined
    corpus, old text never re-read.  Containment oracle (the
    dedup_minhash_lsh pattern): output = exact cross-corpus J ≥ 0.9
    pairs covered by the incremental candidates; any recall miss drops
    a row and flips the driver hash."""
    from ..functions import dedup as DD

    docs = tbl(spark, sf_dir, "documents").to_spark()
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    idx_bands, idx_sigs = DD.minhash_index(old, "doc_id", "text",
                                           k=3, num_perm=32, bands=8)
    cand = DD.minhash_dedup_against(
        new, idx_bands, idx_sigs, "doc_id", "text",
        k=3, num_perm=32, bands=8, threshold=0.7
    ).select(F.col("id_new"), F.col("id_index"))
    exact = DD.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.9, max_shingle_freq=None)
    # exact pairs restricted to (new x old), oriented as (new, old)
    cross = exact.where(
        ((F.col("id_a") % 10 == 0) & (F.col("id_b") % 10 != 0))
        | ((F.col("id_b") % 10 == 0) & (F.col("id_a") % 10 != 0)))
    oriented = cross.select(
        F.when(F.col("id_a") % 10 == 0, F.col("id_a"))
        .otherwise(F.col("id_b")).alias("id_new"),
        F.when(F.col("id_a") % 10 == 0, F.col("id_b"))
        .otherwise(F.col("id_a")).alias("id_index"),
        F.round(F.col("jaccard"), 6).alias("jaccard"))
    return (oriented.join(cand, ["id_new", "id_index"], "left_semi")
            .orderBy("id_new", "id_index"))


DEDUP_INCREMENTAL_SQL = """
WITH ds AS (
  SELECT DISTINCT doc_id AS id, unnest(
    CASE WHEN len(string_split(text,' ')) >= 3
         THEN list_transform(generate_series(1, len(string_split(text,' ')) - 2),
                             i -> array_to_string(string_split(text,' ')[i:i+2], ' '))
         ELSE [] END) AS sh
  FROM documents
),
sz AS (SELECT id, count(*) AS n FROM ds GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM ds a JOIN ds b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b, round(i * 1.0 / (x.n + y.n - i), 6) AS jaccard
  FROM inter JOIN sz x ON x.id = id_a JOIN sz y ON y.id = id_b
  WHERE i * 1.0 / (x.n + y.n - i) >= 0.9
)
SELECT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS id_new,
       CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS id_index,
       jaccard
FROM pairs
WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)
ORDER BY id_new, id_index
"""


def sample_weighted_orders(spark, sf_dir):
    """sample_n_weighted: exactly 40 orders drawn without replacement
    with probability ∝ o_totalprice (Efraimidis–Spirakis keys off the
    48-bit md5 uniform — IEEE-identical in both engines, so the draw
    is exact-checkable, not tolerance-checked)."""
    orders = tbl(spark, sf_dir, "orders").to_spark()
    samp = S.sample_n_weighted(orders, 40, "o_orderkey", "o_totalprice")
    return samp.select("o_orderkey", "o_totalprice").orderBy("o_orderkey")


SAMPLE_WEIGHTED_SQL = f"""
SELECT o_orderkey, o_totalprice FROM (
  SELECT *, ln((CAST(('0x' || substr(md5('s42' || CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) + 1.0)
              / {float(16 ** 12 + 2)}) / CAST(o_totalprice AS DOUBLE) AS k
  FROM orders
  WHERE CAST(o_totalprice AS DOUBLE) > 0
  ORDER BY k DESC, o_orderkey LIMIT 40
) ORDER BY o_orderkey
"""


def hist_rollup_price_quantiles(spark, sf_dir):
    """Mergeable histogram rollup (functions/sketches.py hist_rollup /
    quantile_estimate): histogram orders per (o_orderstatus, month),
    then estimate each status' median price by MERGING the month
    histograms — the raw table is never re-read for the estimates.
    Tolerance oracle: exact medians hash-checked; flags assert the
    merged-histogram estimate lands within one bin width."""
    from ..functions.sketches import hist_rollup, quantile_estimate

    o = tbl(spark, sf_dir, "orders").to_spark().withColumn(
        "month", F.date_trunc("month", F.col("o_orderdate")))
    roll = hist_rollup(o, ["o_orderstatus", "month"], "o_totalprice",
                       bins=256, lo=800.0, hi=600000.0)
    est = quantile_estimate(roll, 0.5, ["o_orderstatus"])
    exact = o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2)
        .alias("exact_p50"))
    bin_w = (600000.0 - 800.0) / 256
    return (exact.join(est, "o_orderstatus")
            .select("o_orderstatus", "exact_p50",
                    (F.abs(F.col("q_est") - F.col("exact_p50"))
                     <= F.lit(bin_w)).alias("est_ok"))
            .orderBy("o_orderstatus"))


HIST_ROLLUP_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
       TRUE AS est_ok
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES = {
    "heavy_hitter_tokens": (heavy_hitter_tokens, HEAVY_HITTER_SQL),
    "hist_rollup_price_quantiles": (hist_rollup_price_quantiles,
                                    HIST_ROLLUP_SQL),
    "sample_weighted_orders": (sample_weighted_orders, SAMPLE_WEIGHTED_SQL),
    "dedup_incremental_minhash": (dedup_incremental_minhash,
                                  DEDUP_INCREMENTAL_SQL),
    "sample_n_orders": (sample_n_orders, SAMPLE_N_SQL),
    "parquet_zorder_roundtrip": (parquet_zorder_roundtrip, ZORDER_RT_SQL),
    "hll_rollup_users": (hll_rollup_users, HLL_ROLLUP_SQL),
}
