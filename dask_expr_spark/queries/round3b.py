"""Round-3b query batch: oracle queries for §2 rows that until now had
only pytest validation — mode, describe, groupby head/get_group,
groupby rolling/expanding, concat axis=1, query/eval, the ufunc
protocol, Series.dot/combine, is_monotonic, the CSV/JSON writer+reader
round-trips, custom reduction(), map_partitions and map_overlap.

Cross-engine exactness: float measures go through integer-cents or
decimal casts before any order-dependent aggregation (see
queries/_util.py); per-row float ops (sqrt, greatest, division by a
constant) are IEEE-identical across engines and left raw.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._util import cent_avg_sql, cent_sum, cent_sum_sql, tbl

QUERIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


# -- Series.mode, deterministic tie-break (reference: Mode,
#    _reductions.py:1270) ------------------------------------------------
MODE_SQL = """
SELECT o_orderpriority AS mode_o_orderpriority
FROM (SELECT o_orderpriority, count(*) AS n FROM orders
      GROUP BY o_orderpriority
      ORDER BY n DESC, o_orderpriority ASC LIMIT 1)
"""


@q("mode_order_priority", MODE_SQL)
def mode_order_priority(spark, sf_dir):
    """most frequent order priority — dropna=False path (deterministic
    count-desc/value-asc tie-break on both engines)."""
    o = tbl(spark, sf_dir, "orders")
    return o["o_orderpriority"].mode(dropna=False).to_spark()


# -- DataFrame.describe (reference: Describe, _describe.py:16) ----------
DESCRIBE_SQL = """
WITH s AS (SELECT p_size FROM part)
SELECT 'count' AS statistic, CAST(count(*) AS DOUBLE) AS p_size FROM s
UNION ALL SELECT 'mean', round(sum(p_size)/count(*), 6) FROM s
UNION ALL SELECT 'std', round(stddev_samp(p_size), 6) FROM s
UNION ALL SELECT 'min', CAST(min(p_size) AS DOUBLE) FROM s
UNION ALL SELECT '25%', round(quantile_cont(p_size, 0.25), 6) FROM s
UNION ALL SELECT '50%', round(quantile_cont(p_size, 0.50), 6) FROM s
UNION ALL SELECT '75%', round(quantile_cont(p_size, 0.75), 6) FROM s
UNION ALL SELECT 'max', CAST(max(p_size) AS DOUBLE) FROM s
"""


@q("describe_part_size", DESCRIBE_SQL)
def describe_part_size(spark, sf_dir):
    """describe() over an integer measure; floats rounded to 6dp on
    both sides (std/percentile summation order differs per engine)."""
    p = tbl(spark, sf_dir, "part")
    sdf = p.describe(columns=["p_size"]).to_spark()
    return sdf.select("statistic", F.round("p_size", 6).alias("p_size"))


# -- groupby head (reference: _groupby.py:858) --------------------------
GB_HEAD_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
"""


@q("groupby_head_orders", GB_HEAD_SQL)
def groupby_head_orders(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    return o.groupby("o_orderstatus").head(3, order_by="o_orderkey").to_spark()


# -- groupby get_group (reference: _groupby.py:1095) --------------------
GET_GROUP_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer WHERE c_mktsegment = 'BUILDING'
"""


@q("get_group_building", GET_GROUP_SQL)
def get_group_building(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    return c.groupby("c_mktsegment").get_group("BUILDING").to_spark()


# -- groupby().rolling() (reference: _groupby.py:2136) ------------------
GB_ROLLING_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(sum(qc) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, qc
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS qcents_rsum
FROM (SELECT *, CAST(round(l_quantity*100) AS BIGINT) AS qc FROM lineitem)
"""


@q("groupby_rolling_qty", GB_ROLLING_SQL)
def groupby_rolling_qty(spark, sf_dir):
    """3-row rolling quantity sum per order — integer-cents column so
    the windowed sum is exact on both engines. l_linenumber is NOT
    unique within an order, so qcents joins the order key; remaining
    ties have equal qcents, which leaves ROWS-frame sums invariant."""
    li = tbl(spark, sf_dir, "lineitem")[["l_orderkey", "l_linenumber",
                                         "l_quantity"]]
    li = li.assign(qcents=(F.round(F.col("l_quantity") * 100)).cast("long"))
    out = (li.groupby("l_orderkey")
             .rolling(3, order_by=["l_linenumber", "qcents"], min_periods=1)
             .sum(["qcents"]))
    return out.to_spark().select(
        "l_orderkey", "l_linenumber",
        F.col("qcents_rsum").cast("double").alias("qcents_rsum"))


# -- groupby().expanding() ---------------------------------------------
GB_EXPANDING_SQL = """
SELECT user_id, event_id,
       CAST(sum(CAST(round(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS vcents_rsum
FROM events
"""


@q("groupby_expanding_value", GB_EXPANDING_SQL)
def groupby_expanding_value(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")[["user_id", "ts", "event_id", "value"]]
    ev = ev.assign(vcents=(F.round(F.col("value") * 100)).cast("long"))
    out = (ev.groupby("user_id")
             .expanding(order_by=["ts", "event_id"])
             .sum(["vcents"]))
    return out.to_spark().select(
        "user_id", "event_id",
        F.col("vcents_rsum").cast("double").alias("vcents_rsum"))


# -- concat(axis=1) indexed alignment (reference: Concat _concat.py) ----
CONCAT1_SQL = """
SELECT c_nationkey, count(*) AS n_cust, max(c_acctbal) AS max_bal
FROM customer GROUP BY c_nationkey
"""


@q("concat_axis1_customer", CONCAT1_SQL)
def concat_axis1_customer(spark, sf_dir):
    import dask_expr_spark as dx
    c = tbl(spark, sf_dir, "customer")
    a = (c.groupby("c_nationkey").agg(n_cust=("c_custkey", "count"))
         .set_index("c_nationkey"))
    b = (c.groupby("c_nationkey").agg(max_bal=("c_acctbal", "max"))
         .set_index("c_nationkey"))
    return dx.concat([a, b], axis=1).to_spark()


# -- query() + eval() (reference: Query _expr.py:1186, Eval :1173) ------
QUERY_EVAL_SQL = """
SELECT o_orderkey, o_totalprice, o_totalprice / 1000.0 AS price_k
FROM orders WHERE o_totalprice > 200000 AND o_orderstatus = 'O'
"""


@q("query_eval_orders", QUERY_EVAL_SQL)
def query_eval_orders(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    out = (o.query("o_totalprice > 200000 and o_orderstatus = 'O'")
            .eval("price_k = o_totalprice / 1000.0"))
    return out.to_spark().select("o_orderkey", "o_totalprice", "price_k")


# -- ufunc protocol (np.sqrt is IEEE-exact per row) ---------------------
UFUNC_SQL = """
SELECT p_partkey, sqrt(p_retailprice) AS root_price
FROM part WHERE p_partkey <= 500
"""


@q("ufunc_sqrt_price", UFUNC_SQL)
def ufunc_sqrt_price(spark, sf_dir):
    import numpy as np
    p = tbl(spark, sf_dir, "part")[["p_partkey", "p_retailprice"]]
    p = p[p["p_partkey"] <= 500]
    p = p.assign(root_price=np.sqrt(p["p_retailprice"]))
    return p.to_spark().select("p_partkey", "root_price")


# -- Series.dot (reference: _collection.py:5325) ------------------------
DOT_SQL = """
SELECT round(sum(l_quantity * l_discount), 2) AS dot_l_quantity_l_discount
FROM lineitem WHERE l_orderkey <= 1000
"""


@q("dot_qty_discount", DOT_SQL)
def dot_qty_discount(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    li = li[li["l_orderkey"] <= 1000]
    sc = li["l_quantity"].dot(li["l_discount"]).to_spark()
    col = sc.columns[0]
    return sc.select(F.round(F.col(col), 2).alias(col))


# -- Series.combine (reference: _collection.py:4251) --------------------
COMBINE_SQL = """
SELECT c_custkey, greatest(c_acctbal, CAST(c_custkey % 1000 AS DOUBLE))
           AS floored_bal
FROM customer
"""


@q("combine_max_balance", COMBINE_SQL)
def combine_max_balance(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    other = (c["c_custkey"] % 1000).astype("double")
    combined = c["c_acctbal"].combine(other, max)
    out = c.assign(floored_bal=combined)
    return out.to_spark().select("c_custkey", "floored_bal")


# -- is_monotonic_* (reference: _reductions.py:1519) --------------------
MONO_SQL = """
SELECT coalesce(bool_and(ok_k), TRUE) AS keys_monotonic,
       coalesce(bool_and(ok_p), TRUE) AS price_monotonic
FROM (SELECT o_totalprice >= lag(o_totalprice)
                 OVER (ORDER BY o_orderkey) AS ok_p,
             o_orderkey >= lag(o_orderkey)
                 OVER (ORDER BY o_orderkey) AS ok_k
      FROM orders)
WHERE ok_p IS NOT NULL
"""


@q("monotonic_orders", MONO_SQL)
def monotonic_orders(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    keys = o["o_orderkey"].is_monotonic_increasing(order_by="o_orderkey")
    price = o["o_totalprice"].is_monotonic_increasing(order_by="o_orderkey")
    return (keys.to_spark().select(F.col("is_monotonic").alias("keys_monotonic"))
            .crossJoin(price.to_spark()
                       .select(F.col("is_monotonic").alias("price_monotonic"))))


# -- to_csv + read_csv round-trip (reference: io/csv.py) ----------------
CSV_RT_SQL = f"""
SELECT o_orderstatus, count(*) AS n,
       {cent_sum_sql('o_totalprice')} AS total
FROM orders GROUP BY o_orderstatus
"""


@q("csv_roundtrip_orders", CSV_RT_SQL)
def csv_roundtrip_orders(spark, sf_dir):
    """orders → CSV files → read back with an explicit schema →
    aggregate; proves the writer/reader pair preserves values (Spark
    round-trips doubles via shortest-repr)."""
    o = tbl(spark, sf_dir, "orders")[["o_orderkey", "o_custkey",
                                      "o_orderstatus", "o_totalprice"]]
    path = os.path.join(tempfile.gettempdir(), "rt_orders_csv")
    o.to_csv(path)
    from ..sources.io import read_csv
    back = read_csv(
        spark, path,
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double")
    return (back.groupby("o_orderstatus")
            .agg(n=("o_orderkey", "count"))
            .to_spark()
            .join(back.to_spark().groupBy("o_orderstatus")
                  .agg(cent_sum(F.col("o_totalprice")).alias("total")),
                  "o_orderstatus"))


# -- to_json + read_json round-trip (reference: io/json.py) -------------
JSON_RT_SQL = f"""
SELECT event_type, count(*) AS n,
       {cent_sum_sql('value')} AS total_value
FROM events GROUP BY event_type
"""


@q("json_roundtrip_events", JSON_RT_SQL)
def json_roundtrip_events(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")[["event_id", "user_id",
                                       "event_type", "value"]]
    path = os.path.join(tempfile.gettempdir(), "rt_events_json")
    ev.to_json(path)
    from ..sources.io import read_json
    back = read_json(
        spark, path,
        schema="event_id long, user_id long, event_type string, value double")
    sdf = back.to_spark().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        cent_sum(F.col("value")).alias("total_value"))
    return sdf


# -- reduction(chunk, aggregate, combine=) ------------------------------
REDUCTION_SQL = f"""
SELECT {cent_avg_sql('l_extendedprice')} AS mean_price FROM lineitem
"""


@q("reduction_mean_price", REDUCTION_SQL)
def reduction_mean_price(spark, sf_dir):
    """custom tree reduction computing an exact mean via integer cents:
    chunk sums per partition, combine= merges partials, aggregate
    finishes — all-integer until the final division."""
    import pandas as pd
    li = tbl(spark, sf_dir, "lineitem")[["l_extendedprice"]]

    def chunk(pdf):
        cents = (pdf["l_extendedprice"] * 100).round().astype("int64")
        return pd.DataFrame({"cents": [cents.sum()], "n": [len(pdf)]})

    def merge(pdf):
        return pd.DataFrame({"cents": [pdf["cents"].sum()],
                             "n": [pdf["n"].sum()]})

    def aggregate(pdf):
        return pd.DataFrame(
            {"mean_price": [pdf["cents"].sum() / 100.0 / pdf["n"].sum()]})

    return li.reduction(chunk, aggregate,
                        chunk_schema="cents long, n long",
                        agg_schema="mean_price double",
                        combine=merge).to_spark()


# -- map_partitions (reference: _collection.py:985) ---------------------
MAP_PARTS_SQL = """
SELECT substr(md5(text), 1, 1) AS bucket, count(*) AS n
FROM documents GROUP BY bucket
"""


@q("map_partitions_md5", MAP_PARTS_SQL)
def map_partitions_md5(spark, sf_dir):
    """Arrow-batched partition UDF assigning an md5 bucket per doc —
    the python-side hash matches DuckDB's md5() exactly."""
    import hashlib

    import pandas as pd
    docs = tbl(spark, sf_dir, "documents")[["text"]]

    def fn(it):
        for pdf in it:
            yield pd.DataFrame({"bucket": [
                hashlib.md5(t.encode()).hexdigest()[0] for t in pdf["text"]
            ]})

    out = docs.map_partitions(fn, "bucket string")
    return out.to_spark().groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


# -- map_overlap_rows (reference: MapOverlap, _expr.py:831) -------------
MAP_OVERLAP_SQL = """
SELECT o_orderkey,
       avg(CAST(round(o_totalprice*100) AS BIGINT))
           OVER (ORDER BY o_orderkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS smooth_cents
FROM orders
"""


@q("map_overlap_smooth", MAP_OVERLAP_SQL)
def map_overlap_smooth(spark, sf_dir):
    """centered 3-row moving average across the GLOBAL order stream,
    computed per range-bucket with 1-row padding from neighbors — the
    pandas rolling inside each padded bucket equals the global window
    because integer-cents sums are exact."""
    import pandas as pd
    o = tbl(spark, sf_dir, "orders")[["o_orderkey", "o_totalprice"]]
    o = o.assign(cents=(F.round(F.col("o_totalprice") * 100)).cast("long"))

    schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("smooth_cents", T.DoubleType()),
    ])

    def fn(p):
        p = p.sort_values("o_orderkey")
        out = pd.DataFrame({
            "o_orderkey": p["o_orderkey"],
            "smooth_cents": p["cents"].rolling(3, center=True,
                                               min_periods=1).mean(),
            "__is_main": p["__is_main"],
        })
        return out

    return o.map_overlap_rows(fn, schema, order_col="o_orderkey",
                              before=1, after=1, num_buckets=16).to_spark()


# -- corpus-trained bigram LM quality scoring (CCNet-style) -------------
LM_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
big AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
                                       i -> {'w1': ts[i], 'w2': ts[i+1]}),
                        recursive := true)
  FROM toks
),
uni AS (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w
),
voc AS (SELECT count(*) AS v FROM uni),
bigc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2)
SELECT b.doc_id, count(*) AS n_bigrams,
       round(avg(ln((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS avg_logprob
FROM big b JOIN bigc USING (w1, w2) JOIN uni ON b.w1 = uni.w CROSS JOIN voc
GROUP BY b.doc_id
"""


@q("text_lm_perplexity", LM_SQL)
def text_lm_perplexity(spark, sf_dir):
    """per-doc add-k bigram LM log-probability, model trained on the
    corpus itself (functions/text.py bigram_lm_scores)."""
    from ..functions.text import bigram_lm_scores
    docs = tbl(spark, sf_dir, "documents").to_spark()
    out = bigram_lm_scores(docs, "doc_id", "text", k_smooth=0.5)
    return out.select("doc_id", "n_bigrams",
                      F.round("avg_logprob", 6).alias("avg_logprob"))


# -- BM25 ranked retrieval ---------------------------------------------
BM25_TERMS = ["join", "vector", "window", "slow"]
BM25_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n, sum(dl)/count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM toks
  WHERE w IN ('join', 'vector', 'window', 'slow') GROUP BY doc_id, w
),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w)
SELECT doc_id,
       round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


@q("text_bm25_search", BM25_SQL)
def text_bm25_search(spark, sf_dir):
    """BM25 top-20 for a fixed 4-term query (functions/text.py
    bm25_topk — postings pruned to the query terms before any
    shuffle; TakeOrderedAndProject top-k)."""
    from ..functions.text import bm25_topk
    docs = tbl(spark, sf_dir, "documents").to_spark()
    return bm25_topk(docs, "doc_id", "text", BM25_TERMS,
                     k1=1.2, b=0.75, k=20)


# -- domain-mixture resampling -----------------------------------------
MIX_SQL = """
WITH shares(src, share) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
counts AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
),
thr AS (
  SELECT source, CAST(round(share * t / n * 65536) AS BIGINT) AS thr
  FROM (SELECT source, n, share, min(n / share) OVER () AS t
        FROM counts JOIN shares ON source = src)
)
SELECT source, count(*) AS n_kept
FROM documents JOIN thr USING (source)
WHERE ('0x' || substr(md5('mix42' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT < thr
GROUP BY source
"""


@q("mix_sources_target", MIX_SQL)
def mix_sources_target(spark, sf_dir):
    """deterministic domain-mixture downsampling to a 50/30/20 target
    over three sources (functions/sampling.py resample_to_mix) —
    md5-threshold draw, reproducible on any engine/partitioning."""
    from ..functions.sampling import resample_to_mix
    docs = tbl(spark, sf_dir, "documents").to_spark()
    kept = resample_to_mix(docs, "source", "doc_id",
                           {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
