"""Deterministic sampling / splitting queries (training-pipeline
extension; functions/sampling.py). All three are cross-engine exact:
selection keys off md5 hex prefixes, which Spark and DuckDB compute
identically — no engine RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import sampling as S
from ._util import dec_sum, dec_sum_sql, tbl


def split_train_val(spark, sf_dir):
    """hash_split: deterministic 10% validation split of documents —
    per-(split, lang) counts and token mass. Narrow map, no shuffle
    before the aggregate."""
    docs = tbl(spark, sf_dir, "documents").to_spark()
    train, val = S.hash_split(docs, "doc_id", val_fraction=0.1)
    both = train.withColumn("split", F.lit("train")).unionByName(
        val.withColumn("split", F.lit("val"))
    )
    return (
        both.withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


SPLIT_SQL = """
SELECT CASE WHEN substr(md5('s42' || CAST(doc_id AS VARCHAR)), 1, 4) < '199a'
            THEN 'val' ELSE 'train' END AS split,
       lang, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY split, lang ORDER BY split, lang
"""


def stratified_sample_docs(spark, sf_dir):
    """stratified_sample: exactly 5 documents per language, chosen by
    md5 order — reproducible across engines and partitionings."""
    docs = tbl(spark, sf_dir, "documents").to_spark()
    samp = S.stratified_sample(docs, "lang", "doc_id", n_per_stratum=5)
    return samp.select("lang", "doc_id").orderBy("lang", "doc_id")


STRATIFIED_SQL = """
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5('s42' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 5 ORDER BY lang, doc_id
"""


def global_shuffle_head(spark, sf_dir):
    """global_shuffle: reproducible permutation of orders; the first
    100 positions with a revenue checksum. Verifies the distributed
    offset-rank against a plain SQL row_number."""
    orders = tbl(spark, sf_dir, "orders").to_spark()
    sh = S.global_shuffle(orders, "o_orderkey")
    return (
        sh.filter(F.col("shuffle_rank") <= 100)
        .select("shuffle_rank", "o_orderkey", "o_totalprice")
        .orderBy("shuffle_rank")
    )


GLOBAL_SHUFFLE_SQL = """
SELECT rn AS shuffle_rank, o_orderkey, o_totalprice
FROM (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY md5('s42' || CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 100 ORDER BY rn
"""


QUERIES = {
    "split_train_val": (split_train_val, SPLIT_SQL),
    "stratified_sample_docs": (stratified_sample_docs, STRATIFIED_SQL),
    "global_shuffle_head": (global_shuffle_head, GLOBAL_SHUFFLE_SQL),
}
