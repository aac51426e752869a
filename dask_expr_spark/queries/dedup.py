"""Deduplication queries over the documents table
(functions/dedup.py is the implementation; north-star ops).

dedup_exact / ngram_jaccard are hash-checked against DuckDB.
MinHash-LSH and SimHash use Spark-specific xxhash64 so they get the
driver's rows-only check; tests/test_dedup.py additionally asserts the
LSH candidates cover the exact-Jaccard pairs (recall property).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import dedup as DD
from ._util import tbl


def dedup_exact_docs(spark, sf_dir):
    """exact dedup via md5 hash-groupBy (functions/dedup.py
    exact_dup_groups) — summary stats."""
    docs = tbl(spark, sf_dir, "documents")
    groups = DD.exact_dup_groups(docs.to_spark(), "text", "doc_id")
    return groups.agg(
        F.count(F.lit(1)).alias("n_distinct_texts"),
        F.sum("n_docs").alias("n_docs"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("long").alias("n_dup_groups"),
        F.max("n_docs").alias("max_group"),
    )


DEDUP_EXACT_SQL = """
WITH g AS (
  SELECT md5(text) AS h, count(*) AS n_docs, min(doc_id) AS keep_id
  FROM documents GROUP BY md5(text)
)
SELECT count(*) AS n_distinct_texts,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
       max(n_docs) AS max_group
FROM g
"""


def dedup_ngram_jaccard(spark, sf_dir):
    """exact n-gram (3-shingle) Jaccard similarity join, J >= 0.8
    (functions/dedup.py ngram_jaccard_pairs). Finds the planted
    near-duplicates in the documents table."""
    docs = tbl(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        docs.to_spark(), "doc_id", "text", k=3, threshold=0.8, max_shingle_freq=None
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


DEDUP_JACCARD_SQL = """
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
)
SELECT id_a, id_b,
       round(i * 1.0 / (x.n + y.n - i), 6) AS jaccard
FROM inter JOIN sz x ON x.id = id_a JOIN sz y ON y.id = id_b
WHERE i * 1.0 / (x.n + y.n - i) >= 0.8
ORDER BY id_a, id_b
"""


def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(32 perms) + LSH(8 bands × 4 rows) near-dup pipeline
    (functions/dedup.py minhash_dedup_pairs). xxhash64-based →
    rows-only driver check; recall property asserted in tests."""
    docs = tbl(spark, sf_dir, "documents")
    pairs = DD.minhash_dedup_pairs(
        docs.to_spark(), "doc_id", "text", k=3, num_perm=32, bands=8, threshold=0.7
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("est_jaccard"), 6).alias("est_jaccard")
    ).orderBy("id_a", "id_b")


def dedup_simhash(spark, sf_dir):
    """SimHash near-dup candidates: shared 16-bit chunk + Hamming ≤ 12
    (functions/dedup.py simhash_bucket_pairs). Rows-only check."""
    docs = tbl(spark, sf_dir, "documents")
    pairs = DD.simhash_bucket_pairs(docs.to_spark(), "doc_id", "text")
    return pairs.filter(F.col("hamming") <= 12).orderBy("id_a", "id_b")


QUERIES = {
    "dedup_exact_docs": (dedup_exact_docs, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_JACCARD_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, None),
    "dedup_simhash": (dedup_simhash, None),
}
