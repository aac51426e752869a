"""Text-analysis queries over the documents table (north-star
training-data-pipeline ops; functions/text.py is the implementation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark.sql.window import Window

from ..functions import text as TX
from ._util import tbl

_STOP = "'the','a','of','and','to','in','is'"


def text_stats_by_lang(spark, sf_dir):
    """token counting + char stats per language (whitespace tokenizer;
    functions/text.py token_count/char_count)."""
    docs = tbl(spark, sf_dir, "documents")
    sdf = docs.to_spark().select(
        "lang",
        TX.token_count(F.col("text")).alias("n_tok"),
        TX.char_count(F.col("text")).alias("n_chars"),
    )
    out = (
        sdf.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_tok").alias("max_tokens"),
        )
        .orderBy("lang")
    )
    return out


TEXT_STATS_SQL = """
WITH t AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(n_tok) AS DOUBLE) / count(*) AS avg_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       max(n_tok) AS max_tokens
FROM t GROUP BY lang ORDER BY lang
"""


def text_quality_buckets(spark, sf_dir):
    """quality scoring via stopword ratio, bucketed (functions/text.py
    stopword_ratio; reference has no analogue — north-star op)."""
    docs = tbl(spark, sf_dir, "documents")
    ratio = TX.stopword_ratio(F.col("text"), TX.STOPWORDS["en"])
    sdf = docs.to_spark().select(
        F.floor(ratio * 20).cast("long").alias("bucket"),
        F.col("doc_id"),
    )
    return (
        sdf.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .orderBy("bucket")
    )


TEXT_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(floor(
           CAST(len(list_filter(string_split(lower(text), ' '),
                                x -> x IN ({_STOP}))) AS DOUBLE)
           / len(string_split(lower(text), ' ')) * 20
         ) AS BIGINT) AS bucket
  FROM documents
)
SELECT bucket, count(*) AS n_docs, min(doc_id) AS min_doc
FROM t GROUP BY bucket ORDER BY bucket
"""


def text_token_frequencies(spark, sf_dir):
    """explode + global token frequency (reference: ExplodeSeries,
    _expr.py:1809 + ValueCounts)."""
    docs = tbl(spark, sf_dir, "documents")
    res = (
        docs.assign(token=lambda d: d["text"].str.split(" ", regex=False))
        .explode("token")[["token"]]
    )
    # no stabilizing orderBy: the driver's value-hash is
    # order-insensitive, and a global sort here only costs an exchange
    return (
        res.to_spark()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


TOKEN_FREQ_SQL = """
SELECT tok AS token, count(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok ORDER BY tok
"""


def text_fingerprint_dups(spark, sf_dir):
    """document fingerprinting: min-md5 over word 3-shingles
    (functions/text.py doc_fingerprint) → fingerprint collision groups."""
    docs = tbl(spark, sf_dir, "documents")
    sdf = docs.to_spark().select(
        TX.doc_fingerprint(F.col("text"), 3).alias("fp"), "doc_id"
    )
    return (
        sdf.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fp")
    )


FINGERPRINT_SQL = """
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text,' ')) >= 3
              THEN list_transform(
                     generate_series(1, len(string_split(text,' ')) - 2),
                     i -> md5(array_to_string(string_split(text,' ')[i:i+2], ' ')))
              ELSE [] END AS hashes
  FROM documents
),
fp AS (SELECT doc_id, list_min(hashes) AS fp FROM sh)
SELECT fp, count(*) AS n_docs, min(doc_id) AS keep_id
FROM fp GROUP BY fp HAVING count(*) > 1 ORDER BY fp
"""


def text_lang_id(spark, sf_dir):
    """language-ID heuristic (stopword-hit argmax, deterministic
    lexicographic tie-break; functions/text.py lang_id) vs labeled lang."""
    docs = tbl(spark, sf_dir, "documents")
    sdf = docs.to_spark().select(
        "lang", TX.lang_id(F.col("text")).alias("predicted")
    )
    return (
        sdf.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


# replicate the exact tie-break chain: start at lexicographically first
# language, replace only on strictly greater score
LANG_ID_SQL = """
WITH s AS (
  SELECT lang,
    len(list_filter(string_split(lower(text),' '), x -> x IN ('der','die','das','und','zu','ein','ist'))) AS s_de,
    len(list_filter(string_split(lower(text),' '), x -> x IN ('the','a','of','and','to','in','is')))     AS s_en,
    len(list_filter(string_split(lower(text),' '), x -> x IN ('el','la','de','y','que','en','un')))      AS s_es,
    len(list_filter(string_split(lower(text),' '), x -> x IN ('le','la','de','et','que','un','est')))    AS s_fr
  FROM documents
),
p AS (
  SELECT lang,
    CASE WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
         WHEN s_es > greatest(s_de, s_en) THEN 'es'
         WHEN s_en > s_de THEN 'en'
         ELSE 'de' END AS predicted
  FROM s
)
SELECT lang, predicted, count(*) AS n FROM p GROUP BY 1,2 ORDER BY 1,2
"""


QUERIES = {
    "text_stats_by_lang": (text_stats_by_lang, TEXT_STATS_SQL),
    "text_quality_buckets": (text_quality_buckets, TEXT_QUALITY_SQL),
    "text_token_frequencies": (text_token_frequencies, TOKEN_FREQ_SQL),
    "text_fingerprint_dups": (text_fingerprint_dups, FINGERPRINT_SQL),
    "text_lang_id": (text_lang_id, LANG_ID_SQL),
}


def text_chunking(spark, sf_dir):
    """document chunking with overlap (functions/text.py chunk_text) —
    64-token chunks, 16-token overlap; per-lang chunk counts and sizes."""
    docs = tbl(spark, sf_dir, "documents")
    sdf = docs.to_spark().select(
        "lang", "doc_id", F.explode(TX.chunk_text(F.col("text"), 64, 16)).alias("chunk")
    )
    return (
        sdf.withColumn("chunk_tokens", F.size(F.split(F.col("chunk"), " ")).cast("long"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("chunk_tokens").alias("total_chunk_tokens"),
            F.max("chunk_tokens").alias("max_chunk_tokens"),
        )
        .orderBy("lang")
    )


# stride = 48; chunk i covers toks[i*48 : i*48+64]; DuckDB slice is
# inclusive, so [i*48+1 : i*48+64]
TEXT_CHUNKING_SQL = """
WITH c AS (
  SELECT lang, doc_id,
         unnest(list_transform(
           generate_series(0, CAST(greatest(ceil((len(string_split(text,' ')) - 16) / 48.0), 1) AS INT) - 1),
           i -> array_to_string(string_split(text,' ')[i*48+1 : i*48+64], ' ')
         )) AS chunk
  FROM documents
)
SELECT lang, count(*) AS n_chunks, count(DISTINCT doc_id) AS n_docs,
       CAST(sum(len(string_split(chunk,' '))) AS BIGINT) AS total_chunk_tokens,
       CAST(max(len(string_split(chunk,' '))) AS BIGINT) AS max_chunk_tokens
FROM c GROUP BY lang ORDER BY lang
"""


QUERIES["text_chunking"] = (text_chunking, TEXT_CHUNKING_SQL)


def pipeline_clean_corpus(spark, sf_dir):
    """END-TO-END training-corpus cleaning pipeline — the canonical
    composition the individual north-star ops exist for:
      1. language-ID (lang_id argmax heuristic)
      2. quality gate (token count >= 30, en-stopword ratio >= 0.02)
      3. exact dedup, keep-first (md5 text hash, min doc_id survives)
      4. per-predicted-language corpus stats
    Everything stays JVM-side; the dedup is the only shuffle on data
    (hash of text), the final stats aggregate is map-side partial."""
    docs = tbl(spark, sf_dir, "documents").to_spark()
    scored = docs.select(
        "doc_id",
        TX.lang_id(F.col("text")).alias("pred_lang"),
        TX.token_count(F.col("text")).alias("n_tok"),
        TX.stopword_ratio(F.col("text"), TX.STOPWORDS["en"]).alias("sw"),
        F.md5(F.col("text")).alias("h"),
    )
    kept = scored.filter((F.col("n_tok") >= 30) & (F.col("sw") >= 0.02))
    w = Window.partitionBy("h").orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        )
        .orderBy("pred_lang")
    )


PIPELINE_SQL = """
WITH s AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS n_tok,
    len(list_filter(string_split(lower(text), ' '),
        x -> x IN ('the','a','of','and','to','in','is')))
      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sw,
    md5(text) AS h,
    len(list_filter(string_split(lower(text),' '), x -> x IN ('der','die','das','und','zu','ein','ist'))) AS s_de,
    len(list_filter(string_split(lower(text),' '), x -> x IN ('the','a','of','and','to','in','is')))     AS s_en,
    len(list_filter(string_split(lower(text),' '), x -> x IN ('el','la','de','y','que','en','un')))      AS s_es,
    len(list_filter(string_split(lower(text),' '), x -> x IN ('le','la','de','et','que','un','est')))    AS s_fr
  FROM documents
), scored AS (
  SELECT doc_id, n_tok, sw, h,
    CASE WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
         WHEN s_es > greatest(s_de, s_en) THEN 'es'
         WHEN s_en > s_de THEN 'en'
         ELSE 'de' END AS pred_lang
  FROM s
), kept AS (
  SELECT * FROM scored WHERE n_tok >= 30 AND sw >= 0.02
), deduped AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM kept)
  WHERE rn = 1
)
SELECT pred_lang, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(n_tok), 4) AS avg_tokens
FROM deduped GROUP BY pred_lang ORDER BY pred_lang
"""

QUERIES["pipeline_clean_corpus"] = (pipeline_clean_corpus, PIPELINE_SQL)
