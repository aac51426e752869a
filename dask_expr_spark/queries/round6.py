"""Round-6 batch: oracle coverage for compute_current_divisions —
the last §2 row with a driver-checkable behavior that was pytest-only.
Pattern = the round-5 partitions_concat invariance: use the computed
divisions to SLICE the frame, concat the slices, and hash-check that
the union reproduces every row exactly once — a wrong boundary
(off-by-one, overlap, gap) flips n or the exact total.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import cent_sum, cent_sum_sql, tbl

QUERIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


DIVISIONS_SQL = f"""
SELECT o_orderstatus, count(*) AS n,
       {cent_sum_sql('o_totalprice')} AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("current_divisions_slice_concat", DIVISIONS_SQL)
def current_divisions_slice_concat(spark, sf_dir):
    """compute_current_divisions (reference: _collection.py:2303) on a
    range-partitioned sorted index, then loc-slice AT the computed
    boundaries and concat: divisions are per-partition [min, max], so
    loc[:d[k]] + loc[d[k]+1:] must reproduce the frame exactly (the
    index is the integer o_orderkey, so +1 is the next label).  The
    divisions collect is npartitions-bounded driver work — the same
    class as the reference's division sampling."""
    from .. import concat

    o = tbl(spark, sf_dir, "orders").set_index("o_orderkey")
    divs = o.compute_current_divisions()
    assert len(divs) >= 2 and list(divs) == sorted(divs)
    k = len(divs) // 2
    pieces = [o.loc[: divs[k]], o.loc[divs[k] + 1:]]
    u = concat(pieces).reset_index()
    return (u.to_spark().groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total"))
            .orderBy("o_orderstatus"))


# -- exact INCREMENTAL dedup vs a persistent hash index (functions/
#    dedup.py exact_hash_index / exact_dedup_against) — the exact
#    companion to dedup_incremental_minhash; output is hash-exact ----
EXACT_INCR_SQL = """
WITH idx AS (
  SELECT md5(text) AS text_hash, min(doc_id) AS keep_id
  FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1
),
batch AS (
  SELECT doc_id AS id, md5(text) AS text_hash
  FROM documents WHERE doc_id % 10 = 0
),
first AS (SELECT text_hash, min(id) AS bk FROM batch GROUP BY text_hash)
SELECT b.id, b.text_hash,
       COALESCE(i.keep_id,
                CASE WHEN b.id <> f.bk THEN f.bk END) AS dup_of
FROM batch b
JOIN first f ON b.text_hash = f.text_hash
LEFT JOIN idx i ON b.text_hash = i.text_hash
ORDER BY b.id
"""


@q("dedup_exact_incremental", EXACT_INCR_SQL)
def dedup_exact_incremental(spark, sf_dir):
    """index 90% of the corpus once (exact_hash_index), dedupe the
    'new batch' 10% against it (exact_dedup_against) — dup_of points
    at the index representative, the batch's own first occurrence for
    intra-batch dups, NULL for novel text.  The whole answer is
    hash-exact (md5 is identical across engines)."""
    from ..functions import dedup as DD

    docs = tbl(spark, sf_dir, "documents").to_spark()
    index = DD.exact_hash_index(
        docs.where(F.col("doc_id") % 10 != 0), "doc_id", "text")
    batch = docs.where(F.col("doc_id") % 10 == 0)
    return (DD.exact_dedup_against(batch, index, "doc_id", "text")
            .orderBy("id"))


# -- exact-n per-group sampling (functions/sampling.py
#    sample_n_per_group): deterministic md5 order → EXACT cross-engine
#    draw, the per-group companion to sample_n_orders -----------------
SAMPLE_GROUP_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY md5('s42' || CAST(o_orderkey AS VARCHAR)), o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 5
ORDER BY o_orderpriority, o_orderkey
"""


@q("sample_n_per_group_orders", SAMPLE_GROUP_SQL)
def sample_n_per_group_orders(spark, sf_dir):
    from ..functions import sampling as S

    o = tbl(spark, sf_dir, "orders").to_spark()
    samp = S.sample_n_per_group(o, "o_orderpriority", "o_orderkey", 5)
    return (samp.select("o_orderpriority", "o_orderkey", "o_totalprice")
            .orderBy("o_orderpriority", "o_orderkey"))


# -- leakage-safe split (functions/sampling.py leakage_safe_split):
#    duplicate groups move as one unit, so near-dups never straddle
#    train/val.  Pairs here = exact-hash duplicates (SQL-reproducible;
#    production feeds MinHash/SimHash candidates), components via the
#    recursive CTE, split threshold = the md5-prefix rule ------------
LEAKAGE_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM documents a JOIN documents b
    ON md5(lower(trim(a.text))) = md5(lower(trim(b.text)))
   AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
comp AS (SELECT s AS id, least(s, min(d)) AS rep FROM reach GROUP BY s),
labeled AS (
  SELECT doc_id, COALESCE(c.rep, doc_id) AS rep
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
)
SELECT CASE WHEN substring(md5('s42' || CAST(rep AS VARCHAR)), 1, 4)
                 < '4ccd'
            THEN 'val' ELSE 'train' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM labeled GROUP BY 1 ORDER BY split
"""


@q("split_leakage_safe", LEAKAGE_SQL)
def split_leakage_safe(spark, sf_dir):
    """leakage_safe_split over exact-duplicate pairs at
    val_fraction=0.3 (threshold 0.3*65536 = 19661 = 0x4ccd): output =
    per-split doc counts + id sums, hash-exact because both the
    components and the md5 threshold are reproduced in SQL.  The
    no-straddle invariant itself is property-tested in
    tests/test_round6_ops.py."""
    from ..functions import sampling as S

    docs = tbl(spark, sf_dir, "documents").to_spark()
    key = F.md5(F.lower(F.trim(F.col("text"))))
    a = docs.select(F.col("doc_id").alias("id_a"), key.alias("__k"))
    b = docs.select(F.col("doc_id").alias("id_b"), key.alias("__k"))
    pairs = (a.join(b, "__k").where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
    train, val = S.leakage_safe_split(docs, "doc_id", pairs,
                                      val_fraction=0.3)
    u = (train.withColumn("split", F.lit("train"))
         .unionByName(val.withColumn("split", F.lit("val"))))
    return (u.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").alias("id_sum"))
            .orderBy("split"))


# -- weighted exact-n PER GROUP (functions/sampling.py
#    sample_n_weighted_per_group): A-ES keys are engine-exact, so the
#    per-group draw is hash-exact like sample_weighted_orders ---------
SAMPLE_WG_SQL = f"""
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY ln((CAST(('0x' || substr(md5('s42' || CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) + 1.0)
                       / {float(16 ** 12 + 2)}) / CAST(o_totalprice AS DOUBLE) DESC,
                    o_orderkey
         ) AS rn
  FROM orders WHERE CAST(o_totalprice AS DOUBLE) > 0
) WHERE rn <= 8
ORDER BY o_orderpriority, o_orderkey
"""


@q("sample_weighted_per_group_orders", SAMPLE_WG_SQL)
def sample_weighted_per_group_orders(spark, sf_dir):
    from ..functions import sampling as S

    o = tbl(spark, sf_dir, "orders").to_spark()
    samp = S.sample_n_weighted_per_group(
        o, "o_orderpriority", "o_orderkey", "o_totalprice", 8)
    return (samp.select("o_orderpriority", "o_orderkey", "o_totalprice")
            .orderBy("o_orderpriority", "o_orderkey"))


# -- PCA whitening (functions/similarity.py pca_whiten): tolerance
#    oracle — whitened output must have ~zero mean, ~unit variance,
#    and ~zero pairwise covariance per component (the definition of
#    whitening), plus the exact row count ------------------------------
PCA_WHITEN_SQL = """
SELECT CAST(range AS BIGINT) AS dim, TRUE AS mean_ok, TRUE AS var_ok,
       TRUE AS decorr_ok,
       (SELECT count(*) FROM embeddings) AS n
FROM range(8) ORDER BY dim
"""


@q("ann_pca_whiten", PCA_WHITEN_SQL)
def ann_pca_whiten(spark, sf_dir):
    """whiten to k=8 components, then verify the whitening contract
    from the OUTPUT alone: per-component mean ≈ 0, variance ≈ 1, and
    each component decorrelated from component 0 (|cov| < 0.05) — any
    broken moment pass, eigen ordering, or scaling flips a flag."""
    from ..functions.similarity import pca_whiten

    emb = tbl(spark, sf_dir, "embeddings").to_spark()
    wh = pca_whiten(emb, dim=64, k=8)
    comp = wh.select(
        F.posexplode("embedding").alias("dim", "x"),
        F.element_at("embedding", 1).alias("x0"))
    return (comp.groupBy("dim")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("x").alias("m"),
                 F.var_samp("x").alias("v"),
                 F.covar_samp("x", "x0").alias("c0"))
            .select(F.col("dim").cast("long").alias("dim"),
                    (F.abs(F.col("m")) < 1e-6).alias("mean_ok"),
                    (F.abs(F.col("v") - 1.0) < 0.05).alias("var_ok"),
                    ((F.col("dim") == 0)
                     | (F.abs(F.col("c0")) < 0.05)).alias("decorr_ok"),
                    "n")
            .orderBy("dim"))


# -- data-quality family (functions/quality.py): one-pass table
#    profile + declarative constraint report ---------------------------
PROFILE_SQL = """
WITH s AS (
  SELECT count(*) AS n FROM orders
)
SELECT * FROM (
  SELECT 'o_orderkey' AS "column", 'bigint' AS dtype, s.n,
         CAST(0 AS BIGINT) AS nulls,
         CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS "distinct",
         CAST(min(o.o_orderkey) AS VARCHAR) AS min_val,
         CAST(max(o.o_orderkey) AS VARCHAR) AS max_val,
         round(avg(o.o_orderkey), 6) AS mean,
         TRUE AS q_ok
  FROM orders o, s GROUP BY s.n
  UNION ALL
  SELECT 'o_orderstatus', 'string', s.n, CAST(0 AS BIGINT),
         CAST(count(DISTINCT o.o_orderstatus) AS BIGINT),
         CAST(min(o.o_orderstatus) AS VARCHAR),
         CAST(max(o.o_orderstatus) AS VARCHAR),
         CAST(NULL AS DOUBLE), TRUE
  FROM orders o, s GROUP BY s.n
  UNION ALL
  SELECT 'o_totalprice', 'double', s.n, CAST(0 AS BIGINT),
         CAST(count(DISTINCT o.o_totalprice) AS BIGINT),
         CAST(min(o.o_totalprice) AS VARCHAR),
         CAST(max(o.o_totalprice) AS VARCHAR),
         round(avg(o.o_totalprice), 6), TRUE
  FROM orders o, s GROUP BY s.n
) ORDER BY "column"
"""


@q("profile_orders_stats", PROFILE_SQL)
def profile_orders_stats(spark, sf_dir):
    """one-pass profile of three orders columns with exact distincts;
    the approximate median is surfaced as a tolerance flag (within 2%
    of the exact percentile or NULL for the string column), everything
    else hash-exact.  min/max/mean of o_totalprice are exact because
    the testdata prices are cent-precision (min/max string-render
    identically; the mean divides an exact decimal-representable sum)."""
    from ..functions.quality import profile_table

    o = tbl(spark, sf_dir, "orders").to_spark()
    prof = profile_table(o, ["o_orderkey", "o_orderstatus", "o_totalprice"],
                         quantiles=(0.5,), exact_distinct=True,
                         relative_error=0.001)
    exact_med = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("__m"))
    return (prof.crossJoin(F.broadcast(exact_med))
            .select("column", "dtype", "n", "nulls", "distinct",
                    "min_val", "max_val",
                    F.round("mean", 6).alias("mean"),
                    F.when(F.col("column") != "o_totalprice", F.lit(True))
                    .otherwise(F.abs(F.col("q50") - F.col("__m"))
                               <= 0.02 * F.col("__m")).alias("q_ok"))
            .orderBy("column"))


VALIDATE_SQL = """
WITH s AS (SELECT count(*) AS n FROM orders)
SELECT * FROM (
  SELECT 'complete(o_orderdate)' AS "check", TRUE AS passed,
         CAST(0 AS BIGINT) AS violations, s.n FROM s
  UNION ALL
  SELECT 'positive_price',
         count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, FALSE)) = 0,
         count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, FALSE)),
         s.n
  FROM orders, s GROUP BY s.n
  UNION ALL
  SELECT 'status_domain',
         count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) = 0,
         count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')),
         s.n
  FROM orders, s GROUP BY s.n
  UNION ALL
  SELECT 'unique(o_orderkey)',
         count(*) - count(DISTINCT o_orderkey) = 0,
         count(*) - count(DISTINCT o_orderkey), s.n
  FROM orders, s GROUP BY s.n
) ORDER BY "check"
"""


@q("validate_orders_constraints", VALIDATE_SQL)
def validate_orders_constraints(spark, sf_dir):
    """declarative constraint report over orders: completeness, a
    range check, a domain check, and key uniqueness — all in one
    aggregation job, hash-exact against the SQL equivalents."""
    from ..functions.quality import validate

    o = tbl(spark, sf_dir, "orders").to_spark()
    return (validate(
        o,
        row_checks={
            "positive_price": F.col("o_totalprice") > 0,
            "status_domain": F.col("o_orderstatus").isin("F", "O", "P"),
        },
        complete=["o_orderdate"],
        unique=["o_orderkey"],
    ).orderBy("check"))


# -- PSI drift between two histogram rollups (functions/sketches.py
#    psi_drift): equi-width binning + PSI algebra are fully
#    SQL-reproducible, so the score is hash-exact after rounding ------
PSI_SQL = """
WITH p AS (
  SELECT o_orderstatus, o_totalprice,
         CASE WHEN o_orderdate < TIMESTAMP '1995-06-01' THEN 'a'
              ELSE 'b' END AS side,
         least(63, greatest(0,
           CAST(floor((o_totalprice - 800.0) / ((600000.0 - 800.0) / 64))
                AS INT))) AS bin
  FROM orders
),
c AS (
  SELECT o_orderstatus, bin,
         count(*) FILTER (WHERE side = 'a') AS ca,
         count(*) FILTER (WHERE side = 'b') AS cb
  FROM p GROUP BY 1, 2
),
t AS (
  SELECT o_orderstatus,
         sum(ca) OVER (PARTITION BY o_orderstatus) AS na,
         sum(cb) OVER (PARTITION BY o_orderstatus) AS nb,
         ca, cb
  FROM c
)
SELECT o_orderstatus,
       round(sum((greatest(ca / na, 1e-6) - greatest(cb / nb, 1e-6))
                 * ln(greatest(ca / na, 1e-6) / greatest(cb / nb, 1e-6))),
             6) AS psi,
       CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b
FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("drift_price_psi", PSI_SQL)
def drift_price_psi(spark, sf_dir):
    """PSI of price per status between the pre- and post-1995-06
    halves of orders, answered from two hist_rollup sketch tables —
    the raw table is scanned once per rollup, never for the score."""
    from ..functions.sketches import hist_rollup, psi_drift

    o = tbl(spark, sf_dir, "orders").to_spark()
    half_a = o.where(F.col("o_orderdate") < "1995-06-01")
    half_b = o.where(F.col("o_orderdate") >= "1995-06-01")
    ra = hist_rollup(half_a, ["o_orderstatus"], "o_totalprice",
                     bins=64, lo=800.0, hi=600000.0)
    rb = hist_rollup(half_b, ["o_orderstatus"], "o_totalprice",
                     bins=64, lo=800.0, hi=600000.0)
    return (psi_drift(ra, rb, ["o_orderstatus"])
            .select("o_orderstatus", F.round("psi", 6).alias("psi"),
                    "n_a", "n_b")
            .orderBy("o_orderstatus"))
