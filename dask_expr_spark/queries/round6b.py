"""Round-6b batch: the sketch-family completion (count-min point
frequencies, KMV distinct-with-INTERSECTION) plus the membership /
incremental-maintenance family (Bloom-prefiltered exact dedup, SCD-1
upsert, partition-pruned parquet upsert).

Every estimate here is md5-deterministic, so the DuckDB oracles
reproduce the SKETCH ANSWERS hash-exactly (not just tolerance bands) —
the same discipline the MinHash/SimHash family established.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ._util import cent_sum, cent_sum_sql, tbl

QUERIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


# -- count-min rollup (functions/sketches.py cms_rollup/_merge/
#    _estimate): sketch per o_orderstatus, merged globally, probed with
#    the 20 heaviest custkeys — estimates reproduced EXACTLY in SQL ----
_CMS_W, _CMS_D = 512, 4

CMS_SQL = f"""
WITH cells AS (
  SELECT t.d,
         ('0x' || substr(md5('cm:' || CAST(t.d AS VARCHAR) || ':'
                              || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           % {_CMS_W} AS b,
         count(*) AS c
  FROM orders CROSS JOIN range({_CMS_D}) t(d)
  GROUP BY 1, 2
),
probe AS (
  SELECT o_custkey, count(*) AS exact_n FROM orders GROUP BY 1
  ORDER BY exact_n DESC, o_custkey LIMIT 20
),
pos AS (
  SELECT p.o_custkey, p.exact_n, t.d,
         ('0x' || substr(md5('cm:' || CAST(t.d AS VARCHAR) || ':'
                              || CAST(p.o_custkey AS VARCHAR)), 1, 15))::BIGINT
           % {_CMS_W} AS b
  FROM probe p CROSS JOIN range({_CMS_D}) t(d)
)
SELECT pos.o_custkey,
       CAST(min(coalesce(c.c, 0)) AS BIGINT) AS freq_est,
       CAST(min(pos.exact_n) AS BIGINT) AS exact_n,
       min(coalesce(c.c, 0)) >= min(pos.exact_n) AS over_ok
FROM pos LEFT JOIN cells c ON c.d = pos.d AND c.b = pos.b
GROUP BY 1 ORDER BY 1
"""


@q("cms_custkey_counts", CMS_SQL)
def cms_custkey_counts(spark, sf_dir):
    """count-min rollup built per o_orderstatus then MERGED globally
    (exercising mergeability), probed with the 20 heaviest custkeys.
    freq_est is hash-exact (md5 buckets reproduce in SQL); over_ok
    verifies the never-undercount guarantee against exact counts."""
    from ..functions.sketches import cms_estimate, cms_rollup

    o = tbl(spark, sf_dir, "orders").to_spark()
    roll = cms_rollup(o, ["o_orderstatus"], "o_custkey",
                      width=_CMS_W, depth=_CMS_D)
    probe = (o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_n"))
             .orderBy(F.desc("exact_n"), "o_custkey").limit(20))
    est = cms_estimate(roll, probe, "o_custkey",
                       width=_CMS_W, depth=_CMS_D)
    return (est.join(probe, "o_custkey")
            .select("o_custkey", "freq_est",
                    F.col("exact_n").cast("long").alias("exact_n"),
                    (F.col("freq_est") >= F.col("exact_n")).alias("over_ok"))
            .orderBy("o_custkey"))


# -- KMV distinct sketch (functions/sketches.py kmv_rollup/_estimate):
#    two overlapping orderkey slices; per-slice distinct estimates are
#    hash-exact reproducible (k smallest md5 hashes + the (k-1)/U_(k)
#    estimator are both deterministic) --------------------------------
_KMV_K = 128
_KMV_SPACE_SQL = "1152921504606846976.0"  # 2^60

_KMV_SRC_SQL = """
  SELECT 'cheap' AS grp, o_orderkey FROM orders WHERE o_totalprice < 150000
  UNION ALL
  SELECT 'mod3' AS grp, o_orderkey FROM orders WHERE o_custkey % 3 = 0
"""

KMV_SQL = f"""
WITH src AS ({_KMV_SRC_SQL}),
h AS (
  SELECT DISTINCT grp,
         ('0x' || substr(md5('kmv:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM src
),
r AS (SELECT grp, hv,
             row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
      FROM h),
kth AS (SELECT grp,
               count(*) FILTER (WHERE rn <= {_KMV_K}) AS sz,
               max(hv) FILTER (WHERE rn = {_KMV_K}) AS hk
        FROM r GROUP BY 1),
est AS (SELECT grp,
               CASE WHEN sz < {_KMV_K} THEN sz
                    ELSE CAST(floor({_KMV_K - 1}.0 * {_KMV_SPACE_SQL}
                                    / CAST(hk AS DOUBLE)) AS BIGINT)
               END AS distinct_est
        FROM kth),
ex AS (SELECT grp, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS exact_n
       FROM src GROUP BY 1)
SELECT e.grp, e.distinct_est, x.exact_n,
       abs(e.distinct_est - x.exact_n) <= 0.30 * x.exact_n AS est_ok
FROM est e JOIN ex x USING (grp) ORDER BY grp
"""


def _kmv_slices(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders").to_spark()
    a = (o.where(F.col("o_totalprice") < 150000)
         .withColumn("grp", F.lit("cheap")))
    b = (o.where(F.col("o_custkey") % 3 == 0)
         .withColumn("grp", F.lit("mod3")))
    return a, b


@q("kmv_distinct_slices", KMV_SQL)
def kmv_distinct_slices(spark, sf_dir):
    from ..functions.sketches import kmv_estimate, kmv_rollup

    a, b = _kmv_slices(spark, sf_dir)
    roll = kmv_rollup(a.unionByName(b), ["grp"], "o_orderkey", k=_KMV_K)
    est = kmv_estimate(roll, ["grp"])
    exact = (a.unionByName(b).groupBy("grp")
             .agg(F.countDistinct("o_orderkey").alias("exact_n")))
    return (est.join(exact, "grp")
            .select("grp", "distinct_est", "exact_n",
                    (F.abs(F.col("distinct_est") - F.col("exact_n"))
                     <= 0.30 * F.col("exact_n")).alias("est_ok"))
            .orderBy("grp"))


# -- KMV INTERSECTION (kmv_intersect — the capability HLL sketches
#    lack): |cheap ∩ mod3| estimated from the two sketches alone;
#    union sketch, inclusion fraction, and both estimators reproduce
#    hash-exactly in SQL ------------------------------------------------
KMV_INTER_SQL = f"""
WITH src AS ({_KMV_SRC_SQL}),
h AS (
  SELECT DISTINCT grp,
         ('0x' || substr(md5('kmv:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM src
),
r AS (SELECT grp, hv,
             row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
      FROM h),
sk AS (SELECT grp, hv FROM r WHERE rn <= {_KMV_K}),
u AS (SELECT hv FROM (SELECT DISTINCT hv FROM sk) ORDER BY hv LIMIT {_KMV_K}),
stats AS (
  SELECT (SELECT count(*) FROM u) AS szu,
         (SELECT max(hv) FROM u) AS hku,
         (SELECT count(*) FROM u
          WHERE hv IN (SELECT hv FROM sk WHERE grp = 'cheap')
            AND hv IN (SELECT hv FROM sk WHERE grp = 'mod3')) AS rho
),
est AS (
  SELECT rho, szu,
         CASE WHEN szu < {_KMV_K} THEN szu
              ELSE CAST(floor({_KMV_K - 1}.0 * {_KMV_SPACE_SQL}
                              / CAST(hku AS DOUBLE)) AS BIGINT)
         END AS union_est
  FROM stats
),
est2 AS (
  SELECT CAST(floor((CAST(rho AS DOUBLE) / CAST(szu AS DOUBLE))
                    * CAST(union_est AS DOUBLE)) AS BIGINT) AS inter_est,
         union_est
  FROM est
),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM (
    SELECT o_orderkey FROM src WHERE grp = 'cheap'
    INTERSECT
    SELECT o_orderkey FROM src WHERE grp = 'mod3')
)
SELECT inter_est, union_est, exact_inter,
       abs(inter_est - exact_inter) <= 0.35 * exact_inter AS inter_ok
FROM est2, ex
"""


@q("kmv_intersect_slices", KMV_INTER_SQL)
def kmv_intersect_slices(spark, sf_dir):
    from ..functions.sketches import kmv_intersect, kmv_rollup

    a, b = _kmv_slices(spark, sf_dir)
    ra = kmv_rollup(a, [], "o_orderkey", k=_KMV_K)
    rb = kmv_rollup(b, [], "o_orderkey", k=_KMV_K)
    inter = kmv_intersect(ra, rb).withColumn("k", F.lit(_KMV_K))
    exact = (a.select("o_orderkey").intersect(b.select("o_orderkey"))
             .agg(F.count(F.lit(1)).alias("exact_inter"))
             .withColumn("k", F.lit(_KMV_K)))
    # 1-row ⋈ 1-row on the sketch parameter k: an equi-join (broadcast
    # hash), not a cartesian attach
    return (inter.join(exact, "k")
            .select("inter_est", "union_est", "exact_inter",
                    (F.abs(F.col("inter_est") - F.col("exact_inter"))
                     <= 0.35 * F.col("exact_inter")).alias("inter_ok")))


# -- Bloom-prefiltered exact incremental dedup (sketches.bloom_index +
#    dedup.exact_dedup_against_bloom): the oracle is the SAME answer as
#    the unfiltered path — Bloom filters have no false negatives, so
#    the prefilter is answer-preserving; any false-negative bug flips
#    a dup_of to NULL and the hash catches it --------------------------
BLOOM_INCR_SQL = """
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


@q("dedup_bloom_incremental", BLOOM_INCR_SQL)
def dedup_bloom_incremental(spark, sf_dir):
    from ..functions import dedup as DD
    from ..functions.sketches import bloom_index

    docs = tbl(spark, sf_dir, "documents").to_spark()
    # materialize the index: in the incremental pattern it IS a stored
    # table (exact_hash_index docstring) — as a lazy plan it would be
    # re-derived by the bloom sizing count, the bitmap build, AND the
    # join (measured 3x at the x1000 probe: 185 s -> 83 s).
    # localCheckpoint rather than persist(): persist registers the
    # subtree in the session cache manager, which silently substitutes
    # InMemoryRelation into OTHER queries' identical subtrees
    index = DD.exact_hash_index(
        docs.where(F.col("doc_id") % 10 != 0), "doc_id", "text") \
        .localCheckpoint(eager=False)
    bloom = bloom_index(index, "text_hash", fpp=0.01)
    return (DD.exact_dedup_against_bloom(
        docs.where(F.col("doc_id") % 10 == 0), index, bloom,
        "doc_id", "text")
        .orderBy("id"))


# -- SCD-1 upsert (functions/maintenance.py upsert): updates replace,
#    inserts append, intra-batch duplicate keys resolved by order_col
#    (highest version wins) — aggregate answer is hash-exact -----------
UPSERT_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 200.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey + 3000000, o_custkey, o_orderstatus,
         o_totalprice + 200.0, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
),
merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u
                    WHERE u.o_orderkey = o.o_orderkey)
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       CAST(count(*) FILTER (WHERE o_orderkey > 3000000) AS BIGINT)
         AS n_inserted
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("upsert_orders_scd1", UPSERT_SQL)
def upsert_orders_scd1(spark, sf_dir):
    """two versions of each update row land in the batch (v1 +100,
    v2 +200); order_col='__v' must pick v2, same-key target rows are
    replaced, and the +3000000 synthetic keys insert."""
    from ..functions.maintenance import upsert

    o = tbl(spark, sf_dir, "orders").to_spark()
    base = o.where(F.col("o_orderkey") % 97 == 0)
    inserts = base.withColumn("o_orderkey",
                              F.col("o_orderkey") + 3000000)
    v1 = (base.unionByName(inserts)
          .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
          .withColumn("__v", F.lit(1)))
    v2 = (base.unionByName(inserts)
          .withColumn("o_totalprice", F.col("o_totalprice") + 200.0)
          .withColumn("__v", F.lit(2)))
    res = upsert(o, v1.unionByName(v2), ["o_orderkey"], order_col="__v")
    return (res.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 cent_sum(F.col("o_totalprice")).alias("total"),
                 F.count_if(F.col("o_orderkey") > 3000000)
                 .alias("n_inserted"))
            .orderBy("o_orderstatus"))


# -- partition-pruned upsert-in-place (maintenance.upsert_partitioned):
#    hive-partitioned parquet roundtrip where only the touched
#    partitions are read and rewritten; untouched partition FILES are
#    asserted byte-identical (name+size snapshot) ----------------------
UPSERT_PART_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 500.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders
  WHERE o_orderkey % 53 = 0
    AND o_orderpriority IN ('1-URGENT', '3-MEDIUM')
),
merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u
                    WHERE u.o_orderkey = o.o_orderkey)
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('o_totalprice')} AS total,
       TRUE AS touched_ok, TRUE AS untouched_ok
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@q("upsert_partitioned_roundtrip", UPSERT_PART_SQL)
def upsert_partitioned_roundtrip(spark, sf_dir):
    from ..functions.maintenance import upsert_partitioned

    o = tbl(spark, sf_dir, "orders").to_spark()
    tmp = tempfile.mkdtemp(prefix="upsert_part_")
    path = os.path.join(tmp, "t")
    try:
        (o.hint("rebalance", "o_orderpriority")   # guide §6: dir-sized
         .write.mode("overwrite").partitionBy("o_orderpriority")
         .parquet(path))

        def _snapshot():
            out = {}
            for root, _dirs, files in os.walk(path):
                for fn in files:
                    if fn.endswith(".parquet"):
                        p = os.path.join(root, fn)
                        out[p] = os.path.getsize(p)
            return out

        before = _snapshot()
        updates = (o.where((F.col("o_orderkey") % 53 == 0)
                           & F.col("o_orderpriority").isin(
                               "1-URGENT", "3-MEDIUM"))
                   .withColumn("o_totalprice",
                               F.col("o_totalprice") + 500.0))
        touched = upsert_partitioned(spark, path, updates,
                                     ["o_orderkey"], "o_orderpriority")
        after = _snapshot()
        touched_dirs = tuple(f"o_orderpriority={t}" for t in touched)
        untouched_ok = all(
            before.get(p) == sz for p, sz in after.items()
            if not any(d in p for d in touched_dirs)) and all(
            p in after for p in before
            if not any(d in p for d in touched_dirs))
        touched_ok = sorted(touched) == ["1-URGENT", "3-MEDIUM"]
        back = spark.read.parquet(path)
        result = (back.groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n"),
                       cent_sum(F.col("o_totalprice")).alias("total"))
                  .withColumn("touched_ok", F.lit(bool(touched_ok)))
                  .withColumn("untouched_ok", F.lit(bool(untouched_ok)))
                  .orderBy("o_orderstatus"))
        return spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- MMR diversified re-rank (functions/similarity.py mmr_rerank): the
#    greedy path is deterministic (float64 + smallest-id ties), so the
#    oracle UNROLLS the k=5 selection steps as argmax CTEs and the
#    whole rerank is hash-exact — the same discipline as the exact ANN
#    oracles ---------------------------------------------------------
_MMR_LAM = 0.7
_MMR_OML = repr(1.0 - 0.7)  # the exact double Spark computes for 1-lam
_MMR_K = 5


def _mmr_sql() -> str:
    head = f"""
WITH qv AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 100 = 0
),
corp AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.query_id, c.id,
         list_dot_product(q.v, c.v)
           / (sqrt(list_dot_product(q.v, q.v))
              * sqrt(list_dot_product(c.v, c.v))) AS rel,
         c.v
  FROM qv q, corp c WHERE c.id <> q.query_id
),
cand AS (
  SELECT query_id, id, rel,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, id) AS rn
        FROM scored) WHERE rn <= 20
),
m0 AS (SELECT query_id, id, rel, nv, 0.0 AS maxsim FROM cand)"""
    parts, unions = [head], []
    prev = "m0"
    for r in range(1, _MMR_K + 1):
        parts.append(f"""sel{r} AS (
  SELECT query_id, id, nv AS sv,
         {_MMR_LAM} * rel - {_MMR_OML} * maxsim AS mmr
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY ({_MMR_LAM} * rel - {_MMR_OML} * maxsim) DESC, id) AS rn
        FROM {prev}) WHERE rn = 1)""")
        unions.append(f"SELECT query_id, id AS neighbor_id, "
                      f"{r} AS rank, mmr FROM sel{r}")
        if r < _MMR_K:
            parts.append(f"""m{r} AS (
  SELECT m.query_id, m.id, m.rel, m.nv,
         greatest(m.maxsim, list_dot_product(m.nv, s.sv)) AS maxsim
  FROM {prev} m JOIN sel{r} s
    ON m.query_id = s.query_id AND m.id <> s.id)""")
            prev = f"m{r}"
    return (",\n".join(parts)
            + "\nSELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,"
              " round(mmr, 6) AS mmr FROM (\n"
            + "\nUNION ALL\n".join(unions)
            + "\n) ORDER BY query_id, rank")


@q("ann_mmr_rerank", _mmr_sql())
def ann_mmr_rerank(spark, sf_dir):
    """retrieve top-20 exact cosine candidates per query (the round-2
    brute-force baseline), then MMR-select 5 at lam=0.7 — the
    diversity pass a RAG pipeline runs between ANN and the context
    window; selection order and scores hash-exact vs the unrolled
    greedy in SQL."""
    from ..functions import similarity as SIM

    emb = tbl(spark, sf_dir, "embeddings").to_spark()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    cand = SIM.cosine_topk(emb, queries, "vec_id", "embedding", k=20)
    cand = cand.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id")
    res = SIM.mmr_rerank(cand, "query_id", "neighbor_id", "cos",
                         "embedding", k=_MMR_K, lam=_MMR_LAM)
    return (res.select("query_id", "neighbor_id",
                       F.col("rank").cast("long").alias("rank"),
                       F.round("mmr", 6).alias("mmr"))
            .orderBy("query_id", "rank"))


# -- CMS inner product = equi-join cardinality estimate (sketches.
#    cms_inner_product): min_d of the per-row dot product of two cell
#    grids — fully deterministic, reproduced exactly in SQL, and
#    over_ok checks the never-underestimate guarantee against the real
#    join count -------------------------------------------------------
_CMSJ_W, _CMSJ_D = 1024, 4


def _cmsj_cells_sql(side_filter: str) -> str:
    return f"""
  SELECT t.d,
         ('0x' || substr(md5('cm:' || CAST(t.d AS VARCHAR) || ':'
                              || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           % {_CMSJ_W} AS b,
         count(*) AS v
  FROM orders CROSS JOIN range({_CMSJ_D}) t(d)
  WHERE {side_filter}
  GROUP BY 1, 2"""


CMS_JOIN_SQL = f"""
WITH ca AS ({_cmsj_cells_sql("o_orderdate < TIMESTAMP '1997-07-01'")}),
cb AS ({_cmsj_cells_sql("o_orderdate >= TIMESTAMP '1997-07-01'")}),
dots AS (
  SELECT ca.d, sum(ca.v * cb.v) AS dot
  FROM ca JOIN cb ON ca.d = cb.d AND ca.b = cb.b
  GROUP BY 1
),
est AS (SELECT CAST(min(dot) AS BIGINT) AS join_est FROM dots),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_n
  FROM (SELECT o_custkey FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-07-01') a
  JOIN (SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01') b
    USING (o_custkey)
)
SELECT est.join_est, ex.exact_n,
       est.join_est >= ex.exact_n AS over_ok
FROM est, ex
"""


@q("cms_join_cardinality", CMS_JOIN_SQL)
def cms_join_cardinality(spark, sf_dir):
    """estimate |first-half ⋈ second-half on o_custkey| from the two
    CMS sketches alone — the planner's join-size question answered
    without running the join; join_est hash-exact, over_ok verifies
    the never-underestimate guarantee vs the real join count."""
    from ..functions.sketches import cms_inner_product, cms_rollup

    o = tbl(spark, sf_dir, "orders").to_spark()
    a = o.where(F.col("o_orderdate") < "1997-07-01")
    b = o.where(F.col("o_orderdate") >= "1997-07-01")
    ra = cms_rollup(a, [], "o_custkey", width=_CMSJ_W, depth=_CMSJ_D)
    rb = cms_rollup(b, [], "o_custkey", width=_CMSJ_W, depth=_CMSJ_D)
    est = cms_inner_product(ra, rb).select("join_est") \
        .withColumn("__one", F.lit(1))
    # exact |A ⋈ B| without materializing the join: count per key on
    # each side, then Σ n_a·n_b over matching keys — the join's
    # row-multiplicity identity.  The old shape sort-merge-joined the
    # full fact rows (15M shuffled + fanned-out output) to produce one
    # count; this shape's shuffles are partial-agged per side and the
    # final join is distinct-key-sized (guide §2.3 aggregate before
    # you shuffle; measured 5.2 s → sub-second at x100)
    ca = a.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("__na"))
    cb = b.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("__nb"))
    exact = (ca.join(cb, "o_custkey")
             .agg(F.coalesce(F.sum(F.col("__na") * F.col("__nb")),
                             F.lit(0)).cast("long").alias("exact_n"))
             .withColumn("__one", F.lit(1)))
    return (est.join(exact, "__one").drop("__one")
            .select("join_est", "exact_n",
                    (F.col("join_est") >= F.col("exact_n"))
                    .alias("over_ok")))


# -- table_diff (maintenance.table_diff): audit the SCD-1 upsert — the
#    oracle derives the expected counts from first principles (every
#    %97 key changes price, every +3000000 key is added, nothing is
#    removed) ---------------------------------------------------------
DIFF_SQL = """
WITH u AS (SELECT CAST(count(*) AS BIGINT) AS c
           FROM orders WHERE o_orderkey % 97 = 0),
t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
SELECT u.c AS n_added, CAST(0 AS BIGINT) AS n_removed,
       u.c AS n_changed, t.n - u.c AS n_unchanged
FROM u, t
"""


@q("diff_after_upsert", DIFF_SQL)
def diff_after_upsert(spark, sf_dir):
    from ..functions.maintenance import table_diff, upsert

    o = tbl(spark, sf_dir, "orders").to_spark()
    base = o.where(F.col("o_orderkey") % 97 == 0)
    upd = (base.unionByName(
        base.withColumn("o_orderkey", F.col("o_orderkey") + 3000000))
        .withColumn("o_totalprice", F.col("o_totalprice") + 200.0))
    after = upsert(o, upd, ["o_orderkey"])
    return table_diff(o, after, ["o_orderkey"])


# -- small-file compaction (maintenance.compact_parquet): 64 shard
#    files fold to the byte-targeted count; the data is byte-identical
#    (the aggregate hash proves it) and the file counts are flagged ---
COMPACT_SQL = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       {cent_sum_sql('l_extendedprice')} AS total,
       TRUE AS compacted_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@q("compact_roundtrip_lineitem", COMPACT_SQL)
def compact_roundtrip_lineitem(spark, sf_dir):
    from ..functions.maintenance import compact_parquet

    li = tbl(spark, sf_dir, "lineitem").to_spark()
    tmp = tempfile.mkdtemp(prefix="compact_")
    path = os.path.join(tmp, "t")
    try:
        li.repartition(64).write.mode("overwrite").parquet(path)
        before, after = compact_parquet(spark, path, target_mb=64)
        back = spark.read.parquet(path)
        ok = before == 64 and after < before
        out = (back.groupBy("l_returnflag")
               .agg(F.count(F.lit(1)).alias("n"),
                    cent_sum(F.col("l_extendedprice")).alias("total"))
               .withColumn("compacted_ok", F.lit(bool(ok)))
               .orderBy("l_returnflag"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
