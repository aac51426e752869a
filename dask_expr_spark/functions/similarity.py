"""Similarity search over embedding columns (array<float>) —
brute-force cosine top-k as the exact baseline, hyperplane-LSH
bucketing as the 100 TB scale path.

Everything is column expressions + joins; embeddings are cast to
double before any arithmetic so results are engine-exact (float math
is not), and dot products fold left-to-right (sequential) matching
other engines' sequential loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """exact brute-force top-k neighbors per query vector.

    The query side is broadcast (small by construction); the corpus
    side streams — no shuffle of the big table at all, so this scales
    linearly with corpus size. Output: (query_id, neighbor_id, cos, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("__qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__vv")
    )
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("__qv"), F.col("__vv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplane_signature(vec: Column, dim: int, num_planes: int = 16, seed: int = 42) -> Column:
    """deterministic random-hyperplane LSH signature (bigint bitmap).

    Plane weights are pseudo-random in [-1, 1), derived from
    xxhash64(seed, plane, coordinate) — fully reproducible, no
    driver-side randomness, no broadcast of a weight matrix.
    """
    def plane_bit(p: int) -> Column:
        weighted = F.zip_with(
            vec,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2_000_000)).cast("double")
                    / F.lit(1_000_000.0)
                    - 1.0
                ),
            ),
            lambda x, w: x * w,
        )
        s = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for p in range(num_planes):
        out = out + plane_bit(p)
    return out


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_tables: int = 16,
    planes_per_table: int = 4,
) -> DataFrame:
    """approximate top-k via MULTI-TABLE hyperplane LSH: L independent
    signatures of p planes each; a (query, vector) pair is compared
    when they collide in ANY table. Recall for a pair at angle θ is
    1-(1-(1-θ/π)^p)^L — tune (L, p) to the corpus: more planes per
    table shrinks buckets (cheaper, lower recall), more tables raise
    recall. The cross join becomes an equi-join on (table, bucket):
    hash-partitioned, broadcast-free, linear in corpus size — the
    100 TB path."""

    def with_sigs(df: DataFrame, idname: str, vecname: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    hyperplane_signature(
                        F.col(vecname), dim, planes_per_table, seed=42 + 1000 * t
                    ).alias("bucket"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(idname), F.col(vecname), F.explode(sigs).alias("tb")
        ).select(idname, vecname, "tb.table", "tb.bucket")

    v = with_sigs(
        vectors.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__vv")),
        "neighbor_id", "__vv",
    )
    q = with_sigs(
        queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("__qv")),
        "query_id", "__qv",
    )
    cand = (
        v.join(q, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__vv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cos", cosine(F.col("__qv"), F.col("__vv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def centroids_by_label(
    vectors: DataFrame, label_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """per-label centroid (IVF coarse quantizer training step):
    posexplode → exact decimal mean per dimension → re-assemble sorted
    by position. Shuffles on (label, pos) — fully parallel in dim×labels."""
    exploded = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "val"),
    )
    per_dim = exploded.groupBy("label", "pos").agg(
        (F.sum(F.col("val").cast("decimal(27,9)")).cast("double") / F.count("val")).alias("mean_val"),
        F.count("val").alias("n"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("mean_val")))
            ).alias("__pairs"),
            F.first("n").alias("n_vectors"),
        )
        .select(
            "label",
            F.transform(F.col("__pairs"), lambda s: s.getField("mean_val")).alias("centroid"),
            "n_vectors",
        )
    )
