"""Similarity search over embedding columns (array<float>) —
brute-force cosine top-k as the exact baseline, hyperplane-LSH
bucketing as the 100 TB scale path.

Everything is column expressions + joins; embeddings are cast to
double before any arithmetic so results are engine-exact (float math
is not), and dot products fold left-to-right (sequential) matching
other engines' sequential loops.
"""

from __future__ import annotations

import pandas as pd

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


# Ceiling on the query-frame rows cosine_topk / cosine_topk_int8 will
# collect to the driver (their documented contract: the query side
# plays the broadcast role). Same enforceable-contract shape as the
# get_dummies 10k cap (collection.py). Set to -1 to disable.
MAX_QUERY_ROWS_CONF = "dask_expr_spark.similarity.max_query_rows"
_MAX_QUERY_ROWS_DEFAULT = 10_000


def _collect_query_matrix(queries: DataFrame, id_col: str, vec_col: str):
    """Collect the (small-by-contract) query set as (ids, matrix),
    refusing with a clear error — before any driver memory is at risk —
    when it exceeds the configured cap. limit(cap+1) detects overflow
    without counting the frame."""
    import numpy as np

    try:
        cap = int(queries.sparkSession.conf.get(
            MAX_QUERY_ROWS_CONF, str(_MAX_QUERY_ROWS_DEFAULT)))
    except Exception:
        cap = _MAX_QUERY_ROWS_DEFAULT
    sel = queries.select(id_col, vec_col)
    if cap >= 0:
        qrows = sel.limit(cap + 1).collect()
        if len(qrows) > cap:
            raise ValueError(
                "cosine_topk collects the QUERY side to the driver by "
                f"contract (it plays the broadcast role); this query frame "
                f"exceeds {MAX_QUERY_ROWS_CONF}={cap} rows. For large query "
                "sets use cosine_topk_blocked (exact, fully distributed) "
                "or lsh_bucketed_topk/ivf_topk (approximate, sublinear), "
                "or raise the cap (-1 disables)."
            )
    else:
        qrows = sel.collect()
    qids = np.array([r[0] for r in qrows], dtype="int64")
    Q = np.array([list(r[1]) for r in qrows], dtype="float64")
    return qids, Q


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """exact brute-force top-k neighbors per query vector.

    Scale shape: the query set is small by contract (it plays the
    broadcast role — here materialized into the closure as a numpy
    matrix); the corpus STREAMS through an Arrow-batched matmul that
    emits only each batch's local top-k per query. Any global top-k
    row is necessarily in its batch's top-k, so the final window ranks
    just (#batches × q × k) candidate rows instead of shuffling the
    full n × q score matrix. Output: (query_id, neighbor_id, cos, rank).
    """
    import numpy as np
    from pyspark.sql import types as T

    qids, Q = _collect_query_matrix(queries, id_col, vec_col)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def batches(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype="int64")
            M = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = Mn @ Qn.T  # (n_batch, n_queries)
            # mask self-matches before taking the batch top-k
            for j, qid in enumerate(qids):
                S[ids == qid, j] = -np.inf
            top = min(k, len(ids))
            part = np.argpartition(-S, top - 1, axis=0)[:top]  # (top, q)
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(qids):
                idx = part[:, j]
                out_q.extend([qid] * len(idx))
                out_n.extend(ids[idx])
                out_c.extend(S[idx, j])
            yield pd.DataFrame(
                {"query_id": pd.Series(out_q, dtype="int64"),
                 "neighbor_id": pd.Series(out_n, dtype="int64"),
                 "cos": pd.Series(out_c, dtype="float64")}
            )

    cand = vectors.select(id_col, vec_col).mapInPandas(batches, schema)
    # drop the -inf-masked self rows: in a batch smaller than k they
    # would otherwise survive the local top-k and leak into the output
    cand = cand.filter(
        (F.col("query_id") != F.col("neighbor_id")) & (F.col("cos") != F.lit(float("-inf")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _pack_matrix_blocks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_rows: int,
    ids_name: str,
    mat_name: str,
) -> DataFrame:
    """pack a vector frame into matrix blocks, map-only (no shuffle):
    one output row per ≤block_rows input rows, carrying (ids:
    array<bigint>, mat: array<double> row-major, L2-NORMALIZED so a
    dot product downstream IS the cosine). Buffers across Arrow
    chunks inside each partition so blocks reach block_rows even when
    the Arrow batch size is smaller."""
    import numpy as np
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(ids_name, T.ArrayType(T.LongType())),
        T.StructField(mat_name, T.ArrayType(T.DoubleType())),
    ])

    def pack(it):
        ids_buf: list = []
        mat_buf: list = []
        n = 0

        def emit(ids_cat, mat_cat):
            return pd.DataFrame({
                ids_name: [ids_cat.tolist()],
                mat_name: [mat_cat.reshape(-1).tolist()],
            })

        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            M = np.asarray([np.asarray(v, dtype="float64")
                            for v in pdf[vec_col]])
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            ids_buf.append(ids)
            mat_buf.append(Mn)
            n += len(ids)
            while n >= block_rows:
                ids_cat = np.concatenate(ids_buf)
                mat_cat = np.concatenate(mat_buf)
                yield emit(ids_cat[:block_rows], mat_cat[:block_rows])
                ids_buf = [ids_cat[block_rows:]]
                mat_buf = [mat_cat[block_rows:]]
                n -= block_rows
        if n:
            yield emit(np.concatenate(ids_buf), np.concatenate(mat_buf))

    return df.select(id_col, vec_col).mapInPandas(pack, schema)


def cosine_topk_blocked(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    corpus_block_rows: int = 8192,
    query_block_rows: int = 4096,
) -> DataFrame:
    """exact brute-force top-k with NO driver-side query collection —
    the uncapped alternative to cosine_topk for large query sets
    (e.g. benchmark-decontamination sweeps where the 'query' side is
    itself a corpus).

    Scale shape: both sides are packed map-only into L2-normalized
    matrix blocks (one fat row per ≤block_rows vectors), and the
    corpus×query BLOCK GRID — not the row-level cross product — is the
    join: C×Q tasks, each one BLAS matmul emitting its block-local
    top-k per query (any global top-k row is necessarily in its
    corpus-block top-k). The merge then ranks only C_blocks × k
    candidate rows per query via a map-side-partial collect_list +
    sorted slice — never a row-level shuffle of the n×q score matrix.
    The quadratic block grid is the honest cost of EXACT brute force;
    for sublinear candidate generation use lsh_bucketed_topk/ivf_topk.
    Output: (query_id, neighbor_id, cos, rank) — identical contract to
    cosine_topk."""
    import numpy as np
    from pyspark.sql import types as T

    c = _pack_matrix_blocks(vectors, id_col, vec_col,
                            corpus_block_rows, "__cids", "__cmat")
    q = _pack_matrix_blocks(queries, id_col, vec_col,
                            query_block_rows, "__qids", "__qmat")
    grid = c.crossJoin(q)  # C×Q block rows — the task grid

    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])

    def score(it):
        for pdf in it:
            for ci, cm, qi, qm in zip(pdf["__cids"], pdf["__cmat"],
                                      pdf["__qids"], pdf["__qmat"]):
                cids = np.asarray(ci, dtype="int64")
                cmat = np.asarray(cm, dtype="float64").reshape(len(cids), -1)
                qids = np.asarray(qi, dtype="int64")
                qmat = np.asarray(qm, dtype="float64").reshape(len(qids), -1)
                S = cmat @ qmat.T  # (nc, nq); rows pre-normalized
                for j, qid in enumerate(qids):
                    S[cids == qid, j] = -np.inf
                top = min(k, len(cids))
                part = np.argpartition(-S, top - 1, axis=0)[:top]
                out_q, out_n, out_c = [], [], []
                for j, qid in enumerate(qids):
                    idx = part[:, j]
                    out_q.extend([qid] * len(idx))
                    out_n.extend(cids[idx])
                    out_c.extend(S[idx, j])
                yield pd.DataFrame({
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "cos": pd.Series(out_c, dtype="float64"),
                })

    cand = (grid.mapInPandas(score, schema)
            .filter((F.col("query_id") != F.col("neighbor_id"))
                    & (F.col("cos") != F.lit(float("-inf")))))
    # bounded merge: ≤ C_blocks × k candidates per query; collect_list
    # partial-aggregates map-side, struct(-cos, id) sorts cos desc with
    # deterministic id tie-break (negation is IEEE-exact)
    top = cand.groupBy("query_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct(
                (-F.col("cos")).alias("neg"),
                F.col("neighbor_id").alias("nid")))),
            1, k).alias("__top"))
    return (top.select("query_id", F.posexplode("__top").alias("__pos", "__t"))
            .select("query_id",
                    F.col("__t.nid").alias("neighbor_id"),
                    (-F.col("__t.neg")).alias("cos"),
                    (F.col("__pos") + 1).cast("int").alias("rank")))


def _plane_weights(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """deterministic Gaussian hyperplane weights, generated once on the
    driver (tiny: num_planes × dim floats) and embedded as plan
    literals — no per-row hash chains, no weight-matrix broadcast."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def hyperplane_signature(vec: Column, dim: int, num_planes: int = 16, seed: int = 42) -> Column:
    """deterministic random-hyperplane LSH signature (bigint bitmap):
    bit p = sign(vec · w_p). Weights are constant literals, so the
    whole signature stays inside whole-stage codegen."""
    weights = _plane_weights(dim, num_planes, seed)

    def plane_bit(p: int) -> Column:
        warr = F.array(*[F.lit(float(w)) for w in weights[p]])
        s = F.aggregate(
            F.zip_with(vec, warr, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for p in range(num_planes):
        out = out + plane_bit(p)
    return out


def multi_table_signatures(
    df: DataFrame,
    id_name: str,
    vec_col: str,
    dim: int,
    num_tables: int,
    planes_per_table: int,
    seed: int = 42,
) -> DataFrame:
    """all LSH-table buckets in one pass: an Arrow-batched pandas UDF
    does ONE numpy matmul (batch × dim) @ (dim × total_planes) per
    batch and packs sign bits per table. Spark's higher-order
    functions are interpreted (not codegen'd), so a per-plane fold is
    ~64 Catalyst evals per row; BLAS does the whole batch at memory
    speed. Output: (id, table, bucket) — one row per table."""
    import numpy as np
    from pyspark.sql import types as T

    total = num_tables * planes_per_table
    rng = np.random.RandomState(seed)
    W = rng.standard_normal((dim, total))  # column p = plane p
    packs = (1 << (np.arange(total) % planes_per_table)).astype("int64")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(v, dtype="float64") for v in vecs])
        bits = (M @ W) > 0  # (n, total)
        packed = bits * packs  # weighted bits
        per_table = packed.reshape(len(M), num_tables, planes_per_table).sum(axis=2)
        return pd.Series(per_table.astype("int64").tolist())

    return (
        df.select(F.col(id_name), buckets(F.col(vec_col)).alias("__bkts"))
        .select(F.col(id_name), F.posexplode(F.col("__bkts")).alias("table", "bucket"))
    )


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_tables: int = 16,
    planes_per_table: int | str = "auto",
    target_bucket_rows: int = 128,
) -> DataFrame:
    """approximate top-k via MULTI-TABLE hyperplane LSH: L independent
    signatures of p planes each; a (query, vector) pair is compared
    when they collide in ANY table. Recall for a pair at angle θ is
    1-(1-(1-θ/π)^p)^L — tune (L, p) to the corpus: more planes per
    table shrinks buckets (cheaper, lower recall), more tables raise
    recall. The cross join becomes an equi-join on (table, bucket):
    hash-partitioned, broadcast-free — the 100 TB path.

    SIZING IS THE SCALE CONTRACT: per-bucket candidate work is
    (queries/bucket) × (corpus/bucket) × buckets, so a FIXED p makes
    the pipeline superlinear once buckets deepen — measured 1.48×
    linear at a ×100 corpus with p frozen at 4 (SCALE.md), vs 0.04×
    with p sized to the corpus. The DEFAULT is therefore
    ``planes_per_table="auto"`` (round 6 — the measured-bad fixed-p
    configuration is opt-in only): p = ceil(log2(n /
    target_bucket_rows)) from one count() of the corpus, keeping
    expected bucket depth ~target_bucket_rows at any scale. Raising p
    lowers per-table recall, so hold recall by raising ``num_tables``
    alongside (the formula above; +1 plane ≈ ×1.6 tables for a 30°
    pair)."""
    if planes_per_table == "auto":
        import math

        n = vectors.count()
        planes_per_table = max(
            4, int(math.ceil(math.log2(max(2.0, n / target_bucket_rows)))))
    elif not isinstance(planes_per_table, int):
        raise ValueError(
            f"planes_per_table must be an int or 'auto', got {planes_per_table!r}")

    # (id, table, bucket) only — vectors are re-attached per surviving
    # candidate pair, not shuffled through the num_tables-way explode
    vv = vectors.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__vv"))
    qv = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("__qv"))
    v = multi_table_signatures(vv, "neighbor_id", "__vv", dim, num_tables, planes_per_table)
    q = multi_table_signatures(qv, "query_id", "__qv", dim, num_tables, planes_per_table)
    cand = (
        v.join(q, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # JOIN ORDER IS A SHUFFLE-VOLUME CONTRACT: attach each vector while
    # the candidate rows are still SKINNY (16 B/pair) — corpus vector
    # first, query vector second. The former order dragged a dim×8-byte
    # query-vector payload through the neighbor_id exchange with EVERY
    # candidate pair: at a ×1000 probe (2 M corpus, 58 M candidates)
    # that was a ~30 GB shuffle that filled the disk; this order
    # shuffles ~2 GB. No forced broadcast on qv — the query side can
    # itself be corpus-sized, so AQE broadcasts it while it fits and
    # falls back to a shuffle join keyed on query_id (which the rank
    # window below then reuses) when it doesn't.
    scored = (
        cand.join(vv, "neighbor_id")
        .join(qv, "query_id")
        .withColumn("cos", cosine(F.col("__qv"), F.col("__vv")))
        .select("query_id", "neighbor_id", "cos")  # vectors pruned pre-window
    )
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


def _train_ivf_cells(vv: DataFrame, id_name: str, vec_alias: str,
                     num_cells: int, lloyd_iters: int) -> DataFrame:
    """shared IVF coarse-quantizer trainer (ivf_topk + semantic_cells):
    deterministic lowest-id seeding (no RNG), then lloyd_iters rounds
    of distributed Lloyd — assignment is a broadcast compare, centroid
    recompute shuffles only (cells x dim) aggregates. Returns cached
    (cell, __cent)."""
    seeds = (vv.orderBy(id_name).limit(num_cells)
             .select(F.col(vec_alias).alias("__cent"))
             .withColumn("cell", F.monotonically_increasing_id()))
    cents = seeds.select("cell", "__cent")
    for _ in range(lloyd_iters):
        assigned = _nearest_cells(vv, cents, id_name, vec_alias, 1)
        per_dim = (
            assigned.select("cell", F.posexplode(vec_alias).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
        )
        cents = (
            per_dim.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__p"))
            .select("cell", F.transform("__p", lambda s: s.getField("m")).alias("__cent"))
        )
    return cents.cache()


def _nearest_cells(frame: DataFrame, cents: DataFrame, id_out: str,
                   vec_alias: str, n_cells: int) -> DataFrame:
    """assign each row its n_cells nearest (cosine) centroids with NO
    shuffle: the (num_cells x dim) centroid matrix is small by
    construction (the coarse quantizer is meant to be broadcast — 4096
    cells x 1024 dims is 32 MB), so it ships to executors inside an
    Arrow-batched pandas_udf closure that scores each batch with one
    BLAS matmul and emits the top-n cell ids per row.  Ties break
    toward the lowest cell id (stable argsort over cell-sorted
    columns), matching the former orderBy(sim desc, cell asc) rule.

    This replaced a broadcast-join + Window.partitionBy(row id) plan
    whose rank step hash-exchanged the rows x num_cells scored frame
    on the row id with no map-side reduction — at num_cells=4096 a
    shuffle 4096x the corpus row count, growing with the quantizer
    instead of the data.  Now the op is map-only: scan, matmul,
    (n_cells>1: in-row explode)."""
    import numpy as np

    rows = cents.select("cell", "__cent").collect()
    order = sorted(range(len(rows)), key=lambda i: rows[i]["cell"])
    cell_ids = np.asarray([rows[i]["cell"] for i in order], dtype="int64")
    C = np.asarray([rows[i]["__cent"] for i in order], dtype="float64")
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0] = 1.0
    Cn = C / norms[:, None]
    n = min(int(n_cells), len(cell_ids))

    @F.pandas_udf("array<bigint>")
    def __best_cells(vs: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(v, dtype="float64") for v in vs])
        if len(M) == 0:
            return pd.Series([], dtype=object)
        vn = np.linalg.norm(M, axis=1)
        vn[vn == 0] = 1.0
        S = (M / vn[:, None]) @ Cn.T  # (batch, num_cells)
        idx = np.argsort(-S, axis=1, kind="stable")[:, :n]
        picked = cell_ids[idx]
        return pd.Series(list(picked))

    assigned = frame.withColumn("__cells", __best_cells(F.col(vec_alias)))
    if n == 1:
        out = assigned.withColumn("cell", F.col("__cells").getItem(0))
    else:
        out = assigned.withColumn("cell", F.explode("__cells"))
    return out.drop("__cells")


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 1,
) -> DataFrame:
    """approximate top-k via IVF (inverted-file) cells — the classic
    coarse-quantizer ANN scale path, complementary to hyperplane LSH:

    1. deterministic seeding: the num_cells lowest-id vectors become
       initial centroids (tiny — broadcast);
    2. lloyd_iters rounds of distributed Lloyd refinement: assign all
       vectors to their nearest centroid (broadcast compare, no
       shuffle), then recompute centroids by posexplode + groupBy(cell,
       pos) — shuffles only (cells × dim) aggregates;
    3. vectors land in 1 cell, queries probe their nprobe nearest
       cells; candidate generation becomes an equi-join on cell —
       hash-partitioned, linear, skew bounded by cell sizes.

    Per-query recall is tunable by nprobe; cost scales with
    nprobe/num_cells fraction of the corpus, not the corpus itself."""
    vv = vectors.select(F.col(id_col).alias("neighbor_id"),
                        as_double(F.col(vec_col)).alias("__vv"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        as_double(F.col(vec_col)).alias("__qv"))

    cents = _train_ivf_cells(vv, "neighbor_id", "__vv", num_cells, lloyd_iters)

    # 3. probe: vectors in 1 cell, queries in nprobe cells
    v_cells = _nearest_cells(vv, cents, "neighbor_id", "__vv", 1)
    q_cells = _nearest_cells(qv, cents, "query_id", "__qv", nprobe)
    cand = (
        q_cells.join(v_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("__qv"), F.col("__vv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def quantize_int8(vec: Column) -> Column:
    """per-vector symmetric int8 quantization: q_i = round(127 · x_i /
    max|x|) → array<tinyint>. Cosine is scale-invariant, so ranking by
    quantized cosine needs NO dequantization bookkeeping — the
    per-vector scale cancels. The win at 100 TB: the embedding column
    shrinks 4× (float32→int8, 8× vs the double arrays pandas hands us),
    which is 4-8× less scan + shuffle traffic on every ANN stage.
    Pure column expressions — JVM-side, codegen'd."""
    m = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    return F.transform(
        vec, lambda x: F.round(x * 127.0 / m).cast("tinyint")
    )


def cosine_topk_int8(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """cosine_topk over int8-quantized embeddings: same streaming
    batch-matmul shape, but the corpus flows through the scan/shuffle
    as array<tinyint>. Scores are approximate (quantization noise
    ~0.4% per component); recall vs the exact path is asserted in
    tests/test_similarity.py."""
    import numpy as np
    from pyspark.sql import types as T

    qids, Q = _collect_query_matrix(queries, id_col, vec_col)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])

    def batches(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype="int64")
            M = np.asarray([np.asarray(v, dtype="float64") for v in pdf["__q"]])
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            S = Mn @ Qn.T
            for j, qid in enumerate(qids):
                S[ids == qid, j] = -np.inf
            top = min(k, len(ids))
            part = np.argpartition(-S, top - 1, axis=0)[:top]
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(qids):
                idx = part[:, j]
                out_q.extend([qid] * len(idx))
                out_n.extend(ids[idx])
                out_c.extend(S[idx, j])
            yield pd.DataFrame(
                {"query_id": pd.Series(out_q, dtype="int64"),
                 "neighbor_id": pd.Series(out_n, dtype="int64"),
                 "cos": pd.Series(out_c, dtype="float64")}
            )

    quant = vectors.select(id_col, quantize_int8(F.col(vec_col)).alias("__q"))
    cand = quant.mapInPandas(batches, schema)
    cand = cand.filter(
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("cos") != F.lit(float("-inf")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def semantic_cells(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    num_planes: int = 8,
    seed: int = 7,
    num_cells: int = 64,
    lloyd_iters: int = 2,
) -> DataFrame:
    """Partition an embedding corpus into cells for within-cell work
    (semantic dedup, clustering stats). Two cell assignments:

    - ``method="lsh"``: deterministic hyperplane cells
      (hyperplane_signature with literal weights) — fully portable, an
      external engine can reproduce the exact partition from the same
      seed, and the whole assignment stays in whole-stage codegen;
    - ``method="ivf"``: Lloyd/k-means coarse cells (the ivf_topk
      trainer) — closer to SemDeDup's k-means clustering, data-adaptive
      but iterative.

    Returns (id, cell, __v) with __v cast to double.
    """
    vv = vectors.select(F.col(id_col).alias("id"),
                        as_double(F.col(vec_col)).alias("__v"))
    if method == "lsh":
        return vv.select(
            "id",
            hyperplane_signature(F.col("__v"), dim, num_planes, seed).alias("cell"),
            "__v")
    if method == "ivf":
        cents = _train_ivf_cells(vv, "id", "__v", num_cells, lloyd_iters)
        return _nearest_cells(vv, cents, "id", "__v", 1).select("id", "cell", "__v")
    raise ValueError(f"unknown cell method {method!r}; use 'lsh' or 'ivf'")


def semantic_dedup(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    method: str = "lsh",
    num_planes: int = 8,
    seed: int = 7,
    num_cells: int = 64,
    lloyd_iters: int = 2,
    resolver: str = "labelprop",
    max_iter: int = 20,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public): cluster the corpus into cells, mark
    within-cell pairs with cosine >= threshold as semantic duplicates,
    resolve duplicate groups transitively, and keep the min-id
    representative of each group.  Divergence from the paper: the
    representative is the smallest id (deterministic, engine-portable)
    rather than the member farthest from the cluster centroid.

    The id column must be integral (the within-cell pair stage emits
    64-bit id pairs); non-integer ids raise immediately with a
    zipWithIndex/monotonically_increasing_id hint instead of failing
    inside the Arrow batch.  `resolver` picks the group resolution:
    'labelprop' (dedup.connected_components, rounds ~ diameter,
    bounded by `max_iter`) or 'star' (connected_components_star,
    O(log n) rounds regardless of diameter — use when duplicate
    chains may be deeper than max_iter hops).

    Scale contract (100 TB): within-cell comparison is all-pairs, so
    cell size bounds the cost — size num_planes (2^p cells) or
    num_cells so the expected cell holds ~10k vectors; the pair stage
    is then an equi-join on cell with a bounded per-key fanout, never
    a global cross join.  Cells themselves are one scan (lsh) or
    Lloyd rounds shuffling only (cells x dim) aggregates (ivf).

    Returns the KEPT rows (id, cell) — anti-join the input on id to
    get the dropped set.
    """
    import numpy as np

    from .dedup import connected_components, connected_components_star

    if resolver not in ("labelprop", "star"):
        raise ValueError(
            f"unknown resolver {resolver!r}; use 'labelprop' or 'star'")
    id_type = vectors.schema[id_col].dataType.typeName()
    if id_type not in ("byte", "short", "integer", "long"):
        raise TypeError(
            f"semantic_dedup requires an integral id column; {id_col!r} is "
            f"{id_type}. Assign a surrogate id first, e.g. "
            f"df.withColumn('vec_id', F.monotonically_increasing_id())")

    base = semantic_cells(vectors, dim, id_col, vec_col, method,
                          num_planes, seed, num_cells, lloyd_iters)

    # within-cell pairwise cosine as ONE chunked numpy matmul per cell
    # (applyInPandas) — a column-expression cosine join evaluates the
    # 64-term fold per pair in Catalyst's INTERPRETER (~30x slower than
    # BLAS); per-cell matmul is the same shape cosine_topk uses.  Row
    # blocks of `block` rows bound the score matrix at block x |cell|.
    thr = float(threshold)
    block = 1024

    def cell_pairs(pdf):
        import pandas as pd

        ids = pdf["id"].to_numpy()
        M = np.asarray([np.asarray(v, dtype="float64") for v in pdf["__v"]])
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": np.empty(0, dtype="int64"),
                                 "id_b": np.empty(0, dtype="int64")})
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        U = M / norms[:, None]
        out_a, out_b = [], []
        for s in range(0, n, block):
            e = min(s + block, n)
            S = U[s:e] @ U.T  # (e-s, n)
            for r in range(e - s):
                i = s + r
                js = np.nonzero(S[r, i + 1:] >= thr)[0] + i + 1
                if len(js):
                    out_a.append(np.full(len(js), ids[i]))
                    out_b.append(ids[js])
        if not out_a:
            return pd.DataFrame({"id_a": np.empty(0, dtype="int64"),
                                 "id_b": np.empty(0, dtype="int64")})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pd.DataFrame({"id_a": np.minimum(a, b),
                             "id_b": np.maximum(a, b)})

    pairs = base.groupBy("cell").applyInPandas(
        cell_pairs, "id_a long, id_b long")
    if resolver == "star":
        comp = connected_components_star(pairs, max_iter=max(max_iter, 50))
    else:
        comp = connected_components(pairs, max_iter=max_iter)
    dropped = comp.filter(F.col("id") != F.col("comp")).select("id")
    return base.join(dropped, "id", "left_anti").select("id", "cell")


def pca_whiten(vectors: DataFrame, dim: int, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int | None = None,
               eps: float = 1e-9) -> DataFrame:
    """Distributed PCA WHITENING of an embedding column — the
    preprocessing step the SemDeDup recipe (Abbas et al. 2023, public)
    applies before clustering, and the standard conditioning for
    IVF/LSH cells on anisotropic embeddings: project onto the top-k
    principal axes and scale each to unit variance.

    Plan (the 100 TB shape):
    - ONE Arrow-batched mapInPandas pass emits per-partition moment
      rows (n, Σx, ΣxᵀX flattened) — (d² + d + 1) floats per
      partition, where d is the EMBEDDING dim (64–4096), never the
      corpus;
    - the driver combines the ≤ npartitions moment rows and eigendecomposes
      the d×d covariance (bounded driver work, the same class as the
      ordered-ops bucket sampling — d=4096 is a ~130 MB symmetric
      eigenproblem, still laptop-sized);
    - the (d×k) whitening matrix broadcasts back and the projection is
      a map-only Arrow-batched matmul.  No shuffle anywhere.

    Returns (id, embedding) with k components of ~unit variance
    (k=None keeps all d).  Deterministic: eigenvector SIGNS are fixed
    by forcing each column's largest-|component| entry positive, so
    the projection replays identically across runs/partitionings."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    k = int(k or dim)
    spark = vectors.sparkSession
    src = vectors.select(F.col(id_col).alias("id"),
                         as_double(F.col(vec_col)).alias("__v"))

    moment_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("xtx", T.ArrayType(T.DoubleType())),
    ])

    def _moments(batches):
        n, s, xtx = 0, np.zeros(dim), np.zeros((dim, dim))
        for pdf in batches:
            M = np.asarray([np.asarray(v, dtype="float64")
                            for v in pdf["__v"]])
            if len(M):
                n += len(M)
                s += M.sum(axis=0)
                xtx += M.T @ M
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "xtx": [xtx.ravel().tolist()]})

    rows = src.select("__v").mapInPandas(_moments,
                                         schema=moment_schema).collect()
    if not rows:
        raise ValueError("pca_whiten: no vectors")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    xtx = np.sum([np.asarray(r["xtx"]).reshape(dim, dim) for r in rows],
                 axis=0)
    mu = s / n
    cov = (xtx - n * np.outer(mu, mu)) / max(1, n - 1)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    # deterministic signs: largest-|component| entry of each axis > 0
    flips = np.sign(vecs[np.abs(vecs).argmax(axis=0),
                         np.arange(vecs.shape[1])])
    vecs = vecs * np.where(flips == 0, 1.0, flips)
    W = vecs / np.sqrt(np.maximum(vals, 0.0) + eps)   # (d, k)

    bW = spark.sparkContext.broadcast(W)
    bmu = spark.sparkContext.broadcast(mu)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _project(vs: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(v, dtype="float64") for v in vs])
        out = (M - bmu.value) @ bW.value
        return pd.Series(out.tolist())

    return src.select(F.col("id").alias(id_col),
                      _project(F.col("__v")).alias(vec_col))


def mmr_rerank(candidates: DataFrame, query_col: str, id_col: str,
               rel_col: str, vec_col: str, k: int = 10,
               lam: float = 0.7) -> DataFrame:
    """Maximal Marginal Relevance re-rank of retrieval candidates
    (Carbonell & Goldstein, SIGIR'98): per query, greedily select k
    items maximizing ``lam·relevance − (1−lam)·max_cos_to_selected`` —
    the standard diversity pass between ANN retrieval and a RAG
    context window.  No reference analogue (dask-expr has no retrieval
    surface).

    Scale shape: ONE shuffle on query_col, then each query's greedy
    loop runs as an Arrow-batched numpy kernel over its own candidate
    set (applyInPandas) — per-group cost is O(c²·d) with c = the
    candidate count the retriever already bounded (e.g. top-50), so a
    billion queries distribute embarrassingly.  Determinism: vectors
    L2-normalize in float64, candidates sort by id, ties pick the
    smallest id — the greedy path reproduces in SQL as k unrolled
    argmax CTEs (oracle: ann_mmr_rerank).  Step 1's penalty is 0, so
    the first pick is the pure-relevance argmax.

    Returns (query_col, id_col, rank 1..k, mmr score).
    """
    import numpy as np
    from pyspark.sql import types as T

    q_field = candidates.schema[query_col]
    i_field = candidates.schema[id_col]
    schema = T.StructType([
        q_field, i_field,
        T.StructField("rank", T.IntegerType()),
        T.StructField("mmr", T.DoubleType()),
    ])
    oml = 1.0 - lam
    kk = int(k)

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        V = np.asarray([np.asarray(v, dtype="float64")
                        for v in pdf[vec_col]])
        # clamp zero norms: one all-zero embedding must not inject NaN
        # similarities that poison the whole group's greedy selection
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        rel = pdf[rel_col].to_numpy(dtype="float64")
        n = len(pdf)
        maxsim = np.zeros(n)
        chosen = np.zeros(n, dtype=bool)
        out_i, out_r, out_m = [], [], []
        for r in range(min(kk, n)):
            score = lam * rel - oml * maxsim
            score[chosen] = -np.inf
            i = int(np.argmax(score))  # first max = smallest id (sorted)
            out_i.append(pdf[id_col].iloc[i])
            out_r.append(r + 1)
            out_m.append(float(score[i]))
            chosen[i] = True
            maxsim = np.maximum(maxsim, V @ V[i])
        return pd.DataFrame({
            query_col: [pdf[query_col].iloc[0]] * len(out_i),
            id_col: out_i, "rank": out_r, "mmr": out_m})

    return (candidates.groupBy(query_col)
            .applyInPandas(_mmr, schema=schema))


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-side answer the float paths
# can't give.  int8 cuts a 64-dim corpus 4× (64 B/vector); PQ with
# m=8 sub-quantizers cuts it to EIGHT bytes/vector (32×), so a
# 100 TB float32 embedding column scans as ~3 TB of codes — the
# difference between "fits in the cluster's page cache" and "doesn't".
# Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011, public).  No reference analogue (dask-expr has
# no retrieval surface).
# ---------------------------------------------------------------------------


def pq_train(vectors: DataFrame, dim: int, m: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_rows: int = 20000, kmeans_iters: int = 4,
             seed: int = 42):
    """Train a PQ codebook: the corpus splits into `m` subspaces of
    dim/m components; each gets its own 256-centroid k-means codebook
    fit on a DETERMINISTIC md5-ranked sample (engine-independent, so
    the whole pipeline replays identically).  The sample is the only
    driver-side data (sample_rows × dim doubles, ~10 MB at defaults);
    the returned codebook is (m, n_centroids, dim/m) — ~130 KB, a
    broadcast-sized object no matter the corpus size.  Vectors
    L2-normalize before fitting so ADC scores approximate cosine."""
    import numpy as np

    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    samp = (vectors.select(id_col, vec_col)
            .orderBy(F.md5(F.col(id_col).cast("string")))
            .limit(int(sample_rows)).collect())
    X = np.asarray([list(r[1]) for r in samp], dtype="float64")
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n = len(X)
    ncent = min(256, n)
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ncent, dsub))
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = Xs[rng.choice(n, ncent, replace=False)].copy()
        for _ in range(int(kmeans_iters)):
            d2 = ((Xs ** 2).sum(1, keepdims=True) - 2 * Xs @ C.T
                  + (C ** 2).sum(1))
            assign = d2.argmin(1)
            for c in range(ncent):
                mask = assign == c
                if mask.any():          # empty cluster keeps its seed
                    C[c] = Xs[mask].mean(0)
        books[s] = C
    return books


def pq_encode(vectors: DataFrame, codebook,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode the corpus to PQ codes: one map-only Arrow pass, each
    vector → m uint8 centroid ids (stored array<smallint>; parquet RLE
    makes them ~m bytes/row).  The codes table is the thing you
    PERSIST — encode 100 TB once, then every retrieval scans the
    ~3 TB code table instead of the embeddings."""
    import numpy as np
    from pyspark.sql import types as T

    spark = vectors.sparkSession
    bb = spark.sparkContext.broadcast(np.asarray(codebook))
    m, _ncent, dsub = np.asarray(codebook).shape
    id_field = vectors.schema[id_col]
    schema = T.StructType([
        id_field,
        T.StructField("pq_code", T.ArrayType(T.ShortType())),
    ])

    def enc(it):
        B = bb.value
        c2 = (B ** 2).sum(2)                        # (m, ncent)
        for pdf in it:
            V = np.asarray([np.asarray(v, dtype="float64")
                            for v in pdf[vec_col]])
            V = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(V), m), dtype="int16")
            for s in range(m):
                Vs = V[:, s * dsub:(s + 1) * dsub]
                d2 = c2[s] - 2 * (Vs @ B[s].T)      # +||v||² const
                codes[:, s] = d2.argmin(1)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "pq_code": list(codes)})

    return vectors.select(id_col, vec_col).mapInPandas(enc, schema)


def pq_topk(vectors: DataFrame, queries: DataFrame, dim: int,
            k: int = 5, m: int = 8, id_col: str = "vec_id",
            vec_col: str = "embedding", sample_rows: int = 20000,
            kmeans_iters: int = 4, seed: int = 42,
            codebook=None, codes: DataFrame | None = None,
            exact_rerank: int | None = None) -> DataFrame:
    """Approximate cosine top-k by asymmetric distance computation
    (ADC) over PQ codes: per query a (m × 256) lookup table of
    subvector·centroid dots, then each corpus row scores as m table
    gathers — no float vector is ever touched at scan time.

    Scale shape: queries collect under the same cap/contract as
    cosine_topk (they play the broadcast role); the CODE table streams
    through an Arrow batch kernel emitting per-batch local top-k, and
    a final window ranks #batches × q × k candidate rows.  Pass
    `codes` (a persisted pq_encode output) and `codebook` to skip
    training/encoding — the steady-state 100 TB pattern; without them
    both are computed inline (one extra pass).  Deterministic: seeded
    sample + seeded k-means, ties break on neighbor_id.  Output:
    (query_id, neighbor_id, adc, rank) — `adc` approximates cosine.

    `exact_rerank=C` adds PQ's standard second stage: the ADC scan
    shortlists top-C per query, the C candidates' FLOAT vectors join
    back (a candidate-sized join — AQE broadcasts the q×C side, the
    corpus streams map-side) and exact cosine re-ranks to the final
    top-k; output gains a `cos` column and ranks by it.  This is the
    knob that matters when true neighbor gaps are SMALLER than the
    quantization cell: measured on the ×100 near-dup corpus, plain ADC
    ties all ~100 replicas of a base vector (recall@10 0.35-0.42) and
    rerank from C=100 recovers it (SCALE.md).  Measured recall + cost:
    SCALE.md (scripts/recall_check.py)."""
    import numpy as np
    from pyspark.sql import types as T

    if codebook is None:
        codebook = pq_train(vectors, dim, m=m, id_col=id_col,
                            vec_col=vec_col, sample_rows=sample_rows,
                            kmeans_iters=kmeans_iters, seed=seed)
    codebook = np.asarray(codebook)
    m = codebook.shape[0]
    dsub = codebook.shape[2]
    if codes is None:
        codes = pq_encode(vectors, codebook, id_col=id_col,
                          vec_col=vec_col)

    qids, Q = _collect_query_matrix(queries, id_col, vec_col)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # LUT[j, s, c] = q_j's s-subvector · centroid c  → Σ_s gathers ≈ cos
    lut = np.einsum("jsd,scd->jsc",
                    Qn.reshape(len(Qn), m, dsub), codebook)
    spark = vectors.sparkSession
    blut = spark.sparkContext.broadcast(lut)

    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("adc", T.DoubleType()),
    ])

    # ADC stage emits the shortlist (>= k when reranking); computed
    # BEFORE score() is defined so the kernel captures it explicitly
    # rather than via late binding (matches ivfpq_topk).
    shortlist = max(k, int(exact_rerank)) if exact_rerank else k

    def score(it):
        L = blut.value                                 # (q, m, ncent)
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype="int64")
            C = np.asarray(list(pdf["pq_code"]), dtype="int64")
            S = np.zeros((len(ids), len(qids)))
            for s in range(m):
                S += L[:, s, :][:, C[:, s]].T          # (n, q)
            for j, qid in enumerate(qids):
                S[ids == qid, j] = -np.inf
            top = min(shortlist, len(ids))
            part = np.argpartition(-S, top - 1, axis=0)[:top]
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(qids):
                idx = part[:, j]
                out_q.extend([qid] * len(idx))
                out_n.extend(ids[idx])
                out_s.extend(S[idx, j])
            yield pd.DataFrame(
                {"query_id": pd.Series(out_q, dtype="int64"),
                 "neighbor_id": pd.Series(out_n, dtype="int64"),
                 "adc": pd.Series(out_s, dtype="float64")})

    cand = codes.select(id_col, "pq_code").mapInPandas(score, schema)
    cand = cand.filter((F.col("query_id") != F.col("neighbor_id"))
                       & (F.col("adc") != F.lit(float("-inf"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id"))
    top = (cand.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= shortlist)
           .select("query_id", "neighbor_id", "adc", "rank"))
    if not exact_rerank:
        return top
    # stage 2: exact cosine over the candidate-sized float join
    nvec = vectors.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("__nv"))
    qvec = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__qv"))
    j = (top.drop("rank").join(nvec, "neighbor_id").join(qvec, "query_id")
         .withColumn("cos", cosine(as_double(F.col("__qv")),
                                   as_double(F.col("__nv")))))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (j.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "adc", "rank"))


def ivfpq_topk(vectors: DataFrame, queries: DataFrame, dim: int,
               id_col: str = "vec_id", vec_col: str = "embedding",
               k: int = 5, m: int = 8, num_cells: int = 16,
               nprobe: int = 4, lloyd_iters: int = 1,
               sample_rows: int = 20000, kmeans_iters: int = 4,
               seed: int = 42,
               codebook=None, coded_cells: DataFrame | None = None,
               centroids: DataFrame | None = None,
               exact_rerank: int | None = None) -> DataFrame:
    """IVF-PQ: the FAISS-standard composition — IVF cells bound WHICH
    vectors are scored (nprobe/num_cells of the corpus), PQ codes
    bound WHAT moves and is read per candidate (m bytes instead of
    dim floats).  Where ivf_topk ships each candidate's float vector
    through the cell join, this ships its PQ code: at dim=64/m=8 the
    corpus side of the shuffle shrinks 64×, which at 100 TB is the
    difference between a code join and a re-broadcast of the corpus.

    Plan: coarse quantizer trains exactly as ivf_topk
    (_train_ivf_cells — deterministic seeding, distributed Lloyd);
    vectors land in 1 cell carrying their code, queries probe nprobe
    cells carrying their float vector (the small side); the cell join
    scores each candidate with an Arrow-batched gather
    (q-subvector · codebook[code] summed over subspaces ≈ cosine).
    `exact_rerank=C` adds the float re-rank stage of pq_topk —
    measured recall/cost in SCALE.md.  Output: (query_id, neighbor_id,
    adc[, cos], rank).

    Steady-state artifacts: pass `centroids` (the trained coarse
    quantizer, a (cell, __cent) frame), `codebook` (pq_train output)
    and `coded_cells` (the encoded corpus: id_col, pq_code, cell — the
    persisted index) to skip training AND encoding — the 100 TB
    pattern, where the index is built once and maintained
    incrementally while queries pay only the probe+gather cost."""
    import numpy as np

    if coded_cells is not None and centroids is None:
        raise ValueError(
            "ivfpq_topk: coded_cells without centroids — the persisted "
            "index's `cell` assignments are only meaningful with the "
            "coarse quantizer that produced them; a freshly trained "
            "quantizer would probe the wrong cells and silently degrade "
            "recall.  Pass the centroids persisted alongside the codes")
    vv = vectors.select(F.col(id_col).alias("neighbor_id"),
                        as_double(F.col(vec_col)).alias("__vv"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        as_double(F.col(vec_col)).alias("__qv"))
    cents = (centroids if centroids is not None
             else _train_ivf_cells(vv, "neighbor_id", "__vv",
                                   num_cells, lloyd_iters))
    if codebook is None:
        codebook = pq_train(vectors, dim, m=m, id_col=id_col,
                            vec_col=vec_col, sample_rows=sample_rows,
                            kmeans_iters=kmeans_iters, seed=seed)
    codebook = np.asarray(codebook)
    m = codebook.shape[0]
    spark = vectors.sparkSession
    bb = spark.sparkContext.broadcast(codebook)
    dsub = dim // m

    if coded_cells is not None:
        v_codes = coded_cells.select(
            F.col(id_col).alias("neighbor_id"), "pq_code", "cell")
    else:
        v_cells = _nearest_cells(vv, cents, "neighbor_id", "__vv", 1)
        v_codes = pq_encode(v_cells.select("neighbor_id", "cell",
                                           F.col("__vv").alias("__v")),
                            codebook, id_col="neighbor_id",
                            vec_col="__v") \
            .join(v_cells.select("neighbor_id", "cell"), "neighbor_id")
    q_cells = _nearest_cells(qv, cents, "query_id", "__qv", nprobe)

    @F.pandas_udf("double")
    def __adc(qvs: pd.Series, codes: pd.Series) -> pd.Series:
        B = bb.value
        Q = np.asarray([np.asarray(v, dtype="float64") for v in qvs])
        if len(Q) == 0:
            return pd.Series([], dtype="float64")
        Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True),
                           1e-12)
        Qs = Q.reshape(len(Q), B.shape[0], dsub)
        C = np.asarray(list(codes), dtype="int64")       # (n, m)
        picked = B[np.arange(B.shape[0])[None, :], C]    # (n, m, dsub)
        return pd.Series(np.einsum("nmd,nmd->n", Qs, picked))

    cand = (q_cells.join(v_codes, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("adc", __adc(F.col("__qv"), F.col("pq_code"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id"))
    shortlist = max(k, int(exact_rerank)) if exact_rerank else k
    top = (cand.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= shortlist)
           .select("query_id", "neighbor_id", "adc", "rank"))
    if not exact_rerank:
        return top
    nvec = vectors.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("__nv"))
    qvec = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__q2"))
    j = (top.drop("rank").join(nvec, "neighbor_id").join(qvec, "query_id")
         .withColumn("cos", cosine(as_double(F.col("__q2")),
                                   as_double(F.col("__nv")))))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (j.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "adc", "rank"))
