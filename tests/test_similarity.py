"""Property tests for similarity search: LSH-bucketed ANN recall vs the
brute-force exact top-k; centroid shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_expr_spark.functions import similarity as SIM
from dask_expr_spark.sources.io import read_parquet


def _emb(spark, sf_dir):
    return read_parquet(spark, f"{sf_dir}/embeddings.parquet").to_spark()


def test_cosine_topk_shape_and_bounds(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    res = SIM.cosine_topk(emb, q, k=5).collect()
    n_q = q.count()
    assert len(res) == n_q * 5
    for r in res:
        assert -1.0001 <= r.cos <= 1.0001
        assert 1 <= r.rank <= 5
        assert r.query_id != r.neighbor_id


def test_lsh_bucketed_recall(spark, sf_dir):
    """bucketed ANN must recover a reasonable fraction of the true
    top-5 — multi-table LSH (16 tables x 4 planes); require >= 50% recall."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {(r.query_id, r.neighbor_id)
             for r in SIM.cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in SIM.lsh_bucketed_topk(emb, q, dim=64, k=5, num_tables=16, planes_per_table=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_cosine_topk_blocked_matches_capped(spark, sf_dir):
    """the uncapped blocked kernel must reproduce cosine_topk exactly
    (same contract, same tie-break) across block sizes that straddle
    Arrow-chunk and partition boundaries."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    want = sorted((r.query_id, r.neighbor_id, round(r.cos, 9), r.rank)
                  for r in SIM.cosine_topk(emb, q, k=5).collect())
    for cb, qb in ((7, 3), (64, 16), (100000, 100000)):
        got = sorted((r.query_id, r.neighbor_id, round(r.cos, 9), r.rank)
                     for r in SIM.cosine_topk_blocked(
                         emb, q, k=5, corpus_block_rows=cb,
                         query_block_rows=qb).collect())
        assert got == want, f"blocked ({cb},{qb}) diverges from capped"


def test_cosine_topk_blocked_uncapped(spark, sf_dir):
    """a query set larger than the cosine_topk driver cap must refuse
    on the capped kernel and succeed on the blocked one — the blocked
    path never collects the query side."""
    import pytest

    emb = _emb(spark, sf_dir)
    spark.conf.set(SIM.MAX_QUERY_ROWS_CONF, "10")
    try:
        big_q = emb.filter(F.col("vec_id") % 4 == 0)
        with pytest.raises(ValueError, match="cosine_topk_blocked"):
            SIM.cosine_topk(emb, big_q, k=3).collect()
        res = SIM.cosine_topk_blocked(emb, big_q, k=3,
                                      corpus_block_rows=64,
                                      query_block_rows=16)
        n_q = big_q.count()
        rows = res.collect()
        assert len(rows) == n_q * 3
        assert all(r.query_id != r.neighbor_id for r in rows)
    finally:
        spark.conf.unset(SIM.MAX_QUERY_ROWS_CONF)


def test_lsh_auto_planes_sizing(spark, sf_dir):
    """planes_per_table='auto' sizes p = ceil(log2(n/target)) so bucket
    depth stays ~constant at any corpus scale (the ×100 probe measured
    fixed-p at 1.48× linear vs auto at 0.04× — SCALE.md); the sized run
    must still return valid per-query top-k, and a bogus plane spec must
    raise rather than silently freeze the geometry."""
    import pytest

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    res = SIM.lsh_bucketed_topk(
        emb, q, dim=64, k=5, num_tables=16,
        planes_per_table="auto", target_bucket_rows=64).collect()
    assert len(res) > 0
    per_q: dict = {}
    for r in res:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.query_id != r.neighbor_id
        assert 1 <= r.rank <= 5
    assert all(len(v) <= 5 for v in per_q.values())
    with pytest.raises(ValueError, match="planes_per_table"):
        SIM.lsh_bucketed_topk(emb, q, dim=64, planes_per_table="huge")


def test_centroids_shape(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = SIM.centroids_by_label(emb, "label", "embedding").collect()
    n_labels = emb.select("label").distinct().count()
    assert len(cents) == n_labels
    for r in cents:
        assert len(r.centroid) == 64
        assert r.n_vectors > 0


def test_hyperplane_signature_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    sig = SIM.hyperplane_signature(SIM.as_double(F.col("embedding")), dim=64, num_planes=8)
    a = {r.vec_id: r.s for r in emb.select("vec_id", sig.alias("s")).collect()}
    b = {r.vec_id: r.s for r in emb.select("vec_id", sig.alias("s")).collect()}
    assert a == b
    assert all(0 <= v < 256 for v in a.values())


def test_ivf_topk_recall(spark, sf_dir):
    """IVF with nprobe=8 of 16 cells scans ~half the corpus per query —
    require >= 60% of the true top-5."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {(r.query_id, r.neighbor_id)
             for r in SIM.cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in SIM.ivf_topk(emb, q, dim=64, k=5, num_cells=16, nprobe=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 200 == 0)
    a = sorted((r.query_id, r.rank, r.neighbor_id)
               for r in SIM.ivf_topk(emb, q, dim=64, k=3).collect())
    b = sorted((r.query_id, r.rank, r.neighbor_id)
               for r in SIM.ivf_topk(emb, q, dim=64, k=3).collect())
    assert a == b


def test_int8_quantized_ann_recall(spark, sf_dir):
    """int8-quantized brute-force top-k must agree with the exact path
    on >= 75% of neighbor picks. The synthetic embeddings are uniform
    random, so cosines cluster near 0 and near-ties are common —
    quantization (~0.4% noise/component) flips exactly those; on real
    embedding manifolds with separated neighbors agreement is near
    100%."""
    import os
    from pyspark.sql import functions as F
    from dask_expr_spark.functions.similarity import cosine_topk, cosine_topk_int8

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    exact = cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    quant = cosine_topk_int8(emb, queries, k=5).select("query_id", "neighbor_id")
    n_exact = exact.count()
    hits = exact.intersect(quant).count()
    assert n_exact > 0
    assert hits / n_exact >= 0.75, f"recall {hits}/{n_exact}"


def test_semantic_dedup_ivf_drops_near_dups(spark, sf_dir):
    """semantic_dedup with Lloyd/IVF cells: every dropped vector must
    have a kept (or transitively grouped) near-duplicate — i.e. the
    kept set plus duplicate groups partition the corpus, and no two
    KEPT vectors in the same cell are within-threshold duplicates."""
    emb = _emb(spark, sf_dir)
    total = emb.count()
    kept = SIM.semantic_dedup(
        emb, dim=64, threshold=0.45, method="ivf",
        num_cells=8, lloyd_iters=2)
    rows = kept.collect()
    assert 0 < len(rows) <= total
    # no within-cell kept pair may still be a duplicate at threshold
    a = kept.alias("a").join(
        emb.select(F.col("vec_id").alias("id"),
                   SIM.as_double(F.col("embedding")).alias("__v")), "id")
    b = a.select(F.col("id").alias("id_b"), F.col("cell").alias("cell_b"),
                 F.col("__v").alias("__vb"))
    leftover = (
        a.join(b, (F.col("cell") == F.col("cell_b"))
               & (F.col("id") < F.col("id_b")))
        .withColumn("cos", SIM.cosine(F.col("__v"), F.col("__vb")))
        .filter(F.col("cos") >= 0.45)
        .count())
    assert leftover == 0


def test_semantic_dedup_lsh_matches_bruteforce_groups(spark, sf_dir):
    """with ONE cell (0 planes would be degenerate; use a plane count
    whose cells still merge at this SF is flaky — instead check the
    LSH path is a superset-consistent restriction of the brute-force
    result: every pair dropped by semantic_dedup is a genuine
    >=threshold near-dup pair somewhere in the corpus."""
    emb = _emb(spark, sf_dir)
    kept = SIM.semantic_dedup(
        emb, dim=64, threshold=0.45, method="lsh", num_planes=2, seed=7)
    dropped = emb.select(F.col("vec_id").alias("id")).join(
        kept.select("id"), "id", "left_anti")
    # each dropped id participates in at least one exact near-dup pair
    vv = emb.select(F.col("vec_id").alias("other"),
                    SIM.as_double(F.col("embedding")).alias("__vo"))
    dv = dropped.join(
        emb.select(F.col("vec_id").alias("id"),
                   SIM.as_double(F.col("embedding")).alias("__vd")), "id")
    hit = (
        dv.join(vv, F.col("id") != F.col("other"))
        .withColumn("cos", SIM.cosine(F.col("__vd"), F.col("__vo")))
        .filter(F.col("cos") >= 0.45)
        .select("id").distinct())
    assert dropped.count() == hit.count()


def test_semantic_dedup_star_resolver_matches_labelprop(spark, sf_dir):
    """resolver='star' (O(log n) rounds) must keep exactly the same id
    set as the default label-propagation resolver — only the round
    structure differs, never the groups."""
    emb = _emb(spark, sf_dir)
    kept_lp = SIM.semantic_dedup(
        emb, dim=64, threshold=0.45, method="lsh", num_planes=2, seed=7)
    kept_star = SIM.semantic_dedup(
        emb, dim=64, threshold=0.45, method="lsh", num_planes=2, seed=7,
        resolver="star")
    a = {r.id for r in kept_lp.collect()}
    b = {r.id for r in kept_star.collect()}
    assert a == b


def test_semantic_dedup_rejects_non_integer_ids(spark):
    import pytest

    sdf = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<double>")
    with pytest.raises(TypeError, match="integral id"):
        SIM.semantic_dedup(sdf, dim=2)
    with pytest.raises(ValueError, match="resolver"):
        SIM.semantic_dedup(
            spark.createDataFrame([(1, [1.0, 0.0])],
                                  "vec_id long, embedding array<double>"),
            dim=2, resolver="bogus")


def test_approx_family_recall_floors(spark, sf_dir):
    """measured-recall contract (VERDICT r5 item 5): every approximate
    ANN path must clear a recall floor against the exact blocked
    baseline on the test corpus — the quality companion to SCALE.md's
    cost table (x100 measured: lsh auto L8 0.999, L16+ 1.0; ivf
    nprobe4 0.97, nprobe8 0.997; int8 ~1.0).  Floors are set below the
    measured values so host-to-host RNG/ordering wiggle can't flake
    them, but high enough that a broken bucketing (wrong planes, wrong
    cell probe, broken quantization) fails loudly."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    k = 5
    truth: dict = {}
    for r in SIM.cosine_topk_blocked(emb, q, k=k).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(res) -> float:
        per_q: dict = {}
        for r in res:
            if r.query_id != r.neighbor_id:
                per_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        hit = sum(len(truth[qi] & per_q.get(qi, set())) for qi in truth)
        tot = sum(len(truth[qi]) for qi in truth)
        return hit / tot

    lsh = recall(SIM.lsh_bucketed_topk(
        emb, q, dim=64, k=k, num_tables=16).collect())  # auto planes
    assert lsh >= 0.8, f"lsh auto-planes recall {lsh}"
    # nprobe/cells = 50% of the corpus probed: measured 0.88 (sf0.001)
    # and 0.76 (sf0.01) on these 500-vector corpora where cells hold
    # ~31 vectors (x100 with 64 cells, nprobe=8: 0.997); the floor sits
    # above the ~0.5 a broken cell assignment would score at this ratio
    ivf = recall(SIM.ivf_topk(
        emb, q, dim=64, k=k, num_cells=16, nprobe=8).collect())
    assert ivf >= 0.65, f"ivf nprobe8 recall {ivf}"
    i8 = recall(SIM.cosine_topk_int8(emb, q, k=k).collect())
    assert i8 >= 0.9, f"int8 recall {i8}"


def test_pca_whiten_matches_numpy(spark):
    """pca_whiten equals the single-machine numpy reference (same mean
    subtraction, eigh, deterministic sign fix) regardless of
    partitioning, and the whitened covariance is ~identity."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    # anisotropic: stretch two random directions
    A = rng.normal(size=(16, 16))
    X = rng.normal(size=(400, 16)) @ A
    pdf = pd.DataFrame({"vec_id": range(400),
                        "embedding": [r.tolist() for r in X]})
    df = spark.createDataFrame(pdf).repartition(7)
    got = SIM.pca_whiten(df, dim=16, k=6).toPandas() \
        .sort_values("vec_id").reset_index(drop=True)
    G = np.asarray([np.asarray(v) for v in got["embedding"]])

    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:6]
    vals, vecs = vals[order], vecs[:, order]
    flips = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(6)])
    vecs = vecs * np.where(flips == 0, 1.0, flips)
    W = vecs / np.sqrt(np.maximum(vals, 0.0) + 1e-9)
    want = (X - mu) @ W
    np.testing.assert_allclose(G, want, rtol=1e-8, atol=1e-8)

    C = np.cov(G, rowvar=False)
    np.testing.assert_allclose(C, np.eye(6), atol=1e-6)

    # partitioning-invariance of the moment pass
    got1 = SIM.pca_whiten(spark.createDataFrame(pdf).coalesce(1),
                          dim=16, k=6).toPandas() \
        .sort_values("vec_id").reset_index(drop=True)
    G1 = np.asarray([np.asarray(v) for v in got1["embedding"]])
    np.testing.assert_allclose(G, G1, rtol=1e-9, atol=1e-12)


def test_pca_whiten_retrieval_recall_floor(spark, sf_dir):
    """measured-quality contract for retrieval THROUGH pca_whiten
    (VERDICT r6 item 5a): exact cosine retrieval in the whitened space
    must retain a floor of the raw-cosine top-5 on the test corpus.
    Whitening CHANGES the metric (it reweights axes by inverse
    variance), so even k=d is not recall 1.0 — measured 0.60 (sf0.001)
    / 0.76 (sf0.01) at k=64, 0.44 at k=32; floors sit below those but
    far above the ~1-2% a broken projection (wrong mean, transposed W,
    axis shuffle) would score."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    k = 5
    truth: dict = {}
    exact = SIM.cosine_topk_blocked(emb, q, k=k) \
        .filter(F.col("query_id") != F.col("neighbor_id"))
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(res) -> float:
        per: dict = {}
        for r in res:
            if r.query_id != r.neighbor_id:
                per.setdefault(r.query_id, set()).add(r.neighbor_id)
        hit = sum(len(truth[qi] & per.get(qi, set())) for qi in truth)
        return hit / sum(len(truth[qi]) for qi in truth)

    for kd, floor in ((64, 0.45), (32, 0.3)):
        white = SIM.pca_whiten(emb, dim=64, k=kd).persist()
        wq = white.join(q.select("vec_id"), "vec_id")
        got = recall(SIM.cosine_topk_blocked(white, wq, k=k).collect())
        white.unpersist()
        assert got >= floor, f"whitened k={kd} recall {got} < {floor}"


def test_mmr_tradeoff_contract(spark, sf_dir):
    """MMR relevance/diversity curve contract (VERDICT r6 item 5b):
    lam=1.0 reproduces the pure-relevance top-k EXACTLY (selection and
    rank order), and as lam drops the selected set's mean intra-list
    cosine (redundancy) must not increase — the knob buys diversity,
    never loses it."""
    import numpy as np

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    k = 5
    cand = (SIM.cosine_topk_blocked(emb, q, k=21)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .join(emb.select(F.col("vec_id").alias("neighbor_id"),
                             F.col("embedding").alias("__nv")),
                  "neighbor_id").persist())

    cpdf = cand.toPandas()
    vecs = {i: np.asarray(v, dtype="float64")
            for i, v in zip(cpdf["neighbor_id"], cpdf["__nv"])}
    # pure-relevance truth: per query, top-k by cos desc, id asc
    rel_top = {
        qi: list(g.sort_values(["cos", "neighbor_id"],
                               ascending=[False, True])
                 .head(k)["neighbor_id"])
        for qi, g in cpdf.groupby("query_id")}

    def intra(sel_pdf) -> float:
        vals = []
        for _, g in sel_pdf.groupby("query_id"):
            V = np.asarray([vecs[i] for i in g["neighbor_id"]])
            V = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = V @ V.T
            n = len(V)
            if n > 1:
                vals.append(float((S.sum() - n) / (n * (n - 1))))
        return float(np.mean(vals))

    sel1 = SIM.mmr_rerank(cand, "query_id", "neighbor_id", "cos",
                          "__nv", k=k, lam=1.0).toPandas()
    got1 = {qi: list(g.sort_values("rank")["neighbor_id"])
            for qi, g in sel1.groupby("query_id")}
    # ties at equal cos: both sides break by smallest id
    assert got1 == rel_top

    redund = [intra(sel1)]
    for lam in (0.7, 0.3):
        sel = SIM.mmr_rerank(cand, "query_id", "neighbor_id", "cos",
                             "__nv", k=k, lam=lam).toPandas()
        redund.append(intra(sel))
    cand.unpersist()
    assert redund[0] >= redund[1] - 1e-9 >= redund[2] - 2e-9, redund


def test_ivfpq_persisted_artifacts_match_inline(spark, sf_dir):
    """steady-state path: ivfpq_topk with persisted centroids +
    codebook + coded-cells index returns exactly the inline-trained
    result (the bench's ann_ivfpq_topk_persisted contract)."""
    import os
    import shutil
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from dask_expr_spark.functions import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    inline = sorted(map(tuple, SIM.ivfpq_topk(
        emb, queries, dim=64, k=5, m=16)
        .select("query_id", "neighbor_id", "rank").collect()))

    vv = emb.select(F.col("vec_id").alias("neighbor_id"),
                    SIM.as_double(F.col("embedding")).alias("__vv"))
    cents = SIM._train_ivf_cells(vv, "neighbor_id", "__vv", 16, 1)
    cb = np.asarray(SIM.pq_train(emb, 64, m=16))
    v_cells = SIM._nearest_cells(vv, cents, "neighbor_id", "__vv", 1)
    coded = (SIM.pq_encode(v_cells.select(
        "neighbor_id", "cell", F.col("__vv").alias("__v")),
        cb, id_col="neighbor_id", vec_col="__v")
        .join(v_cells.select("neighbor_id", "cell"), "neighbor_id")
        .select(F.col("neighbor_id").alias("vec_id"), "pq_code",
                "cell"))
    tmp = tempfile.mkdtemp(prefix="ivfpq_art_")
    try:
        cents.write.parquet(os.path.join(tmp, "cents"))
        coded.write.parquet(os.path.join(tmp, "coded"))
        persisted = sorted(map(tuple, SIM.ivfpq_topk(
            emb, queries, dim=64, k=5, m=16, codebook=cb,
            coded_cells=spark.read.parquet(os.path.join(tmp, "coded")),
            centroids=spark.read.parquet(os.path.join(tmp, "cents")))
            .select("query_id", "neighbor_id", "rank").collect()))
        assert persisted == inline and len(inline) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ivfpq_coded_cells_without_centroids_raises(spark, sf_dir):
    """ADVICE r8: coded_cells without centroids would silently retrain
    a fresh coarse quantizer whose cell ids don't match the persisted
    `cell` assignments — the API now refuses the mismatch."""
    import pytest
    from pyspark.sql import functions as F

    from dask_expr_spark.functions import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fake_codes = emb.select("vec_id",
                            F.lit(None).cast("array<int>")
                            .alias("pq_code"),
                            F.lit(0).alias("cell"))
    with pytest.raises(ValueError, match="coded_cells without"):
        SIM.ivfpq_topk(emb, emb.limit(1), dim=64, coded_cells=fake_codes)
