"""Unit tests for the training-data text filters added in round 2
(functions/text.py repetition_ratio, pii_counts)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dask_expr_spark.functions import text as T


def test_repetition_ratio(spark):
    rows = [
        (1, "a b c d e f"),        # all distinct bigrams → 0
        (2, "x y x y x y x y"),    # 7 bigrams, 2 distinct → 5/7
        (3, "solo"),               # no bigrams → 0
        (4, None),
    ]
    sdf = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.rep
        for r in sdf.select(
            "id", T.repetition_ratio(F.col("text"), k=2).alias("rep")
        ).collect()
    }
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(1 - 2 / 7)
    assert got[3] == pytest.approx(0.0)
    assert got[4] == pytest.approx(0.0)  # null text → empty shingles


def test_pii_counts(spark):
    text = ("contact bob@example.com or alice@test.org, "
            "server 10.0.0.1, call 555-867-5309")
    sdf = spark.createDataFrame([(1, text), (2, "clean text")],
                                "id long, text string")
    c = T.pii_counts(F.col("text"))
    got = {
        r.id: r
        for r in sdf.select(
            "id", c["email"].alias("email"), c["ipv4"].alias("ipv4"),
            c["phone_us"].alias("phone_us"),
        ).collect()
    }
    assert (got[1].email, got[1].ipv4, got[1].phone_us) == (2, 1, 1)
    assert (got[2].email, got[2].ipv4, got[2].phone_us) == (0, 0, 0)


def test_bigram_lm_scores_tiny(spark):
    """hand-computed add-k bigram LM: corpus of two docs, k=0.5."""
    import math
    sdf = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string")
    got = {r.doc_id: r for r in
           T.bigram_lm_scores(sdf, "doc_id", "text", k_smooth=0.5).collect()}
    # corpus tokens: a x3, b x3; V=2; bigrams: (a,b) x3, (b,a) x1
    p_ab = math.log((3 + 0.5) / (3 + 0.5 * 2))
    p_ba = math.log((1 + 0.5) / (3 + 0.5 * 2))
    assert got[1].n_bigrams == 3
    assert got[1].avg_logprob == pytest.approx((2 * p_ab + p_ba) / 3)
    assert got[2].n_bigrams == 1
    assert got[2].avg_logprob == pytest.approx(p_ab)


def test_bigram_lm_checkpointed_model_parity(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = T.bigram_lm_train(docs, "doc_id", "text",
                              checkpoint_path=str(tmp_path / "lm"))
    a = sorted((r.doc_id, r.n_bigrams, round(r.avg_logprob, 9)) for r in
               T.bigram_lm_scores(docs, "doc_id", "text", model=model).collect())
    b = sorted((r.doc_id, r.n_bigrams, round(r.avg_logprob, 9)) for r in
               T.bigram_lm_scores(docs, "doc_id", "text").collect())
    assert a == b


def test_bm25_tiny_ranking(spark):
    """doc with more query-term hits (and shorter length) ranks first;
    docs without the term don't appear."""
    sdf = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat mouse mouse mouse mouse mouse"),
         (3, "mouse mouse")], "doc_id long, text string")
    got = T.bm25_topk(sdf, "doc_id", "text", ["cat"], k=10).collect()
    assert [r.doc_id for r in got] == [1, 2]
    assert got[0].score > got[1].score


def test_bm25_indexed_matches_inline_and_skips_corpus(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = T.bm25_index(docs, "doc_id", "text",
                       checkpoint_path=str(tmp_path / "idx"))
    out = T.bm25_topk(None, "doc_id", "text", ["join", "slow"], index=idx)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan  # search never touches corpus
    assert "IN (join,slow)" in plan or "In(w, [join,slow])" in plan  # pushed
    inline = sorted(map(tuple, T.bm25_topk(docs, "doc_id", "text",
                                           ["join", "slow"]).collect()))
    assert sorted(map(tuple, out.collect())) == inline


def test_lm_bm25_mix_degenerate_inputs(spark):
    """empty corpora, 0/1-token docs, and absent sources return empty
    results instead of erroring (sequence(1,0) counts DOWN in Spark —
    regression guard for the fabricated-bigram crash)."""
    from dask_expr_spark.functions.sampling import resample_to_mix
    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    one = spark.createDataFrame([(1, "hello", "s0")],
                                "doc_id long, text string, source string")
    assert T.bigram_lm_scores(empty, "doc_id", "text").count() == 0
    assert T.bigram_lm_scores(one, "doc_id", "text").count() == 0
    assert T.bm25_topk(empty, "doc_id", "text", ["x"]).count() == 0
    assert resample_to_mix(one, "source", "doc_id", {"zz": 1.0}).count() == 0
