"""Round-6 operator semantics: exact incremental dedup
(exact_hash_index / exact_dedup_against), exact-n per-group sampling,
and the leakage-safe split (duplicate groups move as one unit)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_expr_spark.functions import dedup as DD
from dask_expr_spark.functions import sampling as S


def test_exact_dedup_against_semantics(spark):
    """dup_of routing: index hit -> index keep_id; intra-batch dup ->
    batch's min id; novel -> NULL.  Normalization collapses
    case/whitespace variants when asked."""
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")],
        "doc_id long, text string")
    idx = DD.exact_hash_index(corpus, "doc_id", "text")
    assert idx.count() == 2  # alpha (keep 1), beta (keep 2)
    batch = spark.createDataFrame(
        [(10, "alpha"),       # index dup -> 1
         (11, "gamma"),       # novel
         (12, "gamma"),       # intra-batch dup -> 11
         (13, "  Alpha ")],   # novel without normalize
        "doc_id long, text string")
    got = {r["id"]: r["dup_of"]
           for r in DD.exact_dedup_against(batch, idx, "doc_id",
                                           "text").collect()}
    assert got == {10: 1, 11: None, 12: 11, 13: None}

    # normalized index + batch: "  Alpha " now hits alpha's row
    idx_n = DD.exact_hash_index(corpus, "doc_id", "text", normalize=True)
    got_n = {r["id"]: r["dup_of"]
             for r in DD.exact_dedup_against(batch, idx_n, "doc_id",
                                             "text",
                                             normalize=True).collect()}
    assert got_n[13] == 1

    # the incremental contract: survivors' hashes appended keep the
    # index current — re-running the same batch now flags everything
    survivors = (DD.exact_dedup_against(batch, idx, "doc_id", "text")
                 .where(F.col("dup_of").isNull()).select("id"))
    surv = batch.join(survivors, batch["doc_id"] == F.col("id"), "leftsemi")
    idx2 = idx.unionByName(DD.exact_hash_index(surv, "doc_id", "text"))
    rerun = {r["id"]: r["dup_of"]
             for r in DD.exact_dedup_against(batch, idx2, "doc_id",
                                             "text").collect()}
    assert all(v is not None for v in rerun.values())


def test_sample_n_per_group_exact_and_stable(spark):
    """exactly min(n, |group|) rows per group; the chosen ids are
    identical across partitionings and row orders (md5 determinism)."""
    rows = [(g, g * 1000 + i) for g in range(4) for i in range((g + 1) * 7)]
    base = spark.createDataFrame(rows, "g int, id long")

    def draw(df):
        out = S.sample_n_per_group(df, "g", "id", 5).collect()
        got: dict = {}
        for r in out:
            got.setdefault(r["g"], set()).add(r["id"])
        return got

    a = draw(base.repartition(16))
    b = draw(base.repartition(3, "g").sortWithinPartitions(
        F.col("id").desc()))
    assert a == b
    sizes = {g: len((g + 1) * 7 * [0]) for g in range(4)}
    for g, ids in a.items():
        assert len(ids) == min(5, sizes[g]), (g, ids)


def test_leakage_safe_split_no_straddle(spark):
    """no pair may straddle train/val — including through TRANSITIVE
    chains (a-b, b-c puts all three on one side); unpaired ids split
    exactly like plain hash_split."""
    ids = list(range(1, 201))
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    # chain components: (1,2),(2,3) … plus scattered pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 150), (150, 151), (40, 41)],
        "id_a long, id_b long")
    train, val = S.leakage_safe_split(df, "id", pairs, val_fraction=0.4)
    t = {r["id"] for r in train.collect()}
    v = {r["id"] for r in val.collect()}
    assert t | v == set(ids) and not (t & v)
    for comp in ({1, 2, 3}, {10, 150, 151}, {40, 41}):
        assert comp <= t or comp <= v, comp
    # unpaired ids follow the plain hash_split labels exactly
    paired = {1, 2, 3, 10, 150, 151, 40, 41}
    tr0, va0 = S.hash_split(df, "id", val_fraction=0.4)
    t0 = {r["id"] for r in tr0.collect()}
    assert {i for i in t if i not in paired} == \
        {i for i in t0 if i not in paired}
    # both resolvers agree
    tr_l, va_l = S.leakage_safe_split(df, "id", pairs, val_fraction=0.4,
                                      resolver="labelprop")
    assert {r["id"] for r in va_l.collect()} == v


def test_profile_table_mixed_types_and_nulls(spark):
    from dask_expr_spark.functions.quality import profile_table

    pdf = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, None, 30.0), (4, "b", 40.0)],
        "id long, s string, v double")
    prof = {r["column"]: r for r in profile_table(
        pdf, exact_distinct=True, quantiles=(0.5,)).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert prof["id"]["n"] == 4 and prof["id"]["nulls"] == 0
    assert prof["id"]["distinct"] == 4
    assert prof["s"]["nulls"] == 1 and prof["s"]["distinct"] == 2
    assert prof["s"]["mean"] is None and prof["s"]["q50"] is None
    assert prof["s"]["min_val"] == "a" and prof["s"]["max_val"] == "b"
    assert prof["v"]["nulls"] == 1
    assert abs(prof["v"]["mean"] - (80.0 / 3)) < 1e-9
    assert prof["v"]["min_val"] == "10.0"
    # ONE aggregation job for the whole profile: no join/generate
    # before the agg and exactly one Aggregate pair (partial+final)
    plan = profile_table(pdf, exact_distinct=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_validate_reports_violations(spark):
    import pytest

    from dask_expr_spark.functions.quality import validate

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (2, None), (4, 3.0)],
        "id long, v double")
    rep = {r["check"]: r for r in validate(
        df,
        row_checks={"v_positive": F.col("v") > 0},
        complete=["v"],
        unique=["id"],
    ).collect()}
    # v > 0 violated by -1.0 AND the NULL (null-hostile by design)
    assert rep["v_positive"]["violations"] == 2
    assert not rep["v_positive"]["passed"]
    assert rep["complete(v)"]["violations"] == 1
    assert rep["unique(id)"]["violations"] == 1  # id=2 twice
    assert all(r["n"] == 4 for r in rep.values())
    with pytest.raises(ValueError, match="no checks"):
        validate(df)


def test_profile_and_validate_hostile_column_names(spark):
    """source columns named like the operators' internals must not
    alias into the report (same reserved-name contract as
    heavy_hitters' __hh_ columns)."""
    from dask_expr_spark.functions.quality import profile_table, validate

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, 3.0, "a")],
        "__n long, n double, check string")
    prof = {r["column"]: r for r in profile_table(
        df, exact_distinct=True, quantiles=(0.5,)).collect()}
    assert prof["__n"]["n"] == 2 and prof["__n"]["distinct"] == 2
    assert prof["n"]["mean"] == 2.5
    assert prof["check"]["distinct"] == 1
    rep = {r["check"]: r for r in validate(
        df, row_checks={"n_pos": F.col("n") > 0},
        unique=["__n"]).collect()}
    assert rep["n_pos"]["passed"] and rep["unique(__n)"]["passed"]
