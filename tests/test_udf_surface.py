"""Tests for the UDF escape hatches: map_partitions, map_overlap,
custom reduction (reference: SURVEY.md §2.9) + new reshape surface."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import types as T

from dask_expr_spark.sources.io import from_pandas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "k": [i % 4 for i in range(200)],
        "x": [float(i) for i in range(200)],
    })


@pytest.fixture(scope="module")
def df(spark, pdf):
    return from_pandas(spark, pdf, npartitions=8)


def test_map_partitions(df, pdf):
    schema = T.StructType([T.StructField("doubled", T.DoubleType())])

    def fn(it):
        for p in it:
            yield pd.DataFrame({"doubled": p["x"] * 2})

    got = sorted(df.map_partitions(fn, schema).compute()["doubled"])
    assert got == sorted(pdf.x * 2)


def test_reduction_custom(df, pdf):
    """chunk: per-partition sum/count; aggregate: weighted mean."""
    chunk_schema = T.StructType([
        T.StructField("s", T.DoubleType()), T.StructField("n", T.LongType())])
    agg_schema = T.StructType([T.StructField("mean", T.DoubleType())])

    def chunk(p):
        return pd.DataFrame({"s": [p["x"].sum()], "n": [len(p)]})

    def aggregate(p):
        return pd.DataFrame({"mean": [p["s"].sum() / p["n"].sum()]})

    got = df.reduction(chunk, aggregate, chunk_schema, agg_schema).compute()
    assert got["mean"][0] == pytest.approx(pdf.x.mean())


def test_map_overlap_rolling(spark, pdf):
    """value-margin overlap: centered 3-point rolling mean over x,
    computed per bucket with ±2.0 margin — must equal the global
    pandas rolling result (interior rows see full context)."""
    df = from_pandas(spark, pdf, npartitions=8)
    schema = T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("rm", T.DoubleType()),
    ])

    def fn(p):
        out = p.copy()
        out["rm"] = out["x"].rolling(3, center=True, min_periods=1).mean()
        return out[["x", "rm", "__is_main"]]

    got = (
        df.map_overlap(fn, schema, order_col="x", before=2.0, after=2.0, num_buckets=6)
        .compute().sort_values("x").reset_index(drop=True)
    )
    want = pdf.sort_values("x").reset_index(drop=True)
    want["rm"] = want["x"].rolling(3, center=True, min_periods=1).mean()
    pd.testing.assert_series_equal(got["rm"], want["rm"], check_names=False)


def test_describe(df, pdf):
    got = df.describe(["x"]).compute().set_index("statistic")["x"]
    assert got["count"] == len(pdf)
    assert got["mean"] == pytest.approx(pdf.x.mean())
    assert got["std"] == pytest.approx(pdf.x.std())
    assert got["min"] == pdf.x.min()
    assert got["max"] == pdf.x.max()


def test_melt_roundtrip(df, pdf):
    long = df.melt(id_vars=["k"], value_vars=["x"], var_name="v", value_name="val")
    got = long.compute()
    assert set(got.columns) == {"k", "v", "val"}
    assert len(got) == len(pdf)
    assert sorted(got["val"]) == sorted(pdf.x)


def test_get_dummies(df, pdf):
    got = df.get_dummies("k", [0, 1, 2, 3], prefix="k").compute()
    for v in range(4):
        assert got[f"k_{v}"].sum() == (pdf.k == v).sum()


def test_map_overlap_rows_shift(spark, pdf):
    """row-count overlap: a 2-row shift computed per bucket must equal
    the global pandas shift — boundary rows come from neighbor buckets."""
    df = from_pandas(spark, pdf, npartitions=8)
    schema = T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("prev2", T.DoubleType()),
    ])

    def fn(p):
        out = p.copy()
        out["prev2"] = out["x"].shift(2)
        return out[["x", "prev2", "__is_main"]]

    got = (
        df.map_overlap_rows(fn, schema, order_col="x", before=2, after=0, num_buckets=6)
        .compute().sort_values("x").reset_index(drop=True)
    )
    want = pdf.sort_values("x").reset_index(drop=True)
    want["prev2"] = want["x"].shift(2)
    import numpy as np
    assert np.allclose(got["prev2"].fillna(-1), want["prev2"].fillna(-1))


def test_map_overlap_rows_centered(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=8)
    schema = T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("rm", T.DoubleType()),
    ])

    def fn(p):
        out = p.copy()
        out["rm"] = out["x"].rolling(5, center=True, min_periods=1).mean()
        return out[["x", "rm", "__is_main"]]

    got = (
        df.map_overlap_rows(fn, schema, order_col="x", before=2, after=2, num_buckets=5)
        .compute().sort_values("x").reset_index(drop=True)
    )
    want = pdf.sort_values("x").reset_index(drop=True)
    want["rm"] = want["x"].rolling(5, center=True, min_periods=1).mean()
    pd.testing.assert_series_equal(got["rm"], want["rm"], check_names=False)


def test_merge_asof_directions_vs_pandas(spark):
    """merge_asof backward/forward/nearest (+tolerance, +by) must match
    pd.merge_asof row-for-row (reference: _merge_asof.py:17)."""
    import numpy as np
    import pandas as pd
    from dask_expr_spark.operators.asof import merge_asof
    from dask_expr_spark.sources.io import from_pandas

    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "g": rng.choice(["a", "b"], 40),
        "t": np.sort(rng.randint(0, 1000, 40)).astype("int64"),
    })
    right = pd.DataFrame({
        "g": rng.choice(["a", "b"], 25),
        "t": np.sort(rng.randint(0, 1000, 25)).astype("int64"),
        "v": rng.randint(0, 100, 25).astype("int64"),
    })
    # pandas requires global sort on `on`
    left = left.sort_values("t", kind="mergesort").reset_index(drop=True)
    right = right.sort_values("t", kind="mergesort").reset_index(drop=True)
    dl = from_pandas(spark, left, npartitions=3)
    dr = from_pandas(spark, right, npartitions=2)

    for direction in ["backward", "forward", "nearest"]:
        for tol in [None, 50]:
            want = pd.merge_asof(
                left, right, on="t", by="g", direction=direction,
                tolerance=tol,
            )
            got = (
                merge_asof(dl, dr, on="t", by=["g"], direction=direction,
                           tolerance=tol)
                .to_spark().toPandas()
                .sort_values(["t", "g"], kind="mergesort").reset_index(drop=True)
            )
            want = want.sort_values(["t", "g"], kind="mergesort").reset_index(drop=True)
            assert got["v"].fillna(-1).tolist() == want["v"].fillna(-1).tolist(), \
                f"direction={direction} tol={tol}"


def test_custom_aggregation_class(spark):
    """reference Aggregation(chunk, agg, finalize) — _groupby.py:95."""
    import dask_expr_spark as dx

    pdf = pd.DataFrame({"g": ["a", "a", "b", "b", "b"], "h": [1, 1, 1, 2, 2],
                        "v": [1.0, 2, 3, 4, 5]})
    d = dx.from_pandas(spark, pdf, npartitions=3)
    custom_mean = dx.Aggregation(
        "custom_mean",
        chunk=lambda s: (s.count(), s.sum()),
        agg=lambda count, sum: (count.sum(), sum.sum()),
        finalize=lambda count, sum: sum / count,
    )
    got = (d[["g", "v"]].groupby("g").agg(custom_mean)
           .compute().sort_values("g").reset_index(drop=True))
    want = pdf.groupby("g")["v"].mean().reset_index(drop=True)
    assert got["custom_mean"].tolist() == want.tolist()
    # dict spec mixing custom and builtin
    custom_range = dx.Aggregation(
        "rng", chunk=lambda s: (s.min(), s.max()),
        agg=lambda lo, hi: (lo.min(), hi.max()),
        finalize=lambda lo, hi: hi - lo)
    got2 = (d[["g", "v"]].groupby("g").agg({"v": custom_range})
            .compute().sort_values("g").reset_index(drop=True))
    want2 = (pdf.groupby("g")["v"].max() - pdf.groupby("g")["v"].min()).reset_index(drop=True)
    assert got2["rng"].tolist() == want2.tolist()
    # multi-key groupby
    got3 = (d.groupby(["g", "h"]).agg({"v": custom_range})
            .compute().sort_values(["g", "h"]).reset_index(drop=True))
    want3 = (pdf.groupby(["g", "h"])["v"].agg(lambda s: s.max() - s.min())
             .reset_index(drop=True))
    assert got3["rng"].tolist() == want3.tolist()


def test_reduction_with_combine(df, pdf):
    """reference reduction(chunk, combine, aggregate)
    (_reductions.py:835): combine shrinks partials tree-style before
    the final aggregate."""
    part_schema = T.StructType([
        T.StructField("s", T.DoubleType()), T.StructField("n", T.LongType())])
    agg_schema = T.StructType([T.StructField("mean", T.DoubleType())])

    def chunk(p):
        return pd.DataFrame({"s": [p["x"].sum()], "n": [len(p)]})

    def combine(p):
        return pd.DataFrame({"s": [p["s"].sum()], "n": [p["n"].sum()]})

    def aggregate(p):
        return pd.DataFrame({"mean": [p["s"].sum() / p["n"].sum()]})

    got = df.reduction(chunk, aggregate, part_schema, agg_schema,
                       combine=combine).compute()
    assert got["mean"][0] == pytest.approx(pdf.x.mean())


def test_map_partitions_multi_frame(spark, pdf):
    """multi-frame map_partitions (reference _expr.py:580):
    func(df1, df2) over index-aligned frames."""
    from dask_expr_spark.collection import map_partitions

    pdf2 = pd.DataFrame({"k": pdf["k"], "x": pdf["x"]})
    pdf2["i"] = range(len(pdf2))
    left = pdf2[["i", "x"]]
    right = pdf2[["i", "k"]].assign(w=pdf2["x"] * 10)
    dl = from_pandas(spark, left, npartitions=4).set_index("i")
    dr = from_pandas(spark, right.drop(columns="k"), npartitions=3).set_index("i")

    schema = T.StructType([
        T.StructField("i", T.LongType()), T.StructField("tot", T.DoubleType())])

    def fn(a, b):
        m = a.merge(b, on="i")
        return pd.DataFrame({"i": m["i"], "tot": m["x"] + m["w"]})

    got = (map_partitions(fn, dl, dr, schema=schema)
           .compute().sort_index())
    want = (left["x"] + right["w"]).rename("tot")
    assert list(got["tot"]) == list(want)

    # index mismatch raises
    with pytest.raises(ValueError):
        map_partitions(fn, dl, from_pandas(spark, right, npartitions=2),
                       schema=schema)
