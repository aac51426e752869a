"""Differential tests for groupby(by=Series/expr/level, sort=) —
reference: _clean_by_expr (_groupby.py:1322)."""

from __future__ import annotations

import pandas as pd
import pandas.testing as pdt
import pytest

from dask_expr_spark.sources.io import from_pandas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "x": range(100),
        "y": [float(i % 11) for i in range(100)],
        "seg": [f"s{i % 4}" for i in range(100)],
    })


@pytest.fixture(scope="module")
def df(spark, pdf):
    return from_pandas(spark, pdf, npartitions=4)


def _eq(got, want):
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_groupby_series_expr(df, pdf):
    got = (df.groupby(df["x"] // 7)["y"].agg(sy=("y", "sum"))
           .compute().sort_values("x").reset_index(drop=True))
    want = (pdf.groupby(pdf.x // 7).agg(sy=("y", "sum"))
            .reset_index().sort_values("x").reset_index(drop=True))
    _eq(got, want)


def test_groupby_mixed_name_and_expr(df, pdf):
    got = (df.groupby(["seg", df["x"] % 3])
           .agg(sy=("y", "sum"), n=("y", "count"))
           .compute().sort_values(["seg", "x"]).reset_index(drop=True))
    want = (pdf.groupby(["seg", pdf.x % 3])
            .agg(sy=("y", "sum"), n=("y", "count"))
            .reset_index().sort_values(["seg", "x"]).reset_index(drop=True))
    _eq(got, want)


def test_groupby_level(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4).set_index("seg")
    got = (df.groupby(level=0).agg(sy=("y", "sum"))
           .compute().sort_values("seg").reset_index(drop=True))
    want = (pdf.set_index("seg").groupby(level=0).agg(sy=("y", "sum"))
            .reset_index().sort_values("seg").reset_index(drop=True))
    _eq(got, want)


def test_groupby_level_name(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4).set_index("seg")
    got = (df.groupby(level="seg").agg(n=("y", "count")).compute()
           .sort_values("seg").reset_index(drop=True))
    want = (pdf.set_index("seg").groupby(level="seg").agg(n=("y", "count"))
            .reset_index().sort_values("seg").reset_index(drop=True))
    _eq(got, want)


def test_groupby_sort_true_orders_keys(df, pdf):
    out = df.groupby("seg", sort=True).agg(sy=("y", "sum")).compute()
    assert list(out["seg"]) == sorted(out["seg"])
    want = (pdf.groupby("seg").agg(sy=("y", "sum")).reset_index())
    _eq(out.reset_index(drop=True), want)


def test_groupby_observed_false_raises(df):
    with pytest.raises(NotImplementedError):
        df.groupby("seg", observed=False)


def test_groupby_bad_type_raises(df):
    with pytest.raises(TypeError):
        df.groupby(3.14)


def test_groupby_size_sorted(df, pdf):
    got = df.groupby(df["x"] % 5, sort=True).size().compute()
    want = pdf.groupby(pdf.x % 5).size().reset_index(name="size")
    _eq(got.reset_index(drop=True), want)


def test_series_groupby(spark):
    """pandas s.groupby(key) — column name, expression key, derived
    value, and value-derived key (name collision) forms."""
    import pandas as pd

    from dask_expr_spark.sources.io import from_pandas
    pdf = pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 3.0]})
    df = from_pandas(spark, pdf, npartitions=2)
    assert sorted(map(tuple, df["v"].groupby("k").sum().to_spark()
                  .collect())) == [(1, 3.0), (2, 3.0)]
    assert sorted(map(tuple, df["v"].groupby(df["k"] % 2).sum().to_spark()
                  .collect())) == [(0, 3.0), (1, 3.0)]
    assert sorted(map(tuple, (df["v"] * 2).groupby("k").sum().to_spark()
                  .collect())) == [(1, 6.0), (2, 6.0)]
    assert sorted(map(tuple, df["v"].groupby(df["v"] > 1.5).count().to_spark()
                  .collect())) == [(False, 1), (True, 2)]


def test_groupby_transform_str(spark):
    import pandas as pd

    from dask_expr_spark.sources.io import from_pandas
    pdf = pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 3.0]})
    df = from_pandas(spark, pdf, npartitions=1)
    got = df.groupby("k").transform("sum").compute().sort_values("v")
    assert got["v_t"].tolist() == [3.0, 3.0, 3.0]
