"""Pandas-differential tests for the facade — the reference's own test
strategy (SURVEY.md §5: assert_eq vs pandas on tiny frames)."""

from __future__ import annotations

import pandas as pd
import pandas.testing as pdt
import pytest

from dask_expr_spark.sources.io import from_pandas


@pytest.fixture(scope="module")
def pdf():
    # reference fixture shape: {"x": range(100), "y": x//7}
    # (tests/test_collection.py:44-52)
    return pd.DataFrame({"x": range(100), "y": [i // 7 for i in range(100)],
                         "z": [float(i % 5) for i in range(100)]})


@pytest.fixture(scope="module")
def df(spark, pdf):
    return from_pandas(spark, pdf, npartitions=4)


def _eq(spark_df, pandas_df, sort_by=None):
    got = spark_df.compute().reset_index(drop=True)
    want = pandas_df.reset_index(drop=True)
    if sort_by:
        got = got.sort_values(sort_by).reset_index(drop=True)
        want = want.sort_values(sort_by).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_projection(df, pdf):
    _eq(df[["x", "y"]], pdf[["x", "y"]], sort_by=["x"])


def test_filter_binop(df, pdf):
    _eq(df[(df["x"] > 10) & (df["y"] % 2 == 0)].reset_index(drop=True),
        pdf[(pdf.x > 10) & (pdf.y % 2 == 0)], sort_by=["x"])


def test_assign_arith(df, pdf):
    got = df.assign(w=lambda d: d["x"] * 2 + d["z"])
    want = pdf.assign(w=pdf.x * 2 + pdf.z)
    _eq(got, want, sort_by=["x"])


def test_groupby_agg(df, pdf):
    got = df.groupby("y").agg(sx=("x", "sum"), mz=("z", "mean"), n=("x", "count"))
    want = (pdf.groupby("y")
            .agg(sx=("x", "sum"), mz=("z", "mean"), n=("x", "count"))
            .reset_index())
    _eq(got, want, sort_by=["y"])


def test_sort_head(df, pdf):
    got = df.sort_values("x", ascending=False).head(7)
    want = pdf.sort_values("x", ascending=False).head(7)
    _eq(got, want, sort_by=["x"])


def test_drop_duplicates(df, pdf):
    got = df[["y"]].drop_duplicates()
    want = pdf[["y"]].drop_duplicates()
    _eq(got, want, sort_by=["y"])


def test_drop_duplicates_keep_requires_order(spark):
    pdf2 = pd.DataFrame({"a": [1, 1, 2], "b": [9.0, 8.0, 7.0]})
    d = from_pandas(spark, pdf2)
    with pytest.raises(ValueError, match="drop_duplicates"):
        d.drop_duplicates(subset=["a"], keep="first")
    # order_by= and set_index both unlock keep=
    got = d.drop_duplicates(subset=["a"], keep="last", order_by=["b"]).compute()
    want = (pdf2.sort_values("b").drop_duplicates(subset=["a"], keep="last")
            .reset_index(drop=True))
    pdt.assert_frame_equal(
        got.sort_values("a").reset_index(drop=True)[["a", "b"]],
        want.sort_values("a").reset_index(drop=True)[["a", "b"]],
        check_dtype=False)


def test_frame_reduce_with_boolean(spark):
    pdf2 = pd.DataFrame({"x": [1, 2, 3, 4], "b": [True, False, True, True]})
    d = from_pandas(spark, pdf2)
    for fn in ("sum", "mean", "var", "std", "median"):
        got = getattr(d, fn)().compute()
        assert got["b"].iloc[0] == pytest.approx(
            getattr(pdf2["b"], fn)()), fn
        assert got["x"].iloc[0] == pytest.approx(getattr(pdf2["x"], fn)()), fn
    # min/max keep native boolean semantics
    assert bool(d.min().compute()["b"].iloc[0]) == pdf2["b"].min()
    assert bool(d.max().compute()["b"].iloc[0]) == pdf2["b"].max()


def test_merge(spark, df, pdf):
    other = pd.DataFrame({"y": range(15), "label": [f"g{i}" for i in range(15)]})
    right = from_pandas(spark, other)
    got = df.merge(right, on="y", how="left")
    want = pdf.merge(other, on="y", how="left")
    _eq(got, want, sort_by=["x"])


def test_value_counts(df, pdf):
    got = df["y"].value_counts(sort=False).compute()
    want = pdf["y"].value_counts().rename_axis("y").reset_index(name="count")
    got = got.sort_values("y").reset_index(drop=True)
    want = want.sort_values("y").reset_index(drop=True)
    pdt.assert_frame_equal(got[["y", "count"]], want[["y", "count"]], check_dtype=False)


def test_scalar_reductions(df, pdf):
    assert df["x"].sum().compute() == pdf.x.sum()
    assert df["z"].mean().compute() == pytest.approx(pdf.z.mean())
    assert df["y"].nunique().compute() == pdf.y.nunique()


def test_set_index_ordered_ops(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4).set_index("x")
    got = df.cumsum(columns=["z"])[["z"]].compute().sort_index()
    want = pdf.set_index("x").sort_index()[["z"]].cumsum()
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_concat(spark, pdf):
    from dask_expr_spark import concat
    a = from_pandas(spark, pdf.iloc[:30])
    b = from_pandas(spark, pdf.iloc[30:])
    _eq(concat([a, b]), pdf, sort_by=["x"])


def test_str_dt_accessors(spark):
    pdf = pd.DataFrame({
        "s": ["Alpha Beta", "gamma", "DELTA x", "e"],
        "t": pd.to_datetime(["2024-01-15 10:30:00", "2024-02-01 00:00:00",
                             "2023-12-31 23:59:59", "2024-06-15 12:00:00"]),
    })
    df = from_pandas(spark, pdf)
    got = df.assign(
        up=lambda d: d["s"].str.upper(),
        ln=lambda d: d["s"].str.len(),
        yr=lambda d: d["t"].dt.year,
        dow=lambda d: d["t"].dt.dayofweek,
    )[["up", "ln", "yr", "dow"]].compute().sort_values("up").reset_index(drop=True)
    want = pd.DataFrame({
        "up": pdf.s.str.upper(),
        "ln": pdf.s.str.len(),
        "yr": pdf.t.dt.year,
        "dow": pdf.t.dt.dayofweek,
    }).sort_values("up").reset_index(drop=True)
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_loc_slice_inclusive(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4).set_index("x")
    got = df.loc[10:20].compute().sort_index()
    want = pdf.set_index("x").sort_index().loc[10:20]
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_series_map(spark, pdf):
    df = from_pandas(spark, pdf)
    got = df.assign(lbl=lambda d: d["y"].map({0: "zero", 1: "one"}))[["y", "lbl"]].compute()
    want = pdf.assign(lbl=pdf.y.map({0: "zero", 1: "one"}))[["y", "lbl"]]
    got = got.sort_values(["y"]).reset_index(drop=True)
    want = want.sort_values(["y"]).reset_index(drop=True)
    # nulls: pandas NaN vs None — normalize
    assert (got.lbl.fillna("~") == want.lbl.fillna("~")).all()


def test_combine_first(spark, pdf):
    a = pdf.iloc[:60][["x", "z"]].copy()
    a.loc[a.index[:10], "z"] = None
    b = pdf.iloc[40:][["x", "z"]].copy()
    da = from_pandas(spark, a, npartitions=2).set_index("x")
    db = from_pandas(spark, b, npartitions=2).set_index("x")
    got = da.combine_first(db).compute().sort_index()
    want = a.set_index("x").combine_first(b.set_index("x")).sort_index()
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_series_apply_pandas_udf(spark, pdf):
    df = from_pandas(spark, pdf)
    got = df.assign(w=lambda d: d["z"].apply(lambda v: v * 3 + 1))[["x", "w"]].compute()
    got = got.sort_values("x").reset_index(drop=True)
    want = (pdf.z * 3 + 1).rename("w")
    assert (got["w"] == want).all()


def test_str_accessor_breadth(spark):
    pdf = pd.DataFrame({"s": ["Hello World", "  pad  ", "abc123", "xyz"]})
    df = from_pandas(spark, pdf)
    got = df.assign(
        alnum=lambda d: d["s"].str.isalnum(),
        upper=lambda d: d["s"].str.isupper(),
        rev=lambda d: d["s"].str.reverse(),
        g0=lambda d: d["s"].str.get(0),
        nop=lambda d: d["s"].str.removeprefix("Hello "),
        nos=lambda d: d["s"].str.removesuffix("123"),
        norm=lambda d: d["s"].str.normalize_whitespace(),
    ).compute().sort_values("s").reset_index(drop=True)
    want = pdf.sort_values("s").reset_index(drop=True)
    assert list(got["rev"]) == [x[::-1] for x in want["s"]]
    assert list(got["g0"]) == [x[0] for x in want["s"]]
    assert list(got["nop"]) == [x.removeprefix("Hello ") for x in want["s"]]
    assert list(got["nos"]) == [x.removesuffix("123") for x in want["s"]]
    assert list(got["norm"]) == [" ".join(x.split()) for x in want["s"]]
    assert list(got["alnum"]) == [x.isalnum() for x in want["s"]]


def test_dt_accessor_breadth(spark):
    pdf = pd.DataFrame({"t": pd.to_datetime([
        "2024-01-01 00:00:00", "2024-02-29 12:30:45",
        "2024-03-31 23:59:59", "2024-07-04 06:00:00"])})
    df = from_pandas(spark, pdf)
    got = df.assign(
        dim=lambda d: d["t"].dt.days_in_month,
        ms=lambda d: d["t"].dt.is_month_start,
        me=lambda d: d["t"].dt.is_month_end,
        dn=lambda d: d["t"].dt.day_name,
        mn=lambda d: d["t"].dt.month_name,
    ).compute().sort_values("t").reset_index(drop=True)
    want = pdf.sort_values("t").reset_index(drop=True)
    assert list(got["dim"]) == list(want.t.dt.days_in_month)
    assert list(got["ms"]) == list(want.t.dt.is_month_start)
    assert list(got["me"]) == list(want.t.dt.is_month_end)
    assert list(got["dn"]) == list(want.t.dt.day_name())
    assert list(got["mn"]) == list(want.t.dt.month_name())


def test_get_group(spark, pdf):
    df = from_pandas(spark, pdf)
    got = df.groupby("y").get_group(3).compute()
    want = pdf[pdf.y == 3]
    assert len(got) == len(want)
    assert sorted(got["x"]) == sorted(want.x)


def test_chunk_text_edges(spark):
    from dask_expr_spark.functions.text import chunk_text
    from pyspark.sql import functions as F
    pdf = pd.DataFrame({"t": [" ".join(f"w{i}" for i in range(150)),
                              "short text", ""]})
    df = from_pandas(spark, pdf)
    out = df.to_spark().select(chunk_text(F.col("t"), 64, 16).alias("c")).collect()
    # 150 tokens, stride 48 → ceil((150-16)/48)=3 chunks
    assert len(out[0].c) == 3
    assert len(out[0].c[0].split(" ")) == 64
    # short doc → single chunk containing everything
    assert out[1].c == ["short text"]
    assert len(out[2].c) == 1


def test_agg_spec_forms(spark, pdf):
    df = from_pandas(spark, pdf)
    # str spec applies to all value columns
    got = df[["y", "x", "z"]].groupby("y").agg("sum").compute().sort_values("y")
    want = pdf.groupby("y")[["x", "z"]].sum().reset_index().sort_values("y")
    assert list(got["x"]) == list(want["x"])
    # list spec produces col_fn names
    got2 = df[["y", "x"]].groupby("y").agg(["sum", "max"]).compute()
    assert set(got2.columns) == {"y", "x_sum", "x_max"}
    # dict spec
    got3 = df[["y", "x", "z"]].groupby("y").agg({"x": "sum", "z": ["min", "max"]}).compute()
    assert set(got3.columns) == {"y", "x", "z_min", "z_max"}


def test_concat_inner(spark, pdf):
    from dask_expr_spark import concat
    a = from_pandas(spark, pdf[["x", "y"]].iloc[:30])
    b = from_pandas(spark, pdf.iloc[30:])  # has extra z column
    got = concat([a, b], join="inner").compute()
    assert set(got.columns) == {"x", "y"}
    assert len(got) == len(pdf)


def test_autocorr_and_monotonic(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=3).set_index("x")
    ac = df["z"].autocorr(lag=1)
    want = pdf.set_index("x").sort_index().z.autocorr(lag=1)
    assert ac.compute() == pytest.approx(want)
    assert df["x"].is_monotonic_increasing(order_by="x").compute() is True
    assert from_pandas(spark, pdf)["z"].is_monotonic_increasing(order_by="x").compute() is False


def test_cross_frame_binop_alignment(spark, pdf):
    a = from_pandas(spark, pdf.iloc[:60][["x", "z"]], npartitions=2).set_index("x")
    b = from_pandas(spark, pdf.iloc[40:][["x", "z"]], npartitions=2).set_index("x")
    s = (a["z"] + b["z"]).compute().sort_index()
    want = (pdf.iloc[:60].set_index("x").z + pdf.iloc[40:].set_index("x").z).sort_index()
    # overlap rows equal; non-overlap rows null/NaN on both sides
    import numpy as np
    assert list(s.index) == list(want.index)
    assert np.allclose(s.fillna(-999), want.fillna(-999))


def test_cross_frame_binop_without_index_raises(spark, pdf):
    a = from_pandas(spark, pdf.iloc[:50])
    b = from_pandas(spark, pdf.iloc[50:])
    with pytest.raises(ValueError, match="share an index"):
        a["z"] + b["z"]


def test_categorize(spark, pdf):
    pdf2 = pd.DataFrame({"k": ["b", "a", "c", "a", "b"], "v": range(5)})
    df = from_pandas(spark, pdf2)
    enc, dicts = df.categorize(["k"])
    got = enc.compute().sort_values("v").reset_index(drop=True)
    # codes follow sorted value order: a=0, b=1, c=2
    assert list(got["k_code"]) == [1, 0, 2, 0, 1]
    d = dicts["k"].compute().sort_values("k_code")
    assert list(d["k"]) == ["a", "b", "c"]


def test_stat_reductions_vs_pandas(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    import numpy as np
    s, p = df["z"], pdf.z
    assert abs(df["x"].cov(df["z"]).compute() - pdf.x.cov(pdf.z)) < 1e-9
    assert abs(df["x"].corr(df["z"]).compute() - pdf.x.corr(pdf.z)) < 1e-9
    assert abs(df["x"].dot(df["z"]).compute() - pdf.x.dot(pdf.z)) < 1e-9
    # default matches pandas (bias-corrected); bias=True gives the
    # population moments
    z = pdf.z.to_numpy()
    m = z.mean(); m2 = ((z - m) ** 2).mean()
    g1 = ((z - m) ** 3).mean() / m2 ** 1.5
    g2 = ((z - m) ** 4).mean() / m2 ** 2 - 3
    assert abs(s.skew().compute() - pdf.z.skew()) < 1e-9
    assert abs(s.kurt().compute() - pdf.z.kurt()) < 1e-9
    assert abs(s.skew(bias=True).compute() - g1) < 1e-9
    assert abs(s.kurt(bias=True).compute() - g2) < 1e-9
    small = from_pandas(spark, pdf.iloc[:8])
    assert abs(small["z"].prod().compute() - pdf.z.iloc[:8].prod()) < 1e-9


def test_idxmax_idxmin(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4).set_index("x")
    # z cycles 0..4: max 4.0 first at x=4, min 0.0 first at x=0
    assert df["z"].idxmax().compute() == 4
    assert df["z"].idxmin().compute() == 0
    g = from_pandas(spark, pdf, npartitions=4).groupby("y")
    got = g.idxmax("z", "x").compute().sort_values("y").reset_index(drop=True)
    want = pdf.groupby("y").apply(
        lambda d: d.sort_values(["z", "x"], ascending=[False, True]).x.iloc[0],
        include_groups=False,
    ).reset_index(name="idxmax_z")
    assert list(got["idxmax_z"]) == list(want["idxmax_z"])


def test_cumulative_family(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    got = df.cummax(["z"], order_by="x").compute().sort_values("x")
    want = pdf.sort_values("x").assign(z=pdf.z.cummax())
    assert list(got["z"]) == list(want["z"])
    got = df.cummin(["z"], order_by="x").compute().sort_values("x")
    assert list(got["z"]) == list(pdf.z.cummin())
    small = pdf.iloc[:10].assign(w=lambda d: d.z + 1.0)
    sdf = from_pandas(spark, small)
    got = sdf.cumprod(["w"], order_by="x").compute().sort_values("x")
    assert np.allclose(got["w"], small.w.cumprod())
    got = sdf.pct_change(columns=["w"], order_by="x").compute().sort_values("x")
    want = small.sort_values("x").w.pct_change()
    assert np.allclose(got["w"].fillna(-9), want.fillna(-9))


import numpy as np  # noqa: E402


def test_pivot_table_eval_pipe(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    got = df.pivot_table("y", "x", "z", "sum", column_values=[0, 1, 2]).compute()
    assert set(got.columns) == {"y", "0", "1", "2"} or set(got.columns) == {"y", 0, 1, 2}
    ev = df.eval("a = x * 2\nb = a + z").compute().sort_values("x")
    assert list(ev["b"]) == list(pdf.sort_values("x").eval("a = x * 2\nb = a + z")["b"])
    assert df.pipe(lambda d, n: d.limit(n), 3).compute().shape[0] == 3


def test_frame_corr_cov_long(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    got = df.corr(["x", "z"]).compute()
    pair = got[(got.col_x == "x") & (got.col_y == "z")]["corr"].iloc[0]
    assert abs(pair - pdf.x.corr(pdf.z)) < 1e-9
    cv = df.cov(["x", "z"]).compute()
    pair = cv[(cv.col_x == "x") & (cv.col_y == "z")]["cov"].iloc[0]
    assert abs(pair - pdf.x.cov(pdf.z)) < 1e-9


def test_rolling_median_and_apply(spark, pdf):
    df = from_pandas(spark, pdf.iloc[:30], npartitions=3)
    r = df.rolling(7, order_by="x", min_periods=7)
    got = r.apply(np.median, ["z"]).compute().sort_values("x")
    want = pdf.iloc[:30].sort_values("x").z.rolling(7).median()
    assert np.allclose(got["z_rapply"].fillna(-9), want.fillna(-9))
    got2 = r.median(["z"]).compute().sort_values("x")
    # JVM percentile path matches the UDF path where both are defined
    both = got.merge(got2, on="x")
    defined = both.dropna(subset=["z_rapply"])
    assert np.allclose(defined["z_rapply"], defined["z_rmedian"])


def test_partition_introspection(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    pl = df.partition_lengths().compute()
    assert pl["rows"].sum() == len(pdf)
    mu = df.memory_usage_per_partition().compute()
    assert (mu["bytes"] > 0).all()
    mud = df.memory_usage_per_partition(deep=True).compute()
    assert mud["bytes"].sum() > 0


def test_writers_roundtrip(spark, pdf, tmp_path):
    df = from_pandas(spark, pdf.iloc[:20], npartitions=2)
    from dask_expr_spark.sources.io import read_csv, read_json, read_orc
    df.to_csv(str(tmp_path / "c"))
    df.to_json(str(tmp_path / "j"))
    df.to_orc(str(tmp_path / "o"))
    assert read_csv(spark, str(tmp_path / "c")).compute().shape == (20, 3)
    assert read_json(spark, str(tmp_path / "j")).compute().shape == (20, 3)
    assert read_orc(spark, str(tmp_path / "o")).compute().shape == (20, 3)


def test_api_parity_batch(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    assert df.ndim == 2 and df.shape == (100, 3)
    assert not df.empty
    assert df.copy().compute().shape == (100, 3)
    # select_dtypes is schema-only
    assert set(df.select_dtypes(include="number").columns) == {"x", "y", "z"}
    assert df.select_dtypes(exclude="floating").columns == ["x", "y"]
    s, rest = df.pop("z")
    assert rest.columns == ["x", "y"] and s.name == "z"
    assert df[["z"]].squeeze().name == "z"
    assert df[["z"]].to_series().name == "z"
    t = df.tail(3, order_by="x").compute()
    assert list(t["x"]) == [97, 98, 99]
    assert sum(len(df.get_partition(i).compute()) for i in range(4)) == 100
    rows = list(df.set_index("x").iterrows())
    assert len(rows) == 100 and isinstance(rows[0][1], dict)
    assert len(list(df.itertuples())) == 100
    assert dict(df.items())["z"].name == "z"


def test_all_any_sem_combine(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    b = df.assign(pos=lambda d: d["x"] >= 0, big=lambda d: d["x"] > 50)
    got = b.all(["pos", "big"]).compute()
    assert bool(got["pos"][0]) is True and bool(got["big"][0]) is False
    got = b.any(["big"]).compute()
    assert bool(got["big"][0]) is True
    assert df["z"].all().compute() in (True, False)
    import numpy as np
    assert abs(df["z"].sem().compute() - pdf.z.sem()) < 1e-9
    assert df["z"].median_approximate().compute() == pdf.z.median()
    small = from_pandas(spark, pdf.iloc[:10])
    got = small["x"].combine(small["z"], max).compute().sort_values()
    want = pdf.iloc[:10].x.combine(pdf.iloc[:10].z, max).sort_values()
    assert np.allclose(list(got), list(want))


def test_monotonic_decreasing_and_named_cmp(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    neg = df.assign(nx=lambda d: -d["x"])
    assert neg["nx"].is_monotonic_decreasing(order_by="x").compute() is True
    assert df["z"].is_monotonic_decreasing(order_by="x").compute() is False
    got = df[df["x"].ge(98)].compute()
    assert len(got) == 2
    assert df["z"].isnull().sum().compute() == 0


def test_align(spark, pdf):
    a = from_pandas(spark, pdf.iloc[:60][["x", "y"]], npartitions=2).set_index("x")
    b = from_pandas(spark, pdf.iloc[40:][["x", "z"]], npartitions=2).set_index("x")
    la, ra = a.align(b)
    lg = la.compute().sort_index()
    rg = ra.compute().sort_index()
    assert len(lg) == 100 and len(rg) == 100
    assert lg["y"].isna().sum() == 40 and rg["z"].isna().sum() == 40
    li, ri = a.align(b, join="inner")
    assert len(li.compute()) == 20


def test_memory_usage_columns(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    mu = df.memory_usage().compute()
    assert int(mu["x"][0]) == 800  # 100 rows x 8 bytes
    assert df.nbytes().compute() == 800 * 3


def test_dataframe_apply_rowwise(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    got = df.apply(lambda r: r["x"] * 10 + r["z"], out="w").compute().sort_values("x")
    want = pdf.sort_values("x").apply(lambda r: r["x"] * 10 + r["z"], axis=1)
    assert np.allclose(got["w"], want)


def test_groupby_cumulative_and_fill(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    g = df.groupby("y")
    got = g.cumprod(order_by="x").compute().sort_values("x")
    want = pdf.sort_values("x").groupby("y").z.cumprod()
    assert np.allclose(got["z"], want)
    got = g.cummax(order_by="x").compute().sort_values("x")
    assert np.allclose(got["z"], pdf.groupby("y").z.cummax())
    got = g.cumcount(order_by="x").compute().sort_values("x")
    assert list(got["cumcount"]) == list(pdf.groupby("y").cumcount())
    # ffill within groups
    holey = pdf.copy()
    holey.loc[holey.index % 3 == 1, "z"] = None
    dh = from_pandas(spark, holey, npartitions=4)
    got = dh.groupby("y").ffill(order_by="x").compute().sort_values("x")
    want = holey.sort_values("x").groupby("y").ffill()["z"]
    assert np.allclose(got["z"].fillna(-9), want.fillna(-9))


def test_groupby_tail_corr_valuecounts_unique(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4)
    g = df.groupby("y")
    t = g.tail(2, order_by="x").compute()
    want = pdf.groupby("y").tail(2)
    assert sorted(t["x"]) == sorted(want["x"])
    c = g.corr("x", "z").compute().sort_values("y").reset_index(drop=True)
    want_c = pdf.groupby("y").apply(lambda d: d.x.corr(d.z), include_groups=False)
    assert np.allclose(c["corr_x_z"].fillna(-9), want_c.fillna(-9).values, atol=1e-9)
    vc = g.value_counts("z").compute()
    want_vc = pdf.groupby(["y", "z"]).size()
    assert len(vc) == len(want_vc) and vc["count"].sum() == 100
    u = g.unique("z").compute().sort_values("y").reset_index(drop=True)
    want_u = pdf.groupby("y").z.unique().map(lambda a: sorted(a))
    assert [list(v) for v in u["unique_z"]] == [list(v) for v in want_u]
    p = g.prod().compute()
    assert "z" in p.columns


def test_series_nlargest_between_time(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=4).set_index("x")
    top = df["z"].nlargest(3).compute()
    assert list(top["z"]) == [4.0, 4.0, 4.0]
    bot = df["z"].nsmallest(2).compute()
    assert list(bot["z"]) == [0.0, 0.0]
    tdf = pd.DataFrame({"t": pd.to_datetime(
        ["2024-01-01 08:15:00", "2024-01-01 12:00:00", "2024-01-01 23:30:00"]),
        "v": [1, 2, 3]})
    sdf = from_pandas(spark, tdf)
    assert list(sdf.between_time("08:00:00", "13:00:00", on="t").compute()["v"]) == [1, 2]
    # wrap-around window
    assert list(sdf.between_time("22:00:00", "09:00:00", on="t").compute()
                .sort_values("v")["v"]) == [1, 3]
    assert list(sdf.at_time("12:00:00", on="t").compute()["v"]) == [2]


def test_str_accessor_batch3(spark):
    """batch 3 completes the reference _str_accessor.py:22-75 list."""
    pdf = pd.DataFrame({"s": ["hello world", "Abc Def", "xy", "123", "a-b-c"]})
    df = from_pandas(spark, pdf)
    got = df.assign(
        cf=lambda d: d["s"].str.casefold(),
        ctr=lambda d: d["s"].str.center(9, "*"),
        lj=lambda d: d["s"].str.ljust(8, "."),
        rj=lambda d: d["s"].str.rjust(8, "."),
        it=lambda d: d["s"].str.istitle(),
        fm=lambda d: d["s"].str.fullmatch("[a-z ]+"),
        mt=lambda d: d["s"].str.match("[a-z]+"),
        dec=lambda d: d["s"].str.isdecimal(),
        tr=lambda d: d["s"].str.translate("abc", "xyz"),
        part=lambda d: d["s"].str.partition("-").str.join("|"),
        rpart=lambda d: d["s"].str.rpartition("-").str.join("|"),
        fa=lambda d: d["s"].str.findall("[a-z]+").str.join(","),
    ).compute().sort_values("s").reset_index(drop=True)
    want = pdf.sort_values("s").reset_index(drop=True)
    assert list(got["cf"]) == list(want.s.str.casefold())
    assert list(got["ctr"]) == list(want.s.str.center(9, "*"))
    assert list(got["lj"]) == list(want.s.str.ljust(8, "."))
    assert list(got["rj"]) == list(want.s.str.rjust(8, "."))
    assert list(got["it"]) == list(want.s.str.istitle())
    assert list(got["fm"]) == [bool(x) for x in want.s.str.fullmatch("[a-z ]+")]
    assert list(got["mt"]) == [bool(x) for x in want.s.str.match("[a-z]+")]
    assert list(got["dec"]) == list(want.s.str.isdecimal())
    assert list(got["tr"]) == [x.translate(str.maketrans("abc", "xyz")) for x in want["s"]]
    assert list(got["part"]) == ["|".join(x.partition("-")) for x in want["s"]]
    assert list(got["rpart"]) == ["|".join(x.rpartition("-")) for x in want["s"]]
    import re
    assert list(got["fa"]) == [",".join(re.findall("[a-z]+", x)) for x in want["s"]]


def test_dt_accessor_batch3(spark):
    """batch 3 completes the reference _datetime.py:15-71 list."""
    pdf = pd.DataFrame({"t": pd.to_datetime([
        "2024-02-29 10:31:00", "1999-12-31 23:45:10", "2021-01-01 00:00:00",
        "2018-12-31 06:00:00", "2000-03-31 12:29:59", "2026-12-28 00:00:00"])})
    df = from_pandas(spark, pdf)
    got = df.assign(
        wd=lambda d: d["t"].dt.weekday,
        leap=lambda d: d["t"].dt.is_leap_year,
        qe=lambda d: d["t"].dt.is_quarter_end,
        ye=lambda d: d["t"].dt.is_year_end,
        ceilh=lambda d: d["t"].dt.ceil("H"),
        rndh=lambda d: d["t"].dt.round("H"),
        iso=lambda d: d["t"].dt.isocalendar(),
    ).compute().sort_values("t").reset_index(drop=True)
    want = pdf.sort_values("t").reset_index(drop=True)
    assert list(got["wd"]) == list(want.t.dt.weekday)
    assert list(got["leap"]) == list(want.t.dt.is_leap_year)
    assert list(got["qe"]) == list(want.t.dt.is_quarter_end)
    assert list(got["ye"]) == list(want.t.dt.is_year_end)
    assert list(got["ceilh"]) == list(want.t.dt.ceil("h"))
    assert list(got["rndh"]) == list(want.t.dt.round("h"))
    iso = want.t.dt.isocalendar()
    assert [(r["year"], r["week"], r["day"]) for r in got["iso"]] == \
        [(int(y), int(w), int(dd)) for y, w, dd in zip(iso.year, iso.week, iso.day)]


def test_concat_axis1(spark):
    """axis=1 concat aligns on the index (reference: ConcatIndexed,
    _concat.py:344) — outer keeps all index values, inner intersects."""
    import dask_expr_spark.collection as C

    pa = pd.DataFrame({"k": [1, 2, 3, 4], "a": [10.0, 20.0, 30.0, 40.0]})
    pb = pd.DataFrame({"k": [2, 3, 4, 5], "b": ["x", "y", "z", "w"]})
    fa = from_pandas(spark, pa).set_index("k")
    fb = from_pandas(spark, pb).set_index("k")

    got = C.concat([fa, fb], axis=1).compute().reset_index().sort_values("k").reset_index(drop=True)
    want = (
        pd.concat([pa.set_index("k"), pb.set_index("k")], axis=1)
        .reset_index().sort_values("k").reset_index(drop=True)
    )
    assert list(got["k"]) == list(want["k"])
    assert got["a"].fillna(-1).tolist() == want["a"].fillna(-1).tolist()
    assert got["b"].fillna("-").tolist() == want["b"].fillna("-").tolist()

    inner = C.concat([fa, fb], axis=1, join="inner").compute().reset_index().sort_values("k")
    assert list(inner["k"]) == [2, 3, 4]

    with pytest.raises(ValueError):
        C.concat([fa, from_pandas(spark, pb)], axis=1)  # unindexed

    # the equi-join destroys range order — known_sorted must NOT survive,
    # or a later sort on the index would be silently elided
    assert not C.concat([fa, fb], axis=1).known_sorted
    assert not fa["a"].rank().known_sorted


def test_divisions_and_diagnostics_api(spark, pdf):
    """reference parity batch: divisions metadata, iloc (column-
    positional), info/to_string, index property, runtime division
    enforcement."""
    df = from_pandas(spark, pdf, npartitions=4)
    idx = df.set_index("x")
    assert idx.known_divisions
    assert not df.known_divisions
    assert not idx.clear_divisions().known_divisions

    divs = idx.compute_current_divisions()
    assert len(divs) >= 2 and divs[0] == 0 and divs[-1] == 99

    # enforce passes on sorted data (raises inside a job otherwise)
    idx.enforce_runtime_divisions().compute()

    assert df.axes[1] == list(pdf.columns)
    got = df.iloc[:, [0]].compute()
    assert list(got.columns) == [pdf.columns[0]]
    got2 = df.iloc[:, 0]
    assert got2.name == pdf.columns[0]
    with pytest.raises(NotImplementedError):
        df.iloc[0]
    with pytest.raises(NotImplementedError):
        df.iloc[[1, 2], :]

    assert list(idx.index.compute()) == sorted(pdf["x"].tolist())
    assert "Columns" in df.info()
    assert "x" in df.to_string()
    assert df["x"].dtype == "bigint"
    assert df.values.shape == pdf.shape
    null_counts = df.isnull().sum().compute()
    assert int(null_counts.iloc[0, 0]) == 0


def test_series_parity_batch(spark, pdf):
    """Series-level reference methods that are one-column frame ops."""
    df = from_pandas(spark, pdf, npartitions=3)
    s = df["z"]
    assert s.ndim == 1
    assert s.shape == (100,)
    assert s.rename("w").name == "w"
    assert s.add_prefix("p_").name == "p_z"
    assert s.add_suffix("_s").name == "z_s"
    assert int(s.nbytes.compute()) == 800
    d = s.describe().compute()
    assert float(d["mean"].iloc[0]) == pytest.approx(pdf.z.mean())
    assert sorted(s.drop_duplicates().compute()["z"]) == sorted(pdf.z.unique())
    got = df["y"].between(3, 5, "left").to_frame("b").compute()
    assert got["b"].sum() == ((pdf.y >= 3) & (pdf.y < 5)).sum()
    # dropna keeps the anchor filtered
    pdn = pdf.copy()
    pdn.loc[pdn.index[:10], "z"] = None
    dn = from_pandas(spark, pdn)["z"].dropna()
    assert dn.to_frame().compute()["z"].notna().all()
    assert len(dn.to_frame().compute()) == 90
    # explode an array column
    arr = df.assign(a=lambda d: d["y"])  # placeholder to keep lineage
    import pyspark.sql.functions as SF
    ser = Series = None
    from dask_expr_spark.collection import Series as _S
    sarr = _S(df.to_spark().select(SF.array("x", "y").alias("xy")), SF.col("xy"), "xy")
    ex = sarr.explode().compute()
    assert len(ex) == 200
    assert len(s.to_string().splitlines()) == 10


def test_plan_diagnostics_and_partitions(spark, capsys):
    pdf = pd.DataFrame({"x": range(40), "y": [i % 4 for i in range(40)]})
    df = from_pandas(spark, pdf, npartitions=4)
    # diagnostics render Catalyst stages without executing
    df.pprint()
    assert df.simplify() is df
    assert df.optimize() is df
    assert df.lower_once() is df
    df.analyze()
    df.visualize()
    out = capsys.readouterr().out
    assert "Project" in out or "LogicalRDD" in out or "Scan" in out
    # positional partition accessor: all slices union back to the frame
    n = df.npartitions()
    total = sum(len(df.partitions[i].compute()) for i in range(n))
    assert total == 40
    assert len(df.partitions[-1].compute()) == len(df.partitions[n - 1].compute())
    sliced = df.partitions[0:2].compute()
    assert len(sliced) == len(df.partitions[0].compute()) + len(df.partitions[1].compute())


def test_to_bag(spark):
    pdf = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    df = from_pandas(spark, pdf)
    tup = sorted(df.to_bag().collect())
    assert tup == [(1, "a"), (2, "b"), (3, "c")]
    dicts = df.to_bag(format="dict").collect()
    assert sorted(d["x"] for d in dicts) == [1, 2, 3]


def test_module_level_api(spark):
    import dask_expr_spark as dx
    import pyspark.sql.functions as SF

    df = from_pandas(spark, pd.DataFrame(
        {"x": [1.0, 2.0, None], "d": ["2024-01-01", "2024-06-02", "2024-12-31"],
         "n": ["1", "2", "x"]}))
    ts = dx.to_datetime(df["d"]).to_frame("t").compute()["t"]
    assert ts.dt.year.tolist() == [2024, 2024, 2024]
    assert dx.to_numeric(df["n"], errors="coerce").to_frame("v").compute()["v"].isna().sum() == 1
    td = dx.to_timedelta(df["x"], unit="h")
    assert td.dtype == "interval day to second"
    g = dx.elemwise(lambda a, b: SF.greatest(a, b), df["x"], 1.5, name="g")
    assert sorted(g.to_frame("g").compute()["g"].dropna()) == [1.5, 1.5, 2.0]
    assert dx.isna(df["x"]).to_frame("m").compute()["m"].sum() == 1
    left = from_pandas(spark, pd.DataFrame({"k": [1, 2, 4], "w": [10, 20, 40]}))
    right = from_pandas(spark, pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    assert len(dx.merge(left, right, on="k").compute()) == 2
    assert len(dx.melt(left, ["k"], ["w"]).compute()) == 3
    assert dx.repartition(left, 2).npartitions() == 2
    def _double(it):
        for p in it:
            yield p.assign(w2=p.w * 2)

    assert len(dx.map_partitions(_double, left,
                                 "k long, w long, w2 long").compute()) == 3


def test_lazy_repr(spark):
    df = from_pandas(spark, pd.DataFrame({"a": [1], "b": ["x"]}))
    r = repr(df)
    assert "a: bigint" in r and "b: string" in r
    assert repr(df["a"]) == "<Series 'a' [bigint]>"
    idx = df.set_index("a")
    assert "index=['a']" in repr(idx)


def test_repartition_forms(spark):
    pdf = pd.DataFrame({"i": range(100), "v": [float(i) for i in range(100)],
                        "t": pd.date_range("2024-01-01", periods=100, freq="6h")})
    df = from_pandas(spark, pdf, npartitions=4)
    # divisions: bucket boundaries over the index
    dv = df.set_index("i").repartition(divisions=[0, 25, 50, 100])
    assert dv.npartitions() == 3
    # contract: a division bucket is never split across partitions, and
    # partition order follows division order (buckets may merge)
    seen = []
    for k in range(dv.npartitions()):
        rows = dv.partitions[k].compute()
        if len(rows):
            buckets = {min(2, v // 25) if v < 50 else 2 for v in rows.index}
            seen.append((k, min(rows.index), max(rows.index), buckets))
    total = sum(len(dv.partitions[k].compute()) for k in range(dv.npartitions()))
    assert total == 100
    for (k1, _, hi1, b1), (k2, lo2, _, b2) in zip(seen, seen[1:]):
        assert hi1 < lo2  # ordered, non-overlapping
        assert not (b1 & b2)  # no bucket split across partitions
    assert dv.known_sorted
    # partition_size: derives a count from plan stats
    ps = df.repartition(partition_size="1MB")
    assert ps.npartitions() >= 1
    assert len(ps.compute()) == 100
    # freq: time-range partitioning
    fr = df.set_index("t").repartition(freq="D")
    assert len(fr.compute()) == 100
    assert fr.known_sorted
    with pytest.raises(ValueError):
        df.repartition(3, divisions=[0, 1])


def test_interchange_protocol(spark):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": 1})
    df = from_pandas(spark, pdf, npartitions=2)
    di = df.__dataframe__()
    assert di.num_columns() == 2
    assert di.num_rows() == 3


def test_param_parity_round3(spark):
    """round-3 parameter-parity batch: value_counts(ascending=),
    sample(replace=/n=raise), mode(dropna=), melt defaults,
    describe(percentiles=/include=/exclude=), memory_usage(index=)."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame({
        "i": range(20),
        "g": [["a", "b", "b", None][k % 4] for k in range(20)],
        "x": np.arange(20, dtype="float64"),
    })
    d = from_pandas(spark, pdf, npartitions=3)

    vc = d["g"].value_counts(ascending=True).compute()
    assert vc["count"].is_monotonic_increasing

    with pytest.raises(ValueError, match="number of sampled items"):
        d.sample(n=5)
    assert d.sample(frac=0.5, replace=True, random_state=1).compute() is not None

    assert d["g"].mode().compute() == "b"
    allnull = from_pandas(
        spark, pd.DataFrame({"v": pd.array([None, None, 1], dtype="Int64")}),
        npartitions=1)
    assert allnull["v"].mode(dropna=False).compute() is None  # null bucket wins

    m = d.melt(id_vars=["i"]).compute()
    assert set(m["variable"]) == {"g", "x"}
    assert len(m) == 40

    desc = d.describe(percentiles=[0.1, 0.5]).compute()
    assert list(desc["statistic"]) == ["count", "mean", "std", "min",
                                       "10%", "50%", "max"]
    assert "x" in desc.columns
    only_obj = d.describe(include=["number"], exclude=["double"]).compute()
    assert "x" not in only_obj.columns

    di = d.set_index("i")
    wide_all = di.memory_usage().compute()
    wide_noidx = di.memory_usage(index=False).compute()
    assert "i" in wide_all.columns and "i" not in wide_noidx.columns


def test_frame_quantile(spark):
    """DataFrame.quantile (reference _collection.py:3819): axis=0
    per-column rows, list q, tdigest method; axis=1 per-row."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({"i": range(50), "a": rng.randn(50) * 10,
                        "b": rng.rand(50), "s": ["x"] * 50})
    d = from_pandas(spark, pdf, npartitions=3).set_index("i")
    got = d.quantile([0.25, 0.5, 0.9]).compute().set_index("quantile")
    for p in (0.25, 0.5, 0.9):
        for c in ("a", "b"):
            assert abs(got.loc[p, c] - pdf[c].quantile(p)) < 1e-9
    assert "s" not in got.columns
    # sketch method returns a near-quantile data value
    ap = d.quantile(0.5, method="tdigest").compute()
    assert abs(ap["a"].iloc[0] - pdf["a"].quantile(0.5)) < 2.0
    # axis=1 matches pandas row quantile
    got1 = d.quantile(0.5, axis=1).compute().sort_index()
    want1 = pdf.set_index("i")[["a", "b"]].quantile(0.5, axis=1)
    pdt.assert_series_equal(got1.astype("float64"), want1,
                            check_names=False, atol=1e-9, rtol=0)


def test_str_wrap_translate_decode(spark):
    """the last .str exclusions closed: wrap (textwrap-exact),
    dict-translate, decode/encode round-trip."""
    import pandas as pd

    pdf = pd.DataFrame({"i": range(3), "t": [
        "the quick brown fox jumps over the lazy dog",
        "supercalifragilisticexpialidocious word",
        None,
    ]}).set_index("i")
    d = from_pandas(spark, pdf.reset_index(), npartitions=2).set_index("i")
    got = d["t"].str.wrap(12).compute().sort_index()
    want = pdf["t"].str.wrap(12)
    pdt.assert_series_equal(got, want, check_names=False)

    tbl = str.maketrans({"o": "0", "e": None, "q": "kw"})
    got = d["t"].str.translate(tbl).compute().sort_index()
    want = pdf["t"].str.translate(tbl)
    pdt.assert_series_equal(got, want, check_names=False)

    # 1:1 dict stays JVM-side (no BatchEvalPython / ArrowEvalPython)
    simple = d["t"].str.translate({"o": "0", "e": None})
    plan = simple._anchor.select(simple._scol)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    got = simple.compute().sort_index()
    want = pdf["t"].str.translate(str.maketrans({"o": "0", "e": None}))
    pdt.assert_series_equal(got, want, check_names=False)

    rt = d["t"].str.encode("utf-8").str.decode("utf-8").compute().sort_index()
    pdt.assert_series_equal(rt, pdf["t"], check_names=False)


def test_size_and_from_dict_classmethod(spark):
    import dask_expr_spark as dx
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]})
    df = from_pandas(spark, pdf, npartitions=2)
    assert df.size.compute() == pdf.size
    assert df["a"].size.compute() == pdf["a"].size
    d2 = dx.DataFrame.from_dict({"x": [1, 2], "y": ["u", "v"]},
                                npartitions=1, spark=spark)
    assert sorted(map(tuple, d2.to_spark().collect())) == [(1, "u"), (2, "v")]


def test_rolling_agg_spec(spark):
    import numpy as np
    pdf = pd.DataFrame({"i": range(20), "x": np.arange(20) * 1.0,
                        "y": (np.arange(20) % 5) * 2.0})
    df = from_pandas(spark, pdf, npartitions=3)
    got = (df.rolling(3, order_by="i").agg({"x": ["sum", "mean"], "y": "max"})
           .compute().sort_values("i"))
    r = pdf.set_index("i").rolling(3, min_periods=3)
    assert np.allclose(got["x_rsum"].fillna(-1), r["x"].sum().fillna(-1).values)
    assert np.allclose(got["x_rmean"].fillna(-1), r["x"].mean().fillna(-1).values)
    assert np.allclose(got["y_rmax"].fillna(-1), r["y"].max().fillna(-1).values)
    got2 = df.rolling(4, order_by="i").agg(["sum", "min"]).compute().sort_values("i")
    r2 = pdf.set_index("i").rolling(4, min_periods=4)
    assert np.allclose(got2["x_rsum"].fillna(-1), r2["x"].sum().fillna(-1).values)
    assert np.allclose(got2["y_rmin"].fillna(-1), r2["y"].min().fillna(-1).values)
    e = df.expanding(order_by="i").agg({"x": "sum"}).compute().sort_values("i")
    assert np.allclose(e["x_rsum"], pdf.set_index("i")["x"].expanding().sum().values)


def test_module_level_writers(spark, tmp_path):
    """reference exposes writers as free functions
    (dask_expr/__init__.py:9-16) — the facade mirrors them."""
    import dask_expr_spark as dx
    df = from_pandas(spark, pd.DataFrame({"a": [1, 2, 3],
                                          "s": ["x", "y", "x"]}),
                     npartitions=2)
    dx.to_parquet(df, str(tmp_path / "p"))
    dx.to_csv(df, str(tmp_path / "c"))
    dx.to_json(df, str(tmp_path / "j"))
    dx.to_orc(df, str(tmp_path / "o"))
    assert len(dx.read_parquet(spark, str(tmp_path / "p")).to_spark().collect()) == 3
    assert len(dx.to_records(df)) == 3
    assert dx.to_bag(df).count() == 3
    gd = dx.get_dummies(df, "s", values=["x", "y"])
    assert set(gd.columns) >= {"s_x", "s_y"}
    for n in ("read_sql", "read_sql_table", "read_sql_query", "to_sql"):
        assert callable(getattr(dx, n))


def test_dataframe_interchange_protocol(spark):
    """reference: __dataframe__ (_collection.py:2722) — round-trip
    through pandas.api.interchange."""
    import pandas.api.interchange as pi
    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    df = from_pandas(spark, pdf, npartitions=1)
    back = pi.from_dataframe(df.__dataframe__())
    assert list(back.columns) == ["a", "b"] and len(back) == 2


def test_series_min_count(spark):
    """reference: test_reductions.py::test_series_agg_with_min_count."""
    df = from_pandas(spark, pd.DataFrame({"a": [1.0, None]}), npartitions=1)
    assert df["a"].sum(min_count=0).compute() == 1.0
    assert df["a"].sum(min_count=2).compute() is None
    assert df["a"].prod(min_count=2).compute() is None
    assert df["a"].prod(min_count=1).compute() == 1.0


def test_loc_with_series_and_callable(spark):
    """reference: test_indexing.py::test_loc_with_series / _function."""
    pdf = pd.DataFrame({"i": range(10), "x": range(10)})
    df = from_pandas(spark, pdf, npartitions=2).set_index("i")
    got = df.loc[df["x"] % 2 == 0].compute().sort_index()
    want = pdf.set_index("i").loc[lambda d: d.x % 2 == 0]
    pdt.assert_frame_equal(got, want)
    got2 = df.loc[lambda d: d["x"] > 6, :].compute().sort_index()
    pdt.assert_frame_equal(got2, pdf.set_index("i").loc[lambda d: d.x > 6, :])


def test_merge_asof_index_and_on_aliases(spark):
    """reference: tests/test_merge_asof.py — indexed and
    left_on/right_on forms."""
    import dask_expr_spark as dx
    A = pd.DataFrame({"idx": [1, 3, 7, 9, 10, 13, 14, 17, 20, 24, 25, 28],
                      "left_val": list("abcd" * 3)})
    B = pd.DataFrame({"ridx": [1, 2, 3, 6, 7, 10, 12, 14, 16, 19, 23, 26],
                      "right_val": list("xyz" * 4)})
    a = from_pandas(spark, A, npartitions=4).set_index("idx")
    b = from_pandas(spark, B, npartitions=3).set_index("ridx")
    got = dx.merge_asof(a, b, left_index=True, right_index=True) \
        .compute().sort_index()
    want = pd.merge_asof(A.set_index("idx"), B.set_index("ridx"),
                         left_index=True, right_index=True)
    assert list(got["right_val"]) == list(want["right_val"])
    A2 = pd.DataFrame({"a": [1, 5, 10], "lv": ["a", "b", "c"]})
    B2 = pd.DataFrame({"b": [1, 2, 3, 6, 7], "rv": [1, 2, 3, 6, 7]})
    got2 = dx.merge_asof(from_pandas(spark, A2, npartitions=2),
                         from_pandas(spark, B2, npartitions=2),
                         left_on="a", right_on="b").compute().sort_values("a")
    want2 = pd.merge_asof(A2, B2, left_on="a", right_on="b")
    assert list(got2["rv"]) == list(want2["rv"])


def test_delitem_and_series_pipe(spark):
    """reference: test_collection.py test_del / test_pipe."""
    df = from_pandas(spark, pd.DataFrame({"x": [1, 2], "y": [3, 4]}),
                     npartitions=1)
    del df["y"]
    assert df.columns == ["x"]
    with pytest.raises(KeyError):
        del df["zz"]
    s = df["x"].pipe(lambda s_, k: s_ + k, 10)
    assert sorted(s.compute().tolist()) == [11, 12]


def test_columns_setter_and_contains(spark):
    """reference: test_collection.py:2143/2154."""
    df = from_pandas(spark, pd.DataFrame({"x": [1], "y": [2]}), npartitions=1)
    assert "x" in df and "zz" not in df
    df.columns = ["a", "b"]
    assert df.columns == ["a", "b"]
    assert df[["a"]].compute().iloc[0, 0] == 1
    with pytest.raises(ValueError, match="Length mismatch"):
        df.columns = [1, 2, 3]


def test_scalar_in_series_arithmetic(spark):
    """reference: test_collection.py:2736 (binop_scalar_left) — lazy
    Scalars participate in Series expressions via a Spark scalar
    subquery (no eager job, anchor unchanged)."""
    pdf = pd.DataFrame({"x": [0, 1, 0, 1], "y": [0, 0, 1, 1]})
    df = from_pandas(spark, pdf, npartitions=2)
    df = df.assign(
        cell_x=((df["x"] - df["x"].min()) // 1).astype("long"),
        cell_y=((df["y"].max() - df["y"]) // 1).astype("long"),
    )
    got = df.compute().sort_values(["x", "y"]).reset_index(drop=True)
    want = pdf.copy()
    want["cell_x"] = ((pdf.x - pdf.x.min()) // 1).astype("int64")
    want["cell_y"] = ((pdf.y.max() - pdf.y) // 1).astype("int64")
    pdt.assert_frame_equal(got, want.sort_values(["x", "y"]).reset_index(drop=True))


def test_scalar_to_series(spark):
    """reference: test_collection.py:2415."""
    df = from_pandas(spark, pd.DataFrame({"a": [1, 2]}), npartitions=1)
    sc = df["a"].sum()
    assert sc.to_series().iloc[0] == 3
    assert list(sc.to_series("xxx").index) == ["xxx"]


def test_scalar_algebra(spark):
    """lazy Scalar arithmetic composes through scalar subqueries."""
    df = from_pandas(spark, pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0]}),
                     npartitions=2)
    assert (df["x"].sum() / df["x"].count()).compute() == 2.5
    assert (df["x"].max() - df["x"].min()).compute() == 3.0
    assert (10 - df["x"].sum()).compute() == 0.0
    assert (df["x"].sum() > 5).compute() is True
    z = df.assign(z=df["x"] - df["x"].sum() / df["x"].count())
    assert sorted(z.compute()["z"].tolist()) == [-1.5, -0.5, 0.5, 1.5]


def test_describe_include_object(spark):
    """reference: Describe object path (_describe.py) —
    count/unique/top/freq; top ties resolve to smallest value."""
    pdf = pd.DataFrame({"s": ["a", "b", "a", "c", None],
                        "t": ["x", "x", "y", "y", "y"], "n": [1, 2, 3]*1 + [4, 5]})
    df = from_pandas(spark, pdf, npartitions=2)
    got = df.describe(include="object").compute().set_index("statistic")
    assert got.loc["count", "s"] == "4" and got.loc["unique", "s"] == "3"
    assert got.loc["top", "s"] == "a" and got.loc["freq", "s"] == "2"
    assert got.loc["top", "t"] == "y" and got.loc["freq", "t"] == "3"


def test_concat_accepts_pandas_objects(spark):
    """reference: test_concat.py:36 — raw pandas frames mix into
    concat and are converted against the session."""
    import dask_expr_spark as dx
    df = from_pandas(spark, pd.DataFrame({"x": [1, 2]}), npartitions=1)
    out = dx.concat([df, pd.DataFrame({"x": [3, 4]})])
    assert sorted(out.compute()["x"].tolist()) == [1, 2, 3, 4]


def test_groupby_ngroups(spark):
    df = from_pandas(spark, pd.DataFrame({"k": [1, 1, 2, 3], "v": range(4)}),
                     npartitions=2)
    assert df.groupby("k").ngroups.compute() == 3


def test_assign_pandas_series_scalar_ndarray(spark):
    """reference: test_collection.py:1996,2043 — assign accepts lazy
    Scalars (subquery) and pandas Series (index-aligned); raw ndarrays
    raise (no positional order on a distributed frame)."""
    import numpy as np
    pdf = pd.DataFrame({"i": [10, 20, 30], "x": [1, 2, 3]})
    df = from_pandas(spark, pdf, npartitions=2).set_index("i")
    ps = pd.Series([7, 8, 9], index=pd.Index([10, 20, 30], name="i"))
    got = df.assign(a=ps, b=df["x"].sum()).compute().sort_index()
    assert got["a"].tolist() == [7, 8, 9] and got["b"].tolist() == [6, 6, 6]
    with pytest.raises(TypeError, match="positional"):
        df.assign(z=np.array([1, 2, 3]))


def test_setitem_pandas_series_scalar(spark):
    """__setitem__ mirrors assign(): pandas Series index-aligns, lazy
    Scalar becomes a subquery, ndarray raises."""
    import numpy as np
    df = from_pandas(spark, pd.DataFrame({"i": [1, 2], "x": [5, 6]}),
                     npartitions=1).set_index("i")
    df["a"] = pd.Series([9, 8], index=pd.Index([1, 2], name="i"))
    df["b"] = df["x"].sum()
    got = df.compute().sort_index()
    assert got["a"].tolist() == [9, 8] and got["b"].tolist() == [11, 11]
    with pytest.raises(TypeError, match="positional"):
        df["z"] = np.array([1, 2])


def test_isin_with_series(spark):
    """reference: test_collection.py:965 isin with dask inputs —
    correlated EXISTS subquery, planned as a left-semi join."""
    df = from_pandas(spark, pd.DataFrame({"x": [1, 2, 3]}), npartitions=2)
    other = from_pandas(spark, pd.DataFrame({"v": [1, 3]}), npartitions=1)
    filt = df[df["x"].isin(other["v"])]
    assert sorted(filt.compute()["x"].tolist()) == [1, 3]
    plan = filt.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_frame_isin_and_where_mask_series_other(spark):
    """pandas df.isin(list/dict); where/mask with Series/Scalar other."""
    pdf = pd.DataFrame({"x": [1, 2], "y": [30, 10]})
    df = from_pandas(spark, pdf, npartitions=1)
    assert (df.isin([1, 30]).compute().values.tolist()
            == pdf.isin([1, 30]).values.tolist())
    assert (df.isin({"x": [2]}).compute().values.tolist()
            == pdf.isin({"x": [2]}).values.tolist())
    assert df["x"].where(df["x"] > 1, df["y"]).compute().tolist() == [30, 2]
    assert df["x"].mask(df["x"] > 1, df["y"].max()).compute().tolist() == [1, 30]


def test_series_fillna_series_and_scalar(spark):
    pdf = pd.DataFrame({"x": [1.0, None], "y": [9.0, 7.0]})
    df = from_pandas(spark, pdf, npartitions=1)
    assert df["x"].fillna(df["y"]).compute().tolist() == [1.0, 7.0]
    assert df["x"].fillna(df["y"].mean()).compute().tolist() == [1.0, 8.0]


def test_frame_round(spark):
    pdf = pd.DataFrame({"a": [1, 2], "b": [1.55, 2.44]})
    df = from_pandas(spark, pdf, npartitions=1)
    assert df.round({"b": 1}).compute()["b"].tolist() == [1.6, 2.4]
    assert df.round().compute()["b"].tolist() == [2.0, 2.0]


def test_frame_arithmetic(spark):
    """reference: test_collection.py:598 method operators — frame <op>
    scalar / axis=0 Series broadcast / indexed frame with fill_value."""
    pdf = pd.DataFrame({"i": [1, 2], "a": [2.0, 4.0], "b": [10.0, 20.0]})
    df = from_pandas(spark, pdf, npartitions=1)
    d = df[["a", "b"]]
    assert (d + 1).compute()["a"].tolist() == [3.0, 5.0]
    assert (1 - d).compute()["a"].tolist() == [-1.0, -3.0]
    assert (2 * d).compute()["b"].tolist() == [20.0, 40.0]
    assert d.sub(d["a"], axis=0).compute()["b"].tolist() == [8.0, 16.0]
    d1 = df[["i", "a"]].set_index("i")
    d2 = df[["i", "b"]].set_index("i")
    s_ = d1.add(d2, fill_value=0).compute().sort_index()
    assert s_["a"].tolist() == [2.0, 4.0] and s_["b"].tolist() == [10.0, 20.0]


def test_series_named_arithmetic_fill_value(spark):
    pdf = pd.DataFrame({"x": [1.0, None, 3.0], "y": [10.0, 20.0, None]})
    df = from_pandas(spark, pdf, npartitions=1)
    got = df["x"].add(df["y"], fill_value=0).compute().tolist()
    assert got == pdf.x.add(pdf.y, fill_value=0).tolist()
    assert df["x"].rsub(1).compute().tolist()[0] == 0.0


def test_astype_type_objects(spark):
    """astype accepts python/numpy type objects, not just strings."""
    import numpy as np
    df = from_pandas(spark, pd.DataFrame({"x": [1.7, 2.2], "s": ["3", "4"]}),
                     npartitions=1)
    assert df["x"].astype(np.int64).compute().tolist() == [1, 2]
    assert df["x"].astype(int).compute().tolist() == [1, 2]
    assert df["s"].astype(float).compute().tolist() == [3.0, 4.0]


def test_rename_callable_clip_strcat(spark):
    pdf = pd.DataFrame({"k": ["b", "a", "c"], "v": [1.0, 2.0, 3.0]})
    df = from_pandas(spark, pdf, npartitions=2)
    assert df.rename(columns=str.upper).columns == ["K", "V"]
    assert (df.clip(lower=1.5, upper=2.5).compute()["v"].sort_values().tolist()
            == [1.5, 2.0, 2.5])
    assert df["k"].str.cat(sep="|").compute() == "a|b|c"


def test_merge_index_forms(spark):
    """pandas merge(left_index=True, right_index=True)."""
    import dask_expr_spark as dx
    a = from_pandas(spark, pd.DataFrame({"i": [1, 2], "x": [10, 20]}),
                    npartitions=1).set_index("i")
    b = from_pandas(spark, pd.DataFrame({"j": [1, 2], "y": [5, 6]}),
                    npartitions=1).set_index("j")
    got = dx.merge(a, b, left_index=True, right_index=True).compute()
    assert sorted(got["y"].tolist()) == [5, 6]


def test_explode_multi_column(spark):
    """pandas multi-column aligned explode; mismatched lengths raise."""
    pdf = pd.DataFrame({"k": [1, 2], "l": [[1, 2], [3]],
                        "m": [["a", "b"], ["c"]]})
    df = from_pandas(spark, pdf, npartitions=1)
    got = df.explode(["l", "m"]).compute().sort_values(["k", "l"]).values.tolist()
    want = pdf.explode(["l", "m"]).sort_values(["k", "l"]).values.tolist()
    assert got == want
    bad = from_pandas(spark, pd.DataFrame({"k": [1], "l": [[1, 2]],
                                           "m": [["a"]]}), npartitions=1)
    with pytest.raises(Exception, match="matching element counts"):
        bad.explode(["l", "m"]).compute()


def test_str_rsplit_normalize_and_timedelta_members(spark):
    """r3: str.rsplit/normalize; .dt days/seconds/microseconds and the
    total_seconds fix (direct double cast of DayTimeInterval raised)."""
    pdf = pd.DataFrame({"s": ["a b c d", "x"], "t": ["café", "ok"]})
    df = from_pandas(spark, pdf, npartitions=1)
    got = [list(v) for v in df["s"].str.rsplit(" ", n=2).compute()]
    assert got == pdf["s"].str.rsplit(" ", n=2).tolist()
    assert (df["t"].str.normalize("NFC").compute().tolist()
            == pdf["t"].str.normalize("NFC").tolist())
    td = pd.DataFrame({"d": pd.to_timedelta(
        ["1 days 02:03:04.000005", "0 days 00:00:01"])})
    dtd = from_pandas(spark, td, npartitions=1)
    assert dtd["d"].dt.days.compute().tolist() == td.d.dt.days.tolist()
    assert dtd["d"].dt.seconds.compute().tolist() == td.d.dt.seconds.tolist()
    assert (dtd["d"].dt.microseconds.compute().tolist()
            == td.d.dt.microseconds.tolist())
    got_ts = dtd["d"].dt.total_seconds().compute().tolist()
    assert all(abs(a - b) < 1e-6
               for a, b in zip(got_ts, td.d.dt.total_seconds().tolist()))


def test_dt_to_period_family(spark):
    """round 4: to_period label strings + period_start/period_end
    timestamps (reference _datetime.py:4 ToPeriod family; documented
    divergence — labels, not a period dtype)."""
    pdf = pd.DataFrame({"t": pd.to_datetime([
        "2024-02-29 10:31:00", "1999-12-31 23:45:10", "2021-01-01 00:00:00",
        "2000-03-31 12:29:59", "2026-07-04 06:30:00"])})
    df = from_pandas(spark, pdf)
    got = df.assign(
        pm=lambda d: d["t"].dt.to_period("M"),
        pq=lambda d: d["t"].dt.to_period("Q"),
        py=lambda d: d["t"].dt.to_period("Y"),
        pd_=lambda d: d["t"].dt.to_period("D"),
        pw=lambda d: d["t"].dt.to_period("W"),
        ms=lambda d: d["t"].dt.period_start("M"),
        qs=lambda d: d["t"].dt.period_start("Q"),
        me=lambda d: d["t"].dt.period_end("M"),
        qy=lambda d: d["t"].dt.qyear,
    ).compute().sort_values("t").reset_index(drop=True)
    want = pdf.sort_values("t").reset_index(drop=True)
    assert list(got["pm"]) == list(want.t.dt.to_period("M").astype(str))
    assert list(got["pq"]) == list(want.t.dt.to_period("Q").astype(str))
    assert list(got["py"]) == list(want.t.dt.to_period("Y").astype(str))
    assert list(got["pd_"]) == list(want.t.dt.to_period("D").astype(str))
    assert list(got["pw"]) == list(want.t.dt.to_period("W").astype(str))
    per_m = want.t.dt.to_period("M")
    assert list(got["ms"]) == list(per_m.dt.start_time)
    assert list(got["qs"]) == list(want.t.dt.to_period("Q").dt.start_time)
    assert list(got["me"]) == list(per_m.dt.end_time.dt.floor("us"))
    assert list(got["qy"]) == list(want.t.dt.to_period("Q").dt.qyear)


def test_case_when_sort_index_exports(spark):
    """round 4: Series.case_when (reference test_collection.py:1145),
    sort_index, to_dict/to_numpy/tolist driver exports."""
    pdf = pd.DataFrame({"k": [3, 1, 2, 4], "x": [1, 2, 1, 3],
                        "y": [10.0, 20.0, 30.0, 10.0]})
    df = from_pandas(spark, pdf, npartitions=2)
    got = df.assign(
        cw=lambda d: d["x"].case_when([(d["x"].eq(1), 1), (d["y"] == 10, 2.5)])
    ).compute().sort_values("k")["cw"]
    want = pdf.assign(
        cw=pdf["x"].case_when([(pdf["x"].eq(1), 1), (pdf["y"] == 10, 2.5)])
    ).sort_values("k")["cw"]
    assert got.tolist() == want.tolist()

    si = df.set_index("k").sort_index().compute()
    assert si.index.tolist() == [1, 2, 3, 4]
    sid = df.set_index("k").sort_index(ascending=False).compute()
    assert sid.index.tolist() == [4, 3, 2, 1]

    d = df.set_index("k").sort_index().to_dict()
    assert d["y"][3] == 10.0
    assert sorted(df["x"].tolist()) == sorted(pdf["x"].tolist())
    assert sorted(df["y"].to_numpy().tolist()) == sorted(pdf["y"].tolist())


def test_series_to_timestamp_inverts_period_labels(spark):
    """round 4: Series.to_timestamp inverts .dt.to_period label strings
    (reference FrameBase.to_timestamp, _collection.py:1910) — start and
    end instants match pandas Period.start_time / end_time."""
    pdf = pd.DataFrame({"t": pd.to_datetime([
        "2024-02-29 10:31:00", "1999-12-31 23:45:10",
        "2000-03-31 12:29:59", "2026-07-04 06:30:00"])})
    df = from_pandas(spark, pdf)
    got = df.assign(
        m_lbl=lambda d: d["t"].dt.to_period("M"),
        q_lbl=lambda d: d["t"].dt.to_period("Q"),
        y_lbl=lambda d: d["t"].dt.to_period("Y"),
        d_lbl=lambda d: d["t"].dt.to_period("D"),
    ).assign(
        m_ts=lambda d: d["m_lbl"].to_timestamp("M"),
        q_ts=lambda d: d["q_lbl"].to_timestamp("Q"),
        y_ts=lambda d: d["y_lbl"].to_timestamp("Y"),
        d_ts=lambda d: d["d_lbl"].to_timestamp("D"),
        m_end=lambda d: d["m_lbl"].to_timestamp("M", how="end"),
        q_end=lambda d: d["q_lbl"].to_timestamp("Q", how="end"),
    ).compute().sort_values("t").reset_index(drop=True)
    want = pdf.sort_values("t").reset_index(drop=True)
    for f, col in (("M", "m_ts"), ("Q", "q_ts"), ("Y", "y_ts"), ("D", "d_ts")):
        assert list(got[col]) == list(want.t.dt.to_period(f).dt.start_time), f
    assert list(got["m_end"]) == list(
        want.t.dt.to_period("M").dt.end_time.dt.floor("us"))
    assert list(got["q_end"]) == list(
        want.t.dt.to_period("Q").dt.end_time.dt.floor("us"))


def test_product_aliases(spark):
    pdf = pd.DataFrame({"k": ["a", "a", "b"], "x": [2.0, 3.0, 4.0]})
    df = from_pandas(spark, pdf)
    assert df["x"].product().compute() == 24.0
    g = df.groupby("k").product().compute().sort_values("k")
    assert list(g["x"]) == [6.0, 4.0]
    assert float(df[["x"]].product().compute().iloc[0]) == 24.0


def test_datasets_module_alias(spark):
    """reference dask_expr.datasets parity: the module exposes
    timeseries (datasets.py:184)."""
    from dask_expr_spark import datasets

    df = datasets.timeseries(spark, start="2000-01-01", end="2000-01-03")
    assert len(df.compute()) > 0


def test_dt_timedelta_tail(spark):
    """round 5: .dt.components / to_pytimedelta / to_pydatetime
    (reference _datetime.py:25-34) — differential vs pandas."""
    td = pd.DataFrame({"d": pd.to_timedelta(
        ["1 days 02:03:04.000005", "0 days 00:00:01",
         "3 days 23:59:59.999", "0 days 00:42:07.123456"])})
    dtd = from_pandas(spark, td, npartitions=2)
    cols = ["days", "hours", "minutes", "seconds",
            "milliseconds", "microseconds", "nanoseconds"]
    got = (dtd["d"].dt.components().compute()[cols].astype("int64")
           .sort_values(cols).reset_index(drop=True))
    want = (td["d"].dt.components[cols].astype("int64")
            .sort_values(cols).reset_index(drop=True))
    assert got.equals(want)

    pytd = dtd["d"].dt.to_pytimedelta()
    assert sorted(pytd.tolist()) == sorted(td["d"].dt.to_pytimedelta().tolist())

    ts = pd.DataFrame({"t": pd.to_datetime(
        ["2024-02-29 10:31:00.000001", "1999-12-31 23:45:10.123456"])})
    dts = from_pandas(spark, ts, npartitions=1)
    pydt = dts["t"].dt.to_pydatetime()
    assert sorted(pydt.tolist()) == sorted(ts["t"].dt.to_pydatetime().tolist())
