"""Scale-path tests for the range-bucketed ungrouped ordered ops
(dask_expr_spark/operators/ordered.py).

Two angles:
1. differential vs pandas with bucket counts FORCED far above the
   row count per bucket, so padding/carry crosses many bucket
   boundaries (periods > bucket size, fill gaps > bucket size);
2. plan-shape: the row-stream window must be hash-partitioned on the
   bucket id — a single-partition Exchange may only feed the tiny
   per-bucket offsets aggregate (reference analogue: the
   partition-serial cumulative chain, _cumulative.py:11-145).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pytest

from dask_expr_spark import merge_asof
from dask_expr_spark.sources.io import from_pandas


def _pdf(n=120, seed=7, with_nulls=True):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "i": range(n),
            "y": rng.randn(n) * 10 + 5,
            "z": rng.randint(0, 5, n).astype("int64"),
        }
    )
    if with_nulls:
        # long null runs (7+) so fills must carry across bucket borders
        pdf.loc[(pdf.index % 13) < 6, "y"] = np.nan
    return pdf


@pytest.fixture(scope="module")
def frames(spark):
    pdf = _pdf().set_index("i")
    d = from_pandas(spark, _pdf(), npartitions=6).set_index("i")
    return pdf, d


def _cmp_series(got: pd.Series, want: pd.Series):
    got = got.sort_index()
    want = want.sort_index()
    pdt.assert_series_equal(
        got.astype("float64"), want.astype("float64"),
        check_names=False, check_index=False, atol=1e-9, rtol=1e-9,
    )


def test_shift_periods_exceed_bucket(frames):
    """|periods| larger than the typical bucket size: padding must pull
    rows from several earlier/later buckets, not just the neighbor."""
    pdf, d = frames
    for p in (1, 13, -17):
        _cmp_series(d["y"].shift(p).compute(), pdf["y"].shift(p))


def test_frame_ordered_ops_multi_bucket(frames):
    pdf, d = frames
    got = d.diff(columns=["y", "z"], periods=4).compute().sort_index()
    want = pdf[["y", "z"]].diff(4)
    _cmp_series(got["y"], want["y"])
    _cmp_series(got["z"], want["z"])
    got = d.cumsum(columns=["z"]).compute().sort_index()
    _cmp_series(got["z"], pdf["z"].cumsum())
    got = d.cummax(columns=["y"]).compute().sort_index()
    _cmp_series(got["y"], pdf["y"].cummax())


def test_fill_limit(frames):
    """ffill/bfill limit= (reference _expr.py:3340,3373): null runs are
    longer than the limit, and the limit window crosses buckets."""
    pdf, d = frames
    for lim in (1, 3, 8):
        _cmp_series(d["y"].ffill(limit=lim).compute(), pdf["y"].ffill(limit=lim))
        _cmp_series(d["y"].bfill(limit=lim).compute(), pdf["y"].bfill(limit=lim))
    _cmp_series(d["y"].ffill().compute(), pdf["y"].ffill())
    _cmp_series(d["y"].bfill().compute(), pdf["y"].bfill())
    got = d.ffill(columns=["y"], limit=2).compute().sort_index()
    _cmp_series(got["y"], pdf["y"].ffill(limit=2))


def test_expanding_ungrouped_cumulants(frames):
    """ungrouped expanding aggs route through running-sum cumulants,
    not a global window."""
    pdf, d = frames
    e = d.expanding()
    _cmp_series(e.count(["y"]).compute().sort_index()["y_rcount"],
                pdf["y"].expanding(min_periods=1).count())
    _cmp_series(e.sum(["y"]).compute().sort_index()["y_rsum"],
                pdf["y"].expanding(min_periods=1).sum())
    _cmp_series(e.mean(["y"]).compute().sort_index()["y_rmean"],
                pdf["y"].expanding(min_periods=1).mean())
    _cmp_series(e.max(["y"]).compute().sort_index()["y_rmax"],
                pdf["y"].expanding(min_periods=1).max())
    got = e.var(["y"]).compute().sort_index()["y_rvar"]
    want = pdf["y"].expanding(min_periods=1).var()
    pdt.assert_series_equal(got.astype("float64"), want.astype("float64"),
                            check_names=False, check_index=False,
                            atol=1e-7, rtol=1e-7)


def test_expanding_ungrouped_holistic(frames):
    """ungrouped expanding median/quantile/apply: bucketed prefix plan
    (ordered.expanding_holistic), pandas-exact with nulls."""
    pdf, d = frames
    e = d.expanding()
    _cmp_series(e.median(["y"]).compute().sort_index()["y_rmedian"],
                pdf["y"].expanding(min_periods=1).median())
    _cmp_series(e.quantile(0.6, ["y"]).compute().sort_index()["y_rq60"],
                pdf["y"].expanding(min_periods=1).quantile(0.6))
    e3 = d.expanding(min_periods=3)
    _cmp_series(e3.median(["z"]).compute().sort_index()["z_rmedian"],
                pdf["z"].expanding(min_periods=3).median())
    # apply: func sees the null-dropped prefix (engine contract, same
    # as the bounded rolling apply) — compare against pandas with the
    # NaNs stripped inside the func
    got = (e3.apply(lambda a: float(np.ptp(a)), ["y"])
           .compute().sort_index()["y_rapply"])
    want = pdf["y"].expanding(min_periods=3).apply(
        lambda a: float(np.ptp(a[~np.isnan(a)])), raw=True
    )
    _cmp_series(got, want)


def test_expanding_ungrouped_moments(frames, spark):
    """ungrouped expanding skew/kurt/cov/corr route through running
    decimal power sums (ordered.cumulative), no global window."""
    pdf, d = frames
    e = d.expanding(min_periods=4)
    got = e.skew(["z"]).compute().sort_index()["z_rskew"]
    m = pdf["z"].expanding(min_periods=4)
    n = pdf["z"].expanding(min_periods=4).count()
    # engine convention: population g1/g2 (rounded 6dp) vs pandas'
    # sample-adjusted — convert pandas' to population form
    ps = m.skew()
    want = (ps * (n - 2) / np.sqrt(n * (n - 1))).round(6)
    _cmp_series(got.dropna(), want.dropna())
    # cov/corr: pair-sum convention needs null-free pairs to agree
    # with pandas (same convention as the windowed rolling cov);
    # scale=7 keeps the decimal quantization below the 6dp rounding
    full = pdf.fillna({"y": 0.5})
    dfull = from_pandas(spark, full.reset_index(), npartitions=6).set_index("i")

    def _cmp6(got, want):
        pdt.assert_series_equal(
            got.astype("float64"), want.astype("float64"),
            check_names=False, check_index=False, atol=2e-6, rtol=0,
        )

    got = (dfull.expanding(min_periods=4).cov("y", "z", scale=7)
           .compute().sort_index()["y_z_rcov"])
    pairs = full[["y", "z"]].expanding(min_periods=4).cov()
    want = pairs.xs("y", level=1)["z"].round(6)
    _cmp6(got.dropna(), want.dropna())
    got = (dfull.expanding(min_periods=4).corr("y", "z", scale=7)
           .compute().sort_index()["y_z_rcorr"])
    pairs = full[["y", "z"]].expanding(min_periods=4).corr()
    want = pairs.xs("y", level=1)["z"].round(6)
    _cmp6(got.dropna(), want.dropna())


def test_expanding_approx_quantile(spark):
    """approx=True expanding quantile (histogram prefix, O(bins)
    cross-bucket state): every emitted value must sit within a small
    RANK band of the requested quantile in the true prefix, and the
    plan must have no single-partition exchange at all."""
    rng = np.random.RandomState(11)
    n = 400
    pdf = pd.DataFrame({"i": range(n), "y": rng.lognormal(3, 1, n)})
    d = from_pandas(spark, pdf, npartitions=5).set_index("i")
    for q in (0.5, 0.9):
        lazy = d.expanding(min_periods=20).quantile(q, ["y"], approx=True, bins=64)
        plan = _plan(lazy)
        assert "Exchange SinglePartition" not in plan
        assert "hashpartitioning(__ord_b" in plan
        got = lazy.compute().sort_index()[f"y_rq{int(q*100)}"]
        vals = pdf["y"].to_numpy()
        for i in range(20, n, 37):
            prefix = vals[: i + 1]
            v = got.loc[i]
            rank = (prefix <= v).mean()
            assert abs(rank - q) <= 0.08, (i, q, rank, v)
    # exact and approx agree closely on smooth data
    exact = (d.expanding(min_periods=20).quantile(0.5, ["y"])
             .compute().sort_index()["y_rq50"])
    approx = (d.expanding(min_periods=20).quantile(0.5, ["y"], approx=True, bins=64)
              .compute().sort_index()["y_rq50"])
    rel = ((approx - exact).abs() / exact).dropna()
    assert rel.median() < 0.05


def test_plan_expanding_holistic_bucketed(frames):
    """the last global row-stream window is gone: expanding
    median/apply/skew plans hash-partition on the bucket id; any
    single-partition stage feeds only the B-row arrays/offsets side."""
    _, d = frames
    for lazy in (
        d.expanding().median(["y"]),
        d.expanding().apply(lambda a: a.sum(), ["y"]),
        d.expanding().skew(["y"]),
        d.expanding().cov("y", "z"),
    ):
        plan = _plan(lazy)
        assert "hashpartitioning(__ord_b" in plan
        assert plan.count("Exchange SinglePartition") <= 1


def test_ordered_checkpoint_knob(spark, tmp_path):
    """dask_expr_spark.ordered.checkpoint=true spills the bucketed
    frame to parquet once: identical results, and the plan reads the
    spill instead of scanning the upstream plan twice."""
    from dask_expr_spark.operators.ordered import CHECKPOINT_CONF

    pdf = _pdf(80, seed=3)
    src = str(tmp_path / "src.parquet")
    pdf.to_parquet(src)
    from dask_expr_spark.sources.io import read_parquet
    d = read_parquet(spark, src).set_index("i")
    want = d.cumsum(columns=["z"]).compute().sort_index()["z"]
    spark.conf.set(CHECKPOINT_CONF, "true")
    try:
        lazy = d.cumsum(columns=["z"])
        plan = _plan(lazy)
        assert "des_ordered_ckpt_" in plan
        assert "src.parquet" not in plan  # upstream scanned once, eagerly
        got = lazy.compute().sort_index()["z"]
    finally:
        spark.conf.set(CHECKPOINT_CONF, "false")
    _cmp_series(got, want)


def _ref_weighted(vals, w, minp, kind, center=False):
    """pandas roll_weighted_sum/mean semantics: fixed per-position
    weights, NaN skipped, min_periods counts valid obs, mean divides
    by the valid weights' sum."""
    n = len(w)
    out = np.full(len(vals), np.nan)
    lead = (n - 1) // 2 if center else 0
    for i in range(len(vals)):
        end = i + lead
        acc = accw = accw2 = accxx = 0.0
        cnt = 0
        for p in range(n):
            j = end - n + 1 + p
            if 0 <= j < len(vals) and not np.isnan(vals[j]):
                acc += vals[j] * w[p]
                accxx += vals[j] * vals[j] * w[p]
                accw += w[p]
                accw2 += w[p] * w[p]
                cnt += 1
        if cnt >= minp:
            if kind == "sum":
                out[i] = acc
            elif kind == "mean":
                out[i] = acc / accw
            elif cnt >= 2:  # var/std: unbiased reliability weights
                v = max((accxx - acc * acc / accw) / (accw - accw2 / accw), 0.0)
                out[i] = np.sqrt(v) if kind == "std" else v
    return out


def test_window_weights_formulas():
    """spot-check the closed forms against scipy's published values
    (scipy itself isn't installed here; these are the documented
    get_window outputs)."""
    from dask_expr_spark.operators.window import window_weights

    np.testing.assert_allclose(window_weights("triang", 5),
                               [1 / 3, 2 / 3, 1.0, 2 / 3, 1 / 3])
    np.testing.assert_allclose(window_weights("triang", 4),
                               [0.25, 0.75, 0.75, 0.25])
    np.testing.assert_allclose(window_weights("hann", 5),
                               [0.0, 0.5, 1.0, 0.5, 0.0], atol=1e-12)
    np.testing.assert_allclose(window_weights("bartlett", 5),
                               [0.0, 0.5, 1.0, 0.5, 0.0], atol=1e-12)
    g = window_weights("gaussian", 5, std=1.0)
    np.testing.assert_allclose(g, np.exp(-np.array([-2, -1, 0, 1, 2]) ** 2 / 2.0))
    try:
        from scipy.signal import get_window  # pragma: no cover
        np.testing.assert_allclose(window_weights("triang", 7),
                                   get_window("triang", 7, fftbins=False))
    except ImportError:
        pass


def test_rolling_win_type(frames):
    """weighted rolling sum/mean (reference _rolling.py:43-233):
    differential vs the pandas weighted-window semantics, with nulls,
    ungrouped (bucketed pad plan) and center=."""
    from dask_expr_spark.operators.window import window_weights

    pdf, d = frames
    y = pdf["y"].to_numpy()
    for wt, n, kw in (("triang", 5, {}), ("gaussian", 6, {"std": 2.0}),
                      ("hamming", 4, {})):
        w = window_weights(wt, n, kw.get("std"))
        got = (d.rolling(n, win_type=wt).mean(["y"], **kw)
               .compute().sort_index()["y_rmean"])
        _cmp_series(got, pd.Series(_ref_weighted(y, w, n, "mean")))
        got = (d.rolling(n, win_type=wt, min_periods=2).sum(["y"], **kw)
               .compute().sort_index()["y_rsum"])
        _cmp_series(got, pd.Series(_ref_weighted(y, w, 2, "sum")))
    # center= alignment
    w = window_weights("triang", 4)
    got = (d.rolling(4, win_type="triang", center=True, min_periods=2)
           .mean(["y"]).compute().sort_index()["y_rmean"])
    _cmp_series(got, pd.Series(_ref_weighted(y, w, 2, "mean", center=True)))
    # boxcar == unweighted mean
    got = (d.rolling(5, win_type="boxcar", min_periods=1).mean(["y"])
           .compute().sort_index()["y_rmean"])
    _cmp_series(got, pdf["y"].rolling(5, min_periods=1).mean())
    # weighted var/std (reliability-weight unbiased form)
    w = window_weights("gaussian", 5, 1.5)
    got = (d.rolling(5, win_type="gaussian", min_periods=3)
           .var(["y"], std=1.5).compute().sort_index()["y_rvar"])
    _cmp_series(got, pd.Series(_ref_weighted(y, w, 3, "var")))
    got = (d.rolling(5, win_type="gaussian", min_periods=3)
           .std(["y"], std=1.5).compute().sort_index()["y_rstd"])
    _cmp_series(got, pd.Series(_ref_weighted(y, w, 3, "std")))
    # plan: ungrouped weighted stays bucket-partitioned
    plan = _plan(d.rolling(5, win_type="triang").mean(["y"]))
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__ord_b" in plan
    # unsupported agg raises
    with pytest.raises(NotImplementedError):
        d.rolling(5, win_type="triang").median(["y"])


def test_rolling_win_type_grouped(spark):
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"g": rng.randint(0, 3, 90), "i": range(90),
                        "v": rng.randn(90)})
    pdf.loc[pdf.index % 7 == 0, "v"] = np.nan
    d = from_pandas(spark, pdf, npartitions=4)
    from dask_expr_spark.operators.window import window_weights
    w = window_weights("triang", 3)
    got = (d.groupby("g").rolling(3, order_by="i", win_type="triang")
           .mean(["v"]).compute())
    got = got.sort_values("i")
    for g, sub in pdf.groupby("g"):
        want = _ref_weighted(sub.sort_values("i")["v"].to_numpy(), w, 3, "mean")
        gs = got[got["g"] == g].sort_values("i")["v_rmean"].to_numpy()
        np.testing.assert_allclose(gs, want, atol=1e-9, equal_nan=True)


def test_time_rolling_ungrouped(spark):
    """ungrouped time-rolling: rows are copied into every later bucket
    their [t, t+window] reach touches (ordered.padded_range)."""
    from dask_expr_spark.operators.window import TimeRolling

    n = 150
    rng = np.random.RandomState(3)
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        np.cumsum(rng.randint(1, 40, n)), unit="min"
    )
    pdf = pd.DataFrame({"ts": ts, "v": rng.randn(n)})
    d = from_pandas(spark, pdf, npartitions=5)
    got = (
        TimeRolling(d, "90min", on="ts")
        .sum(["v"]).compute().sort_values("ts")["v_tsum"]
    )
    # closed="both": Spark's rangeBetween is inclusive at both ends
    # (same convention as SQL RANGE BETWEEN, which the oracle uses)
    want = pdf.set_index("ts")["v"].rolling("90min", closed="both").sum()
    pdt.assert_series_equal(got.reset_index(drop=True),
                            want.reset_index(drop=True),
                            check_names=False, atol=1e-9, rtol=1e-9)


def test_merge_asof_no_by(spark):
    """ungrouped merge_asof: cross-bucket carry instead of a global
    window (reference: _merge_asof.py:17)."""
    rng = np.random.RandomState(11)
    lts = np.sort(rng.randint(0, 10_000, 200))
    # unique right keys: among equal keys pandas picks by row position,
    # which a distributed frame doesn't define (same restriction as
    # drop_duplicates keep= without an index)
    rts = np.unique(rng.randint(0, 10_000, 80))
    lpdf = pd.DataFrame({"t": lts, "lv": np.arange(len(lts))})
    rpdf = pd.DataFrame({"t": rts, "rv": rng.randn(len(rts))})
    ld = from_pandas(spark, lpdf, npartitions=4)
    rd = from_pandas(spark, rpdf, npartitions=3)
    for direction in ("backward", "forward", "nearest"):
        got = (
            merge_asof(ld, rd, on="t", direction=direction)
            .compute().sort_values(["t", "lv"]).reset_index(drop=True)
        )
        want = pd.merge_asof(lpdf, rpdf, on="t", direction=direction)
        pdt.assert_series_equal(got["rv"], want["rv"], check_names=False)
    got = (
        merge_asof(ld, rd, on="t", tolerance=50)
        .compute().sort_values(["t", "lv"]).reset_index(drop=True)
    )
    want = pd.merge_asof(lpdf, rpdf, on="t", tolerance=50)
    pdt.assert_series_equal(got["rv"], want["rv"], check_names=False)


def _plan(df) -> str:
    return df.to_spark()._jdf.queryExecution().executedPlan().toString()


def test_plan_no_single_partition_row_stream(frames):
    """shift: NO single-partition exchange anywhere (pure pad+window).
    cumsum/ffill: the row-stream window is partitioned on the bucket id;
    any SinglePartition exchange feeds only the B-row offsets plan."""
    _, d = frames
    shift_plan = _plan(d.shift(columns=["y"], periods=2))
    assert "Exchange SinglePartition" not in shift_plan
    assert "hashpartitioning(__ord_b" in shift_plan

    for lazy in (d.cumsum(columns=["z"]), d.ffill(columns=["y"])):
        plan = _plan(lazy)
        assert "hashpartitioning(__ord_b" in plan
        # the single-partition stage exists only for the tiny per-bucket
        # offsets window; the big side stays bucket-partitioned
        assert plan.count("Exchange SinglePartition") <= 1


def test_plan_rolling_bucketed(frames):
    _, d = frames
    plan = _plan(d.rolling(5, order_by="i").mean(["y"]))
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__ord_b" in plan


def test_rolling_center(frames):
    """rolling center= (reference _rolling.py:43): label at the window
    center, extra reach on the past side for even windows."""
    pdf, d = frames
    for w in (3, 4, 5):
        got = (d.rolling(w, center=True).mean(["y"])
               .compute().sort_index()["y_rmean"])
        _cmp_series(got, pdf["y"].rolling(w, center=True).mean())
    got = (d.rolling(4, center=True, min_periods=2).sum(["y"])
           .compute().sort_index()["y_rsum"])
    _cmp_series(got, pdf["y"].rolling(4, center=True, min_periods=2).sum())


def test_shift_freq(spark):
    """shift(freq=) = ShiftIndex (reference _expr.py:3433): timestamp
    index moves, values stay with their rows."""
    ts = pd.date_range("2024-05-01", periods=40, freq="45min")
    pdf = pd.DataFrame({"ts": ts, "v": np.arange(40.0)})
    d = from_pandas(spark, pdf, npartitions=3).set_index("ts")
    got = d.shift(periods=2, freq="1h").compute().sort_index()
    want = pdf.set_index("ts").shift(2, freq="h")
    pdt.assert_index_equal(got.index, want.index)
    _cmp_series(got["v"], want["v"])
    gs = d["v"].shift(periods=-3, freq="15min").compute().sort_index()
    ws = pdf.set_index("ts")["v"].shift(-3, freq="15min")
    pdt.assert_series_equal(gs, ws, check_names=False, check_freq=False)


def test_cat_accessor(spark):
    """.cat accessor (reference: CategoricalAccessor, _categorical.py:21)."""
    pdf = pd.DataFrame({
        "i": range(30),
        "g": [["red", "green", "blue", None][i % 4] for i in range(30)],
    })
    d = from_pandas(spark, pdf, npartitions=3).set_index("i")
    s = d["g"]
    assert s.cat.categories == ["blue", "green", "red"]
    got = s.cat.codes.compute().sort_index()
    want = pdf.set_index("i")["g"].astype("category").cat.codes
    pdt.assert_series_equal(got.astype("int64"), want.astype("int64"),
                            check_names=False)
    ren = s.cat.rename_categories({"red": "RED"}).compute().sort_index()
    want_r = pdf.set_index("i")["g"].astype("category").cat.rename_categories(
        {"red": "RED"}).astype(object)
    pdt.assert_series_equal(ren, want_r, check_names=False)
    assert s.cat.known and s.cat.as_known() is s


def test_cat_accessor_explicit_categories(spark):
    """add/remove/set_categories + as_ordered/as_unordered (reference:
    _categorical.py:21) — explicit category lists carried on the
    Series, pandas-equivalent codes/membership."""
    pdf = pd.DataFrame({
        "i": range(24),
        "g": [["red", "green", "blue", None][i % 4] for i in range(24)],
    })
    d = from_pandas(spark, pdf, npartitions=3).set_index("i")
    s = d["g"]
    ps = pdf.set_index("i")["g"].astype("category")

    # add_categories: appended to the end, values unchanged
    added = s.cat.add_categories(["yellow"])
    pa = ps.cat.add_categories(["yellow"])
    assert added.cat.categories == list(pa.cat.categories)
    pdt.assert_series_equal(
        added.cat.codes.compute().sort_index().astype("int64"),
        pa.cat.codes.astype("int64"), check_names=False)
    with pytest.raises(ValueError):
        s.cat.add_categories(["red"])

    # remove_categories: removed values -> null, codes re-densified
    rem = s.cat.remove_categories(["green"])
    pr = ps.cat.remove_categories(["green"])
    pdt.assert_series_equal(
        rem.compute().sort_index(), pr.astype(object), check_names=False)
    pdt.assert_series_equal(
        rem.cat.codes.compute().sort_index().astype("int64"),
        pr.cat.codes.astype("int64"), check_names=False)
    with pytest.raises(ValueError):
        s.cat.remove_categories(["missing"])

    # set_categories: membership filter + explicit order
    st = s.cat.set_categories(["red", "blue", "purple"])
    pt = ps.cat.set_categories(["red", "blue", "purple"])
    assert st.cat.categories == list(pt.cat.categories)
    pdt.assert_series_equal(
        st.compute().sort_index(), pt.astype(object), check_names=False)
    pdt.assert_series_equal(
        st.cat.codes.compute().sort_index().astype("int64"),
        pt.cat.codes.astype("int64"), check_names=False)

    # ordered flag round-trip
    assert not s.cat.ordered
    assert s.cat.as_ordered().cat.ordered
    assert s.cat.as_ordered().cat.as_unordered().cat.ordered is False
    # remove_unused_categories drops the unused explicit entry
    assert added.cat.remove_unused_categories().cat.categories == \
        ["blue", "green", "red"]


def test_axis1_reductions(spark):
    """axis=1 row-wise reductions (reference axis=1 branch,
    _collection.py:2407) — JVM array higher-order fns, no UDF."""
    pdf = pd.DataFrame({
        "i": range(40),
        "a": [float(i) if i % 5 else np.nan for i in range(40)],
        "b": np.arange(40.0) * 2,
        "c": [np.nan if i % 7 == 0 else float(i) * 3 for i in range(40)],
        "s": [f"x{i}" for i in range(40)],  # ignored (non-numeric)
    })
    d = from_pandas(spark, pdf, npartitions=3).set_index("i")
    num = pdf.set_index("i")[["a", "b", "c"]]
    _cmp_series(d.sum(axis=1).compute(), num.sum(axis=1))
    _cmp_series(d.mean(axis=1).compute(), num.mean(axis=1))
    _cmp_series(d.min(axis=1).compute(), num.min(axis=1))
    _cmp_series(d.max(axis=1).compute(), num.max(axis=1))
    _cmp_series(d.count(axis=1).compute(), num.count(axis=1))
    got = d.var(axis=1).compute().sort_index()
    want = num.var(axis=1)
    pdt.assert_series_equal(got.astype("float64"), want.astype("float64"),
                            check_names=False, check_index=False,
                            atol=1e-9, rtol=1e-9)
    _cmp_series(d.std(axis=1).compute(), num.std(axis=1))


def test_get_dummies_cardinality_cap(spark):
    pdf = pd.DataFrame({"i": range(10), "g": [f"v{i%3}" for i in range(10)]})
    d = from_pandas(spark, pdf, npartitions=2)
    out = d.get_dummies("g").compute()
    assert {"g_v0", "g_v1", "g_v2"} <= set(out.columns)


def test_axis1_extended(spark):
    pdf = pd.DataFrame({
        "i": range(25),
        "a": [float(i % 4) for i in range(25)],
        "b": [float(i % 4) if i % 3 else np.nan for i in range(25)],
        "c": np.arange(25.0),
    })
    d = from_pandas(spark, pdf, npartitions=2).set_index("i")
    num = pdf.set_index("i")
    _cmp_series(d.prod(axis=1).compute(), num.prod(axis=1))
    _cmp_series(d.nunique(axis=1).compute(), num.nunique(axis=1))


def test_many_buckets_stress(spark):
    """bucket count far above row count per bucket (array-form bucket
    expression, padding chains through many near-empty buckets)."""
    from dask_expr_spark.operators import ordered

    n = 400
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"i": range(n), "y": rng.randn(n)})
    pdf.loc[(pdf.index % 9) < 4, "y"] = np.nan
    sdf = from_pandas(spark, pdf, npartitions=4).to_spark()

    out = ordered.cumulative(sdf, {"y": "sum"}, ["i"], num_buckets=150,
                             mask_nulls=True)
    got = out.toPandas().set_index("i")["y"].sort_index()
    _cmp_series(got, pdf.set_index("i")["y"].cumsum())

    lag = ordered.with_lagged(sdf, ["y"], ["i"], 7, lambda c, l: l,
                              num_buckets=150)
    got = lag.toPandas().set_index("i")["y"].sort_index()
    _cmp_series(got, pdf.set_index("i")["y"].shift(7))

    fill = ordered.fill(sdf, ["y"], ["i"], "ffill", limit=5, num_buckets=150)
    got = fill.toPandas().set_index("i")["y"].sort_index()
    _cmp_series(got, pdf.set_index("i")["y"].ffill(limit=5))


def test_rank_pct(frames):
    pdf, d = frames
    for method in ("average", "min", "max", "dense", "first"):
        got = d["y"].rank(method=method, pct=True).compute()
        want = pdf["y"].rank(method=method, pct=True)
        got = got.sort_index() if method == "first" else \
            pd.Series(sorted(got.dropna())).reset_index(drop=True)
        want = want.sort_index() if method == "first" else \
            pd.Series(sorted(want.dropna())).reset_index(drop=True)
        pdt.assert_series_equal(got.astype("float64"),
                                want.astype("float64"),
                                check_names=False, check_index=False)


def test_fresh_session_first_execution():
    """Regression guard: rank(method='first') intermittently failed on
    the FIRST execution in a fresh Spark session (Catalyst attribute
    rebind under AQE on the broadcast-offsets self-join — since
    replaced by a literal map). A shared pytest session can never see
    this class, so drive a clean interpreter."""
    import subprocess
    import sys

    code = """
import pandas as pd, numpy as np
from dask_expr_spark.session import get_spark
from dask_expr_spark.sources.io import from_pandas
spark = get_spark("fresh_first", cpus=4)
pdf = pd.DataFrame({"i": range(100), "y": np.random.RandomState(0).randn(100)})
d = from_pandas(spark, pdf, npartitions=5).set_index("i")
got = d["y"].rank(method="first").compute().sort_index()
want = pdf.set_index("i")["y"].rank(method="first")
assert np.allclose(got, want)
print("FRESH_OK")
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert "FRESH_OK" in out.stdout, out.stderr[-2000:]


def test_groupby_expanding(spark):
    pdf = pd.DataFrame({
        "i": range(60),
        "g": [i % 3 for i in range(60)],
        "y": np.arange(60.0),
    })
    d = from_pandas(spark, pdf, npartitions=3).set_index("i")
    got = (d.groupby("g").expanding().sum(["y"])
           .compute().sort_index()["y_rsum"])
    want = (pdf.set_index("i").groupby("g")["y"]
            .expanding(min_periods=1).sum().reset_index("g", drop=True)
            .sort_index())
    _cmp_series(got, want)


def test_idx_extreme_axis1(spark):
    pdf = pd.DataFrame({
        "i": range(30),
        "a": [float(i % 5) for i in range(30)],
        "b": [float((i + 2) % 5) for i in range(30)],
        "c": [np.nan if i % 4 == 0 else float((i + 3) % 5) for i in range(30)],
    })
    d = from_pandas(spark, pdf, npartitions=2).set_index("i")
    num = pdf.set_index("i")
    got = d.idxmax(axis=1).compute().sort_index()
    want = num.idxmax(axis=1)
    assert list(got) == list(want)
    got = d.idxmin(axis=1).compute().sort_index()
    want = num.idxmin(axis=1)
    assert list(got) == list(want)


def test_resample_closed_label(spark):
    """resample closed=/label= (reference ResampleReduction options):
    boundary rows move bins under closed='right'; labels move under
    label='right'."""
    ts = pd.date_range("2024-01-01", periods=48, freq="30min")
    pdf = pd.DataFrame({"ts": ts, "v": np.arange(48.0)})
    d = from_pandas(spark, pdf, npartitions=3)
    for closed in ("left", "right"):
        for label in ("left", "right"):
            got = (d.resample("h", on="ts", closed=closed, label=label)
                   .agg(v_sum=("v", "sum")).compute()
                   .sort_values("ts").reset_index(drop=True))
            want = (pdf.set_index("ts")["v"]
                    .resample("h", closed=closed, label=label).sum()
                    .reset_index())
            assert list(got["ts"]) == list(want["ts"]), (closed, label)
            assert list(got["v_sum"]) == list(want["v"]), (closed, label)


def test_resample_convenience(spark):
    ts = pd.date_range("2024-02-01", periods=36, freq="40min")
    pdf = pd.DataFrame({"ts": ts, "v": np.arange(36.0),
                        "w": np.arange(36.0) * 2})
    d = from_pandas(spark, pdf, npartitions=2)
    got = (d.resample("h", on="ts").sum().compute()
           .sort_values("ts").reset_index(drop=True))
    want = pdf.set_index("ts").resample("h").sum().reset_index()
    want = want[want.v.notna() | (want.v == 0)]
    # pandas emits empty bins (gap filling); we emit observed bins only
    want = pdf.set_index("ts").resample("h").sum()
    want = want[(want != 0).any(axis=1) | (want.index.isin(pdf.ts))]
    got2 = got.set_index("ts")
    for c in ("v", "w"):
        assert np.allclose(got2[c], want.loc[got2.index, c])
    sz = (d.resample("h", on="ts").size().compute()
          .sort_values("ts").reset_index(drop=True))
    wsz = pdf.set_index("ts").resample("h").size()
    assert list(sz["size"]) == list(wsz[wsz > 0])
    sr = (d.set_index("ts")["v"].resample("h").mean().compute()
          .sort_values("ts").reset_index(drop=True))
    wm = pdf.set_index("ts")["v"].resample("h").mean().dropna()
    assert np.allclose(sr["v"], wm)


def test_merge_range(spark):
    """bin-bucketed interval join (operators/rangejoin.py) vs a pandas
    brute force — no nested-loop join in the plan."""
    from dask_expr_spark import merge_range

    rng = np.random.RandomState(21)
    pts = pd.DataFrame({"p": rng.randint(0, 1000, 300), "pid": range(300)})
    lo = rng.randint(0, 950, 40)
    iv = pd.DataFrame({"lo": lo, "hi": lo + rng.randint(5, 80, 40),
                       "iid": range(40)})
    lsdf = from_pandas(spark, pts, npartitions=3).to_spark()
    rsdf = from_pandas(spark, iv, npartitions=2).to_spark()
    out = merge_range(lsdf, rsdf, "p", "lo", "hi")
    assert "BroadcastNestedLoopJoin" not in \
        out._jdf.queryExecution().executedPlan().toString()
    got = sorted((r.pid, r.iid) for r in out.collect())
    want = sorted(
        (prow.pid, irow.iid)
        for _, prow in pts.iterrows()
        for _, irow in iv.iterrows()
        if irow.lo <= prow.p <= irow.hi
    )
    assert got == want

    left = merge_range(lsdf, rsdf, "p", "lo", "hi", how="left")
    n_unmatched = sum(1 for r in left.collect() if r.iid is None)
    matched_pids = {g[0] for g in got}
    assert n_unmatched == 300 - len(matched_pids)


def test_duplicated(spark):
    pdf = pd.DataFrame({
        "i": range(20),
        "g": [i % 6 for i in range(20)],
        "h": [i % 3 for i in range(20)],
    })
    d = from_pandas(spark, pdf, npartitions=3).set_index("i")
    num = pdf.set_index("i")
    for keep in ("first", "last", False):
        got = d.duplicated(subset=["g", "h"], keep=keep).compute().sort_index()
        want = num.duplicated(subset=["g", "h"], keep=keep)
        assert list(got) == list(want), keep
    import pytest as _pytest
    with _pytest.raises(ValueError):
        from_pandas(spark, pdf, npartitions=2).duplicated(subset=["g"])


def test_checkpoint_fanout(spark):
    """checkpoint() truncates lineage so the ordered two-pass's
    branches reread materialized partitions instead of recomputing."""
    pdf = pd.DataFrame({"i": range(40), "y": np.arange(40.0)})
    d = from_pandas(spark, pdf, npartitions=3).set_index("i").checkpoint()
    got = d.cumsum(columns=["y"]).compute().sort_index()["y"]
    _cmp_series(got, pdf.set_index("i")["y"].cumsum())
    plan = _plan(d.cumsum(columns=["y"]))
    assert "FileScan" not in plan  # branches read the checkpoint, not the source


def test_new_ops_edge_cases(spark):
    """empty frames, all-null columns and short streams through the
    round-3 paths (holistic expanding, win_type, approx quantile,
    connected components, pack_sequences)."""
    from dask_expr_spark.functions import dedup as DD
    from dask_expr_spark.functions.text import pack_sequences

    empty = from_pandas(
        spark,
        pd.DataFrame({"i": pd.Series([], dtype="int64"),
                      "y": pd.Series([], dtype="float64")}),
        npartitions=1,
    ).set_index("i")
    assert len(empty.expanding().median(["y"]).compute()) == 0

    allnull = from_pandas(
        spark, pd.DataFrame({"i": range(10), "y": [np.nan] * 10}),
        npartitions=2,
    ).set_index("i")
    r = allnull.expanding().median(["y"]).compute()
    assert len(r) == 10 and r["y_rmedian"].isna().all()

    short = from_pandas(
        spark, pd.DataFrame({"i": range(3), "y": [1.0, 2.0, 3.0]}),
        npartitions=1,
    ).set_index("i")
    got = (short.rolling(5, win_type="triang", min_periods=1)
           .mean(["y"]).compute().sort_index()["y_rmean"])
    np.testing.assert_allclose(got, [1.0, 4 / 3, 5 / 3], atol=1e-9)

    ep = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert DD.connected_components(ep).count() == 0

    es = spark.createDataFrame([], "doc_id bigint, n_tok bigint")
    assert pack_sequences(es, "doc_id", "n_tok", 2048).count() == 0


def test_bounds_sampling_memoized_across_chain(spark, monkeypatch):
    """a chain of ordered ops samples range bounds ONCE: the memo is
    shared with order-preserving results, so the derived frames never
    re-execute their upstream plan just to sample the order column."""
    import pandas as pd

    import dask_expr_spark.operators.ordered as O
    from dask_expr_spark.sources.io import from_pandas

    calls = []
    orig = O.sample_bounds

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(O, "sample_bounds", counting)
    pdf = pd.DataFrame({"i": range(200), "x": [float(v % 7) for v in range(200)]})
    df = from_pandas(spark, pdf, npartitions=4).set_index("i")
    out = (df.cumsum(columns=["x"], order_by="i")
             .shift(columns=["x"], periods=1, order_by="i")
             .ffill(columns=["x"], order_by="i"))
    got = out.compute().sort_index()
    want = pdf.set_index("i")["x"].cumsum().shift(1).ffill()
    assert (got["x"].fillna(-1).values == want.fillna(-1).values).all()
    assert len(calls) == 1, f"expected 1 sampling job, saw {len(calls)}"


def test_window_weights_long_tail():
    """round 4: the scipy.signal long tail, spot-checked against the
    published get_window(sym=True) values (scipy isn't installed here;
    kaiser checks against np.kaiser, scipy's own implementation base)."""
    from dask_expr_spark.operators.window import window_weights

    np.testing.assert_allclose(window_weights("kaiser", 7, std=8.6),
                               np.kaiser(7, 8.6))
    np.testing.assert_allclose(window_weights("cosine", 3),
                               [0.5, 1.0, 0.5], atol=1e-12)
    np.testing.assert_allclose(window_weights("parzen", 5),
                               [0.016, 0.424, 1.0, 0.424, 0.016], atol=1e-12)
    np.testing.assert_allclose(window_weights("tukey", 5, std=0.5),
                               [0.0, 1.0, 1.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(window_weights("barthann", 5),
                               [0.0, 0.5, 1.0, 0.5, 0.0], atol=1e-12)
    b = window_weights("bohman", 5)
    np.testing.assert_allclose([b[0], b[2], b[4]], [0.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(b[1], 1 / np.pi, atol=1e-12)
    nut = window_weights("nuttall", 5)
    np.testing.assert_allclose(nut[2], 1.0, atol=1e-6)
    np.testing.assert_allclose(nut[0], 0.0003628, atol=1e-7)
    e = window_weights("exponential", 3, std=1.0)
    np.testing.assert_allclose(e, [np.exp(-1), 1.0, np.exp(-1)])
    fl = window_weights("flattop", 5)
    np.testing.assert_allclose(fl[2], 1.0, atol=1e-6)
    assert fl[0] < 0  # flattop's signature negative edge lobes
    bh = window_weights("blackmanharris", 5)
    np.testing.assert_allclose(bh[2], 1.0, atol=1e-6)
    np.testing.assert_allclose(bh[0], 6e-5, atol=1e-6)


def test_rolling_win_type_long_tail(frames):
    """end-to-end weighted rolling mean/sum for the round-4 window
    types — differential vs the pandas weighted semantics with the
    same driver-side weight vectors."""
    from dask_expr_spark.operators.window import window_weights

    pdf, d = frames
    y = pdf["y"].to_numpy()
    for wt, n, kw in (("kaiser", 5, {"std": 8.6}),
                      ("exponential", 6, {"std": 2.0}),
                      ("parzen", 5, {}),
                      ("nuttall", 4, {})):
        w = window_weights(wt, n, kw.get("std"))
        got = (d.rolling(n, win_type=wt).mean(["y"], **kw)
               .compute().sort_index()["y_rmean"])
        _cmp_series(got, pd.Series(_ref_weighted(y, w, n, "mean")))
        got = (d.rolling(n, win_type=wt, min_periods=2).sum(["y"], **kw)
               .compute().sort_index()["y_rsum"])
        _cmp_series(got, pd.Series(_ref_weighted(y, w, 2, "sum")))


def test_constant_order_column_all_ties(spark):
    """an order column with ONE distinct value collapses every range
    bucket boundary — cumsum/shift/expanding must still work (single
    bucket) and match pandas."""
    pdf = pd.DataFrame({"i": [7] * 25, "j": range(25),
                        "y": np.arange(25, dtype="float64")})
    df = from_pandas(spark, pdf, npartitions=3).set_index("i")
    run = df.cumsum(columns=["y"], order_by=["i", "j"]).compute()
    got = run.sort_values("j")["y"].to_numpy()
    np.testing.assert_allclose(got, np.cumsum(np.arange(25.0)))
    med = (df.expanding(order_by=["i", "j"]).median(["y"])
           .compute().sort_values("j")["y_rmedian"].to_numpy())
    want = pd.Series(np.arange(25.0)).expanding().median().to_numpy()
    np.testing.assert_allclose(med, want)


def test_connected_components_star_empty_and_selfloops(spark):
    from dask_expr_spark.functions import dedup as DD

    ep = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert DD.connected_components_star(ep).count() == 0
    loops = spark.createDataFrame(
        pd.DataFrame({"id_a": [3, 4], "id_b": [3, 4]}))
    got = {r.id: r.comp
           for r in DD.connected_components_star(loops).collect()}
    assert got == {3: 3, 4: 4}


def test_rolling_stats_fused_matches_chained(spark, sf_dir):
    """rolling.stats(): the fused single-pass plan must equal chaining
    the single-stat methods bit-for-bit, on BOTH the bounded two-pass
    path and the ungrouped-expanding cumulative path — and must read
    the source once per two-pass stage instead of doubling per stat
    (round-5 audit: 4 chained stats = 16 fact scans, fused = 2)."""
    from pyspark.sql import functions as F

    from dask_expr_spark.collection import DataFrame as _DF
    from dask_expr_spark.sources.io import read_parquet

    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    daily = (o.to_spark()
             .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
             .agg(F.sum("o_totalprice").alias("rev"),
                  F.count(F.lit(1)).cast("double").alias("n")))
    d = _DF(daily)

    cols = ["day", "rev_rskew", "rev_rkurt", "c1", "c2"]
    chained = (d.rolling(7, order_by="day").skew(["rev"])
               .rolling(7, order_by="day").kurt(["rev"])
               .rolling(7, order_by="day").cov("rev", "n", name="c1")
               .rolling(7, order_by="day").corr("rev", "n", name="c2"))
    fused = d.rolling(7, order_by="day").stats(
        moments={"rev": ["skew", "kurt"]},
        pairs=[("cov", "rev", "n", "c1"), ("corr", "rev", "n", "c2")])
    a = chained.to_spark().select(*cols).orderBy("day").toPandas()
    b = fused.to_spark().select(*cols).orderBy("day").toPandas()
    assert a.equals(b)
    plan = fused.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders") <= 2, plan.count("orders")

    ecols = ["day", "rev_rskew", "c1", "n_rmean", "n_rmax", "n_rvar"]
    echained = (d.expanding(order_by="day", min_periods=2).skew(["rev"])
                .expanding(order_by="day", min_periods=2)
                .cov("rev", "n", name="c1")
                .expanding(order_by="day", min_periods=2).mean(["n"])
                .expanding(order_by="day", min_periods=2).max(["n"])
                .expanding(order_by="day", min_periods=2).var(["n"]))
    efused = d.expanding(order_by="day", min_periods=2).stats(
        moments={"rev": ["skew"], "n": ["mean", "max", "var"]},
        pairs=[("cov", "rev", "n", "c1")])
    ea = echained.to_spark().select(*ecols).orderBy("day").toPandas()
    eb = efused.to_spark().select(*ecols).orderBy("day").toPandas()
    assert ea.equals(eb)


def test_expanding_minmax_respects_min_periods(spark):
    """pandas parity: expanding(min_periods=k).max()/min() is NaN below
    k observations — the ungrouped cumulative path skipped the gate
    until the round-5 fused-stats differential caught it."""
    import pandas as pd

    from dask_expr_spark.collection import DataFrame as _DF

    pdf = pd.DataFrame({"i": range(6), "v": [5.0, 3.0, None, 7.0, 2.0, 9.0]})
    d = _DF(spark.createDataFrame(pdf))
    got = (d.expanding(order_by="i", min_periods=3).max(["v"])
           .to_spark().orderBy("i").toPandas()["v_rmax"])
    want = pdf["v"].expanding(min_periods=3).max()
    assert got.fillna(-1).tolist() == want.fillna(-1).tolist()
    got = (d.expanding(order_by="i", min_periods=3).min(["v"])
           .to_spark().orderBy("i").toPandas()["v_rmin"])
    want = pdf["v"].expanding(min_periods=3).min()
    assert got.fillna(-1).tolist() == want.fillna(-1).tolist()


def test_fused_expanding_stats_small_magnitude_floats(spark):
    """the fused ungrouped-expanding stats path must accumulate
    sum/mean/var/std in float64 like the single-stat path — the old
    decimal(38,4) running sums rounded ~1e-5 inputs to zero (round-5
    advice, high)."""
    import numpy as np
    import pandas as pd

    from dask_expr_spark.collection import DataFrame as _DF

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"i": range(40),
                        "v": rng.uniform(1e-6, 5e-5, 40)})
    d = _DF(spark.createDataFrame(pdf))
    fused = (d.expanding(order_by="i", min_periods=2)
             .agg({"v": ["sum", "mean", "var", "std"]})
             .to_spark().orderBy("i").toPandas())
    exp = pdf["v"].expanding(min_periods=2)
    for stat in ("sum", "mean", "var", "std"):
        got = fused[f"v_r{stat}"].to_numpy()
        want = getattr(exp, stat)().to_numpy()
        np.testing.assert_allclose(got[1:], want[1:], rtol=1e-9,
                                   err_msg=stat)
    # chained emission order: all columns per stat, not per column —
    # the fuse must not reorder outputs (round-5 advice, low)
    d2 = _DF(spark.createDataFrame(
        pd.DataFrame({"i": range(10), "x": np.arange(10.0),
                      "y": np.arange(10.0) * 2})))
    fcols = (d2.rolling(3, order_by="i").agg(["mean", "max"])
             .to_spark().columns)
    ccols = (d2.rolling(3, order_by="i").mean(["x", "y"])
             .rolling(3, order_by="i").max(["x", "y"])
             .to_spark().columns)
    assert fcols == ccols, (fcols, ccols)
