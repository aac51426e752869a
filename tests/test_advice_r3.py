"""Regression tests for the round-2 ADVICE findings.

1. __setitem__ with a foreign Series must clear _known_sorted (the index
   equi-join reshuffles rows; sort_values/set_index fast paths would
   otherwise silently no-op).
2. _align_foreign must raise on duplicate index labels in the source
   frame instead of silently fanning out rows (pandas: "cannot reindex
   on an axis with duplicate labels").
3. shift(freq=) must not route non-timestamp tiebreak order columns
   through a timestamp cast; it raises on a non-timestamp order column.
4. axis=1 var/std (and ungrouped expanding var/std) clamp tiny negative
   float64-cancellation variances at 0 instead of yielding NaN std.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pytest

from dask_expr_spark.sources.io import from_pandas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "k": range(20),
        "v": [float(i % 7) for i in range(20)],
    })


def test_setitem_foreign_clears_known_sorted(spark, pdf):
    left = from_pandas(spark, pdf, npartitions=3).set_index("k")
    other = from_pandas(
        spark, pd.DataFrame({"k": range(20), "w": [i * 10.0 for i in range(20)]}),
        npartitions=3,
    ).set_index("k")
    assert left._known_sorted
    left["w"] = other["w"]
    assert not left._known_sorted
    # the fast path must now actually sort: values come back ordered
    got = left.sort_values("k").compute().reset_index()
    assert list(got["k"]) == list(range(20))
    assert list(got["w"]) == [i * 10.0 for i in range(20)]


def test_align_foreign_duplicate_labels_raise(spark, pdf):
    left = from_pandas(spark, pdf, npartitions=2).set_index("k")
    dup = pd.DataFrame({"k": [1, 1, 2], "w": [10.0, 11.0, 12.0]})
    other = from_pandas(spark, dup, npartitions=1).set_index("k")
    left["w"] = other["w"]
    with pytest.raises(Exception, match="duplicate labels"):
        left.compute()


def test_shift_freq_composite_order_preserves_tiebreak(spark):
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=6, freq="h"),
        "event_id": [100, 200, 300, 400, 500, 600],
        "v": range(6),
    })
    df = from_pandas(spark, pdf, npartitions=2)
    out = df.shift(periods=2, freq="h", order_by=["ts", "event_id"]).compute()
    out = out.sort_values("event_id").reset_index(drop=True)
    # tiebreak column untouched, timestamp moved by 2h
    assert list(out["event_id"]) == [100, 200, 300, 400, 500, 600]
    pdt.assert_series_equal(
        out["ts"], (pdf["ts"] + pd.Timedelta(hours=2)), check_names=False
    )


def test_shift_freq_non_timestamp_raises(spark, pdf):
    df = from_pandas(spark, pdf, npartitions=2)
    with pytest.raises(TypeError, match="timestamp"):
        df.shift(periods=1, freq="h", order_by="k")
    with pytest.raises(TypeError, match="timestamp"):
        from_pandas(spark, pdf, npartitions=2).set_index("k")["v"].shift(
            periods=1, freq="h"
        )


def test_series_shift_freq_list_order_by(spark):
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=4, freq="D"),
        "i": range(4),
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    df = from_pandas(spark, pdf, npartitions=1)
    s = df["v"].shift(periods=1, freq="D", order_by=["ts", "i"])
    anchor = s._anchor.toPandas().sort_values("i").reset_index(drop=True)
    pdt.assert_series_equal(
        anchor["ts"], pdf["ts"] + pd.Timedelta(days=1), check_names=False
    )


def test_axis1_var_std_no_negative(spark):
    # large-magnitude near-identical values: naive sum-of-squares
    # cancellation would give a small negative variance -> NaN std
    base = 1e9
    pdf = pd.DataFrame({
        "a": [base, base + 1.0],
        "b": [base, base + 1.0],
        "c": [base, base + 1.0],
    })
    df = from_pandas(spark, pdf, npartitions=1)
    v = np.asarray(df.var(axis=1).compute(), dtype=float)
    s = np.asarray(df.std(axis=1).compute(), dtype=float)
    assert (v >= 0).all()
    assert np.isfinite(s).all()


def test_expanding_var_std_no_negative(spark):
    base = 1e9
    pdf = pd.DataFrame({"t": range(6), "x": [base + (i % 2) * 1e-3 for i in range(6)]})
    df = from_pandas(spark, pdf, npartitions=2).set_index("t")
    out = df.expanding(min_periods=2).std(["x"]).compute()
    vals = np.asarray(out["x_rstd"], dtype=float)
    assert np.isfinite(vals[1:]).all()
