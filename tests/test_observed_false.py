"""groupby(observed=False) — pandas categorical unobserved-combination
semantics from explicit plan-side category lists (VERDICT r3 item 5;
reference groupby options, _groupby.py:1496)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import dask_expr_spark as dx


@pytest.fixture()
def frame(spark):
    pdf = pd.DataFrame({
        "seg": ["a", "b", "a", "c", "b", "a"],
        "grp": ["x", "x", "y", "y", "x", "y"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })
    return pdf, dx.from_pandas(spark, pdf, npartitions=3)


def _pandas_cat(pdf, col, cats):
    return pdf.assign(**{col: pd.Categorical(pdf[col], categories=cats)})


def test_observed_false_matches_pandas(frame):
    pdf, d = frame
    cats = ["a", "b", "c", "d", "e"]
    s = d["seg"].cat.set_categories(cats)
    got = (d.groupby(s, observed=False)
           .agg(n=("v", "count"), total=("v", "sum"), avg=("v", "mean"))
           .compute().sort_values("seg").reset_index(drop=True))
    want = (_pandas_cat(pdf, "seg", cats)
            .groupby("seg", observed=False)["v"]
            .agg(n="count", total="sum", avg="mean")
            .reset_index().sort_values("seg").reset_index(drop=True))
    assert got["seg"].tolist() == want["seg"].astype(str).tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["total"].tolist() == want["total"].tolist()
    assert np.allclose(got["avg"].to_numpy(), want["avg"].to_numpy(),
                       equal_nan=True)


def test_observed_false_size_and_prod(frame):
    pdf, d = frame
    cats = ["a", "b", "c", "z"]
    s = d["seg"].cat.set_categories(cats)
    got = (d.groupby(s, observed=False).size()
           .compute().sort_values("seg").reset_index(drop=True))
    want = (_pandas_cat(pdf, "seg", cats)
            .groupby("seg", observed=False).size()
            .reset_index(name="size").sort_values("seg")
            .reset_index(drop=True))
    assert got["size"].tolist() == want["size"].tolist()
    # prod identity is 1 for empty groups (pandas)
    gp = (d.groupby(s, observed=False).agg(p=("v", "prod"))
          .compute().sort_values("seg").reset_index(drop=True))
    wp = (_pandas_cat(pdf, "seg", cats)
          .groupby("seg", observed=False)["v"].prod()
          .reset_index(name="p").sort_values("seg").reset_index(drop=True))
    assert np.allclose(gp["p"].to_numpy(), wp["p"].to_numpy())


def test_observed_false_mixed_keys(frame):
    """categorical key x plain key: unobserved categories cross the
    OBSERVED values of the plain key (pandas semantics)."""
    pdf, d = frame
    cats = ["a", "b", "c", "d"]
    s = d["seg"].cat.set_categories(cats)
    got = (d.groupby([s, "grp"], observed=False)
           .agg(n=("v", "count"))
           .compute().sort_values(["seg", "grp"]).reset_index(drop=True))
    want = (_pandas_cat(pdf, "seg", cats)
            .groupby(["seg", "grp"], observed=False)["v"].count()
            .reset_index(name="n").sort_values(["seg", "grp"])
            .reset_index(drop=True))
    assert got["seg"].tolist() == want["seg"].astype(str).tolist()
    assert got["grp"].tolist() == want["grp"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_observed_false_column_restricted(frame):
    pdf, d = frame
    s = d["seg"].cat.set_categories(["a", "b", "c", "q"])
    got = (d.groupby(s, observed=False)[["v"]].sum()
           .compute().sort_values("seg").reset_index(drop=True))
    want = (_pandas_cat(pdf, "seg", ["a", "b", "c", "q"])
            .groupby("seg", observed=False)["v"].sum()
            .reset_index(name="v").sort_values("seg")
            .reset_index(drop=True))
    assert got["v"].tolist() == want["v"].tolist()


def test_observed_false_requires_explicit_categories(frame):
    _pdf, d = frame
    with pytest.raises(NotImplementedError, match="explicit category"):
        d.groupby("seg", observed=False)


def test_observed_false_refuses_udf_paths(frame):
    """observed=False expansion covers built-in agg specs; the UDF
    paths refuse instead of silently behaving like observed=True."""
    _pdf, d = frame
    s = d["seg"].cat.set_categories(["a", "b", "c", "d"])
    g = d.groupby(s, observed=False)
    with pytest.raises(NotImplementedError, match="apply"):
        g.apply(lambda k, p: p, "seg string, grp string, v double")
    with pytest.raises(NotImplementedError, match="transform"):
        g.transform({"v": "mean"})
