"""Round-4 scale-contract guards (VERDICT r3 items 3 & 4):

- exact ungrouped expanding holistic ops refuse above a configurable
  total-value ceiling (the last bucket's prefix array is the one
  inherently single-task structure in the engine);
- cosine_topk / cosine_topk_int8 refuse to collect an over-cap query
  frame to the driver (their documented broadcast-role contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql.utils import PythonException

import dask_expr_spark as dx
from dask_expr_spark.operators.ordered import MAX_EXACT_EXPANDING_CONF
from dask_expr_spark.functions.similarity import (
    MAX_QUERY_ROWS_CONF,
    cosine_topk,
    cosine_topk_int8,
)


@pytest.fixture()
def frame(spark):
    pdf = pd.DataFrame({"t": range(200), "y": np.arange(200) * 1.5})
    return dx.from_pandas(spark, pdf, npartitions=4, index_col="t")


def test_expanding_holistic_guard_raises(spark, frame):
    spark.conf.set(MAX_EXACT_EXPANDING_CONF, "50")
    try:
        with pytest.raises(Exception) as exc:
            frame.expanding().median(["y"]).compute()
        assert "max_exact_expanding_rows" in str(exc.value)
        assert "approx" in str(exc.value)
    finally:
        spark.conf.unset(MAX_EXACT_EXPANDING_CONF)


def test_expanding_holistic_guard_allows_under_limit(spark, frame):
    spark.conf.set(MAX_EXACT_EXPANDING_CONF, "200")
    try:
        got = frame.expanding().median(["y"]).compute().sort_index()
        want = pd.Series(np.arange(200) * 1.5).expanding(1).median()
        assert np.allclose(got["y_rmedian"].to_numpy(), want.to_numpy())
    finally:
        spark.conf.unset(MAX_EXACT_EXPANDING_CONF)


def test_expanding_holistic_guard_disabled(spark, frame):
    spark.conf.set(MAX_EXACT_EXPANDING_CONF, "-1")
    try:
        got = frame.expanding().median(["y"]).compute()
        assert len(got) == 200
    finally:
        spark.conf.unset(MAX_EXACT_EXPANDING_CONF)


@pytest.fixture()
def vectors(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "vec_id": range(30),
        "embedding": [rng.normal(size=8).tolist() for _ in range(30)],
    })
    return dx.from_pandas(spark, pdf, npartitions=2).to_spark()


def test_cosine_topk_query_cap(spark, vectors):
    spark.conf.set(MAX_QUERY_ROWS_CONF, "5")
    try:
        queries = vectors.limit(10)
        with pytest.raises(ValueError, match="max_query_rows"):
            cosine_topk(vectors, queries, k=3)
        with pytest.raises(ValueError, match="lsh_bucketed_topk"):
            cosine_topk_int8(vectors, queries, k=3)
        # under the cap still works
        ok = cosine_topk(vectors, vectors.limit(4), k=3)
        assert ok.count() == 12
    finally:
        spark.conf.unset(MAX_QUERY_ROWS_CONF)


def test_cosine_topk_cap_disabled(spark, vectors):
    spark.conf.set(MAX_QUERY_ROWS_CONF, "-1")
    try:
        out = cosine_topk(vectors, vectors.limit(12), k=2)
        assert out.count() == 24
    finally:
        spark.conf.unset(MAX_QUERY_ROWS_CONF)
