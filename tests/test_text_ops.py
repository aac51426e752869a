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
