"""Shared helpers for the query registry."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from pyspark.sql import functions as F

from ..collection import DataFrame
from ..sources.io import read_parquet


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Cross-engine-exact aggregation helpers.
#
# Double sums are order-dependent, so a Spark sum and a DuckDB sum of the
# same column can differ in the last ULP and flip a post-sum round().
# The testdata measures have fixed decimal precision (prices/quantities: 2
# decimals, discount/tax: 2), so casting each value to DECIMAL before
# summing makes the aggregate exact and engine-independent; cast back to
# DOUBLE afterwards so both engines hand pandas the identical float64.
# ---------------------------------------------------------------------------

def dec_sum(c, scale: int = 4):
    """Spark-side exact sum of a fixed-precision measure."""
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double")


def dec_avg(c, scale: int = 4):
    """Spark-side exact mean: exact decimal sum ÷ count (both engines
    perform the identical IEEE double division)."""
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double") / F.count(c)


def dec_sum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"


def dec_avg_sql(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(sum(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"
        f" / count({expr})"
    )
