"""Plan-shape tests — our analogue of the reference's optimizer unit
tests (SURVEY.md §5: they assert expression-tree shape after rewrite;
we assert the Catalyst physical plan has the properties we rely on at
100 TB: pushdown, pruning, broadcast, shuffle elision, top-k)."""

from __future__ import annotations

import io
import os
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from dask_expr_spark.sources.io import read_parquet


def plan_of(df) -> str:
    sdf = df.to_spark() if hasattr(df, "to_spark") else df
    buf = io.StringIO()
    with redirect_stdout(buf):
        sdf.explain("formatted")
    return buf.getvalue()


def n_nodes(plan: str, op: str) -> int:
    """count physical-plan nodes of a type — formatted explain prints
    each node in the tree AND a detail section, so count detail
    headers `(n) Op` only."""
    return len(re.findall(rf"^\(\d+\) {op}", plan, flags=re.M))


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))


@pytest.fixture(scope="module")
def part(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "part.parquet"))


def test_filter_pushdown_to_parquet(li):
    """reference: DNF pushdown io/parquet.py:1574 — Catalyst must push
    the comparison into the scan."""
    p = plan_of(li.filter(li.l_quantity > 30)[["l_orderkey", "l_quantity"]])
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in p


def test_projection_pruning(li):
    """reference: column projection absorbed into ReadParquet
    (io/io.py:68-102) — ReadSchema must contain only what's selected."""
    p = plan_of(li[["l_orderkey", "l_quantity"]])
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_broadcast_join_hint(li, part):
    p = plan_of(li.merge(part, left_on="l_partkey", right_on="p_partkey", broadcast=True))
    assert "BroadcastHashJoin" in p


def test_small_dim_autobroadcast(li, part):
    """bytes-based auto-broadcast (strictly better than the reference's
    partition-count heuristic, _merge.py:281) — no hint needed."""
    p = plan_of(li.merge(part, left_on="l_partkey", right_on="p_partkey"))
    assert "BroadcastHashJoin" in p


def test_semi_join_strategy(li, part):
    p = plan_of(
        li.merge(part[["p_partkey"]].rename({"p_partkey": "l_partkey"}),
                 on="l_partkey", how="leftsemi")
    )
    assert "LeftSemi" in p


def test_topk_is_take_ordered(li):
    """reference rewrite: head(sort) → NFirst (_shuffle.py:915) —
    Catalyst's TakeOrderedAndProject."""
    p = plan_of(li.sort_values("l_quantity", ascending=False).head(5))
    assert "TakeOrderedAndProject" in p


def test_shuffle_reuse_after_repartition(li):
    """reference: partitioning-knowledge shuffle elision
    (_expr.py:409-438) — a groupBy on the same key as a prior
    repartition must not add a second exchange."""
    pre = li.shuffle("l_orderkey")
    p = plan_of(pre.groupby("l_orderkey").agg(n=("l_quantity", "count")))
    assert n_nodes(p, "Exchange") == 1, p


def test_global_agg_no_extra_shuffle(li):
    """partial (map-side) aggregation before the exchange — the
    reference's TreeReduce analogue is automatic."""
    p = plan_of(li.agg(total=("l_quantity", "sum")))
    # two HashAggregates (partial + final), one exchange between them
    assert n_nodes(p, "HashAggregate") == 2
    assert n_nodes(p, "Exchange") == 1


def test_count_star_uses_footer(spark, sf_dir, li):
    """reference: Len short-circuit from parquet statistics
    (_reductions.py:1039, io/parquet.py:757) — Spark reads counts from
    footers via LocalTableScan/specialized count, at minimum prunes all
    columns."""
    p = plan_of(li[["l_orderkey"]].to_spark().groupBy().count())
    assert "ReadSchema: struct<>" in p or "LocalTableScan" in p