"""Differential correctness: every registry query with an oracle must
match DuckDB on the same parquet (mirrors the driver's t2 gate)."""

from __future__ import annotations

import pytest

from dask_expr_spark.queries import collect_queries

from .oracle import compare, duck_con

_REG = collect_queries()
_WITH_ORACLE = sorted(name for name, (_f, sql) in _REG.items() if sql)
_NO_ORACLE = sorted(name for name, (_f, sql) in _REG.items() if not sql)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


# Queries where a nested-loop/cartesian shape is the DESIGN, not a
# bug (1-row scalar broadcasts, documented exact-quadratic baselines)
# — see the per-name rationale in tests/test_plans.py history.
NESTED_LOOP_OK = {"q22_idle_customers", "q11_important_stock",
                  "ann_cosine_topk_blocked", "heavy_hitter_tokens",
                  "stream_heavy_hitters", "dedup_embedding_cosine",
                  "monotonic_orders", "text_lm_perplexity",
                  "text_bm25_search", "size_len_scalars",
                  "profile_orders_stats", "kmv_intersect_slices",
                  "cms_join_cardinality"}


def assert_scale_safe_plan(name: str, sdf) -> None:
    """Scale guardrail, piggybacked on the oracle sweep (it already
    builds every registry query once — a separate whole-registry pass
    re-ran every composite's writes for 165 s): no query may compile
    to a cartesian product, an unlisted nested-loop join, or a
    row-at-a-time Python UDF (BatchEvalPython) — the three plan shapes
    that silently stop scaling."""
    sdf = sdf.to_spark() if hasattr(sdf, "to_spark") else sdf
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian")
    if "BatchEvalPython" in plan:
        flags.append("row-python-udf")
    if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
        flags.append("nested-loop")
    assert not flags, f"scale-hostile plan for {name}: {flags}"


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(name, spark, sf_dir, con):
    fn, sql = _REG[name]
    sdf = fn(spark, sf_dir)
    assert_scale_safe_plan(name, sdf)
    oracle = con.execute(sql).df()
    errors = compare(sdf, oracle, name)
    assert not errors, "\n".join(errors)


def test_registry_rotation():
    """The driver validates only the first 50 registry entries per round;
    rotation must keep already-validated queries out of that window while
    unvalidated ones remain (see queries/__init__.py VALIDATED)."""
    from dask_expr_spark.queries import VALIDATED

    names = list(_REG)
    unvalidated = [n for n in names if n not in VALIDATED]
    window = names[:50]
    if len(unvalidated) >= 50:
        assert not (set(window) & VALIDATED), sorted(set(window) & VALIDATED)
    else:
        # all unvalidated queries must sit inside the check window
        assert set(unvalidated) <= set(window)


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_rows_only(name, spark, sf_dir):
    fn, _ = _REG[name]
    sdf = fn(spark, sf_dir)
    assert_scale_safe_plan(name, sdf)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.schema.fields) > 0
