"""Keeps the pre-staged round-3 query batch (queries/round3.py) green
against DuckDB until the registry rotation window frees up and they
can be wired into collect_queries()."""

from __future__ import annotations

import pytest

from dask_expr_spark.queries import round3

from .oracle import compare, duck_con

_WITH_ORACLE = sorted(n for n, (_f, sql) in round3.QUERIES.items() if sql)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_round3_oracle_match(name, spark, sf_dir, con):
    fn, sql = round3.QUERIES[name]
    sdf = fn(spark, sf_dir)
    oracle = con.execute(sql).df()
    errors = compare(sdf, oracle, name)
    assert not errors, "\n".join(errors)
