"""Keeps the round-3 query batches (queries/round3.py, round3b.py)
green against DuckDB — the same compare the driver runs at sf0.01
(tests default to sf0.001; SPARK_GRAFT_TEST_SF_DIR overrides)."""

from __future__ import annotations

import pytest

from dask_expr_spark.queries import round3, round3b, round3c

from .oracle import compare, duck_con

_ALL = {**round3.QUERIES, **round3b.QUERIES, **round3c.QUERIES}
_WITH_ORACLE = sorted(n for n, (_f, sql) in _ALL.items() if sql)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_round3_oracle_match(name, spark, sf_dir, con):
    fn, sql = _ALL[name]
    sdf = fn(spark, sf_dir)
    oracle = con.execute(sql).df()
    errors = compare(sdf, oracle, name)
    assert not errors, "\n".join(errors)
