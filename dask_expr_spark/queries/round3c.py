"""Late round-3 batch: oracle queries for the literal-source
constructors (from_pandas / from_dict / from_map — previously
pytest-only §2.1 rows) and dropna(thresh=) (previously pytest-only
§2.2 row; the testdata has no nulls, so the query injects them
deterministically with nullif and the oracle does the same)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import tbl

QUERIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


SOURCES_SQL = """
SELECT * FROM (VALUES
  ('pandas', 1, 10.5), ('pandas', 2, 20.5),
  ('dict',   1, 1.25), ('dict',   2, 2.5),
  ('map',    0, 0.0),  ('map',    1, 100.0), ('map', 2, 200.0)
) AS t(src, k, v)
"""


@q("sources_literal_union", SOURCES_SQL)
def sources_literal_union(spark, sf_dir):
    """from_pandas + from_dict + from_map constructors, unioned
    (reference: FromPandas io/io.py:387, from_dict, FromMap io/io.py
    — the driver-side data paths)."""
    import pandas as pd

    import dask_expr_spark as dx
    p1 = dx.from_pandas(
        spark, pd.DataFrame({"src": ["pandas", "pandas"], "k": [1, 2],
                             "v": [10.5, 20.5]}), npartitions=2)
    p2 = dx.from_dict(spark, {"src": ["dict", "dict"], "k": [1, 2],
                              "v": [1.25, 2.5]}, npartitions=1)

    def make(i: int) -> pd.DataFrame:
        return pd.DataFrame({"src": ["map"], "k": [i], "v": [i * 100.0]})

    p3 = dx.from_map(spark, make, [0, 1, 2],
                     schema="src string, k long, v double")
    return dx.concat([p1, p2, p3]).to_spark().select("src", "k", "v")


DROPNA_SQL = """
SELECT event_type, count(*) AS n
FROM (SELECT event_type,
             nullif(user_id % 7, 0) AS a,
             nullif(round(value), 50) AS b,
             nullif(event_id % 3, 1) AS c
      FROM events)
WHERE (CASE WHEN a IS NULL THEN 0 ELSE 1 END
     + CASE WHEN b IS NULL THEN 0 ELSE 1 END
     + CASE WHEN c IS NULL THEN 0 ELSE 1 END) >= 2
GROUP BY event_type
"""


@q("dropna_thresh_events", DROPNA_SQL)
def dropna_thresh_events(spark, sf_dir):
    """dropna(thresh=) keeps rows with >= thresh non-nulls among the
    subset (reference: Dropna, _expr.py; nulls injected with nullif
    because the testdata is dense)."""
    ev = tbl(spark, sf_dir, "events")
    ev = ev.assign(
        a=F.nullif(F.col("user_id") % 7, F.lit(0)),
        b=F.nullif(F.round(F.col("value")), F.lit(50.0)),
        c=F.nullif(F.col("event_id") % 3, F.lit(1)),
    )
    kept = ev.dropna(thresh=2, subset=["a", "b", "c"])
    return (kept.to_spark().groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n")))
