"""dask_expr_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of dask/dask-expr (see SURVEY.md).

Architecture: pandas-style lazy facade over pyspark.sql.DataFrame;
Catalyst + Tungsten are the optimizer and execution engine (SURVEY.md
§7.0). Custom algorithms only where Spark has no primitive: as-of join,
map_overlap, MinHash/LSH dedup, ANN similarity, ordered-index metadata.
"""

from .collection import (
    Aggregation,
    DataFrame,
    GroupBy,
    Scalar,
    Series,
    concat,
    elemwise,
    from_spark,
    isna,
    map_overlap,
    map_partitions,
    melt,
    pivot_table,
    repartition,
    to_datetime,
    to_numeric,
    to_timedelta,
)
from .operators.asof import merge_asof
from .operators.rangejoin import merge_range
from .operators.merge import merge
from .session import get_spark
from .sources.io import (
    from_dict,
    from_map,
    from_pandas,
    load_tables,
    read_csv,
    read_fwf,
    read_json,
    read_orc,
    read_xml,
    read_text,
    read_binary_files,
    read_parquet,
    read_table,
    timeseries,
)

# -- module-level writer / accessor functions (reference exposes these
#    as free functions in dask_expr/__init__.py:9-16; each delegates to
#    the facade method) -------------------------------------------------
from .sources.io import read_jdbc, to_sql  # noqa: E402


def read_sql_table(spark, url: str, table: str, **kw):
    """reference: read_sql_table (io/sql.py) — JDBC table read."""
    return read_jdbc(spark, url, table, **kw)


def read_sql_query(spark, url: str, query: str, **kw):
    """reference: read_sql_query (io/sql.py) — JDBC pushdown query."""
    return read_jdbc(spark, url, f"({query}) q", **kw)


read_sql = read_sql_table


def to_parquet(df, path: str, **kw) -> None:
    df.to_parquet(path, **kw)


def to_csv(df, path: str, **kw) -> None:
    df.to_csv(path, **kw)


def to_json(df, path: str, **kw) -> None:
    df.to_json(path, **kw)


def to_orc(df, path: str, **kw) -> None:
    df.to_orc(path, **kw)


def to_records(df):
    return df.to_records()


def to_bag(df, format: str = "tuple"):
    return df.to_bag(format=format)


def get_dummies(df, column: str, values=None, prefix=None):
    """reference: get_dummies (_dummies.py:10)."""
    return df.get_dummies(column, values=values, prefix=prefix)


__version__ = "0.1.0"

__all__ = [
    "Aggregation", "DataFrame", "Series", "Scalar", "GroupBy", "concat", "from_spark",
    "get_spark", "read_parquet", "read_csv", "read_json", "read_orc", "read_xml",
    "read_text", "read_binary_files",
    "read_table", "read_fwf", "from_pandas", "from_dict", "from_map",
    "load_tables", "timeseries", "merge", "merge_asof", "merge_range", "melt",
    "pivot_table", "repartition", "map_partitions", "map_overlap",
    "elemwise", "isna", "to_datetime", "to_numeric", "to_timedelta",
    "read_sql", "read_sql_table", "read_sql_query", "read_jdbc", "to_sql",
    "to_parquet", "to_csv", "to_json", "to_orc", "to_records", "to_bag",
    "get_dummies",
]
