"""dask_expr_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of dask/dask-expr (see SURVEY.md).

Architecture: pandas-style lazy facade over pyspark.sql.DataFrame;
Catalyst + Tungsten are the optimizer and execution engine (SURVEY.md
§7.0). Custom algorithms only where Spark has no primitive: as-of join,
map_overlap, MinHash/LSH dedup, ANN similarity, ordered-index metadata.
"""

from .collection import DataFrame, Series, Scalar, GroupBy, concat, from_spark
from .session import get_spark
from .sources.io import (
    from_dict,
    from_pandas,
    load_tables,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    timeseries,
)

__version__ = "0.1.0"

__all__ = [
    "DataFrame", "Series", "Scalar", "GroupBy", "concat", "from_spark",
    "get_spark", "read_parquet", "read_csv", "read_json", "read_orc",
    "from_pandas", "from_dict", "load_tables", "timeseries",
]
