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

__version__ = "0.1.0"

__all__ = [
    "Aggregation", "DataFrame", "Series", "Scalar", "GroupBy", "concat", "from_spark",
    "get_spark", "read_parquet", "read_csv", "read_json", "read_orc", "read_xml",
    "read_text", "read_binary_files",
    "read_table", "read_fwf", "from_pandas", "from_dict", "from_map",
    "load_tables", "timeseries", "merge", "merge_asof", "merge_range", "melt",
    "pivot_table", "repartition", "map_partitions", "map_overlap",
    "elemwise", "isna", "to_datetime", "to_numeric", "to_timedelta",
]
