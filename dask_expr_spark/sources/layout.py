"""Multi-dimensional write layout: Z-order (Morton) interleaving.

`to_parquet(sort_by=[a, b], cluster=True)` makes file ranges disjoint
on the LEADING column only — a filter on `b` alone still reads every
file.  Z-ordering interleaves the bits of per-column quantile-bucket
ranks so that files are simultaneously (coarsely) clustered on EVERY
sort column: parquet footer min/max stats then prune files for filters
on any of them.  This is the same layout trick Delta Lake / Iceberg
expose as OPTIMIZE ZORDER BY, built here from plain DataFrame ops.

Cost at 100 TB: one column-pruned pass to estimate per-column quantile
boundaries (approxQuantile — sketch-based, driver gets B doubles per
column), then the ordinary range shuffle + in-file sort the clustered
write already pays.  The z-key itself is a pure codegen expression.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 6 bits / 64 buckets per column: file-level pruning needs only coarse
# cells (a 100 TB table in 64x64 z-cells still maps each cell to many
# files), and B=64 keeps the bucket expression cheap to codegen.
DEFAULT_BITS = 6


def _orderable_double(sdf: DataFrame, col: str) -> Column:
    """An order-preserving double image of the column (hash for
    strings/binary — equality pruning only, documented)."""
    dt = sdf.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        # NTZ has no direct double cast; epoch seconds via LTZ is
        # order-preserving for all three (session tz is fixed UTC)
        return c.cast("timestamp_ltz").cast("double")
    if isinstance(dt, (T.StringType, T.BinaryType)):
        # no order-preserving numeric image exists without a global
        # dictionary; hash clusters EQUAL values together, so point
        # filters (=, IN) still prune — range filters on this column
        # won't.
        return F.xxhash64(c).cast("double")
    return c.cast("double")


def zorder_key(sdf: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton key column for `cols`: per-column quantile-bucket rank
    (equi-depth, so skewed columns still spread over all 2**bits
    buckets), bits interleaved col-major.  Triggers ONE approxQuantile
    job over just `cols` (column-pruned scan, sketch merge); the
    returned key is a pure expression.  NULLs order first (bucket 0)."""
    n = 2 ** bits
    keyed = [(c, _orderable_double(sdf, c)) for c in cols]
    probe = sdf.select(*[k.alias(f"__z{i}") for i, (_c, k) in enumerate(keyed)])
    probs = [i / n for i in range(1, n)]
    bounds = probe.approxQuantile([f"__z{i}" for i in range(len(cols))],
                                  probs, 0.001)
    z = F.lit(0).cast("long")
    for ci, ((_c, key), bs) in enumerate(zip(keyed, bounds)):
        uniq = sorted(set(b for b in bs if b is not None))
        if not uniq:          # all-null / constant column: bucket 0
            continue
        barr = F.array(*[F.lit(float(b)) for b in uniq])
        bucket = F.aggregate(
            barr, F.lit(0),
            lambda acc, b: acc + F.when(key >= b, 1).otherwise(0),
        ).cast("long")
        # interleave: bit i of this column's bucket lands at position
        # i*ncols + ci of the z value; bits are disjoint so sum == OR
        z = reduce(
            lambda acc, i: acc + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                i * len(cols) + ci),
            range(bits), z)
    return z
