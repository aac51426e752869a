"""Incremental table maintenance: SCD-1 upsert and partition-pruned
upsert-in-place for parquet tables (training-pipeline extension; no
reference analogue — dask-expr has no mutation/merge surface at all,
its to_parquet (io/parquet.py) only appends or overwrites whole
datasets).

The 100 TB pattern: a corpus table is maintained incrementally — each
day a small updates batch (new docs, re-crawled docs, metadata fixes)
merges into the snapshot.  Rewriting the whole table per batch is a
100 TB write for a GB of change; `upsert_partitioned` reads ONLY the
hive partitions the batch touches (partition pruning on the scan,
dynamic partition overwrite on the write) so cost scales with the
change, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str],
           order_col: str | None = None) -> DataFrame:
    """SCD-1 merge: rows from `updates` replace same-key rows in
    `target`; novel keys insert.  Schemas must match by name.

    `order_col` resolves duplicate keys WITHIN the updates batch
    (highest wins — e.g. an ingest timestamp); without it the batch
    must be key-unique (enforced cheaply downstream: a duplicate key
    would surface as a fan-out in the anti join's complement).

    Plan: one shuffle per side — updates is deduped with a max_by
    aggregation (map-side partial), target anti-joins the (small)
    update key set, and the union is shuffle-free.  At scale the anti
    join broadcasts when the batch is small, which AQE decides from
    the run-time size."""
    if order_col is not None:
        cols = [c for c in updates.columns if c not in keys]
        upd = (updates.groupBy(*keys)
               .agg(*[F.max_by(c, order_col).alias(c) for c in cols])
               .select(*target.columns))
    else:
        upd = updates.select(*target.columns)
    kept = target.join(upd.select(*keys), keys, "left_anti")
    return kept.unionByName(upd)


def upsert_partitioned(spark: SparkSession, path: str, updates: DataFrame,
                       keys: list[str], partition_col: str,
                       order_col: str | None = None,
                       check_moves: bool = True) -> list:
    """Merge `updates` into the hive-partitioned parquet table at
    `path` IN PLACE, touching only the partitions the batch contains.

    Steps: (1) the batch's distinct partition values are collected
    (bounded by the partition count, the same driver class as hive
    pruning itself); (2) the target is read with a partition filter —
    Spark's scan prunes to those directories, untouched partitions are
    never opened; (3) the merged slice is localCheckpoint-materialized
    (it must not lazily re-read the directories being replaced) and
    written back with dynamic partition overwrite, which replaces ONLY
    the directories present in the written frame.

    Updates that would MOVE a row between partitions are rejected (the
    old partition isn't read, so the old row couldn't be removed) —
    mutate partition keys by delete+insert instead.  `check_moves`
    runs that guard with one column-pruned key scan of the FULL table;
    disable it for append-only or partition-stable pipelines where the
    invariant holds by construction and even that scan is unwanted.
    Returns the list of partition values rewritten."""
    parts = [r[0] for r in
             updates.select(partition_col).distinct().collect()]
    if not parts:
        return []
    target = spark.read.parquet(path).where(
        F.col(partition_col).isin(parts))
    if check_moves and keys and partition_col not in keys:
        # an update key that exists in the table but only OUTSIDE the
        # touched partitions is a partition-moving update: the old row
        # would survive and the key would silently duplicate
        outside = (updates.select(*keys).distinct()
                   .join(target.select(*keys).distinct(), keys, "left_anti")
                   .join(spark.read.parquet(path).select(*keys).distinct(),
                         keys, "left_semi").count())
        if outside:
            raise ValueError(
                f"upsert_partitioned: {outside} update key(s) exist in a "
                f"partition outside the batch's {partition_col} values — "
                "a partition-moving update; delete+insert instead")
    merged = upsert(target, updates, keys, order_col=order_col)
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (merged.write.mode("overwrite")
         .partitionBy(partition_col).parquet(path))
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    return parts


def table_diff(before: DataFrame, after: DataFrame, keys: list[str],
               compare_cols: list[str] | None = None) -> DataFrame:
    """Snapshot diff — the validation companion to upsert: one row
    (n_added, n_removed, n_changed, n_unchanged) from a single
    full-outer join on `keys`.  `compare_cols` defaults to every
    shared non-key column; rows compare null-safely (eqNullSafe), so
    NULL→value and value→NULL both count as changed.  At scale this is
    the one-pass audit you run after an incremental merge ("the batch
    claimed 10k updates — did exactly 10k rows change?")."""
    if compare_cols is None:
        compare_cols = [c for c in after.columns
                        if c in set(before.columns) and c not in keys]
    a = before.select(*keys, *compare_cols, F.lit(1).alias("__in_a"))
    b = (after.select(*keys, *[F.col(c).alias(f"__b_{c}")
                               for c in compare_cols])
         .withColumn("__in_b", F.lit(1)))
    j = a.join(b, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__b_{c}"))
    status = (F.when(F.col("__in_a").isNull(), F.lit("added"))
              .when(F.col("__in_b").isNull(), F.lit("removed"))
              .when(same, F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return (j.select(status.alias("__s"))
            .groupBy()
            .agg(*[F.count_if(F.col("__s") == s).alias(f"n_{s}")
                   for s in ("added", "removed", "changed", "unchanged")]))


def compact_parquet(spark: SparkSession, path: str,
                    target_mb: int = 128,
                    partition_col: str | None = None) -> tuple[int, int]:
    """Small-file compaction: rewrite the parquet table at `path` into
    ceil(total_bytes / target_mb) files (per partition directory when
    `partition_col` is given).  Streaming sinks and incremental
    upserts accrete small files; at 100 TB the file count — not the
    byte count — starts dominating planning time and open() overhead,
    so periodic compaction is table maintenance, not optimization.
    The rewrite is one read + localCheckpoint (the table can't be
    lazily re-read while being replaced) + one write; data is
    byte-identical (test-asserted).  Returns (files_before,
    files_after)."""
    import math
    import os

    sizes = []
    for root, _d, files in os.walk(path):
        sizes += [os.path.getsize(os.path.join(root, f))
                  for f in files if f.endswith(".parquet")]
    if not sizes:
        return (0, 0)
    n_target = max(1, math.ceil(sum(sizes) / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path).localCheckpoint(eager=True)
    writer = df.repartition(n_target).write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(path)
    after = sum(1 for root, _d, files in os.walk(path)
                for f in files if f.endswith(".parquet"))
    return (len(sizes), after)
