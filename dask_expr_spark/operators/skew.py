"""Skew-handling join (salting) — for keys so hot that even AQE's
skew-join splitting leaves stragglers (the task's "salting for skew"
item; the reference has no analogue — its P2P shuffle just suffers).

Mechanism: the probe side gets a uniform random-ish salt derived from
a secondary column hash (deterministic — no rand(), replayable); the
build side is exploded once per salt value so every (key, salt) pair
can still match. Join key becomes (key, salt): the hot key's rows
spread over `salts` reducers.

Use when one side is small-ish relative to the explosion factor
(build side grows ×salts). For aggregate skew use two-stage agg
(partial on (key, salt), final on key) — see salted_agg.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..collection import DataFrame


def _as_spark(df):
    return df.to_spark() if isinstance(df, DataFrame) else df


def salted_merge(
    left,
    right,
    on: str | Sequence[str],
    salts: int = 8,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """equi-join with salted keys. `salt_from`: a left column whose
    hash spreads the hot key's rows (defaults to all left columns —
    still deterministic)."""
    on = [on] if isinstance(on, str) else list(on)
    lsdf, rsdf = _as_spark(left), _as_spark(right)

    salt_cols = [F.col(salt_from)] if salt_from else [F.col(c) for c in lsdf.columns]
    lsalted = lsdf.withColumn("__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salts)).cast("int"))
    rsalted = rsdf.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    joined = lsalted.join(rsalted, on=[*on, "__salt"], how=how).drop("__salt")
    idx = left.index_cols if isinstance(left, DataFrame) else ()
    return DataFrame(joined, tuple(c for c in idx if c in joined.columns), False)


def salted_agg(
    df,
    keys: str | Sequence[str],
    agg_exprs: dict,
    salts: int = 16,
) -> DataFrame:
    """two-stage aggregation for skewed group keys: partial aggregate
    on (key, salt) — spreading the hot key across reducers — then a
    cheap final aggregate on key. Only algebraic aggregates (sum,
    count, min, max) decompose this way; provide {out: (col, 'sum'|...)}."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    sdf = _as_spark(df)
    sdf = sdf.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in sdf.columns]), F.lit(salts)).cast("int")
    )
    partial_map = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refinal = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    partial_aggs, final_aggs = [], []
    for out, (col, fn) in agg_exprs.items():
        if fn == "mean":
            # decompose: mean = Σ(partial sums) / Σ(partial counts)
            partial_aggs.append(F.sum(F.col(col)).alias(f"__s_{out}"))
            partial_aggs.append(F.count(F.col(col)).alias(f"__c_{out}"))
            final_aggs.append(
                (F.sum(F.col(f"__s_{out}")) / F.sum(F.col(f"__c_{out}"))).alias(out)
            )
        elif fn in partial_map:
            partial_aggs.append(partial_map[fn](F.col(col)).alias(out))
            final_aggs.append(refinal[fn](F.col(out)).alias(out))
        else:
            raise ValueError(
                f"salted_agg supports algebraic aggregates "
                f"{sorted(partial_map) + ['mean']}, got {fn!r}"
            )

    partials = sdf.groupBy(*keys, "__salt").agg(*partial_aggs)
    final = partials.groupBy(*keys).agg(*final_aggs)
    return DataFrame(final)
