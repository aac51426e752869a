"""Deterministic sampling / splitting operators for training-data
pipelines (north-star extension; no reference analogue — dask-expr only
has per-partition random Sample, _expr.py:1168).

Everything here must be REPRODUCIBLE across engines, runs, and
partitionings — a training pipeline that can't replay its exact
train/val split can't debug a regression. So none of these use engine
RNGs (rand() differs per engine/partitioning); they key off md5 of a
stable row id, which every engine computes identically. Cost model at
100 TB:
- hash_split: narrow map (one md5 per row), no shuffle.
- stratified_sample: one shuffle on the stratum key + per-group top-n
  window (no global sort).
- global_shuffle: one range-partitioned sort on the hash — the same
  cost as any global sort, and the ONLY way to get a reproducible
  total order for curriculum-style streaming into a trainer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_key(id_col: Column, seed: str) -> Column:
    """md5 hex of seed||id — portable (identical in Spark/DuckDB/
    pandas), uniform in the hex-string order."""
    return F.md5(F.concat(F.lit(seed), id_col.cast("string")))


def _order_key(id_col: Column, seed: str, fast: bool) -> Column:
    """sampling order key: md5 hex (cross-engine oracle-reproducible,
    the default) or xxhash64 (the production fast path — SCALE.md
    measured md5 at ~4 µs/row on the ×100 corpus; xxhash64 keeps the
    same run/partitioning determinism within Spark but is not
    reproducible in DuckDB/pandas)."""
    if fast:
        return F.xxhash64(F.lit(seed), id_col.cast("string"))
    return _hash_key(id_col, seed)


def _uniform01(id_col: Column, seed: str, fast: bool) -> Column:
    """uniform (0,1) from a 48-bit hash slice — 48 bits sit far below
    a double's 53-bit mantissa, so downstream log(u)/w arithmetic is
    IEEE-exact on the md5 path (cross-engine) and deterministic on the
    xxhash64 fast path."""
    if fast:
        h48 = F.pmod(F.xxhash64(F.lit(seed), id_col.cast("string")),
                     F.lit(int(16 ** 12)))
    else:
        h48 = F.conv(F.substring(_hash_key(id_col, seed), 1, 12),
                     16, 10).cast("double")
    return (h48.cast("double") + F.lit(1.0)) / F.lit(float(16 ** 12 + 2))


def split_column(id_col: Column, val_fraction: float, seed: str = "s42") -> Column:
    """'train' / 'val' label. The threshold is the 4-hex-digit prefix
    boundary closest to val_fraction (granularity 1/65536 ≈ 0.0015%):
    rows whose md5 prefix sorts below it go to val. Narrow map — rows
    never move."""
    thr = format(int(round(val_fraction * 65536)), "04x")
    return F.when(
        F.substring(_hash_key(id_col, seed), 1, 4) < thr, F.lit("val")
    ).otherwise(F.lit("train"))


def hash_split(df: DataFrame, id_col: str, val_fraction: float = 0.1,
               seed: str = "s42") -> tuple[DataFrame, DataFrame]:
    """(train, val) deterministic split — same id always lands on the
    same side, independent of partitioning, row order, engine."""
    lbl = split_column(F.col(id_col), val_fraction, seed)
    tagged = df.withColumn("__split", lbl)
    return (
        tagged.filter(F.col("__split") == "train").drop("__split"),
        tagged.filter(F.col("__split") == "val").drop("__split"),
    )


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      n_per_stratum: int, seed: str = "s42") -> DataFrame:
    """exactly min(n, |stratum|) rows per stratum, chosen by md5 order
    — a deterministic 'uniform without replacement' draw. One shuffle
    on the stratum key; skewed strata are bounded by the window top-n
    (no stratum ever materializes fully on one node beyond its top-n
    heap)."""
    w = Window.partitionBy(strata_col).orderBy(
        _hash_key(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def global_shuffle(df: DataFrame, id_col: str, seed: str = "s42") -> DataFrame:
    """reproducible global permutation: range-partitioned sort on the
    md5 key. Adds `shuffle_rank` (1-based position in the permutation)
    so downstream consumers can stream slices in order.

    Scalable rank WITHOUT a global window (which would funnel every
    row through one task): range-partition + sort on the key, count
    rows per partition (tiny driver round-trip, like the reference's
    division sampling in _shuffle.py:1335), then rank = partition
    offset + intra-partition row_number. The rank is independent of
    where the range boundaries land, so RangePartitioner's sampling
    nondeterminism doesn't leak into results."""
    key = _hash_key(F.col(id_col), seed)
    parts = (
        df.withColumn("__k", key)
        .repartitionByRange(F.col("__k"), F.col(id_col))
        .sortWithinPartitions("__k", id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    counts = (
        parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
        .orderBy("__pid").collect()
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["__n"]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("__pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("__pid").orderBy("__k", id_col)
    return (
        parts.withColumn("shuffle_rank", (off + F.row_number().over(w)).cast("long"))
        .drop("__k", "__pid")
    )


def sample_n(df: DataFrame, n: int, id_col: str, seed: str = "s42",
             fast_hash: bool = False) -> DataFrame:
    """Exactly min(n, |df|) rows, uniform without replacement, chosen
    by md5 order — the exact-count companion to hash_split's
    fraction-based split (a trainer that needs "exactly 1M eval docs"
    can't use a fraction).

    Plan: orderBy(hash, id).limit(n) compiles to TakeOrderedAndProject
    — a per-partition top-n heap followed by one merge of the
    partition-local candidates. No full sort, no range shuffle; cost
    is O(rows · log n) map-side.  The merge materializes the n
    survivors in one place, so for n beyond ~10M rows prefer
    global_shuffle + a rank filter (same determinism, fully
    distributed output).  `fast_hash=True` swaps the md5 key for
    xxhash64 (~4× cheaper per row, same determinism within Spark,
    not oracle-reproducible)."""
    key = _order_key(F.col(id_col), seed, fast_hash)
    return df.orderBy(key, F.col(id_col)).limit(int(n))


def sample_n_weighted(df: DataFrame, n: int, id_col: str, weight_col: str,
                      seed: str = "s42",
                      fast_hash: bool = False) -> DataFrame:
    """Exactly min(n, |rows with weight > 0|) rows, drawn WITHOUT
    replacement with probability proportional to `weight_col`
    (Efraimidis–Spirakis A-ES: key = u^(1/w) with u uniform from the
    md5 hash; top-n keys are the weighted sample).  The training-data
    use: quality- or recency-weighted corpus subsetting that replays
    identically across engines, runs, and partitionings.

    Determinism: u derives from the first 12 md5 hex digits of
    seed||id (48 bits — far below a double's 53-bit mantissa, so the
    u float and log(u)/w arithmetic are IEEE-identical in Spark and
    DuckDB).  Plan: TakeOrderedAndProject on log(u)/w descending —
    per-partition top-n heap, no full sort (same contract as
    sample_n; for huge n use a threshold split instead).
    Rows with NULL, zero, or negative weight are excluded.
    `fast_hash=True`: xxhash64-derived u, same contract trade as
    sample_n."""
    u = _uniform01(F.col(id_col), seed, fast_hash)
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w  # monotone in u^(1/w); maximize => sort desc
    return (df.where(w > 0)
              .orderBy(key.desc(), F.col(id_col))
              .limit(int(n)))


def resample_to_mix(df: DataFrame, source_col: str, id_col: str,
                    target_shares: dict[str, float],
                    seed: str = "mix42") -> DataFrame:
    """Domain-mixture resampling (pretraining data reweighting — e.g.
    The Pile / Llama-style source proportions): downsample each source
    so the surviving corpus matches `target_shares` as closely as the
    data allows, deterministically.

    The feasible total is T = min_s(count_s / share_s) — the largest
    corpus where no source needs MORE rows than it has. Each source
    then keeps p_s = share_s * T / count_s of its rows, selected by
    md5-prefix threshold (uniform, engine- and partitioning-
    independent; same keying as hash_split). Sources absent from
    target_shares are dropped.

    Spark shape: one tiny groupBy(source) count (|sources| rows), the
    threshold arithmetic as a window over that tiny frame, broadcast
    back — the row stream itself sees one narrow filter, no shuffle.
    The 16-bit prefix quantizes p_s to 1/65536, so realized counts
    deviate from share_s*T by at most count_s/65536 (binomial-free:
    the draw is a fixed hash population, not an RNG)."""
    shares = F.create_map(*[
        F.lit(x) for kv in target_shares.items() for x in (str(kv[0]), float(kv[1]))
    ])
    counts = (df.groupBy(F.col(source_col).alias("__src"))
              .agg(F.count(F.lit(1)).alias("__n"))
              .withColumn("__share", shares[F.col("__src")])
              .where(F.col("__share").isNotNull()))
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    thr = (counts
           .withColumn("__T", F.min(F.col("__n") / F.col("__share")).over(w))
           .withColumn("__thr", F.round(
               F.col("__share") * F.col("__T") / F.col("__n") * 65536)
               .cast("long"))
           .select("__src", "__thr"))
    keyed = df.join(F.broadcast(thr), df[source_col] == F.col("__src"), "inner")
    u16 = F.conv(F.substring(_hash_key(F.col(id_col), seed), 1, 4), 16, 10) \
        .cast("long")
    return keyed.where(u16 < F.col("__thr")).drop("__src", "__thr")


def sample_n_per_group(df: DataFrame, group_col: str, id_col: str, n: int,
                       seed: str = "s42", salts: int = 32,
                       fast_hash: bool = False) -> DataFrame:
    """Exactly min(n, group size) rows PER GROUP, uniform without
    replacement, deterministic (md5 order) — training-data class
    balancing ("10k docs per language", "500 examples per label")
    where fraction-based stratified_sample can't hit exact counts.

    Plan — two-phase salted top-n, because a plain window over
    `group_col` puts an ENTIRE group in one task (a single
    billion-row class at 100 TB would sort in one place): phase 1
    ranks within (group, salt) — `salts` parallel tasks each holding
    ~1/salts of the group — and keeps n candidates per salt; phase 2
    ranks the ≤ n·salts survivors per group and keeps n.  Exact: the
    global md5-order top-n is contained in the union of per-salt
    top-ns.  Same id always survives regardless of partitioning, row
    order, salts, or engine (the sampling-family contract;
    `fast_hash=True` keeps all of it except engine-portability)."""
    key = _order_key(F.col(id_col), seed, fast_hash)
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                  F.lit(int(salts)))
    w1 = Window.partitionBy(group_col, salt.alias("__salt")).orderBy(
        key, F.col(id_col))
    pre = (df.withColumn("__rn", F.row_number().over(w1))
           .where(F.col("__rn") <= int(n)).drop("__rn"))
    w2 = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (pre.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= int(n)).drop("__rn"))


def leakage_safe_split(df: DataFrame, id_col: str, pairs: DataFrame,
                       val_fraction: float = 0.1, seed: str = "s42",
                       resolver: str = "star"
                       ) -> tuple[DataFrame, DataFrame]:
    """(train, val) split where DUPLICATE GROUPS move as one unit: ids
    connected by `pairs` (exact-hash or MinHash/SimHash candidate
    pairs — any (id_a, id_b) frame) share their component
    representative's hash, so a document can never land in train while
    its near-duplicate sits in val — the eval-contamination failure
    mode of naive per-id splits on deduplicated-but-not-resolved
    corpora.

    Plan: connected components over the pairs (large-star/small-star
    by default — O(log n) rounds, diameter-independent), left-join the
    component id back (ids in no pair represent themselves), then the
    standard deterministic md5 threshold on the REPRESENTATIVE.  The
    split stays engine/partitioning-independent and, given the same
    pairs, reproducible forever."""
    from .dedup import connected_components, connected_components_star

    cc = (connected_components_star if resolver == "star"
          else connected_components)
    comp = cc(pairs).select(F.col("id").alias("__cid"),
                            F.col("comp").alias("__rep"))
    tagged = (df.join(comp, df[id_col] == F.col("__cid"), "left")
              .withColumn("__key",
                          F.coalesce(F.col("__rep"), df[id_col]))
              .drop("__cid", "__rep"))
    lbl = split_column(F.col("__key"), val_fraction, seed)
    tagged = tagged.withColumn("__split", lbl).drop("__key")
    return (
        tagged.filter(F.col("__split") == "train").drop("__split"),
        tagged.filter(F.col("__split") == "val").drop("__split"),
    )


def sample_n_weighted_per_group(df: DataFrame, group_col: str, id_col: str,
                                weight_col: str, n: int,
                                seed: str = "s42",
                                salts: int = 32,
                                fast_hash: bool = False) -> DataFrame:
    """Exactly min(n, positive-weight rows) PER GROUP, drawn without
    replacement with probability ∝ `weight_col` (Efraimidis–Spirakis
    keys, same 48-bit-uniform determinism contract as
    sample_n_weighted) — quality-weighted per-class corpus balancing
    ("the 10k best docs per language").

    Same two-phase salted plan as sample_n_per_group: per-(group,salt)
    pre-prune bounds any one task to ~group/salts rows, then the
    ≤ n·salts survivors rank per group.  Exact and salt-invariant (the
    global per-group top-n by A-ES key is contained in the union of
    per-salt top-ns).  NULL/zero/negative weights are excluded."""
    u = _uniform01(F.col(id_col), seed, fast_hash)
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w  # maximize u^(1/w) ⇔ sort log(u)/w descending
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                  F.lit(int(salts)))
    base = df.where(w > 0)
    w1 = Window.partitionBy(group_col, salt).orderBy(
        key.desc(), F.col(id_col))
    pre = (base.withColumn("__rn", F.row_number().over(w1))
           .where(F.col("__rn") <= int(n)).drop("__rn"))
    w2 = Window.partitionBy(group_col).orderBy(key.desc(), F.col(id_col))
    return (pre.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= int(n)).drop("__rn"))


def split_temporal(df: DataFrame, ts_col: str, cutoff=None,
                   val_fraction: float = 0.1,
                   embargo: str | None = None) -> DataFrame:
    """Time-ordered train/validation split with an optional EMBARGO
    gap — the leakage-safe split for time-series / event data, where
    hash_split is wrong by construction (a random split puts events
    from the same hour on both sides, so any feature with temporal
    autocorrelation trains on the future; the standard fix is a
    strictly-older train set plus a buffer dropped around the
    boundary — de Prado, "Advances in Financial Machine Learning",
    2018, public; no reference analogue).

    The boundary: pass `cutoff` (a literal timestamp — exact, the
    reproducible-pipeline path) or leave None to derive it as the
    exact (1 - val_fraction) percentile of `ts_col` (ONE agg job;
    deterministic).  Rows strictly before (cutoff - embargo) train;
    rows at/after cutoff validate; rows inside the embargo window are
    DROPPED into split='embargo' so boundary-straddling windows can't
    leak.  `embargo` is an INTERVAL string (e.g. "7 days").

    Cost: one narrow map (plus the one-row percentile when derived) —
    no shuffle; at 100 TB a partition/cluster layout on ts_col makes
    both sides partition-pruned reads.  Returns df + 'split' column
    ('train' | 'val' | 'embargo')."""
    from pyspark.sql import types as T

    t = F.col(ts_col)
    dt = df.schema[ts_col].dataType
    if cutoff is None:
        # exact percentile; TIMESTAMP(_NTZ) hops through LTZ→double
        # (session tz is fixed UTC, order-preserving) and back
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType,
                           T.DateType)):
            num = t.cast("timestamp_ltz").cast("double")
            cutv = df.select(F.percentile(
                num, F.lit(1.0 - float(val_fraction))).alias("__c")
            ).collect()[0]["__c"]
            cut_lit = F.timestamp_seconds(F.lit(cutv)).cast(dt)
        else:
            cutv = df.select(F.percentile(
                t, F.lit(1.0 - float(val_fraction))).alias("__c")
            ).collect()[0]["__c"]
            cut_lit = F.lit(cutv)
    else:
        cut_lit = F.lit(cutoff).cast(dt)
    if embargo is not None:
        lo = cut_lit - F.expr(f"INTERVAL {embargo}")
        split = (F.when(t < lo, F.lit("train"))
                 .when(t >= cut_lit, F.lit("val"))
                 .otherwise(F.lit("embargo")))
    else:
        split = F.when(t < cut_lit, F.lit("train")).otherwise(
            F.lit("val"))
    return df.withColumn("split", split)
