"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash (north-star extensions beyond the
reference; designed shuffle-only — no driver-side collection — so they
hold at 100 TB).

Scale design notes (the part that matters at 1000 executors):
- every stage is expressed as explode → hash-partitioned groupBy/join;
  no collect(), no per-row Python.
- the shingle self-join prunes ultra-frequent shingles first
  (`max_shingle_freq`): a shingle shared by f docs produces f² pair
  rows, so the frequency cap bounds the worst-case blowup — the same
  reasoning as prefix filtering in SetSimilarityJoin literature.
- MinHash/LSH replaces the quadratic shingle join with banded
  signatures: b bands of r rows → candidate pairs only when a whole
  band matches. Tune (b, r) to the target threshold t ≈ (1/b)^(1/r).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingles

# a small-scan input is spread only when its stat-able bytes are under
# this cap — past it, scan splits already provide parallelism and the
# round-robin exchange would just move text twice
_SPREAD_MAX_BYTES = 1 << 30


def _spread_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition of a SMALL, few-file scan before
    expensive per-row work (guide §2.5 input skew / §2.6 stragglers).

    The text operators below do their heavy lifting — shingle explode,
    per-token hashing, num_perm signature rehashes — BEFORE their
    first exchange, so their parallelism is the SCAN's.  A small
    corpus arrives as one parquet file = one task (sub-128 MB files
    never split), leaving every other core idle for the most
    CPU-intensive stage of the pipeline: measured at sf0.001, a
    single-file 500-doc corpus ran its md5 minhash banding in one
    task for 54 s on an 8-core session.

    Strictly a no-op at scale: it only fires when the input is a pure
    file scan (inputFiles() resolvable) with fewer files than cores
    AND under 1 GiB of locally stat-able bytes — a 100 TB table fails
    the first test, a remote store fails the stat, and any derived
    frame with its own exchanges is left alone."""
    try:
        files = df.inputFiles()
    except Exception:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if not files or len(files) >= target:
        return df
    import os
    from urllib.parse import urlparse
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return df                      # can't size cheaply: bail
        try:
            total += os.path.getsize(u.path or f)
        except OSError:
            return df
    if total > _SPREAD_MAX_BYTES:
        return df
    return df.repartition(target)


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """hash-groupBy exact dedup: one row per distinct text with member
    count and the representative (min) id."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
    )


def distinct_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3,
                      hashed: bool = False) -> DataFrame:
    """one row per (doc, distinct shingle). hashed=True replaces the
    shingle string with xxhash64 — 8-byte join keys instead of ~30-byte
    strings halve the self-join shuffle; collision probability at d
    distinct shingles is ~d²/2⁶⁵ (≈5e-11 here), acceptable for
    similarity joins."""
    sh = F.explode(shingles(F.col(text_col), k)).alias("__sh")
    out = df.select(F.col(id_col).alias("__id"), sh)
    if hashed:
        out = out.select("__id", F.xxhash64("__sh").alias("__sh"))
    return out.distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    prefix_filter: bool = False,
    hashed_shingles: bool = True,
    cache_shingles: bool = False,
    broadcast_sizes: bool = True,
) -> DataFrame:
    """exact n-gram Jaccard similarity join: all pairs with
    J(shingles(a), shingles(b)) >= threshold.

    With prefix_filter=True this is a PPJoin-style set similarity
    join: every doc's shingles are ordered by (global frequency,
    shingle) and only the first |A| − ⌈t·|A|⌉ + 1 shingles — the
    rarest ones — enter the candidate self-join. Lossless for a
    threshold query (any pair with J ≥ t must collide inside both
    prefixes under a common total order). It wins on Zipfian natural
    text where rare shingles have near-zero collisions; on corpora
    with near-uniform shingle frequencies (like the synthetic
    testdata) the extra ranking/verify passes cost more than the
    direct join saves, hence default False — measure per corpus.

    The shingle frame feeds sizes/frequency/join sides; by default it
    is RECOMPUTED per consumer rather than cached — measured on this
    corpus, building the InMemoryRelation costs ~6× the recompute
    (columnar cache build + lost AQE in the cached subplan), and
    Catalyst's ReusedExchange already de-duplicates the a/b join-side
    shuffles. Set cache_shingles=True (or checkpoint to parquet at
    100 TB) only when the source scan itself is expensive — e.g. the
    text column comes from a wide table without column pruning, or the
    upstream is a join. AQE handles shingle skew.
    max_shingle_freq optionally drops ultra-common shingles — an
    APPROXIMATION (changes J); leave None for exact results.

    broadcast_sizes: the per-doc size frame is 16 B/doc, so the
    broadcast hint is right up to ~10⁸ docs AND it keeps the a/b
    self-join subplans identical for ReusedExchange (hintless, the
    planner's exchange-then-AQE-convert dance measured 1.36× on the
    bench corpus). At a larger-than-driver corpus pass False: the
    size attach becomes a shuffle join on the doc id (AQE still
    broadcasts it at runtime while it fits).
    """
    from pyspark.sql.window import Window

    df = _spread_input(df)
    ds = distinct_shingles(df, id_col, text_col, k, hashed=hashed_shingles)
    if cache_shingles:
        ds = ds.cache()
    sizes = ds.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))

    if max_shingle_freq is not None:
        freq_cap = ds.groupBy("__sh").agg(F.count(F.lit(1)).alias("__f"))
        ds = ds.join(freq_cap.filter(F.col("__f") <= max_shingle_freq), "__sh").drop("__f")

    if prefix_filter:
        freq = ds.groupBy("__sh").agg(F.count(F.lit(1)).alias("__f"))
        ranked = (
            ds.join(freq, "__sh")
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__id").orderBy(F.col("__f"), F.col("__sh"))
                ),
            )
            .join(sizes, "__id")
        )
        prefix_len = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
        pre = ranked.filter(F.col("__rn") <= prefix_len).select("__id", "__sh")
        pa, pb = pre.alias("pa"), pre.alias("pb")
        cand = (
            pa.join(pb, "__sh")
            .filter(F.col("pa.__id") < F.col("pb.__id"))
            .select(F.col("pa.__id").alias("id_a"), F.col("pb.__id").alias("id_b"))
            .distinct()
        )
        A = ds.select(F.col("__id").alias("id_a"), "__sh")
        B = ds.select(F.col("__id").alias("id_b"), "__sh")
        inter = (
            cand.join(A, "id_a")
            .join(B, ["id_b", "__sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("__inter"))
        )
    else:
        # size-band pruning: J(A,B) ≥ t forces t ≤ |A|/|B| ≤ 1/t, so
        # attach set sizes and drop impossible pairs inside the join,
        # before the groupBy sees them (broadcast_sizes contract above)
        dsn = ds.join(
            F.broadcast(sizes) if broadcast_sizes else sizes, "__id")
        # alias() self-join keeps both exchange subplans identical so
        # the shingle scan/distinct is shared, not computed per side
        a, b = dsn.alias("a"), dsn.alias("b")
        inter = (
            a.join(b, "__sh")
            .filter(
                (F.col("a.__id") < F.col("b.__id"))
                & (F.col("a.__n") >= threshold * F.col("b.__n"))
                & (F.col("b.__n") >= threshold * F.col("a.__n"))
            )
            .groupBy(
                F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("__inter"))
        )

    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_perm: int = 32
) -> DataFrame:
    """MinHash signature per doc: num_perm seeded xxhash64 min-hashes
    over word k-shingles. One explode + one groupBy (partial aggs
    map-side); signature is an array<bigint> column.

    Two deliberate non-obvious choices:
    - NO pre-aggregation distinct(): min over a multiset equals min
      over its set, so duplicate shingles are absorbed by the map-side
      partial min — skipping a full shuffle of the exploded shingle
      rows (the distinct would shuffle every (doc, shingle) string).
    - the shingle STRING is hashed exactly once; the num_perm
      permutation hashes are derived by re-hashing the 8-byte base
      hash with the permutation index as seed (the standard
      one-hash + universal-rehash MinHash construction). Hashing a
      fixed-width long num_perm times is far cheaper than hashing a
      ~20-byte string num_perm times, and two shingles colliding in
      the base hash (~d²/2⁶⁵) is negligible for similarity estimates.
    """
    df = _spread_input(df)
    sh = F.explode(shingles(F.col(text_col), k)).alias("__sh")
    ds = df.select(F.col(id_col).alias("__id"), sh).select(
        "__id", F.xxhash64("__sh").alias("__b")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("__b"))).alias(f"__h{i}")
        for i in range(num_perm)
    ]
    sig = ds.groupBy("__id").agg(*aggs)
    return sig.select(
        F.col("__id"),
        F.array(*[F.col(f"__h{i}") for i in range(num_perm)]).alias("__sig"),
    )


def _banded_rows(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    """(__id, band, bhash) rows from a signature frame — the banded-key
    explode shared by the self-join pipeline (lsh_candidate_pairs) and
    the incremental index (minhash_index / minhash_dedup_against); the
    two MUST hash band slices identically or an index built yesterday
    can't match today's batch."""
    return sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.lit(b), *[F.element_at(F.col("__sig"), b * rows + r + 1) for r in range(rows)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bhash")


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = 8, rows: int = 4
) -> DataFrame:
    """banded LSH: docs whose signature agrees on all `rows` hashes of
    any band become a candidate pair. Collision threshold
    t ≈ (1/bands)^(1/rows)."""
    banded = _banded_rows(sig, bands, rows)
    # self-join via alias(), NOT per-side column renames: renaming
    # before the join puts a different projection under each exchange,
    # so the signature aggregation would be computed twice. With
    # identical subplans Spark builds/reuses one exchange.
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(sig_a: Column, sig_b: Column) -> Column:
    """estimated Jaccard = fraction of agreeing signature positions."""
    eq = F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x).cast("double") / F.size(sig_a)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """full MinHash+LSH near-dup pipeline: signatures → banded candidate
    pairs → verify by signature agreement ≥ threshold."""
    rows = num_perm // bands
    # NOT cached: measured on this corpus, cache() of the signature
    # frame is net slower (eager materialization job + columnar cache
    # build + lost whole-stage codegen under the cached subplan) than
    # recomputing the one-explode/one-agg signature per consumer. At
    # 100 TB, checkpoint signatures to parquet instead — the explode
    # over the raw text is the expensive stage there.
    sig = minhash_signatures(df, id_col, text_col, k, num_perm)
    cand = lsh_candidate_pairs(sig, bands, rows)
    sa = sig.select(F.col("__id").alias("id_a"), F.col("__sig").alias("__sig_a"))
    sb = sig.select(F.col("__id").alias("id_b"), F.col("__sig").alias("__sig_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", minhash_jaccard_estimate(F.col("__sig_a"), F.col("__sig_b")))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_index(df: DataFrame, id_col: str, text_col: str, k: int = 3,
                  num_perm: int = 32, bands: int = 8
                  ) -> tuple[DataFrame, DataFrame]:
    """Persistent LSH index for INCREMENTAL dedup: returns
    ``(band_rows, sigs)`` — ``band_rows`` is (id, band, bhash) and
    ``sigs`` is (id, sig array<bigint>).  Write both to parquet (band
    rows clustered on (band, bhash) — to_parquet(sort_by=,
    cluster=True)) ONCE; each day's new batch then dedupes against the
    index via minhash_dedup_against without ever re-reading the old
    corpus' text.  This is the production shape at 100 TB: the corpus
    is scanned once when indexed, and daily batches cost
    O(batch + matched candidates).
    """
    rows = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_perm)
    band_rows = _banded_rows(sig, bands, rows).select(
        F.col("__id").alias("id"), "band", "bhash")
    sigs = sig.select(F.col("__id").alias("id"), F.col("__sig").alias("sig"))
    return band_rows, sigs


def minhash_dedup_against(new_df: DataFrame, index_bands: DataFrame,
                          index_sigs: DataFrame, id_col: str, text_col: str,
                          k: int = 3, num_perm: int = 32, bands: int = 8,
                          threshold: float = 0.7) -> DataFrame:
    """Dedupe a NEW batch against an existing minhash_index — no
    self-join over the combined corpus, no rescan of old text.  Plan:
    signature the batch (one explode + agg over the batch only), band
    it, equi-join (band, bhash) against the index's band rows, verify
    candidates by signature agreement ≥ threshold.  Returns
    (id_new, id_index, est_jaccard).  The candidate equi-join shuffles
    only the batch's band keys plus the MATCHING index slice; ids may
    overlap between batch and index (the pair is emitted either way —
    filter id_new != id_index downstream if re-indexing in place)."""
    rows = num_perm // bands
    sig_new = minhash_signatures(new_df, id_col, text_col, k, num_perm)
    banded_new = _banded_rows(sig_new, bands, rows)
    cand = (
        banded_new.join(index_bands.withColumnRenamed("id", "id_index"),
                        ["band", "bhash"])
        .select(F.col("__id").alias("id_new"), "id_index")
        .distinct()
    )
    sa = sig_new.select(F.col("__id").alias("id_new"),
                        F.col("__sig").alias("__sig_a"))
    sb = index_sigs.select(F.col("id").alias("id_index"),
                           F.col("sig").alias("__sig_b"))
    return (
        cand.join(sa, "id_new")
        .join(sb, "id_index")
        .withColumn("est_jaccard",
                    minhash_jaccard_estimate(F.col("__sig_a"),
                                             F.col("__sig_b")))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_new", "id_index", "est_jaccard")
    )


def md5_token_hash(tok: Column) -> Column:
    """60-bit token hash derived from md5 — the cross-engine-portable
    alternative to xxhash64 (DuckDB can compute the identical value as
    ('0x' || substr(md5(t),1,15))::BIGINT), used so the driver can
    hash-oracle the SimHash pipeline end-to-end. xxhash64 stays the
    production default (cheaper; no cryptographic work per token)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash(text: Column, num_bits: int = 64, sep: str = " ",
            token_hash=None) -> Column:
    """64-bit SimHash over tokens: per-bit majority vote of token
    hashes, assembled into a bigint. Pure column expressions.

    Single pass over the token array: ONE aggregate whose accumulator
    is the 64-element vote vector (zip_with against a literal mask
    array). The previous form ran 64 separate aggregates — 64
    traversals of the token array through a 64x larger expression
    tree; the single-pass form measured 11.3s → 7.3s warm on the
    sf0.1 candidate query (signature stage ~4s, the rest is the
    chunk-bucket join)."""

    def _bit_lit(b: int) -> int:
        # bit 63 of a signed long is Long.MIN_VALUE, not 1<<63
        return -(1 << 63) if b == 63 else (1 << b)

    masks = F.array(
        *[F.lit(_bit_lit(b)).cast("long") for b in range(num_bits)]
    )
    toks = F.array_distinct(F.split(text, sep))
    hash_fn = token_hash or (lambda t: F.xxhash64(t))
    hashes = F.transform(toks, hash_fn)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), num_bits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_bucket_pairs(df: DataFrame, id_col: str, text_col: str,
                         chunk_bits: int = 16, num_bits: int = 64,
                         token_hash=None,
                         blocks: int | str | None = "auto",
                         max_hamming: int = 3) -> DataFrame:
    """near-dup candidates: docs sharing any chunk_bits-wide SimHash
    chunk (Hamming distance ≤ num_bits/chunk_bits − 1 guarantees one
    equal chunk; the 64/16 default gives the Hamming ≤ 3 guarantee).

    SCALE CONTRACT (round-5 ×100 probe finding): the default 16-bit
    chunk keys have only 65k values per position — past ~10⁵ docs the
    buckets birthday-collide and the candidate stage goes quadratic
    (the SimHash analogue of the frozen-LSH-planes trap; the ×100
    probe's candidate set exceeded 1 GB).  For large corpora pass
    ``blocks=B`` to switch to the Manku block-permutation scheme
    (Manku, Jain & Sarma, WWW'07): the signature splits into B blocks
    and candidates key on every (B − max_hamming)-sized block
    combination — a Hamming ≤ max_hamming pair differs in ≤
    max_hamming blocks, so some combination matches (same guarantee,
    C(B, max_hamming) tables).  Key width grows from 64/B bits to
    (B − max_hamming)·64/B bits: blocks=6, max_hamming=3 gives 20
    tables of ~32-bit keys — collision-free into the billions.  Size
    B so 2^((B−max_hamming)·64/B) ≫ corpus.

    The DEFAULT is ``blocks="auto"`` (round 6): one count() of the
    corpus picks the measured-good side of the crossover — the dense
    chunk scheme while the corpus fits comfortably inside the
    2^chunk_bits key space, the smallest Manku B whose key width
    clears log2(n) + 8 bits once it doesn't — so callers whose corpus
    outgrows the chunk-key space are switched instead of silently
    going quadratic.  Pass ``blocks=None`` to force chunked or an int
    to force a specific Manku B (both skip the count)."""
    if blocks == "auto":
        n = df.count()
        if n <= (1 << chunk_bits) // 4:
            blocks = None
        else:
            import math
            need = math.log2(max(2, n)) + 8
            blocks = next(
                (b for b in range(max_hamming + 1, 13)
                 if (b - max_hamming) * num_bits / b >= need), 12)
            # prefer keys made of ≥3 blocks: a 2-of-5 key matches any
            # mid-Hamming pair far more often than a 3-of-6 key of the
            # same collision-safe width — measured at a ×10-dense 50k
            # corpus, B=5 produced 2.1× the candidates of B=6 (56 M vs
            # 26 M) despite B=6's 2× table count (SCALE.md)
            blocks = min(12, max(blocks, max_hamming + 3))
    elif blocks is not None and not isinstance(blocks, int):
        raise ValueError(
            f"blocks must be an int, None, or 'auto', got {blocks!r}")
    with_sh = _spread_input(df).select(
        F.col(id_col).alias("__id"),
        simhash(F.col(text_col), num_bits=num_bits,
                token_hash=token_hash).alias("__sh64"),
    )
    if blocks is not None:
        if not (0 < max_hamming < blocks):
            raise ValueError("need 0 < max_hamming < blocks")
        from itertools import combinations
        base, rem = divmod(num_bits, blocks)
        widths = [base + (1 if i < rem else 0) for i in range(blocks)]
        offs, off = [], 0
        for w in widths:
            offs.append(off)
            off += w
        bvals = [
            F.shiftright(F.col("__sh64"), offs[i])
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
            for i in range(blocks)
        ]
        combos = list(combinations(range(blocks), blocks - max_hamming))
        keys = [
            F.struct(F.lit(ci).alias("chunk"),
                     F.xxhash64(F.lit(ci), *[bvals[i] for i in combo])
                     .alias("cval"))
            for ci, combo in enumerate(combos)
        ]
        chunks = with_sh.select(
            "__id", "__sh64", F.explode(F.array(*keys)).alias("cc")
        ).select("__id", "__sh64", "cc.chunk", "cc.cval")
    else:
        n_chunks = num_bits // chunk_bits
        mask = (1 << chunk_bits) - 1
        chunks = with_sh.select(
            "__id",
            "__sh64",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("chunk"),
                            F.shiftright(F.col("__sh64"), i * chunk_bits).bitwiseAND(F.lit(mask)).alias("cval"),
                        )
                        for i in range(n_chunks)
                    ]
                )
            ).alias("cc"),
        ).select("__id", "__sh64", "cc.chunk", "cc.cval")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, ["chunk", "cval"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sh64").alias("sh_a"),
            F.col("b.__sh64").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", hamming).select("id_a", "id_b", "hamming")


def md5_perm_hash(i: Column, h: Column) -> Column:
    """portable permutation rehash: 60-bit md5 of "i:h" — DuckDB
    reproduces it as ('0x' || substr(md5(i || ':' || h), 1, 15))::BIGINT.
    Companion to md5_token_hash for oracle-checkable MinHash."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", i.cast("string"), h.cast("string"))), 1, 15
        ), 16, 10,
    ).cast("long")


def md5_band_hash(band_slice: Column) -> Column:
    """portable band-bucket key: 60-bit md5 of the ':'-joined row mins
    (DuckDB: md5(string_agg(m, ':' ORDER BY perm)))."""
    return F.conv(
        F.substring(
            F.md5(F.array_join(
                F.transform(band_slice, lambda x: x.cast("string")), ":"
            )), 1, 15,
        ), 16, 10,
    ).cast("long")


def minhash_sig_expr(text: Column, k: int = 3, num_perm: int = 32,
                     sep: str = " ", token_hash=None,
                     perm_hash=None) -> Column:
    """MinHash signature as ONE pure column expression (array<bigint>)
    — no explode/groupBy, so it also runs on STREAMING frames where a
    pre-aggregation before stateful ops is not allowed. Same
    one-hash + universal-rehash construction as minhash_signatures
    (hash the shingle once, derive permutations by rehashing the
    8-byte base hash with the permutation index). Pass
    token_hash=md5_token_hash + perm_hash=md5_perm_hash for the
    DuckDB-reproducible variant (oracle checks); xxhash64 stays the
    production default."""
    th = token_hash or (lambda s: F.xxhash64(s))
    ph = perm_hash or (lambda i, h: F.xxhash64(i, h))
    base = F.transform(F.array_distinct(shingles(text, k, sep)), th)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(
            F.transform(base, lambda h: ph(i, h))
        ),
    )


def lsh_band_keys(sig: Column, bands: int = 8, rows: int = 4,
                  band_hash=None) -> Column:
    """array<struct<band,bkey>>: hash of each signature band — works on
    batch and streaming frames alike. band_hash=md5_band_hash for the
    DuckDB-reproducible variant."""
    bh = band_hash or (lambda s: F.xxhash64(s))
    return F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            bh(F.slice(sig, j * rows + 1, rows)).alias("bkey"),
        )
        for j in range(bands)
    ])


def connected_components(pairs, a_col: str = "id_a", b_col: str = "id_b",
                         max_iter: int = 20):
    """Resolve duplicate PAIRS into duplicate GROUPS: undirected
    connected components by min-label propagation — each node ends up
    labeled with the smallest id in its component, so a pipeline keeps
    `id == comp` as the canonical representative and drops the rest.

    Each round is one join + min-aggregate over the edge list; a label
    spreads one hop per round, so rounds ~ component diameter —
    near-duplicate clusters are shallow (diameter a handful), and
    `max_iter` guards pathological chains (for genuinely deep graphs
    use the published large-star/small-star variant, which the same
    loop skeleton accommodates). Convergence is checked with one
    small count per round and labels are localCheckpoint()ed so the
    plan doesn't grow with iterations — the same deliberately-eager
    loop shape as the IVF Lloyd step (similarity.py), mirroring the
    reference's own iterative algorithms.

    Returns (id, comp) for every node that appears in `pairs`.
    """
    e = pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
    edges = (
        e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("s").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges["s"] == labels["id"])
            .groupBy(F.col("d").alias("__mid"))
            .agg(F.min("comp").alias("__nbr"))
        )
        joined = labels.join(msgs, labels["id"] == F.col("__mid"), "left")
        new = joined.select(
            F.col("id"),
            F.least(F.col("comp"), F.coalesce(F.col("__nbr"), F.col("comp"))).alias("comp"),
            (F.col("__nbr") < F.col("comp")).alias("__chg"),
        ).localCheckpoint()
        changed = new.where(F.col("__chg")).limit(1).count()
        labels = new.drop("__chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter — labels would be "
            "WRONG, not approximate). Near-dup graphs are shallow; for "
            "deep chains use connected_components_star (large-star/"
            "small-star, O(log n) rounds regardless of diameter) or "
            "raise max_iter.")
    return labels


def duplicated_spans(df: DataFrame, id_col: str, text_col: str,
                     k: int = 20, min_docs: int = 2, sep: str = " ",
                     scope: str = "cross_doc",
                     materialize: str = "local") -> DataFrame:
    """Exact substring-duplication scan (Lee et al. 2021,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better" — the ExactSubstr pass, re-expressed Spark-first): every
    k-token window of every document is keyed by its content; a window
    whose content appears in >= min_docs DISTINCT documents marks a
    duplicated span.  Overlapping duplicated windows are merged per doc
    (gaps-and-islands over start positions), giving the exact token
    count covered by cross-document duplicated substrings.

    vs the paper's suffix array: identical detection semantics at the
    fixed threshold length k, but embarrassingly parallel — one
    explode + one shuffle on the 8-byte window hash + one PER-DOC
    ordered window — instead of a global suffix sort; at 100 TB the
    window-hash shuffle is the only wide stage and it partial-aggregates
    map-side.  Collision risk of the xxhash64 key at d distinct windows
    is ~d^2/2^65 (negligible below ~10^8 windows per shuffle key space).

    ``scope``: "cross_doc" (default) flags windows shared by
    >= min_docs DISTINCT documents; "any" additionally flags windows
    repeated WITHIN one document (>= min_docs total occurrences — the
    paper's ExactSubstr also removes intra-document repeats).

    ``materialize``: the (id, pos, hash) window table feeds TWO
    consumers (the occurrence count and the probe side), whose
    different shuffle keys defeat exchange reuse — "local" (default)
    localCheckpoints it so the shingle scan runs once (measured 1.75×
    at sf0.1); "none" recomputes.  At cluster scale the materialized
    table is ~24 B/token on executor-local disk — if that exceeds
    local storage, pass "none" or checkpoint to parquet upstream.

    Returns (id, total_tokens, dup_tokens, n_spans) — docs with no
    duplicated span report 0/0.
    """
    from pyspark.sql.window import Window

    if scope not in ("cross_doc", "any"):
        raise ValueError("scope must be 'cross_doc' or 'any'")
    df = _spread_input(df)
    toks = F.split(F.col(text_col), sep)
    base = df.select(F.col(id_col).alias("id"),
                     F.coalesce(F.size(toks), F.lit(0)).alias("total_tokens"),
                     shingles(F.col(text_col), k, sep).alias("__w"))
    wins = base.select(
        "id", F.posexplode("__w").alias("pos", "__s")
    ).select("id", "pos", F.xxhash64("__s").alias("h"))
    if materialize == "local":
        wins = wins.localCheckpoint(eager=False)
    elif materialize != "none":
        raise ValueError("materialize must be 'local' or 'none'")

    occ = (F.count_distinct("id") if scope == "cross_doc"
           else F.count(F.lit(1)))
    dup_h = (wins.groupBy("h")
             .agg(occ.alias("nd"))
             .filter(F.col("nd") >= min_docs)
             .select("h"))
    dup_wins = wins.join(dup_h, "h", "left_semi").select("id", "pos")

    # merge overlapping [pos, pos+k) intervals per doc: a window starts
    # a new span iff it begins past the running max end of earlier ones
    w_prev = (Window.partitionBy("id").orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("id").orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, 0))
    spans = (
        dup_wins
        .withColumn("__pe", F.coalesce(F.max(F.col("pos") + k).over(w_prev),
                                       F.lit(-1)))
        .withColumn("__new", (F.col("pos") > F.col("__pe")).cast("int"))
        .withColumn("__island", F.sum("__new").over(w_run))
        .groupBy("id", "__island")
        .agg((F.max("pos") + k - F.min("pos")).alias("__len"))
        .groupBy("id")
        .agg(F.sum("__len").alias("dup_tokens"),
             F.count(F.lit(1)).alias("n_spans"))
    )
    return (
        base.select("id", "total_tokens")
        .join(spans, "id", "left")
        .select("id", "total_tokens",
                F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
                F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"))
    )


def connected_components_star(pairs, a_col: str = "id_a", b_col: str = "id_b",
                              max_iter: int = 50):
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond" — public): each round is two groupBy-min + join passes over
    the edge list and the graph collapses toward per-component stars in
    O(log n) rounds REGARDLESS of diameter — the scale path for deep
    chains where min-label propagation (`connected_components`) needs
    diameter rounds.

    large-star(v): connect every strictly LARGER neighbor of v to
    m = min(N(v) ∪ {v});  small-star on canonical (hi→lo) edges:
    connect every lo-neighbor of hi, and hi itself, to the minimum.
    Edges only ever point downward afterward, count never grows, and a
    stable edge set is a forest of stars rooted at component minima.

    Same contract as `connected_components`: returns (id, comp) for
    every node appearing in `pairs`, comp = smallest id in the
    component.  Deliberately eager per round (localCheckpoint + one
    small convergence count), like the label-propagation form.
    """
    raw = pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
    nodes = (raw.select(F.col("s").alias("id"))
             .unionByName(raw.select(F.col("d").alias("id")))
             .distinct().localCheckpoint())
    # canonical: hi -> lo, self-loops dropped
    e = (raw.filter(F.col("s") != F.col("d"))
         .select(F.greatest("s", "d").alias("hi"),
                 F.least("s", "d").alias("lo"))
         .distinct().localCheckpoint())
    for _ in range(max_iter):
        # ---- large-star: gather FULL neighborhoods (symmetrized) ----
        sym = e.unionByName(
            e.select(F.col("lo").alias("hi"), F.col("hi").alias("lo"))
        )  # rows (v=hi, nbr=lo)
        mins = (sym.groupBy("hi")
                .agg(F.min("lo").alias("__m"))
                .select(F.col("hi").alias("v"),
                        F.least("__m", F.col("hi")).alias("m")))
        large = (sym.join(mins, sym["hi"] == mins["v"])
                 .where(F.col("lo") > F.col("hi"))
                 .select(F.col("lo").alias("hi"), F.col("m").alias("lo")))
        e1 = (large.where(F.col("hi") != F.col("lo"))
              .unionByName(e).distinct().localCheckpoint())
        # ---- small-star on canonical edges -------------------------
        mins2 = (e1.groupBy("hi").agg(F.min("lo").alias("m")))
        small = (e1.join(mins2, "hi")
                 .select(F.col("lo").alias("x"), F.col("m"))
                 .unionByName(mins2.select(F.col("hi").alias("x"),
                                           F.col("m"))))
        e2 = (small.where(F.col("x") != F.col("m"))
              .select(F.col("x").alias("hi"), F.col("m").alias("lo"))
              .distinct().localCheckpoint())
        # converged when small-star was a no-op (same canonical set)
        if e2.count() == e.count() and e2.exceptAll(e).limit(1).count() == 0:
            e = e2
            break
        e = e2
    else:
        # same contract as connected_components: a non-star edge set
        # would fan out the final join into duplicated, WRONG labels
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — raise max_iter (O(log n) rounds suffice for any "
            "graph, so this indicates an extreme input).")
    return (nodes.join(e.select(F.col("hi").alias("id"),
                                F.col("lo").alias("comp")),
                       "id", "left")
            .select("id", F.coalesce("comp", F.col("id")).alias("comp")))


def exact_hash_index(df: DataFrame, id_col: str, text_col: str,
                     normalize: bool = False) -> DataFrame:
    """Persistent EXACT-dedup index: one (text_hash, keep_id) row per
    distinct text — the exact companion to minhash_index for the
    incremental-ingest pattern (index the corpus ONCE, dedupe each
    day's batch against the index, append only the novel hashes; old
    text is never re-read).  `normalize=True` hashes
    lower(trim(text)) so whitespace/case variants collapse.  Size is
    one 32-hex + id row per distinct text — parquet it clustered on
    text_hash for equi-join locality."""
    key = F.col(text_col)
    if normalize:
        key = F.lower(F.trim(key))
    return (df.groupBy(F.md5(key).alias("text_hash"))
            .agg(F.min(F.col(id_col)).alias("keep_id")))


def exact_dedup_against(new_df: DataFrame, index: DataFrame, id_col: str,
                        text_col: str, normalize: bool = False) -> DataFrame:
    """Dedupe a NEW batch against an exact_hash_index: returns
    (id, text_hash, dup_of) where dup_of is the index's keep_id when
    the text was already in the corpus, the batch's own first (min-id)
    occurrence for intra-batch duplicates, and NULL for novel texts —
    so ``where dup_of IS NULL`` is the surviving batch and
    ``exact_hash_index`` of the survivors appended to the index keeps
    it current.

    Plan: hash the batch (ONE scan), per-hash min-id over the batch as
    a whole-partition window min — the window's text_hash exchange is
    the same partitioning the index join needs, so the batch is
    shuffled once and scanned once (the groupBy+join-back alternative
    scanned it twice).  At 100 TB the index join is the only
    corpus-sized input and it ships only (32-hex, id) rows."""
    from pyspark.sql.window import Window

    key = F.col(text_col)
    if normalize:
        key = F.lower(F.trim(key))
    batch = new_df.select(F.col(id_col).alias("id"),
                          F.md5(key).alias("text_hash"))
    w = Window.partitionBy("text_hash")
    batch = batch.withColumn("__batch_keep", F.min("id").over(w))
    idx = index.select("text_hash", F.col("keep_id").alias("__idx_keep"))
    return (batch.join(idx, "text_hash", "left")
            .select("id", "text_hash",
                    F.coalesce(
                        F.col("__idx_keep"),
                        F.when(F.col("id") != F.col("__batch_keep"),
                               F.col("__batch_keep"))).alias("dup_of")))


def exact_dedup_against_bloom(new_df: DataFrame, index: DataFrame,
                              bloom: DataFrame, id_col: str, text_col: str,
                              normalize: bool = False,
                              bloom_params: tuple[int, int, int] | None = None
                              ) -> DataFrame:
    """exact_dedup_against with a Bloom prefilter (sketches.bloom_index
    built over the index's text_hash column): batch rows whose hash is
    DEFINITELY absent from the index skip the index join entirely —
    only "maybe present" rows (true dups + the design-fpp false
    positives) join.  Because Bloom filters have NO false negatives the
    answer is IDENTICAL to exact_dedup_against — the oracle checks
    exactly that — while at 100 TB a mostly-novel daily batch turns the
    corpus-sized index join into a map-only broadcast probe plus a join
    whose batch side is a few percent of the rows.  The index side
    still prunes: with the index parquet clustered on text_hash the
    small maybe-join is exchange-free on the big side.

    `bloom_params` = (m_bits, k, num_shards) from the build keeps the
    plan collect-free; omitted, they're read from the bloom's first row.
    """
    from pyspark.sql.window import Window

    from .sketches import bloom_probe

    key = F.col(text_col)
    if normalize:
        key = F.lower(F.trim(key))
    batch = new_df.select(F.col(id_col).alias("id"),
                          F.md5(key).alias("text_hash"))
    w = Window.partitionBy("text_hash")
    batch = batch.withColumn("__batch_keep", F.min("id").over(w))
    kwargs = {}
    if bloom_params is not None:
        kwargs = dict(m_bits=bloom_params[0], k=bloom_params[1],
                      num_shards=bloom_params[2])
    probed = bloom_probe(batch, bloom, "text_hash",
                         result_col="__maybe", **kwargs)
    # the maybe/novel split consumes `probed` twice; without a lineage
    # break each branch would re-scan + re-hash + re-window the batch
    # (measured 2x at the x1000 probe).  localCheckpoint materializes
    # the probed batch once — bounded by the DAILY BATCH size, which
    # is the small side of this pattern by contract.
    probed = probed.localCheckpoint(eager=False)
    idx = index.select("text_hash", F.col("keep_id").alias("__idx_keep"))
    maybe = probed.where(F.col("__maybe")).join(idx, "text_hash", "left")
    novel = probed.where(~F.col("__maybe")).withColumn(
        "__idx_keep", F.lit(None).cast(dict(index.dtypes)["keep_id"]))
    return (maybe.select("id", "text_hash", "__batch_keep", "__idx_keep")
            .unionByName(novel.select("id", "text_hash", "__batch_keep",
                                      "__idx_keep"))
            .select("id", "text_hash",
                    F.coalesce(
                        F.col("__idx_keep"),
                        F.when(F.col("id") != F.col("__batch_keep"),
                               F.col("__batch_keep"))).alias("dup_of")))
