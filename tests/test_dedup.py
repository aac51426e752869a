"""Property tests for the approximate dedup ops (no SQL oracle):
MinHash-LSH must recall the exact-Jaccard pairs; SimHash buckets must
catch near-identical docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_expr_spark.functions import dedup as DD
from dask_expr_spark.sources.io import read_parquet


def _docs(spark, sf_dir):
    return read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()


def test_minhash_lsh_recalls_exact_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    exact = {
        (r.id_a, r.id_b)
        for r in DD.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.9, max_shingle_freq=None
        ).collect()
    }
    assert exact, "testdata should contain planted near-duplicates"
    approx = {
        (r.id_a, r.id_b)
        for r in DD.minhash_dedup_pairs(
            docs, "doc_id", "text", k=3, num_perm=32, bands=8, threshold=0.7
        ).collect()
    }
    # banded LSH at (8,4) catches J>=0.9 pairs with prob ~1-(1-0.9^4)^8 ≈ 0.9998
    missed = exact - approx
    assert len(missed) <= max(1, len(exact) // 10), f"LSH missed {missed}"


def test_minhash_estimate_tracks_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    exact = DD.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.9, max_shingle_freq=None
    )
    sig = DD.minhash_signatures(docs, "doc_id", "text", k=3, num_perm=32)
    sa = sig.select(F.col("__id").alias("id_a"), F.col("__sig").alias("sa"))
    sb = sig.select(F.col("__id").alias("id_b"), F.col("__sig").alias("sb"))
    joined = exact.join(sa, "id_a").join(sb, "id_b").withColumn(
        "est", DD.minhash_jaccard_estimate(F.col("sa"), F.col("sb"))
    )
    for r in joined.collect():
        assert abs(r.est - r.jaccard) < 0.35, (r.id_a, r.id_b, r.est, r.jaccard)


def test_simhash_deterministic_and_buckets(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id: r.sh for r in docs.select(
        "doc_id", DD.simhash(F.col("text")).alias("sh")).collect()}
    b = {r.doc_id: r.sh for r in docs.select(
        "doc_id", DD.simhash(F.col("text")).alias("sh")).collect()}
    assert a == b
    # identical text must produce identical simhash → hamming 0 pairs exist
    pairs = DD.simhash_bucket_pairs(docs, "doc_id", "text")
    assert pairs.filter(F.col("hamming") <= 12).count() >= 0


def test_exact_dup_groups_counts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    groups = DD.exact_dup_groups(docs, "text", "doc_id")
    total = groups.agg(F.sum("n_docs")).collect()[0][0]
    assert total == docs.count()


def test_connected_components_shapes(spark):
    """min-label propagation on a synthetic graph: a 5-chain (diameter
    4, needs several rounds), a triangle, and an isolated pair."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # chain 1-2-3-4-5
         (10, 11), (11, 12), (10, 12),           # triangle
         (20, 21)],                              # pair
        ["id_a", "id_b"],
    )
    got = {r["id"]: r["comp"]
           for r in DD.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_pack_sequences_arithmetic(spark):
    """packing invariants: offsets in [0, max_len), consecutive docs'
    stream positions abut, end pack covers the doc's last token."""
    from dask_expr_spark.functions.text import pack_sequences

    pdf_rows = [(i, 700 + (i * 137) % 900) for i in range(40)]
    sdf = spark.createDataFrame(pdf_rows, ["doc_id", "n_tok"])
    out = (pack_sequences(sdf, "doc_id", "n_tok", max_len=2048)
           .orderBy("doc_id").collect())
    pos = 0
    for r in out:
        assert r["pack_id"] == pos // 2048
        assert r["pack_offset"] == pos % 2048
        pos += r["n_tok"]
        assert r["pack_id_end"] == (pos - 1) // 2048


def test_connected_components_star_deep_chain(spark):
    """large-star/small-star resolves a 200-node chain (diameter 199)
    in O(log n) rounds — the case min-label propagation cannot reach
    within its round budget."""
    import pandas as pd

    pdf = pd.DataFrame({"id_a": list(range(199)),
                        "id_b": list(range(1, 200))})
    pairs = spark.createDataFrame(pdf)
    got = {r.id: r.comp
           for r in DD.connected_components_star(pairs).collect()}
    assert len(got) == 200
    assert set(got.values()) == {0}


def test_connected_components_label_prop_raises_on_deep_chain(spark):
    """min-label propagation must REFUSE (not silently return wrong
    labels) when the diameter exceeds its round budget."""
    import pandas as pd
    import pytest

    pdf = pd.DataFrame({"id_a": list(range(60)),
                        "id_b": list(range(1, 61))})
    pairs = spark.createDataFrame(pdf)
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(pairs, max_iter=5).collect()


@pytest.mark.slow
def test_connected_components_star_matches_label_prop_random(spark):
    """random shallow graphs: both algorithms agree with each other
    and with a driver-side union-find."""
    import random

    import pandas as pd

    rng = random.Random(42)
    for trial in range(3):
        n = 80
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
        edges = [(a, b) for a, b in edges if a != b]
        pdf = pd.DataFrame(edges, columns=["id_a", "id_b"])
        pairs = spark.createDataFrame(pdf)
        star = {r.id: r.comp
                for r in DD.connected_components_star(pairs).collect()}
        prop = {r.id: r.comp
                for r in DD.connected_components(pairs).collect()}
        assert star == prop, f"trial {trial}"
        # driver-side union-find oracle
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        assert star == want, f"trial {trial} vs union-find"


def test_duplicated_spans_scope_any_vs_cross_doc(spark):
    """scope='any' also flags INTRA-document repeats; cross_doc (the
    default) ignores them."""
    import pandas as pd

    phrase = "alpha beta gamma delta"
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            f"{phrase} filler one two three {phrase}",  # internal repeat
            "totally different words here entirely now",
            "unrelated content without any repeats at all",
        ],
    })
    sdf = spark.createDataFrame(pdf)
    cross = {r.id: r.dup_tokens
             for r in DD.duplicated_spans(sdf, "doc_id", "text", k=4).collect()}
    any_ = {r.id: r.dup_tokens
            for r in DD.duplicated_spans(sdf, "doc_id", "text", k=4,
                                         scope="any").collect()}
    assert cross == {1: 0, 2: 0, 3: 0}
    assert any_[1] == 8 and any_[2] == 0 and any_[3] == 0


def test_minhash_index_parquet_roundtrip(spark, sf_dir, tmp_path):
    """minhash_index persisted to parquet and read back must produce
    the identical dedup_against result as the in-memory index — the
    whole point is indexing the corpus ONCE and reusing the files."""
    from dask_expr_spark.functions import dedup as DD
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    bands_df, sigs_df = DD.minhash_index(old, "doc_id", "text")

    bp, sp = str(tmp_path / "bands"), str(tmp_path / "sigs")
    bands_df.write.parquet(bp)
    sigs_df.write.parquet(sp)

    def run(b, s):
        return sorted(
            (r["id_new"], r["id_index"], round(r["est_jaccard"], 6))
            for r in DD.minhash_dedup_against(
                new, b, s, "doc_id", "text", threshold=0.7).collect())

    mem = run(bands_df, sigs_df)
    disk = run(spark.read.parquet(bp), spark.read.parquet(sp))
    assert mem == disk and len(mem) > 0


def test_simhash_blocks_recall_equals_chunks(spark, sf_dir):
    """Manku block-permutation keys (blocks=6, max_hamming=3) must find
    every Hamming<=3 pair the 16-bit chunk scheme finds — same
    guarantee, wider keys (the x100 probe showed 16-bit buckets
    birthday-collide past ~1e5 docs)."""
    from dask_expr_spark.functions import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def ham3(df):
        return {(r["id_a"], r["id_b"]) for r in df.collect()
                if r["hamming"] <= 3}

    chunk_pairs = ham3(DD.simhash_bucket_pairs(docs, "doc_id", "text"))
    block_pairs = ham3(DD.simhash_bucket_pairs(
        docs, "doc_id", "text", blocks=6, max_hamming=3))
    # both schemes guarantee Hamming<=3 coverage -> identical sets
    assert chunk_pairs == block_pairs and len(block_pairs) > 0


def test_simhash_auto_blocks_switch(spark, sf_dir):
    """blocks='auto' (the round-6 default) must stay on the chunk
    scheme while the corpus fits the chunk-key space and switch to
    Manku block keys once it doesn't — with identical Hamming<=3 pair
    coverage either way (both schemes carry the same guarantee)."""
    import pytest

    from dask_expr_spark.functions import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def ham3(df):
        return {(r["id_a"], r["id_b"]) for r in df.collect()
                if r["hamming"] <= 3}

    # tiny chunk_bits=4 -> threshold 2^4/4 = 4 docs, so the corpus
    # trips the auto-switch; the forced-Manku result must match
    auto = ham3(DD.simhash_bucket_pairs(docs, "doc_id", "text",
                                        chunk_bits=4))
    forced = ham3(DD.simhash_bucket_pairs(docs, "doc_id", "text",
                                          chunk_bits=4, blocks=6))
    assert auto == forced
    # default chunk_bits=16: the sf-test corpus is far below 2^16/4,
    # auto stays chunked -> equals the explicit chunked result
    auto16 = ham3(DD.simhash_bucket_pairs(docs, "doc_id", "text"))
    chunked = ham3(DD.simhash_bucket_pairs(docs, "doc_id", "text",
                                           blocks=None))
    assert auto16 == chunked and len(auto16) > 0
    with pytest.raises(ValueError, match="blocks"):
        DD.simhash_bucket_pairs(docs, "doc_id", "text", blocks="huge")
