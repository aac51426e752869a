"""Round-7 durability + hardening tests: crash-injected atomic table
swaps (whole-table, per-partition, sketch compactors), the bucketed
unpartitioned upsert, the bloom-backed partition-move guard, and the
round-6 ADVICE regressions (kmv_intersect one-sided groups,
mmr_rerank zero-norm embeddings, per-directory compaction targets)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_expr_spark.functions import maintenance as M


def _mk_table(spark, path, n=60, parts=("a", "b", "c")):
    pdf = pd.DataFrame({
        "k": range(n),
        "v": [float(i) for i in range(n)],
        "part": [parts[i % len(parts)] for i in range(n)],
    })
    (spark.createDataFrame(pdf).write.mode("overwrite")
     .partitionBy("part").parquet(path))
    return pdf


def _snap(spark, path):
    return {r["k"]: (r["v"], r["part"])
            for r in spark.read.parquet(path).collect()}


# ------------------------------------------------- crash-safe swaps

def test_atomic_overwrite_crash_before_promote(spark, tmp_path,
                                               monkeypatch):
    """kill between write-new and any rename: table untouched,
    recover_table clears the debris."""
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    before = _snap(spark, path)
    df2 = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [9.9],
                                              "part": ["a"]}))

    real_rename = os.rename

    def boom(src, dst):
        raise RuntimeError("injected crash")

    monkeypatch.setattr(os, "rename", boom)
    with pytest.raises(RuntimeError):
        M.atomic_overwrite(
            path, lambda p: df2.write.mode("overwrite").parquet(p))
    monkeypatch.setattr(os, "rename", real_rename)
    assert os.path.isdir(path + "__new")      # debris present
    M.recover_table(path)
    assert not os.path.isdir(path + "__new")
    assert _snap(spark, path) == before


def test_atomic_overwrite_crash_between_renames(spark, tmp_path,
                                                monkeypatch):
    """kill after the old table renamed aside but before the promote:
    the table is momentarily absent; recover_table rolls the old one
    back (the uncommitted new data is dropped)."""
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    before = _snap(spark, path)
    df2 = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [9.9],
                                              "part": ["a"]}))

    real_rename = os.rename
    calls = []

    def one_then_boom(src, dst):
        if calls:
            raise RuntimeError("injected crash")
        calls.append(1)
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", one_then_boom)
    with pytest.raises(RuntimeError):
        M.atomic_overwrite(
            path, lambda p: df2.write.mode("overwrite").parquet(p))
    monkeypatch.setattr(os, "rename", real_rename)
    assert not os.path.isdir(path)            # the transient state
    assert os.path.isdir(path + "__old")
    assert M.recover_table(path)
    assert _snap(spark, path) == before


def test_atomic_overwrite_crash_before_cleanup(spark, tmp_path):
    """promote completed, old copy still on disk: recover drops the
    trash and keeps the NEW table."""
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    df2 = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [9.9],
                                              "part": ["a"]}))
    df2.write.parquet(path + "__staged")
    # construct the post-promote state by hand
    os.rename(path, path + "__old")
    os.rename(path + "__staged", path)
    M.recover_table(path)
    assert not os.path.isdir(path + "__old")
    assert _snap(spark, path) == {1: (9.9, "a")}


def test_partition_swap_crash_mid_loop(spark, tmp_path, monkeypatch):
    """kill a multi-partition upsert between a partition's two renames:
    every partition is either fully old or fully new, recover_table
    restores the one caught in between, and retrying the SAME batch
    converges to the correct final state."""
    path = str(tmp_path / "t")
    pdf = _mk_table(spark, path)
    upd = spark.createDataFrame(pd.DataFrame({
        "k": [0, 1, 2], "v": [100.0, 101.0, 102.0],
        "part": ["a", "b", "c"]}))

    real_rename = os.rename
    state = {"n": 0}

    def boom_on_third(src, dst):
        # renames come in (aside, promote) pairs per partition; crash
        # right after partition #1 promoted and partition #2 moved aside
        state["n"] += 1
        if state["n"] == 3:
            real_rename(src, dst)      # partition 2's aside rename
            raise RuntimeError("injected crash")
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", boom_on_third)
    with pytest.raises(RuntimeError):
        M.upsert_partitioned(spark, path, upd, ["k"], "part",
                             check_moves=False)
    monkeypatch.setattr(os, "rename", real_rename)

    M.recover_table(path)
    got = _snap(spark, path)
    assert set(got) == set(range(len(pdf)))   # no row lost anywhere
    for k, (v, part) in got.items():
        assert v in (float(k), 100.0 + k)     # fully old or fully new
    # retry the batch: converges
    M.upsert_partitioned(spark, path, upd, ["k"], "part",
                         check_moves=False)
    got = _snap(spark, path)
    assert got[0] == (100.0, "a") and got[1] == (101.0, "b") \
        and got[2] == (102.0, "c")
    assert got[5] == (5.0, "c")


def test_compact_rollup_crash_recoverable(spark, tmp_path, monkeypatch):
    """sketch-table compaction: kill between the old table's rename
    aside and the promote — the rollup is recoverable and estimates
    still answer (the round-6 rmtree-then-move pattern lost it)."""
    from dask_expr_spark.functions.sketches import hll_estimate, hll_rollup
    from dask_expr_spark.streaming import ops as S

    roll = str(tmp_path / "roll")
    df = spark.createDataFrame(pd.DataFrame({
        "g": ["x"] * 50 + ["y"] * 50, "u": list(range(50)) * 2}))
    for epoch in (0, 1):
        (hll_rollup(df, ["g"], "u").withColumn("__epoch", F.lit(epoch))
         .write.mode("append").parquet(roll))
    want = {r["g"]: r["distinct_est"]
            for r in hll_estimate(spark.read.parquet(roll),
                                  ["g"]).collect()}

    real_rename = os.rename
    calls = []

    def one_then_boom(src, dst):
        if calls:
            raise RuntimeError("injected crash")
        calls.append(1)
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", one_then_boom)
    with pytest.raises(RuntimeError):
        S.compact_hll_rollup(spark, roll, ["g"])
    monkeypatch.setattr(os, "rename", real_rename)
    assert not os.path.isdir(roll)            # caught mid-swap
    assert M.recover_table(roll)
    got = {r["g"]: r["distinct_est"]
           for r in hll_estimate(spark.read.parquet(roll),
                                 ["g"]).collect()}
    assert got == want
    # compaction retried: folds to one row per key, estimates unchanged
    S.compact_hll_rollup(spark, roll, ["g"])
    compacted = spark.read.parquet(roll)
    assert compacted.count() == 2
    got = {r["g"]: r["distinct_est"]
           for r in hll_estimate(compacted, ["g"]).collect()}
    assert got == want


# ------------------------------------------------- bucketed upsert

def test_upsert_bucketed_prunes_and_merges(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(pd.DataFrame({
        "k": range(200), "v": [0.0] * 200}))
    M.write_bucketed(base, path, ["k"], 16)
    assert M.is_bucketed(path)
    import glob
    before = {f: os.path.getsize(f)
              for f in glob.glob(path + "/__bucket=*/*.parquet")}
    upd = spark.createDataFrame(pd.DataFrame({
        "k": [3, 7, 500], "v": [30.0, 70.0, 500.0]}))
    touched = M.upsert_bucketed(spark, path, upd, ["k"])
    assert 0 < len(touched) <= 3              # at most one dir per key
    after = {f: os.path.getsize(f)
             for f in glob.glob(path + "/__bucket=*/*.parquet")}
    tdirs = tuple(f"__bucket={b}{os.sep}" for b in touched)
    for f, sz in after.items():
        if not any(d in f for d in tdirs):
            assert before.get(f) == sz        # untouched buckets intact
    got = {r["k"]: r["v"]
           for r in M.read_bucketed(spark, path).collect()}
    assert len(got) == 201
    assert got[3] == 30.0 and got[7] == 70.0 and got[500] == 500.0
    assert got[4] == 0.0


def test_upsert_bucketed_key_mismatch_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [0.0]}))
    M.write_bucketed(base, path, ["k"], 4)
    with pytest.raises(ValueError, match="bucketed on"):
        M.upsert_bucketed(spark, path, base, ["v"])


def test_compact_preserves_bucket_spec(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(pd.DataFrame({
        "k": range(100), "v": [1.0] * 100}))
    M.write_bucketed(base, path, ["k"], 8)
    M.compact_parquet(spark, path, target_mb=512,
                      partition_col="__bucket")
    assert M.is_bucketed(path)                # sidecar survived the swap
    upd = spark.createDataFrame(pd.DataFrame({"k": [5], "v": [9.0]}))
    M.upsert_bucketed(spark, path, upd, ["k"])
    got = {r["k"]: r["v"] for r in M.read_bucketed(spark, path).collect()}
    assert got[5] == 9.0 and len(got) == 100


# ------------------------------------------ per-directory compaction

def test_compact_parquet_per_partition_file_bound(spark, tmp_path):
    """partitioned compaction: each hive directory folds to ITS OWN
    byte target — a wide table can never fan out to
    n_target × n_partitions files (round-6 ADVICE)."""
    import glob
    path = str(tmp_path / "t")
    pdf = pd.DataFrame({
        "k": range(300), "v": [float(i) for i in range(300)],
        "part": [("a", "b", "c")[i % 3] for i in range(300)]})
    (spark.createDataFrame(pdf).repartition(20).write
     .mode("overwrite").partitionBy("part").parquet(path))
    nb = len(glob.glob(path + "/part=*/*.parquet"))
    assert nb >= 30                           # plenty of small files
    before, after = M.compact_parquet(spark, path, target_mb=512,
                                      partition_col="part")
    assert before == nb
    # 512 MB target on KB of data -> exactly one file per directory
    for d in glob.glob(path + "/part=*"):
        assert len(glob.glob(d + "/*.parquet")) == 1
    got = {r["k"]: (r["v"], r["part"])
           for r in spark.read.parquet(path).collect()}
    assert got == {i: (float(i), ("a", "b", "c")[i % 3])
                   for i in range(300)}


# ------------------------------------------- bloom-backed move guard

def test_move_guard_bloom_skips_scan_for_inserts(spark, tmp_path,
                                                 monkeypatch):
    """with a key bloom, a pure-insert batch (all keys definitely
    absent) must NOT trigger the full-table key scan; a genuine move
    must still be rejected (via the exact fallback)."""
    path = str(tmp_path / "t")
    bloom = str(tmp_path / "bloom")
    _mk_table(spark, path)
    M.build_key_bloom(spark, path, ["k"], bloom, fpp=0.01)

    calls = []
    real = M._move_guard_full_scan

    def counted(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(M, "_move_guard_full_scan", counted)

    inserts = spark.createDataFrame(pd.DataFrame({
        "k": [1000, 1001], "v": [1.0, 2.0], "part": ["a", "b"]}))
    M.upsert_partitioned(spark, path, inserts, ["k"], "part",
                         key_bloom_path=bloom)
    assert calls == []                        # no scan for pure inserts

    mover = spark.createDataFrame(pd.DataFrame({
        "k": [5], "v": [9.0], "part": ["a"]}))  # k=5 lives in part c
    with pytest.raises(ValueError, match="partition-moving"):
        M.upsert_partitioned(spark, path, mover, ["k"], "part",
                             key_bloom_path=bloom)
    assert len(calls) == 1                    # maybe-hit -> exact scan


def test_move_guard_bloom_append_keeps_no_false_negatives(spark,
                                                          tmp_path):
    """keys inserted THROUGH the guarded path land in the bloom, so a
    later attempt to move one of them is still rejected."""
    path = str(tmp_path / "t")
    bloom = str(tmp_path / "bloom")
    _mk_table(spark, path)
    M.build_key_bloom(spark, path, ["k"], bloom, fpp=0.01)
    inserts = spark.createDataFrame(pd.DataFrame({
        "k": [2000], "v": [1.0], "part": ["a"]}))
    M.upsert_partitioned(spark, path, inserts, ["k"], "part",
                         key_bloom_path=bloom)
    mover = spark.createDataFrame(pd.DataFrame({
        "k": [2000], "v": [2.0], "part": ["b"]}))
    with pytest.raises(ValueError, match="partition-moving"):
        M.upsert_partitioned(spark, path, mover, ["k"], "part",
                             key_bloom_path=bloom)


# ------------------------------------------------ ADVICE regressions

def test_kmv_intersect_one_sided_group_is_zero(spark):
    """a group present in only one rollup intersects EMPTY: inter_est
    must be 0 (not NULL) and union_est the present side's estimate
    (round-6 ADVICE: null concat poisoned one-sided groups)."""
    from dask_expr_spark.functions.sketches import kmv_intersect, kmv_rollup

    a = spark.createDataFrame(pd.DataFrame(
        {"g": ["both"] * 30 + ["only_a"] * 20,
         "u": list(range(30)) + list(range(20))}))
    b = spark.createDataFrame(pd.DataFrame(
        {"g": ["both"] * 30, "u": list(range(15, 45))}))
    ra = kmv_rollup(a, ["g"], "u", k=64)
    rb = kmv_rollup(b, ["g"], "u", k=64)
    got = {r["g"]: (r["inter_est"], r["union_est"])
           for r in kmv_intersect(ra, rb, ["g"]).collect()}
    assert got["only_a"] == (0, 20)           # unsaturated -> exact
    assert got["both"][0] == 15 and got["both"][1] == 45


def test_mmr_rerank_zero_vector_no_nan(spark):
    """one all-zero embedding must not inject NaN into the greedy
    selection (round-6 ADVICE: unguarded norm division)."""
    import math

    from dask_expr_spark.functions.similarity import mmr_rerank

    rows = [("q", i, 1.0 - 0.1 * i,
             [0.0, 0.0] if i == 2 else [1.0, float(i)])
            for i in range(5)]
    cand = spark.createDataFrame(rows, "q string, id int, rel double, "
                                       "emb array<double>")
    out = mmr_rerank(cand, "q", "id", "rel", "emb", k=4, lam=0.7)
    got = out.orderBy("rank").collect()
    assert len(got) == 4
    assert all(not math.isnan(r["mmr"]) for r in got)
    assert got[0]["id"] == 0                  # pure-relevance first pick


# --------------------------------------------- snapshot versioning

def test_snapshot_versioning_lifecycle(spark, tmp_path):
    path = str(tmp_path / "snap")
    d0 = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}))
    d1 = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3],
                                             "v": [9.0, 2.0, 3.0]}))
    assert M.snapshot_write(d0, path) == 0
    assert M.snapshot_write(d1, path) == 1
    assert M.snapshot_read(spark, path).count() == 3          # current
    assert {r["v"] for r in
            M.snapshot_read(spark, path, 0).collect()} == {1.0, 2.0}
    assert [h["version"] for h in M.snapshot_history(path)] == [0, 1]


def test_snapshot_crashed_commit_invisible_and_reclaimed(spark,
                                                         tmp_path):
    """a version directory without a manifest flip (crash before the
    os.replace) must be unreadable, and the NEXT write reclaims its
    number."""
    path = str(tmp_path / "snap")
    d0 = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [1.0]}))
    M.snapshot_write(d0, path)
    orphan = os.path.join(path, "_v00000001")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "partial"), "w") as f:
        f.write("junk")
    with pytest.raises(ValueError, match="not available"):
        M.snapshot_read(spark, path, 1)
    assert M.snapshot_read(spark, path).count() == 1          # live intact
    assert M.snapshot_write(d0, path) == 1                    # reclaimed
    assert M.snapshot_read(spark, path, 1).count() == 1


def test_snapshot_vacuum_keeps_current(spark, tmp_path):
    path = str(tmp_path / "snap")
    d = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [1.0]}))
    for _ in range(4):
        M.snapshot_write(d, path)
    assert M.snapshot_vacuum(path, keep=2) == [0, 1]
    assert [h["version"] for h in M.snapshot_history(path)] == [2, 3]
    with pytest.raises(ValueError):
        M.snapshot_read(spark, path, 0)
    assert M.snapshot_read(spark, path, 2).count() == 1
    assert M.snapshot_read(spark, path).count() == 1
    # keep larger than history: no-op
    assert M.snapshot_vacuum(path, keep=10) == []


# ----------------------------------------- profile from rollups

def test_profile_from_rollups_matches_profile_table(spark):
    """moments/hist/hll rollups built at a finer grain and merged must
    reproduce profile_table's exact fields and land its approximate
    fields within the documented bounds."""
    from dask_expr_spark.functions.quality import (profile_from_rollups,
                                                   profile_table)
    from dask_expr_spark.functions.sketches import (hist_rollup,
                                                    hll_rollup,
                                                    moments_rollup)

    pdf = pd.DataFrame({
        "g": ["a", "b"] * 200,
        "x": [float(i % 37) for i in range(400)],
    })
    pdf.loc[::10, "x"] = None                 # nulls must be counted
    df = spark.createDataFrame(pdf)
    mom = moments_rollup(df, ["g"], "x")
    hst = hist_rollup(df, ["g"], "x", bins=64, lo=0.0, hi=37.0)
    hll = hll_rollup(df.withColumn("__s", F.col("x").cast("string")),
                     ["g"], "__s")
    got = profile_from_rollups(mom, hst, hll).collect()[0]
    ref = profile_table(df, ["x"]).collect()[0]
    assert got["n"] == ref["n"] and got["nulls"] == ref["nulls"]
    assert float(got["min_val"]) == float(ref["min_val"])
    assert float(got["max_val"]) == float(ref["max_val"])
    assert abs(got["mean"] - ref["mean"]) < 1e-9
    assert abs(got["stddev"] - ref["stddev"]) < 1e-9
    exact_p50 = df.agg(F.expr("percentile(x, 0.5)")).collect()[0][0]
    assert abs(got["q50"] - exact_p50) <= 37.0 / 64
    exact_d = df.where(F.col("x").isNotNull()).select("x") \
        .distinct().count()
    assert abs(got["distinct"] - exact_d) <= max(2, 0.1 * exact_d)
    # grouped: n splits exactly
    per_g = {r["g"]: r["n"]
             for r in profile_from_rollups(mom, hst, hll, ["g"]).collect()}
    assert per_g == {"a": 200, "b": 200}


def test_moments_rollup_merge_exact(spark):
    from dask_expr_spark.functions.sketches import (moments_merge,
                                                    moments_rollup)

    pdf = pd.DataFrame({"s": [("x", "y")[i % 2] for i in range(100)],
                        "v": [float(i) for i in range(100)]})
    df = spark.createDataFrame(pdf)
    merged = moments_merge(moments_rollup(df, ["s"], "v")).collect()[0]
    assert merged["n_rows"] == 100 and merged["n"] == 100
    assert merged["s1"] == sum(range(100))
    assert merged["min_v"] == 0.0 and merged["max_v"] == 99.0
