"""Streaming operator tests: run each op on a file-source stream over
the events testdata and compare against the equivalent batch query
(batch-parity is the streaming correctness oracle)."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from dask_expr_spark.sources.io import read_parquet
from dask_expr_spark.streaming import ops as S


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """stage the events table as a 4-file stream source (micro-batches)."""
    out = str(tmp_path_factory.mktemp("stream_src"))
    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")).to_spark()
    ev.repartition(4).write.mode("overwrite").parquet(out)
    # drop _SUCCESS etc. noise is fine — readStream ignores non-parquet
    return out


@pytest.fixture()
def batch_events(spark, stream_dir):
    return spark.read.schema(S.EVENTS_SCHEMA).parquet(stream_dir)


def _drain(spark, sdf, name, mode="update"):
    q = S.run_to_memory(sdf, name, output_mode=mode)
    out = spark.sql(f"SELECT * FROM {name}")
    return out, q


def test_tumbling_counts_batch_parity(spark, stream_dir, batch_events):
    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = S.read_event_stream(spark, stream_dir, max_files_per_trigger=2)
    out, q = _drain(spark, S.tumbling_counts(stream), name, mode="update")
    try:
        got = {
            (r.ws, r.event_type): (r.n, round(r.total, 6))
            for r in out.collect()
        }
        want = {
            (r.ws, r.event_type): (r.n, round(r.total, 6))
            for r in (
                batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
                .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
            ).collect()
        }
        # update mode re-emits; last value per key must equal batch
        assert set(want) <= set(got)
        for k, v in want.items():
            assert got[k] == v, (k, got[k], v)
    finally:
        q.stop()


def test_session_windows_run(spark, stream_dir):
    name = f"s_{uuid.uuid4().hex[:8]}"
    stream = S.read_event_stream(spark, stream_dir)
    # session windows only support append mode: windows emit once the
    # watermark passes them (the last <2h of sessions stay pending)
    out, q = _drain(spark, S.session_windows(stream), name, mode="append")
    try:
        rows = out.collect()
        assert rows, "session windows should produce output"
        for r in rows[:20]:
            assert r.session_end >= r.session_start
            assert r.n_events >= 1
    finally:
        q.stop()


def test_dedup_stream_drops_duplicates(spark, stream_dir, batch_events, tmp_path):
    # duplicate the source files → every event arrives twice
    dup_dir = str(tmp_path / "dup")
    shutil.copytree(stream_dir, dup_dir)
    for f in os.listdir(stream_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stream_dir, f), os.path.join(dup_dir, "dup_" + f))
    name = f"d_{uuid.uuid4().hex[:8]}"
    stream = S.read_event_stream(spark, dup_dir)
    deduped = S.dedup_stream(stream, ["event_id"])
    out, q = _drain(spark, deduped, name, mode="append")
    try:
        n = out.count()
        assert n == batch_events.count(), "dup copies must be dropped"
    finally:
        q.stop()


def test_running_user_totals_stateful(spark, stream_dir, batch_events):
    name = f"r_{uuid.uuid4().hex[:8]}"
    stream = S.read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    out, q = _drain(spark, S.running_user_totals(stream), name, mode="update")
    try:
        # final state per user must equal the batch aggregate
        final = {}
        for r in spark.sql(
            f"SELECT user_id, max(n_events) n, max_by(total_value, n_events) t FROM {name} GROUP BY user_id"
        ).collect():
            final[r.user_id] = (r.n, round(r.t, 6))
        want = {
            r.user_id: (r.n, round(r.t, 6))
            for r in batch_events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
            .collect()
        }
        assert final == want
    finally:
        q.stop()


def test_stream_static_enrich(spark, stream_dir):
    import pandas as pd
    dim = spark.createDataFrame(pd.DataFrame({
        "event_type": ["click", "view", "purchase", "error", "signup"],
        "weight": [1, 0, 5, -1, 3]}))
    stream = S.read_event_stream(spark, stream_dir)
    enriched = S.stream_static_enrich(stream, dim, on="event_type")
    name = f"e_{uuid.uuid4().hex[:8]}"
    q = S.run_to_memory(enriched, name, output_mode="append")
    try:
        out = spark.sql(f"SELECT count(*) n, count(weight) w FROM {name}").collect()[0]
        assert out.n > 0 and out.w == out.n  # every event matched a dim row
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, stream_dir, batch_events):
    stream = S.read_event_stream(spark, stream_dir)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = S.stream_stream_purchase_after_click(clicks, purchases)
    name = f"ss_{uuid.uuid4().hex[:8]}"
    q = S.run_to_memory(joined, name, output_mode="append")
    try:
        got = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n
        # batch equivalent of the same interval join
        c = batch_events.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        p = batch_events.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        want = p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        ).count()
        # append mode may hold back pairs near the watermark horizon;
        # everything emitted must be a true pair and most must arrive
        assert got <= want
        assert got >= int(want * 0.8), (got, want)
    finally:
        q.stop()


def test_foreach_batch_sink(spark, stream_dir, tmp_path):
    """foreachBatch: arbitrary batch sink (e.g. upsert) — counts rows
    across micro-batches."""
    totals = []
    stream = S.read_event_stream(spark, stream_dir, max_files_per_trigger=1)

    def sink(batch_df, batch_id):
        totals.append(batch_df.count())

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()
    assert len(totals) >= 4  # one per staged file
    assert sum(totals) == spark.read.schema(S.EVENTS_SCHEMA).parquet(stream_dir).count()


def test_near_dedup_candidates_stream(spark, sf_dir, tmp_path):
    """streaming MinHash-LSH near-dup candidates: pure-expression
    signatures + per-bucket state. Parity: one micro-batch makes
    first=min(doc_id) per bucket deterministic, so the emitted pairs
    must equal the batch LSH buckets' (min, other) pairs."""
    import os
    import uuid

    from dask_expr_spark.functions.dedup import lsh_band_keys, minhash_sig_expr
    from dask_expr_spark.sources.io import read_parquet

    src = str(tmp_path / "docs_stream")
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet")).to_spark()
    docs.select("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(src)

    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).parquet(src)
    out = S.near_dedup_candidates_stream(stream)
    name = f"nd_{uuid.uuid4().hex[:8]}"
    q = S.run_to_memory(out, name, output_mode="append")
    try:
        got = {(r.doc_id, r.matched_doc, r.band)
               for r in spark.sql(f"SELECT * FROM {name}").collect()}

        batch = spark.read.schema(schema).parquet(src)
        sig = minhash_sig_expr(F.col("text"), k=3, num_perm=32)
        # same shape fixes as the operator under test: spread the
        # single-file scan and pin the signature to one evaluation
        # (inlined into lsh_band_keys it would be interpreted 8x per
        # row in one task — this reference side alone cost ~40 s)
        sigd = (batch.repartition(8)
                .select("doc_id", sig.alias("__sig")))
        banded = (sigd.select("doc_id",
                              F.explode(lsh_band_keys(F.col("__sig"), 8, 4)).alias("bb"))
                  .select("doc_id", "bb.band", "bb.bkey"))
        want = set()
        rows = banded.collect()
        firsts = {}
        for r in sorted(rows, key=lambda r: r.doc_id):
            key = (r.band, r.bkey)
            if key not in firsts:
                firsts[key] = r.doc_id
            elif r.doc_id != firsts[key]:
                want.add((r.doc_id, firsts[key], r.band))
        assert got == want
        assert len(want) > 0  # the corpus does contain near-dup buckets
    finally:
        q.stop()


def test_semantic_dedup_candidates_stream_multibatch(spark, tmp_path):
    """per-cell state survives micro-batches: the cell's first vector
    comes from the FIRST file, later files' collisions match it even
    when they carry smaller ids."""
    import numpy as np
    import pandas as pd

    from dask_expr_spark.functions.similarity import _plane_weights
    from dask_expr_spark.streaming import ops as S

    dim, planes, seed = 8, 2, 3
    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((40, dim)).astype("float32")
    src = str(tmp_path / "sem_stream")
    # batch 1: ids 100..119, batch 2: ids 0..19 (smaller, arrive later)
    for fname, ids in (("b1", range(100, 120)), ("b2", range(0, 20))):
        pdf = pd.DataFrame({
            "vec_id": list(ids),
            "embedding": [vecs[i % 40].tolist() for i in ids],
        })
        from pyspark.sql import functions as SF
        (spark.createDataFrame(pdf)
         .select("vec_id", SF.col("embedding").cast("array<float>").alias("embedding"))
         .coalesce(1).write.mode(
             "append" if fname == "b2" else "overwrite").parquet(src))

    stream = (spark.readStream.schema("vec_id long, embedding array<float>")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = S.run_to_memory(
        S.semantic_dedup_candidates_stream(stream, dim=dim,
                                           num_planes=planes, seed=seed),
        "sem_stream_out", output_mode="append")
    try:
        rows = spark.sql("SELECT * FROM sem_stream_out").collect()
        got = {(r.vec_id, r.matched_vec, r.cell) for r in rows}
        # recompute cells driver-side
        W = np.asarray(_plane_weights(dim, planes, seed))
        def cell_of(i):
            bits = (vecs[i % 40].astype("float64") @ W.T) > 0
            return int((bits.astype(int) * (1 << np.arange(planes))).sum())
        cells_b1 = {}
        want = set()
        for i in range(100, 120):
            c = cell_of(i)
            if c in cells_b1:
                want.add((i, cells_b1[c], c))
            else:
                cells_b1[c] = i
        # batch-2 ids are smaller but must match batch-1 firsts
        for i in range(0, 20):
            c = cell_of(i)
            first = cells_b1.get(c)
            if first is None:
                cells_b1[c] = i
            else:
                want.add((i, first, c))
        assert got == want
        # the order-dependence we're actually asserting: some batch-2
        # candidate matched a LARGER first from batch 1
        assert any(m > v for v, m, _ in got)
    finally:
        q.stop()


def test_heavy_hitter_stream_multibatch_decrement(spark, tmp_path):
    """streaming Misra-Gries (heavy_hitter_candidates_stream): state
    must stay bounded at m counters per shard ACROSS micro-batches
    while the decrement path runs (vocab >> m), and the final summary
    must (a) contain every true heavy hitter — the superset guarantee —
    with (b) lb <= true count."""
    import uuid

    import pandas as pd

    # 3 files -> 3 micro-batches. One hot value (30%), vocab of 600
    # uniques across batches vs m=16: decrements fire every batch.
    src = str(tmp_path / "hh_stream")
    rows = []
    for b in range(3):
        rows += [("hot", b)] * 200
        rows += [(f"u{b}_{i}", b) for i in range(200)]
    pdf = pd.DataFrame(rows, columns=["k", "b"])
    for b in range(3):
        (spark.createDataFrame(pdf[pdf["b"] == b][["k"]])
         .coalesce(1).write.mode("append").parquet(src))

    stream = spark.readStream.schema("k string").option(
        "maxFilesPerTrigger", 1).parquet(src)
    m, shards = 16, 4
    out = S.heavy_hitter_candidates_stream(stream, "k", m=m, shards=shards)
    name = f"hh_{uuid.uuid4().hex[:8]}"
    q = S.run_to_memory(out, name, output_mode="update")
    try:
        emitted = spark.sql(f"SELECT * FROM {name}").toPandas()
    finally:
        q.stop()

    # state bound: every emission carries <= m candidates per shard
    per_emission = emitted.groupby(["shard", "n_seen"]).size()
    assert (per_emission <= m).all(), per_emission.max()

    # final snapshot per shard
    mx = emitted.groupby("shard")["n_seen"].transform("max")
    final = emitted[emitted["n_seen"] == mx]

    truth = pdf["k"].value_counts()
    n = int(truth.sum())
    # superset guarantee: all of "hot"'s occurrences land in one shard,
    # where its frequency (>= 30% of that shard's stream) is far above
    # the shard's n_shard/m threshold — it must survive the summary
    assert "hot" in set(final["value"])
    hot_lb = int(final.loc[final["value"] == "hot", "lb"].iloc[0])
    assert 0 < hot_lb <= int(truth["hot"])
    # every candidate's lb is a valid lower bound
    for _, r in final.iterrows():
        assert r["lb"] <= int(truth.get(r["value"], 0))


def test_hll_rollup_sink_multibatch_and_compaction(spark, tmp_path):
    """hll_rollup_sink: fragments append per micro-batch; compaction
    dedups replayed epochs and reduces the table to one row per key;
    batch hll_rollup rows compose into the same table (the
    'sketch once, slice forever' pattern end-to-end)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_expr_spark.functions.sketches import hll_estimate, hll_rollup
    from dask_expr_spark.streaming import ops as S

    src = str(tmp_path / "src")
    roll = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")
    base = pd.Timestamp("2024-01-01")
    # 3 sequential files -> 3 micro-batches at maxFilesPerTrigger=1;
    # users overlap across batches so union-merge must dedup them
    for i in range(3):
        pdf = pd.DataFrame({
            "event_id": range(i * 100, i * 100 + 100),
            "ts": [base + pd.Timedelta(hours=i)] * 100,
            "user_id": [(i * 50 + j) % 120 for j in range(100)],
            "event_type": ["click"] * 100,
            "value": [1.0] * 100,
            "session_id": ["s"] * 100,
            "url": ["u"] * 100,
            "props": ["{}"] * 100,
        })
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    stream = S.read_event_stream(spark, src, max_files_per_trigger=1) \
        .withColumn("day", F.to_date("ts"))
    q = S.hll_rollup_sink(stream, ["event_type", "day"], "user_id",
                          roll, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    frags = spark.read.parquet(roll)
    assert frags.select("__epoch").distinct().count() >= 3
    exact = spark.read.parquet(src).select("user_id").distinct().count()
    est = hll_estimate(frags.select("event_type", "day", "hll"),
                       ["event_type"]).first()["distinct_est"]
    assert abs(est - exact) <= exact * 0.075

    # replayed epoch: duplicate the epoch-0 fragment, compact, and the
    # estimate must be unchanged (dedup-by-epoch before merge)
    frags.where(F.col("__epoch") == 0).write.mode("append").parquet(roll)
    S.compact_hll_rollup(spark, roll, ["event_type", "day"])
    compacted = spark.read.parquet(roll)
    assert (compacted.groupBy("event_type", "day").count()
            .where("count > 1").count() == 0)
    est2 = hll_estimate(compacted, ["event_type"]).first()["distinct_est"]
    assert est2 == est

    # batch rollup rows compose into the same table
    more = spark.createDataFrame(
        [("click", pd.Timestamp("2024-01-02").date(), u)
         for u in range(200, 260)], "event_type string, day date, user_id long")
    hll_rollup(more, ["event_type", "day"], "user_id") \
        .write.mode("append").parquet(roll)
    S.compact_hll_rollup(spark, roll, ["event_type", "day"])
    est3 = hll_estimate(spark.read.parquet(roll),
                        ["event_type"]).first()["distinct_est"]
    exact3 = exact + 60
    assert abs(est3 - exact3) <= exact3 * 0.075


def test_hist_rollup_sink_multibatch_and_compaction(spark, tmp_path):
    """hist_rollup_sink: same LSM contract as the HLL sink — fragments
    per micro-batch, estimates correct BEFORE compaction (bin counts
    merge by addition inside quantile_estimate), replayed epochs
    deduped by compaction, batch hist_rollup rows compose in."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_expr_spark.functions.sketches import (hist_rollup,
                                                    quantile_estimate)
    from dask_expr_spark.streaming import ops as S

    src = str(tmp_path / "src")
    roll = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")
    base = pd.Timestamp("2024-01-01")
    vals = []
    for i in range(3):
        v = [float((i * 100 + j) % 500) for j in range(200)]
        vals += v
        pdf = pd.DataFrame({
            "event_id": range(i * 200, i * 200 + 200),
            "ts": [base + pd.Timedelta(hours=i)] * 200,
            "user_id": list(range(200)),
            "event_type": ["click"] * 200,
            "value": v,
            "props": ["{}"] * 200,
        })
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    stream = S.read_event_stream(spark, src, max_files_per_trigger=1) \
        .withColumn("day", F.to_date("ts"))
    q = S.hist_rollup_sink(stream, ["event_type", "day"], "value",
                           roll, bins=128, lo=0.0, hi=500.0,
                           checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    frags = spark.read.parquet(roll)
    assert frags.select("__epoch").distinct().count() >= 3
    import numpy as np
    exact = float(np.quantile(np.array(vals), 0.5, method="inverted_cdf"))
    width = 500.0 / 128
    # estimates are correct on the raw fragments (no compaction needed)
    est = quantile_estimate(
        frags.select("event_type", "day", "hist", "lo", "hi", "bins"),
        0.5).first()["q_est"]
    assert abs(est - exact) <= width + 1e-9

    # replayed epoch: duplicate a fragment, compact, estimate unchanged
    frags.where(F.col("__epoch") == 0).write.mode("append").parquet(roll)
    S.compact_hist_rollup(spark, roll, ["event_type", "day"])
    compacted = spark.read.parquet(roll)
    assert (compacted.groupBy("event_type", "day").count()
            .where("count > 1").count() == 0)
    est2 = quantile_estimate(compacted, 0.5).first()["q_est"]
    assert abs(est2 - est) < 1e-9

    # batch rollup rows compose into the same table
    more = spark.createDataFrame(
        [("click", pd.Timestamp("2024-01-02").date(), float(j % 500))
         for j in range(300)], "event_type string, day date, value double")
    hist_rollup(more, ["event_type", "day"], "value",
                bins=128, lo=0.0, hi=500.0) \
        .write.mode("append").parquet(roll)
    S.compact_hist_rollup(spark, roll, ["event_type", "day"])
    allv = vals + [float(j % 500) for j in range(300)]
    exact3 = float(np.quantile(np.array(allv), 0.5, method="inverted_cdf"))
    est3 = quantile_estimate(spark.read.parquet(roll), 0.5).first()["q_est"]
    assert abs(est3 - exact3) <= width + 1e-9


def test_exact_dedup_sink_cross_batch_and_replay(spark, tmp_path):
    """exact_dedup_sink: text first seen in batch 1 is suppressed in
    later batches; the kept table is exactly min-id-per-hash under
    in-order replay; a replayed index fragment doesn't change the
    outcome after compaction."""
    import os
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from dask_expr_spark.streaming import ops as S

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    kept = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    batches = [
        pd.DataFrame({"doc_id": [1, 2, 3],
                      "text": ["alpha", "beta", "alpha"]}),
        pd.DataFrame({"doc_id": [4, 5],
                      "text": ["alpha", "gamma"]}),
        pd.DataFrame({"doc_id": [6, 7],
                      "text": ["gamma", "delta"]}),
    ]
    base_t = time.time() - 60
    stamped: set = set()
    for i, pdf in enumerate(batches):
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in stamped:
                os.utime(os.path.join(src, f),
                         (base_t + i * 10, base_t + i * 10))
                stamped.add(f)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = S.exact_dedup_sink(stream, "doc_id", "text", idx,
                           kept_path=kept, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    kept_ids = sorted(r["doc_id"]
                      for r in spark.read.parquet(kept).collect())
    assert kept_ids == [1, 2, 5, 7]  # min id per text, in-order arrival
    # replay: duplicate the epoch-0 index fragment, compact, and the
    # index still maps each hash to its original keeper
    frags = spark.read.parquet(idx)
    frags.where(F.col("__epoch") == 0).write.mode("append").parquet(idx)
    S.compact_exact_index(spark, idx)
    comp = spark.read.parquet(idx)
    assert comp.count() == 4  # alpha beta gamma delta
    assert comp.groupBy("text_hash").count().where("count > 1").count() == 0
    keeps = sorted(r["keep_id"] for r in comp.collect())
    assert keeps == [1, 2, 5, 7]


def test_psi_drift_batch_boundary_invariance(spark, tmp_path):
    """the streaming drift monitor's determinism claim: PSI between a
    reference rollup and the sink table must be IDENTICAL whether the
    live side arrived as one batch or many, and before or after
    compaction — bin counts merge by addition, so batch boundaries
    cannot leak into the score."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_expr_spark.functions.sketches import hist_rollup, psi_drift
    from dask_expr_spark.streaming import ops as S

    src = str(tmp_path / "src")
    roll = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(3):
        pdf = pd.DataFrame({
            "event_id": range(i * 150, i * 150 + 150),
            "ts": [base + pd.Timedelta(hours=i)] * 150,
            "user_id": list(range(150)),
            "event_type": ["click" if j % 2 else "view"
                           for j in range(150)],
            "value": [float((i * 37 + j * 7) % 400) for j in range(150)],
            "props": ["{}"] * 150,
        })
        rows.append(pdf)
        spark.createDataFrame(pdf).coalesce(1).write.mode("append") \
            .parquet(src)
    live_all = spark.createDataFrame(pd.concat(rows, ignore_index=True))
    ref = hist_rollup(
        live_all.withColumn("value", 400.0 - F.col("value")),
        ["event_type"], "value", bins=32, lo=0.0, hi=400.0)

    stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
    q = S.hist_rollup_sink(stream, ["event_type"], "value", roll,
                           bins=32, lo=0.0, hi=400.0,
                           checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    frags = spark.read.parquet(roll)
    assert frags.select("__epoch").distinct().count() >= 3

    def score(live):
        return {r["event_type"]: r["psi"]
                for r in psi_drift(ref, live, ["event_type"]).collect()}

    multi = score(frags.select("event_type", "hist", "lo", "hi", "bins"))
    single = score(hist_rollup(live_all, ["event_type"], "value",
                               bins=32, lo=0.0, hi=400.0))
    assert set(multi) == {"click", "view"}
    for k in multi:
        assert abs(multi[k] - single[k]) < 1e-12
    S.compact_hist_rollup(spark, roll, ["event_type"])
    compacted = score(spark.read.parquet(roll))
    for k in multi:
        assert abs(multi[k] - compacted[k]) < 1e-12


def _stage_event_files(spark, src, n_files=3, rows_per=200, seed=0):
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    frames = []
    for i in range(n_files):
        pdf = pd.DataFrame({
            "event_id": range(i * rows_per, (i + 1) * rows_per),
            "ts": [base + pd.Timedelta(hours=i)] * rows_per,
            "user_id": [(seed + i * 31 + j * 7) % 97 for j in range(rows_per)],
            "event_type": ["click" if j % 3 else "view"
                           for j in range(rows_per)],
            "value": [float(j % 251) for j in range(rows_per)],
            "props": ["{}"] * rows_per,
        })
        frames.append(pdf)
        spark.createDataFrame(pdf).coalesce(1).write.mode("append") \
            .parquet(src)
    import pandas as pd2  # noqa: F401
    return frames


def test_cms_rollup_sink_multibatch_exact_merge(spark, tmp_path):
    """cms_rollup_sink: fragments per micro-batch; because count-min
    cells merge by ADDITION and buckets are md5-deterministic, the
    compacted streaming sketch must be CELL-IDENTICAL to a one-shot
    batch build over the same rows — and replayed epochs dedup."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_expr_spark.functions.sketches import cms_rollup
    from dask_expr_spark.streaming import ops as S

    src, roll, ckpt = (str(tmp_path / d) for d in ("src", "roll", "ckpt"))
    frames = _stage_event_files(spark, src)
    stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
    q = S.cms_rollup_sink(stream, ["event_type"], "user_id", roll,
                          width=64, depth=3, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    frags = spark.read.parquet(roll)
    assert frags.select("__epoch").distinct().count() == 3
    # replayed epoch appended again → compaction dedups it
    frags.where(F.col("__epoch") == 1).write.mode("append").parquet(roll)
    S.compact_cms_rollup(spark, roll, ["event_type"])
    compacted = spark.read.parquet(roll)
    assert compacted.count() == 2  # click, view

    all_rows = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    direct = cms_rollup(all_rows, ["event_type"], "user_id",
                        width=64, depth=3)
    got = {r["event_type"]: (dict(r["cms"]), r["n"])
           for r in compacted.collect()}
    want = {r["event_type"]: (dict(r["cms"]), r["n"])
            for r in direct.collect()}
    assert got == want


def test_kmv_rollup_sink_multibatch_exact_merge(spark, tmp_path):
    """kmv_rollup_sink: the compacted streaming sketch must equal the
    one-shot batch build array-for-array (k smallest md5 hashes are
    order-independent), and the compacted table must still support
    kmv_intersect across key groups."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_expr_spark.functions.sketches import kmv_intersect, kmv_rollup
    from dask_expr_spark.streaming import ops as S

    src, roll, ckpt = (str(tmp_path / d) for d in ("src", "roll", "ckpt"))
    frames = _stage_event_files(spark, src, seed=5)
    stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
    q = S.kmv_rollup_sink(stream, ["event_type"], "user_id", roll,
                          k=32, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    frags = spark.read.parquet(roll)
    frags.where(F.col("__epoch") == 0).write.mode("append").parquet(roll)
    S.compact_kmv_rollup(spark, roll, ["event_type"])
    compacted = spark.read.parquet(roll)
    assert compacted.count() == 2

    all_rows = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    direct = kmv_rollup(all_rows, ["event_type"], "user_id", k=32)
    got = {r["event_type"]: sorted(r["kmv"]) for r in compacted.collect()}
    want = {r["event_type"]: sorted(r["kmv"]) for r in direct.collect()}
    assert got == want

    # intersection straight off the compacted streaming table
    inter = kmv_intersect(
        compacted.where(F.col("event_type") == "click"),
        compacted.where(F.col("event_type") == "view")).collect()[0]
    exact = (all_rows.where(F.col("event_type") == "click")
             .select("user_id").intersect(
                 all_rows.where(F.col("event_type") == "view")
                 .select("user_id")).count())
    assert abs(inter["inter_est"] - exact) <= max(0.5 * exact, 10)


def test_upsert_sink_restart_from_checkpoint_replays_epoch(spark,
                                                           tmp_path,
                                                           monkeypatch):
    """exactly-once under a REAL restart: the sink crashes after fully
    applying an epoch but before the checkpoint commits; restarting
    the query from the same checkpoint re-delivers that epoch, and the
    final snapshot must equal the clean single-delivery state — for
    both the partitioned and the bucketed layout."""
    import pandas as pd
    from pyspark.sql.utils import StreamingQueryException

    from dask_expr_spark.functions import maintenance as M

    def run_layout(tag, sink_kwargs, read_back):
        src = str(tmp_path / f"src_{tag}")
        table = str(tmp_path / f"tbl_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        for i in range(3):
            pdf = pd.DataFrame({
                "k": list(range(i * 10, i * 10 + 10)) + [0],
                "v": [float(i)] * 11,
                "part": ["even" if x % 2 == 0 else "odd"
                         for x in list(range(i * 10, i * 10 + 10)) + [0]],
                "ver": [i] * 11,
            })
            (spark.createDataFrame(pdf).coalesce(1)
             .write.mode("append").parquet(src))
        schema = spark.read.parquet(src).schema

        # crash AFTER the first post-bootstrap epoch is fully applied
        # (upsert done, checkpoint offset not yet committed)
        state = {"applied": 0}
        real_part = M.upsert_partitioned
        real_buck = M.upsert_bucketed

        def crash_after_part(*a, **kw):
            out = real_part(*a, **kw)
            state["applied"] += 1
            if state["applied"] == 1:
                raise RuntimeError("injected post-apply crash")
            return out

        def crash_after_buck(*a, **kw):
            out = real_buck(*a, **kw)
            state["applied"] += 1
            if state["applied"] == 1:
                raise RuntimeError("injected post-apply crash")
            return out

        monkeypatch.setattr(M, "upsert_partitioned", crash_after_part)
        monkeypatch.setattr(M, "upsert_bucketed", crash_after_buck)

        def start():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
            return S.upsert_sink(stream, table, ["k"], order_col="ver",
                                 checkpoint_dir=ckpt, **sink_kwargs)

        q = start()
        with pytest.raises(StreamingQueryException):
            q.processAllAvailable()
        q.stop()
        assert state["applied"] == 1          # epoch applied, not committed

        monkeypatch.setattr(M, "upsert_partitioned", real_part)
        monkeypatch.setattr(M, "upsert_bucketed", real_buck)
        q = start()                           # same checkpoint -> replay
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        snap = {r["k"]: (r["v"], r["ver"]) for r in read_back().collect()}
        assert len(snap) == 30                # each key exactly once
        assert snap[0] == (2.0, 2)            # re-upserted key: last wins
        assert snap[5] == (0.0, 0) and snap[25] == (2.0, 2)

    run_layout("part", {"partition_col": "part"},
               lambda: spark.read.parquet(str(tmp_path / "tbl_part")))
    run_layout("buck", {"n_buckets": 8},
               lambda: M.read_bucketed(spark, str(tmp_path / "tbl_buck")))


def test_upsert_sink_check_moves_surfaces_partition_move(spark,
                                                         tmp_path):
    """the partitioned CDC-apply sink now guards partition moves by
    default (round-6 ADVICE: it silently duplicated the key): a batch
    that moves a key between partitions fails the query instead of
    corrupting the snapshot."""
    import pandas as pd
    from pyspark.sql.utils import StreamingQueryException

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    base = pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0],
                         "part": ["a", "a", "b"]})
    mover = pd.DataFrame({"k": [1], "v": [9.0], "part": ["b"]})
    spark.createDataFrame(base).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(mover).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = S.upsert_sink(stream, table, ["k"], partition_col="part",
                      checkpoint_dir=str(tmp_path / "ckpt"))
    with pytest.raises(StreamingQueryException, match="partition-moving"):
        q.processAllAvailable()
    q.stop()
    # the snapshot was not corrupted: k=1 still lives in part a only
    snap = {r["k"]: r["part"] for r in spark.read.parquet(table).collect()}
    assert snap[1] == "a" and len(snap) == 3


def _scd2_src(spark, src, n_batches=3, n_keys=10):
    import pandas as pd
    for i in range(n_batches):
        pdf = pd.DataFrame({
            "k": list(range(n_keys)),
            "v": [float(i) if kk == 0 else (1.0 if kk == 5
                                            else float(kk))
                  for kk in range(n_keys)],
            "eff": [i * 10] * n_keys,
        })
        (spark.createDataFrame(pdf).coalesce(1)
         .write.mode("append").parquet(src))
    return spark.read.parquet(src).schema


def _scd2_rows(spark, table):
    return sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in S.read_scd2(spark, table).collect())


def test_scd2_sink_history_and_pruning(spark, tmp_path):
    """the history sink: only the changing key grows versions, no-op
    re-deliveries collapse, and a batch touching ONE key rewrites ONLY
    that key's current bucket (untouched bucket files byte-identical —
    the per-batch cost contract)."""
    import glob

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    schema = _scd2_src(spark, src)

    def start():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return S.scd2_sink(stream, table, ["k"], "eff", n_buckets=8,
                           checkpoint_dir=ckpt)

    q = start()
    q.processAllAvailable()
    q.stop()
    rows = _scd2_rows(spark, table)
    assert len(rows) == 12                    # 10 keys + 2 closed of k=0
    k0 = [r for r in rows if r[0] == 0]
    assert k0 == [(0, 0.0, 0, 10, False), (0, 1.0, 10, 20, False),
                  (0, 2.0, 20, None, True)]
    assert all(r[4] and r[3] is None for r in rows if r[0] != 0)

    # single-key batch: untouched buckets byte-identical
    import pandas as pd
    before = {f: os.path.getsize(f) for f in
              glob.glob(f"{table}/current/__bucket=*/*.parquet")}
    pd3 = pd.DataFrame({"k": [3], "v": [99.0], "eff": [30]})
    spark.createDataFrame(pd3).coalesce(1).write.mode("append") \
        .parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()
    from dask_expr_spark.functions.maintenance import bucket_expr
    b3 = spark.createDataFrame(pd3).select(
        bucket_expr(["k"], 8).alias("b")).collect()[0]["b"]
    after = {f: os.path.getsize(f) for f in
             glob.glob(f"{table}/current/__bucket=*/*.parquet")}
    tok = f"__bucket={b3}/"
    for f, sz in before.items():
        if tok not in f:
            assert after.get(f) == sz, f"untouched bucket changed: {f}"
    rows = _scd2_rows(spark, table)
    assert (3, 99.0, 30, None, True) in rows
    assert (3, 3.0, 0, 30, False) in rows


def test_scd2_sink_restart_from_checkpoint_replays_epoch(spark,
                                                         tmp_path,
                                                         monkeypatch):
    """exactly-once under a REAL restart: crash AFTER the closed
    fragments appended but BEFORE the current buckets swap — the worst
    interleaving — then restart from the checkpoint; the final history
    must equal the clean single-delivery run's."""
    from pyspark.sql.utils import StreamingQueryException

    from dask_expr_spark.functions import maintenance as M

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    schema = _scd2_src(spark, src)

    clean_src = str(tmp_path / "src2")
    _scd2_src(spark, clean_src)
    clean_tbl = str(tmp_path / "tbl2")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(clean_src))
    q = S.scd2_sink(stream, clean_tbl, ["k"], "eff", n_buckets=8,
                    checkpoint_dir=str(tmp_path / "ckpt2"))
    q.processAllAvailable()
    q.stop()
    want = _scd2_rows(spark, clean_tbl)

    real = M.overwrite_partitions
    state = {"n": 0}

    def crash_after_closed_append(*a, **kw):
        state["n"] += 1
        if state["n"] == 2:       # epoch 1: closed already appended
            raise RuntimeError("injected crash before current swap")
        return real(*a, **kw)

    monkeypatch.setattr(M, "overwrite_partitions",
                        crash_after_closed_append)

    def start():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return S.scd2_sink(stream, table, ["k"], "eff", n_buckets=8,
                           checkpoint_dir=ckpt)

    q = start()
    with pytest.raises(StreamingQueryException):
        q.processAllAvailable()
    q.stop()
    monkeypatch.setattr(M, "overwrite_partitions", real)
    q = start()                    # replay epoch 1 from checkpoint
    q.processAllAvailable()
    q.stop()
    assert _scd2_rows(spark, table) == want
    # compaction folds the replay's duplicate closed fragments away
    S.compact_scd2_closed(spark, table)
    assert _scd2_rows(spark, table) == want


def test_scd2_bootstrap_then_sink(spark, tmp_path):
    """the window-free bootstrap (streaming.scd2_bootstrap) seeds the
    table from a snapshot, then the sink continues incrementally —
    final history equals the sink-only run's.  The sink is started
    with a DIFFERENT n_buckets than the bootstrap to prove the
    on-disk bucket spec wins (buckets must hash consistently)."""
    import pandas as pd

    # reference: all three batches through the sink
    src_a = str(tmp_path / "src_a")
    tbl_a = str(tmp_path / "tbl_a")
    schema = _scd2_src(spark, src_a)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_a))
    q = S.scd2_sink(stream, tbl_a, ["k"], "eff", n_buckets=8,
                    checkpoint_dir=str(tmp_path / "ck_a"))
    q.processAllAvailable()
    q.stop()

    # bootstrap from batch 0's snapshot, then stream batches 1..2
    tbl_b = str(tmp_path / "tbl_b")
    snap0 = pd.DataFrame({
        "k": list(range(10)),
        "v": [0.0 if kk == 0 else (1.0 if kk == 5 else float(kk))
              for kk in range(10)],
        "eff": [0] * 10})
    S.scd2_bootstrap(spark, tbl_b, spark.createDataFrame(snap0),
                     ["k"], "eff", n_buckets=8)
    src_b = str(tmp_path / "src_b")
    for i in (1, 2):
        pdf = pd.DataFrame({
            "k": list(range(10)),
            "v": [float(i) if kk == 0 else (1.0 if kk == 5
                                            else float(kk))
                  for kk in range(10)],
            "eff": [i * 10] * 10})
        (spark.createDataFrame(pdf).coalesce(1)
         .write.mode("append").parquet(src_b))
    stream_b = (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src_b))
    q = S.scd2_sink(stream_b, tbl_b, ["k"], "eff", n_buckets=99,
                    checkpoint_dir=str(tmp_path / "ck_b"))
    q.processAllAvailable()
    q.stop()
    assert _scd2_rows(spark, tbl_a) == _scd2_rows(spark, tbl_b)


def test_scd2_bootstrap_duplicate_keys_guard(spark, tmp_path):
    import pandas as pd
    import pytest

    snap = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 1, 2], "v": [1.0, 2.0, 3.0], "eff": [0, 1, 0]}))
    with pytest.raises(ValueError, match="duplicate keys"):
        S.scd2_bootstrap(spark, str(tmp_path / "t"), snap, ["k"],
                         "eff")


def test_scd2_sink_pointer_commit(spark, tmp_path):
    """the SCD-2 history sink with pointer commits on its current
    table: multi-batch history equals the rename-protocol run's, the
    current table carries a _commit.json whose generation advanced,
    and read_scd2 resolves it through the manifest."""
    from dask_expr_spark.functions.maintenance import read_commit

    src_a = str(tmp_path / "sa")
    src_b = str(tmp_path / "sb")
    schema = _scd2_src(spark, src_a)
    _scd2_src(spark, src_b)
    tables = {}
    for src, name, commit in ((src_a, "ta", "rename"),
                              (src_b, "tb", "pointer")):
        tbl_ = str(tmp_path / name)
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = S.scd2_sink(stream, tbl_, ["k"], "eff", n_buckets=8,
                        checkpoint_dir=str(tmp_path / f"ck_{name}"),
                        commit=commit)
        q.processAllAvailable()
        q.stop()
        tables[commit] = tbl_
    assert (_scd2_rows(spark, tables["rename"])
            == _scd2_rows(spark, tables["pointer"]))
    man = read_commit(os.path.join(tables["pointer"], "current"))
    assert man is not None and man["generation"] >= 1
