"""Scale-mechanics tests: bucketed co-located joins (no exchange) and
skew salting (same results as plain ops, spread keys)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from dask_expr_spark.operators.skew import salted_agg, salted_merge
from dask_expr_spark.sources.io import read_parquet

from .test_plans import n_nodes, plan_of


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """the reference's fully-indexed merge (divisions-aligned,
    _merge.py:379) maps to bucketed tables on Spark: both sides
    bucketed by the join key join WITHOUT any Exchange."""
    suffix = uuid.uuid4().hex[:8]
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet").to_spark()
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet").to_spark()
    tl, to = f"li_b_{suffix}", f"or_b_{suffix}"
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable(tl))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable(to))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast so the plan exercises the bucketed
        # sort-merge path (at real scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a, b = spark.table(tl), spark.table(to)
        joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy("o_orderstatus").count()
        p = plan_of(joined)
        # the join itself must be exchange-free; only the final
        # aggregation may shuffle
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert n_nodes(p, "Exchange") <= 1, p
        # results match the unbucketed join
        plain = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus").count()
        )
        got = {r.o_orderstatus: r["count"] for r in joined.collect()}
        want = {r.o_orderstatus: r["count"] for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {tl}")
        spark.sql(f"DROP TABLE IF EXISTS {to}")


def test_salted_merge_matches_plain(spark, sf_dir):
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    part = read_parquet(spark, f"{sf_dir}/part.parquet")
    right = part.to_spark().withColumnRenamed("p_partkey", "l_partkey")
    plain = (
        li.to_spark().join(right, "l_partkey")
        .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_merge(li, right, on="l_partkey", salts=4, salt_from="l_orderkey")
        .to_spark()
        .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r.p_brand: r.n for r in salted.collect()}
    want = {r.p_brand: r.n for r in plain.collect()}
    assert got == want


def test_salted_agg_matches_plain(spark, sf_dir):
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    got_df = salted_agg(
        li, "l_returnflag",
        {"total": ("l_quantity", "sum"), "n": ("l_orderkey", "count"),
         "mx": ("l_quantity", "max")},
        salts=8,
    ).compute()
    got = got_df.set_index("l_returnflag").to_dict("index")
    want_df = (
        li.to_spark().groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"),
             F.count("l_orderkey").alias("n"),
             F.max("l_quantity").alias("mx"))
    ).toPandas().set_index("l_returnflag").to_dict("index")
    for k in want_df:
        assert got[k]["n"] == want_df[k]["n"]
        assert got[k]["mx"] == want_df[k]["mx"]
        assert got[k]["total"] == pytest.approx(want_df[k]["total"])


def test_salted_agg_mean(spark, sf_dir):
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    got = salted_agg(li, "l_returnflag", {"m": ("l_quantity", "mean")}, salts=8).compute()
    want = (
        li.to_spark().groupBy("l_returnflag").agg(F.avg("l_quantity").alias("m"))
    ).toPandas()
    g = got.set_index("l_returnflag")["m"].to_dict()
    w = want.set_index("l_returnflag")["m"].to_dict()
    for k in w:
        assert g[k] == pytest.approx(w[k])


def test_partitioned_write_pruning(spark, sf_dir, tmp_path):
    """hive-style partitioned write + partition pruning: a filter on
    the partition column must prune at the scan (the reference's
    partition-pruning analogue, PartitionsFiltered _expr.py:2942)."""
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    out = str(tmp_path / "ev_part")
    (ev.assign(day=lambda d: d["ts"].dt.date)
       .to_spark().write.partitionBy("day").mode("overwrite").parquet(out))
    back = spark.read.parquet(out)
    q = back.filter(F.col("day") == "2024-01-05").groupBy("event_type").count()
    p = plan_of(q)
    assert "PartitionFilters" in p and "2024-01-05" in p, p
    # correctness: matches filtering the unpartitioned table
    want = (
        ev.to_spark().filter(F.to_date("ts") == "2024-01-05")
        .groupBy("event_type").count()
    )
    got = {r.event_type: r["count"] for r in q.collect()}
    exp = {r.event_type: r["count"] for r in want.collect()}
    assert got == exp


def test_hash_split_disjoint_reproducible(spark, sf_dir):
    """hash_split: train ∪ val = all, train ∩ val = ∅, and the same id
    lands on the same side regardless of partitioning."""
    import os
    from pyspark.sql import functions as F
    from dask_expr_spark.functions.sampling import hash_split

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t1, v1 = hash_split(docs, "doc_id", 0.2)
    n, nt, nv = docs.count(), t1.count(), v1.count()
    assert nt + nv == n
    assert t1.join(v1, "doc_id", "inner").count() == 0
    # repartitioned input → identical membership
    t2, _ = hash_split(docs.repartition(7), "doc_id", 0.2)
    assert t1.select("doc_id").exceptAll(t2.select("doc_id")).count() == 0
    # fraction lands near target (hex-prefix granularity 1/65536)
    assert abs(nv / n - 0.2) < 0.05


def test_global_shuffle_is_permutation(spark, sf_dir):
    """global_shuffle: ranks are exactly 1..n with no gaps or dups,
    and the distributed offset-rank is stable across partitionings."""
    import os
    from pyspark.sql import functions as F
    from dask_expr_spark.functions.sampling import global_shuffle

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    sh = global_shuffle(orders, "o_orderkey")
    n = orders.count()
    stats = sh.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("shuffle_rank").alias("d"),
        F.min("shuffle_rank").alias("lo"),
        F.max("shuffle_rank").alias("hi"),
    ).collect()[0]
    assert (stats["n"], stats["d"], stats["lo"], stats["hi"]) == (n, n, 1, n)
    sh2 = global_shuffle(orders.repartition(5), "o_orderkey")
    mismatch = (
        sh.select("o_orderkey", "shuffle_rank")
        .join(sh2.select("o_orderkey", F.col("shuffle_rank").alias("r2")), "o_orderkey")
        .filter(F.col("shuffle_rank") != F.col("r2"))
        .count()
    )
    assert mismatch == 0


def test_to_table_from_table_bucketed(spark):
    """the to_table/from_table facade preserves the bucket spec: a join
    of co-bucketed tables is an exchange-free sort-merge join."""
    import pandas as pd

    from dask_expr_spark.sources.io import from_pandas, from_table

    pdf = pd.DataFrame({"k": list(range(100)) * 2, "v": range(200)})
    d = from_pandas(spark, pdf)
    d.to_table("fct_bt_a", bucket_by="k", sort_by="k")
    d.to_table("fct_bt_b", bucket_by="k", sort_by="k")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = from_table(spark, "fct_bt_a").to_spark().join(
            from_table(spark, "fct_bt_b").to_spark(), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 400
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS fct_bt_a")
        spark.sql("DROP TABLE IF EXISTS fct_bt_b")


def test_lsh_hot_band_aqe_skew_split(spark):
    """skew resilience of the LSH candidate join (round-5 VERDICT item
    5): a corpus where most vectors share one signature concentrates
    the (table, bucket) equi-join on one hot key.  With AQE skew-join
    enabled (our default session config) and sort-merge forced, the
    hot partition must be SPLIT at runtime — assert the skew marker in
    the final adaptive plan — and the result must still be correct.
    At real scale the alternative routing is operators/skew.py
    salted_merge, differential-tested above."""
    import numpy as np
    from pyspark.sql import functions as F2

    from dask_expr_spark.functions import similarity as SIM

    n, dim = 6000, 8
    rng = np.random.default_rng(13)
    hot = [float(x) for x in rng.normal(size=dim)]
    rows = []
    for i in range(n):
        if i % 20 == 0:  # 5% distinct tail
            rows.append((i, [float(x) for x in rng.normal(size=dim)]))
        else:            # 95% identical direction -> one hot bucket
            rows.append((i, hot))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F2.col("vec_id") % 60 == 1)  # hot-bucket queries

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        out = SIM.lsh_bucketed_topk(emb, queries, dim=dim, k=3,
                                    num_tables=2, planes_per_table=3)
        got = out.collect()
        # correctness: every hot query found hot near-dup neighbors
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append(r)
        hot_qs = [i for i in range(n) if i % 60 == 1 and i % 20 != 0]
        assert all(len(by_q.get(qid, [])) == 3 for qid in hot_qs)
        assert all(r.cos > 0.999 for qid in hot_qs for r in by_q[qid])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_reduces_shuffle_join(spark, sf_dir):
    """Spark's runtime bloom-filter join reduction must be AVAILABLE to
    our plans: when a shuffle join's build side carries a selective
    filter, Catalyst injects a might_contain() pre-filter on the probe
    side, cutting the probe shuffle before it happens.  The default
    thresholds (10 MB creation / 10 GB probe scan) mean it fires only
    at real scale — this test lowers the probe threshold to prove the
    injection works with our session config, so at 100 TB the engine
    gets semi-join reduction for free (no hand-built bloom plumbing)."""
    from pyspark.sql import functions as F2

    saved = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold":
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter."
                           "applicationSideScanSizeThreshold"),
    }
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    # force a shuffle join (the 100 TB shape; broadcast would bypass
    # the runtime filter) and let the tiny test scan qualify
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter."
                   "applicationSideScanSizeThreshold", "1KB")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .filter(F2.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan
        # and the filtered plan still computes the right answer
        got = {r["o_orderpriority"]: r["count"] for r in j.collect()}
        want = (
            li.join(F2.broadcast(o), li.l_orderkey == o.o_orderkey,
                    "left_semi").count())
        assert sum(got.values()) == want
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_weighted_sample_biases_toward_weight(spark):
    """sample_n_weighted: statistical sanity — with weights 100:1, the
    heavy stratum must dominate the sample far beyond its row share
    (exact distribution is locked cross-engine by the oracle query;
    this pins the SEMANTICS of the key formula)."""
    from pyspark.sql import functions as F2

    from dask_expr_spark.functions.sampling import sample_n_weighted

    rows = [(i, 100.0 if i % 10 == 0 else 1.0) for i in range(10_000)]
    df = spark.createDataFrame(rows, "id long, w double").repartition(8)
    samp = sample_n_weighted(df, 500, "id", "w")
    heavy = samp.where(F2.col("w") == 100.0).count()
    # heavy stratum: 10% of rows, ~92% of total weight; binomial-ish
    # bounds are loose on purpose (the draw is deterministic anyway)
    assert heavy > 350, heavy
    assert samp.count() == 500
    # zero/negative/null weights excluded
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, None), (4, 5.0)], "id long, w double")
    got = sample_n_weighted(df2, 10, "id", "w").collect()
    assert [r["id"] for r in got] == [4]
