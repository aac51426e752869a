"""heavy_hitters (functions/sketches.py): the two-pass Misra-Gries plan
must return EXACTLY the plain groupBy/HAVING answer on adversarial
distributions — skew, near-threshold counts, many partitions (the
pigeonhole superset argument is per-partition), multi-batch summaries,
and non-string key types."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_expr_spark.functions.sketches import heavy_hitters


def _exact(sdf, col, phi):
    n = sdf.where(F.col(col).isNotNull()).count()
    rows = (
        sdf.groupBy(col).agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col(col).isNotNull())
        .collect()
    )
    return sorted((r[col], r["freq"]) for r in rows if r["freq"] > phi * n)


def _run(sdf, col, phi, **kw):
    got = sorted(
        (r["value"], r["freq"])
        for r in heavy_hitters(sdf, col, phi, **kw).collect()
    )
    assert got == _exact(sdf, col, phi)
    return got


def test_skewed_zipf(spark):
    # zipf-ish: value k appears ~N/k times — heavy head, long tail
    rows = [(f"v{k}",) for k in range(1, 200) for _ in range(2000 // k)]
    sdf = spark.createDataFrame(rows, "tok string").repartition(16)
    got = _run(sdf, "tok", 0.02)
    assert ("v1", 2000) in got and len(got) > 3


def test_value_spread_across_partitions(spark):
    # one value diluted so NO partition holds it above the local
    # threshold alone except by pigeonhole — the superset guarantee's
    # worst case. 32 partitions, hot value = 12% of every partition.
    hot = [("hot", i) for i in range(1200)]
    noise = [(f"n{i}", i) for i in range(8800)]
    sdf = (
        spark.createDataFrame(hot + noise, "tok string, i int")
        .repartition(32, "i")
        .drop("i")
    )
    got = _run(sdf, "tok", 0.1)
    assert got == [("hot", 1200)]


def test_near_threshold_exactness(spark):
    # freq == phi*n exactly must be EXCLUDED (strict >), one more row
    # included — the exact pass-2 filter decides, not the sketch.
    # 100 a's + 900 others => n=1000; phi=0.1 => a (freq 100) is OUT.
    rows = [("a",)] * 100 + [(f"x{i}",) for i in range(900)]
    sdf = spark.createDataFrame(rows, "tok string").repartition(8)
    assert _run(sdf, "tok", 0.1) == []
    # 101 a's => IN
    rows = [("a",)] * 101 + [(f"x{i}",) for i in range(899)]
    sdf = spark.createDataFrame(rows, "tok string").repartition(8)
    assert _run(sdf, "tok", 0.1) == [("a", 101)]


def test_nulls_ignored(spark):
    rows = [("a",)] * 50 + [(None,)] * 500 + [(f"x{i}",) for i in range(50)]
    sdf = spark.createDataFrame(rows, "tok string").repartition(4)
    # n counts non-nulls (100), so a=50 clears phi=0.3
    assert _run(sdf, "tok", 0.3) == [("a", 50)]


def test_integer_keys_and_candidate_override(spark):
    rows = [(k % 7,) for k in range(7000)]
    sdf = spark.createDataFrame(rows, "k long").repartition(8)
    got = _run(sdf, "k", 0.05, candidates_per_partition=64)
    assert got == [(i, 1000) for i in range(7)]


def test_multibatch_summary(spark):
    # force several Arrow batches through one partition so the
    # cross-batch counter merge path runs
    pdf = pd.DataFrame({"tok": ["hh" if i % 9 == 0 else f"t{i}" for i in range(200_000)]})
    sdf = spark.createDataFrame(pdf).coalesce(2)
    got = _run(sdf, "tok", 0.05)
    assert got and got[0][0] == "hh"


def test_phi_validation(spark):
    sdf = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError):
        heavy_hitters(sdf, "tok", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(sdf, "tok", 1.0)


def test_hll_rollup_merges_overlapping_slices(spark):
    """hll_rollup/hll_estimate: sketch union must deduplicate values
    shared across slices (the whole point of mergeable sketches —
    summing per-slice exact distincts would overcount)."""
    from pyspark.sql import functions as F

    from dask_expr_spark.functions.sketches import hll_estimate, hll_rollup

    # 3 days, each day sees users [d*50, d*50 + 500): heavy overlap;
    # true distinct over all days = 600, naive per-day sum = 1500
    rows = [(d, u) for d in range(3) for u in range(d * 50, d * 50 + 500)]
    df = spark.createDataFrame(rows, "day int, user long").repartition(8)
    roll = hll_rollup(df, ["day"], "user", lg_k=12)
    assert roll.count() == 3
    got = hll_estimate(roll).collect()[0]["distinct_est"]
    exact = df.select("user").distinct().count()
    assert exact == 600
    assert abs(got - exact) <= exact * 0.075, got
    # grouped estimate path: per-day estimates ≈ 500 each
    per_day = {r["day"]: r["distinct_est"]
               for r in hll_estimate(roll, ["day"]).collect()}
    assert all(abs(v - 500) <= 500 * 0.075 for v in per_day.values())


def test_heavy_hitters_on_column_named_val(spark):
    """source columns named like the sketch's internals must not alias
    into the candidate join (regression guard for the reserved-name
    rename)."""
    rows = [("a",)] * 60 + [(f"x{i}",) for i in range(40)]
    sdf = spark.createDataFrame(rows, "val string").repartition(4)
    got = sorted((r["value"], r["freq"])
                 for r in heavy_hitters(sdf, "val", 0.3).collect())
    assert got == [("a", 60)]


def test_hist_rollup_quantiles_merge(spark):
    """hist_rollup/quantile_estimate: quantiles over a slice UNION from
    merged bin counts must land within one bin width of the exact
    quantile — including when slices overlap in value range."""
    from pyspark.sql import functions as F

    from dask_expr_spark.functions.sketches import hist_rollup, quantile_estimate

    rows = [(d, float(d * 100 + i)) for d in range(4) for i in range(1000)]
    df = spark.createDataFrame(rows, "day int, v double").repartition(8)
    roll = hist_rollup(df, ["day"], "v", bins=128)
    assert roll.count() == 4
    width = (df.agg(F.max("v") - F.min("v")).first()[0]) / 128

    for q in (0.1, 0.5, 0.9):
        est = quantile_estimate(roll, q).first()["q_est"]
        exact = df.selectExpr(f"percentile(v, {q}) p").first()["p"]
        assert abs(est - exact) <= width + 1e-9, (q, est, exact)

    # grouped estimate: per-day medians
    per_day = {r["day"]: r["q_est"]
               for r in quantile_estimate(roll, 0.5, ["day"]).collect()}
    for d in range(4):
        exact = d * 100 + 499.5
        assert abs(per_day[d] - exact) <= width + 1e-9


def test_sketch_rollups_survive_parquet(spark, tmp_path):
    """the rollup contract is 'materialize ONCE, estimate forever' —
    the HLL binary sketches and histogram maps must round-trip through
    parquet and keep producing the same estimates."""
    from dask_expr_spark.functions.sketches import (
        hist_rollup, hll_estimate, hll_rollup, quantile_estimate)

    rows = [(d, u, float(u % 997)) for d in range(3) for u in range(2000)]
    df = spark.createDataFrame(rows, "day int, user long, v double")

    hp = str(tmp_path / "hll")
    hll_rollup(df, ["day"], "user").write.parquet(hp)
    est_mem = hll_estimate(hll_rollup(df, ["day"], "user")).first()["distinct_est"]
    est_disk = hll_estimate(spark.read.parquet(hp)).first()["distinct_est"]
    assert est_mem == est_disk

    qp = str(tmp_path / "hist")
    hist_rollup(df, ["day"], "v", bins=64).write.parquet(qp)
    q_mem = quantile_estimate(hist_rollup(df, ["day"], "v", bins=64), 0.5) \
        .first()["q_est"]
    q_disk = quantile_estimate(spark.read.parquet(qp), 0.5).first()["q_est"]
    assert abs(q_mem - q_disk) < 1e-9


def test_candidate_override_below_floor_is_clamped(spark):
    """candidates_per_partition below ceil(1/phi) would void the pass-1
    superset guarantee — it must be clamped so the EXACT contract holds
    (round-5 advice)."""
    rows = [(f"v{k}",) for k in range(1, 50) for _ in range(1000 // k)]
    sdf = spark.createDataFrame(rows, "tok string").repartition(8)
    # phi=0.02 -> m floor = 50; an override of 2 must not shrink it
    got = _run(sdf, "tok", 0.02, candidates_per_partition=2)
    assert got  # the heavy head survives


def test_hist_rollup_empty_input_raises(spark):
    from dask_expr_spark.functions.sketches import hist_rollup

    empty = spark.createDataFrame([], "day int, v double")
    with pytest.raises(ValueError, match="no non-null"):
        hist_rollup(empty, ["day"], "v")
    allnull = spark.createDataFrame([(1, None), (2, None)],
                                    "day int, v double")
    with pytest.raises(ValueError, match="no non-null"):
        hist_rollup(allnull, ["day"], "v")
    # explicit bounds sidestep the inference and return an empty rollup
    assert hist_rollup(empty, ["day"], "v", lo=0.0, hi=1.0).count() == 0


def test_psi_drift_semantics(spark):
    """psi_drift: identical distributions score ~0; a clear shift
    scores above the 0.25 'major' threshold; fragment (uncompacted)
    rollups merge to the same answer as clean rollups."""
    import numpy as np

    from dask_expr_spark.functions.sketches import hist_rollup, psi_drift

    rng = np.random.default_rng(3)
    a = rng.normal(50, 10, 4000)
    same = rng.normal(50, 10, 4000)
    shifted = rng.normal(80, 10, 4000)

    def roll(v):
        df = spark.createDataFrame([("k", float(x)) for x in v],
                                   "g string, v double")
        return hist_rollup(df, ["g"], "v", bins=64, lo=0.0, hi=120.0)

    near0 = psi_drift(roll(a), roll(same), ["g"]).first()["psi"]
    big = psi_drift(roll(a), roll(shifted), ["g"]).first()["psi"]
    assert near0 < 0.05, near0
    assert big > 0.25, big

    # fragments (two half-rollups unioned) == one clean rollup
    half1 = roll(a[:2000])
    half2 = roll(a[2000:])
    frag = half1.unionByName(half2)
    psi_frag = psi_drift(frag, roll(shifted), ["g"]).first()["psi"]
    assert abs(psi_frag - big) < 1e-12
