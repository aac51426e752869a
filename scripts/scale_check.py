#!/usr/bin/env python
"""sf-scale spot-check of the nonlinear-risk paths (VERDICT r3 item 7).

Materializes a 10x replica of the sf0.1 tables the risky pipelines
touch (key-offset replicas; document text gets a per-replica marker
token and embeddings a small deterministic perturbation so the
near-dup / ANN structure stays realistic instead of collapsing into
exact-duplicate groups), then times each probe at sf0.1 and at 10x and
reports seconds and ns/row. A pipeline whose candidate generation or
bucket calibration is secretly quadratic shows up as ns/row growing
far beyond the ~2x-of-linear band. Results are recorded in SCALE.md.

Run:  python scripts/scale_check.py [--rows-only]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/dx_scale_x10")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
OFF = 1_000_000_000


def materialize(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    specs = {
        "lineitem": ("l_orderkey", None, None),
        "orders": ("o_orderkey", None, None),
        "documents": ("doc_id", "text", None),
        "embeddings": ("vec_id", None, "embedding"),
    }
    for name, (key, text_col, vec_col) in specs.items():
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            continue
        base = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        reps = []
        for i in range(REPLICAS):
            r = base.withColumn(key, F.col(key) + F.lit(i * OFF))
            if text_col and i > 0:
                # marker token keeps replicas NEAR-dups (high but not
                # perfect Jaccard) — realistic near-dup-heavy corpus
                r = r.withColumn(
                    text_col, F.concat(F.lit(f"replica{i} "),
                                       F.col(text_col)))
            if vec_col and i > 0:
                # deterministic tiny perturbation per replica: keeps
                # ANN bucket structure realistic (no exact collisions)
                r = r.withColumn(
                    vec_col,
                    F.transform(
                        F.col(vec_col),
                        lambda x, j: x + (
                            (F.abs(F.hash(F.col(key) * 31 + j * 7 + i))
                             % 1000).cast("double") / 1.0e6),
                    ),
                )
            reps.append(r)
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.repartition(32).write.mode("overwrite").parquet(out)
        print(f"materialized {out}")


def probes():
    import bench
    from dask_expr_spark.functions import dedup as DD
    from dask_expr_spark.sources.io import read_parquet

    def ngram_jaccard(spark, sf_dir):
        docs = read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()
        return DD.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.8,
            prefix_filter=True).select("id_a", "id_b")

    return {
        "dedup_ngram_jaccard": ("documents", ngram_jaccard),
        "dedup_minhash_pipeline": ("documents", bench._minhash_pipeline),
        "ann_lsh_pipeline": ("embeddings", bench._ann_lsh_pipeline),
        "ordered_cumsum_shift": ("lineitem", bench._scale_probe_ordered),
        "expanding_median": ("orders", bench._scale_probe_expanding_holistic),
        "expanding_approx": ("orders", bench._scale_probe_expanding_approx),
    }


def main() -> None:
    from dask_expr_spark.session import get_spark

    spark = get_spark("dx_scale_check")
    materialize(spark)

    counts: dict[str, dict[str, int]] = {}
    for d in (SRC, DST):
        counts[d] = {}
        for t in ("lineitem", "orders", "documents", "embeddings"):
            counts[d][t] = spark.read.parquet(
                os.path.join(d, f"{t}.parquet")).count()

    print(f"{'probe':28s} {'sf0.1 s':>9s} {'x10 s':>9s} "
          f"{'sf0.1 ns/row':>13s} {'x10 ns/row':>11s} {'ratio':>6s}")
    rows = []
    for name, (table, fn) in probes().items():
        times = {}
        for d in (SRC, DST):
            spark.catalog.clearCache()
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[d] = best
        nsr = {d: times[d] / counts[d][table] * 1e9 for d in (SRC, DST)}
        ratio = nsr[DST] / nsr[SRC]
        rows.append((name, times[SRC], times[DST], nsr[SRC], nsr[DST], ratio))
        print(f"{name:28s} {times[SRC]:9.2f} {times[DST]:9.2f} "
              f"{nsr[SRC]:13.0f} {nsr[DST]:11.0f} {ratio:6.2f}")
    bad = [r for r in rows if r[5] > 2.0]
    print("VERDICT:", "OK — all probes within 2x-of-linear" if not bad
          else f"NONLINEAR: {[r[0] for r in bad]}")


if __name__ == "__main__":
    main()
