"""Randomized (fixed-seed) differential suites — VERDICT r3 item 9.

Extends the arithmetic property check (test_differential.py::
test_property_arithmetic_parity) to randomized GROUPBY-AGG, JOIN, and
WINDOW specs: frames, key cardinalities, null rates, and operator
parameters are all drawn from seeded RNGs and the results compared
against pandas — the net that catches semantics drift the fixed
oracles can't.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.testing as pdt

from dask_expr_spark.sources.io import from_pandas

import pytest

# randomized property battery: every law here is also pinned by a
# deterministic test; the battery runs in the local full sweep
# (`pytest -m ""`), outside the driver's budgeted default gate
pytestmark = pytest.mark.slow



def _rand_frame(rng: np.random.RandomState, n: int | None = None,
                key_card: int | None = None) -> pd.DataFrame:
    n = n or int(rng.randint(20, 90))
    key_card = key_card or int(rng.randint(2, 9))
    pdf = pd.DataFrame({
        "i": range(n),
        "k": rng.randint(0, key_card, n).astype("int64"),
        "k2": rng.choice(list("abcd"), n),
        "v": np.round(rng.uniform(-100, 100, n), 3),
        "w": rng.randint(-5, 50, n).astype("int64"),
    })
    null_rate = float(rng.uniform(0, 0.3))
    pdf.loc[rng.rand(n) < null_rate, "v"] = np.nan
    return pdf


def _sorted_frame(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, na_position="last")
            .reset_index(drop=True))


def _assert_frames(got: pd.DataFrame, want: pd.DataFrame, ctx: str):
    got, want = _sorted_frame(got), _sorted_frame(want)
    assert sorted(got.columns) == sorted(want.columns), ctx
    pdt.assert_frame_equal(got, want[got.columns], check_dtype=False,
                           check_exact=False, rtol=1e-9, atol=1e-9,
                           obj=ctx)


AGG_FNS = ["sum", "mean", "min", "max", "count", "var", "std", "median",
           "nunique"]


def test_property_groupby_agg_parity(spark):
    rng = np.random.RandomState(1234)
    for trial in range(6):
        pdf = _rand_frame(rng)
        d = from_pandas(spark, pdf, npartitions=int(rng.randint(1, 6)))
        keys = ["k"] if rng.rand() < 0.5 else ["k", "k2"]
        spec = {}
        for col in ("v", "w"):
            spec[col] = str(rng.choice(AGG_FNS))
        want = (pdf.groupby(keys, dropna=True).agg(spec)
                .reset_index())
        got = d.groupby(keys).agg(spec).compute()
        _assert_frames(got, want, f"groupby trial {trial} spec={spec} keys={keys}")


def test_property_groupby_named_agg_parity(spark):
    rng = np.random.RandomState(77)
    for trial in range(5):
        pdf = _rand_frame(rng)
        d = from_pandas(spark, pdf, npartitions=3)
        fn1, fn2 = (str(f) for f in rng.choice(AGG_FNS, 2))
        want = (pdf.groupby("k").agg(a=("v", fn1), b=("w", fn2))
                .reset_index())
        got = d.groupby("k").agg(a=("v", fn1), b=("w", fn2)).compute()
        _assert_frames(got, want, f"named-agg trial {trial} ({fn1},{fn2})")


def test_property_join_parity(spark):
    rng = np.random.RandomState(4321)
    hows = ["inner", "left", "right", "outer"]
    for trial in range(6):
        card = int(rng.randint(2, 12))
        ln, rn = int(rng.randint(5, 60)), int(rng.randint(5, 60))
        lp = pd.DataFrame({
            "k": rng.randint(0, card, ln).astype("int64"),
            "a": np.round(rng.uniform(-10, 10, ln), 3),
        })
        rp = pd.DataFrame({
            "k": rng.randint(0, card, rn).astype("int64"),
            "b": rng.choice(list("xyz"), rn),
        })
        how = hows[trial % 4]
        want = lp.merge(rp, on="k", how=how)
        got = (from_pandas(spark, lp, npartitions=2)
               .merge(from_pandas(spark, rp, npartitions=3), on="k", how=how)
               .compute())
        _assert_frames(got, want, f"join trial {trial} how={how} card={card}")


def test_property_join_multikey_suffix_parity(spark):
    rng = np.random.RandomState(99)
    for trial in range(4):
        n = int(rng.randint(10, 50))
        lp = pd.DataFrame({
            "k1": rng.randint(0, 4, n).astype("int64"),
            "k2": rng.choice(list("pq"), n),
            "v": np.round(rng.uniform(0, 5, n), 2),
        })
        rp = pd.DataFrame({
            "k1": rng.randint(0, 4, n).astype("int64"),
            "k2": rng.choice(list("pq"), n),
            "v": np.round(rng.uniform(0, 5, n), 2),
        }).drop_duplicates(["k1", "k2"])
        want = lp.merge(rp, on=["k1", "k2"], how="left",
                        suffixes=("_l", "_r"))
        got = (from_pandas(spark, lp, npartitions=2)
               .merge(from_pandas(spark, rp, npartitions=2),
                      on=["k1", "k2"], how="left", suffixes=("_l", "_r"))
               .compute())
        _assert_frames(got, want, f"multikey trial {trial}")


def test_property_rolling_parity(spark):
    rng = np.random.RandomState(2468)
    for trial in range(5):
        n = int(rng.randint(20, 80))
        pdf = pd.DataFrame({
            "i": range(n),
            "v": np.round(rng.uniform(-50, 50, n), 3),
        })
        pdf.loc[rng.rand(n) < 0.15, "v"] = np.nan
        d = from_pandas(spark, pdf, npartitions=4).set_index("i")
        p = pdf.set_index("i")
        win = int(rng.randint(2, 9))
        mp = int(rng.randint(1, win + 1))
        fn = str(rng.choice(["mean", "sum", "min", "max", "std"]))
        r = d["v"].rolling(win, min_periods=mp)
        got = getattr(r, fn)(["v"]).compute().sort_index()[f"v_r{fn}"]
        want = getattr(p["v"].rolling(win, min_periods=mp), fn)()
        pdt.assert_series_equal(got, want, check_names=False,
                                check_dtype=False, rtol=1e-9, atol=1e-9,
                                obj=f"rolling trial {trial} {fn} w={win} mp={mp}")


def test_property_shift_diff_parity(spark):
    rng = np.random.RandomState(1357)
    for trial in range(5):
        n = int(rng.randint(15, 70))
        pdf = pd.DataFrame({
            "i": range(n),
            "v": np.round(rng.uniform(-50, 50, n), 3),
        })
        d = from_pandas(spark, pdf, npartitions=3).set_index("i")
        p = pdf.set_index("i")
        periods = int(rng.randint(-6, 7)) or 1
        got_s = d["v"].shift(periods).compute().sort_index()
        pdt.assert_series_equal(got_s, p["v"].shift(periods),
                                check_names=False, check_dtype=False,
                                obj=f"shift trial {trial} p={periods}")
        got_d = d["v"].diff(abs(periods)).compute().sort_index()
        pdt.assert_series_equal(got_d, p["v"].diff(abs(periods)),
                                check_names=False, check_dtype=False,
                                obj=f"diff trial {trial} p={periods}")


def test_property_grouped_window_parity(spark):
    rng = np.random.RandomState(8642)
    for trial in range(4):
        pdf = _rand_frame(rng, n=int(rng.randint(30, 70)), key_card=4)
        d = from_pandas(spark, pdf, npartitions=3).set_index("i")
        p = pdf.set_index("i")
        pg = p.groupby("k")["v"]
        g = d.groupby("k")
        periods = int(rng.randint(1, 4))
        got = g.shift(periods).compute().sort_index()["v"]
        pdt.assert_series_equal(got, pg.shift(periods).sort_index(),
                                check_names=False, check_dtype=False,
                                obj=f"gshift trial {trial}")
        got_c = g.cumsum().compute().sort_index()["v"]
        pdt.assert_series_equal(got_c, pg.cumsum().sort_index(),
                                check_names=False, check_dtype=False,
                                rtol=1e-9, obj=f"gcumsum trial {trial}")


def test_property_resample_parity(spark):
    rng = np.random.RandomState(555)
    for trial in range(4):
        n = int(rng.randint(30, 120))
        start = pd.Timestamp("2024-01-01") + pd.Timedelta(
            minutes=int(rng.randint(0, 300)))
        step = int(rng.randint(7, 95))
        ts = pd.date_range(start, periods=n, freq=f"{step}min")
        pdf = pd.DataFrame({"ts": ts,
                            "v": np.round(rng.uniform(-20, 20, n), 3)})
        d = from_pandas(spark, pdf, npartitions=3)
        freq = str(rng.choice(["h", "2h", "D", "30min"]))
        fn = str(rng.choice(["sum", "mean", "max"]))
        got = (d.resample(freq, on="ts").agg({"v": fn})
               .compute().sort_values("ts").reset_index(drop=True))
        want = getattr(pdf.resample(freq, on="ts")["v"], fn)().reset_index()
        want = want[want["v"].notna()].reset_index(drop=True)  # gap bins
        assert got["ts"].tolist() == want["ts"].tolist(), \
            f"resample trial {trial} {freq}/{fn} bins"
        assert np.allclose(got["v"], want["v"]), \
            f"resample trial {trial} {freq}/{fn} values"


def test_property_merge_asof_parity(spark):
    rng = np.random.RandomState(808)
    for trial in range(5):
        ln, rn = int(rng.randint(5, 40)), int(rng.randint(3, 30))
        lt = np.sort(rng.choice(np.arange(0, 200), ln, replace=False))
        rt = np.sort(rng.choice(np.arange(0, 200), rn, replace=False))
        lp = pd.DataFrame({"t": lt.astype("int64"),
                           "a": np.round(rng.uniform(0, 9, ln), 2)})
        rp = pd.DataFrame({"t": rt.astype("int64"),
                           "b": np.round(rng.uniform(0, 9, rn), 2)})
        direction = str(rng.choice(["backward", "forward", "nearest"]))
        tol = int(rng.randint(1, 40)) if rng.rand() < 0.5 else None
        kw = dict(on="t", direction=direction)
        if tol is not None and direction != "nearest":
            kw["tolerance"] = tol
        want = pd.merge_asof(lp, rp, **kw)
        got = (from_pandas(spark, lp, npartitions=2)
               .merge_asof(from_pandas(spark, rp, npartitions=2), **kw)
               .compute())
        _assert_frames(got, want,
                       f"asof trial {trial} dir={direction} tol={tol}")


def test_property_rank_parity(spark):
    rng = np.random.RandomState(909)
    for trial in range(5):
        n = int(rng.randint(15, 70))
        pdf = pd.DataFrame({"i": range(n),
                            "v": rng.randint(0, 12, n).astype("float64")})
        if rng.rand() < 0.4:
            pdf.loc[rng.rand(n) < 0.2, "v"] = np.nan
        d = from_pandas(spark, pdf, npartitions=3).set_index("i")
        p = pdf.set_index("i")
        method = str(rng.choice(["average", "min", "max", "dense", "first"]))
        asc = bool(rng.rand() < 0.7)
        if method == "first" and not asc:
            asc = True  # pandas raises for first+descending on ties
        got = d["v"].rank(method=method, ascending=asc).compute().sort_index()
        want = p["v"].rank(method=method, ascending=asc)
        pdt.assert_series_equal(got, want, check_names=False,
                                check_dtype=False,
                                obj=f"rank trial {trial} {method} asc={asc}")


# ---- round 4: randomized nets for the newest pipeline ops ------------

def test_property_duplicated_spans_vs_pandas(spark):
    """random corpora with planted shared substrings: duplicated_spans
    must equal a direct pandas/python reimplementation (window sets,
    span merge, totals)."""
    from dask_expr_spark.functions.dedup import duplicated_spans

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(40)]
    for trial in range(3):
        k = int(rng.randint(3, 6))
        docs = []
        for d in range(30):
            n = int(rng.randint(1, 25))
            toks = list(rng.choice(vocab, n))
            docs.append((d, " ".join(toks)))
        # plant a shared phrase into a few docs
        phrase = " ".join(rng.choice(vocab, k + 2))
        for d in rng.choice(30, 5, replace=False):
            did, txt = docs[d]
            docs[d] = (did, txt + " " + phrase)
        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])

        # python oracle
        win = {}
        for did, txt in docs:
            toks = txt.split(" ")
            for i in range(len(toks) - k + 1):
                win.setdefault(" ".join(toks[i:i + k]), set()).add(did)
        dup = {w for w, ds in win.items() if len(ds) >= 2}
        want = {}
        for did, txt in docs:
            toks = txt.split(" ")
            pos = [i for i in range(len(toks) - k + 1)
                   if " ".join(toks[i:i + k]) in dup]
            total = len(toks)
            if not pos:
                want[did] = (total, 0, 0)
                continue
            spans, start, end = [], pos[0], pos[0] + k
            for p in pos[1:]:
                if p > end:
                    spans.append(end - start)
                    start, end = p, p + k
                else:
                    end = max(end, p + k)
            spans.append(end - start)
            want[did] = (total, sum(spans), len(spans))

        sdf = spark.createDataFrame(pdf)
        got = {r.id: (r.total_tokens, r.dup_tokens, r.n_spans)
               for r in duplicated_spans(sdf, "doc_id", "text", k=k).collect()}
        assert got == want, f"trial {trial} k={k}"


def test_property_semantic_dedup_vs_numpy(spark):
    """random embedding sets: semantic_dedup(lsh cells) must keep
    exactly the min-id representative of each within-cell duplicate
    component, per a driver-side numpy + union-find oracle using the
    same plane weights."""
    from dask_expr_spark.functions.similarity import (_plane_weights,
                                                      semantic_dedup)

    rng = np.random.RandomState(11)
    dim, planes, seed, thr = 16, 2, 5, 0.92
    for trial in range(3):
        n = 60
        M = rng.standard_normal((n, dim))
        # plant near-dup pairs
        for _ in range(10):
            i, j = rng.choice(n, 2, replace=False)
            M[j] = M[i] + rng.standard_normal(dim) * 0.05
        pdf = pd.DataFrame({
            "vec_id": range(n),
            "embedding": [row.astype("float32").tolist() for row in M],
        })
        sdf = spark.createDataFrame(pdf)
        got = sorted(r.id for r in semantic_dedup(
            sdf, dim=dim, threshold=thr, method="lsh",
            num_planes=planes, seed=seed).collect())

        # numpy oracle with identical cells
        Md = np.asarray([np.asarray(v, dtype="float64")
                         for v in pdf["embedding"]])
        W = np.asarray(_plane_weights(dim, planes, seed))
        cells = ((Md @ W.T) > 0).astype(int) @ (1 << np.arange(planes))
        norms = np.linalg.norm(Md, axis=1)
        S = (Md @ Md.T) / np.outer(norms, norms)
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(n):
            for j in range(i + 1, n):
                if cells[i] == cells[j] and S[i, j] >= thr:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        want = sorted(i for i in range(n) if find(i) == i)
        assert got == want, f"trial {trial}"


def test_property_merge_asof_grid_parity(spark):
    """randomized merge_asof vs pd.merge_asof across the
    direction x tolerance x allow_exact_matches x by grid, with `on`
    values clustered so matches routinely straddle partition/bucket
    boundaries (reference _merge_asof.py:287-380 prefix/suffix
    propagation — VERDICT r4 item 8: the highest-residual-risk ordered
    path). Right keys are unique per (by, on): with duplicates pandas
    keeps the last INPUT row, an order a distributed engine cannot
    see."""
    import dask_expr_spark as dx

    rng = np.random.RandomState(31337)
    for trial in range(10):
        ln = int(rng.randint(8, 60))
        rn = int(rng.randint(4, 50))
        # clustered integer timestamps with heavy collisions
        lt = np.sort(rng.randint(0, 40, ln)).astype("int64")
        rt = rng.randint(0, 40, rn).astype("int64")
        by = trial % 2 == 0
        lp = pd.DataFrame({
            "g": rng.randint(0, 3, ln).astype("int64"),
            "t": lt,
            "a": np.round(rng.uniform(-5, 5, ln), 3),
        }).sort_values("t", kind="mergesort").reset_index(drop=True)
        rp = pd.DataFrame({
            "g": rng.randint(0, 3, rn).astype("int64"),
            "t": rt,
            "b": np.round(rng.uniform(-5, 5, rn), 3),
        })
        rp = (rp.drop_duplicates(subset=["g", "t"] if by else ["t"])
              .sort_values("t", kind="mergesort").reset_index(drop=True))
        direction = ["backward", "forward", "nearest"][trial % 3]
        tolerance = None if rng.rand() < 0.4 else int(rng.randint(1, 8))
        allow_exact = bool(rng.rand() < 0.7)
        if not allow_exact and direction == "nearest":
            allow_exact = True  # pandas forbids the combination
        kw = dict(on="t", direction=direction, tolerance=tolerance,
                  allow_exact_matches=allow_exact)
        if by:
            kw["by"] = "g"
            want = pd.merge_asof(lp, rp, **kw)
        else:
            want = pd.merge_asof(lp, rp.drop(columns=["g"]), **kw)
        dl = from_pandas(spark, lp, npartitions=int(rng.randint(1, 5)))
        dr = from_pandas(
            spark, rp if by else rp.drop(columns=["g"]),
            npartitions=int(rng.randint(1, 4)))
        got = dx.merge_asof(dl, dr, **kw).compute()
        ctx = (f"asof trial {trial} dir={direction} tol={tolerance} "
               f"exact={allow_exact} by={by}")
        _assert_frames(got, want, ctx)


def test_property_heavy_hitters_exactness(spark):
    """randomized heavy_hitters differential (VERDICT r5 item 8):
    random phi, Zipf-skewed corpora with random vocabulary sizes,
    adversarial partition counts (incl. n-partitions ≈ n-rows so many
    partitions hold 1-2 rows), random null rates — the result must
    EQUAL plain GROUP BY/HAVING(> phi*n) every time."""
    from pyspark.sql import functions as F

    from dask_expr_spark.functions.sketches import heavy_hitters

    rng = np.random.RandomState(99)
    for trial in range(8):
        vocab = int(rng.randint(5, 400))
        n = int(rng.randint(50, 4000))
        # Zipf-ish skew with random exponent; occasional uniform
        a = float(rng.uniform(1.05, 2.5))
        vals = (rng.zipf(a, n) % vocab if rng.rand() < 0.8
                else rng.randint(0, vocab, n))
        toks = pd.Series(vals).map(lambda k: f"t{k}").astype(object)
        null_rate = float(rng.uniform(0, 0.25))
        toks[rng.rand(n) < null_rate] = None
        phi = float(rng.uniform(0.005, 0.4))
        parts = int(rng.choice([1, 2, 7, 32, max(2, n // 2)]))
        sdf = spark.createDataFrame(
            pd.DataFrame({"tok": toks})).repartition(parts)
        got = sorted((r["value"], r["freq"])
                     for r in heavy_hitters(sdf, "tok", phi).collect())
        nn = sdf.where(F.col("tok").isNotNull()).count()
        want = sorted(
            (r["tok"], r["freq"])
            for r in sdf.where(F.col("tok").isNotNull()).groupBy("tok")
            .agg(F.count(F.lit(1)).alias("freq")).collect()
            if r["freq"] > phi * nn)
        ctx = f"trial={trial} phi={phi:.4f} n={n} vocab={vocab} parts={parts}"
        assert got == want, ctx


def test_property_hist_quantile_one_bin_bound(spark):
    """randomized hist_rollup/quantile_estimate bound check: random
    lo/hi/bins/q over random distributions (incl. values clamped
    outside [lo,hi]) — the estimate must sit within one bin width of
    the exact quantile whenever the mass lies inside the domain, and
    slices must merge (global estimate from per-key rollup)."""
    from dask_expr_spark.functions.sketches import (hist_rollup,
                                                    quantile_estimate)

    rng = np.random.RandomState(4242)
    for trial in range(6):
        n = int(rng.randint(200, 3000))
        kind = rng.choice(["uniform", "normal", "lognormal"])
        if kind == "uniform":
            v = rng.uniform(-50, 150, n)
        elif kind == "normal":
            v = rng.normal(40, 25, n)
        else:
            v = rng.lognormal(2.0, 0.7, n)
        pdf = pd.DataFrame({"day": rng.randint(0, 4, n).astype("int64"),
                            "v": v})
        bins = int(rng.choice([16, 64, 128, 256]))
        explicit = rng.rand() < 0.5
        lo = float(np.min(v)) if not explicit else float(np.percentile(v, 2))
        hi = float(np.max(v)) if not explicit else float(np.percentile(v, 98))
        sdf = spark.createDataFrame(pdf).repartition(int(rng.randint(1, 9)))
        roll = hist_rollup(sdf, ["day"], "v", bins=bins,
                           lo=lo if explicit else None,
                           hi=hi if explicit else None)
        width = (hi - lo) / bins
        for q in (float(rng.uniform(0.05, 0.95)), 0.5):
            est = quantile_estimate(roll, q).first()["q_est"]
            # exact quantile of the CLAMPED values (clamping into edge
            # bins is the documented domain contract)
            cl = np.clip(v, lo, hi)
            exact = float(np.quantile(cl, q, method="inverted_cdf"))
            ctx = (f"trial={trial} kind={kind} bins={bins} q={q:.3f} "
                   f"explicit={explicit}")
            assert abs(est - exact) <= width + 1e-9, (ctx, est, exact)


def test_property_leakage_split_random_graphs(spark):
    """randomized leakage_safe_split: random edge sets (chains, stars,
    cliques, self-loops, dangling ids) — components verified against a
    pure-python union-find, no component ever straddles, unpaired ids
    match hash_split exactly, both resolvers agree."""
    from dask_expr_spark.functions import sampling as S

    rng = np.random.RandomState(777)
    for trial in range(5):
        n = int(rng.randint(60, 300))
        ids = list(range(1, n + 1))
        m = int(rng.randint(0, n))
        edges = [(int(rng.randint(1, n + 1)), int(rng.randint(1, n + 1)))
                 for _ in range(m)]
        frac = float(rng.uniform(0.1, 0.6))
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        pairs = (spark.createDataFrame(edges or [(1, 1)],
                                       "id_a long, id_b long"))
        tr, va = S.leakage_safe_split(df, "id", pairs, val_fraction=frac)
        t = {r["id"] for r in tr.collect()}
        v = {r["id"] for r in va.collect()}
        ctx = f"trial={trial} n={n} m={m} frac={frac:.3f}"
        assert t | v == set(ids) and not (t & v), ctx

        # union-find ground-truth components
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps: dict = {}
        for i in ids:
            comps.setdefault(find(i), set()).add(i)
        for comp in comps.values():
            assert comp <= t or comp <= v, (ctx, comp)
        # singletons must match plain hash_split
        single = {i for i in ids if len(comps[find(i)]) == 1}
        t0 = {r["id"] for r in S.hash_split(df, "id", frac)[0].collect()}
        assert {i for i in t if i in single} == \
            {i for i in t0 if i in single}, ctx


def test_property_profile_validate_vs_pandas(spark):
    """randomized profile_table / validate differential vs pandas on
    frames with random null rates, constant columns, and negative
    values."""
    from dask_expr_spark.functions.quality import profile_table, validate
    from pyspark.sql import functions as F

    rng = np.random.RandomState(31)
    for trial in range(4):
        n = int(rng.randint(30, 400))
        pdf = pd.DataFrame({
            "id": range(n),
            "v": np.round(rng.uniform(-50, 50, n), 3),
            "k": rng.choice(list("xyz"), n),
            "c": 7.0,
        })
        pdf.loc[rng.rand(n) < rng.uniform(0, 0.4), "v"] = np.nan
        df = spark.createDataFrame(pdf).repartition(int(rng.randint(1, 7)))
        prof = {r["column"]: r for r in profile_table(
            df, exact_distinct=True, quantiles=(0.5,)).collect()}
        ctx = f"trial={trial} n={n}"
        assert prof["v"]["n"] == n, ctx
        assert prof["v"]["nulls"] == int(pdf["v"].isna().sum()), ctx
        assert prof["v"]["distinct"] == pdf["v"].nunique(), ctx
        if pdf["v"].notna().any():
            assert abs(prof["v"]["mean"] - pdf["v"].mean()) < 1e-9, ctx
            assert abs(prof["v"]["stddev"] - pdf["v"].std()) < 1e-9, ctx
        # streaming-variance cancellation leaves ~1e-16 on constants
        assert prof["c"]["distinct"] == 1 and abs(prof["c"]["stddev"]) < 1e-12
        assert prof["k"]["mean"] is None

        rep = {r["check"]: r for r in validate(
            df, row_checks={"pos": F.col("v") > 0},
            complete=["v"], unique=["id"]).collect()}
        want_pos = int((~(pdf["v"] > 0)).sum())  # False or NaN
        assert rep["pos"]["violations"] == want_pos, ctx
        assert rep["complete(v)"]["violations"] == int(pdf["v"].isna().sum())
        assert rep["unique(id)"]["violations"] == 0


def test_property_exact_dedup_against_vs_pandas(spark):
    """randomized exact_dedup_against differential: random corpora and
    batches with overlapping texts, intra-batch duplicates, and random
    partitionings — dup_of must match the pandas oracle (index keep_id
    first, else batch min-id for repeats, else None)."""
    from dask_expr_spark.functions import dedup as DD

    rng = np.random.RandomState(505)
    for trial in range(5):
        vocab = [f"t{k}" for k in range(int(rng.randint(3, 30)))]
        nc = int(rng.randint(5, 60))
        nb = int(rng.randint(3, 40))
        corpus = pd.DataFrame({
            "doc_id": range(1, nc + 1),
            "text": rng.choice(vocab, nc)})
        batch = pd.DataFrame({
            "doc_id": range(1000, 1000 + nb),
            "text": rng.choice(vocab, nb)})
        cdf = spark.createDataFrame(corpus).repartition(
            int(rng.randint(1, 5)))
        bdf = spark.createDataFrame(batch).repartition(
            int(rng.randint(1, 5)))
        idx = DD.exact_hash_index(cdf, "doc_id", "text")
        got = {r["id"]: r["dup_of"]
               for r in DD.exact_dedup_against(bdf, idx, "doc_id",
                                               "text").collect()}
        keep = corpus.groupby("text")["doc_id"].min().to_dict()
        first = batch.groupby("text")["doc_id"].min().to_dict()
        want = {}
        for _i, row in batch.iterrows():
            t, i = row["text"], row["doc_id"]
            if t in keep:
                want[i] = keep[t]
            elif first[t] != i:
                want[i] = first[t]
            else:
                want[i] = None
        assert got == want, f"trial={trial}"
