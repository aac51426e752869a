"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column-name set, and
values (columns sorted by name, rows sorted by all columns) — the same
shape as CORRECTNESS_r{N}.json. Exact match required; a tiny float
tolerance is reported separately so rounding gaps surface before the
driver sees them.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "query") -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    spdf = spark_df.toPandas()
    if set(spdf.columns) != set(oracle_pdf.columns):
        errors.append(
            f"{name}: schema mismatch spark={sorted(spdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return errors
    if len(spdf) != len(oracle_pdf):
        errors.append(f"{name}: row count spark={len(spdf)} oracle={len(oracle_pdf)}")
        return errors
    a, b = canon(spdf), canon(oracle_pdf)
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and {ka, kb} != {"O"}:
            errors.append(
                f"{name}.{c}: dtype kind mismatch spark={a[c].dtype} "
                f"oracle={b[c].dtype} (driver hash may be dtype-sensitive)"
            )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            exact = (av == bv) | both_nan
            if not exact.all():
                close = pd.Series(
                    [
                        (isinstance(x, float) and isinstance(y, float)
                         and (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)))
                        or (pd.isna(x) and pd.isna(y))
                        for x, y in zip(av, bv)
                    ]
                )
                n_bad = int((~exact).sum())
                if close.all():
                    errors.append(
                        f"{name}.{c}: {n_bad} values differ at <1e-9 (hash would MISMATCH — tighten rounding)"
                    )
                else:
                    i = int((~exact).idxmax())
                    errors.append(
                        f"{name}.{c}: {n_bad} values differ, e.g. row {i}: "
                        f"spark={av[i]!r} oracle={bv[i]!r}"
                    )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                errors.append(
                    f"{name}.{c}: {int((~eq).sum())} values differ, e.g. row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}"
                )
    return errors
