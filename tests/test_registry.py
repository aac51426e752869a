"""Registry invariants: the driver validates only the FIRST 50 entries
of collect_queries() per round, so coverage gaps must be impossible to
introduce silently (round-1 lesson: 50 queries went oracle-unchecked)."""

from __future__ import annotations

from dask_expr_spark.queries import VALIDATED, collect_queries

DRIVER_WINDOW = 50


def test_rotation_puts_unvalidated_first():
    qs = list(collect_queries())
    unvalidated = [n for n in qs if n not in VALIDATED]
    assert qs[: len(unvalidated)] == unvalidated, (
        "oracle-unvalidated queries must lead the registry so they land "
        "in the driver's check window"
    )


def test_unvalidated_fit_driver_window():
    unvalidated = [n for n in collect_queries() if n not in VALIDATED]
    assert len(unvalidated) <= DRIVER_WINDOW, (
        f"{len(unvalidated)} unvalidated queries exceed the driver's "
        f"{DRIVER_WINDOW}-query window — split the backlog across rounds "
        "by adding freshly-validated names to VALIDATED"
    )


def test_registry_pairs_well_formed():
    qs = collect_queries()
    assert len(qs) >= 100
    for name, (fn, sql) in qs.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_coverage_md_fresh():
    """COVERAGE.md is generated from scripts/gen_coverage.py; a renamed
    or deleted registry query must fail generation, and the committed
    file must match the generator's output."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "gen_coverage.py"),
         "--check"], capture_output=True, text=True, cwd=root)
    assert res.returncode == 0, res.stdout + res.stderr
