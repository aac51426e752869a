"""API-parity alias for the reference's ``dask_expr.datasets`` module
(reference: datasets.py:184 — its only public export is
``timeseries``). The generator itself lives in sources/io.py:
deterministic under projection, partitioned by day."""

from .sources.io import timeseries

__all__ = ["timeseries"]
