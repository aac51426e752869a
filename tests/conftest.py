from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tmpfs shuffle scratch, same opt-in the bench makes (session._local_dir
# gates it behind this flag + a 16 GiB free-capacity check): the test
# battery's write-heavy fixtures measured visibly slower on this box's
# ~333 MB/s /tmp volume, and the suite must fit the driver's verify
# budget (VERDICT r10 item 2).  An explicit SPARK_GRAFT_LOCAL_DIR still
# wins.
os.environ.setdefault("SPARK_GRAFT_TMPFS_SCRATCH", "1")

from dask_expr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dask_expr_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
