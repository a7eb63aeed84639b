from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from task_mapreduce_spark.session import get_spark
from task_mapreduce_spark.parity import duck_con

# sf0.001 keeps the suite fast; the pre-commit gate runs scripts/parity.py
# at sf0.01 (the driver's correctness scale).
SF_DIR = os.environ.get("TMRS_SF_DIR", "/root/testdata/sf0.001")

# The sf0.001 suite is JOB-FLOOR-bound, not data-bound: every stage is
# kilobytes, so per-task dispatch dominates and MORE local cores make
# the suite SLOWER (measured on test_properties.py at round 14:
# local[32] 452 s, local[8] 316 s, local[4] 406 s).  Cap the TEST
# session at 8 cores regardless of $SPARK_GRAFT_CPUS — correctness at
# sf0.001 is core-count-independent (the full sweep also runs under a
# hostile prime shuffle-partition count via FC_SHUFFLE_PARTITIONS),
# and scaling behavior is bench.py's job, which honors
# $SPARK_GRAFT_CPUS untouched.  Override with $TMRS_TEST_CPUS.
_TEST_CPUS = os.environ.get(
    "TMRS_TEST_CPUS",
    str(min(int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32"), 8)),
)


@pytest.fixture(scope="session")
def spark():
    prev = os.environ.get("SPARK_GRAFT_CPUS")
    os.environ["SPARK_GRAFT_CPUS"] = _TEST_CPUS
    try:
        s = get_spark("tmrs-tests")
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_CPUS", None)
        else:
            os.environ["SPARK_GRAFT_CPUS"] = prev
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duck_con(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
