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


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tmrs-tests")
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
