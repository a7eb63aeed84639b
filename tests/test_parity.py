"""Oracle parity for every registered operator (driver's t2 replica)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from task_mapreduce_spark.registry import ORACLES, QUERIES
from task_mapreduce_spark.parity import check_key


@pytest.fixture(scope="module")
def parity_results(spark, oracle, sf_dir):
    """The full per-key parity sweep, run ONCE with the independent
    keys' Spark jobs overlapped on a small thread pool (the scheduler
    runs concurrent jobs fine — guide §2.6; at sf0.001 the sweep is
    per-job-floor-bound, not data-bound, so serializing 193 keys paid
    ~6-8× the wall of the overlapped sweep).  Each thread gets its own
    DuckDB cursor (the documented thread-safe handle).  The
    parametrized test below keeps per-key reporting intact."""

    def one(key: str):
        con = oracle.cursor()
        try:
            return key, check_key(spark, con, key, sf_dir)
        except Exception as exc:  # noqa: BLE001 — surface as a parity error
            return key, [f"{key}: {type(exc).__name__}: {exc}"]
        finally:
            con.close()

    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(one, sorted(QUERIES)))


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_parity(parity_results, key):
    errs = parity_results[key]
    assert not errs, "\n".join(errs)


def test_every_query_returns_rows(spark, sf_dir):
    # every query must execute and produce at least one row at sf0.001;
    # independent keys overlap on a thread pool (same rationale as the
    # parity sweep — this sequential loop alone was 318 s of job floors)
    def rows(item):
        key, fn = item
        return key, fn(spark, sf_dir).limit(1).count()

    with ThreadPoolExecutor(max_workers=8) as pool:
        for key, n in pool.map(rows, sorted(QUERIES.items())):
            assert n == 1, f"{key}: returned 0 rows"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
