"""Oracle parity for every registered operator (driver's t2 replica)."""

from __future__ import annotations

import pytest

from task_mapreduce_spark.registry import ORACLES, QUERIES
from task_mapreduce_spark.parity import check_key


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_parity(spark, oracle, sf_dir, key):
    errs = check_key(spark, oracle, key, sf_dir)
    assert not errs, "\n".join(errs)


def test_every_query_returns_rows(spark, sf_dir):
    # every query must execute and produce at least one row at sf0.001
    for key, fn in QUERIES.items():
        assert fn(spark, sf_dir).limit(1).count() == 1, f"{key}: returned 0 rows"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
