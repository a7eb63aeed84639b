"""Oracle parity for every registered operator (driver's t2 replica)."""

from __future__ import annotations

import pytest

from task_mapreduce_spark.registry import ORACLES, QUERIES
from task_mapreduce_spark.parity import check_key


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_parity(spark, oracle, sf_dir, key):
    errs = check_key(spark, oracle, key, sf_dir)
    assert not errs, "\n".join(errs)


def test_every_query_has_rows_or_schema(spark, sf_dir):
    # every query must at least produce a stable schema
    for key, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.schema is not None, key


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
