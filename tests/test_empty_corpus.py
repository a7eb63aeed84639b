"""Every operator must EXECUTE on a schema-correct but EMPTY corpus.

An empty partition is not an edge case at 100 TB — it's every day
(a new tenant, an hour with no events, an over-pruned date range).
Operators may legitimately return zero rows; they may not crash on
driver-side scalar unpacking, negative sequence bounds, or empty
aggregations."""

from __future__ import annotations

import pytest

from task_mapreduce_spark.registry import QUERIES
from task_mapreduce_spark.tables import SCHEMAS

# ts is TIMESTAMP(NANOS) in the driver corpus; an empty frame written
# from the declared (ntz) schema reads back fine either way, but the
# loader's nanos conversion expects a LONG column — so events is
# written with ts as epoch-nanos long to mirror the real layout.
_EVENTS_RAW = "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for name, schema in SCHEMAS.items():
        if name == "events":
            df = spark.createDataFrame([], _EVENTS_RAW)
        else:
            df = spark.createDataFrame([], schema)
        df.write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    return str(d)


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_runs_on_empty_corpus(spark, empty_sf_dir, key):
    # executing the plan must not raise; zero rows is a valid answer
    n = QUERIES[key](spark, empty_sf_dir).count()
    assert n >= 0
