"""Golden/bounds tests for aggregation keys without a value-hash oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from task_mapreduce_spark.registry import QUERIES
from task_mapreduce_spark.tables import load


def test_approx_distinct_within_bounds(spark, sf_dir):
    approx = {
        r["o_orderstatus"]: r["approx_customers"]
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for status, est in approx.items():
        # rsd=0.02 → ±10% is a generous 5-sigma bound
        assert abs(est - exact[status]) <= max(2, 0.10 * exact[status]), status
