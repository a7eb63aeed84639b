"""Physical-layout assertions for sort_within_partitions.

The oracle for this key is just a projection (partition layout is not
SQL-visible), so the *point* of the operator — MR's secondary-sort
idiom — is verified here: every user_id lives in exactly one partition
and every partition is sorted by (user_id, ts, event_id).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from task_mapreduce_spark.registry import QUERIES


def test_secondary_sort_layout(spark, sf_dir):
    df = QUERIES["sort_within_partitions"](spark, sf_dir)
    # spark_partition_id is a narrow projection — appending it does not
    # disturb the partitioning or the intra-partition order.
    pdf = df.withColumn("pid", F.spark_partition_id()).toPandas()
    assert len(pdf) > 0

    # each user_id maps to exactly one partition
    per_user = pdf.groupby("user_id")["pid"].nunique()
    assert (per_user == 1).all(), "user_id split across partitions"

    # toPandas preserves intra-partition row order per partition block;
    # verify each partition's rows are sorted by the secondary-sort key.
    for pid, g in pdf.groupby("pid"):
        key = list(zip(g["user_id"], g["ts"], g["event_id"]))
        assert key == sorted(key), f"partition {pid} not sorted"
