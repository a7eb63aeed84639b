"""SQL entry path + partitioned sink (API-surface completeness).

A user of the engine writes either DataFrame chains or SQL text; both
lower to the same Catalyst plans.  ``sql_end_to_end`` proves the SQL
path end-to-end (temp views + ``spark.sql``), and ``sink_partitioned``
proves the partitioned-write → partition-pruned-read path that every
date-organized 100 TB dataset depends on.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import TABLE_NAMES, load


def register_views(
    spark: SparkSession, sf_dir: str, names: Iterable[str] | None = None
) -> None:
    """Expose corpus tables as temp views for spark.sql use.  Pass the
    tables the query references; registering all 10 would re-read and
    re-validate footers the query never touches."""
    for name in names if names is not None else TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


# ONE query text for both engines: the dialect-neutral subset means the
# oracle is literally the same string, so the two sides cannot drift.
_END_TO_END_SQL = """
SELECT n_name, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,4))) AS DOUBLE) AS total,
       CAST(rank() OVER (PARTITION BY o_orderstatus
                         ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(24,4))) AS DOUBLE) DESC,
                                  n_name) AS BIGINT) AS rank_in_status
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY n_name, o_orderstatus
"""


@register("sql_end_to_end", oracle=_END_TO_END_SQL)
def sql_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same engine, SQL text in: join + agg + window via ``spark.sql``
    over temp views — identical Catalyst plan to the DataFrame form,
    and (by construction) the identical query string the oracle runs."""
    register_views(spark, sf_dir, names=("customer", "nation", "orders"))
    return spark.sql(_END_TO_END_SQL)


@register(
    "sink_partitioned",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           o_orderstatus,
           COUNT(*) AS cnt
    FROM orders
    WHERE year(o_orderdate) = 1997
    GROUP BY 1, 2
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write → pruned read: orders written partitionBy(yr),
    then one year read back.  The read's scan must list ONLY the
    yr=1997 directory (PartitionFilters — asserted in tests/test_plans
    .py); at 100 TB this is the difference between scanning one day and
    scanning a decade.

    The write happens once per (process, sf_dir) — a marker file skips
    re-materialization on repeated invocations (parity sweeps, plan
    inspections), which also keeps previously returned lazy DataFrames
    valid; the driver corpus is immutable, so the scratch copy cannot
    go stale within a process."""
    o = load(spark, sf_dir, "orders")
    with_yr = o.withColumn("yr", F.year("o_orderdate").cast("bigint"))
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"tmrs_part_{os.getpid()}_{tag}")
    out = os.path.join(base, "orders_by_year")
    marker = os.path.join(base, "_WRITTEN")
    if not os.path.exists(marker):
        with_yr.write.mode("overwrite").partitionBy("yr").parquet(out)
        open(marker, "w").close()
    # read back with the WRITTEN schema: an empty partitioned sink has no
    # files to infer from, and at any size explicit schemas skip the
    # footer-sampling inference pass
    back = spark.read.schema(with_yr.schema).parquet(out).filter(F.col("yr") == 1997)
    return back.groupBy("yr", "o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))
