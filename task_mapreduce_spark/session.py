"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[32]``; the configs below are the ones that
matter identically on a 1000-executor cluster: AQE (runtime re-plan,
skew-join splitting, partition coalescing), a shuffle-partition count
sized to the local core count (on a real cluster this would be
``2-3 × total cores`` or left to AQE's coalescing), Arrow for any
Python↔JVM data exchange, and a UTC session timezone so timestamp
semantics are stable across engines and machines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "task-mapreduce-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally provided session.

    The driver hands us its own ``SparkSession``; only runtime-settable
    confs may be touched here.  UTC matters for oracle parity (DuckDB
    operates in UTC); Arrow matters for every ``toPandas``/pandas-UDF
    exchange.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The whole oracle surface is validated under ANSI semantics and
    # modern size(NULL)=NULL.  Both are runtime-settable, so a hostile
    # session could arrive with them flipped (exactly like the
    # timezone) — pin them explicitly; scripts/probe_hostile.py
    # re-runs sensitive keys under the flipped taints to prove the
    # override holds.  These two pins must NOT share the Arrow conf's
    # exception swallow: a build where setting them fails would leave
    # the session semantics silently tainted, and a loud failure here
    # beats a downstream parity mystery.
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    try:
        # optional acceleration only — absence changes no semantics
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark
