#!/usr/bin/env python
"""Partitioning-invariance probe: the whole oracle sweep on a
MULTI-FILE, row-shuffled rewrite of the corpus.

Every fixture table the driver generates is ONE parquet file, so scans
are single-task and input order is frozen — which means the repo's
determinism discipline (fixed-scale decimal folds, unique sort keys on
every window, integer-exact thresholds) has never been exercised on
the axis it exists for: partition count and row order.  This probe
rewrites each table as N row-shuffled files into /tmp and re-runs the
full Spark-vs-DuckDB sweep against the rewrite (BOTH engines read the
same rewritten files, so any hash mismatch is an order/partitioning
dependence in one engine's plan, not a data change).

``events.ts`` is TIMESTAMP(NANOS) in the driver layout; the rewrite
goes through ``tables.load`` (which truncates to micros exactly as
DuckDB does) and writes TIMESTAMP_NTZ micros — value-identical for
both engines, and the loader's native branch reads it back.

Run: ``python scripts/probe_partitioning.py [sf_dir] [n_files]``
(defaults /root/testdata/sf0.01, 8).  Exit 0 = every key green.
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
OUT = f"/tmp/shuffled_{os.path.basename(os.path.normpath(SF))}_{N_FILES}f"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    from pyspark.sql import functions as F

    from task_mapreduce_spark.session import get_spark
    from task_mapreduce_spark.tables import load

    spark = get_spark("partition-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        src = os.path.join(SF, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = (
            load(spark, SF, "events")
            if t == "events"
            else spark.read.parquet(src)
        )
        # deterministic row shuffle: order by a hash of the whole row,
        # then round-robin into N files — every file interleaves rows
        # from everywhere in the original order
        (df.orderBy(F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                                for c in df.columns])))
           .repartition(N_FILES)
           .write.mode("overwrite").parquet(f"{OUT}/{t}.parquet"))
    n = len(
        [f for f in os.listdir(f"{OUT}/documents.parquet")
         if f.endswith(".parquet")]
    )
    print(f"rewrote {SF} -> {OUT} ({n} files/table)", flush=True)
    spark.stop()
    # fresh process for the sweep: the probe must see the rewrite the
    # way the driver would — vanilla session, importlib load
    sweep = os.path.join(REPO, "scripts", "full_correctness.py")
    r = subprocess.run(
        [sys.executable, sweep, OUT, f"{OUT}/correctness.json"],
        cwd="/tmp",
    )
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
