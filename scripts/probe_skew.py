#!/usr/bin/env python
"""Skewed-data invariance probe: the whole oracle sweep on a HOT-KEY
rewrite of the corpus (round-11 verdict #3).

The partitioning probe shuffles rows uniformly, so the repo's skew
claims (AQE skew-join splitting, join_skew_salted's proactive salt,
window partitions on group keys) had never been exercised against
actual skew.  This probe rewrites the corpus so that on every
join/group axis one key carries ~50% of the rows:

- ``events.user_id``     → the min user id for half the events
  (sessionization windows, per-user aggs, stream twins);
- ``documents.lang``     → the min lang for half the corpus
  (per-lang aggs, corpus mix, quality scoreboards);
- ``orders.o_custkey``   → the min customer for half the orders
  (customer-side equi-joins: q10/q13/q18/q22, salted join);
- ``lineitem.l_suppkey`` → the min supplier for half the lines
  (supplier-side joins: q5/q7/q15);
- ``embeddings.label``   → the min label for half the vectors
  (the label-blocked cosine join).

Primary keys stay untouched (uniqueness is a table invariant) and
every mutated FK keeps pointing at an existing dimension row (the MIN
of the column), so the rewrite is a legal corpus instance — just a
pathologically skewed one.  The 50% coin is a SALTED md5 of the row's
PK (md5(pk || 'skew-probe')) — independent of every in-repo portable
hash rule by construction: chars 1-12 OR 13-24 of the unsalted digest
would correlate the rewrite with the operators' own splits (e.g. the
event-hash run-1 half of stream_state_evolve, the %64 IVF seed rule —
any hash%2k==0 slice nests inside an unsalted %2==0 coin), silently
diluting the probe on exactly the axes it claims to stress (review,
round 12).  BOTH engines read the same rewritten files, so any
hash mismatch is a skew-dependence in one engine's plan (lost rows in
a split skew partition, an order-dependent fold), not a data change.

Run: ``python scripts/probe_skew.py [sf_dir]`` (default
/root/testdata/sf0.01).  Exit 0 = every key green.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = f"/tmp/skewed_{os.path.basename(os.path.normpath(SF))}"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# table -> (column to make hot, PK expression for the 50% coin)
HOT = {
    "events": ("user_id", "event_id"),
    "documents": ("lang", "doc_id"),
    "orders": ("o_custkey", "o_orderkey"),
    "lineitem": ("l_suppkey", "l_orderkey * 16 + l_linenumber"),
    "embeddings": ("label", "vec_id"),
}


def main() -> int:
    from pyspark.sql import functions as F

    from task_mapreduce_spark.session import get_spark
    from task_mapreduce_spark.tables import load

    spark = get_spark("skew-probe")
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
        if t in HOT:
            col, pk = HOT[t]
            hot = df.agg(F.min(col).alias("hot"))
            coin = (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.expr(pk).cast("string"),
                                F.lit("skew-probe"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0
            )
            df = df.crossJoin(F.broadcast(hot)).select(
                *[
                    F.when(coin, F.col("hot")).otherwise(F.col(c)).alias(c)
                    if c == col
                    else F.col(c)
                    for c in df.columns
                ]
            )
        # single file per table — the driver's layout, so this probe
        # isolates SKEW (probe_partitioning covers multi-file scans)
        df.coalesce(1).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
    spark.stop()
    print(f"rewrote {SF} -> {OUT} (hot keys at ~50%)", flush=True)
    # fresh process for the sweep: vanilla session, importlib load
    sweep = os.path.join(REPO, "scripts", "full_correctness.py")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, sweep, OUT, f"{OUT}/correctness.json"],
        cwd="/tmp",
    )
    print(f"skew sweep wall: {time.time() - t0:.1f}s", flush=True)
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
