#!/usr/bin/env python
"""x10 scaling stress harness: replicate the sf0.1 documents and
embeddings fixtures x10 (with per-replica perturbation so replicas are
near- but not exact duplicates) into /tmp, then warm-interleave base
vs x10 runs of the requested keys twice each.

The PERF.md scaling table is generated from runs of this shape.  Warm
interleaving (A/B/A/B in ONE session) is the bench-noise discipline:
ratios from a single cold pass mislead on this host.

Usage: python scripts/x10_stress.py [key,key,...]
Defaults to the keys whose scaling story changed most recently.

Second decade (×100): point the harness at its own output —
  X10_BASE=/tmp/x10_fixture X10_DIR=/tmp/x100_fixture \\
      python scripts/x10_stress.py key,...
after symlinking the sf0.1 star-schema parquets into /tmp/x10_fixture
(the warm-up query reads lineitem).  Round 9 ran exactly this; the
two-decade table lives in PERF.md, and the probe caught a real
robustness bug (select_dsir's over-wide checkpoint).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from task_mapreduce_spark.session import get_spark  # noqa: E402
from task_mapreduce_spark.registry import QUERIES  # noqa: E402

BASE = os.environ.get("X10_BASE", "/root/testdata/sf0.1")
X10 = os.environ.get("X10_DIR", "/tmp/x10_fixture")
KEYS = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "sim_search_ivf", "dedup_semantic", "mine_hard_negatives",
    "dedup_chunks", "embedding_pq", "sim_search_pq",
    "dedup_span_exact", "dedup_span_apply", "select_dsir",
]

spark = get_spark("x10-stress")
spark.sparkContext.setLogLevel("ERROR")

if not os.path.exists(f"{X10}/embeddings.parquet"):
    os.makedirs(X10, exist_ok=True)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n = emb.count()
    reps = spark.range(10).select(F.col("id").alias("rep"))
    (emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
            F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding",
                    # keep array<float>: load() fail-fasts on drift
                    lambda x: (
                        x
                        + (F.xxhash64(F.col("vec_id"), F.col("rep")) % 1000)
                        .cast("float")
                        / 50000.0
                    ).cast("float"),
                )
            ).alias("embedding"),
            "label",
        )
        .coalesce(4).write.mode("overwrite")
        .parquet(f"{X10}/embeddings.parquet"))
    doc = spark.read.parquet(f"{BASE}/documents.parquet")
    m = doc.count()
    (doc.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * m).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rep"),
                         F.col("rep").cast("string"))
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        .coalesce(4).write.mode("overwrite")
        .parquet(f"{X10}/documents.parquet"))
    print("fixture built", flush=True)


def mat(df):
    df.write.mode("overwrite").format("noop").save()


mat(QUERIES["tpch_q1"](spark, BASE))  # warm-up, untimed
for rnd in range(2):
    for key in KEYS:
        for tag, sf in (("base", BASE), ("x10", X10)):
            t = time.time()
            mat(QUERIES[key](spark, sf))
            print(f"{key} {tag} r{rnd}: {time.time()-t:.2f}s", flush=True)
