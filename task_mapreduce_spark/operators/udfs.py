"""UDF / UDAF / UDTF surface (SURVEY.md §2.11) — the user-supplied
``map`` and ``reduce`` escape hatch.

Rules of the slow path, applied throughout:
- Arrow-vectorized ONLY (`pandas_udf`, `applyInPandas`, `mapInPandas`).
  A row-at-a-time Python UDF pays JVM→Python serialization per ROW and
  is 10–100× slower; it never appears in this codebase.
- Column-prune BEFORE the UDF: every Arrow batch carries only the
  columns the function reads.
- Keep the UDF's math deterministic (integer-valued doubles, no
  reduction-order-sensitive float folds) so results are value-checkable
  against the SQL oracle and stable across partitionings — the same
  discipline as functions/exact.py, extended into Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load


# NOTE on function placement: every Python function shipped to
# executors is defined INSIDE its operator (a closure), not at module
# scope.  cloudpickle serializes closures BY VALUE, while module-level
# functions are pickled as references to `task_mapreduce_spark.…` —
# which executors cannot import when the engine is driven via
# importlib from a foreign cwd (exactly how the driver harness runs
# us, and how spark-submit without --py-files runs in general).


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT o_orderkey,
           o_totalprice,
           greatest(least((o_totalprice - 150000.0) / 50000.0, 2.0), -2.0)
             AS norm_price
    FROM orders
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-supplied ``map`` as a vectorized pandas_udf: data
    crosses JVM→Python once per Arrow batch (thousands of rows), not
    per row."""
    o = load(spark, sf_dir, "orders")

    def norm_price_fn(price: pd.Series) -> pd.Series:
        # standardized price clipped to [-2, 2]; elementwise IEEE
        # arithmetic — same ops, same order as the SQL mirror.
        return ((price - 150000.0) / 50000.0).clip(-2.0, 2.0)

    # constructed here, not at module scope: parsing the DDL return type
    # requires an active SparkSession
    norm_price = pandas_udf(norm_price_fn, "double")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        norm_price(F.col("o_totalprice")).alias("norm_price"),
    )




@register(
    "udaf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           SUM(l_quantity * l_linenumber) / SUM(l_linenumber) AS wavg_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-supplied ``reduce`` as a GROUPED_AGG pandas_udf —
    shuffles once on the group key, each group's Arrow batches fold in
    Python.  At 100 TB prefer built-in aggregates (they get map-side
    partial aggregation; a Python UDAF does not) — this key exists for
    the semantics Spark's builtins can't express."""
    li = load(spark, sf_dir, "lineitem")

    def wavg_qty_fn(qty: pd.Series, weight: pd.Series) -> float:
        # linenumber-weighted mean quantity; both inputs are
        # integer-valued, so the float sums are exact regardless of
        # order — deterministic across partition merges AND engines.
        w = weight.astype("float64")
        return float((qty * w).sum() / w.sum())

    def count_fn(col: pd.Series) -> int:
        return len(col)

    wavg_qty = pandas_udf(wavg_qty_fn, "double")
    # Spark disallows mixing pandas grouped-agg UDFs with built-in
    # aggregates in one agg(), so the count is a pandas UDAF too.
    n_rows = pandas_udf(count_fn, "long")
    return li.groupBy("l_returnflag").agg(
        wavg_qty(F.col("l_quantity"), F.col("l_linenumber")).alias("wavg_qty"),
        n_rows(F.col("l_linenumber")).alias("n"),
    )


_TOKENS_SCHEMA = "doc_id BIGINT, pos BIGINT, token STRING"


@register(
    "udtf_flatmap",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(toks))) AS BIGINT) AS pos,
           unnest(toks) AS token
    FROM s
    """,
)
def udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N row expansion with a NEW schema via mapInPandas — the UDTF
    shape.  Narrow (no shuffle): each input partition expands
    independently; output partitioning inherits input partitioning, so
    at 100 TB this is a pure scan-transform."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def tokenize_batches(batches):
        # batch-wise pandas flat-map — each document row expands to one
        # row per token; no per-row Python function calls.
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            n = toks.str.len()
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(n),
                    "token": [t for lst in toks for t in lst],
                }
            )
            out["pos"] = out.groupby(level=0).cumcount() + 1
            yield out[["doc_id", "pos", "token"]]

    return d.mapInPandas(tokenize_batches, _TOKENS_SCHEMA)
