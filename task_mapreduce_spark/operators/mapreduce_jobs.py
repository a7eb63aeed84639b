"""The paper's worked examples, run through the MapReduce compatibility
API (api.map_reduce) — proof that a reference user's map/reduce
functions port unchanged (Dean & Ghemawat §2.3: word count, distributed
grep, inverted index).

Each job is also value-checked against a plain SQL oracle, which
doubles as the demonstration that the declarative form is what you'd
write NATIVELY in this engine — the API exists for migration, the
DataFrame form for everything new.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from task_mapreduce_spark.api import map_reduce
from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load


def _docs_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("string").alias("k"), F.col("text").alias("v")
    )


@register(
    "mr_word_count",
    oracle="""
    SELECT token AS k, CAST(COUNT(*) AS VARCHAR) AS v
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def mr_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count, the canonical job: user-code mapper emits
    (token, "1"), combiner+reducer sum — combiner makes the shuffle
    carry one partial count per (partition, token)."""

    def mapper(_doc_id: str, text: str):
        for token in text.split(" "):
            yield token, "1"

    def summer(_token: str, values: list[str]):
        yield str(sum(int(v) for v in values))

    return map_reduce(
        _docs_kv(spark, sf_dir), mapper, summer, combiner=summer
    )


@register(
    "mr_grep",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS k, text AS v
    FROM documents
    WHERE regexp_matches(text, 'fast (scan|merge|sort)')
    """,
)
def mr_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep: mapper emits the record iff it matches; no
    reduce work (identity) — the map-only job shape."""
    pat = re.compile(r"fast (scan|merge|sort)")

    def mapper(doc_id: str, text: str):
        if pat.search(text):
            yield doc_id, text

    def identity(_k: str, values: list[str]):
        yield from values

    return map_reduce(_docs_kv(spark, sf_dir), mapper, identity)


@register(
    "mr_inverted_index",
    oracle="""
    SELECT token AS k, array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS v
    FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                 unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY token
    """,
)
def mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: mapper emits (token, doc_id); reducer
    dedups+sorts the posting list.  Sorted output keeps the job
    deterministic (the API sorts each key's values before reducing)."""

    def mapper(doc_id: str, text: str):
        for token in set(text.split(" ")):
            yield token, doc_id

    def postings(_token: str, values: list[str]):
        yield ",".join(sorted(set(values)))

    return map_reduce(_docs_kv(spark, sf_dir), mapper, postings)
