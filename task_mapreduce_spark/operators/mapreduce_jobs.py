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
    """Distributed grep, run as a MAP-ONLY job (``reducer=None`` —
    Hadoop's ``numReduceTasks=0``): the mapper emits matching records
    and that IS the output.  The previous identity reduce cost a full
    shuffle plus one applyInPandas group per surviving doc for a no-op;
    map-only drops the exchange entirely, so at 100 TB the job is a
    pure parallel scan."""
    pat = re.compile(r"fast (scan|merge|sort)")

    def mapper(doc_id: str, text: str):
        if pat.search(text):
            yield doc_id, text

    return map_reduce(_docs_kv(spark, sf_dir), mapper, reducer=None)


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


# ---------------------------------------------------------------------------
# Co-occurrence mining (the MapReduce-textbook "pairs" pattern),
# DataFrame-native: which parts sell together?
# ---------------------------------------------------------------------------

_BASKET_MIN_SUPPORT = 2


@register(
    "basket_pairs",
    oracle=f"""
    WITH t AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM t),
    cnt AS (SELECT l_partkey, COUNT(*) AS c FROM t GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM t a JOIN t b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb
      HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
    )
    SELECT p.pa, p.pb, p.support,
           ROUND(CAST(p.support AS DOUBLE) * n.n_orders
                 / (ca.c * cb.c), 6) AS lift
    FROM pairs p
    JOIN cnt ca ON ca.l_partkey = p.pa
    JOIN cnt cb ON cb.l_partkey = p.pb
    CROSS JOIN n
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same order
    with support ≥ 2, plus lift — the association-rule screen, and the
    MapReduce textbook's "pairs" pattern (mapper emits one (item_a,
    item_b) key per in-basket pair, reducer counts) expressed as a
    self-equi-join + hash-agg.

    100 TB shape: the self-join is on the BASKET key, so the pair
    expansion is Σ k_i² over per-basket item counts — bounded by the
    max basket size (13 here; retail baskets are dozens, never
    millions), NOT by catalog size; the pair aggregation partial-
    combines map-side exactly like word count.  The per-item count
    table scales with |catalog| — billions of distinct parts at
    100 TB — so its two lift joins are deliberately UNHINTED plain
    equi-joins: AQE broadcasts them while the catalog is small (it
    does at fixture scale) and falls back to a shuffle join when it
    is not, which a forced broadcast() would forbid.  Only the order
    total is a guaranteed 1-row broadcast.  Lift's division is
    IEEE-deterministic on identical integer operands, rounded to 6.
    The "stripes" refinement (one map per item) trades shuffle rows
    for map-side memory — pairs is the right default when baskets are
    small and items many."""
    t = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = t.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    cnt = t.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = t.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = t.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BASKET_MIN_SUPPORT)
    )
    ca = cnt.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb"))
    return (
        pairs.join(ca, "pa")
        .join(cb, "pb")
        .crossJoin(F.broadcast(n))
        .select(
            "pa",
            "pb",
            "support",
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
