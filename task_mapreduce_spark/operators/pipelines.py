"""End-to-end composite pipelines: multiple registered operators
CHAINED as one plan — the proof that the surface composes the way a
production pipeline uses it, with Catalyst optimizing across the
stage boundaries (filters from a later stage push below an earlier
stage's projections; one shuffle serves adjacent stages keyed alike).

- ``pipeline_corpus_e2e`` — the canonical pre-training data pass:
  quality gate → exact dedup → deterministic split → per-(split, lang)
  accounting.  Each stage is the registered operator's logic applied
  in sequence (gate = corpus_filter's length screen, dedup =
  dedup_exact's min-id-per-digest, split = split_train_test's portable
  hash), composed as ONE declarative plan.
- ``pipeline_events_e2e`` — the product-analytics pass: sessionize
  (imported from the registered operator, literally the same function)
  → per-user engagement → session-count distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from task_mapreduce_spark.operators.training_pipeline import sessionize_events
from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load

_MIN_TOKENS = 40  # the corpus gate: drop stubs below 40 tokens


@register(
    "pipeline_corpus_e2e",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_toks
      FROM documents
      WHERE len(string_split(text, ' ')) >= {_MIN_TOKENS}
    ),
    canon AS (
      SELECT MIN(doc_id) AS keep
      FROM gated GROUP BY sha256(lower(trim(text)))
    ),
    kept AS (
      SELECT g.* FROM gated g JOIN canon c ON g.doc_id = c.keep
    )
    SELECT CASE WHEN b < 8 THEN 'train'
                WHEN b = 8 THEN 'valid'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens_total
    FROM (
      SELECT lang, n_toks,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 10
               AS b
      FROM kept
    )
    GROUP BY split, lang
    """,
)
def pipeline_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus prep end-to-end: length gate → exact dedup (min doc_id
    per normalized sha256 digest) → portable-hash 80/10/10 split →
    per-(split, lang) document/token accounting.

    The composition is the point: the gate is a scan-side filter, so
    the dedup window hashes only surviving docs; the dedup shuffle
    carries (digest, id, n_toks) — never text — and the final
    accounting is a tiny hash-agg.  One narrow scan, one digest-keyed
    shuffle, one 15-group agg: the whole pre-training pass costs ONE
    pass over the corpus at 100 TB, which is why these stages belong
    in one engine instead of three jobs with parquet hops between."""
    d = load(spark, sf_dir, "documents")
    gated = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split("text", " ")).alias("n_toks"),
    ).filter(F.col("n_toks") >= _MIN_TOKENS)
    h = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    w = Window.partitionBy("h").orderBy("doc_id")
    kept = (
        gated.withColumn("h", h)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "valid").otherwise("test")
    )
    return kept.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens_total"),
    )


@register(
    "pipeline_events_e2e",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, us,
             CASE WHEN LAG(us) OVER w IS NULL
                    OR us - LAG(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT user_id, us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM m
    ),
    sess AS (
      SELECT user_id, session_seq, COUNT(*) AS n_events
      FROM s GROUP BY user_id, session_seq
    ),
    users AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(n_events) AS BIGINT) AS total_events
      FROM sess GROUP BY user_id
    )
    SELECT n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(total_events) AS DOUBLE) / COUNT(*) AS avg_events_per_user
    FROM users
    GROUP BY n_sessions
    ORDER BY n_sessions
    """,
)
def pipeline_events_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement distribution end-to-end, composed ON TOP of the
    registered ``sessionize_events`` operator (the same function,
    imported — not a re-implementation): sessions → per-user
    engagement → how many users have N sessions, with their average
    event volume.

    Composition shape: sessionize's one user-keyed shuffle+sort feeds
    a per-user hash-agg that is ALREADY partitioned by user_id (no new
    exchange), and the final distribution is a |distinct session
    counts|-sized agg — metadata.  The integer division avg is exact
    IEEE on identical operands, so no rounding is needed for parity."""
    sess = sessionize_events(spark, sf_dir)
    users = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
    )
    return (
        users.groupBy("n_sessions")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (
                F.sum("total_events").cast("double") / F.count(F.lit(1))
            ).alias("avg_events_per_user"),
        )
        .orderBy("n_sessions")
    )
