"""Corpus-management operators a training-data pipeline runs between
ingest and tokenization: language identification, deterministic
train/valid/test splitting, and PII redaction.

All three are mandated LLM-pipeline surface (SURVEY.md §2.10): the
driver brief names language-ID explicitly; splits and redaction are
the governance steps every corpus pass ends with.

Scale notes (SCALE.md "corpus tools"):

- ``text_langid``  — the learned profile is 5 langs × 20 tokens
  (O(1)), so classification is corpus-scan ⋈ broadcast(profile):
  the 100 TB corpus shuffles only (doc_id, lang, candidate) partial
  score rows, never text.  Training aggregates (lang, token) counts
  with map-side combine — bounded by vocabulary, not corpus size.
- ``split_train_test`` — a pure deterministic hash map (no RNG, no
  state), so the split is reproducible across engines, runs, and
  backfills; adding data never reassigns an existing document.
- ``pii_redact``   — a narrow regex map that stays inside
  WholeStageCodegen; at scale it is I/O-bound, exactly what you want
  for a full-corpus scrub pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load

# Top-K tokens kept per language profile; 5 test docs in 5 langs keep
# K*langs = 100 profile rows — broadcastable at ANY corpus size since
# it is bounded by vocabulary rank, not document count.
_LANGID_TOPK = 20


@register(
    "text_langid",
    oracle=f"""
    WITH train AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id % 5 <> 0
    ),
    prof AS (
      SELECT lang AS cand_lang, tok, COUNT(*) AS c
      FROM train
      GROUP BY lang, tok
      QUALIFY row_number()
        OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, tok) <= {_LANGID_TOPK}
    ),
    test AS (
      SELECT doc_id, lang AS true_lang, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id % 5 = 0
    ),
    scores AS (
      SELECT t.doc_id, t.true_lang, p.cand_lang, SUM(p.c) AS score
      FROM test t JOIN prof p ON t.tok = p.tok
      GROUP BY t.doc_id, t.true_lang, p.cand_lang
    )
    SELECT doc_id, cand_lang AS pred_lang, true_lang,
           (cand_lang = true_lang) AS is_correct
    FROM scores
    QUALIFY row_number()
      OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang) = 1
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-profile language identification, trained on the corpus
    itself: an 80% split (doc_id % 5 != 0) builds per-language
    top-K token-frequency profiles; the 20% holdout is classified by
    summed profile weight (argmax, ties broken by language name so the
    result is deterministic).

    The unigram profile is the degenerate-n case of Cavnar & Trenkle's
    classic n-gram rank profiling — the fixture corpus is
    space-tokenized, so tokens ARE the n-grams.  Both ranking windows
    order by (count DESC, token ASC): a unique sort key, per the
    repo-wide determinism invariant."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    train = docs.filter(F.col("doc_id") % 5 != 0).select(
        "lang", F.explode(toks).alias("tok")
    )
    counts = train.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    w_rank = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    prof = (
        counts.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _LANGID_TOPK)
        .select(F.col("lang").alias("cand_lang"), "tok", "c")
    )
    test = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.col("lang").alias("true_lang"), F.explode(toks).alias("tok")
    )
    scores = (
        test.join(F.broadcast(prof), "tok")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.sum("c").alias("score"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("cand_lang")
    )
    return (
        scores.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("cand_lang").alias("pred_lang"),
            "true_lang",
            (F.col("cand_lang") == F.col("true_lang")).alias("is_correct"),
        )
    )


@register(
    "split_train_test",
    oracle="""
    SELECT CASE WHEN b < 8 THEN 'train'
                WHEN b = 8 THEN 'valid'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
    FROM (
      SELECT lang, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 10
               AS b
      FROM documents
    )
    GROUP BY split, lang
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by portable
    48-bit md5 hash of the document id, summarized per (split, lang)
    so stratification skew is visible at a glance.

    Hash-based (not random) splitting is the production discipline:
    the assignment is a pure function of the id, so re-runs, engine
    swaps, and incremental backfills can never leak a document across
    splits.  Uses the repo's portable hash idiom (CLAUDE.md):
    ``conv(substr(md5(id),1,12),16,10)`` ≡ DuckDB
    ``('0x'||substr(md5(id),1,12))::BIGINT``."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "valid").otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )


# Digit runs of 6+ look like account numbers — the redaction target in
# the fixture's ``Customer#000000042`` names.  One pattern string shared
# by matcher and counter so they can never drift apart.
_PII_PATTERN = "[0-9]{6,}"


@register(
    "pii_redact",
    oracle=f"""
    SELECT c_custkey,
           regexp_replace(c_name, '{_PII_PATTERN}', '[ACCT]', 'g') AS name_redacted,
           CAST(len(regexp_extract_all(c_name, '{_PII_PATTERN}')) AS INTEGER)
             AS n_redacted
    FROM customer
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: mask account-number-like digit runs in customer
    names, reporting per-row how many spans were masked (the audit
    column a governance pipeline logs).

    Engine notes: Spark ``regexp_replace`` is replace-ALL by default;
    DuckDB needs the explicit ``'g'`` flag (CLAUDE.md invariant).  The
    span count comes from ``regexp_extract_all`` so the matcher and
    the counter share one pattern.  The whole op is a stateless narrow
    map — streaming-safe, and at 100 TB it runs at scan speed inside
    WholeStageCodegen with no shuffle at all."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace(F.col("c_name"), _PII_PATTERN, "[ACCT]").alias(
            "name_redacted"
        ),
        F.size(F.regexp_extract_all(F.col("c_name"), F.lit(_PII_PATTERN), 0))
        .cast("int")
        .alias("n_redacted"),
    )
