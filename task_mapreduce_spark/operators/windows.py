"""Window functions (SURVEY.md §2.5).

Top-k per group is MapReduce's reverse web-link-graph example (Dean &
Ghemawat §2.3: per target, the top source pages): in the DataFrame
world it's a window rank + filter, executed as shuffle-on-key +
sort-within-partition — the same physical shape as an MR secondary
sort, but planned and codegen'd by Catalyst.

Scale notes: every window below partitions by a high-cardinality key
(custkey / user_id), so state per window is small and the whole table
never funnels through one task.  A window with no partitionBy is the
one shape we never emit (single-partition bottleneck at any scale).

Determinism: every orderBy ends with a unique key (orderkey /
event_id), so rank/lag/frames are reproducible across engines and
across runs — a window over a non-unique ordering is nondeterministic
under parallel merge and would flake the value-hash.

Running/moving sums over doubles are frame-order-sensitive, and the
engines are free to sum a frame in different orders (DuckDB uses
segment trees); casting to fixed-scale decimal first makes the sum
exact and order-independent (functions/exact.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load


@register(
    "win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rk,
           CAST(dense_rank() OVER w AS BIGINT) AS drk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "win_analytic",
    oracle="""
    SELECT user_id, event_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(event_type) OVER w AS next_type,
           first_value(ts) OVER w AS first_ts,
           last_value(event_id) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_event,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per user session stream — the building block
    of sessionization and delta encoding."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("ts").over(w).alias("first_ts"),
        F.last("event_id").over(w_full).alias("last_event"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "win_frame_running",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(24,4))) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_sum,
           CAST(SUM(CAST(value AS DECIMAL(24,4))) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) /
           CAST(COUNT(*) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS moving_avg4
    FROM events
    """,
)
def win_frame_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 4-row moving average with explicit ROWS frames.
    Sums go through decimal so frame-evaluation order can't move the
    result by an ulp (both engines then divide once, deterministically)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-3, Window.currentRow)
    dec = F.col("value").cast("decimal(24,4)")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(dec).over(run).cast("double").alias("running_sum"),
        (
            F.sum(dec).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov).cast("bigint")
        ).alias("moving_avg4"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_near,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(24,4))) OVER w AS DOUBLE)
             AS sum_near
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based frame (RANGE, not ROWS): per customer, how many of
    their orders fall within ±10k of each order's price, and their
    price mass.  Range frames are keyed on the ORDER BY value, so ties
    share a frame and no unique-key tiebreak is needed — the frame is a
    pure function of the data."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_near"),
        F.sum(F.col("o_totalprice").cast("decimal(24,4)"))
        .over(w)
        .cast("double")
        .alias("sum_near"),
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (the reverse web-link-graph shape).
    One shuffle on the group key; Spark pushes a per-partition rank
    limit (WindowGroupLimit) so partitions drop rows past k before the
    sort completes — this stays O(k per group) at 100 TB."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist per customer — the distribution-rank
    half of the ranking family (win_rank covers the ordinal half).
    Both are integer-ratio functions ((rank−1)/(n−1), rn/n), so with the
    unique (totalprice, orderkey) order key the doubles are single IEEE
    divisions of integers — bit-identical across engines, no rounding
    needed.  Same single-shuffle window shape as win_rank."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
