"""Joins (SURVEY.md §2.3).

MapReduce heritage: the reduce-side join ("tag each input with its
source, group by join key, cross the groups in reduce") maps to Spark's
shuffled hash / sort-merge join; the map-side join against a small
replicated table maps to ``F.broadcast``.  Everything here is
declarative — Catalyst + AQE pick the physical strategy, and the code's
only job is to not defeat them (explicit broadcast for dims that are
always small, equi-keys present on every theta join so nothing ever
plans as a full cartesian BNLJ).

Scale notes per operator are inline; the common theme: each join below
shuffles on its equi-key only, and the ones with a small side declare
it, so every plan survives a 1000-executor / 100 TB scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from task_mapreduce_spark.functions.exact import dsum_exact, sql_dsum_exact
from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load


@register(
    "join_inner_hash",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (the MR reduce-side join): both sides shuffle on
    the key, then hash/sort-merge per partition.  No driver involvement,
    no broadcast — this is the shape for two BIG tables."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side join: nation (25 rows) and region (5 rows) are replicated
    to every executor, so the fact table never shuffles — at 100 TB this
    turns two wide shuffles into zero."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@register(
    "join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_custkey, o.n_big
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c
    FULL JOIN (
      SELECT o_custkey, COUNT(*) AS n_big
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
      GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with genuinely unmatched rows on BOTH sides
    (building-segment customers vs customers with big urgent orders).
    Outer joins can't broadcast the preserved side; this plans as a
    sort-merge join on the key — the scalable shape."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 200000))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_custkey", "n_big"
    )


@register(
    "join_semi_anti",
    oracle="""
    SELECT 'has_big' AS tag, c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    UNION ALL
    SELECT 'no_big' AS tag, c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence / absence via left_semi / left_anti: the probe side
    streams, the build side carries KEYS ONLY (no payload duplication,
    no row explosion) — strictly cheaper than inner join + distinct."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    cond = c.c_custkey == big.o_custkey
    semi = c.join(big, cond, "left_semi").select(
        F.lit("has_big").alias("tag"), "c_custkey"
    )
    anti = c.join(big, cond, "left_anti").select(
        F.lit("no_big").alias("tag"), "c_custkey"
    )
    return semi.unionByName(anti)


@register(
    "join_theta_range",
    oracle="""
    SELECT a.user_id, a.event_id AS a_event, b.event_id AS b_event,
           a.ts AS a_ts, b.ts AS b_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range self-join (event pairs within 1 h per user),
    planned as a BINNED equi-join: ``ts`` is truncated to hour bins,
    the probe side expands to its own bin plus the next one (a
    size-2 literal array explode — size-preserving, so no generator
    filter pathology), and the join key is ``(user_id, bin)`` with the
    exact range as a residual.  b.ts ∈ (a.ts, a.ts+1h] implies
    trunc(b.ts) ∈ {trunc(a.ts), trunc(a.ts)+1h}, so the binning is
    lossless, each qualifying pair matches exactly one probe row, and
    — unlike the bare (user_id) equi-join — one user's multi-year
    history shards across hour bins instead of funneling every pair
    through one task: per-task pair count is bounded by the events of
    two adjacent hours, not the user's lifetime."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    b = e.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_event"),
        F.col("ts").alias("b_ts"),
        F.date_trunc("hour", "ts").alias("b_bin"),
    )
    hour = F.expr("INTERVAL 1 HOUR")
    a = e.select(
        "user_id",
        F.col("event_id").alias("a_event"),
        F.col("ts").alias("a_ts"),
        F.explode(
            F.array(
                F.date_trunc("hour", "ts"),
                F.date_trunc("hour", "ts") + hour,
            )
        ).alias("bin"),
    )
    return a.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("bin") == F.col("b_bin"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + hour),
    ).select("user_id", "a_event", "b_event", "a_ts", "b_ts")


@register(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey
    FROM events e ASOF LEFT JOIN (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at-or-before each event) via the
    union-and-carry-forward idiom: tag both inputs, union, ONE shuffle
    on the key, ONE sort by (ts, order-first), then
    ``last(..., ignorenulls)`` carries the most recent order key forward
    to every event row.  Linear in input size, no per-key loop, no
    Python — the canonical distributed as-of.

    Orders are pre-deduped to one row per (custkey, orderdate) with a
    MAX(orderkey) tie-break so both engines resolve equal-timestamp
    matches identically."""
    e = load(spark, sf_dir, "events")
    o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    right = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
    )
    left = e.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(0).alias("is_order"),
        "event_id",
    )
    # At equal ts the order row sorts first (is_order desc), matching the
    # oracle's inclusive `e.ts >= o_orderdate`.
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").asc(), F.col("is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        right.unionByName(left)
        .withColumn("last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .filter(F.col("is_order") == 0)
        .select("event_id", F.col("k").alias("user_id"), "ts", "last_orderkey")
    )


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (1 - CAST(l_discount AS DECIMAL(6,4)))"
)


def revenue_col() -> F.Column:
    """Python twin of :data:`_REVENUE_SQL` — keep the two in lockstep:
    a precision change applied to one side only breaks bit-exact oracle
    parity for every revenue-summing key."""
    one = F.lit(1).cast("decimal(5,4)")
    return F.col("l_extendedprice").cast("decimal(12,4)") * (
        one - F.col("l_discount").cast("decimal(6,4)")
    )


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum_exact(_REVENUE_SQL)} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_shipdate  > TIMESTAMP '1997-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped end-to-end: segment filter → 3-table join →
    revenue agg → global top-10.  Every filter sits on its scan (pushed
    to parquet), the joins shuffle on their keys, and the final top-k is
    a TakeOrderedAndProject over 10 rows per partition — no global sort.
    Ties broken by the unique orderkey for a deterministic result set."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-07-01").cast("timestamp_ntz")
    )
    revenue = revenue_col()
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_exact(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "join_multiway",
    oracle=f"""
    SELECT n.n_name, {sql_dsum_exact(_REVENUE_SQL)} AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-table join: revenue per nation for one region
    and one order-year.  Dims (region, nation) broadcast; facts join
    small→large so each shuffle carries the already-filtered row set;
    the date/region filters sit on the scans where Catalyst pushes them
    into the parquet readers."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = revenue_col()
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .join(o, F.col("c_custkey") == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("n_name")
        .agg(
            dsum_exact(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum_exact(_REVENUE_SQL)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: top-20 customers by
    revenue lost to returns in one quarter (columns trimmed to the
    fixture's customer schema).

    Plan shape: the quarter filter and the returnflag filter both sit
    on their scans (pushed to parquet row groups), nation broadcasts
    into customer, and the two fact joins shuffle on their natural keys
    with the already-filtered row sets.  The final top-20 is a
    TakeOrderedAndProject (O(k) per partition, no global sort);
    revenue reuses the shared decimal-exact expression and ties break
    on the unique custkey."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = revenue_col()
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, F.col("c_custkey") == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_exact(revenue).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-customer query: the
    aggregate-then-HAVING-then-join-back plan shape (a decorrelated IN
    subquery).

    The qualifying-order set is computed FIRST — one fact-table
    hash-agg with map-side partials, then the >250 filter collapses it
    to a tiny key set — and the per-order quantity total is REUSED from
    that aggregate rather than re-joining lineitem a second time (the
    textbook form re-aggregates; reusing the partial is the plan you
    want at 100 TB, where lineitem is the table you never touch twice).
    Both subsequent joins shuffle on their natural keys with the
    already-collapsed row set.  l_quantity is integral in this corpus,
    so the BIGINT sum is exact on both engines; the top-100 plans as
    TakeOrderedAndProject with the unique orderkey as final tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey", F.col("q").cast("bigint").alias("sum_qty"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )
