"""Scale-technique operators: the join/layout/sampling machinery a
100 TB deployment leans on, demonstrated as oracle-checkable keys.

Each key isolates ONE technique the rest of the engine assumes
(SCALE.md documents the rationale; SURVEY.md §2.10-extensions lists
the keys):

- ``tpch_q5``        — the full 6-table local-supplier join (adds the
                       supplier⋈customer nation-equality that
                       ``join_multiway`` omits).
- ``join_bucketed``  — co-located join over pre-bucketed tables: the
                       ONLY shuffle in the plan is the final
                       aggregation, asserted in tests/test_plans.py.
- ``join_skew_salted`` — hot-key-proof shuffle join: dim replicated
                       ×SALT, fact salted deterministically, so one
                       hot key spreads over SALT reducers.
- ``sample_hash``    — deterministic hash sampling (md5 prefix) with
                       unbiased scale-up estimates; the same rows are
                       chosen on every engine and every run.
- ``sink_compact``   — small-files governance: range-clustered,
                       size-bounded parquet output (compaction).

No key collects data to the driver; every Python-side literal is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from task_mapreduce_spark.functions.exact import dsum, dsum_exact, sql_dsum, sql_dsum_exact
from task_mapreduce_spark.operators.joins import _REVENUE_SQL, revenue_col
from task_mapreduce_spark.operators.relational import _work_dir
from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load


# ---------------------------------------------------------------------------
# tpch_q5 — local-supplier volume: the classic 6-table join
# ---------------------------------------------------------------------------


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name, {sql_dsum_exact(_REVENUE_SQL)} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation where the supplier is LOCAL
    to the customer (s_nationkey = c_nationkey) — the constraint that
    makes Q5 harder than a star join, because customer joins the fact
    chain on TWO keys from different tables.

    Shape for 100 TB: region⋈nation (5 rows) broadcasts into supplier,
    and that still-small result (suppliers of one region) broadcasts
    into lineitem — so the biggest table is filtered to ~1/5 of its
    rows before the first shuffle.  Only orders⋈lineitem and
    customer⋈orders shuffle, both on their natural keys; the
    nation-equality rides along as a post-join filter predicate on
    already-co-located rows."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    local_sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = revenue_col()
    return (
        li.join(F.broadcast(local_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum_exact(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# join_bucketed — co-located join, zero join-side shuffle
# ---------------------------------------------------------------------------

_BUCKETS = 8


@register(
    "join_bucketed",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS total
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both tables pre-hashed into the same
    number of buckets on the join key, so the join needs NO exchange at
    all — bucket i of orders joins bucket i of customer where it sits.

    This is THE repeated-join amortization at 100 TB: pay one shuffle
    at ingest (the bucketed write), then every subsequent join on that
    key is shuffle-free regardless of data size.  ``sortBy`` inside
    each bucket additionally removes the sort of the sort-merge join.
    tests/test_plans.py asserts the executed plan's only Exchange is
    the final aggregation's.

    The ``merge`` hint pins a sort-merge join: at test scale Catalyst
    would otherwise broadcast the small side, which is exactly the
    strategy bucketing exists to replace when both sides are large."""
    base = _work_dir("bucketed")
    sides = [
        ("orders", "o_custkey", ["o_orderkey", "o_custkey", "o_totalprice"]),
        ("customer", "c_custkey", ["c_custkey", "c_mktsegment"]),
    ]
    for name, key, cols in sides:
        tbl = f"tmrs_bucketed_{name}"
        (
            load(spark, sf_dir, name)
            .select(*cols)
            .write.bucketBy(_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .option("path", f"{base}/{tbl}")
            .format("parquet")
            .saveAsTable(tbl)
        )
    o = spark.table("tmrs_bucketed_orders")
    c = spark.table("tmrs_bucketed_customer").hint("merge")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# join_skew_salted — hot keys spread over SALT reducers
# ---------------------------------------------------------------------------

_SALT = 8


@register(
    "join_skew_salted",
    oracle=f"""
    SELECT s.s_name,
           COUNT(*) AS n_items,
           {sql_dsum_exact(_REVENUE_SQL)} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_name
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join — the skew defense when the build side is
    too big to broadcast and one key is hot.  Fact rows get a
    deterministic salt in [0, SALT) from their own (non-join) columns;
    the dim side is replicated once per salt value; the join key
    becomes (key, salt), so a key carrying 50% of the fact spreads over
    SALT reducers instead of melting one.

    Semantics-preserving by construction (each fact row still matches
    exactly its one dim row), so the oracle is the plain unsalted join.
    The ``shuffle_hash`` hint forces the shuffle path the technique
    targets — with broadcast allowed the demo would degenerate.  AQE's
    skew-join split solves the same problem reactively for sort-merge
    joins; salting is the proactive form that also covers hash joins
    and streaming state."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice", "l_discount"
    )
    fact = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT))
    )
    dim = (
        load(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1))))
        .withColumn("salt", F.col("salt").cast("long"))
    )
    revenue = revenue_col()
    return (
        fact.join(
            dim.hint("shuffle_hash"),
            (fact.l_suppkey == dim.s_suppkey) & (fact.salt == dim.salt),
        )
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_exact(revenue).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# sample_hash — deterministic, engine-portable hash sampling
# ---------------------------------------------------------------------------

# md5 hex < _SAMPLE_HEX  ⇔  first byte in 0x00.._SAMPLE_NUM-1  ⇔
# _SAMPLE_NUM/256 ≈ 5.08 %.  The threshold literal is DERIVED from the
# numerator so the filter, the oracle, and the estimate cannot drift.
_SAMPLE_NUM, _SAMPLE_DEN = 13, 256
_SAMPLE_HEX = f"{_SAMPLE_NUM:02x}"


@register(
    "sample_hash",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_sampled,
           CAST(COUNT(*) * {_SAMPLE_DEN} AS DOUBLE) / {_SAMPLE_NUM} AS n_estimated,
           {sql_dsum('o_totalprice')} AS sampled_total
    FROM orders
    WHERE md5(CAST(o_orderkey AS VARCHAR)) < '{_SAMPLE_HEX}'
    GROUP BY o_orderpriority
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash sampling: keep a row iff md5(key) falls below a threshold.

    Unlike ``TABLESAMPLE``/``df.sample`` this is deterministic and
    engine-portable — the SAME rows are selected on every run, every
    engine, every partitioning, which makes samples joinable across
    tables (sample orders and their lineitems by hashing the same key)
    and results reproducible.  At 100 TB the filter is a narrow
    projection evaluated at scan time: no shuffle, no coordination, and
    downstream work shrinks by the sampling factor.  The scale-up
    estimate is unbiased because md5 output is uniform on [0, 2^128).
    """
    o = load(spark, sf_dir, "orders")
    sampled = o.filter(F.md5(F.col("o_orderkey").cast("string")) < _SAMPLE_HEX)
    return sampled.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        (F.count(F.lit(1)).cast("double") * _SAMPLE_DEN / _SAMPLE_NUM).alias(
            "n_estimated"
        ),
        dsum("o_totalprice").alias("sampled_total"),
    )


# ---------------------------------------------------------------------------
# sink_compact — range-clustered, size-bounded output files
# ---------------------------------------------------------------------------

_MAX_RECORDS_PER_FILE = 5000


@register(
    "sink_compact",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           min(ts) AS min_ts,
           max(ts) AS max_ts
    FROM events
    GROUP BY event_type
    """,
)
def sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction / layout governance: rewrite events range-clustered
    by ts with a per-file row cap, then answer from the compacted copy.

    Streaming ingest produces millions of tiny files; at 100 TB the
    fix is periodic compaction into (a) files of bounded size — the
    ``maxRecordsPerFile`` cap, so no file exceeds what one task can
    scan — and (b) a RANGE clustering on the dominant filter column, so
    every file covers a narrow ts interval and parquet min/max stats
    prune whole files for time-windowed queries.  tests/test_plans.py
    verifies both properties on the written files via pyarrow."""
    e = load(spark, sf_dir, "events")
    out = f"{_work_dir('compact')}/events"
    (
        e.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", _MAX_RECORDS_PER_FILE)
        .parquet(out)
    )
    back = spark.read.schema(e.schema).parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


# ---------------------------------------------------------------------------
# Z-order clustering (multi-dimensional file pruning)
# ---------------------------------------------------------------------------

_Z_BITS = 8  # 8 bits per dimension → 16-bit morton codes
_Z_EPOCH = "1992-01-01"


def _morton_sql(x: str, y: str) -> str:
    """Bit-interleave two {0..255} ints with engine-portable arithmetic
    (%, >=, CASE — no shift operators, which the two SQL dialects
    spell differently)."""
    terms = []
    for i in range(_Z_BITS):
        p = 2**i
        terms.append(f"(CASE WHEN ({x} % {2 * p}) >= {p} THEN {4**i} ELSE 0 END)")
        terms.append(f"(CASE WHEN ({y} % {2 * p}) >= {p} THEN {2 * 4**i} ELSE 0 END)")
    return " + ".join(terms)


_Z_AGG = f"""
    SELECT morton // 256 AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(x8) AS BIGINT) AS x_lo, CAST(MAX(x8) AS BIGINT) AS x_hi,
           CAST(MIN(y8) AS BIGINT) AS y_lo, CAST(MAX(y8) AS BIGINT) AS y_hi
    FROM z GROUP BY morton // 256
"""


@register(
    "sink_zorder",
    oracle=f"""
    WITH d AS (
      SELECT o_custkey % 256 AS x8,
             date_diff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) % 256 AS y8
      FROM orders
    ),
    z AS (SELECT x8, y8, {_morton_sql('x8', 'y8')} AS morton FROM d)
    {_Z_AGG}
    """,
)
def sink_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustered rewrite of orders on two dimensions
    at once — the OPTIMIZE ZORDER idiom: range-clustering by the
    interleaved bits of (custkey, order-day) keeps per-file min/max
    spans narrow on BOTH columns, so parquet stats prune files for
    either filter dimension, not just the sort leader.

    The morton code is pure integer arithmetic on bucketed dims
    (engine-portable, deterministic); the write is range-partitioned
    and sorted by it with a per-file row cap (tests assert the written
    files' morton ranges are disjoint and their x/y spans bounded).
    The returned aggregate certifies the clustering: per 256-code
    z-bucket, both dimensions' spans stay ≤ 2^(bits/2) wide instead of
    the full 0..255 — exactly the locality file skipping needs.
    """
    o = load(spark, sf_dir, "orders")
    d = o.select(
        (F.col("o_custkey") % 256).alias("x8"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date")
            )
            % 256
        ).alias("y8"),
    )
    z = d.withColumn("morton", F.expr(_morton_sql("x8", "y8")))
    out = f"{_work_dir('zorder')}/orders"
    (
        z.repartitionByRange(8, "morton")
        .sortWithinPartitions("morton")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", _MAX_RECORDS_PER_FILE)
        .parquet(out)
    )
    back = spark.read.schema(z.schema).parquet(out)
    return (
        back.withColumn("zbucket", F.expr("morton div 256"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.min("x8").cast("bigint").alias("x_lo"),
            F.max("x8").cast("bigint").alias("x_hi"),
            F.min("y8").cast("bigint").alias("y_lo"),
            F.max("y8").cast("bigint").alias("y_hi"),
        )
    )


# ---------------------------------------------------------------------------
# join_bloom — Bloom-filter-prefiltered join (semi-join pushdown at scale)
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 14       # 16,384 bits = 256 longs = a 2 KB broadcast
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 3                # hash functions; FPP ≈ (1-e^(-kn/m))^k


def _bloom_test(key_sql: str, seed: int) -> "F.Column":
    """Membership probe: bit (xxhash64(key, seed) mod m) is set in the
    broadcast ``bloom`` array of 64-bit words."""
    pos = f"pmod(xxhash64({key_sql}, {seed}), {_BLOOM_BITS})"
    return F.expr(
        f"(element_at(bloom, CAST({pos} DIV 64 AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))) != 0"
    )


@register(
    "join_bloom",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 9000
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join with an explicit Bloom-filter pre-filter: revenue by order
    priority for orders whose customer has an account balance > 9000.

    The technique this key isolates: when the dim side is too large to
    broadcast as ROWS but its qualifying KEY SET fits a few KB as bits,
    build a Bloom filter over the dim keys (3 linear aggregations:
    hash→bit positions→bit_or per word), broadcast the 256-long array,
    and drop non-matching fact rows BEFORE the join shuffle.  False
    positives are removed by the real equi-join that follows, so the
    result is exact — the bloom only prunes shuffle volume (at TPC-H
    selectivity ~10% of customers qualify, so ~90% of the orders scan
    never enters the exchange).  This is the manual, engine-visible
    form of Spark's own runtime-filter/semi-join pushdown, kept
    explicit so the plan can be asserted; xxhash64 is Spark-native and
    the filter never needs oracle parity because it is semantically
    invisible.

    100 TB: bloom build is a narrow scan of the dim keys; m/k tune by
    the standard FPP formula (2 KB here; a 1 B-key dim wants ~GB-scale
    bits, at which point Spark's built-in bloom on a sampled key range
    or a partitioned semi-join takes over — SCALE.md discusses the
    crossover)."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    pos_cols = [
        F.pmod(F.xxhash64(F.col("c_custkey"), F.lit(i)), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_K)
    ]
    bits = cust.select(F.explode(F.array(*pos_cols)).alias("pos")).select(
        F.expr("CAST(pos DIV 64 AS INT)").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    )
    words = bits.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
    bloom = words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_WORDS - 1)),
            lambda w: F.coalesce(
                F.try_element_at(F.col("m"), w), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )
    o = load(spark, sf_dir, "orders")
    pre = o.crossJoin(F.broadcast(bloom))
    for i in range(_BLOOM_K):
        pre = pre.filter(_bloom_test("o_custkey", i))
    return (
        pre.join(cust, pre["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )
