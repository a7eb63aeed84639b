"""TPC-H round-out: Q4, Q6, Q14, Q19 shapes over the fixture star
schema (FIXTURES.md columns only — Q4/Q19 substitute the missing
commit/receipt-date and container columns with equivalent predicates on
the columns the fixtures do carry; the *plan shapes* the queries exist
to exercise are unchanged).

Why these four complete the TPC-H story already in the repo
(q1/q3/q5/q10/q18):

- ``tpch_q6``  — the pure scan-predicate-aggregate: zero joins, one
  partial+final agg; the benchmark's measure of raw scan throughput.
  At 100 TB this is the key that proves predicate pushdown + column
  pruning reach the parquet reader (tests/test_plans.py pins both).
- ``tpch_q14`` — fact⋈small-dim with a conditional aggregate ratio;
  ``part`` broadcasts, so the plan is scan→broadcast-hash-join→agg
  with NO shuffle before the single-row final agg.
- ``tpch_q4``  — EXISTS decorrelated to a left-semi join whose
  condition mixes both sides' columns (l_shipdate > o_orderdate + 90
  days): the semi join dedups matches engine-side instead of a
  DISTINCT-after-inner-join.
- ``tpch_q19`` — the OR-of-ANDs predicate across two tables: Catalyst
  factors the brand IN-set down to the ``part`` scan and the quantity
  envelope down to the ``lineitem`` scan, so both scans prune before
  the broadcast join evaluates the full disjunction.

All money sums go through the fixed-scale decimal discipline of
``functions/exact.py`` (order-independent, bit-identical to DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from task_mapreduce_spark.functions.exact import dsum_exact, sql_dsum_exact
from task_mapreduce_spark.operators.joins import _REVENUE_SQL, revenue_col
from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load


# ---------------------------------------------------------------------------
# tpch_q6 — forecasting revenue change (scan + predicate + agg, no join)
# ---------------------------------------------------------------------------

_Q6_DISC_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(6,4))"
)


def _q6_disc_col() -> F.Column:
    """Python twin of :data:`_Q6_DISC_SQL` (l_extendedprice * l_discount)."""
    return F.col("l_extendedprice").cast("decimal(12,4)") * F.col(
        "l_discount"
    ).cast("decimal(6,4)")


@register(
    "tpch_q6",
    oracle=f"""
    SELECT {sql_dsum_exact(_Q6_DISC_SQL)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would have been earned without the
    discount — a single filtered scan folded to one row.

    100 TB shape: the three predicates and the two-column projection
    all reach the parquet scan (PushedFilters + ReadSchema), so the
    stage reads a fraction of one column-chunk stripe per row group
    that survives min/max pruning on ``l_shipdate``.  The aggregate is
    a partial-per-partition + single final merge — no shuffle of data,
    only of one 2-field partial row per task."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_exact(_q6_disc_col()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q14 — promotion effect (broadcast dim join + conditional agg ratio)
# ---------------------------------------------------------------------------


@register(
    "tpch_q14",
    oracle=f"""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
           ROUND(100.0
                 * COALESCE({sql_dsum_exact(
                     f"CASE WHEN p.p_type = 'PROMO' THEN {_REVENUE_SQL} END")}, 0)
                 / {sql_dsum_exact(_REVENUE_SQL)}, 6) AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 per month: the share of 1996 revenue that came from
    PROMO parts (the fixture's ``p_type`` domain is flat, so the
    classic ``LIKE 'PROMO%'`` is an equality here).

    100 TB shape: ``part`` is the small side and broadcasts — lineitem
    never shuffles; the only exchange carries 12 per-month partial
    pairs per task.  The conditional sum rides the SAME join pass as
    the total (one scan, two accumulators), not two joins.  Month
    truncs are cast to DATE on both engines (DuckDB build drift —
    CLAUDE.md invariant)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = revenue_col()
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.date_trunc("month", F.col("l_shipdate"))
            .cast("date")
            .alias("ship_month")
        )
        .agg(
            F.round(
                F.lit(100.0)
                * F.coalesce(
                    dsum_exact(F.when(F.col("p_type") == "PROMO", rev)),
                    F.lit(0.0),
                )
                / dsum_exact(rev),
                6,
            ).alias("promo_pct")
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# tpch_q4 — order-priority checking (EXISTS → left-semi with mixed condition)
# ---------------------------------------------------------------------------


@register(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: orders per priority, in one quarter, that had
    at least one line item shipped more than 90 days after the order
    was placed (the fixtures carry no commit/receipt dates — the
    ship-lag predicate exercises the same decorrelated-EXISTS plan as
    the original's ``l_commitdate < l_receiptdate``).

    100 TB shape: the quarter filter prunes orders FIRST (partition /
    row-group pruning on ``o_orderdate``), then a LEFT SEMI join
    against lineitem on the order key carries the cross-side date
    predicate as the join's non-equi residual — the semi join emits
    each qualifying order once, so no DISTINCT pass and no row
    multiplication from multi-line orders."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# tpch_q19 — discounted revenue under an OR-of-ANDs cross-table predicate
# ---------------------------------------------------------------------------

_Q19_ARMS = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi) — three overlapping arms,
    # mirroring Q19's three (brand, container, quantity) disjuncts.
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#13", 10, 30, 10, 30),
    ("Brand#25", 20, 50, 20, 40),
)

_Q19_PRED_SQL = " OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
    f"AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in _Q19_ARMS
)


@register(
    "tpch_q19",
    oracle=f"""
    SELECT {sql_dsum_exact(_REVENUE_SQL)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {_Q19_PRED_SQL}
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue from three disjunctive
    (brand, size-range, quantity-range) arms evaluated across the
    lineitem⋈part join (the fixture substitutes ``p_size`` ranges for
    the missing ``p_container`` sets).

    The point is Catalyst's common-factor extraction: from the
    OR-of-ANDs it derives ``p_brand IN (…)`` pushed to the ``part``
    scan and the quantity envelope ``l_quantity BETWEEN 1 AND 40``
    pushed to the ``lineitem`` scan, so both sides prune rows BEFORE
    the broadcast join applies the exact disjunction as its residual.
    At 100 TB that pre-prune is the difference between joining the
    whole fact table and joining ~the qualifying slice."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arms = None
    for b, slo, shi, qlo, qhi in _Q19_ARMS:
        arm = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        arms = arm if arms is None else (arms | arm)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(arms)
        .agg(
            dsum_exact(revenue_col()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q7 — volume shipping between two nations (dim-alias double join)
# ---------------------------------------------------------------------------

# fixture stand-ins for FRANCE/GERMANY; this pair has bilateral volume
# at every generated sf, including the 100-customer sf0.001 fixture
_Q7_NATIONS = ("NATION_13", "NATION_19")


@register(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           {sql_dsum_exact(_REVENUE_SQL)} AS revenue
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}')
        OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year
    (the fixture's nation names substitute FRANCE/GERMANY).

    The interesting shape is the DOUBLE nation join — one dimension
    table joined twice under different roles (supplier's nation,
    customer's nation) with a cross-role disjunctive filter.  Both
    roles broadcast (25 rows); the nation-pair predicate can only be
    evaluated AFTER both joins, but each single-nation IN-set
    ``n_name IN (a, b)`` is factored below its own join side, so
    supplier and customer both prune to 2/25 of nations before the
    fact chain shuffles.  Year extraction is cast to INT on both
    engines (DuckDB ``year()`` returns BIGINT)."""
    two = list(_Q7_NATIONS)
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(two))
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    ).select("s_suppkey", "supp_nation")
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("ck"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"),
    ).select("c_custkey", "cust_nation")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == two[0]) & (F.col("cust_nation") == two[1]))
            | ((F.col("supp_nation") == two[1]) & (F.col("cust_nation") == two[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum_exact(revenue_col()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# tpch_q8 — national market share (conditional share over a 7-table join)
# ---------------------------------------------------------------------------

_Q8_NATION = "NATION_3"     # the share-holder (supplier side)
_Q8_REGION = "AMERICA"      # the market (customer side)
_Q8_PTYPE = "ECONOMY"


@register(
    "tpch_q8",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           ROUND(COALESCE({sql_dsum_exact(
               f"CASE WHEN n2.n_name = '{_Q8_NATION}' THEN {_REVENUE_SQL} END")}, 0)
                 / {sql_dsum_exact(_REVENUE_SQL)}, 6) AS mkt_share
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = '{_Q8_REGION}'
      AND p.p_type = '{_Q8_PTYPE}'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, by order year — the deepest join in the suite (7 tables,
    nation in two roles, region closing the customer side).

    100 TB shape: every dimension side collapses to a broadcast —
    part filtered to one type, supplier+nation to a (suppkey →
    nation-name) map, customer restricted to the market region via the
    nation⋈region broadcast chain — so the only shuffles are the
    lineitem⋈orders spine on the order key.  Share and total ride one
    aggregation pass as conditional/unconditional accumulators (the
    Q14 pattern over a deeper join)."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    n = load(spark, sf_dir, "nation")
    mkt_cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
                    F.col("n_nationkey").alias("ck")
                )
            ),
            F.col("c_nationkey") == F.col("ck"),
        )
        .select("c_custkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"),
                                 F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q8_PTYPE
    ).select("p_partkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = revenue_col()
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(mkt_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.coalesce(
                    dsum_exact(F.when(F.col("supp_nation") == _Q8_NATION, rev)),
                    F.lit(0.0),
                )
                / dsum_exact(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# tpch_q15 — top supplier (aggregate view + argmax-by-scalar-subquery)
# ---------------------------------------------------------------------------


@register(
    "tpch_q15",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum_exact(_REVENUE_SQL)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the top-revenue supplier for one quarter — an
    aggregate view consumed twice (per-supplier revenue AND its max),
    the classic scalar-subquery-over-own-aggregate shape.

    100 TB shape: the revenue view is |suppliers|-sized after ONE
    fact-table aggregation (map-side partials); its max is a 1-row
    aggregate broadcast back via crossJoin+filter — the repo's standing
    metadata-row pattern — so the fact table is scanned ONCE and never
    joined to itself.  Ties (multiple suppliers at the max) are kept,
    exactly like the spec's WHERE total_revenue = (SELECT MAX...)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_exact(revenue_col()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# tpch_q17 — small-quantity-order revenue (correlated avg decorrelated)
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#13"


@register(
    "tpch_q17",
    oracle=f"""
    WITH th AS (
      SELECT l_partkey AS pk,
             0.2 * ({sql_dsum_exact("CAST(l_quantity AS DECIMAL(12,4))")}
                    / COUNT(*)) AS threshold
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT {sql_dsum_exact("CAST(l.l_extendedprice AS DECIMAL(12,4))")} / 7.0
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN th    ON th.pk = l.l_partkey
    WHERE p.p_brand = '{_Q17_BRAND}'
      AND l.l_quantity < th.threshold
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand's
    parts — the correlated per-part average subquery, decorrelated to
    an aggregate-then-join (the fixtures carry no container column, so
    the brand filter stands alone).

    100 TB shape: the per-part threshold is ONE fact aggregation keyed
    exactly like the probe join (l_partkey), so threshold⋈lineitem
    reuses the aggregation's partitioning — Catalyst plans a single
    exchange for both.  The brand filter broadcasts through ``part``
    and prunes BEFORE the threshold join.  The quantity threshold is
    derived from a decimal-exact sum divided by the count: identical
    IEEE operands on both engines, so the `<` comparison can never
    flip on a last-ulp disagreement."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    th = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(12,4)"))
                .cast("decimal(24,4)")
                .cast("double")
                / F.count(F.lit(1))
            )
        ).alias("threshold")
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand") == _Q17_BRAND
    ).select("p_partkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(th, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,4)"))
                .cast("decimal(24,4)")
                .cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q22 — global-customer sales opportunity (scalar avg + anti join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,4))) AS DOUBLE)
               / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(24,4))) AS DOUBLE) AS totacctbal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    ORDER BY cntrycode
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: wealthy customers with no RECENT order (none since
    2000-01-01), per country — the spec's "unlikely to purchase
    again" screen; the fixtures carry no phone column, so the nation
    key stands in for the phone prefix, and the dense fixture order
    history makes "never ordered" empty, hence the recency window
    (same decorrelated NOT-EXISTS plan, the date rides the anti-join
    side's scan filter).

    The two classic sub-shapes: a scalar subquery (global positive-
    balance average) consumed as a broadcast 1-row crossJoin, and the
    NOT EXISTS decorrelated to a LEFT ANTI join on the customer key.
    100 TB: customer is scanned once for the average (2-column
    projection) and once for the probe; the anti join shuffles only
    customers above the average — the balance filter applies BEFORE
    the join, and orders contributes just its o_custkey column."""
    c = load(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(24,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ab")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(24,4)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# tpch_q13 — customer distribution (left join + two-phase aggregation)
# ---------------------------------------------------------------------------


@register(
    "tpch_q13",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed N orders — the two-phase
    aggregation over a LEFT join (customers with zero orders must
    appear in the N=0 bucket, which is what makes the outer join and
    the ``COUNT(column)`` null-skipping semantics load-bearing; the
    fixtures carry no comment column, so the spec's complaint-pattern
    exclusion is dropped).

    100 TB shape: the join and the first aggregation share the
    customer key, so Catalyst plans ONE exchange for both (orders
    pre-aggregates per custkey map-side before the join at scale via
    partial counts); the second aggregation's domain is |max orders
    per customer| — metadata.  Final order is on the aggregate pair,
    deterministic because (custdist, c_count) is unique by
    construction."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )
