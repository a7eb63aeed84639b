"""Property-based tests (SURVEY.md §5.4): algebraic identities every
relational engine must satisfy, over hypothesis-generated frames.
These catch operator-composition bugs the example-based oracle tests
can't (they only check the specific registered queries)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=5),
        st.sampled_from(["x", "y", "z", None]),
    ),
    min_size=0,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "a INT, b INT, s STRING")


@_SETTINGS
@given(rows=ROWS)
def test_filter_composition(spark, rows):
    df = _df(spark, rows)
    p, q = F.col("a") > 0, F.col("b") < 3
    assert df.filter(p).filter(q).count() == df.filter(p & q).count()


@_SETTINGS
@given(rows=ROWS)
def test_union_all_counts_add(spark, rows):
    df = _df(spark, rows)
    assert df.unionByName(df).count() == 2 * df.count()


@_SETTINGS
@given(rows=ROWS)
def test_distinct_idempotent(spark, rows):
    df = _df(spark, rows)
    d1 = df.distinct()
    assert d1.count() == d1.distinct().count()
    assert d1.count() <= max(df.count(), 0) if rows else d1.count() == 0


@_SETTINGS
@given(rows=ROWS, k=st.integers(min_value=1, max_value=10))
def test_topk_is_prefix_of_sort(spark, rows, k):
    df = _df(spark, rows)
    order = [F.desc("a"), F.asc("b"), F.asc_nulls_last("s")]
    full = [tuple(r) for r in df.orderBy(*order).collect()]
    top = [tuple(r) for r in df.orderBy(*order).limit(k).collect()]
    assert top == full[:k]


@_SETTINGS
@given(rows=ROWS)
def test_subtract_intersect_partition(spark, rows):
    # distinct rows split exactly into (∩ evens) ⊎ (∖ evens)
    df = _df(spark, rows).select("a").distinct()
    evens = df.filter(F.col("a") % 2 == 0)
    inter = df.intersect(evens).count()
    diff = df.subtract(evens).count()
    assert inter + diff == df.count()


@_SETTINGS
@given(rows=ROWS)
def test_groupby_count_totals(spark, rows):
    df = _df(spark, rows)
    per_group = df.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    total = per_group.agg(F.sum("c")).first()[0]
    assert (total or 0) == df.count()


@_SETTINGS
@given(rows=ROWS)
def test_explode_inverse_of_collect(spark, rows):
    df = _df(spark, rows)
    n = df.filter(F.col("s").isNotNull()).count()
    regrouped = (
        df.filter(F.col("s").isNotNull())
        .groupBy("b")
        .agg(F.collect_list("s").alias("ss"))
        .select(F.explode("ss"))
        .count()
    )
    assert regrouped == n
