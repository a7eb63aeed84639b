"""Golden/bounds tests for aggregation keys without a value-hash oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from task_mapreduce_spark.registry import QUERIES
from task_mapreduce_spark.tables import load


def test_approx_distinct_within_bounds(spark, sf_dir):
    """Bound the RAW HLL estimate (the registered key outputs the
    certificate, not the engine-specific estimate)."""
    approx = {
        r["o_orderstatus"]: r["est"]
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("est"))
        .collect()
    }
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for status, est in approx.items():
        # rsd=0.02 → ±10% is a generous 5-sigma bound
        assert abs(est - exact[status]) <= max(2, 0.10 * exact[status]), status
    # and the registered key's certificate agrees
    cert = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    assert all(r["approx_within_10pct"] for r in cert)
    assert {r["o_orderstatus"]: r["exact_customers"] for r in cert} == exact


def test_approx_percentiles_track_exact(spark, sf_dir):
    """Bound the RAW t-digest-style estimates (the registered key
    outputs the certificate, not the engine-specific estimates)."""
    q = F.col("l_quantity")
    sketch = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.approx_percentile(q, F.lit(p), F.lit(10000)).alias(n)
                for p, n in ((0.25, "p25"), (0.50, "p50"), (0.75, "p75"))
            ]
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in QUERIES["agg_stats"](spark, sf_dir).collect()
    }
    assert set(sketch) == set(exact)
    for flag, (s25, s50, s75) in sketch.items():
        e25, e50, e75 = exact[flag]
        # l_quantity spans ~1..50; accuracy 10000 keeps estimates within
        # one integer step of the true quartile
        for s, e in ((s25, e25), (s50, e50), (s75, e75)):
            assert abs(s - e) <= 1.0, (flag, s, e)
    # and the registered key's certificate agrees
    cert = QUERIES["agg_stats_sketch"](spark, sf_dir).collect()
    assert all(r["approx_within_one"] for r in cert)


def test_approx_topk_matches_exact_in_heavy_hitter_regime(spark, sf_dir):
    """Over a key domain larger than k but within the sketch's
    maxItemsTracked budget (user_id distinct ≤ 10 000 at every test
    sf), reported counts must equal the exact counts — the sketch only
    starts approximating past that budget (events per user_id are
    near-uniform, so we compare count values, not ranks)."""
    from task_mapreduce_spark.tables import load

    e = load(spark, sf_dir, "events")
    exact = {
        r["user_id"]: r["cnt"]
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    sketch = (
        e.agg(F.expr("approx_top_k(user_id, 10)").alias("tk"))
        .select(F.explode("tk").alias("x"))
        .select("x.item", "x.count")
        .collect()
    )
    assert len(sketch) == 10
    for r in sketch:
        assert r["count"] == exact[r["item"]], (r, exact[r["item"]])
