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


# ---------------------------------------------------------------------------
# agg_quantile_merge
# ---------------------------------------------------------------------------


def _qm_quantiles_from_hist(hist: dict[int, int], pcts) -> dict[int, int]:
    """Pure-python quantile read over a {bin: cnt} histogram — the
    same all-integer rule the operator and oracle use."""
    total = sum(hist.values())
    out = {}
    cum = 0
    reads = sorted(pcts)
    bins = sorted(hist)
    i = 0
    for b in bins:
        cum += hist[b]
        while i < len(reads) and 100 * cum >= reads[i] * total:
            out[reads[i]] = b
            i += 1
    return out


def test_quantile_merge_equals_recompute_any_split(spark, sf_dir):
    # merged-partial quantiles must be BIT-equal to the from-scratch
    # single-pass read for ANY grouping of days — integer addition is
    # associative/commutative, so every split lands identically
    from task_mapreduce_spark.operators.aggregations import _QM_PCTS

    e = load(spark, sf_dir, "events")
    rows = (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.floor("value").cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    # from-scratch histogram (ignores days entirely)
    full: dict[int, int] = {}
    for r in rows:
        full[r["bin"]] = full.get(r["bin"], 0) + r["cnt"]
    want = _qm_quantiles_from_hist(full, _QM_PCTS)

    # three different day-splits, merged per-split then combined
    days = sorted({r["day"] for r in rows})
    for pivot in (1, len(days) // 2, len(days) - 1):
        g1 = set(days[:pivot])
        h1: dict[int, int] = {}
        h2: dict[int, int] = {}
        for r in rows:
            h = h1 if r["day"] in g1 else h2
            h[r["bin"]] = h.get(r["bin"], 0) + r["cnt"]
        merged = dict(h1)
        for b, c in h2.items():
            merged[b] = merged.get(b, 0) + c
        assert merged == full, f"split {pivot}: merged hist drifted"
        assert _qm_quantiles_from_hist(merged, _QM_PCTS) == want

    # and the registered key (persist → reload → merge) agrees
    got = {
        r["q_pct"]: r["est_value"]
        for r in QUERIES["agg_quantile_merge"](spark, sf_dir).collect()
    }
    assert got == want


def test_quantile_merge_reads_are_valid_quantiles(spark, sf_dir):
    # each read's cumulative count actually reaches ceil(q*N), and the
    # previous bin's cumulative count does not (minimality)
    out = {
        r["q_pct"]: r
        for r in QUERIES["agg_quantile_merge"](spark, sf_dir).collect()
    }
    assert set(out) == {25, 50, 75, 90, 99}
    e = load(spark, sf_dir, "events")
    n = e.count()
    for q, r in out.items():
        assert r["total_n"] == n
        assert 100 * r["cum_at"] >= q * n
        below = e.filter(F.floor("value") < r["est_value"]).count()
        assert 100 * below < q * n, "not the MINIMAL satisfying bin"
        assert r["n_days"] >= 1 and r["n_partial_rows"] >= r["n_days"]
