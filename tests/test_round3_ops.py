"""Semantic-invariant tests for the round-3 operator additions:
fuzzy edit-distance dedup, unigram-NLL quality scoring, the
bloom-prefiltered join, per-group mode, and the event-transition
matrix.  Oracle parity at sf0.001/sf0.01 is covered by the global
parity sweep; these tests pin the properties parity alone can't see
(certificate bounds, bloom transparency, probability normalization)."""

from __future__ import annotations

import pyspark.sql.functions as F

from task_mapreduce_spark.registry import QUERIES
from task_mapreduce_spark.tables import load


def test_fuzzy_edit_certificates_hold(spark, sf_dir):
    rows = QUERIES["dedup_fuzzy_edit"](spark, sf_dir).collect()
    assert rows, "fixture plants near-duplicates; fuzzy dedup must find some"
    for r in rows:
        assert r["a"] < r["b"]
        assert r["jaccard"] >= 0.9
        assert r["edit_dist"] >= 0


def test_fuzzy_edit_relative_bound(spark, sf_dir):
    # re-derive the length bound from the source texts: every emitted
    # pair's edit distance is <= 10% of the longer text
    out = QUERIES["dedup_fuzzy_edit"](spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    ta = d.select(F.col("doc_id").alias("a"), F.length("text").alias("len_a"))
    tb = d.select(F.col("doc_id").alias("b"), F.length("text").alias("len_b"))
    bad = (
        out.join(ta, "a")
        .join(tb, "b")
        .filter(10 * F.col("edit_dist") > F.greatest("len_a", "len_b"))
        .count()
    )
    assert bad == 0


def test_perplexity_scores_every_doc(spark, sf_dir):
    out = QUERIES["quality_perplexity"](spark, sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    # -ln(p) >= 0 for p <= 1, and a token appearing at all has p > 0
    assert out.filter(F.col("nll_r") < 0).count() == 0
    # common-token boilerplate must score strictly below the corpus max
    mm = out.agg(F.min("nll_r").alias("lo"), F.max("nll_r").alias("hi")).first()
    assert mm["lo"] < mm["hi"]


def test_bloom_join_is_transparent(spark, sf_dir):
    # the bloom prefilter must be semantically invisible: same result as
    # the plain join it accelerates
    got = {
        (r["o_orderpriority"], r["n_orders"], r["revenue"])
        for r in QUERIES["join_bloom"](spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    from task_mapreduce_spark.functions.exact import dsum

    want = {
        (r["o_orderpriority"], r["n_orders"], r["revenue"])
        for r in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_mode_is_the_argmax_count(spark, sf_dir):
    out = {
        (r["l_returnflag"], r["l_linestatus"]): (r["mode_qty"], r["mode_n"])
        for r in QUERIES["agg_mode"](spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")
    counts = (
        li.groupBy("l_returnflag", "l_linestatus", "l_quantity")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    best: dict = {}
    for r in counts:
        k = (r["l_returnflag"], r["l_linestatus"])
        cand = (r["n"], -r["l_quantity"])  # max count, then min value
        if k not in best or cand > best[k][0]:
            best[k] = (cand, r["l_quantity"], r["n"])
    assert set(out) == set(best)
    for k, (_, qty, n) in best.items():
        assert out[k] == (qty, n), f"group {k}: {out[k]} != {(qty, n)}"


def test_transitions_rows_normalize(spark, sf_dir):
    out = QUERIES["events_transitions"](spark, sf_dir)
    sums = out.groupBy("from_type").agg(F.sum("p_r").alias("s")).collect()
    assert sums
    for r in sums:
        # each row of the transition matrix sums to 1 (up to the 1e-9
        # per-cell rounding, across <= |types| cells)
        assert abs(r["s"] - 1.0) < 1e-7, r
    # n is consistent: total transitions = total events - one per user
    e = load(spark, sf_dir, "events")
    want = e.count() - e.select("user_id").distinct().count()
    got = out.agg(F.sum("n")).first()[0]
    assert got == want


def test_distribution_ranks_are_ratios(spark, sf_dir):
    out = QUERIES["win_distribution"](spark, sf_dir)
    # cume_dist in (0, 1]; percent_rank in [0, 1]; pr <= cd always
    assert out.filter((F.col("cd") <= 0) | (F.col("cd") > 1)).count() == 0
    assert out.filter((F.col("pr") < 0) | (F.col("pr") > 1)).count() == 0
    assert out.filter(F.col("pr") > F.col("cd")).count() == 0


def test_melt_preserves_mass(spark, sf_dir):
    out = {r["measure"]: r for r in QUERIES["unpivot_melt"](spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    n = li.count()
    assert set(out) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    for m, r in out.items():
        assert r["n"] == n
        got = li.agg(F.min(m), F.max(m)).first()
        assert (r["lo"], r["hi"]) == (got[0], got[1])


def test_corr_bounds(spark, sf_dir):
    for r in QUERIES["agg_corr_cov"](spark, sf_dir).collect():
        assert -1.0 <= r["corr_qp"] <= 1.0
        assert -1.0 <= r["corr_qd"] <= 1.0
        # sample covariance = n/(n-1) * population covariance
        assert abs(r["cov_s_qd"] * (r["n"] - 1) - r["cov_p_qd"] * r["n"]) < 1e-4


def test_bitwise_roundtrip(spark, sf_dir):
    # x == (x & y) | (x & ~y): verify the family composes correctly
    out = QUERIES["fn_bitwise"](spark, sf_dir)
    li = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = out.join(li, "o_orderkey")
    bad = j.filter(
        F.col("k_and").bitwiseOR(
            F.col("o_orderkey").bitwiseAND(F.bitwise_not(F.col("o_custkey")))
        )
        != F.col("o_orderkey")
    ).count()
    assert bad == 0


def test_basket_pairs_certificates(spark, sf_dir):
    rows = QUERIES["basket_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["pa"] < r["pb"]
        assert r["support"] >= 2
        assert r["lift"] > 0


def test_permissive_corrupt_quarantines_only_null_bucket(spark, sf_dir):
    rows = QUERIES["scan_permissive_corrupt"](spark, sf_dir).collect()
    by_status = {r["status"]: r for r in rows}
    assert None in by_status  # corrupt rows surface under NULL status
    null_row = by_status[None]
    assert null_row["n_corrupt"] == null_row["n_rows"] > 0
    for status, r in by_status.items():
        if status is not None:
            assert r["n_corrupt"] == 0  # parsed rows never counted corrupt


def test_foreachbatch_state_matches_direct_batch(spark, sf_dir):
    # the upsert across micro-batches must equal a single-pass batch
    # reduction — the batch-boundary-independence contract
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    out = {
        (r["user_id"], r["last_event_id"], r["last_value"])
        for r in QUERIES["stream_foreachbatch_upsert"](spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))
    direct = {
        (r["user_id"], r["event_id"], r["value"])
        for r in e.select("user_id", "event_id", "value", us.alias("us"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert out == direct
    # compaction bounds the partial store: after the 3-trigger run at
    # K=2, batches 0-1 folded into the compacted store and only batch 2
    # survives as a partial — the state read never folds more than
    # |compact| + (K-1) partials however long the stream ran
    import os
    import tempfile

    from task_mapreduce_spark.streaming.ops import _FEB_COMPACT_EVERY

    accum = os.path.join(tempfile.gettempdir(), f"tmrs_feb_{os.getpid()}", "accum")
    partials = [
        d for d in os.listdir(os.path.join(accum, "part")) if d.startswith("batch=")
    ]
    assert os.path.isdir(os.path.join(accum, "compact"))
    assert len(partials) <= _FEB_COMPACT_EVERY - 1


def test_q13_buckets_sum_to_customer_count(spark, sf_dir):
    import pyspark.sql.functions as F

    out = QUERIES["tpch_q13"](spark, sf_dir)
    total = out.agg(F.sum("custdist")).collect()[0][0]
    assert total == load(spark, sf_dir, "customer").count()
