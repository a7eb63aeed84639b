"""Golden properties of graph_pagerank (fixed-point, 5 iterations).

The oracle already value-checks the full result; these tests pin the
*semantic* claims the docstring makes: dangling nodes receive exactly
the teleport mass, and the integer arithmetic makes the result
bit-exact regardless of partition layout.
"""

from __future__ import annotations

from task_mapreduce_spark.operators.graph import _PR_BASE, _SUPP_OFFSET
from task_mapreduce_spark.registry import QUERIES
from task_mapreduce_spark.tables import load


def _ranks(spark, sf_dir):
    return {
        r["node"]: r["rank_fp"]
        for r in QUERIES["graph_pagerank"](spark, sf_dir).collect()
    }


def test_node_universe_and_positive_ranks(spark, sf_dir):
    ranks = _ranks(spark, sf_dir)
    n_cust = load(spark, sf_dir, "customer").count()
    n_supp = load(spark, sf_dir, "supplier").count()
    assert len(ranks) == n_cust + n_supp
    assert all(v >= _PR_BASE for v in ranks.values())


def test_dangling_customers_get_exactly_teleport_mass(spark, sf_dir):
    ranks = _ranks(spark, sf_dir)
    custs_with_orders = {
        r["o_custkey"]
        for r in load(spark, sf_dir, "orders").select("o_custkey").distinct().collect()
    }
    dangling = [
        n for n in ranks if n < _SUPP_OFFSET and n not in custs_with_orders
    ]
    # sf0.001/sf0.01 fixtures happen to have every customer ordering;
    # sf0.1 has a dangling one — the exact-teleport-mass claim is
    # checked wherever the fixture provides a witness.
    assert all(ranks[n] == _PR_BASE for n in dangling)
    # linked nodes accumulated incoming mass on top of the base
    linked = [n for n in ranks if n not in dangling]
    assert any(ranks[n] > _PR_BASE for n in linked)


def test_bit_exact_across_partition_layouts(spark, sf_dir):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = _ranks(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    b = _ranks(spark, sf_dir)
    assert a == b
