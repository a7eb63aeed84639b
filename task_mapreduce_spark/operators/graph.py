"""Iterative graph analytics: PageRank (Dean & Ghemawat's motivating
workload — the paper §1 cites "computes PageRank" style link-graph
jobs, and §2.3's reverse web-link graph is its candidate-generation
step).

The graph is derived from the star schema itself: the bipartite
customer↔supplier interaction graph (an edge whenever a customer's
order contains a lineitem from that supplier).  That keeps the
operator on the driver's fixture tables — no synthetic side input.

Determinism at 100 TB is the interesting part.  Textbook PageRank
folds doubles, and a 1000-way partial-aggregation merge tree makes
float sums order-dependent — the same query can hash differently run
to run.  Here ranks are FIXED-POINT integers (scale 1e9) and the
damping step is integer arithmetic (``(85 * x) div 100``), so every
iteration is bit-exact regardless of merge order, partition count, or
engine — which is also what makes a DuckDB oracle possible for an
iterative algorithm.

Scale shape per iteration: one equi-join of the edge list against the
current ranks + one sum by destination — exactly the distributed
PageRank from the MapReduce paper, as two shuffles.  The edge list and
degrees are computed once and ``localCheckpoint``-ed (at cluster scale:
a parquet checkpoint) so the 5 unrolled iterations don't replay the
edge-derivation join five times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load

_PR_SCALE = 1_000_000_000          # fixed-point: 1.0 == 1e9
_PR_BASE = 150_000_000             # 0.15 * _PR_SCALE (teleport mass)
_PR_ITERS = 5                      # fixed, unrolled — not run-to-convergence

# Node-id encoding for the bipartite graph: customers are EVEN ids
# (2·custkey), suppliers ODD (2·suppkey + 1).  The parity encoding is
# scale-proof: disjointness holds for ANY key domain.  The previous
# additive offset (suppkey + 1e6) silently assumed custkey < 1e6 —
# the round-11 ×100 replication pushed custkeys past it and collided
# the two node families, and a real 100 TB corpus with billions of
# customers breaks the constant outright.


def _pagerank_oracle() -> str:
    """DuckDB twin with the 5 iterations unrolled as CTEs r0..r5.

    ``//`` is DuckDB integer division on BIGINT operands (its DOUBLE
    behavior — true division — never applies here: every operand is
    BIGINT by construction), mirroring Spark's ``div``.
    """
    parts = [
        f"""
    WITH pairs AS (
      SELECT DISTINCT 2 * o.o_custkey AS cust, 2 * l.l_suppkey + 1 AS supp
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT cust AS src, supp AS dst FROM pairs
      UNION ALL
      SELECT supp AS src, cust AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (
      SELECT 2 * c_custkey AS node FROM customer
      UNION ALL
      SELECT 2 * s_suppkey + 1 AS node FROM supplier
    ),
    r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes)"""
    ]
    for i in range(1, _PR_ITERS + 1):
        parts.append(
            f""",
    r{i} AS (
      SELECT n.node,
             CAST({_PR_BASE} + (85 * COALESCE(i.incoming, 0)) // 100 AS BIGINT)
               AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst, SUM(r.rank // d.deg) AS incoming
        FROM edges e
        JOIN deg d ON e.src = d.src
        JOIN r{i - 1} r ON e.src = r.node
        GROUP BY e.dst
      ) i ON n.node = i.dst
    )"""
        )
    parts.append(f"\n    SELECT node, rank AS rank_fp FROM r{_PR_ITERS}")
    return "".join(parts)


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the customer↔supplier bipartite graph,
    5 unrolled iterations (see module docstring for why the arithmetic
    is integer).  Customers with no orders are dangling: they receive
    exactly the teleport mass, asserted (where the fixture provides a
    witness) in tests/test_graph.py."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust"),
            (F.col("l_suppkey") * 2 + 1).alias("supp"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).unionByName(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # materialize (edge, out-degree) ONCE — the five iterations below
    # would otherwise each replay the lineitem⋈orders derivation — and
    # HASH-PARTITION it on the join key with an explicit count
    # (AQE-exempt) so every iteration's rank join reuses this
    # partitioning: the edge list never moves again, only the
    # |V|-sized rank table shuffles per round.  That is the GraphX/
    # Pregel layout, and it's what survives 100×: broadcasting the
    # rank table instead would be 30% slower here AND break at 1 B
    # nodes (a multi-GB broadcast per iteration).
    par = spark.sparkContext.defaultParallelism
    edeg = edges.join(deg, "src").repartition(par, "src").localCheckpoint()

    nodes = (
        load(spark, sf_dir, "customer")
        .select((F.col("c_custkey") * 2).alias("node"))
        .unionByName(
            load(spark, sf_dir, "supplier").select(
                (F.col("s_suppkey") * 2 + 1).alias("node")
            )
        )
    )
    ranks = nodes.select("node", F.lit(_PR_SCALE).cast("long").alias("rank"))
    for _ in range(_PR_ITERS):
        r = ranks.select(F.col("node").alias("src_node"), F.col("rank").alias("src_rank"))
        # shuffle_hash: the rank side is the (small-per-partition)
        # build side — a sort-merge join would re-SORT the edge list
        # every iteration even though its partitioning is reused.
        incoming = (
            edeg.join(
                r.hint("shuffle_hash"), F.col("src") == F.col("src_node")
            )
            .select("dst", F.expr("src_rank div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("incoming"))
        )
        # same discipline for the vertex-table maintenance join: both
        # sides are |V|-keyed (node/dst), shuffle-hash avoids a
        # per-iteration sort of either
        ranks = nodes.join(
            incoming.hint("shuffle_hash"), nodes.node == incoming.dst, "left"
        ).select(
            "node",
            (
                F.lit(_PR_BASE).cast("long")
                + F.expr("(85 * coalesce(incoming, 0)) div 100")
            ).alias("rank"),
        )
    return ranks.select("node", F.col("rank").cast("bigint").alias("rank_fp"))


# ---------------------------------------------------------------------------
# Triangle counting over the document-similarity graph
# ---------------------------------------------------------------------------


def orient_by_degree(e: DataFrame) -> DataFrame:
    """Re-orient an undirected edge list ``(a, b)`` so every edge points
    from the endpoint with the smaller ``(degree, id)`` to the larger —
    the standard triangle-enumeration refinement (Suri & Vassilvitskii's
    MapReduce formulation): under degree orientation a vertex's
    OUT-degree is bounded by O(√|E|), so the path join on the middle
    vertex expands at most Σ outdeg² ≤ |E|·√|E| candidates even when one
    hot vertex has millions of neighbors.  Id-orientation has no such
    bound — a hot vertex of degree d contributes d²/4 candidates.

    ``(degree, id)`` is a strict total order (ids are unique), so the
    orientation is acyclic and every triangle has exactly one source,
    one middle and one sink vertex — each triangle is enumerated exactly
    once by (src→mid)⋈(mid→sink) closed with (src→sink).  The degree
    table is |V|-bounded metadata derived from the edge list itself; the
    two decorating joins are |E|-row equi-joins."""
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )


def triangle_memberships(e: DataFrame) -> DataFrame:
    """(doc_id, n_triangles) for every vertex appearing in ≥ 1 triangle
    of the undirected edge list ``(a, b)``: degree-orient the edges
    (:func:`orient_by_degree`), enumerate each triangle once via the
    two-equi-join closure, then count memberships per vertex.  The
    oriented edge list feeds three join branches — checkpoint it so the
    (similarity-pipeline + orientation) prefix runs once."""
    o = orient_by_degree(e).localCheckpoint()
    e1 = o.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    e2 = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    e3 = o.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    verts = (
        tri.select(F.col("x").alias("doc_id"))
        .unionByName(tri.select(F.col("y").alias("doc_id")))
        .unionByName(tri.select(F.col("z").alias("doc_id")))
    )
    return verts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_triangles"))


@register(
    "graph_triangles",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split(text, ' ')) AS toks
      FROM documents
    ),
    e AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM t a JOIN t b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    verts AS (
      SELECT x AS doc_id FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ),
    cnt AS (
      SELECT doc_id, COUNT(*) AS n_triangles FROM verts GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM documents d LEFT JOIN cnt c USING (doc_id)
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle count over the exact-Jaccard similarity
    graph (the same deterministic edge set dedup_ngram_jaccard /
    dedup_cluster_cc are built on) — the classic cohesion metric that
    separates genuine duplicate CLUSTERS (dense, many triangles) from
    chains of pairwise-similar docs (no triangles).

    The MapReduce-textbook formulation, as two equi-joins: edges are
    oriented by (DEGREE, id) — :func:`orient_by_degree` — so each
    triangle is formed exactly once by joining (src,mid)⋈(mid,sink) on
    the middle vertex and closing with (src,sink), and a hot vertex's
    path fan-out is bounded by √|E| instead of its raw degree.  No
    cross join and no per-vertex adjacency list in one row.

    The oracle deliberately stays ID-oriented: per-vertex triangle
    membership is orientation-invariant (a triangle is a triangle
    however its edges point), so the independent id-oriented SQL
    formulation value-checks the degree-orientation machinery instead
    of merely re-running it — if the (deg, id) order ever failed to be
    strict/acyclic, double- or under-counts would hash-mismatch here."""
    from task_mapreduce_spark.operators.llm_extras import (
        _doc_token_sets,
        jaccard_pairs,
    )

    d = load(spark, sf_dir, "documents")
    # checkpoint: the raw edge list feeds the degree derivation (both
    # endpoint projections) AND the orientation join — without it the
    # prefix-filtered Jaccard pipeline would replay three times
    e = jaccard_pairs(_doc_token_sets(d)).select("a", "b").localCheckpoint()
    cnt = triangle_memberships(e)
    return (
        d.select("doc_id")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        )
    )


# ---------------------------------------------------------------------------
# BFS shortest-hop distances from a source node
# ---------------------------------------------------------------------------

_BFS_ITERS = 4                     # fixed, unrolled — diameter cap, not conv.
_BFS_SOURCE = 0                    # customer node 0 == 2*custkey 0 under
#                                    the parity encoding (custkeys 0-based)


def _bfs_oracle() -> str:
    """DuckDB twin with the frontier expansion unrolled as d0..d4 —
    the same unrolled-CTE pattern as the PageRank oracle (a recursive
    CTE would also work, but unrolling keeps the two engines' plans
    literally iteration-for-iteration comparable)."""
    parts = [
        f"""
    WITH pairs AS (
      SELECT DISTINCT 2 * o.o_custkey AS cust, 2 * l.l_suppkey + 1 AS supp
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT cust AS src, supp AS dst FROM pairs
      UNION ALL
      SELECT supp AS src, cust AS dst FROM pairs
    ),
    d0 AS (SELECT CAST({_BFS_SOURCE} AS BIGINT) AS node, 0 AS dist)"""
    ]
    for i in range(1, _BFS_ITERS + 1):
        parts.append(
            f""",
    d{i} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM d{i - 1} d JOIN edges e ON e.src = d.node
      ) GROUP BY node
    )"""
        )
    parts.append(
        f"\n    SELECT node, CAST(dist AS INTEGER) AS dist FROM d{_BFS_ITERS}"
    )
    return "".join(parts)


@register("graph_bfs", oracle=_bfs_oracle())
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first shortest-hop distances from customer node 0 over
    the same customer↔supplier bipartite graph PageRank uses, 4
    unrolled rounds (nodes further than 4 hops are simply absent —
    the frontier semantics, not a truncation of found results).

    FRONTIER-DELTA iterative BFS: each round expands only the nodes
    whose distance was ASSIGNED last round (the frontier), not the
    whole reached set — newly-seen nodes are isolated with a left-anti
    join against the accumulated distance table, so per-round join
    input is ∝ |frontier|, not ∝ |reached| (PERF.md's ×10 row shows
    the effect: round cost tracks the expansion wave, flat once the
    wave passes).  Correct because BFS expands level by level: any
    expanded node already present in the distance table was reached
    in an earlier round with a strictly smaller distance, so dropping
    it loses nothing — the level number IS the min-fold (integer,
    bit-exact on any engine/merge order, matching the oracle's full
    min-fold formulation).

    Per round: one equi-join shuffle of the |frontier|-sized table
    into the once-checkpointed edge partitioning + one min-agg + one
    anti-join against the distance union.  Only the FRONTIER is
    ``localCheckpoint``-ed per round (cluster-scale: parquet
    checkpoint); the distance table stays a lazy union of checkpointed
    frontiers — shallow lineage without re-materializing |V| rows per
    round.  At 100 TB the distance table is |V|-bounded (node, int)
    pairs — tiny next to the edge list, derived and checkpointed
    ONCE."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust"),
            (F.col("l_suppkey") * 2 + 1).alias("supp"),
        )
        .distinct()
    )
    # Same layout discipline as PageRank: the static edge list is
    # hash-partitioned on the join key ONCE (explicit count, AQE-
    # exempt) and checkpointed; each round only the |frontier|-sized
    # distance table shuffles into it via shuffle-hash (no per-round
    # sort of the edges, no |V|-broadcast).
    par = spark.sparkContext.defaultParallelism
    edges = (
        pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
        .unionByName(
            pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
        )
        .repartition(par, "src")
        .localCheckpoint()
    )
    dist = spark.range(1).select(
        F.lit(_BFS_SOURCE).cast("long").alias("node"),
        F.lit(0).cast("int").alias("dist"),
    )
    frontier = dist
    for _ in range(_BFS_ITERS):
        expanded = edges.join(
            frontier.hint("shuffle_hash"), frontier.node == edges.src
        ).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        cand = expanded.groupBy("node").agg(F.min("dist").alias("dist"))
        # delta: keep only nodes never reached before — anything already
        # in dist carries a strictly smaller distance by level order
        frontier = cand.join(dist, "node", "left_anti").localCheckpoint()
        dist = dist.unionByName(frontier)
    return dist.select("node", F.col("dist").cast("int").alias("dist"))
