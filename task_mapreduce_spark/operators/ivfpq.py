"""IVF+PQ composed index (``sim_search_ivfpq``, round 12) — the
production ANN architecture (Jégou et al. 2011's IVFADC, the FAISS
``IVFx,PQy`` layout): coarse-quantize the corpus into IVF cells, then
product-quantize each vector's RESIDUAL (vector − its cell centroid),
so a probe touches nprobe cells' postings and scores them from M
one-byte-class codes instead of raw floats.

Lives in its own module because it composes the two registered
constructions — ``_ivf_cells`` (llm_extras) for the coarse level and
the ``_pq_assign``/slice machinery (training_pipeline) for the
residual level — and must import after both (the ann_eval ordering
convention in operators/__init__.py).

No reference citation is possible: ``/root/reference/`` is an empty
checkout (SURVEY.md §0); the capability bar is SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from task_mapreduce_spark.operators.llm_extras import (
    _ANN_N_QUERIES,
    _hier_coarse,
    _hier_probe_ctes,
    _hier_probes,
    _ivf_hier_ctes,
)
from task_mapreduce_spark.operators.training_pipeline import (
    _PQ_M,
    _PQ_SHORTLIST,
    _PQ_TOP_K,
    _pq_assign,
    _pq_d2,
)
from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load

# constant residual-codebook size (the linear-encode regime —
# sim_search_pq_const's convention; production turns this to 256)
_IPQ_K = 32


def _ivfpq_ctes() -> str:
    """DuckDB twin of the Spark composition: the HIER IVF cell chain
    (``_ivf_hier_ctes`` — constant-cell seeds + two-level assign,
    byte-identical to sim_search_ivf_hier's coarse level, so the
    composed key can never fork from the standalone linear arm; the
    flat √N chain was the registered coarse level through round 12,
    which kept the one end-to-end production layout in the N^1.5
    regime — round-12 verdict #2), then residuals, constant-K
    residual codebooks seeded on md5 chars 13-24 (INDEPENDENT of the
    IVF seed rule's chars 1-12 — a same-bit rule would train the
    residual codebook preferentially on centroid vectors, whose
    residuals are ≈0: the CLAUDE.md composed-hash-rule trap in its
    most insidious form), one exact-decimal Lloyd round, and the
    encode.  Ends in res/cb/pcodes (+ the inherited
    e/cents/cells/sup/csup)."""
    return (
        _ivf_hier_ctes()
        + f""",
    res AS (
      SELECT c.vec_id, c.cell,
             list_transform(range(1, len(e.v) + 1),
                            i -> e.v[i] - ct.cv[i]) AS rv
      FROM cells c JOIN e USING (vec_id) JOIN cents ct ON ct.cid = c.cell
    ),
    p2 AS (
      SELECT greatest(1, CAST(floor(count(*) / {_IPQ_K}) AS BIGINT))
               AS stride
      FROM res
    ),
    subs AS (SELECT unnest(range({_PQ_M})) AS sub),
    rsl AS (
      SELECT r.vec_id, r.cell, s.sub, len(r.rv) // {_PQ_M} AS dsub,
             list_slice(r.rv, s.sub * (len(r.rv) // {_PQ_M}) + 1,
                        (s.sub + 1) * (len(r.rv) // {_PQ_M})) AS sv
      FROM res r CROSS JOIN subs s
    ),
    pcb0 AS (
      SELECT vec_id AS cid, sub, sv AS csl FROM rsl, p2
      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 13, 12))::BIGINT
              % p2.stride = 0
    ),
    pscored0 AS (
      SELECT rsl.vec_id, rsl.sub, c.cid,
             round(list_sum(list_transform(range(1, rsl.dsub + 1),
                    i -> (rsl.sv[i] - c.csl[i]) * (rsl.sv[i] - c.csl[i]))), 6)
               AS d2
      FROM rsl JOIN pcb0 c USING (sub)
    ),
    pcodes0 AS (
      SELECT vec_id, sub, cid AS code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                     ORDER BY d2, cid) AS rn
        FROM pscored0
      ) WHERE rn = 1
    ),
    pelems1 AS (
      SELECT c.sub, c.code, unnest(rsl.sv) AS val,
             unnest(range(len(rsl.sv))) AS idx
      FROM pcodes0 c
      JOIN rsl ON rsl.vec_id = c.vec_id AND rsl.sub = c.sub
    ),
    pmeans1 AS (
      SELECT sub, code, idx,
             round(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS DOUBLE)
                     / COUNT(*), 9) AS m
      FROM pelems1 GROUP BY sub, code, idx
    ),
    pcb AS (
      SELECT code AS cid, sub, list(m ORDER BY idx) AS csl
      FROM pmeans1 GROUP BY sub, code
    ),
    pscored1 AS (
      SELECT rsl.vec_id, rsl.sub, c.cid,
             round(list_sum(list_transform(range(1, rsl.dsub + 1),
                    i -> (rsl.sv[i] - c.csl[i]) * (rsl.sv[i] - c.csl[i]))), 6)
               AS d2
      FROM rsl JOIN pcb c USING (sub)
    ),
    pcodes AS (
      SELECT vec_id, sub, cid AS code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                     ORDER BY d2, cid) AS rn
        FROM pscored1
      ) WHERE rn = 1
    )"""
    )


@register(
    "sim_search_ivfpq",
    oracle=f"""
    WITH {_ivfpq_ctes()},
    {_hier_probe_ctes()},
    qres AS (
      SELECT p.query_id, p.cell, s.sub, len(e.v) // {_PQ_M} AS dsub,
             list_slice(list_transform(range(1, len(e.v) + 1),
                                       i -> e.v[i] - ct.cv[i]),
                        s.sub * (len(e.v) // {_PQ_M}) + 1,
                        (s.sub + 1) * (len(e.v) // {_PQ_M})) AS sv
      FROM probes p
      JOIN e ON e.vec_id = p.query_id
      JOIN cents ct ON ct.cid = p.cell
      CROSS JOIN subs s
    ),
    dt AS (
      SELECT q.query_id, q.cell, q.sub, c.cid,
             round(list_sum(list_transform(range(1, q.dsub + 1),
                    i -> (q.sv[i] - c.csl[i]) * (q.sv[i] - c.csl[i]))), 6)
               AS d2
      FROM qres q JOIN pcb c USING (sub)
    ),
    adc AS (
      SELECT d.query_id, v.vec_id,
             round(CAST(SUM(CAST(d.d2 AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS adc_dist
      FROM cells v
      JOIN pcodes k ON k.vec_id = v.vec_id
      JOIN dt d ON d.cell = v.cell AND d.sub = k.sub AND d.cid = k.code
      WHERE v.vec_id <> d.query_id
      GROUP BY d.query_id, v.vec_id
    ),
    short AS (
      SELECT query_id, vec_id, adc_dist FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist, vec_id) AS srn
        FROM adc
      ) WHERE srn <= {_PQ_SHORTLIST}
    ),
    rerank AS (
      SELECT s.query_id, s.vec_id, s.adc_dist,
             round(list_sum(list_transform(range(1, len(ec.v) + 1),
                    i -> (ec.v[i] - eq.v[i]) * (ec.v[i] - eq.v[i]))), 6)
               AS dist
      FROM short s
      JOIN e ec ON ec.vec_id = s.vec_id
      JOIN e eq ON eq.vec_id = s.query_id
    )
    SELECT query_id, vec_id, adc_dist, dist,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist, vec_id) AS BIGINT)
             AS rank
    FROM rerank
    QUALIFY rank <= {_PQ_TOP_K}
    """,
)
def sim_search_ivfpq(
    spark: SparkSession, sf_dir: str, _coarse=None
) -> DataFrame:
    """Composed IVF+PQ index — Jégou et al. 2011's IVFADC, the layout
    every production vector-search deployment (FAISS ``IVFx,PQy``)
    actually ships: the LINEAR-REGIME IVF construction coarse-
    quantizes the corpus (``_ivf_cells`` with the constant-cell
    ``_IVF_HIER_CELL`` knob + two-level assign — shared verbatim with
    sim_search_ivf_hier, so the composed key can never disagree with
    the standalone linear arm about the cells; through round 12 this
    key kept the flat √N coarse level, leaving the one end-to-end
    production layout in the N^1.5 regime — round-12 verdict #2),
    each vector's RESIDUAL against its cell centroid is
    product-quantized with a constant-K codebook (``_IPQ_K`` = 32
    codewords/subspace, the linear regime — production turns the same
    dial to 256), and a probe answers from nprobe cells' CODES —
    probed cells ranked supers-first with the size-scaled nprobe
    (:func:`_hier_probes`, round 13): per (query, probed cell) one
    M×K lookup table from the query's residual-in-that-cell (residuals
    are cell-relative, which is why IVFADC quantizes residuals — they
    are smaller and centered, so K codewords capture them far better
    than raw vectors), then an ADC sum per candidate, a
    shortlist, and an exact rerank.

    Residual-codebook seeds hash md5 chars 13-24 — INDEPENDENT of the
    IVF seed rule's chars 1-12 (CLAUDE.md): a same-bit rule would put
    every IVF centroid vector (residual ≈ 0) into the codebook seed
    set whenever the strides share factors, training the codebook on
    exactly the vectors PQ has nothing to learn from.

    Float discipline is the family's: rounded-6 squared-L2 per
    subspace, DECIMAL(18,6)-exact ADC sums, round-9 exact-decimal
    Lloyd means (one round), every argmin/rank tie-broken by id — the
    oracle replays cells, residuals, codebook seeding, the Lloyd
    round, encoding, probe ranking, per-cell lookup tables, ADC,
    shortlist and rerank end to end.

    100 TB shape, and why this is THE deployment layout: the index
    stores N·M byte-class codes (~8 B/vector) + N/64 centroids + M·K
    codebooks — the corpus's raw floats are touched only for shortlist
    rerank rows; build cost is LINEAR end-to-end — the two-level IVF
    assign (N×2√nlist dots) plus an N·M·K residual encode (constant
    codebook); probe cost is nprobe × E[cell] ≈ √nlist·64 code rows
    per query with the |q|·nprobe·M·K lookup tables broadcast, and
    probe RANKING is supers-first (√nlist-row broadcast, never the
    nlist-row centroid table — the round-12 watch item).  Every
    multiplied stream carries scalars only (the _pq_assign
    discipline); the residual and slice frames are round-robin-
    repartitioned and eagerly checkpointed (HOF-collapse +
    serialize-killer defenses, CLAUDE.md).

    ``_coarse`` (private, round-13 optimization): optional
    ``(e, assigned, cents)`` from ``_hier_coarse`` — the coarse level
    this key shares verbatim with sim_search_ivf_hier.  The registered
    entry point builds its own (``None``); sim_eval_recall_deploy
    passes the same checkpointed frames to both arms so the shared
    construction is materialized once per eval instead of twice (see
    the hier key's docstring note)."""
    if _coarse is None:
        _coarse = _hier_coarse(spark, sf_dir)
    e, assigned, cents = _coarse
    par = spark.sparkContext.defaultParallelism

    # residuals: one zip_with per vector, checkpointed so the 8-way
    # slice explosion below can't inline (and 8×-recompute) the
    # subtraction per sub row (CollapseProject, CLAUDE.md)
    res = (
        assigned.join(F.broadcast(cents), assigned.cell == cents.cid)
        .select(
            "vec_id",
            "cell",
            F.zip_with("v", "cv", lambda a, b: a - b).alias("rv"),
        )
        .repartition(par)
        .localCheckpoint()
    )

    dsub = F.expr(f"size(rv) div {_PQ_M}")
    sub_ids = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("sub")
    rsl = (
        res.select("vec_id", "rv", sub_ids)
        .select(
            "vec_id",
            "sub",
            F.slice("rv", F.col("sub") * dsub + 1, dsub).alias("sv"),
        )
        .repartition(par)
        .localCheckpoint()
    )

    # constant-K residual codebook seeds on the INDEPENDENT hash bits
    params = res.agg(F.count(F.lit(1)).alias("n")).select(
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.col("n") / F.lit(_IPQ_K)).cast("long"),
        ).alias("stride")
    )
    h2 = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 13, 12), 16, 10
    ).cast("long")
    seed_res = (
        res.crossJoin(F.broadcast(params))
        .filter(h2 % F.col("stride") == 0)
        .select(F.col("vec_id").alias("cid"), F.col("rv").alias("cv"))
    )
    dsub_c = F.expr(f"size(cv) div {_PQ_M}")
    # lazy like _pq_slices' seed codebook: ONE consumer (the Lloyd
    # assign's broadcast), and the derivation is a narrow slice over
    # the checkpointed res — an eager checkpoint here was one extra
    # job with nothing multi-consumer to protect (round-13 pass)
    cs = (
        seed_res.select("cid", "cv", sub_ids)
        .select(
            "cid",
            "sub",
            F.slice("cv", F.col("sub") * dsub_c + 1, dsub_c).alias("csl"),
        )
    )

    # one exact-decimal Lloyd round over the residual slices (the
    # _pq_encode loop body, verbatim discipline)
    ev = rsl.select("vec_id", "sub", "sv")
    cur = (
        _pq_assign(ev, cs)
        .join(ev, ["vec_id", "sub"])
        .localCheckpoint()
    )
    means = (
        cur.select("sub", "code", F.posexplode("sv").alias("idx", "val"))
        .groupBy("sub", "code", "idx")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("m")
        )
    )
    cs = (
        means.groupBy("sub", "code")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "m"))),
                lambda s: s["m"],
            ).alias("csl")
        )
        .select(F.col("code").alias("cid"), "sub", "csl")
        .localCheckpoint()
    )
    codes = _pq_assign(ev, cs).select("vec_id", "sub", "code")

    # ---- probe: two-level supers-first cell ranking with size-scaled
    # nprobe (the sim_search_ivf_hier probe, round 13), then
    # per-(query, cell) residual lookup tables ----
    probes = (
        _hier_probes(e, cents, with_centroid=True)
        .select(
            "query_id",
            "cell",
            F.zip_with("qv", "ccv", lambda a, b: a - b).alias("qrv"),
        )
        # lazy (round-13 pass): consumed ONCE, by the dt broadcast —
        # the subtree executes exactly once inside that broadcast
        # build, so the eager checkpoint bought nothing but its own
        # job.  The HOF-collapse exposure is bounded: the 8-way slice
        # below re-evaluates zip_with on |q|·nprobe (~10²) rows only.
    )
    dsub_q = F.expr(f"size(qrv) div {_PQ_M}")
    qsl = probes.select("query_id", "cell", "qrv", sub_ids).select(
        "query_id",
        "cell",
        "sub",
        F.slice("qrv", F.col("sub") * dsub_q + 1, dsub_q).alias("qsv"),
    )
    # lookup-table columns renamed so the three-way join condition has
    # no name (or exprId) overlap with the code/cell stream
    dt = qsl.join(cs, "sub").select(
        "query_id",
        F.col("cell").alias("d_cell"),
        F.col("sub").alias("d_sub"),
        F.col("cid").alias("d_cid"),
        _pq_d2("qsv", "csl").alias("d2"),
    )

    vc = res.select("vec_id", "cell")
    adc = (
        codes.join(vc, "vec_id")
        .join(
            F.broadcast(dt),
            (F.col("sub") == F.col("d_sub"))
            & (F.col("code") == F.col("d_cid"))
            & (F.col("cell") == F.col("d_cell")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.round(
                F.sum(F.col("d2").cast("decimal(18,6)")).cast("double"), 6
            ).alias("adc_dist")
        )
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= _PQ_SHORTLIST)
        .select("query_id", "vec_id", "adc_dist")
    )
    raw = e.select("vec_id", "v")
    qv = raw.filter(F.col("vec_id") < _ANN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qvec")
    )
    rer = (
        raw.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            "adc_dist",
            _pq_d2("v", "qvec").alias("dist"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= _PQ_TOP_K)
    )
