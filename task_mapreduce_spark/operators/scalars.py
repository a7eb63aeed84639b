"""Scalar function families (SURVEY.md §2.8) — one composite query per
family so the oracle check covers the surface without hundreds of keys.

These are MapReduce's ``map`` bodies (tokenization for word count,
record reshaping, JSON field extraction) expressed as built-in Column
expressions: everything stays inside WholeStageCodegen on the JVM —
no Python in the row path, which is the difference between scanning
100 TB at NVMe speed and at pickle speed.

Cross-engine parity notes (each encoded in the paired oracle):
- DuckDB ``regexp_replace`` replaces the FIRST match unless given the
  ``'g'`` flag; Spark always replaces all.
- DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday.
- Spark ``add_months`` returns DATE; the oracle mirrors with
  ``CAST(ts + INTERVAL 3 MONTH AS DATE)`` (both clamp month-ends).
- Integer-valued aggregates are cast to BIGINT on both sides so the
  driver's schema comparison can't trip over int32 vs int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from task_mapreduce_spark.registry import register
from task_mapreduce_spark.tables import load


@register(
    "fn_string",
    oracle="""
    SELECT doc_id,
           substr(lower(text), 1, 20) AS head,
           upper(source) AS src_upper,
           trim(' ' || source || ' ') AS src_trim,
           CAST(length(text) AS BIGINT) AS n_chars_txt,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
             AS n_non_vowel,
           source || ':' || lang AS src_lang
    FROM documents
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/trim/substr/split/concat/length/regexp_replace —
    the word-count tokenizer family, all JVM-side."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(F.lower("text"), 1, 20).alias("head"),
        F.upper("source").alias("src_upper"),
        F.trim(F.concat(F.lit(" "), "source", F.lit(" "))).alias("src_trim"),
        F.length("text").cast("bigint").alias("n_chars_txt"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("bigint").alias(
            "n_non_vowel"
        ),
        F.concat("source", F.lit(":"), "lang").alias("src_lang"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT)
             AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/dayofweek/date_trunc/datediff/add_months/unix epoch.
    Session timezone is pinned UTC (session.tune), so NTZ→epoch is
    engine-portable."""
    o = load(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(ts).cast("bigint").alias("yr"),
        F.month(ts).cast("bigint").alias("mo"),
        F.dayofweek(ts).cast("bigint").alias("dow"),
        # DATE on both sides: Spark's date_trunc always yields TIMESTAMP
        # while DuckDB >= 1.0 yields DATE for month granularity.
        F.date_trunc("month", ts).cast("date").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), ts.cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
        F.add_months(ts.cast("date"), 3).alias("plus3m"),
        F.unix_timestamp(ts.cast("timestamp")).cast("bigint").alias("epoch_s"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT p_partkey,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_retailprice - 950.0) AS dist_950,
           round(p_retailprice, 1) AS price_r1,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           round(ln(CAST(p_size AS DOUBLE)), 9) AS size_ln,
           round(exp(CAST(p_size % 5 AS DOUBLE)), 9) AS size_exp,
           pow(CAST(p_size AS DOUBLE), 2) AS size_sq,
           CAST(((p_partkey % 7) + 7) % 7 AS BIGINT) AS key_mod7
    FROM part
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/sqrt/log/exp/pow/pmod.  sqrt is IEEE
    correctly-rounded (bit-portable by spec); ln/exp inputs are small
    integers but the engines' libm still drifts by one ulp, so ln/exp
    are stabilized with round(·, 9) on BOTH sides; pmod is mirrored as
    ``((x % 7) + 7) % 7`` since DuckDB lacks pmod."""
    p = load(spark, sf_dir, "part")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("p_retailprice") - 950.0).alias("dist_950"),
        F.round("p_retailprice", 1).alias("price_r1"),
        F.sqrt(size_d).alias("size_sqrt"),
        F.round(F.log(size_d), 9).alias("size_ln"),
        F.round(F.exp((F.col("p_size") % 5).cast("double")), 9).alias("size_exp"),
        F.pow(size_d, 2).alias("size_sq"),
        F.pmod("p_partkey", F.lit(7)).cast("bigint").alias("key_mod7"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified')
             AS priority,
           greatest(o_totalprice, 150000.0) AS at_least,
           least(o_totalprice, 150000.0) AS at_most,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END
             AS closed_status
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, greatest/least — NULL-propagation
    semantics match ANSI on both engines."""
    o = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 200000, "big")
        .when(tp > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
            F.lit("unspecified"),
        ).alias("priority"),
        F.greatest(tp, F.lit(150000.0)).alias("at_least"),
        F.least(tp, F.lit(150000.0)).alias("at_most"),
        F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("closed_status"),
    )


@register(
    "fn_array",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ),
    exploded AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_exploded
      FROM (SELECT doc_id, unnest(tokens) AS tok FROM toks)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tokens) AS BIGINT) AS n_tokens,
           list_contains(t.tokens, 'fast') AS has_fast,
           array_to_string(list_slice(t.tokens, 1, 3), ' ') AS first3,
           CAST(len(list_distinct(t.tokens)) AS BIGINT) AS n_distinct,
           array_to_string(list_sort(list_distinct(t.tokens)), ',') AS vocab,
           CAST(list_max(list_transform(t.tokens, x -> length(x))) AS BIGINT)
             AS max_tok_len,
           CAST(len(list_filter(t.tokens, x -> length(x) > 4)) AS BIGINT)
             AS n_long,
           CAST(list_sum(list_transform(t.tokens, x -> length(x))) AS BIGINT)
             AS sum_tok_len,
           e.n_exploded
    FROM toks t JOIN exploded e ON t.doc_id = e.doc_id
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/contains/slice/distinct/sort_array + higher-order
    transform/filter/aggregate, plus explode (the DataFrame flatMap)
    with a group-back join.  Higher-order functions run inside codegen —
    no UDF, no Python."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    exploded = (
        toks.select("doc_id", F.explode("tokens").alias("tok"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exploded"))
    )
    t = F.col("tokens")
    base = toks.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.array_contains(t, "fast").alias("has_fast"),
        F.array_join(F.slice(t, 1, 3), " ").alias("first3"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_distinct"),
        F.array_join(F.sort_array(F.array_distinct(t)), ",").alias("vocab"),
        F.array_max(F.transform(t, lambda x: F.length(x)))
        .cast("bigint")
        .alias("max_tok_len"),
        F.size(F.filter(t, lambda x: F.length(x) > 4))
        .cast("bigint")
        .alias("n_long"),
        F.aggregate(
            t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("sum_tok_len"),
    )
    return base.join(exploded, "doc_id")


@register(
    "fn_map",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(2 AS BIGINT) AS n_keys,
           'status,priority' AS keys,
           o_orderstatus || ',' || o_orderpriority AS vals
    FROM orders
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map/element_at/map_keys/map_values.  The oracle mirrors the
    *values* (DuckDB's MAP type round-trips differently), which checks
    exactly what the map functions computed."""
    o = load(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status"),
        F.size(m).cast("bigint").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.array_join(F.map_values(m), ",").alias("vals"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           o_orderdate AS d,
           o_totalprice AS p,
           o_totalprice + 10 AS p_plus,
           o_orderstatus || '/' || o_orderpriority AS tag
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct create/access/update: ``struct`` + ``getField`` +
    ``withField`` + ``dropFields`` — the nested-record surface every
    schema-evolution pipeline leans on (add a derived field, retire a
    raw one, without unpacking the record).  All in-row codegen
    expressions, zero shuffle.  The oracle mirrors the flattened VALUES
    (the fn_map discipline: DuckDB's STRUCT type round-trips its own
    way; what must match is what the field ops computed).  p_plus is a
    single IEEE add — bit-identical across engines, no rounding
    needed."""
    o = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderdate").alias("d"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderstatus").alias("st"),
    )
    s2 = s.withField("p_plus", s.getField("p") + 10)
    s3 = s2.dropFields("st")  # (d, p, p_plus): raw field retired
    return o.select(
        "o_orderkey",
        s3.getField("d").alias("d"),
        s3.getField("p").alias("p"),
        s3.getField("p_plus").alias("p_plus"),
        F.concat_ws("/", s.getField("st"), F.col("o_orderpriority")).alias(
            "tag"
        ),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           to_json(struct_pack(event_id := event_id,
                               k := CAST(json_extract_string(props, '$.k') AS BIGINT)
                  ))::VARCHAR AS packed
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json / to_json over events.props — the
    semi-structured column every event pipeline has.  from_json with an
    explicit schema (never schema_of_json over 100 TB: that's an extra
    full pass)."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_num"),
        F.to_json(F.struct(F.col("event_id"), parsed.getField("k").alias("k"))).alias(
            "packed"
        ),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & o_custkey AS BIGINT) AS k_and,
           CAST(o_orderkey | o_custkey AS BIGINT) AS k_or,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS k_xor,
           CAST(~o_orderkey AS BIGINT) AS k_not,
           CAST((o_orderkey & 15) << 2 AS BIGINT) AS k_shl,
           CAST(o_orderkey >> 3 AS BIGINT) AS k_shr,
           CAST(bit_count(o_orderkey) AS BIGINT) AS k_pop
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family: and/or/xor/not, shifts, popcount — the
    primitives every hash/bitmap/bloom operator in the engine builds on
    (join_bloom's bit test, simhash's band split, delta bitmaps).  All
    integer ops, bit-identical by definition across engines."""
    o = load(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(c).cast("bigint").alias("k_and"),
        k.bitwiseOR(c).cast("bigint").alias("k_or"),
        k.bitwiseXOR(c).cast("bigint").alias("k_xor"),
        F.bitwise_not(k).cast("bigint").alias("k_not"),
        F.shiftleft(k.bitwiseAND(F.lit(15)), 2).cast("bigint").alias("k_shl"),
        F.shiftright(k, 3).cast("bigint").alias("k_shr"),
        F.bit_count(k).cast("bigint").alias("k_pop"),
    )


@register(
    "fn_url",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang AS query,
           lang AS lang_param
    FROM documents
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: build a canonical URL per document and
    decompose it with ``parse_url`` (HOST / PATH / QUERY / one query
    parameter) — the web-corpus normalization primitive (URL-keyed
    dedup, host-level aggregation à la the paper's reverse web-link
    graph all start here).

    The oracle reconstructs each component from the same fields the
    URL was built from, so the check certifies that Spark's JVM
    ``parse_url`` round-trips the construction exactly.  Narrow
    codegen projection — no shuffle; at 100 TB this runs at scan
    speed like pii_redact."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
