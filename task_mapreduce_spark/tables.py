"""Table loading + declared schemas.

Schemas are declared as ``StructType`` constants (read from the parquet
footers of the driver-generated tables — FIXTURES.md) and validated on
load: at 100 TB a silent schema drift is an outage, so the engine fails
fast on any column/type mismatch instead of propagating it.

All loads go through :func:`load` so that (a) the session timezone is
pinned to UTC before any timestamp semantics apply, and (b) column
pruning / predicate pushdown stay available — we hand Catalyst the raw
parquet scan and express everything else declaratively on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from task_mapreduce_spark.session import tune

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = list(SCHEMAS)


def path_of(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str, validate: bool = True) -> DataFrame:
    """Read one table; fail fast on schema drift (names + types).

    ``events.ts`` is parquet ``TIMESTAMP(NANOS)``, which Spark's reader
    rejects; we read it as epoch-nanos long (legacy conf) and truncate
    to microseconds — the same truncation DuckDB applies, so oracle
    parity holds at the value level.
    """
    tune(spark)
    if name == "events":
        # ``events.ts`` is parquet TIMESTAMP(NANOS).  Spark's handling
        # differs by version: newer readers surface it natively as
        # TIMESTAMP_NTZ (already truncated to micros), older ones only
        # read it with the legacy nanos-as-long conf.  Branch on the
        # schema the reader actually produces so both behaviors load
        # identically; the conf is session-global and deliberately never
        # unset — scans execute lazily, and on readers that honor it the
        # conf must still hold at execution time.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path_of(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # Legacy path: epoch nanos → floor to micros (the same
            # truncation DuckDB applies, so oracle parity holds).
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
            )
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    else:
        df = spark.read.parquet(path_of(sf_dir, name))
    if validate:
        expected = SCHEMAS[name]
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in expected.fields}
        if got != want:
            raise ValueError(
                f"schema drift for table {name!r}: expected {want}, got {got}"
            )
    return df
