"""task_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
the reference repo ``yunmanger1/task-mapreduce`` (a MapReduce task
engine; see SURVEY.md — the reference checkout is empty, so the surface
is defined by the MapReduce paradigm per Dean & Ghemawat, OSDI 2004,
plus the driver-mandated LLM-data-pipeline extensions).

Architecture: declarative DataFrame/SQL plans optimized by Catalyst;
Pandas UDFs (Arrow) only where built-ins can't express the semantics;
Structured Streaming for unbounded sources.  Every operator is a pure
function ``(spark, sf_dir) -> DataFrame`` registered in
:mod:`task_mapreduce_spark.registry` together with a DuckDB-equivalent
oracle SQL string used by the correctness harness.
"""

from task_mapreduce_spark.registry import ORACLES, QUERIES, register

# Importing the operator packages populates the registry.
from task_mapreduce_spark import operators as _operators  # noqa: F401,E402
from task_mapreduce_spark import streaming as _streaming  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLES", "register"]
__version__ = "0.1.0"
