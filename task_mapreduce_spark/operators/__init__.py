"""Operator modules; importing them populates the registry."""

from task_mapreduce_spark.operators import aggregations  # noqa: F401
from task_mapreduce_spark.operators import corpus_tools  # noqa: F401
from task_mapreduce_spark.operators import graph  # noqa: F401
from task_mapreduce_spark.operators import joins  # noqa: F401
from task_mapreduce_spark.operators import llm_extras  # noqa: F401
from task_mapreduce_spark.operators import llm_pipeline  # noqa: F401
# curation builds its oracles from llm_extras/llm_pipeline's registered
# SQL, so it must import after them
from task_mapreduce_spark.operators import curation  # noqa: F401
from task_mapreduce_spark.operators import mapreduce_jobs  # noqa: F401
from task_mapreduce_spark.operators import pipelines  # noqa: F401
from task_mapreduce_spark.operators import relational  # noqa: F401
from task_mapreduce_spark.operators import scalars  # noqa: F401
from task_mapreduce_spark.operators import scale  # noqa: F401
from task_mapreduce_spark.operators import sql_surface  # noqa: F401
from task_mapreduce_spark.operators import tpch_extra  # noqa: F401
from task_mapreduce_spark.operators import training_pipeline  # noqa: F401
# ivfpq composes the IVF cell chain (llm_extras) with the PQ assign
# machinery (training_pipeline) — it must import after both
from task_mapreduce_spark.operators import ivfpq  # noqa: F401
# ann_eval composes oracles from llm_extras, llm_pipeline,
# training_pipeline AND ivfpq's registered SQL — it must import after
# all four (the deploy scoreboard embeds sim_search_ivfpq verbatim)
from task_mapreduce_spark.operators import ann_eval  # noqa: F401
from task_mapreduce_spark.operators import udfs  # noqa: F401
from task_mapreduce_spark.operators import windows  # noqa: F401
