"""Operator modules; importing them populates the registry."""

from task_mapreduce_spark.operators import relational  # noqa: F401
