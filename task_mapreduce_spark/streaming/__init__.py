"""Structured Streaming operators (SURVEY.md §2.9)."""

from task_mapreduce_spark.streaming import ops  # noqa: F401
