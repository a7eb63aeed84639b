"""Operator registry.

Every operator from SURVEY.md §2 registers itself here via the
:func:`register` decorator.  ``QUERIES[name]`` is a pure function
``(spark, sf_dir) -> DataFrame``; ``ORACLES[name]`` (when present) is
an equivalent ANSI-SQL string runnable by DuckDB against the same
parquet tables (registered as views ``region nation customer supplier
part orders lineitem events documents embeddings``).

Operators without an oracle entry (approximate / layout-dependent /
streaming-timing-dependent ops) get a weaker rows-only check from the
driver and carry their own golden unit tests under ``tests/``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as operator ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
