"""Query registry — the executable inventory of SURVEY.md §2B.

Every operator the engine claims is registered here twice:

* ``QUERIES[name]`` — a callable ``(spark, sf_dir) -> DataFrame`` built
  with the DataFrame API (the Spark-first implementation under test).
* ``ORACLES[name]`` — the equivalent ANSI SQL the DuckDB oracle runs on
  the same parquet tables. Omitted only for genuinely
  non-SQL-expressible ops (streaming state machines, LSH with
  engine-specific hashing); those get rows-only checks.

Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and (optionally) its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects; keep order stable.
    from gasket_spark.queries import relational  # noqa: F401
    from gasket_spark.queries import pipelineq  # noqa: F401
    from gasket_spark.queries import llm  # noqa: F401
    from gasket_spark.queries import streamingq  # noqa: F401


_load_all()
