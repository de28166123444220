"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2B).
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
non-SQL-expressible ops, which get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped aggregate) on /root/testdata/sf0.001."""
    from gasket_spark.queries import QUERIES

    return QUERIES["q_agg_hash"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gasket_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gasket_spark.queries import ORACLES

    return dict(ORACLES)
