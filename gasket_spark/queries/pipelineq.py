"""Pipeline-operator queries: gasket's composition vocabulary
(pipe/run/fork/map/reduce, /root/reference/index.js:140-161) exercised
over relational stages and verified against SQL oracles.

These run through the real Engine/operator code paths — not
hand-inlined equivalents — so the correctness gate covers the pipeline
kernel itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gasket_spark.io import read_table
from gasket_spark.pipeline import operators as ops
from gasket_spark.pipeline.engine import Engine
from gasket_spark.queries import query


# module-level stage functions (importable, deterministic)

def _stage_filter_highvalue(df: DataFrame, ctx) -> DataFrame:
    return df.filter(F.col("o_totalprice") > 200000)


def _stage_project_year(df: DataFrame, ctx) -> DataFrame:
    return df.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        "o_totalprice",
    )


def _stage_agg_by_year(df: DataFrame, ctx) -> DataFrame:
    return (
        df.groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             / F.lit(100.0)).alias("total"),
        )
    )


@query(
    "q_pipe_compose",
    oracle="""
    SELECT yr, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS total
    FROM (SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr, o_totalprice
          FROM orders WHERE o_totalprice > 200000)
    GROUP BY yr
    """,
)
def q_pipe_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gasket ``pipe`` (index.js:52-56) over relational module stages:
    filter → project → aggregate, compiled by the Engine into ONE
    Catalyst tree — the stages fuse into a single codegen span, proving
    composition adds no physical boundaries."""
    eng = Engine({"p": [_stage_filter_highvalue, _stage_project_year,
                        _stage_agg_by_year]}, spark=spark)
    return eng.pipe("p", input_df=read_table(spark, sf_dir, "orders"))


@query(
    "q_run_concat",
    oracle="""
    SELECT 0 AS ord, r_name AS name FROM region
    UNION ALL
    SELECT 1 AS ord, n_name AS name FROM nation
    """,
)
def q_run_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gasket ``run`` — *ordered* concatenation (index.js:30-39) via the
    ordinal-tag pattern (Spark unions are bags; the ordinal preserves
    gasket's declared order observably)."""
    r = read_table(spark, sf_dir, "region").select(F.col("r_name").alias("name"))
    n = read_table(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    out = ops.run_concat([r, n], keep_ord=True)
    return out.select(F.col(ops.ORD_COL).cast("int").alias("ord"), "name")


@query(
    "q_fork_union",
    oracle="""
    SELECT 'customer' AS src, c_nationkey AS nk FROM customer
    UNION ALL
    SELECT 'supplier' AS src, s_nationkey AS nk FROM supplier
    """,
)
def q_fork_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gasket ``fork`` — parallel merge (index.js:42-49): bag union,
    branches scan concurrently."""
    c = read_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_nationkey").alias("nk"))
    s = read_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"), F.col("s_nationkey").alias("nk"))
    return ops.fork_union([c, s])


@query(
    "q_map_broadcast",
    oracle="""
    SELECT n_name AS s FROM nation
    UNION ALL
    SELECT upper(n_name) AS s FROM nation
    """,
)
def q_map_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gasket ``map`` — fan-out (index.js:62): the source is produced
    once (cached) and every row reaches each consumer."""
    src = read_table(spark, sf_dir, "nation")
    return ops.map_broadcast(src, [
        lambda d: d.select(F.col("n_name").alias("s")),
        lambda d: d.select(F.upper("n_name").alias("s")),
    ])


@query(
    "q_reduce_fanin",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
)
def q_reduce_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gasket ``reduce`` — fan-in (index.js:64): producers union into a
    single aggregating consumer (partial aggregation applies before the
    shuffle, so the fan-in is map-side cheap)."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"))
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"))
    return ops.reduce_fanin(
        [c, s],
        lambda d: d.groupBy("nk").agg(F.count(F.lit(1)).alias("n")))


@query("q_cmd_pipe")  # rows-only: external processes aren't SQL-expressible
def q_cmd_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gasket command stage (index.js:14-27): region rows serialized to
    NDJSON lines, piped through an external ``tr`` child process per
    partition (RDD.pipe, checkCode=True), counted back. Rows-only
    check — the observable contract is "the child ran and its output
    came back"."""
    eng = Engine({"shout": ["tr a-z A-Z"]}, spark=spark)
    src = read_table(spark, sf_dir, "region")
    out = eng.pipe("shout", input_df=src)
    return out.select(F.col("value").alias("line")).filter(
        F.col("line").contains("R_NAME"))
