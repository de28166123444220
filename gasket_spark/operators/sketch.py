"""KMV (k-minimum-values) distinct-count sketches.

``approx_count_distinct`` (HLL++) answers one-shot cardinality; a KMV
sketch additionally gives an ENGINE-INSPECTABLE, UNION-MERGEABLE
representation: the sketch of A ∪ B is just the k smallest values of
the two sketches' union — so per-partition / per-day sketches roll up
without rescanning data (the cross-batch shape incremental pipelines
need). Estimate: with u_k = the k-th smallest of the key hashes mapped
uniformly into (0,1), E[distinct] ≈ (k-1)/u_k; error ~ 1/√k.

Everything is JVM expressions (xxhash64 + windowed top-k + aggregates);
the sketch per group is k longs — broadcastable, storable, diffable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# map signed-64 hash to uniform (0,1): (h + 2^63 + 1) / (2^64 + 2)
_OFFSET = float(2 ** 63) + 1.0
_RANGE = float(2 ** 64) + 2.0


def kmv_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               k: int = 1024) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct hash values of
    ``value_col``, plus ``n_seen`` (how many distinct hashes the group
    actually had, capped at k — needed for the exact-below-k case).
    Returns (group_cols…, sketch: array<long>, n_seen: long)."""
    hashed = df.select(
        *group_cols, F.xxhash64(F.col(value_col)).alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = hashed.withColumn("_rk", F.row_number().over(w)) \
                 .filter(F.col("_rk") <= k)
    return (
        topk.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("sketch"),
             F.count(F.lit(1)).alias("n_seen"))
    )


def kmv_estimate(sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Distinct-count estimate per sketch row: exact when the group had
    fewer than k distinct values (the sketch IS the distinct hash set),
    else (k-1)/u_k."""
    u_k = (F.element_at("sketch", k).cast("double") + F.lit(_OFFSET)) \
        / F.lit(_RANGE)
    return sketches.withColumn(
        "distinct_est",
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise((F.lit(float(k - 1)) / u_k)))


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str],
              k: int = 1024) -> DataFrame:
    """Union-merge two sketch tables: per group, the k smallest of the
    combined (distinct) hash values — the sketch the FULL union of the
    underlying data would have produced. Outer-merges groups present in
    only one side."""
    both = (
        a.select(*group_cols, F.explode("sketch").alias("_h"))
        .unionByName(b.select(*group_cols, F.explode("sketch").alias("_h")))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = both.withColumn("_rk", F.row_number().over(w)) \
               .filter(F.col("_rk") <= k)
    return (
        topk.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("sketch"),
             F.count(F.lit(1)).alias("n_seen"))
    )
