"""Document packing: assign documents to fixed-token-budget shards.

The training-data step after dedup/filtering: pack the corpus into
shards of ~``target_tokens`` each (sequence-packing at the file level).
Shard id is ``floor(prefix_sum_before_doc / target)`` over a
deterministic document order — simple, reproducible, and what the SQL
oracle can state in one window expression.

The implementation point is the PREFIX SUM. The naive form — a window
over a global ORDER BY with no PARTITION BY — makes Spark shuffle the
entire corpus into ONE task; correct at test scale, dead at 100 TB.
:func:`pack_shards` computes the same numbers with the classic
distributed two-phase pattern instead:

1. range-partition by the order key (`repartitionByRange` gives
   ascending, non-overlapping key ranges per partition id);
2. per-partition running sums (parallel windows, partitioned by the
   Spark partition id);
3. per-partition totals — at most one row per partition — cascaded
   into global offsets with one tiny window;
4. global prefix = partition offset + local running sum.

Only step 3 is single-task, over ~thousands of rows, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(df: DataFrame, order_by: list,
                      out_col: str = "rn") -> DataFrame:
    """Distributed global ``row_number()`` (1-based) over ``order_by``
    WITHOUT a single-partition window — the same two-phase prefix-sum
    shape as :func:`pack_shards`: range-partition by the sort key
    (ascending partition ids follow the key order), a parallel local
    row_number per partition, then a broadcast cascade of per-partition
    counts (one tiny window over ≤ #partitions rows). Total order must
    be unique for a deterministic result (callers pass a tie-breaking
    column)."""
    parts = df.repartitionByRange(*order_by) \
        .withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid").orderBy(*order_by)
    local = parts.withColumn("_lrn", F.row_number().over(w_local))
    w_off = (Window.orderBy(F.col("_pid").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (
        local.groupBy("_pid").agg(F.max("_lrn").alias("_pcnt"))
        .withColumn("_off",
                    F.coalesce(F.sum("_pcnt").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col,
                    (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def pack_shards(df: DataFrame, token_col: str, id_col: str,
                target_tokens: int, n_partitions: int | None = None
                ) -> DataFrame:
    """Assign each row a ``shard_id`` so consecutive docs (by
    ``id_col``) fill ~``target_tokens`` per shard. Returns the input
    columns plus (cum_before, shard_id). Deterministic for a given
    (corpus, target)."""
    parts = df.repartitionByRange(
        *( [n_partitions] if n_partitions else [] ), F.col(id_col))
    parts = parts.withColumn("_pid", F.spark_partition_id())

    w_local = (Window.partitionBy("_pid").orderBy(F.col(id_col).asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = parts.withColumn(
        "_local_cum", F.sum(token_col).over(w_local))

    # one row per partition; the cascade window is over this tiny set
    w_off = (Window.orderBy(F.col("_pid").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (
        local.groupBy("_pid").agg(F.max("_local_cum").alias("_ptotal"))
        .withColumn("_offset",
                    F.coalesce(F.sum("_ptotal").over(w_off), F.lit(0)))
        .select("_pid", "_offset")
    )

    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_before",
                    (F.col("_offset") + F.col("_local_cum")
                     - F.col(token_col)).cast("bigint"))
        .withColumn("shard_id",
                    F.floor(F.col("cum_before") / F.lit(target_tokens)))
        .drop("_pid", "_local_cum", "_offset")
    )
    return out
