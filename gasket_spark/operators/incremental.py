"""Incremental aggregate maintenance: per-batch partial states with an
EXACT merge law.

The daily-ingest shape at 100 TB: the corpus grows by a batch at a
time, and per-key statistics (counts, sums, extrema, means) must stay
current WITHOUT rescanning the accumulated corpus. The classic answer
is a materialized partial-aggregate state table: each batch is
aggregated once into (key, count, sum, min, max) rows, and states
merge by the distributive laws (count+count, sum+sum, min(min,min),
max(max,max)). Means and other algebraic aggregates are DERIVED from
the state at read time, never stored — storing a mean destroys
mergeability.

Sums are kept in integer space (``functions.numeric`` pattern), so the
merge law is EXACT — merging per-batch states is bit-identical to
aggregating the full corpus, regardless of how the corpus was split
into batches (tested in tests/test_incremental.py, and hash-verified
against the full-scan DuckDB oracle as ``q_incr_agg``).

The reference has no aggregation at all (its pipelines stream bytes,
/root/reference/index.js:140-161); this operator is part of the
engine's declared data-processing capability (SURVEY.md §2B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gasket_spark.functions.numeric import iscaled


def partial_agg(batch: DataFrame, keys: list[str], value_col: str,
                scale: int = 100) -> DataFrame:
    """Aggregate one batch into its mergeable state:
    (keys…, n, sum_i, min_i, max_i) with the value in integer space.
    One two-phase hash aggregate (map-side partials) per batch."""
    v = iscaled(F.col(value_col), scale)
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sum_i"),
        F.min(v).alias("min_i"),
        F.max(v).alias("max_i"))


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge any number of state tables by the distributive laws —
    associative and commutative, so batches can arrive and merge in
    any order (and states can themselves be merged states). One
    shuffle on the keys over state-sized (not corpus-sized) input."""
    keys = [c for c in states[0].columns
            if c not in ("n", "sum_i", "min_i", "max_i")]
    allst = states[0]
    for s in states[1:]:
        allst = allst.unionByName(s)
    return allst.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_i").alias("sum_i"),
        F.min("min_i").alias("min_i"),
        F.max("max_i").alias("max_i"))


def finalize(state: DataFrame, scale: int = 100) -> DataFrame:
    """Derive the queryable aggregates from a state table: count,
    sum, min, max, mean — each a deterministic single IEEE-754 op
    from the exact integer state."""
    keys = [c for c in state.columns
            if c not in ("n", "sum_i", "min_i", "max_i")]
    s = float(scale)
    return state.select(
        *keys,
        F.col("n"),
        (F.col("sum_i").cast("double") / s).alias("sum_v"),
        (F.col("min_i").cast("double") / s).alias("min_v"),
        (F.col("max_i").cast("double") / s).alias("max_v"),
        (F.col("sum_i").cast("double") / F.col("n").cast("double") / s)
        .alias("avg_v"))
