"""One-pass multi-column table profiling.

``q_profile`` (queries/relational.py) keeps one aggregate per column
family for oracle clarity; this is the production variant that docstring
promises: ALL columns profiled in a SINGLE scan — one global aggregate
whose partials are map-side and mergeable (counts are sums,
``approx_count_distinct`` is an HLL sketch, extrema are min/max), so a
100 TB table is profiled at the cost of one narrow pass regardless of
how many columns are audited. The per-column reshape happens on the
driver over ONE collected row (a loop over columns, never over data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) in one pass. Returns one row per
    column: (col, n, n_nonnull, distinct_est, min_v, max_v) with
    extrema stringified (profiles are heterogeneous by nature)."""
    cols = list(cols or df.columns)
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(c).alias(f"_nn{i}"),
            F.approx_count_distinct(c).alias(f"_d{i}"),
            F.min(c).cast("string").alias(f"_lo{i}"),
            F.max(c).cast("string").alias(f"_hi{i}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [(c, row["_n"], row[f"_nn{i}"], row[f"_d{i}"],
            row[f"_lo{i}"], row[f"_hi{i}"]) for i, c in enumerate(cols)]
    return df.sparkSession.createDataFrame(
        out, "col string, n bigint, n_nonnull bigint, "
             "distinct_est bigint, min_v string, max_v string")
