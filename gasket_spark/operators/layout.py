"""Data-layout optimization: range-clustered parquet writes for
data skipping.

At 100 TB the cheapest predicate is the one that never reads a byte:
parquet stores per-row-group min/max statistics, and a scan skips any
row group whose [min, max] can't satisfy the filter. Those stats are
only selective if the data is *clustered* on the filter column —
a randomly-laid-out table has every row group spanning the full value
range, so nothing skips. :func:`cluster_write` produces the clustered
layout:

* ``repartitionByRange(cols)`` — one range shuffle; file i holds a
  contiguous, non-overlapping slice of the key space (Spark samples
  the distribution to build balanced range bounds, so skew in the
  cluster key becomes balanced files, not hot files);
* ``sortWithinPartitions(cols)`` — no extra shuffle; rows inside each
  file are ordered, so row groups *within* a file also get tight,
  disjoint min/max ranges (row-group-level skipping on top of
  file-level).

For multi-column point-lookup workloads a space-filling curve
(Z-order/Hilbert) beats lexicographic sort on the trailing columns;
lexicographic range clustering is optimal for the leading column and
for time-range scans, which is the dominant telemetry/training-data
access pattern. The reference has no storage layer at all (bytes over
OS pipes, /root/reference/index.js:25); this operator exists for the
100 TB target.

``skipping_stats`` reads back the parquet footers (pyarrow, no data
IO) and reports how selective a range predicate would be — the
verifiable physical property, used by tests/test_layout.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def cluster_write(df: DataFrame, path: str, cluster_cols: list[str],
                  n_files: int | None = None, mode: str = "overwrite") -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``.

    ``n_files`` caps the file count (default: Spark's range-partition
    sampling decides); size it so files land near the 128 MB–1 GB
    sweet spot at the target scale.
    """
    if n_files is not None:
        part = df.repartitionByRange(n_files, *cluster_cols)
    else:
        part = df.repartitionByRange(*cluster_cols)
    part.sortWithinPartitions(*cluster_cols) \
        .write.mode(mode).parquet(path)


def skipping_stats(path: str, column: str) -> list[tuple]:
    """Per-row-group (min, max) for ``column`` across all parquet files
    under ``path`` — footer metadata only, no data read. Returns a list
    of (file, row_group_index, min, max)."""
    import pyarrow.parquet as pq

    out: list[tuple] = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, fname)).metadata
        col_idx = {meta.row_group(0).column(i).path_in_schema: i
                   for i in range(meta.num_columns)}[column]
        for rg in range(meta.num_row_groups):
            stats = meta.row_group(rg).column(col_idx).statistics
            out.append((fname, rg, stats.min, stats.max))
    return out


def skip_fraction(stats: list[tuple], lo, hi) -> float:
    """Fraction of row groups a scan for ``column BETWEEN lo AND hi``
    would skip outright, given :func:`skipping_stats` output."""
    if not stats:
        return 0.0
    skipped = sum(1 for (_, _, mn, mx) in stats if mx < lo or mn > hi)
    return skipped / len(stats)
