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

    paths: list[str] = []
    for root, _dirs, files in os.walk(path):
        paths.extend(os.path.join(root, f) for f in files
                     if f.endswith(".parquet"))
    out: list[tuple] = []
    for fpath in sorted(paths):
        fname = os.path.relpath(fpath, path)
        meta = pq.ParquetFile(fpath).metadata
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


# ---------------------------------------------------------------------------
# Z-order (Morton curve) multi-column clustering
# ---------------------------------------------------------------------------

def _morton_key(bucket_cols, bits: int):
    """Interleave the low ``bits`` bits of each bucket column into one
    Morton key — pure JVM bit arithmetic, whole-stage-codegen'd."""
    from pyspark.sql import functions as F

    c = len(bucket_cols)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, b in enumerate(bucket_cols):
            z = z + F.shiftleft(
                F.shiftright(b.cast("long"), bit).bitwiseAND(1),
                bit * c + i)
    return z


def _quantile_buckets(df: DataFrame, cols: list[str], bits: int):
    """Per-column quantile bucket ids (0 .. 2^bits - 1) as JVM column
    expressions: one ``approxQuantile`` pass for ALL columns, bucket
    assignment is a fold over the broadcast boundary array. Quantile
    (not equi-width) bucketing keeps skewed columns filling the bucket
    space evenly — equi-width space-filling curves degenerate under
    skew."""
    from pyspark.sql import functions as F

    n = 1 << bits
    probs = [j / n for j in range(1, n)]
    all_bounds = df.stat.approxQuantile(list(cols), probs, 1.0 / (4 * n))

    def bucket_of(col: str, bounds: list[float]):
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        return F.aggregate(
            arr, F.lit(0),
            lambda acc, x: acc + F.when(
                F.col(col).cast("double") >= x, 1).otherwise(0))

    return [bucket_of(col, bounds)
            for col, bounds in zip(cols, all_bounds)]


def zorder_write(df: DataFrame, path: str, zorder_cols: list[str],
                 n_cells: int = 16, bits: int = 8,
                 mode: str = "overwrite") -> None:
    """Write ``df`` parquet clustered on a Z-order (Morton) curve over
    ``zorder_cols`` — the multi-column complement of
    :func:`cluster_write`. Lexicographic range clustering gives the
    LEADING column tight min/max stats but lets every trailing column
    span its full range in every file; interleaving the columns'
    bucket bits gives every participating column partially-tight
    stats, so a predicate on ANY of them skips row groups
    (the multi-dimensional point/box-lookup layout).

    Buckets are QUANTILE-based, not equi-width: one
    ``approxQuantile`` pass (all columns at once) computes 2^bits - 1
    boundaries per column, so skewed columns still fill the bucket
    space evenly — equi-width Morton degenerates under skew (most
    rows land in few buckets and the curve stops discriminating).
    Bucket assignment is a fold over the broadcast boundary array
    (O(2^bits) comparisons, JVM-side).

    Files are CELL-ALIGNED: the top ``log2(n_cells)`` Morton bits
    form a cell id written via ``partitionBy``, so every data file
    spans exactly one Z-cell — each column's per-file min/max is one
    contiguous 2^(bits - k/ncols)-bucket slice, never the straddled
    span a sampled range shuffle produces (range boundaries almost
    never land on cell boundaries, which halves the skip rate).
    Quantile bucketing makes cells near-equal-sized by construction,
    so the single ``repartition(n_cells)`` shuffle is balanced and
    each cell is written by one task as ~one file. Size n_cells so
    cells land near the 128 MB–1 GB file sweet spot at the target
    scale. Numeric columns only.
    """
    from pyspark.sql import functions as F

    buckets = _quantile_buckets(df, zorder_cols, bits)
    total_bits = bits * len(zorder_cols)
    k = min(max((n_cells - 1).bit_length(), 1), total_bits)
    keyed = df.withColumn("_z", _morton_key(buckets, bits)) \
              .withColumn("_zcell", F.shiftright(F.col("_z"),
                                                 total_bits - k))
    keyed.repartition(1 << k, "_zcell") \
        .sortWithinPartitions("_zcell", "_z").drop("_z") \
        .write.mode(mode).partitionBy("_zcell").parquet(path)


# ---------------------------------------------------------------------------
# Hilbert curve multi-column clustering
# ---------------------------------------------------------------------------

def _hilbert_index(coords, bits: int):
    """Vectorized Skilling transform: per-row bucket coordinates
    (N × n_dims int64, each in [0, 2^bits)) → Hilbert curve index.

    Skilling, "Programming the Hilbert curve" (AIP Conf. Proc. 707,
    2004): undo excess-work pass + Gray decode produce the transposed
    index; interleaving the transpose MSB-first yields the scalar key.
    All steps are numpy mask operations over the whole batch — no
    per-row Python."""
    import numpy as np

    X = coords.astype(np.int64).copy()
    n = X.shape[1]
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            on = (X[:, i] & q) != 0
            X[on, 0] ^= p
            t = (X[~on, 0] ^ X[~on, i]) & p
            X[~on, 0] ^= t
            X[~on, i] ^= t
        q >>= 1
    # Gray encode (cumulative xor across dims)
    X = np.bitwise_xor.accumulate(X, axis=1)
    t = np.zeros(len(X), dtype=np.int64)
    q = 1 << (bits - 1)
    while q > 1:
        on = (X[:, n - 1] & q) != 0
        t[on] ^= q - 1
        q >>= 1
    X ^= t[:, None]
    # interleave the transpose: index bit (b*n) order, MSB first
    z = np.zeros(len(X), dtype=np.int64)
    for bitpos in range(bits - 1, -1, -1):
        for i in range(n):
            z = (z << 1) | ((X[:, i] >> bitpos) & 1)
    return z


def hilbert_write(df: DataFrame, path: str, hilbert_cols: list[str],
                  n_cells: int = 16, bits: int = 8,
                  mode: str = "overwrite") -> None:
    """Write ``df`` parquet clustered on a HILBERT curve over
    ``hilbert_cols`` — same contract and cell-aligned file layout as
    :func:`zorder_write`, but on the curve with strictly better
    locality: Hilbert has no Morton "seams" (adjacent curve positions
    are always adjacent in space), so per-file bounding boxes are
    tighter and skip fractions higher, increasingly so at 3+ dims.

    Bucketing stays JVM-side (quantile fold, shared with Z-order);
    the bucket→curve-index transform runs as an Arrow-batched
    vectorized-numpy pandas_udf (Skilling's algorithm is a bit-level
    state machine that would explode whole-stage codegen as a column
    expression; a layout write is a one-time batch job, so one
    Python crossing on the write path is the right trade). Numeric
    columns only."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    import numpy as np

    buckets = _quantile_buckets(df, hilbert_cols, bits)
    total_bits = bits * len(hilbert_cols)
    k = min(max((n_cells - 1).bit_length(), 1), total_bits)

    def _hkey(*cols):
        coords = np.stack([c.to_numpy(np.int64) for c in cols], axis=1)
        return pd.Series(_hilbert_index(coords, bits))

    # varargs signature (n_dims is dynamic) → eval type can't be
    # hint-inferred; the hint-free form selects scalar Arrow eval
    hkey = pandas_udf(_hkey, "long")

    keyed = df.withColumn("_h", hkey(*buckets)) \
              .withColumn("_hcell", F.shiftright(F.col("_h"),
                                                 total_bits - k))
    keyed.repartition(1 << k, "_hcell") \
        .sortWithinPartitions("_hcell", "_h").drop("_h") \
        .write.mode(mode).partitionBy("_hcell").parquet(path)


# ---------------------------------------------------------------------------
# Bloom file index: file-level skipping for point lookups
# ---------------------------------------------------------------------------
#
# Min-max stats (and the range/Z-order/Hilbert layouts above) prune
# RANGE predicates on clustered columns; they are useless for point
# lookups on a high-cardinality column every file spans (user ids,
# content hashes). A per-FILE Bloom filter sidecar answers "which
# files can contain v" before any footer is opened — at 10^5+ files
# that is the difference between a point lookup and a full listing
# scan. Parquet's native row-group bloom filters (write option
# parquet.bloom.filter.enabled#col) are the complementary layer INSIDE
# each file; this index sits a level above, at the file manifest
# grain, like a lakehouse file-stats table.
#
# Determinism: positions come from Spark-side xxhash64(col, seed) —
# the probe side computes hashes with the SAME engine expression, so
# there is no Python reimplementation to drift. No false negatives by
# construction (tested); false-positive rate ~ (1 - e^{-kn/m})^k.

BLOOM_M = 1 << 17          # bits per file (16 KiB packed)
BLOOM_K = 5                # hash functions


def _bloom_positions(col, m: int = BLOOM_M, k: int = BLOOM_K) -> list:
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    # canonicalize to STRING before hashing: Spark's xxhash64 hashes
    # int32 and int64 of the same numeric value DIFFERENTLY, so a
    # probe list inferred as long against an int-typed column would
    # silently produce false negatives — the one failure mode a Bloom
    # index must never have. String rendering is width-proof.
    c = c.cast("string")
    return [F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m)) for i in range(k)]


def bloom_index_write(df: DataFrame, path: str, column: str,
                      m: int = BLOOM_M, k: int = BLOOM_K,
                      mode: str = "overwrite") -> None:
    """Write ``df`` as parquet plus a ``_bloom_index`` sidecar: one row
    per data file with that file's packed Bloom bitset over
    ``column``. The index is built from the WRITTEN files (one
    read-back pass), so it always describes the on-disk bytes — the
    same post-write discipline as the shard manifests. Underscore
    prefix keeps Spark's file index from reading the sidecar as
    data."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)

    df.write.mode(mode).parquet(path)
    spark = df.sparkSession
    scan = spark.read.parquet(path)
    # record the indexed column's type so probes canonicalize to the
    # SAME string: an int probe against a double column must render
    # "1.0" like the build did, not "1" (silent false negatives)
    coltype = scan.schema[column].dataType.simpleString()
    pos = (scan.select(F.input_file_name().alias("file"),
                       F.explode(F.array(*_bloom_positions(column, m, k)))
                       .alias("p"))
           .distinct())
    schema = StructType([StructField("file", StringType()),
                         StructField("words", ArrayType(LongType())),
                         StructField("m", LongType()),
                         StructField("k", LongType()),
                         StructField("coltype", StringType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(m // 64, dtype=np.uint64)
        ps = pdf["p"].to_numpy(dtype=np.int64)
        np.bitwise_or.at(words, ps >> 6,
                         np.left_shift(np.uint64(1),
                                       (ps & 63).astype(np.uint64)))
        return pd.DataFrame(
            [(pdf.iloc[0]["file"], words.view(np.int64).tolist(), m, k,
              coltype)],
            columns=["file", "words", "m", "k", "coltype"])

    (pos.groupBy("file").applyInPandas(pack, schema=schema)
        .coalesce(1)
        .write.mode("overwrite").parquet(os.path.join(path,
                                                      "_bloom_index")))


def bloom_candidate_files(spark, path: str, column: str,
                          values: list) -> list[str]:
    """Files under ``path`` that MAY contain any of ``values`` in
    ``column`` (no false negatives; false positives at the Bloom
    rate). Probe hashes are computed by the same Spark xxhash64
    expression that built the index. The bit checks run driver-side
    over the file-grain index — fine to ~10^5 files; beyond that the
    index is itself a table to semi-join (the listing-service
    boundary, same note as compact_partitioned)."""
    import numpy as np
    from pyspark.sql import functions as F

    if not values:
        return []
    idx = spark.read.parquet(os.path.join(path, "_bloom_index")) \
        .collect()
    if not idx:
        return []
    m, k = int(idx[0]["m"]), int(idx[0]["k"])
    # cast the probes to the INDEXED column's type before the string
    # canonicalization — an int probe against a double column must
    # hash as "1.0", exactly as the build pass rendered it
    coltype = idx[0]["coltype"]
    probe = (spark.createDataFrame([(v,) for v in values], ["v"])
             .select(F.array(*_bloom_positions(
                 F.col("v").cast(coltype), m, k)).alias("ps"))
             .collect())
    out = []
    for row in idx:
        words = np.array(row["words"], dtype=np.int64).view(np.uint64)
        for pr in probe:
            ps = np.array(pr["ps"], dtype=np.int64)
            bits = (words[ps >> 6] >> (ps & 63).astype(np.uint64)) \
                & np.uint64(1)
            if bits.all():
                out.append(row["file"])
                break
    return sorted(out)


def bloom_skip_read(spark, path: str, column: str,
                    values: list) -> DataFrame:
    """Point-lookup read through the Bloom file index: open ONLY the
    candidate files, then apply the exact IN filter (Bloom false
    positives are removed here; false negatives cannot exist)."""
    from pyspark.sql import functions as F

    files = bloom_candidate_files(spark, path, column, values)
    if not files:
        return (spark.read.parquet(path)
                .filter(F.lit(False)))
    return (spark.read.option("basePath", path).parquet(*files)
            .filter(F.col(column).isin(values)))
