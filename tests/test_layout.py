"""Physical-layout property tests: range-clustered writes must produce
row-group min/max stats that actually enable data skipping, which is a
checkable footer property — not a timing assertion."""

import pytest

from pyspark.sql import functions as F

from gasket_spark.io import read_table
from gasket_spark.operators.layout import (
    cluster_write, skip_fraction, skipping_stats,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    li = read_table(spark, SF_SMALL, "lineitem") \
        .select("l_orderkey", "l_shipdate", "l_extendedprice")
    base = tmp_path_factory.mktemp("layout")
    clustered = str(base / "clustered")
    unclustered = str(base / "unclustered")
    cluster_write(li, clustered, ["l_shipdate"], n_files=8)
    # control: same data, hash-scattered layout
    li.repartition(8).write.mode("overwrite").parquet(unclustered)
    return clustered, unclustered


def _month_bounds(spark, sf=SF_SMALL):
    row = read_table(spark, sf, "lineitem").agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    ).collect()[0]
    return row.lo, row.hi


class TestClusterWrite:
    def test_files_have_disjoint_ranges(self, layouts):
        clustered, _ = layouts
        stats = skipping_stats(clustered, "l_shipdate")
        # collapse to per-file [min, max] and check non-overlap
        per_file: dict = {}
        for fname, _, mn, mx in stats:
            lo, hi = per_file.get(fname, (mn, mx))
            per_file[fname] = (min(lo, mn), max(hi, mx))
        spans = sorted(per_file.values())
        assert len(spans) >= 4
        overlaps = sum(1 for (_, hi), (lo, _) in zip(spans, spans[1:])
                       if lo < hi)
        assert overlaps == 0, f"range-partitioned files overlap: {spans}"

    def test_narrow_scan_skips_most_row_groups(self, spark, layouts):
        """A one-week predicate on 7 years of shipdates must skip the
        vast majority of clustered row groups — and ~none of the
        hash-scattered control layout."""
        import datetime

        clustered, unclustered = layouts
        lo = datetime.datetime(1996, 6, 1)
        hi = datetime.datetime(1996, 6, 8)
        frac_clustered = skip_fraction(
            skipping_stats(clustered, "l_shipdate"), lo, hi)
        frac_control = skip_fraction(
            skipping_stats(unclustered, "l_shipdate"), lo, hi)
        assert frac_clustered >= 0.75
        assert frac_control <= 0.25

    def test_clustered_layout_preserves_data(self, spark, layouts):
        clustered, _ = layouts
        li = read_table(spark, SF_SMALL, "lineitem")
        back = spark.read.parquet(clustered)
        assert back.count() == li.count()
        a = back.agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                           .cast("bigint"))).collect()[0][0]
        b = li.agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                         .cast("bigint"))).collect()[0][0]
        assert a == b


class TestZOrderWrite:
    @pytest.fixture(scope="class")
    def zlayouts(self, spark, tmp_path_factory):
        from tests.conftest import SF_ORACLE
        from gasket_spark.operators.layout import zorder_write

        li = read_table(spark, SF_ORACLE, "lineitem") \
            .select("l_orderkey", "l_partkey", "l_suppkey")
        base = tmp_path_factory.mktemp("zorder")
        zpath = str(base / "z")
        lexpath = str(base / "lex")
        zorder_write(li, zpath, ["l_partkey", "l_suppkey"], n_cells=64)
        cluster_write(li, lexpath, ["l_partkey", "l_suppkey"], n_files=64)
        return zpath, lexpath

    def _mid_range(self, spark, col):
        from tests.conftest import SF_ORACLE
        lo, hi = read_table(spark, SF_ORACLE, "lineitem") \
            .stat.approxQuantile(col, [0.25, 0.5], 0.001)
        return lo, hi

    def test_zorder_skips_on_both_columns(self, spark, zlayouts):
        """A quartile-wide predicate on EITHER z-order column must
        skip at least half the row groups — the property lexicographic
        sort only provides for its leading column."""
        zpath, _ = zlayouts
        for col in ("l_partkey", "l_suppkey"):
            lo, hi = self._mid_range(spark, col)
            frac = skip_fraction(skipping_stats(zpath, col), lo, hi)
            assert frac >= 0.5, (col, frac)

    def test_lexicographic_cannot_skip_trailing_column(self, spark,
                                                       zlayouts):
        """Control: the same quartile predicate on the TRAILING
        lexicographic sort column skips ~nothing (every file spans the
        full suppkey range) — the gap z-ordering exists to close."""
        _, lexpath = zlayouts
        lo, hi = self._mid_range(spark, "l_suppkey")
        frac = skip_fraction(skipping_stats(lexpath, "l_suppkey"), lo, hi)
        assert frac <= 0.25, frac

    def test_zorder_preserves_data(self, spark, zlayouts):
        from tests.conftest import SF_ORACLE
        zpath, _ = zlayouts
        li = read_table(spark, SF_ORACLE, "lineitem")
        back = spark.read.parquet(zpath)
        # _zcell is the cell-id layout column (a partition directory,
        # usable for coarse pruning) — not part of the logical data
        assert set(back.columns) - set(li.columns) == {"_zcell"}
        assert back.count() == li.count()
        assert back.agg(F.sum("l_partkey")).collect()[0][0] == \
            li.agg(F.sum("l_partkey")).collect()[0][0]


class TestHilbertWrite:
    def test_curve_adjacency_property(self):
        """Ground truth for the Skilling transform: walking the full
        2D 16×16 grid in Hilbert-index order moves exactly one step in
        exactly one coordinate each time (the locality property Morton
        lacks), and the index is a bijection onto [0, 256)."""
        import numpy as np

        from gasket_spark.operators.layout import _hilbert_index

        bits = 4
        g = np.arange(1 << bits, dtype=np.int64)
        coords = np.stack(np.meshgrid(g, g), axis=-1).reshape(-1, 2)
        idx = _hilbert_index(coords, bits)
        assert sorted(idx) == list(range((1 << bits) ** 2))
        order = coords[np.argsort(idx)]
        steps = np.abs(np.diff(order, axis=0)).sum(axis=1)
        assert (steps == 1).all()

    @pytest.fixture(scope="class")
    def hlayouts(self, spark, tmp_path_factory):
        from tests.conftest import SF_ORACLE
        from gasket_spark.operators.layout import hilbert_write

        li = read_table(spark, SF_ORACLE, "lineitem") \
            .select("l_orderkey", "l_partkey", "l_suppkey")
        base = tmp_path_factory.mktemp("hilbert")
        hpath = str(base / "h")
        hilbert_write(li, hpath, ["l_partkey", "l_suppkey"], n_cells=64)
        return hpath

    def test_hilbert_skips_on_both_columns(self, spark, hlayouts):
        from tests.conftest import SF_ORACLE
        for col in ("l_partkey", "l_suppkey"):
            lo, hi = read_table(spark, SF_ORACLE, "lineitem") \
                .stat.approxQuantile(col, [0.25, 0.5], 0.001)
            frac = skip_fraction(skipping_stats(hlayouts, col), lo, hi)
            assert frac >= 0.5, (col, frac)

    def test_hilbert_preserves_data(self, spark, hlayouts):
        from tests.conftest import SF_ORACLE
        li = read_table(spark, SF_ORACLE, "lineitem")
        back = spark.read.parquet(hlayouts)
        assert set(back.columns) - {"l_orderkey", "l_partkey",
                                    "l_suppkey"} == {"_hcell"}
        assert back.count() == li.count()
        assert back.agg(F.sum("l_partkey")).collect()[0][0] == \
            li.agg(F.sum("l_partkey")).collect()[0][0]


class TestBloomFileIndex:
    def test_no_false_negatives_and_real_skipping(self, spark, tmp_path):
        """Write customers hash-distributed on custkey into 8 files
        with a bloom index on c_custkey: every probed present key's
        file must be a candidate (no false negatives), the candidate
        set must be a strict subset of all files (real skipping), and
        the pruned read must equal the full-scan filter exactly."""
        from gasket_spark.operators.layout import (
            bloom_candidate_files, bloom_index_write, bloom_skip_read)

        path = str(tmp_path / "bloomed")
        cust = read_table(spark, SF_SMALL, "customer") \
            .select("c_custkey", "c_name", "c_acctbal")
        bloom_index_write(cust.repartition(8, "c_custkey"), path,
                          "c_custkey")
        keys = [r.c_custkey for r in cust.limit(5).collect()]
        total_files = len({r[0] for r in spark.read.parquet(path)
                           .select(F.input_file_name()).distinct()
                           .collect()})
        cand = bloom_candidate_files(spark, path, "c_custkey", keys)
        assert 0 < len(cand) < total_files   # skipped something
        got = bloom_skip_read(spark, path, "c_custkey", keys)
        want = spark.read.parquet(path).filter(
            F.col("c_custkey").isin(keys))
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, want.collect()))
        assert got.count() == len(keys)

    def test_int_typed_column_probed_with_python_ints(self, spark,
                                                      tmp_path):
        """Type-width proofing: an INT (32-bit) indexed column probed
        with Python ints (inferred LONG) must still have zero false
        negatives — Spark's xxhash64 hashes int32 and int64 of the
        same value differently, which is why positions hash the
        STRING canonicalization."""
        from gasket_spark.operators.layout import (
            bloom_index_write, bloom_skip_read)

        path = str(tmp_path / "bloomed_int")
        df = spark.range(0, 2000).select(
            (F.col("id") % 997).cast("int").alias("k"),
            F.col("id").alias("v"))
        bloom_index_write(df.repartition(8, "k"), path, "k")
        got = bloom_skip_read(spark, path, "k", [5, 13, 996])
        want = spark.read.parquet(path).filter(
            F.col("k").isin([5, 13, 996]))
        assert got.count() == want.count() > 0

    def test_double_column_probed_with_python_ints(self, spark,
                                                   tmp_path):
        """Cross-type probing: a DOUBLE indexed column probed with
        Python ints must match everything the exact isin() filter
        matches (Spark coerces 1 == 1.0) — the sidecar records the
        column type so probes canonicalize to the same string the
        build hashed ('1.0', not '1')."""
        from gasket_spark.operators.layout import (
            bloom_index_write, bloom_skip_read)

        path = str(tmp_path / "bloomed_dbl")
        df = spark.range(0, 800).select(
            (F.col("id") % 97).cast("double").alias("k"),
            F.col("id").alias("v"))
        bloom_index_write(df.repartition(6, "k"), path, "k")
        got = bloom_skip_read(spark, path, "k", [5, 13])
        want = spark.read.parquet(path).filter(
            F.col("k").isin([5, 13]))
        assert got.count() == want.count() > 0
        # empty probe list is a no-op, not a crash
        assert bloom_skip_read(spark, path, "k", []).count() == 0

    def test_absent_value_reads_nothing_or_fp_only(self, spark,
                                                   tmp_path):
        from gasket_spark.operators.layout import (
            bloom_candidate_files, bloom_index_write, bloom_skip_read)

        path = str(tmp_path / "bloomed2")
        cust = read_table(spark, SF_SMALL, "customer") \
            .select("c_custkey", "c_name")
        bloom_index_write(cust.repartition(6, "c_custkey"), path,
                          "c_custkey")
        # far outside the key domain: candidates may be FP files but
        # the exact filter must return zero rows
        assert bloom_skip_read(spark, path, "c_custkey",
                               [10**12]).count() == 0
        # and the sidecar is invisible to a plain read
        assert spark.read.parquet(path).count() == cust.count()
