"""Schema-evolution reads: a long-running ingest directory accumulates
batches written under drifting schemas; the scan must read them all
without rewriting old data (at 100 TB, rewriting is the thing you
never get to do)."""

import os

import pytest

from pyspark.sql import functions as F

from gasket_spark.io import read_parquet_evolving


@pytest.fixture(scope="module")
def drifted_dir(spark, tmp_path_factory):
    """Three batches of one logical table, schema drifting over time:
    v1 (id, val) → v2 adds source → v3 reorders columns."""
    base = str(tmp_path_factory.mktemp("evolve") / "t")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id bigint, val double"
    ).write.parquet(base + "/batch=1")
    spark.createDataFrame(
        [(3, 30.0, "s1")], "id bigint, val double, source string"
    ).write.parquet(base + "/batch=2")
    spark.createDataFrame(
        [("s2", 4, 40.0)], "source string, id bigint, val double"
    ).write.parquet(base + "/batch=3")
    return base


class TestMergeSchema:
    def test_union_schema_with_nulls_for_predating_batches(
            self, spark, drifted_dir):
        df = read_parquet_evolving(spark, drifted_dir)
        assert set(df.columns) == {"id", "val", "source", "batch"}
        rows = {r.id: r for r in df.collect()}
        assert len(rows) == 4
        assert rows[1].source is None          # batch 1 predates source
        assert rows[3].source == "s1"
        assert rows[4].source == "s2"          # column order irrelevant

    def test_aggregates_span_all_batches(self, spark, drifted_dir):
        df = read_parquet_evolving(spark, drifted_dir)
        assert df.agg(F.sum("val")).collect()[0][0] == 100.0


class TestPinnedSchema:
    def test_contract_schema_reads_drifted_files(self, spark, drifted_dir):
        """Production path: plan against the contract schema, no
        footer-union pass; files missing a contract column yield
        nulls, dropped columns are never read."""
        df = read_parquet_evolving(
            spark, drifted_dir, "id bigint, source string")
        # directory partition columns (batch=N) are discovered and
        # appended regardless of the pinned file schema
        assert df.columns == ["id", "source", "batch"]
        rows = {r.id: r.source for r in df.collect()}
        assert rows == {1: None, 2: None, 3: "s1", 4: "s2"}

    def test_pinned_schema_prunes_scan(self, spark, drifted_dir):
        """The read schema in the physical plan carries only the
        contract columns — `val` is never decoded."""
        df = read_parquet_evolving(spark, drifted_dir, "id bigint")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "val" not in plan


class TestTypeWidening:
    def test_pinned_wider_schema_upcasts_old_batches(
            self, spark, tmp_path_factory):
        """Type drift: a column written as int in early batches and
        bigint later must read uniformly under the WIDER pinned
        contract (parquet int32 upcasts to long at scan time — no
        rewrite of old data)."""
        base = str(tmp_path_factory.mktemp("widen") / "t")
        spark.createDataFrame([(1, 10)], "id bigint, v int") \
            .write.parquet(base + "/batch=1")
        spark.createDataFrame([(2, 2**40)], "id bigint, v bigint") \
            .write.parquet(base + "/batch=2")
        df = read_parquet_evolving(spark, base, "id bigint, v bigint")
        rows = {r.id: r.v for r in df.collect()}
        assert rows == {1: 10, 2: 2**40}
        assert dict(df.dtypes)["v"] == "bigint"


class TestMalformedRecords:
    @pytest.fixture(scope="class")
    def dirty_ndjson(self, spark, tmp_path_factory):
        p = tmp_path_factory.mktemp("dirty") / "feed.ndjson"
        p.write_text('{"id": 1, "v": "a"}\n'
                     'NOT JSON AT ALL\n'
                     '{"id": 2, "v": "b"}\n'
                     '{"id": broken\n')
        return str(p)

    SCHEMA = "id bigint, v string, _bad string"

    def test_permissive_quarantines_bad_lines(self, spark, dirty_ndjson):
        from gasket_spark.io import read_ndjson

        df = read_ndjson(spark, dirty_ndjson, self.SCHEMA,
                         corrupt_col="_bad")
        rows = df.collect()
        good = {r.id: r.v for r in rows if r._bad is None}
        bad = sorted(r._bad for r in rows if r._bad is not None)
        assert good == {1: "a", 2: "b"}
        assert bad == ['NOT JSON AT ALL', '{"id": broken']

    def test_dropmalformed_keeps_only_good(self, spark, dirty_ndjson):
        from gasket_spark.io import read_ndjson

        df = read_ndjson(spark, dirty_ndjson, "id bigint, v string",
                         mode="DROPMALFORMED")
        assert {r.id for r in df.collect()} == {1, 2}

    def test_failfast_aborts(self, spark, dirty_ndjson):
        from gasket_spark.io import read_ndjson

        df = read_ndjson(spark, dirty_ndjson, "id bigint, v string",
                         mode="FAILFAST")
        # surfaces as a JVM task failure (Py4JJavaError), not a typed
        # PySpark exception — assert on the abort, not the wrapper
        with pytest.raises(Exception, match="(?i)malformed|cannot read"):
            df.collect()


class TestNanosTimestamps:
    def test_pre_epoch_nanos_floor_to_earlier_microsecond(
            self, spark, tmp_path_factory):
        """TIMESTAMP(NANOS) truncation must FLOOR: -250 ns is
        23:59:59.999999, not 00:00:00 (truncate-toward-zero)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gasket_spark.io import read_table

        d = tmp_path_factory.mktemp("nanos")
        # nanos-since-epoch: pre-epoch non-divisible, pre-epoch exact,
        # post-epoch non-divisible (regression for the unchanged path)
        tbl = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([-250, -1_000, 1_999],
                           pa.timestamp("ns")),
        })
        pq.write_table(tbl, str(d / "t.parquet"))
        # exact integer checks via unix_micros to dodge float rounding
        from pyspark.sql import functions as F
        got = {r.id: r.us for r in
               read_table(spark, str(d), "t")
               .select("id", F.unix_micros("ts").alias("us")).collect()}
        assert got == {1: -1, 2: -1, 3: 1}

    def test_ns_column_added_by_later_file_is_detected(
            self, tmp_path_factory):
        """Schema evolution: a multi-file dataset where only a LATER
        file carries the TIMESTAMP(NANOS) column must still flag it —
        the pre-r8 detector inspected files[0] only."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gasket_spark.io import _nanos_timestamp_cols

        d = tmp_path_factory.mktemp("nanos_evo") / "t.parquet"
        d.mkdir()
        pq.write_table(pa.table({"id": pa.array([1], pa.int64())}),
                       str(d / "a.parquet"))
        pq.write_table(pa.table({
            "id": pa.array([2], pa.int64()),
            "ts": pa.array([1_999], pa.timestamp("ns")),
        }), str(d / "b.parquet"))
        assert _nanos_timestamp_cols(str(d)) == ["ts"]

    def test_nested_ns_leaf_raises_loudly(self, tmp_path_factory):
        """A nested TIMESTAMP(NANOS) leaf cannot be rewritten by the
        top-level withColumn conversion — it must raise, never
        silently mis-convert a same-named top-level column."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest as _pytest

        from gasket_spark.io import _nanos_timestamp_cols

        d = tmp_path_factory.mktemp("nanos_nested")
        tbl = pa.table({
            "id": pa.array([1], pa.int64()),
            "s": pa.array([{"ts": 1_999}],
                          pa.struct([("ts", pa.timestamp("ns"))])),
        })
        pq.write_table(tbl, str(d / "t.parquet"))
        with _pytest.raises(NotImplementedError, match="nested"):
            _nanos_timestamp_cols(str(d))

    def test_dot_named_top_level_ns_column_is_not_nested(
            self, tmp_path_factory):
        """Nesting is judged by the ARROW schema structure, not by
        dots in the parquet path: a top-level column literally named
        'a.b' is convertible (the pre-r9 substring check raised)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gasket_spark.io import _nanos_timestamp_cols

        d = tmp_path_factory.mktemp("nanos_dotname")
        pq.write_table(pa.table({
            "a.b": pa.array([1_999], pa.timestamp("ns")),
        }), str(d / "t.parquet"))
        assert _nanos_timestamp_cols(str(d)) == ["a.b"]

    def test_tz_aware_top_level_ns_column_converts(
            self, spark, tmp_path_factory):
        """A tz-aware ns column (arrow ``timestamp[ns, tz=UTC]``,
        parquet isAdjustedToUTC=true — e.g. pandas tz-aware writes)
        is still a TOP-LEVEL convertible column: the pre-r10 detector
        compared str(type) == "timestamp[ns]" exactly, so the tz
        suffix failed the top-level membership test and the column
        was misreported as nested (NotImplementedError). The tz is
        irrelevant to the nanos-long conversion — values are UTC
        epoch nanos either way."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gasket_spark.io import _nanos_timestamp_cols, read_table

        d = tmp_path_factory.mktemp("nanos_tz")
        tbl = pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([-250, 1_999], pa.timestamp("ns", tz="UTC")),
        })
        pq.write_table(tbl, str(d / "t.parquet"))
        assert _nanos_timestamp_cols(str(d / "t.parquet")) == ["ts"]
        got = {r.id: r.us for r in
               read_table(spark, str(d), "t")
               .select("id", F.unix_micros("ts").alias("us")).collect()}
        assert got == {1: -1, 2: 1}

    def test_nanos_sweep_is_stamp_cached(self, tmp_path_factory):
        """Repeat inspections reuse the cached footer sweep until a
        file's (size, mtime_ns) stamp changes; a rewrite that adds an
        ns column invalidates it."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gasket_spark import io as gio

        d = tmp_path_factory.mktemp("nanos_cache") / "t.parquet"
        d.mkdir()
        pq.write_table(pa.table({"id": pa.array([1], pa.int64())}),
                       str(d / "a.parquet"))
        assert gio._nanos_timestamp_cols(str(d)) == []
        assert str(d) in gio._NANOS_COLS_CACHE
        stamp0 = gio._NANOS_COLS_CACHE[str(d)][0]
        assert gio._nanos_timestamp_cols(str(d)) == []
        assert gio._NANOS_COLS_CACHE[str(d)][0] == stamp0
        pq.write_table(pa.table({
            "id": pa.array([2], pa.int64()),
            "ts": pa.array([1_999], pa.timestamp("ns")),
        }), str(d / "b.parquet"))
        assert gio._nanos_timestamp_cols(str(d)) == ["ts"]
        assert gio._NANOS_COLS_CACHE[str(d)][0] != stamp0


class TestOrcRoundtrip:
    def test_orc_roundtrip_and_partitioned_write(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from gasket_spark.io import read_orc, write_orc

        df = spark.range(100).select(
            F.col("id"),
            (F.col("id") % 3).alias("g"),
            F.concat(F.lit("v"), F.col("id")).alias("s"))
        flat = str(tmp_path / "flat")
        write_orc(df, flat)
        back = read_orc(spark, flat)
        assert back.count() == 100
        assert {r.id for r in back.collect()} == set(range(100))
        # partitioned layout: partition column round-trips via dir keys
        part = str(tmp_path / "part")
        write_orc(df, part, partition_by=["g"])
        back2 = read_orc(spark, part)
        assert back2.filter(F.col("g") == 1).count() == 33
        # predicate pushdown reaches the ORC scan
        plan = back2.filter(F.col("id") < 10)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "PushedFilters: [" in plan and "LessThan(id,10)" in plan


class TestStampCached:
    def test_builds_once_then_reuses(self, tmp_path):
        from gasket_spark.io import stamp_cached

        src = tmp_path / "src.bin"
        src.write_bytes(b"v1-contents")
        calls = []

        def build(out):
            calls.append(out)
            (tmp_path / "out" / "data").write_text("built")

        out = str(tmp_path / "out")
        assert stamp_cached(out, str(src), build) == out
        assert stamp_cached(out, str(src), build) == out
        assert len(calls) == 1  # second call served from cache

    def test_rebuilds_on_source_change_and_clears_stale(self, tmp_path):
        import os
        import time

        from gasket_spark.io import stamp_cached

        src = tmp_path / "src.bin"
        src.write_bytes(b"v1")
        out = str(tmp_path / "out")

        def build1(d):
            (tmp_path / "out" / "old_layout_file").write_text("x")

        stamp_cached(out, str(src), build1)
        # rewrite the source (content + mtime change)
        time.sleep(0.01)
        src.write_bytes(b"v2!")

        def build2(d):
            (tmp_path / "out" / "new_layout_file").write_text("y")

        stamp_cached(out, str(src), build2)
        # stale layout from the previous build must be GONE (rmtree)
        assert not os.path.exists(tmp_path / "out" / "old_layout_file")
        assert os.path.exists(tmp_path / "out" / "new_layout_file")

    def test_version_bump_invalidates(self, tmp_path):
        from gasket_spark.io import stamp_cached

        src = tmp_path / "src.bin"
        src.write_bytes(b"same")
        out = str(tmp_path / "out")
        calls = []

        def build(d):
            calls.append(d)
            (tmp_path / "out" / "f").write_text("z")

        stamp_cached(out, str(src), build, version=1)
        stamp_cached(out, str(src), build, version=1)
        assert len(calls) == 1
        stamp_cached(out, str(src), build, version=2)
        assert len(calls) == 2  # version token is part of the stamp


class TestPartitionedCompaction:
    def test_only_fragmented_partitions_rewritten(self, spark,
                                                  tmp_path):
        """One partition sprayed into 12 tiny files, one already
        compact: compaction must collapse the fragmented one, leave
        the compact one's files byte-identical (same names, same
        mtimes — in-place dynamic overwrite touches nothing else),
        and preserve the table's content exactly."""
        import os

        from pyspark.sql import functions as F

        from gasket_spark.io import compact_partitioned

        path = str(tmp_path / "t")
        frag = spark.range(2000).select(
            F.lit("a").alias("k"), F.col("id").alias("v"))
        frag.repartition(12).write.partitionBy("k").parquet(path)
        compact = spark.range(2000, 2500).select(
            F.lit("b").alias("k"), F.col("id").alias("v"))
        compact.coalesce(1).write.mode("append") \
            .partitionBy("k").parquet(path)

        def listing(rel):
            d = os.path.join(path, rel)
            return sorted((f, os.path.getmtime(os.path.join(d, f)))
                          for f in os.listdir(d)
                          if f.endswith(".parquet"))

        before_b = listing("k=b")
        before = sorted(r.v for r in spark.read.parquet(path).collect())

        report = compact_partitioned(spark, path,
                                     target_file_bytes=64 * 1024 * 1024)
        assert list(report) == ["k=a"]
        assert report["k=a"]["files_before"] == 12
        assert len(listing("k=a")) < 12
        assert listing("k=b") == before_b  # byte-untouched
        after = sorted(r.v for r in spark.read.parquet(path).collect())
        assert after == before

        # second pass: nothing fragmented anymore -> no-op, no job
        assert compact_partitioned(
            spark, path, target_file_bytes=64 * 1024 * 1024) == {}

    def test_hostile_partition_values_round_trip(self, spark, tmp_path):
        """The partition-matching classes a filter-predicate
        implementation gets wrong (r9 advice): URI-escaped dir values
        (``k=a%3Ab`` ⇔ value ``a:b``), type-normalized values
        (``k=01`` reads as int 1 under inference, so a string
        predicate never matches and the dir silently never compacts),
        and the NULL partition (``__HIVE_DEFAULT_PARTITION__``).
        Path-based reads with inference disabled must compact all
        three IN PLACE — same dir names after, no duplicate rows, no
        renamed ``k=1`` dir appearing next to ``k=01``."""
        import os

        from pyspark.sql import functions as F

        from gasket_spark.io import compact_partitioned

        path = str(tmp_path / "th")
        hostile = spark.range(3000).select(
            F.when(F.col("id") % 3 == 0, F.lit("a:b"))
             .when(F.col("id") % 3 == 1, F.lit("01"))
             .otherwise(F.lit(None).cast("string")).alias("k"),
            F.col("id").alias("v"))
        hostile.repartition(10).write.partitionBy("k").parquet(path)
        dirs_before = sorted(
            d for d in os.listdir(path) if d.startswith("k="))
        assert dirs_before == [
            "k=01", "k=__HIVE_DEFAULT_PARTITION__", "k=a%3Ab"]
        before = sorted(r.v for r in spark.read.parquet(path).collect())

        report = compact_partitioned(spark, path,
                                     target_file_bytes=64 * 1024 * 1024)
        assert sorted(report) == dirs_before  # all three compacted
        dirs_after = sorted(
            d for d in os.listdir(path) if d.startswith("k="))
        assert dirs_after == dirs_before      # no k=1 rename, no adds
        after = sorted(r.v for r in spark.read.parquet(path).collect())
        assert after == before                # no duplication, no loss
        for rel in dirs_before:               # actually compacted
            n = len([f for f in os.listdir(os.path.join(path, rel))
                     if f.endswith(".parquet")])
            assert n < 10

        # inference/overwrite confs restored
        assert spark.conf.get(
            "spark.sql.sources.partitionColumnTypeInference.enabled"
        ) == "true"

    def test_multi_level_partitions(self, spark, tmp_path):
        """Two-level k=v/d=v layout: fragmentation judged and
        rewritten at the LEAF grain."""
        from pyspark.sql import functions as F

        from gasket_spark.io import compact_partitioned

        path = str(tmp_path / "t2")
        df = spark.range(3000).select(
            (F.col("id") % 2).cast("string").alias("k"),
            (F.col("id") % 3).cast("string").alias("d"),
            F.col("id").alias("v"))
        df.repartition(10).write.partitionBy("k", "d").parquet(path)
        before = sorted(r.v for r in spark.read.parquet(path).collect())
        report = compact_partitioned(spark, path,
                                     target_file_bytes=64 * 1024 * 1024)
        assert len(report) == 6  # every leaf was sprayed
        assert all("/" in rel or os.sep in rel for rel in report)
        after = sorted(r.v for r in spark.read.parquet(path).collect())
        assert after == before

