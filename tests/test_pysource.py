"""Python DataSource tests: batch determinism, partition planning,
source-side filter pushdown, and streaming offset replay."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    from gasket_spark.sources.synthetic import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)


class TestBatch:
    def test_deterministic_and_partitioned(self, spark):
        r1 = spark.read.format("gasket_synthetic") \
            .option("rows", 500).option("partitions", 8).load()
        assert r1.rdd.getNumPartitions() == 8
        assert r1.count() == 500
        a = sorted(tuple(x) for x in r1.collect())
        b = sorted(tuple(x) for x in spark.read
                   .format("gasket_synthetic").option("rows", 500)
                   .option("partitions", 3).load().collect())
        assert a == b  # content independent of partitioning

    def test_filter_pushdown_reaches_generator(self, spark):
        df = spark.read.format("gasket_synthetic") \
            .option("rows", 1000).load() \
            .filter(F.col("user_id") == 7)
        rows = df.collect()
        assert rows and all(r.user_id == 7 for r in rows)
        # the equality was ABSORBED by the source: the plan's residual
        # Filter keeps only isnotnull — no "= 7" comparison remains
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchScan gasket_synthetic" in plan
        assert "= 7" not in plan

    def test_schema(self, spark):
        df = spark.read.format("gasket_synthetic").load()
        assert [f.name for f in df.schema.fields] == \
            ["event_id", "ts", "user_id", "event_type", "value"]


class TestStream:
    def test_microbatches_accumulate_exact_prefix(self, spark):
        import time

        q = (spark.readStream.format("gasket_synthetic")
             .option("rowsPerBatch", 50).load()
             .writeStream.format("memory").queryName("t_pysrc")
             .outputMode("append").start())
        try:
            for _ in range(60):
                time.sleep(0.5)
                if spark.table("t_pysrc").count() >= 100:
                    break
        finally:
            q.stop()
        got = {r.event_id for r in spark.table("t_pysrc").collect()}
        # an exact prefix 0..n-1: deterministic offsets, no gaps/dups
        assert len(got) >= 100
        assert got == set(range(len(got)))


class TestNdjsonSink:
    def test_write_commit_read_back(self, spark, tmp_path):
        import os

        from gasket_spark.sources.synthetic import NdjsonSinkDataSource

        spark.dataSource.register(NdjsonSinkDataSource)
        out = str(tmp_path / "sink")
        df = spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 7).alias("m"))
        df.repartition(4).write.format("gasket_ndjson_sink") \
            .option("path", out).mode("append").save()
        files = os.listdir(out)
        # only committed files are visible — no temp residue
        assert files and all(f.startswith("part-") for f in files)
        back = spark.read.json(out)
        assert back.count() == 100
        assert back.agg(F.sum("m")).collect()[0][0] == \
            df.agg(F.sum("m")).collect()[0][0]

    def test_abort_leaves_no_partial_files(self, spark, tmp_path):
        import os

        from gasket_spark.sources.synthetic import NdjsonSinkDataSource

        spark.dataSource.register(NdjsonSinkDataSource)
        out = str(tmp_path / "sink_abort")

        @F.udf("long")
        def boom(v):
            if v == 66:
                raise ValueError("poison row")
            return v

        df = spark.range(0, 100).select(boom(F.col("id")).alias("id"))
        with pytest.raises(Exception):
            df.repartition(4).write.format("gasket_ndjson_sink") \
                .option("path", out).mode("append").save()
        leftover = [f for f in os.listdir(out)] if os.path.isdir(out) else []
        assert all(not f.startswith("part-") for f in leftover)


class TestNdjsonStreamSink:
    def _run_stream(self, spark, src, out, cp):
        stream = spark.readStream.schema("id long, m long").json(src) \
            .withColumn("m2", F.col("m") * 2)
        q = stream.writeStream.format("gasket_ndjson_sink") \
            .option("path", out).option("checkpointLocation", cp) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

    def test_streaming_commit_and_idempotent_batch_names(
            self, spark, tmp_path):
        import json
        import os

        from gasket_spark.sources.synthetic import NdjsonSinkDataSource

        spark.dataSource.register(NdjsonSinkDataSource)
        src = str(tmp_path / "src")
        os.makedirs(src)
        for i in range(4):
            with open(os.path.join(src, f"in{i}.json"), "w") as f:
                for j in range(10):
                    f.write(json.dumps({"id": i * 10 + j, "m": j}) + "\n")
        out, cp1 = str(tmp_path / "out"), str(tmp_path / "cp1")
        self._run_stream(spark, src, out, cp1)
        files = os.listdir(out)
        assert files and all(f.startswith("part-") for f in files)
        back = spark.read.json(out)
        assert back.count() == 40
        assert back.agg(F.sum("m2")).collect()[0][0] == 2 * 4 * 45
        # replay the WHOLE stream (fresh checkpoint, same output dir):
        # batch ids repeat, so deterministic (batch, partition) names
        # overwrite rather than duplicate — the exactly-once lift
        self._run_stream(spark, src, out, str(tmp_path / "cp2"))
        assert spark.read.json(out).count() == 40


class TestCdcReader:
    def _build_table(self, spark, tmp_path, n_keys=100):
        import json
        import os

        from gasket_spark.streaming.core import stream_cdc_apply

        src = str(tmp_path / "src")
        os.makedirs(src)
        with open(os.path.join(src, "a.json"), "w") as fh:
            for k in range(n_keys):
                fh.write(json.dumps({"k": k, "o": 1, "v": k * 10}) + "\n")
        stream = spark.readStream.schema("k long, o long, v long").json(src)
        tdir = str(tmp_path / "table")
        files = stream_cdc_apply(stream, tdir, ["k"], ["o"],
                                 n_buckets=1, target_file_rows=10)
        return tdir, files

    def test_snapshot_scan_matches_parquet_union(self, spark, tmp_path):
        from gasket_spark.sources.cdc import read_cdc_table

        tdir, files = self._build_table(spark, tmp_path)
        got = {(r.k, r.o, r.v) for r in read_cdc_table(spark, tdir).collect()}
        want = {(r.k, r.o, r.v)
                for r in spark.read.parquet(*files).collect()}
        assert got == want and len(got) == 100

    def test_filter_prunes_file_groups_before_io(self, spark, tmp_path):
        """The reader's plan-time pruning must skip file groups whose
        manifest range can't match the pushed filter — observable on
        the reader object itself (partitions() after pushFilters)."""
        import os

        from pyspark.sql.datasource import GreaterThan, LessThan

        from gasket_spark.sources.cdc import (
            CdcSnapshotReader, read_cdc_table,
        )
        from gasket_spark.streaming.core import _load_manifest

        tdir, files = self._build_table(spark, tmp_path)
        man = _load_manifest(os.path.join(tdir, "LATEST"))
        n_groups = sum(len(v) for v in man["buckets"].values())
        assert n_groups == 10

        schema = read_cdc_table(spark, tdir).schema
        r = CdcSnapshotReader(tdir, schema)
        assert len(r.partitions()) == 10           # unfiltered: all groups
        r2 = CdcSnapshotReader(tdir, schema)
        returned = list(r2.pushFilters([GreaterThan(("k",), 40),
                                        LessThan(("k",), 60)]))
        assert len(returned) == 2                  # inexact: all re-applied
        kept = r2.partitions()
        assert 1 <= len(kept) <= 3                 # ~2 of 10 groups survive

        # and end-to-end through Spark the filtered result is right
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        got = sorted(r.k for r in read_cdc_table(spark, tdir)
                     .filter((F.col("k") > 40) & (F.col("k") < 60))
                     .collect())
        assert got == list(range(41, 60))

    def test_scan_is_snapshot_isolated(self, spark, tmp_path):
        """The manifest is resolved ONCE when the reader is planned:
        a LATEST flip between planning and (or during) execution
        cannot tear the read — the pinned reader keeps serving the
        version it planned against, while a fresh plan sees the new
        version atomically."""
        import json
        import os

        from gasket_spark.sources.cdc import (
            CdcSnapshotReader, read_cdc_table,
        )
        from gasket_spark.streaming.core import stream_cdc_apply

        tdir, _ = self._build_table(spark, tmp_path)
        schema = read_cdc_table(spark, tdir).schema
        pinned = CdcSnapshotReader(tdir, schema)    # plan-time pin
        parts = pinned.partitions()
        # the SAME stream continues (same source dir + checkpoint):
        # a new batch updates every key's value and flips LATEST
        src = str(tmp_path / "src")
        with open(os.path.join(src, "b.json"), "w") as fh:
            for k in range(100):
                fh.write(json.dumps({"k": k, "o": 2, "v": 1}) + "\n")
        stream2 = spark.readStream.schema("k long, o long, v long") \
            .json(src)
        stream_cdc_apply(stream2, tdir, ["k"], ["o"], n_buckets=1,
                         target_file_rows=10)
        # the pinned reader still lists and reads the ORIGINAL
        # version's file groups (old dirs remain until GC)
        assert [p.path for p in pinned.partitions()] \
            == [p.path for p in parts]
        vals = {v.as_py() for p in parts
                for b in pinned.read(p) for v in b.column(2)}
        assert 1 not in vals and len(vals) == 100
        # a fresh plan sees the new version atomically: ALL rows
        # updated, never a blend of versions
        assert {r.v for r in read_cdc_table(spark, tdir).collect()} == {1}

    def test_time_travel_reads_prior_version_until_gc(self, spark,
                                                      tmp_path):
        """Each commit retains an immutable manifest snapshot:
        version=N serves the table as of batch N until GC collects its
        files (VACUUM semantics), after which resolving that version
        raises instead of serving a torn table."""
        import json
        import os

        import pytest as _pytest

        from gasket_spark.sources.cdc import read_cdc_table
        from gasket_spark.streaming.core import (
            gc_cdc_table, resolve_manifest, stream_cdc_apply,
        )

        tdir, _ = self._build_table(spark, tmp_path)
        src = str(tmp_path / "src")
        with open(os.path.join(src, "b.json"), "w") as fh:
            for k in range(100):
                fh.write(json.dumps({"k": k, "o": 2, "v": 1}) + "\n")
        stream2 = spark.readStream.schema("k long, o long, v long") \
            .json(src)
        stream_cdc_apply(stream2, tdir, ["k"], ["o"], n_buckets=1,
                         target_file_rows=10)
        # version 0 = pre-update state; latest = all-updated
        old = {(r.k, r.v) for r in read_cdc_table(spark, tdir,
                                                  version=0).collect()}
        assert old == {(k, k * 10) for k in range(100)}
        assert {r.v for r in read_cdc_table(spark, tdir).collect()} == {1}
        # GC collects batch 0's files -> its snapshot goes with them
        removed = gc_cdc_table(tdir)
        assert removed
        with _pytest.raises(ValueError, match="at or before batch 0"):
            resolve_manifest(tdir, 0)
        # latest still reads fine
        assert {r.v for r in read_cdc_table(spark, tdir).collect()} == {1}

    def test_schema_evolution_on_merge(self, spark, tmp_path):
        """A batch may ADD columns: old rows read back NULL for the
        new column, the manifest records the union schema, and the
        DataSource pads pre-evolution file groups with typed NULLs."""
        import json
        import os

        from gasket_spark.sources.cdc import read_cdc_table
        from gasket_spark.streaming.core import (
            resolve_manifest, stream_cdc_apply,
        )

        tdir, _ = self._build_table(spark, tmp_path, n_keys=20)
        src = str(tmp_path / "src")
        # batch 1 carries a NEW column w, and touches only k<5 (so
        # some file groups keep the OLD physical schema)
        with open(os.path.join(src, "b.json"), "w") as fh:
            for k in range(5):
                fh.write(json.dumps(
                    {"k": k, "o": 2, "v": k, "w": k * 7}) + "\n")
        stream2 = spark.readStream \
            .schema("k long, o long, v long, w long").json(src)
        stream_cdc_apply(stream2, tdir, ["k"], ["o"], n_buckets=1,
                         target_file_rows=10)
        man = resolve_manifest(tdir)
        assert [f["name"] for f in man["schema"]["fields"]] \
            == ["k", "o", "v", "w"]
        rows = {r.k: (r.o, r.v, r.w)
                for r in read_cdc_table(spark, tdir).collect()}
        assert len(rows) == 20
        for k in range(5):
            assert rows[k] == (2, k, k * 7)          # updated, with w
        for k in range(5, 20):
            assert rows[k] == (1, k * 10, None)      # old rows: w NULL
