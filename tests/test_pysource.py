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
