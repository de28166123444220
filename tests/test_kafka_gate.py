"""Kafka connector integration, gated on what the environment provides.

The engine's Kafka on-ramp (``read_kafka_stream``) is a thin
source-swap over the same typed record stream as the file source —
what needs testing is (a) that a missing connector fails LOUDLY at
plan time (no silent fallback), runnable anywhere, and (b) the actual
round-trip, runnable only where the spark-sql-kafka jar AND a broker
exist (set ``GASKET_KAFKA_BOOTSTRAP=host:port``). Each test skips in
the environment that can't exercise it, so the suite is green both
ways without ever faking a pass."""

import glob
import os
import uuid

import pytest
from pyspark.sql import functions as F

from gasket_spark.io import read_table
from gasket_spark.streaming.core import EVENTS_SCHEMA, read_kafka_stream
from tests.conftest import SF_SMALL


def _kafka_jar_present() -> bool:
    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                                  "jars", "*sql-kafka*"))
    jars += glob.glob(os.path.join(
        os.environ.get("SPARK_HOME", "/nonexistent"), "jars", "*sql-kafka*"))
    return bool(jars)


BOOTSTRAP = os.environ.get("GASKET_KAFKA_BOOTSTRAP")


class TestKafkaGate:
    def test_missing_connector_fails_loudly(self, spark):
        """Without the connector jar, planning the Kafka source must
        raise Spark's standard failed-to-find-data-source error — the
        documented no-silent-fallback contract."""
        if _kafka_jar_present():
            pytest.skip("spark-sql-kafka jar present; loud-failure "
                        "path not reachable")
        with pytest.raises(Exception, match="(?i)kafka"):
            read_kafka_stream(spark, "localhost:9092", "t",
                              EVENTS_SCHEMA).writeStream \
                .format("noop").trigger(availableNow=True).start()

    def test_round_trip_typed_records(self, spark, tmp_path):
        """With a jar AND a broker: batch-write the events fixture to a
        fresh topic through Spark's Kafka sink, stream it back through
        read_kafka_stream, and the typed rows must match the fixture
        exactly — proving the on-ramp yields the same record stream as
        the file source."""
        if not _kafka_jar_present():
            pytest.skip("spark-sql-kafka jar not on the classpath")
        if not BOOTSTRAP:
            pytest.skip("no broker (set GASKET_KAFKA_BOOTSTRAP)")
        from gasket_spark.streaming.core import to_ndjson_lines

        topic = f"gasket_rt_{uuid.uuid4().hex[:8]}"
        ev = read_table(spark, SF_SMALL, "events").select(
            "event_id", "user_id", "event_type", "value")
        to_ndjson_lines(ev).write.format("kafka") \
            .option("kafka.bootstrap.servers", BOOTSTRAP) \
            .option("topic", topic).save()
        stream = read_kafka_stream(spark, BOOTSTRAP, topic, ev.schema)
        q = stream.writeStream.format("memory") \
            .queryName("kafka_rt").trigger(availableNow=True) \
            .option("checkpointLocation", str(tmp_path / "cp")).start()
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in
                     spark.table("kafka_rt").collect())
        want = sorted(tuple(r) for r in ev.collect())
        assert got == want
