"""SparkSession factory with scale-oriented defaults.

The defaults below are the ones that matter at 100 TB just as much as on
``local[32]``:

* **AQE on** — runtime partition coalescing, skew-join splitting and
  dynamic broadcast selection replace hand-tuned partition counts.
* **UTC session timezone** — deterministic timestamp semantics so the
  DuckDB oracle and Spark agree byte-for-byte.
* **Arrow on** — every pandas UDF / mapInPandas crossing is
  Arrow-batched, never row-at-a-time pickling.
* **shuffle.partitions** sized for the local harness; on a real cluster
  AQE coalesces from a deliberately-high initial number, so the initial
  value is a ceiling, not a tuning knob.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Deterministic, oracle-friendly, scale-aware defaults. Every entry is a
# plain Spark conf so a cluster deployment can override via spark-submit.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # runtime row-level join pruning: build a bloom filter from the
    # small/filtered side and push it into the big side's scan — at
    # 100 TB this skips row groups the join would discard anyway
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled":
        "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Python DataSource readers (gasket_spark.sources) implement
    # pushFilters; without this flag Spark refuses to plan them
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def get_spark(app_name: str = "gasket_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster, leave it unset and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
