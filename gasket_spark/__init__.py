"""gasket_spark — a PySpark-native dataflow + analytics engine.

A from-scratch rebuild of the capabilities of
``dat-ecosystem-archive/gasket`` (reference at /root/reference, v2.0.1):
a declarative pipeline orchestrator (pipe/run/fork/background/map/reduce
over command and module stages, see /root/reference/index.js:140-161)
re-expressed on Spark's unified batch/streaming DataFrame engine, plus a
first-class relational / streaming / LLM-data operator set designed for
100 TB scale (broadcast joins, AQE, salting, partial aggregation).

Nothing here is a translation of the reference's Node.js stream code —
the architecture is Spark-first: pipelines compile to lazy DataFrame
transform chains and Catalyst/Tungsten pick the physical strategy.
"""

from gasket_spark.session import get_spark, stop_spark
from gasket_spark.pipeline.engine import Engine, load

__all__ = ["get_spark", "stop_spark", "Engine", "load"]

__version__ = "0.1.0"
