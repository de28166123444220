"""The gasket pipeline kernel, Spark-first.

A pipeline spec (JSON) compiles to a lazy DataFrame transform chain —
the direct analog of the reference's not-yet-flowing stream graph
(/root/reference/index.js:117-178) — and Catalyst picks the physical
plan. See ``spec`` (stage model + grouping), ``operators`` (the six
composition operators as DataFrame combinators), ``stages`` (command /
module stage kinds), ``engine`` (registry + discovery), ``cli``.
"""

from gasket_spark.pipeline.engine import Engine, load
from gasket_spark.pipeline.spec import Stage, normalize_stage, split_groups

__all__ = ["Engine", "load", "Stage", "normalize_stage", "split_groups"]
