"""Stage kinds: external command stages and in-process module stages.

Command stages are the reference's child-process duplex
(/root/reference/index.js:14-27) re-expressed as ``RDD.pipe`` — the one
place the engine deliberately drops below the DataFrame API, because
the semantics (arbitrary OS command over a line stream) are inherently
imperative. Each partition spawns one child on an executor, so an
N-partition input runs N concurrent copies of the command — the
data-parallel generalization of gasket's single child per stage.

Module stages are in-process transforms (index.js:71-74): any Python
callable ``fn(df, ctx) -> DataFrame``. With ``json=True`` the input
line stream is lifted to typed records first and the output serialized
back to NDJSON lines after (the reference's ndjson sandwich,
index.js:73).
"""

from __future__ import annotations

import importlib
import inspect
import shlex
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from gasket_spark.io import df_to_ndjson
from gasket_spark.pipeline.spec import Stage


@dataclass
class StageContext:
    """Execution context a stage receives — the analog of gasket's
    opts merge (cwd/env/params, /root/reference/index.js:124-132) plus
    the pipeline-name argv injection (index.js:85)."""

    spark: SparkSession
    name: str                       # pipeline name (argv[0] analog)
    params: list[str] = field(default_factory=list)
    env: dict[str, str] = field(default_factory=dict)
    debug: bool = False
    # debug tap (reference DEBUG wrap, index.js:77-80): per-stage
    # Observation objects — row counts become available after the
    # pipeline's action with zero extra jobs (observe() piggybacks the
    # metrics on the action itself, unlike a count() per stage)
    observations: list = field(default_factory=list)


def _is_line_df(df: DataFrame) -> bool:
    return len(df.columns) == 1 and df.schema[0].dataType.simpleString() == "string"


def to_lines(df: DataFrame) -> DataFrame:
    """Coerce any DataFrame to a single-string-column line stream
    (typed rows become NDJSON — the boundary convention between typed
    stages and byte-stream command stages)."""
    return df if _is_line_df(df) else df_to_ndjson(df)


def run_command_stage(stage: Stage, ctx: StageContext,
                      df: DataFrame | None) -> DataFrame:
    """Execute an external command stage over ``RDD.pipe``.

    Explicit stage/invocation params are appended to the command line
    (the reference's params injection, index.js:85). The reference also
    prepends the *pipeline name* to params — which, if appended to the
    command, would break its own documented examples (`cat -` would
    become `cat - main`; readme.md:44-48 expects `echo hello world |
    transform-uppercase` ⇒ exactly `HELLO WORLD`). We implement the
    intended surface (SURVEY.md §2.4 discipline): only explicit params
    reach argv; the pipeline name is exported as ``$GASKET_PIPELINE``.

    A non-zero exit fails the task (``checkCode=True`` ≙ the
    error-destroy at index.js:16-18). With no input (``run``-style
    source stage) the command runs once in a single empty partition —
    stdin closed, output captured. With input, each partition pipes
    through its own child process (data-parallel fan-out of gasket's
    single child per stage).
    """
    spark = ctx.spark
    argv = [stage.command,
            *[shlex.quote(a) for a in [*stage.params, *ctx.params]]]
    cmd = " ".join(argv)
    env = {**(ctx.env or {}), "GASKET_PIPELINE": ctx.name}
    if df is None:
        rdd_in = spark.sparkContext.parallelize([], 1)
    else:
        rdd_in = to_lines(df).rdd.map(lambda r: r[0] if r[0] is not None else "")
    piped = rdd_in.pipe(cmd, env=env, checkCode=True)
    return spark.createDataFrame(piped.map(lambda x: (x,)), "value string")


def _resolve_module(module: str | Callable) -> Callable:
    """Resolve a module reference: a callable, ``pkg.mod:fn``, or a
    dotted path whose last element is the function (analog of the
    reference's ``resolve.sync`` module lookup, index.js:72)."""
    if callable(module):
        return module
    if ":" in module:
        mod_name, fn_name = module.split(":", 1)
    else:
        mod_name, _, fn_name = module.rpartition(".")
    mod = importlib.import_module(mod_name)
    fn = getattr(mod, fn_name)
    if not callable(fn):
        raise TypeError(f"module stage target is not callable: {module}")
    return fn


def _call_stage_fn(fn: Callable, df: DataFrame | None, ctx: StageContext):
    try:
        n_params = len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        n_params = 2
    return fn(df, ctx) if n_params >= 2 else fn(df)


def run_module_stage(stage: Stage, ctx: StageContext,
                     df: DataFrame | None) -> DataFrame:
    """Execute an in-process module stage.

    ``json=True``: input lines are parsed to typed records (pinned
    ``stage.schema`` if given — the deterministic, single-pass path;
    else one inference pass), the fn transforms typed rows, and the
    output is re-serialized to NDJSON lines (index.js:73 semantics).
    """
    fn = _resolve_module(stage.module)
    if stage.json and df is not None:
        lines = to_lines(df)
        reader = ctx.spark.read
        if stage.schema is not None:
            reader = reader.schema(stage.schema)
        df = reader.json(lines.rdd.map(lambda r: r[0]))
    out = _call_stage_fn(fn, df, ctx)
    if not isinstance(out, DataFrame):
        raise TypeError(
            f"module stage {stage.module!r} must return a DataFrame, got {type(out)}")
    return df_to_ndjson(out) if stage.json else out


def run_stage(stage: Stage, ctx: StageContext,
              df: DataFrame | None) -> DataFrame:
    out = (run_command_stage if stage.kind == "command" else run_module_stage)(
        stage, ctx, df)
    if ctx.debug:
        import sys
        print(f"[gasket:{ctx.name}] stage={stage.to_json()!r} "
              f"schema={out.schema.simpleString()}", file=sys.stderr)
        from pyspark.sql import Observation
        from pyspark.sql import functions as F
        obs = Observation(
            f"{ctx.name}[{len(ctx.observations)}] {stage.to_json()!r}")
        out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        ctx.observations.append(obs)
    return out
