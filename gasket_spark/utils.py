"""Small engine utilities."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def persisted(*dfs: DataFrame):
    """Scope-bound caching: persist the given DataFrames for the
    duration of the block, unpersist on exit — including on error.
    For operators that MATERIALIZE internally (iterative algorithms,
    multi-pass builds): at 100 TB a leaked cached table is executor
    memory/disk held until LRU pressure; scoping makes the lifetime
    explicit. (Operators that persist inputs reused by the *returned*
    lazy plan can't scope — the caller's action happens later; those
    rely on LRU by design.)
    """
    for df in dfs:
        df.persist()
    try:
        yield dfs[0] if len(dfs) == 1 else dfs
    finally:
        for df in dfs:
            df.unpersist()
