"""Deterministic numeric aggregation helpers.

Cross-engine (and cross-partitioning!) floating-point determinism: a
double SUM's value depends on association order, which differs between
Spark partial aggregation and any oracle engine — and even between two
Spark runs with different partition counts. For money-like columns with
fixed decimal precision we therefore aggregate in *integer* space:
``SUM(CAST(ROUND(x * scale) AS BIGINT))`` is exact and
order-independent, and a final division by ``scale`` is a single
deterministic IEEE-754 op. This also matters at 100 TB: results stop
depending on the partition layout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iscaled(col: Column, scale: int = 100) -> Column:
    """Column scaled to integer space (e.g. dollars → cents)."""
    return F.round(col * F.lit(scale)).cast("bigint")


def money_sum(col: Column, scale: int = 100) -> Column:
    """Order-independent SUM of a fixed-precision double column."""
    return F.sum(iscaled(col, scale)) / F.lit(float(scale))


def money_avg(col: Column, scale: int = 100) -> Column:
    """Order-independent AVG of a fixed-precision double column."""
    return F.sum(iscaled(col, scale)) / F.count(F.lit(1)) / F.lit(float(scale))
