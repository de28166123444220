"""Skew-handling primitives: salted aggregation and salted joins.

AQE's skew-join splitting (on by default, gasket_spark.session) handles
most skew at runtime by splitting oversized shuffle partitions. These
helpers cover the cases AQE can't:

* a *grouped aggregation* where one key owns a large share of all rows
  (AQE splits partitions, but one hash-aggregate group still lands on
  one reducer) → :func:`salted_agg` spreads the hot key over N
  sub-keys and merges partials;
* a *join* whose hot key exceeds what a split partition can hold →
  :func:`salted_join` replicates the small side per salt so the big
  side's hot key fans out over N tasks.

Everything is deterministic: salts derive from ``xxhash64`` of a
row-identity column, never ``rand()`` — a retried task recomputes the
same salt, so speculative execution and stage retries stay correct
(a ``rand()`` salt can double- or zero-count rows under retry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, merge_expr) per algebraic aggregate: stage 1 computes
# the partial per (key, salt); stage 2 merges partials per key.
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(row_identity: Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(row_identity), F.lit(n_salts))


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[str, str]],
               row_identity: str, n_salts: int = 16) -> DataFrame:
    """Two-stage (salted) aggregation for skewed group keys.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max} — the algebraic aggregates whose partials
    merge losslessly. Stage 1 groups by (keys…, salt): a hot key's
    rows spread over ``n_salts`` reducers; stage 2 merges the ≤
    n_salts partials per key — negligible data volume.

    ``row_identity`` is any column (unique or not) whose hash spreads
    rows ~uniformly; using a column instead of ``rand()`` keeps the
    plan deterministic under task retry.
    """
    for name, (_, fn) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(
                f"agg {name!r}: {fn!r} is not mergeable "
                f"(supported: {sorted(_MERGEABLE)})")
    salted = df.withColumn("_salt", _salt(F.col(row_identity), n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(*[
        _MERGEABLE[fn][0](F.col(col)).alias(f"_p_{name}")
        for name, (col, fn) in aggs.items()
    ])
    return partial.groupBy(*keys).agg(*[
        _MERGEABLE[fn][1](F.col(f"_p_{name}")).alias(name)
        for name, (col, fn) in aggs.items()
    ])


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                row_identity: str, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with a salted big side and a replicated small side.

    The big side gets a deterministic salt in [0, n_salts); the small
    side is exploded n_salts× (one copy per salt value), so each
    (key, salt) bucket joins independently — a hot key's rows land on
    ``n_salts`` tasks instead of one. Small-side replication costs
    n_salts × |small|; use only when |small| is genuinely small and
    the key histogram is known-skewed (otherwise plain join + AQE).
    """
    big_s = big.withColumn("_salt", _salt(F.col(row_identity), n_salts))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = big_s.join(small_s, on + ["_salt"], how)
    return out.drop("_salt")
