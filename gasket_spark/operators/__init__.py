"""Scale-oriented data operators: deduplication, similarity search,
multimodal column plumbing. These are the LLM-training-data operators
the rebuild contract adds on top of the reference's pipeline surface
(BASELINE.json "north_star")."""

from __future__ import annotations

from pyspark.sql import DataFrame


def semi_join_auto(df: DataFrame, keys: DataFrame, on: str | list[str],
                   how: str = "left_semi") -> DataFrame:
    """Size-guarded (semi/anti) join against a derived key set whose
    cardinality is data-dependent (dup sets, eval/contamination sets).

    A static ``F.broadcast(keys)`` hint is only safe while the key set
    is known-small; on a pathological input (everything duplicated,
    an eval set that grew 1000×) it becomes an OOM on every executor.
    This helper deliberately attaches NO hint: the key set always
    arrives through a shuffle (it's an aggregate), so AQE sees its
    ACTUAL post-stage size at runtime and converts the planned
    sort-merge join to a broadcast join when it lands under
    ``spark.sql.autoBroadcastJoinThreshold`` — the common case costs
    one broadcast exactly like the static hint, and the pathological
    case degrades to a shuffle semi-join instead of failing. Both
    regimes are pinned in tests/test_plans.py.

    Use for every join whose small side is "small by construction"
    rather than small by schema (dimension tables keep their explicit
    broadcast hints — their size IS known)."""
    return df.join(keys, on, how)
