"""One-pass multi-column table profiling.

``q_profile`` (queries/relational.py) keeps one aggregate per column
family for oracle clarity; this is the production variant that docstring
promises: ALL columns profiled in a SINGLE scan — one global aggregate
whose partials are map-side and mergeable (counts are sums,
``approx_count_distinct`` is an HLL sketch, extrema are min/max), so a
100 TB table is profiled at the cost of one narrow pass regardless of
how many columns are audited. The per-column reshape happens on the
driver over ONE collected row (a loop over columns, never over data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) in one pass. Returns one row per
    column: (col, n, n_nonnull, distinct_est, min_v, max_v) with
    extrema stringified (profiles are heterogeneous by nature)."""
    cols = list(cols or df.columns)
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(c).alias(f"_nn{i}"),
            F.approx_count_distinct(c).alias(f"_d{i}"),
            F.min(c).cast("string").alias(f"_lo{i}"),
            F.max(c).cast("string").alias(f"_hi{i}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [(c, row["_n"], row[f"_nn{i}"], row[f"_d{i}"],
            row[f"_lo{i}"], row[f"_hi{i}"]) for i, c in enumerate(cols)]
    return df.sparkSession.createDataFrame(
        out, "col string, n bigint, n_nonnull bigint, "
             "distinct_est bigint, min_v string, max_v string")


def quarantine_split(df: DataFrame, rules: dict,
                     out_col: str = "_violations") -> tuple:
    """Validate-and-route: evaluate every named rule (a boolean
    Column that is TRUE for valid rows) in ONE pass and split the
    input into (good, bad) — bad rows carry ``out_col`` (default
    ``_violations``; refuses to clobber an existing column of that
    name), the sorted array of failed rule names (NULL rule results
    count as violations: an unevaluable rule must never wave a row
    through).
    The quarantine-and-continue lane every 100 TB ingest needs: a
    handful of malformed rows must neither kill the job (fail-fast)
    nor silently vanish (dropMalformed) — they land in an auditable
    side table with machine-readable reasons.

    Both returned frames derive from one annotated plan, so a
    rule's expression is evaluated once per row whether the row
    passes or fails; Catalyst prunes the `_violations` construction
    out of the GOOD branch's plan. Rules compose from plain Column
    expressions — the same predicates a CHECK constraint would
    state, so the quarantine reasons are derivable in ANSI SQL (the
    r11+ oracle shape).

    Reference parity: gasket's `fork` routes a stream to branches
    (reference index.js:1-258); this is the validity fork, one
    declarative plan."""
    from pyspark.sql import functions as F

    if not rules:
        raise ValueError("quarantine_split needs at least one rule")
    if out_col in df.columns:
        # silently overwriting would drop the caller's column from
        # the good branch and replace it in the bad one (r11 advice)
        raise ValueError(
            f"quarantine_split: input already has a {out_col!r} column"
            " — pass a different out_col")
    viol = F.sort_array(F.filter(
        F.array(*[
            F.when(F.coalesce(cond, F.lit(False)), F.lit(None)
                   .cast("string")).otherwise(F.lit(name))
            for name, cond in sorted(rules.items())
        ]),
        lambda x: x.isNotNull()))
    annotated = df.withColumn(out_col, viol)
    good = annotated.filter(F.size(out_col) == 0).drop(out_col)
    bad = annotated.filter(F.size(out_col) > 0)
    return good, bad
