"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and order-insensitive values (exact equality — no
tolerance: the engine's determinism patterns are supposed to make
results bit-identical).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive compare: sort columns by
    name, normalize dtypes, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: repr(v), na_action="ignore")
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class for cross-engine hash-compatibility: two
    columns whose classes differ (e.g. integer vs float) hold values
    the driver hashes differently even when numerically equal."""
    if pd.api.types.is_bool_dtype(s):
        return "boolean"
    if pd.api.types.is_integer_dtype(s):
        return "integer"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    if os.environ.get("SPARK_GRAFT_SESSION") == "engine":
        from gasket_spark.session import get_spark
        spark = get_spark("selfcheck")
    else:
        # Default: a VANILLA session, like the driver's — none of the
        # engine's session.py confs. Every query must self-provision
        # any conf it needs (q_scan_pysource taught us that).
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[32]")
                 .appName("selfcheck-vanilla")
                 .config("spark.sql.shuffle.partitions",
                         os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
                 .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    # Bound accumulated cache residency over a full-registry sweep:
    # the query layer's stamp caches (pair graphs, edge table,
    # plan-persist intermediates) are deliberately session-lifetime,
    # and ~200 distinct queries' worth of them crossed the JVM heap
    # margin at sf0.1 (r13: OOM at query ~209, every query green in a
    # fresh session). Freeing every N queries keeps the single-session
    # sweep honest about per-query behavior while capping residency;
    # entries rebuild on demand so correctness is unaffected.
    free_every = int(os.environ.get("SPARK_GRAFT_FREE_EVERY", "60"))
    from gasket_spark.queries import free_session_caches
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if free_every and n_run and n_run % free_every == 0:
            # sweep_orphans is safe HERE: selfcheck holds no
            # checkpointed frames of its own between queries
            freed = free_session_caches(spark, sweep_orphans=True)
            print(f"-- freed {freed} session cache entries/blocks "
                  f"after {n_run} queries")
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                failures.append(name)
                print(f"FAIL {name}: 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        a, b = canon(sdf), canon(odf)
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} != {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"columns {list(a.columns)} != {list(b.columns)}")
        if not status:
            # Dtype-KIND audit. The driver hashes raw values, so an
            # int64 9 vs float64 9.0 split is a driver hash red even
            # though assert_frame_equal(check_dtype=False) coerces it
            # equal (that masking shipped the r7+r8 q_join_grid_density
            # red twice: DuckDB renders HUGEINT to pandas as float64).
            # Fail loudly BEFORE the value compare when the two engines
            # disagree on a column's dtype class.
            for c in a.columns:
                ka, kb = dtype_class(a[c]), dtype_class(b[c])
                if ka != kb:
                    status.append(
                        f"dtype-class split on '{c}': spark={ka} "
                        f"({a[c].dtype}) vs oracle={kb} ({b[c].dtype})"
                        " — driver would hash-mismatch")
        if not status:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
            except AssertionError as exc:
                status.append(f"values differ: {str(exc)[:500]}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
