"""Read-side of the CDC table: a Python DataSource over the manifest.

``stream_cdc_apply`` (gasket_spark/streaming/core.py) maintains a
hash-bucketed, file-grouped parquet table whose LATEST manifest
records per-group [kmin, kmax] range stats. This module closes the
loop on the READ side — the Spark-4 Python DataSource surface (the
same extension point as sources/synthetic.py) exposes the table as:

* **a snapshot-isolated scan**: the manifest is resolved ONCE at plan
  time and the pinned file-group list rides inside the input
  partitions, so a concurrent ``LATEST`` flip mid-scan cannot tear the
  read — every partition reads the same table version;
* **file-group pruned**: pushed filters on the leading merge key prune
  file groups by their manifest range stats BEFORE any IO (the same
  [kmin, kmax]/knull semantics the write side merges by). Pruning is
  *inexact* — every filter is returned to Spark for re-application on
  the surviving rows — so it can only skip groups whose rows provably
  cannot match (NULL keys fail every comparison filter, so range
  pruning stays sound for knull groups);
* **one input partition per file group**: reads parallelize across
  the cluster, each task streaming Arrow batches straight out of its
  group's parquet footprint.

At 100 TB this is exactly the Delta/Hudi reader shape: plan against a
pinned manifest version, prune by file-level stats, fan out one task
per surviving file.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, EqualTo, Filter, GreaterThan,
    GreaterThanOrEqual, InputPartition, IsNull, LessThan, LessThanOrEqual,
)

from gasket_spark.streaming.core import _disjoint, _stat_val, resolve_manifest


@dataclass
class CdcFilePartition(InputPartition):
    path: str


class CdcTableDataSource(DataSource):
    """``spark.read.format("gasket_cdc").option("path", table_dir)``;
    pass ``.option("version", N)`` to TIME-TRAVEL to the table as of
    batch N (served from the immutable per-version manifest snapshot —
    bounded by GC, like Delta VACUUM)."""

    @classmethod
    def name(cls) -> str:
        return "gasket_cdc"

    def _version(self):
        v = self.options.get("version")
        return None if v is None else int(v)

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StructType

        man = resolve_manifest(self.options["path"], self._version())
        if "schema" in man:
            # the manifest records the AUTHORITATIVE current schema
            # (the union after any on-merge evolution — individual
            # file groups may predate added columns)
            return StructType.fromJson(man["schema"])
        ents = [e for ents in man["buckets"].values() for e in ents]
        if not ents:
            raise ValueError("empty CDC table: no live file groups")
        first = sorted(ents, key=lambda e: e["path"])[0]["path"]
        pfile = sorted(f for f in os.listdir(first) if f.endswith(".parquet"))
        return from_arrow_schema(
            pq.read_schema(os.path.join(first, pfile[0])))

    def reader(self, schema) -> "CdcSnapshotReader":
        return CdcSnapshotReader(self.options["path"], schema,
                                 self._version())


class CdcSnapshotReader(DataSourceReader):
    def __init__(self, table_dir: str, schema, version: int | None = None):
        # resolve + validate the manifest ONCE, at plan time: the scan
        # is pinned to this table version (snapshot isolation)
        man = resolve_manifest(table_dir, version)
        self._entries = [e for ents in man["buckets"].values() for e in ents]
        key_cols = man.get("key_cols") or []
        self._stat_col = key_cols[0] if key_cols else None
        self._schema = schema
        self._columns = [f.name for f in schema.fields]
        # pruning bounds gathered from pushed filters: [lo, hi] on the
        # stat column (inclusive; None = unbounded), or null-only
        self._lo = None
        self._hi = None
        self._null_only = False

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if self._stat_col is not None \
                    and getattr(f, "attribute", None) == (self._stat_col,):
                v = _stat_val(getattr(f, "value", None))
                if isinstance(f, EqualTo) and v is not None:
                    self._lo = v if self._lo is None else max(self._lo, v)
                    self._hi = v if self._hi is None else min(self._hi, v)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) \
                        and v is not None:
                    # GT vs GTE: file-group pruning only needs a sound
                    # bound; the exact predicate is re-applied by Spark
                    self._lo = v if self._lo is None else max(self._lo, v)
                elif isinstance(f, (LessThan, LessThanOrEqual)) \
                        and v is not None:
                    self._hi = v if self._hi is None else min(self._hi, v)
                elif isinstance(f, IsNull):
                    self._null_only = True
            # inexact pruning: EVERY filter goes back to Spark for row-
            # level re-application on the surviving file groups
            yield f

    def _keep(self, ent: dict) -> bool:
        if self._null_only:
            # IS NULL on the stat column: only groups that hold a
            # NULL-key row can contribute (absent flag: assume it may)
            return ent.get("knull", True)
        if self._lo is None and self._hi is None:
            return True
        # a comparison/equality filter is never satisfied by a NULL
        # key, so range pruning is sound even for knull groups: the
        # dropped rows could not have matched
        return not _disjoint(ent["kmin"], ent["kmax"],
                             self._lo if self._lo is not None
                             else ent["kmin"],
                             self._hi if self._hi is not None
                             else ent["kmax"])

    def partitions(self) -> list[CdcFilePartition]:
        return [CdcFilePartition(e["path"])
                for e in sorted(self._entries, key=lambda e: e["path"])
                if self._keep(e)]

    def read(self, partition: CdcFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        table = pq.read_table(partition.path)
        target = to_arrow_schema(self._schema)
        # normalize to the declared schema: (a) Spark writes the table
        # with nanosecond parquet timestamps, which the DataSource
        # Arrow bridge rejects — the lossless ns→us cast aligns types;
        # (b) a file group written before an on-merge schema evolution
        # lacks the added columns — pad them with typed NULLs
        cols = {}
        for field in target:
            if field.name in table.column_names:
                cols[field.name] = table.column(field.name)
            else:
                cols[field.name] = pa.nulls(len(table), field.type)
        yield from pa.table(cols).cast(target).to_batches()


def read_cdc_table(spark, table_dir: str, version: int | None = None,
                   include_tombstones: bool = False):
    """Convenience: register the source and load a snapshot scan —
    the current table, or (``version=N``) its state as of batch N.

    If the table has delete semantics (manifest ``delete_col``),
    tombstone rows are filtered out — that's the table's logical
    content; pass ``include_tombstones=True`` for the physical rows
    (auditing deletes, debugging the purge horizon)."""
    from pyspark.sql import functions as F

    spark.dataSource.register(CdcTableDataSource)
    # the reader implements pushFilters(); PySpark 4 refuses to plan it
    # unless this conf is on (runtime-settable — pin it where the
    # capability is used, so caller-provided vanilla sessions work)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    reader = spark.read.format("gasket_cdc").option("path", table_dir)
    if version is not None:
        reader = reader.option("version", str(version))
    df = reader.load()
    if not include_tombstones:
        dc = resolve_manifest(table_dir, version).get("delete_col")
        if dc is not None and dc in df.columns:
            df = df.filter(~F.coalesce(F.col(dc), F.lit(False)))
    return df
