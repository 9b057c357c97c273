"""``vintage`` — a BATCH Data Source over a VintageTable snapshot.

Delta-parity read UX for SQL-first users (README.md:98,169 reads done
through ``spark.read.format("delta")``):

    spark.dataSource.register(VintageSnapshotDataSource)
    df = (spark.read.format("vintage")
          .option("path", table_dir)
          .option("versionAsOf", 3)        # optional time travel
          .load())

Built on the PySpark 4 Python Data Source API: the driver lists the
snapshot's live files from the commit log (metadata only), each file
becomes one ``InputPartition``, and executors read parquet via pyarrow
into Arrow RecordBatches padded/cast to the snapshot schema — so
schema-evolved tables read uniformly, exactly like ``VintageTable.read``'s
``mergeSchema`` path. Library users get the richer ``VintageTable`` API;
this source exists so a pure-SQL session (``CREATE TEMP VIEW ... USING``
/ ``spark.read``) needs no Python objects in scope.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructField, StructType

from sdlt_spark.store.vintage import VintageTable


def _table(path: str) -> VintageTable:
    # metadata-only: log replay and schema resolution never touch a
    # SparkSession, so a session-less instance works on the driver
    return VintageTable(None, path)  # type: ignore[arg-type]


def _parse_options(options: dict) -> tuple[str, int | None, float | None]:
    options = {k.lower(): v for k, v in options.items()}
    path = options.get("path")
    if not path:
        raise ValueError("vintage requires .option('path', <table dir>)")
    version = options.get("versionasof")
    timestamp = options.get("timestampasof")
    if version is not None and timestamp is not None:
        raise ValueError("versionAsOf and timestampAsOf are mutually exclusive")
    return (
        path,
        int(version) if version is not None else None,
        float(timestamp) if timestamp is not None else None,
    )


@dataclass
class _SnapshotFilePartition(InputPartition):
    abs_path: str


class VintageSnapshotReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path, self._version, self._timestamp = _parse_options(options)

    def partitions(self):
        t = _table(self._path)
        files = t._live_files(version=self._version, timestamp=self._timestamp)
        return [
            _SnapshotFilePartition(os.path.join(self._path, rel)) for rel in files
        ]

    def read(self, partition: _SnapshotFilePartition):
        """Executor-side: one parquet file -> Arrow batches cast/padded to
        the snapshot schema (files from pre-evolution commits lack newer
        columns and get typed NULLs)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        tbl = pq.read_table(partition.abs_path)
        n = tbl.num_rows
        arrays, names = [], []
        for field in self._schema.fields:
            at = to_arrow_type(field.dataType)
            if field.name in tbl.column_names:
                arr = tbl[field.name].combine_chunks().cast(at)
            else:
                arr = pa.nulls(n, at)
            arrays.append(arr)
            names.append(field.name)
        yield from pa.table(arrays, names=names).to_batches()


class VintageSnapshotDataSource(DataSource):
    """Register with ``spark.dataSource.register(VintageSnapshotDataSource)``,
    then ``spark.read.format("vintage")``."""

    @classmethod
    def name(cls) -> str:
        return "vintage"

    def schema(self) -> StructType:
        path, version, _ts = _parse_options(dict(self.options))
        base = _table(path)._schema_at(version=version)
        # every column nullable: padded evolution rows carry NULLs
        return StructType([StructField(f.name, f.dataType, True) for f in base.fields])

    def reader(self, schema: StructType) -> VintageSnapshotReader:
        return VintageSnapshotReader(schema, dict(self.options))
