"""The parquet transaction log as a first-class STREAMING source: a
Spark 4 Python Data Source whose offsets are txlog commit versions, so
``spark.readStream`` tails a merge-append table's change-data feed —

    spark.dataSource.register(TxlogChangeFeedDataSource)
    (spark.readStream.format("stonkw_txlog_cdc")
         .option("path", table_path)
         .option("startingVersion", 3)
         .load())

This is the piece that turns the K2 table format (sinks/writers.py) into
a streamable source without rescanning history (the reference's daily
batch re-poll, flows/news_etl_flow.py, is the contract being replaced):
each micro-batch covers a half-open commit-version range (start, end],
reads ONLY the parquet files those commits added, skips compaction
rewrites (same rule as :func:`sinks.writers.table_changes`), and tags
every row with its originating commit as ``_commit_version`` (Delta
CDF's column).

Scale posture: this is the full ``DataSourceStreamReader`` — offset
resolution and partition planning are driver-side O(#commits) metadata
reads, while the DATA plane is one InputPartition per added file,
executed on executors as Arrow RecordBatch reads. A 100 TB table whose
poll window added 50 files schedules 50 file-read tasks and touches
nothing else. Exactly-once = offset log (version ranges are replayed
deterministically via ``partitions(start, end)``) + an idempotent
downstream sink, the same discipline as streaming/jobs.py.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

from stonkwhisperer_spark.sinks.writers import (
    _commits,
    _committed_version,
    committed_files,
)

VERSION_COL = "_commit_version"


class _FilePartition(InputPartition):
    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


def _table_schema(path: str) -> StructType:
    """Spark schema of the committed table: the LOG's evolved union
    schema when commits recorded one (see writers.table_schema — the
    authoritative source once schema evolution exists, and no footer
    round-trip), else ONE committed file's parquet footer as the
    pre-evolution fallback (no Spark job, no full scan)."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    from stonkwhisperer_spark.sinks.writers import table_schema

    evolved = table_schema(path)
    if evolved is not None:
        return evolved
    files = committed_files(path)
    if not files:
        raise ValueError(
            f"cannot infer schema: no committed files at {path} "
            "(pass .schema(...) explicitly for a pre-creation subscription)"
        )
    arrow = pq.ParquetFile(os.path.join(path, files[0])).schema_arrow
    return from_arrow_schema(arrow, prefer_timestamp_ntz=True)


class _TxlogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        from pyspark.sql.pandas.types import to_arrow_schema

        opts = {k.lower(): v for k, v in options.items()}
        self._path = opts["path"]
        self._start = int(opts.get("startingversion", 0))
        # Field order + arrow types of the OUTPUT schema; the version
        # column is appended by read(), the rest come from the parquet
        # files — files written before a schema evolution may lack some
        # fields, which read() null-fills at these declared types.
        data_schema = StructType(
            [f for f in schema.fields if f.name != VERSION_COL]
        )
        self._fields = [f.name for f in data_schema.fields]
        self._arrow_schema = to_arrow_schema(data_schema)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": _committed_version(self._path)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for c in _commits(self._path, through_version=end["version"]):
            if c["version"] <= start["version"] or c.get("compaction"):
                continue
            parts.extend(_FilePartition(os.path.join(self._path, rel), c["version"])
                         for rel in c["add"])
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        # Executor-side data plane: stream the file as Arrow batches,
        # project to the declared field order (null-filling fields the
        # file predates — additive schema evolution), cast to the
        # declared types, append the commit tag.
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        present = set(pf.schema_arrow.names)
        want = [n for n in self._fields if n in present]
        for batch in pf.iter_batches(columns=want):
            arrays = []
            for name in self._fields:
                typ = self._arrow_schema.field(name).type
                if name in present:
                    arr = batch.column(name)
                    if arr.type != typ:
                        arr = arr.cast(typ)
                    arrays.append(arr)
                else:
                    arrays.append(pa.nulls(batch.num_rows, typ))
            arrays.append(pa.array([partition.version] * batch.num_rows, pa.int64()))
            yield pa.RecordBatch.from_arrays(arrays, self._fields + [VERSION_COL])

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; the txlog needs nothing


class TxlogChangeFeedDataSource(DataSource):
    """``format("stonkw_txlog_cdc")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "stonkw_txlog_cdc"

    def schema(self) -> StructType:
        base = _table_schema(self.options["path"])
        return StructType(
            [*base.fields, StructField(VERSION_COL, LongType(), False)]
        )

    def streamReader(self, schema: StructType) -> _TxlogStreamReader:
        return _TxlogStreamReader(schema, dict(self.options))
