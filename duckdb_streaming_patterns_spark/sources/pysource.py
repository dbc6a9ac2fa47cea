"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a "chunk topic" source over the staged parquet chunk layout.

This is the closest sandbox-executable analogue of the reference's Kafka
topic surface (`tributary.scan_topic` / the confluent-kafka poll loop,
reference pattern_1_1.py:46-50): a TOPIC whose partitions are files and
whose offsets are chunk indexes, read through Spark's public custom-source
lifecycle rather than the built-in file source —

- batch: ``spark.read.format("chunk_topic")`` plans one InputPartition
  per parquet file and reads each as Arrow RecordBatches (the zero-copy
  path the API offers; never row-at-a-time Python tuples),
- streaming: ``spark.readStream.format("chunk_topic")`` implements the
  full micro-batch offset contract — ``initialOffset`` /
  ``latestOffset`` / ``partitions(start, end)`` / ``commit`` — so each
  staged chunk becomes exactly one micro-batch in chunk order (the
  ordering the file source needs mtime-stamping hacks for is the
  OFFSET ORDER here, which is the point of a real offset-bearing
  source).

At 100 TB the same five methods are the entire porting surface for a
real external system (a Kafka consumer maps offsets per topic-partition
instead of chunk indexes; partition planning fans out per
broker-partition): the engine-side patterns are source-agnostic because
they only see micro-batches. The executors do the reading — the driver
only lists offsets — so the source scales with the cluster, not the
driver.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _arrow_batches(path: str, field_names: list[str]):
    """Arrow RecordBatches of one parquet file, projected+ordered to the
    source schema (hive layout columns like __chunk live in the dir
    name, not the footer, and are deliberately not part of the topic's
    value schema)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    missing = [n for n in field_names if n not in f.schema_arrow.names]
    if missing:
        raise ValueError(f"{path} lacks schema fields {missing}")
    for batch in f.iter_batches(columns=field_names):
        yield batch.select(field_names)


def _chunk_dirs(root: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(root, "__chunk=*")),
        key=lambda d: int(d.rsplit("=", 1)[1]),
    )


def _files_of(d: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(os.path.join(d, "*"))
        if not os.path.basename(f).startswith(("_", "."))
        and not f.endswith(".crc")
    )


class ChunkTopicBatchReader(DataSourceReader):
    def __init__(self, schema, options):
        self.path = options["path"]
        self.field_names = [f.name for f in schema.fields]

    def partitions(self):
        files = []
        if os.path.isfile(self.path):
            files = [self.path]
        else:
            for d in _chunk_dirs(self.path) or [self.path]:
                files.extend(_files_of(d))
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        yield from _arrow_batches(partition.path, self.field_names)


class ChunkTopicStreamReader(DataSourceStreamReader):
    """Offset contract: ``{"chunk": k}`` means chunks < k are committed.
    ``latestOffset`` re-lists the directory each call, so chunks landing
    while the query runs are picked up — the tailing behavior of a real
    topic.

    Pacing: ``latestOffset`` advances AT MOST ONE chunk per call, so
    every staged chunk becomes exactly one micro-batch (the replay
    granularity all the streaming ≡ batch oracles are stated over —
    the Python API has no ReadLimit hook, so the source self-paces;
    a real topic source would honor ``maxOffsetsPerTrigger`` the same
    way). ``partitions`` folds the planned end offset back into the
    pacer so a checkpoint-restarted query never plans backwards."""

    def __init__(self, schema, options):
        self.path = options["path"]
        self.field_names = [f.name for f in schema.fields]
        self._paced = 0

    def initialOffset(self) -> dict:
        return {"chunk": 0}

    def latestOffset(self) -> dict:
        avail = len(_chunk_dirs(self.path))
        self._paced = min(self._paced + 1, avail)
        return {"chunk": self._paced}

    def partitions(self, start: dict, end: dict):
        self._paced = max(self._paced, int(end["chunk"]))
        out = []
        dirs = _chunk_dirs(self.path)
        for k in range(int(start["chunk"]), int(end["chunk"])):
            out.extend(_FilePartition(f) for f in _files_of(dirs[k]))
        return out

    def read(self, partition):
        yield from _arrow_batches(partition.path, self.field_names)

    def commit(self, end: dict) -> None:
        # a real topic source would ack offsets < end to the broker;
        # chunk files are immutable so there is nothing to release
        pass


class ChunkTopicDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chunk_topic"

    def schema(self):
        # infer from the first data file's footer (callers may still
        # pass an explicit .schema(ddl), which skips this)
        from pyspark.sql.pandas.types import from_arrow_schema
        import pyarrow.parquet as pq

        path = self.options["path"]
        if os.path.isfile(path):
            first = path
        else:
            dirs = _chunk_dirs(path)
            first = _files_of(dirs[0] if dirs else path)[0]
        return from_arrow_schema(pq.read_schema(first))

    def reader(self, schema) -> DataSourceReader:
        return ChunkTopicBatchReader(schema, self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return ChunkTopicStreamReader(schema, self.options)


_REGISTERED = False


def ensure_registered(spark) -> None:
    """Idempotent session-level registration of the chunk_topic format."""
    global _REGISTERED
    if not _REGISTERED:
        spark.dataSource.register(ChunkTopicDataSource)
        _REGISTERED = True
