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
import sys

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
    way). The pacer is floored at EVERY offset the engine shows us —
    ``start``/``end`` in ``partitions`` and ``end`` in ``commit`` — so a
    checkpoint-restarted query never plans backwards even when its
    offset log was fully committed (no pending batch to replan): the
    engine's restart re-commit of the last durable batch re-seeds the
    fresh reader's pacer at the committed watermark before any new
    planning, which is what keeps insert-only arrival logs free of
    re-delivered duplicates."""

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
        # floor the pacer at every offset the engine shows us (module
        # docstring: never plan or emit below the committed watermark)
        self._paced = max(self._paced, int(start["chunk"]), int(end["chunk"]))
        out = []
        dirs = _chunk_dirs(self.path)
        for k in range(int(start["chunk"]), int(end["chunk"])):
            out.extend(_FilePartition(f) for f in _files_of(dirs[k]))
        return out

    def read(self, partition):
        yield from _arrow_batches(partition.path, self.field_names)

    def commit(self, end: dict) -> None:
        # a real topic source would ack offsets < end to the broker;
        # chunk files are immutable so there is nothing to release.
        # Flooring the pacer here covers the restart path where the
        # engine re-commits the last durable batch before planning
        # anything new — the only signal a fresh reader gets when the
        # offset log holds no pending batch to replan.
        self._paced = max(self._paced, int(end["chunk"]))


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

    def streamWriter(self, schema, overwrite):
        return ChunkTopicStreamWriter(schema, self.options)


# registration is PER-SESSION (spark.dataSource.register binds to the
# session's registry), but register_pickle_by_value is process-global —
# track the two separately so a second SparkSession in the same process
# still gets the format registered
_SESSIONS_REGISTERED: "weakref.WeakSet" = None  # initialized lazily
_PICKLE_REGISTERED = False


def ensure_registered(spark) -> None:
    """Idempotent session-level registration of the chunk_topic format.

    The DataSource class is cloudpickled into Spark's Python planner and
    executor workers, which run with a CLEAN sys.path (no repo root) —
    pickling by reference would make every worker die with
    ModuleNotFoundError unless the package is installed there. This
    module is deliberately self-contained (stdlib + pyspark imports
    only), so registering it for pickle BY VALUE ships the class bodies
    inside the pickle and the source works from any cwd / any worker —
    the same portability a real packaged source gets from pip install.
    (Caught by the from-/tmp driver-contract sweep, round 12.)

    The guard is keyed on the SESSION (a WeakSet of session objects):
    ``spark.dataSource.register`` binds to one session's registry, so a
    process-global flag would make a second SparkSession in the same
    process skip registration and fail chunk_topic reads with an
    unknown-data-source error. Only the cloudpickle by-value
    registration stays process-global."""
    global _SESSIONS_REGISTERED, _PICKLE_REGISTERED
    import weakref

    if _SESSIONS_REGISTERED is None:
        _SESSIONS_REGISTERED = weakref.WeakSet()
    if not _PICKLE_REGISTERED:
        # Spark serializes through its VENDORED cloudpickle — the
        # standalone `cloudpickle` package has a separate by-value
        # registry that Spark never consults
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
        _PICKLE_REGISTERED = True
    if spark not in _SESSIONS_REGISTERED:
        try:
            spark.dataSource.register(ChunkTopicDataSource)
        except Exception as e:  # noqa: BLE001 — narrow on message below
            # sessions cloned via newSession() share the registry, so a
            # re-register there raises DATA_SOURCE_ALREADY_EXISTS — that
            # IS the registered state; anything else propagates
            if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
                raise
        _SESSIONS_REGISTERED.add(spark)


# ---------------------------------------------------------------------------
# The WRITE half: a chunk-topic SINK through the public stream-writer
# lifecycle (the reference's Kafka PRODUCER wire, W7 — here the
# transactional-producer shape: staged task files become visible only
# when the driver's commit publishes the batch manifest).


class _StagedFileCommit:
    """Picklable commit message: one staged file written by one task."""

    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


# WriterCommitMessage is a plain marker base — subclass it so Spark's
# type check passes while keeping the class module-level picklable
from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage, _StagedFileCommit):
    pass


COMMIT_MANIFEST = "_commit.json"


class ChunkTopicStreamWriter(DataSourceStreamArrowWriter):
    """Exactly-once publish protocol (the repo's manifest-last commit
    discipline, applied to the sink API):

    - ``write`` (executors): each task writes its Arrow batches to ONE
      staged parquet file under ``<path>/.staged/`` and returns it as
      the commit message — nothing under ``.staged/`` is ever readable.
    - ``commit`` (driver, all tasks succeeded): move the staged files
      into ``<path>/__batch=<id>/``, then write the batch's
      ``_commit.json`` manifest STRICTLY LAST — the manifest IS the
      commit point; readers ignore manifest-less dirs, so a crash
      between moves publishes nothing.
    - ``abort`` (driver, any task failed): delete the staged files; a
      Spark retry re-runs the whole micro-batch.

    A re-delivered batch id overwrites its own directory before
    re-publishing (idempotent, same as the engine's fenced appends).

    Object-store port note: the driver-side ``os.replace`` moves map to
    CopyObject + Delete (no rename on a store) with the manifest PUT
    still strictly last — the commit point and the crash analysis are
    unchanged, exactly the copy-based promote discipline
    plans/commitio.py executes for the engine's own state dirs. The
    executor-side staged files are the DATA plane (plain objects under
    a .staged/ prefix a reader never lists)."""

    def __init__(self, schema, options):
        self.path = options["path"]
        self.field_names = [f.name for f in schema.fields]

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        staged_dir = os.path.join(self.path, ".staged")
        os.makedirs(staged_dir, exist_ok=True)
        out = os.path.join(staged_dir, f"{uuid.uuid4().hex}.parquet")
        writer = None
        rows = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(out, batch.schema)
            writer.write_table(pa.Table.from_batches([batch]))
            rows += batch.num_rows
        if writer is not None:
            writer.close()
        else:
            return None  # empty task: nothing staged, no message
        return _FileCommit(out, rows)

    def commit(self, messages, batchId: int) -> None:
        import json
        import shutil

        d = os.path.join(self.path, f"__batch={batchId}")
        if os.path.isdir(d):  # re-delivered epoch: replace, re-publish
            shutil.rmtree(d)
        os.makedirs(d)
        names = []
        for i, m in enumerate(m for m in messages if m is not None):
            name = f"part-{i:05d}.parquet"
            os.replace(m.path, os.path.join(d, name))
            names.append({"file": name, "rows": m.rows})
        tmp = os.path.join(d, f".{COMMIT_MANIFEST}.tmp")
        with open(tmp, "w") as f:
            json.dump({"batch": batchId, "files": names}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(d, COMMIT_MANIFEST))  # commit point

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def committed_batches(path: str) -> list[int]:
    """Batch ids the sink has PUBLISHED (manifest present) — the only
    dirs a reader may touch."""
    return sorted(
        int(d.rsplit("=", 1)[1])
        for d in glob.glob(os.path.join(path, "__batch=*"))
        if os.path.exists(os.path.join(d, COMMIT_MANIFEST))
    )


def read_committed(spark, path: str):
    """The produced topic, committed batches only, with the batch id as
    a column (a consumer that respects the manifest commit point)."""
    from pyspark.sql import functions as F

    dfs = []
    for b in committed_batches(path):
        d = os.path.join(path, f"__batch={b}")
        dfs.append(
            spark.read.parquet(d).withColumn(
                "batch_seq", F.lit(b).cast("long")
            )
        )
    if not dfs:
        raise ValueError(f"no committed batches under {path}")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
