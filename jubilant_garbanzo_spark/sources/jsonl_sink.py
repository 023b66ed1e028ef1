"""Custom Python DataSource WRITER (Spark 4 DataSource V2 Python API).

The reader/stream side of the connector surface is proven by
``sources/tweet_source.py`` (batch partitions + offset-tracked stream);
this is the missing third verb — a SINK implemented against
``DataSourceWriter``: per-partition ``write(iterator)`` on executors,
a ``WriterCommitMessage`` per task, and an all-or-nothing ``commit``
on the driver that publishes a ``_SUCCESS`` manifest (files from
aborted/failed task attempts are never listed, so readers see an
atomic result — the same commit-protocol shape as Spark's file sinks).

Format: JSON Lines, one file per input partition. Written values
should be integers/strings (callers quantize money to cents) so the
roundtrip is byte-deterministic — raw float JSON rendering would not
be.
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    file: str
    n_rows: int


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")
        self.overwrite = overwrite
        # Driver-generated once per write job and shipped to executors
        # inside the pickled writer: file names are (job, partition,
        # attempt)-unique, so a later job writing the same path can
        # never collide with files an earlier job's manifest references
        # (taskAttemptId alone restarts near 0 in a new application).
        # Only the NAME is random — the data bytes stay deterministic.
        self.job_token = uuid.uuid4().hex[:12]
        # Overwrite deletion is DEFERRED to commit() (ADVICE r11):
        # truncating at plan time emptied the sink before any new data
        # existed, so a job that failed after planning left no
        # manifest AND no data — weaker than the stage-then-commit
        # atomicity this module advertises. Job-token file names
        # guarantee the staged new files can never collide with the
        # stale ones deleted at commit time.

    def write(self, iterator):
        # Executor-side: one file per task attempt. The attempt-unique
        # name means a retried task never corrupts a committed file —
        # only files named in commit()'s manifest are part of the
        # dataset.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{self.job_token}-{pid:05d}-{attempt}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True))
                f.write("\n")
                n += 1
        return _FileCommit(file=name, n_rows=n)

    def commit(self, messages):
        # Driver-side, runs once after every task succeeded: first (in
        # overwrite mode) clear stale files from PRIOR jobs — batch
        # parts, stream parts, and their manifests — then publish this
        # job's manifest. Until this point the old dataset was intact
        # (old files + old _SUCCESS), so a failure anywhere earlier
        # leaves readers on the previous committed state; the brief
        # non-atomic window is delete-then-republish, same as Spark's
        # own static-overwrite commit.
        if self.overwrite:
            keep = {m.file for m in messages}
            for pat in ("part-*.jsonl", "stream-part-*.jsonl"):
                for p in glob.glob(os.path.join(self.path, pat)):
                    if os.path.basename(p) not in keep:
                        os.remove(p)
            for p in glob.glob(os.path.join(self.path, "_BATCH_*.json")):
                os.remove(p)
            for m in ("_MANIFEST.json", "_SUCCESS"):
                mp = os.path.join(self.path, m)
                if os.path.exists(mp):
                    os.remove(mp)
        manifest = {
            "files": sorted(m.file for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("")

    def abort(self, messages):
        # Leave data files for forensics; the absent _SUCCESS marker is
        # what readers key on.
        pass


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: one commit per micro-batch. Files are named
    (query-run, partition, attempt)-unique — the Python DataSource API
    does not pass batchId into write(), so a driver-generated run token
    (fresh per query start, i.e. per restart) is what guarantees a
    replayed batch can never overwrite a file an earlier run's batch
    manifest references. The per-batch _BATCH_<n>.json manifest is the
    exactly-once seam: a replayed batch re-publishes batch n's manifest
    listing its NEW files (same deterministic row content), superseding
    the old list, so a manifest-honoring reader sees each batch exactly
    once. A reader that GLOBS stream-part-*.jsonl instead of honoring
    the manifests would double-count replayed batches — acceptable for
    the repo's single-run availableNow fixtures, and queued for a
    manifest-reading consumer (round 12).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")
        self.run_token = uuid.uuid4().hex[:12]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        name = f"stream-part-{self.run_token}-{pid:05d}-{attempt}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True))
                f.write("\n")
                n += 1
        return _FileCommit(file=name, n_rows=n)

    def commit(self, messages, batchId: int):
        manifest = {
            "batch": batchId,
            "files": sorted(m.file for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(
            os.path.join(self.path, f"_BATCH_{batchId}.json"), "w"
        ) as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages, batchId: int):
        pass


def read_jsonl_sink(spark, path: str, schema: str):
    """Manifest-honoring BATCH read of a jsonl_sink directory: load
    exactly the files ``_MANIFEST.json`` lists (none other). A glob
    over ``part-*.jsonl`` would also pick up files from aborted task
    attempts or an interrupted overwrite job and double-count — the
    manifest is what makes the commit protocol exactly-once for
    READERS, not just writers (round-11 sources review)."""
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        files = json.load(f)["files"]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(
        [os.path.join(path, name) for name in files]
    )


def read_jsonl_stream_sink(spark, path: str, schema: str):
    """Manifest-honoring read of a jsonl_sink STREAMING directory: the
    union of every ``_BATCH_<n>.json``'s file list. A replayed batch's
    commit REWRITES its batch manifest with the new attempt's files,
    so the stale attempt's ``stream-part-*`` files remain on disk but
    are unreferenced — globbing them would double-count the replayed
    batch; honoring the manifests yields each batch exactly once."""
    files: list[str] = []
    for m in sorted(glob.glob(os.path.join(path, "_BATCH_*.json"))):
        with open(m) as f:
            files.extend(json.load(f)["files"])
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(
        [os.path.join(path, name) for name in files]
    )


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return JsonlStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    """Idempotent registration of the sink with a SparkSession.

    Marked pickle-by-value like register_tweet_source, so executors
    never need this package importable (serialization contract in
    streaming/stateful.py)."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover - older cloudpickle
        pass
    spark.dataSource.register(JsonlSinkDataSource)
