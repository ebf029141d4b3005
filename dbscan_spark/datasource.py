"""Custom Python DataSource (PySpark 4 DataSource API).

The reference's only source is a CSV text scan (README.md:73-75); this
exercises the OTHER end of the source spectrum the driver contract's
"sources" row asks for: a from-scratch connector registered with
``spark.dataSource.register`` and consumed via
``spark.read.format("synthetic_events")``.

The connector generates a deterministic synthetic event stream from pure
integer arithmetic, partitioned into independent row-ranges — the shape
every real Python connector (REST API pages, queue shards, object-store
listings) uses: the DRIVER only plans the partition list; each executor
materializes its own partition's rows, so generation parallelism ==
partition count and nothing row-sized ever touches the driver. Because
every field is an exact integer function of the global row id, a DuckDB
``range()`` expression reproduces the rows bit-for-bit — the source is
hash-gated like any table-backed query.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

#: Knuth multiplicative constant / LCG constants — exact in int64 for the
#: row-id ranges this source serves (i < 2^20 keeps products < 2^53 too,
#: so even a float engine would agree; DuckDB stays in BIGINT anyway).
_USER_MULT = 2654435761
_USER_MOD = 997
_VAL_MULT = 1103515245
_VAL_ADD = 12345
_VAL_MOD = 10000


def _row(i: int) -> tuple:
    """The deterministic event at global row id ``i`` — the ONE
    generator both the batch reader and the stream reader emit from,
    so the two read paths cannot drift (and one DuckDB ``range()``
    replay oracles both)."""
    return (
        i,
        (i * _USER_MULT) % _USER_MOD,
        EVENT_TYPES[i % len(EVENT_TYPES)],
        ((i * _VAL_MULT + _VAL_ADD) % _VAL_MOD) / 100.0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        step = -(-self.n_rows // self.n_partitions)  # ceil div
        return [
            _RangePartition(s, min(s + step, self.n_rows))
            for s in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """``readStream.format("synthetic_events")`` — the streaming half
    of the connector (PySpark 4 ``simpleStreamReader``): the same
    deterministic row stream served in ``batch_rows``-sized
    micro-batches up to ``n_rows`` total. The offset is the next
    unread global row id, so progress is a pure function of the
    offset log: ``read`` serves [next_row, next_row+batch) and
    advances; ``readBetweenOffsets`` regenerates any committed batch
    bit-identically (exactly-once replay needs nothing more than the
    generator's determinism); once exhausted it returns an empty
    batch with an unchanged offset, which is how an availableNow
    drain knows to stop."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10000))
        self.batch_rows = int(options.get("batch_rows", 2048))

    def initialOffset(self) -> dict:
        return {"next_row": 0}

    def read(self, start: dict):
        s = int(start["next_row"])
        e = min(s + self.batch_rows, self.n_rows)
        # iter() over a prebuilt list: the simple-reader prefetch cache
        # calls next() on the result (a bare list fails) and pickles
        # the materialized rows (a lazy generator fails) — an iterator
        # over concrete tuples satisfies both
        return iter([_row(i) for i in range(s, e)]), {"next_row": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                _row(i)
                for i in range(
                    int(start["next_row"]), int(end["next_row"])
                )
            ]
        )


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — options: n_rows, n_partitions
    (batch) / batch_rows (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SyntheticEventsStreamReader(self.options)


class _PartCommit(WriterCommitMessage):
    """Per-task commit message: the task's staged part file + row
    count. Instances are pickled executor→driver by the API."""

    def __init__(self, staged: str, n_rows: int):
        self.staged = staged
        self.n_rows = n_rows


class _ManifestSinkWriter(DataSourceWriter):
    """Executor half of the sink: each task streams its partition's
    rows into ONE staged JSON-lines part file under ``path/_tmp`` and
    returns its commit message; nothing is visible to readers until
    the driver's ``commit``. JSON-lines because Python's ``json``
    emits shortest-round-trip doubles, so the written text parses
    back to the bit-identical value — the roundtrip is hash-gatable."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        tmp = os.path.join(self.path, "_tmp")
        os.makedirs(tmp, exist_ok=True)
        staged = os.path.join(tmp, f"part-{uuid.uuid4().hex}.json")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartCommit(staged, n)

    def commit(self, messages):
        # driver-side two-phase finalize: promote every staged part
        # with an atomic rename, then write the manifest LAST — a
        # reader keying on the manifest can never observe a partial
        # write (the _INDEX_COMPLETE marker discipline; an
        # object-store deployment swaps rename+manifest for the
        # store's multipart commit — the same single swap point)
        import json
        import os

        parts = []
        for m in messages:
            dst = os.path.join(self.path, os.path.basename(m.staged))
            os.replace(m.staged, dst)
            parts.append(
                {"file": os.path.basename(dst), "n_rows": m.n_rows}
            )
        manifest = os.path.join(self.path, "_MANIFEST")
        with open(manifest + ".tmp", "w") as fh:
            json.dump({"parts": parts}, fh)
        os.replace(manifest + ".tmp", manifest)

    def abort(self, messages):
        import os
        import shutil

        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        shutil.rmtree(
            os.path.join(self.path, "_tmp"), ignore_errors=True
        )


class ManifestSinkDataSource(DataSource):
    """``df.write.format("manifest_sink").option("path", dir)`` — the
    WRITER half of the Python DataSource surface (the batch/stream
    readers above are the read half): a from-scratch sink with the
    real two-phase commit protocol — tasks stage part files and
    return commit messages; ONLY the driver's commit promotes them
    and publishes the manifest, so failed/speculative task attempts
    leave staged orphans that never become visible. Local-mode note:
    tasks and driver share one filesystem here; the commit seam is
    documented above."""

    @classmethod
    def name(cls) -> str:
        return "manifest_sink"

    def schema(self) -> str:  # pragma: no cover — sinks declare none
        return "ignored string"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _ManifestSinkWriter(self.options)


def read_manifest_sink(spark, path: str, schema):
    """Read back ONLY the manifest-committed part files (readers key
    on the manifest, never on directory listings — staged or orphaned
    files are invisible by construction)."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST")) as fh:
        manifest = json.load(fh)
    files = [
        os.path.join(path, p["file"]) for p in manifest["parts"]
    ]
    return spark.read.schema(schema).json(files)


def register(spark) -> None:
    """Idempotently register the source + sink with the session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(ManifestSinkDataSource)
