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
    InputPartition,
    SimpleDataSourceStreamReader,
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


def register(spark) -> None:
    """Idempotently register the source with the session."""
    spark.dataSource.register(SyntheticEventsDataSource)
