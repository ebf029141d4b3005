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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

#: Knuth multiplicative constant / LCG constants — exact in int64 for the
#: row-id ranges this source serves (i < 2^20 keeps products < 2^53 too,
#: so even a float engine would agree; DuckDB stays in BIGINT anyway).
_USER_MULT = 2654435761
_USER_MOD = 997
_VAL_MULT = 1103515245
_VAL_ADD = 12345
_VAL_MOD = 10000


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
            yield (
                i,
                (i * _USER_MULT) % _USER_MOD,
                EVENT_TYPES[i % len(EVENT_TYPES)],
                ((i * _VAL_MULT + _VAL_ADD) % _VAL_MOD) / 100.0,
            )


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — options: n_rows, n_partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with the session."""
    spark.dataSource.register(SyntheticEventsDataSource)
