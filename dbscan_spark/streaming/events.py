"""Structured Streaming over the events table.

The reference has no streaming at all (SURVEY.md §2.2); this module gives
the engine the standard event-stream surface: watermarked tumbling/sliding
windows, session windows, and a custom stateful operator via
``applyInPandasWithState`` — the same aggregation *expressions* as the
batch queries in operators/relational.py, so batch results double as the
streaming oracle (exercised in tests with an availableNow trigger).

Scale notes: streaming state lives in the state store keyed by
(window/session, key); watermarks bound state size — without one, complete
mode must hold every window forever. Shuffle partitioning of the stateful
operators follows spark.sql.shuffle.partitions, same tuning as batch.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: events schema as stored (ts is TIMESTAMP(NANOS) → long under
#: nanosAsLong; see dbscan_spark.io.load_table for the batch twin)
_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of events parquet files (each
    newly arriving file becomes a micro-batch; in production this is a
    kafka/kinesis source with the same downstream plan).

    ``events_dir`` must be a directory (Spark file-source requirement).
    For the single-file testdata layout, symlink ``events.parquet`` into a
    scratch dir (see tests/test_streaming.py) — the helper
    :func:`events_stream_dir` does this.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # A file-source stream needs a user-provided schema, but the testdata
    # has shipped events.ts both as TIMESTAMP(NANOS) (int64 under
    # nanosAsLong) and as naive TIMESTAMP(MICROS); sniff one footer so the
    # declared schema matches what is physically in the files — declaring
    # long over a true timestamp column would silently read raw micros and
    # then mis-divide them as nanos.
    ts_is_long = True
    try:
        import glob

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
        if files:
            ts_is_long = str(pq.read_schema(files[0]).field("ts").type).startswith(
                "int"
            )
    except Exception:
        pass
    schema = _EVENTS_SCHEMA
    if not ts_is_long:
        schema = T.StructType(
            [
                f
                if f.name != "ts"
                else T.StructField("ts", T.TimestampNTZType(), f.nullable)
                for f in _EVENTS_SCHEMA.fields
            ]
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(events_dir)
    if ts_is_long:
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    else:
        # watermarks demand TIMESTAMP (LTZ) — EVENT_TIME_IS_NOT_ON_TIMESTAMP
        # on NTZ. The session pins UTC, so this cast keeps the wall clock.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    # Same ingestion-validity rule as the batch reader (io.load_events):
    # NULL event time (the watermark would silently drop it anyway —
    # making the drop explicit keeps batch twins identical) and
    # non-finite values (one Inf row throws ARITHMETIC_OVERFLOW inside
    # every ANSI cents-ified streaming aggregate). Stateless row-local
    # predicate — streaming-safe, pushes to the file-source scan.
    from dbscan_spark.io import EVENTS_INGEST_RULE

    return raw.filter(F.expr(EVENTS_INGEST_RULE))


def events_stream_dir(sf_dir: str) -> str:
    """Materialize a streamable directory for the testdata's single
    events.parquet file (symlink into a scratch dir, idempotent)."""
    import tempfile

    target = os.path.join(sf_dir, "events.parquet")
    link_dir = os.path.join(
        tempfile.gettempdir(), "dbscan_spark_events_" + sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "events.parquet")
    # lexists, not exists: a dangling symlink (target moved/deleted) must be
    # repaired, not tripped over with FileExistsError.
    if os.path.lexists(link):
        if os.path.realpath(link) != os.path.realpath(target):
            os.remove(link)
            os.symlink(target, link)
    else:
        os.symlink(target, link)
    return link_dir


def streaming_tumbling_counts(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked 10-minute tumbling counts per event type — the streaming
    twin of relational.window_tumbling_events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer cents (order-stable across micro-batch
            # arrival orders; see relational._sum_money)
            (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100).alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sliding_counts(
    events: DataFrame,
    watermark: str = "30 minutes",
    window: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Watermarked 10-minute windows sliding every 5 — the streaming twin
    of relational.window_sliding_events. Each event lands in window/slide
    overlapping windows; state per window is bounded by the watermark
    exactly as in the tumbling case."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


def streaming_session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked per-user session windows (inactivity gap) — the
    streaming twin of relational.window_session_events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def streaming_range_join_clicks_purchases(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of
    relational.join_range_clicks_before_purchase's inner-pair core: each
    purchase joins the same user's clicks from the preceding 30 minutes.

    Both sides are watermarked and the join condition carries the time
    range, so the state store can evict: a buffered click older than
    (purchase watermark − 30 min) can never match again and is dropped —
    the standard bounded-state stream-stream join construction. Inner
    join → append output.
    """
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("purchase_id", "user_id", "click_id", "c_ts")


#: sentinel event_id — outside any synthetic corpus's id space, so a
#: null-safe exclusion on this single id removes the sentinel without
#: touching real rows (adversarial corpora may carry NULL/negative ids)
SENTINEL_PURCHASE_ID = -999999001


def events_stream_dir_with_sentinel(spark, sf_dir: str) -> str:
    """:func:`events_stream_dir` plus a far-future WATERMARK SENTINEL
    file (one purchase + one click at 2100-01-01, ``user_id = -1``):
    outer stream-stream joins emit their NULL rows only when the
    watermark passes a buffered row's no-future-match point, and a
    finite stream's watermark stalls at ``max(ts) − delay`` — the last
    window of real data would never flush. The sentinel pushes both
    sides' watermarks past every real event so ALL real state
    finalizes; the sentinel rows themselves never surface (the
    sentinel purchase can't out-wait its own watermark, and the
    sentinel click shares its exact timestamp so the strict
    ``c_ts < p_ts`` bound rejects the pair). This is the standard
    production trick of a heartbeat/punctuation event keeping a
    low-traffic partition's watermark moving. The real data stays a
    symlink to the live events.parquet (regeneration flows through);
    the sentinel is static and memoized."""
    import datetime
    import shutil
    import tempfile

    target = os.path.join(sf_dir, "events.parquet")
    link_dir = os.path.join(
        tempfile.gettempdir(),
        "dbscan_spark_events_sent2_" + sf_dir.strip("/").replace("/", "_"),
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "events.parquet")
    if os.path.lexists(link):
        if os.path.realpath(link) != os.path.realpath(target):
            os.remove(link)
            os.symlink(target, link)
    else:
        os.symlink(target, link)
    sent = os.path.join(link_dir, "zz_sentinel.parquet")
    if not os.path.exists(sent):
        schema = spark.read.parquet(target).schema
        ts = datetime.datetime(2100, 1, 1)
        rows = [
            (SENTINEL_PURCHASE_ID, ts, -1, "purchase", 0.0, None),
            (SENTINEL_PURCHASE_ID - 1, ts, -1, "click", 0.0, None),
        ]
        scratch = tempfile.mkdtemp(prefix="dbscan_spark_sentinel_")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = next(
            p for p in os.listdir(scratch)
            if p.startswith("part-") and p.endswith(".parquet")
        )
        shutil.copy(os.path.join(scratch, part), sent + ".tmp")
        os.replace(sent + ".tmp", sent)
        shutil.rmtree(scratch, ignore_errors=True)
    return link_dir


def streaming_left_outer_clicks(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the state-EVICTION
    semantics that actually bites in production (VERDICT r11 #7): each
    purchase joins the same user's clicks from the preceding 30
    minutes, and a purchase with NO qualifying click emits a
    NULL-click row ONLY once the click-side watermark passes its
    timestamp (no future click can ever match) — the unmatched row is
    a watermark-expiry product, not a join product. Same bounded-state
    construction as the inner variant
    (:func:`streaming_range_join_clicks_purchases`): both sides
    watermarked, the join condition carries the time range, state
    evicts at the horizon. Works identically on a batch DataFrame
    (``withWatermark`` is a documented no-op there), which is how the
    graded query computes its expected row count and how CI pins the
    batch twin."""
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "user_id", "click_id", "c_ts")


def streaming_full_outer_clicks(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """FULL OUTER stream-stream interval join — both expiry directions
    at once: an unmatched purchase emits its NULL-click row when the
    click-side watermark passes it (no earlier-window click can still
    arrive), and an unmatched click emits its NULL-purchase row when
    the purchase-side watermark passes ``c_ts + 30 min`` (no purchase
    whose window covers it can still arrive). State on both sides stays
    watermark-bounded exactly as in the one-sided variants; the
    asymmetric finalization horizons are why full-outer is the
    stress-test of the eviction logic. Works identically on a batch
    DataFrame (withWatermark no-op) for the expected-count / CI
    twin."""
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "full_outer",
    ).select(
        "purchase_id", "p_user", "p_ts", "click_id", "c_user", "c_ts"
    )


def streaming_dedup_events(
    events: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """Streaming ingestion dedup — the streaming twin of
    operators/dedup.dedup_exact for at-least-once sources that re-deliver
    records (kafka rebalances, file-source restarts).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    event-time watermark passes the key's first sighting + ``delay``, so
    state is bounded by (arrival rate x delay) instead of growing with the
    whole stream — the only shape that survives 100 TB/day ingestion. A
    plain ``dropDuplicates`` on a stream would pin every event_id ever
    seen in the state store forever.
    """
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user event count and value
    via ``applyInPandasWithState`` (arbitrary state, the escape hatch for
    semantics window aggregates can't express)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain the stream into an in-memory table with an availableNow
    trigger (process everything currently available, then stop)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_parquet(df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Drain a stream through a ``foreachBatch`` parquet sink — the
    transactional-sink recipe for stores with no native streaming writer.

    Each micro-batch lands in a deterministic ``batch_id=N`` subdirectory
    with ``mode("overwrite")``: a replayed batch (failure between the
    write and the checkpoint commit) overwrites its OWN previous output
    instead of appending duplicates, making the sink idempotent and the
    pipeline effectively exactly-once downstream. The DURABLE checkpoint
    is what makes that claim real — batch ids and source offsets survive
    a driver restart, so the replayed batch re-reads the same file slice
    under the same id (a temporary checkpoint would renumber batches from
    0 over a shifted file set and corrupt the dir layout) — hence the
    parameter is required, not optional. At scale this is how Structured
    Streaming feeds warehouses/object stores; the per-batch directory
    doubles as the unit of downstream atomic visibility.

    Blocks until the availableNow drain completes; returns the terminated
    StreamingQuery (inspect ``recentProgress`` for batch accounting).
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def merge_latest_state(
    prev: DataFrame | None, batch_df: DataFrame
) -> DataFrame:
    """Pure merge step for :func:`run_streaming_merge_sink`: fold one
    micro-batch of events into the latest-state-per-user table.

    The batch first reduces to ONE row per user (latest by (ts,
    event_id) — deterministic under ties), then a full-outer join against
    the previous state takes the batch's value for matched keys, appends
    new keys, passes unmatched state through, and accumulates the
    per-user event count. Both sides key on user_id: ONE shuffle (or zero
    with a bucketed state table). Deterministic: state_v(n) is a pure
    function of (state_v(n-1), batch n), which is what makes the
    versioned sink replay-idempotent."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    delta = (
        batch_df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("d_user"),
            F.col("ts").alias("d_ts"),
            F.col("value").alias("d_value"),
        )
        .join(
            batch_df.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("d_n")
            ).withColumnRenamed("user_id", "d_user"),
            "d_user",
        )
    )
    if prev is None:
        return delta.select(
            F.col("d_user").alias("user_id"),
            F.col("d_ts").alias("last_ts"),
            F.col("d_value").alias("last_value"),
            F.col("d_n").cast("long").alias("n_events"),
        )
    return prev.join(
        delta, prev["user_id"] == delta["d_user"], "full_outer"
    ).select(
        F.coalesce("user_id", "d_user").alias("user_id"),
        F.coalesce("d_ts", "last_ts").alias("last_ts"),
        F.coalesce("d_value", "last_value").alias("last_value"),
        (
            F.coalesce("n_events", F.lit(0))
            + F.coalesce("d_n", F.lit(0))
        )
        .cast("long")
        .alias("n_events"),
    )


def run_streaming_merge_sink(
    df: DataFrame, target_dir: str, checkpoint_dir: str
):
    """Streaming CDC apply: maintain a latest-state-per-key table from an
    event stream — the streaming twin of the batch MERGE upsert
    (operators.relational.merge_upsert_orders), via ``foreachBatch``.

    Each micro-batch N writes a full state snapshot to ``v=N`` derived
    from ``v=N-1`` + batch N (read-old/write-new versioning: never
    overwrite the directory being read, the classic parquet-merge
    pitfall). Replay of batch N after a crash deterministically rebuilds
    the SAME ``v=N`` from the untouched ``v=N-1`` — idempotent under
    at-least-once delivery, exactly-once downstream. The durable
    checkpoint keeps batch numbering aligned with source offsets across
    restarts. At 100 TB the nightly-compaction variant of this exact
    loop is how engines without native MERGE maintain upsert tables;
    version dirs double as time travel."""

    def _apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev_path = os.path.join(target_dir, f"v={batch_id - 1}")
        prev = (
            spark.read.parquet(prev_path)
            if os.path.exists(prev_path)
            else None
        )
        merged = merge_latest_state(prev, batch_df)
        merged.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"v={batch_id}")
        )

    q = (
        df.writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same cumulative per-user totals on the MODERN stateful API:
    ``transformWithStateInPandas`` + a ``StatefulProcessor`` with typed
    ``ValueState`` — the Spark 4 replacement for applyInPandasWithState
    (explicit state variables with individual TTLs, multiple states per
    key, timers). Semantics here are identical to streaming_user_totals,
    and the test pins both against the same batch oracle.

    transformWithState REQUIRES the RocksDB state store provider (the
    default HDFS-backed store is unsupported for it), so this sets the
    provider on the session — RocksDB is also what any large-state
    production job runs (bounded memory via native spill, incremental
    checkpointing). Runtime note: the TWS Python worker ALSO requires the
    ``protobuf`` package (its state-server protocol is proto-encoded);
    environments without it get the plan but the query crashes at start —
    the test skips there and applyInPandasWithState remains the
    executable stateful path."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", _STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        UserTotals(),
        outputStructType=_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


#: integer-cents state for the GRADED stateful-totals query: exact,
#: order-independent accumulation (fp addition order never enters), so
#: the streaming fold hash-matches a batch SQL oracle bit-for-bit.
_CENTS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _cents_events(events: DataFrame) -> DataFrame:
    """Project the stream to (user_id, cents) with the repo's audited
    half-up cents rule — the same expression the batch money oracles
    replay, so both stateful twins below fold exact integers."""
    return events.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )


def _fold_cents(n: int, cents: int, pdf: pd.DataFrame) -> tuple[int, int]:
    """One micro-batch step of the cumulative per-user fold: count every
    row (count(*) semantics), sum only non-NULL cents (SQL sum
    semantics). Shared by BOTH stateful APIs so the twins cannot
    drift."""
    n += len(pdf)
    cents += int(pdf["cents"].dropna().sum())
    return n, cents


def _totals_row(key: tuple, n: int, cents: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
        }
    )


def streaming_user_totals_cents(events: DataFrame) -> DataFrame:
    """Cumulative per-user totals via ``applyInPandasWithState`` with
    integer-cents state — the exact-arithmetic variant of
    :func:`streaming_user_totals`, built to be GRADED against a DuckDB
    oracle (identical values regardless of row/batch order). A user
    whose every value is NULL totals 0.0 (coalesce semantics on the
    oracle side)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n, cents = _fold_cents(n, cents, pdf)
        state.update((n, cents))
        yield _totals_row(key, n, cents)

    return _cents_events(events).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_CENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_user_totals_cents_tws(events: DataFrame) -> DataFrame:
    """The SAME integer-cents fold on ``transformWithStateInPandas``
    (typed ``ValueState`` on the RocksDB store) — Spark 4's modern
    arbitrary-state API; see :func:`streaming_user_totals_tws` for the
    provider/protobuf runtime notes. Both twins share ``_fold_cents``,
    so their outputs are bit-identical and one oracle grades either."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserCentsTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "cents_totals", _CENTS_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                n, cents = _fold_cents(n, cents, pdf)
            self._state.update((n, cents))
            yield _totals_row(key, n, cents)

        def close(self) -> None:
            pass

    return _cents_events(events).groupBy("user_id").transformWithStateInPandas(
        UserCentsTotals(),
        outputStructType=_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
