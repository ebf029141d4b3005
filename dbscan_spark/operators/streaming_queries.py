"""Driver-graded Structured Streaming queries.

The rest of the streaming surface lives in ``dbscan_spark/streaming/``
and is proven against batch oracles in tests/test_streaming.py; these
two entries additionally put streaming under the driver's DuckDB hash
gate by draining a real ``readStream`` → ``writeStream`` pipeline with
an ``availableNow`` trigger inside the query callable and returning the
sink contents as the result DataFrame. Streaming twin of the reference's
one-shot batch pipeline (``DBSCAN.scala:80-242`` has no streaming; this
is driver-contract surface, SURVEY.md §2.2).

Scale shape: both queries run the exact plans their batch twins run —
watermarked state for the windowed aggregation, a keyed snapshot merge
for the CDC sink — so the 100 TB arguments (bounded state via
watermark eviction, one user-keyed shuffle per micro-batch,
read-old/write-new snapshot versioning) are the ones documented on the
underlying functions in streaming/events.py.
"""

from __future__ import annotations

import itertools
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbscan_spark.streaming import events as se


def _scratch_dir(prefix: str) -> str:
    """mkdtemp + atexit rmtree (ADVICE r13): several queries here
    return a DataFrame that lazily reads its scratch sink, so the
    scratch must outlive the function — but not the process. Without
    this, every graded run of the restart drills left events-parquet-
    sized copies accumulating in /tmp across driver rounds."""
    import atexit
    import shutil

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

#: memory-sink query names must be unique per active session
_SEQ = itertools.count()

#: streaming connector drain size: 50k rows in 16384-row micro-batches
#: (4 batches, so the offset log genuinely advances)
_PYSRC_ROWS = 50000
_PYSRC_BATCH = 16384


def streaming_tumbling_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming windowed aggregation, graded exactly: file
    stream over the events directory → watermarked 10-minute tumbling
    windows per event type → availableNow drain into a memory sink in
    complete mode → sink table returned. All data is on disk already, so
    the drain is one micro-batch and the complete-mode result equals the
    batch twin (relational.window_tumbling_events) — which is the oracle.
    """
    src = se.read_events_stream(spark, se.events_stream_dir(sf_dir))
    agg = se.streaming_tumbling_counts(src, watermark="30 minutes")
    name = f"streaming_tumbling_totals_{next(_SEQ)}"
    se.run_to_memory(agg, name, output_mode="complete")
    return spark.table(name)


def streaming_session_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION windows, graded exactly: file stream →
    watermarked per-user inactivity-gap (30 min) session aggregation →
    availableNow drain into a complete-mode memory sink. Session state
    merges adjacent windows as events arrive (the one windowed aggregate
    whose extent is data-dependent); the complete-mode drain over
    already-on-disk data equals the batch twin
    (relational.window_session_events), whose gaps-and-islands SQL is
    the oracle."""
    src = se.read_events_stream(spark, se.events_stream_dir(sf_dir))
    agg = se.streaming_session_counts(src)
    name = f"streaming_session_totals_{next(_SEQ)}"
    se.run_to_memory(agg, name, output_mode="complete")
    return spark.table(name)


def streaming_merge_latest_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming CDC materialized view, graded exactly: event stream →
    ``foreachBatch`` snapshot-versioned merge sink (latest state per
    user + event count; read-old/write-new so replay of a crashed batch
    is idempotent) → final snapshot returned. Oracle: per-user argmax on
    (ts, event_id) plus count(*) in plain SQL."""
    src = se.read_events_stream(spark, se.events_stream_dir(sf_dir))
    scratch = _scratch_dir("dbscan_spark_merge_sink_")
    target = os.path.join(scratch, "state")
    se.run_streaming_merge_sink(
        src, target, os.path.join(scratch, "ckpt")
    )
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(target)
        if d.startswith("v=")
    )
    snap = spark.read.parquet(os.path.join(target, f"v={versions[-1]}"))
    return snap.select(
        "user_id",
        "last_ts",
        F.round("last_value", 2).alias("last_value"),
        "n_events",
    )


def streaming_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DEDUPLICATION with bounded state, graded exactly: file
    stream → ``dropDuplicatesWithinWatermark`` on (user_id, event_type)
    → append-mode memory sink. The WithinWatermark variant is the 100 TB
    shape — dedup state is EVICTED once the 1-hour watermark passes a
    key, so state size tracks the watermark horizon, not the full
    stream history (plain dropDuplicates would grow without bound). The
    availableNow drain is one micro-batch, within which all state is
    live, so the output equals the batch DISTINCT — the oracle."""
    src = se.read_events_stream(spark, se.events_stream_dir(sf_dir))
    ded = (
        src.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"streaming_dedup_pairs_{next(_SEQ)}"
    se.run_to_memory(ded, name, output_mode="append")
    return spark.table(name)


def _worker_has_protobuf(spark: SparkSession) -> bool:
    """Probe whether Spark's PYTHON WORKERS can import a real protobuf
    runtime (transformWithState's state-server protocol needs one in the
    worker, not just the driver). A 1-row mapInPandas is the cheapest
    faithful probe: the worker environment differs from the driver's
    (spark-core's jar shades an EMPTY google.protobuf namespace package
    there, and the tests/_protobuf_shim sitecustomize only engages if
    PYTHONPATH carried it past the JVM fork), so a driver-side import
    check would lie in both directions."""
    import pandas as pd  # noqa: F401

    def probe(batches):
        try:
            from google.protobuf import descriptor  # noqa: F401

            ok = True
        except ImportError:
            ok = False
        for _ in batches:
            pass
        import pandas as pd

        yield pd.DataFrame({"ok": [ok]})

    row = (
        spark.range(1)
        .repartition(1)
        .mapInPandas(probe, "ok boolean")
        .collect()
    )
    return bool(row and row[0]["ok"])


def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user totals through a CUSTOM stateful streaming
    operator, graded exactly — the driver-visible promotion of the
    transformWithState twin (VERDICT r8 item 7). Preferred path:
    ``transformWithStateInPandas`` with typed ``ValueState`` on the
    RocksDB store (Spark 4's modern arbitrary-state API). Its Python
    state-server protocol requires a protobuf runtime in the WORKER,
    probed via :func:`_worker_has_protobuf`; where absent the query runs
    the ``applyInPandasWithState`` twin instead. Both twins share the
    same integer-cents fold (streaming/events.py ``_fold_cents``), so
    the rows are bit-identical either way and ONE oracle grades both —
    the fallback changes the state API exercised, never the answer.

    Exactness: cents accumulate as integers (order-independent), the
    final total is one cents/100 double division — the audited money
    idiom, so the streaming fold hash-matches the batch SQL. The
    update-mode memory sink emits one row per key per micro-batch; the
    final per-user fold keeps the row with the highest running count
    (totals are monotone), making the result batch-count-invariant.

    Scale shape: one user-keyed shuffle per micro-batch into the state
    store; state is two longs per user (RocksDB spills past memory on
    the TWS path); no watermark is needed because the state is the
    AGGREGATE itself (bounded by #users), not a buffer of rows."""
    src = se.read_events_stream(spark, se.events_stream_dir(sf_dir))
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    try:
        if _worker_has_protobuf(spark):
            agg = se.streaming_user_totals_cents_tws(src)
        else:
            agg = se.streaming_user_totals_cents(src)
        name = f"streaming_stateful_totals_{next(_SEQ)}"
        se.run_to_memory(agg, name, output_mode="update")
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    sink = spark.table(name)
    final = F.max(F.struct("n_events", "total_value")).alias("s")
    return (
        sink.groupBy("user_id")
        .agg(final)
        .select("user_id", "s.n_events", "s.total_value")
    )


def streaming_enriched_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join, graded exactly — the remaining
    named Structured Streaming join class beside the graded
    stream-stream interval join (tests) and the stateful operators:
    the event stream LEFT-joins a static broadcast dimension
    (customer → market segment on user_id) and aggregates per segment
    in complete mode. Events with no matching customer (or NULL user)
    surface as the NULL segment on both engines instead of being
    silently dropped — hence LEFT, not inner.

    Scale shape: a stream-static join never shuffles the stream — the
    static side is broadcast and re-read per micro-batch (which is how
    Spark picks up dimension updates); the aggregation state is bounded
    by #segments. The money column folds through the audited
    integer-cents rule, so the complete-mode drain hash-matches the
    batch SQL."""
    from dbscan_spark.io import load_table

    src = se.read_events_stream(spark, se.events_stream_dir(sf_dir))
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = src.join(
        F.broadcast(dim), src.user_id == dim.c_custkey, "left"
    )
    agg = joined.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            F.coalesce(
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ),
                F.lit(0),
            )
            / 100
        ).alias("total_value"),
    )
    name = f"streaming_enriched_totals_{next(_SEQ)}"
    se.run_to_memory(agg, name, output_mode="complete")
    return spark.table(name)


def streaming_pysource_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The custom Python DataSource's STREAMING half under the hash
    gate (VERDICT r10 #8 — PySpark 4 ``simpleStreamReader`` completes
    the connector story): ``readStream.format("synthetic_events")``
    serves the same deterministic integer event stream the batch
    connector generates, in 16384-row micro-batches (50k rows → 4
    batches, so the offset log genuinely advances across batches), →
    complete-mode per-type totals → micro-batch drain into a memory
    sink, stopped once the sink accounts for every generated row
    (Python micro-batch sources don't support Trigger.AvailableNow —
    Spark would fall back to a single batch and drain only the first
    16384 rows). The offset is the next unread row id; replay
    regenerates any
    committed range bit-identically (the generator is pure), and the
    drain stops on the first empty batch. EXACT oracle: the same
    DuckDB ``range()`` regeneration that grades the batch connector,
    aggregated identically (count + exact-cents sum; no distinct — a
    streaming aggregate cannot hold countDistinct state).

    Scale shape: per micro-batch the source plans one partition per
    offset range executor-side; the aggregation state is bounded by
    #event_types. At 100 TB the same reader shape pages a real
    external system (queue shards, REST pages) with the offset log
    providing exactly-once."""
    from dbscan_spark import datasource

    datasource.register(spark)
    src = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", _PYSRC_ROWS)
        .option("batch_rows", _PYSRC_BATCH)
        .load()
    )
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            )
            / 100
        ).alias("total_value"),
    )
    name = f"streaming_pysource_events_{next(_SEQ)}"
    # Python micro-batch sources don't support Trigger.AvailableNow
    # (Spark falls back to ONE batch, which would drain only the first
    # 16384 rows) — so run a continuous micro-batch trigger and stop
    # once the complete-mode sink accounts for every generated row.
    # The source is finite, so this terminates deterministically.
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            got = (
                spark.table(name)
                .agg(F.sum("n_events").alias("n"))
                .collect()[0]["n"]
            )
            if got == _PYSRC_ROWS:
                break
            time.sleep(0.25)
        else:
            raise TimeoutError(
                f"stream drained {got} of {_PYSRC_ROWS} rows in 300s"
            )
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name)


def streaming_outer_join_clicks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join, graded
    exactly (VERDICT r11 #7 — the NULL-emitting-on-watermark-expiry
    semantics the inner join can't show): file stream (+ the far-future
    watermark SENTINEL, see events.events_stream_dir_with_sentinel —
    without it a finite stream's last 30 minutes of unmatched purchases
    would never flush) → purchases LEFT OUTER clicks of the preceding
    30 minutes → append-mode memory sink. Outer joins only support
    append output and their NULL rows emit on no-data micro-batches
    AFTER the data batch applies the watermark, so the drain runs the
    default continuous micro-batch trigger and stops once the sink
    holds exactly the batch twin's row count — computed up front by
    running the SAME helper on the batch table (withWatermark is a
    no-op there), so the stop condition and the DuckDB oracle agree by
    construction. Sentinel rows cannot surface (documented in the
    helper) and are additionally filtered.

    Scale shape: per-side state is bounded by the watermark horizon
    (evicted rows can never match or finalize again); the join
    exchanges hash on user_id. At 100 TB the sentinel generalizes to
    per-partition heartbeat punctuation."""
    sdir = se.events_stream_dir_with_sentinel(spark, sf_dir)
    src = se.read_events_stream(spark, sdir)
    joined = se.streaming_left_outer_clicks(src)
    from dbscan_spark.io import load_events

    batch = load_events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expected = se.streaming_left_outer_clicks(batch).count()
    name = f"streaming_outer_join_clicks_{next(_SEQ)}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 300
        got = -1
        while time.time() < deadline:
            got = spark.table(name).count()
            if got == expected:
                break
            time.sleep(0.25)
        else:
            raise TimeoutError(
                f"outer join emitted {got} of {expected} rows in 300s"
            )
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name).filter(
        ~F.col("purchase_id").eqNullSafe(
            F.lit(se.SENTINEL_PURCHASE_ID)
        )
    )


def streaming_full_outer_clicks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL OUTER watermarked stream-stream join, graded exactly — the
    two-sided expiry semantics (unmatched purchases AND unmatched
    clicks each emit NULL rows when the OPPOSITE side's watermark
    passes their finalization horizon; the horizons are asymmetric:
    ``p_ts`` for a purchase, ``c_ts + 30 min`` for a click). Same
    construction as :func:`streaming_outer_join_clicks`: the sentinel
    file pushes both watermarks past all real data so a finite
    stream's full expiry set emits, the drain stops at the batch
    twin's pre-computed row count, and the sentinel rows (which can
    never finalize) are additionally excluded null-safely."""
    sdir = se.events_stream_dir_with_sentinel(spark, sf_dir)
    src = se.read_events_stream(spark, sdir)
    joined = se.streaming_full_outer_clicks(src)
    from dbscan_spark.io import load_events

    batch = load_events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expected = se.streaming_full_outer_clicks(batch).count()
    name = f"streaming_full_outer_clicks_{next(_SEQ)}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 300
        got = -1
        while time.time() < deadline:
            got = spark.table(name).count()
            if got == expected:
                break
            time.sleep(0.25)
        else:
            raise TimeoutError(
                f"full outer join emitted {got} of {expected} rows in 300s"
            )
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name).filter(
        ~F.col("purchase_id").eqNullSafe(F.lit(se.SENTINEL_PURCHASE_ID))
        & ~F.col("click_id").eqNullSafe(
            F.lit(se.SENTINEL_PURCHASE_ID - 1)
        )
    )


#: phase-1 bound for the checkpoint-restart query: exactly 2 micro-
#: batches, so the first run is PARTIAL by construction (32,768 of the
#: 50,000 rows), never by timing luck
_RESTART_PHASE1_ROWS = 2 * _PYSRC_BATCH

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)


def _run_restart_phase(
    spark: SparkSession, ckpt: str, out: str, n_rows: int
) -> None:
    """One ``start()``→drain→``stop()`` leg of the checkpoint-restart
    query: the synthetic stream bounded at ``n_rows``, complete-mode
    per-type totals, a foreachBatch sink that overwrites ``out`` with
    each batch's full snapshot (idempotent — replaying an uncommitted
    batch rewrites the same bytes), all under the DURABLE ``ckpt``.
    Drains until the snapshot accounts for exactly ``n_rows`` events.
    Shared by the graded query and the CI restart pin."""
    from dbscan_spark import datasource

    datasource.register(spark)
    src = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", n_rows)
        .option("batch_rows", _PYSRC_BATCH)
        .load()
    )
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            )
            / 100
        ).alias("total_value"),
    )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.foreachBatch(_write)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 300
        got = None
        while time.time() < deadline:
            try:
                got = (
                    spark.read.parquet(out)
                    .agg(F.sum("n_events").alias("n"))
                    .collect()[0]["n"]
                )
            except Exception:
                got = None  # sink mid-overwrite or not yet written
            if q.exception() is not None:
                # fail fast with the ROOT CAUSE (ADVICE r13): a dead
                # query (e.g. missing state-store provider class) must
                # not hide behind a 5-minute drain timeout
                raise q.exception()
            if got == n_rows:
                break
            time.sleep(0.25)
        else:
            raise TimeoutError(
                f"restart phase drained {got} of {n_rows} rows in 300s"
            )
    finally:
        q.stop()
        q.awaitTermination()


def streaming_checkpoint_restart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint-RESTART recovery, graded exactly (VERDICT r12 #6 —
    the production semantics every prior streaming query skipped by
    draining a fresh query): the drain spans TWO separate ``start()``
    calls against ONE durable ``checkpointLocation`` on the RocksDB
    state store. Phase 1 bounds the deterministic Python source at
    2 micro-batches (32,768 of 50,000 rows — partial BY CONSTRUCTION,
    not by timing) and stops; phase 2 re-creates the query with the
    full 50,000-row bound and the SAME checkpoint, so Spark restores
    the committed offsets AND the complete-mode aggregation state and
    processes only rows 32,768…49,999.

    The hash gate proves both restart properties at once: if phase 2
    re-read phase-1 rows the totals would cover 82,768 events; if the
    state store failed to restore (fresh aggregation, resumed offsets)
    they would cover only 17,232 — only exactly-once resume over
    restored state matches the 50,000-row batch oracle (shared shape
    with streaming_pysource_events' oracle). A stop landing between
    the foreachBatch write and the checkpoint commit replays that
    batch from the simple reader's checkpointed prefetch cache
    (readBetweenOffsets) into the idempotent overwrite sink — the
    exactly-once-downstream discipline of run_foreach_batch_parquet.

    Scale shape: identical per-micro-batch plan to the single-run
    query; the restart machinery is pure checkpoint metadata (offset
    log + RocksDB snapshot/changelog), which is how a 1000-executor
    job survives a driver loss mid-stream."""
    scratch = _scratch_dir("dbscan_spark_restart_")
    ckpt = os.path.join(scratch, "ckpt")
    out = os.path.join(scratch, "out")
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
    )
    try:
        _run_restart_phase(spark, ckpt, out, _RESTART_PHASE1_ROWS)
        _run_restart_phase(spark, ckpt, out, _PYSRC_ROWS)
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    return spark.read.parquet(out)


def _write_events_half(
    spark: SparkSession, sf_dir: str, data_dir: str, parity: int
) -> None:
    """Copy the deterministic half of events.parquet (pmod(event_id, 2)
    == parity, NULL ids to half 0) into ``data_dir`` as one new file —
    the file-arrival step of the windowed-restart drill. Preserves the
    shipped column types untouched so read_events_stream's footer
    sniff sees the same physical schema as the original."""
    import glob
    import shutil

    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    half = raw.filter(
        F.coalesce(F.pmod(F.col("event_id"), F.lit(2)), F.lit(0))
        == parity
    )
    tmp = data_dir + f".tmp{parity}"
    half.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(data_dir, f"half{parity}.parquet"))
    shutil.rmtree(tmp)  # scratch write dir — done once the part is copied


def _run_windowed_restart_phase(
    spark: SparkSession, data_dir: str, ckpt: str, out: str
) -> None:
    """One start()→drain→stop() leg of the windowed-restart drill:
    watermarked tumbling totals over whatever files ``data_dir``
    currently holds, complete-mode foreachBatch snapshot overwrite
    under the durable ``ckpt``; drains until the snapshot accounts for
    every qualifying event currently on disk (the batch count of the
    same directory — the same ingest rule on both paths)."""
    batch = spark.read.parquet(data_dir)
    from dbscan_spark.io import EVENTS_INGEST_RULE

    if dict(batch.dtypes)["ts"] in ("bigint", "long"):
        batch = batch.withColumn(
            "ts", F.expr("timestamp_micros(ts DIV 1000)")
        )
    else:
        batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
    n_expected = batch.filter(F.expr(EVENTS_INGEST_RULE)).count()

    src = se.read_events_stream(spark, data_dir)
    agg = se.streaming_tumbling_counts(src)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.foreachBatch(_write)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 300
        got = None
        while time.time() < deadline:
            try:
                got = (
                    spark.read.parquet(out)
                    .agg(F.sum("n_events").alias("n"))
                    .collect()[0]["n"]
                )
            except Exception:
                got = None
            if q.exception() is not None:
                raise q.exception()  # fail fast — see _run_restart_phase
            if got == n_expected:
                break
            time.sleep(0.25)
        else:
            raise TimeoutError(
                f"windowed restart phase drained {got} of "
                f"{n_expected} events in 300s"
            )
    finally:
        q.stop()
        q.awaitTermination()


def streaming_restart_windowed_totals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WINDOWED-aggregation restart recovery, graded exactly — the
    event-time sibling of :func:`streaming_checkpoint_restart` (which
    restores a keyless aggregate over a synthetic source; this one
    restores per-WINDOW state over the real file source with files
    ARRIVING ACROSS the restart): phase 1 streams the deterministic
    even-event_id half of events.parquet under a durable RocksDB
    checkpoint and stops; the odd half then lands in the source
    directory and phase 2 re-starts the same query, which must resume
    the file-source offset log (phase-1 files are NOT re-read) AND
    restore every window's partial (count, exact-cents) state so the
    interleaved-in-time phase-2 events MERGE into the restored
    windows. Only both properties together reproduce the batch twin
    (relational.window_tumbling_events' plan) over the full table —
    re-reading doubles the even half, lost state drops it. Oracle =
    the same SQL that grades streaming_tumbling_totals.

    Scale shape: identical per-micro-batch plan to the single-run
    query; restart cost is checkpoint metadata + the RocksDB window-
    state restore — the driver-loss recovery a 1000-executor
    streaming job relies on."""
    scratch = _scratch_dir("dbscan_spark_wrestart_")
    data_dir = os.path.join(scratch, "in")
    ckpt = os.path.join(scratch, "ckpt")
    out = os.path.join(scratch, "out")
    os.makedirs(data_dir)
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
    )
    try:
        _write_events_half(spark, sf_dir, data_dir, 0)
        _run_windowed_restart_phase(spark, data_dir, ckpt, out)
        _write_events_half(spark, sf_dir, data_dir, 1)
        _run_windowed_restart_phase(spark, data_dir, ckpt, out)
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    return spark.read.parquet(out)


def streaming_ann_index_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING ANN index maintenance with checkpoint-restart, graded
    exactly (VERDICT r13 #6) — the production ingest loop of a vector
    store: new vectors arrive as a stream and a ``foreachBatch``
    consumer encodes each micro-batch against the FROZEN IVFPQ
    centroids/codebooks (trained once on the EXISTING corpus slice —
    FAISS ``add`` after ``train``, the
    :func:`similarity.ann_index_add_batch` semantics) and appends the
    new (vec_id, cell, codes) index rows to the persisted assignments
    store. The drill spans TWO ``start()`` calls against ONE durable
    checkpoint with vectors arriving ACROSS the restart (the
    :func:`streaming_restart_windowed_totals` discipline): phase 1
    streams the even-vec_id half of the incoming slice and stops; the
    odd half then lands and phase 2 re-starts the same query, which
    must resume the file-source offset log (phase-1 files NOT
    re-encoded or re-appended) while the frozen codebooks guarantee
    the same codes either side of the restart.

    Exactly-once-downstream: each micro-batch overwrites its own
    ``bid=<batch_id>`` partition of the append store, so a batch
    replayed after a crash-between-write-and-commit lands
    idempotently — the partitioned-append twin of
    run_foreach_batch_parquet's snapshot overwrite. The hash gate is
    the ENTIRE point: re-read doubles phase-1 rows, a lost offset log
    re-encodes them, and only exactly-once resume over the frozen
    codebooks matches the batch add-batch replay over the full
    incoming slice — the SAME exact recursive-CTE train-replay oracle
    ann_index_add_batch carries (single source, imported verbatim).

    Scale shape: training sees only the ≤2048-row driver sample; each
    micro-batch is one zero-shuffle Arrow encode map (two GEMMs per
    batch); restart cost is offset-log metadata. At 100 TB this is a
    continuous ingestion pipeline appending code rows co-partitioned
    with the primary store on vec_id."""
    import glob
    import shutil

    from dbscan_spark.operators.similarity import (
        _PQ_M,
        _driver_sample,
        _embeddings_with_norms,
        _ivf_centroids,
        _ivfpq_residual_books,
        _nearest_cells_udf,
        _residual_encode_udf,
    )

    scratch = _scratch_dir("dbscan_spark_annstream_")
    data_dir = os.path.join(scratch, "in")
    ckpt = os.path.join(scratch, "ckpt")
    out = os.path.join(scratch, "out")
    os.makedirs(data_dir)
    os.makedirs(out)

    e = _embeddings_with_norms(spark, sf_dir)
    inc_pred = F.substring(
        F.md5(F.col("vec_id").cast("string")), 1, 1
    ).isin("e", "f")
    existing = e.filter(~inc_pred)
    _smp = _driver_sample(existing)
    cent = _ivf_centroids(existing, sample=_smp)
    books = _ivfpq_residual_books(existing, cent, sample=_smp)
    nearest1 = _nearest_cells_udf(cent, 1)
    encode_residual = _residual_encode_udf(cent, books)
    incoming = e.filter(inc_pred).select("vec_id", "v")

    def _arrive_half(parity: int) -> int:
        half = incoming.filter(
            F.pmod(F.col("vec_id"), F.lit(2)) == parity
        )
        tmp = data_dir + f".tmp{parity}"
        half.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(data_dir, f"half{parity}.parquet"))
        shutil.rmtree(tmp)
        return half.count()

    def _phase(n_expected: int) -> None:
        src = spark.readStream.schema(
            "vec_id long, v array<double>"
        ).parquet(data_dir)
        enc = src.select(
            "vec_id",
            F.element_at(nearest1(F.col("v")), 1).alias("cell"),
            "v",
        ).select(
            "vec_id",
            "cell",
            encode_residual(F.col("v"), F.col("cell")).alias("codes"),
        )

        def _write(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.select(
                "vec_id",
                F.col("cell").cast("long").alias("cell"),
                *[
                    F.element_at("codes", m + 1)
                    .cast("long")
                    .alias(f"c{m}")
                    for m in range(_PQ_M)
                ],
            ).write.mode("overwrite").parquet(
                os.path.join(out, f"bid={batch_id}")
            )

        q = (
            enc.writeStream.foreachBatch(_write)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            deadline = time.time() + 300
            got = None
            while time.time() < deadline:
                try:
                    got = spark.read.parquet(out).count()
                except Exception:
                    got = None  # store mid-overwrite or still empty
                if q.exception() is not None:
                    raise q.exception()  # fail fast with the root cause
                if got == n_expected:
                    break
                time.sleep(0.25)
            else:
                raise TimeoutError(
                    f"ANN ingest phase appended {got} of "
                    f"{n_expected} index rows in 300s"
                )
        finally:
            q.stop()
            q.awaitTermination()

    n0 = _arrive_half(0)
    _phase(n0)
    n1 = _arrive_half(1)
    _phase(n0 + n1)
    return spark.read.parquet(out).select(
        "vec_id", "cell", *[f"c{m}" for m in range(_PQ_M)]
    )


def streaming_ann_index_serve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING ANN SERVING — the third leg of the vector-store
    lifecycle triptych (build: ann_topk_ivfpq_persisted / ingest:
    :func:`streaming_ann_index_maintenance` / serve: this): QUERY
    vectors arrive as a stream and each micro-batch probes the
    PERSISTED IVFPQ index — the stream-static pattern where the
    static side is the index assignments + primary vector store —
    through the identical ADC-scoring + exact-re-rank op chain the
    batch probes run (:func:`similarity._ivfpq_probe_for`, factored
    for exactly this). The drill spans a checkpoint restart: the
    first half of the query set (even vec_id) is served, the query
    stops, the second half arrives, and the re-started query must
    resume offsets and serve only the new arrivals. Each batch's
    top-k lands idempotently in its own ``bid`` partition (the
    maintenance query's exactly-once-downstream discipline).

    Per-query top-k is batch-local by construction (a query's rows
    never span batches), so the union over batches equals the batch
    probe over all queries — the hash gate is
    ann_topk_ivfpq_persisted's EXACT recursive-CTE train-replay
    oracle, imported verbatim. Scale shape: the per-batch probe is
    the broadcast-query ADC plan of the batch path (query side is
    micro-batch-bounded); the index side stays a distributed scan,
    persisted across batches."""
    import glob
    import shutil

    from dbscan_spark.operators.similarity import (
        _embeddings_with_norms,
        _ivfpq_probe_for,
        N_QUERIES,
        ivfpq_index_dir,
        read_ivfpq_index,
    )

    scratch = _scratch_dir("dbscan_spark_annserve_")
    data_dir = os.path.join(scratch, "in")
    ckpt = os.path.join(scratch, "ckpt")
    out = os.path.join(scratch, "out")
    os.makedirs(data_dir)
    os.makedirs(out)

    path = ivfpq_index_dir(spark, sf_dir)
    cent, books, assigns = read_ivfpq_index(spark, path)
    e = _embeddings_with_norms(spark, sf_dir)
    # the static side of every micro-batch's stream-static probe:
    # index codes joined to the primary store, persisted across
    # batches (a serving deployment keeps this hot)
    corpus = (
        assigns.join(e, "vec_id")
        .select("vec_id", "v", "nv", "cell", "codes")
        .persist()
    )
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "v", "nv"
    )

    def _arrive_half(parity: int) -> int:
        half = queries.filter(
            F.pmod(F.col("vec_id"), F.lit(2)) == parity
        )
        tmp = data_dir + f".tmp{parity}"
        half.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(data_dir, f"half{parity}.parquet"))
        shutil.rmtree(tmp)
        return half.count()

    def _phase(n_expected: int) -> None:
        src = spark.readStream.schema(
            "vec_id long, v array<double>, nv double"
        ).parquet(data_dir)

        def _write(batch_df: DataFrame, batch_id: int) -> None:
            res = _ivfpq_probe_for(
                spark, batch_df, cent, books, corpus
            )
            res.write.mode("overwrite").parquet(
                os.path.join(out, f"bid={batch_id}")
            )

        q = (
            src.writeStream.foreachBatch(_write)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            deadline = time.time() + 300
            got = None
            while time.time() < deadline:
                try:
                    got = (
                        spark.read.parquet(out)
                        .select("query_id")
                        .distinct()
                        .count()
                    )
                except Exception:
                    got = None
                if q.exception() is not None:
                    raise q.exception()
                if got == n_expected:
                    break
                time.sleep(0.25)
            else:
                raise TimeoutError(
                    f"ANN serve phase answered {got} of "
                    f"{n_expected} queries in 300s"
                )
        finally:
            q.stop()
            q.awaitTermination()

    n0 = _arrive_half(0)
    _phase(n0)
    n1 = _arrive_half(1)
    _phase(n0 + n1)
    res = spark.read.parquet(out).select(
        "query_id", "neighbor_id", "cos_sim", "rnk"
    )
    corpus.unpersist()
    return res


def streaming_corpus_quality_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING corpus quality filtering with checkpoint-restart —
    the continuous-crawl deployment of the fastText-style classifier
    (CCNet scores each new CommonCrawl snapshot as it lands, Wenzek
    et al. 2020 §4.4): the classifier trains ONCE batch-side
    (:func:`text._qcls_train` — the frozen-model discipline of
    :func:`streaming_ann_index_maintenance`'s codebooks), then
    documents ARRIVE as a stream and each micro-batch is scored under
    the frozen weights. The drill spans a checkpoint restart with
    arrivals across it: the even-doc_id half streams, the query
    stops, the odd half lands, and the re-started query must resume
    the file-source offset log and score only the new arrivals. Each
    batch's scores land idempotently in their own ``bid`` partition
    (the exactly-once-downstream discipline shared by the ANN drills).

    Per-doc scoring is doc-local by construction (hashed-bigram
    features L1-normalize within the document; the margin joins only
    the broadcast frozen weight table), so the union over
    micro-batches equals the batch filter over the full corpus — the
    hash gate is text_quality_classifier_scores' EXACT GD-replay
    oracle, imported verbatim: a re-read doubles phase-1 docs, a lost
    offset log re-scores them, and only exactly-once resume under the
    frozen weights reproduces the batch scores.

    Scale shape: training cost is the batch query's (bounded weight
    vector driver-side); each micro-batch is one batch-bounded
    feature explode + a broadcast weight join + a doc-keyed
    aggregate — no streaming state at all, so restart cost is pure
    offset-log metadata."""
    import glob
    import shutil

    from dbscan_spark.functions import shingles, tokens
    from dbscan_spark.io import load_table
    from dbscan_spark.operators.text import (
        _DSIR_HEX_CHARS,
        _qcls_train,
    )

    scratch = _scratch_dir("dbscan_spark_qgate_")
    data_dir = os.path.join(scratch, "in")
    ckpt = os.path.join(scratch, "ckpt")
    out = os.path.join(scratch, "out")
    os.makedirs(data_dir)
    os.makedirs(out)

    fx, w, bias = _qcls_train(spark, sf_dir)
    fx.unpersist()
    wdf = spark.createDataFrame(
        [(b, wv) for b, wv in sorted(w.items())],
        "bucket long, wv double",
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
    )

    def _score(batch_df: DataFrame) -> DataFrame:
        # the scoring chain of text._qcls_scored, applied to one
        # micro-batch under the FROZEN weights; any drift from the
        # batch implementation is caught by the shared exact oracle
        d = (
            batch_df.filter(F.col("text").isNotNull())
            .select(
                "doc_id",
                F.col("lang").eqNullSafe(F.lit("en")).alias("y"),
                tokens(F.col("text")).alias("_toks"),
            )
        )
        feats = d.select(
            "doc_id",
            "y",
            F.explode(shingles(F.col("_toks"), 2)).alias("g"),
        ).select(
            "doc_id",
            "y",
            F.conv(
                F.substring(F.md5(F.col("g")), 1, _DSIR_HEX_CHARS),
                16,
                10,
            )
            .cast("long")
            .alias("bucket"),
        )
        qb = feats.groupBy("doc_id", "y", "bucket").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        nd = qb.groupBy("doc_id").agg(F.sum("cnt").alias("n_d"))
        fxb = qb.join(nd, "doc_id").select(
            "doc_id",
            "y",
            "bucket",
            (F.col("cnt") / F.col("n_d")).alias("x"),
            "n_d",
        )
        mq = F.floor(
            (F.lit(bias) + F.col("s")) * 10000 + F.lit(0.5)
        ) / 10000
        score = (
            F.floor(
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("mq"))))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        )
        return (
            fxb.join(F.broadcast(wdf), "bucket", "left")
            .groupBy("doc_id", "y")
            .agg(
                F.sum(
                    F.col("x") * F.coalesce(F.col("wv"), F.lit(0.0))
                ).alias("s"),
                F.max("n_d").alias("n_feats"),
            )
            .select(
                "doc_id",
                F.col("y").alias("is_target"),
                F.col("n_feats").cast("long").alias("n_feats"),
                mq.alias("mq"),
            )
            .select(
                "doc_id", "is_target", "n_feats", score.alias("score")
            )
        )

    def _arrive_half(parity: int) -> int:
        half = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(2)) == parity
        )
        tmp = data_dir + f".tmp{parity}"
        half.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(data_dir, f"half{parity}.parquet"))
        shutil.rmtree(tmp)
        # drain target: docs this half that carry >=1 bigram feature
        # (the <2-token drop rule of the batch scores query)
        return half.filter(
            F.col("text").isNotNull()
            & (F.size(shingles(tokens(F.col("text")), 2)) > 0)
        ).count()

    def _phase(n_expected: int) -> None:
        src = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).parquet(data_dir)

        def _write(batch_df: DataFrame, batch_id: int) -> None:
            _score(batch_df).write.mode("overwrite").parquet(
                os.path.join(out, f"bid={batch_id}")
            )

        q = (
            src.writeStream.foreachBatch(_write)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            deadline = time.time() + 300
            got = None
            while time.time() < deadline:
                try:
                    got = spark.read.parquet(out).count()
                except Exception:
                    got = None  # store mid-overwrite or still empty
                if q.exception() is not None:
                    raise q.exception()  # fail fast with the root cause
                if got == n_expected:
                    break
                time.sleep(0.25)
            else:
                raise TimeoutError(
                    f"quality gate scored {got} of "
                    f"{n_expected} docs in 300s"
                )
        finally:
            q.stop()
            q.awaitTermination()

    n0 = _arrive_half(0)
    _phase(n0)
    n1 = _arrive_half(1)
    _phase(n0 + n1)
    return spark.read.parquet(out).select(
        "doc_id", "is_target", "n_feats", "score"
    )


QUERIES = {
    "streaming_pysource_events": streaming_pysource_events,
    "streaming_ann_index_maintenance": streaming_ann_index_maintenance,
    "streaming_ann_index_serve": streaming_ann_index_serve,
    "streaming_corpus_quality_gate": streaming_corpus_quality_gate,
    "streaming_checkpoint_restart": streaming_checkpoint_restart,
    "streaming_restart_windowed_totals": streaming_restart_windowed_totals,
    "streaming_outer_join_clicks": streaming_outer_join_clicks,
    "streaming_full_outer_clicks": streaming_full_outer_clicks,
    "streaming_tumbling_totals": streaming_tumbling_totals,
    "streaming_session_totals": streaming_session_totals,
    "streaming_merge_latest_state": streaming_merge_latest_state,
    "streaming_dedup_pairs": streaming_dedup_pairs,
    "streaming_stateful_totals": streaming_stateful_totals,
    "streaming_enriched_totals": streaming_enriched_totals,
}

ORACLE = {
    # same range() regeneration as the batch connector's oracle
    # (relational.pysource_synthetic_events), same aggregate minus the
    # distinct (unsupported in a streaming agg)
    "streaming_pysource_events": """
        WITH g AS (SELECT unnest(range(0, 50000)) AS i),
        rows_ AS (
          SELECT i AS event_id,
                 (i * 2654435761) % 997 AS user_id,
                 (['view', 'click', 'purchase', 'signup', 'error'])[i % 5 + 1]
                   AS event_type,
                 ((i * 1103515245 + 12345) % 10000) / 100.0 AS value
          FROM g)
        SELECT event_type, count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100
                 AS total_value
        FROM rows_ GROUP BY event_type
    """,
    # checkpoint-restart: the FINAL snapshot must equal the full
    # 50,000-row regeneration — any offset re-read or state-restore
    # failure shifts every total (see the query docstring)
    "streaming_checkpoint_restart": """
        WITH g AS (SELECT unnest(range(0, 50000)) AS i),
        rows_ AS (
          SELECT i AS event_id,
                 (i * 2654435761) % 997 AS user_id,
                 (['view', 'click', 'purchase', 'signup', 'error'])[i % 5 + 1]
                   AS event_type,
                 ((i * 1103515245 + 12345) % 10000) / 100.0 AS value
          FROM g)
        SELECT event_type, count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100
                 AS total_value
        FROM rows_ GROUP BY event_type
    """,
    "streaming_dedup_pairs": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    # the batch FULL OUTER twin — both expiry directions; the sentinel
    # makes the streaming result the full set, no cutoff clause needed
    "streaming_full_outer_clicks": """
        WITH p AS (SELECT event_id AS purchase_id,
                          user_id AS p_user, ts AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user, event_id AS click_id,
                     ts AS c_ts
              FROM events WHERE event_type = 'click')
        SELECT p.purchase_id, p.p_user, p.p_ts,
               c.click_id, c.c_user, c.c_ts
        FROM p FULL JOIN c
          ON c.c_user = p.p_user
         AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
         AND c.c_ts < p.p_ts
    """,
    # the batch LEFT OUTER twin of the watermarked stream-stream join:
    # the sentinel makes the streaming result the FULL outer-expiry set,
    # so no watermark-cutoff clause is needed here
    "streaming_outer_join_clicks": """
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user, event_id AS click_id,
                     ts AS c_ts
              FROM events WHERE event_type = 'click')
        SELECT p.purchase_id, p.user_id, c.click_id, c.c_ts
        FROM p LEFT JOIN c
          ON c.c_user = p.user_id
         AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
         AND c.c_ts < p.p_ts
    """,
    "streaming_tumbling_totals": """
        SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000)
                 AS w_start,
               event_type,
               count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100
                 AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    # the restart drill's FINAL snapshot must equal the same full-table
    # tumbling aggregate — any file re-read doubles the even half, any
    # lost window state drops it
    "streaming_restart_windowed_totals": """
        SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000)
                 AS w_start,
               event_type,
               count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100
                 AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    # identical to the batch twin window_session_events' oracle: Spark
    # session windows are [start, last + gap), so a gap of exactly 30
    # minutes starts a NEW session (>= in the break rule)
    "streaming_session_totals": """
        WITH marked AS (
            SELECT user_id, epoch_us(ts) AS us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                >= 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), sess AS (
            SELECT user_id, us,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id, make_timestamp(min(us)) AS session_start,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
    # coalesce: a user whose every value is NULL totals 0.0 — the
    # engine's integer-cents state starts at 0 and SQL sum() would
    # yield NULL (defined cross-engine semantics, same class as the
    # zero-norm embedding rule)
    "streaming_stateful_totals": """
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0)
                 / 100 AS total_value
        FROM events
        GROUP BY user_id
    """,
    "streaming_enriched_totals": """
        SELECT c.c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n_events,
               coalesce(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)), 0)
                 / 100 AS total_value
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """,
    "streaming_merge_latest_state": """
        WITH latest AS (
          SELECT user_id, ts AS last_ts, value AS last_value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events),
        cnt AS (SELECT user_id, count(*) AS n_events
                FROM events GROUP BY user_id)
        SELECT user_id, last_ts, round(last_value, 2) AS last_value,
               n_events
        FROM latest JOIN cnt USING (user_id)
        WHERE rn = 1
    """,
}


# Same mechanical events-validity rewrite as the relational module tail
# (round-8 relational shape-fuzz): the streaming source applies
# io.EVENTS_INGEST_RULE after the file-stream read, so every oracle
# reads events through the identical rule.
from dbscan_spark.operators.relational import EVENTS_CLEAN_SQL as _EV

import re as _re  # noqa: E402

for _name, _sql in ORACLE.items():
    ORACLE[_name] = _re.sub(r"\b(FROM|JOIN) events\b", rf"\1 {_EV}", _sql)

# Single-source oracle reuse: the streaming ANN maintenance drill must
# reproduce EXACTLY the batch add-batch encoding over the full incoming
# slice — the drill's restart/idempotence properties are what the hash
# gate adjudicates, the values are the frozen-codebook encode the batch
# oracle already replays. Imported verbatim so the two cannot drift.
from dbscan_spark.operators.similarity import (  # noqa: E402
    ORACLE as _SIM_ORACLE,
)

ORACLE["streaming_ann_index_maintenance"] = _SIM_ORACLE[
    "ann_index_add_batch"
]
# serve drill == the persisted batch probe over all queries (per-query
# top-k is batch-local, so the union over micro-batches is the batch
# result) — same verbatim-import single-source rule as above
ORACLE["streaming_ann_index_serve"] = _SIM_ORACLE[
    "ann_topk_ivfpq_persisted"
]
# quality-gate drill == the batch classifier filter over the full
# corpus (per-doc scoring is doc-local under the frozen weights, so
# the union over micro-batches is the batch result) — same
# verbatim-import single-source rule as the ANN drills above
from dbscan_spark.operators.text import (  # noqa: E402
    ORACLE as _TEXT_ORACLE,
)

ORACLE["streaming_corpus_quality_gate"] = _TEXT_ORACLE[
    "text_quality_classifier_scores"
]
