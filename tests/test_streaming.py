"""Structured Streaming: streamed results must equal the batch queries on
the same data (availableNow trigger drains the file source completely)."""

from __future__ import annotations

import pytest

from dbscan_spark.operators import relational
from dbscan_spark.streaming import (
    events_stream_dir,
    read_events_stream,
    run_to_memory,
    streaming_range_join_clicks_purchases,
    streaming_session_counts,
    streaming_sliding_counts,
    streaming_tumbling_counts,
    streaming_user_totals,
)
from tests.conftest import SF_TINY


def rows_set(rows, cols):
    return {tuple(r[c] for c in cols) for r in rows}


def test_streaming_tumbling_equals_batch(spark):
    stream = read_events_stream(spark, events_stream_dir(SF_TINY))
    run_to_memory(
        streaming_tumbling_counts(stream), "t_tumbling", output_mode="complete"
    )
    got = spark.sql("SELECT * FROM t_tumbling").collect()
    want = relational.window_tumbling_events(spark, SF_TINY).collect()
    cols = ["w_start", "event_type", "n_events", "total_value"]
    assert rows_set(got, cols) == rows_set(want, cols)
    assert len(got) == len(want)


def test_streaming_sliding_equals_batch(spark):
    stream = read_events_stream(spark, events_stream_dir(SF_TINY))
    run_to_memory(
        streaming_sliding_counts(stream), "t_sliding", output_mode="complete"
    )
    got = spark.sql("SELECT * FROM t_sliding").collect()
    want = relational.window_sliding_events(spark, SF_TINY).collect()
    cols = ["w_start", "n_events"]
    assert rows_set(got, cols) == rows_set(want, cols)
    assert len(got) == len(want)


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data contract: in append mode an event arriving after the
    watermark passed its window must NOT be counted, and only finalized
    windows (window.end <= watermark) are ever emitted.

    Three single-row-group files processed as three micro-batches
    (maxFilesPerTrigger=1): batch 1 seeds minutes 0, 2, 60 (watermark → 50
    afterwards); batch 2 (minute 90) finalizes and EVICTS the [0,10)
    window at n=2 (watermark → 80); batch 3 then delivers a LATE minute-1
    event — its window is gone, so the row must be dropped, not resurrect
    a second [0,10) output — plus minute 120 so [60,70) and [90,100)
    finalize under the last watermark (110). A row that is late but whose
    window is still live would instead be merged; that is watermark-
    correct too, which is why the eviction must happen a batch earlier."""
    import pandas as pd

    base_ns = 1_700_000_000 * 1_000_000_000

    def mk(path, rows):
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [base_ns + r[1] * 60 * 1_000_000_000 for r in rows],
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        ).to_parquet(path)

    import os

    mk(tmp_path / "f1.parquet", [(1, 0), (2, 2), (3, 60)])
    mk(tmp_path / "f2.parquet", [(5, 90)])
    mk(tmp_path / "f3.parquet", [(4, 1), (6, 120)])  # id 4 is LATE
    # the file source processes oldest-mtime first — pin the intended order
    for i, name in enumerate(("f1", "f2", "f3")):
        os.utime(tmp_path / f"{name}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = read_events_stream(spark, str(tmp_path), max_files_per_trigger=1)
    counts = streaming_tumbling_counts(stream, watermark="10 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    starts = sorted(
        r["w_start"] for r in spark.sql("SELECT * FROM t_late").collect()
    )
    # three finalized windows ([0,10) [60,70) [90,100)); the late
    # minute-1 event did NOT inflate the first window (2, not 3)
    assert len(starts) == 3
    assert all(s.minute % 10 == 0 for s in starts)
    n_by_order = [
        r["n_events"]
        for r in spark.sql(
            "SELECT * FROM t_late ORDER BY w_start"
        ).collect()
    ]
    assert n_by_order == [2, 1, 1]


def test_streaming_sessions_equal_batch(spark):
    stream = read_events_stream(spark, events_stream_dir(SF_TINY))
    run_to_memory(
        streaming_session_counts(stream), "t_sessions", output_mode="complete"
    )
    got = spark.sql("SELECT * FROM t_sessions").collect()
    want = relational.window_session_events(spark, SF_TINY).collect()
    cols = ["user_id", "session_start", "n_events"]
    assert rows_set(got, cols) == rows_set(want, cols)


def test_streaming_range_join_equals_batch(spark):
    """Stream-stream interval join (watermarked both sides, range in the
    join condition) must produce exactly the batch inner join's pairs."""
    from pyspark.sql import functions as F

    from dbscan_spark.io import load_table

    stream = read_events_stream(spark, events_stream_dir(SF_TINY))
    run_to_memory(
        streaming_range_join_clicks_purchases(stream),
        "t_range_join",
        output_mode="append",
    )
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM t_range_join").collect()
    }
    e = load_table(spark, SF_TINY, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("c_ts") < F.col("p_ts")),
        ).collect()
    }
    assert got == want
    assert want, "fixture produced no in-range pairs — widen the interval"


def test_session_state_accumulates_across_micro_batches(spark, tmp_path):
    """maxFilesPerTrigger=2 over six files → exactly 3 micro-batches; a
    session whose events arrive in DIFFERENT batches must still merge into
    one session window (incremental session state), and a later-batch event
    past the gap must open a new session instead."""
    import os

    import pandas as pd

    base_ns = 1_700_000_000 * 1_000_000_000

    def mk(path, rows):  # rows: (event_id, minute, user_id)
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [base_ns + r[1] * 60 * 1_000_000_000 for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        ).to_parquet(path)

    # user 1: minutes 0,3 | 8,12 | 20 — all within the 10-min gap chain →
    # ONE session of 5 events, assembled across all three batches.
    # user 2: minute 1 | (nothing) | 40 — gap exceeded → TWO sessions.
    mk(tmp_path / "f1.parquet", [(1, 0, 1), (2, 3, 1)])
    mk(tmp_path / "f2.parquet", [(3, 1, 2)])
    mk(tmp_path / "f3.parquet", [(4, 8, 1)])
    mk(tmp_path / "f4.parquet", [(5, 12, 1)])
    mk(tmp_path / "f5.parquet", [(6, 20, 1)])
    mk(tmp_path / "f6.parquet", [(7, 40, 2)])
    for i in range(1, 7):
        os.utime(
            tmp_path / f"f{i}.parquet",
            (1_700_000_000 + i, 1_700_000_000 + i),
        )

    stream = read_events_stream(spark, str(tmp_path), max_files_per_trigger=2)
    q = (
        streaming_session_counts(stream, gap="10 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("t_multi_batch_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [
        p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0
    ]
    assert len(batches) == 3, f"expected 3 data micro-batches, got {batches}"

    base = pd.Timestamp(1_700_000_000, unit="s")
    got = {
        (r["user_id"], int((r["session_start"] - base).total_seconds()) // 60):
            r["n_events"]
        for r in spark.sql("SELECT * FROM t_multi_batch_sessions").collect()
    }
    assert got == {(1, 0): 5, (2, 1): 1, (2, 40): 1}, got


def test_streaming_stateful_user_totals(spark):
    from pyspark.sql import functions as F

    from dbscan_spark.io import load_table

    stream = read_events_stream(spark, events_stream_dir(SF_TINY))
    run_to_memory(
        streaming_user_totals(stream), "t_totals", output_mode="update"
    )
    # update mode: take the LAST emitted row per user (cumulative totals)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_totals").collect()
    }
    want = {
        r["user_id"]: (r["n"], r["total"])
        for r in load_table(spark, SF_TINY, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        assert got[uid][0] == n
        assert got[uid][1] == pytest.approx(total, abs=0.05)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Ingestion dedup: a re-delivered event_id within the watermark delay
    is dropped; once the watermark passes (state evicted), the same id is
    admitted again — proving state is watermark-bounded, not forever."""
    import os

    import pandas as pd

    from dbscan_spark.streaming.events import streaming_dedup_events

    base_ns = 1_700_000_000 * 1_000_000_000

    def mk(path, rows):  # rows: (event_id, minute)
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [base_ns + r[1] * 60 * 1_000_000_000 for r in rows],
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        ).to_parquet(path)

    # batch 1: ids 1, 2; batch 2: id 1 again 2 min later (dup → dropped).
    # batch 3 (id 4 @ min 60) advances the watermark to min 50, which takes
    # effect in batch 4 — batch 4's end-of-batch eviction then drops the
    # state for ids 1-3. batch 5: id 2 again → re-admitted (state gone).
    mk(tmp_path / "f1.parquet", [(1, 0), (2, 1)])
    mk(tmp_path / "f2.parquet", [(1, 2), (3, 5)])
    mk(tmp_path / "f3.parquet", [(4, 60)])
    mk(tmp_path / "f4.parquet", [(5, 61)])
    mk(tmp_path / "f5.parquet", [(2, 62)])
    for i in range(1, 6):
        os.utime(
            tmp_path / f"f{i}.parquet",
            (1_700_000_000 + i, 1_700_000_000 + i),
        )

    stream = read_events_stream(spark, str(tmp_path), max_files_per_trigger=1)
    q = (
        streaming_dedup_events(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("t_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], int(r["ts"].timestamp() - 1_700_000_000) // 60)
        for r in spark.sql("SELECT event_id, ts FROM t_stream_dedup").collect()
    }
    assert got == {(1, 0), (2, 1), (3, 5), (4, 60), (5, 61), (2, 62)}, got


def test_foreach_batch_sink_delivers_and_replays_idempotently(
    spark, tmp_path
):
    """foreachBatch parquet sink: four source files at maxFilesPerTrigger=2
    → 2 micro-batches, each in its own batch_id=N dir; the union of all
    batch dirs equals the source exactly, and re-writing a batch (the
    failure-replay case) overwrites its own output instead of duplicating
    rows."""
    import os

    import pandas as pd

    from dbscan_spark.streaming import run_foreach_batch_parquet

    base_ns = 1_700_000_000 * 1_000_000_000

    def mk(path, ids):
        pd.DataFrame(
            {
                "event_id": ids,
                "ts": [base_ns + i * 60_000_000_000 for i in ids],
                "user_id": [1] * len(ids),
                "event_type": ["click"] * len(ids),
                "value": [1.0] * len(ids),
                "props": ["{}"] * len(ids),
            }
        ).to_parquet(path)

    src = tmp_path / "src"
    out = tmp_path / "out"
    os.makedirs(src)
    for i, ids in enumerate([[1, 2], [3], [4, 5], [6]]):
        mk(src / f"f{i}.parquet", ids)
        os.utime(src / f"f{i}.parquet", (1_700_000_000 + i,) * 2)

    stream = read_events_stream(spark, str(src), max_files_per_trigger=2)
    q = run_foreach_batch_parquet(
        stream, str(out), checkpoint_dir=str(tmp_path / "ckpt")
    )
    data_batches = [
        p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0
    ]
    assert len(data_batches) == 2, data_batches
    batch_dirs = sorted(d for d in os.listdir(out) if d.startswith("batch_id="))
    assert len(batch_dirs) == 2, batch_dirs

    got = spark.read.parquet(str(out))
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 3, 4, 5, 6]

    # replay: re-write batch 0's own rows into its own dir — the overwrite
    # must leave the union unchanged (idempotent), not append duplicates
    b0 = os.path.join(str(out), batch_dirs[0])
    replay = spark.read.parquet(b0)
    replay.cache().count()  # materialize before overwriting the source dir
    replay.write.mode("overwrite").parquet(b0)
    replay.unpersist()
    again = spark.read.parquet(str(out)).select("event_id")
    assert sorted(r["event_id"] for r in again.collect()) == [1, 2, 3, 4, 5, 6]

    # restart against the SAME durable checkpoint: a newly arrived file
    # continues the batch numbering (no renumbering-from-0 over the full
    # file set, which would corrupt the existing batch_id dirs)
    mk(src / "f4.parquet", [7])
    os.utime(src / "f4.parquet", (1_700_000_010,) * 2)
    stream2 = read_events_stream(spark, str(src), max_files_per_trigger=2)
    run_foreach_batch_parquet(
        stream2, str(out), checkpoint_dir=str(tmp_path / "ckpt")
    )
    dirs2 = sorted(d for d in os.listdir(out) if d.startswith("batch_id="))
    assert len(dirs2) == 3 and dirs2[:2] == batch_dirs, dirs2
    final = spark.read.parquet(str(out)).select("event_id")
    assert sorted(r["event_id"] for r in final.collect()) == list(range(1, 8))


def test_streaming_merge_sink_maintains_latest_state(spark, tmp_path):
    """Streaming CDC apply: three single-file micro-batches upsert a
    latest-value-per-user table as versioned snapshots; the final version
    must equal the batch-computed latest state over ALL events, and
    replaying the last batch must rebuild an identical snapshot
    (idempotent under at-least-once delivery)."""
    import os

    import pandas as pd

    from dbscan_spark.streaming.events import (
        merge_latest_state,
        run_streaming_merge_sink,
    )

    base_ns = 1_700_000_000 * 1_000_000_000

    def mk(path, rows):  # rows: (event_id, minute, user, value)
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [base_ns + r[1] * 60_000_000_000 for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": ["click"] * len(rows),
                "value": [float(r[3]) for r in rows],
                "props": ["{}"] * len(rows),
            }
        ).to_parquet(path)

    src = tmp_path / "src"
    tgt = tmp_path / "tgt"
    os.makedirs(src)
    batches = [
        [(1, 0, 10, 1.0), (2, 1, 20, 2.0)],          # seed two users
        [(3, 2, 10, 3.0), (4, 3, 30, 4.0)],          # update 10, insert 30
        [(5, 4, 20, 5.0), (6, 5, 20, 6.0), (7, 3, 10, 7.0)],
        # batch 3: two updates for 20 (latest wins), LATE event for 10
        # (minute 3 > stored minute 2 → becomes the latest)
    ]
    for i, rows in enumerate(batches):
        mk(src / f"f{i}.parquet", rows)
        os.utime(src / f"f{i}.parquet", (1_700_000_000 + i,) * 2)

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    run_streaming_merge_sink(
        stream, str(tgt), checkpoint_dir=str(tmp_path / "ckpt")
    )

    versions = sorted(os.listdir(tgt))
    assert versions == ["v=0", "v=1", "v=2"], versions
    final = {
        r["user_id"]: (r["last_value"], r["n_events"])
        for r in spark.read.parquet(str(tgt / "v=2")).collect()
    }
    assert final == {10: (7.0, 3), 20: (6.0, 3), 30: (4.0, 1)}, final

    # replay batch 2: rebuild v=2 from the untouched v=1 + batch file —
    # byte-identical state, no double counting (batch read of the same
    # file slice the micro-batch saw, with the stream's ts conversion)
    from pyspark.sql import functions as F

    batch2 = (
        spark.read.parquet(str(src / "f2.parquet"))
        .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    )
    prev = spark.read.parquet(str(tgt / "v=1"))
    rebuilt = {
        r["user_id"]: (r["last_value"], r["n_events"])
        for r in merge_latest_state(prev, batch2).collect()
    }
    assert rebuilt == final


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_streaming_stateful_cents_twin_matches_batch(spark):
    """The graded integer-cents applyInPandasWithState twin must equal
    the batch cents aggregation exactly (order-independent by
    construction — the fold carries integers)."""
    from pyspark.sql import functions as F

    from dbscan_spark.io import load_events
    from dbscan_spark.streaming.events import streaming_user_totals_cents

    stream = read_events_stream(spark, events_stream_dir(SF_TINY))
    run_to_memory(
        streaming_user_totals_cents(stream),
        "t_totals_cents",
        output_mode="update",
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_totals_cents").collect()
    }
    want = {
        r["user_id"]: (r["n"], r["total"])
        for r in load_events(spark, SF_TINY)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.coalesce(
                    F.sum(
                        F.floor(F.col("value") * 100 + F.lit(0.5)).cast(
                            "long"
                        )
                    ),
                    F.lit(0),
                )
                / 100
            ).alias("total"),
        )
        .collect()
    }
    assert got == want


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python worker needs the protobuf package",
)
def test_streaming_stateful_cents_twins_identical(spark):
    """Both stateful APIs share _fold_cents, so the TWS twin must emit
    row-for-row what the applyInPandasWithState twin emits — this is
    what lets the graded query fall back without changing its answer."""
    from dbscan_spark.streaming.events import (
        streaming_user_totals_cents,
        streaming_user_totals_cents_tws,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    try:
        rows = {}
        for tag, fn in (
            ("apply", streaming_user_totals_cents),
            ("tws", streaming_user_totals_cents_tws),
        ):
            stream = read_events_stream(spark, events_stream_dir(SF_TINY))
            run_to_memory(fn(stream), f"t_cents_{tag}", output_mode="update")
            rows[tag] = sorted(
                (r["user_id"], r["n_events"], r["total_value"])
                for r in spark.sql(f"SELECT * FROM t_cents_{tag}").collect()
            )
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert rows["apply"] == rows["tws"]


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python worker needs the protobuf package",
)
def test_streaming_stateful_user_totals_tws(spark):
    """transformWithStateInPandas twin: the StatefulProcessor must land on
    the same cumulative per-user totals as the batch aggregation (same
    oracle as the applyInPandasWithState version)."""
    from pyspark.sql import functions as F

    from dbscan_spark.io import load_table
    from dbscan_spark.streaming.events import streaming_user_totals_tws

    stream = read_events_stream(spark, events_stream_dir(SF_TINY))
    run_to_memory(
        streaming_user_totals_tws(stream), "t_totals_tws", output_mode="update"
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_totals_tws").collect()
    }
    want = {
        r["user_id"]: (r["n"], r["total"])
        for r in load_table(spark, SF_TINY, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert got == want


def test_pysource_stream_reader_offset_protocol():
    """The synthetic_events simpleStreamReader's offset log: batches
    advance by batch_rows up to n_rows, replay via readBetweenOffsets
    regenerates committed ranges bit-identically (= the batch _row
    stream), and exhaustion returns an empty batch with an UNCHANGED
    offset — the stop condition a drain loop relies on."""
    from dbscan_spark.datasource import _row, _SyntheticEventsStreamReader

    r = _SyntheticEventsStreamReader({"n_rows": "10", "batch_rows": "4"})
    off = r.initialOffset()
    assert off == {"next_row": 0}
    seen, offsets = [], [off]
    for _ in range(3):
        rows, off = r.read(off)
        seen.append(list(rows))
        offsets.append(off)
    assert [len(b) for b in seen] == [4, 4, 2]
    assert [o["next_row"] for o in offsets] == [0, 4, 8, 10]
    assert [row for b in seen for row in b] == [_row(i) for i in range(10)]
    # exhausted: empty batch, offset does not advance
    rows, off2 = r.read(off)
    assert list(rows) == [] and off2 == off
    # committed-range replay parity
    assert list(r.readBetweenOffsets(offsets[1], offsets[2])) == seen[1]


def test_checkpoint_restart_resumes_offsets_and_state(spark):
    """The checkpoint-restart discipline (streaming_checkpoint_restart),
    pinned phase by phase with explicit dirs: phase 1 (2 micro-batches,
    32,768 rows) stops with a PARTIAL snapshot whose totals equal the
    first 32,768 generated rows exactly; phase 2 re-starts on the SAME
    checkpoint and must (a) resume offsets — the offset log's batch ids
    CONTINUE instead of restarting at 0 — and (b) restore the
    complete-mode aggregation state from RocksDB, so the final snapshot
    equals the full 50,000-row batch totals (re-reading would overshoot,
    fresh state would undershoot; either diverges)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from dbscan_spark.datasource import _row
    from dbscan_spark.operators.streaming_queries import (
        _PYSRC_ROWS,
        _RESTART_PHASE1_ROWS,
        _ROCKSDB_PROVIDER,
        _run_restart_phase,
    )

    scratch = tempfile.mkdtemp(prefix="dbscan_spark_restart_test_")
    ckpt = os.path.join(scratch, "ckpt")
    out = os.path.join(scratch, "out")

    def want_totals(n: int) -> dict:
        agg: dict = {}
        for i in range(n):
            r = _row(i)
            cnt, cents = agg.get(r[2], (0, 0))
            agg[r[2]] = (cnt + 1, cents + int(r[3] * 100 + 0.5))
        return {k: (c, cents / 100) for k, (c, cents) in agg.items()}

    def got_totals() -> dict:
        return {
            r["event_type"]: (r["n_events"], r["total_value"])
            for r in spark.read.parquet(out).collect()
        }

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
    )
    try:
        _run_restart_phase(spark, ckpt, out, _RESTART_PHASE1_ROWS)
        assert got_totals() == want_totals(_RESTART_PHASE1_ROWS)
        batches_p1 = set(os.listdir(os.path.join(ckpt, "commits")))
        _run_restart_phase(spark, ckpt, out, _PYSRC_ROWS)
        assert got_totals() == want_totals(_PYSRC_ROWS)
        batches_p2 = set(os.listdir(os.path.join(ckpt, "commits")))
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    # offsets resumed: phase 2 APPENDED commit entries (batch ids
    # continue past phase 1's), it did not restart numbering at 0
    assert batches_p1 and batches_p1 < batches_p2


def test_streaming_outer_join_watermark_expiry(spark):
    """LEFT OUTER stream-stream join: the streaming result (with the
    far-future watermark sentinel flushing all real state) must equal
    the batch LEFT OUTER twin as a multiset, and the fixture must
    genuinely exercise BOTH row classes — matched pairs (join products)
    and NULL-click rows (watermark-expiry products)."""
    from collections import Counter

    from dbscan_spark.io import load_events
    from dbscan_spark.operators.streaming_queries import (
        streaming_outer_join_clicks,
    )
    from dbscan_spark.streaming import events as se
    from pyspark.sql import functions as F

    got = streaming_outer_join_clicks(spark, SF_TINY).collect()
    batch = load_events(spark, SF_TINY).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = se.streaming_left_outer_clicks(batch).collect()
    key = lambda r: (  # noqa: E731
        r["purchase_id"],
        r["user_id"],
        r["click_id"],
        r["c_ts"],
    )
    assert Counter(map(key, got)) == Counter(map(key, want))
    unmatched = [r for r in got if r["click_id"] is None]
    matched = [r for r in got if r["click_id"] is not None]
    assert unmatched, "no watermark-expiry rows — fixture degenerate"
    assert matched, "no matched pairs — fixture degenerate"
    # the sentinel never surfaces
    assert all(
        r["purchase_id"] != se.SENTINEL_PURCHASE_ID for r in got
    )


def test_streaming_full_outer_join_both_expiry_directions(spark):
    """FULL OUTER stream-stream join: multiset-equal to the batch full
    outer twin, with all three row classes present — matched pairs,
    NULL-click purchases (click-watermark expiry) and NULL-purchase
    clicks (purchase-watermark expiry) — and no sentinel leakage."""
    from collections import Counter

    from dbscan_spark.io import load_events
    from dbscan_spark.operators.streaming_queries import (
        streaming_full_outer_clicks,
    )
    from dbscan_spark.streaming import events as se
    from pyspark.sql import functions as F

    got = streaming_full_outer_clicks(spark, SF_TINY).collect()
    batch = load_events(spark, SF_TINY).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = se.streaming_full_outer_clicks(batch).collect()
    key = lambda r: (  # noqa: E731
        r["purchase_id"],
        r["p_user"],
        r["p_ts"],
        r["click_id"],
        r["c_user"],
        r["c_ts"],
    )
    assert Counter(map(key, got)) == Counter(map(key, want))
    null_click = [r for r in got if r["click_id"] is None]
    null_purchase = [r for r in got if r["purchase_id"] is None]
    matched = [
        r
        for r in got
        if r["click_id"] is not None and r["purchase_id"] is not None
    ]
    assert null_click, "no click-watermark expiry rows"
    assert null_purchase, "no purchase-watermark expiry rows"
    assert matched, "no matched pairs"
    assert all(
        r["purchase_id"] != se.SENTINEL_PURCHASE_ID
        and r["click_id"] != se.SENTINEL_PURCHASE_ID - 1
        for r in got
    )


def test_streaming_ann_maintenance_matches_batch_add(spark):
    """streaming_ann_index_maintenance == ann_index_add_batch row-for-
    row (the Spark-vs-Spark twin of the shared DuckDB oracle): the
    two-phase restart ingest — half the incoming vectors before the
    stop, half after, one durable checkpoint — must append exactly the
    batch operator's frozen-codebook encodings for the FULL incoming
    slice: no phase-1 row re-encoded after the restart (no dupes), none
    lost, codes identical either side of the restart. Also pins that
    both halves are non-empty so the restart genuinely splits the
    ingest."""
    from pyspark.sql import functions as F

    from dbscan_spark.operators.similarity import ann_index_add_batch
    from dbscan_spark.operators.streaming_queries import (
        streaming_ann_index_maintenance,
    )

    got = streaming_ann_index_maintenance(spark, SF_TINY).collect()
    want = ann_index_add_batch(spark, SF_TINY).collect()
    key = lambda r: tuple(r[c] for c in want[0].asDict())  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == len({r["vec_id"] for r in got})  # no dupes
    parities = {r["vec_id"] % 2 for r in got}
    assert parities == {0, 1}, "restart did not split the ingest"


def test_streaming_ann_serve_matches_batch_probe(spark):
    """streaming_ann_index_serve == ann_topk_ivfpq_persisted row-for-
    row (the Spark-vs-Spark twin of the shared oracle): serving the
    query set in two micro-batch halves across a checkpoint restart
    must produce exactly the batch probe's per-query top-k — same
    neighbors, same 4dp cosines, same ranks; both query parities
    present so the restart genuinely splits the serving."""
    from dbscan_spark.operators.similarity import ann_topk_ivfpq_persisted
    from dbscan_spark.operators.streaming_queries import (
        streaming_ann_index_serve,
    )

    got = streaming_ann_index_serve(spark, SF_TINY).collect()
    want = ann_topk_ivfpq_persisted(spark, SF_TINY).collect()
    key = lambda r: (  # noqa: E731
        r["query_id"], r["neighbor_id"], r["cos_sim"], r["rnk"]
    )
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert {r["query_id"] % 2 for r in got} == {0, 1}


def test_streaming_quality_gate_matches_batch_scores(spark):
    """streaming_corpus_quality_gate == text_quality_classifier_scores
    row-for-row (the Spark-vs-Spark twin of the shared GD-replay
    oracle): scoring the corpus in two micro-batch halves across a
    checkpoint restart under the FROZEN weights must produce exactly
    the batch filter's per-doc scores — no phase-1 doc re-scored after
    the restart (no dupes), none lost; both doc parities present so
    the restart genuinely splits the stream."""
    from dbscan_spark.operators.streaming_queries import (
        streaming_corpus_quality_gate,
    )
    from dbscan_spark.operators.text import text_quality_classifier_scores

    got = streaming_corpus_quality_gate(spark, SF_TINY).collect()
    want = text_quality_classifier_scores(spark, SF_TINY).collect()
    key = lambda r: (  # noqa: E731
        r["doc_id"], r["is_target"], r["n_feats"], r["score"]
    )
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == len({r["doc_id"] for r in got})  # no dupes
    assert {r["doc_id"] % 2 for r in got} == {0, 1}
