"""Structured Streaming: streamed results must equal the batch queries on
the same data (availableNow trigger drains the file source completely)."""

from __future__ import annotations

import pytest

from dbscan_spark.operators import relational
from dbscan_spark.streaming import (
    events_stream_dir,
    read_events_stream,
    run_to_memory,
    streaming_session_counts,
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


def test_streaming_sessions_equal_batch(spark):
    stream = read_events_stream(spark, events_stream_dir(SF_TINY))
    run_to_memory(
        streaming_session_counts(stream), "t_sessions", output_mode="complete"
    )
    got = spark.sql("SELECT * FROM t_sessions").collect()
    want = relational.window_session_events(spark, SF_TINY).collect()
    cols = ["user_id", "session_start", "n_events"]
    assert rows_set(got, cols) == rows_set(want, cols)


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
