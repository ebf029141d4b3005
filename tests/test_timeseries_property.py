"""Independent-oracle property checks for the time-series operators:
the DuckDB oracles share SQL semantics with the queries, so these pin the
results against a THIRD implementation (pandas) and against structural
invariants the SQL comparison can't express."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from dbscan_spark.io import load_table
from dbscan_spark.operators import relational
from tests.conftest import SF_TINY


def _events_pdf(spark) -> pd.DataFrame:
    return (
        load_table(spark, SF_TINY, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )


def test_ewma_matches_pandas_ewm(spark):
    """events_ewma_user_value's aggregate-HOF fold must equal pandas'
    ewm(alpha=0.25, adjust=False).mean() last value — the standard
    recursive EWMA definition, implemented by an unrelated engine."""
    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in relational.events_ewma_user_value(spark, SF_TINY).collect()
    }
    pdf = _events_pdf(spark)
    import math

    for user_id, grp in pdf.groupby("user_id"):
        want = grp["value"].ewm(alpha=0.25, adjust=False).mean().iloc[-1]
        n, ewma = got[user_id]
        assert n == len(grp)
        assert math.isclose(
            ewma, math.floor(want * 10000 + 0.5) / 10000, abs_tol=1e-4
        ), (user_id, ewma, want)


def test_scd2_intervals_reconstruct_state(spark):
    """SCD2 output invariants: per user the intervals tile time with no
    gaps/overlaps (each valid_to equals the next valid_from), exactly
    one open (is_current) interval, run event counts sum to the user's
    event count, and the state at every event timestamp equals that
    event's type as reconstructed from raw events with pandas."""
    rows = relational.events_scd2_user_state(spark, SF_TINY).collect()
    pdf = _events_pdf(spark)
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(pdf["user_id"].unique())
    for user_id, ivals in by_user.items():
        ivals.sort(key=lambda r: r["run_id"])
        grp = pdf[pdf["user_id"] == user_id]
        assert sum(r["n_events"] for r in ivals) == len(grp)
        assert [r["run_id"] for r in ivals] == list(range(1, len(ivals) + 1))
        assert sum(r["is_current"] for r in ivals) == 1
        assert ivals[-1]["is_current"]
        for a, b in zip(ivals, ivals[1:]):
            assert a["valid_to"] == b["valid_from"], (user_id, a, b)
            assert a["state"] != b["state"], "adjacent runs must differ"
        # point-in-time reconstruction: at each event's ts, the covering
        # interval's state is the latest event_type at-or-before ts
        for _, ev in grp.iterrows():
            covering = [
                r
                for r in ivals
                if r["valid_from"] <= ev["ts"]
                and (r["valid_to"] is None or ev["ts"] < r["valid_to"])
            ]
            assert len(covering) == 1, (user_id, ev["ts"])
            latest = grp[grp["ts"] <= ev["ts"]].iloc[-1]["event_type"]
            assert covering[0]["state"] == latest
