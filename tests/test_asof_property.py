"""Property-based check of the generalized as-of join: on random small
inputs the distributed union+window composition must equal a brute-force
per-row scan (the quadratic definition of backward as-of semantics)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dbscan_spark.operators.relational import asof_backward_join

_row = st.tuples(
    st.integers(min_value=1, max_value=3),   # key
    st.integers(min_value=0, max_value=20),  # ts
    st.integers(min_value=0, max_value=9),   # value
)


def brute_force(left_rows, right_rows):
    """ts-inclusive backward match; ties on right ts resolved to the
    largest value — the operator's documented tie rule."""
    out = []
    for lk, lt, lv in left_rows:
        cands = [(rt, rv) for rk, rt, rv in right_rows if rk == lk and rt <= lt]
        best = max(cands) if cands else (None, None)
        out.append((lk, lt, lv, best[0], best[1]))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(_row, min_size=1, max_size=12),
    right=st.lists(_row, min_size=0, max_size=12),
)
def test_asof_equals_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(left)],
        "k long, t long, v long, rowid long",
    )
    rdf = spark.createDataFrame(
        right or [(None, None, None)],
        "k long, t long, v long",
    ).filter("k is not null")
    got_rows = asof_backward_join(
        ldf, rdf, key="k", left_ts="t", right_ts="t", value_col="v"
    ).collect()
    got = sorted(
        (r["k"], r["t"], r["v"], r["asof_ts"], r["asof_v"]) for r in got_rows
    )
    assert got == brute_force(left, right)


_ev = st.tuples(
    st.integers(min_value=1, max_value=2),    # user
    st.integers(min_value=0, max_value=200),  # minute
)


@settings(max_examples=10, deadline=None)
@given(events=st.lists(_ev, min_size=1, max_size=15, unique=True))
def test_sessionize_equals_naive(spark, events):
    """Gap-sessionization (lag + running sum) must equal the obvious
    sequential scan: sort each user's minutes, break where the gap
    exceeds 30, count events per session."""
    import datetime

    from dbscan_spark.operators.relational import events_sessionize_lag

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=m),
            u,
            "click",
            1.0,
            "{}",
        )
        for i, (u, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            (r["user_id"], r["session_no"]): r["n_events"]
            for r in events_sessionize_lag(spark, td).collect()
        }

    from collections import defaultdict

    want = {}
    by_user = defaultdict(list)
    for u, m in events:
        by_user[u].append(m)
    for u, ms in by_user.items():
        ms.sort()
        sess, n = 0, 0
        for i, m in enumerate(ms):
            if i > 0 and m - ms[i - 1] > 30:
                want[(u, sess)] = n
                sess, n = sess + 1, 0
            n += 1
        want[(u, sess)] = n
    assert got == want


_hour_ev = st.tuples(
    st.integers(min_value=0, max_value=1),   # type index
    st.integers(min_value=0, max_value=48),  # hour offset
    st.integers(min_value=1, max_value=9),   # value
)


@settings(max_examples=8, deadline=None)
@given(events=st.lists(_hour_ev, min_size=1, max_size=20))
def test_gapfill_locf_equals_pandas_ffill(spark, events):
    """LOCF gap filling must equal pandas' groupby-ffill over the same
    dense hourly spine (zeros before the first observation)."""
    import datetime
    import os
    import tempfile

    import pandas as pd

    from dbscan_spark.operators.relational import events_gapfill_locf

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(hours=h, minutes=7),
            1,
            ["click", "view"][t],
            float(v),
            "{}",
        )
        for i, (t, h, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            (r["event_type"], r["hour"]): r["sum_value_locf"]
            for r in events_gapfill_locf(spark, td).collect()
        }

    # pandas oracle: dense spine over [min hour, max hour] per observed
    # type, hourly sums ffilled, leading gaps zero
    pdf = pd.DataFrame(
        [(t, h, v) for (t, h, v) in events], columns=["t", "h", "v"]
    )
    h_lo, h_hi = pdf["h"].min(), pdf["h"].max()
    want = {}
    for t in sorted(pdf["t"].unique()):
        tname = ["click", "view"][t]
        sums = pdf[pdf["t"] == t].groupby("h")["v"].sum()
        last = 0.0
        for h in range(h_lo, h_hi + 1):
            if h in sums.index:
                last = float(sums[h])
            hour = (base + datetime.timedelta(hours=h)).strftime(
                "%Y-%m-%d %H:00"
            )
            want[(tname, hour)] = last
    assert got == want


_fev = st.tuples(
    st.integers(min_value=1, max_value=3),    # user
    st.integers(min_value=0, max_value=50),   # minute (unique per list)
    st.sampled_from(["view", "click", "purchase"]),
)


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        _fev, min_size=1, max_size=18, unique_by=lambda t: (t[0], t[1])
    )
)
def test_funnel_equals_brute_force(spark, events):
    """Ordered-funnel staging must equal the sequential definition: first
    view, first click strictly after it, first purchase strictly after
    that — per user, counted per reached stage."""
    import datetime
    import os
    import tempfile
    from collections import Counter, defaultdict

    from dbscan_spark.operators.relational import events_funnel

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=m),
            u,
            t,
            1.0,
            "{}",
        )
        for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r["stage"]: r["n_users"]
            for r in events_funnel(spark, td).collect()
        }

    by_user = defaultdict(list)
    for u, m, t in events:
        by_user[u].append((m, t))
    stages = Counter()
    for u, evs in by_user.items():
        evs.sort()
        v = next((m for m, t in evs if t == "view"), None)
        if v is None:
            continue
        c = next((m for m, t in evs if t == "click" and m > v), None)
        p = (
            next((m for m, t in evs if t == "purchase" and m > c), None)
            if c is not None
            else None
        )
        stages[1 + (c is not None) + (p is not None)] += 1
    assert got == dict(stages)
