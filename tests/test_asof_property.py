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
