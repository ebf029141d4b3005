"""Exact-integer money arithmetic: the e4-unit accumulation and the
pure-IEEE floor-half-up rounding idiom (relational._revenue_e4 /
_e4_to_dollars) must reproduce exact-decimal ground truth on arbitrary
2-decimal prices and whole-percent discounts, independent of summation
order — the property the sf1.0 sweep found violated by float64 sums
(BASELINE.md §5b)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st

prices = st.decimals(
    min_value=Decimal("0.01"),
    max_value=Decimal("999999.99"),
    places=2,
)
discounts = st.integers(min_value=0, max_value=10)  # whole percents


def _decimal_revenue(rows) -> Decimal:
    """Ground truth: exact decimal sum of price * (1 - pct/100)."""
    return sum(
        (p * (100 - d) / Decimal(100) for p, d in rows), Decimal(0)
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(prices, discounts), min_size=1, max_size=60))
def test_e4_accumulation_matches_decimal_ground_truth(rows):
    """Summed e4 integers == the exact decimal revenue scaled by 1e4,
    and the floor-half-up cents conversion == decimal HALF_UP — in any
    row order (integers commute; this is the whole point)."""
    e4 = sum(
        int((p * 100).to_integral_value()) * (100 - d) for p, d in rows
    )
    truth = _decimal_revenue(rows)
    assert Decimal(e4) == truth * 10000
    want_cents = (truth * 100).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    got_cents = (e4 + 50) // 100
    assert Decimal(got_cents) == want_cents
    rev = list(reversed(rows))
    assert (
        sum(int((p * 100).to_integral_value()) * (100 - d) for p, d in rev)
        == e4
    )


def test_e4_spark_expressions_match_python(spark):
    """The Spark _revenue_e4/_e4_to_dollars column expressions agree
    with the integer ground truth on a seeded random lineitem slice —
    and with DuckDB's restatement of the same SQL, including rows whose
    e4 total lands exactly on a half-cent (the case float sums get
    wrong)."""
    import duckdb
    import numpy as np

    from dbscan_spark.operators.relational import (
        _e4_to_dollars,
        _revenue_e4,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(6)
    rows = [
        (
            int(i % 7),
            round(float(rng.uniform(0.01, 99999.99)), 2),
            round(float(rng.integers(0, 11)) / 100, 2),
        )
        for i in range(4000)
    ]
    # force half-cent e4 totals into one group: 0.125 * (100-50=non...)
    # 12.35 * (1 - 0.05) = 11.7325 -> e4 117325 -> cents boundary .xx5
    rows += [(99, 12.35, 0.05), (99, 100.00, 0.00)]
    df = spark.createDataFrame(
        rows, "g int, l_extendedprice double, l_discount double"
    )
    got = {
        r["g"]: r["rev"]
        for r in df.groupBy("g")
        .agg(_e4_to_dollars(F.sum(_revenue_e4())).alias("rev"))
        .collect()
    }
    truth = {}
    for g, p, d in rows:
        truth[g] = truth.get(g, 0) + round(p * 100) * (100 - round(d * 100))
    want = {g: ((e4 + 50) // 100) / 100 for g, e4 in truth.items()}
    assert got == want
    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck = {
        g: v
        for g, v in con.sql(
            """
            SELECT g, floor((sum(CAST(round(l_extendedprice*100) AS BIGINT)
                            * (100 - CAST(round(l_discount*100) AS BIGINT)))
                       + 50) / 100) / 100
            FROM t GROUP BY g
            """
        ).fetchall()
    }
    assert duck == want
