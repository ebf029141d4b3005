"""Relational operator surface over the TPC-H-ish testdata tables.

Everything here is pure DataFrame API — Catalyst gets predicate pushdown,
column pruning, join selection (broadcast vs sort-merge), partial
aggregation and whole-stage codegen for free. No UDFs, no collects.

Scale notes per operator family:
* joins: dimension tables (region/nation/customer/supplier/part) are small
  relative to the fact tables and sit under the autoBroadcastJoinThreshold,
  so Catalyst broadcast-hash-joins them; fact-fact joins
  (orders⋈lineitem) shuffle on the join key — at 100 TB you'd bucket both
  tables on orderkey to make this a zero-shuffle sort-merge join.
* aggregations: groupBy().agg() always does partial (map-side) aggregation;
  count(distinct) compiles to expand+two-phase agg. AQE coalesces the
  post-shuffle partitions at small SF and splits skewed ones at large SF.
* windows: partitioned windows shuffle once on the partition key; frames
  are streaming (running) where possible.

Oracle parity conventions (driver hash-compares values with columns sorted
by name): every computed column is aliased identically in both dialects;
double aggregates are rounded (sum→2dp, avg/ratio→4dp) so engine-specific
float summation order cannot flip the hash; computed integers are cast to
long because DuckDB widens to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from dbscan_spark.functions import as_double_array, zvalue_sql
from dbscan_spark.io import load_embeddings, load_events, load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events through the one audited ingestion-validity rule
    (io.load_events: NULL event time and non-finite values excluded on
    both engines — round-8 relational shape-fuzz, BASELINE.md §5d)."""
    return load_events(spark, sf_dir)


# --------------------------------------------------------------------------
# TPC-H-flavored analytics
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy grouped aggregate with derived expressions.

    The integer cents/percent units AND the derived revenue/charge
    products are projected ONCE per row before the aggregate and every
    money aggregate consumes the projected integers — Catalyst does not
    common-subexpression-eliminate across aggregate children, so
    inlining _money_cents into each of the six money aggregates re-ran
    the floor(x*100+0.5) cents-ification up to three times per row per
    column (measured 1.5x on the whole query at sf0.1; the round-7 A/B
    is in BASELINE.md §4a), and keeping rev_e4/charge_e6 as aggregate-
    child expressions re-ran the rev_e4 product inside charge_e6 per
    row (staging both recovered a further ~13%: 0.60 -> 0.53 s median
    warm at sf0.1, the round-8 A/B — VERDICT r7 item 6)."""
    l = _t(spark, sf_dir, "lineitem")
    # revenue = price*(1-disc): cents x pct = exact e4 integer units;
    # charge = price*(1-disc)*(1+tax): cents x pct x pct = exact e6.
    # Positive domain, so integer `div` == floor — and unlike float
    # division, stays exact past 2^53 (e6 sums reach ~1.5e17 at sf1.0
    # group sizes).
    ep_c = _money_cents(F.col("l_extendedprice"))
    d_pct = _money_cents(F.col("l_discount"))
    t_pct = _money_cents(F.col("l_tax"))
    rev_e4 = ep_c * (F.lit(100) - d_pct)
    lf = l.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        ep_c.alias("_ep_c"),
        d_pct.alias("_d_pct"),
        rev_e4.alias("_rev_e4"),
        (rev_e4 * (F.lit(100) + t_pct)).alias("_charge_e6"),
    )
    n = F.count(F.lit(1))
    return (
        lf.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integer-valued: every partial sum is an
            # exact integer in float64, so this sum is order-stable
            # as-is (unlike the 2-decimal money columns below)
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            (F.sum("_ep_c") / 100).alias("sum_base_price"),
            _e4_to_dollars(F.sum("_rev_e4")).alias("sum_disc_price"),
            F.sum("_charge_e6").alias("_charge_e6"),
            # integer-valued quantities sum exactly in float64, so only
            # the final rounding needs the cross-engine floor idiom;
            # sum*100 is exact (integer-valued), making qty-units
            # behave as "cents" for the shared expression
            _avg_cents_floor(F.sum("l_quantity") * 100, n).alias(
                "avg_qty"
            ),
            # exact integer cents sum, one division, floor-half-up at
            # 1e-4 — the one audited money-average expression
            _avg_cents_floor(F.sum("_ep_c"), n).alias("avg_price"),
            # whole-percent discounts are exact in "cents" units, so
            # the same idiom applies verbatim
            _avg_cents_floor(F.sum("_d_pct"), n).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "sum_charge", F.expr("(_charge_e6 + 5000) div 10000") / 100
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "avg_qty",
            "avg_price",
            "avg_disc",
            "count_order",
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + grouped agg + deterministic top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_e4_to_dollars(F.sum(_revenue_e4())).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _revenue_e4() -> Column:
    """Per-row revenue ``l_extendedprice * (1 - l_discount)`` in EXACT
    integer 1e-4-dollar units: prices are 2-decimal and discounts are
    whole percents, so cents x (100 - pct) is an integer the engines
    sum identically in any order. Raw float64 sums rounded to cents are
    NOT order-stable at scale — measured at sf1.0, cross-engine
    summation-order drift reaches ~0.06 dollars on a 240k-row group,
    above the half-cent rounding boundary (BASELINE.md §5 round-6
    note)."""
    return F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long") * (
        F.lit(100) - F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    )


def _e4_to_dollars(e4_sum: Column) -> Column:
    """Floor-based round-half-up of an exact e4 integer sum to a
    2-decimal dollar double — bit-identical cross-engine because the
    float enters only after the integer rounding decision."""
    return F.floor((e4_sum + 50) / 100) / 100


def _money_cents(col: Column) -> Column:
    """A 2-decimal money column as exact integer cents (the testdata's
    money columns — prices, totals, balances, event values — are all
    cents-exact; verified in TESTDATA + tests/test_money_exact.py)."""
    return F.floor(col * 100 + 0.5).cast("long")


def _sum_money(col: Column) -> Column:
    """Order-independent exact money sum: integer cents summed, one
    float division at the end. ``round(sum(double), 2)`` is NOT
    order-stable — cross-engine (and partition-count-dependent)
    summation drift crosses the half-cent boundary once groups reach
    ~100k rows (measured at sf1.0; BASELINE.md §5b). DuckDB oracle
    twin: ``sum(CAST(floor(x * 100 + 0.5) AS BIGINT)) / 100``."""
    return F.sum(_money_cents(col)) / 100


def _avg_money(col: Column, scale: int = 4) -> Column:
    """Order-independent money average rounded half-up to ``scale``
    decimals. ``round(avg(double), n)`` carries the same summation-
    order float drift as ``round(sum(double), 2)`` — the class the r6
    sweep closed for sums — so the average divides the EXACT integer
    cents sum once, then rounds on the floor-half-up grid; every step
    after the integer sum is one identical IEEE op in both engines
    (ADVICE r6: avg arm of the float-sum class). DuckDB twin:
    ``floor(sum(CAST(floor(x*100 + 0.5) AS BIGINT)) * 10^(scale-2)
    / count(x) + 0.5) / 10^scale``.

    Domain: NON-NEGATIVE money columns only (prices/totals/whole-
    percent discounts). On a negative exact .5 tie, floor-half-up
    (towards +inf) and decimal HALF_UP (away from zero) differ by one
    grid step — both engines still agree with each other (identical
    IEEE expression), but the decimal-truth property test
    (tests/test_money_exact.py) is pinned to the non-negative domain
    this helper is applied to. The signed acctbal columns only ever
    pass through _sum_money/_money_cents, which are tie-free on
    cents-exact data at any sign.

    Deliberately EXCLUDED from this closure: unrounded float averages
    used only as filter thresholds or statistical intermediates
    (subquery_above_avg, q22_dormant_customers, zscore_outlier_orders,
    join_salted_skew) — their drift never lands on an output rounding
    grid and could only matter on an exact tie between a row value and
    its group mean, which the sf1.0 exactness sweep never produced —
    and the log-domain geomean (text.py geomean_price), where no
    integer representation exists and relative drift (~1e-12) sits far
    below the 1e-4 output grid."""
    return _avg_cents_floor(F.sum(_money_cents(col)), F.count(col), scale)


def _avg_cents_floor(
    total_cents: Column, n: Column, scale: int = 4
) -> Column:
    """The single audited definition of the money-average arithmetic
    (ADVICE r7: the idiom was hand-inlined at three call sites and
    could drift from _avg_money): floor-half-up at ``scale`` decimals
    of an EXACT integer cents sum divided once by ``n``. Callers pass
    the aggregated sum themselves so grouped (``F.sum(c)``), windowed
    (``F.sum(c).over(w)``), and pre-projected-cents variants all share
    this one expression tree; ``n`` stays caller-chosen
    (``F.count(lit(1))`` vs ``F.count(col)`` — identical on the
    non-null money columns this closure is applied to). Same
    non-negative-domain caveat as _avg_money."""
    factor = float(10 ** (scale - 2))
    return F.floor(total_cents * factor / n + 0.5) / (10 ** scale)


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join (small dims broadcast) + grouped agg.
    Revenue accumulates in exact integer e4 units (see _revenue_e4)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_e4_to_dollars(F.sum(_revenue_e4())).alias("revenue"))
    )


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + single-row aggregate (pushdown showcase)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _e4_to_dollars(
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
                    * F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
                )
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (adapted to the synthetic columns): revenue lost to
    returned items per customer over one quarter, top 20. Fact-fact join
    shuffles on the order key; the nation dim rides a broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    rev = _e4_to_dollars(F.sum(_revenue_e4()))
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with any order whose total quantity exceeds
    the threshold — a grouped-HAVING derived table semi-joined back to
    the facts. The qualifying-orderkey set is aggregated BEFORE any join
    (map-side partial agg), so only qualifying orders shuffle onward."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
        .select("l_orderkey", "sum_qty")
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(
            F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(100)
    )


def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal scan: both the filter and the 3-column projection reach the
    parquet reader (PushedFilters + ReadSchema in .explain)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------

def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (
                F.coalesce(
                    F.sum(_money_cents(F.col("o_totalprice"))),
                    F.lit(0).cast("long"),
                )
                / 100
            ).alias(
                "total_spent"
            ),
        )
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one open order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(
        o, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


def join_theta_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join with an extra range (theta) condition: items shipped more
    than 90 days after their order date."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str | None = None,
) -> DataFrame:
    """Generalized backward as-of join: every LEFT row gains the most
    recent RIGHT row for the same key at-or-before its timestamp
    (``asof_ts`` and, optionally, ``asof_<value_col>``; NULL when no
    right row precedes).

    Scale-correct composition — union both sides with a side marker, ONE
    shuffle on the key, one sort on (ts, side, value), and a running
    ``last(..., ignorenulls=True)`` window — O(n log n) per key group,
    never the quadratic key-equi + time-range filter join. Right rows
    sort BEFORE left rows at equal timestamps, which implements the
    inclusive (>=) bound; among several right rows sharing (key, ts) the
    largest value wins (deterministic tie rule, property-tested in
    tests/test_asof_property.py)."""
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_payload"),
        F.lit(None)
        .cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("ts"),
                    *(
                        [F.col(value_col).alias("val")]
                        if value_col
                        else []
                    ),
                ).alias("s")
            ).schema["s"].dataType.simpleString()
        )
        .alias("_r"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_payload"].dataType.simpleString()).alias(
            "_payload"
        ),
        F.struct(
            F.col(right_ts).alias("ts"),
            *([F.col(value_col).alias("val")] if value_col else []),
        ).alias("_r"),
    )
    order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_r").asc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out = matched.select(
        *[F.col(f"_payload.{c}").alias(c) for c in lcols],
        F.col("_last_r.ts").alias("asof_ts"),
        *(
            [F.col("_last_r.val").alias(f"asof_{value_col}")]
            if value_col
            else []
        ),
    )
    return out


def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: for each 'error' event, the most recent
    'click' by the same user at or before the error's timestamp.

    Spark has no native ASOF JOIN (the reference has no joins at all), so
    this is the scale-correct composition: union both sides with a marker,
    one shuffle on the key, one sort on (ts, marker), and a running
    ``max(click_ts)`` window — O(n log n) per key group, never the
    quadratic key-equi + time-range join a naive formulation pays. At
    100 TB both sides co-partition by user_id in the single exchange.
    Oracle: DuckDB's native ``ASOF LEFT JOIN`` (e.ts >= c.ts), which makes
    this a cross-engine semantic check of the as-of contract. Ties on
    (user_id, ts) are deterministic: ``max`` sees the same click set either
    way, and ordering clicks before errors at equal ts implements the
    inclusive bound.

    Perf note: the r2 bench showed 1.11 s (vs 0.81 s r1) at sf0.1; solo
    re-measurement (4 warm runs) gives 0.51-0.68 s steady state with the
    identical plan — the r2 number was shared-host variance, not an
    extra exchange.
    """
    ev = _events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    return asof_backward_join(
        errors, clicks, key="user_id", left_ts="ts", right_ts="ts"
    ).select(
        "event_id",
        "user_id",
        F.col("asof_ts").alias("last_click_ts"),
        # timestampdiff, not unix_micros: it accepts TIMESTAMP_NTZ
        # (the testdata's naive parquet annotation) as well as LTZ,
        # and a difference of two same-typed stamps is tz-free.
        F.expr(
            "timestampdiff(MICROSECOND, asof_ts, ts)"
        ).alias("micros_since_click"),
    )


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------

def agg_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cents projected once per row: the sum and the average both consume
    # the same integer column (no CSE across aggregate children — the
    # q1 lesson, BASELINE.md §4a)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_totalprice",
        _money_cents(F.col("o_totalprice")).alias("_tp_c"),
    )
    n = F.count(F.lit(1))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("_tp_c") / 100).alias("total"),
        _avg_cents_floor(F.sum("_tp_c"), n).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (priority, status) → priority → grand total."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        _sum_money(F.col("o_totalprice")).alias("total"),
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over returnflag × linestatus."""
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING): big customers only."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _sum_money(F.col("o_totalprice")).alias("total"),
        )
        .filter(F.col("n_orders") >= 8)
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

def window_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand (deterministic tie-break)."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        p.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: days since each customer's previous order."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc_nulls_first("o_orderdate"), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_first("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(_money_cents(F.col("o_totalprice"))).over(w) / 100).alias("running_spend"),
    )


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank over supplier balances within nation."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
    )


def window_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: decile bucket, percent_rank and
    cume_dist of each order's price within its priority class. One
    partitioned sort serves all three functions (single Window node).
    Quotients round via the pure-IEEE floor-half-up idiom — engine
    round() implementations can disagree by one grid step at the 1e-6
    boundary (see window_cume_dist_spend / explode_embedding_head)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).cast("long").alias("decile"),
        (
            F.floor(F.percent_rank().over(w) * 1000000 + 0.5) / 1000000
        ).alias("pct_rank"),
        (
            F.floor(F.cume_dist().over(w) * 1000000 + 0.5) / 1000000
        ).alias("cume"),
    )


def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of per-part numeric measures — the inverse of
    pivot_segment_priority. Spark's native unpivot compiles to a single
    Expand over one scan: no join, no shuffle, rows scale linearly with
    input × #measures."""
    p = _t(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    return wide.unpivot(
        ["p_partkey"], ["size", "retailprice"], "measure", "value"
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops
# --------------------------------------------------------------------------

def sort_limit_top_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with both finished and pending orders (INTERSECT)."""
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.intersect(p)


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer keys that never appear in orders (EXCEPT/distinct)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return c.subtract(o)


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two entity key spaces with a provenance tag."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("src")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s)


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------

def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("inflated"),
        F.abs(F.col("p_size") - F.lit(25)).cast("long").alias("size_dist"),
        # sqrt is NULL outside its domain: Spark would yield NaN on a
        # negative price where DuckDB THROWS (round-8 relational
        # shape-fuzz) — a derived metric of a corrupt row is NULL, not
        # garbage, on both engines.
        F.round(
            F.when(
                F.col("p_retailprice") >= 0, F.sqrt(F.col("p_retailprice"))
            ),
            4,
        ).alias("price_sqrt"),
    )


def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: group extraction, global replace, boolean
    match — all JVM-side (Java regex; patterns chosen to behave
    identically under DuckDB's RE2). Narrow projection, no shuffle."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), "^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_type"), "[AEIOUaeiou]", "").alias(
            "type_novowels"
        ),
        F.col("p_type").rlike("PROMO|ECONOMY").alias("is_discount_class"),
    )


def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (the FILTER clause pattern): several
    differently-predicated aggregates in ONE grouped pass over orders —
    no self-joins, no repeated scans."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        (
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "O",
                    _money_cents(F.col("o_totalprice")),
                ).otherwise(F.lit(0).cast("long"))
            )
            / 100
        ).alias("open_value"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def window_range_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: each order's trailing-30-day spend for its
    customer — a value-range window (peers by time distance), not a row
    count. Spark expresses interval ranges as rangeBetween over epoch
    seconds; DuckDB as RANGE BETWEEN INTERVAL — identical frames because
    both bound by (current_ts - 30 days <= peer_ts <= current_ts)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(
            # NTZ-safe epoch seconds (unix_timestamp rejects TIMESTAMP_NTZ);
            # any fixed origin works — only differences bound the frame.
            F.expr(
                "timestampdiff(SECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
            )
        )
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(_money_cents(F.col("o_totalprice"))).over(w) / 100).alias("spend_30d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_30d"),
    )


def agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total the scalable way: the grand total rides in as a
    broadcast 1-row aggregate joined to the per-group rollup. The naive
    formulation — ``sum() OVER ()`` with no partition key — funnels every
    row through ONE task at 100 TB; this shape keeps both aggregates
    partial+parallel and moves one scalar."""
    o = _t(spark, sf_dir, "orders")
    per_prio = o.groupBy("o_orderpriority").agg(
        F.sum(_money_cents(F.col("o_totalprice"))).alias("_prio_c")
    )
    total = o.agg(
        F.sum(_money_cents(F.col("o_totalprice"))).alias("_grand_c")
    )
    return per_prio.crossJoin(F.broadcast(total)).select(
        "o_orderpriority",
        (F.col("_prio_c") / 100).alias("prio_total"),
        (
            F.floor(
                F.col("_prio_c") / F.col("_grand_c") * 1000000 + 0.5
            )
            / 10000
        ).alias("pct_of_total"),
    )


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the full partition frame:
    each customer's first, latest, and second order price side by side."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_first("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias(
            "second_price"
        ),
    )


def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


def scalar_array_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed column access over the embeddings table."""
    e = load_embeddings(spark, sf_dir)
    return e.select(
        "vec_id",
        F.size(F.col("embedding")).cast("long").alias("dim"),
        F.col("embedding")[0].alias("first_val"),
        F.col("embedding")[63].alias("last_val"),
        "label",
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props payload column."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_val"),
    )


def json_aggregate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense (event_type × hour) spine via
    ``sequence()`` + explode, left-joined against the hourly rollup with
    zero-fill — the resample/asfreq operation every monitoring pipeline
    needs. Scale shape: the only real shuffle is the partial-aggregated
    hourly rollup; the spine is O(types × hours) rows (tiny at any corpus
    size, built from a broadcast 1-row bounds subquery), so the gap-fill
    join is broadcast-sized no matter how large the raw events table is.
    The hour key is emitted as a string (engines canonicalize timestamp
    scalars differently; the yyyy-MM-dd HH:00 form is bijective)."""
    joined = _hourly_spine_joined(_events(spark, sf_dir))
    return joined.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


def _hourly_spine_joined(e: DataFrame) -> DataFrame:
    """Dense (event_type, hr) spine left-joined to the hourly rollup;
    gap hours keep NULL aggregates (callers choose zero-fill vs LOCF).

    The series domain is the KNOWN event types: ``collect_set`` drops
    NULL, so a NULL-typed event contributes to no series — the oracles'
    type CTEs carry the matching ``WHERE event_type IS NOT NULL``
    (round-8 relational shape-fuzz; a NULL gap-fill series is not a
    meaningful monitoring signal).

    Two scans total: one for the rollup, and ONE single-row metadata
    aggregate that carries bounds AND the type set together (min/max hour
    + collect_set of types, all map-side partial) — not a scan per spine
    ingredient. The metadata row is broadcast and exploded into the
    (type × hour) spine."""
    agg = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _sum_money(F.col("value")).alias("sum_value"),
    )
    meta = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
        F.collect_set("event_type").alias("types"),
    )
    spine = (
        F.broadcast(meta)
        .select(F.explode("types").alias("event_type"), "h0", "h1")
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    return spine.join(agg, ["event_type", "hr"], "left")


def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward interpolation
    (the locf() pairing time-series stores ship next to zero-fill): gap
    hours inherit the type's last observed hourly sum, hours before the
    first observation fall back to 0. The LOCF window runs over the
    spine-sized frame (types × hours — tiny at any corpus scale), not the
    raw events."""
    joined = _hourly_spine_joined(_events(spark, sf_dir))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce(
            F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("sum_value_locf"),
    )


def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: day → hour subtotals +
    grand total in one pass (the continuous-aggregate shape time-series
    stores maintain). ROLLUP compiles to a single Expand + one partial-
    aggregated shuffle — not one scan per grain."""
    e = _events(spark, sf_dir)
    return (
        e.select(
            # string day key: engines canonicalize date scalars differently
            # (date vs midnight-timestamp); the yyyy-MM-dd string is
            # bijective with the date and compares identically
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.hour("ts").cast("long").alias("hr"),
            "value",
        )
        .rollup("day", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_money(F.col("value")).alias("sum_value"),
        )
    )


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling in ONE aggregate pass — the data-quality sweep a
    pipeline runs before training: row/null/distinct counts, numeric
    ranges, date bounds. Every statistic partial-aggregates map-side, so
    at 100 TB this is a single scan + one tiny shuffle; the exact
    distinct is on a 3-value column (fine at any scale) — for
    high-cardinality columns you profile with the HLL sketch instead
    (agg_approx_distinct shows that pairing)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("n_null_qty"),
        F.count_distinct("l_returnflag").alias("n_flags"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


def csv_source_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV file *source*: read a headered CSV mirror of events with an
    explicit schema, aggregate per user decile. Completes the
    parquet/JSON/CSV source triple; the oracle runs the same aggregate
    over parquet, proving the CSV scan reproduces the data (doubles
    round-trip via Spark's shortest-round-trip CSV repr)."""
    from dbscan_spark.io import events_csv_dir, read_events_csv

    e = read_events_csv(spark, events_csv_dir(spark, sf_dir))
    return (
        e.groupBy((F.col("user_id") % 10).alias("user_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_money(F.col("value")).alias("sum_value"),
            F.count_distinct("event_type").alias("n_types"),
        )
    )


def join_range_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: for every purchase event, count the same
    user's clicks in the preceding 30 minutes.

    Spark shape: equi-join on user_id with the time range as a join-time
    predicate — a shuffle hash join keyed on user_id, the scalable
    interval-join form (per-user event lists are bounded; at 100 TB you
    would additionally bucket both sides by (user_id, time-bucket) so the
    range predicate prunes co-partitioned buckets). Left join keeps
    zero-click purchases at count 0.
    """
    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    return (
        p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("c_ts") < F.col("p_ts")),
            "left",
        )
        .groupBy("purchase_id", "user_id")
        .agg(
            F.count(F.col("c_ts")).alias("n_recent_clicks"),
            F.round(F.coalesce(F.sum("c_value"), F.lit(0.0)), 2).alias(
                "recent_click_value"
            ),
        )
    )


def json_source_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON file *source* (SURVEY §2.2 scans): read a JSON-lines mirror of
    events with an explicit schema (no inference pass), filter, aggregate.

    The mirror is value-identical to the parquet table, so the oracle runs
    the same aggregate over parquet — proving the JSON scan reproduces the
    parquet scan's data.
    """
    from dbscan_spark.io import events_json_dir, read_events_json

    e = read_events_json(spark, events_json_dir(spark, sf_dir))
    return (
        e.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            _sum_money(F.col("value")).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Event-time windows (batch form of the streaming operators; the streaming
# module reuses the same expressions over readStream — see
# dbscan_spark/streaming/events.py)
# --------------------------------------------------------------------------

def window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows per event type."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_money(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"), "event_type", "n_events", "total_value"
        )
    )


def window_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event in 2 windows)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


def window_sliding_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct users per 1-hour window sliding every 30 minutes — the
    concurrent-audience metric. DISTINCT aggregation cannot map-side
    combine like the plain counts (Spark plans the two-phase
    distinct-expand), and each event lands in window/slide = 2 windows;
    at 100 TB per-key cardinality the drop-in replacement is
    approx_count_distinct (the HLL leg, agg_approx_distinct)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("w_start"), "n_users", "n_events")
    )


def window_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


# --------------------------------------------------------------------------
# SQL entry point, grouping sets, pivot, percentiles, subqueries, frames
# --------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the spark.sql entry point: revenue at
    (region, nation), (region) and grand-total granularities in one pass
    (Catalyst compiles it to a single Expand + hash aggregate)."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    _t(spark, sf_dir, "region").createOrReplaceTempView("v_region")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT r_name, n_name,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100
                 AS revenue,
               count(*) AS n_orders
        FROM v_orders
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation ON c_nationkey = n_nationkey
        JOIN v_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


def pivot_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per market segment x order priority. The pivot
    value list is pinned so the plan is a single pass (no distinct-values
    pre-query) — the spelled-out conditional aggregation is exactly what
    Catalyst lowers pivot to."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renames = dict(zip(_PRIORITIES, _PRIORITY_COLS))
    return piv.select(
        "c_mktsegment",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(renames[p])
            for p in _PRIORITIES
        ],
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per return flag (both
    engines use linear interpolation: Spark percentile(), DuckDB
    quantile_cont)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q75"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: every customer against the per-customer order
    rollup of high-value orders — customers with no qualifying order keep
    a null side, qualifying orders with no customer would too."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            _sum_money(F.col("o_totalprice")).alias("big_total"),
        )
    )
    return c.join(big, c.c_custkey == big.o_custkey, "full_outer").select(
        "c_custkey", "c_mktsegment", "o_custkey", "n_big", "big_total"
    )


def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders priced above the global average (the
    subquery side is a 1-row broadcast)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM v_orders)
        """
    )


def subquery_exists_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: customers having at least one urgent order
    (Catalyst rewrites it to a left-semi join)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM v_customer
        WHERE EXISTS (
            SELECT 1 FROM v_orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        """
    )


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-frame window: 3-row trailing moving average of order totals per
    customer (rowsBetween(-2, 0) over a fully deterministic ordering)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_first("o_orderdate"), "o_orderkey")
        .rowsBetween(-2, 0)
    )
    # windowed arm of the money-average closure: exact cents sum over
    # the frame, one division, floor-half-up to the 1e-4 grid. Cents
    # are projected ONCE per row before the window — inlining
    # _money_cents inside the window aggregate re-evaluated the
    # cents-ification per frame pass (measured 0.48 vs 0.31 s warm at
    # sf0.1, BASELINE.md §4a).
    oc = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        _money_cents(F.col("o_totalprice")).alias("_tp_c"),
    )
    return oc.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        _avg_cents_floor(
            F.sum("_tp_c").over(w), F.count("_tp_c").over(w)
        ).alias("moving_avg_3"),
    )


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations of customers with >400k orders plus
    nations of suppliers of expensive parts."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cust_nations = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp_nations = s.filter(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.union(supp_nations).distinct()


def scalar_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif / least / greatest over lineitem."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none"))
        .alias("return_kind"),
        F.round(
            F.least(F.col("l_extendedprice"), F.lit(20000.0)), 2
        ).alias("capped_price"),
        F.greatest(F.col("l_tax"), F.col("l_discount")).alias("max_rate"),
    )


def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column construction and access: build a map from scalar
    columns, read it back with element_at, enumerate its keys."""
    l = _t(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("tax"), F.col("l_tax"),
        F.lit("discount"), F.col("l_discount"),
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_val"),
        F.element_at(m, "tax").alias("tax_val"),
        F.size(m).cast("long").alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
    )


def explode_embedding_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view): the first four embedding
    components as (vec_id, pos, val) rows. The 6dp rounding is the
    pure-IEEE floor-half-up idiom, not round(): engine round()
    implementations differ at the grid boundary (Spark exact-decimal
    HALF_UP vs DuckDB float multiply) and disagree on the SIGN of a
    zero result (-4e-7 rounds to -0.0 in DuckDB, +0.0 in Spark — a
    value-hash mismatch; observed in the sf1.0 scaling sweep), while
    floor(x*1e6 + 0.5)/1e6 is the same IEEE ops on both engines and
    always yields +0.0."""
    e = load_embeddings(spark, sf_dir)
    return e.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding"), 1, 4)).alias("pos", "val_f"),
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        (
            F.floor(F.col("val_f").cast("double") * 1000000 + 0.5) / 1000000
        ).alias("val"),
    )


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the 64-D embeddings in long form
    (label, pos, avg_val, n_vectors) — the class-centroid aggregate
    feature pipelines compute before nearest-centroid classification.
    posexplode + grouped avg keeps the mean partial-aggregated map-side
    (rows×64 explode feeds a (labels×64)-cell aggregation), instead of
    collecting vectors anywhere."""
    e = load_embeddings(spark, sf_dir)
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding")).alias("pos", "val_f"),
        )
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.round(F.avg(F.col("val_f").cast("double")), 6).alias("avg_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch accuracy pinned against the exact distinct count per
    return flag. Raw sketch values are engine-specific (Spark HLL++ vs
    DuckDB's estimator disagree by design), so the query emits the EXACT
    count plus a within-5%-of-exact boolean computed over the sketch —
    hash-checkable against a DuckDB oracle that emits exact + TRUE. If the
    sketch ever drifts past tolerance the flag flips and the driver hash
    mismatches, so the sketch is now driver-graded, not just CI-pinned."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", 0.02)
                - F.count_distinct("l_orderkey")
            )
            / F.count_distinct("l_orderkey")
            < 0.05
        ).alias("approx_within_5pct"),
    )


def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles beside the exact ones (agg_percentiles).

    Spark's approx_percentile keeps a bounded Greenwald-Khanna-style sketch
    per group with map-side partial merge, so at 100 TB the state is
    O(1/accuracy) per group instead of percentile()'s full per-group value
    buffer. Raw sketch values are engine-specific, so the query emits the
    EXACT interpolated quantiles plus a boolean asserting every sketch
    quantile lands within 1% of its exact twin — hash-checkable against a
    DuckDB oracle emitting quantile_cont + TRUE. Sketch drift flips the
    flag and fails the driver hash."""
    l = _t(spark, sf_dir, "lineitem")

    def _close(approx, exact):
        return F.abs(approx - exact) <= 0.01 * F.greatest(F.abs(exact), F.lit(1.0))

    qty = {
        p: F.expr(f"percentile(l_quantity, {p})") for p in (0.25, 0.5, 0.75)
    }
    aqty = {
        p: F.expr(f"approx_percentile(l_quantity, {p}, 10000)")
        for p in (0.25, 0.5, 0.75)
    }
    price = F.expr("percentile(l_extendedprice, 0.9)")
    aprice = F.expr("approx_percentile(l_extendedprice, 0.9, 10000)")
    return l.groupBy("l_returnflag").agg(
        F.round(qty[0.25], 4).alias("q25"),
        F.round(qty[0.5], 4).alias("median_qty"),
        F.round(qty[0.75], 4).alias("q75"),
        F.round(price, 4).alias("p90_price"),
        (
            _close(aqty[0.25], qty[0.25])
            & _close(aqty[0.5], qty[0.5])
            & _close(aqty[0.75], qty[0.75])
            & _close(aprice, price)
        ).alias("sketch_within_1pct"),
    )


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join via key salting: each error/purchase event is
    joined to its event-type's global average to score the deviation.

    ``events`` is power-law-skewed on ``event_type`` (a handful of types
    over the whole fact table), so a plain shuffle join on ``event_type``
    sends each hot key to ONE reducer. The salting pattern: the fact side
    gets a deterministic salt ``pmod(hash(event_id), 8)``; the build side
    is replicated once per salt value via ``explode(sequence(...))``; the
    join key becomes (event_type, salt), spreading every hot key over 8
    partitions. Salting changes row *placement* only, never the join
    result — the oracle is the plain unsalted join.

    At this build-side size you'd simply ``broadcast()`` (and Catalyst
    would); the ``shuffle_hash`` hint forces the shuffle path so the plan
    genuinely exercises — and tests/test_plans.py asserts — the salted
    exchange. At 100 TB this is the portable fix when the skewed build
    side is too big to broadcast and AQE's sort-merge skew split doesn't
    apply (e.g. two power-law event streams joined by id).
    """
    e = _events(spark, sf_dir)
    n_salt = 8
    stats = (
        e.groupBy("event_type")
        .agg(F.avg("value").alias("type_avg"))
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
    )
    fact = e.filter(F.col("event_type").isin("error", "purchase")).withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(n_salt)).cast("int")
    )
    return fact.join(stats.hint("shuffle_hash"), ["event_type", "salt"]).select(
        "event_id",
        "event_type",
        F.round(F.col("value") - F.col("type_avg"), 4).alias("value_dev"),
    )


def sample_hash_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling — the reproducible way to cut a ~1/16
    sample from a 100 TB table: filter on a hash of the key instead of
    ``rand()``. The sample is stable across runs, engines, partitionings
    and retries (no seed bookkeeping, no resampling on task retry — a
    real correctness hazard with rand()-sampling at scale), and it is a
    narrow per-row predicate: no shuffle, no sort, no driver state. md5
    is bit-identical everywhere, so DuckDB selects the same rows exactly.
    """
    o = _t(spark, sf_dir, "orders")
    key_hash = F.md5(F.col("o_orderkey").cast("string"))
    return o.filter(F.substring(key_hash, 1, 2) < "10").select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: the synthetic lineitem has no commit/receipt
    dates, so "late" = shipped >60 days after the order date): per-priority
    count of one quarter's orders with at least one late line. The EXISTS
    is a LEFT SEMI join — each order emits at most once regardless of how
    many lines qualify, and the quarter filter is pushed into the orders
    scan before the shuffle."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    q = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    return (
        q.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.
    The nation dim is broadcast twice (supplier side and customer side,
    disambiguated by alias); the pair predicate prunes to the two nations
    BEFORE the fact-fact shuffle on orderkey, so only qualifying suppliers'
    lines shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    sn = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")).filter(
        F.col("supp_nation").isin("NATION_1", "NATION_2")
    )
    cn = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")).filter(
        F.col("cust_nation").isin("NATION_1", "NATION_2")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cn, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_e4_to_dollars(F.sum(_revenue_e4())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ASIA's PROMO-part purchase volume per
    year. A conditional-sum ratio over one grouped scan — the CASE keeps it
    a single aggregation instead of two joined subqueries. Dim chain
    region→nation→customer prunes the fact rows to one region before the
    orderkey shuffle; part is broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    asia_c = (
        c.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    ).select("c_custkey")
    supp_n = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol_e4 = _revenue_e4()
    target_e4 = F.when(
        F.col("supp_nation") == "NATION_3", vol_e4
    ).otherwise(F.lit(0).cast("long"))
    return (
        l.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.floor(
                    F.sum(target_e4) / F.sum(vol_e4) * 10000 + 0.5
                )
                / 10000
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp table, so supply cost is modeled as
    half the part's retail price): profit on widget-family parts by
    supplier nation and year. part and nation broadcast; the only shuffle
    is the final (nation × year) aggregation — partial-aggregated map-side
    because profit is computed per row before the groupBy. Profit
    accumulates in exact integer e4 units (see _revenue_e4): revenue
    cents x (100 - discount pct) minus retail cents x integer quantity
    x 50 — all integers, so the sum is order-independent and the cents
    rounding decision never sees a float."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    profit_e4 = _revenue_e4() - (
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long")
        * F.col("l_quantity").cast("long")
        * F.lit(50)
    )
    return (
        l.join(
            F.broadcast(
                p.filter(F.col("p_name").like("%widget%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(_e4_to_dollars(F.sum(profit_e4)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of non-urgent order counts per customer —
    a LEFT OUTER join with the filter in the join condition (so customers
    whose orders are all urgent still appear with count 0), then a
    histogram over the per-customer counts. Two shuffles by necessity
    (per-customer, then per-count); both partial-aggregate map-side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' share of one month's revenue — a
    conditional-sum ratio in a single grouped scan, part broadcast, month
    filter pushed to the lineitem parquet scan."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-02-01").cast("timestamp"))
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(vol), 4).alias(
                "promo_revenue"
            )
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue over one quarter.
    The scalar max is a 1-row aggregate broadcast back onto the
    per-supplier rollup — never an unpartitioned window over #suppliers
    (15M rows through one task at sf100; caught by the global
    single-partition-window sweep). Revenue is rounded BEFORE the
    max-comparison so the equality cannot be flipped by float summation
    order."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _e4_to_dollars(F.sum(_revenue_e4())).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    best = rev.join(F.broadcast(top)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        best.join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: weekly-average revenue lost to small-quantity orders of
    one brand's parts. The correlated scalar subquery (per-part average
    quantity) becomes an explicit per-part aggregate joined back — in
    Spark that's ONE extra shuffle on partkey computed over only the
    brand's lines, and Catalyst broadcast-joins the small per-part avg
    back onto the fact rows."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    brand_lines = l.join(
        F.broadcast(
            p.filter(F.col("p_brand") == "Brand#5").select("p_partkey")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_qty = brand_lines.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        brand_lines.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (
                F.floor(
                    F.sum(_money_cents(F.col("l_extendedprice")))
                    / F.lit(7.0)
                    + 0.5
                )
                / 100
            ).alias(
                "avg_yearly"
            )
        )
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR-ed (brand × size × quantity-band)
    baskets. The disjunction stays a single join predicate — Catalyst
    pushes the common p_partkey equi-key into a broadcast hash join and
    evaluates the residual OR post-probe, one pass over lineitem."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = l.join(
        F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    basket = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(basket).agg(
        _e4_to_dollars(F.sum(_revenue_e4())).alias("revenue")
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: every synthetic customer has SOME order, so
    "no orders" becomes "no orders since 2000"): positive-balance
    customers above the global average balance with no recent orders,
    rolled up per nation. The scalar average rides a broadcast (cross)
    join; the NOT EXISTS is a LEFT ANTI join against the date-pruned
    orders scan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pool = c.filter(
        F.col("c_acctbal") > 0,
    ).filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9))
    avg_bal = pool.agg(F.avg("c_acctbal").alias("avg_bal"))
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _sum_money(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC upsert) semantics as a full-outer join: apply a
    change batch (restated prices for a hash-slice of orders, plus brand
    new keys) onto the orders snapshot and classify every output row as
    update / insert / keep. This is the Delta/Iceberg MERGE shape
    expressed engine-neutrally: ONE shuffle aligning both sides on the
    merge key (bucketing both tables on o_orderkey makes it zero-shuffle);
    matched rows take the delta's values, unmatched delta rows append,
    unmatched target rows pass through."""
    o = _t(spark, sf_dir, "orders")
    key_hash = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    delta_base = o.filter(key_hash < "20")
    updates = delta_base.select(
        F.col("o_orderkey").alias("d_orderkey"),
        (F.col("o_totalprice") * 1.1).alias("d_totalprice"),
    )
    inserts = delta_base.select(
        (F.col("o_orderkey") + F.lit(100000000)).alias("d_orderkey"),
        (F.col("o_totalprice") * 0.5).alias("d_totalprice"),
    )
    delta = updates.unionByName(inserts)
    return o.join(
        delta, F.col("o_orderkey") == F.col("d_orderkey"), "full_outer"
    ).select(
        F.coalesce("o_orderkey", "d_orderkey").alias("merge_key"),
        # floor-based round-half-up (pure IEEE, engine-agnostic): the
        # price restatements land on exact .xx5 halves where Spark's
        # HALF_UP and DuckDB's banker's rounding disagree.
        (
            F.floor(F.coalesce("d_totalprice", "o_totalprice") * 100 + 0.5)
            / 100
        ).alias("totalprice"),
        F.when(
            F.col("o_orderkey").isNotNull() & F.col("d_orderkey").isNotNull(),
            F.lit("update"),
        )
        .when(F.col("o_orderkey").isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )


def sample_stratified_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: exactly 200 orders per priority
    stratum, chosen by md5 rank — the reproducible per-group quota sample
    (class-balanced eval sets, per-source caps). Unlike sampleBy(), the
    pick is stable across runs/engines/retries. One window shuffle on the
    stratum key; at 100 TB the md5 order is computed per row map-side and
    only the per-stratum top-200 survive the rank filter."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 200)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) self-join over the distinct part-name domain,
    blocked on the trailing word so the quadratic candidate space becomes
    an equi-join per block — the standard entity-resolution shape
    (block → hash join → cheap verify predicate). Only same-family name
    pairs within Levenshtein distance 4 survive. At 100 TB the blocking
    key IS the join key: no nested loop ever materializes."""
    p = _t(spark, sf_dir, "part")
    names = (
        p.select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("family", F.regexp_extract(F.col("name"), r"(\S+)$", 1))
    )
    a = names.select(F.col("name").alias("name_a"), "family")
    b = names.select(F.col("name").alias("name_b"), "family")
    return (
        a.join(b, "family")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("edit_dist") <= 4)
        .select("family", "name_a", "name_b", "edit_dist")
    )


def events_dod_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day percent change per event type — the rollup-then-lag
    time-series pattern: the heavy fact scan partial-aggregates to one row
    per (type, day) BEFORE the trivially small lag window runs, so the
    window shuffle moves only the rollup."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date("ts").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _sum_money(F.col("value")).alias("total_value"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n_events").over(w)
    return daily.select(
        "event_type",
        "day",
        "n_events",
        "total_value",
        F.round((F.col("n_events") - prev) * 100.0 / prev, 4).alias(
            "dod_pct"
        ),
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: how many users progressed view → click →
    purchase IN ORDER (each later stage strictly after the previous
    stage's first occurrence). Three per-user min-aggregations chained by
    user-keyed joins — every shuffle is on user_id, so at 100 TB all
    three stages co-partition after the first exchange (and AQE reuses
    the exchange); nothing quadratic, no window over raw events."""
    e = _events(spark, sf_dir)
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    staged = (
        views.join(clicks.select("user_id", F.lit(1).alias("has_c")), "user_id", "left")
        .join(purchases.select("user_id", F.lit(1).alias("has_p")), "user_id", "left")
        .select(
            (
                F.lit(1)
                + F.coalesce(F.col("has_c"), F.lit(0))
                + F.coalesce(F.col("has_p"), F.lit(0))
            )
            .cast("long")
            .alias("stage")
        )
    )
    return (
        staged.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted as
    active per whole-week offset from their own first event. Two
    user-keyed shuffles (first-seen agg, then the join back onto the
    fact scan) and one final (cohort × offset) count-distinct — the
    canonical retention-triangle build. The cohort week is emitted as a
    string so cross-engine date canonicalization is moot."""
    e = _events(spark, sf_dir)
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    return (
        e.join(first, "user_id")
        .select(
            F.date_trunc("week", F.col("first_day"))
            .cast("date")
            .cast("string")
            .alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.col("first_day")) / 7
            )
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


def events_sessionize_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via the lag + running-sum idiom (the
    batch-SQL twin of session_window, but with an exact SQL oracle):
    a new session starts where the gap since the user's previous event
    exceeds 30 minutes; the running sum of starts numbers the sessions.
    Both windows share ONE (user_id, ts) sort in one exchange, then the
    per-session rollup reuses the same user partitioning."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_break = F.when(
        F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES"),
        F.lit(1),
    ).otherwise(F.lit(0))
    wsum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = e.select(
        "user_id",
        "ts",
        F.sum(gap_break).over(wsum).cast("long").alias("session_no"),
    )
    return (
        sessioned.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            # truncate both endpoints to the second before diffing:
            # DuckDB's date_diff counts boundary crossings, Spark's
            # timestampdiff floors the exact delta — they agree only on
            # whole-second inputs.
            F.expr(
                "timestampdiff(SECOND, date_trunc('second', min(ts)),"
                " date_trunc('second', max(ts)))"
            ).alias("duration_s"),
        )
    )


def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream transition matrix: counts of consecutive event-type
    pairs per user ordered by (ts, event_id) — the Markov-chain path
    analysis behind next-action models. ONE user-keyed sort window
    computes the predecessor, then the pair rollup partial-aggregates
    map-side; the shuffle after the lag carries only (#types² keys)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        e.select("user_id", "event_type", prev.alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def events_concurrency_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap counting: how many user sessions (30-minute-gap
    sessionization) are open during each hour — the concurrency/backlog
    timeline op. Sessions collapse to [start, end] intervals, each
    interval EXPLODES to the hour buckets it spans (sequence() — the
    explode factor is bounded by session duration, never the timeline
    length), and a plain count per bucket follows. This is the scalable
    restatement of the +1/−1 global running sum, which would need one
    totally-ordered window over the whole timeline."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_break = F.when(
        F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES"),
        F.lit(1),
    ).otherwise(F.lit(0))
    wsum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        e.select(
            "user_id",
            "ts",
            F.sum(gap_break).over(wsum).cast("long").alias("session_no"),
        )
        .groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("t"))
    )
    hour = F.explode(
        F.sequence(
            F.date_trunc("hour", F.col("s")),
            F.date_trunc("hour", F.col("t")),
            F.expr("INTERVAL 1 HOUR"),
        )
    )
    return (
        sess.select(hour.alias("hour"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n_open_sessions"))
        .orderBy("hour")
    )


def agg_incremental_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-incremental aggregate maintenance: the historical rollup
    (orders before 1998) is computed separately from the newest
    partition's delta rollup and the two PARTIAL STATES are merged by
    re-aggregation — the nightly-ETL algebra that lets a 100 TB rollup
    absorb one new day without rescanning history (count and sum are
    commutative monoids; avg/stddev carry (sum, count) / moments). Money
    sums use decimal(18,2), which is associative EXACTLY — with doubles
    the merge order would change the bits and incremental != full. The
    oracle is the plain one-shot rollup, proving the merge algebra."""
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")

    def rollup(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(price).alias("revenue"),
        )

    # The partition predicate must be NULL-TOTAL: `date < cutoff` and
    # `date >= cutoff` both evaluate to NULL on a NULL date, so such a
    # row silently vanished from the incremental rollup while the
    # one-shot oracle kept it (round-8 relational shape-fuzz) — at
    # 100 TB that is a slow-drift correctness leak in the nightly ETL.
    # Rows of unknown date ride the newest delta partition.
    base = rollup(o.filter(F.col("o_orderdate") < F.lit("1998-01-01")))
    delta = rollup(
        o.filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01"))
            | F.col("o_orderdate").isNull()
        )
    )
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue").cast("double").alias("revenue"),
        )
    )


def layout_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout planning stats: bucket lineitem by the high bits
    of the Morton interleave of (l_partkey, l_suppkey) and report each
    bucket's row count and 2-D bounding box — the per-file footer stats
    the z-ordered writer (io.write_zorder_parquet) produces, computed
    declaratively. Tight boxes here == file-level pruning for
    predicates on either column after OPTIMIZE. Pure map-side integer
    math + one bucket-keyed aggregation; the z expression is the same
    SQL text DuckDB evaluates, so the check is exact."""
    li = _t(spark, sf_dir, "lineitem")
    z = F.expr(zvalue_sql("l_partkey", "l_suppkey"))
    return (
        li.select(
            F.shiftrightunsigned(z, 16).alias("z_bucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
    )


def events_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event values (alpha=0.25,
    seeded with the first value) — the time-series smoothing signal
    behind anomaly baselines and rate limiters. EWMA is a sequential
    fold, which SQL windows can't express directly; instead each user's
    (ts, event_id)-ordered value list folds once inside an `aggregate`
    higher-order function. ONE user-keyed aggregation exchange; the fold
    is per-group JVM expression work. alpha=0.25 and 0.75 are exact
    binary fractions and the fold order matches the oracle's
    list_reduce exactly, so the doubles agree bit-for-bit cross-engine.
    Per-group state is the user's event list — bounded by per-user
    activity; at 100 TB a time-bucketed restart (EWMA per user×month,
    chained) bounds it further."""
    e = _events(spark, sf_dir)
    seq = e.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id,"
            " value))), s -> s.value)"
        ).alias("vals")
    )
    fold = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: x * F.lit(0.25) + acc * F.lit(0.75),
    )
    return seq.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        (F.floor(fold * 10000 + F.lit(0.5)) / 10000).alias("ewma_value"),
    )


def events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build from a change
    stream: collapse each user's consecutive same-event_type runs into
    validity intervals (valid_from, valid_to, is_current) — the CDC →
    dimension-history materialization every warehouse maintains. The
    lag-compare + running-sum run-numbering shares ONE (user_id, ts)
    sort exchange (same idiom as events_sessionize_lag), the rollup
    reuses the user partitioning, and valid_to is a lead over the
    per-run rollup (tiny relative to the event stream)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = e.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(changed)
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("run_id"),
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.first("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("run_id")
    return per_run.select(
        "user_id",
        "run_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        F.lead("valid_from").over(wl).isNull().alias("is_current"),
        "n_events",
    )


_HH_SUPPORT = 0.0004  # freqItems sketch support (no false negatives above it)
_HH_THRESHOLD = 0.0005  # reported heavy-hitter share, strictly > support


def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via sketch-pruned candidates + exact verification:
    part keys covering >0.05% of lineitem rows. Spark's freqItems is a
    Karp-style single-pass sketch (bounded O(1/support) state per
    partition + one merge); its contract allows false positives but NO
    false negatives above the support. The candidate set is therefore
    joined back to exact counts and filtered by the exact share at a
    threshold strictly above the sketch support — the result is exactly
    the true heavy hitter set, deterministic and hash-checkable against
    a plain GROUP BY/HAVING oracle. At 100 TB the win is that the exact
    verify join touches only the sketch's bounded candidate list, not
    every key."""
    l = _t(spark, sf_dir, "lineitem")
    total = l.count()
    hh = (
        l.stat.freqItems(["l_partkey"], _HH_SUPPORT)
        .select(F.explode("l_partkey_freqItems").alias("l_partkey"))
    )
    exact = l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        hh.join(exact, "l_partkey")
        .filter(F.col("n_rows") / F.lit(total) > _HH_THRESHOLD)
        .select(
            "l_partkey",
            "n_rows",
            F.round(F.col("n_rows") / F.lit(total), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), "l_partkey")
    )


def stats_corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations + covariance over the lineitem
    numeric measures, one single-pass aggregation (each corr/covar is a
    streaming moment accumulator — no per-pair re-scan, no collect).
    Rounded to 4dp so engine summation order cannot flip the hash."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.corr("l_extendedprice", "l_discount"), 4).alias(
            "corr_price_disc"
        ),
        F.round(F.corr("l_quantity", "l_tax"), 4).alias("corr_qty_tax"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


def stats_supplier_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier revenue trend: least-squares slope of monthly revenue
    vs month index — grouped linear regression, the per-key forecasting
    primitive. Two grouped aggregations (month rollup, then regression
    moments per supplier), both partial-aggregable map-side.

    Exact-arithmetic regression: each row's revenue is quantized to
    integer CENTS with the floor-based half-up rule (pure IEEE — a
    double→decimal CAST would hit engine-specific rounding at .xx5
    boundaries), the monthly sums and moment sums Σy / Σxy run in
    decimal (associative-exact, order-independent; x is a small int),
    and the slope (nΣxy − ΣxΣy) / (nΣx² − Σx²) divides two EXACTLY-equal
    operands cast to double — so both engines produce bit-identical
    slopes with no rounding fudge; the 6dp round is cosmetic."""
    l = _t(spark, sf_dir, "lineitem")
    rev = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("decimal(18,0)")
    x = (
        (F.year("l_shipdate") - F.lit(1992)) * 12 + F.month("l_shipdate") - 1
    ).cast("long")
    monthly = l.groupBy(
        F.col("l_suppkey").alias("s_suppkey"), x.alias("x")
    ).agg(F.sum(rev).alias("y"))
    n, sx, sy = F.count(F.lit(1)), F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    sxy = F.sum(F.col("x") * F.col("y"))
    num = (n * sxy - sx * sy).cast("double")
    den = (n * sxx - sx * sx).cast("double")
    return (
        monthly.groupBy("s_suppkey")
        .agg(
            n.alias("n_months"),
            (sy.cast("double") / 100).alias("total_rev"),
            F.round(num / F.nullif(den, F.lit(0.0)) / 100, 6).alias(
                "slope_per_month"
            ),
        )
        .filter(F.col("n_months") >= 2)
    )


def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals via width_bucket — the
    binning primitive behind every distribution dashboard. A narrow
    per-row bucket expression then ONE count aggregation; at 100 TB the
    bucket id is computed map-side and only #buckets rows shuffle."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.width_bucket(
        F.col("o_totalprice"), F.lit(0.0), F.lit(100000.0), F.lit(20)
    )
    return (
        o.groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def zscore_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped z-score outlier flagging: orders whose total deviates more
    than 2.5σ from their priority group's mean. The per-group moments are
    ONE tiny aggregate broadcast back onto the fact scan — never a window
    over the full table (a window would sort 100 TB; the broadcast join
    touches each row once, map-side)."""
    o = _t(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderpriority").agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sigma"),
    )
    z = (F.col("o_totalprice") - F.col("mu")) / F.col("sigma")
    return (
        o.join(F.broadcast(stats), "o_orderpriority")
        .filter(F.abs(z) > 2.5)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round(z, 4).alias("zscore"),
        )
    )


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (table diff) — the migration/backfill
    validation op: given two versions of a table, classify every key as
    inserted / deleted / changed (with the changed column) / unchanged,
    in ONE key-aligned full-outer join. The 'new' snapshot is derived
    deterministically in-query (modular-key deletes, a price restatement
    slice, synthesized inserts) so both engines diff identical inputs.

    At 100 TB this is the same single-shuffle shape as MERGE
    (merge_upsert_orders): both snapshots align on the key exchange, and
    bucketed layouts make it zero-shuffle. Only non-unchanged rows are
    returned — the diff output is small even when the tables are not."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    key = F.col("o_orderkey")
    new = (
        o.filter(key % 37 != 0)
        .withColumn(
            "o_totalprice",
            F.when(key % 11 == 0, F.col("o_totalprice") * 1.1).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            o.filter(key % 53 == 0).select(
                (key + 10000000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    old_s = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("old_price"),
    )
    new_s = new.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("new_price"),
    )
    d = old_s.join(new_s, "k", "full_outer")
    change = (
        F.when(F.col("old_price").isNull(), F.lit("insert"))
        .when(F.col("new_price").isNull(), F.lit("delete"))
        .when(F.col("old_price") != F.col("new_price"), F.lit("change"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        d.withColumn("change_type", change)
        .filter(F.col("change_type") != "unchanged")
        .select(
            F.col("k").alias("o_orderkey"),
            "change_type",
            # floor-based half-up: the restated price v*1.1 lands on
            # .xx5 boundaries where Spark's BigDecimal round and
            # DuckDB's float round disagree
            (F.floor(F.col("old_price") * 100 + F.lit(0.5)) / 100).alias(
                "old_price"
            ),
            (F.floor(F.col("new_price") * 100 + F.lit(0.5)) / 100).alias(
                "new_price"
            ),
        )
    )


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier detection per event type — the
    heavy-tail-safe twin of zscore_outlier_orders: |value − median| >
    3 · 1.4826 · MAD. Same scale shape: two tiny per-group aggregates
    broadcast back onto the fact scan, never a full-table sort window.
    Exact percentile is the right call for the BOUNDED group count here
    (#event_types groups); at a 100 TB per-key cardinality the same
    query swaps in approx_percentile — that variant is the sketch-pinned
    agg_approx_percentiles.

    Cross-engine determinism: the median and MAD are quantized to 1e-6
    with the shared floor-half-up IEEE rule before use, so interpolation
    formula differences between Spark's percentile and DuckDB's
    quantile_cont (lo + (hi−lo)·f vs lo·(1−f) + hi·f — up to 1 ulp)
    cannot propagate into the threshold comparison."""
    e = _events(spark, sf_dir)

    def _q6(c):
        return F.floor(c * 1000000 + F.lit(0.5)) / 1000000

    med = e.groupBy("event_type").agg(
        _q6(F.expr("percentile(value, 0.5)")).alias("med")
    )
    j = e.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        _q6(
            F.expr("percentile(abs(value - med), 0.5)")
        ).alias("mad")
    )
    dev = F.col("value") - F.col("med")
    score = dev / (F.lit(1.4826) * F.col("mad"))
    return (
        j.join(F.broadcast(mad), "event_type")
        .filter(F.abs(dev) > F.lit(3 * 1.4826) * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(score, 4).alias("robust_z"),
        )
    )


def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: no l_shipmode column, so lines group by
    l_linestatus; 'late' = shipped >90 days after the order date): count
    of high- vs low-priority orders among one year's late lines. One
    fact-fact join pruned by the year filter BEFORE the shuffle, then a
    two-conditional-sum aggregation — the canonical CASE-pivot rollup."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: no partsupp, so 'supply cost' is each supplier's
    average sale price of the part from lineitem): for each size-10 part,
    the supplier(s) offering the minimum average price. The correlated
    min becomes an unpartitioned-per-part min window over the (part,
    supplier) rollup — the rollup is tiny relative to the fact scan, so
    the window is cheap; equality runs on the ROUNDED average so float
    summation order can't flip it."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    per = (
        l.join(
            F.broadcast(
                p.filter(F.col("p_size") == 10).select("p_partkey", "p_name")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_partkey", "p_name", "l_suppkey")
        # this average feeds an EQUALITY against the per-part minimum,
        # so float drift would change which supplier wins — exact cents
        .agg(_avg_money(F.col("l_extendedprice"), scale=2).alias("avg_price"))
    )
    w = Window.partitionBy("p_partkey")
    best = per.withColumn("min_price", F.min("avg_price").over(w)).filter(
        F.col("avg_price") == F.col("min_price")
    )
    return (
        best.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("avg_price"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: part sale value from lineitem instead of
    partsupp stock value): parts whose total sale value exceeds 0.1% of
    the corpus total. The scalar grand total rides a broadcast (cross)
    join onto the per-part rollup — same shape as agg_share_of_total,
    never a second full scan."""
    l = _t(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value")
    )
    total = per_part.agg(F.sum("value").alias("grand"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("grand") * 0.001)
        .select(
            "l_partkey",
            F.round("value", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: supplier↔part relationships observed in
    lineitem instead of partsupp; the NOT-IN complaint filter becomes the
    negative-balance suppliers): distinct supplier count per (brand,
    type, size) for non-PROMO, non-Brand#1 parts. The exclusion list is
    a broadcast LEFT ANTI join BEFORE the count-distinct shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    rel = (
        l.join(
            F.broadcast(
                p.filter(
                    (F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 4, 7)
                ).select("p_partkey", "p_brand", "p_type", "p_size")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        rel.groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: 'can promote' = shipped over 100 units of red
    parts in 1998): the qualifying-supplier set is a nested aggregation
    (per supplier over the part-filtered, year-pruned lines) whose
    HAVING gate feeds a LEFT SEMI join back to the supplier dim — only
    qualifying keys cross the final shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    qualifying = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(
                p.filter(F.col("p_name").like("red%")).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("red_qty"))
        .filter(F.col("red_qty") > 100)
    )
    return (
        s.join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


def q21_sole_faulty_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: commit/receipt lateness becomes the R return
    flag): per supplier, the count of finished multi-supplier orders
    where THIS supplier returned lines and NO other supplier did — the
    exists + not-exists double correlation expressed as two aggregations
    over one orders×lines rollup (per-order supplier/returner counts),
    never as self-join chains over raw lineitem."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    lines = l.join(
        o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", "l_returnflag")
    per_order = lines.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    sole = (
        lines.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
            ),
            "l_orderkey",
        )
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap: pairwise Jaccard similarity between the user
    sets of every two event types. The co-occurrence join runs on the
    DEDUPLICATED (type, user) table keyed by user — each user contributes
    |their types|² pair rows (bounded by the tiny type domain), never a
    users×users product — and the per-type totals ride a broadcast join
    onto the #type-pairs-sized rollup."""
    e = _events(spark, sf_dir)
    tu = e.select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    totals = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    ta = totals.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("na")
    )
    tb = totals.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("nb")
    )
    return (
        both.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both")
                / (F.col("na") + F.col("nb") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary quintile
    scores and the concatenated segment code. Each quintile is an EXACT
    global ntile(5) computed scale-safe: bucketed global row_number
    (functions.ranking.global_order_stats — percentile-cut buckets +
    partitioned windows + broadcast prefix offsets, never a
    single-partition window over the #customers rollup) fed through the
    standard ntile bucket formula; every order carries a custkey
    tie-break so both engines place tied customers identically."""
    from dbscan_spark.functions.ranking import (
        global_order_stats,
        ntile_from_rank,
    )

    # segmentation is over CUSTOMERS: a NULL custkey row is no
    # customer's order — and it would silently fall out of the rank
    # branches' custkey equi-joins while the oracle's pure windows keep
    # it (round-8 relational shape-fuzz: the NULL-key join-loss class)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    ref = F.lit("2001-08-01").cast("timestamp")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(ref, F.max("o_orderdate")).cast("long").alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        _sum_money(F.col("o_totalprice")).alias("monetary"),
    )
    # three INDEPENDENT flat rank branches (2-col projections of the
    # rollup) joined back on custkey — chaining the three helpers
    # instead compounds plan depth multiplicatively (each level's cut
    # branch re-analyzes the whole previous level)
    r = global_order_stats(
        per_cust.select("o_custkey", "recency_days"),
        [F.desc("recency_days"), F.asc("o_custkey")],
        -F.col("recency_days"),
        rn="_r_rn",
        total_count="_n",
    ).select("o_custkey", "_r_rn", "_n")
    f = global_order_stats(
        per_cust.select("o_custkey", "frequency"),
        [F.asc("frequency"), F.asc("o_custkey")],
        F.col("frequency"),
        rn="_f_rn",
    ).select("o_custkey", "_f_rn")
    m = global_order_stats(
        per_cust.select("o_custkey", "monetary"),
        [F.asc("monetary"), F.asc("o_custkey")],
        F.col("monetary"),
        rn="_m_rn",
    ).select("o_custkey", "_m_rn")
    n = F.col("_n")
    scored = (
        per_cust.join(r, "o_custkey")
        .join(f, "o_custkey")
        .join(m, "o_custkey")
        .select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            ntile_from_rank(5, F.col("_r_rn"), n).alias("r_score"),
            ntile_from_rank(5, F.col("_f_rn"), n).alias("f_score"),
            ntile_from_rank(5, F.col("_m_rn"), n).alias("m_score"),
        )
    )
    return scored.select(
        "*",
        F.concat_ws(
            "-", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    )


def parts_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, classed A
    (first 80% of cumulative revenue share), B (to 95%), C (tail). The
    grand total rides a broadcast join (never an unpartitioned sum-over-
    everything window); the cumulative share is rounded to 6dp BEFORE
    the class thresholds so a 1-ulp cross-engine difference cannot flip
    a boundary row's class."""
    l = _t(spark, sf_dir, "lineitem")
    # per-part revenue accumulates in EXACT integer e4 units and is
    # rounded half-up to cents in integer arithmetic (see _revenue_e4):
    # the rank order and every running sum must be identical across
    # engines, and a float sum's .xx5-boundary cents can flip with
    # summation order — the earlier floor(float_sum*100 + 0.5) variant
    # did exactly that at sf1.0 (replicated parts multiply the
    # half-cent boundary population; BASELINE.md §5 round-6 note)
    per_part = (
        l.groupBy("l_partkey")
        .agg(F.sum(_revenue_e4()).alias("_e4"))
        .select(
            "l_partkey",
            F.floor((F.col("_e4") + 50) / 100).cast("long").alias("_cents"),
        )
        .withColumn("revenue", F.col("_cents") / 100)
    )
    # the running sum is EXACT-INTEGER cents so the bucketed partial
    # sums (which add in a different order than one global left-to-right
    # window) cannot differ from the oracle by a float ulp at the 6dp
    # rounding boundary; the scale-safe cumulative itself comes from
    # functions.ranking.global_order_stats (percentile-cut buckets +
    # partitioned windows + broadcast prefix offsets — never a
    # single-partition window over the #parts rollup)
    from dbscan_spark.functions.ranking import global_order_stats

    total = per_part.agg(F.sum("_cents").alias("grand"))
    g = global_order_stats(
        per_part,
        [F.desc("revenue"), F.asc("l_partkey")],
        -F.col("revenue"),
        running_sums={"_cum_cents": F.col("_cents")},
    )
    # pure-IEEE floor-half-up at 1e-6 (not round(): Spark rounds the
    # exact decimal of the quotient double, DuckDB multiplies in float —
    # at a 1e-6 grid boundary they can disagree by one step; the shared
    # floor idiom runs identical ops on both engines, and the share is
    # non-negative so floor-half-up == HALF_UP)
    cum_share = (
        F.floor(F.col("_cum_cents") / F.col("grand") * 1000000 + 0.5)
        / 1000000
    )
    return (
        g.join(F.broadcast(total))
        .select(
            "l_partkey",
            "revenue",
            cum_share.alias("cum_share"),
        )
        .select(
            "*",
            F.when(F.col("cum_share") <= 0.8, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy(F.desc("revenue"), "l_partkey")
    )


def quality_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (the dbt-tests / Deequ pattern): one row of
    constraint verdicts for the orders table — key uniqueness, null and
    domain violations, and referential integrity against customer. The
    table-local checks fold into ONE aggregation pass; the FK check is a
    LEFT ANTI join against the (broadcastable) key dim, counted in the
    same output row. At 100 TB this runs as the pre-publish gate in the
    pipeline, and every metric is partial-aggregable."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    local = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("o_orderkey").alias("n_distinct_keys"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpos_total"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_cust"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_bad_status"),
    )
    orphans = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphan_orders"))
    )
    return local.join(F.broadcast(orphans)).select(
        "n_rows",
        "n_distinct_keys",
        (F.col("n_distinct_keys") == F.col("n_rows")).alias("keys_unique"),
        "n_nonpos_total",
        "n_null_cust",
        "n_bad_status",
        "n_orphan_orders",
        (
            (F.col("n_distinct_keys") == F.col("n_rows"))
            & (F.col("n_nonpos_total") == 0)
            & (F.col("n_null_cust") == 0)
            & (F.col("n_bad_status") == 0)
            & (F.col("n_orphan_orders") == 0)
        ).alias("all_pass"),
    )


def agg_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin without a window: per priority, the order carrying
    the max total and the customer carrying the min — ``max_by/min_by``
    fold the answer in ONE partial-aggregable pass, where the
    row_number-window formulation would sort every group. The by-value
    is a (total, key) struct so equal totals tie-break deterministically
    (smallest orderkey / smallest custkey): on the shipped corpus float
    totals never tie (the count_distinct guard column stays true), but
    ties DO occur on replicated data (observed in the sf1.0 scaling
    sweep) and a bare max_by picks an arbitrary row then."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "max_by(o_orderkey,"
                " struct(o_totalprice, -o_orderkey))"
            ).alias("top_orderkey"),
            F.round(F.max("o_totalprice"), 2).alias("top_total"),
            F.expr(
                "min_by(o_custkey,"
                " struct(o_totalprice, o_custkey))"
            ).alias("cheapest_custkey"),
            (
                F.count_distinct("o_totalprice") == F.count(F.lit(1))
            ).alias("totals_unique"),
        )
        .orderBy("o_orderpriority")
    )


def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics surface in one grouped pass: NULLIF manufactures
    nulls (zero discounts/taxes), COUNT skips them, COALESCE imputes,
    and the null-safe equality (Spark ``<=>`` ≡ ANSI IS NOT DISTINCT
    FROM) matches null-to-null where ``=`` would return NULL — the
    semantics every dedup/join on nullable keys silently depends on."""
    l = _t(spark, sf_dir, "lineitem")
    d0 = F.expr("nullif(l_discount, 0.0)")
    t0 = F.expr("nullif(l_tax, 0.0)")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count(d0).alias("n_nonzero_disc"),
            (F.count(F.lit(1)) - F.count(d0)).alias("n_zero_disc"),
            F.round(F.avg(F.coalesce(d0, F.lit(0.05))), 6).alias(
                "avg_imputed_disc"
            ),
            F.sum(F.when(d0.eqNullSafe(t0), 1).otherwise(0))
            .cast("long")
            .alias("n_nullsafe_eq"),
        )
        .orderBy("l_returnflag")
    )


def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money aggregation: the sums run in decimal(18,2) —
    associative-exact, so NO rounding fudge is needed for cross-engine
    hash equality (the one numeric domain where float summation order is
    a non-issue). This is how money columns should aggregate at 100 TB;
    the output casts back to double only for the driver's canonicalizer."""
    o = _t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(dec).cast("double").alias("total_exact"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions in one pass over the embedding column:
    lambda filter (count of positive components), lambda aggregate (sum
    of squares fold), and transform+slice (first 3 components rounded).
    All JVM-side codegen'd lambdas — the idiomatic way to compute on
    array columns without exploding 64 rows per vector (explode would
    multiply the shuffle input 64x at scale for what a per-row fold
    computes in place)."""
    e = load_embeddings(spark, sf_dir)
    v = as_double_array(F.col("embedding"))

    # pure-IEEE floor-half-up, not round(): identical ops on both
    # engines and never a signed zero (see explode_embedding_head)
    def r4(col):
        return F.floor(col * 10000 + 0.5) / 10000

    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        r4(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("sum_sq"),
        r4(F.element_at(v, 1)).alias("c1"),
        r4(F.element_at(v, 2)).alias("c2"),
        r4(F.element_at(v, 3)).alias("c3"),
    )


#: ONE portable ANSI string: Spark executes it via spark.sql over temp
#: views, DuckDB executes the identical text as the oracle — a direct
#: cross-engine SQL-dialect-compliance check (no DataFrame translation
#: in between).
_PORTABLE_SQL = """
    WITH nation_rev AS (
      SELECT n_name AS nation,
             floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                    + 50) / 100) / 100 AS revenue,
             count(*) AS n_lines
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        AND o_orderdate <  TIMESTAMP '2000-01-01'
      GROUP BY n_name)
    SELECT nation, revenue, n_lines,
           rank() OVER (ORDER BY revenue DESC, nation) AS rev_rank
    FROM nation_rev
    ORDER BY rev_rank
"""


def sql_api_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-API surface: registers the tables as temp views and runs
    _PORTABLE_SQL through spark.sql — and the ORACLE entry is the SAME
    string, so the driver's comparison doubles as an ANSI-portability
    check between Spark SQL and DuckDB (joins, CTE, window rank,
    timestamp literals, round). Catalyst plans it identically to the
    DataFrame build (broadcast dims, one agg exchange)."""
    for t in ("lineitem", "orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    df = spark.sql(_PORTABLE_SQL)
    return df.select(
        "nation",
        "revenue",
        "n_lines",
        F.col("rev_rank").cast("long").alias("rev_rank"),
    )


def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) OHLC resample bars — the downsampling shape every
    metrics/market pipeline needs: open = first value by event time,
    close = last, plus high/low/volume. Single groupBy with min_by/max_by
    ordered by the (ts, event_id) struct (the id breaks same-timestamp
    ties deterministically), so open/close come out of the SAME partial-
    aggregated shuffle as high/low — no window pass, no second exchange.
    At 100 TB this is one scan + one fixed-width shuffle on (user, day)."""
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    tkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("user_id", "day")
        .agg(
            F.round(F.min_by("value", tkey), 4).alias("open_v"),
            F.round(F.max("value"), 4).alias("high_v"),
            F.round(F.min("value"), 4).alias("low_v"),
            F.round(F.max_by("value", tkey), 4).alias("close_v"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def window_cume_dist_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows (percent_rank + cume_dist) of each
    customer's lifetime spend within their nation — the percentile-
    position twin of window_ntile_deciles. Spend is rounded BEFORE
    ranking so float summation order can't create engine-specific ties.
    One shuffle for the per-customer agg, one for the per-nation window;
    the broadcast nation dim adds none. The builtin quotients round via
    the pure-IEEE floor-half-up idiom: both engines compute the SAME
    (rank-1)/(n-1) double, but their round() implementations can differ
    by one 1e-6 grid step at the boundary (observed in the sf1.0
    scaling sweep — see explode_embedding_head)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    spend = o.groupBy("o_custkey").agg(
        _sum_money(F.col("o_totalprice")).alias("spend")
    )
    w = Window.partitionBy("n_name").orderBy("spend", "o_custkey")
    return (
        spend.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_custkey").alias("custkey"),
            "spend",
            (
                F.floor(F.percent_rank().over(w) * 1000000 + 0.5) / 1000000
            ).alias("pct_rank"),
            (
                F.floor(F.cume_dist().over(w) * 1000000 + 0.5) / 1000000
            ).alias("cume_dist"),
        )
    )


def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (cheaper-or-equal price, bigger-or-equal size, strict in one). The
    naive operator is the O(n²) NOT EXISTS self-join (the oracle runs
    exactly that); this plan is the O(n log n) distributed shape: per-
    price max-size aggregates (fully partial, distributed), then a
    running strictly-before max over the DISTINCT-PRICE frame only —
    bounded by |distinct prices|, orders of magnitude smaller than the
    table — and a broadcast join back. At 100 TB you'd range-partition
    the running max; the per-row work stays one scan + one tiny join."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    per_price = p.groupBy("p_retailprice").agg(
        F.max("p_size").alias("max_size_at_price")
    )
    w_before = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_stats = per_price.select(
        "p_retailprice",
        "max_size_at_price",
        F.max("max_size_at_price").over(w_before).alias("max_size_cheaper"),
    )
    return (
        p.join(F.broadcast(frontier_stats), "p_retailprice")
        .filter(
            (
                F.col("max_size_cheaper").isNull()
                | (F.col("max_size_cheaper") < F.col("p_size"))
            )
            & (F.col("max_size_at_price") <= F.col("p_size"))
        )
        .select("p_partkey", "p_retailprice", F.col("p_size").cast("long").alias("p_size"))
    )


def events_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with LINEAR interpolation (the interpolate() pairing
    to locf/zero-fill): gap hours get the time-weighted blend of the
    neighboring observed hourly sums; edges fall back to the nearest
    observation. Forward/backward ignore-null window passes run over the
    spine-sized frame (types × hours), never the raw events; inputs are
    pre-rounded so both engines interpolate identical numbers."""
    joined = _hourly_spine_joined(_events(spark, sf_dir))
    w_b = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("sum_value").isNotNull(), F.col("hr"))
    prev_v = F.last("sum_value", ignorenulls=True).over(w_b)
    next_v = F.first("sum_value", ignorenulls=True).over(w_f)
    prev_t = F.last(obs_hr, ignorenulls=True).over(w_b).cast("long")
    next_t = F.first(obs_hr, ignorenulls=True).over(w_f).cast("long")
    t = F.col("hr").cast("long")
    # interpolation in integer (cents × seconds) space: the 2dp inputs
    # become exact cent integers, the time weights are exact second
    # integers, and half-up rounding to 4dp is one floor — so both
    # engines produce bit-identical doubles (float midpoints like
    # 10.63375 otherwise round differently per engine's binary repr)
    prev_c = F.floor(prev_v * 100 + 0.5).cast("long")
    next_c = F.floor(next_v * 100 + 0.5).cast("long")
    d = next_t - prev_t
    c = prev_c * (next_t - t) + next_c * (t - prev_t)
    interp_mid = F.floor((200 * c + d) / (2 * d)) / F.lit(10000.0)
    interp = F.when(F.col("sum_value").isNotNull(), F.col("sum_value")).otherwise(
        F.when(prev_v.isNull(), next_v).otherwise(
            F.when(next_v.isNull(), prev_v).otherwise(interp_mid)
        )
    )
    return joined.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        interp.alias("sum_value_interp"),
    )


def basket_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining (association rules) over order baskets:
    co-occurrence count + lift for part pairs bought together in ≥ 3
    orders. The classic a-priori first stage, shaped for scale: ONE
    shuffle collects each order's distinct part set, pairs expand
    ROW-LOCALLY from the sorted array (HOF transform — no shingle-style
    self-join, no second data-sized exchange), and item supports come
    from a narrow explode+count whose output is #parts rows. Lift uses
    the floor(x·10⁴+0.5) trick so both engines place pairs on the same
    side of every rounding boundary. An order with P parts emits P²/2
    pairs — bounded at 7 for TPC-H orders; on power-law baskets you'd
    cap basket size exactly like _co_order_pairs does for suppliers."""
    # orphan lines (NULL l_orderkey) are no basket: the oracle's
    # count(DISTINCT l_orderkey) excludes NULL while .count() on the
    # collected baskets would include the NULL group — the lift
    # denominators silently diverge by one (round-8 relational
    # shape-fuzz). Excluded explicitly on both engines.
    lp = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isNotNull())
        .select("l_orderkey", "l_partkey")
    )
    # persisted: pair expansion, item supports and the basket count all
    # read the SAME collect_set result — one scan + one exchange total,
    # not one per consumer
    baskets = lp.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    ).persist()
    pair = F.explode(
        F.expr(
            "flatten(transform(ps, (x, i) ->"
            " transform(slice(ps, i + 2, size(ps)), y ->"
            " named_struct('p1', x, 'p2', y))))"
        )
    )
    pair_counts = (
        baskets.select(pair.alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    item_counts = baskets.select(F.explode("ps").alias("pk")).groupBy(
        "pk"
    ).agg(F.count(F.lit(1)).alias("ci"))
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    lift = (
        F.floor(
            F.col("n_both")
            * F.col("n_orders")
            / (F.col("c1") * F.col("c2"))
            * 10000
            + F.lit(0.5)
        )
        / 10000
    )
    return (
        # no broadcast hint on the item-support side: it is #parts rows
        # (huge at catalog scale) — AQE's runtime stats pick broadcast
        # when it actually fits
        pair_counts.join(
            item_counts.select(F.col("pk").alias("p1"), F.col("ci").alias("c1")),
            "p1",
        )
        .join(
            item_counts.select(F.col("pk").alias("p2"), F.col("ci").alias("c2")),
            "p2",
        )
        .crossJoin(F.broadcast(n_orders))
        .select("p1", "p2", "n_both", lift.alias("lift"))
    )


def orc_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → source round-trip under the driver's hash gate (the
    csv/json twins grade the other text formats; this grades the
    columnar sink path): write supplier to ORC, read it back, and
    aggregate with a filter that ORC's stripe statistics can push down
    (tests/test_io.py audits the PushedFilters entry on this exact
    shape). The scratch write is per-call and content-identical, so the
    query stays deterministic."""
    import os
    import tempfile

    s = _t(spark, sf_dir, "supplier")
    path = os.path.join(
        tempfile.mkdtemp(prefix="dbscan_spark_orc_rt_"), "supplier_orc"
    )
    s.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.filter(F.col("s_acctbal") > 0)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            _sum_money(F.col("s_acctbal")).alias("total_acctbal"),
        )
    )


def pysink_supplier_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A from-scratch Python DataSource WRITER (PySpark 4
    ``DataSourceWriter``) under the hash gate — the SINK half of the
    connector surface whose read half pysource_synthetic_events
    grades: write supplier through ``format("manifest_sink")``
    (dbscan_spark/datasource.py — tasks stage JSON-lines part files
    and return commit messages; only the driver's two-phase ``commit``
    promotes them and publishes the manifest), then read back
    EXACTLY the manifest-committed parts and return the rows. The
    hash gate proves the full protocol: a lost partition, an
    uncommitted staged file, or a double-committed speculative
    attempt all change the row multiset; JSON shortest-round-trip
    doubles make the values bit-exact. Scale shape: each task streams
    its partition once (no driver row traffic); commit is
    metadata-sized (one message per task)."""
    import tempfile

    from dbscan_spark.datasource import read_manifest_sink, register

    register(spark)
    s = _t(spark, sf_dir, "supplier")
    path = tempfile.mkdtemp(prefix="dbscan_spark_pysink_")
    s.write.format("manifest_sink").option("path", path).mode(
        "append"
    ).save()
    return read_manifest_sink(spark, path, s.schema).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


def pysource_synthetic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A from-scratch Python DataSource (PySpark 4 connector API) under
    the hash gate: register ``format("synthetic_events")``
    (dbscan_spark/datasource.py), read 50k deterministic generated rows
    across 8 independent partitions, and aggregate. The connector is the
    shape of every custom Python source at scale — the driver plans only
    the partition list; each executor generates its own range — and
    because every field is exact integer arithmetic on the row id, the
    DuckDB oracle regenerates the stream with range() and must hash
    identically."""
    from dbscan_spark import datasource

    datasource.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 50000)
        .option("n_partitions", 8)
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        _sum_money(F.col("value")).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonality profile — the weekly template behind
    traffic forecasting and anomaly baselines: per (event_type, day-of-
    week, hour) event counts, mean value, and each cell's share of its
    type's total. One grouped pass plus a broadcast per-type total
    join-back (never a full-table window); the share uses the
    floor(x·10⁶+0.5) trick so both engines round the exact rational
    identically. Spark's dayofweek is 1-based (Sun=1), DuckDB's 0-based
    — the -1 aligns them."""
    e = _events(spark, sf_dir)
    # mean in exact integer cents (the values are 2dp): S·100/n rounded
    # half-up at 4dp via one floor — float avg() lands on .00005
    # midpoints that the engines' binary reps round apart
    s_cents = F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
    n_c = F.count(F.lit(1))
    cells = e.groupBy(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(
        n_c.alias("n_events"),
        (F.floor((200 * s_cents + n_c) / (2 * n_c)) / 10000.0).alias(
            "avg_value"
        ),
    )
    totals = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    share = F.floor(F.col("n_events") / F.col("n_total") * 1000000 + F.lit(0.5)) / 1000000
    return cells.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "dow",
        "hr",
        "n_events",
        "avg_value",
        share.alias("pct_of_type"),
    )


def events_ab_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-statistic between every pair of event types' value
    distributions — the A/B-experimentation primitive: per-type moments
    (n, Σcents, Σcents²) come from ONE grouped pass in exact integer
    cents, the tiny per-type table self-joins (types², a handful of
    rows), and t = (m1-m2)/√(v1/n1+v2/n2) is the same IEEE expression in
    both engines over exact-integer inputs — deterministic to the bit,
    so the 4dp round can't straddle. At 100 TB the data-sized stage is
    the single moment scan; everything after is constant-size."""
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    c = F.floor(F.col("value") * 100 + 0.5).cast("long")
    # persisted: both sides of the pair self-join read the SAME moment
    # rollup — one scan + one aggregation, not one per side
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("s2"),
    ).persist()
    a, b = m.alias("a"), m.alias("b")
    mean = lambda p: F.col(f"{p}.s") / F.col(f"{p}.n") / 100.0
    var = lambda p: (
        F.col(f"{p}.s2") / F.col(f"{p}.n")
        - (F.col(f"{p}.s") / F.col(f"{p}.n"))
        * (F.col(f"{p}.s") / F.col(f"{p}.n"))
    ) / 10000.0
    t = (mean("a") - mean("b")) / F.sqrt(
        var("a") / F.col("a.n") + var("b") / F.col("b.n")
    )
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            (F.round(t, 4) + F.lit(0.0)).alias("welch_t"),
        )
    )


def stats_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation lineitem return rate with a Wilson 95% score interval
    — the small-sample-safe CI every dashboard should use instead of
    the normal approximation. One conditional-count grouped pass over
    the fact (broadcast nation dims), then the closed-form interval as
    the same IEEE expression in both engines over exact integer counts
    (z=1.96 literal) — bit-deterministic, so the 6dp round is safe."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    counts = (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_returned"),
        )
    )
    z2 = 1.96 * 1.96
    p = F.col("n_returned") / F.col("n_lines")
    nn = F.col("n_lines")
    center = (p + z2 / (2 * nn)) / (1 + z2 / nn)
    half = (
        F.lit(1.96)
        * F.sqrt(p * (1 - p) / nn + z2 / (4 * nn * nn))
        / (1 + z2 / nn)
    )
    return counts.select(
        "nation",
        "n_lines",
        F.col("n_returned").cast("long").alias("n_returned"),
        (F.round(center - half, 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(center + half, 6) + F.lit(0.0)).alias("ci_hi"),
    )


def governance_masked_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level masking view — the governance layer every shared
    warehouse needs before analysts touch PII-ish columns: the name is
    truncated to its stable prefix, the account balance is coarsened to
    a 1000-unit band, and the row keeps a deterministic opaque join
    token (keyed digest of the natural key) so masked extracts still
    join to each other without exposing the key itself. Pure zero-
    shuffle projection; the mask functions are engine-portable, so the
    masked output itself is hash-gated."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.md5(F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")))
        .alias("cust_token"),
        F.concat(F.substring("c_name", 1, 9), F.lit("***")).alias(
            "name_masked"
        ),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("long")
        .alias("acctbal_band"),
        "c_mktsegment",
    )


def events_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection over each event type's daily
    totals — the drift monitor on every ingestion dashboard: the
    running statistic c_t = max(0, c_{t-1} + (x_t − μ)) accumulates
    upward deviations and alerts when it exceeds 2μ. The recurrence is
    order-dependent (not prefix-decomposable), so like the EWMA it
    folds each type's day-ordered series inside ONE aggregate HOF after
    a day-rollup — per-group state is #days, never raw events. All
    arithmetic is exact integers: cents scaled by n_days clears the μ
    = S/n division (c'_t = max(0, c'_{t-1} + n·x_t − S), alert at
    2·n·μ = 2S), so both engines fold identical longs; the DuckDB
    oracle replays the recurrence with a recursive CTE."""
    # known-type series only: a NULL event_type cannot ride the
    # oracle's recursive-CTE equality joins (NULL never equals NULL),
    # and a per-type monitor keyed by "unknown type" is not a
    # meaningful series (round-8 relational shape-fuzz)
    e = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .filter(F.col("event_type").isNotNull())
    )
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("x"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("ds"),
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("s_tot"),
    )
    # fold seeded with a sentinel 0 so element_at(acc, -1) is total; the
    # seed is sliced off before the explode
    fold = F.aggregate(
        F.col("ds"),
        F.expr("array(0L)"),
        lambda acc, s: F.concat(
            acc,
            F.array(
                F.greatest(
                    F.lit(0).cast("long"),
                    F.element_at(acc, -1)
                    + (F.col("n_days") * s["x"] - F.col("s_tot")),
                )
            ),
        ),
    )
    run = series.select(
        "event_type",
        "s_tot",
        F.arrays_zip(
            F.expr("transform(ds, s -> s.day)").alias("day"),
            F.slice(fold, 2, F.size("ds")).alias("c"),
        ).alias("z"),
    )
    return run.select(
        "event_type", F.explode("z").alias("zz"), "s_tot"
    ).select(
        "event_type",
        F.col("zz.day").alias("day"),
        F.col("zz.c").alias("cusum_scaled"),
        (F.col("zz.c") > 2 * F.col("s_tot")).alias("alert"),
    )


def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) over each event
    type's daily totals, with a 3-day-ahead forecast — the step up from
    the EWMA: a TWO-state sequential recurrence (α=0.25, β=0.5, both
    exact binary fractions). Like the EWMA/CUSUM it folds the
    day-ordered series inside ONE aggregate HOF with a struct
    accumulator (per-group state = #days); each step's level and trend
    are floor-half-up quantized at 1e-4 — the k-means trajectory-pinning
    trick — so summation noise cannot compound and the DuckDB
    recursive-CTE replay reproduces the exact doubles."""
    # known-type series only: a NULL event_type cannot ride the
    # oracle's recursive-CTE equality joins (NULL never equals NULL),
    # and a per-type monitor keyed by "unknown type" is not a
    # meaningful series (round-8 relational shape-fuzz)
    e = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .filter(F.col("event_type").isNotNull())
    )
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("x"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))),"
            " s -> s.x / 100.0D)"
        ).alias("xs")
    ).filter(F.size("xs") >= 2)

    def q(col):
        return F.floor(col * 10000 + F.lit(0.5)) / 10000

    x1 = F.element_at(F.col("xs"), 1)
    x2 = F.element_at(F.col("xs"), 2)

    def step(acc, x):
        l_new = q(F.lit(0.25) * x + F.lit(0.75) * (acc["l"] + acc["b"]))
        b_new = q(F.lit(0.5) * (l_new - acc["l"]) + F.lit(0.5) * acc["b"])
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    fold = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        F.struct(x1.alias("l"), (x2 - x1).alias("b")),
        step,
    )
    return series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        fold["l"].alias("level"),
        fold["b"].alias("trend"),
        q(fold["l"] + 3 * fold["b"]).alias("forecast_3"),
    )


def geo_points_in_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's containment theta-join (O8, DBSCAN.scala:108-112)
    exposed as a standalone graded spatial operator: assign 2-D points
    to every rectangle that contains them (border-INCLUSIVE, like
    DBSCANRectangle.contains, DBSCANRectangle.scala:34-36 — a point on
    a shared edge lands in BOTH boxes, the duplication the margin logic
    relies on) and count per box. The box list is tiny and broadcast;
    the plan is a BroadcastNestedLoopJoin with a pure range predicate —
    the same physical shape the DBSCAN pipeline uses, here hash-gated
    directly. 4×4 grid over [-0.2, 0.2]²."""
    pts = load_embeddings(spark, sf_dir).select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    cells = [
        (4 * i + j, -0.2 + 0.1 * i, -0.2 + 0.1 * j)
        for i in range(4)
        for j in range(4)
    ]
    boxes = spark.createDataFrame(
        [(b, x, y, x + 0.1, y + 0.1) for b, x, y in cells],
        "box_id long, bx double, by double, bx2 double, by2 double",
    )
    cond = (
        (F.col("x") >= F.col("bx"))
        & (F.col("x") <= F.col("bx2"))
        & (F.col("y") >= F.col("by"))
        & (F.col("y") <= F.col("by2"))
    )
    return (
        pts.join(F.broadcast(boxes), cond)
        .groupBy("box_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


def partitioned_prune_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink + partition-PRUNED read under the hash
    gate: write events partitioned by event_type to scratch, read the
    directory back, and aggregate ONE type — the reader must touch only
    that partition's files (PartitionFilters, asserted in
    tests/test_plans.py), which at 100 TB is the difference between
    scanning 1/5th and 5/5ths of the table. Values are hash-checked
    against the unpartitioned source."""
    import os
    import tempfile

    e = _events(spark, sf_dir)
    path = os.path.join(
        tempfile.mkdtemp(prefix="dbscan_spark_part_"), "events_by_type"
    )
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_money(F.col("value")).alias("total_value"),
        )
    )


def json_corrupt_tolerant_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input tolerance — the ingestion reality every 100 TB
    pipeline faces: a JSON-lines batch containing broken records must
    parse in PERMISSIVE mode (bad lines captured in _corrupt_record,
    good lines unaffected) instead of failing the job or silently
    corrupting rows. The query materializes the events JSON mirror plus
    three injected garbage lines, reads with an explicit schema +
    columnNameOfCorruptRecord, REPORTS the corrupt count (pinned: 3,
    proving capture), and aggregates only the clean rows — which must
    hash-match the parquet source exactly (the oracle never sees the
    garbage)."""
    import os
    import tempfile

    from dbscan_spark.io import events_json_dir

    src = events_json_dir(spark, sf_dir)
    scratch = os.path.join(
        tempfile.gettempdir(),
        "dbscan_spark_corrupt_" + sf_dir.strip("/").replace("/", "_"),
    )
    os.makedirs(scratch, exist_ok=True)
    dst = os.path.join(scratch, "events_with_garbage.json")
    if not os.path.exists(dst):
        import shutil

        json_files = [
            os.path.join(src, f)
            for f in os.listdir(src)
            if f.endswith(".json")
        ]
        with open(dst + ".tmp", "wb") as out:
            for f in sorted(json_files):
                with open(f, "rb") as i:
                    shutil.copyfileobj(i, out)
            out.write(
                b'{"event_id": broken\nnot json at all\n{"ts": "}\n'
            )
        os.replace(dst + ".tmp", dst)
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string, "
        "_corrupt_record string"
    )
    e = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dst)
    ).persist()
    n_corrupt = e.filter(F.col("_corrupt_record").isNotNull()).count()
    assert n_corrupt == 3, f"corrupt capture broke: {n_corrupt}"
    return (
        e.filter(F.col("_corrupt_record").isNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_money(F.col("value")).alias("sum_value"),
        )
    )


def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution (mergeSchema) — the table-format reality: an old
    batch written without a column and a new batch written with it must
    read back as ONE table with the missing column null-filled. Writes
    two parquet batches of events (the second adds value_band), reads
    the directory with mergeSchema=true, and aggregates across both —
    counts split by whether the evolved column is present, values
    hash-checked against the single-source oracle."""
    import os
    import tempfile

    e = _events(spark, sf_dir)
    path = os.path.join(
        tempfile.mkdtemp(prefix="dbscan_spark_evo_"), "events_evo"
    )
    old = e.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", "value"
    )
    new = e.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        "event_type",
        "value",
        (F.floor(F.col("value") / 25) * 25).cast("long").alias("value_band"),
    )
    old.write.mode("overwrite").parquet(os.path.join(path, "batch=old"))
    new.write.mode("overwrite").parquet(os.path.join(path, "batch=new"))
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy(
        "event_type", F.col("value_band").isNotNull().alias("has_band")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _sum_money(F.col("value")).alias("sum_value"),
    )


def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel CONVERSION LATENCY — the "how long does the funnel take"
    companion to events_funnel's "how many convert": per converting
    user, seconds from first view to the first in-order click and
    purchase, rolled up to exact quartiles per stage. Same user-keyed
    join chain as the funnel (co-partitioned after the first exchange);
    the percentile aggregate runs over the (small) converted-user
    latencies with exact integer-second inputs, quantized floor-half-up
    so cross-engine interpolation can't diverge."""
    e = _events(spark, sf_dir)
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"), F.first("v_ts").alias("v_ts2"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(clicks.select("user_id", "c_ts"), "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = (
        views.join(clicks.select("user_id", "c_ts"), "user_id")
        .join(purchases, "user_id")
        .select(
            (
                F.col("c_ts").cast("timestamp").cast("long")
                - F.col("v_ts").cast("timestamp").cast("long")
            ).alias("view_to_click_s"),
            (
                F.col("p_ts").cast("timestamp").cast("long")
                - F.col("c_ts").cast("timestamp").cast("long")
            ).alias("click_to_purchase_s"),
        )
    )
    # manual linear-interpolation quantiles over the sorted array:
    # engines disagree on percentile() index conventions, so the
    # (n-1)·p arithmetic is written out identically on both sides —
    # exact-quarter fractions over integer seconds ⇒ exact doubles
    arrs = lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.array_sort(F.collect_list("view_to_click_s")).alias("a_v2c"),
        F.array_sort(F.collect_list("click_to_purchase_s")).alias("a_c2p"),
    )

    def qcol(arr: str, p: float):
        idx = (F.size(arr) - 1) * F.lit(p)
        lo_i = F.floor(idx).cast("int")
        frac = idx - F.floor(idx)
        lo = F.element_at(F.col(arr), lo_i + 1).cast("double")
        hi = F.element_at(
            F.col(arr), F.least(lo_i + 2, F.size(arr))
        ).cast("double")
        return lo + frac * (hi - lo)

    return arrs.select(
        "n_converted",
        qcol("a_v2c", 0.25).alias("v2c_p25"),
        qcol("a_v2c", 0.5).alias("v2c_p50"),
        qcol("a_v2c", 0.75).alias("v2c_p75"),
        qcol("a_c2p", 0.25).alias("c2p_p25"),
        qcol("a_c2p", 0.5).alias("c2p_p50"),
        qcol("a_c2p", 0.75).alias("c2p_p75"),
    )


def orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of monthly order revenue:
    observed = trend (centered 3-month moving average) + seasonal
    (month-of-year mean of the detrended series) + residual — the
    explainability workhorse behind every demand dashboard. The series
    is ~80 monthly points (one narrow rollup of the fact), so the
    windows run over a tiny frame; exactness comes from integer cents:
    the detrended value is kept in cents×3 integer units (3·x −
    window_sum) until the final floor-half-up rounding, and the
    seasonal mean divides integer sums — so both engines place every
    component on the same side of the 4dp boundary. Edge months
    (incomplete centered window) carry NULL trend/seasonal/residual,
    matching statsmodels' convention."""
    # dated rows only: a NULL order date has no month/cohort slot
    # (round-8 relational shape-fuzz; the oracle carries the same WHERE)
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.month("o_orderdate").cast("long").alias("moy"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("xc")
    )
    w3 = Window.orderBy("month").rowsBetween(-1, 1)
    with_t = monthly.select(
        "month",
        "moy",
        "xc",
        F.sum("xc").over(w3).alias("sw"),
        F.count(F.lit(1)).over(w3).alias("cw"),
    ).withColumn(
        "detr3",
        F.when(F.col("cw") == 3, 3 * F.col("xc") - F.col("sw")),
    )
    seas = with_t.filter(F.col("detr3").isNotNull()).groupBy("moy").agg(
        F.sum("detr3").alias("sm"), F.count(F.lit(1)).alias("nm")
    )
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
    joined = with_t.join(F.broadcast(seas), "moy", "left")
    trend = q4(F.col("sw") / (3 * 100.0))
    seasonal = q4(F.col("sm") / (F.col("nm") * 3 * 100.0))
    return joined.select(
        "month",
        (F.col("xc") / 100.0).alias("observed"),
        F.when(F.col("cw") == 3, trend).alias("trend"),
        F.when(F.col("cw") == 3, seasonal).alias("seasonal"),
        F.when(
            F.col("cw") == 3,
            q4(F.col("xc") / 100.0 - trend - seasonal),
        ).alias("residual"),
    )


def events_dn_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N retention curve — the growth metric next to the weekly
    cohort triangle (retention_cohorts): for each first-seen day, the
    fraction of that day's new users active again exactly N days later,
    N ∈ {1, 7, 14}. One per-user min-aggregation for the cohort day,
    one distinct (user, day) activity set, and three conditional-count
    joins ALL keyed on user_id — co-partitioned after the first
    exchange, nothing quadratic. Rates use the floor(x·10⁶+0.5) trick
    over exact counts."""
    e = _events(spark, sf_dir)
    first = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("d0")
    )
    active = e.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    j = first.join(active, "user_id").select(
        "user_id", "d0", F.datediff("d", "d0").alias("dn")
    )
    rate = lambda n: (
        F.floor(
            F.countDistinct(F.when(F.col("dn") == n, F.col("user_id")))
            / F.countDistinct("user_id")
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    return j.groupBy(
        F.date_format("d0", "yyyy-MM-dd").alias("cohort_day")
    ).agg(
        F.countDistinct("user_id").alias("n_new_users"),
        rate(1).alias("d1_retention"),
        rate(7).alias("d7_retention"),
        rate(14).alias("d14_retention"),
    )


def customers_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle — cumulative revenue per first-order-month
    cohort by months-since-first-order: the customer-lifetime-value
    curve every subscription/commerce dashboard tracks. Per-customer
    first month (one rollup), month-index join back (user-keyed), then
    a cumulative window over the per-(cohort, index) rollup — the
    window runs over #cohorts × #indices rows, never raw orders.
    Revenue accumulates in exact integer cents and converts once."""
    # dated rows only: a NULL order date has no month/cohort slot
    # (round-8 relational shape-fuzz; the oracle carries the same WHERE)
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    om = o.select(
        "o_custkey",
        F.trunc("o_orderdate", "month").alias("m"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    first = om.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    idx = om.join(first, "o_custkey").select(
        "o_custkey",
        "m0",
        (
            (F.year("m") - F.year("m0")) * 12
            + (F.month("m") - F.month("m0"))
        ).cast("long").alias("month_index"),
        "cents",
    )
    cell = idx.groupBy(
        F.date_format("m0", "yyyy-MM").alias("cohort_month"),
        "month_index",
    ).agg(F.sum("cents").alias("c"))
    wc = (
        Window.partitionBy("cohort_month")
        .orderBy("month_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        "cohort_month",
        "month_index",
        (F.col("c") / 100.0).alias("month_revenue"),
        (F.sum("c").over(wc) / 100.0).alias("cum_revenue"),
    )


def governance_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten erasure + audit — the other half of the
    governance pair next to masking: given a tombstone list (here the
    deterministic user_id % 100 == 7 cohort), anti-join the event log
    and report, per event type, the surviving row count AND the purged
    count (erasure jobs must prove both what remains and what was
    removed). The tombstone side is a small broadcast; the purge is one
    scan classifying each row — at 100 TB this runs as the rewrite job
    that materializes the post-erasure table, with this exact audit as
    its summary output."""
    e = _events(spark, sf_dir)
    is_tomb = F.col("user_id") % 100 == 7
    return e.groupBy("event_type").agg(
        F.sum(F.when(~is_tomb, 1).otherwise(0)).cast("long").alias(
            "n_kept"
        ),
        F.sum(F.when(is_tomb, 1).otherwise(0)).cast("long").alias(
            "n_purged"
        ),
        F.countDistinct(F.when(is_tomb, F.col("user_id"))).alias(
            "n_users_erased"
        ),
    )


def governance_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the third governance leg next to masking and
    erasure: group the customer table by its quasi-identifier tuple
    (nation, market segment, account-balance band) and flag every group
    smaller than k=5 as re-identifiable (publishing such a slice lets an
    attacker with the QI attributes single customers out). Output is one
    row per occupied QI cell with its member count and risk flag — the
    table a release-review process reads before approving an export.

    Scale: ONE partial-aggregated groupBy whose key domain is bounded by
    the QI grid (25 nations × 5 segments × ~12 balance bands), not by
    the data — the group table stays a few thousand rows at any corpus
    size. The balance band is floor(acctbal/1000.0) in double on both
    engines (identical expression tree → identical IEEE result)."""
    c = _t(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal").cast("double") / 1000.0).cast("long")
    return (
        c.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            band.alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(
            "nationkey",
            "segment",
            "bal_band",
            "n_members",
            (F.col("n_members") < 5).alias("risky"),
        )
    )


def join_asof_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the mirror of join_asof_last_click's
    backward bound: for each purchase, the user's next 'view' STRICTLY
    after it (post-purchase browsing latency). Same scale-correct
    union + one keyed shuffle + one window composition; the forward
    frame is ``first(ignorenulls)`` over [current, unbounded following]
    with view rows sorted BEFORE purchases at equal timestamps, which
    implements the exclusive (>) bound. Oracle: plain min-over-future
    aggregate in SQL."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    l = purchases.select(
        F.col("user_id").alias("_k"),
        F.col("ts").alias("_ts"),
        F.lit(1).alias("_side"),
        "event_id",
        F.lit(None).cast("timestamp").alias("_vts"),
    )
    r = views.select(
        F.col("user_id").alias("_k"),
        F.col("ts").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("_vts"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        l.unionByName(r)
        .withColumn("_next_v", F.first("_vts", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            "event_id",
            F.col("_k").alias("user_id"),
            F.col("_next_v").alias("next_view_ts"),
            F.expr(
                "timestampdiff(MICROSECOND, _ts, _next_v)"
            ).alias("micros_to_view"),
        )
    )


def events_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-ADJUSTED anomaly flags — the fourth member of the
    anomaly family (z-score, MAD, CUSUM, and now deseasonalized): each
    (type, day) daily total is compared against its type's
    day-of-week mean, and deviations beyond 2× the type's global
    mean absolute deviation-from-dow-mean are flagged. A raw z-score
    fires every weekend on weekly-patterned traffic; removing the dow
    component first is the standard fix. All in n_days-scaled exact
    integer cents (same clearing trick as CUSUM): dev = n_dow·x − S_dow
    stays integral, and the MAD threshold comparison cross-multiplies
    instead of dividing. Three narrow rollups, all on tiny frames."""
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    daily = e.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("x"))
    dow_stats = daily.groupBy("event_type", "dow").agg(
        F.sum("x").alias("s_dow"), F.count(F.lit(1)).alias("n_dow")
    )
    # dev_scaled = n_dow*x - s_dow  (units: cents × n_dow) — rescale to
    # common per-type units by dividing by n_dow ONLY inside the exact
    # comparison below (cross-multiplied, never an actual division)
    j = daily.join(F.broadcast(dow_stats), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "x",
        "n_dow",
        (F.col("n_dow") * F.col("x") - F.col("s_dow")).alias("dev_s"),
    )
    # MAD of the per-day deviations in TRUE cents: |dev_s| / n_dow is
    # rational; its mean over days multiplies out to exact integers:
    # flag iff |dev_s| * n_days * N > 2 * n_dow * Σ(|dev_s'|·N/n_dow')
    # — clear denominators with N = Π distinct n_dow? Simpler and still
    # exact: compare against the mean computed in double from exact
    # integer ratios quantized once (floor 1e-4); identical on both
    # engines because the expression tree is identical.
    mad = j.groupBy("event_type").agg(
        (
            F.floor(
                F.avg(F.abs(F.col("dev_s")) / F.col("n_dow")) * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("mad_c"),
        F.count(F.lit(1)).alias("n_days"),
    )
    out = j.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        (F.col("x") / 100.0).alias("day_total"),
        (
            F.floor(
                F.col("dev_s") / F.col("n_dow") / 100.0 * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("dev_from_dow_mean"),
        (
            F.abs(F.col("dev_s") / F.col("n_dow"))
            > 2 * F.col("mad_c")
        ).alias("is_anomaly"),
    )
    return out


def events_pattern_vvp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style event-pattern detection (CEP): count, per
    user, occurrences of the consecutive pattern view → view → purchase
    in the (ts, event_id)-ordered stream — the "browsing burst converts"
    motif. A fixed-length pattern needs no state machine: two lags over
    ONE user-keyed sort exchange detect every match (the k-gram trick;
    longer/variable patterns would fold the collected sequence like the
    EWMA). Only matching users are returned."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hit = (
        (F.col("event_type") == "purchase")
        & (F.lag("event_type", 1).over(w) == "view")
        & (F.lag("event_type", 2).over(w) == "view")
    )
    return (
        e.select("user_id", hit.cast("long").alias("m"))
        .groupBy("user_id")
        .agg(F.sum("m").alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )


def rel_division_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION — the "for all" operator classic engines
    leave to rewrites: customers whose orders cover EVERY order-priority
    class. The double-NOT-EXISTS textbook form becomes one grouped
    count-distinct compared to the (1-row, broadcast) universe size —
    a single fact shuffle on the dividend key, no nested anti-joins.
    Returns each qualifying customer with their order count."""
    o = _t(spark, sf_dir, "orders")
    # countDistinct, NOT distinct()+count: a NULL priority row is a
    # DISTINCT row but not a countDistinct class, so the universe would
    # be one larger than any customer's n_covered and the result would
    # silently go EMPTY the day one dirty row lands (round-8 relational
    # shape-fuzz finding; count(DISTINCT) excludes NULL on both engines).
    universe = o.agg(F.countDistinct("o_orderpriority").alias("n_classes"))
    per_cust = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_covered"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        per_cust.crossJoin(F.broadcast(universe))
        .filter(F.col("n_covered") == F.col("n_classes"))
        .select("o_custkey", "n_orders")
    )


def users_feature_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store materialization — the per-entity feature vector a
    training pipeline snapshots: one user-keyed pass assembling
    per-type event counts (conditional aggregation = a static pivot),
    total/mean spend in exact cents, activity span in days, and
    recency rank. ONE shuffle on user_id for the whole vector; the
    recency decile is an exact global ntile(10) over the per-user
    rollup computed scale-safe via functions.ranking.global_order_stats
    (bucketed row_number + ntile formula — never a single-partition
    window over #users rows)."""
    e = _events(spark, sf_dir)
    cnt = lambda t: F.sum(
        F.when(F.col("event_type") == t, 1).otherwise(0)
    ).cast("long").alias(f"n_{t}")
    base = e.groupBy("user_id").agg(
        cnt("view"),
        cnt("click"),
        cnt("purchase"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.coalesce(F.floor(F.col("value") * 100 + 0.5).cast("long"), F.lit(0))
        ).alias("cents"),
        F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts")))
        .cast("long")
        .alias("active_days_span"),
        F.max("ts").alias("_last_ts"),
    )
    from dbscan_spark.functions.ranking import (
        global_order_stats,
        ntile_from_rank,
    )

    g = global_order_stats(
        base,
        [F.desc("_last_ts"), F.asc("user_id")],
        -F.col("_last_ts").cast("timestamp").cast("double"),
        rn="_rn",
        total_count="_n",
    )
    return g.select(
        "user_id",
        "n_view",
        "n_click",
        "n_purchase",
        "n_events",
        (F.col("cents") / 100.0).alias("total_value"),
        "active_days_span",
        ntile_from_rank(10, F.col("_rn"), F.col("_n")).alias(
            "recency_decile"
        ),
    )


def text_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/packing chunker: split every document into overlapping
    200-char chunks with a 50-char stride overlap (chunk k covers
    [150k, 150k+200)) — the retrieval-corpus preparation step between
    cleaning and embedding. Chunking is a row-local transform+explode
    (zero shuffle at any scale); each chunk carries its offset, length
    and content hash so the downstream embedder/indexer joins back
    exactly. Char-based substring semantics match across engines."""
    d = load_table(spark, sf_dir, "documents")
    n_chunks = F.expr(
        "int(greatest(floor((length(text) - 51) / 150), 0)) + 1"
    )
    chunk = F.expr(
        "transform(sequence(0, int(greatest(floor((length(text) - 51)"
        " / 150), 0))),"
        " k -> named_struct("
        "   'chunk_idx', CAST(k AS BIGINT),"
        "   'start', CAST(k * 150 AS BIGINT),"
        "   'chunk_len', CAST(length(substring(text, k * 150 + 1, 200))"
        "                     AS BIGINT),"
        "   'chunk_md5', md5(substring(text, k * 150 + 1, 200))))"
    )
    return (
        d.select("doc_id", F.explode(chunk).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.start").alias("start"),
            F.col("c.chunk_len").alias("chunk_len"),
            F.col("c.chunk_md5").alias("chunk_md5"),
        )
    )


def sql_udf_value_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDF registered INTO the SQL surface —
    ``spark.udf.register`` of an Arrow-batched pandas UDF, then invoked
    from a plain ``spark.sql`` string (the taxonomy leg where analysts
    call Python logic from SQL they write themselves; the DataFrame-API
    legs are covered by the UDTF/UDAF/mapInPandas queries). The tier
    rule is deliberately trivial so the oracle states it as a CASE — the
    graded property is the registration + SQL-invocation path, with
    Arrow batching confirmed by the no-BatchEvalPython plan audit that
    sweeps every query."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and pandas_udf can't resolve 'pd.Series' against
    # a function-local import
    @pandas_udf("string")
    def value_tier(v):
        return pd.Series(
            np.where(
                v.isna(), "none",
                np.where(v < 10, "low", np.where(v < 60, "mid", "high")),
            )
        )

    spark.udf.register("value_tier", value_tier)
    _events(spark, sf_dir).createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT event_type, value_tier(value) AS tier,
               count(*) AS n_events
        FROM events_v
        GROUP BY event_type, value_tier(value)
        """
    )


def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the lag-12 companion to
    the day-over-day deltas: monthly totals in exact cents, each month
    compared to the same month one year earlier (lag 12 over the
    ~80-row monthly rollup; NULL for the first year). Growth is the
    exact-integer ratio floor-rounded at 1e-4."""
    # a monthly time series is over DATED rows only: a NULL order date
    # has no month, and its group would sit at engine-dependent ends of
    # the lag-12 window (round-8 relational shape-fuzz)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("c")
    )
    w = Window.orderBy("month")
    prev = F.lag("c", 12).over(w)
    return monthly.select(
        "month",
        (F.col("c") / 100.0).alias("revenue"),
        F.when(
            prev.isNotNull(),
            F.floor((F.col("c") - prev) / prev * 10000 + F.lit(0.5))
            / 10000,
        ).alias("yoy_growth"),
    )


def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts — the engagement-
    inequality / dataset-skew metric (a Gini near 1 means a handful of
    power users dominate the corpus, which biases training data): G =
    2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over the ascending-sorted counts. The
    exact global rank i comes from functions.ranking.global_order_stats
    over the per-user ROLLUP (#users rows; bucketed partitioned
    windows, never one global window task), all sums are exact
    integers, and the final expression is one identical rational → the
    floor-1e-6 round is engine-exact."""
    from dbscan_spark.functions.ranking import global_order_stats

    e = _events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    ranked = global_order_stats(
        per_user, [F.asc("x"), F.asc("user_id")], F.col("x"), rn="i"
    ).select("x", "i")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        (
            F.floor(
                (
                    2 * F.sum(F.col("i") * F.col("x"))
                    / (F.count(F.lit(1)) * F.sum("x"))
                    - (F.count(F.lit(1)) + 1) / F.count(F.lit(1))
                )
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("gini"),
    )


def supplier_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index per nation:
    Σ shareᵢ² × 10000 over each nation's supplier revenue shares — the
    antitrust-style concentration screen (HHI > 2500 = concentrated).
    Revenue accumulates in exact cents; shares divide by the nation
    total via a broadcast join-back, and the share-square sum is the
    only float aggregation (noise ~1e-16 under the 1e-4 floor)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "s_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("c")
        )
    )
    tot = rev.groupBy("nation").agg(F.sum("c").alias("t"))
    share2 = (F.col("c") / F.col("t")) * (F.col("c") / F.col("t"))
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (
                F.floor(F.sum(share2) * 10000 * 10000 + F.lit(0.5)) / 10000
            ).alias("hhi_points"),
        )
    )


def lineitem_chi2_status_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between line status and return flag —
    the categorical-association member of the inference family (Welch's
    t for means, Wilson for rates, χ² for contingency): observed cell
    counts vs the rank-1 expected r·c/N, χ² = Σ(o−e)²/e over the contingency
    cells. One grouped count of the fact table; marginals broadcast;
    every arithmetic input is an exact integer so the per-cell terms
    are engine-identical rationals (summation of 21 terms under a 1e-4
    floor)."""
    l = _t(spark, sf_dir, "lineitem")
    cells = l.groupBy("l_linestatus", "l_returnflag").agg(
        F.count(F.lit(1)).alias("o")
    )
    rows = cells.groupBy("l_linestatus").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("l_returnflag").agg(F.sum("o").alias("cc"))
    tot = cells.agg(F.sum("o").alias("n"))
    e_exp = F.col("r") * F.col("cc") / F.col("n")
    term = (F.col("o") - e_exp) * (F.col("o") - e_exp) / e_exp
    joined = (
        cells.join(F.broadcast(rows), "l_linestatus")
        .join(F.broadcast(cols), "l_returnflag")
        .crossJoin(F.broadcast(tot))
    )
    return joined.agg(
        (F.floor(F.sum(term) * 10000 + F.lit(0.5)) / 10000).alias("chi2"),
        (
            (F.countDistinct("l_linestatus") - 1)
            * (F.countDistinct("l_returnflag") - 1)
        ).alias("dof"),
    )


def events_bot_suspects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation detection — the trust-and-safety screen a
    training-data pipeline runs before user-generated text enters the
    corpus: users whose inter-arrival gaps are suspiciously regular
    (machine cadence) at volume. Gaps in exact epoch seconds via one
    user-keyed lag window; per-user mean/variance of gaps from exact
    integer sums (n·Σg² − (Σg)² stays integral — no float until the
    final scaled comparison); every user with ≥ 20 gaps is returned with an
    is_suspect flag (cv below 0.1, the cv² compared cross-multiplied
    in exact integers, never divided) — the flag logic stays
    hash-verified even on an organic corpus with no bots."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.col("ts").cast("timestamp").cast("long")
            - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    st = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sg2"),
    )
    # cv² = var/mean² = (n·Σg² − (Σg)²) / (Σg)²  <  0.01
    # ⇔ 100·(n·Σg² − (Σg)²) < (Σg)²   — exact integer comparison
    var_num = F.col("n_gaps") * F.col("sg2") - F.col("sg") * F.col("sg")
    return (
        st.filter(F.col("n_gaps") >= 20)
        .select(
            "user_id",
            "n_gaps",
            (100 * var_num < F.col("sg") * F.col("sg")).alias("is_suspect"),
            (
                F.floor(F.col("sg") / F.col("n_gaps") * 100 + F.lit(0.5))
                / 100
            ).alias("mean_gap_s"),
            (
                F.floor(
                    F.sqrt(
                        var_num
                        / (F.col("n_gaps") * F.col("n_gaps"))
                    )
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("stddev_gap_s"),
        )
    )


def er_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match entity resolution — the edit-distance join
    class (record linkage): match customer names against supplier
    names via BLOCK-then-VERIFY, never all-pairs. Names are normalized
    (lowercase, non-alphanumerics stripped), blocked on their trailing
    3 characters (the stand-in for a phonetic/prefix blocking key —
    candidates only form within a block, so the join is equi-keyed and
    shuffle-bounded by block sizes at any scale), and candidates are
    verified with exact Levenshtein distance ≤ 6 (JVM built-in; the
    'customer'/'supplier' stems differ by 5 edits, so same-number and
    near-number entities match). Output: each customer's single best
    match (lowest distance, lowest s_suppkey tie-break).

    EXACT DuckDB oracle: same normalization, blocking, levenshtein
    (both engines implement the standard DP edit distance on these
    ASCII keys), and best-match window."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_replace(F.lower("c_name"), "[^a-z0-9]", "").alias("cn"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.regexp_replace(F.lower("s_name"), "[^a-z0-9]", "").alias("sn"),
    )
    cand = cust.withColumn("blk", F.substring("cn", -3, 3)).join(
        supp.withColumn("blk", F.substring("sn", -3, 3)), "blk"
    )
    verified = cand.withColumn(
        "distance", F.levenshtein("cn", "sn").cast("long")
    ).filter(F.col("distance") <= 6)
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_custkey").orderBy(
        F.asc("distance"), F.asc("s_suppkey")
    )
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "distance")
    )


def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto-optimal) operator: orders not DOMINATED by
    any other order — no order is both at-least-as-recent AND
    at-least-as-large with one strict (the maximize-both skyline over
    (o_orderdate, o_totalprice); ties on both dims keep both rows).
    The multi-criteria shortlist op (best trade-offs, no weighting).

    Scale shape — never the quadratic NOT-EXISTS: dominance against a
    later-OR-EQUAL date decomposes into (a) the suffix-max price over
    STRICTLY-later dates and (b) the max price within the SAME date.
    Both come from one date-keyed aggregate whose output is
    calendar-bounded (#distinct dates — ~10⁴ rows at any corpus size),
    so the suffix-max window runs over that tiny table and the checks
    broadcast back as a row-local filter. One corpus shuffle total.
    NULL date/price rows are excluded (dominance is undefined on them
    — the r8 dated-row domain-restriction convention). EXACT oracle:
    the same decomposition in SQL, proven equal to the quadratic
    NOT-EXISTS form on the test corpus."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    per_date = o.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("mp")
    )
    w = (
        Window.orderBy(F.desc("o_orderdate"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # single-task window, deliberately: the input is the per-date
    # aggregate, bounded by the calendar — not the fact table
    sfx = per_date.select(
        "o_orderdate",
        "mp",
        F.max("mp").over(w).alias("later_max"),
    )
    return (
        o.join(F.broadcast(sfx), "o_orderdate")
        .filter(
            ~F.coalesce(
                F.col("later_max") >= F.col("o_totalprice"), F.lit(False)
            )
            & ~(F.col("mp") > F.col("o_totalprice"))
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Registry + oracle SQL
# --------------------------------------------------------------------------

QUERIES = {
    "er_fuzzy_name_match": er_fuzzy_name_match,
    "skyline_orders": skyline_orders,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q10_returned_items": q10_returned_items,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q4_order_priority": q4_order_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_dormant_customers": q22_dormant_customers,
    "q12_late_lines_priority": q12_late_lines_priority,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_variety": q16_supplier_variety,
    "q20_heavy_shippers": q20_heavy_shippers,
    "q21_sole_faulty_supplier": q21_sole_faulty_supplier,
    "scan_filter_project": scan_filter_project,
    "join_left_outer": join_left_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_theta_late_ship": join_theta_late_ship,
    "join_asof_last_click": join_asof_last_click,
    "agg_priority_stats": agg_priority_stats,
    "agg_count_distinct": agg_count_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_having": agg_having,
    "window_topk_parts": window_topk_parts,
    "window_order_gaps": window_order_gaps,
    "window_running_total": window_running_total,
    "window_rank_dense": window_rank_dense,
    "window_ntile_deciles": window_ntile_deciles,
    "unpivot_part_measures": unpivot_part_measures,
    "sort_limit_top_items": sort_limit_top_items,
    "setop_intersect": setop_intersect,
    "setop_except": setop_except,
    "setop_union_all": setop_union_all,
    "scalar_string_math": scalar_string_math,
    "scalar_regex": scalar_regex,
    "agg_filtered_counts": agg_filtered_counts,
    "window_first_last": window_first_last,
    "window_range_30d_spend": window_range_30d_spend,
    "agg_share_of_total": agg_share_of_total,
    "scalar_dates": scalar_dates,
    "scalar_array_access": scalar_array_access,
    "json_extract_events": json_extract_events,
    "json_aggregate_events": json_aggregate_events,
    "json_source_events": json_source_events,
    "csv_source_events": csv_source_events,
    "profile_lineitem": profile_lineitem,
    "events_hypertable_rollup": events_hypertable_rollup,
    "events_gapfill_hourly": events_gapfill_hourly,
    "events_gapfill_locf": events_gapfill_locf,
    "join_range_clicks_before_purchase": join_range_clicks_before_purchase,
    "window_tumbling_events": window_tumbling_events,
    "window_sliding_events": window_sliding_events,
    "window_session_events": window_session_events,
    "agg_grouping_sets": agg_grouping_sets,
    "pivot_segment_priority": pivot_segment_priority,
    "agg_percentiles": agg_percentiles,
    "agg_approx_percentiles": agg_approx_percentiles,
    "join_full_outer": join_full_outer,
    "subquery_above_avg": subquery_above_avg,
    "subquery_exists_urgent": subquery_exists_urgent,
    "window_moving_avg": window_moving_avg,
    "setop_union_distinct": setop_union_distinct,
    "scalar_conditionals": scalar_conditionals,
    "scalar_map_ops": scalar_map_ops,
    "explode_embedding_head": explode_embedding_head,
    "embedding_label_centroids": embedding_label_centroids,
    "agg_approx_distinct": agg_approx_distinct,
    "join_salted_skew": join_salted_skew,
    "sample_hash_orders": sample_hash_orders,
    "merge_upsert_orders": merge_upsert_orders,
    "sample_stratified_orders": sample_stratified_orders,
    "fuzzy_join_part_names": fuzzy_join_part_names,
    "events_dod_change": events_dod_change,
    "events_funnel": events_funnel,
    "retention_cohorts": retention_cohorts,
    "events_sessionize_lag": events_sessionize_lag,
    "events_ewma_user_value": events_ewma_user_value,
    "layout_zorder_buckets": layout_zorder_buckets,
    "agg_incremental_daily": agg_incremental_daily,
    "events_scd2_user_state": events_scd2_user_state,
    "stats_corr_lineitem": stats_corr_lineitem,
    "stats_supplier_trend": stats_supplier_trend,
    "events_mad_outliers": events_mad_outliers,
    "snapshot_diff_orders": snapshot_diff_orders,
    "events_path_transitions": events_path_transitions,
    "window_sliding_distinct_users": window_sliding_distinct_users,
    "events_concurrency_hourly": events_concurrency_hourly,
    "histogram_order_totals": histogram_order_totals,
    "zscore_outlier_orders": zscore_outlier_orders,
    "agg_heavy_hitters": agg_heavy_hitters,
    "sql_api_nation_revenue": sql_api_nation_revenue,
    "agg_decimal_exact": agg_decimal_exact,
    "scalar_array_hof": scalar_array_hof,
    "scalar_null_handling": scalar_null_handling,
    "agg_argmax_orders": agg_argmax_orders,
    "quality_expectations_orders": quality_expectations_orders,
    "customers_rfm_segments": customers_rfm_segments,
    "parts_abc_analysis": parts_abc_analysis,
    "events_audience_overlap": events_audience_overlap,
    "events_ohlc_daily": events_ohlc_daily,
    "window_cume_dist_spend": window_cume_dist_spend,
    "skyline_pareto_parts": skyline_pareto_parts,
    "events_gapfill_interp": events_gapfill_interp,
    "basket_part_affinity": basket_part_affinity,
    "orc_roundtrip_supplier": orc_roundtrip_supplier,
    "pysource_synthetic_events": pysource_synthetic_events,
    "pysink_supplier_roundtrip": pysink_supplier_roundtrip,
    "events_seasonality_profile": events_seasonality_profile,
    "events_ab_welch_t": events_ab_welch_t,
    "stats_return_rate_wilson": stats_return_rate_wilson,
    "governance_masked_customers": governance_masked_customers,
    "events_cusum_alerts": events_cusum_alerts,
    "events_holt_forecast": events_holt_forecast,
    "geo_points_in_boxes": geo_points_in_boxes,
    "partitioned_prune_events": partitioned_prune_events,
    "json_corrupt_tolerant_read": json_corrupt_tolerant_read,
    "schema_evolution_read": schema_evolution_read,
    "events_funnel_latency": events_funnel_latency,
    "orders_seasonal_decompose": orders_seasonal_decompose,
    "events_dn_retention": events_dn_retention,
    "customers_cohort_ltv": customers_cohort_ltv,
    "governance_erasure_audit": governance_erasure_audit,
    "governance_k_anonymity": governance_k_anonymity,
    "join_asof_next_view": join_asof_next_view,
    "events_seasonal_anomalies": events_seasonal_anomalies,
    "events_pattern_vvp": events_pattern_vvp,
    "rel_division_priorities": rel_division_priorities,
    "users_feature_assembly": users_feature_assembly,
    "text_rag_chunking": text_rag_chunking,
    "sql_udf_value_tier": sql_udf_value_tier,
    "orders_yoy_growth": orders_yoy_growth,
    "events_user_gini": events_user_gini,
    "supplier_hhi_concentration": supplier_hhi_concentration,
    "lineitem_chi2_status_flag": lineitem_chi2_status_flag,
    "events_bot_suspects": events_bot_suspects,
}

ORACLE = {
    "er_fuzzy_name_match": """
        WITH c AS (SELECT c_custkey,
                          regexp_replace(lower(c_name), '[^a-z0-9]', '',
                                         'g') AS cn
                   FROM customer),
        s AS (SELECT s_suppkey,
                     regexp_replace(lower(s_name), '[^a-z0-9]', '',
                                    'g') AS sn
              FROM supplier),
        cand AS (SELECT c_custkey, s_suppkey,
                        CAST(levenshtein(cn, sn) AS BIGINT) AS distance
                 FROM c JOIN s ON right(cn, 3) = right(sn, 3)),
        v AS (SELECT *, row_number() OVER (
                  PARTITION BY c_custkey
                  ORDER BY distance, s_suppkey) AS rn
              FROM cand WHERE distance <= 6)
        SELECT c_custkey, s_suppkey, distance FROM v WHERE rn = 1
    """,
    # skyline_orders: the calendar-bounded decomposition (suffix max
    # over strictly-later dates + same-date max), proven equal to the
    # quadratic NOT-EXISTS dominance form
    "skyline_orders": """
        WITH dd AS (SELECT * FROM orders
                    WHERE o_orderdate IS NOT NULL
                      AND o_totalprice IS NOT NULL),
        pd AS (SELECT o_orderdate AS d, max(o_totalprice) AS mp
               FROM dd GROUP BY 1),
        sfx AS (SELECT d, mp,
                       max(mp) OVER (ORDER BY d DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS later_max
                FROM pd)
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM dd JOIN sfx ON dd.o_orderdate = sfx.d
        WHERE NOT coalesce(later_max >= o_totalprice, FALSE)
          AND NOT (mp > o_totalprice)
    """,
    "events_bot_suspects": """
        WITH gaps AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT)
                 - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS g
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        st AS (
          SELECT user_id, count(*) AS n_gaps,
                 sum(g) AS sg, sum(g * g) AS sg2
          FROM gaps WHERE g IS NOT NULL
          GROUP BY user_id)
        SELECT user_id, n_gaps,
               100 * (n_gaps * sg2 - sg * sg) < sg * sg AS is_suspect,
               floor(sg * 1.0 / n_gaps * 100 + 0.5) / 100 AS mean_gap_s,
               floor(sqrt((n_gaps * sg2 - sg * sg) * 1.0
                          / (n_gaps * n_gaps)) * 100 + 0.5) / 100
                 AS stddev_gap_s
        FROM st
        WHERE n_gaps >= 20
    """,
    "events_user_gini": """
        WITH pu AS (
          SELECT user_id, count(*) AS x FROM events GROUP BY user_id),
        ranked AS (
          SELECT x, CAST(row_number() OVER (ORDER BY x, user_id)
                         AS BIGINT) AS i
          FROM pu)
        SELECT count(*) AS n_users,
               floor((2.0 * sum(i * x) / (count(*) * sum(x))
                      - (count(*) + 1.0) / count(*)) * 1000000 + 0.5)
                 / 1000000 AS gini
        FROM ranked
    """,
    "supplier_hhi_concentration": """
        WITH rev AS (
          SELECT n_name AS nation, s_suppkey,
                 sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS c
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY 1, 2),
        tot AS (SELECT nation, sum(c) AS t FROM rev GROUP BY 1)
        SELECT nation, count(*) AS n_suppliers,
               floor(sum((c * 1.0 / t) * (c * 1.0 / t)) * 10000 * 10000
                     + 0.5) / 10000 AS hhi_points
        FROM rev JOIN tot USING (nation)
        GROUP BY nation
    """,
    "lineitem_chi2_status_flag": """
        WITH cells AS (
          SELECT l_linestatus, l_returnflag, count(*) AS o
          FROM lineitem GROUP BY 1, 2),
        r AS (SELECT l_linestatus, sum(o) AS r FROM cells GROUP BY 1),
        c AS (SELECT l_returnflag, sum(o) AS cc FROM cells GROUP BY 1),
        n AS (SELECT sum(o) AS n FROM cells)
        SELECT floor(sum((o - r * cc * 1.0 / n) * (o - r * cc * 1.0 / n)
                         / (r * cc * 1.0 / n)) * 10000 + 0.5) / 10000
                 AS chi2,
               CAST((count(DISTINCT l_linestatus) - 1)
                    * (count(DISTINCT l_returnflag) - 1) AS BIGINT) AS dof
        FROM cells JOIN r USING (l_linestatus)
        JOIN c USING (l_returnflag), n
    """,
    "sql_udf_value_tier": """
        SELECT event_type,
               CASE WHEN value IS NULL THEN 'none'
                    WHEN value < 10 THEN 'low'
                    WHEN value < 60 THEN 'mid'
                    ELSE 'high' END AS tier,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
    "orders_yoy_growth": """
        WITH monthly AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
          FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)
        SELECT month, c / 100.0 AS revenue,
               CASE WHEN lag(c, 12) OVER w IS NOT NULL
                    THEN floor((c - lag(c, 12) OVER w) * 1.0
                               / lag(c, 12) OVER w * 10000 + 0.5) / 10000
               END AS yoy_growth
        FROM monthly
        WINDOW w AS (ORDER BY month)
    """,
    "users_feature_assembly": """
        WITH base AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_view,
                 CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_click,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                          ELSE 0 END) AS BIGINT) AS n_purchase,
                 count(*) AS n_events,
                 CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0))
                      AS BIGINT) AS cents,
                 CAST(datediff('day', CAST(min(ts) AS DATE),
                               CAST(max(ts) AS DATE)) AS BIGINT)
                   AS active_days_span,
                 max(ts) AS _last_ts
          FROM events GROUP BY user_id)
        SELECT user_id, n_view, n_click, n_purchase, n_events,
               cents / 100.0 AS total_value,
               active_days_span,
               CAST(ntile(10) OVER (ORDER BY _last_ts DESC, user_id)
                    AS BIGINT) AS recency_decile
        FROM base
    """,
    "text_rag_chunking": """
        WITH d AS (
          SELECT doc_id, text,
                 CAST(greatest(floor((length(text) - 51) / 150), 0)
                      AS BIGINT) AS mk
          FROM documents),
        ex AS (
          SELECT doc_id, text, unnest(range(0, mk + 1)) AS k FROM d)
        SELECT doc_id,
               CAST(k AS BIGINT) AS chunk_idx,
               CAST(k * 150 AS BIGINT) AS start,
               CAST(length(substring(text, CAST(k * 150 + 1 AS INT), 200))
                    AS BIGINT) AS chunk_len,
               md5(substring(text, CAST(k * 150 + 1 AS INT), 200))
                 AS chunk_md5
        FROM ex
    """,
    "rel_division_priorities": """
        WITH u AS (
          SELECT count(DISTINCT o_orderpriority) AS n_classes FROM orders)
        SELECT o_custkey, count(*) AS n_orders
        FROM orders, u
        GROUP BY o_custkey, n_classes
        HAVING count(DISTINCT o_orderpriority) = n_classes
    """,
    "events_pattern_vvp": """
        WITH lagged AS (
          SELECT user_id,
                 CASE WHEN event_type = 'purchase'
                       AND lag(event_type, 1) OVER w = 'view'
                       AND lag(event_type, 2) OVER w = 'view'
                      THEN 1 ELSE 0 END AS m
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, CAST(sum(m) AS BIGINT) AS n_matches
        FROM lagged GROUP BY user_id
        HAVING sum(m) > 0
    """,
    "events_seasonal_anomalies": """
        WITH daily AS (
          SELECT event_type,
                 strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 CAST(dayofweek(ts) AS BIGINT) AS dow,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x
          FROM events WHERE value IS NOT NULL
          GROUP BY 1, 2, 3),
        dow_stats AS (
          SELECT event_type, dow, sum(x) AS s_dow, count(*) AS n_dow
          FROM daily GROUP BY 1, 2),
        j AS (
          SELECT d.event_type, d.day, d.x, ds.n_dow,
                 ds.n_dow * d.x - ds.s_dow AS dev_s
          FROM daily d JOIN dow_stats ds USING (event_type, dow)),
        mad AS (
          SELECT event_type,
                 floor(avg(abs(dev_s) * 1.0 / n_dow) * 10000 + 0.5)
                   / 10000 AS mad_c,
                 count(*) AS n_days
          FROM j GROUP BY 1)
        SELECT j.event_type, j.day,
               j.x / 100.0 AS day_total,
               floor(dev_s * 1.0 / n_dow / 100.0 * 10000 + 0.5) / 10000
                 AS dev_from_dow_mean,
               abs(dev_s * 1.0 / n_dow) > 2 * mad_c AS is_anomaly
        FROM j JOIN mad USING (event_type)
    """,
    "join_asof_next_view": """
        SELECT p.event_id, p.user_id,
               min(v.ts) AS next_view_ts,
               CASE WHEN min(v.ts) IS NOT NULL
                    THEN CAST(epoch_us(min(v.ts)) - epoch_us(p.ts)
                              AS BIGINT)
               END AS micros_to_view
        FROM events p
        LEFT JOIN events v
          ON v.user_id = p.user_id
         AND v.event_type = 'view'
         AND v.ts > p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id, p.ts
    """,
    "governance_erasure_audit": """
        SELECT event_type,
               CAST(sum(CASE WHEN user_id % 100 <> 7 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN user_id % 100 = 7 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purged,
               count(DISTINCT CASE WHEN user_id % 100 = 7
                                   THEN user_id END) AS n_users_erased
        FROM events GROUP BY event_type
    """,
    "governance_k_anonymity": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               c_mktsegment AS segment,
               CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT)
                   AS bal_band,
               count(*) AS n_members,
               count(*) < 5 AS risky
        FROM customer
        GROUP BY 1, 2, 3
    """,
    "events_dn_retention": """
        WITH first AS (
          SELECT user_id, CAST(min(ts) AS DATE) AS d0
          FROM events GROUP BY user_id),
        active AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        j AS (
          SELECT f.user_id, f.d0, datediff('day', f.d0, a.d) AS dn
          FROM first f JOIN active a ON f.user_id = a.user_id)
        SELECT strftime(d0, '%Y-%m-%d') AS cohort_day,
               count(DISTINCT user_id) AS n_new_users,
               floor(count(DISTINCT CASE WHEN dn = 1 THEN user_id END) * 1.0
                     / count(DISTINCT user_id) * 1000000 + 0.5) / 1000000
                 AS d1_retention,
               floor(count(DISTINCT CASE WHEN dn = 7 THEN user_id END) * 1.0
                     / count(DISTINCT user_id) * 1000000 + 0.5) / 1000000
                 AS d7_retention,
               floor(count(DISTINCT CASE WHEN dn = 14 THEN user_id END) * 1.0
                     / count(DISTINCT user_id) * 1000000 + 0.5) / 1000000
                 AS d14_retention
        FROM j GROUP BY d0
    """,
    "customers_cohort_ltv": """
        WITH om AS (
          SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders WHERE o_orderdate IS NOT NULL),
        first AS (SELECT o_custkey, min(m) AS m0 FROM om GROUP BY 1),
        idx AS (
          SELECT om.o_custkey, f.m0,
                 CAST((year(om.m) - year(f.m0)) * 12
                      + (month(om.m) - month(f.m0)) AS BIGINT)
                   AS month_index,
                 om.cents
          FROM om JOIN first f ON om.o_custkey = f.o_custkey),
        cell AS (
          SELECT strftime(m0, '%Y-%m') AS cohort_month, month_index,
                 sum(cents) AS c
          FROM idx GROUP BY 1, 2)
        SELECT cohort_month, month_index,
               c / 100.0 AS month_revenue,
               CAST(sum(c) OVER (PARTITION BY cohort_month
                                 ORDER BY month_index
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 / 100.0 AS cum_revenue
        FROM cell
    """,
    "orders_seasonal_decompose": """
        WITH monthly AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 CAST(month(o_orderdate) AS BIGINT) AS moy,
                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS xc
          FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
        with_t AS (
          SELECT month, moy, xc,
                 sum(xc) OVER w3 AS sw,
                 count(*) OVER w3 AS cw
          FROM monthly
          WINDOW w3 AS (ORDER BY month ROWS BETWEEN 1 PRECEDING
                        AND 1 FOLLOWING)),
        detr AS (
          SELECT *, CASE WHEN cw = 3 THEN 3 * xc - sw END AS detr3
          FROM with_t),
        seas AS (
          SELECT moy, sum(detr3) AS sm, count(*) AS nm
          FROM detr WHERE detr3 IS NOT NULL GROUP BY moy)
        SELECT month,
               xc / 100.0 AS observed,
               CASE WHEN cw = 3
                    THEN floor(sw / 300.0 * 10000 + 0.5) / 10000
               END AS trend,
               CASE WHEN cw = 3
                    THEN floor(sm / (nm * 300.0) * 10000 + 0.5) / 10000
               END AS seasonal,
               CASE WHEN cw = 3
                    THEN floor((xc / 100.0
                                - floor(sw / 300.0 * 10000 + 0.5) / 10000
                                - floor(sm / (nm * 300.0) * 10000 + 0.5)
                                  / 10000) * 10000 + 0.5) / 10000
               END AS residual
        FROM detr LEFT JOIN seas USING (moy)
    """,
    "events_funnel_latency": """
        WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS c_ts
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.v_ts
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS p_ts
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
              GROUP BY e.user_id),
        lat AS (
          -- floor, not CAST: DuckDB's double->int cast ROUNDS while
          -- Spark's timestamp->long cast truncates; sub-second event
          -- times would drift +-1s between engines otherwise
          SELECT CAST(floor(epoch(c.c_ts)) AS BIGINT)
                 - CAST(floor(epoch(v.v_ts)) AS BIGINT) AS v2c,
                 CAST(floor(epoch(p.p_ts)) AS BIGINT)
                 - CAST(floor(epoch(c.c_ts)) AS BIGINT) AS c2p
          FROM v JOIN c ON v.user_id = c.user_id
          JOIN p ON c.user_id = p.user_id),
        arrs AS (
          SELECT count(*) AS n,
                 list_sort(list(v2c)) AS a_v2c,
                 list_sort(list(c2p)) AS a_c2p
          FROM lat)
        SELECT n AS n_converted,
               list_extract(a_v2c, CAST(floor((n-1)*0.25) AS INT) + 1) * 1.0 + ((n-1)*0.25 - floor((n-1)*0.25)) * (list_extract(a_v2c, least(CAST(floor((n-1)*0.25) AS INT) + 2, n)) * 1.0 - list_extract(a_v2c, CAST(floor((n-1)*0.25) AS INT) + 1) * 1.0) AS v2c_p25,
               list_extract(a_v2c, CAST(floor((n-1)*0.5) AS INT) + 1) * 1.0 + ((n-1)*0.5 - floor((n-1)*0.5)) * (list_extract(a_v2c, least(CAST(floor((n-1)*0.5) AS INT) + 2, n)) * 1.0 - list_extract(a_v2c, CAST(floor((n-1)*0.5) AS INT) + 1) * 1.0) AS v2c_p50,
               list_extract(a_v2c, CAST(floor((n-1)*0.75) AS INT) + 1) * 1.0 + ((n-1)*0.75 - floor((n-1)*0.75)) * (list_extract(a_v2c, least(CAST(floor((n-1)*0.75) AS INT) + 2, n)) * 1.0 - list_extract(a_v2c, CAST(floor((n-1)*0.75) AS INT) + 1) * 1.0) AS v2c_p75,
               list_extract(a_c2p, CAST(floor((n-1)*0.25) AS INT) + 1) * 1.0 + ((n-1)*0.25 - floor((n-1)*0.25)) * (list_extract(a_c2p, least(CAST(floor((n-1)*0.25) AS INT) + 2, n)) * 1.0 - list_extract(a_c2p, CAST(floor((n-1)*0.25) AS INT) + 1) * 1.0) AS c2p_p25,
               list_extract(a_c2p, CAST(floor((n-1)*0.5) AS INT) + 1) * 1.0 + ((n-1)*0.5 - floor((n-1)*0.5)) * (list_extract(a_c2p, least(CAST(floor((n-1)*0.5) AS INT) + 2, n)) * 1.0 - list_extract(a_c2p, CAST(floor((n-1)*0.5) AS INT) + 1) * 1.0) AS c2p_p50,
               list_extract(a_c2p, CAST(floor((n-1)*0.75) AS INT) + 1) * 1.0 + ((n-1)*0.75 - floor((n-1)*0.75)) * (list_extract(a_c2p, least(CAST(floor((n-1)*0.75) AS INT) + 2, n)) * 1.0 - list_extract(a_c2p, CAST(floor((n-1)*0.75) AS INT) + 1) * 1.0) AS c2p_p75
        FROM arrs
    """,
    "json_corrupt_tolerant_read": """
        SELECT event_type, count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS sum_value
        FROM events GROUP BY event_type
    """,
    "schema_evolution_read": """
        SELECT event_type,
               (event_id % 2 = 1 AND value IS NOT NULL) AS has_band,
               count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "geo_points_in_boxes": """
        WITH pts AS (
          SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                 CAST(embedding[2] AS DOUBLE) AS y
          FROM embeddings),
        boxes AS (
          SELECT CAST(4 * i + j AS BIGINT) AS box_id,
                 -0.2 + 0.1 * i AS bx, -0.2 + 0.1 * j AS by,
                 -0.2 + 0.1 * i + 0.1 AS bx2, -0.2 + 0.1 * j + 0.1 AS by2
          FROM (SELECT unnest(range(0, 4)) AS i),
               (SELECT unnest(range(0, 4)) AS j))
        SELECT box_id, count(*) AS n_points, min(vec_id) AS min_vec_id
        FROM pts JOIN boxes
          ON x >= bx AND x <= bx2 AND y >= by AND y <= by2
        GROUP BY box_id
    """,
    "partitioned_prune_events": """
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS total_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    "events_holt_forecast": """
        WITH RECURSIVE daily AS (
          SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY CAST(ts AS DATE)) AS rn
          FROM events WHERE value IS NOT NULL
            AND event_type IS NOT NULL
          GROUP BY 1, 2, CAST(ts AS DATE)),
        nd AS (SELECT event_type, count(*) AS n_days FROM daily
               GROUP BY 1 HAVING count(*) >= 2),
        init AS (
          SELECT d1.event_type, d1.x / 100.0 AS l,
                 d2.x / 100.0 - d1.x / 100.0 AS b
          FROM daily d1
          JOIN daily d2 ON d1.event_type = d2.event_type AND d2.rn = 2
          WHERE d1.rn = 1),
        rec(event_type, rn, l, b) AS (
          SELECT event_type, 1, l, b FROM init
          UNION ALL
          SELECT r.event_type, r.rn + 1,
                 floor((0.25 * (d.x / 100.0) + 0.75 * (r.l + r.b))
                       * 10000 + 0.5) / 10000,
                 floor((0.5 * (floor((0.25 * (d.x / 100.0)
                                      + 0.75 * (r.l + r.b))
                                     * 10000 + 0.5) / 10000 - r.l)
                        + 0.5 * r.b) * 10000 + 0.5) / 10000
          FROM rec r
          JOIN daily d ON d.event_type = r.event_type AND d.rn = r.rn + 1)
        SELECT r.event_type, n.n_days, r.l AS level, r.b AS trend,
               floor((r.l + 3 * r.b) * 10000 + 0.5) / 10000 AS forecast_3
        FROM rec r JOIN nd n USING (event_type)
        WHERE r.rn = n.n_days
    """,
    "governance_masked_customers": """
        SELECT md5('cust:' || CAST(c_custkey AS VARCHAR)) AS cust_token,
               substring(c_name, 1, 9) || '***' AS name_masked,
               CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT)
                 AS acctbal_band,
               c_mktsegment
        FROM customer
    """,
    "events_cusum_alerts": """
        WITH RECURSIVE daily AS (
          SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY CAST(ts AS DATE)) AS rn
          FROM events WHERE value IS NOT NULL
            AND event_type IS NOT NULL
          GROUP BY 1, 2, CAST(ts AS DATE)),
        meta AS (
          SELECT event_type, count(*) AS n_days, sum(x) AS s_tot
          FROM daily GROUP BY 1),
        rec(event_type, rn, c) AS (
          SELECT d.event_type, d.rn,
                 greatest(0, m.n_days * d.x - m.s_tot)
          FROM daily d JOIN meta m USING (event_type)
          WHERE d.rn = 1
          UNION ALL
          SELECT d.event_type, d.rn,
                 greatest(0, r.c + (m.n_days * d.x - m.s_tot))
          FROM rec r
          JOIN daily d ON d.event_type = r.event_type AND d.rn = r.rn + 1
          JOIN meta m ON m.event_type = d.event_type)
        SELECT r.event_type, d.day, CAST(r.c AS BIGINT) AS cusum_scaled,
               r.c > 2 * m.s_tot AS alert
        FROM rec r
        JOIN daily d ON d.event_type = r.event_type AND d.rn = r.rn
        JOIN meta m ON m.event_type = r.event_type
    """,
    "events_ab_welch_t": """
        WITH m AS (
          SELECT event_type, count(*) AS n,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                     * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s2
          FROM events WHERE value IS NOT NULL GROUP BY 1)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.n AS n_a, b.n AS n_b,
               round((a.s / a.n / 100.0 - b.s / b.n / 100.0)
                     / sqrt(((a.s2 * 1.0 / a.n - (a.s * 1.0 / a.n) * (a.s * 1.0 / a.n))
                             / 10000.0) / a.n
                          + ((b.s2 * 1.0 / b.n - (b.s * 1.0 / b.n) * (b.s * 1.0 / b.n))
                             / 10000.0) / b.n), 4) + 0.0 AS welch_t
        FROM m a JOIN m b ON a.event_type < b.event_type
    """,
    "stats_return_rate_wilson": """
        WITH counts AS (
          SELECT n_name AS nation, count(*) AS n_lines,
                 sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS n_returned
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name)
        SELECT nation, n_lines, CAST(n_returned AS BIGINT) AS n_returned,
               round(((n_returned * 1.0 / n_lines)
                      + (1.96 * 1.96) / (2 * n_lines)) / (1 + (1.96 * 1.96) / n_lines)
                     - 1.96 * sqrt((n_returned * 1.0 / n_lines)
                                   * (1 - n_returned * 1.0 / n_lines) / n_lines
                                   + (1.96 * 1.96) / (4.0 * n_lines * n_lines))
                       / (1 + (1.96 * 1.96) / n_lines), 6) + 0.0 AS ci_lo,
               round(((n_returned * 1.0 / n_lines)
                      + (1.96 * 1.96) / (2 * n_lines)) / (1 + (1.96 * 1.96) / n_lines)
                     + 1.96 * sqrt((n_returned * 1.0 / n_lines)
                                   * (1 - n_returned * 1.0 / n_lines) / n_lines
                                   + (1.96 * 1.96) / (4.0 * n_lines * n_lines))
                       / (1 + (1.96 * 1.96) / n_lines), 6) + 0.0 AS ci_hi
        FROM counts
    """,
    "pysink_supplier_roundtrip": """
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
    """,
    "pysource_synthetic_events": """
        WITH g AS (SELECT unnest(range(0, 50000)) AS i),
        rows_ AS (
          SELECT i AS event_id,
                 (i * 2654435761) % 997 AS user_id,
                 (['view', 'click', 'purchase', 'signup', 'error'])[i % 5 + 1]
                   AS event_type,
                 ((i * 1103515245 + 12345) % 10000) / 100.0 AS value
          FROM g)
        SELECT event_type, count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM rows_ GROUP BY event_type
    """,
    "events_seasonality_profile": """
        WITH cells AS (
          SELECT event_type,
                 CAST(dayofweek(ts) AS BIGINT) AS dow,
                 CAST(hour(ts) AS BIGINT) AS hr,
                 count(*) AS n_events,
                 floor((200 * sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        + count(*)) / (2.0 * count(*))) / 10000.0
                   AS avg_value
          FROM events GROUP BY 1, 2, 3),
        totals AS (
          SELECT event_type, count(*) AS n_total FROM events GROUP BY 1)
        SELECT event_type, dow, hr, n_events, avg_value,
               floor(n_events * 1.0 / n_total * 1000000 + 0.5) / 1000000
                 AS pct_of_type
        FROM cells JOIN totals USING (event_type)
    """,
    "orc_roundtrip_supplier": """
        SELECT s_nationkey, count(*) AS n_suppliers,
               sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) / 100 AS total_acctbal
        FROM supplier WHERE s_acctbal > 0
        GROUP BY s_nationkey
    """,
    "basket_part_affinity": """
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                   WHERE l_orderkey IS NOT NULL),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
        pc AS (SELECT a.l_partkey AS p1, c.l_partkey AS p2,
                      count(*) AS n_both
               FROM b a JOIN b c
                 ON a.l_orderkey = c.l_orderkey
                AND a.l_partkey < c.l_partkey
               GROUP BY 1, 2
               HAVING count(*) >= 3),
        ic AS (SELECT l_partkey, count(*) AS ci FROM b GROUP BY 1)
        SELECT p1, p2, n_both,
               floor(n_both * 1.0 * n_orders / (x.ci * y.ci) * 10000 + 0.5)
                 / 10000 AS lift
        FROM pc, n
        JOIN ic x ON p1 = x.l_partkey
        JOIN ic y ON p2 = y.l_partkey
    """,
    "events_ohlc_daily": """
        WITH r AS (
          SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 value,
                 row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events WHERE value IS NOT NULL)
        SELECT user_id, day,
               round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open_v,
               round(max(value), 4) AS high_v,
               round(min(value), 4) AS low_v,
               round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close_v,
               count(*) AS n_events
        FROM r GROUP BY user_id, day
    """,
    "window_cume_dist_spend": """
        WITH spend AS (
          SELECT o_custkey, sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100 AS spend
          FROM orders GROUP BY o_custkey)
        SELECT n_name AS nation, o_custkey AS custkey, spend,
               floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000
                 AS pct_rank,
               floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000
                 AS cume_dist
        FROM spend
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WINDOW w AS (PARTITION BY n_name ORDER BY spend, o_custkey)
    """,
    "skyline_pareto_parts": """
        SELECT p.p_partkey, p.p_retailprice,
               CAST(p.p_size AS BIGINT) AS p_size
        FROM part p
        WHERE NOT EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_retailprice <= p.p_retailprice
            AND q.p_size >= p.p_size
            AND (q.p_retailprice < p.p_retailprice
                 OR q.p_size > p.p_size))
    """,
    "events_gapfill_interp": """
        WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                          date_trunc('hour', max(ts)) AS h1 FROM events),
        types AS (SELECT DISTINCT event_type FROM events
                  WHERE event_type IS NOT NULL),
        spine AS (SELECT event_type,
                         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
                  FROM types, b),
        agg AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                       count(*) AS n_events, sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS sv
                FROM events GROUP BY 1, 2),
        j AS (SELECT s.event_type, s.hr, a.n_events, a.sv
              FROM spine s
              LEFT JOIN agg a ON s.event_type = a.event_type AND s.hr = a.hr),
        w AS (SELECT event_type, hr, n_events, sv,
                     last_value(sv IGNORE NULLS) OVER wb AS prev_v,
                     first_value(sv IGNORE NULLS) OVER wf AS next_v,
                     CAST(epoch(last_value(CASE WHEN sv IS NOT NULL THEN hr END
                         IGNORE NULLS) OVER wb) AS BIGINT) AS prev_t,
                     CAST(epoch(first_value(CASE WHEN sv IS NOT NULL THEN hr END
                         IGNORE NULLS) OVER wf) AS BIGINT) AS next_t
              FROM j
              WINDOW wb AS (PARTITION BY event_type ORDER BY hr
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wf AS (PARTITION BY event_type ORDER BY hr
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        -- interpolation in integer (cents × seconds) space, half-up via
        -- one floor — matches the Spark side bit-for-bit
        i AS (SELECT *,
                     CAST(floor(prev_v * 100 + 0.5) AS BIGINT) AS prev_c,
                     CAST(floor(next_v * 100 + 0.5) AS BIGINT) AS next_c,
                     next_t - prev_t AS d,
                     CAST(epoch(hr) AS BIGINT) AS tt
              FROM w)
        SELECT event_type,
               strftime(hr, '%Y-%m-%d %H:00') AS hour,
               coalesce(n_events, 0) AS n_events,
               CASE WHEN sv IS NOT NULL THEN sv
                    WHEN prev_v IS NULL THEN next_v
                    WHEN next_v IS NULL THEN prev_v
                    ELSE floor((200 * (prev_c * (next_t - tt)
                                       + next_c * (tt - prev_t)) + d)
                               / (2 * d)) / 10000.0
               END AS sum_value_interp
        FROM i
    """,
    # the identical string Spark executes — see sql_api_nation_revenue
    "sql_api_nation_revenue": _PORTABLE_SQL,
    "events_audience_overlap": """
        WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        pair_counts AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 count(*) AS n_both
          FROM tu a JOIN tu b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2),
        totals AS (
          SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1)
        SELECT type_a, type_b, n_both,
               round(n_both / (ta.n_users + tb.n_users - n_both), 6)
                 AS jaccard
        FROM pair_counts
        JOIN totals ta ON ta.event_type = type_a
        JOIN totals tb ON tb.event_type = type_b
        ORDER BY type_a, type_b
    """,
    "customers_rfm_segments": """
        WITH per_cust AS (
          SELECT o_custkey,
                 CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                                DATE '2001-08-01') AS BIGINT)
                   AS recency_days,
                 count(*) AS frequency,
                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100 AS monetary
          FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey)
        SELECT o_custkey, recency_days, frequency, monetary,
               CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
                    AS BIGINT) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
                    AS BIGINT) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary, o_custkey)
                    AS BIGINT) AS m_score,
               concat_ws('-',
                 ntile(5) OVER (ORDER BY recency_days DESC, o_custkey),
                 ntile(5) OVER (ORDER BY frequency, o_custkey),
                 ntile(5) OVER (ORDER BY monetary, o_custkey)) AS segment
        FROM per_cust
    """,
    "parts_abc_analysis": """
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                                 * (100 - CAST(floor(l_discount * 100 + 0.5)
                                               AS BIGINT)))
                             + 50) / 100) AS BIGINT) AS c
          FROM lineitem GROUP BY l_partkey),
        cents AS (
          SELECT l_partkey, c / 100 AS revenue, c
          FROM per_part),
        tot_c AS (SELECT sum(c) AS grand_c FROM cents),
        shares AS (
          SELECT l_partkey, revenue,
                 floor(sum(c) OVER (ORDER BY revenue DESC, l_partkey
                                    ROWS UNBOUNDED PRECEDING)
                       * 1.0 / grand_c * 1000000 + 0.5) / 1000000
                   AS cum_share
          FROM cents, tot_c)
        SELECT l_partkey, revenue, cum_share,
               CASE WHEN cum_share <= 0.8 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM shares
        ORDER BY revenue DESC, l_partkey
    """,
    "quality_expectations_orders": """
        WITH local AS (
          SELECT count(*) AS n_rows,
                 count(DISTINCT o_orderkey) AS n_distinct_keys,
                 CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_nonpos_total,
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_null_cust,
                 CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status
          FROM orders),
        orphans AS (
          SELECT count(*) AS n_orphan_orders
          FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer
                            WHERE c_custkey = o.o_custkey))
        SELECT n_rows, n_distinct_keys,
               n_distinct_keys = n_rows AS keys_unique,
               n_nonpos_total, n_null_cust, n_bad_status, n_orphan_orders,
               (n_distinct_keys = n_rows AND n_nonpos_total = 0
                AND n_null_cust = 0 AND n_bad_status = 0
                AND n_orphan_orders = 0) AS all_pass
        FROM local, orphans
    """,
    "agg_argmax_orders": """
        SELECT o_orderpriority,
               -(max(struct_pack(t := o_totalprice, nk := -o_orderkey)).nk)
                 AS top_orderkey,
               round(max(o_totalprice), 2) AS top_total,
               (min(struct_pack(t := o_totalprice, ck := o_custkey)).ck)
                 AS cheapest_custkey,
               count(DISTINCT o_totalprice) = count(*) AS totals_unique
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "scalar_null_handling": """
        SELECT l_returnflag,
               count(nullif(l_discount, 0.0)) AS n_nonzero_disc,
               count(*) - count(nullif(l_discount, 0.0)) AS n_zero_disc,
               round(avg(coalesce(nullif(l_discount, 0.0), 0.05)), 6)
                 AS avg_imputed_disc,
               CAST(sum(CASE WHEN nullif(l_discount, 0.0)
                             IS NOT DISTINCT FROM nullif(l_tax, 0.0)
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nullsafe_eq
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "agg_decimal_exact": """
        SELECT o_orderpriority,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_exact,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "scalar_array_hof": """
        SELECT vec_id,
               CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0))
                    AS BIGINT) AS n_pos,
               floor(list_sum(list_transform(embedding::DOUBLE[],
                                             x -> x * x))
                     * 10000 + 0.5) / 10000 AS sum_sq,
               floor(embedding[1]::DOUBLE * 10000 + 0.5) / 10000 AS c1,
               floor(embedding[2]::DOUBLE * 10000 + 0.5) / 10000 AS c2,
               floor(embedding[3]::DOUBLE * 10000 + 0.5) / 10000 AS c3
        FROM embeddings
    """,
    "merge_upsert_orders": """
        WITH delta AS (
          SELECT o_orderkey AS d_orderkey,
                 o_totalprice * 1.1 AS d_totalprice
          FROM orders
          WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '20'
          UNION ALL
          SELECT o_orderkey + 100000000 AS d_orderkey,
                 o_totalprice * 0.5 AS d_totalprice
          FROM orders
          WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '20')
        SELECT coalesce(o_orderkey, d_orderkey) AS merge_key,
               floor(coalesce(d_totalprice, o_totalprice) * 100 + 0.5) / 100
                 AS totalprice,
               CASE WHEN o_orderkey IS NOT NULL AND d_orderkey IS NOT NULL
                      THEN 'update'
                    WHEN o_orderkey IS NULL THEN 'insert'
                    ELSE 'keep' END AS action
        FROM orders FULL OUTER JOIN delta ON o_orderkey = d_orderkey
    """,
    "sample_stratified_orders": """
        SELECT o_orderkey, o_orderpriority, rn
        FROM (
          SELECT o_orderkey, o_orderpriority,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
                   AS rn
          FROM orders)
        WHERE rn <= 200
    """,
    "fuzzy_join_part_names": """
        WITH names AS (
          SELECT DISTINCT p_name AS name,
                 regexp_extract(p_name, '(\\S+)$', 1) AS family
          FROM part)
        SELECT a.family, a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
        FROM names a JOIN names b
          ON a.family = b.family AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 4
    """,
    "events_dod_change": """
        WITH daily AS (
          SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 count(*) AS n_events,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS total_value
          FROM events
          GROUP BY 1, 2)
        SELECT event_type, day, n_events, total_value,
               round((n_events - lag(n_events) OVER w) * 100.0
                     / lag(n_events) OVER w, 4) AS dod_pct
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
    "stats_corr_lineitem": """
        SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
               round(corr(l_quantity, l_tax), 4) AS corr_qty_tax,
               round(covar_samp(l_quantity, l_extendedprice), 4)
                 AS covar_qty_price
        FROM lineitem
    """,
    "events_path_transitions": """
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events)
        SELECT prev_type AS from_type,
               event_type AS to_type,
               count(*) AS n_transitions,
               count(DISTINCT user_id) AS n_users
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """,
    "events_concurrency_hourly": """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                              > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sess AS (
          SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked),
        iv AS (SELECT user_id, sid, min(ts) AS s, max(ts) AS t
               FROM sess GROUP BY user_id, sid),
        hours AS (
          SELECT unnest(generate_series(date_trunc('hour', s),
                                        date_trunc('hour', t),
                                        INTERVAL 1 HOUR)) AS hour
          FROM iv)
        SELECT hour, count(*) AS n_open_sessions
        FROM hours GROUP BY hour ORDER BY hour
    """,
    "snapshot_diff_orders": """
        WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        new_snap AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 1.1
                      ELSE o_totalprice END AS o_totalprice
          FROM o WHERE o_orderkey % 37 <> 0
          UNION ALL
          SELECT o_orderkey + 10000000, o_custkey, o_totalprice
          FROM o WHERE o_orderkey % 53 = 0),
        d AS (
          SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                 a.o_totalprice AS old_price,
                 b.o_totalprice AS new_price
          FROM o a FULL OUTER JOIN new_snap b
            ON a.o_orderkey = b.o_orderkey)
        SELECT o_orderkey,
               CASE WHEN old_price IS NULL THEN 'insert'
                    WHEN new_price IS NULL THEN 'delete'
                    WHEN old_price <> new_price THEN 'change'
                    ELSE 'unchanged' END AS change_type,
               floor(old_price * 100 + 0.5) / 100 AS old_price,
               floor(new_price * 100 + 0.5) / 100 AS new_price
        FROM d
        WHERE CASE WHEN old_price IS NULL THEN 'insert'
                   WHEN new_price IS NULL THEN 'delete'
                   WHEN old_price <> new_price THEN 'change'
                   ELSE 'unchanged' END <> 'unchanged'
    """,
    "events_mad_outliers": """
        WITH med AS (
          SELECT event_type,
                 floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000
                   AS med
          FROM events GROUP BY event_type),
        mad AS (
          SELECT e.event_type,
                 floor(quantile_cont(abs(e.value - m.med), 0.5) * 1000000
                       + 0.5) / 1000000 AS mad
          FROM events e JOIN med m USING (event_type)
          GROUP BY e.event_type)
        SELECT e.event_id, e.event_type,
               round(e.value, 2) AS value,
               round((e.value - m.med) / (1.4826 * d.mad), 4) AS robust_z
        FROM events e
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
        WHERE abs(e.value - m.med) > 3 * 1.4826 * d.mad
    """,
    "stats_supplier_trend": """
        WITH monthly AS (
          SELECT l_suppkey AS s_suppkey,
                 CAST((year(l_shipdate) - 1992) * 12
                      + month(l_shipdate) - 1 AS BIGINT) AS x,
                 sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                + 0.5) AS DECIMAL(18,0))) AS y
          FROM lineitem GROUP BY 1, 2)
        SELECT s_suppkey,
               count(*) AS n_months,
               CAST(sum(y) AS DOUBLE) / 100 AS total_rev,
               round(CAST(count(*) * sum(x * y) - sum(x) * sum(y)
                          AS DOUBLE)
                     / nullif(CAST(count(*) * sum(x * x) - sum(x) * sum(x)
                                   AS DOUBLE), 0.0) / 100, 6)
                 AS slope_per_month
        FROM monthly
        GROUP BY s_suppkey
        HAVING count(*) >= 2
    """,
    "histogram_order_totals": """
        -- DuckDB has no width_bucket; this is its exact arithmetic:
        -- bucket i covers [(i-1)*5000, i*5000), 0 below range, 21 above
        SELECT CAST(least(greatest(floor(o_totalprice / 5000) + 1, 0), 21)
                    AS BIGINT) AS bucket,
               count(*) AS n_orders,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    "zscore_outlier_orders": """
        WITH stats AS (
          SELECT o_orderpriority,
                 avg(o_totalprice) AS mu,
                 stddev_samp(o_totalprice) AS sigma
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderkey, o.o_orderpriority,
               round(o_totalprice, 2) AS o_totalprice,
               round((o_totalprice - mu) / sigma, 4) AS zscore
        FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
        WHERE abs((o_totalprice - mu) / sigma) > 2.5
    """,
    "events_funnel": """
        WITH views AS (
          SELECT user_id, min(ts) AS v_ts FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        clicks AS (
          SELECT e.user_id, min(ts) AS c_ts
          FROM events e JOIN views v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts
          GROUP BY e.user_id),
        purchases AS (
          SELECT e.user_id, min(ts) AS p_ts
          FROM events e JOIN clicks c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
          GROUP BY e.user_id)
        SELECT CAST(1 + (c.user_id IS NOT NULL)::INT
                      + (p.user_id IS NOT NULL)::INT AS BIGINT) AS stage,
               count(*) AS n_users
        FROM views v
        LEFT JOIN clicks c ON v.user_id = c.user_id
        LEFT JOIN purchases p ON v.user_id = p.user_id
        GROUP BY 1 ORDER BY 1
    """,
    "retention_cohorts": """
        WITH first AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS first_day
          FROM events GROUP BY user_id)
        SELECT strftime(date_trunc('week', first_day), '%Y-%m-%d')
                 AS cohort_week,
               CAST(floor(date_diff('day', first_day, CAST(ts AS DATE))
                          / 7.0) AS BIGINT) AS week_offset,
               count(DISTINCT e.user_id) AS n_active
        FROM events e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "agg_incremental_daily": """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY o_orderpriority
    """,
    "layout_zorder_buckets": f"""
        SELECT ({zvalue_sql("l_partkey", "l_suppkey")} >> 16) AS z_bucket,
               count(*) AS n_rows,
               min(l_partkey) AS part_lo,
               max(l_partkey) AS part_hi,
               min(l_suppkey) AS supp_lo,
               max(l_suppkey) AS supp_hi
        FROM lineitem
        GROUP BY 1
    """,
    "events_ewma_user_value": """
        WITH seq AS (
          SELECT user_id,
                 list(value ORDER BY ts, event_id) AS vals
          FROM events GROUP BY user_id)
        SELECT user_id,
               CAST(len(vals) AS BIGINT) AS n_events,
               floor(list_reduce(vals,
                     (acc, x) -> x * 0.25 + acc * 0.75) * 10000 + 0.5)
                 / 10000 AS ewma_value
        FROM seq
    """,
    "events_scd2_user_state": """
        WITH tagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(event_type) OVER w IS NULL
                        OR event_type <> lag(event_type) OVER w
                      THEN 1 ELSE 0 END AS changed
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        runs AS (
          SELECT user_id, ts, event_type,
                 CAST(sum(changed) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS run_id
          FROM tagged),
        per_run AS (
          SELECT user_id, run_id,
                 min_by(event_type, ts) AS state,
                 min(ts) AS valid_from,
                 count(*) AS n_events
          FROM runs GROUP BY user_id, run_id)
        SELECT user_id, run_id, state, valid_from,
               lead(valid_from) OVER wl AS valid_to,
               lead(valid_from) OVER wl IS NULL AS is_current,
               n_events
        FROM per_run
        WINDOW wl AS (PARTITION BY user_id ORDER BY run_id)
    """,
    "events_sessionize_lag": """
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sessioned AS (
          SELECT user_id, ts,
                 CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          FROM flagged)
        SELECT user_id, session_no, count(*) AS n_events,
               min(ts) AS session_start,
               date_diff('second', min(ts), max(ts)) AS duration_s
        FROM sessioned
        GROUP BY user_id, session_no
    """,
    "q12_late_lines_priority": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1999-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "q2_min_cost_supplier": """
        WITH per AS (
          SELECT p_partkey, p_name, l_suppkey,
                 floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                       * 1.0 / count(l_extendedprice) + 0.5) / 100 AS avg_price
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_size = 10
          GROUP BY p_partkey, p_name, l_suppkey)
        SELECT p_partkey, p_name, s_suppkey, s_name, avg_price
        FROM per JOIN supplier ON l_suppkey = s_suppkey
        WHERE avg_price = (SELECT min(avg_price) FROM per p2
                           WHERE p2.p_partkey = per.p_partkey)
        ORDER BY p_partkey, s_suppkey
    """,
    "q11_important_parts": """
        WITH per_part AS (
          SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
          FROM lineitem GROUP BY l_partkey)
        SELECT l_partkey, round(value, 2) AS part_value
        FROM per_part
        WHERE value > (SELECT sum(value) FROM per_part) * 0.001
        ORDER BY part_value DESC, l_partkey
    """,
    "q16_supplier_variety": """
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q20_heavy_shippers": """
        SELECT s_suppkey, s_name, n_name AS nation
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1998-01-01'
            AND l_shipdate <  TIMESTAMP '1999-01-01'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 100)
        ORDER BY s_suppkey
    """,
    "q21_sole_faulty_supplier": """
        WITH lines AS (
          SELECT l_orderkey, l_suppkey, l_returnflag
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'),
        per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN l_returnflag = 'R'
                                     THEN l_suppkey END) AS n_ret_supp
          FROM lines GROUP BY l_orderkey)
        SELECT s_suppkey, s_name, count(*) AS numwait
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lines
              WHERE l_returnflag = 'R') r
        JOIN per_order USING (l_orderkey)
        JOIN supplier ON r.l_suppkey = s_suppkey
        WHERE n_supp > 1 AND n_ret_supp = 1
        GROUP BY s_suppkey, s_name
        ORDER BY numwait DESC, s_suppkey
        LIMIT 20
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate <  TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q7_volume_shipping": """
        SELECT supp_nation, cust_nation, l_year,
               floor((sum(volume_e4) + 50) / 100) / 100 AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                   AS volume_e4
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE n1.n_name IN ('NATION_1', 'NATION_2')
            AND n2.n_name IN ('NATION_1', 'NATION_2')
            AND n1.n_name <> n2.n_name)
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        SELECT o_year,
               floor(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume_e4
                          ELSE 0 END)
                 * 1.0 / sum(volume_e4) * 10000 + 0.5) / 10000
                 AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                   AS volume_e4,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO')
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q9_product_profit": """
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS BIGINT) AS o_year,
               floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                          - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                            * CAST(l_quantity AS BIGINT) * 50)
                      + 50) / 100) / 100 AS sum_profit
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1998-02-01'
    """,
    "q15_top_supplier": """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                    + 50) / 100) / 100
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1998-01-01'
            AND l_shipdate <  TIMESTAMP '1998-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q17_small_quantity_revenue": """
        SELECT floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                     / 7.0 + 0.5) / 100 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#5'
          AND l_quantity < (
            SELECT 0.5 * avg(l_quantity)
            FROM lineitem l2
            JOIN part p2 ON p2.p_partkey = l2.l_partkey
            WHERE l2.l_partkey = lineitem.l_partkey
              AND p2.p_brand = 'Brand#5')
    """,
    "q19_discounted_revenue": """
        SELECT floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                  + 50) / 100) / 100 AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_dormant_customers": """
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               count(*) AS numcust,
               sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100 AS totacctbal
        FROM customer
        WHERE c_acctbal > 0
          AND c_nationkey IN (1, 3, 5, 7, 9)
          AND c_acctbal > (
            SELECT avg(c_acctbal) FROM customer
            WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                    AS sum_qty,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100
                 AS sum_base_price,
               floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                      + 50) / 100) / 100 AS sum_disc_price,
               (sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                    * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
                + 5000) // 10000 / 100 AS sum_charge,
               floor(sum(l_quantity) * 10000.0 / count(l_quantity) + 0.5)
                 / 10000                                                    AS avg_qty,
               floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                     * 100.0 / count(l_extendedprice) + 0.5) / 10000        AS avg_price,
               floor(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                     * 100.0 / count(l_discount) + 0.5) / 10000             AS avg_disc,
               count(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                  + 50) / 100) / 100 AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                      + 50) / 100) / 100 AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q6_revenue_forecast": """
        SELECT floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                + 50) / 100) / 100 AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity > 45
    """,
    "join_left_outer": """
        SELECT c_custkey, c_name,
               count(o_orderkey) AS n_orders,
               coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0) / 100
                 AS total_spent
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_theta_late_ship": """
        SELECT o_orderpriority, count(*) AS n_late
        FROM orders JOIN lineitem
          ON l_orderkey = o_orderkey
         AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY o_orderpriority
    """,
    "join_asof_last_click": """
        SELECT e.event_id,
               e.user_id,
               c.ts AS last_click_ts,
               epoch_us(e.ts) - epoch_us(c.ts) AS micros_since_click
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    "agg_priority_stats": """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100 AS total,
               floor(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     * 100.0 / count(o_totalprice) + 0.5) / 10000 AS avg_price,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_count_distinct": """
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "agg_rollup": """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n, sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100 AS total
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    "agg_cube": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "agg_having": """
        SELECT o_custkey, count(*) AS n_orders,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100 AS total
        FROM orders GROUP BY o_custkey HAVING count(*) >= 8
    """,
    "window_topk_parts": """
        SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rnk
            FROM part)
        WHERE rnk <= 3
    """,
    "window_order_gaps": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate NULLS FIRST, o_orderkey),
                         o_orderdate) AS days_since_prev
        FROM orders
    """,
    "window_running_total": """
        SELECT o_custkey, o_orderkey,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate NULLS FIRST, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100
                   AS running_spend
        FROM orders
    """,
    "window_rank_dense": """
        SELECT s_nationkey, s_suppkey,
               rank()       OVER w AS bal_rank,
               dense_rank() OVER w AS bal_dense_rank
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    "sort_limit_top_items": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 20
    """,
    "setop_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    "setop_except": """
        SELECT c_custkey AS key FROM customer
        EXCEPT
        SELECT o_custkey AS key FROM orders
    """,
    "setop_union_all": """
        SELECT c_custkey AS key, 'customer' AS src FROM customer
        UNION ALL
        SELECT s_suppkey AS key, 'supplier' AS src FROM supplier
    """,
    "scalar_string_math": """
        SELECT p_partkey,
               upper(p_brand)                    AS brand_u,
               substring(p_name, 1, 8)           AS name_prefix,
               length(p_name)                    AS name_len,
               p_brand || '#' || p_type          AS brand_type,
               round(p_retailprice * 1.1, 2)     AS inflated,
               abs(p_size - 25)::BIGINT          AS size_dist,
               CASE WHEN p_retailprice >= 0
                    THEN round(sqrt(p_retailprice), 4) END AS price_sqrt
        FROM part
    """,
    "scalar_dates": """
        SELECT o_orderkey,
               year(o_orderdate)                      AS order_year,
               month(o_orderdate)                     AS order_month,
               date_trunc('month', o_orderdate)       AS month_start,
               o_orderdate + INTERVAL 30 DAY          AS due_date
        FROM orders
    """,
    "scalar_array_access": """
        SELECT vec_id,
               len(embedding)::BIGINT AS dim,
               embedding[1]  AS first_val,
               embedding[64] AS last_val,
               label
        FROM embeddings
    """,
    "json_extract_events": """
        SELECT event_id, event_type,
               CASE WHEN json_valid(props)
                    THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS k_val
        FROM events
    """,
    "json_aggregate_events": """
        SELECT event_type,
               round(avg(CASE WHEN json_valid(props)
                              THEN CAST(json_extract_string(props, '$.k')
                                        AS BIGINT) END), 4) AS avg_k,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "events_hypertable_rollup": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               hour(ts)::BIGINT AS hr,
               count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS sum_value
        FROM events
        GROUP BY ROLLUP(strftime(ts, '%Y-%m-%d'), hour(ts)::BIGINT)
    """,
    "profile_lineitem": """
        SELECT count(*) AS n_rows,
               count(*) - count(l_quantity) AS n_null_qty,
               count(DISTINCT l_returnflag) AS n_flags,
               round(min(l_quantity), 2) AS min_qty,
               round(max(l_quantity), 2) AS max_qty,
               round(avg(l_quantity), 4) AS avg_qty,
               min(l_shipdate) AS first_ship,
               max(l_shipdate) AS last_ship
        FROM lineitem
    """,
    "csv_source_events": """
        SELECT user_id % 10 AS user_decile,
               count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS sum_value,
               count(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY 1
    """,
    # Both engines see identical floor-truncated-to-µs timestamps (see the
    # event-time note below), so plain interval arithmetic agrees.
    "join_range_clicks_before_purchase": """
        SELECT p.event_id AS purchase_id,
               p.user_id,
               count(c.ts) AS n_recent_clicks,
               round(coalesce(sum(c.value), 0), 2) AS recent_click_value
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
         AND c.ts < p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY 1, 2
    """,
    # json_source_events reads the JSON-lines mirror; the mirror is value-
    # identical to parquet, so the oracle aggregates the parquet view.
    "json_source_events": """
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS sum_value
        FROM events
        WHERE value > 0
        GROUP BY event_type
    """,
    # Event-time oracles work in integer microseconds (epoch_us) because the
    # parquet stores TIMESTAMP(NANOS): Spark sees floor-truncated-to-µs
    # values, and µs-integer math makes both engines compare identical
    # quantities. Window boundaries are second-aligned, so truncation can
    # never flip an event's bucket.
    "window_tumbling_events": """
        SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS w_start,
               event_type,
               count(*) AS n_events,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    "window_sliding_events": """
        SELECT make_timestamp(s) AS w_start, count(*) AS n_events
        FROM (
            SELECT unnest([(epoch_us(ts) // 300000000) * 300000000,
                           (epoch_us(ts) // 300000000) * 300000000 - 300000000]) AS s,
                   epoch_us(ts) AS us
            FROM events)
        WHERE us >= s AND us < s + 600000000
        GROUP BY 1
    """,
    "window_sliding_distinct_users": """
        SELECT make_timestamp(s) AS w_start,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM (
            SELECT unnest([(epoch_us(ts) // 1800000000) * 1800000000,
                           (epoch_us(ts) // 1800000000) * 1800000000
                             - 1800000000]) AS s,
                   epoch_us(ts) AS us,
                   user_id
            FROM events)
        WHERE us >= s AND us < s + 3600000000
        GROUP BY 1
    """,
    "window_session_events": """
        WITH marked AS (
            SELECT user_id, epoch_us(ts) AS us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
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
    "agg_grouping_sets": """
        SELECT r_name, n_name,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100 AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
    "pivot_segment_priority": """
        SELECT c_mktsegment,
               count(*) FILTER (o_orderpriority = '1-URGENT') AS p1_urgent,
               count(*) FILTER (o_orderpriority = '2-HIGH') AS p2_high,
               count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3_medium,
               count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
                   AS p4_not_specified,
               count(*) FILTER (o_orderpriority = '5-LOW') AS p5_low
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "agg_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 4) AS q25,
               round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
               round(quantile_cont(l_quantity, 0.75), 4) AS q75,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    # Sketch queries: the Spark side emits exact values plus a boolean
    # asserting the sketch lands within tolerance; the oracle emits the
    # exact values plus TRUE, so sketch drift fails the driver hash.
    "agg_approx_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS approx_within_5pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "agg_approx_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 4) AS q25,
               round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
               round(quantile_cont(l_quantity, 0.75), 4) AS q75,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               TRUE AS sketch_within_1pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "agg_heavy_hitters": """
        WITH tot AS (SELECT count(*) AS n FROM lineitem)
        SELECT l_partkey,
               count(*) AS n_rows,
               round(count(*) / (SELECT n FROM tot), 6) AS share
        FROM lineitem
        GROUP BY l_partkey
        HAVING count(*) / (SELECT n FROM tot) > 0.0005
        ORDER BY n_rows DESC, l_partkey
    """,
    "join_full_outer": """
        SELECT c_custkey, c_mktsegment, o_custkey, n_big, big_total
        FROM (SELECT c_custkey, c_mktsegment FROM customer) c
        FULL OUTER JOIN (
            SELECT o_custkey,
                   count(*) AS n_big,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100 AS big_total
            FROM orders WHERE o_totalprice > 400000
            GROUP BY o_custkey) o
        ON c.c_custkey = o.o_custkey
    """,
    "subquery_above_avg": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    "subquery_exists_urgent": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
    """,
    "window_moving_avg": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               floor(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w
                     * 100.0 / count(o_totalprice) OVER w + 0.5) / 10000
                   AS moving_avg_3
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY o_orderdate NULLS FIRST, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "setop_union_distinct": """
        SELECT c_nationkey AS nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 400000
        UNION
        SELECT s_nationkey AS nationkey
        FROM supplier WHERE s_acctbal > 5000
    """,
    "scalar_conditionals": """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity >= 40 THEN 'bulk'
                    WHEN l_quantity >= 10 THEN 'mid'
                    ELSE 'small' END AS qty_band,
               coalesce(nullif(l_returnflag, 'N'), 'none') AS return_kind,
               round(least(l_extendedprice, 20000.0), 2) AS capped_price,
               greatest(l_tax, l_discount) AS max_rate
        FROM lineitem
    """,
    "scalar_map_ops": """
        SELECT l_orderkey, l_linenumber,
               m['qty'][1] AS qty_val,
               m['tax'][1] AS tax_val,
               cardinality(m)::BIGINT AS n_keys,
               array_to_string(list_sort(map_keys(m)), ',') AS keys_csv
        FROM (
            SELECT l_orderkey, l_linenumber,
                   MAP {'qty': l_quantity, 'tax': l_tax,
                        'discount': l_discount} AS m
            FROM lineitem)
    """,
    "explode_embedding_head": """
        SELECT vec_id, i - 1 AS pos,
               floor(embedding[i]::DOUBLE * 1000000 + 0.5) / 1000000 AS val
        FROM embeddings, generate_series(1, 4) t(i)
    """,
    "embedding_label_centroids": """
        SELECT label, i - 1 AS pos,
               round(avg(embedding[i]::DOUBLE), 6) AS avg_val,
               count(*) AS n_vectors
        FROM embeddings, generate_series(1, 64) t(i)
        GROUP BY label, i - 1
    """,
    # agg_approx_distinct: HLL sketch values are engine-specific —
    # rows-only check; tests pin the estimate within 5% of exact.
    "join_salted_skew": """
        SELECT e.event_id, e.event_type,
               round(e.value - s.type_avg, 4) AS value_dev
        FROM events e
        JOIN (SELECT event_type, avg(value) AS type_avg
              FROM events GROUP BY event_type) s
          USING (event_type)
        WHERE e.event_type IN ('error', 'purchase')
    """,
    "sample_hash_orders": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE substring(md5(cast(o_orderkey AS VARCHAR)), 1, 2) < '10'
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                  + 50) / 100) / 100 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate <  TIMESTAMP '1998-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q18_large_volume_customers": """
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
    "scalar_regex": """
        SELECT p_partkey,
               regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
               regexp_replace(p_type, '[AEIOUaeiou]', '', 'g') AS type_novowels,
               regexp_matches(p_type, 'PROMO|ECONOMY') AS is_discount_class
        FROM part
    """,
    "agg_filtered_counts": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     FILTER (WHERE o_orderstatus = 'O'), 0) / 100
                   AS open_value,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    "window_range_30d_spend": """
        SELECT o_custkey, o_orderkey,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w
                 / 100 AS spend_30d,
               count(*) OVER w AS n_orders_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS FIRST
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                               AND CURRENT ROW)
    """,
    "agg_share_of_total": """
        SELECT o_orderpriority,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100
                 AS prio_total,
               floor(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     * 1.0
                     / (SELECT sum(CAST(floor(o_totalprice * 100 + 0.5)
                                        AS BIGINT)) FROM orders)
                     * 1000000 + 0.5) / 10000
                   AS pct_of_total
        FROM orders
        GROUP BY o_orderpriority
    """,
    "window_first_last": """
        SELECT o_custkey, o_orderkey,
               round(first_value(o_totalprice) OVER w, 2) AS first_price,
               round(last_value(o_totalprice) OVER w, 2) AS last_price,
               round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS FIRST, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """,
    "events_gapfill_hourly": """
        WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                          date_trunc('hour', max(ts)) AS h1 FROM events),
        types AS (SELECT DISTINCT event_type FROM events
                  WHERE event_type IS NOT NULL),
        spine AS (SELECT event_type,
                         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
                  FROM types, b),
        agg AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                       count(*) AS n_events, sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS sv
                FROM events GROUP BY 1, 2)
        SELECT s.event_type,
               strftime(s.hr, '%Y-%m-%d %H:00') AS hour,
               coalesce(a.n_events, 0) AS n_events,
               coalesce(a.sv, 0.0) AS sum_value
        FROM spine s
        LEFT JOIN agg a ON s.event_type = a.event_type AND s.hr = a.hr
    """,
    "events_gapfill_locf": """
        WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                          date_trunc('hour', max(ts)) AS h1 FROM events),
        types AS (SELECT DISTINCT event_type FROM events
                  WHERE event_type IS NOT NULL),
        spine AS (SELECT event_type,
                         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
                  FROM types, b),
        agg AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                       count(*) AS n_events, sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100 AS sv
                FROM events GROUP BY 1, 2),
        j AS (SELECT s.event_type, s.hr, a.n_events, a.sv
              FROM spine s
              LEFT JOIN agg a ON s.event_type = a.event_type AND s.hr = a.hr)
        SELECT event_type,
               strftime(hr, '%Y-%m-%d %H:00') AS hour,
               coalesce(n_events, 0) AS n_events,
               coalesce(last_value(sv IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
                   AS sum_value_locf
        FROM j
    """,
    "window_ntile_deciles": """
        SELECT o_orderkey, o_orderpriority,
               ntile(10) OVER w AS decile,
               floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000
                 AS pct_rank,
               floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000
                 AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    "unpivot_part_measures": """
        SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS measure,
               CAST(p_retailprice AS DOUBLE) AS value
        FROM part
    """,
}


# Events ingestion-validity rule applied mechanically to every oracle
# (round-8 relational shape-fuzz; the Spark twin is io.load_events via
# _events above): rows with NULL event time or a non-finite value are
# corrupt telemetry and excluded on BOTH engines — one Inf row throws
# ARITHMETIC_OVERFLOW inside every ANSI cents-ification, and a NULL
# window ORDER key diverges across engine NULL-ordering defaults. The
# rewrite lives at the module tail (same pattern as the zero-norm
# embedding rule, operators/similarity.py) so the rule cannot drift
# per-query. `events_v`-style identifiers don't match the \b pattern.
EVENTS_CLEAN_SQL = (
    "(SELECT * FROM events "
    "WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value)))"
)

import re as _re  # noqa: E402  (module tail, after the big dict literals)

for _name, _sql in ORACLE.items():
    ORACLE[_name] = _re.sub(
        r"\b(FROM|JOIN) events\b", rf"\1 {EVENTS_CLEAN_SQL}", _sql
    )

# Same mechanical rewrite for the embeddings readers (round-9
# ragged-vector rule, io.load_embeddings / io.EMB_CLEAN_SQL): only the
# five queries whose Spark path reads the embeddings table.
from dbscan_spark.io import EMB_CLEAN_SQL as _EMB_CLEAN  # noqa: E402

for _name in (
    "geo_points_in_boxes",
    "scalar_array_access",
    "scalar_array_hof",
    "explode_embedding_head",
    "embedding_label_centroids",
):
    ORACLE[_name] = _re.sub(
        r"\b(FROM|JOIN) embeddings\b", rf"\1 {_EMB_CLEAN}", ORACLE[_name]
    )
