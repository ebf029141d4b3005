"""Property tests for functions/ranking.py — the scale-safe global
ordering primitive every exact global rank/ntile/cumulative in the repo
now rides on. The oracle is the naive single-partition window (fine at
test size), so any bucketing/offset/tie bug shows up as a rank diff."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbscan_spark.functions.ranking import global_order_stats, ntile_from_rank


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, v double")


@pytest.mark.parametrize("seed,n,n_buckets", [(1, 503, 32), (2, 64, 32), (3, 1000, 7)])
def test_global_rank_and_cumsum_match_naive_window(spark, seed, n, n_buckets):
    rng = random.Random(seed)
    # heavy ties on k (small domain), continuous v
    rows = [(i, rng.randint(0, 9), rng.random() * 100) for i in range(n)]
    df = _df(spark, rows)
    got = global_order_stats(
        df,
        [F.asc("k"), F.desc("v"), F.asc("id")],
        F.col("k"),
        rn="rn",
        running_sums={"cum": F.col("v")},
        total_count="nt",
        n_buckets=n_buckets,
    )
    w = Window.orderBy(F.asc("k"), F.desc("v"), F.asc("id"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select(
        "id",
        F.row_number().over(w).cast("long").alias("rn2"),
        F.sum("v").over(run).alias("cum2"),
    )
    j = got.join(want, "id")
    assert (
        j.filter(
            (F.col("rn") != F.col("rn2"))
            | (F.abs(F.col("cum") - F.col("cum2")) > 1e-6)
            | (F.col("nt") != n)
        ).count()
        == 0
    )


@pytest.mark.parametrize("k", [2, 5, 10, 100])
def test_ntile_formula_matches_spark_ntile(spark, k):
    rng = random.Random(k)
    rows = [(i, 0, rng.random()) for i in range(257)]
    df = _df(spark, rows)
    got = global_order_stats(
        df, [F.asc("v"), F.asc("id")], F.col("v"), rn="rn", total_count="nt"
    ).select("id", ntile_from_rank(k, F.col("rn"), F.col("nt")).alias("t"))
    w = Window.orderBy("v", "id")
    want = df.select("id", F.ntile(k).over(w).cast("long").alias("t2"))
    assert got.join(want, "id").filter(F.col("t") != F.col("t2")).count() == 0


def test_all_rows_in_one_bucket_degenerates_gracefully(spark):
    """Constant bucket key: every cut collapses to the same value, all
    rows land in bucket 0, and the result is still the exact global
    rank (the skew floor, not a wrong answer)."""
    df = _df(spark, [(i, 7, float(i % 13)) for i in range(100)])
    got = global_order_stats(
        df, [F.asc("v"), F.asc("id")], F.col("k"), rn="rn"
    )
    w = Window.orderBy("v", "id")
    want = df.select("id", F.row_number().over(w).cast("long").alias("rn2"))
    assert got.join(want, "id").filter(F.col("rn") != F.col("rn2")).count() == 0


def test_runtime_plan_reuses_rollup_exchange_and_stays_partitioned(spark):
    """The 100 TB contract of the primitive, pinned on the executed
    adaptive plan of events_user_gini: the per-user rollup exchange is
    computed ONCE (cut/total branches read a ReusedExchange, so the
    fact table is scanned once), and no Window runs over an
    Exchange SinglePartition."""
    from tests.conftest import SF_TINY

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["events_user_gini"](spark, SF_TINY)
    df.collect()
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the executed adaptive plan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" inside one tree block — grade the final only
    tree = plan.split("\n\n")[0].split("== Initial Plan ==")[0]
    assert "ReusedExchange" in tree
    assert sum("Scan parquet" in l for l in tree.splitlines()) == 1
    from tests.test_plans import _single_partition_windows

    assert not _single_partition_windows(plan)
