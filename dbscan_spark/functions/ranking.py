"""Scale-safe exact global ordering primitives.

An unpartitioned ``Window.orderBy(...)`` moves every row through ONE
task ("Moving all data to a single partition") — fine over a bounded
domain (distinct months, #shuffle-partitions), fatal over an entity
rollup that grows with the data (15M customers at TPC-H sf100 through
one task). These helpers compute the SAME exact global
row_number / running sums with a partitioned plan:

1. bucket every row by approx-percentile cuts of a monotone ordering
   key (cuts ride a 1-row broadcast; bucket id is a pure function of
   the row, so it cannot be desynchronized by AQE partition coalescing
   the way ``spark_partition_id()`` after a range exchange can);
2. rank / running-sum INSIDE each bucket with an ordinary partitioned
   window (one hash shuffle on the bucket id);
3. add each bucket's exclusive prefix (rows / sums in all lower
   buckets) via a triangular broadcast self-join of the per-bucket
   totals — a table bounded by the bucket count, never a global window,
   never a driver collect.

Accuracy of the cuts only affects bucket BALANCE, never correctness:
offsets are computed from the actual bucket contents. Heavy single-key
ties all land in one bucket (cut comparison is strict), which is the
honest skew floor any order-based partitioning has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

#: max relative error ~ 1/accuracy for the bucket cuts — balance only.
_CUTS_ACCURACY = 10000


def global_order_stats(
    df: DataFrame,
    order_by: list[Column],
    bucket_on: Column,
    rn: str | None = None,
    running_sums: dict[str, Column] | None = None,
    total_count: str | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Append exact global order statistics to ``df``.

    ``order_by``
        the full sort (must be total, i.e. carry a unique tie-break).
    ``bucket_on``
        a numeric, non-null column monotone NON-DECREASING in the sort
        order (negate a descending numeric key). Used only to bucket.
    ``rn``
        output column: exact global 1-based row_number over the sort.
    ``running_sums``
        {output column: value column} exact inclusive running sums over
        the sort. Exact-oracle callers must pass integer / decimal
        value columns: bucket partials add in a different order than a
        single global window would, so float/double sums are not
        bit-identical and can flip a round() at a boundary (convert
        money to integer cents first, as parts_abc_analysis does).
    ``total_count``
        output column: the exact total row count (for ntile-style
        bucket formulas), attached via a 1-row broadcast — never a
        global window.
    """
    running_sums = dict(running_sums or {})
    assert rn or running_sums
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.select(
        F.percentile_approx(
            bucket_on.cast("double"), F.array(*[F.lit(p) for p in probs]),
            F.lit(_CUTS_ACCURACY),
        ).alias("_cuts")
    )
    # strict < : rows equal to a cut value share one bucket, so the
    # bucket id is well-defined on ties regardless of cut placement.
    # A null key would silently land in bucket 0 (null comparisons drop
    # out of F.filter) and mis-rank — fail loudly instead.
    key = F.when(
        bucket_on.isNull(),
        F.raise_error(
            F.lit("global_order_stats: bucket_on key must be non-null")
        ),
    ).otherwise(bucket_on.cast("double"))
    b = df.join(F.broadcast(cuts)).withColumn(
        "_b", F.size(F.filter(F.col("_cuts"), lambda c: c < key))
    ).drop("_cuts")

    sums = [F.count(F.lit(1)).alias("_t_rn")] + [
        F.sum(col).alias(f"_t_{out}") for out, col in running_sums.items()
    ]
    totals = b.groupBy("_b").agg(*sums)
    lower = totals.select(
        F.col("_b").alias("_lb"),
        *[F.col(c).alias(f"_l{c}") for c in totals.columns if c != "_b"],
    )
    offsets = (
        totals.join(F.broadcast(lower), F.col("_lb") < F.col("_b"), "left")
        .groupBy("_b")
        .agg(
            F.coalesce(F.sum("_l_t_rn"), F.lit(0)).alias("_off_rn"),
            *[
                F.coalesce(F.sum(f"_l_t_{out}"), F.lit(0)).alias(
                    f"_off_{out}"
                )
                for out in running_sums
            ],
        )
    )

    w = Window.partitionBy("_b").orderBy(*order_by)
    run = Window.partitionBy("_b").orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = b.join(F.broadcast(offsets), "_b")
    if total_count:
        grand = totals.agg(
            F.sum("_t_rn").cast("long").alias(total_count)
        )
        out = out.join(F.broadcast(grand))
    if rn:
        out = out.withColumn(
            rn, (F.row_number().over(w) + F.col("_off_rn")).cast("long")
        )
    for name, col in running_sums.items():
        out = out.withColumn(name, F.sum(col).over(run) + F.col(f"_off_{name}"))
    drop = ["_b", "_off_rn"] + [f"_off_{o}" for o in running_sums]
    return out.drop(*drop)


def ntile_from_rank(k: int, rn: Column, n: Column) -> Column:
    """SQL ``ntile(k)`` bucket from an exact global 1-based row_number
    ``rn`` and the total row count ``n`` — the standard definition both
    Spark and DuckDB implement: the first ``n % k`` buckets get
    ``n div k + 1`` rows, the rest get ``n div k``."""
    q = F.floor(n / k)
    r = n % k
    big = r * (q + 1)
    return F.when(
        rn <= big, F.ceil(rn / (q + 1))
    ).otherwise(r + F.ceil((rn - big) / F.when(q > 0, q).otherwise(1))).cast(
        "long"
    )
