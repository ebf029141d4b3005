"""AQE skew-join handling: prove the session's adaptive config actually
splits a pathological hot key at runtime — the no-code-change half of the
skew story (join_salted_skew is the explicit-salting half)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    """A 97%-hot-key sort-merge join under lowered skew thresholds must
    execute with SortMergeJoin(skew=true): AQE re-plans the oversized
    partition into splits without any manual salting. (Thresholds are
    production-scale by default — MBs, not KBs — so they are lowered here
    only to reproduce the condition at test size.)"""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32k",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # force the shuffle path — a broadcast join has no partitions to skew
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k"
        )

        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 100 < 97, F.lit(0))
            .otherwise(F.col("id") % 13)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 13).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        joined = left.join(right, "k").select(
            F.sum("payload").alias("s"), F.count(F.lit(1)).alias("n")
        )
        [row] = joined.collect()
        assert row["n"] == 300_000
        final_plan = (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
