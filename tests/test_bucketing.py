"""Bucketed fact-fact joins: the 100 TB story for orders ⋈ lineitem.

At scale both fact tables are written bucketed on the join key so the join
is a zero-shuffle sort-merge over co-located buckets. This test proves the
engine's layout produces that plan: after bucketBy(8, orderkey) on both
sides, the join plan must contain NO shuffle exchange on either side.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dbscan_spark.io import load_table
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static config — tables land in ./spark-warehouse
    # (gitignored) and are dropped afterwards
    orders = load_table(spark, SF_TINY, "orders")
    lineitem = load_table(spark, SF_TINY, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree
        assert "Exchange" not in tree, tree
        # and it still computes the right thing
        want = (
            load_table(spark, SF_TINY, "orders")
            .join(
                load_table(spark, SF_TINY, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key reuses the bucket layout — no exchange."""
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("total_qty")
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
