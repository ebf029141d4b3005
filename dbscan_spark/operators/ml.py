"""ML operators: the flagship distributed DBSCAN exposed over testdata.

Not SQL-expressible (iterative density clustering) → rows-only driver
check; the golden-fixture tests in tests/test_dbscan_distributed.py are
the correctness contract (exact per-point label parity with the
reference's 749-point fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbscan_spark.dbscan import dbscan
from dbscan_spark.io import load_table


def dbscan_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the embeddings table projected to 2-D (the reference's
    own 2-D rule, DBSCANPoint.scala:23-24): (vec_id, cluster, flag)."""
    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    out = dbscan(pts, eps=0.05, min_points=5, max_points_per_partition=250)
    return out.select("vec_id", "cluster", "flag")


QUERIES = {
    "dbscan_embeddings": dbscan_embeddings,
}

ORACLE: dict[str, str] = {}
