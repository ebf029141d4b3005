"""Shared fixtures: one SparkSession per test run, golden fixture loader."""

from __future__ import annotations

import csv
import os

import pytest

REFERENCE_FIXTURE = "/root/reference/src/test/resources/labeled_data.csv"
SF_TINY = os.environ.get("SPARK_GRAFT_SF_TINY", "/root/testdata/sf0.001")
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from dbscan_spark.session import get_spark

    s = get_spark(app_name="dbscan_spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_points():
    """The reference's 749-point golden fixture, loaded (never copied) from
    the read-only reference checkout: rows of (x, y, expected_label);
    expected label 0 = noise (DBSCANSuite.scala:30-59 contract)."""
    if not os.path.exists(REFERENCE_FIXTURE):
        pytest.skip("reference fixture not available")
    with open(REFERENCE_FIXTURE) as fh:
        return [(float(x), float(y), int(float(lbl))) for x, y, lbl in csv.reader(fh)]
