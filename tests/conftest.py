"""Shared fixtures: one SparkSession per test run, golden fixture loader."""

from __future__ import annotations

import csv
import os
import sys

import pytest

# Make the container's vendored protobuf runtime available to both this
# (driver) process and every Python worker Spark spawns — needed only by
# the transformWithState state-server protocol. Must run before the JVM
# starts so the PYTHONPATH edit reaches worker ProcessBuilders; a no-op
# when protobuf is already installed or the vendored copy is absent.
_PB_SHIM_DIR = os.path.join(os.path.dirname(__file__), "_protobuf_shim")
if os.path.isdir(_PB_SHIM_DIR):
    os.environ["PYTHONPATH"] = (
        _PB_SHIM_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
    sys.path.insert(0, _PB_SHIM_DIR)
    import _pb_shim  # noqa: F401  (applies the shim in-process)

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
