"""Distributed DBSCAN pipeline: golden-fixture E2E + distributed-equals-local
property + predict."""

from __future__ import annotations

import numpy as np
import pytest

from dbscan_spark.dbscan import dbscan, predict
from dbscan_spark.kernel import local_dbscan, relabel_to_match


@pytest.fixture(scope="module")
def golden_df(spark, golden_points):
    return spark.createDataFrame(
        [(i, x, y, lbl) for i, (x, y, lbl) in enumerate(golden_points)],
        "id long, x double, y double, expected long",
    )


def test_golden_distributed_labels(spark, golden_df, golden_points):
    """DBSCANSuite.scala:30-59: train(eps=0.3, minPoints=10,
    maxPointsPerPartition=250) on the 749-point fixture reproduces every
    per-point label up to renaming (P3) with no lost or duplicated points."""
    result = dbscan(golden_df, eps=0.3, min_points=10, max_points_per_partition=250)
    rows = result.collect()
    assert len(rows) == len(golden_points)
    assert len({r["id"] for r in rows}) == len(golden_points)
    got = np.array([r["cluster"] for r in sorted(rows, key=lambda r: r["id"])])
    expected = np.array([p[2] for p in golden_points])
    ok, mapping = relabel_to_match(got, expected)
    assert ok, f"distributed labels diverge; partial mapping {mapping}"


def test_distributed_equals_local(spark, golden_df, golden_points):
    """The distributed pipeline must agree with the single-partition kernel
    on the same data — the merge logic cannot change the clustering."""
    x = np.array([p[0] for p in golden_points])
    y = np.array([p[1] for p in golden_points])
    local_cluster, local_flag = local_dbscan(x, y, 0.3, 10)
    rows = dbscan(golden_df, 0.3, 10, max_points_per_partition=100).collect()
    got = np.array([r["cluster"] for r in sorted(rows, key=lambda r: r["id"])])
    got_flag = np.array([r["flag"] for r in sorted(rows, key=lambda r: r["id"])])
    ok, _ = relabel_to_match(got, local_cluster)
    assert ok
    # flags: core/noise must agree exactly; border-vs-cluster choice can vary
    assert ((got_flag == "core") == (local_flag == "core")).all()
    assert ((got_flag == "noise") == (local_flag == "noise")).all()


@pytest.mark.parametrize("seed,max_pts", [(0, 60), (1, 120), (2, 40)])
def test_distributed_equals_local_random(spark, seed, max_pts):
    """Property: for random blobs and aggressive partitioning, distributed
    result == local kernel result (permutation-invariant)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-4, 4, size=(4, 2))
    pts = np.vstack(
        [c + rng.normal(0, 0.25, size=(60, 2)) for c in centers]
        + [rng.uniform(-6, 6, size=(30, 2))]
    )
    eps, minp = 0.4, 5
    local_cluster, _ = local_dbscan(pts[:, 0], pts[:, 1], eps, minp)
    df = spark.createDataFrame(
        [(i, float(p[0]), float(p[1])) for i, p in enumerate(pts)],
        "id long, x double, y double",
    )
    rows = dbscan(df, eps, minp, max_points_per_partition=max_pts).collect()
    assert len(rows) == len(pts)
    got = np.array([r["cluster"] for r in sorted(rows, key=lambda r: r["id"])])
    ok, _ = relabel_to_match(got, local_cluster)
    assert ok


@pytest.mark.parametrize("seed,max_pts,dim", [(0, 60, 5), (1, 120, 16)])
def test_distributed_nd_equals_local(spark, seed, max_pts, dim):
    """Property (n-D generalization): distance over the full vector with
    partitioning on the first two dims must equal the single-node n-D
    kernel — the projection-distance bound keeps the margin merge exact."""
    from dbscan_spark.kernel import local_dbscan_matrix

    rng = np.random.default_rng(seed)
    centers = rng.uniform(-4, 4, size=(4, dim))
    pts = np.vstack(
        [c + rng.normal(0, 0.3, size=(50, dim)) for c in centers]
        + [rng.uniform(-6, 6, size=(25, dim))]
    )
    eps, minp = 0.45 * np.sqrt(dim), 5
    local_cluster, _ = local_dbscan_matrix(pts, eps, minp)
    df = spark.createDataFrame(
        [
            (i, float(p[0]), float(p[1]), [float(v) for v in p])
            for i, p in enumerate(pts)
        ],
        "id long, x double, y double, v array<double>",
    )
    rows = dbscan(
        df, eps, minp, max_points_per_partition=max_pts, features_col="v"
    ).collect()
    assert len(rows) == len(pts)
    got = np.array([r["cluster"] for r in sorted(rows, key=lambda r: r["id"])])
    ok, _ = relabel_to_match(got, local_cluster)
    assert ok


def test_nd_kernel_separates_separable_blobs():
    """Two well-separated 8-D blobs -> two clusters, distance genuinely
    over all dims (the blobs coincide in the first two dims, so a 2-D
    kernel would merge them)."""
    from dbscan_spark.kernel import local_dbscan_matrix

    rng = np.random.default_rng(7)
    a = rng.normal(0, 0.05, size=(30, 8))
    b = rng.normal(0, 0.05, size=(30, 8))
    b[:, 2:] += 5.0  # identical (x, y) footprint, far apart in dims 2..7
    X = np.vstack([a, b])
    cluster, flag = local_dbscan_matrix(X, eps=1.0, min_points=4)
    assert set(cluster[:30]) == {cluster[0]} and cluster[0] != 0
    assert set(cluster[30:]) == {cluster[30]} and cluster[30] != 0
    assert cluster[0] != cluster[30]


def test_skewed_hot_cell_end_to_end(spark):
    """P8 end-to-end: one grid cell holds far more points than
    max_points_per_partition (unsplittable hot spot). The pipeline must
    neither fail nor drop points, and must still match the local kernel."""
    rng = np.random.default_rng(3)
    eps, minp = 0.5, 5
    hot = rng.normal(0, 0.08, size=(400, 2))         # all inside one 2eps cell
    spread = rng.uniform(-8, 8, size=(80, 2))        # background
    pts = np.vstack([hot, spread])
    local_cluster, _ = local_dbscan(pts[:, 0], pts[:, 1], eps, minp)
    df = spark.createDataFrame(
        [(i, float(p[0]), float(p[1])) for i, p in enumerate(pts)],
        "id long, x double, y double",
    )
    rows = dbscan(df, eps, minp, max_points_per_partition=50).collect()
    assert len(rows) == len(pts)
    got = np.array([r["cluster"] for r in sorted(rows, key=lambda r: r["id"])])
    ok, _ = relabel_to_match(got, local_cluster)
    assert ok


def test_passthrough_columns(spark):
    df = spark.createDataFrame(
        [(10, 0.0, 0.0, "a"), (11, 0.1, 0.0, "b"), (12, 5.0, 5.0, "c")],
        "id long, x double, y double, tag string",
    )
    rows = dbscan(df, eps=0.5, min_points=2).collect()
    assert {r["tag"] for r in rows} == {"a", "b", "c"}
    by_id = {r["id"]: r for r in rows}
    assert by_id[10]["cluster"] == by_id[11]["cluster"] > 0
    assert by_id[12]["cluster"] == 0 and by_id[12]["flag"] == "noise"


def test_predict_labels_new_points(spark, golden_df):
    model = dbscan(golden_df, 0.3, 10, max_points_per_partition=250)
    new = spark.createDataFrame(
        [(0, 100.0, 100.0)], "nid long, x double, y double"
    )
    far = predict(model, new, eps=0.3).collect()
    assert far[0]["cluster"] == 0 and far[0]["flag"] == "noise"
    # a point on top of an existing core point joins its cluster
    core = model.filter("flag = 'core'").first()
    near = spark.createDataFrame(
        [(1, core["x"] + 0.01, core["y"])], "nid long, x double, y double"
    )
    got = predict(model, near, eps=0.3).collect()
    assert got[0]["cluster"] == core["cluster"]


def test_train_model_api_mirrors_reference(spark, golden_df):
    """Reference-parity surface: train() -> model.labeled_points +
    model.predict() must produce exactly what the underlying dbscan() and
    predict() functions produce (DBSCAN.scala:40-48, :253-256)."""
    from dbscan_spark import train

    model = train(golden_df, eps=0.3, min_points=10)
    direct = dbscan(golden_df, 0.3, 10, max_points_per_partition=250)
    lp = {
        (r["x"], r["y"]): (r["cluster"], r["flag"])
        for r in model.labeled_points.collect()
    }
    want = {
        (r["x"], r["y"]): (r["cluster"], r["flag"])
        for r in direct.collect()
    }
    assert lp == want
    core = model.labeled_points.filter("flag = 'core'").first()
    probe = spark.createDataFrame(
        [(1, core["x"], core["y"] + 0.01), (2, -50.0, -50.0)],
        "nid long, x double, y double",
    )
    got = {r["nid"]: r for r in model.predict(probe).collect()}
    assert got[1]["cluster"] == core["cluster"]
    assert got[2]["cluster"] == 0 and got[2]["flag"] == "noise"


def test_predict_uses_full_vector_when_features_col_set(spark):
    """Regression: a model trained with features_col must predict with the
    FULL n-D distance. A probe on top of a core point in the (x, y)
    projection but far away in the remaining dimensions must come back
    noise, not inherit the core's cluster."""
    from dbscan_spark import train

    rows = [
        (i, 0.1 * (i % 5), 0.1 * (i // 5), [0.1 * (i % 5), 0.1 * (i // 5), 0.0, 0.0])
        for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "id long, x double, y double, f array<double>"
    )
    model = train(df, eps=0.3, min_points=4, features_col="f")
    core = model.labeled_points.filter("flag = 'core'").first()
    probes = spark.createDataFrame(
        [
            (1, core["x"], core["y"], [core["x"], core["y"], 9.0, 9.0]),
            (2, core["x"], core["y"], list(core["f"])),
        ],
        "nid long, x double, y double, f array<double>",
    )
    got = {r["nid"]: r for r in model.predict(probes).collect()}
    assert got[1]["cluster"] == 0 and got[1]["flag"] == "noise"
    assert got[2]["cluster"] == core["cluster"]


def test_predict_surrounded_but_out_of_range(spark):
    """Regression: a probe whose entire 3x3 candidate-cell ring contains
    core points, every one beyond eps, must still come back as noise (not
    silently vanish from the output)."""
    eps = 0.3
    # probe at (0.02, 0.02) in cell (0,0); one core per ring cell, each
    # placed > eps from the probe
    cores = [
        (0.29, 0.29),    # cell (0,0), dist ~0.382
        (0.59, 0.02), (0.59, 0.59), (0.59, -0.29),   # cells (1, *)
        (-0.29, 0.02), (-0.29, 0.59), (-0.29, -0.29),  # cells (-1, *)
        (0.02, 0.59), (0.02, -0.29),  # cells (0, 1) and (0, -1)
    ]
    model = spark.createDataFrame(
        [(x, y, 1, "core") for x, y in cores],
        "x double, y double, cluster long, flag string",
    )
    probe = spark.createDataFrame([(7, 0.02, 0.02)], "nid long, x double, y double")
    rows = predict(model, probe, eps=eps).collect()
    assert len(rows) == 1
    assert rows[0]["cluster"] == 0 and rows[0]["flag"] == "noise"
