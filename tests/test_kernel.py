"""Local DBSCAN kernel: golden-fixture parity + semantic unit checks."""

from __future__ import annotations

import numpy as np
import pytest

from dbscan_spark.kernel import (
    FLAG_BORDER,
    FLAG_CORE,
    FLAG_NOISE,
    local_dbscan,
    relabel_to_match,
)


def test_golden_fixture_exact_labels(golden_points):
    """Reproduce every per-point label of the reference golden test
    (LocalDBSCANArcherySuite.scala:31-53: eps=0.3, minPoints=10),
    permutation-invariantly (P3)."""
    x = np.array([p[0] for p in golden_points])
    y = np.array([p[1] for p in golden_points])
    expected = np.array([p[2] for p in golden_points])
    cluster, flag = local_dbscan(x, y, eps=0.3, min_points=10)
    ok, mapping = relabel_to_match(cluster, expected)
    assert ok, f"label partition mismatch; partial mapping {mapping}"
    assert set(np.unique(cluster)) == {0, 1, 2, 3}
    assert (cluster[flag == FLAG_NOISE] == 0).all()
    assert (cluster[flag != FLAG_NOISE] > 0).all()


def test_golden_grid_index_matches_dense(golden_points):
    """The grid-index path (used for big partitions) must agree with the
    dense path on the same data."""
    import dbscan_spark.kernel as K

    X = np.array([[p[0], p[1]] for p in golden_points])
    dense = K._neighbor_lists_dense_nd(X, 0.3)
    grid = K._neighbor_lists_grid_nd(X, 0.3)
    for d, g in zip(dense, grid):
        assert set(d.tolist()) == set(g.tolist())


def test_self_inclusive_min_points():
    """P1: a point counts itself — two coincident points with min_points=2
    form a cluster."""
    cluster, flag = local_dbscan(np.array([0.0, 0.0]), np.array([0.0, 0.0]), 1.0, 2)
    assert (cluster == 1).all()
    assert (flag == FLAG_CORE).all()


def test_closed_ball_boundary():
    """P1: dist² <= eps² is inclusive — points exactly eps apart are
    neighbors."""
    cluster, _ = local_dbscan(np.array([0.0, 1.0]), np.array([0.0, 0.0]), 1.0, 2)
    assert (cluster == 1).all()
    # and just beyond eps they are not
    cluster, _ = local_dbscan(np.array([0.0, 1.0000001]), np.array([0.0, 0.0]), 1.0, 2)
    assert (cluster == 0).all()


def test_border_reclamation_archery_semantics():
    """P2: a visited noise point later reachable from a core point becomes
    border (Archery/sklearn semantics, LocalDBSCANArchery.scala:103-106).

    Layout: p0 is isolated enough to be visited first and marked noise,
    but sits within eps of the core of a cluster discovered later.
    """
    # p0 at (0.9, 0); cluster of 4 points around x=1.8 .. 2.2; eps=1, minPts=4
    x = np.array([0.9, 1.8, 1.9, 2.0, 2.1])
    y = np.zeros(5)
    cluster, flag = local_dbscan(x, y, eps=1.0, min_points=4)
    # p0 has neighbors {p0, p1} -> not core -> initially noise; p1 is core
    # (neighbors p0,p1,p2,p3 within 1.0) and adopts p0 as border.
    assert flag[0] == FLAG_BORDER
    assert cluster[0] == cluster[1]
    assert flag[1] == FLAG_CORE


def test_noise_stays_zero():
    x = np.array([0.0, 10.0, 20.0])
    y = np.zeros(3)
    cluster, flag = local_dbscan(x, y, eps=1.0, min_points=2)
    assert (cluster == 0).all()
    assert (flag == FLAG_NOISE).all()


def test_empty_input():
    cluster, flag = local_dbscan(np.array([]), np.array([]), 1.0, 2)
    assert len(cluster) == 0 and len(flag) == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_blobs_match_sklearn_style_reference(seed):
    """Cross-check flags/partitions against an independent O(n²) pure-python
    implementation of classic DBSCAN on random blobs."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5, 5, size=(3, 2))
    pts = np.vstack(
        [c + rng.normal(0, 0.3, size=(40, 2)) for c in centers]
        + [rng.uniform(-8, 8, size=(15, 2))]
    )
    x, y = pts[:, 0], pts[:, 1]
    eps, min_points = 0.5, 5
    cluster, flag = local_dbscan(x, y, eps, min_points)

    # independent reference: core = |closed ball| >= min_points; clusters =
    # connected components of core points under eps-adjacency; border =
    # non-core within eps of a core.
    n = len(x)
    d2 = (x[:, None] - x) ** 2 + (y[:, None] - y) ** 2
    adj = d2 <= eps * eps
    is_core = adj.sum(axis=1) >= min_points
    exp = np.zeros(n, dtype=int)
    cid = 0
    for i in np.flatnonzero(is_core):
        if exp[i]:
            continue
        cid += 1
        stack = [i]
        exp[i] = cid
        while stack:
            j = stack.pop()
            for k in np.flatnonzero(adj[j] & is_core):
                if not exp[k]:
                    exp[k] = cid
                    stack.append(k)
    assert ((cluster > 0) == is_core | (flag == FLAG_BORDER)).all()
    assert ((flag == FLAG_CORE) == is_core).all()
    # core-point partition must match up to renaming
    ok, _ = relabel_to_match(cluster[is_core], exp[is_core])
    assert ok
    # border points must belong to a cluster one of their core neighbors has
    for i in np.flatnonzero((~is_core) & (cluster > 0)):
        nbr_clusters = {int(c) for c in cluster[adj[i] & is_core]}
        assert int(cluster[i]) in nbr_clusters
    # non-core points with no core neighbor are noise
    for i in np.flatnonzero(~is_core):
        if not (adj[i] & is_core).any():
            assert cluster[i] == 0
