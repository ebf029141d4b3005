"""Local (single-partition) DBSCAN kernel — pure numpy, no Spark.

This is the compute kernel that runs inside ``applyInPandas`` groups in the
distributed pipeline (one invocation per spatial partition, group size
bounded by ``max_points_per_partition``), and is independently usable for
single-node clustering.

Semantics contract (mirrors the reference, SURVEY.md §2.3):

* P1 — the ε-neighborhood is **closed** (``dist² <= eps²``) and
  **self-inclusive**: a point counts itself toward ``min_points``
  (reference LocalDBSCANNaive.scala:70-75, LocalDBSCANArchery.scala:114-116;
  same convention as sklearn).
* P2 — **border reclamation**: an already-visited noise point that is later
  found ε-reachable from a core point is relabeled as a border member of
  that cluster (the reference's Archery variant,
  LocalDBSCANArchery.scala:103-106 — the check sits outside the
  ``!visited`` guard; classic DBSCAN / sklearn semantics).
* P3 — cluster ids are assignment-order-dependent (1..k in discovery
  order); callers must compare results permutation-invariantly.
* P9 — noise keeps ``cluster = 0`` and ``flag = 'noise'``.

Complexity: neighbor lists are built via an eps-sized grid index
(bucket a point, probe its 3×3 cell ring, exact-filter) → O(n · avg
neighborhood) instead of the reference kernel's O(n²) linear scans
(LocalDBSCANNaive.scala:70-75). For tiny inputs a dense pairwise matrix is
cheaper than the index; we switch on size.
"""

from __future__ import annotations

from collections import deque

import numpy as np

NOISE = 0
FLAG_NOISE = "noise"
FLAG_CORE = "core"
FLAG_BORDER = "border"

_DENSE_CUTOFF = 2048  # below this, an n×n distance matrix is fastest


def _neighbor_lists_dense_nd(X: np.ndarray, eps: float) -> list[np.ndarray]:
    """All-pairs n-D neighborhoods via explicit coordinate differences.

    Deliberately NOT the |a|²+|b|²−2ab dot-product trick: the closed-ball
    boundary (P1, dist² <= eps²) must not flip on the ~1e-12 rounding that
    formulation introduces for points exactly at distance eps.
    """
    sq = np.zeros((len(X), len(X)), dtype=np.float64)
    for d in range(X.shape[1]):
        diff = X[:, d][:, None] - X[:, d][None, :]
        sq += diff * diff
    within = sq <= eps * eps
    return [np.flatnonzero(row) for row in within]


def _neighbor_lists_grid_nd(X: np.ndarray, eps: float) -> list[np.ndarray]:
    """n-D neighborhoods via an eps-cell grid on the FIRST TWO dims.

    Correct for any dimensionality because a Euclidean projection distance
    never exceeds the full distance: every point within full-space eps of p
    is within eps of p in the (d0, d1) plane, hence inside p's 3×3 cell
    ring. Candidates are exact-filtered on the full distance. (Selectivity
    degrades if the first two dims carry no spread — the same trade the
    reference makes by partitioning on vector(0), vector(1).)
    """
    n = len(X)
    cx = np.floor(X[:, 0] / eps).astype(np.int64)
    cy = np.floor(X[:, 1] / eps).astype(np.int64)
    # Group point indices by cell: lexsort is stable, so each cell's
    # member array is in ascending original-index order (same candidate
    # ordering the per-point dict build produced).
    order = np.lexsort((cy, cx))
    sx, sy = cx[order], cy[order]
    if n:
        change = np.flatnonzero((np.diff(sx) != 0) | (np.diff(sy) != 0)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
    else:
        starts = ends = np.empty(0, dtype=np.int64)
    cells = {
        (sx[s], sy[s]): order[s:e] for s, e in zip(starts, ends)
    }
    eps2 = eps * eps
    out: list[np.ndarray] = [None] * n  # type: ignore[list-item]
    for (bx, by), members in cells.items():
        # Every member of a cell shares the same 3×3 candidate ring, so
        # the ring is gathered once per CELL and distances computed as a
        # blocked members × candidates matrix — the Python interpreter
        # runs per cell, not per point (the round-1 hot-cell cost).
        ring = [
            cells.get((bx + ox, by + oy))
            for ox in (-1, 0, 1)
            for oy in (-1, 0, 1)
        ]
        cand = np.concatenate([c for c in ring if c is not None])
        Xc = X[cand]
        if len(members) == 1:
            # Sparse layout (~1 point/cell): skip the blocked-matrix
            # machinery; same explicit coordinate-difference arithmetic.
            i = members[0]
            sq1 = ((Xc - X[i]) ** 2).sum(axis=1)
            out[i] = cand[sq1 <= eps2]
            continue
        # Block the member rows so the matrix stays ~32M doubles even when
        # an unsplittable hot cell holds the whole partition (P8).
        block = max(1, (1 << 22) // max(len(cand), 1))
        for s in range(0, len(members), block):
            mb = members[s : s + block]
            Xm = X[mb]
            sq = np.zeros((len(mb), len(cand)), dtype=np.float64)
            for d in range(X.shape[1]):
                diff = Xm[:, d][:, None] - Xc[:, d][None, :]
                sq += diff * diff
            within = sq <= eps2
            # One row-major nonzero + split instead of a boolean mask per
            # row: np.nonzero groups hits by row in order, so splitting the
            # gathered candidate ids at the per-row counts yields each
            # member's neighbor list without per-point interpreter work.
            flat = cand[np.nonzero(within)[1]]
            offsets = np.cumsum(within.sum(axis=1))[:-1]
            for i, part in zip(mb, np.split(flat, offsets)):
                out[i] = part
    return out


def local_dbscan_matrix(
    X: np.ndarray,
    eps: float,
    min_points: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Cluster n-D points (rows of ``X``); returns ``(cluster, flag)``.

    ``cluster`` is int64 with 0 = noise and 1..k in discovery order (P3/P9);
    ``flag`` is an object array of {'core','border','noise'}. 2-D inputs
    reproduce the reference kernel exactly; higher dimensionality keeps the
    same semantics with distance over all columns.
    """
    X = np.asarray(X, dtype=np.float64)
    if X.ndim != 2:
        raise ValueError(f"X must be (n, d), got shape {X.shape}")
    n = len(X)
    cluster = np.zeros(n, dtype=np.int64)
    flag = np.full(n, FLAG_NOISE, dtype=object)
    if n == 0:
        return cluster, flag

    if n <= _DENSE_CUTOFF:
        neighbors = _neighbor_lists_dense_nd(X, eps)
    else:
        neighbors = _neighbor_lists_grid_nd(X, eps)

    visited = np.zeros(n, dtype=bool)
    next_cluster = 0
    for seed in range(n):
        if visited[seed]:
            continue
        visited[seed] = True
        seed_nbrs = neighbors[seed]
        if len(seed_nbrs) < min_points:
            continue  # stays noise unless a later cluster adopts it (P2)
        next_cluster += 1
        cluster[seed] = next_cluster
        flag[seed] = FLAG_CORE
        queue: deque[int] = deque(seed_nbrs.tolist())
        while queue:
            j = queue.popleft()
            if not visited[j]:
                visited[j] = True
                j_nbrs = neighbors[j]
                if len(j_nbrs) >= min_points:
                    flag[j] = FLAG_CORE
                    queue.extend(j_nbrs.tolist())
            if cluster[j] == NOISE:
                # Outside the !visited guard: reclaims visited noise as
                # border (P2, LocalDBSCANArchery.scala:103-106).
                cluster[j] = next_cluster
                if flag[j] != FLAG_CORE:
                    flag[j] = FLAG_BORDER
    return cluster, flag


def local_dbscan(
    x: np.ndarray,
    y: np.ndarray,
    eps: float,
    min_points: int,
) -> tuple[np.ndarray, np.ndarray]:
    """2-D convenience wrapper over :func:`local_dbscan_matrix`
    (reference-kernel parity surface)."""
    X = np.column_stack(
        [np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)]
    )
    if X.size == 0:
        X = X.reshape(0, 2)
    return local_dbscan_matrix(X, eps, min_points)


def relabel_to_match(
    got: np.ndarray, expected: np.ndarray
) -> tuple[bool, dict[int, int]]:
    """Permutation-invariant label comparison helper (P3).

    Builds the bijection got-label -> expected-label from co-membership and
    checks it is consistent both ways; noise (0) must map to noise.
    Returns (matches, mapping).
    """
    mapping: dict[int, int] = {}
    reverse: dict[int, int] = {}
    for g, e in zip(got.tolist(), expected.tolist()):
        if (g == 0) != (e == 0):
            return False, mapping
        if g == 0:
            continue
        if mapping.setdefault(g, e) != e:
            return False, mapping
        if reverse.setdefault(e, g) != g:
            return False, mapping
    return True, mapping
