#!/usr/bin/env python3
"""Exact ground-truth verification of the two DBSCAN queries whose
DuckDB recursive-CTE oracles are cost-prohibitive beyond the shipped
SFs (BASELINE.md §5c: Spark side 17 s at sf0.3, CTE >75 min).

The ground truth here is the repo's single-partition kernel
(`dbscan_spark.kernel.local_dbscan`), which is itself exact-verified
against the reference's 749-point golden fixture
(src/test/resources/labeled_data.csv via tests/test_kernel.py) — so
this script checks the DISTRIBUTED pipeline (BSP partitioning, margin
duplication, cross-partition merge, canonical relabeling, cell-ring
predict) against a known-exact in-memory computation at any SF the
driver ships or tools/scale_up.py synthesizes:

* dbscan_core_components: the distributed core-point components under
  min-core-vec_id canonical labels must equal the local kernel's.
  Core membership and density-connectivity of cores are
  traversal-invariant (unlike border assignment, P3), so equality is
  exact set equality on (vec_id, cluster_rep).
* dbscan_predict_canonical: holdout labeling must equal a brute-force
  nearest-core-within-eps assignment against the local kernel's
  canonical cores, with predict's (distance², cluster) tie-break.
  Both engines compute d² with the same IEEE ops, so comparison is
  exact, not tolerance-based.
* dbscan_flags_64d: the full-64-D generalization's per-point flags
  must equal the n-D kernel's. All three flags are traversal-invariant
  (core membership by definition; border = non-core within eps of some
  core — only WHICH cluster a border joins is traversal-dependent,
  P3), so exact equality applies. This exercises the 2-D-projection
  partitioning + full-vector distance path at scales the DuckDB
  list-lambda oracle cannot reach.

Usage: python tools/verify_dbscan_scale.py [SF_DIR ...]
Defaults to /root/repo/.scale/sf0.3. Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS = 0.05
MIN_POINTS = 5


def _ground_truth_cores(vec_id, x, y):
    """(vec_id -> canonical min-core-vec_id label) for core points, plus
    the (x, y, label) arrays of the cores, from the exact local kernel."""
    from dbscan_spark.kernel import local_dbscan

    cluster, flag = local_dbscan(x, y, EPS, MIN_POINTS)
    is_core = flag == "core"
    canon = {}
    for lbl in np.unique(cluster[is_core]):
        members = vec_id[is_core & (cluster == lbl)]
        canon[lbl] = int(members.min())
    core_ids = vec_id[is_core]
    core_lbl = np.array([canon[c] for c in cluster[is_core]], dtype=np.int64)
    return (
        dict(zip(core_ids.tolist(), core_lbl.tolist())),
        x[is_core],
        y[is_core],
        core_lbl,
    )


def verify(spark, sf_dir: str) -> list[str]:
    import __spark_entry__ as entry

    failures: list[str] = []
    qs = entry.queries()

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = emb.selectExpr(
        "vec_id",
        "CAST(embedding[0] AS DOUBLE) AS x",
        "CAST(embedding[1] AS DOUBLE) AS y",
    ).collect()
    vec_id = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([r["x"] for r in rows])
    y = np.array([r["y"] for r in rows])

    # ---- dbscan_core_components ------------------------------------
    want, _, _, _ = _ground_truth_cores(vec_id, x, y)
    got = {
        r["vec_id"]: r["cluster_rep"]
        for r in qs["dbscan_core_components"](spark, sf_dir).collect()
    }
    if got != want:
        only_got = set(got) - set(want)
        only_want = set(want) - set(got)
        diff = {k for k in set(got) & set(want) if got[k] != want[k]}
        failures.append(
            f"dbscan_core_components: cores+got-only={len(only_got)} "
            f"want-only={len(only_want)} relabeled={len(diff)}"
        )
    print(
        f"dbscan_core_components @ {sf_dir}: "
        f"{'OK' if got == want else 'MISMATCH'} ({len(want)} cores)"
    )

    # ---- dbscan_predict_canonical ----------------------------------
    fit = vec_id % 10 != 0
    _, cx, cy, clbl = _ground_truth_cores(vec_id[fit], x[fit], y[fit])
    held = ~fit
    hx, hy, hid = x[held], y[held], vec_id[held]
    # brute-force nearest core within eps, (d2, cluster) tie-break —
    # the same float64 ops predict() runs, so exact comparison is valid
    want_pred = {}
    for i in range(len(hid)):
        d2 = (cx - hx[i]) ** 2 + (cy - hy[i]) ** 2
        in_eps = d2 <= EPS * EPS
        if in_eps.any():
            cand = np.lexsort((clbl[in_eps], d2[in_eps]))
            want_pred[int(hid[i])] = (int(clbl[in_eps][cand[0]]), "border")
        else:
            want_pred[int(hid[i])] = (0, "noise")
    got_pred = {
        r["vec_id"]: (r["cluster"], r["flag"])
        for r in qs["dbscan_predict_canonical"](spark, sf_dir).collect()
    }
    if got_pred != want_pred:
        diff = {
            k
            for k in set(got_pred) | set(want_pred)
            if got_pred.get(k) != want_pred.get(k)
        }
        failures.append(
            f"dbscan_predict_canonical: {len(diff)} differing probes "
            f"(sample {sorted(diff)[:5]})"
        )
    print(
        f"dbscan_predict_canonical @ {sf_dir}: "
        f"{'OK' if got_pred == want_pred else 'MISMATCH'} "
        f"({len(want_pred)} probes)"
    )

    # ---- dbscan_flags_64d (full-vector distance path) --------------
    from dbscan_spark.kernel import local_dbscan_matrix

    X = np.array(
        [
            r["embedding"]
            for r in emb.select("vec_id", "embedding")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    ids_sorted = np.sort(vec_id)
    _, flags64 = local_dbscan_matrix(X, eps=1.15, min_points=4)
    want64 = dict(zip(ids_sorted.tolist(), flags64.tolist()))
    got64 = {
        r["vec_id"]: r["flag"]
        for r in qs["dbscan_flags_64d"](spark, sf_dir).collect()
    }
    if got64 != want64:
        diff = {
            k
            for k in set(got64) | set(want64)
            if got64.get(k) != want64.get(k)
        }
        failures.append(
            f"dbscan_flags_64d: {len(diff)} differing flags "
            f"(sample {sorted(diff)[:5]})"
        )
    n_core = sum(1 for v in want64.values() if v == "core")
    print(
        f"dbscan_flags_64d @ {sf_dir}: "
        f"{'OK' if got64 == want64 else 'MISMATCH'} "
        f"({len(want64)} points, {n_core} cores)"
    )
    return failures


def main() -> None:
    from dbscan_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/repo/.scale/sf0.3"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[str] = []
    for d in dirs:
        failures += verify(spark, d)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all exact")


if __name__ == "__main__":
    main()
