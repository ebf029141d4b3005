"""Union-find / connected components: reference DBSCANGraphSuite scenarios."""

from __future__ import annotations

from dbscan_spark.graph import UnionFind, assign_global_ids


def components(uf: UnionFind):
    out = {}
    for v in uf.vertices():
        out.setdefault(uf.find(v), set()).add(v)
    return {frozenset(s) for s in out.values()}


def test_connected():
    """DBSCANGraphSuite.scala:25-33."""
    uf = UnionFind()
    uf.union(1, 3)
    assert uf.find(1) == uf.find(3)


def test_doubly_connected():
    """DBSCANGraphSuite.scala:35-43: transitive connectivity."""
    uf = UnionFind()
    uf.union(1, 3)
    uf.union(3, 4)
    assert uf.find(1) == uf.find(4)


def test_isolated_vertex():
    """DBSCANGraphSuite.scala:45-53: vertex 5 connects to nothing."""
    uf = UnionFind()
    uf.add(5)
    uf.union(1, 3)
    assert components(uf) == {frozenset({1, 3}), frozenset({5})}


def test_global_id_assignment():
    ids = [(0, 1), (0, 2), (1, 1), (2, 1)]
    edges = [((0, 1), (1, 1)), ((1, 1), (2, 1))]
    gmap = assign_global_ids(ids, edges)
    assert gmap[(0, 1)] == gmap[(1, 1)] == gmap[(2, 1)]
    assert gmap[(0, 2)] != gmap[(0, 1)]
    assert set(gmap.values()) == {1, 2}


def test_global_ids_deterministic():
    ids = [(1, 1), (0, 1), (0, 2)]
    edges = []
    a = assign_global_ids(ids, edges)
    b = assign_global_ids(list(reversed(ids)), edges)
    assert a == b  # sorted-vertex assignment order
