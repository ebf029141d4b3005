"""Union-find over local-cluster ids (driver-side, pure Python).

The reference merges clusters that span partition boundaries by building an
undirected graph whose vertices are ``(partition_id, local_cluster_id)``
pairs and taking connected components via BFS (DBSCANGraph.scala:24-89,
driven from DBSCAN.scala:148-183). The vertex set is bounded by the number
of *local clusters* (hundreds), never the number of points — the
MR-DBSCAN trick that keeps the merge step driver-sized at any data scale.

We use weighted-union + path-compression union-find, which is simpler and
asymptotically better than BFS-per-vertex.
"""

from __future__ import annotations

from collections.abc import Hashable, Iterable
from typing import TypeVar

V = TypeVar("V", bound=Hashable)


class UnionFind:
    """Disjoint sets with path compression and union by size."""

    def __init__(self) -> None:
        self._parent: dict[Hashable, Hashable] = {}
        self._size: dict[Hashable, int] = {}

    def add(self, v: Hashable) -> None:
        if v not in self._parent:
            self._parent[v] = v
            self._size[v] = 1

    def find(self, v: Hashable) -> Hashable:
        self.add(v)
        root = v
        while self._parent[root] != root:
            root = self._parent[root]
        while self._parent[v] != root:  # path compression
            self._parent[v], v = root, self._parent[v]
        return root

    def union(self, a: Hashable, b: Hashable) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self._size[ra] < self._size[rb]:
            ra, rb = rb, ra
        self._parent[rb] = ra
        self._size[ra] += self._size[rb]

    def vertices(self) -> list[Hashable]:
        return list(self._parent)


def assign_global_ids(
    local_ids: Iterable[V], edges: Iterable[tuple[V, V]]
) -> dict[V, int]:
    """Map every local cluster id to a global id 1..k, one per connected
    component (DBSCAN.scala:163-183 fold, made order-deterministic by
    assigning components in sorted-vertex order)."""
    uf = UnionFind()
    for v in local_ids:
        uf.add(v)
    for a, b in edges:
        uf.union(a, b)
    component_id: dict[Hashable, int] = {}
    out: dict[V, int] = {}
    for v in sorted(uf.vertices()):
        root = uf.find(v)
        if root not in component_id:
            component_id[root] = len(component_id) + 1
        out[v] = component_id[root]
    return out
