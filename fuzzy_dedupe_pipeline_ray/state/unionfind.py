"""Union-find over sparse uint64 node ids.

The driver-side CC fast path (analog of the reference's BFS over an
in-memory adjacency, ``dedupe_logic/processor.py:206-228``) — used when the
edge count is small enough to stream to the driver
(``PipelineConfig.cc_unionfind_max_edges``). The scale path is label
propagation (``stages/cc.py``); both must produce identical components
(min-doc_id labels), which
``tests/test_pipeline_e2e.py::test_cc_strategies_equivalent`` asserts.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    """Path-halving + union-by-min-root DSU keyed by arbitrary uint64 ids.

    Using the *minimum* member id as the root label makes the final labels
    independent of edge insertion order — required for determinism across
    parallelism levels.
    """

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = p.get(x, x)
        while root in p and p[root] != root:
            root = p[root]
        # path compression
        while x != root:
            nxt = p.get(x, x)
            p[x] = root
            x = nxt
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            self.parent.setdefault(ra, ra)
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo
        self.parent.setdefault(lo, lo)

    def add_edges(self, id_a: np.ndarray, id_b: np.ndarray) -> None:
        for a, b in zip(id_a.tolist(), id_b.tolist()):
            self.union(a, b)

    def labels(self) -> "dict[int, int]":
        """node → min-member label, for every node ever unioned."""
        return {x: self.find(x) for x in list(self.parent)}
