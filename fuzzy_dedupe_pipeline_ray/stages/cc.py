"""Connected components over the edge Dataset.

Analog of the reference's BFS over an in-memory adjacency
(``dedupe_logic/processor.py:206-228``), replaced by two strategies that
both produce *min-member labels* (deterministic regardless of edge order
or parallelism — SURVEY.md §4.1 "determinism must be designed"):

* ``unionfind`` — stream the narrow (id_a, id_b) columns to a driver-side
  DSU. Fast path when edges ≤ ``cc_unionfind_max_edges`` (the candidate
  set after thresholding is tiny relative to the corpus; the reference's
  whole adjacency fits in memory for the same reason). The 100 TB path is
  per-partition union-find forests merged in a reducer (BTS, ICDE 2024) —
  the partial-forest trick is what ``labelprop`` degenerates to below.

* ``forest`` — partition-wise DSU forests merged in a reduce tree (the
  BTS shape, Koo et al. ICDE 2024, named in SURVEY §4.2): each edge
  partition reduces to its spanning forest — the (node, min-label) pairs
  of ``numpy_cc`` over just that partition, which preserve exactly the
  partition's connectivity — and forests merge pairwise up a fan-in tree
  (a forest IS an edge list, so the merge is ``numpy_cc`` again).
  O(log P) levels of vectorized C kernels, no per-round hash joins.
  Partitioning assumption: the DISTINCT EDGE ENDPOINTS of any one merged
  subtree (at the root: of the whole edge set) must fit one worker's
  memory — at dedup scale the edge-touched nodes are a small fraction of
  the corpus and each forest carries ≤ one row per node. Beyond that,
  fall back to ``labelprop``.

* ``labelprop`` — distributed iterative min-label propagation: each round,
  every node's label becomes min(own, neighbors'); implemented as
  symmetric-edge ⋈ labels join + union + groupby-min. Converges in
  O(diameter) rounds; star-pairing in the LSH/exact stages keeps component
  diameter small (stars of stars), and ``cc_max_rounds`` bounds the loop.
  Kept as the no-single-node-bottleneck fallback; each round is a full
  hash join + groupby, so ``forest`` beats it whenever its memory
  assumption holds.

``auto`` picks unionfind when the edge count is under the limit, else
``forest``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.state.unionfind import numpy_cc

LABEL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])


def cc_unionfind(edges_ds) -> pa.Table:
    """Edges → (doc_id, label) Arrow table via the driver-side vectorized
    DSU (``state.unionfind.numpy_cc`` — min-label propagation with pointer
    jumping, no per-edge Python; equivalent to :class:`UnionFind`, which
    remains the incremental/reference implementation for tests).

    Streams only the two int64 id columns (``iter_batches``), never the
    scored columns."""
    parts_a, parts_b = [], []
    for batch in edges_ds.select_columns(["id_a", "id_b"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        parts_a.append(batch.column("id_a").to_numpy())
        parts_b.append(batch.column("id_b").to_numpy())
    if not parts_a:
        return LABEL_SCHEMA.empty_table()
    nodes, labs = numpy_cc(np.concatenate(parts_a), np.concatenate(parts_b))
    if len(nodes) == 0:
        return LABEL_SCHEMA.empty_table()
    return pa.table({"doc_id": pa.array(nodes, pa.int64()),
                     "label": pa.array(labs, pa.int64())},
                    schema=LABEL_SCHEMA)


def _forest_partial(block_refs):
    """Ray task body: a group of edge blocks → its spanning forest as a
    (id_a=node, id_b=partition-min-label) edge table. The forest has the
    same components as the input edges restricted to this partition, in
    ≤ one row per distinct endpoint."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    blocks = [t for t in ray.get(list(block_refs)) if t.num_rows]
    if not blocks:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    nodes, labs = numpy_cc(
        np.concatenate([b.column("id_a").to_numpy() for b in blocks]),
        np.concatenate([b.column("id_b").to_numpy() for b in blocks]))
    return pa.table({"id_a": pa.array(nodes, pa.int64()),
                     "id_b": pa.array(labs, pa.int64())})


def _forest_merge(*forests):
    """Ray task body: merge spanning forests — a forest is an edge list,
    so the merge is ``numpy_cc`` over their concatenation. Every node of
    every child forest survives (as an ``id_a`` entry), so the root's
    output labels every edge-touched node with its GLOBAL min member —
    merge-order-independent (min is associative/commutative)."""
    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    live = [f for f in forests if f.num_rows]
    if not live:
        return forests[0]
    nodes, labs = numpy_cc(
        np.concatenate([f.column("id_a").to_numpy() for f in live]),
        np.concatenate([f.column("id_b").to_numpy() for f in live]))
    return pa.table({"id_a": pa.array(nodes, pa.int64()),
                     "id_b": pa.array(labs, pa.int64())})


def _forest_to_labels(forest):
    """Ray task body: root forest → LABEL_SCHEMA table."""
    return pa.table({"doc_id": forest.column("id_a"),
                     "label": forest.column("id_b")}, schema=LABEL_SCHEMA)


#: reduce-tree fan-in: wide enough that a 1000-partition edge set merges
#: in 4 levels, narrow enough that one merge task never concatenates more
#: than FANIN forests at once.
_FOREST_FANIN = 8


def cc_forest(edges_ds, cfg: PipelineConfig):
    """Edges → (doc_id, label) Dataset via partition-wise DSU forests
    merged in a reduce tree (see module docstring). All reduction happens
    off-driver; the driver holds only ObjectRefs."""
    import ray

    refs = list(edges_ds.select_columns(["id_a", "id_b"])
                .materialize().to_arrow_refs())
    if not refs:
        return ray.data.from_arrow(LABEL_SCHEMA.empty_table())
    # leaf tasks: a few blocks each (one allocator warmup per worker)
    n_leaves = min(len(refs), max(8, int(
        ray.cluster_resources().get("CPU", 8))))
    step = -(-len(refs) // n_leaves)
    part = ray.remote(_forest_partial)
    level = [part.remote(refs[i:i + step])
             for i in range(0, len(refs), step)]
    merge = ray.remote(_forest_merge)
    while len(level) > 1:
        level = [merge.remote(*level[i:i + _FOREST_FANIN])
                 for i in range(0, len(level), _FOREST_FANIN)]
    final = ray.remote(_forest_to_labels).remote(level[0])
    return ray.data.from_arrow_refs([final])


def _sym(batch: pa.Table) -> pa.Table:
    a = batch.column("id_a").to_numpy()
    b = batch.column("id_b").to_numpy()
    return pa.table({
        "src": pa.array(np.concatenate([a, b]), pa.int64()),
        "dst": pa.array(np.concatenate([b, a]), pa.int64()),
    })


def cc_labelprop(edges_ds, cfg: PipelineConfig) -> pa.Table:
    """Distributed min-label propagation; returns (doc_id, label) table.

    Every round: msgs = labels⋈edges (label flows src→dst), then
    labels = groupby(node).min(label ∪ msgs). Fixpoint when no label
    changed (checked with a narrow join diff).
    """
    edges_sym = edges_ds.select_columns(["id_a", "id_b"]).map_batches(
        _sym, batch_format="pyarrow").materialize()
    if edges_sym.count() == 0:
        return LABEL_SCHEMA.empty_table()

    # initial labels: every endpoint labels itself
    labels = (
        edges_sym.map_batches(
            lambda b: pa.table({"node": b.column("src"),
                                "label": b.column("src")}),
            batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    for _round in range(cfg.cc_max_rounds):
        from fuzzy_dedupe_pipeline_ray.sources.io import hash_join

        lab_by_src = labels.rename_columns({"node": "src"})
        msgs = hash_join(edges_sym, lab_by_src, on="src", cfg=cfg)
        msgs = msgs.map_batches(
            lambda b: pa.table({"node": b.column("dst"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        new_labels = (
            labels.union(msgs)
            .groupby("node").aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # convergence: any node whose label changed?
        diff = hash_join(new_labels.rename_columns({"label": "new_label"}),
                         labels, on="node", cfg=cfg)
        changed = diff.map_batches(
            lambda b: pa.table({"changed": pa.array(
                [int((b.column("new_label").to_numpy()
                      != b.column("label").to_numpy()).sum())], pa.int64())}),
            batch_format="pyarrow").sum("changed")
        labels = new_labels
        if not changed:
            break
    else:
        raise RuntimeError(
            f"label propagation did not converge in {cfg.cc_max_rounds} rounds")

    return labels.rename_columns({"node": "doc_id"})


def connected_components(edges_ds, cfg: PipelineConfig):
    """Edges → (doc_id, label) Dataset for every node that appears in an
    edge. Only docs with at least one duplicate edge appear; singletons are
    handled downstream by a left join defaulting label = own doc_id."""
    strategy = cfg.cc_strategy
    if strategy == "auto":
        n_edges = edges_ds.count()
        strategy = ("unionfind" if n_edges <= cfg.cc_unionfind_max_edges
                    else "forest")
    if strategy == "unionfind":
        return ray.data.from_arrow(cc_unionfind(edges_ds))
    if strategy == "forest":
        return cc_forest(edges_ds, cfg)
    return cc_labelprop(edges_ds, cfg)
