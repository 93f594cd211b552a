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

* ``labelprop`` — distributed iterative min-label propagation: each round,
  every node's label becomes min(own, neighbors'); implemented as
  symmetric-edge ⋈ labels join + union + groupby-min. Converges in
  O(diameter) rounds; star-pairing in the LSH/exact stages keeps component
  diameter small (stars of stars), and ``cc_max_rounds`` bounds the loop.

``auto`` picks unionfind when the edge count is under the limit.
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
                    else "labelprop")
    if strategy == "unionfind":
        return ray.data.from_arrow(cc_unionfind(edges_ds))
    return cc_labelprop(edges_ds, cfg)
