"""Cluster finalize: representative selection + per-doc cluster stats.

Mirrors ``dedupe_logic/processor.py:230-260``:

* representative = the "most complete" member — reference tuple
  (len(name), len(address), len(phone), reviews_count) becomes the code
  analog (n_chars DESC, repo ASC, path ASC, commit ASC, doc_id ASC) — a
  *total* order, so the pick is deterministic across parallelism levels.
* ``cluster_id`` = the representative's doc_id (``processor.py:248``),
  not an arbitrary component label.
* ``duplicate_count`` = cluster size (``processor.py:249``).
* per-doc ``confidence`` = max confidence over the doc's own edges, 1.0
  for singletons (``processor.py:250-252``).

One ``groupby(label).map_groups`` shuffle over narrow columns — the
reference's per-cluster O(n) record scans (``processor.py:236``) disappear.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Max

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig

ASSIGN_FIELDS = [
    ("doc_id", pa.uint64()),
    ("cluster_id", pa.uint64()),
    ("duplicate_count", pa.uint32()),
    ("confidence", pa.float64()),
    ("is_representative", pa.bool_()),
]


def per_doc_confidence(edges_ds, cfg: PipelineConfig):
    """edges → (doc_id, edge_confidence) via max over incident edges."""
    def emit_endpoints(b: pa.Table) -> pa.Table:
        conf = b.column("confidence").to_numpy()
        return pa.table({
            "doc_id": pa.concat_arrays([
                b.column("id_a").combine_chunks(),
                b.column("id_b").combine_chunks()]),
            "edge_confidence": pa.array(np.concatenate([conf, conf]),
                                        pa.float64()),
        })

    return (edges_ds.select_columns(["id_a", "id_b", "confidence"])
            .map_batches(emit_endpoints, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Max("edge_confidence", alias_name="edge_confidence")))


#: Reference completeness tuple analog for source-code files: prefer the
#: longest content, then lexicographic (repo, path, commit), then doc_id —
#: a TOTAL order, so the representative is parallelism-invariant.
FILES_SORT_KEYS = [
    ("n_chars", "descending"), ("repo", "ascending"), ("path", "ascending"),
    ("commit", "ascending"), ("doc_id", "ascending"),
]

#: Generic tables (e.g. the documents corpus) only need (size, id).
GENERIC_SORT_KEYS = [("n_chars", "descending"), ("doc_id", "ascending")]


def _finalize_group(group: pa.Table, sort_keys) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=sort_keys)
    g = group.take(order)
    n = g.num_rows
    rep_id = g.column("doc_id")[0].as_py()
    doc_ids = g.column("doc_id").to_numpy()
    conf = pc.fill_null(pc.cast(g.column("edge_confidence"), pa.float64()),
                        1.0).to_numpy(zero_copy_only=False)
    out = {
        "doc_id": g.column("doc_id"),
        "cluster_id": pa.array(np.full(n, rep_id, dtype=np.int64), pa.int64()),
        "duplicate_count": pa.array(np.full(n, n, dtype=np.uint32), pa.uint32()),
        "confidence": pa.array(conf, pa.float64()),
        "is_representative": pa.array(doc_ids == rep_id, pa.bool_()),
    }
    for name in g.schema.names:
        if name not in out and name not in ("label", "edge_confidence"):
            out[name] = g.column(name)
    return pa.table(out)


def finalize(docs_ds, labels_ds, edges_ds, cfg: PipelineConfig,
             sort_keys=None):
    """docs ⋈ labels ⋈ per-doc-confidence → groupby(label) → assignments.

    Singletons (docs with no edge) keep label = own doc_id and
    confidence = 1.0 via left-outer joins + fills. ``sort_keys`` is the
    representative total order (default: FILES_SORT_KEYS).
    """
    sort_keys = sort_keys or FILES_SORT_KEYS
    from fuzzy_dedupe_pipeline_ray.sources.io import hash_join

    # materialize() between the chained joins — see stages/verify.py note on
    # the two-joins-one-plan aggregator deadlock.
    joined = hash_join(docs_ds, labels_ds, on="doc_id", join_type="left_outer",
                       cfg=cfg).materialize()
    conf = per_doc_confidence(edges_ds, cfg)
    joined = hash_join(joined, conf, on="doc_id", join_type="left_outer",
                       cfg=cfg)

    def fill_label(b: pa.Table) -> pa.Table:
        label = pc.coalesce(b.column("label"),
                            pc.cast(b.column("doc_id"), pa.int64()))
        return b.set_column(b.schema.get_field_index("label"), "label", label)

    joined = joined.map_batches(fill_label, batch_format="pyarrow")
    return joined.groupby("label").map_groups(
        lambda g: _finalize_group(g, sort_keys), batch_format="pyarrow")
