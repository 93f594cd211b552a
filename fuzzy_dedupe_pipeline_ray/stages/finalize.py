"""Cluster finalize: representative selection + per-doc cluster stats.

Mirrors ``dedupe_logic/processor.py:230-260``:

* representative = the "most complete" member — the reference's tuple
  (len(name), len(address), len(phone), reviews_count) becomes
  (n_chars DESC, doc_id ASC): a TOTAL order, so the pick is deterministic
  across runs and parallelism levels.
* ``cluster_id`` = the representative's doc_id (``processor.py:248``),
  not an arbitrary component label.
* ``duplicate_count`` = cluster size (``processor.py:249``).
* per-doc ``confidence`` = max confidence over the doc's own edges, 1.0
  for singletons (``processor.py:250-252``). NOTE: unlike cluster
  assignment, ``confidence`` is NOT batch-size-invariant — the
  fingerprint stage's batch-local sha dedup picks a batch-local rep, so
  fuzzy edge endpoints (and hence which doc carries an edge's max) can
  shift with batching. The determinism guarantee
  (``tests/test_pipeline_e2e.py::test_determinism_across_batch_sizes``)
  deliberately covers ``cluster_id`` / ``duplicate_count`` /
  ``is_representative``, not ``confidence``.

Implementation is FULLY VECTORIZED — no ``map_groups``: a per-group
Python callback over millions of cluster labels dominates wall time, so
the argmax-by-tuple is decomposed into C-path aggregates:

    stats = groupby(label).agg(Count, Max(n_chars))
    reps  = rows where n_chars == max  →  groupby(label).agg(Min(doc_id))

(the reference's per-cluster O(n) scans, ``processor.py:236``, become
three narrow hash aggregates + joins).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig

ASSIGN_COLS = ["doc_id", "cluster_id", "duplicate_count", "confidence",
               "is_representative"]

#: kept for API compatibility with earlier revisions; the vectorized
#: finalize always uses the (n_chars DESC, doc_id ASC) total order.
FILES_SORT_KEYS = [("n_chars", "descending"), ("doc_id", "ascending")]
GENERIC_SORT_KEYS = FILES_SORT_KEYS


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


def finalize(docs_ds, labels_ds, edges_ds, cfg: PipelineConfig,
             sort_keys=None):
    """docs ⋈ labels ⋈ per-doc-confidence → aggregate stats/reps →
    assignments (ASSIGN_COLS + every docs_ds column passed through).

    Singletons (docs with no edge) keep label = own doc_id and
    confidence = 1.0 via left-outer joins + fills. ``sort_keys`` is
    accepted for compatibility; the order is (n_chars DESC, doc_id ASC).

    materialize() barriers between chained joins — see stages/verify.py on
    the two-joins-one-plan aggregator deadlock.
    """
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    joined = lookup_join(docs_ds, labels_ds, on="doc_id",
                         join_type="left_outer", cfg=cfg)

    def fill_label(b: pa.Table) -> pa.Table:
        label = pc.coalesce(b.column("label"),
                            pc.cast(b.column("doc_id"), pa.int64()))
        return b.set_column(b.schema.get_field_index("label"), "label", label)

    joined = joined.map_batches(fill_label, batch_format="pyarrow")

    conf = per_doc_confidence(edges_ds, cfg)
    joined = lookup_join(joined, conf, on="doc_id", join_type="left_outer",
                         cfg=cfg).materialize()

    stats = joined.groupby("label").aggregate(
        Count(alias_name="duplicate_count"),
        Max("n_chars", alias_name="_max_n_chars"))
    joined = lookup_join(joined, stats, on="label", cfg=cfg).materialize()

    # representative = min doc_id among rows attaining the max n_chars
    def rep_candidates(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("n_chars"), b.column("_max_n_chars")))
        return pa.table({"label": t.column("label"),
                         "doc_id": t.column("doc_id")})

    reps = (joined.map_batches(rep_candidates, batch_format="pyarrow")
            .groupby("label").aggregate(Min("doc_id", alias_name="cluster_id")))
    final = lookup_join(joined, reps, on="label", cfg=cfg)

    def emit(b: pa.Table) -> pa.Table:
        confidence = pc.fill_null(
            pc.cast(b.column("edge_confidence"), pa.float64()), 1.0)
        out = {
            "doc_id": b.column("doc_id"),
            "cluster_id": b.column("cluster_id"),
            "duplicate_count": pc.cast(b.column("duplicate_count"),
                                       pa.uint32()),
            "confidence": confidence,
            "is_representative": pc.equal(b.column("doc_id"),
                                          b.column("cluster_id")),
        }
        for name in b.schema.names:
            if name not in out and name not in (
                    "label", "edge_confidence", "_max_n_chars"):
                out[name] = b.column(name)
        return pa.table(out)

    return final.map_batches(emit, batch_format="pyarrow")
