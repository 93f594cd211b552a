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


def _finalize_local_assign(docs_tbl: pa.Table, labels_tbl: pa.Table,
                           edges_tbl: pa.Table) -> pa.Table:
    """Pure-numpy assignment computation over the NARROW columns:
    (doc_id, label, cluster_id, duplicate_count, confidence,
    is_representative) — one lexsort + run-length pass instead of three
    Ray hash aggregates (each aggregate costs ~15-20 s of fixed shuffle
    setup on the target hosts, dwarfing the actual work at ≤ millions of
    rows). Semantics identical to the distributed path below."""
    doc = docs_tbl.column("doc_id").to_numpy()
    n_chars = docs_tbl.column("n_chars").to_numpy().astype(np.int64)

    # label per doc (default: own id — singleton clusters)
    label = doc.copy()
    if labels_tbl.num_rows:
        ld = labels_tbl.column("doc_id").to_numpy()
        ll = labels_tbl.column("label").to_numpy()
        o = np.argsort(ld)
        ld, ll = ld[o], ll[o]
        pos = np.minimum(np.searchsorted(ld, doc), len(ld) - 1)
        found = ld[pos] == doc
        label[found] = ll[pos[found]]

    # per-doc max edge confidence (1.0 where no incident edge)
    confidence = np.ones(len(doc), dtype=np.float64)
    if edges_tbl.num_rows:
        pts = np.concatenate([edges_tbl.column("id_a").to_numpy(),
                              edges_tbl.column("id_b").to_numpy()])
        cfs = np.concatenate([edges_tbl.column("confidence").to_numpy()] * 2)
        o = np.argsort(pts, kind="stable")
        pts, cfs = pts[o], cfs[o]
        starts = np.flatnonzero(np.r_[True, pts[1:] != pts[:-1]])
        maxes = np.maximum.reduceat(cfs, starts)
        uniq_pts = pts[starts]
        pos = np.minimum(np.searchsorted(uniq_pts, doc), len(uniq_pts) - 1)
        found = uniq_pts[pos] == doc
        confidence[found] = maxes[pos[found]]

    # per-label stats + representative: sort by (label, n_chars DESC,
    # doc_id ASC) — the first row of each label run IS the representative
    # (max n_chars, min doc_id among ties), dup_count = run length
    order = np.lexsort((doc, -n_chars, label))
    ls = label[order]
    starts = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
    lens = np.diff(np.r_[starts, len(ls)])
    rep_of_run = doc[order][starts]
    run_of_row = np.repeat(np.arange(len(starts)), lens)
    cluster_sorted = rep_of_run[run_of_row]
    count_sorted = lens[run_of_row]
    inv = np.empty(len(doc), dtype=np.int64)
    inv[order] = np.arange(len(doc))
    cluster_id = cluster_sorted[inv]
    dup_count = count_sorted[inv]

    return pa.table({
        "doc_id": pa.array(doc, pa.int64()),
        "cluster_id": pa.array(cluster_id, pa.int64()),
        "duplicate_count": pa.array(dup_count.astype(np.uint32),
                                    pa.uint32()),
        "confidence": pa.array(confidence, pa.float64()),
        "is_representative": pa.array(doc == cluster_id, pa.bool_()),
    })


def finalize(docs_ds, labels_ds, edges_ds, cfg: PipelineConfig,
             sort_keys=None):
    """docs ⋈ labels ⋈ per-doc-confidence → aggregate stats/reps →
    assignments (ASSIGN_COLS + every docs_ds column passed through).

    Singletons (docs with no edge) keep label = own doc_id and
    confidence = 1.0 via left-outer joins + fills. ``sort_keys`` is
    accepted for compatibility; the order is (n_chars DESC, doc_id ASC).

    Fast path (narrow inputs within the broadcast budget): the label /
    confidence / stats computation happens in ONE local vectorized pass
    (``_finalize_local_assign``) and only the resulting narrow assignment
    table is broadcast-joined back onto the (wide) docs Dataset. The
    distributed join+aggregate path below is the 100 TB shape.

    materialize() barriers between chained joins — see stages/verify.py on
    the two-joins-one-plan aggregator deadlock.
    """
    from fuzzy_dedupe_pipeline_ray.sources.io import (
        lookup_join,
        to_local_table,
    )

    docs_ds = docs_ds.materialize()
    edges_ds = edges_ds.materialize()
    labels_ds = labels_ds.materialize()
    n_docs = docs_ds.count()
    if (n_docs <= cfg.broadcast_max_rows
            and edges_ds.count() <= cfg.broadcast_max_rows):
        docs_narrow = to_local_table(
            docs_ds.select_columns(["doc_id", "n_chars"]))
        labels_tbl = to_local_table(labels_ds)
        edges_tbl = to_local_table(
            edges_ds.select_columns(["id_a", "id_b", "confidence"]))
        if docs_narrow is not None:
            assign = _finalize_local_assign(
                docs_narrow,
                labels_tbl if labels_tbl is not None
                else pa.table({"doc_id": pa.array([], pa.int64()),
                               "label": pa.array([], pa.int64())}),
                edges_tbl if edges_tbl is not None
                else pa.table({"id_a": pa.array([], pa.int64()),
                               "id_b": pa.array([], pa.int64()),
                               "confidence": pa.array([], pa.float64())}))
            import ray.data as rd

            return lookup_join(docs_ds, rd.from_arrow(assign), on="doc_id",
                               cfg=cfg, right_count=n_docs)

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
