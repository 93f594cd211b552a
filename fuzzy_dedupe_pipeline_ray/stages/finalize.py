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

    # Distributed path: stay NARROW until the very last step. The
    # previous shape chained four joins + two aggregates over the WIDE
    # docs rows (content bytes moved through every sort/shuffle); here
    # every join/aggregate runs on (doc_id, n_chars, label, ...) int
    # columns and only the final assignment table — the fast path's
    # exact shape — joins back onto the wide docs Dataset once
    # (round-5 profile: forced-mode assignments 6.8 s → the wide-row
    # traffic was the dominant term).
    narrow = docs_ds.select_columns(["doc_id", "n_chars"])
    joined = lookup_join(narrow, labels_ds, on="doc_id",
                         join_type="left_outer", cfg=cfg)

    def fill_label(b: pa.Table) -> pa.Table:
        label = pc.coalesce(b.column("label"),
                            pc.cast(b.column("doc_id"), pa.int64()))
        return b.set_column(b.schema.get_field_index("label"), "label", label)

    joined = joined.map_batches(fill_label, batch_format="pyarrow")

    conf = per_doc_confidence(edges_ds, cfg)
    joined = lookup_join(joined, conf, on="doc_id", join_type="left_outer",
                         cfg=cfg).materialize()

    # Per-label stats + representative via ONE label range sort and the
    # shared sorted-block scaffold — replacing two hash aggregates plus
    # two joins (each a ~1.5 s fixed cost at 32 CPUs: the round-5
    # profile showed per-operation spin-up, not row volume, dominating
    # this stage). Boundary-straddling label groups combine through the
    # associative (count, max_n, rep) merge in the driver scan.
    from fuzzy_dedupe_pipeline_ray.pipelines.relational import (
        _sorted_block_scan,
    )

    s = joined.sort("label").materialize()
    assign = _sorted_block_scan(s, _fin_label_summary, (), _fin_label_scan,
                                _fin_label_emit)
    if assign is None:
        import ray.data as rd

        assign = rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "duplicate_count": pa.array([], pa.uint32()),
            "confidence": pa.array([], pa.float64()),
            "is_representative": pa.array([], pa.bool_())}))
    return lookup_join(docs_ds, assign.materialize(), on="doc_id", cfg=cfg,
                       right_count=n_docs)


_I64_MAX = np.iinfo(np.int64).max


def _fin_run_agg(n_chars: np.ndarray, doc: np.ndarray):
    """(count, max_n_chars, rep) of one label run — rep = min doc_id
    among rows attaining the run max (the finalize total order)."""
    mx = n_chars.max()
    return (len(doc), int(mx), int(doc[n_chars == mx].min()))


def _fin_label_summary(tbl: pa.Table):
    """Ray task: boundary-run summary of a label-sorted block —
    ``(first_label, (cnt, max_n, rep), last_label, (cnt, max_n, rep))``
    or None when empty."""
    if tbl.num_rows == 0:
        return None
    from fuzzy_dedupe_pipeline_ray.stages.lsh import _run_lengths

    lab = tbl.column("label").to_numpy()
    nch = tbl.column("n_chars").to_numpy()
    doc = tbl.column("doc_id").to_numpy()
    n = len(lab)
    f_len, l_len = _run_lengths(lab)
    return (int(lab[0]), _fin_run_agg(nch[:f_len], doc[:f_len]),
            int(lab[-1]), _fin_run_agg(nch[n - l_len:], doc[n - l_len:]))


def _fin_label_scan(summaries):
    """Driver scan: combine label groups straddling block boundaries by
    the associative merge (count=sum, max_n=max, rep=min over runs
    attaining the global max) and hand each block its boundary-run
    overrides ``(ov_first, ov_last, ov_all)``. Verifies sorted-block
    key order in-path (raises on violation — round-5 review item)."""
    from fuzzy_dedupe_pipeline_ray.functions.scans import (
        scan_boundary_spans,
    )

    args = [{"ov_first": None, "ov_last": None, "ov_all": None}
            for _ in summaries]

    def split(sm):
        fk, f_agg, lk, l_agg = sm
        return fk, f_agg, lk, l_agg

    def close(p):
        if len(p["blocks"]) < 2:
            return
        aggs = p["payloads"]
        cnt = sum(a[0] for a in aggs)
        mx = max(a[1] for a in aggs)
        rep = min(a[2] for a in aggs if a[1] == mx)
        for i, which in p["blocks"]:
            args[i][f"ov_{which}"] = (cnt, mx, rep)

    scan_boundary_spans(summaries, split, close)
    return [(a["ov_first"], a["ov_last"], a["ov_all"]) for a in args]


def _fin_label_emit(tbl: pa.Table, ov_first, ov_last, ov_all) -> pa.Table:
    """Ray task: per-row assignment columns from this block's label runs
    (vectorized reduceat per run), with driver overrides applied to the
    boundary runs that straddle blocks."""
    lab = tbl.column("label").to_numpy()
    nch = tbl.column("n_chars").to_numpy()
    doc = tbl.column("doc_id").to_numpy()
    n = len(lab)
    starts = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
    counts = np.diff(np.r_[starts, n])
    maxn = np.maximum.reduceat(nch, starts)
    maxn_row = np.repeat(maxn, counts)
    masked = np.where(nch == maxn_row, doc, _I64_MAX)
    rep = np.minimum.reduceat(masked, starts)
    cnt = counts.astype(np.int64)
    if ov_all is not None:
        cnt[:] = ov_all[0]
        rep[:] = ov_all[2]
    else:
        if ov_first is not None:
            cnt[0], _, rep[0] = ov_first
        if ov_last is not None:
            cnt[-1], _, rep[-1] = ov_last
    cnt_row = np.repeat(cnt, counts)
    rep_row = np.repeat(rep, counts)
    confidence = pc.fill_null(
        pc.cast(tbl.column("edge_confidence"), pa.float64()), 1.0)
    return pa.table({
        "doc_id": tbl.column("doc_id"),
        "cluster_id": pa.array(rep_row, pa.int64()),
        "duplicate_count": pa.array(cnt_row.astype(np.uint32),
                                    pa.uint32()),
        "confidence": confidence,
        "is_representative": pa.array(doc == rep_row, pa.bool_()),
    })
