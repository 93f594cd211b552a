"""Exact-duplicate pre-pass: narrow ``groupby(content_sha256)`` star edges.

Analog of the reference's implicit exact dedup (identical texts get cosine
1.0 ≥ threshold, a consequence of ``dedupe_logic/processor.py:149``) made
explicit and cheap: only ``(content_sha256, doc_id)`` is shuffled — never
``content``. Each sha group emits star edges (min doc_id ↔ member), which
is enough for connectivity; all-pairs inside a 10k-copy license group
would be quadratic (the FIXTURES.md kind-6 skew case).

Edge scoring mirrors the reference's scoring of an identical pair:
score=1.0, second signal=1.0, exact key matches → the hybrid path
(``processor.py:160-163``) → confidence = min(cap, (1+1)/2) = cap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig

EDGE_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("sig_sim", pa.float64()),
    ("second_sim", pa.float64()),
    ("exact_match", pa.bool_()),
    ("match_type", pa.string()),
    ("confidence", pa.float64()),
])


def _star_edges_batch(group: pa.Table, confidence: float) -> pa.Table:
    ids = np.sort(group.column("doc_id").to_numpy())
    if len(ids) < 2:
        return EDGE_SCHEMA.empty_table()
    rep = ids[0]
    others = ids[1:]
    n = len(others)
    return pa.table({
        "id_a": pa.array(np.full(n, rep, dtype=np.int64), pa.int64()),
        "id_b": pa.array(others, pa.int64()),
        "sig_sim": pa.array(np.ones(n), pa.float64()),
        "second_sim": pa.array(np.ones(n), pa.float64()),
        "exact_match": pa.array(np.ones(n, dtype=bool), pa.bool_()),
        "match_type": pa.array(["exact"] * n, pa.string()),
        "confidence": pa.array(np.full(n, confidence), pa.float64()),
    }, schema=EDGE_SCHEMA)


def exact_edges(docs_ds, cfg: PipelineConfig):
    """docs-meta Dataset → exact-duplicate star-edge Dataset.

    Vectorized (no per-group Python). Fast path (narrow sha/doc pairs ≤
    broadcast budget): one local lexsort + run-length pass emits the star
    edges directly — a Ray hash aggregate costs ~15-20 s of fixed shuffle
    setup on the target hosts, far above the actual work at ≤ millions of
    rows. Scale path: SORT by (sha, doc_id) + per-block star emission
    with one carried (sha, family-min) per boundary
    (``_sorted_exact_edges`` — same sort-beats-hash-aggregate rewrite as
    ``lsh._sorted_grouped_pairs``). The sha key is uniform — hash keys
    don't skew even when values do (SURVEY.md §7.3).
    """
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    conf = min(cfg.confidence_cap, 1.0)
    narrow = docs_ds.select_columns(["content_sha256", "doc_id"])

    narrow = narrow.materialize()
    if narrow.count() <= cfg.broadcast_max_rows:
        import ray.data as rd

        tbl = to_local_table(narrow)
        if tbl is None or tbl.num_rows == 0:
            return rd.from_arrow(EDGE_SCHEMA.empty_table())
        shas = tbl.column("content_sha256").to_numpy(zero_copy_only=False)
        docs = tbl.column("doc_id").to_numpy()
        _, inv = np.unique(shas, return_inverse=True)
        order = np.lexsort((docs, inv))
        g = inv[order]
        d = docs[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        lens = np.diff(np.r_[starts, len(g)])
        rep = np.repeat(d[starts], lens)          # min doc_id per sha run
        member_mask = d != rep
        a, b = rep[member_mask], d[member_mask]
        n = len(a)
        out = pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "sig_sim": pa.array(np.ones(n), pa.float64()),
            "second_sim": pa.array(np.ones(n), pa.float64()),
            "exact_match": pa.array(np.ones(n, dtype=bool), pa.bool_()),
            "match_type": pa.array(["exact"] * n, pa.string()),
            "confidence": pa.array(np.full(n, conf), pa.float64()),
        }, schema=EDGE_SCHEMA)
        n_blocks = max(1, min(32, out.num_rows // 1024))
        step = -(-out.num_rows // n_blocks) if out.num_rows else 1
        slices = [out.slice(i, step) for i in range(0, out.num_rows, step)]
        return rd.from_arrow(slices or [out])
    return _sorted_exact_edges(narrow, conf)


def _exact_block_summary(tbl: pa.Table):
    """Ray task: (first_sha, first_doc, last_sha, last_run_min_doc) of a
    (sha, doc_id)-sorted block, or None when empty."""
    if tbl.num_rows == 0:
        return None
    ks = tbl.column("content_sha256").to_numpy(zero_copy_only=False)
    d = tbl.column("doc_id").to_numpy()
    l_start = int(np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])[-1])
    return (ks[0], int(d[0]), ks[-1], int(d[l_start]))


def _exact_block_label(tbl: pa.Table, rep_override, conf: float) -> pa.Table:
    """Ray task: star edges for every sha run in a sorted block. The rep
    of each run is its first doc (global sort by (sha, doc_id) makes it
    the family min) — except a first run continued from the previous
    block, whose TRUE rep (``rep_override``) lives upstream."""
    ks = tbl.column("content_sha256").to_numpy(zero_copy_only=False)
    d = tbl.column("doc_id").to_numpy().astype(np.int64)
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    lens = np.diff(np.r_[starts, len(ks)])
    rep = np.repeat(d[starts], lens)
    if rep_override is not None:
        rep[:lens[0]] = rep_override
    m = d != rep
    a, b = rep[m], d[m]
    n = len(a)
    return pa.table({
        "id_a": pa.array(a, pa.int64()),
        "id_b": pa.array(b, pa.int64()),
        "sig_sim": pa.array(np.ones(n), pa.float64()),
        "second_sim": pa.array(np.ones(n), pa.float64()),
        "exact_match": pa.array(np.ones(n, dtype=bool), pa.bool_()),
        "match_type": pa.array(["exact"] * n, pa.string()),
        "confidence": pa.array(np.full(n, conf), pa.float64()),
    }, schema=EDGE_SCHEMA)


def _sorted_exact_edges(narrow, conf: float):
    """Distributed exact-edge tier by SORT instead of groupby+join (the
    same rewrite as lsh._sorted_grouped_pairs — Ray's range sort is ~25×
    cheaper per row than its hash aggregate): sort (sha, doc_id), emit
    star edges per block, and carry one (sha, family-min) per boundary
    so families that straddle blocks keep their global rep."""
    import ray
    import ray.data as rd

    s = narrow.sort(["content_sha256", "doc_id"]).materialize()
    refs = list(s.to_arrow_refs())
    if not refs:
        return rd.from_arrow(EDGE_SCHEMA.empty_table())
    summarize = ray.remote(_exact_block_summary)
    sums = ray.get([summarize.remote(r) for r in refs])
    label = ray.remote(_exact_block_label)
    out_refs = []
    carry_key, carry_min = None, None
    prev_last = None
    for i, sm in enumerate(sums):
        if sm is None:
            continue
        fk, fdoc, lk, lmin = sm
        if prev_last is not None and fk < prev_last:
            raise RuntimeError(
                "sorted-block order violation: block first sha "
                f"{fk!r} < previous block last sha {prev_last!r} — "
                "the exact-edge boundary carry cannot run (review, "
                "round 5)")
        prev_last = lk
        override = carry_min if carry_key == fk else None
        out_refs.append(label.remote(refs[i], override, conf))
        if not (lk == fk and override is not None):
            # a block wholly inside a carried family keeps the carry;
            # otherwise the last run starts here and owns its min
            carry_key, carry_min = lk, lmin
    if not out_refs:
        return rd.from_arrow(EDGE_SCHEMA.empty_table())
    return rd.from_arrow_refs(out_refs)
