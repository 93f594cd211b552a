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
    rows. Scale path: ``groupby(sha).aggregate(Min(doc_id))`` → join the
    rep back → filter members → star edges per batch. The sha key is
    uniform — hash keys don't skew even when values do (SURVEY.md §7.3).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join, to_local_table

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
    reps = narrow.groupby("content_sha256").aggregate(
        Min("doc_id", alias_name="rep_id"))
    joined = lookup_join(narrow, reps, on="content_sha256", cfg=cfg)

    def star(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b.column("doc_id"), b.column("rep_id")))
        n = t.num_rows
        return pa.table({
            "id_a": t.column("rep_id"),
            "id_b": t.column("doc_id"),
            "sig_sim": pa.array(np.ones(n), pa.float64()),
            "second_sim": pa.array(np.ones(n), pa.float64()),
            "exact_match": pa.array(np.ones(n, dtype=bool), pa.bool_()),
            "match_type": pa.array(["exact"] * n, pa.string()),
            "confidence": pa.array(np.full(n, conf), pa.float64()),
        }, schema=EDGE_SCHEMA)

    return joined.map_batches(star, batch_format="pyarrow")
