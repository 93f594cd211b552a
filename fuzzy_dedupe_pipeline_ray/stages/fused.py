"""Fused candidate-generation + verification — the above-gate fuzzy tier.

SURVEY.md §2.4 J2 names the alternative to the two-hash-join signature
lookup (``stages/verify.py``): carry the signatures THROUGH the band
shuffle, so pair emission can score candidates in-group and no join ever
gathers per-pair signature copies. This module is that physical plan,
built on the round-4 measurement that Ray's range sort moves the same
rows ~25× cheaper than its hash aggregates (BASELINE.md):

    signatures ─ explode (band_key, doc_id, minhash, simhash, sha)
               ─ ONE range sort on (band_key, doc_id)
               ─ per-block vectorized pair emission + IN-BLOCK scoring
                 (the same ``score_sig_arrays`` decision table the join
                 tier uses — the plans cannot drift)
               ─ O(#blocks) driver scan stitching groups that straddle
                 block boundaries (summaries ship ≤ cap+1 member
                 signatures per boundary run; star spans ship ONE pivot
                 signature)
               ─ sort-based distinct on (id_a, id_b)

    vs the classic tier:   pairs sort + distinct, then pairs ⋈ sigs ×2
                           (each join gathers ~600 B of signature
                           payload per pair — the heaviest joins in the
                           engine, and the round-4 OutOfDisk shape).

The exploded table is ~wider (each row carries the P·4-byte signature,
the uint64 SimHash and the 64-byte sha), but every byte moves through
the shuffle exactly ONCE; the emitted edges are already thresholded, so
the final distinct sorts only kept edges. Scoring a pair that recurs in
several bands re-computes an identical row — the distinct collapses
them; the duplicate scoring is vectorized numpy and measured cheaper
than moving the bytes again.

Partitioning assumption (shared with ``lsh._sorted_grouped_pairs`` /
``relational._sorted_block_scan``): ``Dataset.sort`` emits
range-partitioned blocks whose ``to_arrow_refs`` order IS the global key
order. The boundary scan VERIFIES it in-path from the block summaries
(first/last keys) and raises loudly on violation.

Behavioral provenance: reference pair scoring
``dedupe_logic/processor.py:136-181`` (FAISS kNN probe + cosine/address
thresholds) — here re-expressed as LSH banding + in-group MinHash
agreement, equivalence-tested against the classic tier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions.hashing import (
    band_keys_batch,
    unpack_signatures,
)
from fuzzy_dedupe_pipeline_ray.stages.exact import EDGE_SCHEMA
from fuzzy_dedupe_pipeline_ray.stages.lsh import (
    _local_grouped_pairs,
    _run_lengths,
    distinct_pairs_sorted,
)
from fuzzy_dedupe_pipeline_ray.stages.verify import score_sig_arrays

SIG_COLS = ["doc_id", "minhash", "simhash", "content_sha256"]


def _explode_bands_sig(cfg_json: str):
    """map_batches fn: signature rows → ``num_bands`` keyed rows each,
    CARRYING the scoring payload (minhash, simhash, sha). Zero-copy
    band-key math; payload duplication via Arrow ``take``."""
    cfg = PipelineConfig.from_json(cfg_json)

    def fn(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        if m == 0:
            return pa.table({
                "band_key": pa.array([], pa.int64()),
                "doc_id": batch.column("doc_id"),
                "minhash": batch.column("minhash"),
                "simhash": batch.column("simhash"),
                "content_sha256": batch.column("content_sha256")})
        sigs = unpack_signatures(batch.column("minhash"), cfg.num_perms)
        keys = band_keys_batch(sigs, cfg.num_bands, cfg.rows_per_band)
        idx = pa.array(np.repeat(np.arange(m, dtype=np.int64),
                                 cfg.num_bands))
        return pa.table({
            "band_key": pa.array(keys.ravel(), pa.int64()),
            "doc_id": batch.column("doc_id").take(idx),
            "minhash": batch.column("minhash").take(idx),
            "simhash": batch.column("simhash").take(idx),
            "content_sha256": batch.column("content_sha256").take(idx),
        })

    return fn


def _block_arrays(tbl: pa.Table, key: str, num_perms: int):
    """(k, d, M, H, S): key/doc arrays plus the block's scoring arrays —
    M is a zero-copy (m, P) view of the plasma block where possible."""
    k = tbl.column(key).to_numpy()
    d = tbl.column("doc_id").to_numpy().astype(np.int64)
    m_mat = unpack_signatures(tbl.column("minhash"), num_perms)
    h = tbl.column("simhash").to_numpy()
    s = np.asarray(tbl.column("content_sha256").to_numpy(
        zero_copy_only=False), dtype="S64")
    return k, d, m_mat, h, s


def _edge_block_summary(tbl: pa.Table, key: str, cap: int,
                        num_perms: int):
    """Ray task: per sorted-block summary for the boundary scan — the
    ``lsh._pair_block_summary`` shape, extended with the SIGNATURES of
    each boundary run's unique members (truncated at cap+1, like the id
    lists; entry 0 — the run min, hence the span's star pivot when the
    run is the span's first — is always present):

    ``(first_key, first_row_len, fu_ids, f_n_unique, fu_M, fu_H, fu_S,
       last_key,  last_row_len,  lu_ids, l_n_unique, lu_M, lu_H, lu_S)``
    or None for an empty block."""
    if tbl.num_rows == 0:
        return None
    k, d, m_mat, h, s = _block_arrays(tbl, key, num_perms)
    n = len(k)
    f_len, l_len = _run_lengths(k)

    def run_info(lo: int, hi: int):
        uids, upos = np.unique(d[lo:hi], return_index=True)
        sel = (upos[:cap + 1] + lo)
        return (uids[:cap + 1].copy(), len(uids), m_mat[sel].copy(),
                h[sel].copy(), s[sel].copy())

    fu = run_info(0, f_len)
    lu = run_info(n - l_len, n)
    return (int(k[0]), f_len, *fu, int(k[-1]), l_len, *lu)


def _scan_boundary_spans_sig(summaries, cap: int):
    """Driver scan over block summaries (the ``_scan_boundary_spans``
    control flow, payload-extended): find groups spanning block
    boundaries, decide star-vs-all-pairs from the TRUE unique-member
    count, and return per-block label kwargs plus small-span member
    payloads. Star kwargs carry the span pivot's (id, minhash row,
    simhash, sha); small spans carry the full ≤ cap member payload.

    Also VERIFIES the sort-block-order assumption in-path: consecutive
    non-empty blocks must satisfy ``last_key[i] <= first_key[i+1]`` —
    a Ray upgrade that stopped emitting range-ordered sorted blocks
    would silently mis-stitch, so it raises instead (review item,
    round 5)."""
    from fuzzy_dedupe_pipeline_ray.functions.scans import (
        scan_boundary_spans,
    )

    args = [{"drop_first": False, "drop_last": False, "star_first": None,
             "star_last": None, "drop_all": False, "star_all": None}
            for _ in summaries]
    small_spans: list = []

    def split(sm):
        (fk, f_len, fu_ids, f_nu, fu_m, fu_h, fu_s,
         lk, l_len, lu_ids, l_nu, lu_m, lu_h, lu_s) = sm
        return (fk, (fu_ids, f_nu, fu_m, fu_h, fu_s),
                lk, (lu_ids, l_nu, lu_m, lu_h, lu_s))

    def close(p):
        if len(p["blocks"]) < 2:
            return
        runs = p["payloads"]
        truncated = any(r[1] > cap + 1 for r in runs)
        members = upos = None
        if not truncated:
            ids = np.concatenate([r[0] for r in runs])
            members, upos = np.unique(ids, return_index=True)
        if truncated or len(members) > cap:
            r0 = runs[0]  # runs are in block order ⇒ doc-sorted ⇒
            piv = (int(r0[0][0]), r0[2][0].copy(),  # run 0 row 0 IS the
                   r0[3][0], r0[4][0])              # span's global min
            for i, which in p["blocks"]:
                args[i][f"drop_{which}"] = True
                args[i][f"star_{which}"] = piv
        else:
            mh = np.concatenate([r[2] for r in runs])[upos]
            sh = np.concatenate([r[3] for r in runs])[upos]
            sa = np.concatenate([r[4] for r in runs])[upos]
            for i, which in p["blocks"]:
                args[i][f"drop_{which}"] = True
            small_spans.append((members, mh, sh, sa))

    scan_boundary_spans(summaries, split, close)
    return args, small_spans


def _edge_block_label(tbl: pa.Table, key: str, cap: int, cfg_json: str,
                      drop_first: bool, drop_last: bool, star_first,
                      star_last, drop_all: bool, star_all) -> pa.Table:
    """Ray task: emit this block's SCORED, thresholded edges. Interior
    groups pair-and-score entirely from block-local arrays; boundary
    runs claimed by the driver scan are dropped (the span logic covers
    them) — except star spans, whose (pivot, member) edges are scored
    here against the summary-shipped pivot signature."""
    cfg = PipelineConfig.from_json(cfg_json)
    k, d, m_mat, h, s = _block_arrays(tbl, key, cfg.num_perms)
    # doc → block row holding its signature (any occurrence: a doc's
    # payload is identical on every keyed row)
    u_ids, u_pos = np.unique(d, return_index=True)

    def pos_of(ids: np.ndarray) -> np.ndarray:
        return u_pos[np.searchsorted(u_ids, ids)]

    out: list[pa.Table] = []

    def star_edges(members: np.ndarray, piv):
        gmin, pmh, psh, psha = piv
        mem = np.unique(members[members != gmin])
        if not len(mem):
            return
        jb = pos_of(mem)
        mm = len(mem)
        out.append(score_sig_arrays(
            np.full(mm, gmin, np.int64), mem,
            np.broadcast_to(pmh, (mm, len(pmh))), m_mat[jb],
            np.full(mm, psh, h.dtype), h[jb],
            np.full(mm, psha, s.dtype), s[jb], cfg))

    if drop_all:
        if star_all is not None:
            star_edges(d, star_all)
    else:
        n = len(k)
        f_len, l_len = _run_lengths(k)
        if star_first is not None:
            star_edges(d[:f_len], star_first)
        if star_last is not None:
            star_edges(d[n - l_len:], star_last)
        lo = f_len if drop_first else 0
        hi = n - l_len if drop_last else n
        if hi > lo:
            a, b = _local_grouped_pairs(k[lo:hi], d[lo:hi], cap)
            if len(a):
                ja, jb = pos_of(a), pos_of(b)
                out.append(score_sig_arrays(
                    a, b, m_mat[ja], m_mat[jb], h[ja], h[jb],
                    s[ja], s[jb], cfg))
    if not out:
        return EDGE_SCHEMA.empty_table()
    return pa.concat_tables(out).combine_chunks()


def _span_edges(small_spans, cfg: PipelineConfig) -> pa.Table:
    """Driver-side scored all-pairs for ≤ cap-member boundary spans
    (each entry ships the span's sorted unique members WITH their
    signatures, so no lookup is needed)."""
    tables = []
    for ids, mh, sh, sa in small_spans:
        if len(ids) < 2:
            continue
        i, j = np.triu_indices(len(ids), 1)
        tables.append(score_sig_arrays(ids[i], ids[j], mh[i], mh[j],
                                       sh[i], sh[j], sa[i], sa[j], cfg))
    if not tables:
        return EDGE_SCHEMA.empty_table()
    return pa.concat_tables(tables).combine_chunks()


def fused_scored_edges(signatures_ds, cfg: PipelineConfig):
    """signatures Dataset → scored, thresholded, DISTINCT edge Dataset
    (the classic tier's ``verify_pairs(candidate_pairs(...))`` output,
    bit-identically — equivalence pinned by tests/test_fused_tier.py)."""
    import ray
    import ray.data as rd

    cap = cfg.band_group_pair_cap
    exploded = (signatures_ds.select_columns(SIG_COLS)
                .map_batches(_explode_bands_sig(cfg.to_json()),
                             batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=4096))
    s = exploded.sort(["band_key", "doc_id"]).materialize()
    refs = list(s.to_arrow_refs())
    if not refs:
        return rd.from_arrow(EDGE_SCHEMA.empty_table())
    summarize = ray.remote(_edge_block_summary)
    sums = ray.get([summarize.remote(r, "band_key", cap, cfg.num_perms)
                    for r in refs])
    args, spans = _scan_boundary_spans_sig(sums, cap)
    label = ray.remote(_edge_block_label)
    out_refs = [label.remote(refs[i], "band_key", cap, cfg.to_json(),
                             **args[i])
                for i, sm in enumerate(sums) if sm is not None]
    parts = (rd.from_arrow_refs(out_refs) if out_refs
             else rd.from_arrow(EDGE_SCHEMA.empty_table()))
    span_tbl = _span_edges(spans, cfg)
    if span_tbl.num_rows:
        parts = parts.union(rd.from_arrow(span_tbl))
    return distinct_pairs_sorted(parts, schema=EDGE_SCHEMA)
