"""Pair verification: estimated Jaccard + SimHash corroboration + exact
flag → match_type / confidence, thresholded.

Mirrors the reference's pair-scoring block
(``dedupe_logic/processor.py:149-181``) signal-for-signal:

  cosine score            → ``sig_sim``   = mean(minhash_a == minhash_b)
  address cosine          → ``second_sim``= 1 − hamming(simhash)/64
  normalized-phone equal  → ``exact_match``= (sha256_a == sha256_b)

and decision-for-decision (``processor.py:149,160-168``):

  keep iff sig_sim ≥ jaccard_threshold            (primary gate, 0.80)
  exact_match ∧ second_sim ≥ hybrid_primary_relax → 'hybrid',
      confidence = min(cap, (sig_sim+second_sim)/2)
  second_sim ≥ simhash_threshold                  → 'signature+bits',
      confidence = min(cap, (sig_sim+second_sim)/2)
  else                                            → 'signature',
      confidence = sig_sim

Signature lookup is two hash joins of the narrow candidate-pair table
against the signatures checkpoint (SURVEY.md §2.4 J2) — NOT a positional
record lookup in driver memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions.hashing import hamming64, unpack_signatures
from fuzzy_dedupe_pipeline_ray.stages.exact import EDGE_SCHEMA


def score_pairs_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Vectorized scorer over a joined batch with columns
    (id_a, id_b, minhash_a, simhash_a, sha_a, minhash_b, simhash_b, sha_b)."""
    m = batch.num_rows
    if m == 0:
        return EDGE_SCHEMA.empty_table()
    sig_a = unpack_signatures(batch.column("minhash_a"), cfg.num_perms)
    sig_b = unpack_signatures(batch.column("minhash_b"), cfg.num_perms)
    sig_sim = (sig_a == sig_b).mean(axis=1)

    ham = hamming64(batch.column("simhash_a").to_numpy(),
                    batch.column("simhash_b").to_numpy())
    second_sim = 1.0 - ham / 64.0

    sha_a = batch.column("sha_a").to_numpy(zero_copy_only=False)
    sha_b = batch.column("sha_b").to_numpy(zero_copy_only=False)
    exact = sha_a == sha_b

    keep = sig_sim >= cfg.jaccard_threshold
    hybrid = exact & (second_sim >= cfg.hybrid_primary_relax)
    sigbits = (~hybrid) & (second_sim >= cfg.simhash_threshold)
    combined = np.minimum(cfg.confidence_cap, (sig_sim + second_sim) / 2.0)
    confidence = np.where(hybrid | sigbits, combined, sig_sim)
    match_type = np.where(hybrid, "hybrid",
                          np.where(sigbits, "signature+bits", "signature"))

    id_a = batch.column("id_a").to_numpy()
    id_b = batch.column("id_b").to_numpy()
    k = keep
    return pa.table({
        "id_a": pa.array(id_a[k], pa.int64()),
        "id_b": pa.array(id_b[k], pa.int64()),
        "sig_sim": pa.array(sig_sim[k], pa.float64()),
        "second_sim": pa.array(second_sim[k], pa.float64()),
        "exact_match": pa.array(exact[k], pa.bool_()),
        "match_type": pa.array(match_type[k].tolist(), pa.string()),
        "confidence": pa.array(confidence[k], pa.float64()),
    }, schema=EDGE_SCHEMA)


def _prep_sig_bank(block_refs, num_perms: int):
    """Ray task body: signature blocks → the broadcast verify bank

    ``(ids_sorted, order, matT, simhash, sha)``

    * ``matT`` — the signature matrix PERM-MAJOR (``(P, n)`` C-order): a
      permutation slice is a CONTIGUOUS region, so each perm-slice count
      task touches only its own ``(hi-lo)·n·8`` bytes of the (plasma
      mmap-shared) bank. Row-major gathers measured 4.3× slower (random
      access over the whole 437 MB matrix) and forced every worker to
      fault the full bank.
    * narrow arrays stay in ORIGINAL row order; pairs address rows via
      ``order[searchsorted(ids_sorted, id)]`` — skipping a 437 MB
      sort-gather of the matrix.
    * sha as fixed-width S64 (contiguous buffer, zero-copy via plasma; an
      object-dtype string array would re-unpickle on every ``ray.get``).
    """
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    blocks = [t for t in ray.get(list(block_refs)) if t.num_rows]
    if not blocks:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty((num_perms, 0), np.uint64),
                np.empty(0, np.uint64), np.empty(0, "S64"))
    mats = [unpack_signatures(b.column("minhash"), num_perms)
            for b in blocks]  # zero-copy views into the plasma blocks
    n = sum(m.shape[0] for m in mats)
    # fill the perm-major matrix directly from the block views — ONE
    # strided pass, no intermediate row-major copy (fresh-page mass is
    # the dominant cost of this task on fault-rate-limited hosts)
    matT = np.empty((num_perms, n), dtype=np.uint64)
    ofs = 0
    for m in mats:
        matT[:, ofs:ofs + m.shape[0]] = m.T
        ofs += m.shape[0]
    ids = np.concatenate([b.column("doc_id").to_numpy() for b in blocks])
    order = np.argsort(ids, kind="stable").astype(np.int64)
    simhash = np.concatenate(
        [b.column("simhash").to_numpy() for b in blocks])
    sha = np.concatenate([np.asarray(
        b.column("content_sha256").to_numpy(zero_copy_only=False),
        dtype="S64") for b in blocks])
    return ids[order], order, matT, simhash, sha


def _prep_pair_index(pair_refs, bank):
    """Ray task body: candidate-pair blocks → ``(id_a, id_b, ja, jb)``
    with ja/jb the ORIGINAL bank row index per endpoint. Pairs whose id is
    absent from the signature table are dropped here (the inner-join
    semantics of the distributed two-join path)."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    # `bank` arrives auto-resolved (top-level ObjectRef task arg)
    ids_sorted, order = bank[0], bank[1]
    blocks = [t for t in ray.get(list(pair_refs)) if t.num_rows]
    e = np.empty(0, np.int64)
    if not blocks or len(ids_sorted) == 0:
        return e, e, e, e
    id_a = np.concatenate([b.column("id_a").to_numpy() for b in blocks])
    id_b = np.concatenate([b.column("id_b").to_numpy() for b in blocks])
    hi = len(ids_sorted) - 1
    pa_ = np.minimum(np.searchsorted(ids_sorted, id_a), hi)
    pb_ = np.minimum(np.searchsorted(ids_sorted, id_b), hi)
    found = (ids_sorted[pa_] == id_a) & (ids_sorted[pb_] == id_b)
    return (id_a[found], id_b[found],
            order[pa_[found]], order[pb_[found]])


def _count_perm_slice(bank, pidx, lo: int, hi: int):
    """Ray task body: per-pair signature-agreement count over perms
    [lo, hi) — touches ONLY that contiguous slice of ``matT``. Chunked so
    each per-perm gather's temporaries stay cache/heap-resident."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    matT = bank[2]          # auto-resolved task args; matT is a plasma
    ja, jb = pidx[2], pidx[3]  # mmap view — slicing touches only [lo:hi)
    n = len(ja)
    out = np.zeros(n, dtype=np.uint8)
    CH = 1 << 20
    for s in range(0, n, CH):
        t = min(s + CH, n)
        sa, sb = ja[s:t], jb[s:t]
        c = np.zeros(t - s, dtype=np.uint8)
        for p in range(lo, hi):
            col = matT[p]
            c += col[sa] == col[sb]
        out[s:t] = c
    return out


def _assemble_edges(bank, pidx, count_refs, cfg_json: str):
    """Ray task body: partial counts → thresholded edge table (the same
    decision table as ``score_pairs_batch``; sha equality checked only for
    KEPT rows — ``exact`` influences nothing but emitted rows)."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    cfg = PipelineConfig.from_json(cfg_json)
    _, _, _, simhash, sha = bank
    id_a, id_b, ja, jb = pidx
    if len(id_a) == 0:
        return EDGE_SCHEMA.empty_table()
    cnt = np.zeros(len(id_a), dtype=np.int16)
    for r in ray.get(list(count_refs)):
        cnt += r
    sig_sim = cnt / np.float64(cfg.num_perms)
    keep = sig_sim >= cfg.jaccard_threshold
    if not keep.any():
        return EDGE_SCHEMA.empty_table()
    ja, jb = ja[keep], jb[keep]
    sig_sim = sig_sim[keep]
    ham = hamming64(simhash[ja], simhash[jb])
    second_sim = 1.0 - ham / 64.0
    exact = sha[ja] == sha[jb]
    hybrid = exact & (second_sim >= cfg.hybrid_primary_relax)
    sigbits = (~hybrid) & (second_sim >= cfg.simhash_threshold)
    combined = np.minimum(cfg.confidence_cap, (sig_sim + second_sim) / 2.0)
    confidence = np.where(hybrid | sigbits, combined, sig_sim)
    match_type = np.where(hybrid, "hybrid",
                          np.where(sigbits, "signature+bits", "signature"))
    return pa.table({
        "id_a": pa.array(id_a[keep], pa.int64()),
        "id_b": pa.array(id_b[keep], pa.int64()),
        "sig_sim": pa.array(sig_sim, pa.float64()),
        "second_sim": pa.array(second_sim, pa.float64()),
        "exact_match": pa.array(exact, pa.bool_()),
        "match_type": pa.array(match_type.tolist(), pa.string()),
        "confidence": pa.array(confidence, pa.float64()),
    }, schema=EDGE_SCHEMA)


def prepare_sig_bank(signatures_ds, cfg: PipelineConfig):
    """Submit the broadcast verify bank build EARLY (it depends only on
    the signatures) and return ``(bank_ref, n_sigs)``, or None above the
    broadcast budget. Passing the result to :func:`verify_pairs` overlaps
    the bank's large-allocation pass with candidate generation — measured
    1–75 s when run serially right after a heavy phase (the host's
    post-churn reclaim window), ~free when overlapped."""
    import ray

    n_sigs = signatures_ds.count()
    if n_sigs > cfg.broadcast_max_rows:
        return None
    sig_narrow = signatures_ds.select_columns(
        ["doc_id", "minhash", "simhash", "content_sha256"])
    refs = list(sig_narrow.materialize().to_arrow_refs())
    return ray.remote(_prep_sig_bank).remote(refs, cfg.num_perms), n_sigs


def verify_pairs(pairs_ds, signatures_ds, cfg: PipelineConfig, bank=None):
    """candidate pairs ⋈ signatures ×2 → scored, thresholded edge Dataset.

    Fast path (signature table AND pair count within the broadcast
    budget): an off-driver task DAG —

        prep bank (perm-major matrix) ─┬─ count perms [0,k)   ─┐
        prep pair index ───────────────┼─ count perms [k,2k)  ─┼─ assemble
                                       └─ ...                 ─┘

    The round-2 two-chained-join shape pushed ~2 KB of signature copies
    per pair through plasma between operators (measured ~250 s and
    ANTI-scaling at 3.5M pairs / 448k docs: every extra worker re-faulted
    the whole 437 MB bank). Here each signature moves through plasma once,
    each count task touches only its CONTIGUOUS perm slice (total bank
    traffic constant in the task count — proper strong scaling), and the
    scorer runs the measured-4.3×-faster column-blocked kernel.
    Above the budget: two distributed hash joins + batch scorer (the
    100 TB path, equivalence-tested by ``test_verify_fused_and_join_...``).
    """
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    sig_narrow = signatures_ds.select_columns(
        ["doc_id", "minhash", "simhash", "content_sha256"])
    n_sigs = bank[1] if bank is not None else signatures_ds.count()

    if n_sigs <= cfg.broadcast_max_rows:
        import ray
        import ray.data as rd

        from fuzzy_dedupe_pipeline_ray.stages.lsh import _emit_task_count

        pairs_mat = pairs_ds.materialize()
        if pairs_mat.count() <= cfg.broadcast_max_rows:
            if bank is not None:
                bank_ref = bank[0]
            else:
                sig_refs = list(sig_narrow.materialize().to_arrow_refs())
                bank_ref = ray.remote(_prep_sig_bank).remote(
                    sig_refs, cfg.num_perms)
            pair_refs = list(pairs_mat.to_arrow_refs())
            pidx_ref = ray.remote(_prep_pair_index).remote(
                pair_refs, bank_ref)
            n_tasks = max(1, min(cfg.num_perms, _emit_task_count(cfg)))
            step = -(-cfg.num_perms // n_tasks)
            count_refs = [
                ray.remote(_count_perm_slice).remote(
                    bank_ref, pidx_ref, lo, min(lo + step, cfg.num_perms))
                for lo in range(0, cfg.num_perms, step)]
            edges_ref = ray.remote(_assemble_edges).remote(
                bank_ref, pidx_ref, count_refs, cfg.to_json())
            return rd.from_arrow_refs([edges_ref])
        pairs_ds = pairs_mat

    a_side = sig_narrow.rename_columns(
        {"doc_id": "id_a", "minhash": "minhash_a", "simhash": "simhash_a",
         "content_sha256": "sha_a"})
    b_side = sig_narrow.rename_columns(
        {"doc_id": "id_b", "minhash": "minhash_b", "simhash": "simhash_b",
         "content_sha256": "sha_b"})

    joined = lookup_join(pairs_ds, a_side, on="id_a", cfg=cfg,
                         right_count=n_sigs)
    joined = lookup_join(joined, b_side, on="id_b", cfg=cfg,
                         right_count=n_sigs)
    return joined.map_batches(
        lambda b: score_pairs_batch(b, cfg), batch_format="pyarrow",
        zero_copy_batch=True)
