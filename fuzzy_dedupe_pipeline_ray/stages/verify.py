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


def score_sig_arrays(id_a: np.ndarray, id_b: np.ndarray,
                     sig_a: np.ndarray, sig_b: np.ndarray,
                     sim_a: np.ndarray, sim_b: np.ndarray,
                     sha_a: np.ndarray, sha_b: np.ndarray,
                     cfg: PipelineConfig) -> pa.Table:
    """THE decision table (module docstring), over raw per-side arrays:
    ``sig_*`` are (m, P) unpacked MinHash matrices, ``sim_*`` uint64
    SimHashes, ``sha_*`` content-sha arrays (any equality-comparable
    dtype). Shared by the joined-batch scorer below and the fused
    sort-tier emission (``stages/fused.py``) so the two physical plans
    cannot drift — returns the thresholded EDGE table."""
    m = len(id_a)
    if m == 0:
        return EDGE_SCHEMA.empty_table()
    sig_sim = (sig_a == sig_b).mean(axis=1)
    ham = hamming64(sim_a, sim_b)
    second_sim = 1.0 - ham / 64.0
    exact = sha_a == sha_b

    keep = sig_sim >= cfg.jaccard_threshold
    hybrid = exact & (second_sim >= cfg.hybrid_primary_relax)
    sigbits = (~hybrid) & (second_sim >= cfg.simhash_threshold)
    combined = np.minimum(cfg.confidence_cap, (sig_sim + second_sim) / 2.0)
    confidence = np.where(hybrid | sigbits, combined, sig_sim)
    match_type = np.where(hybrid, "hybrid",
                          np.where(sigbits, "signature+bits", "signature"))
    k = keep
    return pa.table({
        "id_a": pa.array(np.asarray(id_a)[k], pa.int64()),
        "id_b": pa.array(np.asarray(id_b)[k], pa.int64()),
        "sig_sim": pa.array(sig_sim[k], pa.float64()),
        "second_sim": pa.array(second_sim[k], pa.float64()),
        "exact_match": pa.array(np.asarray(exact)[k], pa.bool_()),
        "match_type": pa.array(match_type[k].tolist(), pa.string()),
        "confidence": pa.array(confidence[k], pa.float64()),
    }, schema=EDGE_SCHEMA)


def score_pairs_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Vectorized scorer over a joined batch with columns
    (id_a, id_b, minhash_a, simhash_a, sha_a, minhash_b, simhash_b, sha_b)."""
    m = batch.num_rows
    if m == 0:
        return EDGE_SCHEMA.empty_table()
    return score_sig_arrays(
        batch.column("id_a").to_numpy(),
        batch.column("id_b").to_numpy(),
        unpack_signatures(batch.column("minhash_a"), cfg.num_perms),
        unpack_signatures(batch.column("minhash_b"), cfg.num_perms),
        batch.column("simhash_a").to_numpy(),
        batch.column("simhash_b").to_numpy(),
        batch.column("sha_a").to_numpy(zero_copy_only=False),
        batch.column("sha_b").to_numpy(zero_copy_only=False),
        cfg)


def _prep_bank_narrow(block_refs):
    """Ray task body: signature blocks → the NARROW verify-bank arrays

    ``(ids_sorted, order, simhash, sha)``

    * arrays stay in ORIGINAL row order; pairs address rows via
      ``order[searchsorted(ids_sorted, id)]`` — skipping a sort-gather of
      the (separately built) signature matrix.
    * sha as fixed-width S64 (contiguous buffer, zero-copy via plasma; an
      object-dtype string array would re-unpickle on every ``ray.get``).
    """
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    blocks = [t for t in ray.get(list(block_refs)) if t.num_rows]
    if not blocks:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.uint64), np.empty(0, "S64"))
    ids = np.concatenate([b.column("doc_id").to_numpy() for b in blocks])
    order = np.argsort(ids, kind="stable").astype(np.int64)
    simhash = np.concatenate(
        [b.column("simhash").to_numpy() for b in blocks])
    sha = np.concatenate([np.asarray(
        b.column("content_sha256").to_numpy(zero_copy_only=False),
        dtype="S64") for b in blocks])
    return ids[order], order, simhash, sha


def _transpose_block_group(block_refs, num_perms: int):
    """Ray task body: a GROUP of signature blocks → one perm-major
    ``(P, n_group)`` C-order piece of the signature matrix (original row
    order within the group). Each task reads only its own blocks once
    (zero-copy plasma views) and writes only its own piece, so the (at
    scale ~0.5 GB) matrix build parallelizes by block group with total
    traffic O(matrix) — the single-task build was a measured ~10 s Amdahl
    term, and a per-PERM-slice parallel build was 3× worse still (every
    task stride-read the FULL block set: K× read amplification)."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    blocks = [t for t in ray.get(list(block_refs)) if t.num_rows]
    if not blocks:
        return np.empty((num_perms, 0), np.uint64)
    mats = [unpack_signatures(b.column("minhash"), num_perms)
            for b in blocks]  # zero-copy views into the plasma blocks
    n = sum(m.shape[0] for m in mats)
    out = np.empty((num_perms, n), dtype=mats[0].dtype)  # u4 at sig_bits=32
    ofs = 0
    for m in mats:
        out[:, ofs:ofs + m.shape[0]] = m.T
        ofs += m.shape[0]
    return out


def _prep_pair_index(pair_refs, bank):
    """Ray task body: a SHARD of candidate-pair blocks → ``(id_a, id_b,
    ja, jb)`` with ja/jb the ORIGINAL bank row index per endpoint. Pairs
    whose id is absent from the signature table are dropped here (the
    inner-join semantics of the distributed two-join path). One task per
    contiguous pair-block group: the single-task form was a measured
    ~6 s serial term at 5M pairs — the whole-DAG flat floor that kept
    edges_fuzzy parallelism-independent (r4 per-stage split)."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    # `bank` arrives auto-resolved (top-level ObjectRef task arg) — the
    # NARROW bank tuple from _prep_bank_narrow
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


def _submit_pair_index_shards(pair_refs, narrow_ref, cfg: PipelineConfig):
    """Fan the pair-index build out as one ``_prep_pair_index`` task per
    contiguous pair-block group (shard order = block order, so the
    concatenation of shard results is exactly the old single-task
    output). Returns the list of shard refs."""
    import ray

    from fuzzy_dedupe_pipeline_ray.stages.lsh import _emit_task_count

    if not pair_refs:
        return [ray.remote(_prep_pair_index).remote([], narrow_ref)]
    n_shards = max(1, min(len(pair_refs), _emit_task_count(cfg)))
    step = max(1, -(-len(pair_refs) // n_shards))
    prep = ray.remote(_prep_pair_index)
    return [prep.remote(pair_refs[i:i + step], narrow_ref)
            for i in range(0, len(pair_refs), step)]


def _count_perm_slice(piece_refs, pidx_refs, lo: int, hi: int):
    """Ray task body: per-pair signature-agreement count over perms
    ``[lo, hi)``. The matrix lives as per-block-group perm-major PIECES;
    for each perm this task concatenates that perm's (contiguous) row
    across the pieces — so it faults only ``(hi-lo)·n·8`` bytes of the
    (plasma mmap-shared) matrix, never the whole thing. The pair index
    arrives as SHARD refs (``_submit_pair_index_shards``); the output is
    the per-shard counts concatenated in shard order. Chunked so each
    per-perm gather's temporaries stay cache/heap-resident."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    pieces = [p for p in ray.get(list(piece_refs)) if p.shape[1]]
    shards = ray.get(list(pidx_refs))  # zero-copy plasma views
    n = sum(len(s[2]) for s in shards)
    out = np.zeros(n, dtype=np.uint8)
    if not pieces or n == 0:
        return out
    CH = 1 << 20
    # perms OUTER, shards/chunks inner: each perm's row is concatenated
    # across the pieces exactly ONCE (the chunks-inner shape
    # re-concatenated it per 1M-pair chunk — chunks-fold copy
    # amplification of precisely the fresh-page mass this DAG exists to
    # avoid); chunking still bounds the gather temporaries to
    # cache/heap-resident sizes.
    for p in range(lo, hi):
        col = (pieces[0][p] if len(pieces) == 1 else
               np.concatenate([pc_[p] for pc_ in pieces]))
        ofs = 0
        for sh in shards:
            ja, jb = sh[2], sh[3]
            m = len(ja)
            for s in range(0, m, CH):
                t = min(s + CH, m)
                out[ofs + s:ofs + t] += col[ja[s:t]] == col[jb[s:t]]
            ofs += m
    return out


def _assemble_edges(bank, pidx_refs, count_refs, cfg_json: str):
    """Ray task body: pair-index shards + partial counts → thresholded
    edge table (the same decision table as ``score_pairs_batch``; sha
    equality checked only for KEPT rows — ``exact`` influences nothing
    but emitted rows)."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    cfg = PipelineConfig.from_json(cfg_json)
    _, _, simhash, sha = bank
    shards = ray.get(list(pidx_refs))
    e = np.empty(0, np.int64)
    id_a = np.concatenate([s[0] for s in shards]) if shards else e
    id_b = np.concatenate([s[1] for s in shards]) if shards else e
    ja = np.concatenate([s[2] for s in shards]) if shards else e
    jb = np.concatenate([s[3] for s in shards]) if shards else e
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


def _mat_slice_bounds(cfg: PipelineConfig) -> "list[tuple[int, int]]":
    """Perm-slice boundaries of the count tasks."""
    from fuzzy_dedupe_pipeline_ray.stages.lsh import _emit_task_count

    n_tasks = max(1, min(cfg.num_perms, _emit_task_count(cfg)))
    step = -(-cfg.num_perms // n_tasks)
    return [(lo, min(lo + step, cfg.num_perms))
            for lo in range(0, cfg.num_perms, step)]


def _submit_bank_tasks(sig_refs, cfg: PipelineConfig):
    """(narrow_ref, piece_refs): the narrow-array task plus one perm-major
    transpose task per CONTIGUOUS block group (order preserved — global
    row index = concatenation of the pieces in list order, exactly how
    ``_prep_bank_narrow`` concatenates the same blocks)."""
    import ray

    from fuzzy_dedupe_pipeline_ray.stages.lsh import _emit_task_count

    narrow_ref = ray.remote(_prep_bank_narrow).remote(sig_refs)
    if not sig_refs:  # empty signature table: narrow task handles [],
        return narrow_ref, []  # and zero pieces means zero agreement counts
    n_groups = max(1, min(len(sig_refs), _emit_task_count(cfg)))
    step = max(1, -(-len(sig_refs) // n_groups))
    tr = ray.remote(_transpose_block_group)
    piece_refs = [tr.remote(sig_refs[i:i + step], cfg.num_perms)
                  for i in range(0, len(sig_refs), step)]
    return narrow_ref, piece_refs


def prepare_sig_bank(signatures_ds, cfg: PipelineConfig):
    """Submit the broadcast verify-bank build EARLY (it depends only on
    the signatures) and return ``(narrow_ref, piece_refs, n_sigs)``, or
    None above the broadcast budget. The perm-major matrix builds as one
    transpose task per block group (parallel — the single-task build was
    a measured ~10 s Amdahl term at scale-corpus size); passing the
    result to :func:`verify_pairs` additionally overlaps the build with
    candidate generation."""
    n_sigs = signatures_ds.count()
    if n_sigs > cfg.broadcast_max_rows:
        return None
    sig_narrow = signatures_ds.select_columns(
        ["doc_id", "minhash", "simhash", "content_sha256"])
    refs = list(sig_narrow.materialize().to_arrow_refs())
    narrow_ref, piece_refs = _submit_bank_tasks(refs, cfg)
    return narrow_ref, piece_refs, n_sigs


def fuzzy_impl_for(cfg: PipelineConfig, n_sigs: int) -> str:
    """Which fuzzy tier ``fuzzy_edges`` will run for ``n_sigs``
    signatures — 'fused' or 'classic'. Exposed so the pipeline can skip
    building the (fused-tier-unused) verify bank up front (review
    finding, round 5)."""
    impl = (cfg.extra or {}).get("fuzzy_impl")
    if impl not in (None, "fused", "classic"):
        raise ValueError(f"bad fuzzy_impl {impl!r}")
    if impl is not None:
        return impl
    above = (n_sigs > cfg.broadcast_max_rows
             and n_sigs * cfg.num_bands > cfg.keyed_broadcast_max_rows)
    # fused-tier residency gate: its explode carries the full signature
    # per keyed row and the sort pins ~2× the exploded mass — above the
    # byte budget the classic tier (streaming hash verify, bounded
    # aggregator blocks) is the one that completes
    # (see config.fused_fuzzy_max_bytes)
    row_b = cfg.num_perms * (cfg.sig_bits // 8) + 96
    fits = (n_sigs * cfg.num_bands * row_b
            <= getattr(cfg, "fused_fuzzy_max_bytes", 16 << 30))
    return "fused" if (above and fits) else "classic"


def fuzzy_edges(signatures_ds, cfg: PipelineConfig, bank=None):
    """Candidate generation + verification, tier-dispatched — the fuzzy
    stage's single entry point.

    * below the broadcast/keyed gates (single-node-comfortable inputs):
      the classic composition — ``candidate_pairs`` fast paths + the
      verify task DAG (or the two-join tier between the gates).
    * above BOTH gates (the 100 TB shape): the FUSED sort tier
      (``stages/fused.py``) — signatures are carried through the band
      shuffle and pairs are scored in-group, eliminating the two
      ~600 B/pair signature joins entirely (SURVEY §2.4 J2).

    ``cfg.extra['fuzzy_impl']`` ∈ {'fused', 'classic'} forces a tier
    (equivalence tests); the two produce bit-identical edge sets."""
    impl = fuzzy_impl_for(cfg, bank[2] if bank is not None
                          else signatures_ds.count())
    if impl == "fused":
        from fuzzy_dedupe_pipeline_ray.stages.fused import (
            fused_scored_edges,
        )

        return fused_scored_edges(signatures_ds, cfg)
    from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs

    return verify_pairs(candidate_pairs(signatures_ds, cfg),
                        signatures_ds, cfg, bank=bank)


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
    n_sigs = bank[2] if bank is not None else signatures_ds.count()

    if n_sigs <= cfg.broadcast_max_rows:
        import ray
        import ray.data as rd

        pairs_mat = pairs_ds.materialize()
        # The DAG never broadcasts the pairs (they are processed as
        # plasma block SHARDS), so they get their own bytes-derived gate,
        # NOT broadcast_max_rows — a 4x-corpus run (20.9M pairs) fell off
        # this path onto the two-join tier, whose ~2 KB/pair of gathered
        # signature copies ANTI-scaled 176->305 s from 8 to 32 CPUs on
        # the shared memory-backing host path.
        if pairs_mat.count() <= cfg.verify_dag_max_pairs:
            if bank is not None:
                narrow_ref, piece_refs = bank[0], bank[1]
            else:
                sig_refs = list(sig_narrow.materialize().to_arrow_refs())
                narrow_ref, piece_refs = _submit_bank_tasks(sig_refs, cfg)
            pair_refs = list(pairs_mat.to_arrow_refs())
            pidx_refs = _submit_pair_index_shards(pair_refs, narrow_ref,
                                                  cfg)
            count_refs = [
                ray.remote(_count_perm_slice).remote(
                    piece_refs, pidx_refs, lo, hi)
                for lo, hi in _mat_slice_bounds(cfg)]
            edges_ref = ray.remote(_assemble_edges).remote(
                narrow_ref, pidx_refs, count_refs, cfg.to_json())
            return rd.from_arrow_refs([edges_ref])
        pairs_ds = pairs_mat

    a_side = sig_narrow.rename_columns(
        {"doc_id": "id_a", "minhash": "minhash_a", "simhash": "simhash_a",
         "content_sha256": "sha_a"})
    b_side = sig_narrow.rename_columns(
        {"doc_id": "id_b", "minhash": "minhash_b", "simhash": "simhash_b",
         "content_sha256": "sha_b"})

    # These two joins gather ~600 B of signature payload per pair — the
    # heaviest-payload joins in the engine. Route them explicitly to the
    # streaming Acero hash tier: merge_join pins BOTH probe-output legs
    # plus two sorted copies simultaneously, which at a 4×-corpus 20.9M
    # pairs exceeded the object store's spill headroom (OutOfDiskError,
    # round-4 close), while the hash tier's aggregator actors stream the
    # same bytes through bounded blocks and have completed that input
    # every round. merge_join remains the default for the engine's
    # narrow-payload lookups.
    import dataclasses

    cfg_hash = dataclasses.replace(
        cfg, extra={**(cfg.extra or {}), "lookup_join_impl": "hash"})
    joined = lookup_join(pairs_ds, a_side, on="id_a", cfg=cfg_hash,
                         right_count=n_sigs)
    joined = lookup_join(joined, b_side, on="id_b", cfg=cfg_hash,
                         right_count=n_sigs)
    return joined.map_batches(
        lambda b: score_pairs_batch(b, cfg), batch_format="pyarrow",
        zero_copy_batch=True)
