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


def verify_pairs(pairs_ds, signatures_ds, cfg: PipelineConfig):
    """candidate pairs ⋈ signatures ×2 → scored, thresholded edge Dataset."""
    sig_narrow = signatures_ds.select_columns(
        ["doc_id", "minhash", "simhash", "content_sha256"])

    a_side = sig_narrow.rename_columns(
        {"doc_id": "id_a", "minhash": "minhash_a", "simhash": "simhash_a",
         "content_sha256": "sha_a"})
    b_side = sig_narrow.rename_columns(
        {"doc_id": "id_b", "minhash": "minhash_b", "simhash": "simhash_b",
         "content_sha256": "sha_b"})

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    # size-gated lookup joins: the signature table is broadcast once and
    # probed per batch when small; above cfg.broadcast_max_rows this
    # degrades to the distributed hash join (the 100 TB path).
    n_sigs = signatures_ds.count()
    joined = lookup_join(pairs_ds, a_side, on="id_a", cfg=cfg,
                         right_count=n_sigs)
    joined = lookup_join(joined, b_side, on="id_b", cfg=cfg,
                         right_count=n_sigs)
    return joined.map_batches(
        lambda b: score_pairs_batch(b, cfg), batch_format="pyarrow",
        zero_copy_batch=True)
