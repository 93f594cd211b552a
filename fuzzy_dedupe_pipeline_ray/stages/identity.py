"""128-bit document identity: collision-free int64 surrogate keys at scale.

``hash64_str`` gives every doc a 63-bit id from sha256(repo\\x00path\\x00
commit). At the 100 TB target (~10^12 docs) the birthday mass of a 63-bit
space is non-trivial (~n²/2^64 expected collisions ≈ 5×10^7 at 10^12
rows), and a collision silently MERGES two unrelated files — the scale
risk documented at ``functions/hashing.py:58-67``.

``cfg.doc_id_bits = 128`` activates the scale path implemented here:

* identity = 126 bits: ``doc_id`` (sha bytes 0-8, top bit cleared) +
  ``doc_id_hi`` (sha bytes 8-16, top bit cleared), carried through the
  docs table and the final assignments.
* every SHUFFLE/MERGE key stays ONE int64 (``doc_id``) — Ray Data hash
  aggregates, the numpy CC kernel, and the pair columns all keep their
  fast Arrow int64 path. Instead of widening every stage key to 128 bits,
  ``doc_id`` is made COLLISION-FREE by construction: a cheap distributed
  detection pass finds the (astronomically rare) lo-64 collisions and
  deterministically re-keys all but one member of each collided group.
* the remap table is provably tiny (expected n²/2^64 rows — ~50 M at
  10^12 docs, KB-to-MB at any realistic scale), so it is broadcast to
  every id-deriving stage (ingest / fingerprint / substring gather) and
  applied with a vectorized searchsorted scan. It is persisted in the run
  manifest so resumed runs re-derive identical ids.

Cost when enabled: one extra narrow pass over (repo, path, commit) — a
single Min/Max groupby on 16-byte rows — plus, ONLY if a collision was
found, one full-scan membership count per re-salt round (expected 0
rounds in practice). The 64-bit default pays nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions.hashing import (
    mask_keys,
    sha256_u64_arrow,
    splitmix64,
)

#: remap Arrow schema — sorted by (doc_id, doc_id_hi) on write
REMAP_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),      # original (collided) lo-64 id
    ("doc_id_hi", pa.int64()),   # the member's hi-64 — disambiguator
    ("new_doc_id", pa.int64()),  # the collision-free surrogate
])

_MAX_RESALT_ROUNDS = 8


def empty_remap() -> pa.Table:
    return pa.table({"doc_id": pa.array([], pa.int64()),
                     "doc_id_hi": pa.array([], pa.int64()),
                     "new_doc_id": pa.array([], pa.int64())},
                    schema=REMAP_SCHEMA)


def remap_arrays(remap_tbl: "pa.Table | None"):
    """Remap table → the sorted numpy triple the apply kernel consumes
    (None when there is nothing to remap — the overwhelmingly common
    case, letting callers skip the lookup entirely)."""
    if remap_tbl is None or remap_tbl.num_rows == 0:
        return None
    lo = remap_tbl.column("doc_id").to_numpy()
    hi = remap_tbl.column("doc_id_hi").to_numpy()
    new = remap_tbl.column("new_doc_id").to_numpy()
    order = np.lexsort((hi, lo))
    return lo[order], hi[order], new[order]


def apply_id_remap(lo: np.ndarray, hi: np.ndarray, remap) -> np.ndarray:
    """Rewrite collided ids: rows whose (lo, hi) appears in the remap get
    its surrogate. Vectorized: searchsorted into the lo-sorted remap, then
    a bounded scan over the (tiny — collision multiplicity) equal-lo run."""
    if remap is None:
        return lo
    r_lo, r_hi, r_new = remap
    out = lo.copy()
    pos = np.searchsorted(r_lo, lo, side="left")
    # longest equal-lo run in the remap bounds the scan depth
    run_starts = np.flatnonzero(np.r_[True, r_lo[1:] != r_lo[:-1]])
    max_run = int(np.diff(np.r_[run_starts, len(r_lo)]).max())
    for k in range(max_run):
        p = pos + k
        valid = p < len(r_lo)
        pv = np.where(valid, p, 0)
        m = valid & (r_lo[pv] == lo) & (r_hi[pv] == hi)
        out[m] = r_new[pv[m]]
    return out


def batch_doc_ids(batch: pa.Table, cfg: "PipelineConfig | None",
                  remap=None) -> "tuple[np.ndarray, np.ndarray | None]":
    """The ONE id-derivation helper every stage uses.

    Returns ``(doc_id, doc_id_hi)``: int64 per-row ids, collision-free
    under ``doc_id_bits=128`` (remap applied). ``doc_id_hi`` is None in
    64-bit mode; in 128-bit mode the ingest stage persists it in the docs
    table (and hence the final assignments) as the id's upper half."""
    from fuzzy_dedupe_pipeline_ray.stages.ingest import _doc_key_array

    keys = _doc_key_array(batch)
    if cfg is None or cfg.doc_id_bits == 64:
        return mask_keys(sha256_u64_arrow(keys, 1)[:, 0]), None
    d = sha256_u64_arrow(keys, 2)
    lo, hi = mask_keys(d[:, 0]), mask_keys(d[:, 1])
    return apply_id_remap(lo, hi, remap), hi


def _candidate_ids(lo: np.ndarray, hi: np.ndarray,
                   salt: int) -> np.ndarray:
    """Deterministic surrogate proposal for collided members: mix the full
    128 bits plus the re-salt round (well-mixed splitmix64 composition)."""
    with np.errstate(over="ignore"):
        mixed = splitmix64(lo.astype(np.uint64)
                           ^ splitmix64(hi.astype(np.uint64)
                                        + np.uint64(salt)))
    return mask_keys(mixed)


def build_id_remap(ids_ds, cfg: PipelineConfig) -> pa.Table:
    """Distributed lo-64 collision detection + deterministic resolution.

    ``ids_ds``: Dataset with int64 columns (doc_id, doc_id_hi) — the RAW
    128-bit ids, one row per doc. Returns the remap table (usually empty).

    Shape: one Min/Max groupby over 16-byte rows finds lo groups whose hi
    differs (a multi-hi group necessarily has min(hi) != max(hi)); the
    collided members (provably tiny) come to the driver, all but the
    min-hi member of each group get a surrogate, and a membership scan
    per re-salt round certifies the surrogates collide with nothing.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Min

    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    ids_ds = ids_ds.materialize()
    spread = ids_ds.groupby("doc_id").aggregate(
        Min("doc_id_hi", alias_name="_hi_min"),
        Max("doc_id_hi", alias_name="_hi_max"))
    collided_lo_ds = spread.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b.column("_hi_min"),
                                              b.column("_hi_max"))))
                   .select(["doc_id"]),
        batch_format="pyarrow").materialize()
    n_collided = collided_lo_ds.count()
    if n_collided == 0:
        return empty_remap()
    if n_collided > cfg.broadcast_max_rows:
        raise RuntimeError(
            f"{n_collided} collided doc_id groups exceed the broadcast "
            f"budget ({cfg.broadcast_max_rows}) — beyond the design point "
            f"of the remap path (expected n²/2^64 collisions; this many "
            f"implies ~10^13+ docs or a broken id derivation).")
    collided_lo = np.sort(
        to_local_table(collided_lo_ds).column("doc_id").to_numpy())
    lo_ref = ray.put(collided_lo)

    def members(b: pa.Table) -> pa.Table:
        w = ray.get(lo_ref)
        lo = b.column("doc_id").to_numpy()
        p = np.minimum(np.searchsorted(w, lo), len(w) - 1)
        return b.filter(pa.array(w[p] == lo))

    mem = to_local_table(ids_ds.map_batches(members,
                                            batch_format="pyarrow"))
    lo = mem.column("doc_id").to_numpy()
    hi = mem.column("doc_id_hi").to_numpy()
    order = np.lexsort((hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    keep = np.r_[True, lo_s[1:] != lo_s[:-1]]  # min-hi member keeps its id
    r_lo, r_hi = lo_s[~keep], hi_s[~keep]
    new = _candidate_ids(r_lo, r_hi, salt=0)

    # certify: surrogates must hit no raw lo id and not repeat among
    # themselves; conflicting entries are re-salted (expected 0 rounds)
    for rnd in range(1, _MAX_RESALT_ROUNDS + 1):
        dup = np.zeros(len(new), dtype=bool)
        uniq_vals, first_idx, counts = np.unique(
            new, return_index=True, return_counts=True)
        dup_vals = uniq_vals[counts > 1]
        if len(dup_vals):
            dup = np.isin(new, dup_vals)
            dup[first_idx[counts > 1]] = False  # keep one of each dup run
        cand_sorted = np.sort(new)
        cand_ref = ray.put(cand_sorted)

        def hits(b: pa.Table, _ref=cand_ref) -> pa.Table:
            c = ray.get(_ref)
            v = b.column("doc_id").to_numpy()
            p = np.minimum(np.searchsorted(c, v), len(c) - 1)
            return pa.table({"n": pa.array(
                [int((c[p] == v).sum())], pa.int64())})

        n_hits = ids_ds.map_batches(hits, batch_format="pyarrow").sum("n")
        if not n_hits and not dup.any():
            break
        if n_hits:
            hit_vals = _corpus_hit_values(ids_ds, cand_sorted)
            dup |= np.isin(new, hit_vals)
        new[dup] = _candidate_ids(r_lo[dup], r_hi[dup], salt=rnd)
    else:
        raise RuntimeError(
            f"id remap did not converge in {_MAX_RESALT_ROUNDS} re-salt "
            f"rounds — statistically impossible unless id derivation is "
            f"broken.")

    return pa.table({"doc_id": pa.array(r_lo, pa.int64()),
                     "doc_id_hi": pa.array(r_hi, pa.int64()),
                     "new_doc_id": pa.array(new, pa.int64())},
                    schema=REMAP_SCHEMA)


def _corpus_hit_values(ids_ds, cand_sorted: np.ndarray) -> np.ndarray:
    """The subset of ``cand_sorted`` present in the corpus lo ids."""
    import ray

    ref = ray.put(cand_sorted)

    def found(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        v = b.column("doc_id").to_numpy()
        p = np.minimum(np.searchsorted(c, v), len(c) - 1)
        return pa.table({"v": pa.array(np.unique(v[c[p] == v]), pa.int64())})

    tbl = ids_ds.map_batches(found, batch_format="pyarrow")
    parts = [t for t in ray.get(tbl.to_arrow_refs()) if t.num_rows]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(pa.concat_tables(parts).column("v").to_numpy())
