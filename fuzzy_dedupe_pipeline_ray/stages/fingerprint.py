"""Fingerprint stage: shingle → MinHash + SimHash + substring anchors.

The direct analog of the reference's embedding stage
(``dedupe_logic/processor.py:29-45,88-108``): the SentenceTransformer
weights loaded once per process become a MinHash permutation bank built
once per **worker** (task pool with per-worker cached state by default;
the actor-pool form is kept behind ``cfg.extra['fingerprint_actor_pool']``
— see :func:`fingerprint` for the measured trade), and the per-record
encode becomes a vectorized per-batch signature computation.

Batch-local exact dedup: within a batch, identical ``content_sha256``
values are fingerprinted ONCE and only one signature row (the batch-local
min doc_id) is emitted. Cross-batch copies of the same content produce
identical signatures → identical band keys in every band → the LSH stage
links them (est. Jaccard 1.0), and the narrow sha-groupby exact pre-pass
(``stages/exact.py``) supplies the remaining exact star edges. This removes
the skew blob mass (licenses, vendored files — FIXTURES.md kind 6) from
the fingerprint CPU bill without ever shuffling the wide ``content``
column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions.hashing import (
    band_keys_batch,
    bottom_k_distinct,
    char_shingle_hashes,
    char_shingle_hashes_bytes,
    hash_tokens,
    token_hashes_bytes,
    make_minhasher,
    mask_keys,
    pack_signatures,
    sha256_hex_arrow,
    simhash64,
    token_shingle_hashes,
)
from fuzzy_dedupe_pipeline_ray.stages.identity import batch_doc_ids


def normalize_for_shingles(text: str, cfg: PipelineConfig) -> str:
    if cfg.lowercase:
        text = text.lower()
    if cfg.collapse_whitespace:
        text = " ".join(text.split())
    return text


def normalize_for_shingles_array(col, cfg: PipelineConfig):
    """Arrow-native :func:`normalize_for_shingles` over a string column
    (trim → split-on-whitespace-runs → join) — no per-row Python string
    rebuild (VERDICT r3 #1b). Parity caveat: Python ``str.split`` treats
    \\x1c-\\x1f/\\x85 as separators while Arrow uses the Unicode
    White_Space set; identical on ASCII/source-code text (property-tested
    over printable + \\t\\n\\r inputs). A mismatch on exotic control chars
    would only shift that doc's shingle set, never break an invariant."""
    import pyarrow.compute as pc

    out = col
    if cfg.lowercase:
        out = pc.utf8_lower(out)
    if cfg.collapse_whitespace:
        out = pc.binary_join(
            pc.utf8_split_whitespace(pc.utf8_trim_whitespace(out)), " ")
    return out


def shingle_set(text: str, cfg: PipelineConfig) -> np.ndarray:
    norm = normalize_for_shingles(text, cfg)
    if cfg.shingle_mode == "char":
        h = char_shingle_hashes(norm, cfg.shingle_k)
    else:
        h = token_shingle_hashes(hash_tokens(norm.split()), cfg.shingle_k)
    if len(h) > cfg.max_shingles_per_doc:
        h = h[: cfg.max_shingles_per_doc]  # np.unique output is sorted → deterministic cap
    return h


def _normalized_byte_views(col, cfg: PipelineConfig):
    """content column → ``(data, offsets)`` for zero-copy per-row uint8
    views of the NORMALIZED utf-8 bytes: ONE Arrow C++ normalization pass
    per batch, then pure offset arithmetic. The previous per-doc path
    (``to_pylist`` + ``normalize_for_shingles`` + ``str.encode`` — and a
    SECOND normalize+encode for the anchor pass) faulted ~4× the batch's
    content bytes in fresh Python-heap pages per batch; on this host
    class concurrent first-touch traffic is the measured scaling cap
    (BASELINE.md), so the page mass is the cost that matters, not the
    instructions."""
    import pyarrow.compute as pc

    arr = normalize_for_shingles_array(col, cfg)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    bufs = arr.buffers()
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dt)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    return data, offs


class FingerprintActor:
    """Stateful per-batch fingerprinter (actor pool).

    Holds: the MinHash permutation bank, the shingler config, and the
    anchor sketch config — all built once in ``__init__`` (the "load the
    model once" rule, SURVEY.md §2.3 ST1).
    """

    def __init__(self, cfg_json: str, remap=None):
        from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

        tune_allocator()  # actor-process heap retention (BASELINE.md)
        self.cfg = PipelineConfig.from_json(cfg_json)
        self.mh = make_minhasher(self.cfg)
        self.remap = remap  # 128-bit collision remap triple (or None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        use_bytes = cfg.shingle_mode == "char"
        # zero-copy normalized byte views (no Python strs) — BOTH modes:
        # ONE Arrow normalization pass per batch, then pure offset math
        data, offs = _normalized_byte_views(batch.column("content"), cfg)
        if use_bytes:
            # ONE window-hash pass over the whole batch buffer per k —
            # window hashes are position-independent (hashing.py
            # _window_poly_hashes), so the per-doc hash vector is a pure
            # SLICE h_all[start : end-k+1]; replaces 2 kernel calls per
            # doc with 2 per batch (cross-boundary windows are simply
            # never sliced out; ≤k-1 wasted lanes per doc)
            h_sh_all = char_shingle_hashes_bytes(data, cfg.shingle_k,
                                                 unique=False)
        else:
            # token mode, batched the same way: one vectorized
            # tokenize+hash pass over the whole buffer
            # (token_hashes_bytes — bit-identical to the former per-row
            # hash_tokens(norm.split()) loop), one flat n-token window
            # pass, per-doc pure slices of the token-hash array.
            # PRECONDITION: the kernel splits on single 0x20 only, which
            # the normalized bytes guarantee iff whitespace collapsing
            # ran — with collapse_whitespace=False tabs/newlines would
            # silently change tokenization vs str.split() (review
            # finding, round 5), so that configuration keeps the exact
            # per-row reference path.
            if not cfg.collapse_whitespace:
                content = batch.column("content").to_pylist()
            else:
                tok_h, tok_offs = token_hashes_bytes(data, offs)
                h_tok_all = token_shingle_hashes(tok_h, cfg.shingle_k,
                                                 unique=False)
        h_an_all = (char_shingle_hashes_bytes(data, cfg.anchor_k,
                                              unique=False)
                    if cfg.substring_enabled else None)
        if "doc_id" in batch.schema.names:  # caller-supplied ids (e.g. documents table)
            doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        else:
            doc_ids, _ = batch_doc_ids(batch, cfg, self.remap)
        shas = sha256_hex_arrow(batch.column("content"))

        # batch-local exact dedup: fingerprint each distinct sha once,
        # emit the signature under the batch-local min doc_id (vectorized:
        # unique shas → min-doc row per sha run → rep rows by doc_id)
        _, inv = np.unique(np.asarray(shas, dtype=object),
                           return_inverse=True)
        order = np.lexsort((doc_ids, inv))
        g = inv[order]
        firsts = order[np.flatnonzero(np.r_[True, g[1:] != g[:-1]])]
        reps = firsts[np.argsort(doc_ids[firsts], kind="stable")].tolist()

        m = len(reps)
        sigs = np.empty((m, cfg.num_perms), dtype=np.uint64)
        simhashes = np.empty(m, dtype=np.uint64)
        n_shingles = np.empty(m, dtype=np.uint32)
        anchors: list[np.ndarray] = []
        k_sh, k_an = cfg.shingle_k, cfg.anchor_k
        for out_i, i in enumerate(reps):
            s, e = offs[i], offs[i + 1]
            if use_bytes:
                if e - s >= k_sh:
                    sh = np.unique(h_sh_all[s:e - k_sh + 1])
                else:  # short doc: whole-text single shingle (or empty)
                    sh = char_shingle_hashes_bytes(data[s:e], k_sh)
            elif not cfg.collapse_whitespace:
                sh = shingle_set(content[i], cfg)  # per-row reference
            else:
                ts, te = tok_offs[i], tok_offs[i + 1]
                if te - ts >= k_sh:
                    sh = np.unique(h_tok_all[ts:te - k_sh + 1])
                else:  # short doc: single all-token window (or empty)
                    sh = token_shingle_hashes(tok_h[ts:te], k_sh)
            if len(sh) > cfg.max_shingles_per_doc:
                sh = sh[: cfg.max_shingles_per_doc]  # sorted → deterministic
            sigs[out_i] = self.mh.signature(sh)
            simhashes[out_i] = simhash64(sh)
            n_shingles[out_i] = len(sh)
            if cfg.substring_enabled:
                # anchors reuse the SAME normalized bytes in BOTH modes
                # (the former token path re-normalized + re-encoded every
                # doc through Python a second time)
                big = (h_an_all[s:e - k_an + 1] if e - s >= k_an else
                       char_shingle_hashes_bytes(data[s:e], k_an,
                                                 unique=False))
                # masked to 63-bit int64: anchors become groupby keys
                anchors.append(mask_keys(
                    bottom_k_distinct(big, cfg.anchors_per_doc)))
            else:
                anchors.append(np.empty(0, dtype=np.int64))

        rep_idx = np.asarray(reps, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(doc_ids[rep_idx], pa.int64()),
            "content_sha256": pa.array([shas[i] for i in reps], pa.string()),
            "minhash": pack_signatures(sigs, cfg.sig_bits),
            "simhash": pa.array(simhashes, pa.uint64()),
            "n_shingles": pa.array(n_shingles, pa.uint32()),
            "anchors": pa.array([a.tolist() for a in anchors],
                                pa.list_(pa.int64())),
        })


def fingerprint(files_ds, cfg: PipelineConfig, remap=None):
    """files Dataset → signatures Dataset (one row per batch-local distinct
    content).

    Default execution is a TASK pool with once-per-worker cached state:
    the per-batch closure lazily builds one :class:`FingerprintActor` in
    each worker process and reuses it for every batch that worker runs —
    the same "build the bank once" economics as the actor pool, WITHOUT
    the pool's per-execution spawn ramp. (Measured on the 490k-file scale
    corpus at 32 CPUs: actor pool 32.4 s at ~36% utilization — a fresh
    30-process pool spawns and re-imports on every execution — vs task
    pool 11.3 s, ~ideal; identical output rows.) Fingerprint state here
    is cheap to build (OPH seeds + config), so worker-local rebuild costs
    ~ms; a stage whose state is genuinely expensive (a model, a large
    index) should still use the actor form — set
    ``cfg.extra['fingerprint_actor_pool']`` to force it (kept for
    reference-shape parity, SURVEY.md §2.3 ST1)."""
    if (cfg.extra or {}).get("fingerprint_actor_pool"):
        return files_ds.map_batches(
            FingerprintActor,
            fn_constructor_args=(cfg.to_json(), remap),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.fingerprint_batch_size,
            # autoscaling (1, N) pool: a fixed pool of N×1 CPU can reserve
            # the whole allotment and starve the upstream read task
            # (observed deadlock at num_cpus=4); min=1 keeps draining.
            concurrency=(1, cfg.fingerprint_concurrency),
            num_cpus=1,
        )

    cfg_json = cfg.to_json()
    holder: list = []  # one FingerprintActor per worker per execution

    def fn(batch: pa.Table) -> pa.Table:
        if not holder:
            holder.append(FingerprintActor(cfg_json, remap))
        return holder[0](batch)

    return files_ds.map_batches(
        fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.fingerprint_batch_size,
    )
