"""Training-data text operators over a generic documents table
(``doc_id, text, lang, source, n_chars`` — the driver's synthetic
``documents.parquet``).

These are the "large-scale training-data pipeline" operators layered on
the same engine kernels the flagship uses: exact dedup, MinHash/LSH
near-dup, SimHash near-dup, exact n-gram Jaccard, token counting, quality
scoring, language-ID, document fingerprinting. Each is a streaming Ray
Data pipeline; the SQL-expressible ones have DuckDB oracles in
``__ray_entry__.oracle_sql`` (column names and regex semantics are kept
bit-compatible — see functions/textnorm.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions import textnorm
from fuzzy_dedupe_pipeline_ray.functions.hashing import (
    hamming64,
    mask_keys,
    sha256_hex_arrow,
    sha256_u64_arrow,
)
from fuzzy_dedupe_pipeline_ray.sources.io import hash_join
from fuzzy_dedupe_pipeline_ray.stages.cc import connected_components
from fuzzy_dedupe_pipeline_ray.stages.exact import exact_edges
from fuzzy_dedupe_pipeline_ray.stages.finalize import GENERIC_SORT_KEYS, finalize
from fuzzy_dedupe_pipeline_ray.stages.fingerprint import fingerprint
from fuzzy_dedupe_pipeline_ray.stages.lsh import (
    candidate_pairs,
    distinct_pairs_sorted,
)
from fuzzy_dedupe_pipeline_ray.stages.verify import verify_pairs

#: documents-table config: texts are short prose, so token shingles with a
#: small k and a laxer threshold catch the near-dup families.
DOCS_CFG = PipelineConfig(shingle_mode="char", shingle_k=7, lowercase=False)


def read_documents(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=columns)


# ---------------------------------------------------------------------------
# SQL-oracled scalar/aggregate ops
# ---------------------------------------------------------------------------

def doc_normalize(sf_dir: str):
    """doc_id, norm_text (lower/punct-strip/ws-collapse), text_sha256."""
    def f(b: pa.Table) -> pa.Table:
        norm = textnorm.normalize_text_array(b.column("text"))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "norm_text": norm,
            "text_sha256": pa.array(sha256_hex_arrow(b.column("text")),
                                    pa.string()),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def doc_token_stats(sf_dir: str):
    """doc_id, n_tokens (whitespace), n_tokens_regex (BPE-ish
    pre-tokenizer: letter/digit runs + punctuation marks), text_len."""
    def f(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": textnorm.token_count_array(b.column("text")),
            "n_tokens_regex": textnorm.regex_token_count_array(
                b.column("text")),
            "text_len": pc.cast(pc.utf8_length(b.column("text")), pa.int64()),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def doc_quality(sf_dir: str):
    """Quality signals as exact integer counts (float-free oracle compare):
    n_chars_total, punct_chars, n_tokens, stopword_count, plus a derived
    ``quality_ok`` boolean from integer-threshold rules (≥5 tokens and
    punctuation below 10% — compared as punct·10 < chars)."""
    def f(b: pa.Table) -> pa.Table:
        text = b.column("text")
        total = pc.cast(pc.utf8_length(text), pa.int64())
        punct_chars = textnorm.punct_count_array(text)
        n_tok = textnorm.token_count_array(text)
        stop_count = textnorm.stopword_count_array(text)
        quality_ok = pc.and_(
            pc.greater_equal(n_tok, 5),
            pc.less(pc.multiply(punct_chars, pa.scalar(10, pa.int64())), total))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_chars_total": total,
            "punct_chars": punct_chars,
            "n_tokens": n_tok,
            "stopword_count": stop_count,
            "quality_ok": quality_ok,
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


#: doc_sample keeps ids whose 32-bit Knuth multiplicative hash falls in the
#: lowest 20% of the hash space — a deterministic, engine-portable sample
#: (the same BIGINT arithmetic is exact in SQL, so the oracle is bitwise).
_SAMPLE_MULT = 2654435761
_SAMPLE_MOD = 1 << 32
_SAMPLE_KEEP = int(0.2 * _SAMPLE_MOD)


def _knuth_hash_i64(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash of doc_id, as int64 (< 2^32, so the
    DuckDB HUGEINT oracle reproduces it exactly): the ONE copy of the
    oracle-critical arithmetic shared by doc_sample,
    doc_sample_stratified, doc_shuffle_deterministic and
    doc_split_train_val_test."""
    h = (ids.astype(np.uint64) * np.uint64(_SAMPLE_MULT)) \
        & np.uint64(_SAMPLE_MOD - 1)
    return h.astype(np.int64)


def doc_sample(sf_dir: str):
    """Deterministic hash sampling (SURVEY §2 K4): keep ~20% of documents
    by ``(doc_id · 2654435761) mod 2³² < 0.2·2³²``. Unlike random
    sampling, the kept set is a pure function of the key — stable across
    runs, partitionings, and engines — which is what a resumable 100 TB
    pipeline needs (re-running a shard re-selects the same rows)."""
    def f(b: pa.Table) -> pa.Table:
        h = _knuth_hash_i64(b.column("doc_id").to_numpy())
        return b.filter(pa.array(h < _SAMPLE_KEEP))

    return read_documents(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def doc_langid(sf_dir: str):
    """doc_id, lang_pred (n-gram/stopword heuristic — no model deps)."""
    def f(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang_pred": textnorm.lang_id_array(b.column("text")),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def doc_exact_dedupe(sf_dir: str):
    """Per-doc exact-dup assignment: doc_id, rep_id (min doc_id of the
    sha256 group), dup_count. Hash-partition aggregate + lookup join —
    the D1/D3 operators (SURVEY.md §2.7) on a prose table, fully on the
    C aggregate path (same shape as stages/exact.exact_edges; no
    per-group Python callbacks)."""
    from ray.data.aggregate import Min

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    def add_sha(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text_sha256": pa.array(sha256_hex_arrow(b.column("text")),
                                    pa.string()),
        })

    with_sha = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        add_sha, batch_format="pyarrow", zero_copy_batch=True).materialize()
    groups = with_sha.groupby("text_sha256").aggregate(
        Min("doc_id", alias_name="rep_id"), Count(alias_name="dup_count"))
    joined = lookup_join(with_sha, groups, on="text_sha256", cfg=DOCS_CFG)
    return joined.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "rep_id": pc.cast(b.column("rep_id"), pa.int64()),
            "dup_count": pc.cast(b.column("dup_count"), pa.int64()),
        }), batch_format="pyarrow").sort("doc_id")


def doc_fingerprint(sf_dir: str, window: int = 32, keep: int = 8):
    """doc_id, fingerprint: bottom-k winnowing sketch of rolling
    window-gram hashes (list<int64>). Deterministic; not SQL-expressible."""
    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        rolling_fingerprint_batch,
    )

    def f(b: pa.Table) -> pa.Table:
        vals, offs = rolling_fingerprint_batch(b.column("text"), window, keep)
        fp = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32)),
            pa.array(mask_keys(vals), pa.int64()))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "fingerprint": fp,
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def doc_fingerprint_exact_family_check(sf_dir: str, window: int = 32,
                                       keep: int = 8):
    """Oracle-able INVARIANT over ``doc_fingerprint``: identical texts must
    produce identical winnowing fingerprints — the sketch is a pure
    function of content, so any nondeterminism (seed drift across workers,
    hash instability, batch-boundary effects) splits an exact sha256
    family. Same all-true pattern as ``doc_dedupe_exact_family_check``:
    the Ray side computes the boolean from the REAL sketch output, the
    DuckDB oracle states the invariant, and the driver gate hash-fails on
    regression even though the sketch itself is not SQL-expressible."""
    from fuzzy_dedupe_pipeline_ray.functions.hashing import splitmix64
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        rolling_fingerprint_batch,
    )

    def add_cols(b: pa.Table) -> pa.Table:
        # collapse each fingerprint (bottom-k uint64 list, canonical sorted
        # order) to ONE comparable int64 via an order-sensitive fold —
        # vectorized by fold RANK (≤ keep rounds over aligned positions)
        vals, offs = rolling_fingerprint_batch(b.column("text"), window,
                                               keep)
        m = b.num_rows
        lens = np.diff(offs)
        h = np.full(m, 0xCBF29CE484222325, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(int(lens.max()) if m else 0):
                sel = lens > r
                h[sel] = ((h[sel] ^ vals[offs[:-1][sel] + r])
                          * np.uint64(1099511628211))
            fp_hash = splitmix64(h)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text_sha256": pa.array(sha256_hex_arrow(b.column("text")),
                                    pa.string()),
            "fp_hash": pa.array(mask_keys(fp_hash), pa.int64()),
        })

    with_fp = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        add_cols, batch_format="pyarrow", zero_copy_batch=True).materialize()
    reps = with_fp.groupby("text_sha256").aggregate(
        Min("doc_id", alias_name="rep_id"))
    j = lookup_join(with_fp, reps, on="text_sha256", cfg=DOCS_CFG)
    rep_fp = with_fp.rename_columns(
        {"doc_id": "rep_id", "fp_hash": "rep_fp_hash"}).select_columns(
        ["rep_id", "rep_fp_hash"])
    j = lookup_join(j, rep_fp, on="rep_id", cfg=DOCS_CFG)

    def check(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "same_fp_as_rep": pc.equal(b.column("fp_hash"),
                                       b.column("rep_fp_hash")),
        })

    return j.map_batches(check, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# N-gram Jaccard pairs (exact, SQL-oracled via inverted-index self-join)
# ---------------------------------------------------------------------------

def _ngram_prefix_len(sizes: np.ndarray) -> np.ndarray:
    """Prefix-filter length for Jaccard ≥ 1/2: any qualifying pair has
    |A∩B| ≥ ⌈|X|/2⌉ for each member X, so under ONE global shingle order
    the pair must share a shingle within the first
    |X| − ⌈|X|/2⌉ + 1 = ⌊|X|/2⌋ + 1 elements of BOTH sets (the AllPairs
    prefix lemma — Bayardo et al., WWW'07, public knowledge)."""
    return sizes // 2 + 1


def _ngram_pairs_local(doc: np.ndarray, code: np.ndarray, df: np.ndarray):
    """Exact Jaccard≥1/2 pairs over a local (doc, shingle-code) edge list.
    Pure numpy end-to-end (no per-pair Python); `df` is the per-code
    document frequency. Returns (id_a, id_b, inter, union) arrays.

    Candidate pruning is the PPJoin-style tightening of the prefix
    filter: for the pair's smallest shared code c (in the global (df,
    code) order), J ≥ 1/2 forces |A∩B| ≥ 2·|A|/3 for the smaller member
    A (since |B| ≥ |A|) and ≥ |B|/2 for the larger member B (since the
    size filter |B| ≤ 2|A| holds at J ≥ 1/2) — so c must sit within the
    first ⌊|A|/3⌋+1 of A AND the first ⌊|B|/2⌋+1 of B. Emissions that
    violate either bound (or the size filter) are dropped without losing
    any qualifying pair.
    """
    e = np.empty(0, dtype=np.int64)
    # global shingle order = (df asc, code asc): rare shingles first, so
    # prefixes index the discriminative end of each set
    order = np.lexsort((code, df[code], doc))
    d_s, c_s = doc[order], code[order]
    starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
    lens = np.diff(np.r_[starts, len(d_s)])
    pos = np.arange(len(d_s)) - np.repeat(starts, lens)
    row_len = np.repeat(lens, lens)
    in_prefix = pos < _ngram_prefix_len(row_len)

    # inverted index over prefix rows only: all-pairs within each code run
    pd_ = d_s[in_prefix]
    pc_ = c_s[in_prefix]
    pp_ = pos[in_prefix]          # position of this code within its doc
    pl_ = row_len[in_prefix]      # the doc's set size
    o2 = np.lexsort((pd_, pc_))
    pd_, pc_, pp_, pl_ = pd_[o2], pc_[o2], pp_[o2], pl_[o2]
    rs = np.flatnonzero(np.r_[True, pc_[1:] != pc_[:-1]])
    rl = np.diff(np.r_[rs, len(pc_)])
    rpos = np.arange(len(pc_)) - np.repeat(rs, rl)
    cnt = np.repeat(rl, rl) - 1 - rpos
    total = int(cnt.sum())
    if total == 0:
        return e, e, e, e
    rows = np.repeat(np.arange(len(pc_)), cnt)
    offs = np.repeat(np.cumsum(cnt) - cnt, cnt)
    partner = np.repeat(np.arange(len(pc_)) + 1, cnt) + (np.arange(total) - offs)

    len_i, len_j = pl_[rows], pl_[partner]
    pos_i, pos_j = pp_[rows], pp_[partner]
    small_len = np.minimum(len_i, len_j)
    big_len = np.maximum(len_i, len_j)
    small_pos = np.where(len_i <= len_j, pos_i, pos_j)
    big_pos = np.where(len_i <= len_j, pos_j, pos_i)
    ok = ((big_len <= 2 * small_len)                       # size filter
          & (small_pos < small_len // 3 + 1)               # 2|A|/3 bound
          & (big_pos < big_len // 2 + 1))                  # |B|/2 bound
    rows, partner = rows[ok], partner[ok]
    if len(rows) == 0:
        return e, e, e, e
    a = np.minimum(pd_[rows], pd_[partner])
    b = np.maximum(pd_[rows], pd_[partner])
    po = np.lexsort((b, a))
    a, b = a[po], b[po]
    first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    a, b = a[first], b[first]

    inter, la, lb = _exact_inter(doc, code, np.int64(df.shape[0]), a, b)
    union = la.astype(np.int64) + lb.astype(np.int64) - inter
    keep = 2 * inter >= union
    return a[keep], b[keep], inter[keep], union[keep]


def _exact_inter(doc: np.ndarray, code: np.ndarray, m: np.int64,
                 a: np.ndarray, b: np.ndarray):
    """Exact |A∩B| per candidate doc pair, vectorized: membership count of
    the smaller member's codes in the larger member's (doc, code) rows,
    via ONE searchsorted over a packed (dense_doc, code) key array.
    ``m`` is the code-space size (codes are 0..m-1). Returns
    ``(inter, la, lb)`` int64 arrays (la/lb = the members' set sizes).
    Shared by the Jaccard and containment pair kernels."""
    code_by_doc_order = np.lexsort((code, doc))
    d_v = doc[code_by_doc_order]
    c_v = code[code_by_doc_order]
    v_starts = np.flatnonzero(np.r_[True, d_v[1:] != d_v[:-1]])
    v_lens = np.diff(np.r_[v_starts, len(d_v)])
    uniq_docs = d_v[v_starts]                      # sorted unique doc ids
    dense = np.searchsorted(uniq_docs, d_v).astype(np.int64)
    packed = dense * np.int64(m) + c_v             # sorted by construction

    slot_a = np.searchsorted(uniq_docs, a)
    slot_b = np.searchsorted(uniq_docs, b)
    la, lb = v_lens[slot_a], v_lens[slot_b]
    probe_slot = np.where(la <= lb, slot_a, slot_b)    # smaller member
    target_slot = np.where(la <= lb, slot_b, slot_a)
    plen = v_lens[probe_slot]

    # probe in bounded chunks (~4M elements) so the temporaries reuse the
    # same warm pages instead of one large first-touch burst (see
    # stages/lsh._EMIT_CHUNK for the rationale)
    inter = np.zeros(len(a), dtype=np.int64)
    pcum = np.cumsum(plen)
    total_probes = int(pcum[-1]) if len(pcum) else 0
    cuts = np.searchsorted(pcum, np.arange(4_000_000, total_probes,
                                           4_000_000)) + 1
    bounds = np.r_[0, cuts, len(a)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        pl = plen[s:e]
        tot = int(pl.sum())
        if tot == 0:
            continue
        prow = np.repeat(np.arange(s, e), pl)
        istart = np.repeat(np.cumsum(pl) - pl, pl)
        elem_idx = (np.repeat(v_starts[probe_slot[s:e]], pl)
                    + (np.arange(tot) - istart))
        queries = (target_slot[prow].astype(np.int64) * np.int64(m)
                   + c_v[elem_idx])
        qpos = np.minimum(np.searchsorted(packed, queries),
                          len(packed) - 1)
        found = (packed[qpos] == queries).astype(np.int64)
        nz = pl > 0
        if nz.any():
            inter[s:e][nz] = np.add.reduceat(found,
                                             (np.cumsum(pl) - pl)[nz])
    return inter, la.astype(np.int64), lb.astype(np.int64)


#: containment threshold C(A,B) = |A∩B| / min(|A|,|B|) ≥ 9/10, decided in
#: exact integer arithmetic (10·inter ≥ 9·min_sz) on both engine and oracle.
CONTAIN_NUM, CONTAIN_DEN = 9, 10


def _containment_prefix_len(sizes: np.ndarray) -> np.ndarray:
    """Prefix-filter length for containment ≥ c over the SMALLER member A:
    |A∩B| ≥ ⌈c·|A|⌉ forces a shared element within A's first
    |A| − ⌈c·|A|⌉ + 1 elements under any single global order (same
    AllPairs lemma as `_ngram_prefix_len`, with the overlap bound from
    the containment threshold instead of Jaccard's)."""
    need = (CONTAIN_NUM * sizes + CONTAIN_DEN - 1) // CONTAIN_DEN
    return sizes - need + 1


def _containment_pairs_local(doc: np.ndarray, code: np.ndarray,
                             df: np.ndarray):
    """Exact containment ≥ 9/10 pairs over a local (doc, shingle-code)
    edge list: C(A,B) = |A∩B| / min(|A|,|B|), the subset-duplication
    signal Jaccard misses (a 40-gram doc fully contained in a 400-gram
    doc scores J ≈ 0.1 but C = 1.0). Pure numpy end-to-end.

    Candidate generation indexes ALL rows but emits pairs only from
    PREFIX rows (the containment prefix of each doc in global (df, code)
    order): there is no size filter at containment thresholds — a tiny
    doc can be contained in an arbitrarily large one — so the partner
    side must be the full index, unlike Jaccard's prefix×prefix. Within
    each code run prefix rows sort first and each emits pairs with every
    later row, covering every qualifying pair exactly once (the smaller
    member's prefix must intersect the partner somewhere in the index).
    Returns (id_a, id_b, inter, min_sz) with 10·inter ≥ 9·min_sz."""
    e = np.empty(0, dtype=np.int64)
    order = np.lexsort((code, df[code], doc))
    d_s, c_s = doc[order], code[order]
    starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
    lens = np.diff(np.r_[starts, len(d_s)])
    pos = np.arange(len(d_s)) - np.repeat(starts, lens)
    row_len = np.repeat(lens, lens)
    is_pref = pos < _containment_prefix_len(row_len)

    # full inverted index; prefix rows first within each code run, and
    # only prefix rows emit (cnt = 0 for non-prefix rows)
    o2 = np.lexsort((d_s, ~is_pref, c_s))
    pd_, pf_, pc_ = d_s[o2], is_pref[o2], c_s[o2]
    rs = np.flatnonzero(np.r_[True, pc_[1:] != pc_[:-1]])
    rl = np.diff(np.r_[rs, len(pc_)])
    rpos = np.arange(len(pc_)) - np.repeat(rs, rl)
    cnt = np.where(pf_, np.repeat(rl, rl) - 1 - rpos, 0)
    total = int(cnt.sum())
    if total == 0:
        return e, e, e, e
    rows = np.repeat(np.arange(len(pc_)), cnt)
    offs = np.repeat(np.cumsum(cnt) - cnt, cnt)
    partner = (np.repeat(np.arange(len(pc_)) + 1, cnt)
               + (np.arange(total) - offs))
    a = np.minimum(pd_[rows], pd_[partner])
    b = np.maximum(pd_[rows], pd_[partner])
    po = np.lexsort((b, a))
    a, b = a[po], b[po]
    first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    a, b = a[first], b[first]
    if len(a) == 0:
        return e, e, e, e

    inter, la, lb = _exact_inter(doc, code, np.int64(df.shape[0]), a, b)
    min_sz = np.minimum(la, lb)
    keep = CONTAIN_DEN * inter >= CONTAIN_NUM * min_sz
    return a[keep], b[keep], inter[keep], min_sz[keep]


def doc_ngram_jaccard_pairs(sf_dir: str, n: int = 3,
                            cfg: "PipelineConfig | None" = None):
    """Exact word-n-gram Jaccard pairs: (id_a, id_b, inter, union_sz) for
    pairs with Jaccard ≥ 1/2, decided in EXACT integer arithmetic
    (2·inter ≥ union) — no float in the output or the threshold, so the
    DuckDB oracle (unnest + self-join) hashes identically.

    Candidate generation uses the AllPairs PREFIX FILTER (not a raw
    inverted-index self-join): each doc's shingles are ordered by global
    document frequency and only the first ⌊|d|/2⌋+1 participate in the
    index, which provably loses no pair at J ≥ 1/2 while excising the
    quadratic hot-shingle groups (a stopword 3-gram shared by every doc
    sits at the END of every ordering and never enters the index).
    Verification computes |A∩B| exactly on the surviving candidates only.

    Two physical paths, gated on ``cfg.broadcast_max_rows`` like
    stages/lsh.grouped_pairs: a single-pass local numpy path (the shingle
    edge list at bench scale is ~1M narrow rows — Ray shuffle fixed costs
    dwarf the work), and a distributed path (per-doc prefix via
    groupby(doc).map_groups, candidate emission via a shingle-key
    self-join, verification via a candidate-restricted co-occurrence
    count) exercised by tests with a tiny threshold override.
    """
    cfg = cfg or DOCS_CFG
    return _ngram_pairs(sf_dir, n, cfg, mode="jaccard")


def doc_ngram_containment_pairs(sf_dir: str, n: int = 3,
                                cfg: "PipelineConfig | None" = None):
    """Exact word-n-gram CONTAINMENT pairs: (id_a, id_b, inter, min_sz)
    for pairs with |A∩B| / min(|A|,|B|) ≥ 9/10, decided in exact integer
    arithmetic (10·inter ≥ 9·min_sz). The subset-duplication signal a
    Jaccard threshold misses: a short doc fully embedded in a long one
    (vendored snippet, quoted reply, boilerplate-wrapped article) has
    tiny Jaccard but containment 1.0 — the standard complement to
    near-dup filtering in training-data curation.

    Same two physical tiers as `doc_ngram_jaccard_pairs`, with the
    containment prefix filter (`_containment_prefix_len`): candidate
    emission probes each doc's prefix against the FULL inverted index
    (no size filter exists at containment thresholds — a tiny doc can be
    contained in an arbitrarily large one), then verifies |A∩B| exactly.
    """
    cfg = cfg or DOCS_CFG
    return _ngram_pairs(sf_dir, n, cfg, mode="containment")


def _word_ngram_shingles(b: pa.Table, n: int) -> pa.Table:
    """Per-doc DISTINCT word n-gram strings, fully vectorized: Arrow
    whitespace split (matches ``str.split()``; empty tokens from
    leading/trailing whitespace are masked out) → window indices via
    list offsets + numpy repeat/arange → n-gram strings via the C
    ``binary_join_element_wise`` kernel → per-doc dedup via
    ``dictionary_encode`` codes (hash factorize, no string sort). No
    per-row Python (r2 verdict #3)."""
    toks = pc.utf8_split_whitespace(b.column("text"))
    toks = (toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray) else toks)
    flat = toks.flatten()
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    # compact the flat token array: drop ""-tokens (Arrow keeps them
    # for leading/trailing whitespace; Python split() does not) and
    # recompute per-row lengths from the surviving tokens
    lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(len(lens)), lens)[nonempty]
    flat = flat.filter(pa.array(nonempty))
    lens = np.bincount(row_of, minlength=len(lens)).astype(np.int64)

    counts = np.maximum(lens - n + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "shingle": pa.array([], pa.string())})
    tok_start = np.cumsum(lens) - lens
    rows = np.repeat(np.arange(len(lens)), counts)
    offs = np.repeat(np.cumsum(counts) - counts, counts)
    idx0 = np.repeat(tok_start, counts) + (np.arange(total) - offs)
    grams = [flat.take(pa.array(idx0 + j, pa.int64()))
             for j in range(n)]
    sh = pc.binary_join_element_wise(*grams, " ")
    doc = b.column("doc_id").to_numpy()[rows]

    # per-doc distinct (grams form a SET): factorize the strings at C
    # speed, then mask duplicate (doc, code) pairs
    code = sh.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    order = np.lexsort((code, doc))
    d_s, c_s = doc[order], code[order]
    first = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
    keep = pa.array(np.sort(order[first]), pa.int64())
    return pa.table({
        "doc_id": pa.array(doc, pa.int64()).take(keep),
        "shingle": sh.take(keep)})


def _ngram_pairs(sf_dir: str, n: int, cfg: "PipelineConfig", mode: str):
    """Shared driver for the exact n-gram pair operators. ``mode`` picks
    the threshold semantics: ``"jaccard"`` (2·inter ≥ union, output
    union_sz) or ``"containment"`` (10·inter ≥ 9·min_sz, output min_sz)."""
    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _word_ngram_shingles(b, n),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    last_col = "union_sz" if mode == "jaccard" else "min_sz"
    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("inter", pa.int64()), (last_col, pa.int64())])

    if ds.count() <= cfg.broadcast_max_rows:
        from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

        tbl = to_local_table(ds)
        if tbl is None or tbl.num_rows == 0:
            return ray.data.from_arrow(out_schema.empty_table())
        doc = tbl.column("doc_id").to_numpy()
        # factorize shingle strings → dense int codes (EXACT — no hashing)
        codes, inv = np.unique(
            tbl.column("shingle").to_numpy(zero_copy_only=False),
            return_inverse=True)
        df = np.bincount(inv, minlength=len(codes)).astype(np.int64)
        kernel = (_ngram_pairs_local if mode == "jaccard"
                  else _containment_pairs_local)
        a, b, inter, last = kernel(doc, inv.astype(np.int64), df)
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "inter": pa.array(inter, pa.int64()),
            last_col: pa.array(last, pa.int64()),
        }, schema=out_schema)).sort(["id_a", "id_b"])

    return _ngram_pairs_distributed(ds, cfg, out_schema, mode=mode)


def _ngram_pairs_distributed(ds, cfg: "PipelineConfig", out_schema,
                             mode: str = "jaccard"):
    """The 100 TB shape of doc_ngram_jaccard_pairs.

    Shingles are keyed by a 64-bit hash (collision odds ~n²/2⁶⁵ —
    negligible, documented trade of the distributed path). Stages:
    prefix rows per doc (groupby(doc).map_groups — one call per doc, each
    numpy-vectorized), candidates via shingle-key self-join + i<j filter
    + distinct, exact |A∩B| via a co-occurrence Count restricted to
    candidate docs, final scoring against per-doc sizes.
    """
    import pyarrow.compute as pcm

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    def to_hashed(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "sh": pa.array(mask_keys(
                sha256_u64_arrow(b.column("shingle"), 1)[:, 0]), pa.int64()),
        })

    hashed = ds.map_batches(to_hashed, batch_format="pyarrow").materialize()
    sizes = hashed.groupby("doc_id").aggregate(Count(alias_name="set_size"))
    df = hashed.groupby("sh").aggregate(Count(alias_name="df"))
    with_df = lookup_join(hashed, df, on="sh", cfg=cfg)

    plen_fn = (_ngram_prefix_len if mode == "jaccard"
               else _containment_prefix_len)

    def prefix_of_doc(g: pa.Table) -> pa.Table:
        dfs = g.column("df").to_numpy()
        shs = g.column("sh").to_numpy()
        o = np.lexsort((shs, dfs))
        p = int(plen_fn(np.array([len(shs)]))[0])
        keep = o[:p]
        return pa.table({"doc_id": g.column("doc_id").take(pa.array(keep)),
                         "sh": pa.array(shs[keep], pa.int64())})

    prefix = with_df.groupby("doc_id").map_groups(
        prefix_of_doc, batch_format="pyarrow").materialize()

    # Jaccard joins prefix×prefix (symmetric by the prefix lemma + size
    # filter); containment must join each prefix against the FULL index
    # (the smaller member's prefix hits the partner ANYWHERE) and
    # canonicalize with min/max since only one side's prefix is probed.
    if mode == "jaccard":
        right = prefix.rename_columns({"doc_id": "doc_id_b"})
        emit = lambda b: (lambda t: pa.table(  # noqa: E731
            {"id_a": t.column("doc_id"), "id_b": t.column("doc_id_b")}))(
            b.filter(pcm.less(b.column("doc_id"), b.column("doc_id_b"))))
    else:
        right = hashed.rename_columns({"doc_id": "doc_id_b"})
        emit = lambda b: (lambda t: pa.table(  # noqa: E731
            {"id_a": pcm.min_element_wise(t.column("doc_id"),
                                          t.column("doc_id_b")),
             "id_b": pcm.max_element_wise(t.column("doc_id"),
                                          t.column("doc_id_b"))}))(
            b.filter(pcm.not_equal(b.column("doc_id"),
                                   b.column("doc_id_b"))))
    joined = hash_join(prefix, right, on="sh", cfg=cfg)
    cands = distinct_pairs_sorted(joined.map_batches(
        emit, batch_format="pyarrow")).materialize()

    # candidate-restricted co-occurrence: only rows of candidate docs
    # re-enter the self-join, and only candidate pairs are counted
    ids = cands.map_batches(
        lambda b: pa.table({"doc_id": pa.concat_arrays(
            [b.column("id_a").combine_chunks(),
             b.column("id_b").combine_chunks()])}), batch_format="pyarrow")
    ids = ids.groupby("doc_id").aggregate(Count(alias_name="_n")) \
        .select_columns(["doc_id"])
    restricted = lookup_join(hashed, ids.map_batches(
        lambda b: b.append_column("_m", pa.array(
            np.ones(b.num_rows, np.int8))), batch_format="pyarrow"),
        on="doc_id", cfg=cfg).select_columns(["doc_id", "sh"]).materialize()

    rright = restricted.rename_columns({"doc_id": "doc_id_b"})
    co = hash_join(restricted, rright, on="sh", cfg=cfg).map_batches(
        lambda b: (lambda t: pa.table({"id_a": t.column("doc_id"),
                                       "id_b": t.column("doc_id_b")}))(
            b.filter(pcm.less(b.column("doc_id"), b.column("doc_id_b")))),
        batch_format="pyarrow")
    # Count over all shared shingles = |A∩B| exactly. Pairs of candidate
    # docs that were never true candidates may be counted too — harmless:
    # the prefix lemma guarantees every J≥1/2 pair IS a candidate, so any
    # extra pair provably fails the 2·inter≥union gate below.
    inter = co.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="inter"))

    inter = lookup_join(inter, sizes.rename_columns(
        {"doc_id": "id_a", "set_size": "size_a"}), on="id_a", cfg=cfg)
    inter = lookup_join(inter, sizes.rename_columns(
        {"doc_id": "id_b", "set_size": "size_b"}), on="id_b", cfg=cfg)

    def score(b: pa.Table) -> pa.Table:
        iv = b.column("inter").to_numpy().astype(np.int64)
        sa = b.column("size_a").to_numpy().astype(np.int64)
        sb = b.column("size_b").to_numpy().astype(np.int64)
        if mode == "jaccard":
            last = sa + sb - iv                       # union size
            keep = 2 * iv >= last
        else:
            last = np.minimum(sa, sb)                 # min set size
            keep = CONTAIN_DEN * iv >= CONTAIN_NUM * last
        return pa.table({
            "id_a": pa.array(b.column("id_a").to_numpy()[keep], pa.int64()),
            "id_b": pa.array(b.column("id_b").to_numpy()[keep], pa.int64()),
            "inter": pa.array(iv[keep], pa.int64()),
            out_schema.names[3]: pa.array(last[keep], pa.int64()),
        }, schema=out_schema)

    return inter.map_batches(score, batch_format="pyarrow").sort(
        ["id_a", "id_b"])


# ---------------------------------------------------------------------------
# Near-dup dedupe variants (rows-only checks — hashing not in SQL)
# ---------------------------------------------------------------------------

def _documents_as_corpus(sf_dir: str):
    """documents → (doc_id, content, n_chars) for the engine stages."""
    def f(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "content": b.column("text"),
            "n_chars": pc.cast(pc.utf8_length(b.column("text")), pa.int64()),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def doc_minhash_lsh_dedupe(sf_dir: str, cfg: "PipelineConfig | None" = None):
    """Full fuzzy pipeline (fingerprint → LSH → verify → CC → finalize)
    over the documents table; returns the assignments table."""
    cfg = cfg or DOCS_CFG
    corpus = _documents_as_corpus(sf_dir).materialize()
    docs_meta = corpus.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "content_sha256": pa.array(
                sha256_hex_arrow(b.column("content")), pa.string()),
            "n_chars": b.column("n_chars"),
        }), batch_format="pyarrow", zero_copy_batch=True).materialize()
    sigs = fingerprint(corpus, cfg).materialize()
    ex = exact_edges(docs_meta, cfg)
    fuzzy = verify_pairs(candidate_pairs(sigs, cfg), sigs, cfg)
    # duplicate pairs across edge sets are benign for CC and max-confidence
    edges = ex.union(fuzzy).materialize()
    labels = connected_components(edges, cfg)
    out = finalize(docs_meta, labels, edges, cfg, sort_keys=GENERIC_SORT_KEYS)
    return out.select_columns(["doc_id", "cluster_id", "duplicate_count",
                               "is_representative"]).sort("doc_id")


def doc_dedupe_exact_family_check(sf_dir: str,
                                  cfg: "PipelineConfig | None" = None):
    """Oracle-able INVARIANT over the full fuzzy pipeline: every doc must
    land in the same cluster as the representative (min doc_id) of its
    exact sha256 group — identical texts can never be split by the
    MinHash/LSH/CC stages. The Ray side computes the boolean from the
    REAL pipeline output; the DuckDB oracle states the invariant
    (all-true), so a regression that splits an exact family hash-fails
    the driver gate even though LSH itself is not SQL-expressible."""
    from ray.data.aggregate import Min

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    cfg = cfg or DOCS_CFG
    assign = (doc_minhash_lsh_dedupe(sf_dir, cfg)
              .select_columns(["doc_id", "cluster_id"]).materialize())

    def add_sha(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text_sha256": pa.array(sha256_hex_arrow(b.column("text")),
                                    pa.string()),
        })

    with_sha = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        add_sha, batch_format="pyarrow", zero_copy_batch=True).materialize()
    reps = with_sha.groupby("text_sha256").aggregate(
        Min("doc_id", alias_name="rep_id"))
    doc_rep = lookup_join(with_sha, reps, on="text_sha256", cfg=cfg)
    doc_rep = lookup_join(doc_rep, assign, on="doc_id", cfg=cfg)
    rep_clusters = assign.rename_columns(
        {"doc_id": "rep_id", "cluster_id": "rep_cluster"})
    joined = lookup_join(doc_rep, rep_clusters, on="rep_id", cfg=cfg)

    def check(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "same_cluster_as_rep": pc.equal(b.column("cluster_id"),
                                            b.column("rep_cluster")),
        })

    return joined.map_batches(check, batch_format="pyarrow").sort("doc_id")


def doc_simhash_exact_family_check(sf_dir: str,
                                   cfg: "PipelineConfig | None" = None):
    """Oracle-able INVARIANT over the SimHash dedupe: identical texts have
    identical SimHash fingerprints (hamming 0 ≤ any threshold), so every
    doc must land in the same cluster as the representative (min doc_id)
    of its exact sha256 group. Same all-true pattern as
    ``doc_dedupe_exact_family_check`` — the Ray side computes the boolean
    from the REAL ``doc_simhash_dedupe`` output, the DuckDB oracle states
    the invariant, and a regression that splits an exact family hash-fails
    the driver gate even though SimHash itself is not SQL-expressible."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    cfg = cfg or DOCS_CFG
    assign = (doc_simhash_dedupe(sf_dir, cfg=cfg)
              .select_columns(["doc_id", "cluster_id"]).materialize())

    def add_sha(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text_sha256": pa.array(sha256_hex_arrow(b.column("text")),
                                    pa.string()),
        })

    with_sha = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        add_sha, batch_format="pyarrow", zero_copy_batch=True).materialize()
    reps = with_sha.groupby("text_sha256").aggregate(
        Min("doc_id", alias_name="rep_id"))
    doc_rep = lookup_join(with_sha, reps, on="text_sha256", cfg=cfg)
    doc_rep = lookup_join(doc_rep, assign, on="doc_id", cfg=cfg)
    rep_clusters = assign.rename_columns(
        {"doc_id": "rep_id", "cluster_id": "rep_cluster"})
    joined = lookup_join(doc_rep, rep_clusters, on="rep_id", cfg=cfg)

    def check(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "same_cluster_as_rep": pc.equal(b.column("cluster_id"),
                                            b.column("rep_cluster")),
        })

    return joined.map_batches(check, batch_format="pyarrow").sort("doc_id")


def doc_simhash_dedupe(sf_dir: str, max_hamming: int = 3,
                       cfg: "PipelineConfig | None" = None):
    """SimHash near-dup clustering: 4×16-bit chunk blocking (two fingerprints
    within hamming ≤ 3 of 64 bits share at least one of 4 chunks — pigeonhole)
    → within-block pairs → hamming filter → connected components."""
    cfg = cfg or DOCS_CFG
    sigs = fingerprint(_documents_as_corpus(sf_dir), cfg).materialize()

    def explode_chunks(b: pa.Table) -> pa.Table:
        sim = b.column("simhash").to_numpy()
        doc = b.column("doc_id").to_numpy()
        keys, docs, sims = [], [], []
        for c in range(4):
            chunk = ((sim >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            keys.append(chunk | np.int64(c << 16))
            docs.append(doc)
            sims.append(sim)
        return pa.table({
            "chunk_key": pa.array(np.concatenate(keys), pa.int64()),
            "doc_id": pa.array(np.concatenate(docs), pa.int64()),
            "simhash": pa.array(np.concatenate(sims), pa.uint64()),
        })

    # vectorized within-block all-pairs: self-join on the 16-bit chunk key
    # (C-path hash join), then a batched hamming filter — no per-group
    # Python (see stages/lsh.grouped_pairs for the rationale).

    exploded = (sigs.select_columns(["doc_id", "simhash"])
                .map_batches(explode_chunks, batch_format="pyarrow")
                .materialize())
    right = exploded.rename_columns({"doc_id": "doc_id_b",
                                     "simhash": "simhash_b"})
    joined = hash_join(exploded, right, on="chunk_key", cfg=cfg)

    def ham_filter(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b.column("doc_id"), b.column("doc_id_b")))
        ham = hamming64(t.column("simhash").to_numpy(),
                        t.column("simhash_b").to_numpy())
        keep = ham <= max_hamming
        ids_a = t.column("doc_id").to_numpy()[keep]
        ids_b = t.column("doc_id_b").to_numpy()[keep]
        return pa.table({"id_a": pa.array(ids_a, pa.int64()),
                         "id_b": pa.array(ids_b, pa.int64())})

    pairs = distinct_pairs_sorted(
        joined.map_batches(ham_filter, batch_format="pyarrow")).materialize()
    labels = connected_components(pairs.map_batches(
        lambda b: b, batch_format="pyarrow"), cfg)
    # assignment: docs with no pair → own cluster
    docs = read_documents(sf_dir, ["doc_id"])
    joined = hash_join(docs, labels, on="doc_id", join_type="left_outer",
                       cfg=cfg)

    def fill(b: pa.Table) -> pa.Table:
        lab = pc.coalesce(b.column("label"), pc.cast(b.column("doc_id"),
                                                     pa.int64()))
        return pa.table({"doc_id": b.column("doc_id"), "cluster_id": lab})

    return joined.map_batches(fill, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# KMV distinct-count sketch (k minimum values / bottom-k theta sketch)
# ---------------------------------------------------------------------------

#: sketch size: relative standard error ≈ 1/sqrt(KMV_K - 2) ≈ 3.1%
KMV_K = 1024
_KMV_SPACE = 1 << 63  # mask_keys hashes are uniform in [0, 2^63)


def _gram_sha_hashes(b: pa.Table, n: int) -> np.ndarray:
    """Per-batch DISTINCT masked sha256 hashes of the word n-grams of
    ``text`` (same tokenization/join as the jaccard shingler, same
    hash-prefix convention as ``hash64_str`` — both independently
    oracle-pinned)."""
    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        mask_keys as _mask, sha256_u64_arrow as _sha)

    toks = pc.utf8_split_whitespace(b.column("text"))
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(len(lens)), lens)[nonempty]
    flat = flat.filter(pa.array(nonempty))
    lens = np.bincount(row_of, minlength=len(lens)).astype(np.int64)
    counts = np.maximum(lens - n + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    tok_start = np.cumsum(lens) - lens
    offs = np.repeat(np.cumsum(counts) - counts, counts)
    idx0 = np.repeat(tok_start, counts) + (np.arange(total) - offs)
    grams = [flat.take(pa.array(idx0 + j, pa.int64())) for j in range(n)]
    sh = pc.binary_join_element_wise(*grams, " ")
    return np.unique(_mask(_sha(sh)[:, 0]))


def doc_distinct_shingle_sketch(sf_dir: str, n: int = 3, k: int = KMV_K):
    """Distinct word-n-gram count: exact (distributed groupby) next to a
    KMV bottom-k sketch estimate — ``(exact_distinct, kmv_k, kmv_est)``.

    KMV (Bar-Yossef et al., RANDOM 2002): with D distinct values hashed
    uniformly into [0, 2⁶³), the k-th smallest distinct hash h_k has
    E[h_k/2⁶³] = k/(D+1), so D̂ = (k-1)·2⁶³ / h_k (floor; unbiased to
    O(1/k), rel-σ ≈ 1/√(k−2)). The sketch side is the 100 TB shape: each
    batch emits its ≤k smallest distinct hashes, the driver merges
    O(k·#blocks) values — rows never leave workers. The exact side (a
    full distinct-count shuffle, exactly what the sketch exists to avoid)
    is computed here only as the verification pair for the oracle.

    The whole estimator is EXACT-integer SQL: DuckDB reproduces the same
    sha256-prefix hashes (hex → UBIGINT cast, big-endian, top bit
    masked), the same k-th smallest, and the same floor division — so
    the oracle value-hash-pins the estimate itself, not just a bound.
    """
    from fuzzy_dedupe_pipeline_ray.functions.hashing import bottom_k

    hashes = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: pa.table({"h": pa.array(_gram_sha_hashes(b, n),
                                          pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    # exact: number of distinct hashes via a distributed groupby
    exact = hashes.groupby("h").aggregate(Count(alias_name="c")).count()

    # sketch: per-block bottom-k partials → tiny driver merge
    import ray as _ray

    def _partial(tbl: pa.Table) -> np.ndarray:
        return bottom_k(tbl.column("h").to_numpy().astype(np.uint64), k)

    part = _ray.remote(_partial)
    partials = _ray.get([part.remote(r) for r in hashes.to_arrow_refs()])
    merged = bottom_k(np.concatenate(partials) if partials
                      else np.empty(0, np.uint64), k)
    if len(merged) < k:
        est = len(merged)          # fewer than k distinct: sketch is exact
    else:
        est = (k - 1) * _KMV_SPACE // int(merged[-1])
    return ray.data.from_arrow(pa.table({
        "exact_distinct": pa.array([exact], pa.int64()),
        "kmv_k": pa.array([k], pa.int64()),
        "kmv_est": pa.array([int(est)], pa.int64()),
    }))


# ---------------------------------------------------------------------------
# Token-level corpus statistics (explode → combine → merge shapes)
# ---------------------------------------------------------------------------

def _exploded_token_codes(text: pa.ChunkedArray):
    """Tokenize a batch the same way the langid oracle does (lower → trim →
    split on ``_WS``), drop empty tokens, and return

    ``(rows, codes, vocab)`` — flat int64 row indices, flat dictionary
    codes, and the batch-local vocabulary (StringArray) — the shared
    explode kernel for the DF / repetition operators below. Fully
    vectorized: one regex split, one dictionary encode, numpy the rest.

    NULL texts are treated as empty (no tokens): without the fill, a
    null list's length surfaces as NaN→negative in numpy and
    ``list_flatten`` silently drops the row, crashing/misaligning every
    operator built on this kernel (review finding, round 4)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(text, ""))),
        pattern=textnorm._WS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(len(lengths), dtype=np.int64),
                     lengths.astype(np.int64))
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    vocab = enc.dictionary
    keep = np.asarray(pc.not_equal(vocab, "").take(
        pa.array(codes)).to_numpy(zero_copy_only=False), bool)
    return rows[keep], codes[keep], vocab


def _token_rank(tok: pa.Array) -> np.ndarray:
    """Per-element rank of a string column under lexicographic order of
    its distinct values — the shared tie-break kernel for the token
    top-k/min operators (dictionary codes sort like the strings only if
    the dictionary is sorted, so re-rank via the sorted vocabulary).
    Must stay bit-consistent with DuckDB's ORDER BY on the same strings;
    one copy so an edit can't silently change tie-breaking in only one
    operator (review finding, round 4)."""
    enc = pc.dictionary_encode(tok)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    rank = np.empty(len(enc.dictionary), np.int64)
    rank[np.argsort(np.asarray(enc.dictionary, object))] = np.arange(
        len(enc.dictionary))
    return rank[np.asarray(enc.indices, np.int64)]


def token_doc_freq(sf_dir: str, top_n: int = 50):
    """Document frequency of whitespace tokens: the ``top_n`` tokens by
    number of distinct documents containing them, ties broken by token.
    Output: (token, df).

    The inverted-index shape: explode tokens per doc with per-BATCH
    distinct + partial counts (the combiner — only (token, partial_df)
    rows shuffle, never the exploded token stream), a ``groupby(token)``
    sum, a per-block partial top-n, then a tiny final sort+limit. At
    100 TB the shuffle carries one row per distinct (block, token)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        rows, codes, vocab = _exploded_token_codes(b.column("text"))
        if len(rows) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        # distinct (doc, token) pairs, then docs-per-token in this batch
        v = len(vocab)
        pair = np.unique(rows * np.int64(v) + codes)
        df = np.bincount((pair % v).astype(np.int64), minlength=v)
        nz = np.flatnonzero(df)
        return pa.table({
            "token": pc.cast(pa.array(vocab).take(pa.array(nz)), pa.string()),
            "df": pa.array(df[nz], pa.int64()),
        })

    agg = (read_documents(sf_dir, ["text"])
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("token").aggregate(Sum("df", alias_name="df")))

    def block_topn(b: pa.Table) -> pa.Table:
        if b.num_rows <= top_n:
            return pa.table({"token": pc.cast(b.column("token"), pa.string()),
                             "df": pc.cast(b.column("df"), pa.int64())})
        df = np.asarray(b.column("df"), np.int64)
        tok = b.column("token").combine_chunks()
        keep = np.sort(np.lexsort((_token_rank(tok), -df))[:top_n])
        return pa.table({"token": pc.cast(tok.take(pa.array(keep)),
                                          pa.string()),
                         "df": pa.array(df[keep], pa.int64())})

    return (agg.map_batches(block_topn, batch_format="pyarrow")
            .sort(["df", "token"], descending=[True, False]).limit(top_n))


def doc_token_repetition(sf_dir: str):
    """Gopher-style repetition signals per document: total whitespace
    tokens, distinct tokens, the count of the most-repeated token, and a
    ``repetitive`` flag (top token > 20% of all tokens). All-integer
    output (float-free oracle compare); one vectorized pass per batch —
    explode, dictionary-encode, one ``np.unique`` over packed (row, code)
    keys, ``reduceat`` for the per-row max."""
    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        rows, codes, vocab = _exploded_token_codes(b.column("text"))
        n_tok = np.bincount(rows, minlength=n).astype(np.int64)
        v = max(len(vocab), 1)
        pair, pair_counts = np.unique(rows * np.int64(v) + codes,
                                      return_counts=True)
        pair_rows = (pair // v).astype(np.int64)
        n_distinct = np.bincount(pair_rows, minlength=n).astype(np.int64)
        top = np.zeros(n, dtype=np.int64)
        if len(pair_rows):
            # np.unique returns keys sorted, so pair_rows is grouped;
            # reduceat over each row's contiguous run (empty rows excluded)
            starts = np.flatnonzero(np.diff(pair_rows, prepend=-1))
            top[pair_rows[starts]] = np.maximum.reduceat(pair_counts, starts)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
            "top_token_count": pa.array(top, pa.int64()),
            "repetitive": pa.array(top * 5 > n_tok),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def doc_rarest_token(sf_dir: str):
    """Each document's most distinctive token: the token with the LOWEST
    global document frequency (ties by token). Output: (doc_id,
    rarest_token, rarest_df); docs with no tokens get ('', 0).

    The broadcast-lookup shape over text: pass 1 builds the global DF
    table (per-batch distinct + partial counts, tiny groupby — exact
    because a document never spans batches); pass 2 re-explodes and joins
    DF back onto the (doc, token) stream through ``hash_join``'s tiered
    plan (vocab-sized side broadcasts under the gate, shuffles above it),
    reduces to a per-batch winner per doc, and finishes with a
    tiny per-doc groupby over ≤ one partial row per (doc, block)."""
    from ray.data.aggregate import Sum

    from fuzzy_dedupe_pipeline_ray.sources.io import hash_join

    def pairs_fn(b: pa.Table) -> pa.Table:
        rows, codes, vocab = _exploded_token_codes(b.column("text"))
        ids = b.column("doc_id").to_numpy()
        if len(rows) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string())})
        v = len(vocab)
        pair = np.unique(rows * np.int64(v) + codes)
        return pa.table({
            "doc_id": pa.array(ids[(pair // v)], pa.int64()),
            "token": pc.cast(pa.array(vocab).take(pa.array(pair % v)),
                             pa.string()),
        })

    def pairs(): return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        pairs_fn, batch_format="pyarrow", zero_copy_batch=True)

    df_tbl = (pairs().map_batches(
        lambda b: pa.table({"token": b.column("token"),
                            "df_part": pa.array(np.ones(b.num_rows,
                                                        np.int64))}),
        batch_format="pyarrow")
        .groupby("token").aggregate(Sum("df_part", alias_name="df")))

    joined = hash_join(pairs(), df_tbl, on="token", cfg=DOCS_CFG)

    def partial_min(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        df = np.asarray(pc.cast(b.column("df"), pa.int64()), np.int64)
        tok = b.column("token").combine_chunks()
        order = np.lexsort((_token_rank(tok), df, ids))
        first = order[np.flatnonzero(np.diff(ids[order], prepend=-1))]
        first = np.sort(first)
        return pa.table({
            "doc_id": pa.array(ids[first], pa.int64()),
            "token": tok.take(pa.array(first)),
            "df": pa.array(df[first], pa.int64()),
        })

    def group_min(g: pa.Table) -> pa.Table:
        i = min(range(g.num_rows),
                key=lambda j: (g.column("df")[j].as_py(),
                               g.column("token")[j].as_py()))
        return g.slice(i, 1)

    winners = (joined.map_batches(partial_min, batch_format="pyarrow")
               .groupby("doc_id").map_groups(group_min,
                                             batch_format="pyarrow"))

    # left-join back onto the full id set so token-less docs keep a row
    ids = read_documents(sf_dir, ["doc_id"])
    out = hash_join(ids, winners, on="doc_id", cfg=DOCS_CFG,
                    join_type="left_outer")

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "rarest_token": pc.fill_null(pc.cast(b.column("token"),
                                                 pa.string()), ""),
            "rarest_df": pc.fill_null(pc.cast(b.column("df"), pa.int64()), 0),
        })

    return out.map_batches(fill, batch_format="pyarrow").sort("doc_id")


# PII-ish scrub patterns (RE2-compatible, written identically in the DuckDB
# oracle): emails and 4+-digit runs. Counts are taken on the ORIGINAL text
# (so digits inside an email count toward n_long_nums even though the email
# replacement consumes them in the scrubbed output).
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PII_NUM_RE = "[0-9][0-9][0-9][0-9]+"


def doc_pii_scrub(sf_dir: str):
    """Redaction pass for training-data hygiene: replace email addresses
    with ``<EMAIL>`` then 4+-digit runs with ``<NUM>``, and count each
    pattern's matches on the original text. Pure RE2 kernels per batch —
    the same two regexes the oracle runs. Output: (doc_id, scrubbed,
    n_emails, n_long_nums)."""
    def f(b: pa.Table) -> pa.Table:
        text = b.column("text")
        scrub = pc.replace_substring_regex(text, pattern=PII_EMAIL_RE,
                                           replacement="<EMAIL>")
        scrub = pc.replace_substring_regex(scrub, pattern=PII_NUM_RE,
                                           replacement="<NUM>")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "scrubbed": scrub,
            "n_emails": pc.cast(pc.count_substring_regex(
                text, pattern=PII_EMAIL_RE), pa.int64()),
            "n_long_nums": pc.cast(pc.count_substring_regex(
                text, pattern=PII_NUM_RE), pa.int64()),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


CHUNK_SIZE = 200
CHUNK_STRIDE = 150


def doc_chunk(sf_dir: str, size: int = CHUNK_SIZE,
              stride: int = CHUNK_STRIDE):
    """Split documents into overlapping fixed-width character windows (the
    context-window chunking step of a training-data pipeline). A document
    of n chars yields ``1 + ceil((n - size)/stride)`` chunks (min 1, so
    empty docs keep one empty chunk). flat_map-shaped but vectorized: one
    ``utf8_slice_codeunits`` call per chunk INDEX (≤ ceil(max_len/stride)
    per batch), never per row — codepoint slicing matches DuckDB substr
    semantics exactly (verified on non-ASCII). Output: (doc_id, chunk_idx,
    chunk_start, chunk_text)."""
    def f(b: pa.Table) -> pa.Table:
        text = b.column("text").combine_chunks()
        ids = b.column("doc_id").to_numpy()
        n = pc.utf8_length(text).to_numpy().astype(np.int64)
        # ceil((n - size)/stride) + 1  ==  (n - size + stride - 1)//stride + 1
        nc = np.where(n <= size, 1, (n - size + stride - 1) // stride + 1)
        out_ids, out_idx, out_txt = [], [], []
        for i in range(int(nc.max()) if len(nc) else 0):
            mask = nc > i
            sel = np.flatnonzero(mask)
            sliced = pc.utf8_slice_codeunits(
                text.take(pa.array(sel)), start=i * stride,
                stop=i * stride + size)
            out_ids.append(ids[sel])
            out_idx.append(np.full(len(sel), i, np.int64))
            out_txt.append(sliced)
        if not out_ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_start": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        idx = np.concatenate(out_idx)
        tbl = pa.table({
            "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "chunk_start": pa.array(idx * stride, pa.int64()),
            "chunk_text": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in out_txt]),
        })
        return tbl.take(pa.array(np.lexsort((idx,
                                             tbl.column("doc_id")
                                             .to_numpy()))))

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


TFIDF_SCALE = 1_000_000


def doc_tfidf_top_terms(sf_dir: str, k: int = 3):
    """Top-k most distinctive terms per document by an integer TF-IDF
    surrogate: ``score = tf · 1e6 // df`` (floor division — identical in
    numpy and DuckDB, so the oracle compare is exact; a float idf would
    tie-break differently at the ulp level). Ties by token. Docs with no
    tokens emit no rows.

    Same two-pass shape as ``doc_rarest_token``: build the global DF
    table (tiny, one row per distinct token), hash_join it back onto the
    per-batch (doc, token, tf) stream (broadcast under the gate), keep a
    per-batch partial top-k per doc, finish with a per-doc group top-k.
    Output: (doc_id, rnk, token, tfidf_score)."""
    from ray.data.aggregate import Sum

    from fuzzy_dedupe_pipeline_ray.sources.io import hash_join

    def tf_fn(b: pa.Table) -> pa.Table:
        rows, codes, vocab = _exploded_token_codes(b.column("text"))
        ids = b.column("doc_id").to_numpy()
        if len(rows) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        v = len(vocab)
        pair, tf = np.unique(rows * np.int64(v) + codes, return_counts=True)
        return pa.table({
            "doc_id": pa.array(ids[(pair // v)], pa.int64()),
            "token": pc.cast(pa.array(vocab).take(pa.array(pair % v)),
                             pa.string()),
            "tf": pa.array(tf.astype(np.int64)),
        })

    def tf_stream():
        return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            tf_fn, batch_format="pyarrow", zero_copy_batch=True)

    df_tbl = (tf_stream().map_batches(
        lambda b: pa.table({"token": b.column("token"),
                            "df_part": pa.array(np.ones(b.num_rows,
                                                        np.int64))}),
        batch_format="pyarrow")
        .groupby("token").aggregate(Sum("df_part", alias_name="df")))

    joined = hash_join(tf_stream(), df_tbl, on="token", cfg=DOCS_CFG)

    def partial_topk(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        tf = np.asarray(pc.cast(b.column("tf"), pa.int64()), np.int64)
        df = np.asarray(pc.cast(b.column("df"), pa.int64()), np.int64)
        score = (tf * TFIDF_SCALE) // df
        tok = b.column("token").combine_chunks()
        order = np.lexsort((_token_rank(tok), -score, ids))
        sid = ids[order]
        starts = np.flatnonzero(np.diff(sid, prepend=-1))
        run_start = np.repeat(starts, np.diff(np.append(starts, len(order))))
        keep = np.sort(order[np.arange(len(order)) - run_start < k])
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "token": tok.take(pa.array(keep)),
            "tfidf_score": pa.array(score[keep], pa.int64()),
        })

    def group_topk(g: pa.Table) -> pa.Table:
        score = g.column("tfidf_score").to_numpy()
        tok = g.column("token").combine_chunks()
        order = np.lexsort((_token_rank(tok), -score))[:k]
        return pa.table({
            "doc_id": g.column("doc_id").take(pa.array(order)),
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "token": tok.take(pa.array(order)),
            "tfidf_score": pa.array(score[order], pa.int64()),
        })

    return (joined.map_batches(partial_topk, batch_format="pyarrow")
            .groupby("doc_id").map_groups(group_topk, batch_format="pyarrow")
            .sort(["doc_id", "rnk"]))


# ---------------------------------------------------------------------------
# Word n-gram operators: decontamination + novelty attribution
# ---------------------------------------------------------------------------

def _doc_ngrams(text: pa.ChunkedArray, n: int):
    """DISTINCT (row_idx, gram) pairs of word ``n``-grams per document.

    Tokenization matches ``_exploded_token_codes`` (lower → trim → ws
    split → drop empties), so the DuckDB oracles can reproduce it with
    ``list_filter(regexp_split_to_array(...), t -> t <> '')``. Grams are
    the n consecutive tokens joined by a single space. Fully vectorized:
    the only per-gram work is ``binary_join_element_wise`` over n shifted
    takes of the flat token stream; per-doc distinct falls out of one
    ``np.unique`` over packed (row, gram-code) keys. Returns
    ``(rows, grams)`` — int64 row indices + a StringArray, one entry per
    distinct (document, gram)."""
    rows, codes, vocab = _exploded_token_codes(text)
    m = len(rows)
    empty = (np.empty(0, np.int64), pa.array([], pa.string()))
    if m < n:
        return empty
    # a gram starting at flat position i stays inside one document iff the
    # row index n-1 positions later is the same row
    valid = np.flatnonzero(rows[:m - n + 1] == rows[n - 1:])
    if len(valid) == 0:
        return empty
    toks = pc.cast(vocab, pa.string()).take(pa.array(codes))
    parts = [toks.take(pa.array(valid + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    enc = pc.dictionary_encode(grams)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    gcodes = np.asarray(enc.indices, np.int64)
    v = max(len(enc.dictionary), 1)
    uniq = np.unique(rows[valid] * np.int64(v) + gcodes)
    return ((uniq // v).astype(np.int64),
            pc.cast(enc.dictionary.take(pa.array(uniq % v)), pa.string()))


DECON_N = 5            # word n-gram size for the contamination probe
DECON_BENCH_MOD = 50   # doc_id % 50 == 0 -> benchmark ("test set") doc


def doc_decontaminate(sf_dir: str, n: int = DECON_N):
    """Test-set decontamination: flag training documents that share any
    word ``n``-gram with a held-out benchmark set (here the deterministic
    2% slice ``doc_id % 50 == 0`` standing in for an eval suite). The
    standard pre-training hygiene pass (n-gram overlap against benchmark
    text, as in public LM data reports).

    Shape: both sides explode to DISTINCT (doc, gram) pairs per batch
    (docs never span batches, so per-batch distinct is exact); the
    benchmark grams reduce to one distinct-gram table (tiny groupby);
    membership is an inner ``hash_join`` on the gram string — broadcast
    under the gates (the realistic case: benchmarks are MBs against TBs
    of training docs), distributed shuffle join above them — then a
    per-doc partial-count combiner and a left join back onto the full
    non-benchmark id set so clean docs keep a row. No driver-side
    materialization of either gram set at any size.

    Output: (doc_id, n_overlap, contaminated) over non-benchmark docs,
    where n_overlap counts the doc's DISTINCT grams that appear anywhere
    in the benchmark."""
    from ray.data.aggregate import Sum

    def side_pairs(b: pa.Table, bench: bool) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        mask = (ids % DECON_BENCH_MOD == 0) if bench else \
            (ids % DECON_BENCH_MOD != 0)
        sub = b.take(pa.array(np.flatnonzero(mask)))
        urows, ugrams = _doc_ngrams(sub.column("text"), n)
        return pa.table({
            "doc_id": pa.array(sub.column("doc_id").to_numpy()[urows],
                               pa.int64()),
            "g": ugrams,
        })

    def reader():
        return read_documents(sf_dir, ["doc_id", "text"])

    bench_grams = (reader().map_batches(
        lambda b: side_pairs(b, True).select(["g"]),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g").aggregate(Count(alias_name="_n")))

    train_pairs = reader().map_batches(
        lambda b: side_pairs(b, False), batch_format="pyarrow",
        zero_copy_batch=True)

    def part_counts(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("doc_id").to_numpy(), return_counts=True)
        return pa.table({"doc_id": pa.array(u, pa.int64()),
                         "hit_part": pa.array(c.astype(np.int64))})

    def nonbench_ids(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table({"doc_id": pa.array(
            ids[ids % DECON_BENCH_MOD != 0], pa.int64())})

    ids = read_documents(sf_dir, ["doc_id"]).map_batches(
        nonbench_ids, batch_format="pyarrow", zero_copy_batch=True)

    # degenerate sides: a groupby over zero rows yields a SCHEMA-LESS
    # empty dataset that no downstream join can consume — when the
    # benchmark has no grams (or nothing overlaps) the answer is simply
    # all-zeros over the non-benchmark ids (tested in test_ngram_ops)
    per_doc = None
    bench_grams = bench_grams.materialize()
    n_bench = bench_grams.count()
    if n_bench > 0:
        # membership via the tiered lookup_join: the distinct benchmark
        # grams broadcast once under the gate and each train batch
        # filters itself with one C `index_in` probe — the exploded
        # train gram stream is never materialized; above the gate a
        # broadcast BLOOM filter (16 bits/gram vs ~100-byte gram
        # strings, no false negatives) prunes the train stream to
        # near-hits BEFORE the distributed hash_join shuffles it (the
        # 100 TB fallback; the exact join removes the ~0.04% false
        # positives, so the tier is bit-identical — equivalence-tested
        # in test_ngram_ops)
        from fuzzy_dedupe_pipeline_ray.sources.io import (bloom_semi_filter,
                                                          lookup_join)

        gram_keys = bench_grams.select_columns(["g"])
        if n_bench > DOCS_CFG.broadcast_max_rows:
            train_pairs = bloom_semi_filter(train_pairs, gram_keys,
                                            on="g", cfg=DOCS_CFG,
                                            right_count=n_bench)
        hits = lookup_join(train_pairs, gram_keys,
                           on="g", cfg=DOCS_CFG, right_count=n_bench)
        per_doc = (hits.map_batches(part_counts, batch_format="pyarrow")
                   .groupby("doc_id").aggregate(
                       Sum("hit_part", alias_name="n_overlap"))
                   .materialize())
        if per_doc.count() == 0:  # nothing overlapped
            per_doc = None
    if per_doc is None:
        def zeros(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "n_overlap": pa.array(np.zeros(n, np.int64)),
                "contaminated": pa.array(np.zeros(n, bool)),
            })

        return ids.map_batches(zeros, batch_format="pyarrow").sort("doc_id")

    out = hash_join(ids, per_doc, on="doc_id", cfg=DOCS_CFG,
                    join_type="left_outer")

    def fill(b: pa.Table) -> pa.Table:
        ov = pc.fill_null(pc.cast(b.column("n_overlap"), pa.int64()), 0)
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_overlap": ov,
            "contaminated": pc.greater(ov, 0),
        })

    return out.map_batches(fill, batch_format="pyarrow").sort("doc_id")


NOVELTY_N = 3  # word n-gram size for novelty attribution


def doc_ngram_novelty(sf_dir: str, n: int = NOVELTY_N):
    """N-gram novelty attribution: for each document, how many DISTINCT
    word ``n``-grams it contains and how many of those appear for the
    FIRST time in the corpus at this document (global first-seen = min
    doc_id over every doc containing the gram). The dataset-curation
    signal behind "how much new text does this shard actually add".

    Shape: per-batch distinct (doc, gram) pairs (exact — docs never span
    batches) → ``groupby(gram).Min(doc_id)`` assigns each distinct gram
    its first-seen doc (the one wide shuffle; grams are grouped by their
    string key so the oracle compare is exact — at 100 TB you would swap
    the key to a 128-bit gram hash to cut shuffle bytes) → per-batch
    partial counts per first-seen doc → tiny ``groupby(doc).Sum``. The
    per-doc distinct count never shuffles at all: it is computed inline
    per batch. One left join puts both counts on every document row.

    Output: (doc_id, n_distinct_ngrams, n_new_ngrams) for ALL docs."""
    from ray.data.aggregate import Sum

    def distinct_fn(b: pa.Table) -> pa.Table:
        urows, _ = _doc_ngrams(b.column("text"), n)
        cnt = np.bincount(urows, minlength=b.num_rows).astype(np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_distinct_ngrams": pa.array(cnt),
        })

    def pairs_fn(b: pa.Table) -> pa.Table:
        urows, ugrams = _doc_ngrams(b.column("text"), n)
        ids = b.column("doc_id").to_numpy()
        return pa.table({"doc_id": pa.array(ids[urows], pa.int64()),
                         "g": ugrams})

    distincts = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        distinct_fn, batch_format="pyarrow", zero_copy_batch=True)

    # materialize costs nothing extra here — hash_join materializes its
    # inputs anyway (io.py deadlock note) — and gives a cheap emptiness
    # probe: a groupby over ZERO rows yields a schema-less dataset no
    # downstream op can consume (tested in test_ngram_ops)
    first_seen = (read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        pairs_fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g").aggregate(Min("doc_id", alias_name="first_doc"))
        .materialize())

    if first_seen.count() == 0:
        def zero_fill(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "n_distinct_ngrams": pc.cast(b.column("n_distinct_ngrams"),
                                             pa.int64()),
                "n_new_ngrams": pa.array(np.zeros(b.num_rows, np.int64)),
            })

        return distincts.map_batches(
            zero_fill, batch_format="pyarrow").sort("doc_id")

    def part_new(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            np.asarray(pc.cast(b.column("first_doc"), pa.int64()), np.int64),
            return_counts=True)
        return pa.table({"doc_id": pa.array(u, pa.int64()),
                         "new_part": pa.array(c.astype(np.int64))})

    new_counts = (first_seen.map_batches(part_new, batch_format="pyarrow")
                  .groupby("doc_id").aggregate(Sum("new_part",
                                                   alias_name="n_new")))

    out = hash_join(distincts, new_counts, on="doc_id", cfg=DOCS_CFG,
                    join_type="left_outer")

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_distinct_ngrams": pc.cast(b.column("n_distinct_ngrams"),
                                         pa.int64()),
            "n_new_ngrams": pc.fill_null(pc.cast(b.column("n_new"),
                                                 pa.int64()), 0),
        })

    return out.map_batches(fill, batch_format="pyarrow").sort("doc_id")


DUP_RATE_SCALE = 1_000_000


def files_dup_rate_by_lang(sf_dir: str):
    """Per-language exact-duplication rollup over the source-code corpus —
    the dedup REPORT a curation pipeline emits per source/language shard:
    total files, distinct contents, duplicate files, and an integer dup
    rate (``dup_files·1e6 // n_files``; floor division so the oracle
    compare is exact). Runs over the deterministic ``small`` fixture
    corpus (the same one ``files_exact_family_check`` pins) because it
    has real duplicate families; the documents table is dup-free at the
    gate tier.

    Shape: sha256 per batch (the same content-hash kernel the flagship's
    exact stage uses — distinct-by-hash equals distinct-by-content) →
    ``groupby([lang, sha]).Count`` (the wide step; combiner-sized rows) →
    per-batch partials → tiny ``groupby(lang)``. Output one row per lang."""
    from ray.data.aggregate import Sum

    from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir

    def add_sha(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b.column("lang"),
            "content_sha256": pa.array(sha256_hex_arrow(b.column("content")),
                                       pa.string()),
        })

    files = ray.data.read_parquet(f"{corpus_dir('small')}/files.parquet",
                                  columns=["lang", "content"])
    groups = (files.map_batches(
        add_sha, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "content_sha256"]).aggregate(Count(alias_name="n")))

    def partials(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b.column("lang"),
            "files_part": pc.cast(b.column("n"), pa.int64()),
            "distinct_part": pa.array(np.ones(b.num_rows, np.int64)),
        })

    agg = (groups.map_batches(partials, batch_format="pyarrow")
           .groupby("lang").aggregate(
               Sum("files_part", alias_name="n_files"),
               Sum("distinct_part", alias_name="n_distinct")))

    def final(b: pa.Table) -> pa.Table:
        nd = np.asarray(pc.cast(b.column("n_files"), pa.int64()), np.int64)
        nu = np.asarray(pc.cast(b.column("n_distinct"), pa.int64()), np.int64)
        dup = nd - nu
        return pa.table({
            "lang": b.column("lang"),
            "n_files": pa.array(nd),
            "n_distinct": pa.array(nu),
            "dup_files": pa.array(dup),
            "dup_rate_e6": pa.array(dup * DUP_RATE_SCALE // nd),
        })

    return agg.map_batches(final, batch_format="pyarrow").sort("lang")


def doc_curation_funnel(sf_dir: str):
    """The keep/drop REPORT of a curation run — how many documents
    survive each successive filter: quality rules (≥5 tokens, punctuation
    below 10%) → language (predicted 'en' by the same marker kernel
    ``doc_langid`` oracles) → exact dedup. One output row:
    (n_total, n_quality_ok, n_quality_en, n_quality_en_unique).

    Shape: one streaming pass emits per-batch partial counts for the
    three flag totals (a Sum aggregate — no groupby key, no shuffle of
    rows); the distinct count of surviving texts is a sha groupby whose
    OUTPUT rows are counted from block metadata. The driver only ever
    holds four scalars."""
    from ray.data.aggregate import Sum

    def flag_arrays(b: pa.Table):
        text = b.column("text")
        total = pc.cast(pc.utf8_length(text), pa.int64())
        punct = textnorm.punct_count_array(text)
        n_tok = textnorm.token_count_array(text)
        quality = pc.and_(
            pc.greater_equal(n_tok, 5),
            pc.less(pc.multiply(punct, pa.scalar(10, pa.int64())), total))
        en = pc.equal(textnorm.lang_id_array(text), pa.scalar("en"))
        return quality, pc.and_(quality, en)

    def partials(b: pa.Table) -> pa.Table:
        quality, q_en = flag_arrays(b)
        return pa.table({
            "n_part": pa.array([b.num_rows], pa.int64()),
            "q_part": pa.array([pc.sum(pc.cast(quality, pa.int64())).as_py()
                                or 0], pa.int64()),
            "qe_part": pa.array([pc.sum(pc.cast(q_en, pa.int64())).as_py()
                                 or 0], pa.int64()),
        })

    agg = (read_documents(sf_dir, ["text"]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n_part", alias_name="n_total"),
                   Sum("q_part", alias_name="n_quality_ok"),
                   Sum("qe_part", alias_name="n_quality_en")))

    def survivors(b: pa.Table) -> pa.Table:
        _, q_en = flag_arrays(b)
        kept = b.column("text").filter(q_en)
        return pa.table({"sha": pa.array(
            sha256_hex_arrow(kept), pa.string())})

    n_unique = (read_documents(sf_dir, ["text"]).map_batches(
        survivors, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sha").aggregate(Count(alias_name="_n")).count())

    return pa.table({
        "n_total": pa.array([int(agg["n_total"])], pa.int64()),
        "n_quality_ok": pa.array([int(agg["n_quality_ok"])], pa.int64()),
        "n_quality_en": pa.array([int(agg["n_quality_en"])], pa.int64()),
        "n_quality_en_unique": pa.array([int(n_unique)], pa.int64()),
    })


STRAT_SAMPLE_K = 20


def doc_sample_stratified(sf_dir: str, k: int = STRAT_SAMPLE_K):
    """Deterministic STRATIFIED sampling: per language, the ``k``
    documents with the smallest Knuth multiplicative hash of ``doc_id``
    (ties broken by doc_id) — a per-stratum quota sample that is a pure
    function of the keys, so re-running any shard re-selects the same
    rows (the property ``doc_sample`` documents, per group).

    Shape: per-batch partial top-k per language (one lexsort per batch),
    then a per-language group top-k — only ≤ k rows per (block, lang)
    ever shuffle. Output: (lang, sample_rank, doc_id)."""
    def partial_topk(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        h = _knuth_hash_i64(ids)
        lang = b.column("lang").combine_chunks()
        order = np.lexsort((ids, h, _token_rank(lang)))
        sl = _token_rank(lang)[order]
        starts = np.flatnonzero(np.diff(sl, prepend=-1))
        run_start = np.repeat(starts, np.diff(np.append(starts, len(order))))
        keep = np.sort(order[np.arange(len(order)) - run_start < k])
        return pa.table({
            "lang": lang.take(pa.array(keep)),
            "doc_id": pa.array(ids[keep], pa.int64()),
            "h": pa.array(h[keep], pa.int64()),
        })

    def group_topk(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        h = g.column("h").to_numpy()
        order = np.lexsort((ids, h))[:k]
        return pa.table({
            "lang": g.column("lang").take(pa.array(order)),
            "sample_rank": pa.array(np.arange(1, len(order) + 1,
                                              dtype=np.int64)),
            "doc_id": pa.array(ids[order], pa.int64()),
        })

    return (read_documents(sf_dir, ["doc_id", "lang"]).map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang").map_groups(group_topk, batch_format="pyarrow")
        .sort(["lang", "sample_rank"]))


def doc_dedup_consecutive_tokens(sf_dir: str):
    """Collapse CONSECUTIVE repeated whitespace tokens per document
    ("the the" → "the") — the stutter-cleanup pass of a text-curation
    pipeline (OCR doubling, template echo, generation loops). Case is
    preserved; the token split is the same ``_WS`` regex the langid /
    DF oracles use (trim, split, drop empties), so the DuckDB oracle is
    bit-compatible.

    Fully vectorized per batch: one regex split, one shifted Arrow
    string compare over the flat token buffer (doc-start positions
    forced kept so runs never leak across documents), diff-of-cumsum
    removal counts, and one ``binary_join`` to re-materialize the
    cleaned text. No per-row Python, no shuffle — a pure map over the
    documents scan. Output: (doc_id, text_clean, n_tokens, n_removed)."""
    def f(b: pa.Table) -> pa.Table:
        text = b.column("text")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(text, "")),
            pattern=textnorm._WS)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lengths = (pc.list_value_length(toks)
                   .to_numpy(zero_copy_only=False).astype(np.int64))
        rows = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        nonempty = np.asarray(
            pc.not_equal(flat, "").to_numpy(zero_copy_only=False), bool)
        n_tok = np.bincount(rows[nonempty],
                            minlength=len(lengths)).astype(np.int64)
        flat2 = flat.filter(pa.array(nonempty))
        m = len(flat2)
        starts = np.zeros(len(n_tok) + 1, np.int64)
        np.cumsum(n_tok, out=starts[1:])
        dup = np.zeros(m, bool)
        if m > 1:
            dup[1:] = np.asarray(pc.equal(
                flat2.slice(1), flat2.slice(0, m - 1))
                .to_numpy(zero_copy_only=False), bool)
        dup[starts[:-1][n_tok > 0]] = False  # first token of each doc
        cs = np.zeros(m + 1, np.int64)
        np.cumsum(dup, out=cs[1:])
        n_removed = cs[starts[1:]] - cs[starts[:-1]]
        kept = n_tok - n_removed
        off3 = np.zeros(len(kept) + 1, np.int64)
        np.cumsum(kept, out=off3[1:])
        flat3 = flat2.filter(pa.array(~dup))
        clean = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off3, pa.int32()), flat3),
            " ")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text_clean": clean,
            "n_tokens": pa.array(n_tok),
            "n_removed": pa.array(n_removed),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


# ---------------------------------------------------------------------------
# Sequence packing — distributed prefix sum over the ordered corpus
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048


def doc_pack_bins(sf_dir: str, budget: int = _PACK_BUDGET):
    """Assign each document to a training-sequence bin by streaming
    concatenation: documents in ``doc_id`` order fill bins of ``budget``
    tokens, ``bin_id = floor(tokens_before_this_doc / budget)`` — the
    packing step that turns a curated corpus into fixed-token-budget
    training sequences (documents may straddle bins, as concat-then-
    chunk training pipelines do).

    Distributed shape: the global prefix sum SQL writes as one window
    function is the ordered-scan pattern Ray Data has no operator for —
    sort by doc_id, one tiny per-block token-total summary, the
    O(#blocks) driver prefix scan, then one labeling task per block
    (local cumsum + the block's prefix). Driver state is one int per
    block. Output: (doc_id, n_tokens, bin_id)."""
    from fuzzy_dedupe_pipeline_ray.pipelines.relational import \
        _sorted_block_scan

    toks = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": textnorm.token_count_array(b.column("text"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    sorted_ds = toks.sort("doc_id").materialize()

    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        return int(pc.sum(tbl.column("n_tokens")).as_py())

    def scan(summaries):
        args, acc = [], 0
        for s in summaries:
            args.append((acc, budget))
            acc += s or 0
        return args

    def label(tbl: pa.Table, prefix: int, b: int) -> pa.Table:
        n = tbl.column("n_tokens").to_numpy()
        before = prefix + np.cumsum(n) - n
        return pa.table({
            "doc_id": tbl.column("doc_id"),
            "n_tokens": tbl.column("n_tokens"),
            "bin_id": pa.array(before // b, pa.int64()),
        })

    labeled = _sorted_block_scan(sorted_ds, summarize, (), scan, label)
    if labeled is None:
        return pa.schema([("doc_id", pa.int64()),
                          ("n_tokens", pa.int64()),
                          ("bin_id", pa.int64())]).empty_table()
    return labeled


# ---------------------------------------------------------------------------
# Corpus mixing weights — rebalance the language distribution
# ---------------------------------------------------------------------------

def doc_mix_weights(sf_dir: str):
    """Per-language sampling weight (basis points) that rebalances the
    corpus to a UNIFORM language mix: weight_bps = total·10⁴ //
    (n_langs·n_docs_lang) — >10⁴ upsamples a rare language, <10⁴
    downsamples a dominant one; exact integer math so the SQL oracle is
    bitwise. Per-batch count partials → one tiny groupby — the weight
    table a sampling stage would broadcast. Output: (lang, n_docs,
    weight_bps)."""
    from ray.data.aggregate import Sum

    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    def partial(b: pa.Table) -> pa.Table:
        enc = b.column("lang").combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({"lang": enc.dictionary,
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (read_documents(sf_dir, ["lang"])
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("lang").aggregate(Sum("n", alias_name="n")))
    t = to_local_table(agg)
    if t is None or t.num_rows == 0:
        return pa.schema([("lang", pa.string()), ("n_docs", pa.int64()),
                          ("weight_bps", pa.int64())]).empty_table()
    n = t.column("n").to_numpy().astype(np.int64)
    total, n_langs = int(n.sum()), len(n)
    w = (total * 10000) // (n_langs * n)
    out = pa.table({"lang": t.column("lang"),
                    "n_docs": pa.array(n),
                    "weight_bps": pa.array(w.astype(np.int64))})
    return out.take(pc.sort_indices(out, sort_keys=[("lang", "ascending")]))


# ---------------------------------------------------------------------------
# Edit-distance pair scoring — length-blocked banded Levenshtein
# ---------------------------------------------------------------------------
# The reference README *claims* Levenshtein pair scoring but never ships
# it (SURVEY §0: rapidfuzz/python-Levenshtein declared, zero imports);
# implemented here for real as a blocked pair operator with an exact
# DuckDB ``levenshtein()`` oracle.

_EDIT_MAX_LEN = 600     # candidate gate: both docs at most this long
_EDIT_LEN_DIFF = 2      # candidate gate: |len(a) - len(b)| bound
_EDIT_MAX_DIST = 60     # report pairs with distance <= this
_EDIT_BUCKET_W = 32     # length-bucket width (must exceed _EDIT_LEN_DIFF)


def _banded_levenshtein(a_pad: np.ndarray, b_pad: np.ndarray,
                        la: np.ndarray, lb: np.ndarray,
                        k: int, check_every: int = 16) -> np.ndarray:
    """Exact Levenshtein distance for P string pairs AT ONCE, banded to
    |i−j| ≤ k (values > k are reported as k+1): a_pad/b_pad are (P, L)
    uint8 matrices padded with mismatching sentinels, la/lb the true
    lengths. One python iteration per ROW (never per pair or per cell);
    the in-row left-to-right insertion dependency is resolved with the
    ``j + min.accumulate(t − j)`` transform, so each row is pure numpy
    over the (P, 2k+1) band. Every ``check_every`` rows, pairs whose
    band minimum already exceeds ``k`` are COMPACTED OUT — each DP cell
    is ≥ the previous row's band minimum, so the final distance of a
    dead pair provably exceeds k; unrelated same-length-block pairs die
    within a few multiples of k rows, so the effective cost is
    O(dead·k² + survivors·L·k), not O(P·L·k)."""
    P = a_pad.shape[0]
    W = 2 * k + 1
    INF = np.int32(1 << 20)
    m_idx = np.arange(W, dtype=np.int32)
    out = np.full(P, k + 1, np.int64)            # default: exceeded
    done0 = la == 0
    out[done0] = np.minimum(lb[done0], k + 1)
    idx = np.flatnonzero(la > 0)                 # active → original index
    if len(idx) == 0:
        return out
    A, B = a_pad[idx], b_pad[idx]
    aL, bL = la[idx], lb[idx]
    band = np.full((len(idx), W), INF, np.int32)
    band[:, k:] = m_idx[None, k:] - k
    for i in range(1, int(aL.max()) + 1):
        n = len(idx)
        up = np.concatenate([band[:, 1:], np.full((n, 1), INF, np.int32)],
                            axis=1)
        # cost[m] compares a[i-1] with b[j-1], j-1 = i-k+m-1
        j0 = i - k - 1  # b index at m=0
        lo_m = max(0, -j0)            # first m with a valid b index
        hi_m = min(W, B.shape[1] - j0)
        cost = np.ones((n, W), np.int32)
        if hi_m > lo_m:
            cost[:, lo_m:hi_m] = (
                A[:, i - 1, None]
                != B[:, j0 + lo_m:j0 + hi_m]).astype(np.int32)
        t = np.minimum(up + 1, band + cost)
        if i <= k:
            t[:, :k - i] = INF        # j<0 positions stay INF
        band = np.minimum.accumulate(t - m_idx[None, :], axis=1) \
            + m_idx[None, :]
        np.minimum(band, INF, out=band)
        hit = aL == i
        finished = hit.any()
        if finished:
            m_read = bL[hit] - i + k
            ok = (m_read >= 0) & (m_read < W)
            vals = np.full(int(hit.sum()), INF, np.int32)
            vals[ok] = band[hit][ok, m_read[ok]]
            out[idx[hit]] = np.where(vals > k, k + 1, vals)
        if finished or i % check_every == 0:
            alive = (aL > i) & (band.min(axis=1) <= k)
            if not alive.all():
                if not alive.any():
                    break
                band, A, B = band[alive], A[alive], B[alive]
                aL, bL, idx = aL[alive], bL[alive], idx[alive]
    return out


def doc_edit_distance_pairs(sf_dir: str, max_len: int = _EDIT_MAX_LEN,
                            len_diff: int = _EDIT_LEN_DIFF,
                            max_dist: int = _EDIT_MAX_DIST):
    """Levenshtein-scored near-pairs: documents of the same language
    whose lengths differ by ≤ ``len_diff`` (and are ≤ ``max_len``),
    reported when edit distance ≤ ``max_dist`` — the classic blocked
    pair-scoring shape (length blocking is the standard cheap filter:
    |len(a)−len(b)| lower-bounds the distance).

    Distributed shape: each doc fans out to its length bucket
    (``n_chars // W``) as HOME and to the next bucket as GUEST, so every
    qualifying pair meets in exactly one group (home×home, or
    guest×home for bucket-straddling pairs — guest×guest pairs belong
    to the previous group); ``groupby(bucket).map_groups`` emits
    candidates with a two-pointer window over the (lang, n_chars) sort
    and scores ALL of a group's pairs in one vectorized banded-DP call
    (``_banded_levenshtein`` — one python iteration per text row, never
    per pair). Content rides the length shuffle once; group size is
    bounded by the bucket/lang blocking. Output: (id_a, id_b,
    edit_distance)."""
    w = _EDIT_BUCKET_W
    assert w > len_diff

    docs = read_documents(sf_dir, ["doc_id", "lang", "text", "n_chars"])

    def explode(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less_equal(b.column("n_chars"), max_len))
        n = t.num_rows
        bucket = pc.cast(pc.divide(t.column("n_chars"), w), pa.int64())
        home = pa.table({
            "bucket": bucket, "guest": pa.array(np.zeros(n, bool)),
            "doc_id": t.column("doc_id"), "lang": t.column("lang"),
            "n_chars": t.column("n_chars"), "text": t.column("text")})
        guest = home.set_column(0, "bucket",
                                pc.add(bucket, pa.scalar(1, pa.int64()))) \
                    .set_column(1, "guest", pa.array(np.ones(n, bool)))
        return pa.concat_tables([home, guest])

    def group_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "edit_distance": pa.array([], pa.int64())})
        if t.num_rows < 2:
            return empty
        lang = pc.dictionary_encode(t.column("lang").combine_chunks())
        lcode = np.asarray(lang.indices, np.int64)
        nch = t.column("n_chars").to_numpy().astype(np.int64)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        guest = t.column("guest").to_numpy(zero_copy_only=False)
        order = np.lexsort((nch, lcode))
        lcode, nch, ids, guest = (lcode[order], nch[order], ids[order],
                                  guest[order])
        # two-pointer window: partners j>i with same lang, diff<=len_diff
        key = lcode * (max_len + len_diff + 2) + nch
        hi = np.searchsorted(key, key + len_diff, side="right")
        starts = np.arange(len(key)) + 1
        cnt = np.maximum(hi - starts, 0)
        if cnt.sum() == 0:
            return empty
        ii = np.repeat(np.arange(len(key)), cnt)
        jj = (np.arange(len(ii))
              - np.repeat(np.cumsum(cnt) - cnt, cnt)
              + np.repeat(starts, cnt))
        # guest×guest pairs are the previous bucket's home×home pairs
        keep = ~(guest[ii] & guest[jj])
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return empty
        texts = t.column("text").combine_chunks().take(pa.array(order))
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        buf = np.frombuffer(texts.buffers()[2], np.uint8)
        off_t = np.int64 if pa.types.is_large_string(texts.type) \
            else np.int32
        offs = np.frombuffer(texts.buffers()[1], off_t)
        # byte-level distance == char-level for this corpus (ASCII-only
        # by construction; the oracle's levenshtein() is char-based)
        la, lb = nch[ii], nch[jj]
        Lmax = int(max(la.max(), lb.max()))
        P = len(ii)
        a_pad = np.zeros((P, Lmax), np.uint8)          # sentinel 0
        b_pad = np.full((P, Lmax), 1, np.uint8)        # ≠ a's sentinel
        for r in range(P):  # bounded gather: ≤Lmax bytes per pair side
            a_pad[r, :la[r]] = buf[offs[ii[r]]:offs[ii[r]] + la[r]]
            b_pad[r, :lb[r]] = buf[offs[jj[r]]:offs[jj[r]] + lb[r]]
        dist = _banded_levenshtein(a_pad, b_pad, la, lb, max_dist)
        m = dist <= max_dist
        id_a = np.minimum(ids[ii[m]], ids[jj[m]])
        id_b = np.maximum(ids[ii[m]], ids[jj[m]])
        return pa.table({"id_a": pa.array(id_a, pa.int64()),
                         "id_b": pa.array(id_b, pa.int64()),
                         "edit_distance": pa.array(dist[m], pa.int64())})

    pairs = (docs.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby("bucket")
             .map_groups(group_pairs, batch_format="pyarrow"))
    return pairs.sort(["id_a", "id_b"])


def doc_mix_sample(sf_dir: str):
    """Weighted rebalancing sampler: downsample over-represented
    languages toward the uniform mix — per-language acceptance
    probability min(1, total/(n_langs·n_lang)) (the ``doc_mix_weights``
    fraction), realized deterministically per doc by the same Knuth
    multiplicative hash as ``doc_sample`` (stable across runs,
    partitionings, and engines). All integer math: keep doc ⟺
    hash(doc_id) < min(2³², 2³²·total // (n_langs·n_lang)) — thresholds
    computed once per DISTINCT language in python ints (no overflow at
    any corpus size), so the SQL oracle is bitwise. The tiny per-lang
    count table broadcasts into one ``index_in`` probe — the
    aggregate → broadcast → filter composition of a 100 TB curation
    pass. Output: (doc_id, lang)."""
    import ray
    from ray.data.aggregate import Sum

    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    def partial(b: pa.Table) -> pa.Table:
        enc = b.column("lang").combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({"lang": enc.dictionary,
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (read_documents(sf_dir, ["lang"])
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("lang").aggregate(Sum("n", alias_name="n")))
    t = to_local_table(agg)
    if t is None or t.num_rows == 0:
        return pa.schema([("doc_id", pa.int64()),
                          ("lang", pa.string())]).empty_table()
    langs = t.column("lang").combine_chunks()
    counts = t.column("n").to_numpy().astype(np.int64)
    total, nl = int(counts.sum()), len(counts)
    thr = np.array([min(_SAMPLE_MOD,
                        (_SAMPLE_MOD * total) // (nl * int(x)))
                    for x in counts], np.uint64)
    ref = ray.put((langs, thr))

    def f(b: pa.Table) -> pa.Table:
        lg, th = ray.get(ref)
        ids = b.column("doc_id").to_numpy().astype(np.uint64)
        h = (ids * np.uint64(_SAMPLE_MULT)) & np.uint64(_SAMPLE_MOD - 1)
        pos = pc.index_in(b.column("lang"), value_set=lg).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = h < th[pos]
        return pa.table({"doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                         "lang": b.column("lang")}).filter(pa.array(keep))

    return (read_documents(sf_dir, ["doc_id", "lang"])
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
            .sort("doc_id"))


# ---------------------------------------------------------------------------
# Line-level corpus hygiene (CCNet-style line dedup + Gopher repetition)
# ---------------------------------------------------------------------------

def _exploded_lines(text):
    """Explode '\\n'-split segments of each text, vectorized: returns
    ``(rows, flat, lens)`` — int64 parent-row indices, the flat segment
    StringArray, and per-row segment counts. Empty segments are KEPT
    (they carry position for reassembly and are never dedup targets);
    null texts contribute zero segments."""
    parts = pc.split_pattern(text, pattern="\n")
    parts = (parts.combine_chunks()
             if isinstance(parts, pa.ChunkedArray) else parts)
    lens = pc.fill_null(pc.list_value_length(parts), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(len(lens)), lens)
    return rows, parts.flatten(), lens


def _nonempty_line_mask(flat) -> np.ndarray:
    """Segments whose space-trimmed form is non-empty — the dedup unit.
    Trims ASCII spaces ONLY (DuckDB ``trim()`` semantics, so the oracle
    is bit-compatible); the UNtrimmed segment string is what's compared."""
    return pc.not_equal(pc.utf8_trim(flat, " "), "").to_numpy(
        zero_copy_only=False)


def doc_gopher_repetition(sf_dir: str):
    """Within-document repetition signals in the Gopher style (Rae et
    al., arXiv:2112.11446 — public quality-filter recipe): the fraction
    of duplicated lines and of characters inside duplicated lines.
    Reported as EXACT integer counts (float-free oracle compare):

    - ``n_lines``: all '\\n'-split segments (incl. empty);
    - ``dup_line_occurrences``: occurrences beyond the first of each
      distinct non-empty line within the doc (Σ(c−1));
    - ``dup_line_chars``: Σ c·len(line) over distinct non-empty lines
      with within-doc count c > 1.

    Pure map_batches — no shuffle; per-batch work is one Arrow split,
    one dictionary_encode factorize, and one np.unique over packed
    (row, line-code) keys. Derive the Gopher fractions downstream as
    dup_line_occurrences/n_lines and dup_line_chars/text_len."""
    def f(b: pa.Table) -> pa.Table:
        nrows = b.num_rows
        rows, flat, lens = _exploded_lines(b.column("text"))
        ne = _nonempty_line_mask(flat)
        sub_rows = rows[ne]
        sub = flat.filter(pa.array(ne))
        dup_occ = np.zeros(nrows, np.int64)
        dup_chars = np.zeros(nrows, np.int64)
        if len(sub_rows):
            enc = sub.dictionary_encode()
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = np.asarray(enc.indices, np.int64)
            v = max(len(enc.dictionary), 1)
            keys, counts = np.unique(sub_rows * np.int64(v) + codes,
                                     return_counts=True)
            urow = (keys // v).astype(np.int64)
            ucode = (keys % v).astype(np.int64)
            dlen = pc.utf8_length(enc.dictionary).to_numpy(
                zero_copy_only=False).astype(np.int64)[ucode]
            dup_occ = np.bincount(urow, weights=counts - 1,
                                  minlength=nrows).astype(np.int64)
            isdup = counts > 1
            dup_chars = np.bincount(
                urow[isdup], weights=(counts * dlen)[isdup],
                minlength=nrows).astype(np.int64)
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_lines": pa.array(lens, pa.int64()),
            "dup_line_occurrences": pa.array(dup_occ, pa.int64()),
            "dup_line_chars": pa.array(dup_chars, pa.int64()),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def doc_line_dedupe(sf_dir: str, cfg: "PipelineConfig | None" = None):
    """Corpus-level duplicated-line removal (the CCNet/RefinedWeb line
    dedup pass, public recipe): a non-empty line that appears in ≥ 2
    DISTINCT documents is boilerplate (headers, nav text, license
    banners) and is stripped from every document; empty/whitespace
    segments and corpus-unique lines are kept in order.

    Output: ``doc_id, n_lines, n_dup_lines, kept_text`` (the document
    re-joined with '\\n' from surviving segments; '' if nothing
    survives).

    Shape: pass A explodes lines per batch (docs never span batches, so
    batch-local (doc, line) distinct is exact), hashes each distinct
    line to a 64-bit sha-derived key, and counts distinct docs per key
    with ONE narrow groupby — content strings never shuffle. Pass B
    re-streams the documents: under ``cfg.broadcast_max_rows`` the dup
    keys broadcast once (``ray.put`` + per-batch ``searchsorted``) and
    each batch filters + reassembles its own docs zero-shuffle; above
    the gate, the exploded (doc, ord, line) stream takes a tiered
    ``lookup_join`` marker and reassembles per doc via
    ``groupby(doc_id).map_groups`` (equivalence-tested with a tiny gate
    override). 64-bit line-key collisions are the documented trade of
    hashing (odds ~n²/2⁶⁵), same as the distributed n-gram tier."""
    cfg = cfg or DOCS_CFG

    def line_doc_pairs(b: pa.Table) -> pa.Table:
        rows, flat, _ = _exploded_lines(b.column("text"))
        ne = _nonempty_line_mask(flat)
        sub_rows = rows[ne]
        sub = flat.filter(pa.array(ne))
        if len(sub_rows) == 0:
            return pa.table({"line_key": pa.array([], pa.int64())})
        enc = sub.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, np.int64)
        v = max(len(enc.dictionary), 1)
        keys = np.unique(sub_rows * np.int64(v) + codes)
        lines = pc.cast(enc.dictionary, pa.string()).take(
            pa.array(keys % v))
        return pa.table({"line_key": pa.array(
            mask_keys(sha256_u64_arrow(lines, 1)[:, 0]), pa.int64())})

    dup = (read_documents(sf_dir, ["doc_id", "text"])
           .map_batches(line_doc_pairs, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("line_key").aggregate(Count(alias_name="nd"))
           .map_batches(lambda b: b.filter(
               pc.greater_equal(b.column("nd"), 2)).select(["line_key"]),
               batch_format="pyarrow")
           .materialize())

    def line_keys_of(flat, ne):
        keys = np.zeros(len(ne), np.int64)
        if ne.any():
            sub = flat.filter(pa.array(ne))
            keys[ne] = mask_keys(sha256_u64_arrow(sub, 1)[:, 0])
        return keys

    def assemble(doc_ids, lens, flat, keep_mask) -> pa.Table:
        kept_counts = (np.bincount(
            np.repeat(np.arange(len(lens)), lens)[keep_mask],
            minlength=len(lens)).astype(np.int64) if len(keep_mask)
            else np.zeros(len(lens), np.int64))
        offsets = np.zeros(len(lens) + 1, np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            flat.filter(pa.array(keep_mask)) if len(keep_mask)
            else flat.slice(0, 0))
        return pa.table({
            "doc_id": pc.cast(doc_ids, pa.int64()),
            "n_lines": pa.array(lens, pa.int64()),
            "n_dup_lines": pa.array(lens - kept_counts, pa.int64()),
            "kept_text": pc.binary_join(la, "\n"),
        })

    if dup.count() <= cfg.broadcast_max_rows:
        from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

        t = to_local_table(dup)
        keys = (np.sort(t.column("line_key").to_numpy())
                if t is not None and t.num_rows else
                np.empty(0, np.int64))
        ref = ray.put(keys)

        def clean(b: pa.Table) -> pa.Table:
            dup_keys = ray.get(ref)
            rows, flat, lens = _exploded_lines(b.column("text"))
            ne = _nonempty_line_mask(flat)
            lk = line_keys_of(flat, ne)
            pos = np.searchsorted(dup_keys, lk)
            np.minimum(pos, max(len(dup_keys) - 1, 0), out=pos)
            is_dup = ne & (dup_keys[pos] == lk) if len(dup_keys) \
                else np.zeros(len(ne), bool)
            return assemble(b.column("doc_id"), lens, flat, ~is_dup)

        return (read_documents(sf_dir, ["doc_id", "text"])
                .map_batches(clean, batch_format="pyarrow",
                             zero_copy_batch=True)
                .sort("doc_id"))

    # distributed tier: exploded (doc, ord, line) stream + tiered marker
    # join + per-doc reassembly (content shuffles ONCE, by doc)
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    def explode(b: pa.Table) -> pa.Table:
        rows, flat, lens = _exploded_lines(b.column("text"))
        ne = _nonempty_line_mask(flat)
        starts = np.cumsum(lens) - lens
        ords = np.arange(len(rows)) - starts[rows] if len(rows) else \
            np.empty(0, np.int64)
        return pa.table({
            "doc_id": pa.array(
                b.column("doc_id").to_numpy()[rows], pa.int64()),
            "ord": pa.array(ords, pa.int64()),
            "line": flat,
            "line_key": pa.array(line_keys_of(flat, ne), pa.int64()),
            "is_ne": pa.array(ne),
        })

    exploded = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)
    marked = lookup_join(
        exploded,
        dup.map_batches(lambda b: b.append_column(
            "_dup", pa.array(np.ones(b.num_rows, np.int8))),
            batch_format="pyarrow"),
        on="line_key", cfg=cfg, join_type="left_outer")

    def per_doc(g: pa.Table) -> pa.Table:
        o = np.argsort(g.column("ord").to_numpy(), kind="stable")
        g = g.take(pa.array(o))
        dupm = pc.fill_null(g.column("_dup"), 0).to_numpy(
            zero_copy_only=False).astype(bool)
        keep = ~(dupm & g.column("is_ne").to_numpy(zero_copy_only=False))
        return assemble(g.column("doc_id").slice(0, 1),
                        np.array([g.num_rows], np.int64),
                        g.column("line").combine_chunks(), keep)

    return (marked.groupby("doc_id")
            .map_groups(per_doc, batch_format="pyarrow")
            .sort("doc_id"))


# ---------------------------------------------------------------------------
# Deterministic shuffle order + train/val/test split (round-4 close)
# ---------------------------------------------------------------------------

#: train/val/test split boundaries over hash-bucket % 100.
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10


def doc_shuffle_deterministic(sf_dir: str):
    """Deterministic GLOBAL shuffle order for training-data serving:
    ``shuffle_rank = row_number() OVER (ORDER BY knuth_hash(doc_id),
    doc_id)``. Unlike ``ray.data.Dataset.random_shuffle`` the order is a
    pure function of the keys — stable across runs, partitionings, and
    engines — so a resumable 100 TB training job can re-derive exactly
    which shard holds rank range [a, b) after a restart.

    Distributed shape: one engine sort on the (hash, doc_id) key pair
    (narrow: two int64 columns), then global ranks are assigned per
    sorted block from an O(#blocks) prefix-sum of block row counts —
    no driver materialization of rows."""
    from fuzzy_dedupe_pipeline_ray.pipelines.relational import \
        _sorted_block_scan

    def add_hash(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table({
            "h": pa.array(_knuth_hash_i64(ids), pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        })

    sorted_ds = (read_documents(sf_dir, ["doc_id"])
                 .map_batches(add_hash, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .sort(["h", "doc_id"]).materialize())

    def summarize(tbl: pa.Table):
        return tbl.num_rows if tbl.num_rows else None

    def scan(summaries):
        args, off = [], 0
        for s in summaries:
            args.append((off,))
            off += s or 0
        return args

    def label(tbl: pa.Table, offset: int) -> pa.Table:
        n = tbl.num_rows
        return pa.table({
            "shuffle_rank": pa.array(
                np.arange(offset + 1, offset + n + 1, dtype=np.int64)),
            "doc_id": tbl.column("doc_id"),
        })

    labeled = _sorted_block_scan(sorted_ds, summarize, (), scan, label)
    if labeled is None:
        return pa.schema([("shuffle_rank", pa.int64()),
                          ("doc_id", pa.int64())]).empty_table()
    return labeled.sort("shuffle_rank")


def doc_split_train_val_test(sf_dir: str):
    """Deterministic train/val/test assignment: hash-bucket
    ``knuth_hash(doc_id) % 100`` → train (< 80) / val (< 90) / test.
    A pure function of the key, so the split is identical across runs,
    engines, and partitionings, and any shard can be re-materialized
    independently (no global coordination, no shuffle — a map-only
    stage). Output: (doc_id, split, lang, n_chars), sorted by doc_id."""
    labels = np.array(["train", "val", "test"])
    hi = np.array([SPLIT_TRAIN_PCT, SPLIT_TRAIN_PCT + SPLIT_VAL_PCT],
                  dtype=np.int64)

    def f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        bucket = _knuth_hash_i64(ids) % 100
        idx = np.searchsorted(hi, bucket, side="right")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "split": pa.array(labels[idx], pa.string()),
            "lang": b.column("lang"),
            "n_chars": pc.cast(b.column("n_chars"), pa.int64()),
        })

    return read_documents(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def doc_unigram_logfreq(sf_dir: str):
    """Unigram-LM quality signal without a model: per document, the mean
    floor(log2(corpus term frequency)) of its tokens — high = common-word
    prose, low = rare-token-heavy (code, tables, noise, other-language).
    The integer-exact stand-in for unigram log-probability scoring: the
    ranking is identical (log p(t) = log tf(t) − log N and N is constant)
    while every value stays a BIGINT the DuckDB oracle reproduces
    bit-for-bit (floor-log2 = IEEE exponent, never libm rounding).
    Output: (doc_id, n_tokens, mean_log2_tf_e3); empty docs get (0, -1).

    Distributed shape: pass 1 builds the corpus TF table (per-batch
    bincount partials — only (token, partial) rows shuffle); pass 2
    re-explodes, probes TF through the tiered ``lookup_join`` (vocab
    broadcast under the gate — the realistic case; distributed hash join
    above it — the 100 TB case), and reduces per batch to one
    (doc, Σocc·log2tf) partial; a parallel stream of per-doc token
    counts (computed pre-join, so EMPTY docs survive) unions in, and one
    per-doc groupby finishes."""
    from ray.data.aggregate import Sum

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    def occ_fn(b: pa.Table) -> pa.Table:
        """(doc_id, token, occ) — per-batch occurrence counts."""
        rows, codes, vocab = _exploded_token_codes(b.column("text"))
        ids = b.column("doc_id").to_numpy()
        if len(rows) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "occ": pa.array([], pa.int64())})
        v = len(vocab)
        pair, occ = np.unique(rows * np.int64(v) + codes,
                              return_counts=True)
        return pa.table({
            "doc_id": pa.array(ids[(pair // v)], pa.int64()),
            "token": pc.cast(pa.array(vocab).take(pa.array(pair % v)),
                             pa.string()),
            "occ": pa.array(occ.astype(np.int64), pa.int64()),
        })

    # NOTE (round-5 profile): deriving occs twice looks wasteful, but
    # materializing the exploded occurrence table instead measured the
    # SAME wall time here (the second pass pipelines under the TF
    # aggregate) and at 100 TB a materialized exploded-token
    # intermediate is strictly worse than recomputation — keep the
    # streaming shape.
    def occs(): return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        occ_fn, batch_format="pyarrow", zero_copy_batch=True)

    tf_tbl = (occs().map_batches(
        lambda b: pa.table({"token": b.column("token"),
                            "tf_part": b.column("occ")}),
        batch_format="pyarrow")
        .groupby("token").aggregate(Sum("tf_part", alias_name="tf")))

    joined = lookup_join(occs(), tf_tbl, on="token", cfg=DOCS_CFG)

    def contrib(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        occ = b.column("occ").to_numpy()
        tf = np.asarray(pc.cast(b.column("tf"), pa.int64()), np.int64)
        log2f = (np.frexp(tf.astype(np.float64))[1] - 1).astype(np.int64)
        uniq, inv = np.unique(ids, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "n_part": pa.array(np.zeros(len(uniq), np.int64)),
            "s_part": pa.array(np.bincount(inv, occ * log2f)
                               .astype(np.int64), pa.int64()),
        })

    def counts(b: pa.Table) -> pa.Table:
        """Per-doc token counts from the RAW stream — every doc appears,
        so empty docs survive to the final table."""
        rows, _, _ = _exploded_token_codes(b.column("text"))
        n = np.bincount(rows, minlength=b.num_rows).astype(np.int64) \
            if b.num_rows else np.empty(0, np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_part": pa.array(n, pa.int64()),
            "s_part": pa.array(np.zeros(b.num_rows, np.int64)),
        })

    count_stream = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True)
    per_doc = (joined.map_batches(contrib, batch_format="pyarrow",
                                  zero_copy_batch=True)
               .union(count_stream)
               .groupby("doc_id")
               .aggregate(Sum("n_part", alias_name="n_tokens"),
                          Sum("s_part", alias_name="s")))

    def final(b: pa.Table) -> pa.Table:
        """Hash aggregate, deliberately: the sorted-group-aggregate
        variant measured SLOWER here (3.0 -> 3.3 s) — its materialize
        barrier breaks the overlap between the two tokenization streams
        feeding this reduce, which outweighs the aggregator spin-up."""
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        mean = np.where(n > 0, (1000 * s) // np.maximum(n, 1), -1)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
            "mean_log2_tf_e3": pa.array(mean.astype(np.int64), pa.int64()),
        })

    return per_doc.map_batches(final, batch_format="pyarrow",
                               zero_copy_batch=True).sort("doc_id")


def _decon_exact_contaminated(corpus, cfg):
    """Train doc_ids in sha256 families containing >=1 benchmark doc —
    the exact side of fuzzy decontamination AND the ground truth its
    invariant check re-derives (one copy so op and check can't drift).
    Sha families with a bench member flag every train member without
    emitting pairs, so hot families cost one row each."""
    from ray.data.aggregate import Sum

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    def sha_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sha": pa.array(sha256_hex_arrow(b.column("content")),
                            pa.string()),
            "is_bench": pa.array(
                ((ids % DECON_BENCH_MOD) == 0).astype(np.int64), pa.int64()),
        })

    shas = corpus.map_batches(sha_rows, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    fam = shas.groupby("sha").aggregate(Sum("is_bench",
                                            alias_name="fam_bench"))
    joined = lookup_join(shas, fam, on="sha", cfg=cfg)

    def exact_flagged(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        nb = b.column("fam_bench").to_numpy(zero_copy_only=False)
        train = (ids % DECON_BENCH_MOD) != 0
        return pa.table({"doc_id": pa.array(ids[train & (nb > 0)],
                                            pa.int64())})

    return joined.map_batches(exact_flagged, batch_format="pyarrow",
                              zero_copy_batch=True)


def doc_fuzzy_decontaminate(sf_dir: str, cfg: "PipelineConfig | None" = None):
    """FUZZY test-set decontamination: training documents that are
    near-duplicates (MinHash-LSH verified) OR exact duplicates of any
    benchmark document (the ``doc_id % 50 == 0`` slice, same convention
    as ``doc_decontaminate``). The n-gram-overlap pass catches verbatim
    leakage; this catches paraphrase-level leakage — light edits,
    re-wrapped lines, near-verbatim quotes — the case public LM data
    reports run MinHash decontamination for.

    Shape: ONE fingerprint pass over the whole table (bench + train ride
    the same signatures — no second scan), the engine's banded LSH +
    verify stages emit near-dup pairs, and a vectorized filter keeps
    cross pairs (exactly one endpoint in the benchmark slice). The exact
    side is a sha groupby (families counted once, no pairs): every train
    doc in a family containing a bench doc is flagged — which also makes
    exact leakage immune to LSH star-capping on hot families. Output:
    the flagged train doc_ids, distinct, sorted."""
    cfg = cfg or DOCS_CFG
    corpus = _documents_as_corpus(sf_dir).materialize()

    # fuzzy cross pairs: full LSH + verify, then keep train↔bench pairs
    sigs = fingerprint(corpus, cfg).materialize()
    fuzzy = verify_pairs(candidate_pairs(sigs, cfg), sigs, cfg)

    def cross(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_numpy()
        c = b.column("id_b").to_numpy()
        ab = (a % DECON_BENCH_MOD) == 0
        cb = (c % DECON_BENCH_MOD) == 0
        m = ab ^ cb
        train = np.where(ab, c, a)[m]
        return pa.table({"doc_id": pa.array(np.unique(train), pa.int64())})

    fz = fuzzy.map_batches(cross, batch_format="pyarrow",
                           zero_copy_batch=True)
    ex = _decon_exact_contaminated(corpus, cfg)
    return (fz.union(ex)
            .groupby("doc_id").aggregate(Count(alias_name="_n"))
            .select_columns(["doc_id"]).sort("doc_id"))


def doc_fuzzy_decontaminate_exact_check(sf_dir: str):
    """Oracle-able INVARIANT over ``doc_fuzzy_decontaminate``: every
    train doc whose text EXACTLY equals some benchmark doc's text must be
    flagged — the sha family pass guarantees it regardless of LSH
    recall, banding config, or star-capping. The Ray side computes the
    boolean from the REAL op output; the DuckDB oracle states the
    expectation (all-true) from text equality."""
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    flagged = doc_fuzzy_decontaminate(sf_dir).map_batches(
        lambda b: b.append_column(
            "_hit", pa.array(np.ones(b.num_rows, np.int8))),
        batch_format="pyarrow")

    # expected set, by the exact logic the oracle states (sha = text eq)
    expected = _decon_exact_contaminated(_documents_as_corpus(sf_dir),
                                         DOCS_CFG)

    checked = lookup_join(expected, flagged, on="doc_id", cfg=DOCS_CFG,
                          join_type="left_outer")
    return checked.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "flagged": pc.equal(pc.fill_null(b.column("_hit"), 0), 1),
        }), batch_format="pyarrow").sort("doc_id")


DECON_FIXTURE_N = 400
DECON_FIXTURE_VERSION = "v1"

_DECON_WORDS = [
    "model", "training", "dataset", "benchmark", "accuracy", "tokens",
    "layers", "gradient", "batch", "sequence", "window", "filter",
    "sample", "metric", "update", "weight", "vector", "output", "input",
    "result", "number", "report", "system", "method", "detail", "review",
]


def decon_fixture_dir(root: str = "/tmp/fdpr_decon") -> str:
    """Generate-and-cache a documents table where contamination actually
    EXISTS: the driver's synthetic documents corpus has no exact text
    equality across the ``doc_id % 50`` benchmark boundary, so the
    fuzzy-decontamination invariant would be vacuous over it. Plants,
    purely deterministically:

    * 8 bench docs whose text is copied VERBATIM to one train doc each
      (the exact-leak case the invariant oracle states);
    * 8 bench docs copied to a train doc with one word substituted (the
      paraphrase-leak case — unit-tested for recall, not oracled);
    * a train-train exact dup pair that must NOT be flagged (precision);
    * unique fillers.

    Texts are ~60-word sentences from a fixed pool (long enough for
    char-7 shingles at the DOCS_CFG threshold)."""
    import pyarrow.parquet as pq

    d = os.path.join(root, f"{DECON_FIXTURE_VERSION}_{DECON_FIXTURE_N}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)

    def text_of(k: int) -> str:
        w = _DECON_WORDS
        return " ".join(w[(k * 7 + i * 3 + (i * i) % 11) % len(w)]
                        for i in range(60)) + f" tail{k}"

    ids, texts = [], []
    used = set()

    def add(i, t):
        ids.append(i); texts.append(t); used.add(i)

    for k in range(8):                      # exact cross leaks
        b, t = 50 * (k + 1), 50 * (k + 1) + k + 1
        add(b, text_of(k)); add(t, text_of(k))
    for k in range(8):                      # near (one-word-edit) leaks
        b, t = 50 * (k + 9), 50 * (k + 9) + k + 1
        base = text_of(100 + k)
        add(b, base)
        add(t, base.replace(" ".join(base.split()[30:31]), "changedword",
                            1))
    add(1201, text_of(900)); add(1202, text_of(900))  # train-train dup
    i = 1
    while len(ids) < DECON_FIXTURE_N:       # unique fillers, both sides
        if i not in used:
            add(i, text_of(2000 + i))
        i += 1
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["fix"] * len(ids), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    # atomic publish: a concurrent first caller must never read a torn
    # file (review finding, round 4)
    dest = os.path.join(d, "documents.parquet")
    tmp = f"{dest}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp, row_group_size=64)
    os.replace(tmp, dest)
    with open(done, "w") as f:
        f.write(DECON_FIXTURE_VERSION)
    return d


def doc_fuzzy_decontaminate_fixture_check(sf_dir: str):
    """Driver-visible invariant form of ``doc_fuzzy_decontaminate``
    (``sf_dir`` unused): runs the REAL fuzzy-decontamination op over the
    planted fixture — where cross-boundary exact leaks exist by
    construction — and reports, for every train doc the oracle can prove
    contaminated (exact text match to a bench doc), whether the op
    flagged it. All-true or the driver gate hash-fails."""
    return doc_fuzzy_decontaminate_exact_check(decon_fixture_dir())


def doc_quality_audit(sf_dir: str):
    """Table-level data-quality AUDIT — the pre-flight constraint report
    a pipeline runs before committing an ingest batch: one row per check
    with its violation count. Checks: null/empty text, n_chars
    disagreeing with length(text), lang outside the expected set,
    duplicate doc_id. Per-batch int64 partials (no row ever shuffles);
    the duplicate-id check is the one distributed piece — count(*) minus
    a distinct-id count via one narrow groupby.
    Output: (check, n_violations), sorted by check."""
    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    allowed = pa.array(["en", "de", "fr", "es", "pt", "it", "nl", "pl",
                        "ja", "zh", "ru", "ko"])

    def partial(b: pa.Table) -> pa.Table:
        text = b.column("text")
        null_or_empty = int(pc.sum(pc.cast(
            pc.or_kleene(pc.is_null(text),
                         pc.equal(pc.fill_null(text, ""), "")),
            pa.int64())).as_py() or 0)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        true_len = pc.utf8_length(pc.fill_null(text, "")).to_numpy(
            zero_copy_only=False)
        bad_len = int((nch != true_len).sum())
        lang_ok = pc.is_in(b.column("lang"), value_set=allowed)
        bad_lang = int(b.num_rows - (pc.sum(pc.cast(
            pc.fill_null(lang_ok, False), pa.int64())).as_py() or 0))
        return pa.table({
            "null_or_empty_text": pa.array([null_or_empty], pa.int64()),
            "n_chars_mismatch": pa.array([bad_len], pa.int64()),
            "unknown_lang": pa.array([bad_lang], pa.int64()),
            "n_rows": pa.array([b.num_rows], pa.int64()),
        })

    docs = read_documents(sf_dir, ["doc_id", "text", "lang", "n_chars"])
    t = to_local_table(docs.map_batches(partial, batch_format="pyarrow",
                                        zero_copy_batch=True))

    def ssum(col):
        return int(pc.sum(t.column(col)).as_py() or 0) if t is not None \
            and t.num_rows else 0

    n_rows = ssum("n_rows")
    # duplicate ids: total minus distinct (narrow int64 groupby)
    n_distinct = (read_documents(sf_dir, ["doc_id"])
                  .groupby("doc_id").aggregate(Count(alias_name="_n"))
                  .count())
    checks = {
        "duplicate_doc_id": n_rows - n_distinct,
        "n_chars_mismatch": ssum("n_chars_mismatch"),
        "null_or_empty_text": ssum("null_or_empty_text"),
        "unknown_lang": ssum("unknown_lang"),
    }
    return pa.table({
        "check": pa.array(sorted(checks), pa.string()),
        "n_violations": pa.array([checks[k] for k in sorted(checks)],
                                 pa.int64()),
    })


SIMILAR_TOPK_QUERIES = 5
SIMILAR_TOPK_K = 10


def doc_similar_topk(sf_dir: str, n_queries: int = SIMILAR_TOPK_QUERIES,
                     k: int = SIMILAR_TOPK_K,
                     cfg: "PipelineConfig | None" = None):
    """Similar-document SEARCH over text (the K1 top-k surface on the
    signature side, the text analog of ``ann_topk``): for each query doc
    (deterministically the ``n_queries`` smallest doc_ids ≡ 3 mod 7),
    the ``k`` most similar documents by estimated MinHash Jaccard
    (slot-agreement fraction), rank 1..k by (similarity DESC, doc_id
    ASC). Output: (qid, rank, doc_id, est_jaccard_e3) — all int64.

    Distributed shape: the tiny query-signature matrix is computed
    driver-side from the gathered query texts and broadcast via
    ``ray.put``; candidates stream through ONE fingerprint pass
    (one signature row per batch-local distinct content — an exact-dup
    family is represented by its rep); each batch reduces to ≤ k rows
    per query (partial top-k), and a per-qid group merge finishes. No
    pairwise shuffle at any size."""
    import ray as _ray

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        make_minhasher,
        unpack_signatures,
    )
    from fuzzy_dedupe_pipeline_ray.stages.fingerprint import shingle_set

    cfg = cfg or DOCS_CFG
    p = cfg.num_perms

    qtbl = (read_documents(sf_dir, ["doc_id", "text"])
            .map_batches(lambda b: b.filter(pa.array(
                b.column("doc_id").to_numpy() % 7 == 3)),
                batch_format="pyarrow", zero_copy_batch=True)
            .sort("doc_id").limit(n_queries).to_pandas())
    if len(qtbl) == 0:
        return pa.schema([("qid", pa.int64()), ("rank", pa.int64()),
                          ("doc_id", pa.int64()),
                          ("est_jaccard_e3", pa.int64())]).empty_table()
    hasher = make_minhasher(cfg)
    qsigs = np.stack([hasher.signature(shingle_set(t, cfg))
                      for t in qtbl["text"]])
    if cfg.sig_bits == 32:
        qsigs = (qsigs >> np.uint64(32)).astype(np.uint32)
    q_ref = _ray.put((qtbl["doc_id"].to_numpy().astype(np.int64), qsigs))

    corpus = _documents_as_corpus(sf_dir)
    sigs = fingerprint(corpus, cfg)

    def partial_topk(b: pa.Table) -> pa.Table:
        qi, qm = _ray.get(q_ref)
        m = unpack_signatures(b.column("minhash"), p)
        ids = b.column("doc_id").to_numpy()
        out = {"qid": [], "doc_id": [], "agree": []}
        kk = min(k, len(ids))
        if kk == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "agree": pa.array([], pa.int64())})
        for j in range(len(qi)):
            agree = (m == qm[j]).sum(axis=1).astype(np.int64)
            # full (agree DESC, doc_id ASC) order BEFORE truncation:
            # argpartition would keep an arbitrary member of the k-th
            # tie class, making output depend on batch boundaries
            # (review finding, round 4)
            order = np.lexsort((ids, -agree))[:kk]
            out["qid"].extend([int(qi[j])] * len(order))
            out["doc_id"].extend(ids[order].tolist())
            out["agree"].extend(agree[order].tolist())
        return pa.table({"qid": pa.array(out["qid"], pa.int64()),
                         "doc_id": pa.array(out["doc_id"], pa.int64()),
                         "agree": pa.array(out["agree"], pa.int64())})

    partials = sigs.map_batches(partial_topk, batch_format="pyarrow",
                                zero_copy_batch=True)

    def merge_topk(g: pa.Table) -> pa.Table:
        qid = g.column("qid")[0].as_py()
        ids = g.column("doc_id").to_numpy()
        agree = g.column("agree").to_numpy()
        order = np.lexsort((ids, -agree))[:k]
        return pa.table({
            "qid": pa.array([qid] * len(order), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "est_jaccard_e3": pa.array(agree[order] * 1000 // p, pa.int64()),
        })

    return partials.groupby("qid").map_groups(
        merge_topk, batch_format="pyarrow").sort(["qid", "rank"])


def doc_similar_topk_self_check(sf_dir: str):
    """Oracle-able INVARIANT over ``doc_similar_topk``: every query's
    rank-1 result must have est_jaccard_e3 = 1000 — the query's own
    content family is always among the candidates (its rep carries an
    identical signature), so a regression in the signature kernel,
    packing width, or top-k merge surfaces as a sub-1000 top hit."""
    df = doc_similar_topk(sf_dir).to_pandas()
    top1 = df[df["rank"] == 1].sort_values("qid")
    return pa.table({
        "qid": pa.array(top1["qid"].to_numpy(), pa.int64()),
        "top1_exact": pa.array(
            (top1["est_jaccard_e3"].to_numpy() == 1000)),
    })


GREP_PATTERN = r"\b(data|stream) (join|merge|scan)\b"


def doc_grep(sf_dir: str, pattern: str = GREP_PATTERN):
    """Distributed grep: per-document regex match count over the corpus
    (the ad-hoc investigation query every data team runs; also the shape
    of rule-based PII / policy scanners). Vectorized through Arrow's RE2
    kernel (`count_substring_regex`) — the same regex engine DuckDB
    links, so oracle parity is exact by construction, not by dialect
    luck. Map-only (no shuffle); docs with zero matches are filtered
    out so the output is sparse. Output: (doc_id, n_matches)."""
    def f(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(pc.fill_null(b.column("text"), ""),
                                     pattern=pattern)
        t = pa.table({"doc_id": b.column("doc_id"),
                      "n_matches": pc.cast(n, pa.int64())})
        return t.filter(pc.greater(t.column("n_matches"), 0))

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")
