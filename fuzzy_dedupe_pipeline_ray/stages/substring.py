"""Exact substring-duplicate pass (suffix-anchor blocking + per-pair
hash-verified span extension).

North-rule operator with no reference analog (nearest shape: the
reference's second-signal enrichment of candidate pairs,
``dedupe_logic/processor.py:153-166``): detect pairs where one file's
content contains a long exact span of another's (file A vendored inside
file B — FIXTURES.md kind 5), which whole-doc Jaccard misses (A inside a
3× larger B has J≈1/3).

Design (bounded memory per task — SURVEY.md §7.4 "keep it per-pair"):

1. **Blocking**: each doc's bottom-k sketch of its ``anchor_k``-char
   window hashes (computed in the fingerprint actor) explodes to
   (anchor, doc_id) rows; a groupby(anchor) emits candidate pairs — two
   docs sharing a rare 48-char window very likely share a span.
2. **Verification**: per candidate pair, binary-search the longest common
   substring length with rolling-hash set intersection, then confirm the
   winning span by direct slice equality (guards hash collisions).
   O((n+m)·log) per pair, no global suffix structure.

Scale note: contents for the (small) candidate set are fetched by a
semi-join filter over the input (broadcast of the narrow ID array when it
fits, distributed hash semi-join above that) and hash-joined onto the
candidate pairs — contents stay a Dataset end-to-end; the full content
column is never shuffled and never collected to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions import hashing as _hashing
from fuzzy_dedupe_pipeline_ray.stages.fingerprint import (
    normalize_for_shingles_array,
)
from fuzzy_dedupe_pipeline_ray.stages.identity import batch_doc_ids

SUB_EDGE_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("span_len", pa.int64()),
    ("span_frac", pa.float64()),   # span / min(len_a, len_b)
])


def anchor_candidates(signatures_ds, cfg: PipelineConfig):
    """signatures → distinct candidate (id_a, id_b) pairs sharing an anchor
    (vectorized star/all-pairs emission via lsh.grouped_pairs)."""
    def explode(b: pa.Table) -> pa.Table:
        anchors = b.column("anchors")
        doc_ids = b.column("doc_id").to_numpy()
        arr = anchors.combine_chunks() if isinstance(anchors, pa.ChunkedArray) else anchors
        lengths = pa.compute.list_value_length(arr).to_numpy(zero_copy_only=False)
        return pa.table({
            "band_key": arr.flatten(),
            "doc_id": pa.array(np.repeat(doc_ids, lengths), pa.int64()),
        })

    from fuzzy_dedupe_pipeline_ray.stages.lsh import grouped_pairs

    exploded = signatures_ds.select_columns(["doc_id", "anchors"]).map_batches(
        explode, batch_format="pyarrow")
    return grouped_pairs(exploded, cfg)


def _pack_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Two int64 id columns → one 16-byte fixed string per pair (so the
    pair set is np.isin-able as a single vectorized membership test)."""
    return np.ascontiguousarray(
        np.column_stack([a, b]).astype("<i8")).view("|S16").ravel()


def anti_join_pairs(pairs_ds, exclude_ds, cfg: PipelineConfig):
    """pairs − exclude on (id_a, id_b).

    Small exclude sets (≤ cfg.broadcast_max_rows — always at test scale)
    are broadcast once and filtered with a vectorized np.isin on packed
    16-byte pair keys; larger sets fall back to a marker left-outer hash
    join (the scale path)."""
    import ray
    import pyarrow.compute as pc

    from fuzzy_dedupe_pipeline_ray.sources.io import hash_join

    exclude_ds = exclude_ds.materialize()
    if exclude_ds.count() <= cfg.broadcast_max_rows:
        # pack+sort OFF-DRIVER: the exclude set is already in plasma as
        # blocks; one task builds the sorted 16-byte key array and its
        # result ref is broadcast — the driver never touches the rows
        # (was a flat ~0.7 s driver term at ~550k exclude pairs).
        def _pack_sorted(block_refs):
            from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

            tune_allocator()
            blocks = [t for t in ray.get(list(block_refs)) if t.num_rows]
            if not blocks:
                return np.empty(0, dtype="|S16")
            return np.sort(_pack_pairs(
                np.concatenate([b.column("id_a").to_numpy()
                                for b in blocks]),
                np.concatenate([b.column("id_b").to_numpy()
                                for b in blocks])))

        ref = ray.remote(_pack_sorted).remote(
            list(exclude_ds.to_arrow_refs()))

        def filt(b: pa.Table) -> pa.Table:
            ex = ray.get(ref)
            if b.num_rows == 0 or len(ex) == 0:
                return b
            keys = _pack_pairs(b.column("id_a").to_numpy(),
                               b.column("id_b").to_numpy())
            pos = np.searchsorted(ex, keys)
            pos = np.minimum(pos, len(ex) - 1)
            seen = ex[pos] == keys
            return b.take(pa.array(np.flatnonzero(~seen)))

        return pairs_ds.map_batches(filt, batch_format="pyarrow",
                                    zero_copy_batch=True)

    # Above the broadcast gate: distributed SORT-based anti-join by
    # default — the same range-sort + per-block overlap probing shape as
    # sources/io.merge_join, with the broadcast path's np.searchsorted
    # membership kernel. The previous fallback (marker groupby +
    # left-outer hash join) spun up TWO aggregator actor pools and cost
    # ~4 s on a 102k-row exclude set in forced mode (round-5 profile);
    # the sorted tier moves the same narrow 16 B rows through one range
    # sort per side. The hash tier stays selectable via
    # cfg.extra['anti_join_impl'] = 'hash' as the equivalence baseline
    # (tests/test_stages.py::test_anti_join_tiers_equivalent).
    if (cfg.extra or {}).get("anti_join_impl") != "hash":
        return _sorted_anti_join_pairs(pairs_ds, exclude_ds, cfg)

    marked = exclude_ds.map_batches(
        lambda b: pa.table({
            "id_a": b.column("id_a"), "id_b": b.column("id_b"),
            "_seen": pa.array(np.ones(b.num_rows, dtype=np.int8), pa.int8()),
        }), batch_format="pyarrow")
    from ray.data.aggregate import Max

    marked = marked.groupby(["id_a", "id_b"]).aggregate(
        Max("_seen", alias_name="_seen"))
    joined = hash_join(pairs_ds, marked, on=("id_a", "id_b"),
                       join_type="left_outer", cfg=cfg)
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_seen"))).select(
            ["id_a", "id_b"]),
        batch_format="pyarrow")


def _aj_range(tbl: pa.Table):
    """Ray task: ((first id_a, first id_b), (last id_a, last id_b)) of a
    (id_a, id_b)-sorted block, or None when empty — lexicographic tuple
    ranges for the anti-join's block-overlap test."""
    if tbl.num_rows == 0:
        return None
    a, b = tbl.column("id_a"), tbl.column("id_b")
    return ((a[0].as_py(), b[0].as_py()), (a[-1].as_py(), b[-1].as_py()))


def _aj_probe(ltbl: pa.Table, *rtbls):
    """Ray task: drop left rows whose (id_a, id_b) appears in any
    overlapping right block (same packed-key searchsorted membership as
    the broadcast filter; left payload columns ride along)."""
    if ltbl.num_rows == 0 or not rtbls:
        return ltbl
    keys = _pack_pairs(ltbl.column("id_a").to_numpy(),
                       ltbl.column("id_b").to_numpy())
    ex = np.sort(np.concatenate([
        _pack_pairs(r.column("id_a").to_numpy(),
                    r.column("id_b").to_numpy()) for r in rtbls]))
    pos = np.minimum(np.searchsorted(ex, keys), len(ex) - 1)
    seen = ex[pos] == keys
    return ltbl.take(pa.array(np.flatnonzero(~seen)))


def _sorted_anti_join_pairs(pairs_ds, exclude_ds, cfg: PipelineConfig):
    """Distributed sort-based anti-join on (id_a, id_b): range-sort both
    sides, each left block probes only the right blocks whose pair range
    overlaps its own. Narrow 16 B keys — one sort per side, no
    aggregator actors (see anti_join_pairs)."""
    import ray
    import ray.data as rd

    ls = pairs_ds.sort(["id_a", "id_b"]).materialize()
    l_refs = list(ls.to_arrow_refs())
    if not l_refs:
        return ls
    rs = exclude_ds.sort(["id_a", "id_b"]).materialize()
    r_refs = list(rs.to_arrow_refs())
    rng = ray.remote(_aj_range)
    l_rngs = ray.get([rng.remote(r) for r in l_refs])
    r_rngs = ray.get([rng.remote(r) for r in r_refs])
    probe = ray.remote(_aj_probe)
    out = []
    for i, lr in enumerate(l_rngs):
        if lr is None:
            continue
        llo, lhi = lr
        overl = [r_refs[j] for j, rr in enumerate(r_rngs)
                 if rr is not None and not (rr[1] < llo or rr[0] > lhi)]
        out.append(probe.remote(l_refs[i], *overl))
    if not out:
        return ls
    return rd.from_arrow_refs(out)


#: rolling-hash base: hashing.py's FNV prime (odd → invertible mod 2^64);
#: the power tables come from hashing.py's per-worker cache.


class _RollState:
    """O(n) one-time prep for O(n)-per-probe rolling window hashes.

    With S[i] = Σ_{j<i} byte[j]·B^{-j} (uint64 wraparound; B odd so B^{-1}
    exists mod 2^64), the hash of the L-window at i is
    (S[i+L] − S[i])·B^{i+L-1} — fully vectorized, no O(n·L) window matrix.
    """

    @_hashing._wrap_errstate
    def __init__(self, text: str):
        from fuzzy_dedupe_pipeline_ray.functions.hashing import (
            inv_prime_powers,
            prime_powers,
        )

        b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        self.text = text
        self.n = len(b)
        s = np.zeros(self.n + 1, dtype=np.uint64)
        if self.n:
            # power tables are per-worker cached READ-ONLY views (_B is
            # the same FNV prime hashing.py caches) — only the
            # data-dependent cumsum is paid per doc
            np.cumsum(b.astype(np.uint64) * inv_prime_powers(self.n),
                      out=s[1:])
        self.s = s
        self.bpow = prime_powers(self.n + 1)

    @_hashing._wrap_errstate
    def window_hashes(self, L: int) -> np.ndarray:
        """uint64 hash of every L-byte window (empty if n < L)."""
        if L > self.n or L <= 0:
            return np.empty(0, dtype=np.uint64)
        return ((self.s[L:] - self.s[:-L])
                * self.bpow[L - 1: self.n])


def _has_common_sorted(ha_s: np.ndarray, hb_s: np.ndarray) -> bool:
    """Emptiness test for two SORTED uint64 hash arrays via searchsorted
    membership — O(min sort already paid + (n+m)·log) with no
    concatenate-argsort. ``np.intersect1d`` (even ``assume_unique``)
    argsorts the CONCATENATION per call; the reject path was a profiled
    40% of the substring kernel (723k argsorts / 80k pairs)."""
    if len(ha_s) > len(hb_s):
        ha_s, hb_s = hb_s, ha_s
    if not len(ha_s):
        return False
    pos = np.searchsorted(hb_s, ha_s)
    np.minimum(pos, len(hb_s) - 1, out=pos)
    return bool((hb_s[pos] == ha_s).any())


def longest_common_span(a: str, b: str, min_len: int,
                        ra: "_RollState | None" = None,
                        rb: "_RollState | None" = None,
                        ) -> "tuple[int, int, int]":
    """(span_len, start_a, start_b) of the longest common substring if it is
    ≥ min_len, else (0, -1, -1). Rolling-hash binary search (O(n log n))
    with direct slice-equality confirmation (hash-collision guard).

    Byte-level spans (utf-8); inputs here are the ws-normalized contents,
    effectively ASCII for source code. ``ra``/``rb``: optional prebuilt
    roll states for ``a``/``b`` (the batch verifier caches one per doc —
    docs recur across many candidate pairs)."""
    if not a or not b:
        return 0, -1, -1
    if len(a) > len(b):
        n, sa, sb = _lcs_inner(b, a, min_len, rb, ra)
        return n, sb, sa
    return _lcs_inner(a, b, min_len, ra, rb)


def _lcs_inner(a: str, b: str, min_len: int,
               ra: "_RollState | None" = None,
               rb: "_RollState | None" = None) -> "tuple[int, int, int]":
    # fast path: full containment (C-speed substring search)
    if len(a) >= min_len:
        pos = b.find(a)
        if pos >= 0:
            return len(a), 0, pos

    ra = ra if ra is not None else _RollState(a)
    rb = rb if rb is not None else _RollState(b)

    def probe(L: int) -> "tuple[int, int] | None":
        ha = ra.window_hashes(L)
        hb = rb.window_hashes(L)
        if not len(ha) or not len(hb):
            return None
        # ONE argsort of the smaller side gives both the membership test
        # and the match indices — np.intersect1d argsorted the
        # CONCATENATION plus two unique passes per probe (a profiled
        # ~60% of the span kernel; anchor-blocked pairs make HIT probes
        # the common case, so the index path must be cheap too)
        if len(ha) <= len(hb):
            small, big, swapped = ha, hb, False
        else:
            small, big, swapped = hb, ha, True
        ord_s = np.argsort(small, kind="stable")
        ss = small[ord_s]
        pos = np.searchsorted(ss, big)
        np.minimum(pos, len(ss) - 1, out=pos)
        cand = np.flatnonzero(ss[pos] == big)
        for j in cand:
            i, jj = int(ord_s[pos[j]]), int(j)
            ia_, ib_ = (jj, i) if swapped else (i, jj)
            if a[ia_:ia_ + L] == b[ib_:ib_ + L]:  # collision guard
                return ia_, ib_
        return None

    # short-circuit: if no common window of exactly min_len exists, no
    # longer span can either — one probe rejects the (majority)
    # non-matching candidates instead of a full failed binary search
    first = probe(min_len)
    if first is None:
        return 0, -1, -1
    best = (min_len, *first)
    # exponential bracketing from the min window, then binary search
    # inside the bracket: spans near min_len (the common case) resolve in
    # ~2-4 probes instead of log2(len_a - min_len); containment-sized
    # spans pay the same probe count as a plain binary search. Identical
    # result (the search invariant — largest L with a common window — is
    # unchanged; exactness is pinned by the brute-force property test).
    hi = len(a)
    L = min_len
    while L < hi:
        L2 = min(2 * L, hi)
        hit = probe(L2)
        if hit is not None:
            best = (L2, *hit)
            L = L2
        else:
            hi = L2 - 1
            break
    lo = best[0] + 1
    while lo <= hi:
        mid = (lo + hi) // 2
        hit = probe(mid)
        if hit is not None:
            best = (mid, *hit)
            lo = mid + 1
        else:
            hi = mid - 1
    return best


def _suffix_array_doubling(s: np.ndarray):
    """Prefix-doubling suffix array over an int array (O(n log² n), all
    numpy lexsorts — Manber–Myers). Returns (sa, levels) where levels is
    [(2^t, rank_t int32)]: rank_t[i] compares s[i:i+2^t] exactly for
    in-bounds windows — the longest-common-extension structure the LCS
    scan needs (no sequential Kasai pass, so the whole pipeline stays
    vectorized)."""
    n = len(s)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    levels = [(1, rank.astype(np.int32))]
    if n == 1:
        return np.zeros(1, np.int64), levels
    k = 1
    while True:
        rank2 = np.full(n, -1, np.int64)
        rank2[:n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        newr = np.empty(n, np.int64)
        newr[order[0]] = 0
        diff = ((rank[order[1:]] != rank[order[:-1]])
                | (rank2[order[1:]] != rank2[order[:-1]]))
        newr[order[1:]] = np.cumsum(diff)
        rank = newr
        k *= 2
        levels.append((k, rank.astype(np.int32)))
        if rank[order[-1]] == n - 1 or k >= n:
            return order, levels


def _lce_pairs(i: np.ndarray, j: np.ndarray, levels, n: int) -> np.ndarray:
    """Vectorized longest common extension for position-pair ARRAYS via
    the doubling ranks: greedy descent over powers of two (any LCE value
    below the top stored level decomposes into available powers)."""
    i = i.astype(np.int64).copy()
    j = j.astype(np.int64).copy()
    out = np.zeros(len(i), np.int64)
    for length, r in reversed(levels):
        eq = (i + length <= n) & (j + length <= n)
        idx = np.flatnonzero(eq)
        if not len(idx):
            continue
        hit = idx[r[i[idx]] == r[j[idx]]]
        out[hit] += length
        i[hit] += length
        j[hit] += length
    return out


def lcs_suffix_array(a: str, b: str, min_len: int) -> "tuple[int, int, int]":
    """(span_len, start_a, start_b) of the longest common substring if
    ≥ min_len, else (0, -1, -1) — the ``longest_common_span`` contract
    via a suffix array over ``a ⊕ sep ⊕ b`` (the north rule's
    suffix-array pass, selected with ``span_kernel="suffix_array"``).

    The classic reduction: the max LCP between an a-suffix and a
    b-suffix is attained at some ADJACENT cross-part pair in suffix
    order (any in-between suffix bounds the range minimum from below),
    so one vectorized LCE over the n-1 adjacent pairs finds the LCS.
    Code points (utf-32) not bytes, so indices match the rolling-hash
    kernel's str slicing; the separator 0x110000 is outside Unicode, so
    no cross-part extension can run through it."""
    if not a or not b:
        return 0, -1, -1
    ca = np.frombuffer(a.encode("utf-32-le"), np.uint32).astype(np.int64)
    cb = np.frombuffer(b.encode("utf-32-le"), np.uint32).astype(np.int64)
    na = len(ca)
    s = np.concatenate([ca, np.array([0x110000], np.int64), cb])
    n = len(s)
    sa, levels = _suffix_array_doubling(s)
    i, j = sa[:-1], sa[1:]
    cross = (i < na) != (j < na)
    ii, jj = i[cross], j[cross]
    if not len(ii):
        return 0, -1, -1
    lcps = _lce_pairs(ii, jj, levels, n)
    best = int(np.argmax(lcps))
    span = int(lcps[best])
    if span < min_len:
        return 0, -1, -1
    x, y = int(ii[best]), int(jj[best])
    if x >= na:
        x, y = y, x
    return span, x, y - na - 1


def _best_span(a: str, b: str, cfg: PipelineConfig,
               ra: "_RollState | None" = None,
               rb: "_RollState | None" = None) -> int:
    """Kernel dispatch for the per-pair span search (config knob
    ``span_kernel``); both return the same span_len by construction."""
    if cfg.span_kernel == "suffix_array":
        return lcs_suffix_array(a, b, cfg.min_substring_span)[0]
    return longest_common_span(a, b, cfg.min_substring_span,
                               ra=ra, rb=rb)[0]


def verify_span_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Stateless per-pair span verification over a batch that CARRIES its
    content columns (id_a, id_b, content_a, content_b) — no global content
    map, no driver-held state.

    Cheap vectorized pre-filter: a common span ≥ ``min_substring_span``
    needs BOTH contents at least that long — short-member pairs skip the
    rolling-hash search entirely."""
    import pyarrow.compute as pc

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()  # worker-process heap retention (BASELINE.md)

    min_len = pc.min_element_wise(
        pc.binary_length(pc.fill_null(batch.column("content_a"), "")),
        pc.binary_length(pc.fill_null(batch.column("content_b"), "")))
    batch = batch.filter(
        pc.greater_equal(min_len, cfg.min_substring_span))
    out = {k: [] for k in ("id_a", "id_b", "span_len", "span_frac")}
    # Per-doc caches: candidate docs recur across many pairs of a batch
    # (pairs arrive sorted by (id_a, id_b)), so the O(n) roll-state prep
    # and the min-window hash SET are built once per doc, not per pair.
    # The sorted-unique min-window sets give a certain-reject pre-probe:
    # rolling hashes are deterministic, so a shared span ≥ min_len implies
    # a shared window hash — an empty intersection rejects the (majority)
    # non-matching pairs without touching the binary search. Collisions
    # only create false candidates, which the full search then re-checks
    # with its slice-equality guard.
    span_w = cfg.min_substring_span
    states: "dict[int, _RollState]" = {}
    probes: "dict[int, np.ndarray]" = {}

    def doc_state(i: int, s: str) -> _RollState:
        st = states.get(i)
        if st is None:
            st = states[i] = _RollState(s)
        return st

    def doc_probe(i: int, st: _RollState) -> np.ndarray:
        h = probes.get(i)
        if h is None:
            h = probes[i] = np.unique(st.window_hashes(span_w))
        return h

    for ida, idb, a, b in zip(batch.column("id_a").to_pylist(),
                              batch.column("id_b").to_pylist(),
                              batch.column("content_a").to_pylist(),
                              batch.column("content_b").to_pylist()):
        if a is None or b is None:
            continue
        ra, rb = doc_state(ida, a), doc_state(idb, b)
        ha, hb = doc_probe(ida, ra), doc_probe(idb, rb)
        if not _has_common_sorted(ha, hb):
            continue
        span = _best_span(a, b, cfg, ra=ra, rb=rb)
        if span >= cfg.min_substring_span:
            out["id_a"].append(ida)
            out["id_b"].append(idb)
            out["span_len"].append(span)
            out["span_frac"].append(span / max(1, min(len(a), len(b))))
    return pa.table({
        "id_a": pa.array(out["id_a"], pa.int64()),
        "id_b": pa.array(out["id_b"], pa.int64()),
        "span_len": pa.array(out["span_len"], pa.int64()),
        "span_frac": pa.array(out["span_frac"], pa.float64()),
    }, schema=SUB_EDGE_SCHEMA)


#: per-worker cache for the fused broadcast-verify kernel, keyed by the
#: contents ObjectRef hex: (keys, content_col, lengths, doc_cache) where
#: doc_cache maps content-table ROW -> (str, _RollState, probe_hashes).
#: Docs recur across MANY pair batches (anchor blocking), so the O(n)
#: roll-state/probe prep and the Python-string materialization happen
#: once per doc per WORKER, not once per pair — the column-carrying
#: design gathered ~2 KB of content copies per pair, a page mass that
#: ANTI-scaled 284→317 s from 8 to 32 CPUs on the 4× corpus.
_SPAN_BC_CACHE: dict = {}
_SPAN_DOC_CACHE_MAX = 16384


def _span_bc_lookup(ref):
    import ray

    key = ref.hex()
    hit = _SPAN_BC_CACHE.get(key)
    if hit is None:
        import pyarrow.compute as pc

        tbl, on = ray.get(ref)
        keys = tbl.column(on).combine_chunks()
        content = tbl.column("norm_content").combine_chunks()
        lengths = pc.binary_length(content).to_numpy().astype(np.int64)
        _SPAN_BC_CACHE.clear()  # one contents table per run
        _SPAN_BC_CACHE[key] = hit = (keys, content, lengths, {})
    return hit


def verify_span_pairs_bc(batch: pa.Table, cfg: PipelineConfig,
                         contents_ref) -> pa.Table:
    """Fused content-lookup + span verification over a PAIR-ONLY batch
    (id_a, id_b) against the shared broadcast contents table. Length
    pre-filter runs on the cached lengths array (no string touched for
    rejected pairs); surviving pairs resolve contents once per distinct
    doc via the worker-level cache. Output is identical to
    ``verify_span_batch`` over the column-carrying join (same pair
    order, same decisions)."""
    import pyarrow.compute as pc

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    keys, content, lengths, doc_cache = _span_bc_lookup(contents_ref)
    out = {k: [] for k in ("id_a", "id_b", "span_len", "span_frac")}

    def empty():
        return pa.table({
            "id_a": pa.array(out["id_a"], pa.int64()),
            "id_b": pa.array(out["id_b"], pa.int64()),
            "span_len": pa.array(out["span_len"], pa.int64()),
            "span_frac": pa.array(out["span_frac"], pa.float64()),
        }, schema=SUB_EDGE_SCHEMA)

    if batch.num_rows == 0:
        return empty()
    pos_a = pc.fill_null(pc.index_in(batch.column("id_a"),
                                     value_set=keys), -1)
    pos_b = pc.fill_null(pc.index_in(batch.column("id_b"),
                                     value_set=keys), -1)
    ia = pos_a.to_numpy(zero_copy_only=False).astype(np.int64)
    ib = pos_b.to_numpy(zero_copy_only=False).astype(np.int64)
    span_w = cfg.min_substring_span
    ok = (ia >= 0) & (ib >= 0)
    sel = np.flatnonzero(ok)
    sel = sel[(lengths[ia[sel]] >= span_w) & (lengths[ib[sel]] >= span_w)]
    if not len(sel):
        return empty()
    id_a = batch.column("id_a").to_numpy()
    id_b = batch.column("id_b").to_numpy()

    def doc(row: int):
        d = doc_cache.get(row)
        if d is None:
            if len(doc_cache) >= _SPAN_DOC_CACHE_MAX:
                doc_cache.clear()
            s = content[row].as_py()
            st = _RollState(s)
            doc_cache[row] = d = (s, st,
                                  np.unique(st.window_hashes(span_w)))
        return d

    for i in sel:
        a, ra, ha = doc(int(ia[i]))
        b, rb, hb = doc(int(ib[i]))
        if not _has_common_sorted(ha, hb):
            continue
        span = _best_span(a, b, cfg, ra=ra, rb=rb)
        if span >= span_w:
            out["id_a"].append(int(id_a[i]))
            out["id_b"].append(int(id_b[i]))
            out["span_len"].append(span)
            out["span_frac"].append(span / max(1, min(len(a), len(b))))
    return empty()


def _candidate_contents(files_ds, pairs, cfg: PipelineConfig, remap=None):
    """Distinct candidate doc ids (from both pair columns) → Dataset of
    (doc_id, norm_content) for exactly those docs.

    The ID set (narrow int64, NOT contents) is broadcast as one sorted
    array when it fits ``cfg.broadcast_max_rows`` and the input is
    filtered with a vectorized searchsorted membership test; above the
    gate the filter is a distributed hash semi-join. Contents stay a
    Dataset end-to-end — never a driver-side dict."""
    import ray
    from ray.data.aggregate import Count

    from fuzzy_dedupe_pipeline_ray.sources.io import hash_join, to_local_table

    pairs = pairs.materialize()
    wanted = None
    ids_ds = None
    if pairs.count() <= cfg.broadcast_max_rows:
        # narrow pairs fit the broadcast budget: distinct ids locally
        # (np.unique) instead of paying a groupby shuffle's fixed cost
        ptbl = to_local_table(pairs)
        wanted = np.unique(np.concatenate(
            [ptbl.column("id_a").to_numpy(), ptbl.column("id_b").to_numpy()]))
    else:
        ids_raw = pairs.map_batches(
            lambda b: pa.table({"doc_id": pa.concat_arrays(
                [b.column("id_a").combine_chunks(),
                 b.column("id_b").combine_chunks()])}),
            batch_format="pyarrow").materialize()
        if ids_raw.count() <= 4 * cfg.broadcast_max_rows:
            # the distinct ID set may still fit the broadcast gate —
            # worth one groupby to find out
            dds = (ids_raw.groupby("doc_id")
                   .aggregate(Count(alias_name="_n"))
                   .select_columns(["doc_id"]).materialize())
            if dds.count() <= cfg.broadcast_max_rows:
                wanted = np.sort(
                    to_local_table(dds).column("doc_id").to_numpy())
            else:
                ids_ds = dds
        else:
            # truly above gate: the Bloom path below needs no distinct
            # (duplicate ids set the same bits; the count only sizes m)
            ids_ds = ids_raw

    def norm_table(doc_ids: np.ndarray, contents) -> pa.Table:
        # Arrow-native whitespace collapse — the SAME normalization the
        # fingerprint stage applies before shingling/anchoring, without
        # re-building every content string in Python (VERDICT r3 #1b)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "norm_content": normalize_for_shingles_array(contents, cfg),
        })

    if wanted is not None:
        wanted_ref = ray.put(wanted)

        def gather(batch: pa.Table) -> pa.Table:
            w = ray.get(wanted_ref)
            doc_ids, _ = batch_doc_ids(batch, cfg, remap)
            empty = pa.array([], pa.string())
            if len(w) == 0:
                return norm_table(np.empty(0, np.int64), empty)
            pos = np.minimum(np.searchsorted(w, doc_ids), len(w) - 1)
            kept = np.flatnonzero(w[pos] == doc_ids)
            if not len(kept):
                return norm_table(np.empty(0, np.int64), empty)
            contents = batch.column("content").take(pa.array(kept))
            return norm_table(doc_ids[kept], contents)

        return files_ds.map_batches(gather, batch_format="pyarrow",
                                    zero_copy_batch=True)

    # scale path (round 5): derive doc_id per batch, BLOOM-semi-filter
    # the wide content stream against the candidate id set — the filter
    # is built distributed from the id blocks and broadcasts at sizes
    # the id table cannot, and the content bytes never enter a shuffle
    # (the previous hash semi-join moved the whole content stream
    # through aggregator actors). The ~0.04% false positives only PAD
    # the gathered content table — by contract extra rows are resident
    # but never verified (pairs address contents by id; non-candidate
    # ids match no pair), so no exact join is needed behind the filter.
    def with_ids(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(batch_doc_ids(batch, cfg, remap)[0],
                               pa.int64()),
            "content": batch.column("content"),
        })

    from fuzzy_dedupe_pipeline_ray.sources.io import bloom_semi_filter

    keyed = files_ds.map_batches(with_ids, batch_format="pyarrow",
                                 zero_copy_batch=True)
    near = bloom_semi_filter(keyed, ids_ds, on="doc_id", cfg=cfg)
    return near.map_batches(
        lambda b: norm_table(b.column("doc_id").to_numpy(),
                             b.column("content")),
        batch_format="pyarrow")


def substring_prep(files_ds, signatures_ds, cfg: PipelineConfig,
                   remap=None):
    """The signature-only HEAD of the substring pass: anchor-blocked
    candidate pairs + the gathered normalized contents for their doc set.
    Depends on nothing but signatures + files, so the driver runs it
    CONCURRENTLY with the fuzzy verify stage (dedupe.py) — at 32 CPUs
    these ~2-3 s of fixed-shape work otherwise sit serially on the
    critical path. The content set is gathered for the PRE-anti-join
    pair set (a slight superset of what the post-anti-join gather would
    fetch — extra rows only pad the byte-gated content broadcast, never
    the verification work)."""
    import ray

    pairs_pre = anchor_candidates(signatures_ds, cfg).materialize()
    if pairs_pre.count() == 0:
        return pairs_pre, None
    contents = _candidate_contents(files_ds, pairs_pre, cfg,
                                   remap=remap).materialize()
    return pairs_pre, contents


def substring_edges(files_ds, signatures_ds, cfg: PipelineConfig,
                    exclude_pairs=None, remap=None, prep=None,
                    restrict_ids=None):
    """files + signatures → substring-duplicate edge Dataset (SUB_EDGE_SCHEMA).

    ``exclude_pairs``: pairs already linked by the exact/fuzzy passes —
    anti-joined out before the expensive per-pair span verification (they
    add no connectivity).

    ``restrict_ids``: optional sorted int64 doc-id array (or an ObjectRef
    to one) — only candidate pairs with at least one endpoint in the set
    are verified. The incremental pipeline passes the NEW doc ids here so
    old×old candidates (whose outcome the base run's edges already
    record) are never re-verified.

    Contents for the (small, rare-anchor-blocked) candidate set are
    gathered as a DATASET via a semi-join filter over the input, then
    joined onto the pairs — each verification batch carries its own
    ``content_a``/``content_b`` columns. The content join is gated on the
    dedicated WIDE-row budget (``cfg.wide_broadcast_max_rows``): under it
    the contents table is broadcast once and probed per batch; above it
    both joins run as distributed hash joins, so broadcast memory is
    bounded by config, never by anchor luck. No driver-side content dict.
    """
    import ray

    contents = None
    if prep is not None:  # head precomputed concurrently with fuzzy
        pairs, contents = prep
    else:
        pairs = anchor_candidates(signatures_ds, cfg)
    if exclude_pairs is not None:
        pairs = anti_join_pairs(pairs, exclude_pairs, cfg)
    if restrict_ids is not None:
        from fuzzy_dedupe_pipeline_ray.sources.io import filter_pairs_touching

        rid_ref = (restrict_ids if isinstance(restrict_ids, ray.ObjectRef)
                   else ray.put(restrict_ids))
        pairs = filter_pairs_touching(pairs, rid_ref)
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(SUB_EDGE_SCHEMA.empty_table())

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    if contents is None:
        contents = _candidate_contents(files_ds, pairs, cfg,
                                       remap=remap).materialize()
    n_contents = contents.count()
    # contents are WIDE rows: gate the broadcast fast path on BYTES (the
    # materialized size is known here) — the plasma broadcast is one
    # SHARED mmap copy and per-batch lookups gather only their own rows,
    # so bytes bound the residency, not rows. (The row-proxy gate tripped
    # at ~281k candidate docs on the 2× scale corpus and pushed both wide
    # joins onto distributed hash joins: substring stage 27 → 151 s.)
    def _gate(c):
        try:
            return c.size_bytes() <= cfg.wide_broadcast_max_bytes
        except Exception:  # noqa: BLE001 — fall back to the row proxy
            return c.count() <= cfg.wide_broadcast_max_rows

    broadcast_ok = _gate(contents)
    if (not broadcast_ok and prep is not None
            and (cfg.wide_broadcast_max_bytes or
                 cfg.wide_broadcast_max_rows)):
        # The overlapped head gathered contents for the PRE-anti-join pair
        # superset; gating on that superset could push a run onto the
        # distributed tier that the post-anti-join set (what serial mode
        # gates on) would broadcast — tier selection must depend on data,
        # not on whether the prep overlap ran. Re-gather for the surviving
        # pairs and re-evaluate once. (Skipped when the gates are forced
        # to 0 — no gather can flip that decision.)
        contents = _candidate_contents(files_ds, pairs, cfg,
                                       remap=remap).materialize()
        n_contents = contents.count()
        broadcast_ok = _gate(contents)
    if broadcast_ok:
        # FUSED path: pair-only batches against ONE shared plasma copy of
        # the contents table — the verification kernel resolves contents
        # per DISTINCT doc through a worker-level cache instead of
        # materializing ~2 KB of content columns per pair (that page mass
        # anti-scaled 284→317 s, 8→32 CPUs, on the 4× corpus). Larger
        # batches amortize the doc cache; pairs are 16 B/row so 4096-pair
        # tasks stay tiny.
        import ray

        from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

        ctbl = to_local_table(contents)
        if ctbl is None or ctbl.num_rows == 0:
            return ray.data.from_arrow(SUB_EDGE_SCHEMA.empty_table())
        cref = ray.put((ctbl, "doc_id"))
        cfg_local = cfg
        return pairs.map_batches(
            lambda b: verify_span_pairs_bc(b, cfg_local, cref),
            batch_format="pyarrow",
            batch_size=4096,
        )

    # 100 TB tier: distributed content joins + the column-carrying kernel
    ca = contents.rename_columns({"doc_id": "id_a",
                                  "norm_content": "content_a"})
    cb = contents.rename_columns({"doc_id": "id_b",
                                  "norm_content": "content_b"})
    with_content = lookup_join(pairs, ca, on="id_a", cfg=cfg,
                               right_count=n_contents, gate_rows=0)
    with_content = lookup_join(with_content, cb, on="id_b", cfg=cfg,
                               right_count=n_contents, gate_rows=0)

    # Stateless task pool, not actors: per-pair span verification is
    # sub-millisecond (rolling-hash LCS), so elastic tasks over small
    # batches beat an autoscaling actor pool whose spin-up dominates.
    # Batch size trades task granularity against per-doc cache reuse in
    # verify_span_batch (pairs arrive sorted, docs recur across pairs);
    # 1024 pairs × 2 × ~KB contents stays ~MBs per task.
    return with_content.map_batches(
        lambda b: verify_span_batch(b, cfg),
        batch_format="pyarrow",
        batch_size=1024,
    )
