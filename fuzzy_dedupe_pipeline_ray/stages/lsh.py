"""LSH banding: signature → band keys → groupby(band) → candidate pairs.

Replaces the reference's global FAISS self-kNN
(``dedupe_logic/processor.py:120-150``): instead of one in-memory index
probed per record, candidate generation is a shuffle — each signature
explodes into ``num_bands`` (band_key, doc_id) rows; docs sharing a band
key (= identical MinHash rows in that band) are candidates
(``groupby(band_key).map_groups`` emits canonical id_a<id_b pairs — the
reference's ``i >= j_idx: continue``, ``processor.py:142-143``).

Skew handling (north rule): a band group larger than
``band_group_pair_cap`` is *star-paired* against its min doc_id instead of
all-pairs. Connectivity within the band group is preserved (every member
links to the pivot) while pair fan-out stays linear — a 10k-strong hot
band (license blobs) emits 10k edges, not 50M. Groups at or below the cap
emit all pairs (maximum recall where it's affordable).

Recall caveat of star-pairing: the pivot edges are still subject to the
downstream verification threshold (``stages/verify.py``). Two members of
an over-cap band that are similar to each other but NOT to the min-id
pivot can lose connectivity when their pivot edges score below the
Jaccard gate. In practice over-cap bands are near-identical blobs (the
skew fixture family keeps ≥0.99 recall — ``tests/test_pipeline_e2e.py``),
but recall above the cap is best-effort by design; raise
``band_group_pair_cap`` where exactness matters more than fan-out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions.hashing import (
    band_keys_batch,
    unpack_signatures,
)

PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def explode_bands(cfg_json: str):
    cfg = PipelineConfig.from_json(cfg_json)

    def fn(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        if m == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        sigs = unpack_signatures(batch.column("minhash"), cfg.num_perms)
        keys = band_keys_batch(sigs, cfg.num_bands, cfg.rows_per_band)  # (m, b)
        doc_ids = batch.column("doc_id").to_numpy()
        return pa.table({
            "band_key": pa.array(keys.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(doc_ids, cfg.num_bands), pa.int64()),
        })

    return fn


def _emit_pairs(group: pa.Table, cap: int) -> pa.Table:
    """Reference helper (kept for unit tests / small inline use): pairs for
    ONE band group — all-pairs ≤ cap, star-pairing above."""
    ids = np.unique(group.column("doc_id").to_numpy())
    n = len(ids)
    if n < 2:
        return PAIR_SCHEMA.empty_table()
    if n <= cap:
        ia, ib = np.triu_indices(n, k=1)
        a, b = ids[ia], ids[ib]
    else:
        # star-pairing: pivot = min id (ids is sorted by np.unique)
        a = np.full(n - 1, ids[0], dtype=np.int64)
        b = ids[1:]
    return pa.table({"id_a": pa.array(a, pa.int64()),
                     "id_b": pa.array(b, pa.int64())}, schema=PAIR_SCHEMA)


def distinct_pairs(pairs_ds):
    """Distinct (id_a, id_b) via a hash aggregate — the analog of the
    reference's ``processed_pairs`` set (``processor.py:134,144-147``) as a
    shuffle. Aggregate (C path), NOT map_groups: a per-group Python
    callback across millions of pair-groups dominates wall time."""
    from ray.data.aggregate import Count

    return (pairs_ds.groupby(["id_a", "id_b"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["id_a", "id_b"]))


def grouped_pairs(keyed_ds, cfg: PipelineConfig, key: str = "band_key"):
    """(key, doc_id) rows → candidate (id_a, id_b) pairs, fully vectorized
    (no per-group Python callbacks — a Python call per band group across
    millions of groups dominates wall time; so does Ray's ``Unique``
    aggregate, which is per-group internally):

    1. ``groupby(key).aggregate(Count, Min(doc_id))`` — group size + pivot
       (C-path hash aggregate).
    2. hash-join sizes back onto the rows.
    3. big groups (> cap): STAR pairs (pivot, member) — vectorized filter;
       linear fan-out for hot bands (skew blobs), connectivity preserved.
    4. small groups (2..cap): key SELF-JOIN + ``id_a < id_b`` filter —
       all-pairs with fan-out bounded by cap.
    5. distinct via hash aggregate (pairs recur across ~all bands for
       near-identical docs).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join, to_local_table

    cap = cfg.band_group_pair_cap

    # Small-side fast paths: when the exploded (key, doc_id) table fits
    # the broadcast budget (≤ broadcast_max_rows ⇒ ≤ ~256 MB), the pairs
    # come from vectorized numpy passes — Ray's groupby/shuffle fixed
    # costs dwarf the actual work at this size. Below
    # ``band_driver_max_rows`` it is ONE driver pass; above that the key
    # space is hash-sliced across parallel Ray tasks (scales with CPUs
    # and keeps each task's page-fault working set small — perf.py). The
    # distributed path below is the 100 TB shape (exercised by tests via
    # a tiny threshold).
    keyed_mat = keyed_ds.materialize()
    n_rows = keyed_mat.count()
    if n_rows <= cfg.keyed_broadcast_max_rows:
        import ray
        import ray.data as rd

        if n_rows <= cfg.band_driver_max_rows:
            tbl = to_local_table(keyed_mat)
            if tbl is None or tbl.num_rows == 0:
                return rd.from_arrow(PAIR_SCHEMA.empty_table())
            a, b = _local_grouped_pairs(tbl.column(key).to_numpy(),
                                        tbl.column("doc_id").to_numpy(),
                                        cap)
            out = pa.table({"id_a": pa.array(a, pa.int64()),
                            "id_b": pa.array(b, pa.int64())},
                           schema=PAIR_SCHEMA)
            # split into many blocks — a single from_arrow block would make
            # every downstream map_batches run as ONE task (no parallelism)
            n_blocks = max(1, min(64, out.num_rows // 256))
            step = -(-out.num_rows // n_blocks) if out.num_rows else 1
            slices = [out.slice(i, step)
                      for i in range(0, out.num_rows, step)]
            return rd.from_arrow(slices or [out])

        refs = list(keyed_mat.to_arrow_refs())
        if not refs:
            return rd.from_arrow(PAIR_SCHEMA.empty_table())
        # fan the key-space slices out over the cluster's CPUs (each task
        # handles several slices sequentially so one worker pays its
        # first-touch warmup once — perf.py); per-task memory is bounded
        # by the broadcast budget regardless of the task count
        n_tasks = _emit_task_count(cfg)
        n_slices = 2 * n_tasks
        groups = [list(range(t, n_slices, n_tasks)) for t in range(n_tasks)]
        emit = ray.remote(_emit_key_slices).options(num_returns=n_tasks)
        result_refs = [list(emit.remote(refs, key, g, n_slices, cap,
                                        n_tasks)) if n_tasks > 1 else
                       [emit.remote(refs, key, g, n_slices, cap, n_tasks)]
                       for g in groups]
        return _pairs_ds_from_partial_refs(result_refs)

    if (cfg.extra or {}).get("grouped_pairs_impl") == "hashagg":
        return _hashagg_grouped_pairs(keyed_mat, cfg, key)
    return _sorted_grouped_pairs(keyed_mat, cfg, key)


def _hashagg_grouped_pairs(keyed_ds, cfg: PipelineConfig, key: str):
    """The original hash-aggregate distributed tier (Count+Min groupby →
    sizes join → star/small branches → hash-aggregate distinct). Retained
    behind ``cfg.extra['grouped_pairs_impl'] == 'hashagg'`` as the
    equivalence baseline for ``_sorted_grouped_pairs``, which replaced it
    as the default: on a 6.1M-row exploded table the Count+Min aggregate
    alone cost 22 s where a full (key, doc_id) range sort costs 0.8 s
    (measured, BASELINE.md round-4 close)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    import dataclasses

    cap = cfg.band_group_pair_cap
    # the baseline must stay INDEPENDENT of the sort-based code it
    # validates: route its sizes join to the Acero hash join, never to
    # merge_join (review finding, round 4)
    cfg = dataclasses.replace(cfg, extra={**(cfg.extra or {}),
                                          "lookup_join_impl": "hash"})
    # Distinct (key, doc_id) FIRST so grp_n counts UNIQUE members — the
    # semantics the sorted tier and the broadcast kernels use. Without
    # it the two tiers diverge on inputs carrying duplicate (key,
    # doc_id) rows (production-impossible, but the baseline must be a
    # valid equivalence oracle on all inputs — review finding, round 5).
    keyed_ds = keyed_ds.groupby([key, "doc_id"]).aggregate(
        Count(alias_name="_dup_n")).drop_columns(["_dup_n"])
    sizes = keyed_ds.groupby(key).aggregate(
        Count(alias_name="grp_n"), Min("doc_id", alias_name="grp_min"))
    # materialize: `keyed` feeds both the star branch and the small-group
    # branch — without the barrier the explode+lookup would run twice
    keyed = lookup_join(keyed_ds, sizes, on=key, cfg=cfg).materialize()

    def star(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(b.column("grp_n"), cap),
                    pc.not_equal(b.column("doc_id"), b.column("grp_min")))
        t = b.filter(m)
        return pa.table({"id_a": t.column("grp_min"),
                         "id_b": t.column("doc_id")}, schema=PAIR_SCHEMA)

    star_pairs = keyed.map_batches(star, batch_format="pyarrow")

    def small_side(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("grp_n"), 2),
                    pc.less_equal(b.column("grp_n"), cap))
        return b.filter(m).select([key, "doc_id"])

    small = keyed.map_batches(small_side, batch_format="pyarrow").materialize()
    small_pairs = _small_group_pairs(small, key, cfg)
    return distinct_pairs(star_pairs.union(small_pairs))


def _emit_task_count(cfg: PipelineConfig) -> int:
    """Fan-out of the parallel pair-emission tiers: one task per CPU in
    [8, 32] (overridable via ``cfg.extra['emit_tasks']``). Per-task memory
    is bounded by the broadcast budget regardless of the count — tasks
    partition the KEY space, not the data."""
    import ray

    override = (cfg.extra or {}).get("emit_tasks")
    if override:
        return int(override)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — sizing hint only
        cpus = 8
    return max(8, min(32, cpus))


def _shard_pair_partial(a: np.ndarray, b: np.ndarray, n_shards: int):
    """Split one (a, b) pair partial into ``n_shards`` disjoint
    ``(a_s, b_s)`` tuples by a hash of the PAIR (both endpoints), so
    identical pairs emitted by different tasks always land in the same
    shard (flat list for Ray ``num_returns``). With ``n_shards == 1`` the
    caller uses ``num_returns=1``, so the single ref must resolve to the
    bare ``(a, b)`` tuple — a one-element list would make the merge task
    see ``[(a, b)]`` and fail indexing ``p[1]``."""
    e = np.empty(0, dtype=np.int64)
    if n_shards == 1:
        return (a, b)
    if len(a) == 0:
        return [(e, e)] * n_shards
    with np.errstate(over="ignore"):
        mix = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
    sl = ((mix >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)
    order = np.argsort(sl, kind="stable")
    a_s, b_s, sl_s = a[order], b[order], sl[order]
    bounds = np.searchsorted(sl_s, np.arange(n_shards + 1))
    return [(a_s[bounds[s]:bounds[s + 1]], b_s[bounds[s]:bounds[s + 1]])
            for s in range(n_shards)]


def _merge_pair_shard(*parts):
    """Ray task body: merge one SHARD's partials from every emit task into
    that shard's distinct pair table. Shards partition the pair space, so
    per-shard distinct == global distinct restricted to the shard — no
    further cross-shard reduction is needed."""
    pa_list = [p[0] for p in parts if len(p[0])]
    pb_list = [p[1] for p in parts if len(p[1])]
    if not pa_list:
        return PAIR_SCHEMA.empty_table()
    a, b = _dedup_pairs_np(np.concatenate(pa_list), np.concatenate(pb_list))
    return pa.table({"id_a": pa.array(a, pa.int64()),
                     "id_b": pa.array(b, pa.int64())}, schema=PAIR_SCHEMA)


def _pairs_ds_from_partial_refs(result_refs):
    """Sharded emit outputs → distinct-pairs Dataset via a PARALLEL
    shard-wise reduce (round 2's driver merge was a measured serial term;
    round 3's first fix — a fan-in-8 reduce tree — still bottlenecked on
    its root node, which re-sorted the full pair volume once per run:
    measured 9.8 s at 32 CPUs vs 6.7 s at 8, i.e. ANTI-scaling, because
    task count multiplied the duplicate volume entering the tree). Each
    emit task pre-shards its output by pair hash (``num_returns``); merge
    task j touches only shard j from every emit task, so reduction
    parallelism equals the shard count and no single task ever sees the
    full pair set. The driver only holds refs.

    ``result_refs``: one list of ``n_shards`` ObjectRefs per emit task
    (each resolving to that task's ``(a, b)`` partial for the shard)."""
    import ray
    import ray.data as rd

    n_shards = len(result_refs[0])
    merge = ray.remote(_merge_pair_shard)
    table_refs = [
        merge.remote(*[task_refs[s] for task_refs in result_refs])
        for s in range(n_shards)]
    return rd.from_arrow_refs(table_refs)


def _dedup_pairs_np(id_a: np.ndarray,
                    id_b: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Distinct (a, b) via int64 lexsort + consecutive-duplicate mask —
    5-10× faster than np.unique over packed 16-byte keys."""
    if len(id_a) == 0:
        return id_a, id_b
    order = np.lexsort((id_b, id_a))
    a_s, b_s = id_a[order], id_b[order]
    first = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    return a_s[first], b_s[first]


#: raw-pair emission chunk: near-identical docs co-occur in ~every band,
#: so the raw pair stream is ~num_bands× the distinct set (tens of
#: millions of rows at bench scale). Emitting in fixed-size chunks with
#: per-chunk dedup bounds peak memory at ~6 × _EMIT_CHUNK × 8 B and lets
#: the allocator reuse the same (page-warm) buffers — first-touch page
#: faults on a grown heap are ~0.25 ms/page on the target VMs (perf.py),
#: so a single 1.5 GB burst costs more than all the compute here.
_EMIT_CHUNK = 4_000_000


def _local_grouped_pairs(keys: np.ndarray, docs: np.ndarray,
                         cap: int) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized pair emission over a local (key, doc) table: sort by
    (key, doc), find group runs, all-pairs for runs ≤ cap (emitted in
    bounded chunks, deduped per chunk) and star-pairs (min member =
    pivot) above; final global dedup. Pure numpy — no Python per group."""
    order = np.lexsort((docs, keys))
    k = keys[order]
    d = docs[order].astype(np.int64)
    # drop duplicate (key, doc) rows: group size / cap semantics count
    # UNIQUE members (reference _emit_pairs does np.unique), and a doc
    # must never pair with itself
    if len(k):
        uniq = np.r_[True, (k[1:] != k[:-1]) | (d[1:] != d[:-1])]
        k, d = k[uniq], d[uniq]
    n = len(k)
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    lens = np.diff(np.r_[starts, n])
    grp_start_row = np.repeat(starts, lens)           # per-row group start
    grp_len_row = np.repeat(lens, lens)               # per-row group size
    pos = np.arange(n) - grp_start_row                # position within group

    small_row = (grp_len_row <= cap) & (grp_len_row >= 2)
    # all-pairs: row i pairs with every later member of its group
    cnt = np.where(small_row, grp_len_row - 1 - pos, 0)
    total = int(cnt.sum())
    parts_a: "list[np.ndarray]" = []
    parts_b: "list[np.ndarray]" = []
    if total:
        ccum = np.cumsum(cnt)
        cut_rows = np.searchsorted(
            ccum, np.arange(_EMIT_CHUNK, total, _EMIT_CHUNK)) + 1
        seg = np.r_[0, cut_rows, n]
        for s, e in zip(seg[:-1], seg[1:]):
            c = cnt[s:e]
            tot = int(c.sum())
            if tot == 0:
                continue
            rows = np.repeat(np.arange(s, e), c)
            offs = np.repeat(np.cumsum(c) - c, c)
            partner = (np.repeat(np.arange(s, e) + 1, c)
                       + (np.arange(tot) - offs))
            aa, bb = d[rows], d[partner]
            # a doc whose two bands collide to one key appears twice in a
            # group — drop the resulting self-pairs
            m = aa != bb
            aa, bb = _dedup_pairs_np(aa[m], bb[m])
            parts_a.append(aa)
            parts_b.append(bb)

    big_member = (grp_len_row > cap) & (pos > 0)
    ba = d[grp_start_row[big_member]]                 # pivot = first (min) member
    bb_ = d[big_member]
    m = ba != bb_
    parts_a.append(ba[m])
    parts_b.append(bb_[m])

    id_a = np.concatenate(parts_a) if parts_a else np.empty(0, np.int64)
    id_b = np.concatenate(parts_b) if parts_b else np.empty(0, np.int64)
    return _dedup_pairs_np(id_a, id_b)


def _small_group_pairs(small_ds, key: str, cfg: PipelineConfig):
    """All-pairs within small groups (each group ≤ band_group_pair_cap).

    Small-side path: the (key, doc_id) rows are broadcast once as two
    sorted arrays; every batch expands each row to its within-group
    partners with strictly greater doc_id via searchsorted + repeat/arange
    — one pair emitted exactly once, fully vectorized, zero shuffles.
    Above ``broadcast_max_rows`` falls back to a key self-join (the scale
    path; fan-out bounded by the cap either way)."""
    import pyarrow.compute as pc
    import ray

    from fuzzy_dedupe_pipeline_ray.sources.io import hash_join, to_local_table

    if small_ds.count() > cfg.broadcast_max_rows:
        right = small_ds.rename_columns({"doc_id": "doc_id_b"})
        joined = hash_join(small_ds, right, on=key, cfg=cfg)

        def lt(b: pa.Table) -> pa.Table:
            t = b.filter(pc.less(b.column("doc_id"), b.column("doc_id_b")))
            return pa.table({"id_a": t.column("doc_id"),
                             "id_b": t.column("doc_id_b")}, schema=PAIR_SCHEMA)

        return joined.map_batches(lt, batch_format="pyarrow")

    tbl = to_local_table(small_ds)
    if tbl is None or tbl.num_rows == 0:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())
    keys = tbl.column(key).to_numpy()
    docs = tbl.column("doc_id").to_numpy()
    order = np.lexsort((docs, keys))
    ref = ray.put((keys[order], docs[order]))

    def expand(b: pa.Table) -> pa.Table:
        ks, ds_ = ray.get(ref)
        bk = b.column(key).to_numpy()
        bd = b.column("doc_id").to_numpy()
        lo = np.searchsorted(ks, bk, "left")
        hi = np.searchsorted(ks, bk, "right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return PAIR_SCHEMA.empty_table()
        rows = np.repeat(np.arange(len(bk)), counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        partner_idx = np.repeat(lo, counts) + (np.arange(total) - starts)
        partners = ds_[partner_idx]
        own = bd[rows]
        keep = partners > own
        return pa.table({"id_a": pa.array(own[keep], pa.int64()),
                         "id_b": pa.array(partners[keep], pa.int64())},
                        schema=PAIR_SCHEMA)

    import ray.data  # noqa: F401  (from_arrow used above)

    return small_ds.map_batches(expand, batch_format="pyarrow",
                                zero_copy_batch=True)


def _emit_key_slices(block_refs, key: str, slice_indices, n_slices: int,
                     cap: int, n_shards: int = 1):
    """Ray task body: distinct pairs for SEVERAL hash-slices of the key
    space of an exploded (key, doc_id) table, processed sequentially so
    one worker pays its (expensive — perf.py) first-touch warmup once.
    Whole key groups land in one slice (the slice is a function of the
    key), so per-slice emission is exact; cross-slice pair duplicates are
    merged by the caller."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    blocks = [t for t in ray.get(list(block_refs)) if t.num_rows]
    e = np.empty(0, dtype=np.int64)
    if not blocks:
        return _shard_pair_partial(e, e, n_shards)
    # Filter PER BLOCK, never concatenating the full keyed table: the
    # round-2 shape concatenated all rows in EVERY task, so 32 concurrent
    # tasks allocated 32× the table (measured 14× slowdown of the anchor
    # tier at 32 vs 8 CPUs on a fault-rate-limited host). Per-task fresh
    # pages are now ≈ table/n_tasks + one reusable block-sized temp.
    lut = np.zeros(n_slices, dtype=bool)
    lut[np.asarray(list(slice_indices), dtype=np.int64)] = True
    key_parts: "list[np.ndarray]" = []
    doc_parts: "list[np.ndarray]" = []
    slice_parts: "list[np.ndarray]" = []
    for b in blocks:
        k = b.column(key).to_numpy()          # zero-copy plasma view
        with np.errstate(over="ignore"):
            mix = (k.astype(np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        sl = (mix % np.uint64(n_slices)).astype(np.int64)
        m = lut[sl]
        if not m.any():
            continue
        key_parts.append(k[m])
        doc_parts.append(b.column("doc_id").to_numpy()[m])
        slice_parts.append(sl[m])
    if not key_parts:
        return _shard_pair_partial(e, e, n_shards)
    keys = np.concatenate(key_parts)
    docs = np.concatenate(doc_parts)
    slice_of = np.concatenate(slice_parts)
    parts_a: "list[np.ndarray]" = [e]
    parts_b: "list[np.ndarray]" = [e]
    for t in slice_indices:
        mask = slice_of == t
        if not mask.any():
            continue
        a, b = _local_grouped_pairs(keys[mask], docs[mask], cap)
        parts_a.append(a)
        parts_b.append(b)
    return _shard_pair_partial(np.concatenate(parts_a),
                               np.concatenate(parts_b), n_shards)


def _emit_band_group(block_refs, band_indices, cap: int, n_shards: int = 1):
    """Ray task body: distinct pairs for a handful of bands of the
    band-key matrix. Reads the matrix blocks zero-copy from plasma and
    concatenates ONLY the doc_id column and its own band columns (never
    the full matrix); returns lazily-merged (id_a, id_b) arrays."""
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    blocks = [t for t in ray.get(list(block_refs)) if t.num_rows]
    if not blocks:
        e = np.empty(0, dtype=np.int64)
        return _shard_pair_partial(e, e, n_shards)
    docs = np.concatenate([b.column("doc_id").to_numpy() for b in blocks])
    parts_a: "list[np.ndarray]" = [np.empty(0, dtype=np.int64)]
    parts_b: "list[np.ndarray]" = [np.empty(0, dtype=np.int64)]
    pending = 0
    for j in band_indices:
        keys = np.concatenate(
            [b.column(f"bk_{j}").to_numpy() for b in blocks])
        a, b_ = _local_grouped_pairs(keys, docs, cap)
        if len(a) == 0:
            continue
        parts_a.append(a)
        parts_b.append(b_)
        pending += len(a)
        if pending > 2 * _EMIT_CHUNK:
            merged = _dedup_pairs_np(np.concatenate(parts_a),
                                     np.concatenate(parts_b))
            parts_a, parts_b = [merged[0]], [merged[1]]
            pending = 0
    a, b = _dedup_pairs_np(np.concatenate(parts_a), np.concatenate(parts_b))
    return _shard_pair_partial(a, b, n_shards)


def _band_key_table(cfg_json: str):
    """map_batches fn: signatures → narrow (doc_id, bk_0..bk_{b-1}) rows —
    the band-key matrix computed worker-side, WITHOUT the b× row
    explosion (64 B/doc at b=32 vs b 16-byte rows per doc)."""
    cfg = PipelineConfig.from_json(cfg_json)

    def fn(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        cols = {"doc_id": batch.column("doc_id")}
        if m == 0:
            keys = np.empty((0, cfg.num_bands), dtype=np.int64)
        else:
            sigs = unpack_signatures(batch.column("minhash"), cfg.num_perms)
            keys = band_keys_batch(sigs, cfg.num_bands, cfg.rows_per_band)
        for j in range(cfg.num_bands):
            cols[f"bk_{j}"] = pa.array(keys[:, j].astype(np.int64),
                                       pa.int64())
        return pa.table(cols)

    return fn


def candidate_pairs(signatures_ds, cfg: PipelineConfig):
    """signatures Dataset → distinct candidate (id_a, id_b) Dataset.

    Replaces the reference's FAISS self-kNN probe loop
    (``processor.py:136-150``) with LSH banding.

    Fast path (band-key matrix ≤ broadcast budget): the per-doc band-key
    MATRIX is computed worker-side and collected narrow (no b× row
    explosion), then processed ONE BAND AT A TIME — b independent
    ~n-row sorts with incremental pair dedup — instead of one b·n-row
    lexsort. Peak driver memory is one band column plus the running
    distinct pair set (tens of MB at bench scale); on hosts where
    first-touch page faults are slow (perf.py) this is the difference
    between seconds and minutes. Above the budget: band explosion +
    ``grouped_pairs``' distributed shuffle path (the 100 TB shape).
    """
    signatures_ds = signatures_ds.materialize()
    n_docs = signatures_ds.count()
    n_keyed = n_docs * cfg.num_bands
    if n_keyed <= cfg.keyed_broadcast_max_rows:
        import ray
        import ray.data as rd

        from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

        bk_ds = (signatures_ds.select_columns(["doc_id", "minhash"])
                 .map_batches(_band_key_table(cfg.to_json()),
                              batch_format="pyarrow",
                              zero_copy_batch=True).materialize())

        if n_keyed <= cfg.band_driver_max_rows:
            # small corpus: single driver pass — task dispatch overhead
            # would dominate the per-band numpy work
            tbl = to_local_table(bk_ds)
            if tbl is None or tbl.num_rows == 0:
                return rd.from_arrow(PAIR_SCHEMA.empty_table())
            docs = tbl.column("doc_id").to_numpy()
            # accumulate per-band distinct pairs and merge lazily once
            # the buffer passes ~2× _EMIT_CHUNK — near-identical pairs
            # recur in ~every band, so eager per-band merging would pay b
            # lexsorts of the full running set for no size reduction
            parts_a: "list[np.ndarray]" = [np.empty(0, dtype=np.int64)]
            parts_b: "list[np.ndarray]" = [np.empty(0, dtype=np.int64)]
            pending = 0
            for j in range(cfg.num_bands):
                a, b = _local_grouped_pairs(
                    tbl.column(f"bk_{j}").to_numpy(), docs,
                    cfg.band_group_pair_cap)
                if len(a) == 0:
                    continue
                parts_a.append(a)
                parts_b.append(b)
                pending += len(a)
                if pending > 2 * _EMIT_CHUNK:
                    merged = _dedup_pairs_np(np.concatenate(parts_a),
                                             np.concatenate(parts_b))
                    parts_a, parts_b = [merged[0]], [merged[1]]
                    pending = 0
            agg_a, agg_b = _dedup_pairs_np(np.concatenate(parts_a),
                                           np.concatenate(parts_b))
            out = pa.table({"id_a": pa.array(agg_a, pa.int64()),
                            "id_b": pa.array(agg_b, pa.int64())},
                           schema=PAIR_SCHEMA)
            n_blocks = max(1, min(64, out.num_rows // 256))
            step = -(-out.num_rows // n_blocks) if out.num_rows else 1
            slices = [out.slice(i, step)
                      for i in range(0, out.num_rows, step)]
            return rd.from_arrow(slices or [out])

        # mid tier: the per-band emission fans out as parallel Ray tasks
        # (a few bands each — one first-touch warmup per worker, see
        # perf.py) so the dominant sort/emit work scales with cluster
        # CPUs; the partial (already-distinct, sorted) pair sets are
        # merged by an off-driver reduce tree, not on the driver
        refs = list(bk_ds.to_arrow_refs())
        if not refs:
            return rd.from_arrow(PAIR_SCHEMA.empty_table())
        n_tasks = _emit_task_count(cfg)
        per_task = max(1, -(-cfg.num_bands // n_tasks))
        groups = [list(range(j, min(j + per_task, cfg.num_bands)))
                  for j in range(0, cfg.num_bands, per_task)]
        n_shards = len(groups)
        emit = ray.remote(_emit_band_group).options(num_returns=n_shards)
        result_refs = [list(emit.remote(refs, g, cfg.band_group_pair_cap,
                                        n_shards)) if n_shards > 1 else
                       [emit.remote(refs, g, cfg.band_group_pair_cap,
                                    n_shards)]
                       for g in groups]
        return _pairs_ds_from_partial_refs(result_refs)

    exploded = signatures_ds.map_batches(
        explode_bands(cfg.to_json()), batch_format="pyarrow",
        zero_copy_batch=True)
    return grouped_pairs(exploded, cfg)


# ---------------------------------------------------------------------------
# Sort-based distributed pair emission (the default 100 TB tier)
# ---------------------------------------------------------------------------
#
# Ray's range-partition sort is ~25× cheaper than its hash aggregate on
# the exploded (band_key, doc_id) table (0.8 s vs 22 s on 6.1M rows,
# measured round-4 close), so the distributed tier sorts ONCE and emits
# pairs per sorted block with an O(#blocks) driver scan stitching the
# groups that straddle block boundaries:
#
# * interior groups (fully inside one block) go through the same
#   vectorized ``_local_grouped_pairs`` kernel the broadcast tiers use;
# * a boundary-spanning group's TRUE size and min-doc pivot come from the
#   block summaries; if it exceeds the star cap every involved block
#   emits (pivot, member) star pairs locally, else the driver emits its
#   ≤ cap² all-pairs itself from the summary-shipped member runs;
# * the final cross-band distinct is ALSO sort-based
#   (``distinct_pairs_sorted``): one (id_a, id_b) sort, adjacent-unique
#   per block, one carried pair per boundary.
#
# Pair-set equivalence with the hash-aggregate tier (retained as
# ``cfg.extra['grouped_pairs_impl'] = 'hashagg'``) is pinned by
# tests/test_lsh_paths.py.


# Partitioning assumption (shared with relational._sorted_block_scan,
# where it has been load-bearing since round 4 opened): ``Dataset.sort``
# emits range-partitioned blocks whose ``to_arrow_refs`` order IS the
# global key order, so consecutive blocks share at most one key run at
# their boundary. The boundary scans below depend on it; the three-way
# tier equivalence tests would fail loudly if a Ray upgrade broke it.


def _run_lengths(k: np.ndarray) -> "tuple[int, int]":
    """(first-run length, last-run length) of a sorted key array."""
    n = len(k)
    f = int(np.searchsorted(k, k[0], side="right"))
    l_start = int(np.searchsorted(k, k[-1], side="left"))
    return f, n - l_start


def _pair_block_summary(tbl: pa.Table, key: str, cap: int):
    """Ray task: per sorted-block summary for the boundary scan —
    ``(first_key, first_row_len, first_unique≤cap+1, first_n_unique,
    last_key, last_row_len, last_unique≤cap+1, last_n_unique)`` or None
    for an empty block. UNIQUE members (not rows) drive the star/small
    decision — the semantics ``_local_grouped_pairs`` uses (a doc whose
    bands collide to one key appears twice but is one member)."""
    if tbl.num_rows == 0:
        return None
    k = tbl.column(key).to_numpy()
    d = tbl.column("doc_id").to_numpy().astype(np.int64)
    n = len(k)
    f_len, l_len = _run_lengths(k)
    fu = np.unique(d[:f_len])
    lu = np.unique(d[n - l_len:])
    return (int(k[0]), f_len, fu[:cap + 1].copy(), len(fu),
            int(k[-1]), l_len, lu[:cap + 1].copy(), len(lu))


def _pair_block_label(tbl: pa.Table, key: str, cap: int, drop_first: bool,
                      drop_last: bool, star_first, star_last,
                      drop_all: bool, star_all) -> pa.Table:
    """Ray task: emit this block's pairs. Boundary runs the driver scan
    claimed are dropped (drop_*) — the span logic emits them instead —
    except star spans, whose (pivot, member) pairs ARE emitted here from
    this block's own rows (star_* = the span's global min doc)."""
    k = tbl.column(key).to_numpy()
    d = tbl.column("doc_id").to_numpy().astype(np.int64)
    parts_a: "list[np.ndarray]" = [np.empty(0, np.int64)]
    parts_b: "list[np.ndarray]" = [np.empty(0, np.int64)]

    def star_emit(members: np.ndarray, gmin: int):
        mem = members[members != gmin]
        if len(mem):
            parts_a.append(np.full(len(mem), gmin, np.int64))
            parts_b.append(mem)

    if drop_all:
        if star_all is not None:
            star_emit(d, star_all)
    else:
        n = len(k)
        f_len, l_len = _run_lengths(k)
        if star_first is not None:
            star_emit(d[:f_len], star_first)
        if star_last is not None:
            star_emit(d[n - l_len:], star_last)
        lo = f_len if drop_first else 0
        hi = n - l_len if drop_last else n
        if hi > lo:
            a, b = _local_grouped_pairs(k[lo:hi], d[lo:hi], cap)
            parts_a.append(a)
            parts_b.append(b)
    a, b = _dedup_pairs_np(np.concatenate(parts_a), np.concatenate(parts_b))
    return pa.table({"id_a": pa.array(a, pa.int64()),
                     "id_b": pa.array(b, pa.int64())}, schema=PAIR_SCHEMA)


def _scan_boundary_spans(summaries, cap: int):
    """Driver scan over block summaries: find groups spanning block
    boundaries, decide star-vs-all-pairs from their TRUE UNIQUE-member
    count, and return (per-block label kwargs, small-span member lists).

    Control flow lives in the shared ``functions.scans
    .scan_boundary_spans`` (one copy of the pending/close state machine
    + the sorted-block order assertion across all five sorted tiers —
    round-5 review consolidation); only the star/small decision is
    tier-specific here.

    Exactness of the unique count: each run ships its unique members
    truncated at cap+1 plus the exact per-run unique count. If any run's
    count exceeds cap+1 the span has > cap members (star — members not
    needed); otherwise every run's list is complete, so the union IS the
    span's exact member set (runs in different blocks may repeat a
    member — duplicates collapse in the union)."""
    from fuzzy_dedupe_pipeline_ray.functions.scans import (
        scan_boundary_spans,
    )

    args = [{"drop_first": False, "drop_last": False, "star_first": None,
             "star_last": None, "drop_all": False, "star_all": None}
            for _ in summaries]
    small_spans: "list[np.ndarray]" = []

    def split(sm):
        fk, f_len, f_uniq, f_nu, lk, l_len, l_uniq, l_nu = sm
        return fk, (f_uniq, f_nu), lk, (l_uniq, l_nu)

    def close(p):
        if len(p["blocks"]) < 2:
            return
        truncated = any(nu > cap + 1 for _, nu in p["payloads"])
        members = None
        if not truncated:
            members = np.unique(np.concatenate(
                [u for u, _ in p["payloads"]]))
        if truncated or len(members) > cap:
            gmin = int(p["payloads"][0][0][0])
            for i, which in p["blocks"]:
                args[i][f"drop_{which}"] = True
                args[i][f"star_{which}"] = gmin
        else:
            for i, which in p["blocks"]:
                args[i][f"drop_{which}"] = True
            small_spans.append(members)

    scan_boundary_spans(summaries, split, close)
    return args, small_spans


def _span_all_pairs(member_sets) -> pa.Table:
    """Driver-side all-pairs for ≤cap-member boundary spans (each entry
    is the span's sorted unique member array)."""
    if not member_sets:
        return PAIR_SCHEMA.empty_table()
    parts_a, parts_b = [np.empty(0, np.int64)], [np.empty(0, np.int64)]
    for d in member_sets:
        if len(d) < 2:
            continue
        i, j = np.triu_indices(len(d), 1)
        parts_a.append(d[i])
        parts_b.append(d[j])
    a, b = _dedup_pairs_np(np.concatenate(parts_a), np.concatenate(parts_b))
    return pa.table({"id_a": pa.array(a, pa.int64()),
                     "id_b": pa.array(b, pa.int64())}, schema=PAIR_SCHEMA)


def _pair_first_last(tbl: pa.Table):
    if tbl.num_rows == 0:
        return None
    a = tbl.column("id_a")
    b = tbl.column("id_b")
    return ((a[0].as_py(), b[0].as_py()),
            (a[-1].as_py(), b[-1].as_py()))


def _pair_dedup_label(tbl: pa.Table, prev_pair) -> pa.Table:
    a = tbl.column("id_a").to_numpy()
    b = tbl.column("id_b").to_numpy()
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    if prev_pair is not None and len(a) \
            and int(a[0]) == prev_pair[0] and int(b[0]) == prev_pair[1]:
        keep[0] = False
    sel = pa.array(np.flatnonzero(keep), pa.int64())
    # take on the FULL table: payload columns (e.g. the fused tier's
    # scored-edge columns) ride along — duplicate (id_a, id_b) rows are
    # deterministic re-computations, so keep-first is exact
    return tbl.take(sel)


def distinct_pairs_sorted(pairs_ds, schema: pa.Schema = PAIR_SCHEMA):
    """Distinct on (id_a, id_b) by range sort + per-block adjacent-unique
    with one carried boundary pair — replaces the hash-aggregate distinct
    on the sorted distributed tier (sort is ~25× cheaper per row here).
    Non-key columns are preserved (keep-first; callers guarantee
    duplicates carry identical payloads); ``schema`` shapes the empty
    result."""
    import ray
    import ray.data as rd

    s = pairs_ds.sort(["id_a", "id_b"]).materialize()
    refs = list(s.to_arrow_refs())
    if not refs:
        return rd.from_arrow(schema.empty_table())
    summarize = ray.remote(_pair_first_last)
    sums = ray.get([summarize.remote(r) for r in refs])
    label = ray.remote(_pair_dedup_label)
    out_refs, carry = [], None
    for i, sm in enumerate(sums):
        if sm is None:
            continue
        if carry is not None and sm[0] < carry:
            raise RuntimeError(
                "sorted-block order violation: block first pair "
                f"{sm[0]} < previous block last pair {carry} — the "
                "adjacent-unique distinct cannot run (review, round 5)")
        out_refs.append(label.remote(refs[i], carry))
        carry = sm[1]
    if not out_refs:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(out_refs)


def _sorted_grouped_pairs(keyed_ds, cfg: PipelineConfig, key: str):
    """The sort-based distributed pair-emission tier (see the section
    comment above). One (key, doc_id) range sort, per-block vectorized
    emission, O(#blocks) boundary stitching, sort-based distinct."""
    import ray
    import ray.data as rd

    cap = cfg.band_group_pair_cap
    s = keyed_ds.sort([key, "doc_id"]).materialize()
    refs = list(s.to_arrow_refs())
    if not refs:
        return rd.from_arrow(PAIR_SCHEMA.empty_table())
    summarize = ray.remote(_pair_block_summary)
    summaries = ray.get([summarize.remote(r, key, cap) for r in refs])
    args, small_spans = _scan_boundary_spans(summaries, cap)
    label = ray.remote(_pair_block_label)
    out_refs = [label.remote(refs[i], key, cap, **args[i])
                for i, sm in enumerate(summaries) if sm is not None]
    span_tbl = _span_all_pairs(small_spans)
    parts = rd.from_arrow_refs(out_refs) if out_refs else \
        rd.from_arrow(PAIR_SCHEMA.empty_table())
    if span_tbl.num_rows:
        parts = parts.union(rd.from_arrow(span_tbl))
    return distinct_pairs_sorted(parts)
