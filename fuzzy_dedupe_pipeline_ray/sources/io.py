"""Shared Dataset I/O + join helpers."""

from __future__ import annotations

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig


def _compact_blocks(ds):
    """(materialized dataset) → (same data without empty blocks, num_rows).

    Works around a Ray 2.49 hash-shuffle edge that breaks ``Dataset.join``:
    ``_shuffle_block`` returns early for an EMPTY input block
    (hash_shuffle.py:223-225) without sending the schema-broadcast empty
    shards, and the schema broadcast rides only on the FIRST submitted
    shuffle task per input (hash_shuffle.py:584). So if a join input's
    first block happens to be empty AND some hash partition receives no
    nonempty shard of that input, ``JoinAggregation.finalize`` builds a
    schema-less empty table and Acero raises ``No match or multiple
    matches for key field reference ... side of the join``. Empty blocks
    must therefore never reach a hash-join input. Ref-level rebuild: no
    data is moved or copied, only block refs filtered.
    """
    import ray.data

    bundles = list(ds.iter_internal_ref_bundles())
    refs, total, n_blocks = [], 0, 0
    for b in bundles:
        for ref, meta in zip(b.block_refs, b.metadata):
            n_blocks += 1
            if meta.num_rows:
                refs.append(ref)
                total += meta.num_rows
    if len(refs) == n_blocks:
        return ds, total
    if not refs:
        return ds, 0
    return ray.data.from_arrow_refs(refs), total


def _empty_arrow(ds) -> "pa.Table":  # noqa: F821
    import pyarrow as pa

    sch = ds.schema(fetch_if_missing=True)
    return pa.schema(list(zip(sch.names, sch.types))).empty_table()


def hash_join(left, right, *, on, right_on=None, join_type: str = "inner",
              cfg: PipelineConfig):
    """``Dataset.join`` with the pipeline's partition/actor sizing.

    Ray's hash join spins up ``num_partitions`` aggregator actors per join;
    fractional ``num_cpus`` keeps the pool schedulable inside a small CPU
    allotment (they are I/O-bound shuffle receivers, not compute hogs).

    The result is ALWAYS materialized: two JoinOperators fused into one
    streaming plan starve each other's aggregator pools and deadlock under
    a small CPU budget (observed repeatedly on Ray 2.49 at num_cpus=4),
    and lazy datasets make it far too easy to compose exactly that plan.
    The barrier pins one narrow intermediate in the (spillable) object
    store — the safe default; fuse joins manually only with profiling.

    BOTH inputs are guarded against the Ray empty-first-block
    schema-broadcast edge (see ``_compact_blocks``): each side is
    materialized and compacted before the join. A lazy left previously
    stayed streaming on the theory that "a big left feeds every
    partition" — but the edge is triggered by SPARSE inputs (an empty
    first block plus any hash partition that receives no nonempty shard),
    which is exactly what degenerate stages produce (e.g. labelprop
    rounds whose edge checkpoint leads with an empty part file;
    reproduced in ``test_hash_join_left_lazy_empty_first_block``). The
    cost is one extra materialization barrier for lazy lefts — modest,
    since the join output is materialized anyway (deadlock note above)
    and the object store spills; correctness on the forced-distributed
    tiers beats the lost map/shuffle overlap. A side known to be EMPTY
    short-circuits the distributed join entirely.
    """
    import pyarrow as pa
    import ray.data
    from ray.data.dataset import MaterializedDataset

    on_t = on if isinstance(on, tuple) else (on,)
    r_on_t = (on_t if right_on is None
              else right_on if isinstance(right_on, tuple) else (right_on,))

    if not isinstance(right, MaterializedDataset):
        right = right.materialize()
    right, n_right = _compact_blocks(right)
    if not isinstance(left, MaterializedDataset):
        left = left.materialize()
    left, n_left = _compact_blocks(left)

    if n_right == 0 or n_left == 0:
        # Acero on the two empty tables yields the exact joined schema
        arrow_type = {"inner": "inner", "left_outer": "left outer",
                      "full_outer": "full outer"}[join_type]
        joined_empty = _empty_arrow(left).join(
            _empty_arrow(right), join_type=arrow_type,
            keys=list(on_t), right_keys=list(r_on_t))
        outer_side = None  # the side whose rows survive an empty partner
        if join_type == "left_outer" and n_right == 0:
            outer_side = left
        elif join_type == "full_outer" and (n_left == 0) != (n_right == 0):
            outer_side = left if n_right == 0 else right
        if outer_side is None:
            return ray.data.from_arrow(joined_empty).materialize()
        # outer join with one empty side: surviving rows + null partner
        # columns, appended streaming — no shuffle needed
        extra = [f for f in joined_empty.schema
                 if f.name not in _empty_arrow(outer_side).schema.names]

        def add_nulls(b: pa.Table) -> pa.Table:
            for f in extra:
                b = b.append_column(f, pa.nulls(b.num_rows, f.type))
            return b

        return outer_side.map_batches(add_nulls,
                                      batch_format="pyarrow").materialize()

    return left.join(
        right,
        join_type=join_type,
        num_partitions=cfg.num_partitions,
        on=on_t,
        right_on=(None if right_on is None else r_on_t),
        aggregator_ray_remote_args={"num_cpus": cfg.join_aggregator_num_cpus},
    ).materialize()


def to_local_table(ds):
    """Materialize a (small) Dataset into one local Arrow table."""
    import pyarrow as pa
    import ray

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    # every to_local_table caller follows up with driver-side vectorized
    # work — keep its temporaries' pages resident (see perf.py)
    tune_allocator()

    tables = ray.get(ds.to_arrow_refs())
    tables = [t for t in tables if t.num_rows] or tables[:1]
    if not tables:
        return None
    # combine_chunks: a concat of hundreds of blocks leaves hundreds of
    # chunks per column, and Arrow take()/compute on a heavily-chunked
    # array resolves chunks per index — ~1000× slower than single-chunk
    return pa.concat_tables(tables).combine_chunks()


#: per-worker cache of prepared broadcast lookup structures, keyed by the
#: ObjectRef hex — ray.get is zero-copy from plasma, but the chunk-combine
#: prep should happen once per worker, not once per batch.
_LOOKUP_CACHE: dict = {}


def _prepared_lookup(ref):
    import ray

    key = ref.hex()
    hit = _LOOKUP_CACHE.get(key)
    if hit is None:
        tbl, on = ray.get(ref)
        keys = tbl.column(on).combine_chunks()
        hit = (keys, tbl)
        _LOOKUP_CACHE[key] = hit
        if len(_LOOKUP_CACHE) > 16:
            _LOOKUP_CACHE.pop(next(iter(_LOOKUP_CACHE)))
    return hit


def lookup_join(left, right, *, on, cfg: PipelineConfig,
                join_type: str = "inner", right_count: "int | None" = None,
                gate_rows: "int | None" = None):
    """Small-side-aware join on ONE key column (int64 or string — the
    per-batch probe is Arrow's C-level ``index_in`` hash lookup, so sha256
    string keys are as fast as integer ones).

    If ``right`` has ≤ ``gate_rows`` (default ``cfg.broadcast_max_rows``)
    rows it is broadcast once via ``ray.put`` and merged per batch with a
    vectorized ``pc.index_in`` lookup (no shuffle, no aggregator
    actors); otherwise falls back to the distributed ``merge_join`` —
    the 100 TB path (range-sort both sides, per-block overlap probe;
    ``cfg.extra['lookup_join_impl'] = 'hash'`` selects the Acero
    ``hash_join`` instead, retained as the equivalence baseline). Pass
    ``gate_rows=cfg.wide_broadcast_max_rows`` when the right side
    carries content-sized strings. ``join_type``: "inner" or
    "left_outer". The right side's key must be UNIQUE (it always is here:
    aggregate outputs / signature tables keyed by doc_id)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    if right_count is None:
        right = right.materialize()  # count + collect without re-execution
        n = right.count()
    else:
        n = right_count
    if n > (cfg.broadcast_max_rows if gate_rows is None else gate_rows):
        if (cfg.extra or {}).get("lookup_join_impl") == "hash":
            return hash_join(left, right, on=on, cfg=cfg,
                             join_type=join_type)
        return merge_join(left, right, on=on, cfg=cfg,
                          join_type=join_type)

    tbl = to_local_table(right)
    if tbl is None:
        # dataset with no blocks at all — no schema to build nulls from
        if join_type == "inner":
            return left.limit(0)
        raise ValueError("left_outer lookup_join against a schemaless "
                         "empty dataset")
    if tbl.num_rows == 0 and join_type == "inner":
        return left.limit(0)
    ref = ray.put((tbl, on))
    payload_cols = [c for c in tbl.schema.names if c != on]

    def merge(b: pa.Table) -> pa.Table:
        rkeys, rtbl = _prepared_lookup(ref)
        if rtbl.num_rows == 0:  # left_outer against empty right → all null
            out = b
            for c in payload_cols:
                out = out.append_column(
                    c, pa.nulls(b.num_rows, rtbl.schema.field(c).type))
            return out
        # first-occurrence index per probe key (null where absent); right
        # keys are unique per contract so "first" is "the" match
        pos = pc.index_in(b.column(on), value_set=rkeys)
        pos = pos.combine_chunks() if isinstance(pos, pa.ChunkedArray) else pos
        if join_type == "inner":
            keep = pc.is_valid(pos)
            out = b.filter(keep)
            idx = pos.filter(keep)
            for c in payload_cols:
                out = out.append_column(c, rtbl.column(c).take(idx))
            return out
        # left_outer: take() propagates the null positions as null payload
        out = b
        for c in payload_cols:
            out = out.append_column(c, rtbl.column(c).take(pos))
        return out

    return left.map_batches(merge, batch_format="pyarrow",
                            zero_copy_batch=True)


FILES_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_files(path: str):
    """Column-pruned read of a files table (the only wide read).

    Format-aware, by extension: Parquet (columnar — column pruning is
    pushed into the scan) is the native format; JSONL (``.jsonl`` /
    ``.json``) and CSV (``.csv``) are accepted for interchange with
    row-oriented exports (the reference ingests Google-Sheets/DB rows —
    ``sheets_sync/sync.py:26-31``). Row formats cannot prune columns at
    the read, so they project immediately after the scan; CSV is parsed
    with quoted-newline support (source content contains newlines) and
    empty strings are NOT read as nulls, so a parquet→csv→ingest
    round-trip is identity (pinned by ``test_source_formats``)."""
    import ray.data

    low = path.lower()
    if low.endswith((".jsonl", ".json")):
        return ray.data.read_json(path).select_columns(FILES_COLUMNS)
    if low.endswith(".csv"):
        import pyarrow as pa
        import pyarrow.csv as pacsv

        return ray.data.read_csv(
            path,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            convert_options=pacsv.ConvertOptions(
                column_types={c: pa.string() for c in FILES_COLUMNS},
                null_values=[], strings_can_be_null=False),
        ).select_columns(FILES_COLUMNS)
    return ray.data.read_parquet(path, columns=FILES_COLUMNS)


def filter_pairs_touching(pairs, ids_ref):
    """Keep only (id_a, id_b) pair rows with at least one endpoint in the
    SORTED int64 id array behind ``ids_ref`` (broadcast once via
    ``ray.put``; read zero-copy from plasma per batch). Shared by the
    incremental pipeline's fuzzy stage and ``substring_edges``'
    ``restrict_ids`` — one copy so the searchsorted membership logic
    can't drift between the two (review finding, round 4)."""
    import numpy as np
    import pyarrow as pa
    import ray

    def keep_touching(b: "pa.Table") -> "pa.Table":
        rid = ray.get(ids_ref)
        if len(rid) == 0:
            return b.slice(0, 0)

        def member(x):
            i = np.minimum(np.searchsorted(rid, x), len(rid) - 1)
            return rid[i] == x

        a = b.column("id_a").to_numpy()
        bb = b.column("id_b").to_numpy()
        return b.filter(pa.array(member(a) | member(bb)))

    return pairs.map_batches(keep_touching, batch_format="pyarrow",
                             zero_copy_batch=True)


def bloom_semi_filter(left, right, *, on, cfg: PipelineConfig,
                      bits_per_key: int = 16, n_hashes: int = 7,
                      right_count: "int | None" = None):
    """Broadcast Bloom-filter pre-pass for a big-left inner/semi join:
    returns ``left`` filtered to rows whose key MIGHT appear in
    ``right`` — never drops a true match (no false negatives), passes
    ~0.04% false positives at 16 bits/key × 7 hashes (classic bound
    (1−e^(−kn/m))^k), which the exact join downstream removes.

    The 100 TB story: when the right side exceeds the broadcast gate,
    the fallback hash join shuffles the ENTIRE left stream; a Bloom
    filter is 500× smaller than the keys it summarizes (16 bits vs a
    ~100-byte gram string), so it broadcasts at sizes where the key
    table cannot, and the left stream shrinks to near-hits before the
    all-to-all exchange. Build is distributed: one partial bitmap task
    per right block, OR-merged in a fan-in-8 reduce tree; the driver
    never sees the key stream. Hashes: two independent sha256 words per
    string key (``sha256_u64_arrow``), splitmix64 double-hashing for
    int keys; bit i = (h1 + i·h2) mod m.
    """
    import numpy as np
    import pyarrow as pa
    import ray

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        _GOLDEN, sha256_u64_arrow, splitmix64)

    if right_count is None:
        right = right.materialize()
        right_count = right.count()
    if right_count == 0:
        return left.limit(0)
    m_bits = max(1024, bits_per_key * right_count)
    m_bytes = (m_bits + 7) // 8
    m_bits = m_bytes * 8

    def _two_hashes(col) -> "tuple[np.ndarray, np.ndarray]":
        if pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type) or pa.types.is_binary(col.type):
            w = sha256_u64_arrow(col, words=2)
            return w[:, 0], w[:, 1]
        x = col.to_numpy().astype(np.uint64)
        h1 = splitmix64(x)
        h2 = splitmix64(x ^ _GOLDEN)
        return h1, h2

    def _partial_bitmap(tbl: pa.Table) -> np.ndarray:
        bm = np.zeros(m_bytes, np.uint8)
        # Ray can propagate an empty SCHEMA-LESS block through a
        # map_batches chain without invoking the UDF (the same edge
        # _compact_blocks guards in hash_join) — an empty block
        # contributes no bits either way
        if tbl.num_rows == 0 or on not in tbl.schema.names:
            return bm
        col = tbl.column(on).combine_chunks()
        if len(col) == 0:
            return bm
        h1, h2 = _two_hashes(col)
        for i in range(n_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bm, (idx >> np.uint64(3)).astype(np.int64),
                             np.left_shift(
                                 np.uint8(1),
                                 (idx & np.uint64(7)).astype(np.uint8)))
        return bm

    def _or_merge(*bms: np.ndarray) -> np.ndarray:
        out = bms[0].copy()
        for b in bms[1:]:
            np.bitwise_or(out, b, out=out)
        return out

    part = ray.remote(_partial_bitmap)
    refs = [part.remote(r) for r in right.to_arrow_refs()]
    merge = ray.remote(_or_merge)
    while len(refs) > 1:
        refs = [merge.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    bitmap_ref = refs[0]

    def probe(b: pa.Table) -> pa.Table:
        bm = _prepared_bloom(bitmap_ref)
        col = b.column(on).combine_chunks()
        if len(col) == 0:
            return b
        h1, h2 = _two_hashes(col)
        keep = np.ones(len(col), bool)
        for i in range(n_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            bits = bm[(idx >> np.uint64(3)).astype(np.int64)]
            keep &= ((bits >> (idx & np.uint64(7)).astype(np.uint8))
                     & np.uint8(1)).astype(bool)
            if not keep.any():
                break
        return b.filter(pa.array(keep))

    return left.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True)


_BLOOM_CACHE: dict = {}


def _prepared_bloom(ref):
    """Once-per-worker fetch of the broadcast bitmap (zero-copy from
    plasma; the cache avoids per-batch ray.get bookkeeping)."""
    import ray

    key = ref.hex()
    hit = _BLOOM_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _BLOOM_CACHE[key] = hit
        if len(_BLOOM_CACHE) > 8:
            _BLOOM_CACHE.pop(next(iter(_BLOOM_CACHE)))
    return hit


# ---------------------------------------------------------------------------
# Distributed sort-merge join (the above-gate lookup_join tier)
# ---------------------------------------------------------------------------


def _mj_block_range(tbl, on: str):
    """Ray task: ``(n_rows, lo, hi, has_null, nbytes)`` for a block's key
    column (lo/hi None when every key is null). One task serves row
    counts, overlap ranges, null presence AND byte size — the boundary
    scan and the probe-mass guard need all of them and must not pay a
    task wave per fact (review finding, round 4)."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return (0, None, None, False, 0)
    col = tbl.column(on)
    mm = pc.min_max(col)
    has_null = col.null_count > 0
    return (tbl.num_rows, mm["min"].as_py(), mm["max"].as_py(), has_null,
            tbl.nbytes)


def _mj_probe(ltbl, on: str, join_type: str, right_schema, *rtbls):
    """Ray task: probe one sorted left block against its overlapping
    right blocks — the same vectorized ``index_in`` merge (and null /
    empty semantics) as the broadcast tier, so the tiers can't drift."""
    import pyarrow as pa
    import pyarrow.compute as pc

    payload_cols = [c for c in right_schema.names if c != on]
    rtbl = (pa.concat_tables(rtbls).combine_chunks() if rtbls
            else right_schema.empty_table())
    if rtbl.num_rows == 0:
        if join_type == "inner":
            out = ltbl.slice(0, 0)
        else:
            out = ltbl
        for c in payload_cols:
            out = out.append_column(
                c, pa.nulls(out.num_rows, right_schema.field(c).type))
        return out
    pos = pc.index_in(ltbl.column(on), value_set=rtbl.column(on))
    pos = pos.combine_chunks() if isinstance(pos, pa.ChunkedArray) else pos
    if join_type == "inner":
        keep = pc.is_valid(pos)
        out = ltbl.filter(keep)
        idx = pos.filter(keep)
        for c in payload_cols:
            out = out.append_column(c, rtbl.column(c).take(idx))
        return out
    out = ltbl
    for c in payload_cols:
        out = out.append_column(c, rtbl.column(c).take(pos))
    return out


def _mj_hash_fallback(ls, rs, on, join_type, cfg, l_stats, r_stats,
                      r_refs, right_schema):
    """merge_join's over-budget fallback to the streaming hash tier,
    PRESERVING the merge/broadcast tiers' null-key contract (index_in
    matches null-to-null; Acero uses SQL semantics and drops them —
    review finding, round 5). Null handling only matters when BOTH
    sides carry null keys: null-key left rows then take the (unique
    right key ⇒ effectively one) null right row's payload directly, and
    only the non-null rows go through Acero."""
    import pyarrow.compute as pc
    import ray

    l_has_null = any(s[3] for s in l_stats if s[0])
    r_has_null = any(s[3] for s in r_stats if s[0])
    if not (l_has_null and r_has_null):
        # Acero already matches the merge tier here: null left keys
        # match nothing (inner: dropped; left_outer: null payload)
        return hash_join(ls, rs, on=on, join_type=join_type, cfg=cfg)

    def keep_valid(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b.column(on)))

    def keep_null(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_null(b.column(on)))

    main = hash_join(ls.map_batches(keep_valid, batch_format="pyarrow"),
                     rs, on=on, join_type=join_type, cfg=cfg)
    # the first null right row in sorted-block order (the broadcast
    # tier's index_in picks the first null occurrence the same way)
    null_right = None
    for j, (rn_, _rlo, _rhi, rnull, _rb) in enumerate(r_stats):
        if rn_ and rnull:
            t = ray.get(r_refs[j])
            t = t.filter(pc.is_null(t.column(on)))
            if t.num_rows:
                null_right = t.slice(0, 1)
                break
    payload_cols = [c for c in right_schema.names if c != on]

    def tag(b):
        import pyarrow as pa

        out = b
        for c in payload_cols:
            v = null_right.column(c)[0].as_py()
            out = out.append_column(
                c, pa.array([v] * b.num_rows,
                            right_schema.field(c).type))
        return out

    nulls_part = (ls.map_batches(keep_null, batch_format="pyarrow")
                  .map_batches(tag, batch_format="pyarrow"))
    return main.union(nulls_part).materialize()


def merge_join(left, right, *, on, cfg: PipelineConfig,
               join_type: str = "inner"):
    """Distributed SORT-MERGE join on one unique-keyed right column — the
    above-gate ``lookup_join`` tier (same contract: right key unique,
    ``inner`` / ``left_outer``, right payload columns appended after the
    left columns).

    Shape: range-sort BOTH sides on the key (Ray's sort moves the same
    rows far cheaper than its hash-shuffle machinery — the measured basis
    of the round-4 sort rewrites, BASELINE.md), then each left block
    joins against only the right blocks whose key range overlaps its own
    (O(1) amortized once both sides are range-partitioned) with the
    identical ``index_in`` kernel the broadcast tier uses. No aggregator
    actor pools, no full-table gather on any worker. Result blocks are
    plasma-backed (``from_arrow_refs``), i.e. effectively materialized —
    the same fused-join-deadlock guard ``hash_join`` documents."""
    import ray
    import ray.data as rd

    rs = right.sort(on).materialize()
    r_refs = list(rs.to_arrow_refs())
    try:
        right_schema = rs.schema().base_schema
    except AttributeError:  # pragma: no cover — older Schema wrapper
        right_schema = rs.schema()
    if right_schema is None:
        # schema-less right (empty dataset built from no blocks): no
        # payload columns exist to append — mirror the broadcast tier's
        # degenerate semantics EXACTLY so the tiers can't diverge on
        # the same input (review finding, round 5): empty for inner,
        # loud error for left_outer (nulls of unknown type cannot be
        # fabricated)
        if join_type == "inner":
            return left.limit(0)
        raise ValueError("left_outer lookup_join against a schemaless "
                         "empty dataset")
    rng = ray.remote(_mj_block_range)
    r_stats = ray.get([rng.remote(r, on) for r in r_refs])

    ls = left.sort(on).materialize()
    l_refs = list(ls.to_arrow_refs())
    l_stats = ray.get([rng.remote(r, on) for r in l_refs])

    probe = ray.remote(_mj_probe)
    probe_budget = getattr(cfg, "merge_join_probe_max_bytes",
                           1 << 30)
    out_refs = []
    for i, lref in enumerate(l_refs):
        ln, llo, lhi, lnull, _lb = l_stats[i]
        if ln == 0:
            continue
        # a right block overlaps if its non-null range intersects the
        # left block's, OR both sides carry null keys — index_in matches
        # null-to-null exactly like the broadcast tier, so null-key rows
        # must see the null-carrying right blocks REGARDLESS of which
        # sorted block Ray placed them in (review finding, round 4)
        overl = [(r_refs[j], rb) for j, (rn, rlo, rhi, rnull, rb)
                 in enumerate(r_stats)
                 if rn > 0 and ((llo is not None and rlo is not None
                                 and not (rhi < llo or rlo > lhi))
                                or (lnull and rnull))]
        # Probe-mass guard (review finding, round 5): _mj_probe concats
        # every overlapping right block into one task — with a wide left
        # block or a payload-heavy right side that approaches a full
        # right-table gather on one worker (the exact shape behind the
        # round-4 OutOfDiskError in verify). When any single probe would
        # pin more than the budget, route the WHOLE join to the
        # streaming Acero hash tier — both sides are already sorted and
        # materialized, so the fallback re-reads no sources.
        if sum(rb for _, rb in overl) > probe_budget:
            return _mj_hash_fallback(ls, rs, on, join_type, cfg,
                                     l_stats, r_stats, r_refs,
                                     right_schema)
        out_refs.append(probe.remote(lref, on, join_type, right_schema,
                                     *[r for r, _ in overl]))
    if not out_refs:
        try:
            left_schema = ls.schema().base_schema
        except AttributeError:  # pragma: no cover
            left_schema = ls.schema()
        if left_schema is None:
            return ls
        import pyarrow as pa

        fields = list(left_schema) + [right_schema.field(c)
                                      for c in right_schema.names
                                      if c != on]
        return rd.from_arrow(pa.schema(fields).empty_table())
    return rd.from_arrow_refs(out_refs)
