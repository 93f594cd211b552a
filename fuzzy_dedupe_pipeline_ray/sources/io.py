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
        arrow_type = {"inner": "inner", "left_outer": "left outer"}[join_type]
        joined_empty = _empty_arrow(left).join(
            _empty_arrow(right), join_type=arrow_type,
            keys=list(on_t), right_keys=list(r_on_t))
        if join_type == "inner" or n_left == 0:
            return ray.data.from_arrow(joined_empty).materialize()
        # left_outer with an empty right: left rows + null right columns,
        # appended streaming — no shuffle needed
        extra = [f for f in joined_empty.schema
                 if f.name not in _empty_arrow(left).schema.names]

        def add_nulls(b: pa.Table) -> pa.Table:
            for f in extra:
                b = b.append_column(f, pa.nulls(b.num_rows, f.type))
            return b

        return left.map_batches(add_nulls,
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
    actors); otherwise falls back to the distributed ``hash_join`` — the
    100 TB path. Pass ``gate_rows=cfg.wide_broadcast_max_rows`` when the
    right side carries content-sized strings. ``join_type``: "inner" or
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
        return hash_join(left, right, on=on, cfg=cfg, join_type=join_type)

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
