"""Similarity search over an embedding column (``embeddings.parquet``:
vec_id, embedding list<float>, label).

Two paths, per the training-data-ops requirement:

* ``ann_topk`` — brute-force cosine top-k: the query matrix is broadcast
  ONCE via ``ray.put`` and every ``map_batches`` task does one numpy
  matmul per batch, emitting per-batch partial top-k; a final
  groupby(query) merge produces exact global top-k. No full
  materialization of the corpus; scales as one pass over the table.

* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH bucketing
  (signature prefix as bucket key) restricts the exact cosine scoring to
  the query's bucket neighborhood. Approximate (recall < 1 by design) →
  rows-only correctness check.

* ``embedding_near_dup_pairs`` — all pairs with cosine ≥ threshold: the
  exact embedding-cosine near-dup operator as a block-pair join (each
  task streams corpus blocks from the object store; the driver never
  materializes the table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def read_embeddings(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _to_matrix(batch: pa.Table) -> "tuple[np.ndarray, np.ndarray]":
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    arr = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return ids, flat.reshape(len(ids), -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def _embedding_dim(sf_dir: str) -> int:
    """Vector dimension, probed from ONE row (not a full column read)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(first.column("embedding")[0])


def _query_matrix(sf_dir: str, n_queries: int):
    """First n_queries rows by vec_id — deterministic query set.

    Top-k-by-min-id as a distributed partial: each batch keeps its
    n_queries smallest vec_ids, the driver merges the tiny partials —
    never a full-table driver read or global sort."""
    def partial_min(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        k = min(n_queries, len(ids))
        keep = np.argpartition(ids, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
        return batch.take(pa.array(np.sort(keep)))

    partials = read_embeddings(sf_dir).map_batches(
        partial_min, batch_format="pyarrow", zero_copy_batch=True)
    t = pa.concat_tables(
        [b for b in partials.iter_batches(batch_format="pyarrow")])
    idx = pa.compute.sort_indices(t, sort_keys=[("vec_id", "ascending")])
    t = t.take(idx).slice(0, n_queries)
    ids, m = _to_matrix(t)
    return ids, _normalize(m)


def ann_topk(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Exact cosine top-k per query: (qid, vec_id, rank), rank 1..k by
    (similarity DESC, vec_id ASC) — integer-only output so the DuckDB
    oracle (list_cosine_similarity + row_number) hashes identically."""
    q_ids, q = _query_matrix(sf_dir, n_queries)
    q_ref = ray.put((q_ids, q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids, m = _to_matrix(batch)
        sims = _normalize(m) @ qm.T          # (batch, nq)
        out = {"qid": [], "vec_id": [], "sim": []}
        kk = min(k, len(ids))
        for j, qid in enumerate(qi):
            s = sims[:, j]
            # partial top-k inside the batch (keeps the shuffle tiny)
            part = np.argpartition(-s, kk - 1)[:kk]
            order = part[np.lexsort((ids[part], -s[part]))]
            out["qid"].extend([qid] * len(order))
            out["vec_id"].extend(ids[order].tolist())
            out["sim"].extend(s[order].tolist())
        return pa.table({"qid": pa.array(out["qid"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "sim": pa.array(out["sim"], pa.float64())})

    partials = read_embeddings(sf_dir).map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge_topk(g: pa.Table) -> pa.Table:
        qid = g.column("qid")[0].as_py()
        ids = g.column("vec_id").to_numpy()
        sims = g.column("sim").to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "qid": pa.array([qid] * len(order), pa.int64()),
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return partials.groupby("qid").map_groups(
        merge_topk, batch_format="pyarrow").sort(["qid", "rank"])


#: per-worker cache of decoded block matrices, keyed by block-ref hex —
#: ray.get from plasma is zero-copy, but the Arrow→numpy reshape/normalize
#: should happen once per worker per block, not once per (batch, block).
_BLOCK_CACHE: dict = {}


def _block_matrix(ref):
    key = ref.hex()
    hit = _BLOCK_CACHE.get(key)
    if hit is None:
        tbl = ray.get(ref)
        ids, m = _to_matrix(tbl)
        hit = (ids, _normalize(m))
        _BLOCK_CACHE[key] = hit
        if len(_BLOCK_CACHE) > 64:
            _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))
    return hit


#: embedding_near_dup_pairs is EXACT all-pairs — O(n²·d) compute by its
#: definition. Above this row count the quadratic term is no longer a
#: sandbox-scale convenience (2M rows ≈ 4·10¹² dot products) and the call
#: fails loudly instead of silently burning a cluster; the sub-quadratic
#: operators (ann_lsh_topk multi-probe buckets, ann_ivf_topk cells) are
#: the 100 TB path for near-neighbor discovery.
EXACT_PAIRS_MAX_ROWS = 2_000_000


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.4,
                             max_rows: int = EXACT_PAIRS_MAX_ROWS):
    """All (id_a < id_b) pairs with cosine ≥ threshold — the EXACT
    embedding-cosine near-dup operator (contrast ``ann_lsh_topk``, the
    approximate sub-quadratic path).

    Block-pair join shape: the corpus is materialized into object-store
    blocks; every ``map_batches`` task streams the block list (zero-copy
    ``ray.get`` per block, decoded once per worker via ``_BLOCK_CACHE``)
    and runs one blocked matmul per (batch, block). The DRIVER never
    reads the table — it holds only block refs. Total compute is O(n²·d)
    and total object-store traffic O(n·num_blocks), both inherent to
    exact all-pairs cosine; per-task memory is one batch plus one block.
    Inputs beyond ``max_rows`` are rejected loudly (see
    ``EXACT_PAIRS_MAX_ROWS``) — tested by ``tests/test_ann.py``.
    """
    ds = read_embeddings(sf_dir).materialize()
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_near_dup_pairs is exact all-pairs (O(n²·d)); "
            f"{n} rows exceeds max_rows={max_rows}. Use the sub-quadratic "
            f"operators (ann_lsh_topk / ann_ivf_topk) at this scale, or "
            f"raise max_rows explicitly if the quadratic cost is intended.")
    refs = list(ds.to_arrow_refs())

    def pairs(batch: pa.Table) -> pa.Table:
        ids, m = _to_matrix(batch)
        mn = _normalize(m)
        out_a, out_b = [], []
        for ref in refs:
            bids, bm = _block_matrix(ref)
            if len(bids) == 0:
                continue
            sims = mn @ bm.T
            ii, jj = np.where(sims >= threshold)
            a = ids[ii]
            b = bids[jj]
            keep = a < b
            out_a.append(a[keep])
            out_b.append(b[keep])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64())})

    return ds.map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["id_a", "id_b"])


def embedding_cc_clusters(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-dup DEDUPE: exact cosine pairs → connected
    components → ``(vec_id, cluster_id)`` with cluster_id = min member id
    (singletons label themselves).

    This is the clustering form of ``embedding_near_dup_pairs`` — the
    pair threshold graph run through the same CC engine the flagship
    uses (``stages/cc.py``), so the whole chain pairs→CC→labels gets a
    FULL exact DuckDB oracle (transitive closure via a recursive CTE),
    not just an invariant check. Scale path: swap the exact pair source
    for the LSH-bucketed candidates; the CC + labeling stages are shared.
    """
    import pyarrow.compute as pc

    from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join
    from fuzzy_dedupe_pipeline_ray.stages.cc import connected_components

    pairs = embedding_near_dup_pairs(sf_dir, threshold)
    labels = connected_components(pairs, DEFAULT_CONFIG)
    ids = read_embeddings(sf_dir).map_batches(
        lambda b: b.select(["vec_id"]).rename_columns(["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j = lookup_join(ids, labels, on="doc_id", cfg=DEFAULT_CONFIG,
                    join_type="left_outer")

    def out(b: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": b.column("doc_id"),
            "cluster_id": pc.coalesce(b.column("label"),
                                      b.column("doc_id")),
        })

    return j.map_batches(out, batch_format="pyarrow").sort("vec_id")


def _kmeans_centroids(sf_dir: str, n_centroids: int, iters: int = 3):
    """Deterministic spherical k-means over the embedding column,
    expressed Ray-Data-first: each Lloyd iteration is ONE streaming pass —
    ``map_batches`` emits per-batch partial (centroid, sum-vector, count)
    rows, the driver reduces the tiny partials and renormalizes. No
    full-table materialization; the centroid matrix (k × d) is broadcast
    per iteration via the task closure. Init = the ``n_centroids``
    smallest vec_ids (deterministic)."""
    ids, init = _query_matrix(sf_dir, n_centroids)
    cents = init.copy()
    for _ in range(iters):
        c_ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            _, m = _to_matrix(batch)
            mn = _normalize(m)
            assign = np.argmax(mn @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, mn)
            counts = np.bincount(assign, minlength=c.shape[0])
            return pa.table({
                "cid": pa.array(np.arange(c.shape[0]), pa.int64()),
                "vec_sum": pa.array(sums.tolist(),
                                    pa.list_(pa.float64())),
                "n": pa.array(counts, pa.int64()),
            })

        acc = np.zeros_like(cents)
        cnt = np.zeros(cents.shape[0], dtype=np.int64)
        for b in read_embeddings(sf_dir).map_batches(
                partials, batch_format="pyarrow",
                zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
            cids = b.column("cid").to_numpy()
            sums = np.array(b.column("vec_sum").to_pylist())
            acc[cids] += sums
            cnt[cids] += b.column("n").to_numpy()
        nz = cnt > 0
        cents[nz] = _normalize(acc[nz])
        # empty centroids keep their previous position (deterministic)
    return cents


def ann_ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 n_centroids: int = 16, nprobe: int = 4):
    """IVF-style approximate top-k: vectors are assigned to their nearest
    spherical-k-means centroid (the inverted-file cell); each query scores
    only the cells of its ``nprobe`` nearest centroids. Same output schema
    as ann_topk; approximate by design → rows-only driver check, recall
    asserted by tests against the exact oracle."""
    cents = _kmeans_centroids(sf_dir, n_centroids)
    q_ids, q = _query_matrix(sf_dir, n_queries)
    q_cells = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    ref = ray.put((cents, q_ids, q, q_cells))

    def partial(batch: pa.Table) -> pa.Table:
        c, qi, qm, qc = ray.get(ref)
        ids, m = _to_matrix(batch)
        mn = _normalize(m)
        cells = np.argmax(mn @ c.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qi):
            mask = np.isin(cells, qc[j])
            if not mask.any():
                continue
            s = mn[mask] @ qm[j]
            sel = ids[mask]
            kk = min(k, len(sel))
            part = np.argpartition(-s, kk - 1)[:kk]
            order = part[np.lexsort((sel[part], -s[part]))]
            out_q.extend([qid] * len(order))
            out_v.extend(sel[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = read_embeddings(sf_dir).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        qid = g.column("qid")[0].as_py()
        ids = g.column("vec_id").to_numpy()
        sims = g.column("sim").to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "qid": pa.array([qid] * len(order), pa.int64()),
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return partials.groupby("qid").map_groups(
        merge, batch_format="pyarrow").sort(["qid", "rank"])


def _result_sets(ds) -> "dict[int, set]":
    out: "dict[int, set]" = {}
    for b in ds.iter_batches(batch_format="pyarrow"):  # nq·k rows, tiny
        for qid, vid in zip(b.column("qid").to_pylist(),
                            b.column("vec_id").to_pylist()):
            out.setdefault(qid, set()).add(vid)
    return out


def ann_lsh_recall_check(sf_dir: str, n_queries: int = 5, k: int = 10,
                         floor: float = 0.8):
    """Oracle-able INVARIANT over the multi-probe cosine-LSH top-k: per
    query, recall vs the exact ``ann_topk`` must clear ``floor``. The Ray
    side computes the boolean from the REAL approximate output against the
    REAL exact output; the DuckDB oracle states the invariant (all-true
    over the query ids), so a regression that guts the probing (broken
    bucket key, dead flip set) hash-fails the driver gate even though the
    approximate semantics are not SQL-expressible. The floor sits below
    the ≥0.9 mean recall the unit tests assert (tests/test_ann.py) — the
    oracle pins "the operator works", the tests pin the quality bar."""
    ex = _result_sets(ann_topk(sf_dir, n_queries, k))
    ap = _result_sets(ann_lsh_topk(sf_dir, n_queries, k))
    qids = sorted(ex)
    ok = [len(ap.get(q, set()) & ex[q]) >= floor * len(ex[q]) for q in qids]
    return ray.data.from_arrow(pa.table({
        "qid": pa.array(qids, pa.int64()),
        "recall_ok": pa.array(ok, pa.bool_()),
    }))


def ann_ivf_recall_check(sf_dir: str, n_queries: int = 5, k: int = 10,
                         n_centroids: int = 16):
    """Oracle-able INVARIANT over the IVF top-k: at ``nprobe ==
    n_centroids`` the cell restriction admits every vector, so the result
    must EQUAL the exact ``ann_topk`` per query (same tie-breaking) — the
    partition-completeness degeneracy ``tests/test_ann.py`` also asserts.
    Deterministically all-true, unlike a recall floor at partial nprobe:
    the synthetic embeddings are near-uniform on the sphere (IVF's
    worst-case input), so partial-probe recall is data-luck; completeness
    is not. Pins centroid assignment, cell routing, and the top-k merge."""
    ex = _result_sets(ann_topk(sf_dir, n_queries, k))
    ap = _result_sets(ann_ivf_topk(sf_dir, n_queries, k,
                                   n_centroids=n_centroids,
                                   nprobe=n_centroids))
    qids = sorted(ex)
    ok = [ap.get(q, set()) == ex[q] for q in qids]
    return ray.data.from_arrow(pa.table({
        "qid": pa.array(qids, pa.int64()),
        "recall_ok": pa.array(ok, pa.bool_()),
    }))


class _HyperplaneHasher:
    """Actor-pool state: ``n_tables`` independent random hyperplane banks
    (the canonical L-tables × k-planes cosine-LSH layout), drawn once per
    actor from a fixed seed (deterministic across the pool). Emits one
    int64 bucket column per table."""

    def __init__(self, dim: int, n_planes: int, n_tables: int = 1,
                 seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_tables * n_planes)
        self.n_planes = n_planes
        self.n_tables = n_tables

    def keys(self, mn: np.ndarray) -> np.ndarray:
        """(m, d) normalized matrix → (m, n_tables) int64 bucket keys."""
        bits = (mn @ self.planes) > 0
        bits = bits.reshape(len(mn), self.n_tables, self.n_planes)
        weights = (np.int64(1) << np.arange(self.n_planes,
                                            dtype=np.int64))
        return (bits.astype(np.int64) * weights).sum(axis=2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _to_matrix(batch)
        keys = self.keys(_normalize(m))
        cols = {"vec_id": pa.array(ids, pa.int64())}
        for t in range(self.n_tables):
            cols[f"bucket_{t}"] = pa.array(keys[:, t], pa.int64())
        cols["embedding"] = batch.column("embedding")
        return pa.table(cols)


def ann_lsh_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 n_planes: int = 6, n_tables: int = 12,
                 n_probe_bits: int = 1):
    """Approximate top-k via the canonical cosine-LSH layout: ``n_tables``
    independent banks of ``n_planes`` hyperplanes; a vector is a candidate
    for a query when ANY table puts it within ``n_probe_bits`` bit flips
    of the query's bucket (multi-probe — each flipped bit probes the
    adjacent half-space, the standard recall fix for neighbors just
    across a hyperplane; public technique, Lv et al. VLDB'07).

    Recall vs the exact ``ann_topk`` is asserted ≥ 0.9 by
    ``tests/test_ann.py``. The recall/selectivity trade is tunable: the
    defaults are sized for the ~70-75° neighbor angles of the synthetic
    fixture (per-table hit ≈ 0.25 ⇒ miss ≈ 0.75¹² ≈ 0.03); real embedding
    corpora with clustered structure reach the same recall with far fewer
    probes. Same output schema as ann_topk."""
    dim = _embedding_dim(sf_dir)
    q_ids, q = _query_matrix(sf_dir, n_queries)
    hasher = _HyperplaneHasher(dim, n_planes, n_tables)
    q_keys = hasher.keys(q)                     # (nq, n_tables)
    # probe set per (query, table): the bucket itself + every ≤n_probe_bits flip
    flips = [np.int64(0)]
    if n_probe_bits >= 1:
        flips += [np.int64(1) << j for j in range(n_planes)]
    if n_probe_bits >= 2:
        flips += [(np.int64(1) << i) | (np.int64(1) << j)
                  for i in range(n_planes) for j in range(i + 1, n_planes)]
    # (nq, n_tables, n_flips)
    q_probe = q_keys[:, :, None] ^ np.array(flips, dtype=np.int64)[None, None, :]
    q_ref = ray.put((q_ids, q, q_probe))

    bucketed = read_embeddings(sf_dir).map_batches(
        _HyperplaneHasher, fn_constructor_args=(dim, n_planes, n_tables),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=2)

    def partial(batch: pa.Table) -> pa.Table:
        qi, qm, qp = ray.get(q_ref)
        ids, m = _to_matrix(batch.select(["vec_id", "embedding"]))
        buckets = np.stack([batch.column(f"bucket_{t}").to_numpy()
                            for t in range(n_tables)], axis=1)
        out_q, out_v, out_s = [], [], []
        mn = _normalize(m)
        for j, qid in enumerate(qi):
            mask = np.zeros(len(ids), dtype=bool)
            for t in range(n_tables):
                mask |= np.isin(buckets[:, t], qp[j, t])
            if not mask.any():
                continue
            s = mn[mask] @ qm[j]
            sel_ids = ids[mask]
            kk = min(k, len(sel_ids))
            part = np.argpartition(-s, kk - 1)[:kk]
            order = part[np.lexsort((sel_ids[part], -s[part]))]
            out_q.extend([qid] * len(order))
            out_v.extend(sel_ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = bucketed.map_batches(partial, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        qid = g.column("qid")[0].as_py()
        ids = g.column("vec_id").to_numpy()
        sims = g.column("sim").to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "qid": pa.array([qid] * len(order), pa.int64()),
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return partials.groupby("qid").map_groups(
        merge, batch_format="pyarrow").sort(["qid", "rank"])


def ann_range_search(sf_dir: str, n_queries: int = 5,
                     threshold: float = 0.3):
    """Radius (range) search: every vector with cosine ≥ ``threshold`` to
    each of the first ``n_queries`` query vectors, excluding the query
    itself. Output: (qid, vec_id) — integer-only for the oracle compare.

    The no-shuffle companion to :func:`ann_topk`: the tiny query matrix
    broadcasts once via ``ray.put``, every batch emits its own hits
    locally (one matmul + boolean mask), and only the final result sort
    moves data. At 100 TB this is a single streaming pass."""
    q_ids, q = _query_matrix(sf_dir, n_queries)
    q_ref = ray.put((q_ids, q))

    def emit(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids, m = _to_matrix(batch)
        sims = _normalize(m) @ qm.T          # (batch, nq)
        bi, qj = np.nonzero(sims >= threshold)
        qid = qi[qj]
        vid = ids[bi]
        keep = qid != vid                    # a query always matches itself
        return pa.table({"qid": pa.array(qid[keep], pa.int64()),
                         "vec_id": pa.array(vid[keep], pa.int64())})

    return read_embeddings(sf_dir).map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["qid", "vec_id"])


CENTROID_SCALE = 1_000_000


def embedding_label_centroid(sf_dir: str):
    """Per-label centroid sums over the embedding column — the vector
    AGGREGATE shape (cluster centroids, class prototypes). Each batch
    reduces to an (n_labels × dim) partial via one np.add.at, emitted as
    long-form (label, dim, sum_e6, n) rows; a tiny groupby merges the
    partials, so the shuffle carries |labels|·dim rows per block, never
    vectors. Elements are floor(x·1e6) int64 BEFORE summing (float32 →
    float64 is exact, floor is IEEE-identical in numpy and DuckDB), so
    the integer sums are order-independent and the oracle compare exact.
    Output: (label, dim, sum_e6, n)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy().astype(np.int64)
        emb = b.column("embedding")
        arr = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // max(len(lab), 1)
        m = np.floor(flat.astype(np.float64) * CENTROID_SCALE).astype(
            np.int64).reshape(len(lab), dim)
        labels, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(labels), dim), np.int64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(labels)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(labels, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                    len(labels))),
            "sum_e6": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts, dim)),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["label", "dim"])
              .aggregate(Sum("sum_e6", alias_name="sum_e6"),
                         Sum("n", alias_name="n")))

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "label": pc.cast(b.column("label"), pa.int64()),
            "dim": pc.cast(b.column("dim"), pa.int64()),
            "sum_e6": pc.cast(b.column("sum_e6"), pa.int64()),
            "n": pc.cast(b.column("n"), pa.int64()),
        })

    return merged.map_batches(final, batch_format="pyarrow").sort(
        ["label", "dim"])


# ---------------------------------------------------------------------------
# kNN self-join graph — the literal FAISS-self-search analog (SURVEY
# ST2/J1: reference processor.py:120-150 builds IndexFlatIP over the
# whole set and self-searches k neighbors per record)
# ---------------------------------------------------------------------------

_KNN_GRAPH_MAX_ROWS = 2_000_000


def embedding_knn_graph(sf_dir: str, k: int = 5):
    """Exact cosine k-nearest-neighbor graph over ALL vectors: for each
    vector its top-k neighbors (self excluded) by (similarity DESC,
    vec_id ASC) — the reference's FAISS self-search reproduced as a
    block-broadcast matmul: the normalized matrix broadcasts once via
    ``ray.put`` (N·d floats — gated below), each batch computes one
    (batch × N) GEMM and keeps only its k winners, so the shuffle
    carries k ints per vector and the driver none. Above the gate the
    documented scale path is the LSH/IVF variants (``ann_lsh_topk``,
    ``ann_ivf_topk``) — exact all-pairs kNN at 100 TB is not a thing
    any engine does. Output: (vec_id, neighbor_id, rank 1..k)."""
    import ray

    from fuzzy_dedupe_pipeline_ray.sources.io import to_local_table

    full = to_local_table(read_embeddings(sf_dir).materialize())
    if full is None or full.num_rows == 0:
        return ray.data.from_arrow(pa.schema(
            [("vec_id", pa.int64()), ("neighbor_id", pa.int64()),
             ("rank", pa.int64())]).empty_table())
    if full.num_rows > _KNN_GRAPH_MAX_ROWS:
        raise ValueError(
            f"embedding_knn_graph is the exact small-N operator "
            f"({full.num_rows} rows > {_KNN_GRAPH_MAX_ROWS}); use "
            f"ann_lsh_topk / ann_ivf_topk for the approximate scale path")
    all_ids, all_m = _to_matrix(full)
    ref = ray.put((all_ids, _normalize(all_m)))

    def batch_knn(batch: pa.Table) -> pa.Table:
        bank_ids, bank = ray.get(ref)        # zero-copy plasma read
        ids, m = _to_matrix(batch)
        sims = _normalize(m) @ bank.T        # (batch, N)
        kk = min(k, len(bank_ids) - 1)
        if kk <= 0 or len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        B = len(ids)
        sims[bank_ids[None, :] == ids[:, None]] = -np.inf  # exclude self
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        ps = np.take_along_axis(sims, part, axis=1)
        pid = bank_ids[part]
        rows = np.repeat(np.arange(B), kk)
        # row-wise (sim DESC, id ASC) via ONE flattened lexsort
        order = np.lexsort((pid.ravel(), -ps.ravel(), rows))
        return pa.table({
            "vec_id": pa.array(ids[rows], pa.int64()),
            "neighbor_id": pa.array(pid.ravel()[order], pa.int64()),
            "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64),
                                     B)),
        })

    return (read_embeddings(sf_dir)
            .map_batches(batch_knn, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sort(["vec_id", "rank"]))


_PR_SCALE = 1_000_000_000_000  # rank unit: 1e-12 (int64 throughout)


def embedding_pagerank(sf_dir: str, k: int = 5, n_iters: int = 3,
                       damping_pct: int = 85):
    """PageRank over the exact cosine kNN graph — the iterative
    fixed-point operator class (power iteration as repeated
    join+groupby rounds), in PURE int64 arithmetic so the result is
    bit-identical under any partitioning / summation order AND exactly
    reproducible by an unrolled SQL oracle:

        r0(v)   = SCALE // N
        r_t(v)  = (100-d)·(SCALE // N) // 100
                  + d · Σ_{u→v} (r_{t-1}(u) // out_deg(u)) // 100

    (integer floor division drops sub-unit mass deterministically; the
    invariant "total rank ≤ SCALE" still holds).

    Scale shape: each iteration is edges ⋈ ranks through the tiered
    ``lookup_join`` (broadcast under the gate, distributed hash join
    above — ranks are one int64 row per node), a per-batch grouped-sum
    partial, and one narrow groupby(dst); nodes with no in-edges keep
    the teleport term via a left-outer rank refresh. The kNN edge list
    itself comes from ``embedding_knn_graph`` (gated exact operator;
    swap in ``ann_lsh_topk`` edges for the >2M-row approximate path).
    Output: (vec_id, rank_e12) sorted by vec_id."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG
    from fuzzy_dedupe_pipeline_ray.pipelines.relational import \
        _group_sum_partial
    from fuzzy_dedupe_pipeline_ray.sources.io import (lookup_join,
                                                      to_local_table)

    cfg = DEFAULT_CONFIG
    out_schema = pa.schema([("vec_id", pa.int64()),
                            ("rank_e12", pa.int64())])
    n = read_embeddings(sf_dir).count()
    if n == 0:
        return out_schema.empty_table()
    base = _PR_SCALE // n
    teleport = (100 - damping_pct) * base // 100

    edges = embedding_knn_graph(sf_dir, k=k).map_batches(
        lambda b: pa.table({"src": pc.cast(b.column("vec_id"), pa.int64()),
                            "dst": pc.cast(b.column("neighbor_id"),
                                           pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    if edges.count() == 0:
        # no edges (N == 1): the fixed point after one iteration is the
        # bare teleport term for every node
        ids = to_local_table(read_embeddings(sf_dir)
                             .select_columns(["vec_id"]))
        ids_sorted = pc.cast(ids.column("vec_id"), pa.int64())
        rank = teleport if n_iters > 0 else base
        return pa.table({
            "vec_id": ids_sorted.take(pc.sort_indices(ids_sorted)),
            "rank_e12": pa.array(np.full(ids.num_rows, rank, np.int64))},
            schema=out_schema)

    deg = (edges.map_batches(
        lambda b: _group_sum_partial(
            {"src": b.column("src").to_numpy()},
            {"deg": np.ones(b.num_rows, np.int64)}),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("src").aggregate(Sum("deg", alias_name="deg"))
        .materialize())

    # node universe: every vec_id, as a (node → rank) dataset
    ranks = read_embeddings(sf_dir).map_batches(
        lambda b: pa.table({
            "src": pc.cast(b.column("vec_id"), pa.int64()),
            "rank_e12": pa.array(
                np.full(b.num_rows, base, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    d_pct = damping_pct
    n_deg = deg.count()
    for _ in range(n_iters):
        # per-edge contribution r(u) // deg(u), summed per dst
        withdeg = lookup_join(ranks, deg, on="src", cfg=cfg,
                              right_count=n_deg)
        j = lookup_join(edges, withdeg, on="src", cfg=cfg)
        contrib = (j.map_batches(
            lambda b: _group_sum_partial(
                {"src": b.column("dst").to_numpy()},
                {"c": b.column("rank_e12").to_numpy()
                 // b.column("deg").to_numpy()}),
            batch_format="pyarrow", zero_copy_batch=True)
            .groupby("src").aggregate(Sum("c", alias_name="c"))
            .materialize())
        nodes = ranks.select_columns(["src"])
        refreshed = lookup_join(nodes, contrib, on="src", cfg=cfg,
                                join_type="left_outer",
                                right_count=contrib.count())
        ranks = refreshed.map_batches(
            lambda b: pa.table({
                "src": b.column("src"),
                "rank_e12": pa.array(
                    teleport + d_pct * pc.fill_null(
                        pc.cast(b.column("c"), pa.int64()), 0).to_numpy()
                    // 100)}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    out = to_local_table(ranks)
    res = pa.table({"vec_id": out.column("src"),
                    "rank_e12": out.column("rank_e12")},
                   schema=out_schema)
    import pyarrow.compute as _pc
    return res.take(_pc.sort_indices(res, sort_keys=[("vec_id",
                                                      "ascending")]))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compression ANN scale path
# ---------------------------------------------------------------------------

def _pq_codebooks(sf_dir: str, n_sub: int, n_codes: int, iters: int = 3):
    """Product-quantization codebooks (Jégou/Douze/Schmid, TPAMI 2011 —
    public method): split each L2-normalized vector into ``n_sub``
    contiguous subspaces and k-means each subspace to ``n_codes``
    codewords. Trained like ``_kmeans_centroids``: one streaming pass per
    Lloyd iteration, ALL subspaces reduced in the same pass (partial rows
    keyed by (sub, cid)); init = the sub-slices of the ``n_codes``
    smallest vec_ids (deterministic). Codewords are subspace MEANS (not
    re-normalized — PQ minimizes per-subspace L2 error). Returns
    ``(n_sub, n_codes, d_sub)`` float64."""
    _, init = _query_matrix(sf_dir, n_codes)
    d = init.shape[1]
    if d % n_sub:
        raise ValueError(f"embedding dim {d} not divisible by n_sub={n_sub}")
    d_sub = d // n_sub
    books = np.stack([init[:, s * d_sub:(s + 1) * d_sub].copy()
                      for s in range(n_sub)])
    for _ in range(iters):
        ref = ray.put(books)

        def partials(batch: pa.Table) -> pa.Table:
            bk = ray.get(ref)
            _, m = _to_matrix(batch)
            mn = _normalize(m)
            ns, nc, dsub = bk.shape
            sub_col, cid_col, sum_col, n_col = [], [], [], []
            for s in range(ns):
                x = mn[:, s * dsub:(s + 1) * dsub]
                c = bk[s]
                # nearest codeword by L2 ⇔ argmax(x·c − ‖c‖²/2)
                assign = np.argmax(x @ c.T - 0.5 * (c * c).sum(1), axis=1)
                sums = np.zeros_like(c)
                np.add.at(sums, assign, x)
                counts = np.bincount(assign, minlength=nc)
                sub_col.extend([s] * nc)
                cid_col.extend(range(nc))
                sum_col.extend(sums.tolist())
                n_col.extend(counts.tolist())
            return pa.table({
                "sub": pa.array(sub_col, pa.int64()),
                "cid": pa.array(cid_col, pa.int64()),
                "vec_sum": pa.array(sum_col, pa.list_(pa.float64())),
                "n": pa.array(n_col, pa.int64()),
            })

        acc = np.zeros_like(books)
        cnt = np.zeros((n_sub, n_codes), dtype=np.int64)
        for b in read_embeddings(sf_dir).map_batches(
                partials, batch_format="pyarrow",
                zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
            subs = b.column("sub").to_numpy()
            cids = b.column("cid").to_numpy()
            sums = np.array(b.column("vec_sum").to_pylist())
            acc[subs, cids] += sums
            cnt[subs, cids] += b.column("n").to_numpy()
        nz = cnt > 0
        books[nz] = acc[nz] / cnt[nz][:, None]
        # empty codewords keep their previous position (deterministic)
    return books


def _pq_assign(mn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m, d) normalized matrix → (m, n_sub) uint8 codes."""
    ns, _, dsub = books.shape
    codes = np.empty((mn.shape[0], ns), np.uint8)
    for s in range(ns):
        c = books[s]
        codes[:, s] = np.argmax(
            mn[:, s * dsub:(s + 1) * dsub] @ c.T - 0.5 * (c * c).sum(1),
            axis=1)
    return codes


def _pq_encode(sf_dir: str, books: np.ndarray):
    """Encode the embedding table to ``(vec_id, code)`` where ``code`` is
    ``n_sub`` bytes of ``fixed_size_binary`` — d·8 / n_sub compression
    (64× at d=64, n_sub=8). This materialized table is what a 100 TB
    deployment keeps hot: approximate scoring streams over CODES ONLY;
    raw vectors are touched again only for the shortlist rerank."""
    ref = ray.put(books)
    n_sub = books.shape[0]

    def enc(batch: pa.Table) -> pa.Table:
        bk = ray.get(ref)
        ids, m = _to_matrix(batch)
        codes = _pq_assign(_normalize(m), bk)
        arr = pa.Array.from_buffers(
            pa.binary(n_sub), len(ids),
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "code": arr})

    return read_embeddings(sf_dir).map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True)


def ann_pq_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                n_sub: int = 8, n_codes: int = 16,
                rerank_mult: "int | None" = 10):
    """PQ asymmetric-distance top-k (ADC + exact rerank, the IVFADC+R
    shape of Jégou et al.): queries stay exact; each encoded vector's
    approximate cosine is Σ_s LUT[q, s, code_s] where LUT = q-subvector ·
    codebook — one table lookup per subspace, no raw vector touched.
    The per-query approximate shortlist (``rerank_mult``·k ids) is then
    reranked EXACTLY in one streaming pass over the raw embeddings
    restricted to the broadcast shortlist id set. ``rerank_mult=None``
    short-lists every vector, making the result provably identical to
    ``ann_topk`` (the completeness degeneracy ``ann_pq_recall_check``
    pins). Output schema matches ann_topk: (qid, vec_id, rank)."""
    books = _pq_codebooks(sf_dir, n_sub, n_codes)
    encoded = _pq_encode(sf_dir, books).materialize()
    q_ids, q = _query_matrix(sf_dir, n_queries)
    dsub = q.shape[1] // n_sub
    # LUT[j, s, c] = q_j[sub s] · codebook[s, c]
    lut = np.einsum("jsd,scd->jsc",
                    q.reshape(len(q_ids), n_sub, dsub), books)
    shortlist_n = None if rerank_mult is None else rerank_mult * k
    ref = ray.put((q_ids, lut))

    def approx_partial(batch: pa.Table) -> pa.Table:
        qi, lt = ray.get(ref)
        ids = batch.column("vec_id").to_numpy()
        code_col = batch.column("code")
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        codes = np.frombuffer(
            code_col.buffers()[1], np.uint8,
            count=len(ids) * n_sub,
            offset=code_col.offset * n_sub).reshape(-1, n_sub)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qi):
            s = np.zeros(len(ids))
            for sub in range(n_sub):
                s += lt[j, sub][codes[:, sub]]
            nn = len(ids) if shortlist_n is None else min(shortlist_n,
                                                          len(ids))
            part = (np.argpartition(-s, nn - 1)[:nn]
                    if nn < len(ids) else np.arange(len(ids)))
            out_q.extend([qid] * nn)
            out_v.extend(ids[part].tolist())
            out_s.extend(s[part].tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = encoded.map_batches(approx_partial, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def shortlist_merge(g: pa.Table) -> pa.Table:
        qid = g.column("qid")[0].as_py()
        ids = g.column("vec_id").to_numpy()
        sims = g.column("sim").to_numpy()
        nn = len(ids) if shortlist_n is None else min(shortlist_n, len(ids))
        order = np.lexsort((ids, -sims))[:nn]
        return pa.table({"qid": pa.array([qid] * nn, pa.int64()),
                         "vec_id": pa.array(ids[order], pa.int64())})

    short = partials.groupby("qid").map_groups(
        shortlist_merge, batch_format="pyarrow")

    # exact rerank: ONE streaming pass over raw embeddings restricted to
    # the union of the per-query shortlists (tiny: nq · rerank_mult · k)
    sl: "dict[int, set]" = {}
    for b in short.iter_batches(batch_format="pyarrow"):
        for qid, vid in zip(b.column("qid").to_pylist(),
                            b.column("vec_id").to_pylist()):
            sl.setdefault(qid, set()).add(vid)
    member_ids = np.array(sorted(set().union(*sl.values()) if sl else []),
                          np.int64)
    sl_masks = {qid: np.isin(member_ids, sorted(vids))
                for qid, vids in sl.items()}
    r_ref = ray.put((q_ids, q, member_ids, sl_masks))

    def rerank_partial(batch: pa.Table) -> pa.Table:
        qi, qm, mem, masks = ray.get(r_ref)
        ids, m = _to_matrix(batch)
        pos = np.searchsorted(mem, ids)
        np.minimum(pos, max(len(mem) - 1, 0), out=pos)
        hit = (mem[pos] == ids) if len(mem) else np.zeros(len(ids), bool)
        if not hit.any():
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids, mn, pos = ids[hit], _normalize(m)[hit], pos[hit]
        sims = mn @ qm.T
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qi):
            sel = masks[qid][pos]
            if not sel.any():
                continue
            s, si = sims[sel, j], ids[sel]
            kk = min(k, len(si))
            part = np.argpartition(-s, kk - 1)[:kk] if kk < len(si) \
                else np.arange(len(si))
            out_q.extend([qid] * len(part))
            out_v.extend(si[part].tolist())
            out_s.extend(s[part].tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    rer = read_embeddings(sf_dir).map_batches(
        rerank_partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge_topk(g: pa.Table) -> pa.Table:
        qid = g.column("qid")[0].as_py()
        ids = g.column("vec_id").to_numpy()
        sims = g.column("sim").to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "qid": pa.array([qid] * len(order), pa.int64()),
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return rer.groupby("qid").map_groups(
        merge_topk, batch_format="pyarrow").sort(["qid", "rank"])


def ann_pq_recall_check(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Oracle-able INVARIANT over the PQ top-k: with ``rerank_mult=None``
    the shortlist admits every vector and the exact rerank must EQUAL
    ``ann_topk`` per query (same tie-breaking) — deterministically
    all-true regardless of codebook quality, like the IVF completeness
    check. Pins the encode→LUT→shortlist→rerank plumbing end-to-end;
    partial-shortlist recall quality is asserted by tests/test_ann.py
    (data-dependent, so not a driver gate)."""
    ex = _result_sets(ann_topk(sf_dir, n_queries, k))
    ap = _result_sets(ann_pq_topk(sf_dir, n_queries, k, rerank_mult=None))
    qids = sorted(ex)
    ok = [ap.get(q, set()) == ex[q] for q in qids]
    return ray.data.from_arrow(pa.table({
        "qid": pa.array(qids, pa.int64()),
        "recall_ok": pa.array(ok, pa.bool_()),
    }))
