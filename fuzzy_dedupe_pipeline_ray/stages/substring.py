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
broadcast-id-set semi-join filter over the input — never a shuffle of the
full content column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.functions.hashing import char_shingle_hashes
from fuzzy_dedupe_pipeline_ray.stages.fingerprint import normalize_for_shingles
from fuzzy_dedupe_pipeline_ray.stages.ingest import _doc_keys
from fuzzy_dedupe_pipeline_ray.stages.lsh import PAIR_SCHEMA

SUB_EDGE_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("span_len", pa.int64()),
    ("span_frac", pa.float64()),   # span / min(len_a, len_b)
])


def anchor_candidates(signatures_ds, cfg: PipelineConfig):
    """signatures → distinct candidate (id_a, id_b) pairs sharing an anchor."""
    def explode(b: pa.Table) -> pa.Table:
        anchors = b.column("anchors")
        doc_ids = b.column("doc_id").to_numpy()
        arr = anchors.combine_chunks() if isinstance(anchors, pa.ChunkedArray) else anchors
        lengths = pa.compute.list_value_length(arr).to_numpy(zero_copy_only=False)
        return pa.table({
            "band_key": arr.flatten(),
            "doc_id": pa.array(np.repeat(doc_ids, lengths), pa.int64()),
        })

    from fuzzy_dedupe_pipeline_ray.stages.lsh import _emit_pairs
    exploded = signatures_ds.select_columns(["doc_id", "anchors"]).map_batches(
        explode, batch_format="pyarrow")
    cap = cfg.band_group_pair_cap
    pairs = exploded.groupby("band_key").map_groups(
        lambda g: _emit_pairs(g, cap), batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


def longest_common_span(a: str, b: str, min_len: int) -> "tuple[int, int, int]":
    """(span_len, start_a, start_b) of the longest common substring if it is
    ≥ min_len, else (0, -1, -1). Rolling-hash binary search + slice-equality
    confirmation."""
    if not a or not b:
        return 0, -1, -1
    if len(a) > len(b):
        n, sa, sb = _lcs_inner(b, a, min_len)
        return n, sb, sa
    return _lcs_inner(a, b, min_len)


def _lcs_inner(a: str, b: str, min_len: int) -> "tuple[int, int, int]":
    # fast path: full containment (C-speed substring search)
    if len(a) >= min_len:
        pos = b.find(a)
        if pos >= 0:
            return len(a), 0, pos

    def probe(L: int) -> "tuple[int, int] | None":
        ha = char_shingle_hashes(a, L, unique=False)
        hb = char_shingle_hashes(b, L, unique=False)
        common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
        for k in range(len(common)):
            i, j = int(ia[k]), int(ib[k])
            if a[i:i + L] == b[j:j + L]:  # collision guard
                return i, j
        return None

    lo, hi = min_len, len(a)
    best = None
    while lo <= hi:
        mid = (lo + hi) // 2
        hit = probe(mid)
        if hit is not None:
            best = (mid, *hit)
            lo = mid + 1
        else:
            hi = mid - 1
    return best if best else (0, -1, -1)


class SubstringVerifier:
    """Actor-pool per-pair verifier. Holds the normalized contents of the
    candidate doc set, fetched once per actor from an object-store ref
    (broadcast via ``ray.put`` — read once per actor, not per batch)."""

    def __init__(self, content_ref, cfg_json: str):
        import ray

        self.content: dict[int, str] = ray.get(content_ref)
        self.cfg = PipelineConfig.from_json(cfg_json)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out = {k: [] for k in ("id_a", "id_b", "span_len", "span_frac")}
        for ida, idb in zip(batch.column("id_a").to_pylist(),
                            batch.column("id_b").to_pylist()):
            a = self.content.get(ida)
            b = self.content.get(idb)
            if a is None or b is None:
                continue
            span, _, _ = longest_common_span(a, b, cfg.min_substring_span)
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


def substring_edges(files_ds, signatures_ds, cfg: PipelineConfig):
    """files + signatures → substring-duplicate edge Dataset (SUB_EDGE_SCHEMA).

    The candidate set is assumed small relative to the corpus (rare-anchor
    blocking); its ids are broadcast and the contents are gathered with a
    semi-join filter over the input. At 100 TB the same shape holds per
    partition-range of the anchor key space.
    """
    import ray

    pairs = anchor_candidates(signatures_ds, cfg).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(SUB_EDGE_SCHEMA.empty_table())
    ids = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        ids.update(b.column("id_a").to_pylist())
        ids.update(b.column("id_b").to_pylist())

    ids_ref = ray.put(ids)

    def gather(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        from fuzzy_dedupe_pipeline_ray.functions.hashing import hash64_str

        doc_ids = hash64_str(_doc_keys(batch))
        mask = np.array([int(d) in wanted for d in doc_ids], dtype=bool)
        if not mask.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "norm_content": pa.array([], pa.string())})
        content = batch.column("content").to_pylist()
        kept = np.flatnonzero(mask)
        return pa.table({
            "doc_id": pa.array(doc_ids[kept], pa.int64()),
            "norm_content": pa.array(
                [normalize_for_shingles(content[i], cfg) for i in kept],
                pa.string()),
        })

    content_tbl = files_ds.map_batches(gather, batch_format="pyarrow",
                                       zero_copy_batch=True)
    content_map: dict[int, str] = {}
    for b in content_tbl.iter_batches(batch_format="pyarrow"):
        content_map.update(zip(b.column("doc_id").to_pylist(),
                               b.column("norm_content").to_pylist()))
    content_ref = ray.put(content_map)

    return pairs.map_batches(
        SubstringVerifier,
        fn_constructor_args=(content_ref, cfg.to_json()),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, cfg.fingerprint_concurrency),
        num_cpus=1,
    )
