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
    rolling_fingerprint,
    sha256_hex,
)
from fuzzy_dedupe_pipeline_ray.sources.io import hash_join
from fuzzy_dedupe_pipeline_ray.stages.cc import connected_components
from fuzzy_dedupe_pipeline_ray.stages.exact import exact_edges
from fuzzy_dedupe_pipeline_ray.stages.finalize import GENERIC_SORT_KEYS, finalize
from fuzzy_dedupe_pipeline_ray.stages.fingerprint import fingerprint
from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs
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
            "text_sha256": pa.array(sha256_hex(b.column("text").to_pylist()),
                                    pa.string()),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def doc_token_stats(sf_dir: str):
    """doc_id, n_tokens (whitespace), text_len."""
    def f(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": textnorm.token_count_array(b.column("text")),
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


def doc_langid(sf_dir: str):
    """doc_id, lang_pred (n-gram/stopword heuristic — no model deps)."""
    def f(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang_pred": pa.array(
                textnorm.lang_id(b.column("text").to_pylist()), pa.string()),
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
            "text_sha256": pa.array(sha256_hex(b.column("text").to_pylist()),
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
    def f(b: pa.Table) -> pa.Table:
        fps = [mask_keys(rolling_fingerprint(t, window, keep)).tolist()
               for t in b.column("text").to_pylist()]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "fingerprint": pa.array(fps, pa.list_(pa.int64())),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# N-gram Jaccard pairs (exact, SQL-oracled via inverted-index self-join)
# ---------------------------------------------------------------------------

def doc_ngram_jaccard_pairs(sf_dir: str, n: int = 3):
    """Exact word-n-gram Jaccard over all pairs sharing ≥1 shingle:
    (id_a, id_b, inter, union_sz) for pairs with Jaccard ≥ 1/2, decided in
    EXACT integer arithmetic (2·inter ≥ union) — no float in the output or
    the threshold, so the DuckDB oracle (unnest + self-join) hashes
    identically. Distributed inverted-index shape: explode distinct
    shingles → groupby(shingle) pair emission → per-pair co-occurrence
    Count = |A∩B| → join per-doc set sizes.

    Scale note: common shingles explode quadratically — the flagship uses
    MinHash banding instead; this operator is the *exact* semantics demo
    (cap group sizes before using on a large corpus).
    """
    def shingles(b: pa.Table) -> pa.Table:
        out_doc, out_sh = [], []
        for doc, text in zip(b.column("doc_id").to_pylist(),
                             b.column("text").to_pylist()):
            toks = text.split()
            grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
            out_doc.extend([doc] * len(grams))
            out_sh.extend(sorted(grams))
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "shingle": pa.array(out_sh, pa.string())})

    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        shingles, batch_format="pyarrow", zero_copy_batch=True).materialize()

    sizes = ds.groupby("doc_id").aggregate(Count(alias_name="set_size"))

    def pairs_in_group(g: pa.Table) -> pa.Table:
        ids = np.unique(g.column("doc_id").to_numpy())
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table({"id_a": pa.array(ids[ia], pa.int64()),
                         "id_b": pa.array(ids[ib], pa.int64())})

    co = (ds.groupby("shingle").map_groups(pairs_in_group,
                                           batch_format="pyarrow")
          .groupby(["id_a", "id_b"]).aggregate(Count(alias_name="inter")))

    co = hash_join(co, sizes.rename_columns({"doc_id": "id_a",
                                             "set_size": "size_a"}),
                   on="id_a", cfg=DOCS_CFG).materialize()
    co = hash_join(co, sizes.rename_columns({"doc_id": "id_b",
                                             "set_size": "size_b"}),
                   on="id_b", cfg=DOCS_CFG)

    def score(b: pa.Table) -> pa.Table:
        inter = b.column("inter").to_numpy().astype(np.int64)
        union = (b.column("size_a").to_numpy().astype(np.int64)
                 + b.column("size_b").to_numpy().astype(np.int64) - inter)
        keep = 2 * inter >= union  # Jaccard ≥ 0.5, exact integer arithmetic
        return pa.table({
            "id_a": pa.array(b.column("id_a").to_numpy()[keep], pa.int64()),
            "id_b": pa.array(b.column("id_b").to_numpy()[keep], pa.int64()),
            "inter": pa.array(inter[keep], pa.int64()),
            "union_sz": pa.array(union[keep], pa.int64()),
        })

    return co.map_batches(score, batch_format="pyarrow").sort(["id_a", "id_b"])


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
                sha256_hex(b.column("content").to_pylist()), pa.string()),
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
    from fuzzy_dedupe_pipeline_ray.stages.lsh import distinct_pairs

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

    pairs = distinct_pairs(
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
