"""Ingest: derive ``doc_id`` + ``content_sha256`` + ``n_chars`` per file.

Analog of the reference's ingest projection + normalization
(``sheets_sync/sync.py:74-138``): the reference coerces every value to TEXT
and derives nothing; here the derived identity columns are the exact-match
key (sha256 ← normalized-phone equality, ``dedupe_logic/processor.py:47-51``)
and the stable 64-bit ``doc_id`` (← the sheet row ``id``).

Stateless ``map_batches`` over zero-copy Arrow batches; no shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.functions.hashing import sha256_hex_arrow
from fuzzy_dedupe_pipeline_ray.functions.textnorm import sentinels_to_null


def _doc_key_array(batch: pa.Table):
    """Arrow-native ``repo\\x00path\\x00commit`` identity key per row
    (``binary_join_element_wise`` — one C kernel; byte-identical to the
    former per-row f-string, so every derived doc_id is unchanged)."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        batch.column("repo"), batch.column("path"), batch.column("commit"),
        "\x00")


def _doc_keys(batch: pa.Table) -> "list[str]":
    """Python-list form of :func:`_doc_key_array` (test/fixture surface)."""
    return _doc_key_array(batch).to_pylist()


def ingest_meta_batch(batch: pa.Table, cfg=None, remap=None) -> pa.Table:
    """(repo,path,commit,lang,content) → narrow per-doc metadata row.

    ``content`` is *dropped* here — it only flows through the fingerprint
    stage (SURVEY.md §7.4: carry ids + signatures, not the wide column).

    Sentinel cleanup (reference M1/M9, ``sheets_sync/sync.py:126-131`` /
    ``dedupe_logic/processor.py:416-424``) happens ONCE here: sentinel
    strings in the free-text metadata column (``lang``) become proper
    Arrow nulls. Identity columns (repo/path/commit) and ``content`` are
    never rewritten — the doc_id and sha256 invariants depend on them.
    """
    import pyarrow.compute as pc

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator
    from fuzzy_dedupe_pipeline_ray.stages.identity import batch_doc_ids

    tune_allocator()  # worker-process heap retention (BASELINE.md)

    content = batch.column("content")
    ids, ids_hi = batch_doc_ids(batch, cfg, remap)
    cols = {"doc_id": pa.array(ids, pa.int64())}
    if ids_hi is not None:  # 128-bit mode: the id's upper half rides along
        cols["doc_id_hi"] = pa.array(ids_hi, pa.int64())
    cols.update({
        "repo": batch.column("repo"),
        "path": batch.column("path"),
        "commit": batch.column("commit"),
        "lang": sentinels_to_null(batch.column("lang")),
        "content_sha256": pa.array(sha256_hex_arrow(content), pa.string()),
        "n_chars": pc.cast(pc.utf8_length(content), pa.int64()),
    })
    return pa.table(cols)


def ingest_meta(files_ds, cfg=None, remap=None):
    """Dataset of input files → narrow docs-metadata Dataset."""
    return files_ds.map_batches(
        lambda b: ingest_meta_batch(b, cfg, remap),
        batch_format="pyarrow", zero_copy_batch=True)
