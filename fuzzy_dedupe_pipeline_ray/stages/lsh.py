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


def candidate_pairs(signatures_ds, cfg: PipelineConfig):
    """signatures Dataset → distinct candidate (id_a, id_b) Dataset.

    Two shuffles: groupby(band_key) for pair emission, then a distinct on
    (id_a, id_b) — the analog of the reference's ``processed_pairs`` set
    (``processor.py:134,144-147``) as a shuffle instead of driver memory.
    """
    exploded = signatures_ds.map_batches(
        explode_bands(cfg.to_json()), batch_format="pyarrow",
        zero_copy_batch=True)
    cap = cfg.band_group_pair_cap
    pairs = exploded.groupby("band_key").map_groups(
        lambda g: _emit_pairs(g, cap), batch_format="pyarrow")
    # distinct (id_a, id_b)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
