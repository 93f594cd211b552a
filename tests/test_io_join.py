"""hash_join guard rails: Ray 2.49's hash-shuffle skips empty input
blocks entirely (`_shuffle_block`, hash_shuffle.py:223-225) and only the
FIRST submitted shuffle task per input broadcasts the schema to all
aggregators (hash_shuffle.py:584). A join input whose first block is
empty can therefore leave some partitions with a schema-less empty table
at finalize → Acero `No match or multiple matches for key field`.
`sources.io.hash_join` compacts empty blocks out of materialized inputs
and short-circuits empty sides; these tests pin that behavior."""

import pyarrow as pa
import pytest

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.sources.io import _compact_blocks, hash_join

CFG = PipelineConfig(num_partitions=8)


def _empty_kw():
    return pa.table({"k": pa.array([], pa.int64()),
                     "w": pa.array([], pa.int64())})


def test_compact_blocks_drops_empties(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        [_empty_kw(), pa.table({"k": [1, 2], "w": [10, 20]}),
         _empty_kw()]).materialize()
    out, n = _compact_blocks(ds)
    assert n == 2
    bundles = list(out.iter_internal_ref_bundles())
    rows = [m.num_rows for b in bundles for m in b.metadata]
    assert rows and all(r > 0 for r in rows)


def test_hash_join_right_first_block_empty(ray_session):
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": list(range(64)), "v": list(range(64))}))
    right = ray.data.from_arrow(
        [_empty_kw(), pa.table({"k": [1], "w": [10]})]).materialize()
    out = hash_join(left, right, on="k", cfg=CFG).to_pandas()
    assert out.to_dict("records") == [{"k": 1, "v": 1, "w": 10}]


def test_hash_join_left_lazy_empty_first_block(ray_session):
    """A LAZY left whose first block is empty and whose keys concentrate
    into few hash partitions used to crash at finalize ("No match or
    multiple matches for key field reference ... left side") — the
    schema broadcast rides only the first submitted shuffle task, and an
    empty block sends none. hash_join now materializes+compacts lazy
    lefts too (the edge is triggered by SPARSE inputs — labelprop rounds
    over an edges checkpoint that leads with an empty part file — not by
    the dense at-scale case the old guard assumed away)."""
    import ray.data

    left = ray.data.from_arrow(
        [_empty_kw().rename_columns(["k", "v"]),
         pa.table({"k": [1, 1, 1, 1], "v": [10, 11, 12, 13]})]
    ).map_batches(lambda b: b, batch_format="pyarrow")
    right = ray.data.from_arrow(pa.table({"k": [1], "w": [99]}))
    out = hash_join(left, right, on="k", cfg=CFG).to_pandas()
    assert sorted(out["v"]) == [10, 11, 12, 13]
    assert set(out["w"]) == {99}


def test_hash_join_empty_right_inner_short_circuit(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [5, 6]}))
    right = ray.data.from_arrow(_empty_kw()).materialize()
    out = hash_join(left, right, on="k", cfg=CFG)
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "v", "w"}


def test_hash_join_empty_right_left_outer_appends_nulls(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [5, 6]}))
    right = ray.data.from_arrow(_empty_kw()).materialize()
    out = hash_join(left, right, on="k", join_type="left_outer",
                    cfg=CFG).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2]
    assert out["v"].tolist() == [5, 6]
    assert out["w"].isna().all()


def test_hash_join_empty_left_materialized_short_circuit(ray_session):
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})).materialize()
    right = ray.data.from_arrow(pa.table({"k": [1], "w": [10]})).materialize()
    for jt in ("inner", "left_outer"):
        out = hash_join(left, right, on="k", join_type=jt, cfg=CFG)
        assert out.count() == 0
        assert set(out.schema().names) == {"k", "v", "w"}
