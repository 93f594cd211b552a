"""Multimodal plumbing tests: schema contract, actor-pool decode (fake),
payload dedup, and the real-decode stub behavior."""

import numpy as np
import pytest

from fuzzy_dedupe_pipeline_ray.pipelines.multimodal import (
    FEATURE_DIM,
    DecodeUnavailable,
    MediaDecodeActor,
    media_exact_dupes,
    media_features,
    synth_media_dataset,
)


def test_decode_actor_deterministic_and_shaped():
    a1, a2 = MediaDecodeActor(), MediaDecodeActor()
    import json
    w1, h1, f1 = a1._decode_one(b"\x01\x02\x03" * 100, "image",
                                json.dumps({"width": 32, "height": 16}))
    w2, h2, f2 = a2._decode_one(b"\x01\x02\x03" * 100, "image",
                                json.dumps({"width": 32, "height": 16}))
    assert (w1, h1) == (32, 16) == (w2, h2)
    assert np.array_equal(f1, f2)
    assert f1.shape == (FEATURE_DIM,)
    assert abs(float(np.linalg.norm(f1)) - 1.0) < 1e-5


def test_real_decode_stub_raises():
    a = MediaDecodeActor(fake_decode=False)
    with pytest.raises(DecodeUnavailable):
        a._decode_one(b"xx", "image", "{}")


def test_media_features_pipeline(ray_session):
    ds = synth_media_dataset(48)
    out = media_features(ds).to_pandas()
    assert len(out) == 48
    assert set(out.columns) == {"media_id", "kind", "n_bytes", "width",
                                "height", "features"}
    assert all(len(f) == FEATURE_DIM for f in out["features"])


def test_media_exact_dupes(ray_session):
    ds = synth_media_dataset(49)
    out = media_exact_dupes(ds).to_pandas()
    assert len(out) == 49
    # planted duplicates (i % 7 == 3 copies the previous payload)
    dupes = out[out["media_id"] != out["rep_id"]]
    assert len(dupes) == 7
    for _, r in dupes.iterrows():
        assert r["rep_id"] == r["media_id"] - 1


def test_media_resize_contract(ray_session):
    from fuzzy_dedupe_pipeline_ray.pipelines.multimodal import media_resize

    ds = synth_media_dataset(48)
    out = media_resize(ds, max_w=256, max_h=256).to_pandas()
    assert len(out) == 48
    # never upscale; always fits the box; aspect preserved (floor division)
    assert (out["out_width"] <= 256).all() and (out["out_height"] <= 256).all()
    small = out[(out["width"] <= 256) & (out["height"] <= 256)]
    assert (small["out_width"] == small["width"]).all()
    assert (small["out_height"] == small["height"]).all()
    big = out[(out["width"] > 256) | (out["height"] > 256)]
    assert len(big) > 0
    for _, r in big.iterrows():
        if r["width"] * 256 <= r["height"] * 256:
            assert r["out_height"] == 256
            assert r["out_width"] == max(1, r["width"] * 256 // r["height"])
        else:
            assert r["out_width"] == 256
            assert r["out_height"] == max(1, r["height"] * 256 // r["width"])


def test_media_frame_sample_fanout(ray_session):
    import json as _json

    from fuzzy_dedupe_pipeline_ray.pipelines.multimodal import (
        media_frame_sample, synth_media_table)

    tbl = synth_media_table(48)
    out = media_frame_sample(synth_media_dataset(48), stride=4).to_pandas()
    # expected: ceil(n_frames/4) rows per video, frame_idx = 0,4,8,...
    expect = 0
    for mid, kind, meta in zip(tbl.column("media_id").to_pylist(),
                               tbl.column("kind").to_pylist(),
                               tbl.column("meta").to_pylist()):
        if kind != "video":
            assert mid not in set(out["media_id"])
            continue
        nf = _json.loads(meta)["n_frames"]
        rows = out[out["media_id"] == mid]
        assert len(rows) == -(-nf // 4)
        assert sorted(rows["frame_idx"]) == list(range(0, nf, 4))
        expect += len(rows)
    assert len(out) == expect
