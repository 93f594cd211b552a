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
