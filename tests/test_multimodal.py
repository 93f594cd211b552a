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
    media_resize,
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


def test_mediacodecs_roundtrip_and_filters():
    """Pure-stdlib PNG/WAV codecs: encode→decode round-trips for
    grey/RGB/RGBA pixels and int16 audio, plus a hand-built PNG using
    all five scanline filters (None/Sub/Up/Average/Paeth) decoding to
    the known pixels."""
    import struct
    import zlib

    from fuzzy_dedupe_pipeline_ray.functions.mediacodecs import (
        png_decode,
        png_encode,
        wav_decode,
        wav_encode,
    )

    rng = np.random.RandomState(0)
    for shape in [(5, 7, 3), (16, 9, 4), (12, 12), (1, 1, 3)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(px, png_decode(png_encode(px))), shape

    s = (rng.randn(999) * 8000).astype(np.int16)
    d, rate = wav_decode(wav_encode(s, 22050))
    assert rate == 22050 and np.array_equal(d[:, 0], s)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    w, h, ch = 4, 5, 3
    true = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
    flat = true.reshape(h, w * ch).astype(np.int32)
    lines = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int32)
        enc = np.empty(w * ch, np.int32)
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else \
                    (b if pb_ <= pc_ else c)
            enc[x] = (line[x] - pred) % 256
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + chunk(b"IEND", b""))
    assert np.array_equal(png_decode(png), true)


def test_real_decode_matches_meta_on_fixture(ray_session):
    """v3 fixture payloads are genuine PNG/WAV: REAL decode ('auto')
    must recover exactly the dims the meta declares for every image and
    audio row, and the oracled metadata query stays green on them."""
    from fuzzy_dedupe_pipeline_ray.pipelines.multimodal import (
        synth_media_table,
    )

    ds = synth_media_dataset(48)
    out = media_features(ds, fake_decode="auto").to_pandas()
    src = synth_media_table(48).to_pandas()
    import json as _json

    meta = {r.media_id: _json.loads(r.meta) for r in src.itertuples()}
    checked = 0
    for r in out.itertuples():
        m = meta[r.media_id]
        assert r.width == m["width"] and r.height == m["height"], r
        checked += 1
    assert checked == 48


def test_real_decode_strict_video_raises():
    a = MediaDecodeActor(fake_decode=False)
    with pytest.raises(DecodeUnavailable):
        a._decode_one(b"notapng-notawav", "video", "{}")
    # but a real PNG decodes without meta help
    from fuzzy_dedupe_pipeline_ray.functions.mediacodecs import png_encode

    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    w, h, f = a._decode_one(png_encode(px), "image", "")
    assert (w, h) == (4, 5) and f.shape == (FEATURE_DIM,)


def test_media_resize_real_payload(ray_session):
    """emit_payload=True really resizes PNG rows: the emitted payload
    decodes to exactly (out_height, out_width) pixels; non-PNG rows get
    a null payload."""
    from fuzzy_dedupe_pipeline_ray.functions.mediacodecs import png_decode

    ds = synth_media_dataset(30)
    out = media_resize(ds, max_w=24, max_h=24,
                       emit_payload=True).to_pandas()
    n_png = 0
    for r in out.itertuples():
        if r.resized_payload is None:
            assert r.kind != "image"
            continue
        px = png_decode(r.resized_payload)
        assert px.shape[0] == r.out_height and px.shape[1] == r.out_width
        n_png += 1
    assert n_png > 5
