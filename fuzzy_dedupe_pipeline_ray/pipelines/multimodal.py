"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

IMAGE (PNG) and AUDIO (16-bit PCM WAV) decode FOR REAL — the stdlib
carries the needed codecs (zlib / wave; see
``functions/mediacodecs.py``), and the v3 fixture's payloads are genuine
PNGs/WAVs, so the decode → features → resize path runs end-to-end on
real formats. VIDEO decode stays stubbed behind ``DecodeUnavailable`` /
the deterministic fake (no stdlib container codec exists); all Ray-side
plumbing — schema contracts, actor-pool ``map_batches`` signatures,
small-batch sizing for wide binary payloads, output layout — is real
and tested for every kind. Swapping the video stub for ffmpeg is a
one-function change inside the actor.

Schema contract (MEDIA_SCHEMA):
  media_id: int64, kind: string ('image'|'audio'|'video'),
  payload: binary (the encoded bytes), meta: string (JSON: codec, dims…)

Stages:
  * ``MediaDecodeActor`` — actor pool; decodes payload → feature columns.
    With ``fake_decode=True`` produces a deterministic 'decode' (shape +
    checksum-derived features) so pipelines are testable end-to-end.
  * ``media_features`` — Dataset pipeline: decode → per-item feature
    vector (list<float>) + dims; small ``batch_size`` (wide rows must not
    blow the worker heap: batch_size × payload_size × concurrency is the
    resident bound).
  * ``media_near_dup`` — exact dedup on payload sha256 + near-dup on the
    feature vectors via the shared ANN kernels.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("payload", pa.binary()),
    ("meta", pa.string()),
])

FEATURE_DIM = 32


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-decode path for formats this environment cannot
    decode (video — no stdlib container codec exists). PNG and WAV decode
    for real via ``functions/mediacodecs.py`` (zlib / wave are stdlib)."""


class MediaDecodeActor:
    """Actor-pool decoder: state (codec context / model weights in a real
    deployment; here the feature-projection matrix) built once per actor.

    ``fake_decode``: True → the deterministic stub for every payload
    (dims from meta, features from a byte histogram); False → REAL
    decode (PNG pixels / WAV samples, sniffed by payload signature;
    ``DecodeUnavailable`` for anything else); ``"auto"`` → real decode
    where a codec exists, the stub otherwise (the video rows).

    __call__(batch: pa.Table[MEDIA_SCHEMA]) -> pa.Table with
      media_id, kind, n_bytes, width, height, features(list<float>[32])
    """

    def __init__(self, fake_decode: "bool | str" = True, seed: int = 17):
        if fake_decode not in (True, False, "auto"):
            raise ValueError(f"bad fake_decode {fake_decode!r}")
        self.fake_decode = fake_decode
        rng = np.random.RandomState(seed)
        # analog of model weights: loaded ONCE per actor
        self.projection = rng.randn(64, FEATURE_DIM).astype(np.float32)

    def _project(self, hist: np.ndarray):
        feats = hist.astype(np.float32) @ self.projection
        norm = float(np.linalg.norm(feats)) or 1.0
        return (feats / norm).astype(np.float32)

    def _fake_one(self, payload: bytes, meta: str):
        # deterministic fake: dims from meta JSON (or payload length),
        # features from a checksum-seeded byte histogram projection
        try:
            m = json.loads(meta) if meta else {}
        except json.JSONDecodeError:
            m = {}
        width = int(m.get("width", len(payload) % 640 + 1))
        height = int(m.get("height", len(payload) % 480 + 1))
        arr = np.frombuffer(payload[:4096], dtype=np.uint8)
        return width, height, self._project(
            np.bincount(arr % 64, minlength=64))

    def _decode_one(self, payload: bytes, kind: str, meta: str):
        if self.fake_decode is True:
            return self._fake_one(payload, meta)
        from fuzzy_dedupe_pipeline_ray.functions.mediacodecs import (
            png_decode,
            wav_decode,
        )

        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            px = png_decode(payload)  # (h, w) or (h, w, ch) uint8
            h, w = px.shape[0], px.shape[1]
            # features from the DECODED pixels: 64-bin value histogram
            return w, h, self._project(
                np.bincount(px.ravel() >> 2, minlength=64))
        if payload[:4] == b"RIFF":
            samples, _rate = wav_decode(payload)  # (n, ch) int16
            hist = np.bincount(
                (samples.ravel().astype(np.int32) + 32768) >> 10,
                minlength=64)
            # width = frame count, height = channel count (documented
            # convention; the fixture's meta carries the same values)
            return samples.shape[0], samples.shape[1], self._project(hist)
        if self.fake_decode == "auto":
            return self._fake_one(payload, meta)
        raise DecodeUnavailable(
            f"no codec for kind={kind!r} payload in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        widths, heights, feats = [], [], []
        for p, k, m in zip(payloads, kinds, metas):
            w, h, f = self._decode_one(p, k, m)
            widths.append(w)
            heights.append(h)
            feats.append(f)
        flat = np.concatenate(feats) if feats else np.empty(0, np.float32)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float32()), FEATURE_DIM),
        })


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic synthetic media table with planted exact duplicates.

    v3: image payloads are REAL PNGs and audio payloads REAL 16-bit PCM
    WAVs (``functions/mediacodecs.py`` — stdlib-only), so the decode
    path runs end-to-end on genuine formats; video payloads stay
    random bytes behind the documented stub. meta always carries the
    TRUE width/height of the payload (audio: width = frame count,
    height = channels) so the metadata oracle and the real decoder
    agree; planted duplicates copy kind+payload+meta wholesale so every
    row's meta matches its payload."""
    from fuzzy_dedupe_pipeline_ray.functions.mediacodecs import (
        png_encode,
        wav_encode,
    )

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        if i % 7 == 3 and rows:  # planted exact duplicate of previous
            prev = rows[-1]
            rows.append({"media_id": i, "kind": prev["kind"],
                         "payload": prev["payload"], "meta": prev["meta"]})
            continue
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w = int(rng.randint(16, 64))
            h = int(rng.randint(16, 48))
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            payload = png_encode(px)
            meta = {"codec": "png", "width": w, "height": h}
        elif kind == "audio":
            ns = int(rng.randint(256, 2048))
            payload = wav_encode(
                (rng.randn(ns) * 6000).astype(np.int16), 16000)
            meta = {"codec": "pcm_s16le", "width": ns, "height": 1,
                    "sample_rate": 16000, "n_samples": ns}
        else:
            payload = rng.bytes(int(rng.randint(256, 4096)))
            meta = {"width": int(rng.randint(16, 640)),
                    "height": int(rng.randint(16, 480)),
                    "n_frames": 30 + (i * 7) % 270}
        rows.append({
            "media_id": i,
            "kind": kind,
            "payload": payload,
            "meta": json.dumps(meta, sort_keys=True),
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def synth_media_dataset(n: int = 64, seed: int = 5):
    """Deterministic synthetic media table as a Ray Dataset."""
    import ray.data

    return ray.data.from_arrow(synth_media_table(n, seed))


#: the driver-visible media fixture is size-independent (the media table is
#: not derived from the TPC-H-ish sf tables) — one deterministic parquet,
#: shared by the queries() entries and their DuckDB oracles.
MEDIA_FIXTURE_N = 256
MEDIA_FIXTURE_SEED = 5


def media_fixture_path(root: str = "/tmp/fdpr_media") -> str:
    """Generate-and-cache the deterministic media parquet; returns the
    file path (stable across runs — the oracle SQL references it)."""
    import os

    import pyarrow.parquet as pq

    d = os.path.join(root, f"v3_{MEDIA_FIXTURE_N}_{MEDIA_FIXTURE_SEED}")
    path = os.path.join(d, "media.parquet")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(d, exist_ok=True)
    pq.write_table(synth_media_table(MEDIA_FIXTURE_N, MEDIA_FIXTURE_SEED),
                   path, row_group_size=32)
    with open(done, "w") as f:
        f.write("v3")
    return path


def media_features(media_ds, *, concurrency: int = 2, batch_size: int = 16,
                   fake_decode: bool = True):
    """Decode stage: actor pool over SMALL batches (wide binary rows —
    batch_size × max payload × concurrency bounds worker heap)."""
    return media_ds.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs={"fake_decode": fake_decode},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def media_features_query(sf_dir: str):
    """Driver-visible decode pipeline over the deterministic media
    fixture (``sf_dir`` is unused — the media table is not derived from
    the sf tables): actor-pool decode → SQL-comparable metadata columns.
    The float feature vectors are exercised by tests/test_multimodal.py;
    the oracle compares the deterministic integer columns."""
    import ray.data

    ds = ray.data.read_parquet(media_fixture_path())
    feats = media_features(ds, fake_decode="auto")  # REAL PNG/WAV decode
    return feats.select_columns(
        ["media_id", "kind", "n_bytes", "width", "height"]).sort("media_id")


def media_exact_dupes_query(sf_dir: str):
    """Driver-visible exact payload dedup over the media fixture."""
    import ray.data

    ds = ray.data.read_parquet(media_fixture_path())
    return media_exact_dupes(ds).sort("media_id")


def media_exact_dupes(media_ds):
    """Exact payload dedup: sha256(payload) groupby → (media_id, rep_id)."""
    from ray.data.aggregate import Min

    def add_sha(b: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(p).hexdigest()
                for p in b.column("payload").to_pylist()]
        return pa.table({"media_id": b.column("media_id"),
                         "payload_sha256": pa.array(shas, pa.string())})

    with_sha = media_ds.map_batches(add_sha, batch_format="pyarrow",
                                    zero_copy_batch=True)
    reps = with_sha.groupby("payload_sha256").aggregate(
        Min("media_id", alias_name="rep_id"))
    from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG
    from fuzzy_dedupe_pipeline_ray.sources.io import lookup_join

    return lookup_join(with_sha, reps, on="payload_sha256",
                       cfg=DEFAULT_CONFIG).select_columns(
        ["media_id", "rep_id"])


# ---------------------------------------------------------------------------
# Resize + frame-sample stages (the remaining multimodal transform shapes)
# ---------------------------------------------------------------------------

class MediaResizeActor:
    """Actor-pool resize stage: fit each item into a ``max_w × max_h`` box
    preserving aspect ratio. The output-dimension CONTRACT is computed
    exactly, in pure integer arithmetic, so the stage is
    oracle-comparable:

      if w ≤ W and h ≤ H:            (w, h)            (never upscale)
      elif w·H ≤ h·W (height-limited): (⌊w·H/h⌋ max 1, H)
      else (width-limited):            (W, ⌊h·W/w⌋ max 1)

    With ``emit_payload=True`` PNG payloads are REALLY resized —
    decode → vectorized nearest-neighbor index scale → re-encode — and
    a ``resized_payload`` binary column is appended (null for non-PNG
    rows). Default off so the oracled metadata query keeps its schema.
    """

    def __init__(self, max_w: int = 256, max_h: int = 256,
                 emit_payload: bool = False):
        self.max_w = int(max_w)
        self.max_h = int(max_h)
        self.emit_payload = bool(emit_payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        metas = batch.column("meta").to_pylist()
        payloads = batch.column("payload")
        w = np.empty(len(metas), np.int64)
        h = np.empty(len(metas), np.int64)
        for i, m in enumerate(metas):
            try:
                d = json.loads(m) if m else {}
            except json.JSONDecodeError:
                d = {}
            w[i] = int(d.get("width", 1))
            h[i] = int(d.get("height", 1))
        W, H = self.max_w, self.max_h
        fits = (w <= W) & (h <= H)
        height_lim = w * H <= h * W
        out_w = np.where(fits, w,
                         np.where(height_lim,
                                  np.maximum(1, w * H // np.maximum(h, 1)),
                                  W)).astype(np.int64)
        out_h = np.where(fits, h,
                         np.where(height_lim, H,
                                  np.maximum(1, h * W // np.maximum(w, 1)))
                         ).astype(np.int64)
        out = {
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "width": pa.array(w, pa.int64()),
            "height": pa.array(h, pa.int64()),
            "out_width": pa.array(out_w, pa.int64()),
            "out_height": pa.array(out_h, pa.int64()),
            "n_bytes": pc.cast(pc.binary_length(payloads), pa.int64()),
        }
        if self.emit_payload:
            from fuzzy_dedupe_pipeline_ray.functions.mediacodecs import (
                png_decode,
                png_encode,
            )

            resized: "list[bytes | None]" = []
            for i, p in enumerate(payloads.to_pylist()):
                if p is None or p[:8] != b"\x89PNG\r\n\x1a\n":
                    resized.append(None)  # null / non-PNG rows pass through
                    continue
                px = png_decode(p)
                ow, oh = int(out_w[i]), int(out_h[i])
                yi = (np.arange(oh) * px.shape[0]) // oh
                xi = (np.arange(ow) * px.shape[1]) // ow
                resized.append(png_encode(px[yi][:, xi]))
            out["resized_payload"] = pa.array(resized, pa.binary())
        return pa.table(out)


def media_resize(media_ds, *, max_w: int = 256, max_h: int = 256,
                 concurrency: int = 2, batch_size: int = 16,
                 emit_payload: bool = False):
    """Resize stage as an actor-pool ``map_batches`` (same wide-row batch
    sizing rules as the decode stage). ``emit_payload=True`` appends the
    really-resized PNG bytes (see MediaResizeActor)."""
    return media_ds.map_batches(
        MediaResizeActor,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h,
                               "emit_payload": emit_payload},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def media_resize_query(sf_dir: str):
    """Driver-visible resize pipeline over the media fixture (``sf_dir``
    unused — the fixture is size-independent)."""
    import ray.data

    ds = ray.data.read_parquet(media_fixture_path())
    return media_resize(ds).sort("media_id")


def media_frame_sample(media_ds, *, stride: int = 4, batch_size: int = 16):
    """Frame sampling: each video row fans out to one row per sampled
    frame index (0, stride, 2·stride, … < n_frames). The frame EXTRACTION
    is the stubbed decode; the fan-out shape — a vectorized repeat/arange
    expansion inside ``map_batches``, never a Python per-frame loop — is
    the real contract (at 100 TB the expansion factor is the operator:
    output rows ≈ frames/stride per video; batch sizing must count OUTPUT
    rows, hence the small input batch)."""

    def expand(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vids = b.filter(pc.equal(b.column("kind"), pa.scalar("video")))
        ids = vids.column("media_id").to_numpy()
        metas = vids.column("meta").to_pylist()
        nf = np.empty(len(metas), np.int64)
        for i, m in enumerate(metas):
            try:
                d = json.loads(m) if m else {}
            except json.JSONDecodeError:
                d = {}
            nf[i] = max(0, int(d.get("n_frames", 0)))
        counts = -(-nf // stride)            # ceil(n_frames / stride)
        rep_ids = np.repeat(ids, counts)
        # per-video local frame index: global arange minus each video's
        # start offset, times stride — one vectorized expansion
        starts = np.repeat(np.r_[0, np.cumsum(counts)[:-1]], counts)
        local = np.arange(int(counts.sum()), dtype=np.int64) - starts
        return pa.table({
            "media_id": pa.array(rep_ids, pa.int64()),
            "frame_idx": pa.array(local * stride, pa.int64()),
        })

    return media_ds.map_batches(expand, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=batch_size)


def media_frame_sample_query(sf_dir: str):
    """Driver-visible frame-sample fan-out over the media fixture."""
    import ray.data

    ds = ray.data.read_parquet(media_fixture_path())
    return media_frame_sample(ds).sort(["media_id", "frame_idx"])
