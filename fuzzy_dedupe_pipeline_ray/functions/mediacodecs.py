"""Pure-stdlib media codecs: PNG (zlib) and WAV (wave/struct).

The container has no image/audio libraries, but PNG needs only zlib and
WAV only the stdlib ``wave`` module — so the multimodal column path can
decode REAL formats end-to-end (round-5 verdict item #7): the media
fixture's image payloads are genuine PNGs and its audio payloads genuine
16-bit PCM WAVs, and ``MediaDecodeActor(fake_decode=False)`` decodes
them to pixel/sample arrays. Video stays behind the documented
``DecodeUnavailable`` stub (no stdlib container format exists).

Decoder scope (documented, asserted): 8-bit grey/RGB/RGBA,
non-interlaced PNG — all five scanline filters supported (Sub/Up via
vectorized row ops, Average/Paeth via the per-byte defiltering scan the
format's sequential dependency requires); 16-bit PCM WAV, any channel
count. Encoders emit filter-0 PNG and mono WAV. Round-trips and a
hand-built all-filters PNG are pinned by tests/test_multimodal.py.

PNG format: RFC 2083. WAV: RIFF PCM via the stdlib ``wave`` module.
"""
from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) grey / (h, w, 3) RGB / (h, w, 4) RGBA -> PNG."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"bad pixel shape {pixels.shape}")
    h, w = a.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.concatenate(
        [np.concatenate([np.zeros((h, 1), np.uint8),
                         a.reshape(h, w * ch)], axis=1).ravel()])
    idat = zlib.compress(raw.tobytes(), 6)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def png_decode(data: bytes) -> np.ndarray:
    """PNG -> uint8 array (h, w, ch). 8-bit grey/RGB/RGBA, non-interlaced."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(data):
        (ln,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG")
    w, h, depth, color, comp, filt, inter = ihdr
    if depth != 8 or inter != 0:
        raise ValueError("unsupported PNG variant")
    ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if ch is None:
        raise ValueError(f"unsupported color type {color}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * ch + 1
    if len(raw) != h * stride:
        raise ValueError("bad scanline data")
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = np.empty((h, w * ch), np.uint16)  # u16 workspace for averages
    prev = np.zeros(w * ch, np.uint16)
    for y in range(h):
        line = rows[y, 1:].astype(np.uint16)
        f = filters[y]
        if f == 0:
            cur = line
        elif f == 1:  # Sub — sequential in x; per-channel cumsum
            cur = line.reshape(w, ch).cumsum(axis=0, dtype=np.uint16) \
                .reshape(w * ch) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average — sequential; per-pixel loop over w
            cur = np.empty(w * ch, np.uint16)
            for x in range(w * ch):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential
            cur = np.empty(w * ch, np.uint16)
            for x in range(w * ch):
                a_ = int(cur[x - ch]) if x >= ch else 0
                b_ = int(prev[x])
                c_ = int(prev[x - ch]) if x >= ch else 0
                p = a_ + b_ - c_
                pa_, pb_, pc_ = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if pa_ <= pb_ and pa_ <= pc_ else \
                    (b_ if pb_ <= pc_ else c_)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = cur
        prev = cur
    px = out.astype(np.uint8).reshape(h, w, ch)
    return px[:, :, 0] if ch == 1 else px


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes):
    """WAV bytes -> (int16 numpy samples (n, ch), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        n, ch, width, rate = (f.getnframes(), f.getnchannels(),
                              f.getsampwidth(), f.getframerate())
        if width != 2:
            raise ValueError("only 16-bit PCM supported")
        raw = f.readframes(n)
    return np.frombuffer(raw, "<i2").reshape(n, ch), rate
