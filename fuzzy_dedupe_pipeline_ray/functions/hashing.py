"""Vectorized hashing kernels: sha256, char/token shingles, MinHash,
SimHash, band keys, rolling document fingerprints.

These replace the reference's dense-embedding signature scheme
(``dedupe_logic/processor.py:88-108`` — two SentenceTransformer encodes per
record) with the scalable equivalents named by the north rule: MinHash over
shingles (primary signal, analog of the semantic embedding), SimHash
(second bit-level signal, analog of the address embedding), and sha256
(exact-match signal, analog of normalized-phone equality,
``processor.py:47-51,155-158``).

All kernels are numpy-vectorized over uint64 with wraparound arithmetic
(multiply-shift universal hashing); no Python loops over characters.
"""

from __future__ import annotations

import hashlib

import numpy as np

# FNV-1a style constants for polynomial rolling hashes.
_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

import threading

_ERR_TLS = threading.local()


def pin_overflow_ignore() -> None:
    """Set ``over="ignore"`` for THIS THREAD (numpy errstate is per-thread)
    so the per-call ``np.errstate`` context in ``_wrap_errstate``
    short-circuits. Every uint64 kernel in this module relies on mod-2^64
    wraparound, and the errstate enter/exit dance was a measured 28% of
    the fingerprint hot loop (153k ``seterr`` calls per 10k docs).
    Called from ``perf.tune_allocator`` — i.e. once per worker process at
    task/actor setup; overflow WARNINGS (never errors) are the only
    behavior suppressed for other code on the thread. The pinned flag is
    THREAD-LOCAL to match ``np.seterr``'s scope — a process-global flag
    would make kernels on OTHER threads (driver chain threads in
    pipelines/dedupe.py, secondary worker threads) skip the context while
    their errstate still warns."""
    np.seterr(over="ignore")
    _ERR_TLS.pinned = True


def _err_pinned() -> bool:
    return getattr(_ERR_TLS, "pinned", False)


def _wrap_errstate(fn):
    # inner is a NESTED function, so cloudpickle ships it by value and
    # captures every global it references; it must reach the (unpicklable)
    # thread-local through the module-level accessor `_err_pinned` — which
    # pickles by reference — never by naming `_ERR_TLS` directly.
    def inner(*a, **kw):
        if _err_pinned():
            return fn(*a, **kw)
        with np.errstate(over="ignore"):
            return fn(*a, **kw)

    return inner


def sha256_hex(values: "list[str] | np.ndarray") -> list[str]:
    """Hex sha256 per string. hashlib releases the GIL and runs at C speed;
    per-row loop here is not the hot path (one call per content string)."""
    return [hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest() for v in values]


def _string_slices(arr):
    """Arrow string/binary array → ``(memoryview, offsets_list)`` over the
    value buffer, zero-copy. Offsets come back as Python ints (one C-level
    ``tolist``) so the per-row slice loop pays no numpy scalar boxing."""
    import pyarrow as pa

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if len(a) == 0:
        return memoryview(b""), [0]
    big = (pa.types.is_large_string(a.type) or pa.types.is_large_binary(a.type))
    dt = np.int64 if big else np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=dt, count=len(a) + 1,
                         offset=a.offset * dt().itemsize)
    return memoryview(a.buffers()[2]), offs.tolist()


def sha256_hex_arrow(arr) -> list[str]:
    """Hex sha256 per element of an Arrow string/binary array — hashes the
    value-buffer slices directly (no Python-string materialization, no
    re-encode; Arrow strings are valid UTF-8 so the buffer bytes equal
    ``str.encode("utf-8")`` — identical digests to :func:`sha256_hex`)."""
    mv, o = _string_slices(arr)
    sha = hashlib.sha256
    return [sha(mv[s:e]).hexdigest() for s, e in zip(o, o[1:])]


def sha256_u64_arrow(arr, words: int = 1) -> np.ndarray:
    """First ``words`` big-endian uint64 words of sha256 per element of an
    Arrow string/binary array, as an ``(m, words)`` uint64 matrix — the
    batched C path for id derivation (VERDICT r3 #4): digest prefixes are
    joined into ONE buffer and decoded with a single ``frombuffer``
    instead of a per-row ``int.from_bytes``. Column ``0`` masked by
    ``mask_keys`` equals ``hash64_str`` of the same strings."""
    mv, o = _string_slices(arr)
    w = 8 * words
    sha = hashlib.sha256
    joined = b"".join([sha(mv[s:e]).digest()[:w] for s, e in zip(o, o[1:])])
    return np.frombuffer(joined, dtype=">u8").astype(np.uint64).reshape(-1, words)


#: Shuffle keys (doc_id, band_key, anchors, CC labels) are 63-bit NON-NEGATIVE
#: int64: Ray Data's hash aggregates coerce key columns through int64, so a
#: uint64 with the top bit set either overflows or degrades the block to a
#: pickled-object column. One bit of entropy is the price of staying on the
#: fast Arrow path.
KEY_MASK = np.int64(0x7FFF_FFFF_FFFF_FFFF)


def mask_keys(x: np.ndarray) -> np.ndarray:
    """uint64 hash values → non-negative int64 shuffle keys."""
    return (x & np.uint64(KEY_MASK)).astype(np.int64)


def hash64_str(values) -> np.ndarray:
    """Deterministic 63-bit id per string (first 8 bytes of sha256, top bit
    cleared — see KEY_MASK).

    Used for ``doc_id`` derivation from the (repo, path, commit) key. At
    10^12 rows a 63-bit id has non-trivial birthday collision mass; the
    documented scale path is a 128-bit id split across two int64 columns
    (first 16 sha bytes) — the pipeline only relies on ids being unique,
    not dense.
    """
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.sha256(v.encode("utf-8", "surrogatepass")).digest()[:8], "big"
        )
    return mask_keys(out)


def hash128_str(values) -> "tuple[np.ndarray, np.ndarray]":
    """126-bit id per string as two non-negative int64 columns
    ``(lo, hi)`` — sha256 bytes 0-8 and 8-16, each with the top bit
    cleared (KEY_MASK). ``lo`` alone equals ``hash64_str``; ``hi`` is the
    disambiguator the ``stages/identity.py`` collision-remap pass uses to
    make ``lo`` collision-free at 10^12-row scale (``doc_id_bits=128``).
    """
    lo = np.empty(len(values), dtype=np.uint64)
    hi = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.sha256(v.encode("utf-8", "surrogatepass")).digest()
        lo[i] = int.from_bytes(d[:8], "big")
        hi[i] = int.from_bytes(d[8:16], "big")
    return mask_keys(lo), mask_keys(hi)


@_wrap_errstate
def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — cheap, well-mixed uint64→uint64."""
    x = x.astype(np.uint64, copy=True)
    x += _GOLDEN
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


#: multiplicative inverse of the (odd) FNV prime mod 2^64 — the window
#: polynomial hash telescopes into an O(n) prefix-product form because
#: every odd number is invertible in Z/2^64.
_FNV_INV = np.uint64(pow(int(_FNV_PRIME), -1, 1 << 64))

#: per-worker cache of the DATA-INDEPENDENT power tables the prefix-form
#: window hashes consume — prime^j and prime^(−j). The two cumprods were
#: ~40% of the window-hash kernel; they are pure functions of position, so
#: each worker builds them once (doubling growth) and every batch reuses
#: the prefix. Returned slices are READ-ONLY views — never write to them.
_POW_CACHE: dict = {}

#: cache cap: tables are retained for the worker's lifetime and sized by
#: the LARGEST document hashed, so an uncapped cache would pin
#: 2 bases × 8 B × (content bytes, with 2× doubling overshoot) per worker
#: forever — one 100 MB vendored blob ⇒ ~3 GB resident per worker.
#: 4M entries (32 MB per base) covers every normal source file; larger
#: requests compute their table fresh per call (one cumprod pass — cheap
#: relative to hashing a rare monster doc) and are NOT stored.
_POW_CACHE_MAX = 1 << 22


def _cached_powers(base: np.uint64, n: int) -> np.ndarray:
    if n > _POW_CACHE_MAX:
        new = np.full(n, base, dtype=np.uint64)
        new[0] = 1
        with np.errstate(over="ignore"):
            np.cumprod(new, out=new)
        return new
    cur = _POW_CACHE.get(int(base))
    if cur is None or len(cur) < n:
        m = max(n, 2 * len(cur) if cur is not None else n, 1 << 16)
        m = min(m, _POW_CACHE_MAX)
        new = np.full(m, base, dtype=np.uint64)
        new[0] = 1
        with np.errstate(over="ignore"):
            np.cumprod(new, out=new)
        _POW_CACHE[int(base)] = cur = new
    return cur[:n]


def prime_powers(n: int) -> np.ndarray:
    """READ-ONLY ``prime^j`` for j in [0, n) (cached per worker)."""
    return _cached_powers(_FNV_PRIME, n)


def inv_prime_powers(n: int) -> np.ndarray:
    """READ-ONLY ``prime^(−j)`` for j in [0, n) (cached per worker)."""
    return _cached_powers(_FNV_INV, n)


@_wrap_errstate
def _window_poly_hashes(b: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hash of every k-byte window of ``b`` —
    ``h[i] = Σ_j b[i+j]·prime^(k−1−j) mod 2^64`` — in O(n) total work via
    the prefix form ``h[i] = (Q[i+k] − Q[i]) · prime^(i+k−1)`` with
    ``Q[m] = Σ_{j<m} b[j]·prime^(−j)``. Bit-identical to the O(n·k)
    sliding-window matmul it replaces (wraparound arithmetic is exact);
    ~k/3 fewer multiplies — the fingerprint stage's dominant kernel at
    ``anchor_k = 48``. Power tables come from the per-worker cache
    (``prime^(i+k−1) = prime^i · prime^(k−1)`` — exact under mod-2^64
    commutativity)."""
    n = len(b)
    q = np.empty(n + 1, dtype=np.uint64)
    q[0] = 0
    np.cumsum(b.astype(np.uint64) * inv_prime_powers(n), out=q[1:])
    pw = prime_powers(n - k + 1) * np.uint64(pow(int(_FNV_PRIME), k - 1,
                                                 1 << 64))
    return (q[k:] - q[: n - k + 1]) * pw


@_wrap_errstate
def char_shingle_hashes_bytes(b: np.ndarray, k: int,
                              unique: bool = True) -> np.ndarray:
    """uint64 polynomial hash of every k-byte window of a uint8 array —
    the zero-copy core of :func:`char_shingle_hashes`. Callers pass
    VIEWS into an Arrow string column's data buffer (utf-8 bytes), so a
    whole batch is shingled without materializing one Python string or
    encode copy; window semantics are byte windows of the utf-8
    encoding, bit-identical to the str form."""
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(b) < k:
        powers = _FNV_PRIME ** np.arange(len(b) - 1, -1, -1, dtype=np.uint64)
        wh = (b.astype(np.uint64) * powers).sum(dtype=np.uint64)[None]
    elif k <= 12:
        # small windows: the fused k·n matmul beats the prefix form's
        # three O(n) memory passes (measured crossover ~k=12)
        win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        powers = _FNV_PRIME ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        wh = win @ powers
    else:
        wh = _window_poly_hashes(b, k)
    h = splitmix64(wh)
    return np.unique(h) if unique else h


@_wrap_errstate
def char_shingle_hashes(text: str, k: int, unique: bool = True) -> np.ndarray:
    """uint64 polynomial hash of every k-char window of ``text``.

    Vectorized: utf-8 bytes → O(n) prefix-product window hashes (see
    ``_window_poly_hashes``) → splitmix mix. Returns the *set*
    (np.unique) when ``unique`` — MinHash operates on shingle sets.
    """
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    return char_shingle_hashes_bytes(b, k, unique)


@_wrap_errstate
def token_shingle_hashes(tokens: np.ndarray, n: int, unique: bool = True) -> np.ndarray:
    """uint64 hash of every n-token window given per-token uint64 hashes."""
    t = np.asarray(tokens, dtype=np.uint64)
    if len(t) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(t) < n:
        win = t[None, :]
        powers = _FNV_PRIME ** np.arange(len(t) - 1, -1, -1, dtype=np.uint64)
    else:
        win = np.lib.stride_tricks.sliding_window_view(t, n)
        powers = _FNV_PRIME ** np.arange(n - 1, -1, -1, dtype=np.uint64)
    h = splitmix64((win * powers).sum(axis=1, dtype=np.uint64))
    return np.unique(h) if unique else h


#: multiplicative inverse of _FNV_PRIME mod 2**64 (the prime is odd, so
#: it exists) — lets the batched token hasher difference PREFIX sums:
#: hash(bytes s..e) = P**(e-1) * (T[e] - T[s]) with
#: T[j] = Σ_{i<j} b[i]·P⁻ⁱ, all arithmetic wrapping mod 2**64.
_FNV_PRIME_INV = np.uint64(pow(int(_FNV_PRIME), -1, 1 << 64))


@_wrap_errstate
def token_hashes_bytes(data: np.ndarray, offs: np.ndarray):
    """Vectorized :func:`hash_tokens` over a BATCH of space-separated
    normalized utf-8 byte docs: ``data`` is the concatenated uint8
    buffer, ``offs`` the per-doc int64 offsets (len n_docs+1, as from
    ``fingerprint._normalized_byte_views``). Returns ``(tok_h,
    tok_offs)`` — the flat uint64 token-hash array and per-doc token
    offsets (``tok_h[tok_offs[i]:tok_offs[i+1]]`` is doc i's tokens).

    Bit-identical to ``hash_tokens(norm.split())`` per doc when the
    input is whitespace-collapsed (single 0x20 separators, no
    leading/trailing) — token poly sums are reproduced exactly via
    modular prefix sums (see ``_FNV_PRIME_INV``). Replaces the per-row
    Python tokenize+hash loop of the token shingle mode (review item,
    round 5)."""
    n = len(data)
    offs = np.asarray(offs, dtype=np.int64)
    if n == 0:
        return (np.empty(0, np.uint64),
                np.zeros(len(offs), np.int64))
    sep = data == 0x20
    doc_start = np.zeros(n, bool)
    doc_start[offs[:-1][offs[:-1] < n]] = True
    doc_end = np.zeros(n, bool)
    ends_pos = offs[1:] - 1
    doc_end[ends_pos[(ends_pos >= 0) & (ends_pos < n)]] = True
    nonsep = ~sep
    starts = np.flatnonzero(nonsep & (np.r_[True, sep[:-1]] | doc_start))
    ends = np.flatnonzero(nonsep & (np.r_[sep[1:], True] | doc_end)) + 1
    if len(starts) == 0:
        return (np.empty(0, np.uint64),
                np.zeros(len(offs), np.int64))
    # prefix machinery (one cumprod/cumsum pass per batch, mod 2**64)
    pow_p = np.empty(n, np.uint64)
    pow_p[0] = 1
    np.multiply.accumulate(np.full(n - 1, _FNV_PRIME, np.uint64),
                           out=pow_p[1:]) if n > 1 else None
    pow_inv = np.empty(n, np.uint64)
    pow_inv[0] = 1
    np.multiply.accumulate(np.full(n - 1, _FNV_PRIME_INV, np.uint64),
                           out=pow_inv[1:]) if n > 1 else None
    t_pref = np.zeros(n + 1, np.uint64)
    np.cumsum(data.astype(np.uint64) * pow_inv, dtype=np.uint64,
              out=t_pref[1:])
    raw = (t_pref[ends] - t_pref[starts]) * pow_p[ends - 1]
    tok_offs = np.searchsorted(starts, offs).astype(np.int64)
    return splitmix64(raw), tok_offs


def hash_tokens(tokens: "list[str]") -> np.ndarray:
    """uint64 hash per token string (FNV-1a, C-speed via bytes→poly)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(tokens):
            b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
            h = _FNV_OFFSET
            if len(b):
                powers = _FNV_PRIME ** np.arange(len(b) - 1, -1, -1, dtype=np.uint64)
                h = np.uint64((b.astype(np.uint64) * powers).sum(dtype=np.uint64))
            out[i] = h
    return splitmix64(out)


class MinHasher:
    """P-permutation MinHash bank.

    The permutation bank (2·P uint64 parameters) is the analog of the
    reference's model weights loaded once per worker
    (``dedupe_logic/processor.py:34-45``): build one ``MinHasher`` in an
    actor's ``__init__`` and reuse it per batch. Permutations are
    multiply-xor universal hashes ``h_i(x) = ((x ^ b_i) * a_i)`` over
    uint64 with wraparound (a_i odd).

    ``signature`` chunks the shingle axis so the P×n scratch matrix stays
    under ~16M elements regardless of document size.
    """

    _CHUNK = 1 << 17  # shingles per chunk

    def __init__(self, num_perms: int, seed: int):
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        # odd multipliers, arbitrary xor offsets
        self.a = (rng.randint(0, 2**63, size=num_perms, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.randint(0, 2**63, size=num_perms, dtype=np.uint64)
        self.num_perms = num_perms

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """uint64[P] signature of one shingle set; all-max for empty sets."""
        P = self.num_perms
        if len(shingle_hashes) == 0:
            return np.full(P, np.iinfo(np.uint64).max, dtype=np.uint64)
        sig = np.full(P, np.iinfo(np.uint64).max, dtype=np.uint64)
        chunk = max(1, self._CHUNK // P * 8)
        with np.errstate(over="ignore"):
            for i in range(0, len(shingle_hashes), chunk):
                s = shingle_hashes[i : i + chunk]
                m = ((s[None, :] ^ self.b[:, None]) * self.a[:, None]).min(axis=1)
                np.minimum(sig, m, out=sig)
        return sig

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))

    @staticmethod
    def estimate_jaccard_matrix(sigs_a: np.ndarray, sigs_b: np.ndarray) -> np.ndarray:
        """Row-wise estimate for aligned (m, P) signature matrices."""
        return (sigs_a == sigs_b).mean(axis=1)


class OnePermMinHasher:
    """One-permutation MinHash with densification (public technique: Li,
    Owen & Zhang, NIPS'12; densification Shrivastava & Li, ICML'14): the
    shingle hash space is split into P bins by the TOP bits of a seeded
    remix; ``sig[p] = min`` of the remixed values landing in bin p; empty
    bins borrow from the nearest non-empty bin to the left (cyclic) —
    deterministic, so identical shingle sets always yield identical
    signatures. ``E[sig_a[p] == sig_b[p]] ≈ J`` exactly as for the
    P-permutation bank, at O(S) work per doc instead of O(P·S) — the
    fingerprint stage's dominant term at P=128.

    Drop-in for :class:`MinHasher` (same ``signature`` /
    ``estimate_jaccard*`` surface, same all-max empty-set convention);
    selected by ``PipelineConfig.minhash_mode``. Signatures from the two
    modes are NOT comparable with each other — one mode per pipeline run.
    """

    def __init__(self, num_perms: int, seed: int):
        if num_perms & (num_perms - 1):
            raise ValueError("OPH requires power-of-two num_perms")
        self.num_perms = num_perms
        self._bin_shift = np.uint64(64 - int(num_perms).bit_length() + 1)
        # seeded remix decorrelates binning from the raw shingle hashes
        # (which also seed the band keys downstream)
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        self._salt = rng.randint(0, 2**63, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        P = self.num_perms
        mx = np.iinfo(np.uint64).max
        if len(shingle_hashes) == 0:
            return np.full(P, mx, dtype=np.uint64)
        with np.errstate(over="ignore"):
            v = splitmix64(shingle_hashes ^ self._salt)
        bins = (v >> self._bin_shift).astype(np.int64)
        sig = np.full(P, mx, dtype=np.uint64)
        np.minimum.at(sig, bins, v)
        empty = sig == mx
        if empty.any():
            pos = np.where(~empty, np.arange(P), -1)
            fill = np.maximum.accumulate(pos)   # nearest non-empty ≤ p
            nonempty = np.flatnonzero(~empty)
            if len(nonempty) == 0:
                return sig
            fill = np.where(fill < 0, nonempty[-1], fill)  # cyclic wrap
            sig = sig[fill]
        return sig

    estimate_jaccard = staticmethod(MinHasher.estimate_jaccard)
    estimate_jaccard_matrix = staticmethod(MinHasher.estimate_jaccard_matrix)


def make_minhasher(cfg) -> "MinHasher | OnePermMinHasher":
    """Config-selected MinHash scheme (``minhash_mode``: 'classic' = the
    P-permutation bank, 'oph' = one-permutation + densification)."""
    if getattr(cfg, "minhash_mode", "classic") == "oph":
        return OnePermMinHasher(cfg.num_perms, cfg.minhash_seed)
    return MinHasher(cfg.num_perms, cfg.minhash_seed)


def pack_signatures(sigs: np.ndarray, bits: int = 64) -> "pa.Array":
    """(m, P) uint64 signature matrix → Arrow ``fixed_size_binary`` column
    (``bits/8``·P bytes per row). Fixed-size binary has NO offsets
    buffer, so a gathered/joined block of any row count can never
    overflow the plain-binary type's int32 offsets — a 4×-corpus run hit
    exactly that ("Negative offsets in binary array") when ~20M verify
    pairs × 512 B of gathered signatures crossed 2 GiB in one take();
    it also survives Acero hash joins as a payload field and round-trips
    parquet as FIXED_LEN_BYTE_ARRAY.

    ``bits=32`` stores the TOP 32 bits of each slot (``cfg.sig_bits`` —
    the memory-mass scale path): the slots are minima of uniformly-mixed
    uint64 values, so a uniform truncation preserves the MinHash estimator
    — for distinct slot minima the truncations collide with probability
    2⁻³², giving E[mean(sig_a == sig_b)] = J + (1−J)·2⁻³² ≈ J, and band
    keys/agreement counts are computed on the truncated values on BOTH
    sides so banding semantics are unchanged. Halves the signature
    checkpoint, the band-key build input, and the verify-bank page mass."""
    import pyarrow as pa

    m, p = sigs.shape
    if bits == 32:
        flat = ((np.ascontiguousarray(sigs, dtype="<u8") >> np.uint64(32))
                .astype("<u4").tobytes())
        w = 4 * p
    else:
        flat = np.ascontiguousarray(sigs, dtype="<u8").tobytes()
        w = 8 * p
    return pa.Array.from_buffers(
        pa.binary(w), m, [None, pa.py_buffer(flat)])


def unpack_signatures(col, p: int) -> np.ndarray:
    """Arrow fixed_size_binary (or legacy variable binary) column of
    packed signatures → (m, P) uint matrix — uint64 or uint32, inferred
    from the row byte width (so readers never need the writer's
    ``sig_bits``; resumed runs with either width or either Arrow type
    work).

    Zero-copy when the values are contiguous (always, for fixed-size;
    the common case for legacy binary); per-row copy otherwise."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    m = len(arr)
    if m == 0:
        return np.empty((0, p), dtype=np.uint64)
    if pa.types.is_fixed_size_binary(arr.type):
        w0 = arr.type.byte_width
        dt = "<u4" if w0 == 4 * p else "<u8"
        data = np.frombuffer(arr.buffers()[1], dtype=dt, count=m * p,
                             offset=arr.offset * w0)
        return data.reshape(m, p)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                            count=m + 1, offset=arr.offset * 4)
    widths = np.diff(offsets)
    w0 = int(widths[0])
    dt = "<u4" if w0 == 4 * p else "<u8"
    if (widths == w0).all() and w0 in (4 * p, 8 * p):
        data = np.frombuffer(arr.buffers()[2], dtype=dt,
                             count=m * p, offset=int(offsets[0]))
        return data.reshape(m, p)
    return np.stack([np.frombuffer(v.as_py(), dtype=dt) for v in arr])


@_wrap_errstate
def simhash64(hashes: np.ndarray, weights: "np.ndarray | None" = None) -> np.uint64:
    """64-bit SimHash of a set of feature hashes (optionally weighted).

    Second, bit-level signal — the analog of the reference's address
    embedding (``dedupe_logic/processor.py:98-103,155-160``).
    """
    import sys

    if len(hashes) == 0:
        return np.uint64(0)
    shifts = np.arange(64, dtype=np.uint64)
    if sys.byteorder == "little":
        # exact same bit counts as the shift matrix, built 8× narrower:
        # on little-endian, byte m bit j of the uint64 view is bit 8m+j,
        # which is unpackbits' little bitorder — one uint8 (S, 64) matrix
        # instead of an int64 one
        bits = np.unpackbits(
            np.ascontiguousarray(hashes, dtype=np.uint64).view(np.uint8)
            .reshape(-1, 8), axis=1, bitorder="little")
    else:  # big-endian fallback: the original shift matrix
        bits = ((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    if weights is None:
        counts = bits.sum(axis=0, dtype=np.int64)
        n = len(hashes)
    else:
        counts = (bits * weights[:, None]).sum(axis=0)
        n = weights.sum()
    vote = (2 * counts) > n  # bit set where ones outnumber zeros
    return np.uint64(np.bitwise_or.reduce(vote.astype(np.uint64) << shifts))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element popcount(a ^ b) for uint64 arrays (vectorized)."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(np.uint8)
    x = x.reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)


@_wrap_errstate
def band_keys(sig: np.ndarray, num_bands: int, rows_per_band: int) -> np.ndarray:
    """uint64 LSH band key per band: mix the r row values of each band
    together with the band index (so identical row values in different
    bands never collide into one group). ``sig`` is uint64[P]."""
    bands = sig.reshape(num_bands, rows_per_band)
    h = np.full(num_bands, _FNV_OFFSET, dtype=np.uint64)
    for j in range(rows_per_band):
        h = (h ^ bands[:, j]) * _FNV_PRIME
    h = (h ^ np.arange(num_bands, dtype=np.uint64)) * _FNV_PRIME
    return mask_keys(splitmix64(h))


@_wrap_errstate
def band_keys_batch(sigs: np.ndarray, num_bands: int, rows_per_band: int) -> np.ndarray:
    """(m, P) signatures → (m, num_bands) uint64 band keys, vectorized.
    Accepts uint32 (truncated, ``sig_bits=32``) or uint64 slots — the FNV
    mix upcasts; keys from the two widths differ (both sides of any
    compare always use one width)."""
    m = sigs.shape[0]
    if sigs.dtype != np.uint64:
        sigs = sigs.astype(np.uint64)
    bands = sigs.reshape(m, num_bands, rows_per_band)
    h = np.full((m, num_bands), _FNV_OFFSET, dtype=np.uint64)
    for j in range(rows_per_band):
        h = (h ^ bands[:, :, j]) * _FNV_PRIME
    h = (h ^ np.arange(num_bands, dtype=np.uint64)[None, :]) * _FNV_PRIME
    return mask_keys(splitmix64(h.ravel())).reshape(m, num_bands)


@_wrap_errstate
def bottom_k(hashes: np.ndarray, k: int) -> np.ndarray:
    """Bottom-k sketch (k smallest distinct hash values) — used for the
    suffix-anchor substring pass and as a mergeable set sketch."""
    u = np.unique(hashes)
    return u[:k] if len(u) > k else u


@_wrap_errstate
def bottom_k_distinct(hashes: np.ndarray, k: int) -> np.ndarray:
    """``bottom_k`` over a RAW (possibly duplicated) hash array without the
    full O(n log n) sort: an O(n) ``np.partition`` prefilter keeps the
    m+1 globally smallest raw values; if they contain ≥ k distinct values,
    those are exactly the k smallest distinct overall (any missing smaller
    distinct value would itself be among the m+1 smallest — contradiction).
    Heavy-duplicate underflow falls back to the full sort. Bit-identical
    to ``bottom_k(hashes, k)``."""
    n = len(hashes)
    m = max(4 * k, k + 32)
    if n <= m + 1:
        return bottom_k(hashes, k)
    part = np.partition(hashes, m)[: m + 1]
    u = np.unique(part)
    if len(u) >= k:
        return u[:k]
    return bottom_k(hashes, k)


@_wrap_errstate
def rolling_fingerprint(text: str, window: int = 64, keep: int = 8) -> np.ndarray:
    """Document fingerprint: bottom-``keep`` of the rolling ``window``-gram
    hashes (a winnowing-style sketch). Deterministic; mergeable by min."""
    h = char_shingle_hashes(text, window, unique=False)
    return bottom_k_distinct(h, keep)


@_wrap_errstate
def rolling_fingerprint_batch(arr, window: int = 64,
                              keep: int = 8) -> "tuple[np.ndarray, np.ndarray]":
    """Batched :func:`rolling_fingerprint` over an Arrow string column with
    no per-row Python in the hot path (VERDICT r3 #6): ONE flat
    window-hash pass over the concatenated value buffer (windows that
    straddle document boundaries are computed but never selected), then
    one global lexsort for the per-doc bottom-``keep``-distinct.

    Returns ``(values, doc_offsets)``: doc ``i``'s sketch is
    ``values[doc_offsets[i]:doc_offsets[i+1]]`` in ascending order —
    bit-identical to ``rolling_fingerprint(text_i, window, keep)``
    (the flat polynomial window hash depends only on the window's own
    bytes, so in-doc positions hash identically to the per-doc pass).

    The bottom-k reduction stays a per-doc slice loop ON PURPOSE: each
    doc's ``bottom_k_distinct`` is an O(n) C partition over its own view
    of the flat hash array — measured 2.5× FASTER than the "fully
    vectorized" global lexsort over all window hashes, which pays
    O(N log N) on the full window population to extract k·m values."""
    import pyarrow as pa

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    m = len(a)
    if m == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    big = (pa.types.is_large_string(a.type) or pa.types.is_large_binary(a.type))
    dt = np.int64 if big else np.int32
    o = np.frombuffer(a.buffers()[1], dtype=dt, count=m + 1,
                      offset=a.offset * dt().itemsize)
    buf = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    k = window
    win = (splitmix64(_window_poly_hashes(buf, k))
           if len(buf) >= k else np.empty(0, np.uint64))
    ol = o.tolist()
    parts: "list[np.ndarray]" = []
    offs = np.zeros(m + 1, np.int64)
    for i in range(m):
        s, e = ol[i], ol[i + 1]
        ln = e - s
        if ln >= k:
            fp = bottom_k_distinct(win[s:e - k + 1], keep)
        elif ln > 0:  # whole-text single shingle (char_shingle_hashes form)
            seg = buf[s:e].astype(np.uint64)
            powers = prime_powers(ln)[::-1]
            fp = splitmix64(
                np.array([(seg * powers).sum(dtype=np.uint64)], np.uint64))
        else:
            fp = np.empty(0, np.uint64)
        parts.append(fp)
        offs[i + 1] = offs[i] + len(fp)
    vals = np.concatenate(parts) if parts else np.empty(0, np.uint64)
    return vals, offs
