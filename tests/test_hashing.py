"""Unit tests for the hashing kernels (SURVEY.md §5: shingler, MinHash
estimator error bound, band-key derivation, SimHash hamming)."""

import numpy as np
import pytest

from fuzzy_dedupe_pipeline_ray.functions.hashing import (
    MinHasher,
    band_keys,
    band_keys_batch,
    bottom_k,
    char_shingle_hashes,
    hamming64,
    hash64_str,
    hash_tokens,
    rolling_fingerprint,
    simhash64,
    splitmix64,
    token_shingle_hashes,
)


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b))
    union = len(np.union1d(a, b))
    return inter / union if union else 1.0


def test_char_shingles_deterministic_and_set_semantics():
    t = "the quick brown fox jumps over the lazy dog"
    h1 = char_shingle_hashes(t, 5)
    h2 = char_shingle_hashes(t, 5)
    assert np.array_equal(h1, h2)
    assert len(h1) <= len(t) - 4
    assert h1.dtype == np.uint64
    # short text → one whole-text shingle
    assert len(char_shingle_hashes("ab", 5)) == 1
    assert len(char_shingle_hashes("", 5)) == 0


def test_char_shingles_distinguish_strings():
    a = char_shingle_hashes("hello world one", 5)
    b = char_shingle_hashes("completely different text", 5)
    assert exact_jaccard(a, b) < 0.1


def test_minhash_estimator_accuracy():
    """Estimator error vs exact Jaccard within ~4σ for P=128 (σ≈sqrt(J(1-J)/P))."""
    rng = np.random.RandomState(7)
    mh = MinHasher(128, seed=123)
    universe = splitmix64(rng.randint(0, 2**63, 4000, dtype=np.uint64))
    a = universe[:3000]
    for overlap in (0.9, 0.7, 0.5, 0.2):
        n_common = int(3000 * overlap)
        b = np.concatenate([a[:n_common], universe[3000: 3000 + (3000 - n_common)]])
        jt = exact_jaccard(a, b)
        est = MinHasher.estimate_jaccard(mh.signature(a), mh.signature(b))
        sigma = np.sqrt(jt * (1 - jt) / 128) + 1e-9
        assert abs(est - jt) < 4 * sigma + 0.02, (overlap, jt, est)


def test_minhash_identical_and_empty():
    mh = MinHasher(64, seed=1)
    s = char_shingle_hashes("some text to hash here", 4)
    assert MinHasher.estimate_jaccard(mh.signature(s), mh.signature(s)) == 1.0
    empty = mh.signature(np.empty(0, dtype=np.uint64))
    assert (empty == np.iinfo(np.uint64).max).all()


def test_minhash_chunking_invariant():
    """Signature must not depend on the internal chunk size."""
    mh = MinHasher(32, seed=5)
    big = splitmix64(np.arange(300_000, dtype=np.uint64))
    sig1 = mh.signature(big)
    old = MinHasher._CHUNK
    try:
        MinHasher._CHUNK = 1 << 8
        sig2 = mh.signature(big)
    finally:
        MinHasher._CHUNK = old
    assert np.array_equal(sig1, sig2)


def test_band_keys_match_iff_band_rows_match():
    rng = np.random.RandomState(3)
    sig_a = rng.randint(0, 2**63, 128, dtype=np.uint64)
    sig_b = sig_a.copy()
    sig_b[4:8] = rng.randint(0, 2**63, 4, dtype=np.uint64)  # corrupt band 1 (r=4)
    ka, kb = band_keys(sig_a, 32, 4), band_keys(sig_b, 32, 4)
    assert ka[0] == kb[0] and (ka[2:] == kb[2:]).all()
    assert ka[1] != kb[1]
    # same row values in different band positions must not collide
    assert len(np.unique(ka)) == 32


def test_band_keys_batch_matches_single():
    rng = np.random.RandomState(9)
    sigs = rng.randint(0, 2**63, (10, 128), dtype=np.uint64)
    batch = band_keys_batch(sigs, 32, 4)
    for i in range(10):
        assert np.array_equal(batch[i], band_keys(sigs[i], 32, 4))


def test_simhash_similar_vs_different():
    a = char_shingle_hashes("def f(x):\n    return x + 1\n" * 20, 7)
    b = char_shingle_hashes("def f(x):\n    return x + 2\n" * 20, 7)
    c = char_shingle_hashes("class Totally(Different):\n    pass\n" * 20, 7)
    ha = simhash64(a)
    d_ab = hamming64(np.array([ha]), np.array([simhash64(b)]))[0]
    d_ac = hamming64(np.array([ha]), np.array([simhash64(c)]))[0]
    assert d_ab < d_ac
    assert hamming64(np.array([ha]), np.array([ha]))[0] == 0


def test_hamming64_known_values():
    assert hamming64(np.array([0], np.uint64), np.array([0b1011], np.uint64))[0] == 3
    assert hamming64(np.array([2**64 - 1], np.uint64),
                     np.array([0], np.uint64))[0] == 64


def test_hash64_str_stable_and_distinct():
    a = hash64_str(["x", "y", "x"])
    assert a[0] == a[2] and a[0] != a[1]
    assert a.dtype == np.int64 and (a >= 0).all()


def test_token_shingles_and_hash_tokens():
    toks = hash_tokens("a b c d e".split())
    tri = token_shingle_hashes(toks, 3)
    assert len(tri) == 3
    toks2 = hash_tokens("a b c d e".split())
    assert np.array_equal(toks, toks2)


def test_bottom_k_and_rolling_fingerprint():
    h = np.array([9, 3, 7, 3, 1], dtype=np.uint64)
    assert np.array_equal(bottom_k(h, 2), np.array([1, 3], dtype=np.uint64))
    fp1 = rolling_fingerprint("x" * 10 + "some longer document body " * 10)
    fp2 = rolling_fingerprint("x" * 10 + "some longer document body " * 10)
    assert np.array_equal(fp1, fp2)
    assert len(fp1) <= 8


@pytest.mark.parametrize("p,b,r", [(128, 32, 4), (64, 16, 4), (128, 16, 8)])
def test_lsh_catch_probability_shape(p, b, r):
    """1-(1-s^r)^b must be ≈1 well above threshold and small well below."""
    s_hi, s_lo = 0.9, 0.2
    hi = 1 - (1 - s_hi**r) ** b
    lo = 1 - (1 - s_lo**r) ** b
    assert hi > 0.999
    assert lo < 0.25


def test_oph_estimator_accuracy():
    """One-permutation MinHash (densified) estimator error within ~4σ of
    exact Jaccard for P=128 on large sets (σ ≈ sqrt(J(1−J)/P))."""
    from fuzzy_dedupe_pipeline_ray.functions.hashing import OnePermMinHasher

    rng = np.random.RandomState(11)
    mh = OnePermMinHasher(128, seed=123)
    universe = splitmix64(rng.randint(0, 2**63, 4000, dtype=np.uint64))
    a = universe[:3000]
    for overlap in (0.9, 0.7, 0.5, 0.2):
        n_common = int(3000 * overlap)
        b = np.concatenate([a[:n_common], universe[3000: 3000 + (3000 - n_common)]])
        jt = exact_jaccard(a, b)
        est = OnePermMinHasher.estimate_jaccard(mh.signature(a), mh.signature(b))
        sigma = np.sqrt(jt * (1 - jt) / 128) + 1e-9
        assert abs(est - jt) < 4 * sigma + 0.02, (overlap, jt, est)


def test_oph_identical_empty_and_sparse():
    from fuzzy_dedupe_pipeline_ray.functions.hashing import OnePermMinHasher

    mh = OnePermMinHasher(64, seed=1)
    s = char_shingle_hashes("some text to hash here", 4)
    # deterministic: identical sets → identical signatures (densification
    # is a pure function of the bin occupancy)
    assert np.array_equal(mh.signature(s), mh.signature(s.copy()))
    assert OnePermMinHasher.estimate_jaccard(mh.signature(s), mh.signature(s)) == 1.0
    empty = mh.signature(np.empty(0, dtype=np.uint64))
    assert (empty == np.iinfo(np.uint64).max).all()
    # sparse set (fewer shingles than bins): every bin densified, no MAX left
    tiny = char_shingle_hashes("ab", 4)
    sig = mh.signature(tiny)
    assert (sig != np.iinfo(np.uint64).max).all()


def test_bottom_k_distinct_matches_bottom_k():
    from fuzzy_dedupe_pipeline_ray.functions.hashing import (bottom_k,
                                                             bottom_k_distinct)

    rng = np.random.RandomState(2)
    for trial in range(200):
        # every third trial is heavy-duplicate (values from a tiny range)
        hi = 40 if trial % 3 == 0 else 2**50
        h = rng.randint(0, hi, size=rng.randint(1, 5000)).astype(np.uint64)
        k = int(rng.choice([4, 8, 16]))
        assert np.array_equal(bottom_k(h, k), bottom_k_distinct(h, k))


def test_arrow_sha_kernels_match_list_forms():
    """sha256_hex_arrow / sha256_u64_arrow over an Arrow column must equal
    the per-row list kernels (including sliced and chunked arrays) — the
    ingest identity path depends on byte-identical digests."""
    import pyarrow as pa

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        hash64_str,
        hash128_str,
        mask_keys,
        sha256_hex,
        sha256_hex_arrow,
        sha256_u64_arrow,
    )

    vals = ["", "x", "hello world", "répo\x00päth\x00commit", "a" * 5000]
    arr = pa.array(vals, pa.string())
    assert sha256_hex_arrow(arr) == sha256_hex(vals)
    d = sha256_u64_arrow(arr, 2)
    np.testing.assert_array_equal(mask_keys(d[:, 0]), hash64_str(vals))
    lo, hi = hash128_str(vals)
    np.testing.assert_array_equal(mask_keys(d[:, 1]), hi)
    # sliced + chunked views must respect offsets
    sliced = arr.slice(1, 3)
    assert sha256_hex_arrow(sliced) == sha256_hex(vals[1:4])
    chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(2)])
    assert sha256_hex_arrow(chunked) == sha256_hex(vals)
    empty = pa.array([], pa.string())
    assert sha256_hex_arrow(empty) == []
    assert sha256_u64_arrow(empty, 2).shape == (0, 2)


def test_rolling_fingerprint_batch_matches_per_row():
    """The batched flat-buffer fingerprint kernel must be bit-identical to
    the per-row rolling_fingerprint on every shape: empty docs, sub-window
    docs, exact-window docs, long docs, duplicate contents."""
    import pyarrow as pa

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        rolling_fingerprint,
        rolling_fingerprint_batch,
    )

    w, keep = 32, 8
    texts = ["", "tiny", "x" * (w - 1), "y" * w, "z" * (w + 1),
             "the quick brown fox jumps over the lazy dog " * 40,
             "the quick brown fox jumps over the lazy dog " * 40,  # dup
             "short again", "m" * 500]
    arr = pa.array(texts, pa.string())
    vals, offs = rolling_fingerprint_batch(arr, w, keep)
    assert len(offs) == len(texts) + 1
    for i, t in enumerate(texts):
        got = vals[offs[i]:offs[i + 1]]
        np.testing.assert_array_equal(got, rolling_fingerprint(t, w, keep),
                                      err_msg=f"doc {i}")
    # sliced + chunked views
    sl = arr.slice(2, 4)
    v2, o2 = rolling_fingerprint_batch(sl, w, keep)
    for i in range(4):
        np.testing.assert_array_equal(
            v2[o2[i]:o2[i + 1]], rolling_fingerprint(texts[2 + i], w, keep))
    ch = pa.chunked_array([arr.slice(0, 3), arr.slice(3)])
    v3, o3 = rolling_fingerprint_batch(ch, w, keep)
    np.testing.assert_array_equal(v3, vals)
    np.testing.assert_array_equal(o3, offs)
    # all-empty batch
    v4, o4 = rolling_fingerprint_batch(pa.array([], pa.string()), w, keep)
    assert len(v4) == 0 and list(o4) == [0]


def test_pack_signatures_32bit_roundtrip_and_semantics():
    """sig_bits=32 stores the top 32 bits of each slot; unpack infers the
    width from the row bytes, and equality/banding semantics survive the
    truncation (identical inputs stay identical, distinct stay distinct)."""
    import pyarrow as pa

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        pack_signatures,
        unpack_signatures,
    )

    rng = np.random.RandomState(5)
    sigs = rng.randint(0, 2**63, size=(7, 16)).astype(np.uint64)
    sigs[3] = sigs[1]  # planted identical row
    arr = pack_signatures(sigs, bits=32)
    back = unpack_signatures(arr, 16)
    assert back.dtype == np.uint32
    np.testing.assert_array_equal(back, (sigs >> np.uint64(32)).astype(np.uint32))
    assert (back[3] == back[1]).all()
    assert not (back[0] == back[2]).all()
    # band keys computed from truncated slots: identical rows → identical keys
    from fuzzy_dedupe_pipeline_ray.functions.hashing import band_keys_batch

    keys = band_keys_batch(back, 4, 4)
    np.testing.assert_array_equal(keys[3], keys[1])
    assert not (keys[0] == keys[2]).all()
    # sliced unpack respects offsets at the 4-byte width
    np.testing.assert_array_equal(
        unpack_signatures(pa.chunked_array([arr.slice(2, 3)]), 16), back[2:5])


def test_kmv_estimator_accuracy():
    """KMV estimate D-hat = (k-1)*2^63 // h_k within 4 sigma (sigma ~
    D/sqrt(k-2)) of the true distinct count, for several set sizes."""
    import numpy as np

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (bottom_k,
                                                             mask_keys,
                                                             sha256_u64_arrow)
    from fuzzy_dedupe_pipeline_ray.pipelines.textops import _KMV_SPACE, KMV_K

    import pyarrow as pa

    for d in (5_000, 50_000):
        vals = pa.array([f"item-{i}" for i in range(d)])
        h = np.unique(mask_keys(sha256_u64_arrow(vals)[:, 0]))
        assert len(h) == d  # no 63-bit collisions at this size
        merged = bottom_k(h.astype(np.uint64), KMV_K)
        est = (KMV_K - 1) * _KMV_SPACE // int(merged[-1])
        sigma = d / (KMV_K - 2) ** 0.5
        assert abs(est - d) < 4 * sigma, (d, est)
