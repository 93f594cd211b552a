"""Property tests (hypothesis) for the pure kernels: pair emission vs a
brute-force reference, the n-gram prefix filter's no-lost-pairs guarantee,
and rolling-hash common-span vs brute-force LCS."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzzy_dedupe_pipeline_ray.pipelines.textops import _ngram_pairs_local
from fuzzy_dedupe_pipeline_ray.stages.lsh import _local_grouped_pairs
from fuzzy_dedupe_pipeline_ray.stages.substring import longest_common_span


@st.composite
def keyed_rows(draw):
    n = draw(st.integers(1, 200))
    keys = draw(st.lists(st.integers(0, 20), min_size=n, max_size=n))
    docs = draw(st.lists(st.integers(0, 40), min_size=n, max_size=n))
    return np.array(keys, np.int64), np.array(docs, np.int64)


def _brute_pairs(keys, docs, cap):
    out = set()
    for k in np.unique(keys):
        ids = np.unique(docs[keys == k])
        if len(ids) < 2:
            continue
        if len(ids) <= cap:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out.add((ids[i], ids[j]))
        else:
            for x in ids[1:]:
                out.add((ids[0], x))
    return out


@settings(max_examples=200, deadline=None)
@given(keyed_rows(), st.integers(2, 10))
def test_local_grouped_pairs_matches_brute_force(rows, cap):
    keys, docs = rows
    a, b = _local_grouped_pairs(keys, docs, cap)
    got = set(zip(a.tolist(), b.tolist()))
    assert got == _brute_pairs(keys, docs, cap)
    assert all(x < y for x, y in got)


@st.composite
def doc_shingle_sets(draw):
    n_docs = draw(st.integers(2, 12))
    vocab = draw(st.integers(3, 15))
    sets = []
    for _ in range(n_docs):
        s = draw(st.sets(st.integers(0, vocab - 1), min_size=1,
                         max_size=vocab))
        sets.append(sorted(s))
    return sets


@settings(max_examples=200, deadline=None)
@given(doc_shingle_sets())
def test_ngram_prefix_filter_is_exact(sets):
    """Every pair with Jaccard ≥ 1/2 must survive the prefix-filtered
    candidate generation + verification, with exact inter/union."""
    doc = np.concatenate([np.full(len(s), i, np.int64)
                          for i, s in enumerate(sets)])
    code = np.concatenate([np.array(s, np.int64) for s in sets])
    df = np.bincount(code, minlength=int(code.max()) + 1).astype(np.int64)
    a, b, inter, union = _ngram_pairs_local(doc, code, df)
    got = {(x, y): (i, u) for x, y, i, u in
           zip(a.tolist(), b.tolist(), inter.tolist(), union.tolist())}

    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            si, sj = set(sets[i]), set(sets[j])
            inter_ij = len(si & sj)
            union_ij = len(si | sj)
            if inter_ij and 2 * inter_ij >= union_ij:
                want[(i, j)] = (inter_ij, union_ij)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abc", max_size=60),
       st.text(alphabet="abc", max_size=60),
       st.integers(1, 8))
def test_longest_common_span_matches_brute_force(a, b, min_len):
    def brute(a, b):
        best = 0
        for i in range(len(a)):
            for j in range(len(b)):
                k = 0
                while (i + k < len(a) and j + k < len(b)
                       and a[i + k] == b[j + k]):
                    k += 1
                best = max(best, k)
        return best

    true_len = brute(a, b)
    span, sa, sb = longest_common_span(a, b, min_len)
    if true_len >= min_len:
        assert span == true_len
        assert a[sa:sa + span] == b[sb:sb + span]
    else:
        assert span == 0


_LANG_WORDS = ["the", "and", "la", "le", "el", "der", "und", "est", "es",
               "que", "un", "una", "xyz", "qrs", "", " ", "\t", "THE", "La"]


@given(st.lists(
    st.lists(st.sampled_from(_LANG_WORDS), max_size=25).map(" ".join),
    max_size=30))
def test_lang_id_vectorized_matches_reference_loop(texts):
    """The bitmask/popcount lang_id kernel must be row-for-row identical
    to the per-row reference loop it replaced (VERDICT r2 anti-pattern 5)."""
    from fuzzy_dedupe_pipeline_ray.functions.textnorm import (
        _LANG_MARKERS,
        lang_id,
    )

    def ref(ts):
        out = []
        for t in ts:
            toks = set(t.lower().split())
            best, best_n = "unknown", 0
            for code in sorted(_LANG_MARKERS):
                n = len(toks & _LANG_MARKERS[code])
                if n > best_n:
                    best, best_n = code, n
            out.append(best)
        return out

    assert lang_id(texts) == ref(texts)


def test_normalize_for_shingles_array_matches_scalar():
    """The Arrow-native whitespace collapse must equal the Python form on
    source-code-like text (property over printable + \\t\\n\\r\\f ws)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
    from fuzzy_dedupe_pipeline_ray.stages.fingerprint import (
        normalize_for_shingles,
        normalize_for_shingles_array,
    )

    alphabet = st.sampled_from(
        list("abcXYZ019!{}/*#") + [" ", "\t", "\n", "\r", "\f", "\v"])

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(alphabet=alphabet, max_size=40), max_size=8))
    def check(texts):
        for cfg in (PipelineConfig(),
                    PipelineConfig(lowercase=True)):
            got = normalize_for_shingles_array(
                pa.array(texts, pa.string()), cfg).to_pylist()
            want = [normalize_for_shingles(t, cfg) for t in texts]
            assert got == want

    check()


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abc", max_size=60),
       st.text(alphabet="abc", max_size=60),
       st.integers(1, 8))
def test_lcs_suffix_array_matches_rolling_hash(a, b, min_len):
    """The suffix-array span kernel (span_kernel="suffix_array") returns
    the SAME span_len as the rolling-hash kernel on every input, and its
    reported start positions index a real common slice."""
    from fuzzy_dedupe_pipeline_ray.stages.substring import lcs_suffix_array

    span_rh, _, _ = longest_common_span(a, b, min_len)
    span_sa, ia, ib = lcs_suffix_array(a, b, min_len)
    assert span_sa == span_rh
    if span_sa:
        assert a[ia:ia + span_sa] == b[ib:ib + span_sa]
