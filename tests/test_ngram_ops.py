"""Kernel tests for the word n-gram operators (decontamination /
novelty): distinctness, document-boundary isolation, short docs, empty
and whitespace-only text. End-to-end oracle parity for the three query
entries is covered by tests/test_oracle_parity.py."""

import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.pipelines.textops import _doc_ngrams


def _grams_by_row(texts, n):
    rows, grams = _doc_ngrams(pa.chunked_array([pa.array(texts)]), n)
    out = {}
    for r, g in zip(rows.tolist(), grams.to_pylist()):
        out.setdefault(r, set()).add(g)
    return out, len(rows)


def test_bigrams_basic_and_boundary():
    by_row, total = _grams_by_row(["a b c d", "b c"], 2)
    assert by_row[0] == {"a b", "b c", "c d"}
    assert by_row[1] == {"b c"}
    # no gram spans the doc boundary ("d b" must not exist)
    assert "d b" not in by_row[0] and "d b" not in by_row[1]
    assert total == 4


def test_distinct_within_doc():
    by_row, total = _grams_by_row(["x x x x"], 2)
    assert by_row == {0: {"x x"}}
    assert total == 1  # three occurrences, one distinct pair


def test_short_empty_and_whitespace_docs():
    by_row, total = _grams_by_row(["solo", "", "   ", "a b"], 2)
    assert 0 not in by_row and 1 not in by_row and 2 not in by_row
    assert by_row[3] == {"a b"}
    assert total == 1


def test_lowercase_and_ws_collapse_match_oracle_tokenization():
    by_row, _ = _grams_by_row(["  Foo\tBAR \n baz  "], 3)
    assert by_row == {0: {"foo bar baz"}}


def test_n_longer_than_every_doc():
    by_row, total = _grams_by_row(["a b", "c"], 5)
    assert by_row == {} and total == 0


def test_null_text_treated_as_empty():
    # NULL text must behave like an empty doc (review finding): without
    # the fill_null the null list's NaN length crashed np.repeat and
    # list_flatten silently misaligned rows
    from fuzzy_dedupe_pipeline_ray.pipelines.textops import (
        _exploded_token_codes,
    )

    col = pa.chunked_array([pa.array(["a b", None, "c"])])
    rows, codes, vocab = _exploded_token_codes(col)
    assert rows.tolist() == [0, 0, 2]
    by_row, total = _grams_by_row(["a b", None, "a b"], 2)
    assert by_row == {0: {"a b"}, 2: {"a b"}} and total == 2


def _write_docs(d, ids, texts):
    import os

    import pyarrow.parquet as pq
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["t"] * len(ids)),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")


_LONG = "a b c d e f g h i j"


def test_decontaminate_degenerate_sides(ray_session, tmp_path):
    from fuzzy_dedupe_pipeline_ray.pipelines.textops import doc_decontaminate

    # no benchmark docs at all -> all zeros (schema-less-groupby guard)
    d = str(tmp_path / "nobench")
    _write_docs(d, [1, 2, 3], [_LONG, _LONG, "short text"])
    out = doc_decontaminate(d).to_pandas()
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_overlap"].tolist() == [0, 0, 0]
    assert not out["contaminated"].any()

    # benchmark exists but no doc reaches n tokens -> all zeros
    d = str(tmp_path / "short")
    _write_docs(d, [0, 1, 2], ["a b", "c d", "e"])
    out = doc_decontaminate(d).to_pandas()
    assert out["n_overlap"].tolist() == [0, 0]


def test_decontaminate_real_overlap(ray_session, tmp_path):
    from fuzzy_dedupe_pipeline_ray.pipelines.textops import doc_decontaminate

    d = str(tmp_path / "overlap")
    # doc 0 is benchmark; doc 1 embeds the full benchmark text (shares all
    # six 5-grams); doc 2 shares none
    _write_docs(d, [0, 1, 2], [_LONG, "z z " + _LONG, "q r s t u v"])
    out = doc_decontaminate(d).to_pandas()
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_overlap"].tolist() == [6, 0]
    assert out["contaminated"].tolist() == [True, False]


def test_novelty_dup_docs_and_no_grams(ray_session, tmp_path):
    from fuzzy_dedupe_pipeline_ray.pipelines.textops import doc_ngram_novelty

    # identical docs: the min-doc_id one gets every gram as new
    d = str(tmp_path / "dups")
    _write_docs(d, [7, 3], ["x y z w", "x y z w"])
    out = doc_ngram_novelty(d).to_pandas()
    assert out["doc_id"].tolist() == [3, 7]
    assert out["n_distinct_ngrams"].tolist() == [2, 2]
    assert out["n_new_ngrams"].tolist() == [2, 0]

    # no doc reaches n tokens -> zero-fill path
    d = str(tmp_path / "nogram")
    _write_docs(d, [1, 2], ["a b", "c"])
    out = doc_ngram_novelty(d).to_pandas()
    assert out["n_distinct_ngrams"].tolist() == [0, 0]
    assert out["n_new_ngrams"].tolist() == [0, 0]


def test_doc_ngrams_matches_naive_reference():
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fuzzy_dedupe_pipeline_ray.functions import textnorm

    ws_re = re.compile(textnorm._WS)

    def naive(texts, n):
        out = set()
        for i, t in enumerate(texts):
            if t is None:
                continue
            toks = [x for x in ws_re.split(t.strip().lower()) if x != ""]
            for j in range(len(toks) - n + 1):
                out.add((i, " ".join(toks[j:j + n])))
        return out

    alphabet = st.sampled_from(list("ab xyz09 .,-_\t\n\ré汉"))
    texts_s = st.lists(
        st.one_of(st.none(), st.text(alphabet, max_size=40)),
        min_size=0, max_size=8)

    @settings(max_examples=200, deadline=None)
    @given(texts=texts_s, n=st.integers(2, 4))
    def check(texts, n):
        rows, grams = _doc_ngrams(
            pa.chunked_array([pa.array(texts, pa.string())]), n)
        got = set(zip(rows.tolist(), grams.to_pylist()))
        assert got == naive(texts, n)

    check()


def test_curation_funnel_crafted_corpus(ray_session, tmp_path):
    from fuzzy_dedupe_pipeline_ray.pipelines.textops import (
        doc_curation_funnel,
    )

    d = str(tmp_path / "funnel")
    en = "the cat and the dog run far away in the sun"  # en markers, clean
    _write_docs(d, [1, 2, 3, 4, 5], [
        en,                      # quality + en
        en,                      # exact duplicate of 1
        "der hund ist auf das",  # quality but de-marked
        "a b!!!!!!!!!!!!!!!!!",  # punct-heavy -> fails quality
        "one two",               # <5 tokens -> fails quality
    ])
    t = doc_curation_funnel(d).to_pydict()
    assert t == {"n_total": [5], "n_quality_ok": [3],
                 "n_quality_en": [2], "n_quality_en_unique": [1]}


def test_stratified_sample_deterministic(ray_session, tmp_path):
    from fuzzy_dedupe_pipeline_ray.pipelines.textops import (
        doc_sample_stratified,
    )

    sf = "/root/testdata/sf0.001"
    a = doc_sample_stratified(sf).to_pandas()
    b = doc_sample_stratified(sf).to_pandas()
    assert a.equals(b)
    # per-lang quota respected and ranks contiguous from 1
    for lang, g in a.groupby("lang"):
        assert g["sample_rank"].tolist() == list(range(1, len(g) + 1))
        assert len(g) <= 20


def test_textops_distributed_tiers_match_broadcast(ray_session, monkeypatch):
    """Force every broadcast/local fast path off (the 100 TB physical
    plan) for the join-based text operators and require bit-identical
    results to the default tiers — the same equivalence discipline
    tests/test_lsh_paths.py applies to the flagship stages."""
    import dataclasses

    from fuzzy_dedupe_pipeline_ray.pipelines import textops

    sf = "/root/testdata/sf0.001"
    ops = {
        "decontaminate": textops.doc_decontaminate,
        "novelty": textops.doc_ngram_novelty,
        "rarest": textops.doc_rarest_token,
        "tfidf": textops.doc_tfidf_top_terms,
    }
    base = {k: f(sf).to_pandas().reset_index(drop=True)
            for k, f in ops.items()}

    forced = dataclasses.replace(
        textops.DOCS_CFG, broadcast_max_rows=0, keyed_broadcast_max_rows=0,
        wide_broadcast_max_rows=0, wide_broadcast_max_bytes=0)
    monkeypatch.setattr(textops, "DOCS_CFG", forced)
    for k, f in ops.items():
        got = f(sf).to_pandas().reset_index(drop=True)
        assert got.equals(base[k]), k
