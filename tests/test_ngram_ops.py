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
