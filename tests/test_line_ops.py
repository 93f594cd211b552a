"""Line-level corpus hygiene + containment-pair tests: CCNet-style
corpus line dedup (both physical tiers), Gopher within-doc repetition
counts vs a naive reference, and exact n-gram containment pairs vs brute
force (the subset-duplication case Jaccard provably misses). End-to-end
DuckDB parity for all three query entries is covered by
tests/test_oracle_parity.py; these tests exercise the semantics on
multi-line data the single-line synthetic documents table cannot."""

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.pipelines import textops


def _write_docs(d, ids, texts):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["t"] * len(ids)),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")


_TINY_GATE = PipelineConfig(shingle_mode="char", shingle_k=7,
                            lowercase=False, broadcast_max_rows=1)

_HEADER = "// SPDX-License-Identifier: MIT"
_NAV = "home | about | contact"


def _boilerplate_corpus(d):
    _write_docs(d, [1, 2, 3, 4], [
        f"{_HEADER}\nunique line one\n\nbody of doc one",
        f"{_HEADER}\n{_NAV}\nbody of doc two",
        f"{_NAV}\n   \nonly doc three text",
        f"{_HEADER}\n{_NAV}",                 # nothing survives
    ])


def test_line_dedupe_strips_cross_doc_boilerplate(ray_session, tmp_path):
    d = str(tmp_path / "docs")
    _boilerplate_corpus(d)
    out = textops.doc_line_dedupe(d).to_pandas().set_index("doc_id")

    # HEADER appears in docs 1,2,4 and NAV in 2,3,4 -> both stripped
    assert out.loc[1, "kept_text"] == "unique line one\n\nbody of doc one"
    assert out.loc[2, "kept_text"] == "body of doc two"
    # whitespace-only segments are kept (never dedup targets)
    assert out.loc[3, "kept_text"] == "   \nonly doc three text"
    assert out.loc[4, "kept_text"] == ""      # all lines were boilerplate
    assert out["n_lines"].tolist() == [4, 3, 3, 2]
    assert out["n_dup_lines"].tolist() == [1, 2, 1, 2]


def test_line_dedupe_distributed_tier_identical(ray_session, tmp_path):
    d = str(tmp_path / "docs")
    _boilerplate_corpus(d)
    fast = textops.doc_line_dedupe(d).to_pandas()
    dist = textops.doc_line_dedupe(d, cfg=_TINY_GATE).to_pandas()
    assert fast.equals(dist)


def test_line_dedupe_within_doc_repeat_not_stripped(ray_session, tmp_path):
    # a line repeated INSIDE one doc but in no other doc stays: the dedup
    # unit is distinct-document frequency, not occurrence count
    d = str(tmp_path / "docs")
    _write_docs(d, [1, 2], ["same\nsame\nother", "different text"])
    out = textops.doc_line_dedupe(d).to_pandas()
    assert out["kept_text"].tolist() == ["same\nsame\nother",
                                         "different text"]
    assert out["n_dup_lines"].tolist() == [0, 0]


def test_gopher_repetition_counts(ray_session, tmp_path):
    d = str(tmp_path / "docs")
    texts = [
        "x\nx\nx\ny",           # x dup 3 times: occ 2, chars 3*1
        "a b\n\n\na b\nc",      # empty lines NOT dup targets; "a b" occ 1
        "solo",
        "  \n  ",               # whitespace-only: no dup stats at all
    ]
    _write_docs(d, [10, 11, 12, 13], texts)
    out = textops.doc_gopher_repetition(d).to_pandas().set_index("doc_id")
    assert out.loc[10].tolist() == [4, 2, 3]
    assert out.loc[11].tolist() == [5, 1, 6]   # "a b" c=2, len 3 -> 6 chars
    assert out.loc[12].tolist() == [1, 0, 0]
    assert out.loc[13].tolist() == [2, 0, 0]


def _brute_containment(sets):
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            mn = min(len(sets[a]), len(sets[b]))
            if inter > 0 and (textops.CONTAIN_DEN * inter
                              >= textops.CONTAIN_NUM * mn):
                out.add((a, b, inter, mn))
    return out


def test_containment_kernel_matches_brute_force():
    rng = random.Random(11)
    for _ in range(25):
        ndocs, vocab = rng.randint(2, 30), rng.randint(3, 20)
        sets = {i: frozenset(rng.sample(range(vocab),
                                        rng.randint(1, min(vocab, 10))))
                for i in range(ndocs)}
        doc = np.array([d for d, s in sets.items() for _ in s], np.int64)
        code = np.array([c for s in sets.values() for c in s], np.int64)
        df = np.bincount(code, minlength=vocab).astype(np.int64)
        a, b, inter, mn = textops._containment_pairs_local(doc, code, df)
        got = set(zip(a.tolist(), b.tolist(), inter.tolist(), mn.tolist()))
        assert got == _brute_containment(sets)


def test_containment_catches_subset_jaccard_misses(ray_session, tmp_path):
    # short doc fully embedded in a long one: containment 1.0, Jaccard
    # far below 1/2 — the operator pair must disagree exactly this way
    words = [f"w{i}" for i in range(40)]
    short = " ".join(words[:8])
    long_ = " ".join(words)                   # contains the short doc
    d = str(tmp_path / "docs")
    _write_docs(d, [1, 2, 3], [short, long_, "totally different words here"])
    cont = textops.doc_ngram_containment_pairs(d).to_pandas()
    jac = textops.doc_ngram_jaccard_pairs(d).to_pandas()
    assert [(1, 2)] == list(zip(cont["id_a"], cont["id_b"]))
    assert cont["inter"].tolist() == [6] and cont["min_sz"].tolist() == [6]
    assert len(jac) == 0


def test_containment_distributed_tier_identical(ray_session, tmp_path):
    words = [f"tok{i}" for i in range(30)]
    docs = [" ".join(words[:9]), " ".join(words), " ".join(words[5:20]),
            " ".join(reversed(words[:12]))]
    d = str(tmp_path / "docs")
    _write_docs(d, [1, 2, 3, 4], docs)
    fast = textops.doc_ngram_containment_pairs(d).to_pandas()
    dist = textops.doc_ngram_containment_pairs(d, cfg=_TINY_GATE).to_pandas()
    assert fast.equals(dist) and len(fast) >= 1
