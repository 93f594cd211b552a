"""Fixture-generator tests: determinism, family structure, schema."""

import numpy as np
import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir, generate_corpus
from fuzzy_dedupe_pipeline_ray.functions.hashing import char_shingle_hashes


def _jaccard(a, b):
    return len(np.intersect1d(a, b)) / max(1, len(np.union1d(a, b)))


def test_deterministic_across_calls():
    f1, t1 = generate_corpus("tiny", seed=42)
    f2, t2 = generate_corpus("tiny", seed=42)
    assert f1.equals(f2) and t1.equals(t2)
    f3, _ = generate_corpus("tiny", seed=43)
    assert not f1.equals(f3)


def test_schema_and_ids():
    files, truth = generate_corpus("tiny")
    assert files.schema.names == ["repo", "path", "commit", "lang", "content"]
    assert truth.schema.names == ["doc_id", "truth_cluster_id", "family_kind",
                                  "expected_pair_recallable"]
    assert truth.schema.field("doc_id").type == pa.int64()
    assert files.num_rows == truth.num_rows
    ids = truth.column("doc_id").to_numpy()
    assert len(np.unique(ids)) == len(ids)  # no doc_id collisions


def test_family_kinds_present_and_sized():
    files, truth = generate_corpus("tiny")
    kinds = set(truth.column("family_kind").to_pylist())
    assert kinds == {"exact", "whitespace", "comment", "rename_near",
                     "rename_far", "substring", "skew_exact", "skew_near",
                     "negative"}
    import collections
    counts = collections.Counter(truth.column("family_kind").to_pylist())
    assert counts["skew_exact"] == 30        # the hot-band blob
    assert counts["negative"] == 60


def test_planted_similarity_margins():
    """Recallable families sit well above J=0.8 on normalized char-7
    shingles; rename_far sits well below (the S-curve margin the recall
    target depends on)."""
    import collections

    files, truth = generate_corpus("tiny")
    content = files.column("content").to_pylist()
    by_cluster = collections.defaultdict(list)
    for i, (c, kind) in enumerate(zip(truth.column("truth_cluster_id").to_pylist(),
                                      truth.column("family_kind").to_pylist())):
        by_cluster[(c, kind)].append(i)

    def norm(s):
        return " ".join(s.split())

    for (c, kind), idxs in by_cluster.items():
        if len(idxs) < 2 or kind in ("substring", "negative", "skew_exact"):
            continue
        a = char_shingle_hashes(norm(content[idxs[0]]), 7)
        b = char_shingle_hashes(norm(content[idxs[1]]), 7)
        j = _jaccard(a, b)
        if kind in ("exact", "whitespace"):
            assert j == 1.0, (kind, j)
        elif kind in ("comment", "rename_near", "skew_near"):
            assert j >= 0.85, (kind, j)
        elif kind == "rename_far":
            assert j <= 0.6, (kind, j)

    # substring containment: inner is literally inside outer
    for (c, kind), idxs in by_cluster.items():
        if kind == "substring":
            inner, outer = sorted(idxs, key=lambda i: len(content[i]))
            assert content[inner].strip() in content[outer]


def test_negatives_are_dissimilar():
    files, truth = generate_corpus("tiny")
    content = files.column("content").to_pylist()
    neg = [i for i, k in enumerate(truth.column("family_kind").to_pylist())
           if k == "negative"][:12]
    shingles = [char_shingle_hashes(" ".join(content[i].split()), 7) for i in neg]
    for i in range(len(neg)):
        for j in range(i + 1, len(neg)):
            assert _jaccard(shingles[i], shingles[j]) < 0.5


def test_corpus_dir_cache(tmp_path):
    d1 = corpus_dir("tiny", root=str(tmp_path))
    d2 = corpus_dir("tiny", root=str(tmp_path))
    assert d1 == d2
    import os
    assert os.path.exists(os.path.join(d1, "files.parquet"))
    assert os.path.exists(os.path.join(d1, "truth_clusters.parquet"))
