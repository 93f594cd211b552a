"""Round-4 close batch: within-window event debounce, deterministic
global shuffle order, and the hash-bucket train/val/test split. Crafted
edge-case semantics here; end-to-end DuckDB parity at sf0.001 is
auto-covered by tests/test_oracle_parity.py."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.pipelines import relational, textops

SF = "/root/testdata/sf0.001"


def _write_parts(dirname, table_name, df, n_parts):
    sub = os.path.join(dirname, f"{table_name}.parquet")
    os.makedirs(sub)
    for i, part in enumerate(np.array_split(df, n_parts)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(sub, f"part-{i:02d}.parquet"))


def test_events_dedup_window_boundary(ray_session, tmp_path):
    """LAG-debounce semantics on a crafted table: an event exactly AT the
    window boundary is dropped (strict >), the gap resets on every
    occurrence (kept or not), and (user, type) partitions are
    independent."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    ev = pd.DataFrame({
        # user 1 / click: 0, +10min (== window, drop), +20min (10 after
        #   the DROPPED one -> still within window of previous occurrence
        #   -> drop), +31min (11 after prev occurrence -> keep)
        # user 1 / view: independent partition -> kept
        # user 2 / click: 0 kept, +11min kept
        "user_id": [1, 1, 1, 1, 1, 2, 2],
        "event_type": ["click", "click", "click", "click",
                       "view", "click", "click"],
        "ts": [base, base + 10 * m, base + 20 * m, base + 31 * m,
               base + 1 * m, base, base + 11 * m],
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "value": [0.0] * 7,
    })
    _write_parts(str(tmp_path), "events", ev, 3)
    out = relational.events_dedup_within_window(str(tmp_path)).to_pandas()
    assert out["event_id"].tolist() == [1, 4, 5, 6, 7]


def test_shuffle_rank_is_permutation_and_stable(ray_session):
    a = textops.doc_shuffle_deterministic(SF).to_pandas()
    b = textops.doc_shuffle_deterministic(SF).to_pandas()
    n = len(a)
    assert sorted(a["shuffle_rank"]) == list(range(1, n + 1))
    assert a.equals(b)  # pure function of the keys
    # it actually permutes: doc_id order differs from rank order
    assert a["doc_id"].tolist() != sorted(a["doc_id"].tolist())


def test_split_deterministic_and_ratioed(ray_session):
    df = textops.doc_split_train_val_test(SF).to_pandas()
    frac = df["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0
    # pure function of doc_id: recompute one row's bucket by hand
    row = df.iloc[0]
    h = (np.uint64(row["doc_id"]) * np.uint64(textops._SAMPLE_MULT)) \
        & np.uint64(textops._SAMPLE_MOD - 1)
    b = int(h) % 100
    want = ("train" if b < textops.SPLIT_TRAIN_PCT
            else "val" if b < textops.SPLIT_TRAIN_PCT + textops.SPLIT_VAL_PCT
            else "test")
    assert row["split"] == want


def test_conversion_latency_ignores_pre_signup_purchase(ray_session,
                                                        tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    ev = pd.DataFrame({
        # user 1: purchase BEFORE signup (ignored), then one 3h after
        # user 2: signup, never purchases -> absent
        # user 3: purchase only, no signup -> absent
        # user 4: purchase AT the signup instant -> latency 0
        "user_id": [1, 1, 1, 2, 3, 4, 4],
        "event_type": ["purchase", "signup", "purchase", "signup",
                       "purchase", "signup", "purchase"],
        "ts": [base - 2 * h, base, base + 3 * h, base, base, base, base],
        "event_id": list(range(1, 8)),
        "value": [0.0] * 7,
    })
    _write_parts(str(tmp_path), "events", ev, 3)
    out = relational.events_conversion_latency(str(tmp_path)).to_pandas()
    assert out.set_index("user_id")["latency_sec"].to_dict() == {
        1: 3 * 3600, 4: 0}


def test_unigram_logfreq_hand_computed(ray_session, tmp_path):
    """corpus: 'a a b' / 'b c' / '' — tf: a=2, b=2, c=1;
    floor-log2: a=1, b=1, c=0."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a b", "b c", ""],
        "lang": ["en"] * 3, "source": ["t"] * 3, "n_chars": [5, 3, 0],
    })
    _write_parts(str(tmp_path), "documents", docs, 2)
    out = textops.doc_unigram_logfreq(str(tmp_path)).to_pandas()
    got = out.set_index("doc_id")[["n_tokens", "mean_log2_tf_e3"]]
    assert got.loc[1].tolist() == [3, 1000]   # (1+1+1)*1000 // 3
    assert got.loc[2].tolist() == [2, 500]    # (1+0)*1000 // 2
    assert got.loc[3].tolist() == [0, -1]


def test_fuzzy_decontaminate_planted_fixture(ray_session):
    """Recall: all 8 exact AND all 8 one-word-edit cross leaks flagged.
    Precision: the train-train dup pair and bench docs never flagged."""
    d = textops.decon_fixture_dir()
    flagged = set(textops.doc_fuzzy_decontaminate(d).to_pandas()["doc_id"])
    exact_leaks = {50 * (k + 1) + k + 1 for k in range(8)}
    near_leaks = {50 * (k + 9) + k + 1 for k in range(8)}
    assert exact_leaks <= flagged
    assert near_leaks <= flagged
    assert 1201 not in flagged and 1202 not in flagged
    assert not any(i % 50 == 0 for i in flagged)


def test_late_arrivals_exclusive_watermark(ray_session, tmp_path):
    """An event tied WITH the running max is not late; only a strict
    >15 min deficit against events that arrived BEFORE it counts."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    ev = pd.DataFrame({
        # arrival order = event_id; event 3 is 20 min behind the max
        # that arrived before it (event 2 at +30); event 4 is 10 min
        # behind (within watermark); event 5 equals the max (not late).
        "event_id": [1, 2, 3, 4, 5],
        "ts": [base, base + 30 * m, base + 10 * m, base + 20 * m,
               base + 30 * m],
        "user_id": [7] * 5,
    })
    _write_parts(str(tmp_path), "events", ev, 2)
    out = relational.events_late_arrivals(str(tmp_path)).to_pandas()
    assert out["event_id"].tolist() == [3]
    assert out["lateness_sec"].tolist() == [20 * 60]


def test_quality_audit_counts_planted_violations(ray_session, tmp_path):
    docs = pd.DataFrame({
        "doc_id": [1, 1, 2, 3, 4],            # one duplicate id
        "text": ["ok text", "ok text", None, "", "abc"],
        "lang": ["en", "en", "xx", "de", None],  # two unknown langs
        "n_chars": [7, 7, 0, 0, 99],          # one mismatch (99 != 3)
    })
    docs["source"] = "t"
    _write_parts(str(tmp_path), "documents", docs, 2)
    out = textops.doc_quality_audit(str(tmp_path)).to_pandas()
    got = out.set_index("check")["n_violations"].to_dict()
    assert got == {"duplicate_doc_id": 1, "n_chars_mismatch": 1,
                   "null_or_empty_text": 2, "unknown_lang": 2}


def test_similar_topk_ranks_near_dup_first(ray_session, tmp_path):
    """Query doc 3 (the deterministic qid rule): itself rank 1 at 1000,
    its light edit ranks above the unrelated docs."""
    base = ("def process(batch, index):\n    total = index + len(batch)\n"
            "    for row in batch:\n        total += row.score\n"
            "    return total / max(1, len(batch))\n") * 3
    near = base.replace("total", "subtotal")
    other = ("class Widget:\n    def render(self, surface):\n"
             "        surface.draw(self.shape, self.color)\n") * 4
    docs = pd.DataFrame({
        "doc_id": [3, 100, 101, 102],
        "text": [base, near, other, other + "\n# tail"],
        "lang": ["en"] * 4, "source": ["t"] * 4,
        "n_chars": [len(base), len(near), len(other), len(other) + 7],
    })
    _write_parts(str(tmp_path), "documents", docs, 2)
    out = textops.doc_similar_topk(str(tmp_path), n_queries=1).to_pandas()
    assert out.iloc[0][["doc_id", "est_jaccard_e3"]].tolist() == [3, 1000]
    assert out.iloc[1]["doc_id"] == 100
    assert out.iloc[1]["est_jaccard_e3"] > out.iloc[2]["est_jaccard_e3"]


def test_sorted_block_ops_partition_invariant(ray_session, tmp_path):
    """The round-4j sorted-block / hash ops must produce IDENTICAL
    output whether the input is one parquet part or many (the scaffold's
    only cross-block state is the boundary carry, so any partitioning
    sensitivity is a bug)."""
    rng = np.random.RandomState(7)
    n = 500
    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    ev = pd.DataFrame({
        "event_id": np.arange(1, n + 1),
        "ts": pd.to_datetime(
            base + rng.randint(0, 3_600_000_000, n), unit="us"),
        "user_id": rng.randint(1, 20, n),
        "event_type": rng.choice(["click", "view"], n),
        "value": np.zeros(n),
    })
    docs = pd.DataFrame({
        "doc_id": np.arange(1, n + 1),
        "text": [f"w{i % 37} w{i % 11} w{i % 5}" for i in range(n)],
        "lang": ["en"] * n, "source": ["t"] * n, "n_chars": [11] * n,
    })
    outs = {}
    for parts in (1, 7):
        d = tmp_path / f"p{parts}"
        os.makedirs(d)
        _write_parts(str(d), "events", ev, parts)
        _write_parts(str(d), "documents", docs, parts)
        outs[parts] = (
            relational.events_dedup_within_window(str(d)).to_pandas(),
            relational.events_late_arrivals(str(d)).to_pandas(),
            textops.doc_shuffle_deterministic(str(d)).to_pandas(),
            textops.doc_unigram_logfreq(str(d)).to_pandas(),
            relational.events_type_transitions(str(d)).to_pandas(),
        )
    for a, b in zip(outs[1], outs[7]):
        assert a.equals(b)


def test_transitions_crafted_sequence(ray_session, tmp_path):
    """Hand-computed transition counts, including a type that appears
    only once (exercises the carry-type-not-in-block-vocab branch when
    the engine happens to split there; the counts are exact either
    way)."""
    base = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    ev = pd.DataFrame({
        # user 1: A->B->A->C ; user 2: C->C ; user 3: single event
        "user_id": [1, 1, 1, 1, 2, 2, 3],
        "event_type": ["A", "B", "A", "C", "C", "C", "A"],
        "ts": [base + i * m for i in range(4)] + [base, base + m, base],
        "event_id": list(range(1, 8)),
        "value": [0.0] * 7,
    })
    _write_parts(str(tmp_path), "events", ev, 3)
    out = relational.events_type_transitions(str(tmp_path)).to_pandas()
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("A", "B"): 1, ("B", "A"): 1, ("A", "C"): 1,
                   ("C", "C"): 1}
