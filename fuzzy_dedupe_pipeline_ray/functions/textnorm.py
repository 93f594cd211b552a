"""Text normalization + analysis kernels (vectorized, Arrow-first).

Analogs of the reference's normalizers (``dedupe_logic/processor.py:47-60``
``normalize_phone`` / ``normalize_text`` and the sentinel cleanup at
``processor.py:416-424`` / ``sheets_sync/sync.py:126-131``), plus the text
analysis operators a large-scale training-data pipeline needs: token
counting, quality scoring, language-ID.

Everything operates on a ``pyarrow.Table`` / ``ChunkedArray`` through
``pyarrow.compute`` kernels; regexes are RE2-syntax (pyarrow) and kept
consistent with the DuckDB oracle SQL (both engines use RE2-compatible
`regexp_replace` with 'g').
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Sentinel strings the reference repeatedly maps to null/empty
# (``sheets_sync/sync.py:127``, ``dedupe_logic/processor.py:49-50,417-424``).
SENTINELS = ["", "nan", "none", "null", "#ERROR!"]

# Oracle-parity note: the patterns below use explicit character classes
# (not \s or \w shorthands) so pyarrow RE2 and DuckDB RE2 agree exactly.
_WS = "[ \\t\\n\\r\\f\\v]+"
_PUNCT = "[^a-zA-Z0-9 \\t\\n\\r\\f\\v]"

STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from"
).split()


def normalize_text_array(arr: pa.ChunkedArray, *, lowercase: bool = True,
                         strip_punct: bool = True) -> pa.ChunkedArray:
    """lower → strip punctuation → collapse whitespace → trim.

    Mirrors ``normalize_text`` (``dedupe_logic/processor.py:53-60``): the
    reference lowercases, removes ``[^\\w\\s]`` and collapses whitespace.
    """
    out = arr
    if lowercase:
        out = pc.utf8_lower(out)
    if strip_punct:
        out = pc.replace_substring_regex(out, pattern=_PUNCT, replacement=" ")
    out = pc.replace_substring_regex(out, pattern=_WS, replacement=" ")
    return pc.utf8_trim_whitespace(out)


def sentinels_to_null(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """Map sentinel strings ('', 'nan', 'none', 'null', '#ERROR!') to null —
    the engine-level version of the reference's repeated cleanup
    (``processor.py:416-424``), done ONCE at ingest."""
    lowered = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
    is_sentinel = pc.is_in(lowered, value_set=pa.array([s.lower() for s in SENTINELS]))
    return pc.if_else(is_sentinel, pa.scalar(None, pa.string()), arr)


def token_count_array(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """Whitespace-token count per string (0 for empty/blank)."""
    trimmed = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(arr, pattern=_WS, replacement=" ")
    )
    n_sep = pc.count_substring(trimmed, " ")
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    return pc.if_else(empty, pa.scalar(0, pa.int64()),
                      pc.add(pc.cast(n_sep, pa.int64()), 1))


#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum
#: non-space chars — the shape GPT-2-style byte-pair pre-tokenization
#: uses, with explicit classes so pyarrow RE2 and DuckDB RE2 agree.
_BPE_TOKEN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\f\\v]"


def regex_token_count_array(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """Count of BPE-ish tokens per string (letter runs, digit runs, and
    individual punctuation marks each count as one token) — the
    model-free proxy for 'how many tokens would a BPE tokenizer emit'.
    SQL-parity form: len(regexp_extract_all(s, pattern))."""
    return pc.cast(pc.count_substring_regex(arr, pattern=_BPE_TOKEN),
                   pa.int64())


def punct_count_array(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """Count of characters that are not [a-zA-Z0-9] or whitespace (int64 —
    the exact-integer quality signal; ratios derive from it downstream).

    SQL-parity form: len(s) - len(regexp_replace(s, punct, '', 'g')).
    """
    total = pc.cast(pc.utf8_length(arr), pa.int64())
    stripped = pc.replace_substring_regex(arr, pattern=_PUNCT, replacement="")
    return pc.subtract(total, pc.cast(pc.utf8_length(stripped), pa.int64()))


def stopword_count_array(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """Count of whitespace tokens that are English stopwords (int64).

    Vectorized over the whole batch: split → flatten → is_in → per-row
    sums rebuilt from the list offsets with np.add.reduceat.
    """
    import numpy as np

    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(arr)), pattern=_WS
    )
    is_stop = pc.cast(pc.is_in(pc.list_flatten(toks),
                               value_set=pa.array(STOPWORDS)), pa.int64())
    stop_np = is_stop.to_numpy(zero_copy_only=False)
    out_chunks = []
    flat_idx = 0
    chunks = toks.chunks if isinstance(toks, pa.ChunkedArray) else [toks]
    for ch in chunks:
        lengths = pc.list_value_length(ch).to_numpy(zero_copy_only=False)
        n = int(lengths.sum())
        flat = stop_np[flat_idx: flat_idx + n]
        flat_idx += n
        ends = np.cumsum(lengths)
        starts = ends - lengths
        counts = np.zeros(len(lengths), dtype=np.int64)
        nz = lengths > 0
        if nz.any():
            # reduceat quirk: empty slices copy the element at start — only
            # reduce over the non-empty runs
            counts[nz] = np.add.reduceat(flat, starts[nz])
        out_chunks.append(pa.array(counts, pa.int64()))
    return pa.chunked_array(out_chunks) if len(out_chunks) > 1 else out_chunks[0]


# ---------------------------------------------------------------------------
# Language ID — tiny n-gram/stopword heuristic (no external models in the
# container; deterministic). Covers the langs the synthetic corpora use.
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "por", "que"},
}


#: distinct marker words across all languages (≤ 64 so one uint64 bitmask
#: per row records which markers the row contains — shared words, e.g.
#: "la" in fr+es, get ONE bit that counts for both languages)
_MARKER_WORDS = sorted({w for s in _LANG_MARKERS.values() for w in s})
assert len(_MARKER_WORDS) <= 64
_LANG_CODES = sorted(_LANG_MARKERS)
_LANG_MASKS = [
    sum(1 << _MARKER_WORDS.index(w) for w in _LANG_MARKERS[code])
    for code in _LANG_CODES
]


def _popcount64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized uint64 population count (SWAR — numpy 1.x has no
    ``bitwise_count``)."""
    import numpy as np

    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def lang_id_array(arr) -> "pa.Array":
    """Vectorized language ID: the language whose DISTINCT marker-word hit
    count is highest; ties and zero-hit rows are 'unknown', tie-break by
    language code order (identical semantics to the per-row reference
    loop, asserted by ``tests/test_stages.py``).

    Shape: lower+trim → regex split (the same ``_WS`` the DuckDB oracle
    splits on) → flat ``index_in`` against the marker vocabulary → per-row
    OR-reduce into one uint64 marker bitmask → per-language popcount of
    ``mask & lang_mask``. Distinctness is free: a repeated marker sets the
    same bit. No per-row Python."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(arr)), pattern=_WS)
    wid = pc.index_in(pc.list_flatten(toks), value_set=pa.array(_MARKER_WORDS))
    wid_np = wid.to_numpy(zero_copy_only=False)  # float64 with NaN = non-marker
    hit = ~np.isnan(wid_np)
    bits = np.zeros(len(wid_np), dtype=np.uint64)
    bits[hit] = np.uint64(1) << wid_np[hit].astype(np.uint64)

    lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n = len(lengths)
    masks = np.zeros(n, dtype=np.uint64)
    nz = lengths > 0
    if nz.any():
        starts = np.cumsum(lengths) - lengths
        # reduceat quirk (see word counting above): only non-empty runs
        masks[nz] = np.bitwise_or.reduceat(bits, starts[nz])

    best_n = np.zeros(n, dtype=np.int64)
    best_idx = np.full(n, -1, dtype=np.int64)
    for i, m in enumerate(_LANG_MASKS):
        cnt = _popcount64(masks & np.uint64(m)).astype(np.int64)
        upd = cnt > best_n  # strict > keeps the earlier code on ties
        best_n[upd] = cnt[upd]
        best_idx[upd] = i
    codes = np.array(["unknown"] + _LANG_CODES, dtype=object)
    return pa.array(codes[best_idx + 1], pa.string())


def lang_id(texts: "list[str]") -> "list[str]":
    """List-in/list-out wrapper over :func:`lang_id_array` (kept for the
    reference-shaped scalar API; pipelines use the array form)."""
    return lang_id_array(pa.array(texts, pa.string())).to_pylist()
