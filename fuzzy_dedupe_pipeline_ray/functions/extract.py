"""Scalar extractors: ZIP / city / state from free-form address strings.

Behavioral analogs of the reference's address parsers (M6/M7,
``dedupe_logic/processor.py:344-365``): ZIP = first ``\\b(\\d{5})(?:-\\d{4})?\\b``
match (5-digit group only); city/state parsed from a ``Street, City,
State ZIP`` comma layout — city = second-to-last comma part when it does
not start with digits, state = first 2-uppercase-letter word of the last
part. Both only apply when the address has ≥ 3 comma parts (the
reference's guard).

Vectorized with ``pyarrow.compute`` RE2 kernels where a kernel exists
(``extract_regex``, ``split_pattern``); the positional list indexing uses
the list offsets via numpy (no per-row Python in the hot path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: RE2 patterns (named group required by pc.extract_regex)
_ZIP_RE = r"\b(?P<zip>\d{5})(?:-\d{4})?\b"
_STATE_RE = r"\b(?P<state>[A-Z]{2})\b"


def _first_group(arr, pattern: str, group: str):
    """First regex match's named group per row (null where no match)."""
    st = pc.extract_regex(arr, pattern=pattern)
    return pc.struct_field(st, group)


def extract_zip_array(arr) -> "pa.Array | pa.ChunkedArray":
    """First 5-digit ZIP (ZIP+4 tails dropped), null when absent —
    reference ``processor.py:344-347``."""
    return _first_group(arr, _ZIP_RE, "zip")


def _take_part(parts, idx_from_end: int) -> "pa.Array":
    """list<string> column → element at position len-idx_from_end per row
    (null for rows with fewer elements), via flat offsets + numpy take."""
    parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    # null lists have null length — fill with 0 BEFORE the cumsum (a NaN
    # would poison every later row's offset); a null list contributes no
    # elements to flatten(), so 0-length keeps offsets aligned
    lengths = pc.fill_null(pc.list_value_length(parts), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    offsets = np.cumsum(lengths) - lengths
    valid = lengths >= idx_from_end
    flat_idx = np.where(valid, offsets + lengths - idx_from_end, 0)
    flat = parts.flatten()
    if len(flat) == 0:
        return pa.nulls(len(lengths), pa.string())
    taken = flat.take(pa.array(flat_idx, pa.int64()))
    return pc.if_else(pa.array(valid), taken, pa.scalar(None, pa.string()))


def extract_city_state_arrays(arr) -> "tuple[pa.Array, pa.Array]":
    """(city, state) per address row — reference ``processor.py:349-365``.

    Only addresses with ≥ 3 comma-separated parts are parsed; city is the
    trimmed parts[-2] unless any of its first 3 chars is a digit; state is
    the first 2-uppercase-letter word in parts[-1]. Nulls elsewhere.
    """
    parts = pc.split_pattern(arr, ",")
    parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    n_parts = pc.list_value_length(parts)
    eligible = pc.greater_equal(n_parts, 3)

    city = pc.utf8_trim_whitespace(_take_part(parts, 2))
    # "no digit in the first 3 chars" guard
    head3 = pc.utf8_slice_codeunits(city, 0, 3)
    has_digit = pc.match_substring_regex(head3, "[0-9]")
    nonempty = pc.greater(pc.utf8_length(city), 0)
    city_ok = pc.and_(pc.and_(eligible, nonempty), pc.invert(has_digit))
    city = pc.if_else(pc.fill_null(city_ok, False), city,
                      pa.scalar(None, pa.string()))

    last = pc.utf8_trim_whitespace(_take_part(parts, 1))
    state = _first_group(last, _STATE_RE, "state")
    state = pc.if_else(pc.fill_null(eligible, False), state,
                       pa.scalar(None, pa.string()))
    return city, state
