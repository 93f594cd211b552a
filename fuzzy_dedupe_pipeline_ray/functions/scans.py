"""Shared boundary-span scanner for the sorted distributed tiers.

Every sort-based tier (pair emission, fused fuzzy, exact edges, finalize
label stats, session aggregate, sorted group aggregate) faces the same
problem: a key group can straddle consecutive range-sorted blocks, and
the per-block kernels need a driver-side O(#blocks) scan to find those
spans and decide what each block does about its boundary runs. The
pending/close state machine below existed in five near-identical copies
(round-5 review finding); this is the single shared implementation —
the per-tier differences live entirely in ``split`` / ``close``.

Also VERIFIES the load-bearing assumption that ``Dataset.sort`` emits
range-partitioned blocks whose ref order is the global key order
(``last_key[i] <= first_key[i+1]``) and raises loudly on violation — a
Ray upgrade that broke it would otherwise mis-stitch silently.
"""

from __future__ import annotations


def scan_boundary_spans(summaries, split, close):
    """Run the pending/close span scan over per-block summaries.

    * ``summaries`` — one entry per sorted block, ``None`` for empty
      blocks (skipped).
    * ``split(summary) -> (first_key, first_payload, last_key,
      last_payload)`` — the block's boundary-run keys and whatever
      per-run payload the tier's merge needs.
    * ``close(span)`` — called once per candidate span with
      ``{"key", "blocks": [(block_idx, 'first'|'last'|'all'), ...],
      "payloads": [...]}``; spans with a single block are candidates
      too (the tier's close() must no-op them), matching the historical
      contract of every call site.

    Keys must be totally ordered (ints or tuples); raises RuntimeError
    on a sorted-block order violation.
    """
    pending = None
    prev_last = None
    for i, sm in enumerate(summaries):
        if sm is None:
            continue
        fk, fp, lk, lp = split(sm)
        if prev_last is not None and fk < prev_last:
            raise RuntimeError(
                "sorted-block order violation: block first key "
                f"{fk!r} < previous block last key {prev_last!r} — "
                "Dataset.sort no longer emits range-ordered blocks; "
                "the boundary span scan cannot run")
        prev_last = lk
        single = fk == lk
        if pending is not None and pending["key"] == fk:
            pending["blocks"].append((i, "all" if single else "first"))
            pending["payloads"].append(fp)
            if single:
                continue  # span may keep going into the next block
            close(pending)
            pending = None
        elif pending is not None:
            close(pending)
            pending = None
        pending = {"key": lk,
                   "blocks": [(i, "all" if single else "last")],
                   "payloads": [lp]}
    if pending is not None:
        close(pending)
