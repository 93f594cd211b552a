"""Pipeline configuration.

The reference exposes its knobs as constructor defaults + env/config files
(``dedupe_logic/processor.py:29-32``, ``config/ai_config.json:1-27``,
``.env.template:55-60``). The north rule requires matching cluster
assignments "at the same shingle/signature config", so the config here is an
explicit, hashable dataclass that is serialized into every run manifest —
two runs with the same config hash over the same input must produce
byte-identical assignments.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    """All knobs of the dedupe pipeline.

    Signature-scheme analogs of the reference
    (``dedupe_logic/processor.py:29-32``):

    * ``jaccard_threshold`` ← ``semantic_threshold=0.8`` (primary signal)
    * ``simhash_threshold`` ← ``address_threshold=0.85`` (second signal)
    * ``hybrid_primary_relax`` ← the hybrid path's relaxed SECOND-signal
      cutoff: when the exact key matches, the second signal only needs to
      clear 0.70 instead of 0.85 (``processor.py:160-164``; applied to
      ``second_sim`` in ``stages/verify.py``, never to the primary gate)
    * ``confidence_cap`` ← ``min(0.95, ...)`` (``processor.py:163,166``)
    """

    # --- shingling -------------------------------------------------------
    shingle_mode: str = "char"  # "char" | "token"
    shingle_k: int = 7          # chars (or tokens) per shingle
    lowercase: bool = False     # code is case-sensitive by default
    collapse_whitespace: bool = True

    # --- MinHash / LSH ---------------------------------------------------
    num_perms: int = 128        # P
    num_bands: int = 32         # b   (b * r must equal P)
    rows_per_band: int = 4      # r
    minhash_seed: int = 0x5EED_CAFE
    # "classic" = P-permutation bank (O(P·S)/doc); "oph" = one-permutation
    # hashing + densification (O(S)/doc — Li/Owen/Zhang NIPS'12,
    # Shrivastava/Li ICML'14). Estimator and banding semantics identical;
    # signature VALUES differ, so one mode per pipeline run.
    minhash_mode: str = "oph"
    # Stored signature slot width. 32 (default): top 32 bits of each slot
    # — estimator/banding semantics preserved (truncation collision adds
    # 2⁻³² false agreement; see hashing.pack_signatures), HALF the
    # signature checkpoint / band-key input / verify-bank page mass — the
    # memory-bandwidth lever for the scaling bar. 64: full slots.
    sig_bits: int = 32

    # --- thresholds (reference analogs) ----------------------------------
    jaccard_threshold: float = 0.80
    simhash_threshold: float = 0.85      # 1 - hamming/64
    hybrid_primary_relax: float = 0.70   # primary cutoff when second signal agrees
    confidence_cap: float = 0.95

    # --- skew / scale ----------------------------------------------------
    band_group_pair_cap: int = 64   # all-pairs below, star-pairing above
    max_shingles_per_doc: int = 1 << 17  # cap per-doc shingle-set size

    # --- substring (suffix-anchor) pass ----------------------------------
    substring_enabled: bool = True
    anchor_k: int = 48              # chars per anchor window
    anchors_per_doc: int = 16       # bottom-k anchor sketch size
    min_substring_span: int = 96    # minimum exact common span to count
    substring_cluster: bool = True  # substring edges join components
    # per-pair longest-common-span kernel: "rolling_hash" (binary search
    # over window-hash intersections, O((n+m)·log), per-doc cached state
    # — the default and fastest) or "suffix_array" (prefix-doubling
    # suffix array + vectorized LCE over the pair concatenation — the
    # north-rule-literal structure; O((n+m)·log²) time and
    # O((n+m)·log) int32 rank memory per pair). Identical span_len
    # by construction; equivalence-tested.
    span_kernel: str = "rolling_hash"  # "rolling_hash"|"suffix_array"

    # --- connected components -------------------------------------------
    # "auto" = driver numpy_cc under cc_unionfind_max_edges, else the
    # "forest" reduce tree (per-partition DSU forests, BTS shape);
    # "labelprop" is the no-single-node-bottleneck fallback.
    cc_strategy: str = "auto"  # "auto"|"forest"|"labelprop"|"unionfind"
    cc_unionfind_max_edges: int = 5_000_000
    cc_max_rounds: int = 64

    # --- execution -------------------------------------------------------
    fingerprint_batch_size: int = 256
    fingerprint_concurrency: int = 4   # actor-pool size
    # Hash-join partition count. Each Dataset.join spins up num_partitions
    # aggregator actors; with the fractional num_cpus below a single join
    # fits comfortably inside even an 8-CPU allotment. Scale this with the
    # cluster (≈ 2-4 × total cores) — the sandbox default is small.
    num_partitions: int = 8
    join_aggregator_num_cpus: float = 0.25
    # Right sides at or below this row count are broadcast (ray.put once,
    # vectorized searchsorted lookup per batch) instead of hash-joined —
    # each Ray hash join spins a fresh aggregator-actor pool, a fixed cost
    # that dwarfs the work when the lookup side is small. Above the
    # threshold the distributed hash join is used (the 100 TB path).
    broadcast_max_rows: int = 16_000_000
    # Pair-count gate for the verify task DAG (stages/verify.py). Pairs
    # are consumed as plasma block SHARDS, never broadcast, so the
    # memory model is bytes-linear and mmap-shared: ~32 B/pair of pair
    # index in plasma + 1 B/pair per count-task output + one ~38 B/pair
    # concat peak in the assembler — ≈3.8 GB at the 100M default, well
    # inside the object store. Above it the two-hash-join tier runs
    # (which gathers ~2 KB/pair of signature copies — correct at any
    # size, but the page mass anti-scales on shared-memory hosts).
    verify_dag_max_pairs: int = 100_000_000
    # Separate, larger gate for NARROW keyed tables (16 B/row: band_key /
    # anchor + doc_id) feeding the sliced pair-emission tiers. Plasma
    # blocks are shared mmaps, so the working set is one table copy in the
    # object store plus ~table/n_tasks of kept rows per task — 64M rows ≈
    # 1 GB shared + ~32 MB/task at 32 tasks. Above it the exploded
    # groupby-shuffle path runs (the 100 TB shape, equivalence-tested).
    keyed_broadcast_max_rows: int = 64_000_000
    # candidate_pairs tiering: band-matrix rows (n_docs × num_bands) at or
    # below this run the per-band emission as ONE driver pass; between
    # this and broadcast_max_rows the bands fan out as parallel Ray tasks
    # (scales with CPUs); above broadcast_max_rows the exploded
    # distributed shuffle path runs (the 100 TB shape).
    band_driver_max_rows: int = 1_000_000
    # Gates for broadcasting WIDE rows (rows that carry content strings —
    # KBs each, vs the 8-byte keys the row gate above was sized for).
    # The BYTE gate is authoritative when the table's size is known; the
    # row gate is the fallback proxy when size_bytes is unavailable.
    # Residency model at the gate: the fused substring verification
    # (``substring.verify_span_pairs_bc``) probes BOTH pair endpoints
    # against ONE shared plasma mmap copy of the contents table, so
    # steady-state residency is ~1× the gated bytes plus a transient
    # driver-heap staging copy while ``ray.put`` serializes (peak ~2×
    # briefly). Hosts whose object store is smaller than 2× this gate
    # should lower it. Above either gate, wide tables move through the
    # distributed hash join.
    wide_broadcast_max_rows: int = 250_000
    wide_broadcast_max_bytes: int = 2 << 30
    # merge_join probe-mass guard: each left block's probe task concats
    # every key-range-overlapping right block; if any single probe would
    # pin more than this many right-side bytes (the full-right-gather
    # shape behind the round-4 verify OutOfDiskError), the whole join
    # falls back to the streaming Acero hash tier (bounded aggregator
    # blocks). Both sides are already sorted at the decision point, so
    # the fallback costs no re-read.
    merge_join_probe_max_bytes: int = 1 << 30
    # Fused fuzzy tier (stages/fused.py) byte gate: the signature-carry
    # explode is n_sigs × num_bands × (P·sig_bits/8 + ~96 B) and its
    # range sort pins ~2× that (input + sorted output) in object store
    # + spill. Above this estimated exploded mass the dispatcher falls
    # back to the classic tier (sorted pairs + streaming hash verify —
    # bounded aggregator blocks, completes at any size). Found the hard
    # way: a 1.96M-doc forced run (~37 GB exploded, ~74 GB sort
    # residency) exhausted this host's 66 GB spill headroom. Size to
    # roughly (aggregate object store + spill) / 4 on a real cluster.
    fused_fuzzy_max_bytes: int = 16 << 30
    # Document-identity width. 64 (default): doc_id = first 8 sha bytes,
    # enough below ~10^10 rows and cheapest. 128: the scale path
    # (``stages/identity.py``) — ids are derived from 126 bits and a
    # collision-remap pass makes the int64 ``doc_id`` collision-free by
    # construction, so every shuffle key stays one int64.
    doc_id_bits: int = 64

    extra: dict = field(default_factory=dict, compare=False, hash=False)

    def __post_init__(self) -> None:
        if self.num_bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"num_bands*rows_per_band ({self.num_bands}*{self.rows_per_band}) "
                f"must equal num_perms ({self.num_perms})"
            )
        if self.shingle_mode not in ("char", "token"):
            raise ValueError(f"bad shingle_mode {self.shingle_mode!r}")
        if self.cc_strategy not in ("auto", "forest", "labelprop",
                                    "unionfind"):
            raise ValueError(f"bad cc_strategy {self.cc_strategy!r}")
        if self.doc_id_bits not in (64, 128):
            raise ValueError(f"bad doc_id_bits {self.doc_id_bits!r}")
        if self.sig_bits not in (32, 64):
            raise ValueError(f"bad sig_bits {self.sig_bits!r}")

    def to_json(self) -> str:
        d = asdict(self)
        d.pop("extra", None)
        return json.dumps(d, sort_keys=True)

    @property
    def config_hash(self) -> str:
        """Stable hex digest of every semantics-affecting knob."""
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    @classmethod
    def from_json(cls, s: str) -> "PipelineConfig":
        return cls(**json.loads(s))


DEFAULT_CONFIG = PipelineConfig()
