"""Incremental (append-only) dedupe: extend a completed base run with new
files without recomputing the base.

The reference recomputes its entire dedupe from scratch every 6 hours
(``.env.template:73`` cron + truncate-and-load ``sheets_sync/sync.py:39``).
At 100 TB that is the difference between re-fingerprinting 10^12 files and
fingerprinting only the day's increment, so this pipeline reuses the base
run's committed checkpoints:

* **signatures / docs** — hard-linked forward (``checkpoint_link_union``);
  only the NEW files are ingested and fingerprinted.
* **exact edges** — recomputed only for sha groups that gained a new
  member (semi-join of the docs union against the new docs' distinct
  shas); base edges cover untouched groups.
* **fuzzy edges** — LSH candidates are generated over the signature union
  (band keys are narrow int columns — cheap relative to shingling), but
  pairs whose endpoints are BOTH old are dropped before verification:
  their verdicts are already recorded in the base edge set.
* **substring edges** — anchor candidates restricted the same way
  (``substring_edges(restrict_ids=...)``), with base pairs additionally
  anti-joined out as known.
* **edges / labels / assignments** — the edge union hard-links the base
  edges plus the incremental stages; connected components and finalize
  run over the union (CC input is O(edges), far below fingerprint cost).

**Guarantee** (pinned by ``tests/test_incremental.py``): the resulting
cluster PARTITION — (doc_id → cluster_id), duplicate_count,
representative choice — equals a full run over base ∪ new input at the
same config, PROVIDED no LSH band bucket crosses
``cfg.band_group_pair_cap`` between the base run and the union. If the
increment pushes a bucket over the cap, the full run emits only star
pairs for it while the incremental run retains the base's verified
all-pairs links — a strict edge SUPERSET, so the incremental partition
can merge families the capped full run leaves split. That direction is
extra dup-pair RECALL relative to the full run (never a loss of true
links): the retained edges were threshold-verified in the base run.
Edge ROWS may also differ benignly below the cap (star-pair choice
depends on bucket membership order), so per-doc ``confidence`` can
differ on docs inside capped families; everything cluster-shaped is
identical under the cap proviso.

Preconditions: the base run is complete at the SAME config hash (a
config change invalidates signature compatibility — the constructor
refuses), ``doc_id_bits == 64`` (the 128-bit collision remap would need
the base corpus re-scanned; full-run that case), and new (repo, path,
commit) keys are disjoint from the base (append-only semantics — the
same key re-appearing would duplicate its doc_id in the union).

The output run dir carries full ``docs`` / ``signatures`` / ``edges``
checkpoints, so it is itself a valid base for the NEXT increment —
increments chain.

Driver memory note: the new-id filter broadcasts one sorted int64 array
of the INCREMENT's size (8 B/doc — 80 MB per 10^7 new files), never the
base corpus.
"""

from __future__ import annotations

import os

import numpy as np
import ray.data

from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG, PipelineConfig
from fuzzy_dedupe_pipeline_ray.pipelines.dedupe import (
    DedupePipeline,
    _substring_to_edges,
)
from fuzzy_dedupe_pipeline_ray.sources.io import (
    filter_pairs_touching,
    hash_join,
)
from fuzzy_dedupe_pipeline_ray.stages.cc import connected_components
from fuzzy_dedupe_pipeline_ray.stages.exact import exact_edges
from fuzzy_dedupe_pipeline_ray.stages.finalize import finalize
from fuzzy_dedupe_pipeline_ray.stages.fingerprint import fingerprint
from fuzzy_dedupe_pipeline_ray.stages.ingest import ingest_meta
from fuzzy_dedupe_pipeline_ray.stages.lsh import candidate_pairs
from fuzzy_dedupe_pipeline_ray.stages.substring import substring_edges
from fuzzy_dedupe_pipeline_ray.stages.verify import (
    prepare_sig_bank,
    verify_pairs,
)
from fuzzy_dedupe_pipeline_ray.state.manifest import (
    RunManifest,
    checkpoint_link_union,
)


class IncrementalDedupe(DedupePipeline):
    """Append-only incremental run over ``run_dir``, extending
    ``base_run_dir``. ``input_path`` / ``files_ds`` refer to the NEW
    files only; ``base_input_path`` / ``base_files_ds`` to the base
    corpus (needed only when ``cfg.substring_enabled`` — the substring
    span verification reads old content for old×new candidate pairs)."""

    def __init__(self, base_run_dir: str, new_input_path: "str | None",
                 run_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                 base_input_path: "str | None" = None,
                 new_files_ds=None, base_files_ds=None, resume: bool = True):
        super().__init__(new_input_path, run_dir, cfg,
                         files_ds=new_files_ds, resume=resume)
        if cfg.doc_id_bits != 64:
            raise ValueError(
                "IncrementalDedupe supports doc_id_bits=64 only: the "
                "128-bit collision remap is derived from the FULL corpus "
                "and cannot be extended without re-scanning the base — "
                "run the full pipeline for 128-bit identity.")
        self.base_run_dir = base_run_dir
        self.base_input_path = base_input_path
        self._base_files_ds = base_files_ds
        self.base_manifest = RunManifest(base_run_dir, cfg.config_hash)
        missing = [s for s in ("docs", "signatures", "edges")
                   if not self.base_manifest.is_complete(s)]
        if missing:
            raise ValueError(
                f"base run {base_run_dir!r} has no completed "
                f"{missing} checkpoint at this config hash — the base "
                "must be a finished run with the SAME PipelineConfig "
                "(signature compatibility).")
        if cfg.substring_enabled and (base_input_path is None
                                      and base_files_ds is None):
            raise ValueError(
                "substring_enabled needs the base corpus content: pass "
                "base_input_path or base_files_ds (or disable substring).")

    def base_files(self):
        if self._base_files_ds is not None:
            return self._base_files_ds
        from fuzzy_dedupe_pipeline_ray.sources.io import read_files

        return read_files(self.base_input_path)

    # -- run ---------------------------------------------------------------

    def run(self) -> "dict[str, str]":
        import ray

        cfg = self.cfg
        base_docs = self.base_manifest.stage_dir("docs")
        base_sigs = self.base_manifest.stage_dir("signatures")
        base_edges = self.base_manifest.stage_dir("edges")

        self._stage("docs_new", lambda: ingest_meta(self.files(), cfg, None))
        self._stage("signatures_new",
                    lambda: fingerprint(self.files(), cfg, None))

        # chainable full checkpoints: base parts hard-linked, new parts
        # written once by the stages above — no row is re-copied
        docs = self._stage("docs", None, commit=lambda c:
                           checkpoint_link_union(
                               [base_docs, self.manifest.stage_dir(
                                   "docs_new")], c))
        sigs = self._stage("signatures", None, commit=lambda c:
                           checkpoint_link_union(
                               [base_sigs, self.manifest.stage_dir(
                                   "signatures_new")], c))

        # an EMPTY increment commits 0-row (possibly schema-less) new
        # checkpoints — guard every incremental edge stage on the row
        # count so nothing reads them and the result reduces to the base
        n_new = self.manifest.data["stages"]["docs_new"]["rows"]
        if n_new:
            docs_new = ray.data.read_parquet(
                self.manifest.stage_dir("docs_new"))
            id_parts = [b.column("doc_id").to_numpy()
                        for b in docs_new.select_columns(["doc_id"])
                        .iter_batches(batch_format="pyarrow")]
            new_ids = (np.sort(np.concatenate(id_parts).astype(np.int64))
                       if id_parts else np.empty(0, np.int64))
        else:
            docs_new = None
            new_ids = np.empty(0, np.int64)
        new_ids_ref = ray.put(new_ids)

        from fuzzy_dedupe_pipeline_ray.stages.exact import EDGE_SCHEMA

        def build_exact():
            if not n_new:
                return ray.data.from_arrow(EDGE_SCHEMA.empty_table())
            # sha groups touched by a new member; base edges cover the rest
            new_shas = (docs_new.select_columns(["content_sha256"])
                        .groupby("content_sha256").count()
                        .select_columns(["content_sha256"]))
            members = hash_join(docs, new_shas, on="content_sha256", cfg=cfg)
            return exact_edges(
                members.select_columns(docs.schema().names), cfg)

        ex = self._stage("edges_exact_inc", build_exact)

        def build_fuzzy():
            if not n_new:
                return ray.data.from_arrow(EDGE_SCHEMA.empty_table())
            pairs = filter_pairs_touching(candidate_pairs(sigs, cfg),
                                          new_ids_ref)
            return verify_pairs(pairs, sigs, cfg,
                                bank=prepare_sig_bank(sigs, cfg))

        fuzzy = self._stage("edges_fuzzy_inc", build_fuzzy)

        sub_extra = None
        if cfg.substring_enabled and n_new:
            base_pairs = ray.data.read_parquet(
                base_edges, columns=["id_a", "id_b"])
            known = (ex.union(fuzzy).select_columns(["id_a", "id_b"])
                     .union(base_pairs))
            files_union = self.base_files().union(self.files())
            sub = self._stage("edges_substring_inc", lambda: substring_edges(
                files_union, sigs, cfg, exclude_pairs=known,
                restrict_ids=new_ids_ref))
            if cfg.substring_cluster:
                sub_extra = _substring_to_edges(sub, cfg)

        edge_srcs = [base_edges,
                     self.manifest.stage_dir("edges_exact_inc"),
                     self.manifest.stage_dir("edges_fuzzy_inc")]
        edges = self._stage("edges", None, commit=lambda c:
                            checkpoint_link_union(edge_srcs, c, sub_extra))
        labels = self._stage("labels",
                             lambda: connected_components(edges, cfg))
        self._stage("assignments",
                    lambda: finalize(docs, labels, edges, cfg))

        self.runlog.write(os.path.join(self.run_dir, "dedupe_log.parquet"))
        return {name: self.manifest.stage_dir(name)
                for name in ("docs", "signatures", "edges", "labels",
                             "assignments")}
