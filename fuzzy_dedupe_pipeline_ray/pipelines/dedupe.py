"""End-to-end near-duplicate detection pipeline (the flagship).

The Ray-Data re-expression of the reference's 3-stage run
(``main.py:94-211``): ingest → fingerprint → candidate gen → verify →
cluster → finalize, with every materialized boundary checkpointed
atomically (RunManifest) and per-stage metrics logged (RunLog — the
``dedupe_log`` analog, ``main.py:119-142``). A re-run with ``resume=True``
and the same config hash skips completed stages by reading their
checkpoints — the upgrade of the reference's truncate-and-load idempotency
(``sheets_sync/sync.py:39``).

Stage graph (shuffle boundaries marked ×):

    files.parquet ──┬─ docs        (ingest_meta: map_batches, no shuffle)
                    └─ signatures  (FingerprintActor pool, no shuffle)
    docs       ─× groupby(sha)     → edges_exact  (star edges)
    signatures ─ explode bands ─× groupby(band) ─× distinct → pairs
    pairs ⋈× signatures ⋈× signatures → map_batches verify → edges_fuzzy
    signatures ─ explode anchors ─× groupby ─ verify spans → edges_substring
    all edges ─× distinct(id_a,id_b; max conf) → edges
    edges → connected components (driver DSU | × label prop) → labels
    docs ⋈× labels ⋈× per-doc-conf ─× groupby(label) → assignments
"""

from __future__ import annotations

import concurrent.futures
import os
import threading
import time

import pyarrow as pa
import ray.data

from fuzzy_dedupe_pipeline_ray.config import DEFAULT_CONFIG, PipelineConfig
from fuzzy_dedupe_pipeline_ray.stages.cc import connected_components
from fuzzy_dedupe_pipeline_ray.stages.exact import EDGE_SCHEMA, exact_edges
from fuzzy_dedupe_pipeline_ray.stages.finalize import finalize
from fuzzy_dedupe_pipeline_ray.stages.fingerprint import fingerprint
from fuzzy_dedupe_pipeline_ray.stages.ingest import ingest_meta, ingest_meta_batch
from fuzzy_dedupe_pipeline_ray.stages.substring import (
    substring_edges,
    substring_prep,
)
from fuzzy_dedupe_pipeline_ray.stages.verify import (
    fuzzy_edges,
    prepare_sig_bank,
)
from fuzzy_dedupe_pipeline_ray.state.manifest import (
    RunManifest,
    checkpoint_link_union,
    checkpoint_write,
)
from fuzzy_dedupe_pipeline_ray.state.runlog import RunLog


def _substring_to_edges(sub_ds, cfg: PipelineConfig):
    def conv(b: pa.Table) -> pa.Table:
        import numpy as np

        frac = b.column("span_frac").to_numpy()
        n = b.num_rows
        conf = np.minimum(cfg.confidence_cap, frac)
        return pa.table({
            "id_a": b.column("id_a"),
            "id_b": b.column("id_b"),
            "sig_sim": pa.array(frac, pa.float64()),
            "second_sim": pa.array(np.zeros(n), pa.float64()),
            "exact_match": pa.array(np.zeros(n, dtype=bool), pa.bool_()),
            "match_type": pa.array(["substring"] * n, pa.string()),
            "confidence": pa.array(conf, pa.float64()),
        }, schema=EDGE_SCHEMA)

    return sub_ds.map_batches(conv, batch_format="pyarrow")


class DedupePipeline:
    """Checkpointed flagship pipeline over a run directory."""

    def __init__(self, input_path: "str | None", run_dir: str,
                 cfg: PipelineConfig = DEFAULT_CONFIG, *,
                 files_ds=None, resume: bool = True):
        self.input_path = input_path
        self.run_dir = run_dir
        self.cfg = cfg
        self.resume = resume
        self._files_ds = files_ds
        self.manifest = RunManifest(run_dir, cfg.config_hash)
        self.runlog = RunLog()
        # guards manifest/runlog mutation when independent stage chains
        # run on parallel driver threads (see run())
        self._meta_lock = threading.Lock()

    # -- helpers ----------------------------------------------------------

    def files(self):
        if self._files_ds is not None:
            return self._files_ds
        from fuzzy_dedupe_pipeline_ray.sources.io import read_files

        return read_files(self.input_path)

    def _id_remap(self):
        """128-bit mode: build (or restore from the run dir) the lo-64
        collision remap (``stages/identity.py``) and return the sorted
        numpy triple the per-batch id kernel consumes (None when empty —
        the overwhelmingly common case). Persisted beside the manifest so
        resumed runs re-derive identical ids."""
        if self.cfg.doc_id_bits != 128:
            return None
        import pyarrow.parquet as pq

        from fuzzy_dedupe_pipeline_ray.functions.hashing import (
            mask_keys, sha256_u64_arrow)
        from fuzzy_dedupe_pipeline_ray.stages.identity import (
            build_id_remap, remap_arrays)
        from fuzzy_dedupe_pipeline_ray.stages.ingest import _doc_key_array

        path = os.path.join(self.run_dir, "id_remap.parquet")
        if self.resume and os.path.exists(path):
            return remap_arrays(pq.read_table(path))

        def raw_ids(b: pa.Table) -> pa.Table:
            d = sha256_u64_arrow(_doc_key_array(b), 2)
            return pa.table({
                "doc_id": pa.array(mask_keys(d[:, 0]), pa.int64()),
                "doc_id_hi": pa.array(mask_keys(d[:, 1]), pa.int64())})

        tbl = build_id_remap(
            self.files().map_batches(raw_ids, batch_format="pyarrow",
                                     zero_copy_batch=True), self.cfg)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)  # atomic commit, same as stage checkpoints
        return remap_arrays(tbl)

    def _stage(self, name: str, build, commit=None):
        """Build-or-resume one checkpointed stage; returns a Dataset that
        reads from the checkpoint (so downstream stages never recompute).
        ``commit``: optional ``(ckpt_dir) -> lineage`` override for stages
        whose checkpoint is assembled without a full dataset write (the
        hard-linked edges union)."""
        t0 = time.time()
        ckpt = self.manifest.stage_dir(name)
        if self.resume and self.manifest.is_complete(name):
            st = self.manifest.data["stages"][name]
            with self._meta_lock:
                self.runlog.log_stage(name, "resumed", t0, time.time(),
                                      st["rows"])
            return ray.data.read_parquet(ckpt)
        try:
            if commit is not None:
                lineage = commit(ckpt)
            else:
                lineage = checkpoint_write(build(), ckpt)
            rows = sum(p["rows"] for p in lineage)
            with self._meta_lock:
                self.manifest.mark_complete(
                    name, rows=rows,
                    duration_ms=int((time.time() - t0) * 1000),
                    partitions=lineage)
                self.runlog.log_stage(name, "success", t0, time.time(), rows,
                                      partitions=lineage)
            return ray.data.read_parquet(ckpt)
        except Exception as e:  # noqa: BLE001 — recorded, then re-raised
            with self._meta_lock:
                self.manifest.mark_failed(name, repr(e))
                self.runlog.log_stage(name, "failed", t0, time.time(), 0,
                                      error=repr(e))
                self.runlog.write(
                    os.path.join(self.run_dir, "dedupe_log.parquet"))
            raise

    # -- run --------------------------------------------------------------

    def run(self) -> "dict[str, str]":
        cfg = self.cfg
        remap = self._id_remap()

        # Two independent stage chains run on parallel driver threads:
        #   A: docs (ingest)        → edges_exact   (needs only docs)
        #   B: signatures (actors)  → edges_fuzzy   (needs only sigs)
        # Ray's streaming executor time-slices both datasets over the same
        # CPU pool, so the small/flat stages (docs, exact) hide under the
        # big worker-parallel ones (fingerprint, LSH+verify) instead of
        # adding serial barriers to the critical path — part of the
        # VERDICT-r2 scaling item (serial-term removal). Checkpoint
        # metadata is lock-guarded; ``cfg.extra['serial_stages']`` forces
        # the old one-at-a-time order (used by stage-timing comparisons).
        def chain_docs():
            docs = self._stage(
                "docs", lambda: ingest_meta(self.files(), cfg, remap))
            ex = self._stage("edges_exact", lambda: exact_edges(docs, cfg))
            return docs, ex

        def chain_sigs(overlap_prep: bool):
            sigs = self._stage(
                "signatures", lambda: fingerprint(self.files(), cfg, remap))
            bank = None
            if not (self.resume and self.manifest.is_complete("edges_fuzzy")):
                # submit the verify bank build BEFORE candidate generation
                # so its large-allocation pass overlaps the band shuffle
                # instead of landing in the post-churn reclaim window —
                # but only when the CLASSIC tier will consume it: the
                # fused tier never touches the bank, and pinning the
                # full signature arrays in plasma for nothing competes
                # with the fused explode's byte-gated sort residency
                # (review finding, round 5)
                from fuzzy_dedupe_pipeline_ray.stages.verify import (
                    fuzzy_impl_for,
                )

                if fuzzy_impl_for(cfg, sigs.count()) == "classic":
                    bank = prepare_sig_bank(sigs, cfg)

            def run_fuzzy():
                return self._stage("edges_fuzzy", lambda: fuzzy_edges(
                    sigs, cfg, bank=bank))

            # The substring HEAD (anchor candidates + content gather)
            # depends only on signatures — overlap it with the fuzzy
            # stage so its ~2-3 s of fixed-shape work leaves the serial
            # critical path (skipped when the substring checkpoint will
            # be resumed, or in the serial small-CPU order).
            prep = None
            want_prep = (overlap_prep and cfg.substring_enabled
                         and not (self.resume and
                                  self.manifest.is_complete(
                                      "edges_substring")))
            if want_prep:
                with concurrent.futures.ThreadPoolExecutor(2) as p2:
                    ff = p2.submit(run_fuzzy)
                    fp = p2.submit(substring_prep, self.files(), sigs,
                                   cfg, remap)
                    fuzzy = ff.result()
                    prep = fp.result()
            else:
                fuzzy = run_fuzzy()
            return sigs, fuzzy, prep

        # Guard: each hash join pins num_partitions aggregator ACTORS
        # (num_cpus each) for its whole lifetime. With both chains joining
        # concurrently that is 2 x num_partitions x join_aggregator_num_cpus
        # CPUs held by (mostly idle) actors; if that leaves <1 CPU for the
        # map tasks FEEDING the joins, the executor livelocks (observed at
        # num_cpus=4 with num_partitions=8: >590 s vs 41 s serial). Fall
        # back to the serial chain order on such small CPU budgets.
        serial = cfg.extra.get("serial_stages")
        if serial is None:
            import ray

            total_cpus = ray.cluster_resources().get("CPU", 0)
            join_actor_cpus = (2 * cfg.num_partitions
                               * cfg.join_aggregator_num_cpus)
            serial = total_cpus - join_actor_cpus < 1.0

        if serial:
            docs, ex = chain_docs()
            sigs, fuzzy, prep = chain_sigs(False)
        else:
            with concurrent.futures.ThreadPoolExecutor(2) as pool:
                fa = pool.submit(chain_docs)
                fb = pool.submit(chain_sigs, True)
                docs, ex = fa.result()
                sigs, fuzzy, prep = fb.result()

        sub_extra = None
        if cfg.substring_enabled:
            # known_pairs: skip substring verification for pairs that the
            # exact/fuzzy passes already linked — the near-dup mass (skew
            # blobs) would otherwise be re-verified with the expensive
            # per-pair span search for zero extra connectivity.
            known = ex.union(fuzzy).select_columns(["id_a", "id_b"])
            sub = self._stage("edges_substring", lambda: substring_edges(
                self.files(), sigs, cfg, exclude_pairs=known, remap=remap,
                prep=prep))
            if cfg.substring_cluster:
                sub_extra = _substring_to_edges(sub, cfg)

        # edges = plain union of the edge sets — a pair may appear with
        # several match_types (e.g. exact star + fuzzy J=1.0); duplicates
        # are benign for connected components and for the per-doc
        # max-confidence aggregate, and skipping the distinct saves a full
        # shuffle. The checkpoint hard-links the committed exact/fuzzy
        # part files and only writes the (converted) substring rows — no
        # edge row is re-copied (checkpoint_link_union).
        edge_srcs = [self.manifest.stage_dir("edges_exact"),
                     self.manifest.stage_dir("edges_fuzzy")]
        edges = self._stage(
            "edges", None,
            commit=lambda ckpt: checkpoint_link_union(
                edge_srcs, ckpt, sub_extra))
        labels = self._stage("labels", lambda: connected_components(edges, cfg))
        assignments = self._stage(
            "assignments", lambda: finalize(docs, labels, edges, cfg))

        self.runlog.write(os.path.join(self.run_dir, "dedupe_log.parquet"))
        return {name: self.manifest.stage_dir(name)
                for name in ("docs", "signatures", "edges", "labels",
                             "assignments")}

    # -- outputs ----------------------------------------------------------

    def assignments(self):
        return ray.data.read_parquet(self.manifest.stage_dir("assignments"))

    def write_cleaned(self, out_dir: str, fmt: str = "parquet",
                      partition_by: "str | None" = None):
        """The reference's stage-3 output (``sheets_sync/sync.py:159-188``):
        one row per cluster — the representative — with content and cluster
        stats; content flows through unchanged (sha-equality invariant).

        ``fmt="csv"`` applies the reference's row stringifier first (M10,
        ``sync.py:177-184``): every column cast to string, nulls → '' —
        the Sheets-writer analog; ``fmt="jsonl"`` writes one JSON object
        per row (``write_json``, Ray's per-block JSONL sink — the export
        downstream ingestion tools consume); ``fmt="parquet"`` (default)
        keeps types.

        ``partition_by`` (parquet only) hive-partitions the output into
        one directory per value of that column (e.g. ``lang``), so a
        downstream consumer can prune partitions at the read and a
        failed export re-run can skip finished key ranges — the
        resumable-output layout the 100 TB deployment wants.
        """
        if fmt not in ("parquet", "csv", "jsonl"):
            raise ValueError(f"bad fmt {fmt!r}")
        if partition_by is not None and fmt != "parquet":
            raise ValueError("partition_by requires fmt='parquet'")
        cfg = self.cfg

        remap = self._id_remap()  # resume path: reads the persisted table

        def add_ids(b: pa.Table) -> pa.Table:
            return b.append_column(
                "doc_id", ingest_meta_batch(b, cfg, remap).column("doc_id"))

        files_with_ids = self.files().map_batches(add_ids, batch_format="pyarrow",
                                                  zero_copy_batch=True)
        import pyarrow.compute as pc

        from fuzzy_dedupe_pipeline_ray.sources.io import hash_join

        reps = self.assignments().map_batches(
            lambda b: b.filter(pc.equal(b.column("is_representative"), True)),
            batch_format="pyarrow").select_columns(
            ["doc_id", "cluster_id", "duplicate_count", "confidence",
             "content_sha256"])
        joined = hash_join(files_with_ids, reps, on="doc_id", cfg=cfg)
        if fmt == "csv":
            def stringify(b: pa.Table) -> pa.Table:
                cols = {}
                for name in b.schema.names:
                    col = b.column(name)
                    if not pa.types.is_string(col.type):
                        col = pc.cast(col, pa.string())
                    cols[name] = pc.fill_null(col, "")
                return pa.table(cols)

            joined.map_batches(stringify,
                               batch_format="pyarrow").write_csv(out_dir)
        elif fmt == "jsonl":
            joined.write_json(out_dir)
        elif partition_by is not None:
            joined.write_parquet(out_dir, partition_cols=[partition_by])
        else:
            joined.write_parquet(out_dir)
        return out_dir


def run_dedupe(input_path: str, run_dir: str,
               cfg: PipelineConfig = DEFAULT_CONFIG, *,
               resume: bool = True, files_ds=None) -> "dict[str, str]":
    return DedupePipeline(input_path, run_dir, cfg, resume=resume,
                          files_ds=files_ds).run()
