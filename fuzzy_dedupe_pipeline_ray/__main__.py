"""CLI entry point — the analog of the reference's ``python main.py``
(``main.py:94-211``: env-validated, staged, per-stage-logged pipeline run)
as a ``ray job submit``-able module (SURVEY.md §3.4):

    python -m fuzzy_dedupe_pipeline_ray \
        --input /data/files.parquet --run-dir /runs/2026-08-18 \
        [--config cfg.json] [--set shingle_k=9 --set minhash_mode=classic] \
        [--no-resume] [--cleaned-out DIR --fmt csv] [--num-cpus N]

Reads Parquet with schema (repo, path, commit, lang, content), runs the
flagship checkpointed dedupe, prints a one-line JSON report (per-stage
status/rows/ms — the ``dedupe_log`` summary the reference inserts per
stage, ``main.py:119-142``), and optionally writes the cleaned
one-row-per-cluster output (the reference's stage-3 Sheets export,
``sheets_sync/sync.py:159-188``).

This module OWNS its Ray session (init if absent, shutdown on exit) —
library code never does (see ``__ray_entry__``'s contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_overrides(pairs: "list[str]") -> dict:
    """``--set key=value`` overrides, parsed with JSON scalar semantics
    (``--set num_perms=256`` → int, ``--set lowercase=true`` → bool,
    ``--set minhash_mode=classic`` → str)."""
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        # Python-style spellings (True/False/None) must not silently fall
        # through as truthy strings — `--set lowercase=False` becoming the
        # string "False" would pass every `if cfg.lowercase:` check
        low = v.strip().lower()
        if low in ("true", "false"):
            out[k] = low == "true"
            continue
        if low in ("null", "none"):
            out[k] = None
            continue
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def build_config(config_path: "str | None", overrides: "list[str]"):
    from fuzzy_dedupe_pipeline_ray.config import PipelineConfig

    base = {}
    if config_path:
        with open(config_path) as f:
            base = json.load(f)
    base.update(_parse_overrides(overrides))
    return PipelineConfig(**base)


def run_status(run_dir: str) -> dict:
    """Run-dir inspection for operators of long (resumable) runs: which
    stages are committed in the manifest (with partition/row counts) and
    the per-stage dedupe_log rows — what the reference surfaces by
    querying its ``dedupe_log`` table (``main.py:119-142``), readable
    here straight off the checkpoint directory with NO Ray session (a
    100 TB run's manifest is KBs; never touches the data files)."""
    import os

    out: dict = {"run_dir": run_dir}
    mpath = os.path.join(run_dir, "manifest.json")
    if not os.path.exists(mpath):
        out["status"] = "no_manifest"
        return out
    with open(mpath) as f:
        m = json.load(f)
    out["status"] = "found"
    out["config_hash"] = m.get("config_hash")
    stages = []
    for name, s in sorted(m.get("stages", {}).items()):
        parts = s.get("partitions", [])
        stages.append({
            "stage": name,
            "completed_at": s.get("completed_at"),
            "duration_ms": s.get("duration_ms"),
            "n_partitions": len(parts),
            "rows": sum(p.get("rows", 0) for p in parts),
            "error": s.get("error"),
        })
    out["stages"] = stages
    log_path = os.path.join(run_dir, "dedupe_log.parquet")
    if os.path.exists(log_path):
        import pyarrow.parquet as pq

        t = pq.read_table(log_path)
        out["dedupe_log"] = [
            {k: row[k] for k in ("stage_name", "status",
                                 "records_processed", "duration_ms")}
            for row in t.to_pylist() if row.get("partition_id") == -1]
    return out


def main(argv: "list[str] | None" = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m fuzzy_dedupe_pipeline_ray",
        description="Ray-Data near-duplicate detection over a Parquet "
                    "table of (repo, path, commit, lang, content) rows.")
    ap.add_argument("--input", required=True,
                    help="input Parquet file or directory")
    ap.add_argument("--run-dir", required=True,
                    help="run directory (checkpoints, manifest, dedupe_log)")
    ap.add_argument("--config", default=None,
                    help="PipelineConfig JSON file (see config.py)")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="config override, repeatable (JSON-typed values)")
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every stage even if checkpoints exist")
    ap.add_argument("--cleaned-out", default=None,
                    help="also write the one-row-per-cluster cleaned output "
                         "here (the reference's stage-3 export)")
    ap.add_argument("--fmt", default="parquet",
                    choices=("parquet", "csv", "jsonl"),
                    help="cleaned-output format (csv = stringified rows, "
                         "the Sheets-writer analog; jsonl = one JSON "
                         "object per row)")
    ap.add_argument("--partition-by", default=None,
                    help="hive-partition the cleaned parquet output by "
                         "this column (e.g. lang) — one directory per "
                         "value, prunable at the read")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init(num_cpus=...) when starting a local "
                         "session (ignored when Ray is already initialized)")
    ap.add_argument("--status", action="store_true",
                    help="inspect --run-dir WITHOUT running: per-stage "
                         "completion, partition/row counts, and the "
                         "dedupe_log summary (no Ray session)")
    args = ap.parse_args(argv)

    if args.status:
        print(json.dumps(run_status(args.run_dir)))
        return 0

    cfg = build_config(args.config, args.set)

    from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

    tune_allocator()
    import ray

    started_ray = False
    if not ray.is_initialized():
        # No explicit address: under `ray job submit` (or any RAY_ADDRESS)
        # this CONNECTS to the running cluster; otherwise it starts a
        # local instance. `address="local"` would force an isolated
        # single-node Ray even inside a cluster job. num_cpus only applies
        # to a locally-started instance — Ray rejects it when connecting.
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(include_dashboard=False, logging_level="ERROR", **kw)
        started_ray = True
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from fuzzy_dedupe_pipeline_ray.pipelines.dedupe import DedupePipeline

    try:
        p = DedupePipeline(args.input, args.run_dir, cfg,
                           resume=not args.no_resume)
        stage_dirs = p.run()
        if args.cleaned_out:
            p.write_cleaned(args.cleaned_out, fmt=args.fmt,
                            partition_by=args.partition_by)
        report = {
            "status": "success",
            "run_dir": args.run_dir,
            "config_hash": cfg.config_hash,
            "stages": [
                {"stage": r["stage_name"], "status": r["status"],
                 "rows": r["records_processed"],
                 "duration_ms": r["duration_ms"]}
                for r in p.runlog.rows if r["partition_id"] == -1],
            "outputs": stage_dirs,
        }
        if args.cleaned_out:
            report["cleaned_out"] = args.cleaned_out
        print(json.dumps(report))
        return 0
    finally:
        if started_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
