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
    ap.add_argument("--fmt", default="parquet", choices=("parquet", "csv"),
                    help="cleaned-output format (csv = stringified rows, "
                         "the Sheets-writer analog)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init(num_cpus=...) when starting a local "
                         "session (ignored when Ray is already initialized)")
    args = ap.parse_args(argv)

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
            p.write_cleaned(args.cleaned_out, fmt=args.fmt)
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
