"""CLI entry point (``python -m fuzzy_dedupe_pipeline_ray``) — the analog
of the reference's ``python main.py`` run (``main.py:94-211``): one
subprocess owns its Ray session, runs the flagship over a Parquet input,
prints a one-line JSON report, and writes the cleaned per-cluster output
(the reference's stage-3 export, ``sheets_sync/sync.py:159-188``)."""

import json
import os
import subprocess
import sys

import pyarrow.dataset as pds

from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir

CORPUS_ROOT = "/tmp/fdpr_test_fixtures"


def test_cli_end_to_end(tmp_path):
    d = corpus_dir("tiny", root=CORPUS_ROOT)
    run_dir = str(tmp_path / "cli_run")
    cleaned = str(tmp_path / "cleaned")
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the CLI owns a fresh local session
    out = subprocess.run(
        [sys.executable, "-m", "fuzzy_dedupe_pipeline_ray",
         "--input", f"{d}/files.parquet", "--run-dir", run_dir,
         "--cleaned-out", cleaned, "--num-cpus", "4",
         "--set", "num_partitions=4"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["status"] == "success"
    stages = {s["stage"]: s for s in report["stages"]}
    for name in ("docs", "signatures", "edges_fuzzy", "labels",
                 "assignments"):
        assert stages[name]["status"] == "success", name
    # cleaned output: one row per cluster, content carried through
    a = pds.dataset(report["outputs"]["assignments"]).to_table()
    n_clusters = len(set(a.column("cluster_id").to_pylist()))
    c = pds.dataset(cleaned).to_table()
    assert c.num_rows == n_clusters
    assert {"content", "cluster_id", "duplicate_count",
            "confidence"} <= set(c.schema.names)

    # second invocation with --no-resume recomputes; config overrides via
    # --set change the config hash (stale checkpoints must not be reused)
    out2 = subprocess.run(
        [sys.executable, "-m", "fuzzy_dedupe_pipeline_ray",
         "--input", f"{d}/files.parquet", "--run-dir", run_dir,
         "--num-cpus", "4", "--set", "num_partitions=4"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600)
    assert out2.returncode == 0, out2.stderr[-2000:]
    report2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert all(s["status"] == "resumed" for s in report2["stages"])


def test_cli_config_parsing():
    from fuzzy_dedupe_pipeline_ray.__main__ import build_config

    cfg = build_config(None, ["num_perms=64", "num_bands=16",
                              "minhash_mode=classic", "lowercase=true"])
    assert cfg.num_perms == 64 and cfg.num_bands == 16
    assert cfg.minhash_mode == "classic"
    assert cfg.lowercase is True


def test_status_mode(tmp_path, capsys):
    """--status inspects a run dir without Ray: no manifest → explicit
    marker; after a manifest exists, per-stage rows surface."""
    import json

    from fuzzy_dedupe_pipeline_ray.__main__ import main, run_status

    empty = run_status(str(tmp_path))
    assert empty["status"] == "no_manifest"

    (tmp_path / "manifest.json").write_text(json.dumps({
        "config_hash": "abc",
        "stages": {"docs": {
            "completed_at": "2026-01-01T00:00:00", "duration_ms": 5,
            "partitions": [{"partition_id": 0, "rows": 7, "file": "x"}]}},
    }))
    rc = main(["--input", "ignored", "--run-dir", str(tmp_path),
               "--status"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["config_hash"] == "abc"
    assert out["stages"] == [{"stage": "docs",
                              "completed_at": "2026-01-01T00:00:00",
                              "duration_ms": 5, "n_partitions": 1,
                              "rows": 7, "error": None}]
