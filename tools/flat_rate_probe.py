#!/usr/bin/env python
"""Concurrent flat-rate probe for the three dominant worker kernels.

Evidence harness for the BASELINE.md scaling analysis: each kernel runs
in P ∈ {1, 8, 30} CONCURRENT processes on private heap-resident data
(setup excluded from timing), and the per-process rate is reported. An
engine-side serialization or lock would show as a falling per-process
rate with P on any host; a flat per-process rate at P=30 means the
kernel itself parallelizes and whatever sub-4× scaling the in-pipeline
stage shows is owned by the shared host path the pipeline additionally
exercises (plasma page faults, object-store churn) — see BASELINE.md
"host-phase methodology".

Kernels:
  fingerprint — FingerprintActor batches (shingle + OPH + simhash + anchors)
  span        — substring verify_span_batch over content-carrying pairs
  count       — the verify DAG's perm-slice agreement gather kernel

Usage: python tools/flat_rate_probe.py [duration_sec_per_point] [kernel]
Prints one JSON line per (kernel, P) point.
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/fdpr_fixtures/v3_scale_42/files.parquet"


def _setup_fingerprint():
    import pyarrow.dataset as pds

    from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
    from fuzzy_dedupe_pipeline_ray.stages.fingerprint import FingerprintActor

    cfg = PipelineConfig()
    tbl = pds.dataset(CORPUS).head(5120)
    batches = [tbl.slice(i, 256) for i in range(0, 5120, 256)]
    act = FingerprintActor(cfg.to_json(), None)
    act(batches[0])  # warm

    def step():
        for b in batches:
            act(b)
        return 5120  # rows per iteration

    return step


def _setup_span():
    import pyarrow as pa
    import pyarrow.dataset as pds

    from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
    from fuzzy_dedupe_pipeline_ray.stages.substring import verify_span_batch

    cfg = PipelineConfig()
    tbl = pds.dataset(CORPUS).head(2048)
    c = tbl.column("content").to_pylist()
    n = 1024
    batch = pa.table({
        "id_a": pa.array(list(range(n)), pa.int64()),
        "id_b": pa.array(list(range(n, 2 * n)), pa.int64()),
        # half identical pairs (full spans found), half shifted pairs
        # (mostly certain-rejects) — the in-pipeline mix
        "content_a": pa.array(c[:n], pa.string()),
        "content_b": pa.array(
            [c[i] if i % 2 == 0 else c[i + 1024] for i in range(n)],
            pa.string()),
    })
    verify_span_batch(batch, cfg)  # warm

    def step():
        verify_span_batch(batch, cfg)
        return n  # pairs per iteration

    return step


def _setup_count():
    import numpy as np

    rng = np.random.default_rng(7)
    n_docs, n_pairs, perms = 450_000, 1_000_000, 4
    cols = rng.integers(0, 1 << 32, size=(perms, n_docs), dtype=np.uint64
                        ).astype(np.uint32)
    ja = rng.integers(0, n_docs, size=n_pairs)
    jb = rng.integers(0, n_docs, size=n_pairs)
    out = np.zeros(n_pairs, dtype=np.uint8)

    def step():
        out[:] = 0
        for p in range(perms):
            col = cols[p]
            np.add(out, col[ja] == col[jb], out=out, casting="unsafe")
        return n_pairs  # pairs (x perms gathers) per iteration

    step()  # warm
    return step


KERNELS = {"fingerprint": _setup_fingerprint, "span": _setup_span,
           "count": _setup_count}


def _worker(kernel: str, duration: float, barrier, q):
    try:
        from fuzzy_dedupe_pipeline_ray.perf import tune_allocator

        tune_allocator()
        step = KERNELS[kernel]()
        barrier.wait()  # all processes start timing together
        t0 = time.time()
        units = 0
        while time.time() - t0 < duration:
            units += step()
        q.put(units / (time.time() - t0))
    except Exception as e:  # noqa: BLE001 — surface, never hang the parent
        try:
            barrier.abort()
        except Exception:  # noqa: BLE001
            pass
        q.put(("error", repr(e)))


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    only = sys.argv[2] if len(sys.argv) > 2 else None
    ctx = mp.get_context("spawn")
    for kernel in KERNELS:
        if only and kernel != only:
            continue
        base = None
        for procs in (1, 8, 30):
            barrier = ctx.Barrier(procs)
            q = ctx.Queue()
            ps = [ctx.Process(target=_worker,
                              args=(kernel, duration, barrier, q))
                  for _ in range(procs)]
            [p.start() for p in ps]
            rates = [q.get() for _ in ps]
            [p.join() for p in ps]
            errs = [r for r in rates if isinstance(r, tuple)]
            if errs:
                raise RuntimeError(f"{kernel} worker failed: {errs[0][1]}")
            per_proc = sum(rates) / len(rates)
            if base is None:
                base = per_proc
            print(json.dumps({
                "kernel": kernel, "procs": procs,
                "per_proc_rate": round(per_proc, 1),
                "aggregate_rate": round(sum(rates), 1),
                "flatness_vs_p1": round(per_proc / base, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
