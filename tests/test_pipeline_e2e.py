"""End-to-end pipeline tests against the planted ground truth
(SURVEY.md §5): dup-pair recall ≥ 0.99, precision guard on negatives,
sha256 per-row invariant, determinism across batch sizes, CC strategy
equivalence, resume-from-checkpoint."""

import collections
import os
import shutil

import numpy as np
import pyarrow.dataset as pds
import pyarrow.parquet as pq
import pytest

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir
from fuzzy_dedupe_pipeline_ray.pipelines.dedupe import DedupePipeline

CORPUS_ROOT = "/tmp/fdpr_test_fixtures"


@pytest.fixture(scope="module")
def tiny_run(ray_session, tmp_path_factory):
    d = corpus_dir("tiny", root=CORPUS_ROOT)
    run_dir = str(tmp_path_factory.mktemp("run_tiny"))
    p = DedupePipeline(f"{d}/files.parquet", run_dir)
    paths = p.run()
    return d, run_dir, p, paths


def _load(paths, name):
    return pds.dataset(paths[name]).to_table()


def _truth(d):
    return pq.read_table(f"{d}/truth_clusters.parquet")


def test_assignment_schema_and_coverage(tiny_run):
    d, _, _, paths = tiny_run
    a = _load(paths, "assignments")
    truth = _truth(d)
    assert a.num_rows == truth.num_rows  # every input doc assigned exactly once
    ids = a.column("doc_id").to_numpy()
    assert len(np.unique(ids)) == len(ids)
    for col in ("doc_id", "cluster_id", "duplicate_count", "confidence",
                "is_representative"):
        assert col in a.schema.names
    # cluster_id is the representative's doc_id (processor.py:248 analog)
    reps = {r["cluster_id"] for r in a.to_pylist()}
    rep_rows = {r["doc_id"] for r in a.to_pylist() if r["is_representative"]}
    assert reps == rep_rows
    # duplicate_count consistent with actual cluster sizes
    sizes = collections.Counter(a.column("cluster_id").to_pylist())
    for r in a.to_pylist():
        assert r["duplicate_count"] == sizes[r["cluster_id"]]


def test_dup_pair_recall(tiny_run):
    """All recallable intra-family pairs must land in one predicted cluster
    with recall ≥ 0.99 (BASELINE.md target)."""
    d, _, _, paths = tiny_run
    a = _load(paths, "assignments")
    truth = _truth(d)
    pred = dict(zip(a.column("doc_id").to_pylist(),
                    a.column("cluster_id").to_pylist()))
    fam = collections.defaultdict(list)
    for r in truth.to_pylist():
        if r["expected_pair_recallable"] and r["family_kind"] != "negative":
            fam[r["truth_cluster_id"]].append(r["doc_id"])
    total = hit = 0
    for members in fam.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                total += 1
                if pred[members[i]] == pred[members[j]]:
                    hit += 1
    assert total > 100
    recall = hit / total
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99"


def test_precision_negatives_stay_single(tiny_run):
    d, _, _, paths = tiny_run
    a = _load(paths, "assignments")
    truth = _truth(d)
    pred = dict(zip(a.column("doc_id").to_pylist(),
                    a.column("cluster_id").to_pylist()))
    kinds = dict(zip(truth.column("doc_id").to_pylist(),
                     truth.column("family_kind").to_pylist()))
    neg_clusters = [pred[d_] for d_, k in kinds.items() if k == "negative"]
    # no two negatives share a cluster
    assert len(neg_clusters) == len(set(neg_clusters))
    # negatives don't get absorbed into any multi-doc cluster
    sizes = collections.Counter(pred.values())
    for d_, k in kinds.items():
        if k == "negative":
            assert sizes[pred[d_]] == 1, f"negative {d_} merged"


def test_rename_far_not_merged(tiny_run):
    d, _, _, paths = tiny_run
    a = _load(paths, "assignments")
    truth = _truth(d)
    pred = dict(zip(a.column("doc_id").to_pylist(),
                    a.column("cluster_id").to_pylist()))
    fams = collections.defaultdict(list)
    for r in truth.to_pylist():
        if r["family_kind"] == "rename_far":
            fams[r["truth_cluster_id"]].append(r["doc_id"])
    for members in fams.values():
        assert len({pred[m] for m in members}) == len(members)


def test_skew_cluster_recovered(tiny_run):
    """The hot license blob (30 identical copies) must form ONE cluster —
    via sha pre-pass + star edges, never a quadratic pair blow-up."""
    d, _, _, paths = tiny_run
    a = _load(paths, "assignments")
    truth = _truth(d)
    pred = dict(zip(a.column("doc_id").to_pylist(),
                    a.column("cluster_id").to_pylist()))
    skew = [r["doc_id"] for r in truth.to_pylist()
            if r["family_kind"] == "skew_exact"]
    assert len({pred[s] for s in skew}) == 1
    edges = _load(paths, "edges")
    # edge count stays linear-ish in corpus size (star-pairing bound)
    assert edges.num_rows < 20 * a.num_rows


def test_sha_invariant_on_cleaned_output(tiny_run, tmp_path):
    """input_hint per-row invariant: content sha256 equality in vs out."""
    import hashlib

    d, _, p, _ = tiny_run
    out = str(tmp_path / "cleaned")
    p.write_cleaned(out)
    t = pds.dataset(out).to_table()
    assert t.num_rows == len(set(
        _load({"assignments": p.manifest.stage_dir("assignments")},
              "assignments").column("cluster_id").to_pylist()))
    for content, sha in zip(t.column("content").to_pylist(),
                            t.column("content_sha256").to_pylist()):
        assert hashlib.sha256(content.encode()).hexdigest() == sha

    # CSV variant (S5/M10 stringifier): same rows, all-string schema,
    # content round-trips through CSV quoting with the sha intact
    out_csv = str(tmp_path / "cleaned_csv")
    p.write_cleaned(out_csv, fmt="csv")
    import ray.data

    tc = ray.data.read_csv(out_csv).to_pandas()
    assert len(tc) == t.num_rows
    for content, sha in zip(tc["content"], tc["content_sha256"]):
        assert hashlib.sha256(str(content).encode()).hexdigest() == sha


def test_dedupe_log_written(tiny_run):
    _, run_dir, _, _ = tiny_run
    log = pq.read_table(os.path.join(run_dir, "dedupe_log.parquet"))
    stages = set(log.column("stage_name").to_pylist())
    assert {"docs", "signatures", "edges_exact", "edges_fuzzy", "edges",
            "labels", "assignments"} <= stages
    # per-partition lineage rows exist alongside the -1 stage totals
    pids = set(log.column("partition_id").to_pylist())
    assert -1 in pids and any(p >= 0 for p in pids)
    assert set(log.column("status").to_pylist()) <= {"success", "resumed"}


def test_resume_skips_and_is_identical(tiny_run, tmp_path):
    d, run_dir, p, paths = tiny_run
    before = _load(paths, "assignments").sort_by("doc_id")
    p2 = DedupePipeline(f"{d}/files.parquet", run_dir)
    p2.run()
    log = p2.runlog.to_table()
    assert set(log.column("status").to_pylist()) == {"resumed"}
    after = _load(paths, "assignments").sort_by("doc_id")
    assert before.equals(after)


def test_partial_resume_recomputes_downstream_only(tiny_run):
    d, run_dir, _, paths = tiny_run
    before = _load(paths, "assignments").sort_by("doc_id")
    # wipe downstream checkpoints; keep docs/signatures
    for name in ("edges", "labels", "assignments"):
        shutil.rmtree(os.path.join(run_dir, name))
    p3 = DedupePipeline(f"{d}/files.parquet", run_dir)
    p3.run()
    statuses = {r["stage_name"]: r["status"]
                for r in p3.runlog.to_table().to_pylist()
                if r["partition_id"] == -1}
    assert statuses["docs"] == "resumed"
    assert statuses["signatures"] == "resumed"
    assert statuses["assignments"] == "success"
    after = _load(paths, "assignments").sort_by("doc_id")
    assert before.equals(after)


def test_determinism_across_batch_sizes(ray_session, tmp_path):
    """Same input at different batch granularity (the single-node proxy for
    different parallelism) → byte-identical assignments."""
    d = corpus_dir("tiny", root=CORPUS_ROOT)
    outs = []
    for bs in (64, 256):
        run_dir = str(tmp_path / f"run_bs{bs}")
        cfg = PipelineConfig(fingerprint_batch_size=bs)
        p = DedupePipeline(f"{d}/files.parquet", run_dir, cfg)
        paths = p.run()
        outs.append(_load(paths, "assignments")
                    .select(["doc_id", "cluster_id", "duplicate_count",
                             "is_representative"]).sort_by("doc_id"))
    assert outs[0].equals(outs[1])


def test_cc_strategies_equivalent(ray_session, tmp_path):
    import ray.data

    from fuzzy_dedupe_pipeline_ray.stages.cc import (
        cc_forest,
        cc_labelprop,
        cc_unionfind,
    )

    d = corpus_dir("tiny", root=CORPUS_ROOT)
    run_dir = str(tmp_path / "run_cc")
    p = DedupePipeline(f"{d}/files.parquet", run_dir)
    paths = p.run()
    edges = ray.data.read_parquet(paths["edges"])
    ufd = cc_unionfind(edges).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    lp = (cc_labelprop(edges, PipelineConfig())
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    fo = (cc_forest(edges, PipelineConfig())
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for other, name in ((lp, "labelprop"), (fo, "forest")):
        assert (other["doc_id"].to_numpy() == ufd["doc_id"].to_numpy()).all(), name
        assert (other["label"].to_numpy() == ufd["label"].to_numpy()).all(), name


def test_minhash_modes_agree_on_planted_families(ray_session, tmp_path):
    """The two MinHash schemes ('classic' P-permutation bank vs 'oph'
    one-permutation + densification) are different estimators of the same
    Jaccard, so on the fixture's clearly-separated families (near-dups
    J >> 0.8, negatives J << 0.8) they must produce identical final
    cluster assignments."""
    d = corpus_dir("tiny", root=CORPUS_ROOT)
    outs = []
    for mode in ("classic", "oph"):
        run_dir = str(tmp_path / f"run_{mode}")
        cfg = PipelineConfig(minhash_mode=mode)
        p = DedupePipeline(f"{d}/files.parquet", run_dir, cfg)
        paths = p.run()
        outs.append(_load(paths, "assignments")
                    .select(["doc_id", "cluster_id", "duplicate_count",
                             "is_representative"]).sort_by("doc_id"))
    assert outs[0].equals(outs[1])


def test_cc_forest_many_partitions_cross_partition_chain(ray_session):
    """The forest reduce tree must link components that only connect ACROSS
    partitions: a chain 0-1, 1-2, ..., spread one edge per block, collapses
    to a single min-label component regardless of merge order."""
    import pyarrow as pa
    import ray.data

    from fuzzy_dedupe_pipeline_ray.stages.cc import cc_forest, cc_unionfind

    n = 40
    tables = [pa.table({"id_a": pa.array([i], pa.int64()),
                        "id_b": pa.array([i + 1], pa.int64())})
              for i in range(n)]
    edges = ray.data.from_arrow(tables)  # one edge per block
    fo = (cc_forest(edges, PipelineConfig())
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(fo) == n + 1
    assert (fo["label"] == 0).all()
    ufd = cc_unionfind(edges).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert (fo["doc_id"].to_numpy() == ufd["doc_id"].to_numpy()).all()
    assert (fo["label"].to_numpy() == ufd["label"].to_numpy()).all()


def test_hard_kill_resume_from_manifest(ray_session, tmp_path):
    """Hard-kill durability (VERDICT r3 #3): a SEPARATE driver process is
    SIGKILLed (no atexit, no cleanup) immediately after the ``signatures``
    checkpoint commits, mid-pipeline; a fresh driver resuming from the
    on-disk manifest alone must complete and produce assignments
    byte-identical to an uninterrupted run. Proves the manifest's atomic
    ``os.replace`` commit story end-to-end."""
    import subprocess
    import sys
    import textwrap

    import pyarrow.dataset as pds2

    d = corpus_dir("tiny", root=CORPUS_ROOT)
    run_dir = str(tmp_path / "killed_run")
    script = textwrap.dedent("""
        import json, os, signal, sys, threading, time

        run_dir = sys.argv[2]
        mpath = os.path.join(run_dir, "manifest.json")

        def killer():
            while True:
                try:
                    with open(mpath) as f:
                        m = json.load(f)
                    st = m["stages"].get("signatures", {})
                    if st.get("status") == "success":
                        os.kill(os.getpid(), signal.SIGKILL)
                except Exception:
                    pass
                time.sleep(0.005)

        threading.Thread(target=killer, daemon=True).start()
        sys.path.insert(0, "/root/repo")  # script runs from tmp_path
        import ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        from fuzzy_dedupe_pipeline_ray.pipelines.dedupe import DedupePipeline
        DedupePipeline(sys.argv[1], run_dir).run()
    """)
    sp = str(tmp_path / "kill_driver.py")
    with open(sp, "w") as f:
        f.write(script)
    proc = subprocess.Popen(
        [sys.executable, sp, f"{d}/files.parquet", run_dir],
        cwd="/root/repo", start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        rc = proc.wait(timeout=600)
    finally:
        import signal as _sig
        try:  # reap the child's orphaned Ray procs (own session group)
            os.killpg(proc.pid, _sig.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
    assert rc == -9, f"driver exited {rc}, expected SIGKILL"

    import json
    with open(os.path.join(run_dir, "manifest.json")) as f:
        m = json.load(f)
    done = {k for k, v in m["stages"].items() if v.get("status") == "success"}
    assert "signatures" in done
    assert "assignments" not in done, "pipeline finished before the kill"

    # fresh driver (this process), resume from the on-disk state alone
    p2 = DedupePipeline(f"{d}/files.parquet", run_dir)
    paths = p2.run()
    statuses = {r["stage_name"]: r["status"]
                for r in p2.runlog.to_table().to_pylist()
                if r["partition_id"] == -1}
    assert statuses["signatures"] == "resumed"
    assert statuses["assignments"] == "success"

    clean_dir = str(tmp_path / "clean_run")
    clean = DedupePipeline(f"{d}/files.parquet", clean_dir).run()
    a = pds2.dataset(paths["assignments"]).to_table().sort_by("doc_id")
    b = pds2.dataset(clean["assignments"]).to_table().sort_by("doc_id")
    assert a.equals(b)


def test_forced_distributed_tiers_match_fastpath(tiny_run, tmp_path):
    """The 100 TB configuration — every broadcast/local fast path gated
    OFF (exploded groupby LSH, distributed hash-join verify + content
    gather, forest/labelprop CC) — must produce identical assignments to
    the default gate configuration on the same input. This is the
    all-gates-at-once end-to-end variant of the per-stage equivalences in
    test_lsh_paths.py (which individually missed the hash-join
    empty-first-block edge fixed in sources/io.py)."""
    d, _, _, paths = tiny_run
    cols = ["doc_id", "cluster_id", "duplicate_count", "is_representative"]
    fast = _load(paths, "assignments").select(cols).sort_by("doc_id")
    run_dir = str(tmp_path / "forced")
    # serial_stages + num_partitions=4: at the suite's num_cpus=4, two
    # CONCURRENT joins' aggregator pools (2 x 8 x 0.25 CPU) would pin the
    # whole CPU budget in idle actors and starve the map tasks feeding
    # them — a sizing constraint, not a correctness one (bench runs the
    # parallel chains at >=8 CPUs).
    cfg = PipelineConfig(broadcast_max_rows=0, keyed_broadcast_max_rows=0,
                         band_driver_max_rows=0, wide_broadcast_max_rows=0,
                         wide_broadcast_max_bytes=0, cc_unionfind_max_edges=0,
                         num_partitions=4, extra={"serial_stages": True})
    p = DedupePipeline(f"{d}/files.parquet", run_dir, cfg)
    forced = (pds.dataset(p.run()["assignments"]).to_table()
              .select(cols).sort_by("doc_id"))
    assert fast.equals(forced)


def test_partitioned_cleaned_output(tiny_run, tmp_path):
    """partition_by='lang' hive-partitions the cleaned parquet export:
    one directory per lang value, rows identical to the flat export
    (the resumable / read-prunable output layout)."""
    import pytest

    _, _, p, _ = tiny_run
    flat = str(tmp_path / "flat")
    parted = str(tmp_path / "parted")
    p.write_cleaned(flat)
    p.write_cleaned(parted, partition_by="lang")

    langdirs = [d for d in os.listdir(parted) if d.startswith("lang=")]
    assert len(langdirs) >= 2, langdirs

    t_flat = pds.dataset(flat).to_table()
    t_part = pds.dataset(parted, partitioning="hive").to_table()
    assert t_part.num_rows == t_flat.num_rows
    key = sorted(t_flat.column("doc_id").to_pylist())
    assert sorted(t_part.column("doc_id").to_pylist()) == key
    # lang survives as a (partition) column with the same per-doc values
    flat_lang = dict(zip(t_flat.column("doc_id").to_pylist(),
                         t_flat.column("lang").to_pylist()))
    for did, lang in zip(t_part.column("doc_id").to_pylist(),
                         t_part.column("lang").to_pylist()):
        assert str(flat_lang[did]) == str(lang)

    with pytest.raises(ValueError):
        p.write_cleaned(str(tmp_path / "bad"), fmt="csv",
                        partition_by="lang")


def test_suffix_array_span_kernel_equivalent(tiny_run, tmp_path):
    """Full-pipeline equivalence of the two span kernels: running the
    flagship with span_kernel="suffix_array" (the north rule's
    suffix-array pass) produces byte-identical cluster assignments to
    the rolling-hash default — same candidate pairs, same span_len
    decisions, same edges."""
    d, _, _, paths = tiny_run
    cols = ["doc_id", "cluster_id", "duplicate_count", "is_representative"]
    fast = _load(paths, "assignments").select(cols).sort_by("doc_id")
    run_dir = str(tmp_path / "sa_kernel")
    cfg = PipelineConfig(span_kernel="suffix_array")
    p = DedupePipeline(f"{d}/files.parquet", run_dir, cfg)
    got = (pds.dataset(p.run()["assignments"]).to_table()
           .select(cols).sort_by("doc_id"))
    assert fast.equals(got)


def test_worker_kill_mid_stage_retried(ray_session, tmp_path):
    """Ray-level fault tolerance: SIGKILL a busy WORKER process (not the
    driver) while the flagship's fingerprint stage is running; Ray's
    task retry + lineage re-execute the lost work and the run completes
    with assignments byte-identical to a clean run. This is the
    lost-node story a multi-node deployment relies on, complementing
    the driver hard-kill resume test above."""
    import subprocess
    import sys
    import textwrap

    import pyarrow.dataset as pds2

    d = corpus_dir("tiny", root=CORPUS_ROOT)
    run_dir = str(tmp_path / "wkill_run")
    script = textwrap.dedent("""
        import os, signal, sys, threading, time

        def proc_start(pid):
            try:
                with open(f"/proc/{pid}/stat", "rb") as f:
                    return int(f.read().rsplit(b") ", 1)[1].split()[19])
            except (OSError, IndexError, ValueError):
                return None

        my_start = proc_start(os.getpid())

        def busy_ray_workers():
            pids = []
            for pid in os.listdir("/proc"):
                if not pid.isdigit() or int(pid) == os.getpid():
                    continue
                try:
                    with open(f"/proc/{pid}/cmdline", "rb") as f:
                        cmd = f.read().decode(errors="replace")
                except OSError:
                    continue
                # busy Ray workers retitle to ray::<task>. Kill ONLY
                # processes younger than this driver, so a concurrently
                # running Ray session (e.g. the pytest host session)
                # keeps its workers.
                if cmd.startswith("ray::") and "IDLE" not in cmd:
                    st = proc_start(pid)
                    if st is not None and my_start is not None \
                            and st > my_start:
                        pids.append(int(pid))
            return pids

        killed = {"n": 0}

        def killer():
            deadline = time.time() + 120
            while time.time() < deadline and killed["n"] < 2:
                for pid in busy_ray_workers():
                    try:
                        os.kill(pid, signal.SIGKILL)
                        killed["n"] += 1
                        break
                    except OSError:
                        pass
                time.sleep(0.05)

        sys.path.insert(0, "/root/repo")
        import ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        threading.Thread(target=killer, daemon=True).start()
        from fuzzy_dedupe_pipeline_ray.pipelines.dedupe import DedupePipeline
        DedupePipeline(sys.argv[1], sys.argv[2]).run()
        print("KILLED_WORKERS", killed["n"])
    """)
    sp = str(tmp_path / "wkill_driver.py")
    with open(sp, "w") as f:
        f.write(script)
    proc = subprocess.run(
        [sys.executable, sp, f"{d}/files.parquet", run_dir],
        cwd="/root/repo", start_new_session=True, timeout=600,
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    killed = [ln for ln in proc.stdout.splitlines()
              if ln.startswith("KILLED_WORKERS")]
    assert killed and int(killed[0].split()[1]) >= 1, \
        "no busy worker was killed — the fault was never injected"

    clean_dir = str(tmp_path / "wkill_clean")
    clean = DedupePipeline(f"{d}/files.parquet", clean_dir).run()
    a = (pds2.dataset(os.path.join(run_dir, "assignments"))
         .to_table().sort_by("doc_id"))
    b = pds2.dataset(clean["assignments"]).to_table().sort_by("doc_id")
    assert a.equals(b)


def test_token_mode_batched_matches_per_row_reference(ray_session):
    """The token shingle mode's batched kernel path (token_hashes_bytes
    + flat window pass + per-doc slices) must produce BIT-IDENTICAL
    signatures to the retained per-row reference (shingle_set →
    MinHasher.signature), i.e. vectorizing the mode changed nothing
    (round-5 review item: the token path was the last per-row Python
    loop in the flagship)."""
    import numpy as np

    import pyarrow as pa

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        make_minhasher,
        simhash64,
        unpack_signatures,
    )
    from fuzzy_dedupe_pipeline_ray.stages.fingerprint import (
        FingerprintActor,
        normalize_for_shingles,
        shingle_set,
    )

    cfg = PipelineConfig(shingle_mode="token", shingle_k=3)
    texts = [
        "def foo(x):\n    return x + 1\n",
        "def foo(x):\n    return x + 2\n",
        "",                       # empty doc
        "one two",                # fewer tokens than k -> single window
        "  leading   and trailing   whitespace  ",
        "unicode tøkens añd stüff " * 5,
        "def foo(x):\n    return x + 1\n",  # exact dup (batch-local dedup)
    ] + [f"random text number {i} with shared suffix tokens" for i in range(20)]
    batch = pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "content": pa.array(texts, pa.string()),
    })
    out = FingerprintActor(cfg.to_json())(batch)

    mh = make_minhasher(cfg)
    got_sigs = unpack_signatures(out.column("minhash"), cfg.num_perms)
    by_id = {out.column("doc_id")[i].as_py(): i
             for i in range(out.num_rows)}
    checked = 0
    for doc_id, text in zip(range(1, len(texts) + 1), texts):
        if doc_id not in by_id:   # deduped under the batch-local rep
            continue
        sh = shingle_set(text, cfg)
        expect = mh.signature(sh)
        i = by_id[doc_id]
        # stored slots may be uint32-truncated (sig_bits) — compare at
        # the stored width
        shift = 64 - cfg.sig_bits
        assert np.array_equal(got_sigs[i],
                              (expect >> np.uint64(shift)).astype(
                                  got_sigs.dtype)), text
        assert out.column("simhash")[i].as_py() == int(simhash64(sh)), text
        checked += 1
    assert checked >= len(texts) - 2


def test_token_mode_flagship_e2e(ray_session, tmp_path):
    """Token shingle mode end-to-end: the flagship runs green and still
    clusters the fixture's exact-duplicate families together."""
    import pyarrow.compute as pc

    d = corpus_dir("tiny", root=CORPUS_ROOT)
    run_dir = str(tmp_path / "run_token")
    cfg = PipelineConfig(shingle_mode="token")
    p = DedupePipeline(f"{d}/files.parquet", run_dir, cfg)
    paths = p.run()
    a = _load(paths, "assignments")
    docs = _load(paths, "docs").select(["doc_id", "content_sha256"])
    j = a.select(["doc_id", "cluster_id"]).join(docs, keys="doc_id")
    df = j.to_pandas()
    groups = df.groupby("content_sha256")["cluster_id"].nunique()
    assert (groups == 1).all()          # sha families share a cluster
    assert df["cluster_id"].nunique() < len(df)  # real merging happened


def test_token_mode_without_collapse_matches_reference(ray_session):
    """collapse_whitespace=False breaks the batched token kernel's
    single-0x20-separator precondition, so that configuration must run
    the exact per-row reference path — tabs/newlines tokenization
    identical to str.split() (round-5 review finding)."""
    import pyarrow as pa

    from fuzzy_dedupe_pipeline_ray.functions.hashing import (
        make_minhasher,
        unpack_signatures,
    )
    from fuzzy_dedupe_pipeline_ray.stages.fingerprint import (
        FingerprintActor,
        shingle_set,
    )

    cfg = PipelineConfig(shingle_mode="token", collapse_whitespace=False,
                         shingle_k=2)
    texts = ["a\tb c", "x\n\ny z\tw", "one", ""]
    batch = pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "content": pa.array(texts, pa.string()),
    })
    out = FingerprintActor(cfg.to_json())(batch)
    mh = make_minhasher(cfg)
    got = unpack_signatures(out.column("minhash"), cfg.num_perms)
    by_id = {out.column("doc_id")[i].as_py(): i
             for i in range(out.num_rows)}
    shift = np.uint64(64 - cfg.sig_bits)
    for doc_id, text in zip(range(1, len(texts) + 1), texts):
        expect = (mh.signature(shingle_set(text, cfg)) >> shift).astype(
            got.dtype)
        assert np.array_equal(got[by_id[doc_id]], expect), text
