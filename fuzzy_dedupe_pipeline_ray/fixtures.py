"""Deterministic synthetic source-code corpus with planted duplicate
families and ground-truth cluster labels (FIXTURES.md §1-2).

Everything is a pure function of ``(size, seed)`` — numpy RandomState only,
no wall clock, no set-iteration order — so cluster assignments are
byte-reproducible across runs and parallelism levels (SURVEY.md §5).

Family kinds (FIXTURES.md §1):
  exact, whitespace, comment, rename_near, rename_far, substring,
  skew_exact (license blob ×N), skew_near (vendored blob, tiny edits ×N),
  negative (unique file, must not pair).

``expected_pair_recallable`` marks rows whose intra-family pairs count
toward the recall≥0.99 denominator at the default config
(char-7 shingles, P=128, b=32×r=4, J≥0.8; substring pass on).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fuzzy_dedupe_pipeline_ray.functions.hashing import hash64_str

FIXTURE_VERSION = "v3"  # v3: files.parquet became a part directory

_LANGS = ["py", "js", "go", "java", "c", "md"]

_IDENT_STEMS = [
    "batch", "index", "shard", "merge", "token", "hash", "block", "queue",
    "parse", "write", "fetch", "cache", "count", "score", "group", "split",
    "chunk", "label", "edge", "node", "table", "field", "value", "buffer",
]

_STMT_TEMPLATES = [
    "    {a} = {b} + {n}",
    "    {a} = {fn}({b}, {c})",
    "    if {a} > {n}:",
    "        {b} = {fn}({a})",
    "    for {a} in range({n}):",
    "        {c} += {a} * {n2}",
    "    {a}.append({b})",
    "    return {a}",
    "    while {b} < {n}:",
    "        {b} = {b} * {n2} + {c}",
    "    {c} = [{a} for {a} in {b} if {a} != {n}]",
    "    assert {a} is not None",
]

_COMMENTS = [
    "# handle the empty case",
    "# TODO tighten this bound",
    "# fast path for small inputs",
    "# see upstream issue 42",
    "# fallback when the cache is cold",
    "# note: wraps at 2**64",
]

_LICENSE = (
    "Permission is hereby granted, free of charge, to any person obtaining a "
    "copy of this software and associated documentation files, to deal in the "
    "software without restriction, including without limitation the rights to "
    "use, copy, modify, merge, publish, distribute, sublicense, and/or sell "
    "copies of the software, subject to the following conditions: the above "
    "notice and this permission notice shall be included in all copies or "
    "substantial portions of the software.\n"
)

SIZES = {
    # families per kind (exact, ws, comment, rename_near, rename_far, substring)
    # + skew copies + negatives
    "tiny": dict(families=4, skew_copies=30, negatives=60),
    "small": dict(families=80, skew_copies=400, negatives=1500),
    "bench": dict(families=6000, skew_copies=6000, negatives=120000),
    # scaling-measurement corpus (~2.3× bench): large enough that
    # worker-parallel stage time dominates session/driver fixed costs, so
    # the N-vs-4N efficiency measures the ENGINE's scalability (the
    # regime the 100 TB cluster criterion describes) rather than Ray's
    # per-run constant overhead
    "scale": dict(families=14000, skew_copies=14000, negatives=280000),
}


def _mk_ident(rng: np.random.RandomState) -> str:
    a, b = rng.randint(0, len(_IDENT_STEMS), 2)
    return f"{_IDENT_STEMS[a]}_{_IDENT_STEMS[b]}{rng.randint(0, 100)}"


def _mk_file(rng: np.random.RandomState, n_lines: "int | None" = None) -> str:
    """One pseudo-code file, 15–60 statements."""
    if n_lines is None:
        n_lines = int(rng.randint(15, 60))
    idents = [_mk_ident(rng) for _ in range(6)]
    fns = [_mk_ident(rng) for _ in range(3)]
    lines = [f"def {fns[0]}({idents[0]}, {idents[1]}):"]
    for _ in range(n_lines):
        t = _STMT_TEMPLATES[rng.randint(0, len(_STMT_TEMPLATES))]
        lines.append(
            t.format(
                a=idents[rng.randint(0, len(idents))],
                b=idents[rng.randint(0, len(idents))],
                c=idents[rng.randint(0, len(idents))],
                fn=fns[rng.randint(0, len(fns))],
                n=rng.randint(0, 1000),
                n2=rng.randint(2, 9),
            )
        )
        if rng.rand() < 0.12:
            lines.append("    " + _COMMENTS[rng.randint(0, len(_COMMENTS))])
    return "\n".join(lines) + "\n"


def _mutate_whitespace(rng: np.random.RandomState, text: str) -> str:
    out = []
    for line in text.split("\n"):
        stripped = line.lstrip(" ")
        indent = len(line) - len(stripped)
        line = " " * (indent * int(rng.randint(1, 4))) + stripped
        if rng.rand() < 0.3:
            line = line + " " * int(rng.randint(1, 5))
        out.append(line)
        if rng.rand() < 0.15:
            out.append("")
    return "\n".join(out)


def _mutate_comments(rng: np.random.RandomState, text: str) -> str:
    lines = text.split("\n")
    for _ in range(2):
        pos = int(rng.randint(1, max(2, len(lines))))
        lines.insert(pos, "    " + _COMMENTS[rng.randint(0, len(_COMMENTS))])
    lines = [l for l in lines if not (l.strip().startswith("#") and rng.rand() < 0.15)]
    return "\n".join(lines)


def _mutate_rename(rng: np.random.RandomState, text: str, n_renames: int,
                   rare_first: bool = False) -> str:
    toks = sorted(set(t for t in text.replace("(", " ").replace(")", " ")
                      .replace(",", " ").replace(":", " ").split()
                      if "_" in t and t[0].isalpha()))
    if rare_first:
        # rename the least-frequent identifiers → small shingle delta,
        # keeps the pair above the J threshold (the "near" S-curve side)
        toks.sort(key=lambda t: (text.count(t), t))
    else:
        rng.shuffle(toks)
    for t in toks[:n_renames]:
        text = text.replace(t, _mk_ident(rng))
    return text


def _repo_path(rng: np.random.RandomState, i: int) -> "tuple[str, str, str, str]":
    repo = f"org{rng.randint(0, 200)}/repo{rng.randint(0, 500)}"
    lang = _LANGS[rng.randint(0, len(_LANGS))]
    path = f"src/pkg{rng.randint(0, 40)}/mod_{i}.{lang}"
    commit = "".join(f"{b:02x}" for b in rng.randint(0, 256, 20))
    return repo, path, commit, lang


def generate_corpus(size: str = "tiny", seed: int = 42) -> "tuple[pa.Table, pa.Table]":
    """Return ``(files, truth_clusters)`` Arrow tables."""
    cfg = SIZES[size]
    rng = np.random.RandomState(seed)
    rows: list[tuple] = []          # (repo, path, commit, lang, content)
    truth: list[tuple] = []         # (row_idx, cluster, kind, recallable)
    next_cluster = [0]

    def add(content: str, cluster: int, kind: str, recallable: bool) -> None:
        i = len(rows)
        rows.append(_repo_path(rng, i) + (content,))
        truth.append((i, cluster, kind, recallable))

    def new_cluster() -> int:
        next_cluster[0] += 1
        return next_cluster[0]

    fam = cfg["families"]
    for _ in range(fam):
        base = _mk_file(rng)
        c = new_cluster()
        add(base, c, "exact", True)
        for _ in range(int(rng.randint(1, 4))):
            add(base, c, "exact", True)

        base = _mk_file(rng)
        c = new_cluster()
        add(base, c, "whitespace", True)
        for _ in range(int(rng.randint(1, 3))):
            add(_mutate_whitespace(rng, base), c, "whitespace", True)

        base = _mk_file(rng, n_lines=int(rng.randint(45, 60)))
        c = new_cluster()
        add(base, c, "comment", True)
        add(_mutate_comments(rng, base), c, "comment", True)

        base = _mk_file(rng, n_lines=int(rng.randint(35, 60)))
        c = new_cluster()
        add(base, c, "rename_near", True)
        add(_mutate_rename(rng, base, 1, rare_first=True), c, "rename_near", True)

        base = _mk_file(rng)
        c = new_cluster()
        # far renames fall below the J≥0.8 cutoff → pairs NOT expected
        add(base, c, "rename_far", False)
        add(_mutate_rename(rng, base, 12), c, "rename_far", False)

        inner = _mk_file(rng, n_lines=int(rng.randint(20, 35)))
        outer = _mk_file(rng, n_lines=int(rng.randint(25, 45)))
        half = len(outer) // 2
        c = new_cluster()
        add(inner, c, "substring", True)
        add(outer[:half] + "\n" + inner + "\n" + outer[half:], c, "substring", True)

    # skew: one license blob repeated many times (identical), one vendored
    # file with tiny per-copy edits — the hot-band stress case.
    c_lic = new_cluster()
    lic = _LICENSE * 3
    for _ in range(cfg["skew_copies"]):
        add(lic, c_lic, "skew_exact", True)
    c_ven = new_cluster()
    vendored = _mk_file(rng, n_lines=50)
    add(vendored, c_ven, "skew_near", True)
    for _ in range(cfg["skew_copies"] // 2):
        add(_mutate_comments(rng, vendored), c_ven, "skew_near", True)

    for _ in range(cfg["negatives"]):
        add(_mk_file(rng), new_cluster(), "negative", True)

    repo, path, commit, lang, content = (list(col) for col in zip(*rows))
    keys = [f"{r}\x00{p}\x00{cm}" for r, p, cm in zip(repo, path, commit)]
    doc_ids = hash64_str(keys)
    files = pa.table({
        "repo": pa.array(repo, pa.string()),
        "path": pa.array(path, pa.string()),
        "commit": pa.array(commit, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "content": pa.array(content, pa.string()),
    })
    idx, cluster, kind, recallable = (list(c) for c in zip(*truth))
    truth_t = pa.table({
        "doc_id": pa.array(doc_ids[np.asarray(idx)], pa.int64()),
        "truth_cluster_id": pa.array(cluster, pa.int64()),
        "family_kind": pa.array(kind, pa.string()),
        "expected_pair_recallable": pa.array(recallable, pa.bool_()),
    })
    return files, truth_t


#: part files per fixture corpus. Ray's parquet datasource parallelizes
#: reads at FILE granularity (a single file reads as ONE task no matter
#: the row-group count — measured as an 11 s serial term at the head of
#: EVERY stage that scans the corpus), so the corpus is written as a
#: directory of parts: the shape any at-scale input actually has.
CORPUS_PARTS = 32


def corpus_num_rows(d: str) -> int:
    """Total rows of a corpus's ``files.parquet`` part directory."""
    parts = sorted(os.listdir(os.path.join(d, "files.parquet")))
    return sum(pq.read_metadata(os.path.join(d, "files.parquet", p)).num_rows
               for p in parts)


def _write_corpus_half(size: str, seed: int, fdir: str, half: int,
                       tmp_truth: str, n_way: int = 2) -> None:
    """Child-process body for ``scale{N}x``: generate one deterministic
    slice and write its file parts + truth table (cluster ids offset per
    slice so the union's labels stay disjoint)."""
    files, truth = generate_corpus(size, seed)
    n = files.num_rows
    n_parts = min(max(8, CORPUS_PARTS // n_way), max(1, n // 64))
    step = -(-n // n_parts)
    for i in range(n_parts):
        pq.write_table(files.slice(i * step, step),
                       os.path.join(fdir, f"part-h{half}-{i:04d}.parquet"))
    import pyarrow.compute as pc

    truth = truth.set_column(
        truth.schema.get_field_index("truth_cluster_id"), "truth_cluster_id",
        pc.add(truth.column("truth_cluster_id"), half * 100_000_000))
    pq.write_table(truth, tmp_truth)


def corpus_dir(size: str = "tiny", seed: int = 42,
               root: str = "/tmp/fdpr_fixtures") -> str:
    """Generate-and-cache the corpus as Parquet; returns the directory.

    Layout: ``{root}/{version}_{size}_{seed}/files.parquet/part-*.parquet``
    (a DIRECTORY of ``CORPUS_PARTS`` files so every corpus scan reads
    task-parallel) + ``truth_clusters.parquet``.

    ``size="scale{N}x"`` (scale2x, scale4x, ...) is the union of N
    deterministic ``scale`` generations (seeds ``seed + 1000·i``,
    generated in parallel processes — generation is pure per (size, seed),
    so the union is as reproducible as any single corpus): ~490k·N files,
    used to evidence how scaling efficiency trends with input size
    (BASELINE.md).
    """
    d = os.path.join(root, f"{FIXTURE_VERSION}_{size}_{seed}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    fdir = os.path.join(d, "files.parquet")
    os.makedirs(fdir, exist_ok=True)
    n_way = (int(size[5:-1])
             if size.startswith("scale") and size.endswith("x")
             and size[5:-1].isdigit() else 0)
    if n_way:
        import multiprocessing as mp

        truth_tmp = [os.path.join(d, f"_truth_h{h}.parquet")
                     for h in range(n_way)]
        procs = [mp.Process(target=_write_corpus_half,
                            args=("scale", seed + 1000 * h, fdir, h,
                                  truth_tmp[h], n_way))
                 for h in range(n_way)]
        [p.start() for p in procs]
        [p.join() for p in procs]
        if any(p.exitcode != 0 for p in procs):
            raise RuntimeError(f"{size} generation failed")
        truth = pa.concat_tables([pq.read_table(t) for t in truth_tmp])
        pq.write_table(truth, os.path.join(d, "truth_clusters.parquet"))
        [os.remove(t) for t in truth_tmp]
    else:
        files, truth = generate_corpus(size, seed)
        n = files.num_rows
        n_parts = min(CORPUS_PARTS, max(1, n // 64))
        step = -(-n // n_parts)
        for i in range(n_parts):
            pq.write_table(files.slice(i * step, step),
                           os.path.join(fdir, f"part-{i:04d}.parquet"))
        pq.write_table(truth, os.path.join(d, "truth_clusters.parquet"))
    with open(done, "w") as f:
        f.write(FIXTURE_VERSION)
    return d
