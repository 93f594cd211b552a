"""Source-format interchange: the flagship must produce identical
cluster assignments whether the corpus arrives as Parquet (native),
JSONL, or CSV (the row-oriented export shapes the reference ingests —
Sheets/DB rows, sheets_sync/sync.py:26-31). Exercises quoted newlines
and empty strings through the CSV path (source content contains both)."""

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq


def _assignments(run_dir, input_path):
    from fuzzy_dedupe_pipeline_ray.pipelines.dedupe import DedupePipeline

    p = DedupePipeline(input_path, run_dir)
    p.run()
    df = (p.assignments()
          .select_columns(["doc_id", "cluster_id"]).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return df


def test_jsonl_and_csv_match_parquet(ray_session, tmp_path):
    import ray.data

    from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir
    from fuzzy_dedupe_pipeline_ray.sources.io import read_files

    d = corpus_dir("tiny")
    tbl = pa.concat_tables([
        b for b in ray.data.read_parquet(f"{d}/files.parquet")
        .iter_batches(batch_format="pyarrow")])

    jsonl = str(tmp_path / "files.jsonl")
    with open(jsonl, "w") as f:
        import json

        for row in tbl.to_pylist():
            f.write(json.dumps(row) + "\n")

    csv = str(tmp_path / "files.csv")
    pacsv.write_csv(tbl, csv)

    # the readers round-trip the rows bit-for-bit (content has newlines)
    for path in (jsonl, csv):
        got = pa.concat_tables([
            b for b in read_files(path).iter_batches(batch_format="pyarrow")])
        got = got.select(tbl.column_names)
        a = got.sort_by([("repo", "ascending"), ("path", "ascending"),
                         ("commit", "ascending")])
        b = tbl.sort_by([("repo", "ascending"), ("path", "ascending"),
                         ("commit", "ascending")])
        assert a.equals(b.cast(a.schema)), path

    base = _assignments(str(tmp_path / "run_pq"), f"{d}/files.parquet")
    for name, path in (("jsonl", jsonl), ("csv", csv)):
        got = _assignments(str(tmp_path / f"run_{name}"), path)
        assert got.equals(base), name


def test_parquet_write_roundtrip(tmp_path):
    # sanity: the fixture schema survives a parquet rewrite (guards the
    # comparison above against silent fixture-schema drift)
    from fuzzy_dedupe_pipeline_ray.fixtures import corpus_dir

    d = corpus_dir("tiny")
    t = pq.read_table(f"{d}/files.parquet")
    assert set(t.column_names) == {"repo", "path", "commit", "lang",
                                   "content"}
