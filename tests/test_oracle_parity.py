"""Mimic the driver's correctness gate locally: run every ``queries()``
entry at sf0.001 and compare row-count + sorted-column value equality
against its ``oracle_sql()`` DuckDB result.

(The real gate runs at sf0.01; sf0.001 keeps the pytest wall-time down
while exercising identical code paths. tests/test_oracle_parity_sf001
markers can be bumped to sf0.01 manually.)
"""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * "
              f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _compare(name, ray_df, sql_df):
    assert list(sorted(ray_df.columns)) == list(sorted(sql_df.columns)), \
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), \
        f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or x == y
            else:
                ok = x == y
            assert ok, f"{name}.{col}[{i}]: {x!r} != {y!r}"


def test_all_oracled_queries_match(entrymod, con):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        ray_df = _to_df(qs[name](SF_DIR))
        sql_df = con.sql(sql).fetchdf()
        try:
            _compare(name, ray_df, sql_df)
        except AssertionError as e:
            failures.append(str(e).split("\n")[0])
    assert not failures, failures


def test_rows_only_queries_run(entrymod):
    """Non-oracled queries must at least run and return rows."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        if name == "files_dedupe":
            continue  # covered by test_pipeline_e2e
        df = _to_df(qs[name](SF_DIR))
        assert len(df) > 0, name


def test_ngram_jaccard_distributed_path_matches_local(entrymod, con):
    """Force the >broadcast_max_rows distributed path (prefix map_groups +
    shingle-key self-join + co-occurrence Count) and check it against the
    same DuckDB oracle as the local numpy path."""
    from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
    from fuzzy_dedupe_pipeline_ray.pipelines import textops

    cfg = PipelineConfig(shingle_mode="char", shingle_k=7, lowercase=False,
                         broadcast_max_rows=10)
    ray_df = _to_df(textops.doc_ngram_jaccard_pairs(SF_DIR, cfg=cfg))
    sql_df = con.sql(entrymod.oracle_sql()["doc_ngram_jaccard_pairs"]).fetchdf()
    _compare("doc_ngram_jaccard_pairs[distributed]", ray_df, sql_df)
