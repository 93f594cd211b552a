"""Incremental (append-only) dedupe: the cluster partition after
base-run + increment must equal a full run over the union, with near-dup
families deliberately SPLIT across base and increment so every edge class
(exact, fuzzy, substring) has old×new pairs. Also: chained increments,
the empty increment, and the precondition guards.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig
from fuzzy_dedupe_pipeline_ray.fixtures import generate_corpus
from fuzzy_dedupe_pipeline_ray.pipelines.dedupe import DedupePipeline
from fuzzy_dedupe_pipeline_ray.pipelines.incremental import IncrementalDedupe

#: columns that define the cluster partition (confidence is excluded by
#: design: a hot band's star-cap pair set depends on bucket membership,
#: so per-doc confidence may differ benignly — see incremental.py)
PARTITION_COLS = ["doc_id", "cluster_id", "duplicate_count",
                  "is_representative"]


def _split(files: pa.Table, mod: int, rem) -> pa.Table:
    idx = np.arange(files.num_rows)
    keep = np.isin(idx % mod, np.atleast_1d(rem))
    return files.filter(pa.array(keep))


def _partition(p: DedupePipeline):
    import pandas as pd

    df = (p.assignments().select_columns(PARTITION_COLS).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return df


@pytest.fixture(scope="module")
def corpus(ray_session):
    files, _ = generate_corpus("tiny", seed=7)
    return files


def test_incremental_matches_full_run(tmp_path, ray_session, corpus):
    import pandas as pd

    base_t = _split(corpus, 3, [0, 1])
    new_t = _split(corpus, 3, [2])
    assert base_t.num_rows and new_t.num_rows

    full = DedupePipeline(None, str(tmp_path / "full"),
                          files_ds=ray.data.from_arrow(corpus))
    full.run()

    base = DedupePipeline(None, str(tmp_path / "base"),
                          files_ds=ray.data.from_arrow(base_t))
    base.run()

    inc = IncrementalDedupe(
        str(tmp_path / "base"), None, str(tmp_path / "inc"),
        new_files_ds=ray.data.from_arrow(new_t),
        base_files_ds=ray.data.from_arrow(base_t))
    inc.run()

    pd.testing.assert_frame_equal(_partition(inc), _partition(full))
    # and the increment actually linked across the split: some cluster
    # must contain both a base doc and a new doc
    a = _partition(inc)
    base_assign = _partition(base)
    joint = a.merge(base_assign[["doc_id"]], on="doc_id", how="left",
                    indicator=True)
    new_docs = joint[joint._merge == "left_only"]
    old_docs = joint[joint._merge == "both"]
    cross = set(new_docs.cluster_id) & set(old_docs.cluster_id)
    assert cross, "fixture split must produce at least one old×new cluster"


def test_incremental_chains(tmp_path, ray_session, corpus):
    import pandas as pd

    t0 = _split(corpus, 3, [0])
    t1 = _split(corpus, 3, [1])
    t2 = _split(corpus, 3, [2])

    full = DedupePipeline(None, str(tmp_path / "full"),
                          files_ds=ray.data.from_arrow(corpus))
    full.run()

    base = DedupePipeline(None, str(tmp_path / "r0"),
                          files_ds=ray.data.from_arrow(t0))
    base.run()
    inc1 = IncrementalDedupe(
        str(tmp_path / "r0"), None, str(tmp_path / "r1"),
        new_files_ds=ray.data.from_arrow(t1),
        base_files_ds=ray.data.from_arrow(t0))
    inc1.run()
    # the increment's run dir is itself a valid base: chain a second one
    inc2 = IncrementalDedupe(
        str(tmp_path / "r1"), None, str(tmp_path / "r2"),
        new_files_ds=ray.data.from_arrow(t2),
        base_files_ds=ray.data.from_arrow(
            pa.concat_tables([t0, t1])))
    inc2.run()

    pd.testing.assert_frame_equal(_partition(inc2), _partition(full))


def test_incremental_empty_increment(tmp_path, ray_session, corpus):
    import pandas as pd

    base_t = _split(corpus, 3, [0, 1])
    base = DedupePipeline(None, str(tmp_path / "base"),
                          files_ds=ray.data.from_arrow(base_t))
    base.run()
    inc = IncrementalDedupe(
        str(tmp_path / "base"), None, str(tmp_path / "inc"),
        new_files_ds=ray.data.from_arrow(base_t.schema.empty_table()),
        base_files_ds=ray.data.from_arrow(base_t))
    inc.run()
    pd.testing.assert_frame_equal(_partition(inc), _partition(base))


def test_incremental_refuses_incomplete_base(tmp_path, ray_session, corpus):
    with pytest.raises(ValueError, match="no completed"):
        IncrementalDedupe(str(tmp_path / "nonexistent"), None,
                          str(tmp_path / "inc"),
                          new_files_ds=ray.data.from_arrow(corpus),
                          base_files_ds=ray.data.from_arrow(corpus))


def test_incremental_refuses_config_change(tmp_path, ray_session, corpus):
    base_t = _split(corpus, 2, [0])
    base = DedupePipeline(None, str(tmp_path / "base"),
                          files_ds=ray.data.from_arrow(base_t))
    base.run()
    other = PipelineConfig(shingle_k=11)
    with pytest.raises(ValueError, match="no completed"):
        IncrementalDedupe(str(tmp_path / "base"), None,
                          str(tmp_path / "inc"), other,
                          new_files_ds=ray.data.from_arrow(base_t),
                          base_files_ds=ray.data.from_arrow(base_t))


def test_incremental_refuses_128bit(tmp_path, ray_session, corpus):
    with pytest.raises(ValueError, match="doc_id_bits=64"):
        IncrementalDedupe(str(tmp_path / "base"), None,
                          str(tmp_path / "inc"),
                          PipelineConfig(doc_id_bits=128),
                          new_files_ds=ray.data.from_arrow(corpus),
                          base_files_ds=ray.data.from_arrow(corpus))
