"""Shared Dataset I/O + join helpers."""

from __future__ import annotations

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig


def hash_join(left, right, *, on, right_on=None, join_type: str = "inner",
              cfg: PipelineConfig):
    """``Dataset.join`` with the pipeline's partition/actor sizing.

    Ray's hash join spins up ``num_partitions`` aggregator actors per join;
    fractional ``num_cpus`` keeps two concurrent joins schedulable inside a
    small CPU allotment (they are I/O-bound shuffle receivers, not compute
    hogs).
    """
    return left.join(
        right,
        join_type=join_type,
        num_partitions=cfg.num_partitions,
        on=on if isinstance(on, tuple) else (on,),
        right_on=(None if right_on is None
                  else right_on if isinstance(right_on, tuple) else (right_on,)),
        aggregator_ray_remote_args={"num_cpus": cfg.join_aggregator_num_cpus},
    )


def read_files(path: str):
    """Column-pruned read of a files table (the only wide read)."""
    import ray.data

    return ray.data.read_parquet(
        path, columns=["repo", "path", "commit", "lang", "content"])
