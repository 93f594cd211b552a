"""fuzzy_dedupe_pipeline_ray — a Ray-Data-native near-duplicate detection
and clustering engine over Parquet tables of source-code files.

Built from scratch against the *semantics* of
``ClaytonS2013/fuzzy-dedupe-pipeline`` (see SURVEY.md): the reference's
single-host embedding-kNN merge (``dedupe_logic/processor.py:110-260``)
is re-expressed as a streaming Ray Data pipeline —

    read_parquet → ingest normalize + sha256 → exact-dup groupby pre-pass
    → MinHash/SimHash fingerprint (actor pool) → LSH band groupby
    → pair verify → connected components → per-cluster representative

Every stage is a ``map_batches`` / ``groupby`` over zero-copy Arrow
blocks; nothing materializes the full corpus on the driver.
"""

from fuzzy_dedupe_pipeline_ray.config import PipelineConfig


def _stub_fsspec_http() -> None:
    """Make ``import fsspec.implementations.http`` deterministic.

    Ray Data probes that module on EVERY read/write path resolution and
    guards it with ``except ModuleNotFoundError``. In environments without
    ``aiohttp`` the import fails — which is fine serially, but when two
    driver threads build Datasets concurrently (pipelines/dedupe.py runs
    independent stage chains in parallel) the concurrent failing import
    can observe a partially-initialized module and raise a plain
    ``ImportError`` that Ray does NOT catch. Installing a stub module with
    a never-instantiated ``HTTPFileSystem`` sentinel makes the probe
    succeed instantly and thread-safely; ``isinstance`` checks against the
    sentinel are always False, which is exactly the no-aiohttp behavior.
    """
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel only — nothing ever instantiates it
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_stub_fsspec_http()

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
