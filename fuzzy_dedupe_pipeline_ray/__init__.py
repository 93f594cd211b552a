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

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
