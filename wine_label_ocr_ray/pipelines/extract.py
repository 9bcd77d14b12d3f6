"""Flagship extraction pipeline: read -> explode -> text extract ->
media actor pool -> groupby(doc_id) reassembly -> records.

One lazy ``ray.data.Dataset`` plan end to end (SURVEY.md section 3.1
"new engine" sketch); the streaming executor pipelines the stages with
backpressure. Consumers write/iterate — nothing here materializes the
full dataset.
"""

from __future__ import annotations

import os
from typing import Optional

import ray.data

from ..config import PipelineConfig
from ..sources.documents import read_documents
from ..stages.media import MediaExtract
from ..stages.reassemble import add_bucket, assemble_bucket
from ..stages.spans import explode_spans, extract_text_spans


def autosize_pool(total_cpus: int, num_cpus_per_actor: float = 1.0) -> int:
    """Actor-pool size for the media stage: half the cluster, but never
    the WHOLE cluster — the upstream ReadParquet task needs one free CPU
    slot or the stream deadlocks (observed at a 2-cpu session: 2 pinned
    actors + 1 unschedulable read task = zero progress forever).

    Raises ``ValueError`` when no pool can satisfy that invariant (a
    session so small that even ONE actor would hold every CPU) instead
    of returning a pool that deadlocks the stream."""
    cap = int((total_cpus - 1) / num_cpus_per_actor)
    if cap < 1:
        raise ValueError(
            f"session too small for the actor pool: {total_cpus} CPUs "
            f"cannot host one {num_cpus_per_actor}-cpu actor and still "
            f"leave the upstream read a schedulable slot")
    size = max(2, int(total_cpus * 0.5 / num_cpus_per_actor))
    return min(size, cap)


def build_extract_pipeline(corpus_dir: str,
                           cfg: Optional[PipelineConfig] = None,
                           doc_files: Optional[list] = None
                           ) -> "ray.data.Dataset":
    """Returns the lazy record Dataset (schema: schema.RECORD_SCHEMA).
    ``doc_files`` restricts the read to specific document shard files
    (the checkpointed runner's partition unit)."""
    from .._rayprep import ensure_serializable
    ensure_serializable()
    cfg = cfg or PipelineConfig()
    media_path = os.path.join(corpus_dir, "media")

    concurrency = cfg.media_concurrency
    if concurrency is None:
        import ray
        total_cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        concurrency = autosize_pool(total_cpus, cfg.media_num_cpus)

    if doc_files is not None:
        import ray.data as rd
        docs = rd.read_parquet(doc_files,
                               override_num_blocks=cfg.override_num_blocks)
    else:
        docs = read_documents(corpus_dir,
                              override_num_blocks=cfg.override_num_blocks)
    spans = docs.map_batches(explode_spans, batch_format="pyarrow")
    spans = spans.map_batches(extract_text_spans, batch_format="pyarrow")
    spans = spans.map_batches(
        MediaExtract,
        fn_constructor_kwargs=dict(
            media_path=media_path,
            confidence_threshold=cfg.confidence_threshold,
            pad=cfg.box_pad,
            min_blob_area=cfg.min_blob_area,
            crop_label=cfg.crop_label,
            skip_alignment=cfg.skip_alignment,
            engines=cfg.engines,
            sweep_max_variants=cfg.sweep_max_variants,
        ),
        batch_format="pyarrow",
        batch_size=cfg.media_batch_size,
        concurrency=concurrency,
        num_cpus=cfg.media_num_cpus,
    )
    if cfg.debug_out:
        from ..stages.debug_sink import DebugImageSink
        spans = spans.map_batches(
            DebugImageSink,
            fn_constructor_kwargs=dict(media_path=media_path,
                                       out_dir=cfg.debug_out,
                                       min_blob_area=cfg.min_blob_area),
            batch_format="pyarrow", concurrency=1)
    # Reassembly shuffle: bucket by doc-id hash (a separate TASK-pool
    # op, NOT fused into the media actors — measured: fusing it
    # serializes the hash onto the bottleneck actor pool and costs
    # seconds), assemble every doc of a bucket in one map_groups call
    # (per-doc map_groups pays ~200us of slicing overhead per document
    # — prohibitive at 1e12 docs).
    num_buckets = cfg.assembly_num_partitions
    if num_buckets is None:
        import ray
        total_cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        # default = ~1 bucket per cpu (floor 16): the groupby is a
        # sort-based all-to-all whose scheduling overhead grows with
        # in_blocks x partitions — measured at 150k docs/32 cpus the
        # old 4x-cpus default (128 parts) cost 39-46 s vs 29-37 s at
        # 16-32 parts, with identical output. Buckets must still grow
        # with DATA (one bucket's span rows must fit a worker heap) —
        # at real scale set assembly_num_partitions explicitly; rows
        # are small feature structs, so ~1e6 docs/bucket is fine.
        num_buckets = max(16, total_cpus)
    spans = spans.map_batches(lambda t: add_bucket(t, num_buckets),
                              batch_format="pyarrow")
    records = (spans.groupby("bucket")
                    .map_groups(assemble_bucket, batch_format="pyarrow"))
    return records
