"""Operator-parity query modules. Importing this package registers
every query into advisorydatapipeline_spark.registry."""

from advisorydatapipeline_spark.queries import (  # noqa: F401,E402
    aggregates,
    analytics_queries,
    behavior_queries,
    curation_queries,
    dedup_queries,
    graph_queries,
    multimodal_queries,
    parity_formats,
    parity_joins,
    parity_scalars,
    parity_scans,
    parity_sets,
    parity_window,
    pipeline_queries,
    quality_queries,
    ranking_queries,
    rollup_queries,
    sequence_queries,
    temporal_queries,
    tpch_shapes,
    similarity_queries,
    streaming_queries,
    structured_queries,
    text_analysis,
)
