"""pii_detection_test_ray — a Ray-Data-native web-corpus quality-filter and
PII-scrub engine, built from scratch with the detection semantics of the
reference PII benchmark harness (gkswns0531/pii-detection-test) and the
operators a 100 TB training-data pipeline needs.

Layout:
    functions/  pure, deterministic kernels (regex PII detector, quality
                heuristics, langid/perplexity models, hashing, HTML→text)
    stages/     Ray Data batch stages (stateless tasks + actor pools)
    sources/    corpus generator + readers (input_hint Parquet shape)
    pipelines/  composed pipelines, single-process oracle, query registry
    state/      per-partition lineage checkpointing (resumable runs)
"""

from .functions.pii_regex import (  # noqa: F401
    CATEGORY_SLUGS,
    PII_CATEGORIES,
    detect_and_scrub,
    detect_pii,
    detect_pii_values,
    scrub_text,
)
from .pipelines.quality_filter import (  # noqa: F401
    PipelineOptions,
    build_pipeline,
    kept_corpus,
    read_pages,
)

__version__ = "0.1.0"
