"""The flagship pipeline: Common-Crawl-style pages → filtered, scrubbed corpus.

Idiomatic Ray Data composition — every stage is a batch transform over
zero-copy Arrow blocks; the executor streams blocks through with
backpressure, nothing materializes mid-pipeline:

    read_parquet (url, warc_ts, html)          # columns pruned at the read
      → extract_batch          (stateless task: html → text, byte-identical)
      → LangIdBatcher          (actor pool: model built once per actor)
      → PerplexityBatcher      (actor pool)
      → quality_features_batch (stateless task)
      → GateBatcher            (keep/drop + reason codes)
      → pii_scrub_batch        (stateless task: detect + redact)
      → NameDisambiguator      (actor pool: candidate re-scoring)

The per-document semantics equal pipelines/oracle.process_document exactly
(golden test). The hot path is shuffle-free map-only, so throughput scales
linearly with cores/nodes — the property the N→4N efficiency target needs.
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from ..functions.quality import QualityConfig
from ..stages.classifier import NameDisambiguator
from ..stages.detect import pii_scrub_batch
from ..stages.extract import drop_html, extract_batch
from ..stages.langid import LangIdBatcher
from ..stages.perplexity import PerplexityBatcher
from ..stages.quality_gate import GateBatcher, quality_features_batch

INPUT_COLUMNS = ["url", "warc_ts", "html"]


@dataclass(frozen=True)
class PipelineOptions:
    batch_size: int = 256
    # (min, max) actor-pool sizes for the stateful stages; autoscaling lets
    # the executor rebalance between model stages and stateless tasks.
    langid_actors: tuple[int, int] = (1, 8)
    ppl_actors: tuple[int, int] = (1, 8)
    classifier_actors: tuple[int, int] = (1, 4)
    # Fractional CPUs per model actor: these models are lightweight, and on
    # a small cluster whole-CPU actor minimums across several pools can
    # reserve every core and starve the read tasks (observed deadlock at
    # num_cpus=4). 0.5 lets pools and tasks share.
    actor_num_cpus: float = 0.5
    # Fuse langid+perplexity into one actor pool (same semantics, one less
    # object-store boundary); bench turns this on.
    fuse_model_stages: bool = False
    with_classifier: bool = True
    keep_html: bool = False
    quality: QualityConfig = QualityConfig()

    @classmethod
    def auto(cls, num_cpus: int | None = None) -> "PipelineOptions":
        """Throughput-tuned options for the current cluster size.

        Pools are sized to the stages' measured CPU shares (extract+models
        ≈ 30%, quality+scrub+classify ≈ 70% of pipeline CPU): the fused
        model pool gets ~3/16 of CPUs and the classifier-side pool ~5/8,
        leaving the rest for read/write tasks. Ray fuses the stateless
        scrub/quality stages INTO the classifier actor pool, so an
        undersized classifier pool silently caps ~2/3 of the pipeline —
        the bottleneck the default (1, 4) range hits at 32 CPUs.
        Tiny clusters (≤ 2 CPUs, e.g. test sessions) keep the fractional
        shared-CPU defaults: whole-CPU pool minimums there can reserve
        every core and starve the read tasks. From 3 CPUs up the same
        proportional split applies (capped so at least one core stays free
        for read/write tasks) — both levels of an N vs 4N scaling run must
        execute the same config shape, or the comparison measures tuning,
        not scaling."""
        if num_cpus is None:
            try:
                import ray

                num_cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                num_cpus = 8
        if num_cpus <= 2:
            return cls()
        pool = max(1, round(num_cpus * 3 / 16))
        clsf = max(1, round(num_cpus * 5 / 8))
        clsf = min(clsf, num_cpus - 1 - pool)  # ≥1 core free for tasks
        return cls(
            batch_size=512,
            langid_actors=(pool, pool),
            ppl_actors=(pool, pool),
            classifier_actors=(clsf, clsf),
            actor_num_cpus=1.0,
            fuse_model_stages=True,
        )


def read_pages(input_path: str | list[str]) -> ray.data.Dataset:
    """Read the input table with column pruning: the pipeline recomputes
    ``text`` from ``html``, so only (url, warc_ts, html) leave storage."""
    return ray.data.read_parquet(input_path, columns=INPUT_COLUMNS)


def build_pipeline(
    source: str | list[str] | ray.data.Dataset,
    opts: PipelineOptions | None = None,
) -> ray.data.Dataset:
    opts = opts or PipelineOptions()
    ds = source if isinstance(source, ray.data.Dataset) else read_pages(source)

    ds = ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=opts.batch_size
    )
    if not opts.keep_html:
        ds = ds.map_batches(
            drop_html, batch_format="pyarrow", batch_size=opts.batch_size
        )
    if opts.fuse_model_stages:
        from ..stages.langid import CombinedModelBatcher

        ds = ds.map_batches(
            CombinedModelBatcher,
            batch_format="pyarrow",
            batch_size=opts.batch_size,
            concurrency=opts.langid_actors,
            num_cpus=opts.actor_num_cpus,
        )
    else:
        ds = ds.map_batches(
            LangIdBatcher,
            batch_format="pyarrow",
            batch_size=opts.batch_size,
            concurrency=opts.langid_actors,
            num_cpus=opts.actor_num_cpus,
        )
        ds = ds.map_batches(
            PerplexityBatcher,
            batch_format="pyarrow",
            batch_size=opts.batch_size,
            concurrency=opts.ppl_actors,
            num_cpus=opts.actor_num_cpus,
        )
    ds = ds.map_batches(
        quality_features_batch, batch_format="pyarrow", batch_size=opts.batch_size
    )
    ds = ds.map_batches(
        GateBatcher(opts.quality), batch_format="pyarrow", batch_size=opts.batch_size
    )
    ds = ds.map_batches(
        pii_scrub_batch, batch_format="pyarrow", batch_size=opts.batch_size
    )
    if opts.with_classifier:
        ds = ds.map_batches(
            NameDisambiguator,
            batch_format="pyarrow",
            batch_size=opts.batch_size,
            concurrency=opts.classifier_actors,
            num_cpus=opts.actor_num_cpus,
        )
    return ds


def kept_corpus(ds: ray.data.Dataset) -> ray.data.Dataset:
    """The output corpus: kept documents only, scrubbed text as payload.
    Vectorized batch filter (``ds.filter(fn)`` would call Python per row)."""
    import pyarrow as pa

    def only_kept(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("keep"))

    return ds.map_batches(only_kept, batch_format="pyarrow")
