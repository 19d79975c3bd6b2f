"""End-to-end corpus curation: the full RefinedWeb-style chain composed
from the engine's stages —

    raw pages → quality filter + PII/toxicity scrub (flagship)
              → cross-document boilerplate line removal
              → exact dedup (content fingerprints)
              → MinHash near-dedup (LSH pairs → distributed anti-join)

Composition is the interesting part at scale: the dedup phases consume
their input MORE THAN ONCE (near-dedup reads the corpus for signatures
and again for the anti-join), so feeding them the lazy flagship output
would re-execute the whole model pipeline per consumer. The scale-correct
pattern is a **parquet checkpoint between phases** — write the filtered
corpus once, stream every later phase from disk (this is also the resume
boundary a 100 TB run needs). ``checkpoint_dir=None`` falls back to
``materialize()`` into the object store for small/test corpora, where the
kept corpus is bounded.
"""

from __future__ import annotations

import os

import ray.data

from .quality_filter import PipelineOptions, build_pipeline, kept_corpus
from ..stages.boilerplate import remove_boilerplate_lines
from ..stages.dedup import dedup_exact, dedup_minhash


def _checkpoint(
    ds: ray.data.Dataset, checkpoint_dir: str | None, name: str
) -> ray.data.Dataset:
    """Make ``ds`` cheaply re-consumable: parquet round-trip when a
    checkpoint dir is given (streaming, resumable, spillable), object-store
    materialize otherwise (test-scale only)."""
    if checkpoint_dir:
        import shutil

        path = os.path.join(checkpoint_dir, name)
        marker = os.path.join(path, "_complete")
        if not os.path.exists(marker):
            # No marker ⇒ any existing files are leftovers of a crashed
            # write; clear them so the rewrite can't union with stale parts.
            shutil.rmtree(path, ignore_errors=True)
            ds.write_parquet(path)
            open(marker, "w").close()
        return ray.data.read_parquet(path, file_extensions=["parquet"])
    return ds.materialize()


def curate_corpus(
    input_files,
    opts: PipelineOptions | None = None,
    checkpoint_dir: str | None = None,
    boiler_min_df: int = 8,
    near_dup_threshold: float = 0.7,
) -> ray.data.Dataset:
    """Curated corpus Dataset (kept, scrubbed, boilerplate-stripped,
    exact- and near-deduped). Row counts decrease monotonically phase to
    phase; every phase is deterministic, so a re-run (or a resume from
    the phase checkpoints) reproduces the same corpus."""
    opts = opts or PipelineOptions()
    filtered = kept_corpus(build_pipeline(input_files, opts))
    filtered = _checkpoint(filtered, checkpoint_dir, "phase1_filtered")

    # Boilerplate strip rewrites scrubbed_text in place (two reads of the
    # checkpointed phase-1 output: df count + scrub pass).
    cleaned = remove_boilerplate_lines(
        filtered.select_columns(["url", "scrubbed_text"]),
        id_col="url",
        text_col="scrubbed_text",
        min_df=boiler_min_df,
    )

    def rename(batch):
        return batch.rename_columns(["url", "scrubbed_text", "n_boiler_removed"])

    cleaned = cleaned.map_batches(rename, batch_format="pyarrow")
    cleaned = _checkpoint(cleaned, checkpoint_dir, "phase2_cleaned")

    exact = dedup_exact(cleaned, id_col="url", text_col="scrubbed_text")
    exact = _checkpoint(exact, checkpoint_dir, "phase3_exact")

    return dedup_minhash(
        exact,
        id_col="url",
        text_col="scrubbed_text",
        threshold=near_dup_threshold,
    )
