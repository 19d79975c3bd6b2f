"""PII detect + scrub stage (stateless ``map_batches`` task).

All regexes are compiled at module import — once per Ray worker process —
so the per-batch cost is pure matching. Emits, per document:

* ``pii_<slug>`` — one ``list<string>`` column per canonical category
  (null = category absent), byte-identical to the reference detector's
  value lists (reference: regex_pii_detector.py:177-320);
* ``scrubbed_text`` — the text with every accepted PII span redacted, then
  every toxicity-lexicon hit replaced with ``[TOXIC]`` (the north-star
  "PII/toxicity scrubber");
* ``n_pii_spans`` / ``n_toxic_spans`` — occurrence counts.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.pii_regex import (
    CATEGORY_SLUGS,
    PII_CATEGORIES,
    detect_pii,
    scrub_text,
)
from ..functions.toxicity import scrub_toxicity

PII_COLUMNS = tuple(f"pii_{CATEGORY_SLUGS[c]}" for c in PII_CATEGORIES)


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    per_cat: dict[str, list] = {c: [] for c in PII_CATEGORIES}
    scrubbed: list[str] = []
    span_counts: list[int] = []
    toxic_counts: list[int] = []
    for text in batch.column("text").to_pylist():
        text = text or ""  # null text behaves as empty (repo-wide invariant)
        values, spans = detect_pii(text)
        for cat in PII_CATEGORIES:
            per_cat[cat].append(values[cat])
        pii_clean = scrub_text(text, spans)
        final_clean, n_toxic = scrub_toxicity(pii_clean)
        scrubbed.append(final_clean)
        span_counts.append(len(spans))
        toxic_counts.append(n_toxic)
    for cat in PII_CATEGORIES:
        batch = batch.append_column(
            f"pii_{CATEGORY_SLUGS[cat]}", pa.array(per_cat[cat], pa.list_(pa.string()))
        )
    return (
        batch.append_column("scrubbed_text", pa.array(scrubbed, pa.string()))
        .append_column("n_pii_spans", pa.array(span_counts, pa.int64()))
        .append_column("n_toxic_spans", pa.array(toxic_counts, pa.int64()))
    )
