"""Streaming consumers: drive a pipeline to completion WITHOUT collecting it.

``Dataset.iter_batches`` pulls Arrow batches through the streaming executor
with backpressure — the driver holds one batch at a time, so these work on
outputs of any size (the 100 TB property). Use these when the sink is not
Parquet: incremental stats, JSONL export to a stream, feeding an external
system.
"""

from __future__ import annotations

import json
from typing import Any, Callable, IO

import pyarrow as pa
import ray.data


def stream_summary(
    ds: ray.data.Dataset,
    batch_size: int = 1024,
) -> dict[str, Any]:
    """One streaming pass over flagship-pipeline output: running totals of
    kept/dropped docs, PII spans, toxic spans, and per-language counts.
    Bounded driver memory: only the (small) accumulator lives here."""
    n_docs = n_kept = n_pii = n_toxic = 0
    by_lang: dict[str, int] = {}
    for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        n_docs += batch.num_rows
        n_kept += sum(1 for k in batch.column("keep").to_pylist() if k)
        n_pii += sum(batch.column("n_pii_spans").to_pylist())
        n_toxic += sum(batch.column("n_toxic_spans").to_pylist())
        for lang in batch.column("pred_lang").to_pylist():
            by_lang[lang] = by_lang.get(lang, 0) + 1
    return {
        "n_docs": n_docs,
        "n_kept": n_kept,
        "n_dropped": n_docs - n_kept,
        "total_pii_spans": n_pii,
        "total_toxic_spans": n_toxic,
        "docs_by_lang": dict(sorted(by_lang.items())),
    }


def stream_jsonl(
    ds: ray.data.Dataset,
    sink: IO[str],
    columns: list[str] | None = None,
    batch_size: int = 1024,
) -> int:
    """Stream the dataset to a JSONL file object, one record per line,
    holding one batch at a time. Returns rows written. (Parquet stays the
    storage format of record — this is the export/feed path.)"""
    written = 0
    for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        if columns:
            batch = batch.select(columns)
        for row in batch.to_pylist():
            sink.write(json.dumps(row, ensure_ascii=False, default=str) + "\n")
            written += 1
    return written


def stream_foreach_batch(
    ds: ray.data.Dataset,
    fn: Callable[[pa.Table], None],
    batch_size: int = 1024,
) -> int:
    """Apply ``fn`` to each output batch as it streams off the executor —
    the generic feed-an-external-system hook. Returns rows seen."""
    rows = 0
    for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        fn(batch)
        rows += batch.num_rows
    return rows
