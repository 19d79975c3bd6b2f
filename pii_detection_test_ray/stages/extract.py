"""Stateless extraction stage: ``html`` (binary) → ``text`` (string).

Used as ``ds.map_batches(extract_batch, batch_format="pyarrow")`` — blocks
stay Arrow end-to-end; only the string payloads surface to Python for the
(pure, deterministic) extractor. Byte-identical per url run-to-run; verified
against the golden ``text`` column by tests/test_pipeline_e2e.py.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.html_text import extract_text


def extract_batch(batch: pa.Table) -> pa.Table:
    """Recompute ``text`` from ``html``; replaces any existing text column."""
    texts = pa.array(
        [extract_text(h) for h in batch.column("html").to_pylist()], pa.string()
    )
    if "text" in batch.column_names:
        idx = batch.column_names.index("text")
        return batch.set_column(idx, "text", texts)
    return batch.append_column("text", texts)


def drop_html(batch: pa.Table) -> pa.Table:
    """Shed the heavy raw-bytes column once extraction is done so downstream
    shuffles/object-store traffic only carry text."""
    if "html" in batch.column_names:
        return batch.drop_columns(["html"])
    return batch
