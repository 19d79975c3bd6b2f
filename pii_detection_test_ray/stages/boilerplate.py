"""Cross-document boilerplate line removal (the RefinedWeb across-docs
line-dedup move, Penedo et al. 2023 §4.2): a line that appears in ≥
``min_df`` distinct documents is site furniture (navigation, footers,
cookie banners), not content — strip every occurrence corpus-wide.

Complements ``functions.quality.dedup_lines`` (WITHIN-page repetition,
stateless): this operator needs corpus-global state, built in one bounded
exchange.

Scale plan:
* pass 1 (df count): per-batch partials over 64-bit line hashes — the
  exchange carries (hash, count) pairs bounded by distinct-line
  cardinality × blocks, never line text;
* the boilerplate set (hashes with df ≥ min_df) is SMALL by construction —
  site furniture is repeated, content is not — and is broadcast once via
  ``ray.put`` as a sorted uint64 array. ``max_boiler_lines`` turns that
  assumption into a checked invariant (same pattern as the decontamination
  phrase cap) instead of a silent driver-side materialization;
* pass 2: stateless map; per batch ONE vectorized hash call over all
  lines and one ``np.isin`` against the broadcast array.

Line identity is the raw line (mirroring ``dedup_lines``); blank
(ASCII-whitespace-only) lines are never counted or removed — they carry
paragraph structure. A 64-bit hash collision removing an innocent line is
the same accepted risk as the decontamination index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.quality import _BLANK_CHARS


def _line_hashes(lines: list[str]) -> np.ndarray:
    if not lines:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(lines, dtype=object), categorize=False)


def boilerplate_line_hashes(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_df: int = 4,
    max_boiler_lines: int = 100_000,
) -> np.ndarray:
    """Sorted uint64 hashes of every non-blank line appearing in ≥
    ``min_df`` distinct documents."""
    def partials(batch: pa.Table) -> pa.Table:
        counts: dict[int, int] = {}
        for t in batch.column(text_col).to_pylist():
            doc_lines = list(
                {
                    ln
                    for ln in (t or "").split("\n")
                    if ln.strip(_BLANK_CHARS)
                }
            )
            for h in _line_hashes(doc_lines):
                key = int(h)
                counts[key] = counts.get(key, 0) + 1
        return pa.table(
            {
                "lhash": pa.array(
                    np.array(list(counts), dtype=np.uint64).view(np.int64),
                    pa.int64(),
                ),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    import pyarrow.compute as pc

    from .shuffle import partial_groupby_sum

    # Combiner + coarse-bucket reduce: distinct-line cardinality (large —
    # every unique sentence) never hits Ray's per-key sort-aggregate.
    df = partial_groupby_sum(
        ds.map_batches(partials, batch_format="pyarrow"), ["lhash"], ["n"]
    )
    boiler = df.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("n"), pa.scalar(min_df))
        ).select(["lhash"]),
        batch_format="pyarrow",
    )
    # Probe-then-collect: take(cap+1) bounds the driver-side collect even
    # when the set is enormous (the exact condition the cap guards); when
    # the probe stays within the cap it already IS the full set.
    rows = boiler.take(max_boiler_lines + 1)
    if len(rows) > max_boiler_lines:
        raise ValueError(
            f"boilerplate set exceeds cap {max_boiler_lines}; raise min_df "
            "or the cap — the broadcast-small-side assumption does not "
            "hold for this corpus"
        )
    return np.sort(
        np.array([r["lhash"] for r in rows], dtype=np.int64).view(np.uint64)
    )


def remove_boilerplate_lines(
    ds: ray.data.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    min_df: int = 4,
    max_boiler_lines: int = 100_000,
) -> ray.data.Dataset:
    """(id, clean_text, n_removed) with cross-document boilerplate lines
    stripped. Two passes over ``ds`` (which must therefore be cheap to
    re-read — a Parquet source, not an expensive upstream pipeline)."""
    boiler = boilerplate_line_hashes(
        ds, text_col=text_col, min_df=min_df, max_boiler_lines=max_boiler_lines
    )
    boiler_ref = ray.put(boiler)

    def scrub(batch: pa.Table) -> pa.Table:
        bset = ray.get(boiler_ref)
        texts = batch.column(text_col).to_pylist()
        all_lines: list[str] = []
        bounds = [0]
        for t in texts:
            all_lines.extend((t or "").split("\n"))
            bounds.append(len(all_lines))
        hashes = _line_hashes(all_lines)
        hit = (
            np.isin(hashes, bset)
            if hashes.size and bset.size
            else np.zeros(len(all_lines), dtype=bool)
        )
        clean: list[str] = []
        removed: list[int] = []
        for d in range(len(texts)):
            s, e = bounds[d], bounds[d + 1]
            kept = [
                ln
                for i, ln in enumerate(all_lines[s:e])
                if not ln.strip(_BLANK_CHARS) or not hit[s + i]
            ]
            clean.append("\n".join(kept))
            removed.append((e - s) - len(kept))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "clean_text": pa.array(clean, pa.string()),
                "n_removed": pa.array(removed, pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")
