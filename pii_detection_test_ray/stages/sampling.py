"""Deterministic sampling operators.

Hash-based sampling replaces seeded random sampling at scale: membership
depends only on row CONTENT, so results are reproducible across engines,
cluster sizes, and partitionings — and SQL-verifiable. (The engine-wide
rule; the md5-prefix predicate doubles as the bench split elsewhere.)
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.hashing import text_fingerprint_md5


def _hex_threshold(rate: float) -> str:
    """4-hex-digit threshold such that ``md5_prefix < threshold`` keeps
    ~``rate`` of rows (md5 is lowercase hex, so lexicographic order equals
    numeric order at fixed width)."""
    if rate >= 1.0:
        return "ffffx"  # lexicographically above every 4-digit hex prefix
    n = max(0, int(round(rate * 65536)))
    if n >= 65536:  # rates in [65535.5/65536, 1.0) round up to 65536, which
        return "ffffx"  # would format as 5-char "10000" and break the compare
    return format(n, "04x")


def stratified_hash_sample(
    ds: ray.data.Dataset,
    strata_col: str,
    text_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> ray.data.Dataset:
    """Per-stratum deterministic downsampling: a row survives iff the first
    4 hex digits of its normalized content md5 fall below its stratum's
    threshold. The common corpus-curation move (keep 25% of the dominant
    language, 6% of the rest) as a zero-shuffle batch filter."""
    thresholds = {k: _hex_threshold(v) for k, v in rates.items()}
    default_threshold = _hex_threshold(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        strata = batch.column(strata_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        mask = [
            text_fingerprint_md5(t or "")[:4] < thresholds.get(s, default_threshold)
            for s, t in zip(strata, texts)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")
