"""Text-analysis columns for a training-data pipeline: token counts,
fingerprints, signatures. One stateless batch stage + one signature stage
(callable class so the MinHasher permutation table is built once per worker,
not once per batch).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import (
    MinHasher,
    rolling_fingerprint,
    simhash64,
    text_fingerprint,
)
from ..functions.quality import token_count


def textstats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """token count + exact/rolling fingerprints."""
    n_tokens: list[int] = []
    exact_fp: list[str] = []
    roll_fp: list[int] = []
    for text in batch.column(text_col).to_pylist():
        n_tokens.append(token_count(text))
        exact_fp.append(text_fingerprint(text))
        roll_fp.append(rolling_fingerprint(text))
    return (
        batch.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
        .append_column("fingerprint", pa.array(exact_fp, pa.string()))
        .append_column(
            "rolling_fp",
            pa.array([f & 0x7FFFFFFFFFFFFFFF for f in roll_fp], pa.int64()),
        )
    )


class SignatureBatcher:
    """Adds ``minhash_sig`` (fixed-width list<uint64>) and ``simhash``
    columns. MinHash permutations are derived from a fixed seed, so every
    worker emits identical signatures for identical text."""

    def __init__(self, num_perm: int = 128, ngram: int = 3, text_col: str = "text") -> None:
        self.hasher = MinHasher(num_perm=num_perm)
        self.ngram = ngram
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs: list[list[int]] = []
        shashes: list[int] = []
        for text in batch.column(self.text_col).to_pylist():
            sigs.append(self.hasher.signature_for_text(text, self.ngram).tolist())
            sh = simhash64(text)
            shashes.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
        return batch.append_column(
            "minhash_sig", pa.array(sigs, pa.list_(pa.uint64()))
        ).append_column("simhash", pa.array(shashes, pa.int64()))
