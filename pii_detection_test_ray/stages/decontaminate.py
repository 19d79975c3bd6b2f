"""Benchmark decontamination: flag corpus documents that overlap an
evaluation/benchmark set — the pre-training hygiene step (GPT-3 appendix C,
The Pile §6.2, PaLM §7) that keeps eval answers out of training data. The
reference stack has no analog (SURVEY §2 extension; sibling of the dedup
family in COVERAGE "beyond-reference" ops).

Two operators, both shuffle-free:

* ``substring_contamination`` — exact signature-phrase containment,
  SQL-verifiable (DuckDB ``contains``). The phrase list is the SMALL side
  (an eval set is thousands of docs at most): collected once, broadcast via
  ``ray.put``, scanned per Arrow batch with one vectorized
  ``pc.match_substring`` pass per phrase.
* ``ngram_contamination`` — token n-gram hash overlap (the published
  decontamination method: a doc is contaminated when it shares any n-gram
  with the benchmark). Token hashes are pandas' fixed-key siphash13
  (64-bit, vectorized, deterministic across processes — upgraded from
  crc32, whose 32-bit space starts colliding around 65k distinct tokens,
  i.e. immediately at web scale); n-gram hashes are a polynomial roll
  over a numpy sliding window (vectorized, uint64 wraparound); membership
  is one ``np.isin`` against the sorted broadcast benchmark array. With
  64-bit token hashes the operator is oracle-paired: DuckDB computes the
  same overlap on n-gram STRINGS (space-joined — injective, tokens carry
  no whitespace), so any divergence IS a hash collision; none occur at
  test scale and the expected count at 100 TB is ~N²/2⁶⁵ per doc pair.

Partitioning assumption (documented like the joins): the benchmark side
fits in one broadcast object — true by definition of an eval set. The
corpus side streams map-only, so both operators scale with corpus size
like any other batch filter: zero shuffle, no driver materialization of
anything corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.quality import tokenize_ws

# Polynomial base for the n-gram roll; any odd 64-bit constant works
# (uint64 multiplication wraps, which is the intended modulus).
_NGRAM_BASE = np.uint64(1099511628211)


def _ngram_hashes_batch(texts: list, n: int) -> list[np.ndarray]:
    """uint64 n-gram hashes for every text of a batch with ONE vectorized
    token-hash call: tokens of all docs are flattened, siphashed together
    (``pd.util.hash_array`` — fixed-key, process-stable), then split back
    per doc and windowed. None/short docs yield empty arrays."""
    import pandas as pd

    toks = [tokenize_ws(t or "") for t in texts]
    flat = [t for doc in toks for t in doc]
    empty = np.empty(0, np.uint64)
    if not flat:
        return [empty for _ in toks]
    th = pd.util.hash_array(np.asarray(flat, dtype=object), categorize=False)
    powers = _NGRAM_BASE ** np.arange(n, dtype=np.uint64)
    out: list[np.ndarray] = []
    pos = 0
    for doc in toks:
        m = len(doc)
        if m < n:
            out.append(empty)
        else:
            windows = np.lib.stride_tricks.sliding_window_view(
                th[pos : pos + m], n
            )
            out.append(windows @ powers)  # uint64 dot: wraps mod 2^64
        pos += m
    return out


def bench_corpus_split(
    docs: ray.data.Dataset, text_col: str = "text"
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Deterministic ~1/16 hash split of a documents table into
    (benchmark, corpus) — the md5-prefix predicate shared with
    ``doc_samples``' stratified rates so the SQL oracles stay in lockstep.
    NOTE: the two sides are independent scans of the same lineage (each
    re-reads + re-fingerprints); at real scale the eval set is a separate
    small table, not a split of the corpus, so the double scan is purely a
    test-harness artifact."""
    from ..functions.hashing import text_fingerprint_md5

    def side(want_bench: bool):
        def split(batch: pa.Table) -> pa.Table:
            is_bench = [
                text_fingerprint_md5(t or "").startswith("0")
                for t in batch.column(text_col).to_pylist()
            ]
            keep = is_bench if want_bench else [not b for b in is_bench]
            # typed mask: an untyped pa.array([]) is null-typed and
            # filter() rejects it on empty batches
            return batch.filter(pa.array(keep, pa.bool_()))

        return split

    return (
        docs.map_batches(side(True), batch_format="pyarrow"),
        docs.map_batches(side(False), batch_format="pyarrow"),
    )


def ngram_hashes(text: str, n: int = 8) -> np.ndarray:
    """uint64 hashes of all whitespace-token n-grams of ``text`` (empty
    array when the doc has fewer than ``n`` tokens)."""
    return _ngram_hashes_batch([text], n)[0]


def benchmark_ngram_index(
    bench: ray.data.Dataset, text_col: str, n: int = 8
) -> "ray.ObjectRef":
    """Sorted unique n-gram hash array of the benchmark set, as a broadcast
    object ref. Per-batch partials are unique'd distributed; only deduped
    hash arrays (8 bytes per distinct n-gram of the SMALL side) reach the
    driver."""
    partials = bench.map_batches(
        lambda b: pa.table(
            {
                "h": pa.array(
                    np.unique(
                        np.concatenate(
                            _ngram_hashes_batch(
                                b.column(text_col).to_pylist(), n
                            )
                            or [np.empty(0, np.uint64)]
                        )
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    arrays = [
        blk.column("h").to_numpy(zero_copy_only=False)
        for blk in partials.iter_batches(batch_format="pyarrow")
    ]
    merged = (
        np.unique(np.concatenate(arrays)) if arrays else np.empty(0, np.uint64)
    )
    return ray.put(merged)


def ngram_contamination(
    corpus: ray.data.Dataset,
    bench_index: "ray.ObjectRef",
    text_col: str,
    id_col: str,
    n: int = 8,
) -> ray.data.Dataset:
    """Per corpus doc: the number of its n-grams that appear anywhere in
    the benchmark (``n_overlap``) — rows with ``n_overlap > 0`` are
    contaminated. Output: (id_col, n_overlap), contaminated rows only."""

    def score(batch: pa.Table) -> pa.Table:
        bench_sorted = ray.get(bench_index)
        per_doc = _ngram_hashes_batch(batch.column(text_col).to_pylist(), n)
        lengths = np.array([g.size for g in per_doc], np.int64)
        if lengths.sum() == 0 or bench_sorted.size == 0:
            counts = np.zeros(len(per_doc), np.int64)
        else:
            # ONE membership pass per batch (np.isin re-sorts per call, so
            # per-doc calls would pay that B times), then segment-sum the
            # flat hit mask back to documents.
            flat = np.concatenate(per_doc)
            hits = np.isin(flat, bench_sorted).astype(np.int64)
            starts = np.zeros(len(per_doc), np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            counts = np.zeros(len(per_doc), np.int64)
            nz = lengths > 0
            if nz.any():
                sums = np.add.reduceat(hits, starts[nz])
                counts[nz] = sums
        out = pa.table(
            {
                id_col: batch.column(id_col),
                "n_overlap": pa.array(counts, pa.int64()),
            }
        )
        return out.filter(pc.greater(out.column("n_overlap"), 0))

    return corpus.map_batches(score, batch_format="pyarrow")


def substring_contamination(
    corpus: ray.data.Dataset,
    phrases: list[str],
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Per corpus doc: how many of the (deduped) signature ``phrases``
    appear verbatim in its text (``n_hits``); contaminated rows only.
    Matches DuckDB ``JOIN bench ON contains(text, phrase) GROUP BY doc``
    with distinct phrases."""
    uniq = sorted(set(phrases))
    ref = ray.put(uniq)

    def score(batch: pa.Table) -> pa.Table:
        hits = np.zeros(batch.num_rows, np.int64)
        col = batch.column(text_col)
        for phrase in ray.get(ref):
            # fill_null: a null text row must count 0, not poison the sum
            mask = pc.fill_null(pc.match_substring(col, phrase), False)
            hits += pc.cast(mask, pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        out = pa.table(
            {id_col: batch.column(id_col), "n_hits": pa.array(hits, pa.int64())}
        )
        return out.filter(pc.greater(out.column("n_hits"), 0))

    return corpus.map_batches(score, batch_format="pyarrow")
