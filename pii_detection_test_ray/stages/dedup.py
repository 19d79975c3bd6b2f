"""Distributed deduplication operators over a ``ray.data.Dataset``.

These are the wide (shuffling) operators of the engine, so their
partitioning is explicit:

* ``dedup_exact`` — hash-partitioned ``groupby(fingerprint)``; keeps the
  min-id row per identical-content group. One all-to-all exchange on the
  16-byte fingerprint, never on the text payload.
* ``minhash_duplicate_pairs`` / ``dedup_minhash`` — MinHash+LSH: signature
  per doc (narrow), ``flat_map`` to (band_key, doc) rows, ``groupby`` on the
  band key (the one shuffle; band keys are uniformly distributed blake2b
  hashes, so no key skew by construction), candidate pairs verified by
  signature agreement inside each group.
* ``simhash_duplicate_pairs`` — 64-bit SimHash, bucketing by the 4 16-bit
  chunks (hamming ≤ 3 ⇒ ≥ 1 identical chunk), verify by hamming distance.
* ``dedup_ngram_jaccard`` — LSH candidates re-verified with exact word
  n-gram Jaccard (texts travel only inside candidate groups).
* ``embedding_duplicate_pairs`` — near-dup by embedding cosine via seeded
  random-hyperplane LSH buckets, verified with exact cosine.

Dedup *within a document* (value lists) is not here — that is in-row logic
in the detect stage, mirroring the reference (regex_pii_detector.py:186-193).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import (
    MinHasher,
    hamming64,
    jaccard,
    lsh_band_keys,
    simhash64,
    text_fingerprint,
    word_ngrams,
)


def _add_fingerprint(batch: pa.Table, text_col: str, normalize: bool) -> pa.Table:
    fps = [
        text_fingerprint(t, normalize=normalize)
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("__fp", pa.array(fps, pa.string()))


def dedup_exact(
    ds: ray.data.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    num_salts: int = 16,
    normalize: bool = False,
) -> ray.data.Dataset:
    """Exactly one representative (min id) per identical-content group
    (``normalize=True`` dedups case/whitespace-insensitively instead —
    the default is EXACT content so results match a plain SQL
    ``GROUP BY text``).

    Hot-key-safe: a page duplicated millions of times is one giant
    fingerprint group; the salted two-stage reduction (stages/shuffle.py)
    bounds every reducer at ~|group|/num_salts rows."""
    from .shuffle import salted_keep_min

    with_fp = ds.map_batches(
        _add_fingerprint,
        batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "normalize": normalize},
    )
    return salted_keep_min(
        with_fp, key_col="__fp", id_col=id_col, num_salts=num_salts
    ).drop_columns(["__fp"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class _BandEmitter:
    """doc → one row per LSH band: (band_key, id, signature)."""

    def __init__(self, num_perm: int, num_bands: int, ngram: int, id_col: str, text_col: str, carry_text: bool) -> None:
        self.hasher = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.ngram = ngram
        self.id_col = id_col
        self.text_col = text_col
        self.carry_text = carry_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_key: list[int] = []
        out_id: list = []
        out_sig: list[list[int]] = []
        out_text: list[str] = []
        for doc_id, text in zip(ids, texts):
            sig = self.hasher.signature_for_text(text, self.ngram)
            sig_list = sig.tolist()
            for key in lsh_band_keys(sig, self.num_bands):
                out_key.append(key & 0x7FFFFFFFFFFFFFFF)
                out_id.append(doc_id)
                out_sig.append(sig_list)
                if self.carry_text:
                    out_text.append(text)
        cols = {
            "band_key": pa.array(out_key, pa.int64()),
            self.id_col: pa.array(out_id),
            "sig": pa.array(out_sig, pa.list_(pa.uint64())),
        }
        if self.carry_text:
            cols[self.text_col] = pa.array(out_text, pa.string())
        return pa.table(cols)


_MAX_BUCKET_REPS = 256


def _pairs_from_group(
    group: pa.Table, id_col: str, threshold: float
) -> pa.Table:
    """Pairs within one LSH bucket, skew-capped.

    A bucket of N identical pages would cost O(N^2) pairwise checks; instead
    rows are first clustered by exact signature (linear): within a cluster,
    every member pairs with the cluster min (est 1.0) — enough for
    keep-min dedup semantics — and the O(reps^2) pairwise verification runs
    only across distinct-signature representatives, capped at
    _MAX_BUCKET_REPS (beyond that a bucket is pathological input)."""
    id_type = group.schema.field(id_col).type
    ids = group.column(id_col).to_pylist()
    sigs = [np.asarray(s, dtype=np.uint64) for s in group.column("sig").to_pylist()]
    clusters: dict[bytes, list[int]] = {}
    for i, sig in enumerate(sigs):
        clusters.setdefault(sig.tobytes(), []).append(i)
    a_out, b_out, est_out = [], [], []
    reps: list[int] = []
    for members in clusters.values():
        members.sort(key=lambda i: ids[i])
        head = members[0]
        reps.append(head)
        for other in members[1:]:
            if ids[other] == ids[head]:
                continue
            a_out.append(ids[head])
            b_out.append(ids[other])
            est_out.append(1.0)
    reps.sort(key=lambda i: ids[i])
    reps = reps[:_MAX_BUCKET_REPS]
    for x in range(len(reps)):
        for y in range(x + 1, len(reps)):
            i, j = reps[x], reps[y]
            if ids[i] == ids[j]:
                continue
            est = float(np.mean(sigs[i] == sigs[j]))
            if est >= threshold:
                a_out.append(ids[i])
                b_out.append(ids[j])
                est_out.append(round(est, 6))
    return pa.table(
        {
            "id_a": pa.array(a_out, id_type),
            "id_b": pa.array(b_out, id_type),
            "est_jaccard": pa.array(est_out, pa.float64()),
        }
    )


def minhash_duplicate_pairs(
    ds: ray.data.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    num_perm: int = 128,
    num_bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.7,
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold).
    The same pair found in several bands is deduplicated by a final groupby."""
    bands = ds.map_batches(
        _BandEmitter,
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=0.5,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "num_bands": num_bands,
            "ngram": ngram,
            "id_col": id_col,
            "text_col": text_col,
            "carry_text": False,
        },
    )
    pairs = bands.groupby("band_key").map_groups(
        lambda g: _pairs_from_group(g, id_col, threshold), batch_format="pyarrow"
    )

    def first_per_pair(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(
        first_per_pair, batch_format="pyarrow"
    )


def dedup_minhash(
    ds: ray.data.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.7,
    **kwargs,
) -> ray.data.Dataset:
    """Drop every doc that is the larger id of some near-duplicate pair
    (keep-first-by-id semantics; transitive chains collapse to the min id of
    each overlapping pair set)."""
    pairs = minhash_duplicate_pairs(
        ds, id_col=id_col, text_col=text_col, threshold=threshold, **kwargs
    )
    drop_ids = {row["id_b"] for row in pairs.select_columns(["id_b"]).take_all()}
    if not drop_ids:
        return ds
    drop_ref = ray.put(drop_ids)

    def keep_batch(batch: pa.Table) -> pa.Table:
        drops = ray.get(drop_ref)
        mask = [i not in drops for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_duplicate_pairs(
    ds: ray.data.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: bucket on each of the 4 16-bit chunks
    (pigeonhole: hamming ≤ 3 over 64 bits ⇒ some chunk identical), then
    verify hamming distance within buckets."""

    def emit_chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_key, out_id, out_hash = [], [], []
        for doc_id, text in zip(ids, texts):
            sh = simhash64(text)
            for c in range(4):
                chunk = (sh >> (16 * c)) & 0xFFFF
                out_key.append((c << 16) | chunk)
                out_id.append(doc_id)
                # two's-complement reinterpret: all 64 bits survive int64
                # (masking to 63 bits would hide bit 63 from the hamming
                # verification)
                out_hash.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
        return pa.table(
            {
                "chunk_key": pa.array(out_key, pa.int64()),
                id_col: pa.array(out_id),
                "simhash": pa.array(out_hash, pa.int64()),
            }
        )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        # Skew cap: cluster identical simhashes linearly (distance 0 pairs
        # against the cluster min), pairwise only across distinct-hash
        # representatives (bounded).
        id_type = group.schema.field(id_col).type
        ids = group.column(id_col).to_pylist()
        hashes = group.column("simhash").to_pylist()
        clusters: dict[int, list[int]] = {}
        for i, h in enumerate(hashes):
            clusters.setdefault(h, []).append(i)
        a_out, b_out, d_out = [], [], []
        reps: list[int] = []
        for members in clusters.values():
            members.sort(key=lambda i: ids[i])
            head = members[0]
            reps.append(head)
            for other in members[1:]:
                if ids[other] != ids[head]:
                    a_out.append(ids[head])
                    b_out.append(ids[other])
                    d_out.append(0)
        reps.sort(key=lambda i: ids[i])
        reps = reps[:_MAX_BUCKET_REPS]
        rows = [(ids[i], hashes[i]) for i in reps]
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                d = hamming64(rows[i][1], rows[j][1])
                if d <= max_hamming:
                    a_out.append(rows[i][0])
                    b_out.append(rows[j][0])
                    d_out.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out, id_type),
                "id_b": pa.array(b_out, id_type),
                "hamming": pa.array(d_out, pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(emit_chunks, batch_format="pyarrow")
        .groupby("chunk_key")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard verification of LSH candidates
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.6,
    num_perm: int = 128,
    num_bands: int = 32,
) -> ray.data.Dataset:
    """Near-dup pairs with EXACT word-n-gram Jaccard ≥ threshold. LSH bands
    (permissive: more bands → higher candidate recall) generate candidates;
    texts travel only inside candidate groups for exact verification."""
    bands = ds.map_batches(
        _BandEmitter,
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=0.5,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "num_bands": num_bands,
            "ngram": ngram,
            "id_col": id_col,
            "text_col": text_col,
            "carry_text": True,
        },
    )

    def verify(group: pa.Table) -> pa.Table:
        # Skew cap: identical texts cluster linearly (jaccard 1.0 against
        # the min id); exact n-gram verification runs only across distinct
        # texts, capped.
        id_type = group.schema.field(id_col).type
        ids = group.column(id_col).to_pylist()
        texts = group.column(text_col).to_pylist()
        clusters: dict[str, list[int]] = {}
        for i, t in enumerate(texts):
            clusters.setdefault(t, []).append(i)
        a_out, b_out, j_out = [], [], []
        reps: list[int] = []
        for members in clusters.values():
            members.sort(key=lambda i: ids[i])
            head = members[0]
            reps.append(head)
            for other in members[1:]:
                if ids[other] != ids[head]:
                    a_out.append(ids[head])
                    b_out.append(ids[other])
                    j_out.append(1.0)
        reps.sort(key=lambda i: ids[i])
        reps = reps[:_MAX_BUCKET_REPS]
        shingle_sets = {i: set(word_ngrams(texts[i], ngram)) for i in reps}
        for x in range(len(reps)):
            for y in range(x + 1, len(reps)):
                i, j = reps[x], reps[y]
                if ids[i] == ids[j]:
                    continue
                jac = jaccard(shingle_sets[i], shingle_sets[j])
                if jac >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(round(jac, 6))
        return pa.table(
            {
                "id_a": pa.array(a_out, id_type),
                "id_b": pa.array(b_out, id_type),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    pairs = bands.groupby("band_key").map_groups(verify, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (random hyperplane LSH)
# ---------------------------------------------------------------------------


def embedding_duplicate_pairs(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    threshold: float = 0.95,
    seed: int = 42,
) -> ray.data.Dataset:
    """Pairs with cosine ≥ threshold; candidates share a sign-pattern bucket
    under ``n_planes`` seeded random hyperplanes (near-identical vectors
    collide with high probability)."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim).astype(np.float64)

    def emit_bucket(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        signs = (unit @ planes.T) > 0
        keys = signs.dot(1 << np.arange(n_planes)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(keys, pa.int64()),
                id_col: batch.column(id_col),
                "unit": pa.array(unit.tolist(), pa.list_(pa.float64())),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        id_type = group.schema.field(id_col).type
        ids = group.column(id_col).to_pylist()
        unit = np.asarray(group.column("unit").to_pylist(), dtype=np.float64)
        order = np.argsort(np.asarray(ids))
        a_out, b_out, c_out = [], [], []
        sims = unit @ unit.T
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                if ids[i] == ids[j]:
                    continue
                c = float(sims[i, j])
                if c >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    c_out.append(round(c, 6))
        return pa.table(
            {
                "id_a": pa.array(a_out, id_type),
                "id_b": pa.array(b_out, id_type),
                "cosine": pa.array(c_out, pa.float64()),
            }
        )

    pairs = (
        ds.map_batches(emit_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
