"""Deterministic hashing primitives for dedup and similarity.

All hashes are content-only (blake2b) — never Python's salted ``hash()`` —
so signatures agree across Ray worker processes and across runs, which is
what lets dedup run as a hash-partitioned ``groupby`` at cluster scale.

Vectorized with numpy where it matters: a MinHash signature is one
``(num_perm, n_shingles)`` broadcast-min, not a Python loop per permutation.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_MERSENNE_61 = (1 << 61) - 1
# Explicit ranges, not `\w`: Python re and DuckDB RE2 agree on explicit
# character classes but diverge on unicode shorthand classes (the repo's
# cross-engine regex contract — same trade as the BPE tokenizer). The
# class covers every major script whose lower() mapping is identical in
# Python and DuckDB (probed: Latin incl. Latin-1 letters, Cyrillic, Han
# + ext A, Hiragana/Katakana, Hangul syllables, Arabic, Hebrew,
# Devanagari, Thai all MATCH; Greek final-sigma Σ→ς/σ and Turkish İ→i̇/i
# DIFFER, so those stay excluded — and because tokens are extracted from
# the RAW text first and lowercased per token (see ``word_tokens``), a
# divergent character can never leak into a token via full-text lower().
# Mirrored verbatim in the ngram_jaccard_pairs SQL oracle
# (pipelines/sql_oracles.py) and pinned multi-script by
# tests/test_functions.py::test_word_tokens_multiscript_duckdb_parity.
_WORD_CLASS = (
    "A-Za-z0-9_À-ÖØ-öø-ÿ"  # Latin + Latin-1
    "Ѐ-ӿ"  # Cyrillic
    "֐-׿"  # Hebrew
    "؀-ۿ"  # Arabic
    "ऀ-ॿ"  # Devanagari
    "฀-๿"  # Thai
    "぀-ヿ"  # Hiragana + Katakana
    "㐀-䶿一-鿿"  # Han (ext A + unified)
    "가-힣"  # Hangul syllables
)
_WORD_RE = re.compile(f"[{_WORD_CLASS}]+")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants): uint64 in,
    well-mixed uint64 out. Pure numpy — no per-row Python."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def hash64_column(arr) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a key column → uint64 ndarray.

    This is the map-side tag hash for every wide operator (bucketed joins,
    salted dedup, as-of, packing): it replaced a per-row
    ``hashlib.blake2b(str(v))`` loop, which was the single largest
    vectorization gap flagged in round 2 (~10-80× per tag stage).

    Dispatch:
    * integer / boolean / temporal columns → int64 view + splitmix64
      (temporals normalized to timestamp[us] first, so a ``[s]`` column on
      one join side and ``[us]`` on the other still co-bucket);
    * everything else (strings) → ``pandas.util.hash_array`` (cython
      siphash13 with a fixed key — deterministic across processes, runs
      and machines, measured ~2.6× the blake2b loop).

    Nulls hash like a fixed sentinel: null keys never MATCH anywhere (SQL
    semantics in every consumer), so their bucket only needs to be
    consistent between the two sides of an exchange — and it is.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as _pc

    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_dictionary(t):
        arr = arr.cast(t.value_type)
        t = arr.type
    if (
        pa.types.is_integer(t)
        or pa.types.is_boolean(t)
        or pa.types.is_temporal(t)
    ):
        if pa.types.is_temporal(t):
            # Precision-normalize: same instant ⇒ same hash on both sides.
            arr = arr.cast(pa.timestamp("us")) if not pa.types.is_time(t) else arr
        ints = _pc.fill_null(arr.cast(pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        return _splitmix64(ints.view(np.uint64))
    if pa.types.is_floating(t):
        # Hash the float64 bit pattern, with -0.0 folded into +0.0 and NaNs
        # canonicalized so value-equal floats hash equal.
        f = _pc.fill_null(arr.cast(pa.float64()), 0.0).to_numpy(
            zero_copy_only=False
        )
        f = f + 0.0
        bits = f.view(np.uint64).copy()
        bits[np.isnan(f)] = np.uint64(0x7FF8000000000000)
        return _splitmix64(bits)
    # Object path: pandas' fixed-key siphash — handles None entries.
    obj = np.asarray(arr.to_pylist(), dtype=object)
    return pd.util.hash_array(obj, categorize=False)


def bucket_ids(arr, num_buckets: int, seed: int = 0) -> "np.ndarray":
    """int32 bucket assignment ``hash64(value) % num_buckets``, vectorized.
    ``seed`` selects an independent hash stream (bucket vs salt tags must
    not be correlated when both derive from the same column)."""
    h = hash64_column(arr)
    if seed:
        h = _splitmix64(h ^ np.uint64(seed))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def hash64_scalar(value) -> int:
    """Scalar reference of ``hash64_column`` — same dispatch, one value.

    Exists so pure-Python test oracles (e.g. the sequence-packing
    brute-force) stay INDEPENDENT re-implementations of the bucket
    assignment while still agreeing with the vectorized column path
    (pinned by ``tests/test_functions.py``). Not for hot paths.
    """
    import datetime

    import pandas as pd

    if isinstance(value, (bool, np.bool_)):
        value = int(value)
    if isinstance(value, (int, np.integer)):
        return int(_splitmix64(np.array([value], dtype=np.int64).view(np.uint64))[0])
    if isinstance(value, (float, np.floating)):
        f = np.array([value], dtype=np.float64) + 0.0
        bits = f.view(np.uint64).copy()
        bits[np.isnan(f)] = np.uint64(0x7FF8000000000000)
        return int(_splitmix64(bits)[0])
    if isinstance(value, datetime.datetime):
        us = int(value.timestamp() * 1_000_000) if value.tzinfo else int(
            (value - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000
        )
        return int(_splitmix64(np.array([us], dtype=np.int64).view(np.uint64))[0])
    if isinstance(value, datetime.date):
        days = (value - datetime.date(1970, 1, 1)).days
        us = days * 86_400_000_000
        return int(_splitmix64(np.array([us], dtype=np.int64).view(np.uint64))[0])
    return int(
        pd.util.hash_array(np.asarray([value], dtype=object), categorize=False)[0]
    )


def bucket_of(value, num_buckets: int, seed: int = 0) -> int:
    """Scalar ``bucket_ids`` — the single definition of the bucket hash all
    wide operators share (joins/asof/packing/salting import this)."""
    h = np.uint64(hash64_scalar(value))
    if seed:
        h = _splitmix64(np.array([h ^ np.uint64(seed)], dtype=np.uint64))[0]
    return int(h % np.uint64(num_buckets))


def blake64(data: str | bytes) -> int:
    """Stable 64-bit content hash."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def text_fingerprint(text: str, normalize: bool = True) -> str:
    """Exact-dedup key: blake2b hex of (optionally whitespace/case
    normalized) text."""
    text = text or ""  # null text behaves as empty (repo-wide invariant)
    if normalize:
        text = " ".join(text.lower().split())
    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).hexdigest()


# Cross-engine normalization: every piece is an explicit character set so
# Python and DuckDB agree byte-for-byte on ANY input. Bare DuckDB trim()
# strips Unicode Zs spaces (NBSP, U+3000, …) and DuckDB lower() uses
# simple case mappings (İ, word-final Σ differ from str.lower()), so the
# contract uses trim(text, ' ') — ASCII space charlist — and NO lower().
# RE2's \s is [ \t\n\r\f].
_ASCII_WS_RUN = re.compile(r"[ \t\n\r\x0c]+")


def text_fingerprint_md5(text: str) -> str:
    """Whitespace-normalized md5 hex — chosen (over blake2b) for the
    cross-engine contract: equals DuckDB's
    ``md5(regexp_replace(trim(text, ' '), '\\s+', ' ', 'g'))`` on ANY
    input (explicit ASCII-space trim, RE2 ASCII \\s, no case folding —
    Unicode lower() is engine-dependent)."""
    text = text or ""  # null text behaves as empty (repo-wide invariant)
    normalized = _ASCII_WS_RUN.sub(" ", text.strip(" "))
    return hashlib.md5(normalized.encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 64, base: int = 257) -> int:
    """Polynomial rolling-hash document fingerprint: XOR of the per-window
    rolling hashes sampled where hash % 16 == 0 (winnowing-style selection),
    folded to 64 bits. Cheap, order-sensitive, deterministic."""
    text = text or ""  # null text behaves as empty (repo-wide invariant)
    data = text.encode("utf-8")
    if len(data) <= window:
        return blake64(data)
    h = 0
    power = pow(base, window - 1, _MERSENNE_61)
    for b in data[:window]:
        h = (h * base + b) % _MERSENNE_61
    out = h if h % 16 == 0 else 0
    for i in range(window, len(data)):
        h = ((h - data[i - window] * power) * base + data[i]) % _MERSENNE_61
        if h % 16 == 0:
            out ^= h
    return out & 0xFFFFFFFFFFFFFFFF


def word_tokens(text: str) -> list[str]:
    """Word tokens for near-dup shingling: extract from the RAW text with
    the explicit multi-script class, then lowercase each token. Extraction
    BEFORE lowercasing is the cross-engine guarantee — a character whose
    lower() differs between Python and DuckDB (Σ, İ) is outside the class,
    so full-text lower() can never smuggle a divergent mapping into a
    token (lower('İstanbul') is 'i̇stanbul' in Python but 'istanbul' in
    DuckDB; extract-first yields 'stanbul' on both engines)."""
    text = text or ""  # null text behaves as empty (repo-wide invariant)
    return [t.lower() for t in _WORD_RE.findall(text)]


def word_ngrams(text: str, n: int = 3) -> list[str]:
    toks = word_tokens(text)
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def char_shingles(text: str, k: int = 5) -> list[str]:
    text = text or ""  # null text behaves as empty (repo-wide invariant)
    s = " ".join(text.lower().split())
    if len(s) <= k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def shingle_hashes(shingles: list[str]) -> np.ndarray:
    """uint64 content hashes of shingles (deduplicated). ONE vectorized
    fixed-key siphash call over the whole shingle list (pd.util.hash_array
    — process-stable, like every other tag hash here) instead of a Python
    blake2b per shingle: shingling is the CPU hog of MinHash at corpus
    scale (round 2's flagged per-row-hash pattern, now fixed in this last
    holdout)."""
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    import pandas as pd

    return np.unique(
        pd.util.hash_array(np.asarray(shingles, dtype=object), categorize=False)
    )


class MinHasher:
    """num_perm-permutation MinHash over 61-bit universal hashes.

    Permutation parameters are derived from a fixed seed so every worker
    computes identical signatures (built once per actor / per process).
    """

    def __init__(self, num_perm: int = 128, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        # Multiply-shift family mod 2^64: odd multipliers, natural uint64
        # wraparound supplies the mixing (a bounded-`a` mod-p scheme is
        # nearly order-preserving → correlated permutations → biased
        # Jaccard estimates; caught by tests/test_functions.py).
        a = rng.randint(0, np.iinfo(np.int64).max, size=num_perm).astype(np.uint64)
        self.a = (a << np.uint64(1)) | np.uint64(1)
        self.b = rng.randint(0, np.iinfo(np.int64).max, size=num_perm).astype(
            np.uint64
        )

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-max for an empty set."""
        if hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            acc = self.a[:, None] * h[None, :] + self.b[:, None]  # wraps mod 2^64
        return np.min(acc, axis=1)

    def signature_for_text(self, text: str, ngram: int = 3) -> np.ndarray:
        return self.signature(shingle_hashes(word_ngrams(text, ngram)))


def lsh_band_keys(signature: np.ndarray, num_bands: int) -> list[int]:
    """Split a signature into bands; each band hashes to a 64-bit bucket key
    namespaced by band index (so buckets from different bands never merge)."""
    rows = len(signature) // num_bands
    keys = []
    for band in range(num_bands):
        chunk = signature[band * rows : (band + 1) * rows]
        digest = hashlib.blake2b(
            band.to_bytes(4, "big") + chunk.tobytes(), digest_size=8
        ).digest()
        keys.append(int.from_bytes(digest, "big"))
    return keys


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (term-frequency weighted)."""
    text = text or ""  # null text behaves as empty (repo-wide invariant)
    toks = word_tokens(text)
    if not toks:
        return 0
    import pandas as pd

    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hashes = pd.util.hash_array(uniq, categorize=False)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    weighted = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if weighted[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    """Hamming distance over the 64-bit patterns; accepts values stored as
    signed int64 reinterprets (negative) as well as raw unsigned ints."""
    mask = (1 << 64) - 1
    return bin((a & mask) ^ (b & mask)).count("1")


def bucket_ids_multi(columns, num_buckets: int) -> "np.ndarray":
    """int32 bucket assignment over a COMPOSITE key: per-column 64-bit
    hashes folded with splitmix between columns, so a low-cardinality
    leading column (e.g. ``lang`` in ``(lang, value)``) cannot collapse
    the bucket distribution the way bucketing on the first column alone
    would."""
    it = iter(columns)
    h = hash64_column(next(it))
    for col in it:
        h = _splitmix64(h ^ hash64_column(col))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def sorted_codes(col) -> "np.ndarray":
    """0-based dense-rank codes of an Arrow column: order-isomorphic to the
    values with nulls grouped FIRST (SQL GROUP BY semantics) — the shared
    factorize of every bucketed window/keep-min operator. Replaces
    ``np.unique(col.to_numpy(...), return_inverse=True)``, which raised on
    null strings and, worse, silently coerced an int64 column containing
    one null to float64 — collapsing distinct ids above 2^53."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(col)
    r = _pc.rank(
        col,
        sort_keys="ascending",
        null_placement="at_start",
        tiebreaker="dense",
    )
    return (r.to_numpy(zero_copy_only=False) - 1).astype(np.int64)
