"""Mergeable sketches for approximate distributed aggregation.

The reference computes only exact sums (SURVEY.md §2.5); at 10^12 rows an
exact count-distinct shuffles every key, so the engine adds a HyperLogLog:
each ``map_batches`` task sketches its batch (one small register array per
key per batch), sketches merge by elementwise max — associative and
commutative, so partition order never matters — and a tiny final groupby
reduces them. Standard HLL with the small-range linear-counting correction;
error ≈ 1.04/√(2^p).
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import hash64_column, hash64_scalar


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (binary search, 6 steps).
    clz(0) = 64."""
    x = x.astype(np.uint64, copy=True)
    zero_in = x == 0
    n = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        small = x < (np.uint64(1) << np.uint64(64 - s))
        n[small] += s
        x[small] = x[small] << np.uint64(s)
    n[zero_in] = 64
    return n


class HyperLogLog:
    def __init__(self, p: int = 12) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p >= 7:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        elif p == 6:
            self.alpha = 0.709
        elif p == 5:
            self.alpha = 0.697
        else:
            self.alpha = 0.673

    def add(self, value) -> None:
        """Scalar path — same hash and bit math as ``add_hashes`` (the
        vectorized path); agreement is pinned by tests."""
        h = hash64_scalar(value)
        idx = h >> (64 - self.p)
        rest = (h << self.p) & ((1 << 64) - 1)
        # rank = leading zeros of the remaining bits (shifted into a 64-bit
        # word) + 1; all-zero remainder gets the maximum rank.
        rank = (64 - rest.bit_length() + 1) if rest else (64 - self.p + 1)
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add_hashes(self, h: np.ndarray) -> None:
        """Vectorized register update from precomputed uint64 hashes — the
        hot path; callers hash a whole column once (``hash64_column``) and
        feed per-key slices here, so no per-row Python ever runs."""
        if not h.size:
            return
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        rank = np.where(
            rest == 0, 64 - self.p + 1, _clz64(rest) + 1
        ).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add_many(self, values) -> None:
        self.add_hashes(hash64_column(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        np.maximum(self.registers, other.registers, out=out.registers)
        return out

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        out = cls(p)
        out.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return out

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    def estimate(self) -> float:
        inv = np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        raw = self.alpha * self.m * self.m / inv
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * self.m and zeros:
            return self.m * math.log(self.m / zeros)  # linear counting
        return raw


def _value_hash64(value) -> int:
    # Shared engine hash — scalar reference of hash64_column, so the
    # scalar add() and the vectorized add_hashed() sample identically.
    return hash64_scalar(value)


class HashSampleQuantile:
    """Approximate quantiles via deterministic distinct-value-hash sampling
    (Gibbons-style): a value enters the sample iff the low ``bits`` bits of
    its content hash are zero (probability 2^-bits over DISTINCT values);
    every occurrence of a sampled value is counted, so the weighted sample
    is an unbiased slice of the full distribution over a hash-random subset
    of the value domain.

    Properties that matter for a distributed engine:
    * mergeable — merge = add the (value → count) maps; associative and
      commutative, so partition order never matters;
    * DETERMINISTIC — the sample depends only on value content, never on
      partitioning or arrival order (the same input split differently gives
      bit-identical results, unlike reservoir/random sampling).
    Error shrinks with the sampled-distinct count (≈ 1/√sample for smooth
    distributions); heavy duplicate mass rides along exactly because full
    multiplicities are kept."""

    def __init__(self, bits: int = 6) -> None:
        self.bits = bits
        self.mask = (1 << bits) - 1
        self.counts: dict = {}

    def add(self, value, count: int = 1) -> None:
        if _value_hash64(value) & self.mask == 0:
            self.counts[value] = self.counts.get(value, 0) + count

    def add_hashed(self, values: np.ndarray, h: np.ndarray) -> None:
        """Vectorized membership + count update from precomputed hashes:
        the mask test and the unique-count both run in numpy; Python only
        touches the ~2^-bits sampled slice."""
        sel = (h.astype(np.uint64, copy=False) & np.uint64(self.mask)) == 0
        if not sel.any():
            return
        uq, cts = np.unique(values[sel], return_counts=True)
        for v, c in zip(uq.tolist(), cts.tolist()):
            self.counts[v] = self.counts.get(v, 0) + int(c)

    def add_many(self, values) -> None:
        arr = np.asarray(values)
        self.add_hashed(arr, hash64_column(values))

    def merge(self, other: "HashSampleQuantile") -> "HashSampleQuantile":
        assert self.bits == other.bits
        out = HashSampleQuantile(self.bits)
        out.counts = dict(self.counts)
        for v, c in other.counts.items():
            out.counts[v] = out.counts.get(v, 0) + c
        return out

    def quantile(self, q: float) -> float | None:
        if not self.counts:
            return None
        items = sorted(self.counts.items())
        total = sum(c for _, c in items)
        target = q * total
        acc = 0
        for v, c in items:
            acc += c
            if acc >= target:
                return float(v)
        return float(items[-1][0])


class MisraGries:
    """Heavy hitters (frequent items) with k counters — Misra-Gries /
    Space-Saving family. Mergeable: sum the counter maps, then decrement by
    the (k+1)-th largest count and drop non-positive counters (standard
    mergeable-summary construction; per-item count error ≤ n/(k+1) after
    any merge tree). Use k ≥ several× the number of hitters you care about."""

    def __init__(self, k: int = 16) -> None:
        self.k = k
        self.counts: dict = {}

    def add(self, value, count: int = 1) -> None:
        if value in self.counts:
            self.counts[value] += count
        elif len(self.counts) < self.k:
            self.counts[value] = count
        else:
            dec = min(count, min(self.counts.values()))
            self.counts = {
                v: c - dec for v, c in self.counts.items() if c - dec > 0
            }
            if count - dec > 0:
                self.counts[value] = count - dec

    def add_many(self, values) -> None:
        for v in values:
            self.add(v)

    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.k == other.k
        out = MisraGries(self.k)
        combined = dict(self.counts)
        for v, c in other.counts.items():
            combined[v] = combined.get(v, 0) + c
        if len(combined) > self.k:
            cutoff = sorted(combined.values(), reverse=True)[self.k]
            combined = {v: c - cutoff for v, c in combined.items() if c > cutoff}
        out.counts = combined
        return out

    def top(self, n: int) -> list[tuple]:
        """(value, lower-bound count) pairs, count desc then value asc."""
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))[:n]


class BloomFilter:
    """Mergeable Bloom filter over Arrow key columns — the shuffle-volume
    prefilter for distributed semi/anti joins (a membership "no" is exact;
    a "maybe" goes through the exact bucketed join, so false positives
    cost only bytes, never correctness).

    Vectorized end to end: ``add_column``/``contains_column`` make ONE
    ``hash64_column`` call per batch and derive the k probe positions with
    splitmix streams (seeded, deterministic across processes). Merging is
    bitwise OR — partial filters built per batch fold associatively, the
    property that lets the build side stay distributed.
    """

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 4) -> None:
        if num_bits & (num_bits - 1):
            raise ValueError("num_bits must be a power of two")
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.words = np.zeros(num_bits // 64, dtype=np.uint64)

    def _positions(self, arr) -> "np.ndarray":
        from .hashing import _splitmix64, hash64_column

        h = hash64_column(arr)
        pos = np.empty((self.num_hashes, len(h)), dtype=np.uint64)
        for k in range(self.num_hashes):
            h = _splitmix64(h ^ np.uint64(0x9E37_79B9 + k))
            pos[k] = h & np.uint64(self.num_bits - 1)
        return pos

    def add_column(self, arr) -> None:
        pos = self._positions(arr).ravel()
        np.bitwise_or.at(
            self.words, pos >> np.uint64(6),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_column(self, arr) -> "np.ndarray":
        """Boolean mask: False = DEFINITELY absent, True = maybe present."""
        pos = self._positions(arr)
        hits = (
            self.words[pos >> np.uint64(6)] >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return hits.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.num_bits == other.num_bits
        self.words |= other.words
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(
        cls, data: bytes, num_hashes: int = 4
    ) -> "BloomFilter":
        words = np.frombuffer(data, dtype=np.uint64).copy()
        bf = cls(num_bits=len(words) * 64, num_hashes=num_hashes)
        bf.words = words
        return bf
