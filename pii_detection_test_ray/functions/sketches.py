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

import hashlib
import math

import numpy as np


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
        h = int.from_bytes(
            hashlib.blake2b(str(value).encode(), digest_size=8).digest(), "big"
        )
        idx = h >> (64 - self.p)
        rest = (h << self.p) & ((1 << 64) - 1)
        # rank = leading zeros of the remaining bits (shifted into a 64-bit
        # word) + 1; all-zero remainder gets the maximum rank.
        rank = (64 - rest.bit_length() + 1) if rest else (64 - self.p + 1)
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add_many(self, values) -> None:
        for v in values:
            self.add(v)

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
