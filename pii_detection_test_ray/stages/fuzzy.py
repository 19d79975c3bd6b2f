"""Fuzzy string matching at scale — edit-distance ≤ 1 pair discovery via
deletion neighborhoods (the FastSS / SymSpell blocking scheme).

Why blocking: a naive fuzzy self-join is O(n²) distance computations — at
10⁹ entity strings that is never viable. The FastSS k=1 property gives an
exact candidate generator: two strings with unit-cost edit distance ≤ 1
ALWAYS share a member of their deletion neighborhoods ``{s} ∪ {s minus
one character}`` (substitution at i ⇒ both delete i; insertion ⇒ the
longer string's deletion equals the shorter; equality/identity trivially).
So candidates = strings sharing a neighborhood hash, found with ONE
groupby whose key count is |s|+1 per string — and every candidate pair is
re-verified with the exact DP distance, so the blocking can only produce
a superset, never a miss.

Partitioning notes (documented like the other wide operators): the
exchange carries (variant-hash, id, string); this operator is for SHORT
entity strings (names, codes, titles), not documents — the strings ride
the shuffle by design so verification is group-local. Giant variant
groups (mass-duplicated strings) are capped at ``max_group`` like the LSH
buckets; identical strings are distance-0 pairs and pair linearly against
the group head.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .dedup import _coarse_bucketed_pairs, _first_per_pair


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance over UTF-8 BYTES, identical to DuckDB's
    ``levenshtein`` (which is byte-level — 'é' vs '' is distance 2;
    hypothesis-pinned in tests/test_properties.py). Classic
    Wagner–Fischer, no transposition credit. Byte- and codepoint-level
    agree on ASCII; the deletion-neighborhood blocking above remains
    complete for byte distance ≤ 1 (a one-byte edit alters at most one
    codepoint)."""
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    if ab == bb:
        return 0
    if len(ab) < len(bb):
        ab, bb = bb, ab
    prev = list(range(len(bb) + 1))
    for i, ca in enumerate(ab, 1):
        cur = [i]
        for j, cb in enumerate(bb, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _neighborhood(s: str) -> list[str]:
    return [s] + [s[:i] + s[i + 1 :] for i in range(len(s))]


def fuzzy_pairs_lev1(
    ds: ray.data.Dataset,
    id_col: str,
    s_col: str,
    max_group: int = 256,
) -> ray.data.Dataset:
    """All pairs (id_a < id_b) whose strings have edit distance ≤ 1, with
    the exact distance. Exact up to the ``max_group`` skew cap and 64-bit
    variant-hash collisions (collisions only ADD candidates, which
    verification then rejects — they can never cause a miss)."""

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        strs = batch.column(s_col).to_pylist()
        out_ids: list = []
        out_s: list[str] = []
        variants: list[str] = []
        for i, s in zip(ids, strs):
            s = s or ""
            nb = _neighborhood(s)
            variants.extend(nb)
            out_ids.extend([i] * len(nb))
            out_s.extend([s] * len(nb))
        vh = (
            pd.util.hash_array(np.asarray(variants, dtype=object), categorize=False)
            .view(np.int64)
            if variants
            else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "vhash": pa.array(vh, pa.int64()),
                id_col: pa.array(out_ids, batch.schema.field(id_col).type),
                "s": pa.array(out_s, pa.string()),
            }
        )

    def pairs_in_group(run: pa.Table) -> pa.Table:
        id_type = run.schema.field(id_col).type
        ids = run.column(id_col).to_pylist()
        strs = run.column("s").to_pylist()
        # A string contributes several neighborhood members; within one
        # variant group each (id, s) should count once.
        seen: dict = {}
        for i, s in zip(ids, strs):
            seen.setdefault(i, s)
        members = sorted(seen.items())[: max_group]
        a_out, b_out, d_out = [], [], []
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                (ia, sa), (ib, sb) = members[x], members[y]
                d = levenshtein(sa, sb)
                if d <= 1:
                    a_out.append(ia)
                    b_out.append(ib)
                    d_out.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out, id_type),
                "id_b": pa.array(b_out, id_type),
                "lev": pa.array(d_out, pa.int64()),
            }
        )

    cand = _coarse_bucketed_pairs(
        ds.map_batches(emit, batch_format="pyarrow"), "vhash", pairs_in_group
    )
    return _first_per_pair(cand, "lev")
