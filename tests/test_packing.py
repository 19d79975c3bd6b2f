"""Sequence packing vs a pure-Python oracle; partition invariance."""

from __future__ import annotations

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _brute_pack(rows, max_tokens, num_buckets):
    """Independent reimplementation of the greedy bucket packing."""
    from pii_detection_test_ray.stages.joins import _bucket_of

    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(_bucket_of(r["doc_id"], num_buckets), []).append(r)
    out = {}
    for b, docs in by_bucket.items():
        docs = sorted(docs, key=lambda r: r["doc_id"])
        seqs = []
        cur, tok = [], 0
        for d in docs:
            t = d["n_tokens"]
            if t > max_tokens:  # exact-fit docs pack normally
                seqs.append(([d["doc_id"]], t, True))
                continue
            if tok + t > max_tokens:
                if cur:
                    seqs.append((cur, tok, False))
                cur, tok = [], 0
            cur = cur + [d["doc_id"]]
            tok += t
        if cur:
            seqs.append((cur, tok, False))
        for i, s in enumerate(seqs):
            out[(b, i)] = s
    return out


def test_pack_sequences_matches_bruteforce_and_is_partition_invariant(ray_session):
    from pii_detection_test_ray.stages.packing import pack_sequences

    import random

    rng = random.Random(11)
    rows = [
        {"doc_id": i, "n_tokens": rng.choice([30, 70, 120, 256, 300])}
        for i in range(200)
    ]
    expected = _brute_pack(rows, max_tokens=256, num_buckets=4)
    results = []
    for blocks in (1, 7):
        ds = ray.data.from_items(rows, override_num_blocks=blocks)
        got = {
            (r["bucket"], r["seq_idx"]): (r["doc_ids"], r["n_tokens"], r["oversize"])
            for r in pack_sequences(
                ds, "doc_id", "n_tokens", max_tokens=256, num_buckets=4
            ).take_all()
        }
        results.append(got)
        assert got == expected
    assert results[0] == results[1]

    # invariants: no non-oversize sequence exceeds the budget; every doc
    # appears exactly once
    all_ids = [i for ids, _, _ in expected.values() for i in ids]
    assert sorted(all_ids) == [r["doc_id"] for r in rows]
    assert all(
        tok <= 256 for _, tok, oversize in expected.values() if not oversize
    )
    assert any(oversize for _, _, oversize in expected.values())  # 300s planted
    # exact-budget docs (256) form full single-doc sequences, NOT oversize
    assert any(
        tok == 256 and not oversize for _, tok, oversize in expected.values()
    )
