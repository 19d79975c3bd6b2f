"""Skew-aware shuffle patterns: salted keep-min and partial groupby-sum
must be exactly equivalent to their naive forms — including under a
deliberately hot key."""

from __future__ import annotations

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _skewed_rows():
    rows = []
    # hot key: 300 rows of one key; cold keys: 20 distinct
    for i in range(300):
        rows.append({"k": "hot", "id": f"h{i:04d}", "v": 1})
    for i in range(20):
        rows.append({"k": f"cold{i}", "id": f"c{i:04d}", "v": i})
    return rows


def test_salted_keep_min_matches_naive(ray_session):
    from pii_detection_test_ray.stages.shuffle import salted_keep_min

    ds = ray.data.from_items(_skewed_rows(), override_num_blocks=4)
    out = salted_keep_min(ds, key_col="k", id_col="id", num_salts=8).take_all()
    by_key = {r["k"]: r["id"] for r in out}
    assert len(out) == 21  # one survivor per key
    assert by_key["hot"] == "h0000"
    assert by_key["cold7"] == "c0007"


def test_partial_groupby_sum_matches_naive(ray_session):
    from pii_detection_test_ray.stages.shuffle import partial_groupby_sum

    ds = ray.data.from_items(_skewed_rows(), override_num_blocks=4)
    out = partial_groupby_sum(ds, ["k"], ["v"], count_as="n").take_all()
    by_key = {r["k"]: r for r in out}
    assert by_key["hot"]["v"] == 300 and by_key["hot"]["n"] == 300
    assert by_key["cold5"]["v"] == 5 and by_key["cold5"]["n"] == 1
    assert len(out) == 21


def test_dedup_exact_hot_key(ray_session):
    """dedup_exact survives a pathological identical-content pile."""
    from pii_detection_test_ray.stages.dedup import dedup_exact

    rows = [{"url": f"u{i:05d}", "text": "same page content " * 10} for i in range(500)]
    rows += [{"url": f"v{i:05d}", "text": f"distinct page {i}"} for i in range(10)]
    ds = ray.data.from_items(rows, override_num_blocks=4)
    kept = sorted(r["url"] for r in dedup_exact(ds).take_all())
    assert kept[0] == "u00000"
    assert len(kept) == 11


def test_minhash_bucket_skew_cap(ray_session):
    """A giant bucket of identical docs yields linear pairs (cluster-min
    fan-out), not O(n^2), and dedup still drops all copies."""
    from pii_detection_test_ray.stages.dedup import minhash_duplicate_pairs

    rows = [
        {"url": f"d{i:04d}", "text": "repeated body of a mirrored page " * 5}
        for i in range(60)
    ]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    pairs = minhash_duplicate_pairs(ds, threshold=0.9).take_all()
    firsts = {p["id_a"] for p in pairs}
    seconds = {p["id_b"] for p in pairs}
    assert firsts == {"d0000"}  # every pair anchored at the cluster min
    assert seconds == {f"d{i:04d}" for i in range(1, 60)}


def test_stratified_hash_sample(ray_session):
    """Per-stratum rates hold approximately; membership is content-hash
    deterministic (same rows kept under any partitioning)."""
    import ray.data

    from pii_detection_test_ray.stages.sampling import stratified_hash_sample

    rows = [
        {"lang": "ko" if i % 2 else "en", "text": f"doc number {i} content"}
        for i in range(4000)
    ]
    kept_sets = []
    for blocks in (2, 8):
        ds = ray.data.from_items(rows, override_num_blocks=blocks)
        kept = stratified_hash_sample(
            ds, "lang", "text", rates={"ko": 0.5}, default_rate=0.1
        ).take_all()
        kept_sets.append({r["text"] for r in kept})
        ko = sum(1 for r in kept if r["lang"] == "ko")
        en = sum(1 for r in kept if r["lang"] == "en")
        assert 800 < ko < 1200    # ~1000 of 2000
        assert 120 < en < 280     # ~200 of 2000
    assert kept_sets[0] == kept_sets[1]  # partitioning-invariant


def test_hex_threshold_near_one():
    """Rates just under 1.0 round to 65536, which must keep ~everything —
    not format as 5-char '10000' and keep ~6% (lexicographic rollover)."""
    from pii_detection_test_ray.stages.sampling import _hex_threshold

    assert _hex_threshold(0.999995) == "ffffx"
    assert _hex_threshold(1.0) == "ffffx"
    assert "abcd" < _hex_threshold(0.999995)
    assert _hex_threshold(0.5) == "8000"
    assert _hex_threshold(0.0) == "0000"
