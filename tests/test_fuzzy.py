"""FastSS deletion-neighborhood fuzzy matching (stages/fuzzy.py)."""

from __future__ import annotations

import random

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def test_levenshtein_reference_cases():
    from pii_detection_test_ray.stages.fuzzy import levenshtein

    assert levenshtein("", "") == 0
    assert levenshtein("a", "") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "axc") == 1
    assert levenshtein("abc", "ab") == 1
    # transposition costs 2 (no Damerau credit — matches DuckDB)
    assert levenshtein("ab", "ba") == 2


def test_fuzzy_pairs_match_bruteforce(ray_session):
    """Blocking must find EXACTLY the brute-force lev<=1 pair set on a
    corpus of random strings with planted substitution/insertion/deletion
    variants, across multiple blocks."""
    from pii_detection_test_ray.stages.fuzzy import fuzzy_pairs_lev1, levenshtein

    rng = random.Random(11)
    alphabet = "abcdef"
    base = ["".join(rng.choice(alphabet) for _ in range(8)) for _ in range(40)]
    rows = []
    for i, s in enumerate(base):
        rows.append({"id": 10 * i, "s": s})
        kind = i % 4
        if kind == 0:  # substitution
            v = s[:3] + ("z" if s[3] != "z" else "y") + s[4:]
        elif kind == 1:  # deletion
            v = s[:5] + s[6:]
        elif kind == 2:  # insertion
            v = s[:2] + "q" + s[2:]
        else:  # exact duplicate
            v = s
        rows.append({"id": 10 * i + 1, "s": v})

    expected = {}
    for a in rows:
        for b in rows:
            if a["id"] >= b["id"]:
                continue
            d = levenshtein(a["s"], b["s"])
            if d <= 1:
                expected[(a["id"], b["id"])] = d

    ds = ray.data.from_items(rows, override_num_blocks=3)
    got = {
        (r["id_a"], r["id_b"]): r["lev"]
        for r in fuzzy_pairs_lev1(ds, "id", "s").take_all()
    }
    assert got == expected
    assert len(expected) >= 40  # every planted variant pair present


def test_fuzzy_pairs_skew_cap(ray_session):
    """A mass-duplicated string stays bounded by max_group — the pair list
    is capped, not quadratic."""
    from pii_detection_test_ray.stages.fuzzy import fuzzy_pairs_lev1

    rows = [{"id": i, "s": "same-string"} for i in range(50)]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    out = fuzzy_pairs_lev1(ds, "id", "s", max_group=10).take_all()
    assert 0 < len(out) <= 10 * 9 // 2
