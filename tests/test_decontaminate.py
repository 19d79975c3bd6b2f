"""Benchmark decontamination vs pure-Python oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _brute_ngrams(text: str, n: int) -> set[int]:
    """Independent reimplementation of the n-gram hash (per-gram polynomial
    sum instead of the vectorized sliding-window dot). Token hash = pandas'
    fixed-key siphash13, called one token at a time here (the engine hashes
    a whole batch's tokens in one call — same function, same values)."""
    from pii_detection_test_ray.functions.quality import tokenize_ws

    tokens = tokenize_ws(text)
    base = 1099511628211
    out = set()
    for i in range(len(tokens) - n + 1):
        h = 0
        for j, tok in enumerate(tokens[i : i + n]):
            th = int(
                pd.util.hash_array(
                    np.asarray([tok], dtype=object), categorize=False
                )[0]
            )
            h = (h + th * pow(base, j, 2**64)) % 2**64
        out.add(h)
    return out


def test_ngram_hashes_match_bruteforce():
    from pii_detection_test_ray.stages.decontaminate import ngram_hashes

    text = "the quick brown fox jumps over the lazy dog again and again"
    got = set(int(h) for h in ngram_hashes(text, 4))
    assert got == _brute_ngrams(text, 4)
    assert ngram_hashes("too few tokens", 8).size == 0


def _corpus():
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    bench = [
        {"doc_id": 100, "text": f"benchmark question: {shared} answer is yes"},
        {"doc_id": 101, "text": "completely unrelated benchmark prompt here "
                                "with eight distinct tokens inside"},
    ]
    corpus = [
        {"doc_id": 1, "text": f"a training page quoting {shared} verbatim"},
        {"doc_id": 2, "text": "a clean training page with no overlap at all "
                              "whatsoever in any of its token windows"},
        {"doc_id": 3, "text": f"{shared} twice! {shared} repeated"},
    ]
    return bench, corpus


def test_ngram_contamination_matches_bruteforce(ray_session):
    from pii_detection_test_ray.stages.decontaminate import (
        benchmark_ngram_index,
        ngram_contamination,
    )

    bench, corpus = _corpus()
    n = 8
    bench_grams = set()
    for r in bench:
        bench_grams |= _brute_ngrams(r["text"], n)
    expected = {}
    for r in corpus:
        from pii_detection_test_ray.stages.decontaminate import ngram_hashes

        grams = ngram_hashes(r["text"], n)
        cnt = int(np.isin(grams, np.array(sorted(bench_grams), np.uint64)).sum())
        if cnt > 0:
            expected[r["doc_id"]] = cnt

    bds = ray.data.from_items(bench, override_num_blocks=2)
    cds = ray.data.from_items(corpus, override_num_blocks=2)
    idx = benchmark_ngram_index(bds, "text", n=n)
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in ngram_contamination(cds, idx, "text", "doc_id", n=n).take_all()
    }
    assert got == expected
    assert 1 in got and 3 in got and 2 not in got  # shared phrase detected
    assert got[3] > got[1]  # repeated contamination counts more windows


def test_substring_contamination_matches_bruteforce(ray_session):
    from pii_detection_test_ray.stages.decontaminate import (
        substring_contamination,
    )

    bench, corpus = _corpus()
    phrases = [r["text"].strip()[:24] for r in bench]
    # plant an exact phrase hit
    corpus = corpus + [
        {"doc_id": 4, "text": "copied: " + bench[0]["text"][:30] + " tail"}
    ]
    expected = {}
    for r in corpus:
        hits = sum(1 for p in set(phrases) if p in r["text"])
        if hits:
            expected[r["doc_id"]] = hits
    cds = ray.data.from_items(corpus, override_num_blocks=2)
    got = {
        r["doc_id"]: r["n_hits"]
        for r in substring_contamination(cds, phrases, "text", "doc_id").take_all()
    }
    assert got == expected and 4 in got


def test_contamination_null_and_empty_text(ray_session):
    """Null/empty corpus texts count 0 hits (and never crash)."""
    import pyarrow as pa

    from pii_detection_test_ray.stages.decontaminate import (
        benchmark_ngram_index,
        ngram_contamination,
        substring_contamination,
    )

    cds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": pa.array([None, ""], pa.string())})
    )
    assert substring_contamination(cds, ["needle"], "text", "doc_id").take_all() == []
    bds = ray.data.from_items([{"doc_id": 9, "text": "a b c d e f g h"}])
    idx = benchmark_ngram_index(bds, "text", n=8)
    assert ngram_contamination(cds, idx, "text", "doc_id", n=8).take_all() == []
