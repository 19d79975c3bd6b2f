"""Distributed dedup + ANN operators against planted ground truth."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs_with_dups():
    base = [
        "the quick brown fox jumps over the lazy dog near the quiet river bank today",
        "completely different text about quarterly revenue growth in the third fiscal quarter",
        "요약 보고서에는 지난 분기의 주요 성과와 향후 계획이 정리되어 있습니다",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append({"url": f"u{i:03d}a", "text": t})
        rows.append({"url": f"u{i:03d}b", "text": t})  # exact dup
        rows.append({"url": f"u{i:03d}c", "text": t + " appended"})  # near dup
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()
    for i in range(20):
        toks = [words[(i * 7 + j * 3) % len(words)] + str(i * 31 + j) for j in range(12)]
        rows.append({"url": f"x{i:03d}", "text": " ".join(toks)})
    return rows


def test_dedup_exact(ray_session):
    from pii_detection_test_ray.stages.dedup import dedup_exact

    ds = ray.data.from_items(_docs_with_dups(), override_num_blocks=2)
    kept = sorted(r["url"] for r in dedup_exact(ds).take_all())
    # For each trio, the 'a' (min url) survives; 'b' is dropped; 'c' differs.
    assert "u000a" in kept and "u000b" not in kept and "u000c" in kept
    assert len(kept) == 3 * 2 + 20


def test_minhash_pairs_and_dedup(ray_session):
    from pii_detection_test_ray.stages.dedup import dedup_minhash, minhash_duplicate_pairs

    ds = ray.data.from_items(_docs_with_dups(), override_num_blocks=2)
    pairs = minhash_duplicate_pairs(ds, threshold=0.5).take_all()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert ("u000a", "u000b") in found  # identical
    assert any(a == "u000a" and b == "u000c" for a, b in found)  # near dup
    assert not any(a.startswith("x") or b.startswith("x") for a, b in found)

    kept = {r["url"] for r in dedup_minhash(ds, threshold=0.5).take_all()}
    assert "u000a" in kept and "u000b" not in kept


def test_simhash_pairs(ray_session):
    from pii_detection_test_ray.stages.dedup import simhash_duplicate_pairs

    ds = ray.data.from_items(_docs_with_dups(), override_num_blocks=2)
    pairs = simhash_duplicate_pairs(ds, max_hamming=3).take_all()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert ("u000a", "u000b") in found


def test_ngram_jaccard_exact_verification(ray_session):
    from pii_detection_test_ray.stages.dedup import ngram_jaccard_pairs

    ds = ray.data.from_items(_docs_with_dups(), override_num_blocks=2)
    pairs = ngram_jaccard_pairs(ds, threshold=0.5).take_all()
    by_pair = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    assert by_pair.get(("u000a", "u000b")) == 1.0


def _embedding_rows(n=80, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        v = rng.randn(dim)
        rows.append({"vec_id": i, "embedding": (v / np.linalg.norm(v)).tolist()})
    # planted near-dup of vec 0
    v0 = np.asarray(rows[0]["embedding"]) + 0.01 * rng.randn(dim)
    rows.append({"vec_id": n, "embedding": (v0 / np.linalg.norm(v0)).tolist()})
    return rows


def test_embedding_duplicate_pairs(ray_session):
    from pii_detection_test_ray.stages.dedup import embedding_duplicate_pairs

    ds = ray.data.from_items(_embedding_rows(), override_num_blocks=2)
    pairs = embedding_duplicate_pairs(
        ds, dim=16, threshold=0.98, n_planes=8
    ).take_all()
    assert any({p["id_a"], p["id_b"]} == {0, 80} for p in pairs)


def test_knn_brute_force_matches_numpy(ray_session):
    from pii_detection_test_ray.stages.similarity import knn_brute_force

    rows = _embedding_rows()
    ds = ray.data.from_items(rows, override_num_blocks=2)
    queries = np.asarray([rows[0]["embedding"], rows[5]["embedding"]])
    out = knn_brute_force(ds, queries, k=5).take_all()
    by_q = {}
    for r in sorted(out, key=lambda r: (r["query_id"], -r["score"], r["vec_id"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    # numpy reference
    mat = np.asarray([r["embedding"] for r in rows])
    ids = np.asarray([r["vec_id"] for r in rows])
    for qi, q in enumerate(queries):
        sims = mat @ q
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:5]
        assert by_q[qi] == [int(ids[i]) for i in order]
    assert by_q[0][0] == 0  # self is nearest


def test_embedding_clusters_separation_and_determinism(ray_session):
    """Two well-separated synthetic blobs land in two distinct clusters,
    every member with its blob-mates; assignment is partition-invariant."""
    from pii_detection_test_ray.stages.similarity import embedding_clusters

    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        blob = i % 2
        base = np.zeros(8)
        base[blob] = 10.0
        rows.append(
            {"vec_id": i, "embedding": (base + rng.normal(0, 0.05, 8)).tolist()}
        )
    results = []
    for blocks in (2, 6):
        ds = ray.data.from_items(rows, override_num_blocks=blocks)
        got = {
            r["vec_id"]: r["cluster"]
            for r in embedding_clusters(ds, n_clusters=2, sample_size=60).take_all()
        }
        results.append(got)
        evens = {got[i] for i in range(0, 60, 2)}
        odds = {got[i] for i in range(1, 60, 2)}
        assert len(evens) == 1 and len(odds) == 1 and evens != odds
    assert results[0] == results[1]  # deterministic across partitionings


def test_knn_ivf_recall(ray_session):
    from pii_detection_test_ray.stages.similarity import knn_brute_force, knn_ivf

    rows = _embedding_rows(n=200)
    ds = ray.data.from_items(rows, override_num_blocks=2)
    queries = np.asarray([rows[3]["embedding"]])
    exact = {r["vec_id"] for r in knn_brute_force(ds, queries, k=10).take_all()}
    approx = {
        r["vec_id"]
        for r in knn_ivf(ds, queries, k=10, n_clusters=8, nprobe=4).take_all()
    }
    assert len(exact & approx) >= 5  # ≥50% recall with nprobe=half
    assert 3 in approx


def test_embedding_identical_cluster_listing(ray_session):
    """Pair-LISTING contract (round 5, matching the brute-force oracle):
    a mass-duplicated vector's identical-unit cluster owes ALL C(m,2)
    pairs at cosine 1.0 — the output itself is O(m²), so the emission adds
    no asymptotic cost, and the O(reps²) verify pass still runs only over
    distinct-unit representatives (the skew cap that matters). Keep-min
    dedup semantics live in dedup_minhash, not here."""
    from pii_detection_test_ray.stages.dedup import embedding_duplicate_pairs

    rng = np.random.RandomState(3)
    v = rng.randn(16)
    v = (v / np.linalg.norm(v)).tolist()
    rows = [{"vec_id": i, "embedding": list(v)} for i in range(50)]
    # plus some distinct vectors that must not pair
    for i in range(50, 60):
        u = rng.randn(16)
        rows.append({"vec_id": i, "embedding": (u / np.linalg.norm(u)).tolist()})
    ds = ray.data.from_items(rows, override_num_blocks=2)
    pairs = embedding_duplicate_pairs(
        ds, dim=16, threshold=0.98, n_planes=8
    ).take_all()
    dup_pairs = {
        (p["id_a"], p["id_b"]) for p in pairs
        if p["id_a"] < 50 and p["id_b"] < 50
    }
    assert dup_pairs == {
        (i, j) for i in range(50) for j in range(i + 1, 50)
    }
    assert all(
        p["cosine"] == 1.0
        for p in pairs
        if p["id_a"] < 50 and p["id_b"] < 50
    )


def _mutation_corpus(n_families=12, variants=4, seed=11):
    """Families of near-duplicate documents: each family is a base sentence
    with word substitutions of increasing depth, giving a spread of true
    Jaccard similarities around any threshold."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{k:02d}" for k in range(40)]
    rows = []
    for f in range(n_families):
        base = [vocab[int(rng.randint(len(vocab)))] for _ in range(18)]
        rows.append({"url": f"f{f:02d}dup", "text": " ".join(base)})  # exact clone of v0
        for v in range(variants):
            words = list(base)
            for _ in range(v):  # v=0 keeps the exact text
                words[int(rng.randint(len(words)))] = vocab[int(rng.randint(len(vocab)))]
            rows.append({"url": f"f{f:02d}v{v}", "text": " ".join(words)})
    return rows


def test_ngram_pairs_match_pure_python_oracle(ray_session):
    """EXACT set parity with an independent simulation of the operator's
    contract: candidates share >=1 LSH band bucket (exact band_key groups),
    a pair is emitted iff its word-3-gram Jaccard >= threshold, oriented
    (min_id, max_id). Guards the canonical-emission gates and the coarse
    bucket subdivision (a merged-bucket bug would add candidates; a broken
    gate would drop identical-text pairs)."""
    from pii_detection_test_ray.functions.hashing import (
        MinHasher,
        jaccard,
        lsh_band_keys,
        word_ngrams,
    )
    from pii_detection_test_ray.stages.dedup import ngram_jaccard_pairs

    rows = _mutation_corpus()
    threshold = 0.5
    # Representative compression (mirrors the operator): identical texts
    # form a cluster; within-cluster ALL pairs emit at Jaccard 1.0, and a
    # rep-pair collision expands to the full cross-product of both
    # clusters (each cross pair verified at its texts' raw Jaccard).
    clusters: dict[str, list[str]] = {}
    for r in rows:
        clusters.setdefault(r["text"], []).append(r["url"])
    expected = {}
    heads = []
    for text, urls in clusters.items():
        urls.sort()
        heads.append((urls, text))
        for x in range(len(urls)):
            for y in range(x + 1, len(urls)):
                expected[(urls[x], urls[y])] = 1.0
    hasher = MinHasher(num_perm=128)
    buckets: dict[int, list[int]] = {}
    for d, (_, text) in enumerate(heads):
        sig = hasher.signature_for_text(text, 3)
        for key in lsh_band_keys(sig, 32):
            buckets.setdefault(key & 0x7FFFFFFFFFFFFFFF, []).append(d)
    shingle = [set(word_ngrams(text, 3)) for _, text in heads]
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                jac = jaccard(shingle[i], shingle[j])
                if jac < threshold:
                    continue
                for ua in heads[i][0]:
                    for ub in heads[j][0]:
                        a, b = sorted((ua, ub))
                        expected.setdefault((a, b), jac)

    ds = ray.data.from_items(rows, override_num_blocks=3)
    got = {
        (p["id_a"], p["id_b"]): p["jaccard"]
        for p in ngram_jaccard_pairs(ds, threshold=threshold).take_all()
    }
    assert got == expected
    assert len(expected) > 10  # the corpus really exercises the operator


def test_simhash_pairs_match_pure_python_oracle(ray_session):
    """With max_hamming=3 <= 64/4 chunks, the pigeonhole guarantee makes the
    contract exactly 'every pair at hamming distance <= 3' — assert full set
    parity against brute force (guards the canonical-chunk gate)."""
    from pii_detection_test_ray.functions.hashing import hamming64, simhash64
    from pii_detection_test_ray.stages.dedup import simhash_duplicate_pairs

    rows = _mutation_corpus(n_families=10, variants=3, seed=23)
    # Round-5 listing contract: the operator owes EVERY pair at hamming
    # ≤ 3, including all C(m,2) pairs of an identical-signature cluster
    # (the DuckDB bit_count(xor) self-join emits them) — so the brute
    # force is literally all pairs.
    sigs = {r["url"]: simhash64(r["text"]) for r in rows}
    urls = sorted(sigs)
    expected = {}
    for i in range(len(urls)):
        for j in range(i + 1, len(urls)):
            d = hamming64(sigs[urls[i]], sigs[urls[j]])
            if d <= 3:
                expected[(urls[i], urls[j])] = d

    ds = ray.data.from_items(rows, override_num_blocks=3)
    got = {
        (p["id_a"], p["id_b"]): p["hamming"]
        for p in simhash_duplicate_pairs(ds, max_hamming=3).take_all()
    }
    assert got == expected
    assert len(expected) >= 5


def test_band_exchange_carries_no_text():
    """The LSH band exchange (the one shuffle of the near-dup family) must
    carry ids+signatures only — round 2 shipped the full text once per band
    (×num_bands corpus bytes); this pins the fix structurally."""
    import pyarrow as pa

    from pii_detection_test_ray.stages.dedup import _band_rows

    batch = pa.table({"url": ["a", "b"], "text": ["hello world one two", "x y z w"]})
    out = _band_rows(
        batch, num_perm=16, num_bands=4, ngram=3, id_col="url", text_col="text"
    )
    assert set(out.column_names) == {"band_key", "band", "url", "sig"}
    assert out.num_rows == 8  # one row per (doc, band)


def test_dedup_minhash_no_driver_materialization(ray_session):
    """dedup_minhash keeps the kept-set semantics while routing the drop set
    through the distributed anti-join (no take_all of ids in the operator)."""
    import inspect

    from pii_detection_test_ray.stages import dedup

    src = inspect.getsource(dedup.dedup_minhash)
    assert ".take_all(" not in src
    rows = [
        {"url": f"d{i:03d}", "text": "identical page body repeated " * 4}
        for i in range(30)
    ] + [{"url": f"z{i:03d}", "text": f"unique document number {i} {i*7}"} for i in range(10)]
    ds = ray.data.from_items(rows, override_num_blocks=3)
    kept = sorted(r["url"] for r in dedup.dedup_minhash(ds, threshold=0.9).take_all())
    assert "d000" in kept and all(not k.startswith("d") or k == "d000" for k in kept)
    assert [k for k in kept if k.startswith("z")] == [f"z{i:03d}" for i in range(10)]


def test_jaccard_pairs_exact_matches_bruteforce(ray_session):
    """Inverted-index all-pairs Jaccard == a pure-Python brute force over
    every pair, on a corpus with exact dups, near dups, and unrelated
    filler — the pure-oracle analog of the DuckDB pairing in
    test_oracle_parity."""
    from pii_detection_test_ray.functions.quality import tokenize_ws
    from pii_detection_test_ray.stages.dedup import jaccard_pairs_exact

    rows = [
        {"doc_id": i, "text": r["text"]}
        for i, r in enumerate(_docs_with_dups())
    ]

    def gramset(t):
        toks = tokenize_ws(t)
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {r["doc_id"]: gramset(r["text"]) for r in rows}
    expected = {}
    for a in rows:
        for b in rows:
            if a["doc_id"] >= b["doc_id"]:
                continue
            inter = sets[a["doc_id"]] & sets[b["doc_id"]]
            union = sets[a["doc_id"]] | sets[b["doc_id"]]
            if union and len(inter) / len(union) >= 0.5:
                expected[(a["doc_id"], b["doc_id"])] = (
                    len(inter),
                    len(inter) / len(union),
                )

    ds = ray.data.from_items(rows, override_num_blocks=3)
    got = {
        (p["id_a"], p["id_b"]): (p["shared"], p["jaccard"])
        for p in jaccard_pairs_exact(ds, threshold=0.5).take_all()
    }
    assert got == expected and expected  # non-vacuous


def test_jaccard_pairs_exact_df_cap_drops_boilerplate(ray_session):
    """A gram shared by more docs than max_df must generate NO pairs
    through that gram (the O(df²) stop-gram guarantee), while rare-gram
    pairs still surface."""
    from pii_detection_test_ray.stages.dedup import jaccard_pairs_exact

    boiler = "all rights reserved by site"
    rows = [
        {"doc_id": i, "text": f"{boiler} unique{i} filler{i} token{i}"}
        for i in range(12)
    ]
    rows += [
        {"doc_id": 100, "text": "rare shared sentence appears twice only"},
        {"doc_id": 101, "text": "rare shared sentence appears twice only"},
    ]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    got = {
        (p["id_a"], p["id_b"])
        for p in jaccard_pairs_exact(ds, max_df=4, threshold=0.1).take_all()
    }
    # Boilerplate grams have df=12 > 4 → capped; the only surviving route
    # to a pair is the rare duplicated sentence.
    assert got == {(100, 101)}


def test_embedding_operators_survive_empty_blocks(ray_session):
    """Empty blocks (upstream filters produce them) must not crash the
    embedding operators — round-3 review found _as_matrix yielded 1-D
    empties that broke every axis-1 kernel."""
    import numpy as np

    from pii_detection_test_ray.stages.dedup import embedding_duplicate_pairs
    from pii_detection_test_ray.stages.similarity import (
        embedding_clusters,
        knn_brute_force,
    )

    rows = _embedding_rows(n=40, dim=16)
    ds = ray.data.from_items(rows, override_num_blocks=3).filter(
        lambda r: r["vec_id"] < 20  # later blocks become empty
    )
    queries = np.asarray([rows[0]["embedding"]])
    assert len(knn_brute_force(ds, queries, k=3).take_all()) == 3
    assert embedding_clusters(ds, n_clusters=2).count() > 0
    embedding_duplicate_pairs(ds, dim=16, threshold=0.99).count()  # no crash


def test_candidate_pair_emission_cap_raises_loudly():
    """A pair-LISTING bucket projected past _MAX_BUCKET_PAIRS must raise
    with guidance (use keep-min dedup), never build an unbounded pair list
    in one reducer — the round-4 full-cluster emission reopened the skew
    hole the rep cap used to close, so the cap moved to projected pairs."""
    import pyarrow as pa

    from pii_detection_test_ray.stages.dedup import (
        _MAX_BUCKET_PAIRS,
        _candidates_from_group,
    )

    n = 4000  # identical signatures -> C(n,2) ~ 8M > 5M cap
    sig = list(range(8))
    group = pa.table(
        {
            "band_key": pa.array([7] * n, pa.int64()),
            "band": pa.array([0] * n, pa.int32()),
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "sig": pa.array([sig] * n, pa.list_(pa.uint64())),
        }
    )
    with pytest.raises(ValueError, match="keep-min"):
        _candidates_from_group(group, "url")
    assert _MAX_BUCKET_PAIRS == 5_000_000
