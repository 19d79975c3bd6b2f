"""Property-based tests (hypothesis) for the pure kernels: invariants that
must hold on ANY input, not just the curated fixtures. No Ray involved —
these pin the algebra the distributed operators rely on (mergeability,
partition-order independence, metric bounds)."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

SMALL = settings(max_examples=60, deadline=None)


@SMALL
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=300),
    st.integers(min_value=1, max_value=5),
)
def test_hash_sample_quantile_merge_is_partition_independent(values, n_splits):
    """Any split of the stream into partials merges to the same sketch as
    one pass — the property that makes it a valid distributed aggregate."""
    from pii_detection_test_ray.functions.sketches import HashSampleQuantile

    whole = HashSampleQuantile(bits=2)
    whole.add_many(values)

    parts = [HashSampleQuantile(bits=2) for _ in range(n_splits)]
    for i, v in enumerate(values):
        parts[i % n_splits].add(v)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.counts == whole.counts
    for q in (0.0, 0.5, 1.0):
        assert merged.quantile(q) == whole.quantile(q)


@SMALL
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400))
def test_misra_gries_guarantee(stream):
    """Classic MG bound: every value with true frequency > n/(k+1) is
    present, and stored counts never exceed true counts."""
    from collections import Counter

    from pii_detection_test_ray.functions.sketches import MisraGries

    k = 8
    mg = MisraGries(k=k)
    mg.add_many(stream)
    true = Counter(stream)
    n = len(stream)
    for v, c in true.items():
        if c > n / (k + 1):
            assert v in mg.counts, (v, c, n)
    for v, c in mg.counts.items():
        assert c <= true[v]


@SMALL
@given(
    st.lists(st.text(alphabet="ab가나 ", min_size=0, max_size=12), min_size=0, max_size=6),
    st.lists(st.text(alphabet="ab가나 ", min_size=0, max_size=12), min_size=0, max_size=6),
)
def test_document_metrics_bounds_and_symmetry(expected_vals, predicted_vals):
    """Micro metrics stay in [0,1]; tp+fn equals the expected set size;
    exact agreement scores perfect."""
    from pii_detection_test_ray.functions.metrics import document_metrics
    from pii_detection_test_ray.functions.pii_regex import PII_CATEGORIES

    base = {c: None for c in PII_CATEGORIES}
    exp = dict(base)
    pred = dict(base)
    exp["이름"] = [v for v in expected_vals if v.strip()] or None
    pred["이름"] = [v for v in predicted_vals if v.strip()] or None
    m = document_metrics(exp, pred)
    assert 0.0 <= m["micro_precision"] <= 1.0
    assert 0.0 <= m["micro_recall"] <= 1.0
    assert 0.0 <= m["micro_f1"] <= 1.0
    e_set = {v.strip() for v in (exp["이름"] or [])}
    assert m["total_tp"] + m["total_fn"] == len(e_set)
    same = document_metrics(exp, dict(exp))
    assert same["micro_f1"] == 1.0


@SMALL
@given(st.text(max_size=200), st.text(max_size=200))
def test_fingerprint_separates_normalized_content(a, b):
    """Fingerprints are equal iff whitespace-normalized lowercase content is
    equal (the exact-dedup key contract)."""
    from pii_detection_test_ray.functions.hashing import text_fingerprint

    def norm(t: str) -> str:
        return " ".join(t.lower().split())

    same_content = norm(a) == norm(b)
    same_fp = text_fingerprint(a, normalize=True) == text_fingerprint(b, normalize=True)
    assert same_content == same_fp


@SMALL
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=64).map(sorted),
    st.integers(min_value=0, max_value=10**6),
)
def test_minhash_estimate_matches_exact_jaccard_direction(xs, seed_val):
    """MinHash signature agreement is a sane Jaccard estimator: identical
    sets estimate 1.0, disjoint sets estimate (near) 0.0."""
    import numpy as np

    from pii_detection_test_ray.functions.hashing import MinHasher, shingle_hashes

    h = MinHasher(num_perm=64)
    a = sorted({f"tok{x}" for x in xs})
    sig_a = h.signature(shingle_hashes(a))
    sig_a2 = h.signature(shingle_hashes(list(reversed(a))))  # order-free
    assert float(np.mean(sig_a == sig_a2)) == 1.0
    disjoint = sorted({f"other{x}" for x in xs})
    est = float(np.mean(sig_a == h.signature(shingle_hashes(disjoint))))
    assert est <= 0.25


# ---------------------------------------------------------------------------
# Cross-engine fuzz: the four text kernels must equal their DuckDB oracle
# formulations on ARBITRARY unicode input — not just the curated hostile
# list in test_functions.py. One shared in-process DuckDB connection; 60
# random examples per kernel.
# ---------------------------------------------------------------------------

_duckdb = pytest.importorskip("duckdb")
_CON = _duckdb.connect()
# surrogate-free arbitrary unicode, newlines included
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120
)


@SMALL
@given(_TEXT)
def test_fuzz_tokenize_ws_equals_duckdb(t):
    from pii_detection_test_ray.functions.quality import tokenize_ws

    sql = _CON.execute(r"SELECT regexp_extract_all(?, '[^\s]+')", [t]).fetchone()[0]
    assert tokenize_ws(t) == sql


@SMALL
@given(_TEXT)
def test_fuzz_fingerprint_md5_equals_duckdb(t):
    from pii_detection_test_ray.functions.hashing import text_fingerprint_md5

    sql = _CON.execute(
        r"SELECT md5(regexp_replace(trim(?, ' '), '\s+', ' ', 'g'))", [t]
    ).fetchone()[0]
    assert text_fingerprint_md5(t) == sql


@SMALL
@given(_TEXT)
def test_fuzz_bpe_count_equals_duckdb(t):
    from pii_detection_test_ray.functions.quality import token_count_bpe

    pat = " ?[A-Za-z가-힣]+| ?[0-9]+| ?[^ \\t\\n\\r\\x0b\\x0cA-Za-z가-힣0-9]+"
    sql = _CON.execute(
        "SELECT len(regexp_extract_all(?, ?))", [t, pat]
    ).fetchone()[0]
    assert token_count_bpe(t) == sql


@SMALL
@given(_TEXT)
def test_fuzz_dedup_lines_equals_duckdb(t):
    from pii_detection_test_ray.functions.quality import dedup_lines

    sql = _CON.execute(
        """
        SELECT array_to_string(list_filter(lines,
          (l, i) -> trim(l, ' ' || chr(9) || chr(13) || chr(11) || chr(12)) = ''
                    OR list_position(lines, l) = i), chr(10)),
               len(lines) - len(list_filter(lines,
          (l, i) -> trim(l, ' ' || chr(9) || chr(13) || chr(11) || chr(12)) = ''
                    OR list_position(lines, l) = i))
        FROM (SELECT string_split(?, chr(10)) AS lines)
        """,
        [t],
    ).fetchone()
    got = dedup_lines(t)
    assert got == (sql[0], sql[1])
    # idempotence: a second pass removes nothing
    assert dedup_lines(got[0]) == (got[0], 0)


@SMALL
@given(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FFF
        ),
        max_size=24,
    ),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FFF
        ),
        max_size=24,
    ),
)
def test_levenshtein_matches_duckdb(a, b):
    """The engine's DP edit distance must agree with DuckDB's levenshtein
    on arbitrary unicode — the contract the fuzzy_supplier_pairs oracle
    pairing rests on. (NUL is excluded: DuckDB VARCHARs cannot carry it.)"""
    duckdb = pytest.importorskip("duckdb")

    from pii_detection_test_ray.stages.fuzzy import levenshtein

    a = a.replace("\x00", "")
    b = b.replace("\x00", "")
    con = duckdb.connect()
    got = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert levenshtein(a, b) == got
