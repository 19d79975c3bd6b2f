"""Generator invariants: determinism, extraction round-trip, planted-PII
recall on clean families (the F1 ≥ 0.99 gate vs independent labels)."""

from __future__ import annotations

from pii_detection_test_ray.functions.html_text import extract_text
from pii_detection_test_ray.functions.metrics import document_metrics
from pii_detection_test_ray.functions.normalize import normalize_expected
from pii_detection_test_ray.functions.pii_regex import detect_pii_values
from pii_detection_test_ray.sources.corpus import CorpusConfig, generate_corpus


def test_generator_deterministic():
    a_docs, a_labels = generate_corpus(CorpusConfig(n_docs=80))
    b_docs, b_labels = generate_corpus(CorpusConfig(n_docs=80))
    assert a_docs.equals(b_docs)
    assert a_labels.equals(b_labels)


def test_text_is_extracted_html():
    docs, _ = generate_corpus(CorpusConfig(n_docs=60))
    for row in docs.to_pylist():
        assert extract_text(row["html"]) == row["text"]


def test_planted_values_survive_extraction_verbatim():
    docs, labels = generate_corpus(CorpusConfig(n_docs=120))
    for drow, lrow in zip(docs.to_pylist(), labels.to_pylist()):
        for item in lrow["expected_pii"]:
            assert item["value"] in drow["text"]


def test_clean_family_f1_gate():
    """Detector recovers planted labels on clean families at F1 ≥ 0.99."""
    docs, labels = generate_corpus(CorpusConfig(n_docs=400))
    tp = fp = fn = 0
    for drow, lrow in zip(docs.to_pylist(), labels.to_pylist()):
        if not lrow["is_clean_family"]:
            continue
        m = document_metrics(
            normalize_expected(lrow["expected_pii"]), detect_pii_values(drow["text"])
        )
        tp += m["total_tp"]
        fp += m["total_fp"]
        fn += m["total_fn"]
    assert tp > 100
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    f1 = 2 * p * r / (p + r)
    assert f1 >= 0.99, (tp, fp, fn)


def test_corpus_composition():
    docs, labels = generate_corpus(CorpusConfig(n_docs=200))
    cats = [r["category"] for r in labels.to_pylist()]
    langs = {r["lang"] for r in docs.to_pylist()}
    assert "False Positive" in cats and "난독화" in cats and "근접중복" in cats
    assert "ko" in langs and "und" in langs and len(langs) >= 3


def test_giant_page_skew_tier():
    docs, _ = generate_corpus(CorpusConfig(n_docs=60, giant_every=20))
    sizes = [len(r["html"]) for r in docs.to_pylist()]
    assert max(sizes) > 20 * sorted(sizes)[len(sizes) // 2]
