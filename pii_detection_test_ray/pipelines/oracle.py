"""Single-process oracle: the authoritative per-document semantics.

Runs the whole quality-filter + PII-scrub computation for one document with
no Ray involved. The distributed pipeline (pipelines/quality_filter.py) must
reproduce this exactly, document for document — that is the golden
end-to-end test (F1 ≥ 0.99 gate; in practice exact equality). Mirrors the
reference harness's role of a trusted scorer (reference:
run_pii_evaluation.py:452-507, regex_pii_detector.py:334-406).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from ..functions.html_text import extract_text
from ..functions.langmodels import (
    CharNgramLangID,
    CharTrigramLM,
    build_default_ppl_model,
)
from ..functions.pii_regex import CATEGORY_SLUGS, PII_CATEGORIES, detect_pii, scrub_text
from ..functions.quality import (
    QualityConfig,
    heuristic_reasons,
    model_reasons,
    quality_features,
)


@dataclass
class _Models:
    langid: CharNgramLangID
    ppl: CharTrigramLM


_MODELS: _Models | None = None


def _models() -> _Models:
    global _MODELS
    if _MODELS is None:
        _MODELS = _Models(langid=CharNgramLangID(), ppl=build_default_ppl_model())
    return _MODELS


def process_document(
    html: bytes | None,
    text: str | None = None,
    cfg: QualityConfig | None = None,
) -> dict[str, Any]:
    """Full per-document result. If ``html`` is given, ``text`` is recomputed
    from it (the extraction invariant); otherwise ``text`` is used as-is."""
    cfg = cfg or QualityConfig()
    if html is not None:
        text = extract_text(html)
    assert text is not None

    m = _models()
    lang, lang_conf = m.langid.classify(text)
    log_ppl = m.ppl.log_perplexity(text)
    # Gate on the same 6-dp-rounded scores the pipeline stages emit
    # (stages/langid.py, stages/perplexity.py) — a score within 5e-7 of a
    # threshold must decide identically in both paths.
    lang_conf = round(lang_conf, 6)
    log_ppl = round(log_ppl, 6)

    feats = quality_features(text)
    reasons = heuristic_reasons(feats, cfg) + model_reasons(
        lang_conf, log_ppl, cfg, pred_lang=lang
    )
    keep = not reasons

    from ..functions.toxicity import scrub_toxicity

    values, spans = detect_pii(text)
    scrubbed, n_toxic = scrub_toxicity(scrub_text(text, spans))

    row: dict[str, Any] = {
        "text": text,
        "pred_lang": lang,
        "lang_confidence": round(lang_conf, 6),
        "log_perplexity": round(log_ppl, 6),
        "keep": keep,
        "drop_reasons": reasons,
        "scrubbed_text": scrubbed,
        "n_pii_spans": len(spans),
        "n_toxic_spans": n_toxic,
    }
    row.update(feats)
    for cat in PII_CATEGORIES:
        row[f"pii_{CATEGORY_SLUGS[cat]}"] = values[cat]
    return row
