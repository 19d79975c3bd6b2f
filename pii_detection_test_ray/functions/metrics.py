"""Per-document PII evaluation metrics and hybrid merge policies.

Scoring semantics mirror the reference harness (reference:
run_pii_evaluation.py:452-507): whitespace-stripped exact string-set
comparison per category; empty-vs-empty precision/recall conventions; a
document with TP=FP=FN=0 scores a perfect micro-F1 of 1.0. These run
row-wise inside ``map_batches`` so the wide rollups reduce plain integer
columns (tp/fp/fn) with ``groupby().aggregate(Sum(...))``.

Merge policies mirror the reference hybrid strategies (reference:
regex_pii_detector.py:323-331, run_hybrid_eval.py:98-111,
hybrid_analysis.py:330-506, hybrid_analysis_deep.py:140-201).
"""

from __future__ import annotations

from typing import Any, Callable

from .pii_regex import PII_CATEGORIES

PredDict = dict[str, "list[str] | None"]


def category_metrics(
    expected: PredDict, predicted: PredDict
) -> dict[str, dict[str, Any]]:
    """Per-category tp/fp/fn + P/R/F1 over stripped string sets."""
    per_cat: dict[str, dict[str, Any]] = {}
    for cat in PII_CATEGORIES:
        e_vals = expected.get(cat)
        p_vals = predicted.get(cat)
        e_set = {v.strip() for v in e_vals} if e_vals else set()
        p_set = {v.strip() for v in p_vals} if p_vals else set()
        tp = len(e_set & p_set)
        fp = len(p_set - e_set)
        fn = len(e_set - p_set)
        prec = tp / (tp + fp) if (tp + fp) > 0 else (1.0 if not e_set else 0.0)
        rec = tp / (tp + fn) if (tp + fn) > 0 else (1.0 if not p_set else 0.0)
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
        per_cat[cat] = {
            "tp": tp,
            "fp": fp,
            "fn": fn,
            "precision": round(prec, 4),
            "recall": round(rec, 4),
            "f1": round(f1, 4),
            "expected_count": len(e_set),
            "predicted_count": len(p_set),
            "category_detection_correct": bool(e_vals) == bool(p_vals),
            "missing": sorted(e_set - p_set) if e_set - p_set else [],
            "extra": sorted(p_set - e_set) if p_set - e_set else [],
        }
    return per_cat


def document_metrics(expected: PredDict, predicted: PredDict) -> dict[str, Any]:
    """Micro P/R/F1 over the 12 categories for one document."""
    per_cat = category_metrics(expected, predicted)
    tp = sum(c["tp"] for c in per_cat.values())
    fp = sum(c["fp"] for c in per_cat.values())
    fn = sum(c["fn"] for c in per_cat.values())
    if tp == 0 and fp == 0 and fn == 0:
        mp = mr = mf1 = 1.0
    else:
        mp = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        mr = tp / (tp + fn) if (tp + fn) > 0 else 0.0
        mf1 = 2 * mp * mr / (mp + mr) if (mp + mr) > 0 else 0.0
    return {
        "per_category": per_cat,
        "micro_precision": round(mp, 4),
        "micro_recall": round(mr, 4),
        "micro_f1": round(mf1, 4),
        "total_tp": tp,
        "total_fp": fp,
        "total_fn": fn,
    }


def prf1(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    """Rollup-level P/R/F1 with the reference's 0.0-on-empty convention
    (reference: run_pii_evaluation.py:529-533)."""
    p = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    r = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return p, r, f1


# ---------------------------------------------------------------------------
# Hybrid merge policies (classifier/LLM predictions × regex predictions).
# Each policy: (primary, secondary, category) -> merged list|None.
# ---------------------------------------------------------------------------

def _union(a: list[str] | None, b: list[str] | None) -> list[str] | None:
    combined = set(a or []) | set(b or [])
    return sorted(combined) if combined else None


def merge_union(primary: PredDict, secondary: PredDict) -> PredDict:
    """Full per-category union (reference: regex_pii_detector.py:323-331)."""
    return {cat: _union(primary.get(cat), secondary.get(cat)) for cat in PII_CATEGORIES}


def merge_primary_only(primary: PredDict, secondary: PredDict) -> PredDict:
    return {cat: primary.get(cat) for cat in PII_CATEGORIES}


def merge_backfill(primary: PredDict, secondary: PredDict) -> PredDict:
    """Secondary fills only categories the primary left empty (strategy B,
    reference: hybrid_analysis.py:352-362)."""
    out: PredDict = {}
    for cat in PII_CATEGORIES:
        vals = primary.get(cat)
        out[cat] = vals if vals else (sorted(set(secondary.get(cat) or [])) or None)
    return out


def merge_union_categories(
    primary: PredDict, secondary: PredDict, union_cats: frozenset[str]
) -> PredDict:
    """Union only on selected categories, primary elsewhere — the reference's
    best 'smart' strategy unions on 계좌번호 only (reference:
    hybrid_analysis_deep.py:334-361, run_hybrid_eval.py:105-111)."""
    out: PredDict = {}
    for cat in PII_CATEGORIES:
        if cat in union_cats:
            out[cat] = _union(primary.get(cat), secondary.get(cat))
        else:
            out[cat] = primary.get(cat)
    return out


def merge_cross_validated(primary: PredDict, secondary: PredDict) -> PredDict:
    """Keep secondary values only when space-stripped substring-related to
    some primary value (strategy D, reference: hybrid_analysis.py:414-439)."""
    out: PredDict = {}
    for cat in PII_CATEGORIES:
        p_vals = list(primary.get(cat) or [])
        extra = []
        p_stripped = [v.replace(" ", "") for v in p_vals]
        for sv in secondary.get(cat) or []:
            s_stripped = sv.replace(" ", "")
            if any(
                s_stripped in pv or pv in s_stripped for pv in p_stripped
            ) and sv not in p_vals:
                extra.append(sv)
        combined = set(p_vals) | set(extra)
        out[cat] = sorted(combined) if combined else None
    return out


def merge_secondary_only(primary: PredDict, secondary: PredDict) -> PredDict:
    """Pure secondary path (the reference's 'Regex Only' baseline row,
    hybrid_analysis.py:466) — also stage 1 of the learned strategies, which
    need the secondary's per-category precision."""
    return {cat: secondary.get(cat) for cat in PII_CATEGORIES}


# Reference strategy C's confidence tiers (hybrid_analysis.py:378-381).
STRONG_REGEX_CATS = frozenset(
    {"주민등록번호", "여권번호", "운전면허번호", "이메일", "계좌번호", "생년월일", "카드번호"}
)
WEAK_REGEX_CATS = frozenset({"이름", "주소", "기타_고유식별정보"})


def merge_tiered(primary: PredDict, secondary: PredDict) -> PredDict:
    """Strategy C (reference: hybrid_analysis.py:378-400): strong categories
    always union, weak categories primary-only, medium categories backfill
    (secondary only when the primary is empty)."""
    out: PredDict = {}
    for cat in PII_CATEGORIES:
        p_vals = primary.get(cat)
        if cat in STRONG_REGEX_CATS:
            out[cat] = _union(p_vals, secondary.get(cat))
        elif cat in WEAK_REGEX_CATS:
            out[cat] = p_vals
        else:
            out[cat] = p_vals if p_vals else (
                sorted(set(secondary.get(cat) or [])) or None
            )
    return out


def merge_strong_else_backfill(primary: PredDict, secondary: PredDict) -> PredDict:
    """Strategy E (reference: hybrid_analysis.py:489-501): strong categories
    union; everything else (weak AND medium) backfills when primary empty."""
    out: PredDict = {}
    for cat in PII_CATEGORIES:
        p_vals = primary.get(cat)
        if cat in STRONG_REGEX_CATS:
            out[cat] = _union(p_vals, secondary.get(cat))
        else:
            out[cat] = p_vals if p_vals else (
                sorted(set(secondary.get(cat) or [])) or None
            )
    return out


def merge_account_conditional(primary: PredDict, secondary: PredDict) -> PredDict:
    """Strategy G (reference: hybrid_analysis_deep.py:167-181): union on
    계좌번호, backfill on 주민등록번호/이메일, primary elsewhere."""
    union_cats = {"계좌번호"}
    conditional_cats = {"주민등록번호", "이메일"}
    out: PredDict = {}
    for cat in PII_CATEGORIES:
        p_vals = primary.get(cat)
        if cat in union_cats:
            out[cat] = _union(p_vals, secondary.get(cat))
        elif cat in conditional_cats:
            out[cat] = p_vals if p_vals else (
                sorted(set(secondary.get(cat) or [])) or None
            )
        else:
            out[cat] = p_vals
    return out


MERGE_POLICIES: dict[str, Callable[[PredDict, PredDict], PredDict]] = {
    "union": merge_union,
    "primary_only": merge_primary_only,
    "secondary_only": merge_secondary_only,
    "backfill": merge_backfill,
    "smart_account": lambda p, s: merge_union_categories(
        p, s, frozenset({"계좌번호"})
    ),
    "cross_validated": merge_cross_validated,
    "tiered": merge_tiered,
    "strong_else_backfill": merge_strong_else_backfill,
    "account_conditional": merge_account_conditional,
}
