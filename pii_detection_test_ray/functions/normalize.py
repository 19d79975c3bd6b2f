"""Label-type normalization: fold fine-grained PII subtype labels into the 12
canonical categories.

Semantics mirror the reference's normalization map and ``normalize_expected``
(reference: run_pii_evaluation.py:42-60 and :436-445): unknown subtypes fold
to 기타_고유식별정보; per-category expected values are de-duplicated via
``sorted(set(...))``; categories absent from the labels are ``None``.
"""

from __future__ import annotations

from .pii_regex import PII_CATEGORIES

SUBTYPE_TO_CANONICAL: dict[str, str] = {
    "이름": "이름",
    "이름(부분마스킹)": "이름",
    "주소": "주소",
    "주소(부분)": "주소",
    "주민등록번호": "주민등록번호",
    "주민등록번호(마스킹)": "주민등록번호",
    "주민등록번호(앞자리)": "주민등록번호",
    "주민등록번호(OCR오류)": "주민등록번호",
    "외국인등록번호": "주민등록번호",
    "여권번호": "여권번호",
    "운전면허번호": "운전면허번호",
    "이메일": "이메일",
    "이메일(난독화)": "이메일",
    "이메일(마스킹)": "이메일",
    "IP주소": "IP주소",
    "IP주소(IPv6)": "IP주소",
    "IP주소(사설)": "IP주소",
    "IP주소(공인)": "IP주소",
    "IP주소:포트": "IP주소",
    "IP주소(CIDR)": "IP주소",
    "전화번호": "전화번호",
    "전화번호(부분마스킹)": "전화번호",
    "계좌번호": "계좌번호",
    "계좌번호(부분마스킹)": "계좌번호",
    "가상계좌번호": "계좌번호",
    "IBAN": "계좌번호",
    "카드번호": "카드번호",
    "카드번호(부분마스킹)": "카드번호",
    "카드번호(부분)": "카드번호",
    "암호화폐지갑주소(BTC)": "카드번호",
    "암호화폐지갑주소(ETH)": "카드번호",
    "생년월일": "생년월일",
    "학번": "기타_고유식별정보",
    "차량번호": "기타_고유식별정보",
}

FALLBACK_CATEGORY = "기타_고유식별정보"


def normalize_expected(expected_pii: list[dict]) -> dict[str, list[str] | None]:
    """``[{type, value}, ...]`` golden labels → canonical 12-key dict."""
    buckets: dict[str, list[str]] = {}
    for item in expected_pii:
        canon = SUBTYPE_TO_CANONICAL.get(item["type"], FALLBACK_CATEGORY)
        buckets.setdefault(canon, []).append(item["value"])
    return {
        cat: (sorted(set(buckets[cat])) if cat in buckets else None)
        for cat in PII_CATEGORIES
    }
