"""Span-aware Korean PII detector (12 canonical categories).

Built from scratch for a Ray-Data-native pipeline: every rule is applied over
plain strings inside ``map_batches`` workers (patterns compiled once at module
import, shared per worker process), and — unlike the reference benchmark
harness, which only returns value strings — each accepted match also yields a
character span so the scrubber can redact in place.

Semantic parity: detection semantics (pattern families, exclusion filters,
context-window suppression, the first-occurrence positional quirk of the
service-number overlap filter, per-category insertion-ordered dedup) mirror
the reference detector (reference: regex_pii_detector.py:19-320) and are
verified byte-for-byte against it by tests/test_reference_parity.py. The
foreign-passport pattern present-but-never-applied in the reference
(regex_pii_detector.py:61) is intentionally NOT applied here either.
"""

from __future__ import annotations

import re
from typing import NamedTuple

# The 12 canonical categories, in canonical order (reference:
# run_pii_evaluation.py:62-65). Order matters: it is both the output-schema
# order and the scrub priority order.
PII_CATEGORIES: tuple[str, ...] = (
    "이름",
    "주소",
    "주민등록번호",
    "여권번호",
    "운전면허번호",
    "이메일",
    "IP주소",
    "전화번호",
    "계좌번호",
    "카드번호",
    "생년월일",
    "기타_고유식별정보",
)

# ASCII-safe aliases for Parquet column names / redaction tokens.
CATEGORY_SLUGS: dict[str, str] = {
    "이름": "name",
    "주소": "address",
    "주민등록번호": "rrn",
    "여권번호": "passport",
    "운전면허번호": "driver_license",
    "이메일": "email",
    "IP주소": "ip",
    "전화번호": "phone",
    "계좌번호": "account",
    "카드번호": "card",
    "생년월일": "dob",
    "기타_고유식별정보": "other_id",
}
SLUG_TO_CATEGORY = {v: k for k, v in CATEGORY_SLUGS.items()}


class PiiSpan(NamedTuple):
    """One accepted match occurrence: [start, end) in the source text."""

    start: int
    end: int
    category: str
    value: str


# ---------------------------------------------------------------------------
# Rule table. Pattern semantics mirror reference regex_pii_detector.py:19-174.
# ---------------------------------------------------------------------------

_ROLE_LABELS = (
    r"(?:성명|이름|담당자|신청자|승인자|수신|참조|발신|위임인|수임인|추천인|피추천인|"
    r"환자\s*성명|참석자|퇴직자|수상자|청구인|피보험자|연구책임자|대표자|작성자|"
    r"계약자|수익자|위탁자|수탁자|보증인|연대보증인|진술인|입회인|면접관|보호자|"
    r"담임교사|멘토|피면접자|감사담당자|회원명|입찰담당|대리업무자|피청구인|"
    r"원고|피고|채권자|채무자|임차인|임대인|수하인|송하인|위탁자|수탁자)"
)

_ADMIN_PREFIX = (
    r"(?:[가-힣]{1,10}(?:특별시|광역시|특별자치시|도|특별자치도)\s+)?"
    r"[가-힣]{1,10}(?:시|군|구)\s+"
    r"(?:[가-힣]{1,10}(?:구|군)\s+)?"
)

_ACCOUNT_DIGITS = r"(\d{2,6}[-\s]?\d{2,8}[-\s]?\d{2,8}(?:[-\s]?\d{1,4})?)"

RX = {
    "name_labeled": re.compile(
        rf"{_ROLE_LABELS}\s*[:：]\s*([가-힣]{{2,5}})", re.UNICODE
    ),
    "addr_road": re.compile(
        _ADMIN_PREFIX
        + r"[가-힣\d]{1,20}(?:로|길)\s*\d+"
        + r"(?:\s*[-,]\s*\d+)?"
        + r"(?:\s*\([가-힣\d\s,]+\))?"
        + r"(?:\s*\d{1,4}동?\s*\d{1,4}호)?",
        re.UNICODE,
    ),
    "addr_lot": re.compile(
        _ADMIN_PREFIX
        + r"[가-힣]{1,10}(?:읍|면|동|리|가)\s+"
        + r"(?:\d+(?:[-의]\d+)?(?:번지)?)",
        re.UNICODE,
    ),
    "rrn_dashed": re.compile(
        r"\b(\d{6})\s*[-–—]\s*([1-8*]\d{6}|\d[*]{5,6}|\*{6,7})\b"
    ),
    "rrn_continuous": re.compile(r"\b(\d{6}[1-8]\d{6})\b"),
    "passport_kr": re.compile(r"\b[MmSs]\d{8}\b"),
    "driver_license": re.compile(
        r"\b\d{2}\s*[-–]\s*\d{2}\s*[-–]\s*\d{6}\s*[-–]\s*\d{2}\b"
    ),
    "email_std": re.compile(
        r"[a-zA-Z0-9._%+\-]+\s*[@＠]\s*[a-zA-Z0-9.\-]+\.\s*[a-zA-Z]{2,}", re.UNICODE
    ),
    "email_obfuscated": re.compile(
        r"[a-zA-Z0-9._%+\-]+\s*(?:\[at\]|\(at\)|골뱅이|\{at\})\s*"
        r"[a-zA-Z0-9.\-]+\s*(?:\[dot\]|\(dot\)|\.)\s*[a-zA-Z]{2,}",
        re.IGNORECASE,
    ),
    "email_masked": re.compile(r"[a-zA-Z][*]{2,}@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"),
    "ipv4": re.compile(r"\b(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})(?::(\d{1,5}))?\b"),
    "ipv6": re.compile(
        r"\b(?:[0-9a-fA-F]{1,4}:){2,7}[0-9a-fA-F]{1,4}\b"
        r"|(?:[0-9a-fA-F]{1,4}:){1,6}::[0-9a-fA-F]{0,4}\b"
    ),
    "phone_mobile": re.compile(r"\b01[016789]\s*[-.)]\s*\d{3,4}\s*[-.)]\s*\d{4}\b"),
    "phone_landline": re.compile(
        r"\b0(?:2|3[1-3]|4[1-4]|5[1-5]|6[1-4])\s*[-.)]\s*\d{3,4}\s*[-.)]\s*\d{4}\b"
    ),
    "phone_intl": re.compile(
        r"\+\d{1,3}\s*[-.)]\s*\d{1,4}\s*[-.)]\s*\d{3,4}\s*[-.)]\s*\d{3,4}"
    ),
    "phone_continuous": re.compile(r"\b01[016789]\d{7,8}\b"),
    "phone_masked": re.compile(
        r"\b01[016789]\s*[-.)]\s*\d{0,2}[*]{2,4}\s*[-.)]\s*\d{0,2}[*]{2,4}\b"
    ),
    "service_number": re.compile(r"\b(?:15\d{2}|16\d{2}|18\d{2})\s*[-.]?\s*\d{4}\b"),
    "toll_free": re.compile(r"\b080\s*[-.]?\s*\d{3,4}\s*[-.]?\s*\d{4}\b"),
    "account_labeled": re.compile(
        r"(?:계좌|가상계좌|입금계좌|출금계좌|환불계좌)\s*(?:번호)?\s*[:：]?\s*"
        + _ACCOUNT_DIGITS,
        re.UNICODE,
    ),
    "account_bank": re.compile(
        r"(?:국민|신한|우리|하나|농협|기업|SC|씨티|대구|부산|경남|광주|전북|제주|수협|"
        r"새마을|신협|우체국|카카오|토스|케이)\s*(?:은행)?\s*" + _ACCOUNT_DIGITS,
        re.UNICODE,
    ),
    "card_grouped": re.compile(
        r"\b\d{4}\s*[-\s]\s*\d{4}\s*[-\s]\s*\d{4}\s*[-\s]\s*\d{4}\b"
    ),
    "card_masked": re.compile(
        r"\b\d{4}\s*[-\s]\s*\d{2}[*]{2}\s*[-\s]\s*[*]{4}\s*[-\s]\s*\d{4}\b"
    ),
    "btc": re.compile(r"\b[13][a-km-zA-HJ-NP-Z1-9]{25,34}\b"),
    "eth": re.compile(r"\b0x[0-9a-fA-F]{40}\b"),
    "dob_labeled": re.compile(
        r"(?:생년월일|출생일?|생일|DOB|Date\s*of\s*Birth|born)\s*[:：]?\s*"
        r"(\d{4}[-./년\s]\s*\d{1,2}[-./월\s]\s*\d{1,2}일?|\d{6})",
        re.IGNORECASE | re.UNICODE,
    ),
    "student_id": re.compile(r"(?:학번)\s*[:：]?\s*(\d{4}[-]?\d{4,6})"),
    "vehicle_plate": re.compile(r"\b\d{2,3}\s*[가-힣]\s*\d{4}\b"),
    "military_id": re.compile(r"(?:군번)\s*[:：]?\s*(\d{2}[-]?\d{8,})"),
    "employee_id": re.compile(r"(?:사번)\s*[:：]?\s*(\d{4}[-]?\d{4,6})"),
    "doorlock": re.compile(r"(?:비밀번호|현관|도어락)\s*[:：]?\s*([#*]?\d{4,8}[#*]?)"),
}

_EMAIL_DOMAIN_BLOCKLIST = ("example.com", "test.com", "noreply", "no-reply")
_EMAIL_ROLE_PREFIX = re.compile(r"^(?:info|support|contact|admin|webmaster|help)@")

_IP_BLOCKLIST = frozenset(
    {
        "127.0.0.1",
        "0.0.0.0",
        "255.255.255.255",
        "8.8.8.8",
        "8.8.4.4",
        "1.1.1.1",
        "1.0.0.1",
        "208.67.222.222",
        "208.67.220.220",
        "9.9.9.9",
    }
)
_NETWORK_CONTEXT_MARKERS = ("/", "대역", "서브넷", "설계", "할당")


def _is_private_ipv4(octets: list[str]) -> bool:
    return (
        octets[0] == "10"
        or (octets[0] == "172" and 16 <= int(octets[1]) <= 31)
        or (octets[0] == "192" and octets[1] == "168")
    )


class _Collector:
    """Accumulates accepted matches, preserving the reference's dedup
    semantics (strip, drop empties, per-category insertion-ordered value
    dedup — reference: regex_pii_detector.py:186-193) while also keeping
    every accepted occurrence's span for scrubbing."""

    __slots__ = ("values", "spans")

    def __init__(self) -> None:
        self.values: dict[str, list[str] | None] = {c: None for c in PII_CATEGORIES}
        self.spans: list[PiiSpan] = []

    def take(self, category: str, value: str, start: int, end: int) -> None:
        value = value.strip()
        if not value:
            return
        bucket = self.values[category]
        if bucket is None:
            bucket = self.values[category] = []
        if value not in bucket:
            bucket.append(value)
        self.spans.append(PiiSpan(start, end, category, value))


def detect_pii(text: str) -> tuple[dict[str, list[str] | None], list[PiiSpan]]:
    """Detect PII in ``text``.

    Returns ``(values, spans)`` where ``values`` maps each of the 12
    categories to an insertion-ordered list of unique detected strings (or
    ``None``) — byte-identical to the reference detector's output — and
    ``spans`` lists every accepted match occurrence for the scrubber.
    """
    text = text or ""  # null text behaves as empty (repo-wide invariant)
    out = _Collector()

    # Anchor pre-guards: each skipped pattern literally requires the guard
    # substring (a necessary condition), so skipping cannot change output —
    # it only avoids a full regex scan on documents that cannot match.
    # Byte-identity vs the reference is pinned by tests/test_reference_parity.
    has_colon = ":" in text or "：" in text

    # -- 이름: label-anchored capture only ---------------------------------
    if has_colon:  # pattern requires [:：]
        for m in RX["name_labeled"].finditer(text):
            out.take("이름", m.group(1), *m.span(1))

    # -- 주소: road then lot form ------------------------------------------
    for key in ("addr_road", "addr_lot"):
        for m in RX[key].finditer(text):
            out.take("주소", m.group(0), *m.span())

    # -- 주민등록번호: dashed (value reformatted to g1-g2), then 13-digit --
    for m in RX["rrn_dashed"].finditer(text):
        out.take("주민등록번호", f"{m.group(1)}-{m.group(2)}", *m.span())
    for m in RX["rrn_continuous"].finditer(text):
        out.take("주민등록번호", m.group(1), *m.span())

    # -- 여권번호: KR form only (foreign form is dead code in reference) ---
    for m in RX["passport_kr"].finditer(text):
        out.take("여권번호", m.group(0), *m.span())

    # -- 운전면허번호 ------------------------------------------------------
    for m in RX["driver_license"].finditer(text):
        out.take("운전면허번호", m.group(0), *m.span())

    # -- 이메일: standard (with role/test exclusions), obfuscated, masked --
    # (pattern order preserved: the per-category value list dedups in
    # insertion order, so guards may only skip, never reorder)
    has_at = "@" in text or "＠" in text
    if has_at:  # email_std requires a (full-width) @
        for m in RX["email_std"].finditer(text):
            email = m.group(0).strip()
            lower = email.lower()
            if any(bad in lower for bad in _EMAIL_DOMAIN_BLOCKLIST):
                continue
            if _EMAIL_ROLE_PREFIX.match(lower):
                continue
            out.take("이메일", email, *m.span())
    # obfuscated @: requires one of "[at]"/"(at)"/"{at}" (any case) or 골뱅이
    if "[" in text or "(" in text or "{" in text or "골뱅이" in text:
        for m in RX["email_obfuscated"].finditer(text):
            out.take("이메일", m.group(0).strip(), *m.span())
    if has_at:  # email_masked requires a plain @
        for m in RX["email_masked"].finditer(text):
            out.take("이메일", m.group(0).strip(), *m.span())

    # -- IP주소: v4 with blocklist + private-range context suppression -----
    for m in RX["ipv4"].finditer(text):
        ip, port = m.group(1), m.group(2)
        if ip in _IP_BLOCKLIST:
            continue
        octets = ip.split(".")
        if _is_private_ipv4(octets):
            # Suppress private IPs that sit in network-design prose: an
            # 80-before / 20-after context window around the match.
            idx = m.start()
            window = text[max(0, idx - 80) : idx + len(m.group(0)) + 20]
            if any(marker in window for marker in _NETWORK_CONTEXT_MARKERS):
                continue
        out.take("IP주소", f"{ip}:{port}" if port else ip, *m.span())
    if ":" in text:  # every ipv6 alternative contains a colon
        for m in RX["ipv6"].finditer(text):
            if m.group(0) == "::1":
                continue
            out.take("IP주소", m.group(0), *m.span())

    # -- 전화번호: five pattern families, then service-number filtering ----
    phone_hits: list[tuple[str, int, int]] = []
    for key in (
        "phone_mobile",
        "phone_landline",
        "phone_intl",
        "phone_continuous",
        "phone_masked",
    ):
        for m in RX[key].finditer(text):
            phone_hits.append((m.group(0), m.start(), m.end()))

    blocked_spans: list[tuple[int, int]] = []
    for key in ("service_number", "toll_free"):
        for m in RX[key].finditer(text):
            blocked_spans.append((m.start(), m.end()))

    for phone, mstart, mend in phone_hits:
        # NOTE positional quirk preserved from the reference
        # (regex_pii_detector.py:277-286): the overlap test uses the FIRST
        # occurrence index of the phone string, not this match's own span,
        # so repeated identical strings are all judged by the first index.
        idx = text.find(phone)
        overlaps_service = any(
            s <= idx < e or s < idx + len(phone) <= e for s, e in blocked_spans
        )
        if not overlaps_service:
            out.take("전화번호", phone, mstart, mend)

    # -- 계좌번호: label-anchored then bank-name-anchored ------------------
    for key in ("account_labeled", "account_bank"):
        for m in RX[key].finditer(text):
            out.take("계좌번호", m.group(1), *m.span(1))

    # -- 카드번호: grouped, masked, and crypto addresses (BTC/ETH filed
    #    under card per the reference normalization convention) ------------
    for key in ("card_grouped", "card_masked", "btc"):
        for m in RX[key].finditer(text):
            out.take("카드번호", m.group(0), *m.span())
    if "0x" in text:  # eth requires the literal 0x prefix (case-sensitive)
        for m in RX["eth"].finditer(text):
            out.take("카드번호", m.group(0), *m.span())

    # -- 생년월일: label-anchored capture ----------------------------------
    for m in RX["dob_labeled"].finditer(text):
        out.take("생년월일", m.group(1), *m.span(1))

    # -- 기타_고유식별정보: the 5 allowed subtypes -------------------------
    for key, use_group1 in (
        ("student_id", True),
        ("vehicle_plate", False),
        ("military_id", True),
        ("employee_id", True),
        ("doorlock", True),
    ):
        for m in RX[key].finditer(text):
            if use_group1:
                out.take("기타_고유식별정보", m.group(1), *m.span(1))
            else:
                out.take("기타_고유식별정보", m.group(0), *m.span())

    return out.values, out.spans


def detect_pii_values(text: str) -> dict[str, list[str] | None]:
    """Value-only view, drop-in-compatible with the reference detector."""
    return detect_pii(text)[0]


def merge_spans(spans: list[PiiSpan]) -> list[PiiSpan]:
    """Resolve overlapping spans deterministically: sort by (start, -length,
    category-priority); a span fully or partially covered by an earlier
    accepted span is merged into it (the earlier span's category wins)."""
    prio = {c: i for i, c in enumerate(PII_CATEGORIES)}
    ordered = sorted(spans, key=lambda s: (s.start, -(s.end - s.start), prio[s.category]))
    merged: list[PiiSpan] = []
    for s in ordered:
        if merged and s.start < merged[-1].end:
            last = merged[-1]
            if s.end > last.end:
                merged[-1] = PiiSpan(last.start, s.end, last.category, last.value)
            continue
        merged.append(s)
    return merged


def scrub_text(text: str, spans: list[PiiSpan]) -> str:
    """Redact every accepted span as ``[<CATEGORY-SLUG>]``, right-to-left so
    earlier offsets stay valid. Overlaps are merged first (deterministic)."""
    if not spans:
        return text
    pieces: list[str] = []
    cursor = 0
    for s in merge_spans(spans):
        pieces.append(text[cursor : s.start])
        pieces.append(f"[{CATEGORY_SLUGS[s.category].upper()}]")
        cursor = s.end
    pieces.append(text[cursor:])
    return "".join(pieces)


def detect_and_scrub(text: str) -> tuple[dict[str, list[str] | None], str, int]:
    """One-pass convenience: returns (values, scrubbed_text, n_spans)."""
    text = text or ""  # null text behaves as empty (repo-wide invariant)
    values, spans = detect_pii(text)
    return values, scrub_text(text, spans), len(spans)
