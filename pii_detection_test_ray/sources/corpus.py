"""Deterministic synthetic web-corpus generator (the ``input_hint`` table).

Produces Common-Crawl-style Parquet pages ``(url, warc_ts, html, text, lang)``
plus a golden ``labels`` table, at any scale, fully seeded — no external data.
Document families mirror the reference benchmark corpus composition
(reference: pii_test_cases.py:22-30, README.md:166-186): label-anchored
names, road/lot addresses, RRNs (incl. masked), passports, driver licenses,
emails (incl. obfuscated/masked/excluded), IPs (incl. excluded/private),
phones (incl. service-number negatives), accounts, cards + crypto, DOBs,
other-IDs, composite documents, false-positive documents, and HARD
obfuscation documents (spacing/OCR/full-width tricks) — plus, beyond the
reference, near-duplicate clusters, non-Korean filler pages and symbol-soup
garbage pages to exercise dedup and the quality gate.

``text`` is *defined* as ``extract_text(html)`` — computed here once — so the
pipeline's extraction stage can be verified byte-identical per url.
"""

from __future__ import annotations

import html as _htmllib
import random
from dataclasses import dataclass
from datetime import datetime, timedelta

import pyarrow as pa

from ..functions.html_text import extract_text
from ..functions.langmodels import SEED_TEXTS

_SURNAMES = "김 이 박 최 정 강 조 윤 장 임 한 오 서 신 권 황 안 송 류 전".split()
_GIVEN = "민준 서연 도윤 지우 하은 시우 수아 예준 지호 채원 준서 유나 건우 서현 현우 지민 은우 다은 선우 소율".split()
_ROLES = "성명 담당자 신청자 계약자 작성자 대표자 청구인 보호자".split()
_DOMAINS = "gmail.com naver.com hanmail.net kakao.com daum.net".split()
_BANKS = "국민 신한 우리 하나 농협 카카오".split()
_CITIES = [
    ("서울특별시", "강남구", "테헤란로"),
    ("부산광역시", "해운대구", "센텀중앙로"),
    ("대구광역시", "수성구", "동대구로"),
    ("경기도", "성남시", "판교로"),
    ("인천광역시", "연수구", "송도과학로"),
]
_DONGS = ["역삼동", "우동", "범어동", "백현동", "송도동"]

_FILLER_KO = [
    "오늘 회의에서는 분기 실적과 향후 계획을 논의했습니다.",
    "자세한 내용은 첨부된 문서를 참고하시기 바랍니다.",
    "문의 사항이 있으시면 언제든지 연락 주시기 바랍니다.",
    "아래와 같이 안내드리오니 업무에 참고하시기 바랍니다.",
    "본 문서는 내부 검토용으로 작성되었습니다.",
]


# Bump when generated content changes so path-keyed caches invalidate.
CORPUS_VERSION = 2


@dataclass(frozen=True)
class CorpusConfig:
    n_docs: int = 360
    seed: int = 42
    with_labels: bool = True
    # Fractions of the corpus given to non-PII page types.
    foreign_fraction: float = 0.15
    garbage_fraction: float = 0.06
    near_dup_fraction: float = 0.10
    # Every k-th page is a "giant" page (skew tail); 0 disables.
    giant_every: int = 0


def _name(rng: random.Random) -> str:
    return rng.choice(_SURNAMES) + rng.choice(_GIVEN)


def _phone(rng: random.Random) -> str:
    return f"010-{rng.randint(2000, 9999)}-{rng.randint(1000, 9999)}"


def _email(rng: random.Random) -> str:
    user = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(7))
    return f"{user}{rng.randint(1, 99)}@{rng.choice(_DOMAINS)}"


def _rrn(rng: random.Random) -> str:
    yy, mm, dd = rng.randint(55, 99), rng.randint(1, 12), rng.randint(1, 28)
    return f"{yy:02d}{mm:02d}{dd:02d}-{rng.randint(1, 4)}{rng.randint(100000, 999999)}"


def _account(rng: random.Random) -> str:
    return f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(100000, 999999)}"


def _card(rng: random.Random) -> str:
    return "-".join(str(rng.randint(1000, 9999)) for _ in range(4))


def _road_addr(rng: random.Random) -> str:
    city, gu, road = rng.choice(_CITIES)
    return f"{city} {gu} {road} {rng.randint(1, 400)}"


def _lot_addr(rng: random.Random) -> str:
    city, gu, _ = rng.choice(_CITIES)
    dong = rng.choice(_DONGS)
    return f"{city} {gu} {dong} {rng.randint(1, 900)}-{rng.randint(1, 99)}"


def _fill(rng: random.Random, n: int = 2) -> str:
    return "\n".join(rng.choice(_FILLER_KO) for _ in range(n))


# Each builder: rng -> (doc_text, [(subtype, value), ...], category, difficulty)
def _doc_name(rng):
    nm, role = _name(rng), rng.choice(_ROLES)
    text = f"인사 발령 안내\n\n{role}: {nm}\n소속: 경영지원팀\n직위: 과장\n\n{_fill(rng)}"
    return text, [("이름", nm)], "이름", "EASY"


_RARE_SURNAMES = "판 편 탁 빈 옹".split()
_RARE_GIVEN = "솔비 봄결 별림 솔잎 봄솔".split()


def _doc_name_rare(rng):
    """A REAL but statistically rare name: the label-anchored regex detects
    it, while the common-name classifier scores it below threshold — the
    disambiguation/rescue case the hybrid merge strategies exist for
    (reference: hybrid_analysis.py:330-506). primary_only therefore loses
    these to FNs and union/backfill recover them, so the merge-policy
    comparison is non-vacuous on this corpus."""
    nm = rng.choice(_RARE_SURNAMES) + rng.choice(_RARE_GIVEN)
    role = rng.choice(_ROLES)
    text = f"신규 입사자 안내\n\n{role}: {nm}\n부서: 연구개발팀\n\n{_fill(rng)}"
    return text, [("이름", nm)], "이름", "MEDIUM"


def _doc_address(rng):
    if rng.random() < 0.5:
        addr = _road_addr(rng)
    else:
        addr = _lot_addr(rng)
    text = f"배송 안내문\n\n배송지 주소는 {addr} 입니다.\n\n{_fill(rng)}"
    return text, [("주소", addr)], "주소", "EASY"


def _doc_rrn(rng):
    rrn = _rrn(rng)
    nm = _name(rng)
    text = f"보험 청구서\n\n청구인: {nm}\n주민등록번호: {rrn}\n\n{_fill(rng)}"
    return text, [("이름", nm), ("주민등록번호", rrn)], "주민등록번호", "EASY"


def _doc_rrn_masked(rng):
    head = f"{rng.randint(55, 99):02d}{rng.randint(1, 12):02d}{rng.randint(1, 28):02d}"
    masked = f"{head}-{rng.randint(1, 4)}******"
    text = f"본인확인 결과\n\n식별번호 {masked}로 본인 확인이 완료되었습니다.\n\n{_fill(rng)}"
    return text, [("주민등록번호(마스킹)", masked)], "주민등록번호", "MEDIUM"


def _doc_passport(rng):
    pp = f"{rng.choice('MS')}{rng.randint(10000000, 99999999)}"
    text = f"출입국 기록 확인서\n\n여권번호 {pp} 소지자의 기록입니다.\n\n{_fill(rng)}"
    return text, [("여권번호", pp)], "여권번호", "EASY"


def _doc_driver(rng):
    dl = f"{rng.randint(11, 28)}-{rng.randint(10, 99)}-{rng.randint(100000, 999999)}-{rng.randint(10, 99)}"
    text = f"운전면허 갱신 안내\n\n면허번호: {dl}\n갱신 기간 내 방문하시기 바랍니다.\n\n{_fill(rng)}"
    return text, [("운전면허번호", dl)], "운전면허번호", "EASY"


def _doc_email(rng):
    em = _email(rng)
    text = f"계정 등록 완료\n\n등록된 이메일: {em}\n\n{_fill(rng)}"
    return text, [("이메일", em)], "이메일", "EASY"


def _doc_email_obfuscated(rng):
    user = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
    dom = rng.choice(_DOMAINS).rsplit(".", 1)
    em = f"{user} [at] {dom[0]} [dot] {dom[1]}"
    text = f"스팸 방지 안내\n\n연락은 {em} 으로 부탁드립니다.\n\n{_fill(rng)}"
    return text, [("이메일(난독화)", em)], "이메일", "HARD"


def _doc_ip(rng):
    ip = f"{rng.randint(20, 220)}.{rng.randint(0, 255)}.{rng.randint(0, 255)}.{rng.randint(1, 254)}"
    if rng.random() < 0.3:
        ip = f"{ip}:{rng.choice([8080, 443, 3306, 22])}"
    text = f"보안 접속 로그\n\n의심 접속 IP {ip} 에서 로그인 시도가 있었습니다.\n\n{_fill(rng)}"
    return text, [("IP주소", ip)], "IP주소", "EASY"


def _doc_phone(rng):
    ph = _phone(rng)
    nm = _name(rng)
    text = f"상담 예약 확인\n\n신청자: {nm}\n연락처: {ph}\n\n{_fill(rng)}"
    return text, [("이름", nm), ("전화번호", ph)], "전화번호", "EASY"


def _doc_account(rng):
    acct, bank = _account(rng), rng.choice(_BANKS)
    text = f"환불 처리 안내\n\n환불계좌: {bank}은행 {acct}\n영업일 3일 내 입금됩니다.\n\n{_fill(rng)}"
    return text, [("계좌번호", acct)], "계좌번호", "EASY"


def _doc_card(rng):
    card = _card(rng)
    text = f"결제 내역 확인\n\n결제 카드: {card}\n승인 금액: {rng.randint(10, 99)},000원\n\n{_fill(rng)}"
    return text, [("카드번호", card)], "카드번호", "EASY"


def _doc_dob(rng):
    dob = f"{rng.randint(1960, 2005)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    text = f"회원 정보 확인\n\n생년월일: {dob}\n등급: 일반\n\n{_fill(rng)}"
    return text, [("생년월일", dob)], "생년월일", "EASY"


def _doc_other_id(rng):
    plate = f"{rng.randint(10, 99)}{rng.choice('가나다라마바사아')}{rng.randint(1000, 9999)}"
    text = f"주차 위반 통지\n\n차량번호 {plate} 차량은 견인 대상입니다.\n\n{_fill(rng)}"
    return text, [("차량번호", plate)], "기타_고유식별정보", "EASY"


def _doc_composite(rng):
    nm, ph, em = _name(rng), _phone(rng), _email(rng)
    addr = _road_addr(rng)
    dob = f"{rng.randint(1960, 2000)}.{rng.randint(1, 12):02d}.{rng.randint(1, 28):02d}"
    text = (
        f"입사 지원서\n\n성명: {nm}\n생년월일: {dob}\n연락처: {ph}\n"
        f"이메일: {em}\n주소: {addr}\n\n경력 사항은 별첨과 같습니다."
    )
    return (
        text,
        [("이름", nm), ("생년월일", dob), ("전화번호", ph), ("이메일", em), ("주소", addr)],
        "복합",
        "MEDIUM",
    )


def _doc_false_positive(rng):
    kind = rng.randrange(6)
    if kind == 0:
        text = (
            f"견적서\n\n품목 A: {rng.randint(1, 9)},{rng.randint(100, 999)},000원\n"
            f"품목 B: {rng.randint(100, 999)},000원\n합계는 부가세 별도입니다."
        )
    elif kind == 1:
        text = (
            f"사업자 정보\n\n사업자등록번호: {rng.randint(100, 999)}-{rng.randint(10, 99)}"
            f"-{rng.randint(10000, 99999)}\n업태: 도소매업\n법인 문의는 대표번호 "
            f"1588-{rng.randint(1000, 9999)} 로 부탁드립니다."
        )
    elif kind == 2:
        text = (
            "시스템 점검 공지\n\n점검 대상: 로컬호스트 127.0.0.1 및 DNS 8.8.8.8\n"
            "점검 중 서비스 이용이 제한됩니다.\n고객센터: 080-"
            f"{rng.randint(100, 999)}-{rng.randint(1000, 9999)}"
        )
    elif kind == 3:
        text = (
            f"네트워크 설계 문서\n\n사내 서브넷은 192.168.{rng.randint(0, 99)}.0/24 "
            f"대역으로 할당한다.\n게이트웨이는 192.168.{rng.randint(0, 99)}.1 로 설계한다."
        )
    elif kind == 4:
        text = (
            f"민원 회신\n\n귀하의 문의(접수번호 제{rng.randint(2010, 2024)}-{rng.randint(100, 999)}호)는\n"
            f"관련 법률 제{rng.randint(2, 60)}조 제{rng.randint(1, 4)}항에 따라 처리되었습니다.\n"
            "테스트 계정 test@example.com 및 안내 메일 info@company.co.kr 로는 회신되지 않습니다."
        )
    else:
        text = (
            f"세미나 안내\n\n세종대왕과 이순신 장군의 리더십을 다루는 강연입니다.\n"
            f"등록 ID: REG-{rng.randint(2020, 2025)}-{rng.randint(100, 999)}X\n"
            "자세한 사항은 홈페이지를 참고하세요."
        )
    return text, [], "False Positive", "EASY"


def _doc_obfuscated(rng):
    kind = rng.randrange(3)
    if kind == 0:
        digits = f"{rng.randint(55, 99):02d}{rng.randint(1, 12):02d}{rng.randint(1, 28):02d}"
        tail = f"{rng.randint(1, 4)}{rng.randint(100000, 999999)}"
        spaced = " ".join(digits) + " - " + " ".join(tail)
        text = f"스캔 문서 일부\n\n식별번호 {spaced} (공백 삽입됨)\n\n{_fill(rng, 1)}"
        # Extraction-verbatim rule (reference prompt run_pii_evaluation.py:125):
        # the golden value is the spaced string exactly as it appears.
        expected = [("주민등록번호", spaced)]
    elif kind == 1:
        korean_digits = "공일공-" + "".join(
            rng.choice(["일", "이", "삼", "사", "오", "육", "칠", "팔", "구"]) for _ in range(4)
        ) + "-" + "".join(
            rng.choice(["일", "이", "삼", "사", "오", "육", "칠", "팔", "구"]) for _ in range(4)
        )
        text = f"통화 기록 메모\n\n연락처는 {korean_digits} 입니다.\n\n{_fill(rng, 1)}"
        expected = [("전화번호", korean_digits)]
    else:
        fw = "０１０−１２３４−５６７８"
        text = f"OCR 추출 결과\n\n전화: {fw}\n\n{_fill(rng, 1)}"
        expected = [("전화번호", fw)]
    return text, expected, "난독화", "HARD"


_PII_BUILDERS = [
    _doc_name,
    _doc_name_rare,
    _doc_address,
    _doc_rrn,
    _doc_rrn_masked,
    _doc_passport,
    _doc_driver,
    _doc_email,
    _doc_email_obfuscated,
    _doc_ip,
    _doc_phone,
    _doc_account,
    _doc_card,
    _doc_dob,
    _doc_other_id,
    _doc_composite,
    _doc_false_positive,
    _doc_false_positive,  # weight FPs ~2x: reference corpus is ~1/3 negatives
    _doc_obfuscated,
]

# Families whose planted values the regex layer is expected to recover
# exactly (the clean-recall F1 gate); obfuscation is the documented regex
# gap (reference regex F1 is 51.1% — BASELINE.md), FP docs have no values.
CLEAN_CATEGORIES = frozenset(
    {
        "이름", "주소", "주민등록번호", "여권번호", "운전면허번호", "이메일",
        "IP주소", "전화번호", "계좌번호", "카드번호", "생년월일",
        "기타_고유식별정보", "복합", "근접중복",
    }
)

_HTML_TEMPLATE = (
    "<!DOCTYPE html>\n<html><head><title>{title}</title>"
    "<style>body{{margin:0}}</style>"
    "<script>var page={page};</script></head>\n"
    "<body><nav><ul><li>홈</li><li>문서함</li><li>설정</li></ul></nav>\n"
    "<main><article>{body}</article></main>\n"
    "<footer>ⓒ {year} 문서 보관소 — 페이지 {page}</footer></body></html>"
)


def render_html(doc_text: str, page_id: int, title: str, year: int = 2024) -> bytes:
    """Wrap ``doc_text`` in the deterministic page template. The text is
    HTML-escaped so extraction returns it verbatim (incl. '<' or '&')."""
    return _HTML_TEMPLATE.format(
        title=_htmllib.escape(title),
        body=_htmllib.escape(doc_text),
        page=page_id,
        year=year,
    ).encode("utf-8")


def _foreign_doc(rng: random.Random) -> tuple[str, str]:
    lang = rng.choice(["en", "es", "de", "fr", "zh"])
    words = SEED_TEXTS[lang].split()
    n = rng.randint(40, 120)
    start = rng.randrange(0, max(1, len(words) - n))
    return " ".join(words[start : start + n]), lang


_TOXIC_SNIPPETS = [
    "야 이 바보 멍청이 같은 놈아 꺼져 버려",
    "닥쳐 이 쓰레기 등신아 또라이 같은 소리 하지 마",
    "you absolute idiot shut up you moron loser",
    "stupid stupid idiot trash go to hell scumbag",
]


def _toxic_doc(rng: random.Random) -> str:
    """Insult-dense rant: the toxicity gate must drop it."""
    lines = [rng.choice(_TOXIC_SNIPPETS) for _ in range(rng.randint(4, 8))]
    return "악성 댓글 모음\n\n" + "\n".join(lines)


def _garbage_doc(rng: random.Random) -> str:
    pool = "!@#$%^&*()_+=~`|\\{}[]<>ΩλϞ¤¶§"
    return "".join(rng.choice(pool) if rng.random() < 0.8 else " " for _ in range(rng.randint(80, 300)))


def generate_corpus(cfg: CorpusConfig) -> tuple[pa.Table, pa.Table | None]:
    """Returns (documents_table, labels_table_or_None).

    documents: url, warc_ts, html(binary), text, lang — the input_hint shape.
    labels:    url, case_id, category, difficulty,
               expected_pii list<struct<type,value>>, is_clean_family.
    (Keep/scrub golden columns are appended by the oracle — pipelines/oracle.)
    """
    base_ts = datetime(2024, 1, 1)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    l_url, l_case, l_cat, l_diff, l_exp, l_clean = [], [], [], [], [], []

    n = cfg.n_docs
    n_foreign = int(n * cfg.foreign_fraction)
    n_garbage = int(n * cfg.garbage_fraction)
    n_dup = int(n * cfg.near_dup_fraction)
    n_pii = n - n_foreign - n_garbage - n_dup

    dup_sources: list[tuple[str, list]] = []

    for i in range(n):
        rng = random.Random((cfg.seed << 20) ^ i)
        case_id = f"WD{i:06d}"
        if i < n_pii:
            builder = _PII_BUILDERS[i % len(_PII_BUILDERS)]
            doc_text, expected, category, difficulty = builder(rng)
            lang = "ko"
            if len(dup_sources) < 64:
                dup_sources.append((doc_text, expected))
        elif i < n_pii + n_dup and dup_sources:
            # Near-duplicate: mutate an earlier document slightly. The PII
            # payload survives the mutation, so the clone inherits its
            # source's golden labels.
            src, src_expected = dup_sources[i % len(dup_sources)]
            lines = src.split("\n")
            # Mutate the TITLE line only: a suffix on a PII-bearing line can
            # be absorbed by a greedy pattern (e.g. the road-address optional
            # parenthetical eats " (사본)" across the newline), silently
            # breaking the inherited golden labels.
            lines[0] = lines[0] + " (사본)"
            doc_text = "\n".join(lines)
            expected, category, difficulty, lang = list(src_expected), "근접중복", "EASY", "ko"
        elif i < n_pii + n_dup + n_foreign:
            doc_text, lang = _foreign_doc(rng)
            expected, category, difficulty = [], "외국어", "EASY"
        elif rng.random() < 0.3:
            doc_text = _toxic_doc(rng)
            expected, category, difficulty, lang = [], "유해", "EASY", "ko"
        else:
            doc_text = _garbage_doc(rng)
            expected, category, difficulty, lang = [], "저품질", "EASY", "und"

        if cfg.giant_every and i > 0 and i % cfg.giant_every == 0:
            doc_text = doc_text + ("\n" + _fill(rng, 40)) * 50
            category = category + "+거대문서"

        html = render_html(doc_text, i, f"문서 {case_id}")
        text = extract_text(html)
        urls.append(f"https://corpus.example-archive.kr/{case_id}")
        tss.append(base_ts + timedelta(seconds=i))
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
        if cfg.with_labels:
            l_url.append(urls[-1])
            l_case.append(case_id)
            l_cat.append(category)
            l_diff.append(difficulty)
            l_exp.append([{"type": t, "value": v} for t, v in expected])
            l_clean.append(category in CLEAN_CATEGORIES)

    docs = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    labels = None
    if cfg.with_labels:
        labels = pa.table(
            {
                "url": pa.array(l_url, pa.string()),
                "case_id": pa.array(l_case, pa.string()),
                "category": pa.array(l_cat, pa.string()),
                "difficulty": pa.array(l_diff, pa.string()),
                "expected_pii": pa.array(
                    l_exp,
                    pa.list_(
                        pa.struct([("type", pa.string()), ("value", pa.string())])
                    ),
                ),
                "is_clean_family": pa.array(l_clean, pa.bool_()),
            }
        )
    return docs, labels


def write_corpus(out_dir: str, cfg: CorpusConfig, shards: int = 4) -> None:
    """Write documents/ (sharded, resumable layout) and labels.parquet."""
    import os

    import pyarrow.parquet as pq

    docs, labels = generate_corpus(cfg)
    os.makedirs(f"{out_dir}/documents", exist_ok=True)
    n = docs.num_rows
    per = max(1, (n + shards - 1) // shards)
    for s in range(shards):
        chunk = docs.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, f"{out_dir}/documents/shard-{s:04d}.parquet")
    if labels is not None:
        pq.write_table(labels, f"{out_dir}/labels.parquet")
