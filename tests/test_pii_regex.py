"""Unit tests per detector family (fixture families mirror the reference
corpus composition — SURVEY.md §5) plus scrub/span semantics."""

from __future__ import annotations

from pii_detection_test_ray.functions.pii_regex import (
    PII_CATEGORIES,
    detect_and_scrub,
    detect_pii,
    detect_pii_values,
    merge_spans,
    scrub_text,
)


def detected(text, cat):
    return detect_pii_values(text)[cat]


class TestNames:
    def test_label_anchored(self):
        assert detected("성명: 김철수", "이름") == ["김철수"]
        assert detected("담당자 : 이영희 입니다", "이름") == ["이영희"]

    def test_unlabeled_name_not_detected(self):
        assert detected("김철수가 방문했다", "이름") is None

    def test_unknown_label_not_detected(self):
        assert detected("점검자: 김철수", "이름") is None

    def test_dedup_preserves_insertion_order(self):
        text = "성명: 박민수\n담당자: 김철수\n작성자: 박민수"
        assert detected(text, "이름") == ["박민수", "김철수"]


class TestRRN:
    def test_dashed_reformats(self):
        assert detected("주민번호 850315 - 1234567 확인", "주민등록번호") == [
            "850315-1234567"
        ]

    def test_masked_needs_following_word_char(self):
        assert detected("850315-1******뒤", "주민등록번호") == ["850315-1******"]
        assert detected("850315-1****** 뒤", "주민등록번호") is None

    def test_continuous_13_digits(self):
        assert detected("번호 8503151234567 기록", "주민등록번호") == ["8503151234567"]
        assert detected("번호 8503159234567 기록", "주민등록번호") is None  # 9 invalid


class TestEmail:
    def test_standard(self):
        assert detected("메일 hong.gildong@naver.com 로", "이메일") == [
            "hong.gildong@naver.com"
        ]

    def test_blocklisted_domains_and_roles(self):
        assert detected("test@example.com 으로 발송", "이메일") is None
        assert detected("info@company.co.kr 안내", "이메일") is None
        assert detected("noreply@shop.kr", "이메일") is None

    def test_obfuscated_and_masked(self):
        assert detected("contact me kim [at] daum [dot] net", "이메일") == [
            "kim [at] daum [dot] net"
        ]
        assert detected("아이디 h****@gmail.com", "이메일") == ["h****@gmail.com"]


class TestIP:
    def test_public_with_port(self):
        assert detected("접속 203.0.113.5:8080 기록", "IP주소") == ["203.0.113.5:8080"]

    def test_excluded_well_known(self):
        assert detected("로컬 127.0.0.1 과 DNS 8.8.8.8", "IP주소") is None

    def test_private_suppressed_only_in_network_context(self):
        assert detected("서브넷 대역 192.168.1.10 할당", "IP주소") is None
        assert detected("침입 시도 192.168.1.10 탐지됨", "IP주소") == ["192.168.1.10"]

    def test_ipv6(self):
        assert detected("주소 2001:db8:85a3:0:0:8a2e:370:7334 기록", "IP주소") == [
            "2001:db8:85a3:0:0:8a2e:370:7334"
        ]


class TestPhone:
    def test_mobile_landline_intl(self):
        vals = detect_pii_values("연락처 010-1234-5678, 02-555-0199, +82-10-9876-5432")
        assert vals["전화번호"] == ["010-1234-5678", "02-555-0199", "+82-10-9876-5432"]

    def test_service_numbers_excluded(self):
        assert detected("고객센터 1588-1234", "전화번호") is None
        assert detected("수신자부담 080-123-4567", "전화번호") is None

    def test_first_occurrence_positional_quirk(self):
        # Same digits appear inside a service span first: both occurrences
        # are judged by the first index (reference regex_pii_detector.py:279).
        text = "ARS 1588-0101-2345 내선, 일반 0101-2345"
        vals = detect_pii_values(text)
        assert vals["전화번호"] is None or "0101-2345" not in (vals["전화번호"] or [])


class TestFinancial:
    def test_account_label_and_bank(self):
        assert detected("계좌번호: 110-234-567890", "계좌번호") == ["110-234-567890"]
        assert detected("국민은행 123-45-678901 입금", "계좌번호") == ["123-45-678901"]

    def test_card_and_crypto_filed_under_card(self):
        vals = detect_pii_values(
            "카드 1234-5678-9012-3456 또는 0x1234567890abcdef1234567890abcdef12345678"
        )
        assert vals["카드번호"] == [
            "1234-5678-9012-3456",
            "0x1234567890abcdef1234567890abcdef12345678",
        ]


class TestOtherId:
    def test_vehicle_plate(self):
        assert detected("차량 12가3456 견인", "기타_고유식별정보") == ["12가3456"]

    def test_labeled_ids(self):
        assert detected("학번: 2020-12345", "기타_고유식별정보") == ["2020-12345"]
        assert detected("사번: 1234-5678", "기타_고유식별정보") == ["1234-5678"]


class TestScrub:
    def test_scrub_replaces_spans(self):
        text = "성명: 김철수 연락처 010-1234-5678"
        values, scrubbed, n = detect_and_scrub(text)
        assert "김철수" not in scrubbed
        assert "010-1234-5678" not in scrubbed
        assert "[NAME]" in scrubbed and "[PHONE]" in scrubbed
        assert n == 2

    def test_scrub_noop_without_pii(self):
        text = "오늘 날씨가 좋습니다."
        _, scrubbed, n = detect_and_scrub(text)
        assert scrubbed == text and n == 0

    def test_merge_overlapping_spans_deterministic(self):
        from pii_detection_test_ray.functions.pii_regex import PiiSpan

        spans = [
            PiiSpan(0, 10, "전화번호", "x"),
            PiiSpan(5, 12, "이름", "y"),
            PiiSpan(20, 25, "이메일", "z"),
        ]
        merged = merge_spans(spans)
        assert [(s.start, s.end) for s in merged] == [(0, 12), (20, 25)]
        assert merged[0].category == "전화번호"

    def test_scrub_preserves_surroundings(self):
        text = "앞부분 성명: 김철수 뒷부분"
        _, spans = detect_pii(text)
        scrubbed = scrub_text(text, spans)
        assert scrubbed.startswith("앞부분 성명: ") and scrubbed.endswith(" 뒷부분")


def test_all_categories_present_in_output():
    vals = detect_pii_values("빈 문서")
    assert list(vals.keys()) == list(PII_CATEGORIES)
    assert all(v is None for v in vals.values())
