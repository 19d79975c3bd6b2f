"""Small-classifier disambiguation stage (actor pool).

Plays the role the LLM detector plays in the reference — a stateful model
stage that re-scores / disambiguates candidate PII the cheap regex layer
produced (reference: run_pii_evaluation.py:709-770; hybrid strategies
hybrid_analysis.py:330-506). Here the model is a deterministic CPU featurized
scorer (no downloads, reproducible): for each regex name candidate it scores
plausibility from an embedded common-surname/syllable table and emits a
parallel score list plus the confirmed subset. Confirmed values feed the
merge policies in functions/metrics.py (e.g. ``cross_validated``); the
default scrub path intentionally keeps raw regex semantics so parity with
the reference detector is preserved.

Model state is built once per actor (``__init__``), applied per batch.
"""

from __future__ import annotations

import pyarrow as pa

# 50 most common Korean surnames (public knowledge) + frequent given-name
# syllables; enough signal for a deterministic plausibility score.
_COMMON_SURNAMES = set(
    "김 이 박 최 정 강 조 윤 장 임 한 오 서 신 권 황 안 송 류 전 홍 고 문 양 손 "
    "배 백 허 유 남 심 노 하 곽 성 차 주 우 구 민 진 지 엄 채 원 천 방 공 현 함".split()
)
_COMMON_GIVEN_SYLLABLES = set(
    "민 준 서 연 도 윤 지 우 하 은 시 수 아 예 호 채 원 유 나 건 현 정 영 진 성 "
    "경 미 희 주 혜 재 상 태 환 석 철 숙 순 자 옥 영 학 동 용 기 병 광 만 복".split()
)


def _name_score(candidate: str) -> float:
    """Plausibility in [0, 1] that a 2-5 Hangul candidate is a person name."""
    if not (2 <= len(candidate) <= 5):
        return 0.0
    score = 0.2
    if candidate[0] in _COMMON_SURNAMES:
        score += 0.4
    given = candidate[1:]
    if given:
        hits = sum(1 for ch in given if ch in _COMMON_GIVEN_SYLLABLES)
        score += 0.4 * hits / len(given)
    if len(candidate) in (2, 3):
        score += 0.1
    return round(min(1.0, score), 4)


class NameDisambiguator:
    """Actor-pool stage: adds ``pii_name_scores`` (parallel to ``pii_name``)
    and ``pii_name_confirmed`` (candidates scoring ≥ threshold)."""

    def __init__(self, threshold: float = 0.5) -> None:
        self.threshold = threshold
        # Touch the tables so state construction is explicit actor setup.
        self._surnames = _COMMON_SURNAMES
        self._syllables = _COMMON_GIVEN_SYLLABLES

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores_col: list[list[float] | None] = []
        confirmed_col: list[list[str] | None] = []
        for names in batch.column("pii_name").to_pylist():
            if not names:
                scores_col.append(None)
                confirmed_col.append(None)
                continue
            scores = [_name_score(n) for n in names]
            confirmed = [n for n, s in zip(names, scores) if s >= self.threshold]
            scores_col.append(scores)
            confirmed_col.append(confirmed or None)
        return batch.append_column(
            "pii_name_scores", pa.array(scores_col, pa.list_(pa.float64()))
        ).append_column(
            "pii_name_confirmed", pa.array(confirmed_col, pa.list_(pa.string()))
        )
