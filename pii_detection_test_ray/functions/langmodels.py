"""Deterministic, dependency-free language-ID and n-gram perplexity models.

The reference relies on an external vLLM server for its model stage
(reference: run_pii_evaluation.py:709-770); this engine instead uses small
deterministic CPU models whose state is built once per actor from seed text
embedded in this module — no downloads, no nondeterminism, reproducible
run-to-run (required for the golden tests).

* ``CharNgramLangID`` — fastText-style character n-gram classifier: add-k
  smoothed trigram log-likelihood per language plus script-ratio shortcuts
  (Hangul → ko, CJK ideographs → zh).
* ``CharTrigramLM`` — KenLM-style character trigram language model; scores
  documents with per-character log2 perplexity. Natural text scores low,
  mojibake/random-symbol garbage scores high.

Both are cheap to build (<10 ms) and are instantiated in actor ``__init__``
(once per worker), never per batch.
"""

from __future__ import annotations

import math
from collections import Counter

# Hand-written seed paragraphs, one per supported language. Composed for this
# repo; the point is stable per-language character statistics, not content.
SEED_TEXTS: dict[str, str] = {
    "en": (
        "The quick brown fox jumps over the lazy dog while the morning sun "
        "rises over the quiet harbor. People walk along the street and talk "
        "about the weather, the news, and the price of bread. This is a "
        "simple paragraph of ordinary English text that contains the most "
        "common words of the language, because the classifier needs to see "
        "which letters follow which other letters in natural writing. There "
        "are many things that could have been said here, but what matters is "
        "that the and of to in is was he for it with as his on be at by had."
    ),
    "es": (
        "El rápido zorro marrón salta sobre el perro perezoso mientras el "
        "sol de la mañana se levanta sobre el puerto tranquilo. La gente "
        "camina por la calle y habla del tiempo, de las noticias y del "
        "precio del pan. Este es un párrafo sencillo de texto en español "
        "que contiene las palabras más comunes de la lengua, porque el "
        "clasificador necesita ver qué letras siguen a qué otras letras en "
        "la escritura natural. De la que el en y a los se del las un por "
        "con no una su para es al lo como más pero sus le ya o fue este."
    ),
    "de": (
        "Der schnelle braune Fuchs springt über den faulen Hund, während "
        "die Morgensonne über dem stillen Hafen aufgeht. Die Leute gehen "
        "die Straße entlang und sprechen über das Wetter, die Nachrichten "
        "und den Preis des Brotes. Dies ist ein einfacher Absatz gewöhnlichen "
        "deutschen Textes, der die häufigsten Wörter der Sprache enthält, "
        "weil der Klassifikator sehen muss, welche Buchstaben auf welche "
        "anderen Buchstaben folgen. Der die und in den von zu das mit sich "
        "des auf für ist im dem nicht ein eine als auch es an werden aus er."
    ),
    "fr": (
        "Le rapide renard brun saute par-dessus le chien paresseux pendant "
        "que le soleil du matin se lève sur le port tranquille. Les gens "
        "marchent dans la rue et parlent du temps, des nouvelles et du prix "
        "du pain. Ceci est un paragraphe simple de texte français ordinaire "
        "qui contient les mots les plus courants de la langue, parce que le "
        "classificateur doit voir quelles lettres suivent quelles autres "
        "lettres dans l'écriture naturelle. De la le et les des en un du une "
        "que est pour qui dans a par plus pas au sur ne se ce il sont avec."
    ),
    "ko": (
        "빠른 갈색 여우가 게으른 개를 뛰어넘는 동안 아침 해가 조용한 항구 위로 "
        "떠오릅니다. 사람들은 거리를 걸으며 날씨와 뉴스와 빵 값에 대해 이야기를 "
        "나눕니다. 이것은 한국어의 가장 흔한 단어들을 담은 평범한 한국어 텍스트 "
        "문단입니다. 분류기는 자연스러운 글에서 어떤 글자가 어떤 글자 뒤에 오는지 "
        "보아야 하기 때문입니다. 그리고 그러나 있다 없다 하다 되다 것이다 사람 "
        "우리 지금 오늘 내일 여기 거기 무엇 어떻게 왜 언제 어디서 누가 함께 서로."
    ),
    "zh": (
        "敏捷的棕色狐狸跳过懒惰的狗，清晨的太阳在安静的港口上升起。人们沿着街道散步，"
        "谈论天气、新闻和面包的价格。这是一段普通中文文本的简单段落，包含了这种语言中"
        "最常见的词，因为分类器需要看到自然书写中哪些字跟在哪些字后面。的一是在不了有"
        "和人这中大为上个国我以要他时来用们生到作地于出就分对成会可主发年动同工也能。"
    ),
}

# Digit/label-heavy structured text (forms, contact blocks, logs) so that
# clean documents full of numbers, dates and identifiers are NOT penalized by
# the perplexity gate — only genuinely unstructured symbol soup is.
SEED_STRUCTURED = (
    "성명: 김민준\n연락처: 010-1234-5678\n이메일: minjun.kim@example.org\n"
    "주소: 서울특별시 강남구 테헤란로 152\n날짜: 2024년 3월 15일\n"
    "계좌번호: 110-234-567890 (신한은행)\n금액: 1,250,000원\n"
    "Name: John Smith\nPhone: +82-10-9876-5432\nDate: 2024-06-30 14:25:00\n"
    "Order #20240630-0042, invoice 98765, quantity 12, total $1,234.56.\n"
    "Server 192.168.0.10:8080 responded in 125 ms (status 200 OK).\n"
    "1. 서론\n2. 본론\n3. 결론\n항목별 점수: 95점, 87점, 92점 (평균 91.3점)\n"
    "참고: 2023/11/05, 2023.12.25, 650101-1234567 형식의 식별번호 예시.\n"
)

_HANGUL = (0xAC00, 0xD7A3)
_CJK = (0x4E00, 0x9FFF)


def script_ratios(text: str) -> tuple[float, float]:
    """(hangul_ratio, cjk_ratio) over non-space characters."""
    chars = [c for c in text if not c.isspace()]
    if not chars:
        return 0.0, 0.0
    hangul = sum(1 for c in chars if _HANGUL[0] <= ord(c) <= _HANGUL[1])
    cjk = sum(1 for c in chars if _CJK[0] <= ord(c) <= _CJK[1])
    return hangul / len(chars), cjk / len(chars)


_CLASS_CACHE: dict[str, str] = {}


def _char_class(ch: str) -> str:
    """Fold a character into a structural class so the perplexity LM scores
    text *shape* (letter runs, Hangul runs, spacing, punctuation) instead of
    exact syllables — tiny seed corpora can't cover the 11k Hangul syllable
    space, but they cover its structure."""
    cached = _CLASS_CACHE.get(ch)
    if cached is not None:
        return cached
    o = ord(ch)
    if "a" <= ch <= "z":
        out = ch
    elif "A" <= ch <= "Z":
        out = ch.lower()
    elif ch.isdigit():
        out = "9"
    elif ch.isspace():
        out = " "
    elif _HANGUL[0] <= o <= _HANGUL[1] or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        out = "H"
    elif _CJK[0] <= o <= _CJK[1] or 0x3000 <= o <= 0x30FF:
        out = "C"
    elif ch.isalpha():
        out = "L"  # accented latin, cyrillic, greek, ...
    elif ch in ".,;:!?'\"()-–—[]/%":
        out = ch
    else:
        out = "#"  # uncommon symbol
    _CLASS_CACHE[ch] = out
    return out


def fold_classes(text: str) -> str:
    return "".join(_char_class(c) for c in text)


class CharTrigramLM:
    """Add-k smoothed trigram LM over character classes; bits/char scoring."""

    def __init__(self, corpus: str, k: float = 0.02) -> None:
        self.k = k
        text = f"\x02\x02{fold_classes(corpus)}\x03"
        self.tri: Counter[str] = Counter(
            text[i : i + 3] for i in range(len(text) - 2)
        )
        self.bi: Counter[str] = Counter(text[i : i + 2] for i in range(len(text) - 1))
        # Fixed virtual vocabulary (the class alphabet is small and closed),
        # so unseen contexts are penalized identically across models.
        self.vocab = 128

    def logprob(self, text: str, prefolded: bool = False) -> float:
        """Total log2 probability of ``text`` under the model."""
        s = f"\x02\x02{text if prefolded else fold_classes(text)}"
        total = 0.0
        for i in range(2, len(s)):
            num = self.tri.get(s[i - 2 : i + 1], 0) + self.k
            den = self.bi.get(s[i - 2 : i], 0) + self.k * self.vocab
            total += math.log2(num / den)
        return total

    def log_perplexity(self, text: str) -> float:
        """Average negative log2 probability per character (bits/char)."""
        if not text:
            return 0.0
        return -self.logprob(text) / len(text)


class CharNgramLangID:
    """Language ID via per-language trigram log-likelihood + script priors."""

    def __init__(self, seeds: dict[str, str] | None = None) -> None:
        seeds = seeds or SEED_TEXTS
        self.models = {lang: CharTrigramLM(seed) for lang, seed in seeds.items()}

    def classify(self, text: str) -> tuple[str, float]:
        """Returns (language, confidence in [0, 1])."""
        if not text.strip():
            return "und", 0.0
        hangul, cjk = script_ratios(text)
        if hangul >= 0.25:
            return "ko", min(1.0, 0.5 + hangul)
        if cjk >= 0.25:
            return "zh", min(1.0, 0.5 + cjk)
        sample = text[:1000]
        scored = sorted(
            ((lm.logprob(sample) / max(1, len(sample)), lang)
             for lang, lm in self.models.items()),
            reverse=True,
        )
        best_score, best_lang = scored[0]
        runner_score = scored[1][0] if len(scored) > 1 else best_score - 1.0
        # Confidence from the log-likelihood margin over the runner-up.
        margin = best_score - runner_score
        return best_lang, max(0.0, min(1.0, margin * 2.0))


def build_default_ppl_model() -> CharTrigramLM:
    """Perplexity LM trained on the union of all language seeds."""
    return CharTrigramLM("\n".join(SEED_TEXTS.values()) + "\n" + SEED_STRUCTURED * 3)
