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
    """(hangul_ratio, cjk_ratio) over non-space characters. Vectorized:
    the text decodes to a uint32 codepoint array once; range checks are
    numpy masks (this runs on every document in the langid stage)."""
    import numpy as _np

    if not text:
        return 0.0, 0.0
    arr = _np.frombuffer(text.encode("utf-32-le"), dtype=_np.uint32)
    space = (
        (arr == 0x20)
        | ((arr >= 0x09) & (arr <= 0x0D))
        | (arr == 0xA0)
        | (arr == 0x3000)
        | (arr == 0x85)
        | (arr == 0x2028)
        | (arr == 0x2029)
    )
    nonspace = int((~space).sum())
    if nonspace == 0:
        return 0.0, 0.0
    hangul = int(((arr >= _HANGUL[0]) & (arr <= _HANGUL[1])).sum())
    cjk = int(((arr >= _CJK[0]) & (arr <= _CJK[1])).sum())
    return hangul / nonspace, cjk / nonspace


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


class _FoldTable(dict):
    """ord → class-char mapping for ``str.translate`` (C loop); unseen
    characters are classified once via ``_char_class`` and cached."""

    def __missing__(self, codepoint: int) -> str:
        out = _char_class(chr(codepoint))
        self[codepoint] = out
        return out


_FOLD_TABLE = _FoldTable()


def fold_classes(text: str) -> str:
    return text.translate(_FOLD_TABLE)


# The closed class alphabet (everything _char_class can emit) + the
# start/end markers. Scoring indexes dense numpy count tables by these codes.
_ALPHABET = "\x02\x03abcdefghijklmnopqrstuvwxyz9 HCL.,;:!?'\"()-–—[]/%#"
_A = len(_ALPHABET)
_CODE_TABLE = {ord(ch): chr(i) for i, ch in enumerate(_ALPHABET)}

import numpy as _np  # noqa: E402


def _codes(folded: str) -> "_np.ndarray":
    """Class string → uint8 code array (two C-speed passes, no Python loop)."""
    return _np.frombuffer(
        folded.translate(_CODE_TABLE).encode("latin-1"), dtype=_np.uint8
    )


class CharTrigramLM:
    """Add-k smoothed trigram LM over character classes; bits/char scoring.

    Counts live in dense numpy tables indexed by packed class codes, so
    scoring a document is two gathers + one log — no per-character Python.
    """

    def __init__(self, corpus: str, k: float = 0.02) -> None:
        self.k = k
        # Fixed virtual vocabulary (the class alphabet is small and closed),
        # so unseen contexts are penalized identically across models.
        self.vocab = 128
        codes = _codes(f"\x02\x02{fold_classes(corpus)}\x03").astype(_np.int32)
        idx3 = (codes[:-2] * _A + codes[1:-1]) * _A + codes[2:]
        idx2 = codes[:-1] * _A + codes[1:]
        self.tri = _np.bincount(idx3, minlength=_A * _A * _A).astype(_np.float64)
        self.bi = _np.bincount(idx2, minlength=_A * _A).astype(_np.float64)

    def logprob(self, text: str, prefolded: bool = False) -> float:
        """Total log2 probability of ``text`` under the model."""
        folded = text if prefolded else fold_classes(text)
        codes = _codes(f"\x02\x02{folded}").astype(_np.int32)
        if codes.size < 3:
            return 0.0
        ctx = codes[:-2] * _A + codes[1:-1]
        idx3 = ctx * _A + codes[2:]
        num = self.tri[idx3] + self.k
        den = self.bi[ctx] + self.k * self.vocab
        return float(_np.log2(num / den).sum())

    def log_perplexity(self, text: str) -> float:
        """Average negative log2 probability per character (bits/char)."""
        text = text or ""  # null text behaves as empty
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
        text = text or ""  # null text behaves as empty
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
