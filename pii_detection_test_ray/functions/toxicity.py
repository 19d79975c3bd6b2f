"""Lexicon-based toxicity scoring + scrubbing (stateless, deterministic).

The north star pairs the PII scrubber with a toxicity scrubber; the engine
implements it the same way content filters bootstrap before a learned model
exists: a compiled wordlist (mild, defensive — the point is the machinery),
token-ratio scoring, and span redaction. Runs inside the same stateless
quality stage; the lexicon regex is compiled once per worker at import.
"""

from __future__ import annotations

import re

# Deliberately mild lexicon — enough to exercise scoring/scrub/gate paths.
TOXIC_TERMS: tuple[str, ...] = (
    # English
    "idiot", "idiots", "stupid", "moron", "dumbass", "scumbag", "loser",
    "trash", "garbage human", "shut up", "go to hell",
    # Korean (mild insults)
    "바보", "멍청이", "멍청한", "쓰레기", "꺼져", "닥쳐", "등신", "병신",
    "미친놈", "미친년", "또라이", "죽어버려",
)

_TOXIC_RE = re.compile(
    "|".join(re.escape(t) for t in sorted(TOXIC_TERMS, key=len, reverse=True)),
    re.IGNORECASE | re.UNICODE,
)


def toxicity_matches(text: str) -> list[tuple[int, int, str]]:
    """All lexicon hits as (start, end, matched_text)."""
    return [(m.start(), m.end(), m.group(0)) for m in _TOXIC_RE.finditer(text)]


def toxicity_score(text: str) -> float:
    """Toxic-hit density: lexicon hits per whitespace token (0.0 for empty
    text). A rant repeating insults scores high; one quoted slur in a long
    article scores near zero."""
    if not text:
        return 0.0
    n_tokens = len(text.split())
    if n_tokens == 0:
        return 0.0
    return len(toxicity_matches(text)) / n_tokens


def scrub_toxicity(text: str) -> tuple[str, int]:
    """Replace every lexicon hit with ``[TOXIC]``; returns (scrubbed, n)."""
    matches = toxicity_matches(text)
    if not matches:
        return text, 0
    pieces: list[str] = []
    cursor = 0
    for start, end, _ in matches:
        if start < cursor:
            continue
        pieces.append(text[cursor:start])
        pieces.append("[TOXIC]")
        cursor = end
    pieces.append(text[cursor:])
    return "".join(pieces), len(matches)
