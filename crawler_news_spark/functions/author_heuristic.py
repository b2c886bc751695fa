"""Author-from-strong-tags heuristic — re-spec of the reference's
utils/beautifulSoup_utils.py:12-51 (used by quandoinhandan.py:140).

Pure functions shared by the parse vUDF and the oracle; the LAST matching
``p > strong`` wins (beautifulSoup_utils.py:22)."""

from __future__ import annotations

import re

_ALLCAPS = re.compile(r"^[A-ZÀ-Ỵ0-9\- ()]+$")


def clean_prefix(text: str) -> str:
    """Strip 'TIN, ẢNH:'/'TIN:'/'ẢNH:' prefixes (beautifulSoup_utils.py:25-30)."""
    if ":" in text:
        head, tail = text.split(":", 1)
        if head.strip().upper() in ("TIN, ẢNH", "TIN", "ẢNH"):
            return tail.strip()
    return text.strip()


def is_author_strong_tag(text: str) -> bool:
    """Heuristic from beautifulSoup_utils.py:32-51, byte-faithful."""
    text = clean_prefix(text)
    if text.strip() in ("", ":", "PV", "PV:", "–", "—"):
        return False
    if any(kw in text.upper() for kw in ("GIÁ VÀNG", "GIÁ DẦU", "BẢN CHẤT", "DIỄN")):
        return False
    if _ALLCAPS.match(text.strip()) and len(text.split()) <= 6:
        return True
    if 3 <= len(text.split()) <= 10 and not text.isupper():
        return True
    return False


def extract_author_from_strong_texts(strong_texts: list[str]) -> str | None:
    """Last matching candidate wins (beautifulSoup_utils.py:12-22)."""
    candidates = [clean_prefix(t) for t in strong_texts if is_author_strong_tag(t)]
    return candidates[-1] if candidates else None
