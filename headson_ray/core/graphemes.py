"""Unicode extended grapheme cluster helpers (UAX-29).

Mirrors the reference's use of unicode-segmentation
(/root/reference/src/order/build.rs:100-114, src/utils/text.rs:5-14) using
the ``regex`` module's ``\\X`` matcher, with an ASCII fast path for the
common web-text case.
"""

from __future__ import annotations

import regex

_GRAPHEME = regex.compile(r"\X")


def _is_fast_ascii(s: str) -> bool:
    # ASCII without CR: every code unit is its own cluster (CRLF would join).
    return s.isascii() and "\r" not in s


def count_graphemes_capped(s: str, cap: int) -> tuple[int, bool]:
    """Return (min(#graphemes, cap), truncated?).

    Matches record_string_metrics (reference: src/order/build.rs:100-114).
    """
    if _is_fast_ascii(s):
        n = len(s)
        return (n, False) if n <= cap else (cap, True)
    count = 0
    for _ in _GRAPHEME.finditer(s):
        if count >= cap:
            return cap, True
        count += 1
    return count, False


def take_n_graphemes(s: str, n: int) -> str:
    """First n grapheme clusters (reference: src/utils/text.rs:5-14)."""
    if _is_fast_ascii(s):
        return s[:n]
    out = []
    for i, m in enumerate(_GRAPHEME.finditer(s)):
        if i >= n:
            break
        out.append(m.group())
    return "".join(out)
