"""Number-token canonicalization matching serde_json's serialization.

The reference keeps the serialized token of every number
(/root/reference/src/json_ingest/builder.rs:64-73,195-206): integers that
fit i64/u64 print in canonical decimal; everything else goes through f64 and
Ryu shortest-round-trip formatting. Python's ``repr`` produces the same
shortest digits; this module reformats them using Ryu's notation rules
(decimal point position ``kk``: decimal notation iff ``-5 < kk <= 16``).
"""

from __future__ import annotations

import math

_I64_MIN = -(1 << 63)
_U64_MAX = (1 << 64) - 1


def ryu_format(f: float) -> str:
    """Format a finite float exactly like Rust's ryu::Buffer::format."""
    if f != f or f in (math.inf, -math.inf):
        raise ValueError("non-finite float has no JSON representation")
    r = repr(f)
    if "e" in r:
        mant, _, exps = r.partition("e")
        exp = int(exps)
    else:
        mant, exp = r, 0
    neg = mant.startswith("-")
    if neg:
        mant = mant[1:]
    ip, _, fp = mant.partition(".")
    combined = ip + fp
    stripped = combined.lstrip("0")
    if stripped == "":
        return "-0.0" if neg else "0.0"
    # kk: decimal point position such that value = 0.<digits> * 10**kk
    kk = len(ip) - (len(combined) - len(stripped)) + exp
    digits = stripped.rstrip("0")
    sign = "-" if neg else ""
    n = len(digits)
    if 0 < kk <= 16:
        if n <= kk:
            # integer with trailing zeros, then ".0"
            return sign + digits + "0" * (kk - n) + ".0"
        return sign + digits[:kk] + "." + digits[kk:]
    if -5 < kk <= 0:
        return sign + "0." + "0" * (-kk) + digits
    # scientific: d[.ddd]e<kk-1>
    e = kk - 1
    if n == 1:
        return f"{sign}{digits}e{e}"
    return f"{sign}{digits[0]}.{digits[1:]}e{e}"


def int_token(raw: str) -> str:
    """Token for an integer JSON literal (reference: builder.rs:64-73).

    Integers that fit in i64/u64 keep canonical decimal form; larger ones
    fall back to the f64 path like serde/simd-json.
    """
    i = int(raw)
    if _I64_MIN <= i <= _U64_MAX:
        return str(i)
    return ryu_format(float(raw))


def float_token(raw: str) -> str:
    """Token for a float JSON literal via f64 + Ryu (builder.rs:195-206)."""
    f = float(raw)
    return ryu_format(f)
