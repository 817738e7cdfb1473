"""Array pre-samplers: which original indices of an array are kept.

The reference samples *while* parsing a serde sequence stream
(/root/reference/src/json_ingest/samplers/{default,head,tail}.rs). All
three strategies are pure functions of (element index, cap), so with the
array length known we compute the kept index set directly — bit-exact with
the streaming implementation, including the mix64-based deterministic
"random" phase (samplers/default.rs:24-35).
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1
_RANDOM_ACCEPT_SEED = 0x9E3779B97F4A7C15
_RANDOM_ACCEPT_THRESHOLD = 0x8000_0000
_KEEP_FIRST_COUNT = 3
_GREEDY_PORTION_DIVISOR = 2


def mix64(x: int) -> int:
    x &= _MASK64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _MASK64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _MASK64
    return (x ^ (x >> 31)) & _MASK64


def accept_index(i: int) -> bool:
    h = mix64(i ^ _RANDOM_ACCEPT_SEED)
    return (h >> 32) < _RANDOM_ACCEPT_THRESHOLD


def _sample_default(n: int, cap: int) -> list[int]:
    kept: list[int] = []
    keep_first = min(_KEEP_FIRST_COUNT, cap)
    idx = 0
    # Phase 1: keep the first few (samplers/default.rs:64-83)
    while len(kept) < cap and idx < keep_first and idx < n:
        kept.append(idx)
        idx += 1
    # Phase 2: greedy half of remaining capacity (default.rs:85-105)
    greedy = (cap - keep_first) // _GREEDY_PORTION_DIVISOR
    while len(kept) < cap and greedy > 0 and idx < n:
        kept.append(idx)
        greedy -= 1
        idx += 1
    # Phase 3: deterministic ~50% acceptance by index hash (default.rs:107-129)
    while len(kept) < cap and idx < n:
        if accept_index(idx):
            kept.append(idx)
        idx += 1
    return kept


def sample_indices(n: int, cap: int, strategy: str) -> list[int]:
    """Indices (ascending) of kept elements for an array of length n."""
    if cap <= 0:
        return []
    if n <= cap:
        return list(range(n))
    if strategy == "head":
        return list(range(cap))
    if strategy == "tail":
        return list(range(n - cap, n))
    return _sample_default(n, cap)
