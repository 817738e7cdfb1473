"""Vectorized, process-stable 64-bit string hashing.

The hash family used by the dedup / text-analysis stages is a codepoint
Horner polynomial mod 2**64 followed by two bijective mixing rounds:

    h(s)   = sum_i cp(s_i) * B**(n-1-i)   (mod 2**64), B = 1000003 (odd)
    mix(v) = ((v>>32)<<32 | (v + C*(v>>32)) mod 2**32) * M2   (mod 2**64)
    hash   = mix(mix(h))

Why this family (and not crc32/FNV/blake2b everywhere):

- genuinely 64-bit: the Horner map is a linear map onto Z_2^64 whose
  random-collision probability is ~2**-64 (B is odd, so the leading
  coefficient is a unit), and both mix rounds are bijections (a Feistel
  half-round injecting the high word into the low word, then an odd
  multiplier), so no entropy is lost.  This replaces the two-seeded-crc32
  scheme whose words were affinely related (hi^lo constant for
  same-length inputs -> only ~32 bits of entropy).
- vectorizable: the whole batch of strings hashes as one numpy uint64
  matrix pass (~30 ns/string) instead of a per-string C call.
- SQL-expressible: every step is +,*,//,% on HUGEINT mod 2**64 (the
  constants C and M2 are < 2**32, so no intermediate exceeds 2**97),
  which lets the DuckDB oracle recompute identical hashes.

Per-document byte hashing (exact_dedup keys) uses blake2b(digest_size=8)
instead: one C call per document is cheap there and needs no SQL parity.
"""

from __future__ import annotations

import numpy as np

B = 1000003
MIX_C = 2654435769  # 2**32 / golden ratio, < 2**32
MIX_M2 = 2654435761  # Knuth multiplicative, odd, < 2**32
MASK64 = (1 << 64) - 1

_B = np.uint64(B)
_C = np.uint64(MIX_C)
_M2 = np.uint64(MIX_M2)
_LOW32 = np.uint64(0xFFFFFFFF)
_SH32 = np.uint64(32)


def mix_rounds(v: np.ndarray) -> np.ndarray:
    """Two bijective mixing rounds over uint64 (vectorized, wrapping)."""
    for _ in range(2):
        hi = v >> _SH32
        lo = (v + _C * hi) & _LOW32
        v = ((hi << _SH32) | lo) * _M2
    return v


def mix_rounds_int(v: int) -> int:
    """Python-int reference of mix_rounds (for tests / tiny inputs)."""
    for _ in range(2):
        hi = v >> 32
        lo = (v + MIX_C * hi) & 0xFFFFFFFF
        v = ((hi << 32) | lo) * MIX_M2 & MASK64
    return v


def horner_hash_int(s: str) -> int:
    """Python-int reference of the full string hash."""
    h = 0
    for ch in s:
        h = (h * B + ord(ch)) & MASK64
    return mix_rounds_int(h)


# Precomputed inverse powers of B mod 2**64 for un-padding the fixed-width
# numpy 'U' matrix: hashing a string padded with k trailing NUL columns
# yields h_true * B**k, so h_true = h_pad * B**-k.
_BINV = pow(B, -1, 1 << 64)
_MAX_UNPAD = 4096
_BINV_POWS = np.empty(_MAX_UNPAD + 1, dtype=np.uint64)
_acc = 1
for _k in range(_MAX_UNPAD + 1):
    _BINV_POWS[_k] = _acc
    _acc = (_acc * _BINV) & MASK64


# Cap on the (rows x maxlen) codepoint-matrix size: 2^23 uint64 cells =
# 64 MiB transient. Bigger batches hash in length-sorted chunks so one
# long outlier doesn't pad the whole batch to its width.
_CELL_BUDGET = 1 << 23


def _hash_long_string(s: str) -> int:
    """Single long string, vectorized WITHIN the string: Horner(s) =
    sum_i cp_i * B**(n-1-i), computed as one codepoint array times a
    cumulative-product power ladder (wrapping uint64), then mixed.
    Identical to horner_hash_int without the per-character python loop."""
    cps = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = cps.shape[0]
    if n == 0:
        return mix_rounds_int(0)
    pows = np.empty(n, dtype=np.uint64)
    pows[0] = 1
    if n > 1:
        np.multiply.accumulate(
            np.full(n - 1, B, dtype=np.uint64), out=pows[1:]
        )
    h = int((cps * pows[::-1]).sum(dtype=np.uint64))
    return mix_rounds_int(h)


def _hash_matrix(strs: list[str], lens: np.ndarray, maxlen: int) -> np.ndarray:
    """The core fixed-width matrix pass (callers guarantee
    maxlen in (0, _MAX_UNPAD])."""
    n = len(strs)
    mat = (
        np.array(strs, dtype=f"U{maxlen}")
        .view(np.uint32)
        .reshape(n, maxlen)
        .astype(np.uint64)
    )
    h = np.zeros(n, dtype=np.uint64)
    for j in range(maxlen):
        h = h * _B + mat[:, j]
    h = h * _BINV_POWS[maxlen - lens]
    return mix_rounds(h)


def hash_strings(strs: list[str]) -> np.ndarray:
    """Hash a list of strings to uint64, fully vectorized.

    One numpy (n, maxlen) uint32 codepoint matrix (the 'U' dtype is
    native-endian UTF-32), a Horner pass down the columns, an un-padding
    multiply by B**-(pad), then the mixing rounds. Batches whose padded
    matrix would exceed _CELL_BUDGET cells (or that contain strings
    longer than _MAX_UNPAD) hash in length-sorted chunks; giant strings
    hash individually via the in-string vectorized ladder.
    """
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter(map(len, strs), dtype=np.int64, count=n)
    maxlen = int(lens.max(initial=0))
    if maxlen == 0:
        return mix_rounds(np.zeros(n, dtype=np.uint64))
    if maxlen <= _MAX_UNPAD and n * maxlen <= _CELL_BUDGET:
        return _hash_matrix(strs, lens, maxlen)
    out = np.empty(n, dtype=np.uint64)
    order = np.argsort(lens, kind="stable")
    start = 0
    while start < n:
        L = int(lens[order[start]])
        if L > _MAX_UNPAD:
            # everything from here on is giant (sorted): one at a time,
            # still vectorized within the string
            for i in order[start:]:
                out[i] = _hash_long_string(strs[i])
            break
        if L == 0:
            end = start
            while end < n and lens[order[end]] == 0:
                end += 1
            out[order[start:end]] = mix_rounds(
                np.zeros(end - start, dtype=np.uint64)
            )
            start = end
            continue
        # grow the chunk while the padded matrix stays under budget
        end = start
        cm = 0
        while end < n:
            Lj = int(lens[order[end]])
            if Lj > _MAX_UNPAD:
                break
            cm2 = Lj if Lj > cm else cm
            if (end - start + 1) * cm2 > _CELL_BUDGET and end > start:
                break
            cm = cm2
            end += 1
        idx = order[start:end]
        out[idx] = _hash_matrix(
            [strs[i] for i in idx], lens[idx], cm
        )
        start = end
    return out


def combine_hash_pair(ha: np.ndarray, hb: np.ndarray) -> np.ndarray:
    """Combine two per-row uint64 hash arrays into one (a Horner round
    over the pair, then the mixing rounds) — the vectorized composite
    key for (domain, url)-style routing."""
    return mix_rounds(ha * _B + hb)


def hash_string_pairs(a: list[str], b: list[str]) -> np.ndarray:
    """Vectorized 64-bit hash of (a[i], b[i]) pairs."""
    return combine_hash_pair(hash_strings(a), hash_strings(b))


def hash_pair_int(a: str, b: str) -> int:
    """Python-int reference of hash_string_pairs for one pair."""
    h = (horner_hash_int(a) * B + horner_hash_int(b)) & MASK64
    return mix_rounds_int(h)


def hash_u64_rows(mat: np.ndarray, seed: np.ndarray | int = 0) -> np.ndarray:
    """Hash each row of a (n, k) uint64 matrix to one uint64 (Horner over
    the row words, seeded, then mixed). Used for LSH band keys."""
    h = np.full(
        mat.shape[0], seed, dtype=np.uint64
    ) if np.isscalar(seed) else seed.astype(np.uint64)
    for j in range(mat.shape[1]):
        h = h * _B + mat[:, j]
    return mix_rounds(h)


def rolling_window_hashes(codes: np.ndarray, window: int) -> np.ndarray:
    """Horner-mod-2**64 hash of every length-`window` slice of a codepoint
    array, vectorized: `window` passes over the (n-window+1) output lanes
    instead of a per-byte python loop."""
    n = codes.shape[0] - window + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    c = codes.astype(np.uint64)
    for j in range(window):
        h = h * _B + c[j : j + n]
    return h
