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


def hash_strings(strs: list[str]) -> np.ndarray:
    """Hash a list of strings to uint64, fully vectorized.

    One numpy (n, maxlen) uint32 codepoint matrix (the 'U' dtype is
    native-endian UTF-32), a Horner pass down the columns, an un-padding
    multiply by B**-(pad), then the mixing rounds.
    """
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter(map(len, strs), dtype=np.int64, count=n)
    maxlen = int(lens.max(initial=0))
    if maxlen == 0:
        return mix_rounds(np.zeros(n, dtype=np.uint64))
    if maxlen > _MAX_UNPAD:
        # rare giant tokens: hash individually (still correct)
        return np.fromiter(
            (horner_hash_int(s) for s in strs), dtype=np.uint64, count=n
        )
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
