"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All stages are vectorized-or-cheap map_batches functions over Arrow
batches; token/quality semantics are chosen to be expressible in ANSI SQL
so the DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_STOPWORD_SET = frozenset(STOPWORDS)

# Tiny per-language character/word profiles for the n-gram heuristic.
# Deliberately simple and deterministic (no model downloads).
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " is "),
    "de": (" der ", " die ", " und ", " ist "),
    "fr": (" le ", " la ", " et ", " est "),
    "es": (" el ", " la ", " y ", " es "),
    "ja": ("の", "に", "は", "を"),
}


def add_token_stats(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Append token_count (whitespace tokens) and stopword_count.

    Kernel choice is MEASURED, not guessed: python's C-level str.split
    + frozenset membership beats an arrow RE2 split_pattern_regex +
    is_in + reduceat pipeline 4x on 5k-token docs (98 ms vs 418 ms per
    200-doc batch) — RE2 pays per-match overhead that whitespace-mode
    split does not.

    SQL equivalent:
      token_count  = len(list_filter(string_split_regex(text,'\\s+'), x -> x<>''))
      stopword_cnt = len(list_filter(..., x -> x in STOPWORDS))
    """
    token_counts = []
    stop_counts = []
    stop = _STOPWORD_SET
    for t in batch.column(text_column).to_pylist():
        toks = (t or "").split()
        token_counts.append(len(toks))
        stop_counts.append(len([1 for x in toks if x in stop]))
    batch = batch.append_column(
        "token_count", pa.array(token_counts, pa.int64())
    )
    return batch.append_column(
        "stopword_count", pa.array(stop_counts, pa.int64())
    )


def add_quality_score(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Heuristic quality score in [0,1]: length + stopword-ratio blend
    (Gopher/C4-style length/stopword filters, simplified)."""
    if "token_count" not in batch.column_names:
        batch = add_token_stats(batch, text_column)
    n = pc.cast(batch.column("token_count"), pa.float64())
    sw = pc.cast(batch.column("stopword_count"), pa.float64())
    len_score = pc.min_element_wise(
        pc.divide(n, pa.scalar(100.0)), pa.scalar(1.0)
    )
    ratio = pc.divide(sw, pc.max_element_wise(n, pa.scalar(1.0)))
    sw_score = pc.min_element_wise(
        pc.divide(ratio, pa.scalar(0.05)), pa.scalar(1.0)
    )
    score = pc.add(
        pc.multiply(len_score, pa.scalar(0.5)),
        pc.multiply(sw_score, pa.scalar(0.5)),
    )
    return batch.append_column("quality_score", score)


def add_lang_id(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Append lang_pred via marker-n-gram voting (deterministic heuristic)."""
    preds = []
    for t in batch.column(text_column).to_pylist():
        s = f" {t} " if t else ""
        best, best_score = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            score = sum(s.count(m) for m in markers)
            if score > best_score:
                best, best_score = lang, score
        preds.append(best)
    return batch.append_column("lang_pred", pa.array(preds, pa.string()))


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
# marks (explicit ASCII whitespace class so python-re, RE2 (pyarrow) and
# DuckDB regexp_extract_all all count identically)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]"


def add_bpe_token_count(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Append n_bpe_tokens = number of BPE-ish pre-tokens, vectorized with
    the Arrow RE2 kernel (no per-row python regex loop).

    SQL equivalent: len(regexp_extract_all(text, pattern))."""
    n = pc.count_substring_regex(
        batch.column(text_column), pattern=BPE_TOKEN_PATTERN
    )
    return batch.append_column(
        "n_bpe_tokens", pc.cast(n, pa.int64())
    )


FP_WINDOW = 8


def _rolling_fp(text: str, window: int = FP_WINDOW) -> int:
    """Rolling-hash document fingerprint: XOR of the Horner-mod-2**64
    hashes of every `window`-codepoint slice (signed-int64 view).

    Vectorized: the text decodes to a uint32 codepoint array in one
    numpy call (the utf-32 view), then `window` vectorized passes build
    every window hash at once (stages/hashing.py) — no per-byte python
    loop. The arithmetic is pure +,*,% mod 2**64, so the DuckDB oracle
    (SQL_FINGERPRINTS) reproduces identical values with HUGEINT math.
    Texts shorter than the window fingerprint to 0."""
    import numpy as np

    from .hashing import rolling_window_hashes

    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    hs = rolling_window_hashes(codes, window)
    if hs.size == 0:
        return 0
    return int(np.bitwise_xor.reduce(hs).view(np.int64))


def add_fingerprint(batch: pa.Table, text_column: str = "text") -> pa.Table:
    fps = [
        _rolling_fp(t) if t else 0
        for t in batch.column(text_column).to_pylist()
    ]
    return batch.append_column("doc_fp", pa.array(fps, pa.int64()))
