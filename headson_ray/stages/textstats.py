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


BLOCKLIST = ("spark", "slow", "big")


def add_blocklist_stats(
    batch: pa.Table,
    text_column: str = "text",
    terms: tuple[str, ...] = BLOCKLIST,
) -> pa.Table:
    """Append n_blocked = count of whitespace tokens that exactly match
    a blocklist term (C4-style badwords filtering, token-equality
    semantics so the oracle's list_filter(x IN (...)) counts
    identically). Same measured str.split kernel as add_token_stats.
    """
    blocked = frozenset(terms)
    counts = [
        len([1 for x in (t or "").split() if x in blocked])
        for t in batch.column(text_column).to_pylist()
    ]
    return batch.append_column("n_blocked", pa.array(counts, pa.int64()))


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


def add_repetition_stats(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Append n_bigrams and top_bigram_ppm: the fraction (ppm, floored) of
    a document's word-bigram occurrences taken by its single most frequent
    bigram — the Gopher-style repetition-filter signal (top-2-gram
    fraction; high values flag boilerplate / TEMPLATED pages).

    Fully vectorized across the batch: one hash_strings pass over every
    token in the batch, adjacent-token uint64 combine for bigram keys
    (document boundaries masked), one lexsort + run-length pass for the
    per-(doc, bigram) counts, and a reduceat for the per-doc max — no
    per-row python in the counting path. Docs with < 2 tokens emit
    n_bigrams=0, ppm=0.

    SQL equivalent (SQL_REPETITION_SCORES): unnest the per-doc bigram
    list, GROUP BY doc/bigram, max(count) * 1000000 // sum(count). Token
    strings cannot contain spaces (whitespace split), so the SQL's
    space-joined bigram string and the 64-bit hash key partition bigrams
    identically (collision odds ~n^2/2^64 — negligible).
    """
    import numpy as np

    from .hashing import hash_strings

    texts = batch.column(text_column).to_pylist()
    nd = len(texts)
    tok_lists = [(t or "").split() for t in texts]
    ntok = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=nd)
    nbig = np.maximum(ntok - 1, 0)
    total = int(ntok.sum())
    batch = batch.append_column("n_bigrams", pa.array(nbig, pa.int64()))
    if total < 2 or int(nbig.sum()) == 0:
        return batch.append_column(
            "top_bigram_ppm", pa.array(np.zeros(nd, dtype=np.int64))
        )
    flat = [w for toks in tok_lists for w in toks]
    h = hash_strings(flat)
    # adjacent-token combine (wrapping uint64, odd multiplier = bijective
    # in each argument); cross-document pairs are masked off below
    big = h[:-1] * np.uint64(0x9E3779B97F4A7C15) + h[1:]
    ends = np.cumsum(ntok)
    valid = np.ones(total - 1, dtype=bool)
    cut = ends[:-1] - 1  # last token of each non-final doc starts no bigram
    cut = cut[(cut >= 0) & (cut < total - 1)]
    valid[cut] = False
    big_sel = big[valid]
    doc_sel = np.repeat(np.arange(nd, dtype=np.int64), nbig)
    order = np.lexsort((big_sel, doc_sel))
    d_s = doc_sel[order]
    b_s = big_sel[order]
    newrun = np.empty(d_s.shape[0], dtype=bool)
    newrun[0] = True
    newrun[1:] = (d_s[1:] != d_s[:-1]) | (b_s[1:] != b_s[:-1])
    starts = np.flatnonzero(newrun)
    run_counts = np.diff(np.append(starts, d_s.shape[0]))
    run_doc = d_s[starts]
    docnew = np.empty(run_doc.shape[0], dtype=bool)
    docnew[0] = True
    docnew[1:] = run_doc[1:] != run_doc[:-1]
    dstarts = np.flatnonzero(docnew)
    dmax = np.maximum.reduceat(run_counts, dstarts)
    mx = np.zeros(nd, dtype=np.int64)
    mx[run_doc[dstarts]] = dmax
    ppm = np.zeros(nd, dtype=np.int64)
    nz = nbig > 0
    ppm[nz] = mx[nz] * 1_000_000 // nbig[nz]
    return batch.append_column("top_bigram_ppm", pa.array(ppm))


# Default redaction patterns: RE2 syntax, valid verbatim in both
# pyarrow.compute (replace_substring_regex / count_substring_regex) and
# DuckDB's regexp_* functions, so the oracle can nest the exact same
# patterns. Order matters: patterns are applied sequentially and each
# one sees the previous one's replacements (SQL nests in the same order).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def scrub_text(
    batch: pa.Table,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
    text_column: str = "text",
) -> pa.Table:
    """Append clean_text / n_redactions / clean_len: sequential regex
    redaction (PII scrub at real scale — emails, phones, IPs) over a
    whole Arrow batch.

    Fully vectorized: one count_substring_regex + one
    replace_substring_regex kernel call per pattern over the entire
    column (RE2, compiled once per call inside Arrow) — no per-row
    python. Null text stays null with n_redactions 0, matching the
    COALESCE in the SQL oracle.
    """
    txt = batch.column(text_column)
    total = pa.array([0] * len(batch), pa.int64())
    for _name, pat, rep in patterns:
        cnt = pc.fill_null(
            pc.cast(pc.count_substring_regex(txt, pattern=pat), pa.int64()),
            0,
        )
        total = pc.add(total, cnt)
        txt = pc.replace_substring_regex(txt, pattern=pat, replacement=rep)
    batch = batch.append_column("clean_text", txt)
    batch = batch.append_column("n_redactions", total)
    return batch.append_column(
        "clean_len",
        pc.fill_null(pc.cast(pc.utf8_length(txt), pa.int64()), 0),
    )
