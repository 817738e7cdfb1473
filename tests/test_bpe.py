"""BPE merge learning (q_bpe_merges): the distributed iteration must
equal the classic leftmost-greedy reference algorithm (Sennrich et al.
2016), including the overlapping-occurrence cases the double-separator
replace encoding exists for ([a,a,a] -> [aa,a], [a,b,a,b] -> [ab,ab]).
The DuckDB-oracle parity at sf0.001 is covered by the parametrized test
in test_queries_oracle.py; these pin the algorithm itself on crafted
corpora and the pair-count kernel against brute force."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from headson_ray.pipelines.queries import (
    BPE_SEP,
    BPE_SEP2,
    _bpe_pair_partial,
    q_bpe_merges,
)


def reference_bpe(texts, m):
    """Classic per-word leftmost-greedy BPE on a word-frequency table."""
    wf = Counter(
        w
        for t in texts
        for w in (t or "").split()
        if "\x1f" not in w and "\x1e" not in w
    )
    voc = [(list(w), f) for w, f in wf.items()]
    merges = []
    for rank in range(1, m + 1):
        pc_ = Counter()
        for toks, f in voc:
            for i in range(len(toks) - 1):
                pc_[(toks[i], toks[i + 1])] += f
        if not pc_:
            break
        (a, b), c = min(
            pc_.items(), key=lambda kv: (-kv[1], kv[0][0] + BPE_SEP + kv[0][1])
        )
        merges.append((rank, a, b, c))
        nv = []
        for toks, f in voc:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nv.append((out, f))
        voc = nv
    return merges


def _run(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_bpe_merges(str(tmp_path))
    return list(
        zip(
            out.column("merge_rank").to_pylist(),
            out.column("lhs").to_pylist(),
            out.column("rhs").to_pylist(),
            out.column("pair_count").to_pylist(),
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_bpe_merges_overlapping_occurrences(tmp_path):
    """Overlap semantics: 'aaaa' counts 3 (a,a) pairs but merges
    leftmost-greedy into [aa, aa]; 'abab' merges into [ab, ab]; later
    rounds see the MERGED tokens."""
    texts = ["aaaa abab", "abab abab", "aaaa xy"]
    got = _run(tmp_path, texts)
    exp = reference_bpe(texts, 8)
    assert got == exp
    # the first merge must be the most frequent pair with tie-break
    pc_ = Counter()
    for t in texts:
        for w in t.split():
            for i in range(len(w) - 1):
                pc_[(w[i], w[i + 1])] += 1
    (a, b), c = min(
        pc_.items(), key=lambda kv: (-kv[1], kv[0][0] + BPE_SEP + kv[0][1])
    )
    assert got[0][1:] == (a, b, c)


@pytest.mark.usefixtures("ray_session")
def test_bpe_merges_exhausts_pairs(tmp_path):
    """A corpus of single-char words has no pairs -> zero merges; a
    two-char word yields exactly one."""
    assert _run(tmp_path, ["a b c", "a b"]) == []
    got = _run(tmp_path, ["ab ab a"])
    assert got == [(1, "a", "b", 2)]


@given(
    words=st.lists(
        st.text(
            alphabet=st.sampled_from("abcé中"), min_size=1, max_size=6
        ),
        min_size=0,
        max_size=12,
    ),
    freqs=st.lists(
        st.integers(min_value=1, max_value=9), min_size=12, max_size=12
    ),
)
@settings(max_examples=200, deadline=None)
def test_bpe_pair_partial_equals_brute_force(words, freqs):
    """The vectorized pair-count kernel over encoded vocab rows must
    equal a per-word python count for arbitrary (incl. non-ASCII)
    words."""
    enc = [BPE_SEP + BPE_SEP2.join(w) + BPE_SEP for w in words]
    b = pa.table(
        {
            "s": pa.array(enc, pa.string()),
            "freq": pa.array(freqs[: len(words)], pa.int64()),
        }
    )
    out = _bpe_pair_partial(b)
    got = dict(
        zip(out.column("pair").to_pylist(), out.column("cnt").to_pylist())
    )
    exp: Counter = Counter()
    for w, f in zip(words, freqs):
        for i in range(len(w) - 1):
            exp[w[i] + BPE_SEP + w[i + 1]] += f
    assert got == dict(exp)


@pytest.mark.usefixtures("ray_session")
def test_bpe_merges_driver_bounded(tmp_path, monkeypatch):
    """The iteration's only driver reads are the block-local argmax
    partials: every take_all during q_bpe_merges must deliver <= one
    row per block of a tiny (pair, cnt) table — never the vocab, never
    the corpus — and nothing larger than the merge strings is ray.put
    (no ndarray/dict broadcasts)."""
    import ray
    import ray.data

    texts = ["abab aaaa xyxy", "abab the the quick", "aaaa xyxy the"] * 40
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    put_types = []
    orig_put = ray.put
    taken_sizes = []
    orig_take_all = ray.data.Dataset.take_all

    def spy_put(value, *a, **kw):
        put_types.append(type(value))
        return orig_put(value, *a, **kw)

    def spy_take_all(self, *a, **kw):
        rows = orig_take_all(self, *a, **kw)
        taken_sizes.append(len(rows))
        assert rows and set(rows[0].keys()) == {"pair", "cnt"}, (
            "driver take_all of a non-argmax dataset during bpe_merges"
        )
        return rows

    with monkeypatch.context() as m:
        m.setattr(ray, "put", spy_put)
        m.setattr(ray.data.Dataset, "take_all", spy_take_all)
        out = q_bpe_merges(str(tmp_path))
    assert out.num_rows == 8
    assert taken_sizes and max(taken_sizes) <= 16, taken_sizes
    assert not any(
        tp is np.ndarray or tp is dict for tp in put_types
    ), put_types
