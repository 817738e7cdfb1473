"""Hypothesis fuzzing of the per-document engine: for ARBITRARY inputs the
summarizer must never crash, must respect the budget contract, and strict
JSON output must stay parseable."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from headson_ray.core.cli import CliOptions, run_stdin
from headson_ray import summarize

json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(10**15), max_value=10**15)
    | st.floats(allow_nan=False, allow_infinity=False, width=64)
    | st.text(max_size=40),
    lambda children: st.lists(children, max_size=8)
    | st.dictionaries(st.text(max_size=12), children, max_size=8),
    max_leaves=40,
)


@settings(max_examples=150, deadline=None)
@given(v=json_values, budget=st.integers(min_value=0, max_value=400))
def test_strict_json_fuzz(v, budget):
    data = json.dumps(v)
    out = run_stdin(
        CliOptions(budget=budget, format="json", style="strict"), data
    )
    parsed = json.loads(out)  # always valid JSON
    # full-budget render round-trips the value exactly
    full = run_stdin(
        CliOptions(budget=10**9, format="json", style="strict"), data
    )
    assert json.loads(full) == v


@settings(max_examples=120, deadline=None)
@given(v=json_values, budget=st.integers(min_value=0, max_value=300))
def test_pseudo_budget_contract_fuzz(v, budget):
    data = json.dumps(v)
    opts = CliOptions(budget=budget, format="json", style="default")
    out = run_stdin(opts, data)
    min_out = run_stdin(
        CliOptions(budget=0, format="json", style="default"), data
    )
    blen = len(out.encode())
    assert blen <= budget or blen == len(min_out.encode())


@settings(max_examples=100, deadline=None)
@given(text=st.text(max_size=300), budget=st.integers(min_value=0,
                                                      max_value=200))
def test_text_mode_never_crashes(text, budget):
    out = summarize(
        text, format="text", style="default", input_format="text",
        character_budget=budget,
    )
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(data=st.binary(max_size=200))
def test_arbitrary_bytes_never_crash_engine(data):
    # json may reject (ValueError family) but must never crash the
    # process or hang; text mode must always succeed
    try:
        run_stdin(CliOptions(budget=100, format="json", style="strict"), data)
    except Exception:
        pass
    out = run_stdin(
        CliOptions(budget=100, format="text", input_format="text"), data
    )
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(text=st.text(max_size=150), budget=st.integers(min_value=0,
                                                      max_value=200))
def test_yaml_input_never_crashes(text, budget):
    # YAML ingest either parses or raises a clean parse error
    try:
        out = run_stdin(
            CliOptions(budget=budget, format="yaml", input_format="yaml"),
            text,
        )
        assert isinstance(out, str)
    except Exception as e:
        assert type(e).__name__ in ("YamlParseError", "ValueError"), e


@settings(max_examples=200, deadline=None)
@given(strs=st.lists(st.text(max_size=40), max_size=30))
def test_hash_strings_matches_int_reference(strs):
    """The vectorized U-matrix/unpad path must equal the python-int
    Horner+mix reference for arbitrary unicode strings (incl. embedded
    NULs, empty strings, astral-plane codepoints)."""
    import numpy as np

    from headson_ray.stages.hashing import hash_strings, horner_hash_int

    got = hash_strings(strs)
    exp = np.array([horner_hash_int(s) for s in strs], dtype=np.uint64)
    assert (got == exp).all() if len(strs) else got.size == 0


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=400,
    ),
    data=st.data(),
)
def test_rank_select_matches_sorted_selection(ray_session, vals, data):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from headson_ray.stages.sketch import rank_select

    k = data.draw(st.integers(min_value=0, max_value=len(vals) - 1))
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.float64())})
    )
    got = rank_select(ds, "v", [k], num_bins=8, collect_cap=16)
    assert got[0] == float(np.sort(np.asarray(vals))[k])


@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(max_size=120)), max_size=12
    ),
    k=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=150, deadline=None)
def test_word_shingle_arrays_equals_per_doc_kernel(texts, k):
    """The batch-vectorized shingle kernel must emit byte-identical
    per-doc arrays to the scalar kernel for arbitrary unicode text
    (whitespace variety, empty docs, None, short-doc k fallback)."""
    import numpy as np

    from headson_ray.stages.dedup import (
        word_shingle_array,
        word_shingle_arrays,
    )

    batch = word_shingle_arrays(texts, k)
    assert len(batch) == len(texts)
    for t, got in zip(texts, batch):
        want = word_shingle_array(t or "", k)
        assert got.dtype == np.uint64
        assert np.array_equal(got, want)


@given(
    keys=st.lists(st.sampled_from(["a", "b", "c"]), max_size=40),
    k=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=120, deadline=None)
def test_trim_topk_runs_equals_per_key_head(keys, k):
    """_trim_topk_runs on a sorted table == take the first k rows of
    each key group (the partial-trim contract every grouped top-k
    relies on)."""
    import pyarrow as pa

    from headson_ray.pipelines.queries import _trim_topk_runs

    keys = sorted(keys)
    vals = list(range(len(keys)))
    t = pa.table({"key": pa.array(keys), "v": pa.array(vals)})
    got = _trim_topk_runs(t, ["key"], k)
    expected = []
    seen: dict = {}
    for key, v in zip(keys, vals):
        seen[key] = seen.get(key, 0) + 1
        if seen[key] <= k:
            expected.append((key, v))
    assert list(zip(got.column("key").to_pylist(),
                    got.column("v").to_pylist())) == expected


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.sampled_from("ab é中"), max_size=40
            ),
        ),
        max_size=10,
    ),
    window=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=150, deadline=None)
def test_substring_dup_spans_equal_brute_force(texts, window):
    """The three substring-dedup kernels composed in-process must equal
    an O(n^2) brute force over arbitrary (incl. non-ASCII, empty, None)
    docs: positions are codepoint offsets, duplication counts every
    occurrence corpus-wide (within-doc repeats included), and spans at
    gap <= window merge."""
    from collections import Counter

    import pyarrow as pa

    from headson_ray.stages.dedup import (
        substring_bucket_dups,
        substring_merge_spans,
        substring_window_explode,
    )

    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ex = substring_window_explode(b, window=window)
    spans = substring_merge_spans(
        substring_bucket_dups(ex), window=window
    )
    got = sorted(
        zip(
            spans.column("doc_id").to_pylist(),
            spans.column("span_start").to_pylist(),
            spans.column("span_end").to_pylist(),
        )
    )

    c = Counter()
    for t in texts:
        t = t or ""
        for p in range(len(t) - window + 1):
            c[t[p : p + window]] += 1
    exp = []
    for i, t in enumerate(texts):
        t = t or ""
        run: list[int] = []
        for p in range(len(t) - window + 1):
            if c[t[p : p + window]] < 2:
                continue
            if run and p - run[-1] <= window:
                run.append(p)
            else:
                if run:
                    exp.append((i, run[0], run[-1] + window))
                run = [p]
        if run:
            exp.append((i, run[0], run[-1] + window))
    assert got == sorted(exp)
