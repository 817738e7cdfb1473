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
