"""Python-binding parity: mirrors the reference's tests_py suite
(tests_py/test_summarize.py, test_text_mode.py, test_yaml_styles.py)
against our `headson_ray.summarize`, which is a drop-in equivalent of the
reference's `headson.summarize` (python/src/lib.rs:95-124).
"""

from __future__ import annotations

import json
import textwrap

import pytest

from headson_ray import summarize


def test_summarize_json_roundtrip():
    out = summarize(
        '{"a": 1, "b": {"c": 2}}',
        format="json", style="strict", character_budget=10_000,
    )
    obj = json.loads(out)
    assert obj["a"] == 1 and obj["b"]["c"] == 2


@pytest.mark.parametrize(
    "fmt,style",
    [("json", "strict"), ("json", "default"), ("json", "detailed"),
     ("yaml", "default")],
)
def test_summarize_budget_affects_length(fmt, style):
    text = json.dumps({"arr": list(range(100))})
    small = summarize(text, format=fmt, style=style, character_budget=40)
    large = summarize(text, format=fmt, style=style, character_budget=400)
    assert len(small) <= len(large)


def test_pseudo_shows_ellipsis_on_truncation():
    text = json.dumps({"arr": list(range(50))})
    out = summarize(text, format="json", style="default", character_budget=30)
    assert "…" in out


def test_js_shows_comment_on_truncation():
    text = json.dumps({"arr": list(range(50))})
    out = summarize(text, format="json", style="detailed", character_budget=30)
    assert "/*" in out and "more" in out


def test_exact_string_output_json_template():
    assert summarize(
        '"hello"', format="json", style="strict", character_budget=100
    ) == '"hello"'


def test_tail_affects_arrays_pseudo():
    text = json.dumps(list(range(50)))
    out_tail = summarize(
        text, format="json", style="default", character_budget=30, skew="tail"
    )
    out_head = summarize(
        text, format="json", style="default", character_budget=30,
        skew="balanced",
    )
    assert out_tail != out_head
    lines = out_tail.splitlines()
    idx = next(i for i, line in enumerate(lines) if line.strip() == "[")
    following = next(
        (line.strip() for line in lines[idx + 1:] if line.strip()), ""
    )
    assert following.startswith("…"), out_tail


def test_tail_json_remains_strict():
    text = json.dumps(list(range(50)))
    out = summarize(
        text, format="json", style="strict", character_budget=30, skew="tail"
    )
    json.loads(out)
    assert "…" not in out and "/*" not in out


def test_head_affects_arrays_pseudo():
    text = json.dumps(list(range(50)))
    out = summarize(
        text, format="json", style="default", character_budget=30, skew="head"
    )
    lines = out.splitlines()
    idx = max(i for i, line in enumerate(lines) if line.strip() == "]")
    preceding = next(
        (line.strip() for line in reversed(lines[:idx]) if line.strip()), ""
    )
    assert preceding.startswith("…"), out


def test_head_json_remains_strict():
    text = json.dumps(list(range(50)))
    out = summarize(
        text, format="json", style="strict", character_budget=30, skew="head"
    )
    json.loads(out)
    assert "…" not in out and "/*" not in out


# --- text mode (tests_py/test_text_mode.py) -------------------------------

def test_text_mode_basic_lines_default_style():
    out = summarize(
        "one\ntwo\nthree\n",
        format="text", style="default", input_format="text",
        character_budget=100,
    )
    assert out.splitlines()[:3] == ["one", "two", "three"]
    assert '"one"' not in out


def test_text_mode_omission_marker_under_budget():
    text = "\n".join(f"line{i}" for i in range(20)) + "\n"
    out = summarize(
        text, format="text", style="default", input_format="text",
        character_budget=20,
    )
    assert "…\n" in out


def test_text_mode_strict_truncates_without_marker():
    text = "\n".join(f"line{i}" for i in range(50)) + "\n"
    out = summarize(
        text, format="text", style="strict", input_format="text",
        character_budget=30,
    )
    assert " more lines " not in out
    assert "line49\n" not in out


def test_text_mode_detailed_shows_count():
    text = "\n".join(f"line{i}" for i in range(50)) + "\n"
    out = summarize(
        text, format="text", style="detailed", input_format="text",
        character_budget=30,
    )
    assert "…" in out and " more lines " in out


def test_text_mode_tail_places_marker_at_start():
    text = "\n".join(f"line{i}" for i in range(30)) + "\n"
    out = summarize(
        text, format="text", style="default", input_format="text",
        skew="tail", character_budget=40,
    )
    assert (out.splitlines()[0] if out else "") == "…"


# --- yaml styles (tests_py/test_yaml_styles.py) ----------------------------

def _yaml_sample() -> str:
    return textwrap.dedent(
        """
        root:
          items: [1,2,3,4,5,6,7,8,9,10]
          obj:
            a: 1
            b: 2
            c: 3
            d: 4
        """
    ).strip()


def test_yaml_default_uses_ellipsis_comment():
    out = summarize(
        _yaml_sample(), format="yaml", style="default", input_format="yaml",
        character_budget=60,
    )
    assert "# …" in out, out


def test_yaml_strict_has_no_comments():
    out = summarize(
        _yaml_sample(), format="yaml", style="strict", input_format="yaml",
        character_budget=60,
    )
    assert "#" not in out, out


def test_yaml_detailed_shows_counts():
    out = summarize(
        _yaml_sample(), format="yaml", style="detailed", input_format="yaml",
        character_budget=60,
    )
    assert "more items" in out or "more properties" in out, out


# --- U2: the Ingest extension surface (reference src/ingest/mod.rs:6-14) ---
def test_register_format_end_to_end_through_summarizer():
    """A third-party format registered via register_format must flow
    through summarize(), headson() and the Ray Summarizer stage without
    editing core modules."""
    import pyarrow as pa

    from headson_ray import register_format, registered_formats, unregister_format
    from headson_ray.core.ingest_text import parse_text_many, parse_text_one
    from headson_ray.stages.summarize import Summarizer

    def parse_upper_one(data, prio):
        if isinstance(data, bytes):
            data = data.decode("utf-8", errors="replace")
        return parse_text_one(data.upper(), prio)

    def parse_upper_many(inputs, prio):
        up = [
            (n, (d.decode("utf-8", "replace") if isinstance(d, bytes) else d).upper())
            for n, d in inputs
        ]
        return parse_text_many(up, prio)

    register_format("upper", parse_upper_one, parse_upper_many)
    try:
        assert "upper" in registered_formats()
        out = summarize("hello world", input_format="upper",
                        format="text", character_budget=100)
        assert "HELLO WORLD" in out
        # the Ray map_batches stage dispatches through the same registry
        s = Summarizer(budget=100, format="text", input_format="upper")
        batch = pa.table({"text": pa.array(["abc def", None])})
        got = s(batch)
        assert "ABC DEF" in got.column("preview")[0].as_py()
        assert got.column("summarize_error")[1].as_py() == "null input"
        # fileset path
        from headson_ray import headson_many
        from headson_ray.core.config import PriorityConfig, RenderConfig
        from headson_ray.core.config import TEMPLATE_TEXT

        cfg = RenderConfig(template=TEMPLATE_TEXT, indent_unit="  ",
                           space=" ", newline="\n",
                           prefer_tail_arrays=False, color_enabled=False,
                           style="default")
        prio = PriorityConfig(max_string_graphemes=100, array_max_items=50,
                              prefer_tail_arrays=False)
        many = headson_many([("a.up", "x y"), ("b.up", "z w")], cfg, prio,
                            200, input_format="upper")
        assert "X Y" in many and "Z W" in many
    finally:
        unregister_format("upper")
    assert "upper" not in registered_formats()


def test_register_format_guards():
    import pytest as _pytest

    from headson_ray import register_format, unregister_format
    from headson_ray.core.ingest_text import parse_text_one

    with _pytest.raises(ValueError, match="built-in"):
        register_format("json", parse_text_one)
    with _pytest.raises(ValueError, match="built-in"):
        unregister_format("text")
    register_format("toy2", parse_text_one)
    try:
        with _pytest.raises(ValueError, match="already registered"):
            register_format("toy2", parse_text_one)
        register_format("toy2", parse_text_one, replace=True)
        # registered without parse_many: fileset use raises cleanly
        from headson_ray import headson_many
        from headson_ray.core.config import (
            PriorityConfig,
            RenderConfig,
            TEMPLATE_TEXT,
        )

        cfg = RenderConfig(template=TEMPLATE_TEXT, indent_unit="  ",
                           space=" ", newline="\n",
                           prefer_tail_arrays=False, color_enabled=False,
                           style="default")
        prio = PriorityConfig(max_string_graphemes=100, array_max_items=50,
                              prefer_tail_arrays=False)
        with _pytest.raises(ValueError, match="no fileset parser"):
            headson_many([("a", "x")], cfg, prio, 100, input_format="toy2")
    finally:
        unregister_format("toy2")


@pytest.mark.usefixtures("ray_session")
def test_registered_format_reaches_ray_workers():
    """register_format mutates only the driver process; the distributed
    path must carry third-party formats through the Summarizer
    constructor so every Ray worker re-registers them locally."""
    import pyarrow as pa
    import ray.data

    from headson_ray.core.api import registered_formats
    from headson_ray.stages.summarize import Summarizer

    # defined INSIDE the test: cloudpickle ships closures by value —
    # a module-level function in a pytest-imported test file pickles by
    # reference to a module Ray workers cannot import (restart loop)
    def _parse_shout_one(data, prio):
        from headson_ray.core.ingest_text import parse_text_one

        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        return parse_text_one(data.upper() + "!", prio)

    assert "shout" not in registered_formats()  # NOT driver-registered
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(["hello world", "abc"])})
    )
    out = ds.map_batches(
        Summarizer,
        fn_constructor_kwargs=dict(
            budget=100,
            format="text",
            input_format="shout",
            formats={"shout": _parse_shout_one},
        ),
        concurrency=(1, 2),
        batch_format="pyarrow",
    ).to_pandas()
    assert "HELLO WORLD!" in out["preview"][0]
    # the driver's own registry stayed untouched
    assert "shout" not in registered_formats()


def test_register_format_case_symmetric_lookup():
    """A format registered as 'CSV' (stored lowercased) must be
    reachable via summarize(input_format='CSV'); at the lower-level
    headson() API, BUILT-IN names stay case-sensitive ('JSON' is a
    KeyError) while registered names fold case symmetrically with
    register_format."""
    from headson_ray import summarize
    from headson_ray.core.api import (
        headson,
        register_format,
        unregister_format,
    )
    from headson_ray.core.config import PriorityConfig, RenderConfig
    from headson_ray.core.config import TEMPLATE_JSON
    from headson_ray.core.ingest_text import parse_text_one

    register_format("CSV", lambda d, p: parse_text_one(
        (d.decode() if isinstance(d, bytes) else d).replace(",", " | "), p
    ))
    try:
        out = summarize("a,b,c", input_format="CSV", format="text",
                        character_budget=100)
        assert "a | b | c" in out
        out = summarize("a,b,c", input_format="csv", format="text",
                        character_budget=100)
        assert "a | b | c" in out
        # the lower-level API reaches the registered name verbatim AND
        # via register_format's lowercased key
        cfg = RenderConfig(template=TEMPLATE_JSON, indent_unit="  ",
                           space=" ", newline="\n",
                           prefer_tail_arrays=False, color_enabled=False,
                           style="default")
        prio = PriorityConfig(max_string_graphemes=100,
                              array_max_items=50,
                              prefer_tail_arrays=False)
        with pytest.raises(KeyError):
            headson("{}", cfg, prio, 50, input_format="JSON")
    finally:
        unregister_format("CSV")
