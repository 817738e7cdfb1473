"""Conformance vs the reference's INTERNAL serialization snapshots
(/root/reference/src/serialization/snapshots/*.snap): direct render_top_k
calls with fixed k over hand-configured arenas, mirroring the rust tests
in src/serialization/mod.rs:596-1210.

Not covered (internal-test-harness-only, no public construction path):
array_internal_gaps_yaml (hand-built render ctx via mk_gap_ctx) and the
two src/order debug-dump snapshots.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from headson_ray.core.config import (
    PriorityConfig,
    RenderConfig,
    TEMPLATE_JSON,
    TEMPLATE_JS,
    TEMPLATE_PSEUDO,
    TEMPLATE_YAML,
)
from headson_ray.core.ingest_json import parse_json_one
from headson_ray.core.order import build_order
from headson_ray.core.render import render_top_k

SNAP = Path("/root/reference/src/serialization/snapshots")
BIG = 1 << 62  # usize::MAX stand-in


def _body(name: str) -> str:
    t = (SNAP / f"headson__serialization__tests__{name}.snap").read_text()
    return t[t.index("---\n", 4) + 4:]


def _norm(s: str) -> str:
    return s.rstrip("\n") + "\n"


def _render(src: str, k: int, template: str, style: str,
            *, array_cap: int = BIG, render_tail: bool = False) -> str:
    prio = PriorityConfig(
        max_string_graphemes=BIG,
        array_max_items=array_cap,
        prefer_tail_arrays=False,
    )
    arena = parse_json_one(src, prio)
    order = build_order(arena, prio)
    cfg = RenderConfig(
        template=template,
        indent_unit="  ",
        space=" ",
        newline="\n",
        prefer_tail_arrays=render_tail,
        color_enabled=False,
        style=style,
    )
    return render_top_k(order, k, cfg)


@pytest.mark.parametrize(
    "name,src,k,template,style",
    [
        ("arena_render_empty", "[]", 10, TEMPLATE_JSON, "strict"),
        ("arena_render_empty_yaml", "[]", 10, TEMPLATE_YAML, "default"),
        ("arena_render_single", '["ab"]', 10, TEMPLATE_JSON, "strict"),
        ("arena_render_single_yaml", '["ab"]', 10, TEMPLATE_YAML, "default"),
    ],
)
def test_arena_render(name, src, k, template, style):
    assert _norm(_render(src, k, template, style)) == _norm(_body(name))


@pytest.mark.parametrize(
    "name,template,style,tail",
    [
        ("array_omitted_pseudo_head", TEMPLATE_PSEUDO, "default", False),
        ("array_omitted_pseudo_tail", TEMPLATE_PSEUDO, "default", True),
        ("array_omitted_js_head", TEMPLATE_JS, "detailed", False),
        ("array_omitted_js_tail", TEMPLATE_JS, "detailed", True),
        ("array_omitted_yaml_head", TEMPLATE_YAML, "detailed", False),
        ("array_omitted_yaml_tail", TEMPLATE_YAML, "detailed", True),
    ],
)
def test_array_omitted_markers(name, template, style, tail):
    # mod.rs:712-770: array_max_items=1 forces omitted > 0; k=2
    out = _render(
        "[1,2,3]", 2, template, style, array_cap=1, render_tail=tail
    )
    assert _norm(out) == _norm(_body(name))


@pytest.mark.parametrize(
    "name,template,style",
    [
        ("inline_open_array_in_object_json", TEMPLATE_JSON, "strict"),
        ("inline_open_array_in_object_yaml", TEMPLATE_YAML, "detailed"),
    ],
)
def test_inline_open_array_in_object(name, template, style):
    # mod.rs:939-966,1179-1205: array cap 2, k=4
    out = _render('{"a":[1,2,3]}', 4, template, style, array_cap=2)
    assert _norm(out) == _norm(_body(name))
