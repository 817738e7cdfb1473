"""Public per-document API: parse -> rank -> fit, plus the `summarize`
convenience wrapper mirroring the reference's Python binding
(/root/reference/python/src/lib.rs:95-124) and CLI derivations
(/root/reference/src/main.rs:161-185,416-433).
"""

from __future__ import annotations

from .config import (
    PriorityConfig,
    RenderConfig,
    SAMPLER_DEFAULT,
    SAMPLER_HEAD,
    SAMPLER_TAIL,
    STYLE_DEFAULT,
    TEMPLATE_TEXT,
    TEMPLATE_YAML,
    map_json_template_for_style,
)
from .fit import find_largest_render_under_budget
from .ingest_json import parse_json_many, parse_json_one
from .ingest_text import parse_text_many, parse_text_one
from .ingest_yaml import parse_yaml_many, parse_yaml_one
from .order import build_order

_PARSE_ONE = {
    "json": parse_json_one,
    "yaml": parse_yaml_one,
    "text": parse_text_one,
}
_PARSE_MANY = {
    "json": parse_json_many,
    "yaml": parse_yaml_many,
    "text": parse_text_many,
}

_BUILTIN_FORMATS = frozenset(_PARSE_ONE)


def register_format(
    name: str,
    parse_one,
    parse_many=None,
    *,
    replace: bool = False,
) -> None:
    """Format-extension point mirroring the reference's ``Ingest`` trait
    (/root/reference/src/ingest/mod.rs:6-14): register an input format so
    ``headson``/``headson_many``/``summarize(input_format=name)`` accept
    it without editing this module.

    - ``parse_one(data, priority_cfg) -> arena`` parses a single document
      (the trait's ``ingest``);
    - ``parse_many(inputs, priority_cfg) -> arena`` parses a named fileset
      into one arena (the trait's ``ingest_many``); optional — fileset
      calls raise for formats registered without it.

    Built-in formats (json/yaml/text) cannot be replaced; a duplicate
    third-party registration needs ``replace=True``.

    Registration is PER-PROCESS: it mutates this module's dispatch in
    the calling interpreter only. For the distributed path, pass the
    same formats to ``Summarizer(formats={name: parse_one})`` so each
    Ray worker re-registers them in its own process.
    """
    key = name.lower()
    if key in _BUILTIN_FORMATS:
        raise ValueError(f"cannot replace built-in format: {key}")
    if key in _PARSE_ONE and not replace:
        raise ValueError(f"format already registered: {key}")
    if not callable(parse_one):
        raise TypeError("parse_one must be callable")
    _PARSE_ONE[key] = parse_one
    if parse_many is not None:
        _PARSE_MANY[key] = parse_many
    else:
        _PARSE_MANY.pop(key, None)


def unregister_format(name: str) -> None:
    """Remove a third-party format registered via register_format."""
    key = name.lower()
    if key in _BUILTIN_FORMATS:
        raise ValueError(f"cannot unregister built-in format: {key}")
    _PARSE_ONE.pop(key, None)
    _PARSE_MANY.pop(key, None)


def registered_formats() -> list[str]:
    """All input formats currently accepted (built-ins first)."""
    return sorted(_PARSE_ONE, key=lambda k: (k not in _BUILTIN_FORMATS, k))


def _lookup_format(table: dict, input_format: str):
    """Dispatch lookup symmetric with register_format's key folding:
    registered names are stored lowercased, so 'CSV' must reach a
    format registered as 'CSV'. Built-in names stay case-sensitive
    (reference parity: 'JSON' is an error)."""
    try:
        return table[input_format]
    except KeyError:
        key = input_format.lower()
        if key in table and key not in _BUILTIN_FORMATS:
            return table[key]
        raise


def headson(
    data: bytes | str,
    config: RenderConfig,
    priority_cfg: PriorityConfig,
    budget: int,
    input_format: str = "json",
) -> str:
    """Single-document summarize (reference: src/lib.rs:41-115)."""
    arena = _lookup_format(_PARSE_ONE, input_format)(data, priority_cfg)
    order = build_order(arena, priority_cfg, stop_after=max(budget, 1))
    return find_largest_render_under_budget(order, config, budget)


def headson_many(
    inputs: list[tuple[str, bytes | str]],
    config: RenderConfig,
    priority_cfg: PriorityConfig,
    budget: int,
    input_format: str = "json",
) -> str:
    """Fileset summarize: one shared budget across named inputs."""
    try:
        parser = _lookup_format(_PARSE_MANY, input_format)
    except KeyError:
        parser = None
    if parser is None:
        raise ValueError(
            f"format {input_format!r} has no fileset parser "
            "(register_format(parse_many=...))"
        )
    arena = parser(inputs, priority_cfg)
    order = build_order(arena, priority_cfg, stop_after=max(budget, 1))
    return find_largest_render_under_budget(order, config, budget)


def headson_yaml(data, config, priority_cfg, budget):
    """Drop-in alias for the reference's `headson_yaml` (src/lib.rs:60-68)."""
    return headson(data, config, priority_cfg, budget, input_format="yaml")


def headson_text(data, config, priority_cfg, budget):
    """Drop-in alias for the reference's `headson_text` (src/lib.rs:88-96)."""
    return headson(data, config, priority_cfg, budget, input_format="text")


def headson_many_yaml(inputs, config, priority_cfg, budget):
    """Alias for the reference's `headson_many_yaml` (src/lib.rs:70-86)."""
    return headson_many(inputs, config, priority_cfg, budget, input_format="yaml")


def headson_many_text(inputs, config, priority_cfg, budget):
    """Alias for the reference's `headson_many_text` (src/lib.rs:98-114)."""
    return headson_many(inputs, config, priority_cfg, budget, input_format="text")


def _map_output_template(fmt: str, style: str) -> str:
    f = fmt.lower()
    if f in ("auto", "json"):
        return map_json_template_for_style(style)
    if f in ("yaml", "yml"):
        return TEMPLATE_YAML
    if f == "text":
        return TEMPLATE_TEXT
    raise ValueError(f"unknown format: {fmt}")


def _parse_skew(skew: str) -> str:
    s = skew.lower()
    if s == "balanced":
        return SAMPLER_DEFAULT
    if s == "head":
        return SAMPLER_HEAD
    if s == "tail":
        return SAMPLER_TAIL
    raise ValueError(f"unknown skew: {skew}")


def summarize(
    text: str,
    *,
    format: str = "auto",
    style: str = STYLE_DEFAULT,
    character_budget: int | None = None,
    skew: str = "balanced",
    input_format: str = "json",
) -> str:
    """Drop-in equivalent of the reference's ``headson.summarize``
    (python/src/lib.rs:95-124): budget default 500, string cap 500,
    array cap = max(1, budget // 2)."""
    sampler = _parse_skew(skew)
    style = style.lower()
    if style not in ("strict", "default", "detailed"):
        raise ValueError(f"unknown style: {style}")
    budget = 500 if character_budget is None else character_budget
    prefer_tail = sampler == SAMPLER_TAIL
    cfg = RenderConfig(
        template=_map_output_template(format, style),
        indent_unit="  ",
        space=" ",
        newline="\n",
        prefer_tail_arrays=prefer_tail,
        color_enabled=False,
        style=style,
    )
    prio = PriorityConfig(
        max_string_graphemes=500,
        array_max_items=max(1, max(budget, 1) // 2),
        prefer_tail_arrays=prefer_tail,
        array_sampler=sampler,
    )
    ifmt = input_format.lower()
    if ifmt == "yml":
        ifmt = "yaml"
    if ifmt not in _PARSE_ONE:
        raise ValueError(f"unknown input_format: {input_format}")
    return headson(text, cfg, prio, budget, input_format=ifmt)
