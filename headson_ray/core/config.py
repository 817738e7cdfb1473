"""Configuration types for the budget-driven tree summarizer.

Semantics follow the reference engine's config surface
(/root/reference/src/serialization/types.rs:18-35 and
/root/reference/src/order/types.rs:1-22) but are re-expressed as plain
Python dataclasses; the execution engine around them is Ray Data, not a
CLI process.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Output templates (reference: src/serialization/types.rs:1-9)
TEMPLATE_AUTO = "auto"
TEMPLATE_JSON = "json"
TEMPLATE_PSEUDO = "pseudo"
TEMPLATE_JS = "js"
TEMPLATE_YAML = "yaml"
TEMPLATE_TEXT = "text"

# Styles (reference: src/serialization/types.rs:11-16)
STYLE_STRICT = "strict"
STYLE_DEFAULT = "default"
STYLE_DETAILED = "detailed"

# Array samplers (reference: src/order/types.rs:53-58)
SAMPLER_DEFAULT = "default"
SAMPLER_HEAD = "head"
SAMPLER_TAIL = "tail"

# Array bias (reference: src/order/types.rs:47-51)
BIAS_HEAD = "head"
BIAS_HEAD_MID_TAIL = "head_mid_tail"


@dataclass
class RenderConfig:
    """Rendering configuration (reference: src/serialization/types.rs:18-35)."""

    template: str = TEMPLATE_AUTO
    indent_unit: str = "  "
    space: str = " "
    newline: str = "\n"
    prefer_tail_arrays: bool = False
    color_enabled: bool = False
    style: str = STYLE_DEFAULT

    def copy_with(self, **kw) -> "RenderConfig":
        d = self.__dict__.copy()
        d.update(kw)
        return RenderConfig(**d)


@dataclass
class PriorityConfig:
    """Priority/sampling configuration (reference: src/order/types.rs:1-22)."""

    max_string_graphemes: int = 500
    array_max_items: int = 250
    prefer_tail_arrays: bool = False
    array_bias: str = BIAS_HEAD_MID_TAIL
    array_sampler: str = SAMPLER_DEFAULT


def map_json_template_for_style(style: str) -> str:
    """JSON-family template per style (reference: src/main.rs:443-451)."""
    return {
        STYLE_STRICT: TEMPLATE_JSON,
        STYLE_DEFAULT: TEMPLATE_PSEUDO,
        STYLE_DETAILED: TEMPLATE_JS,
    }[style]


def format_from_filename(name: str) -> str:
    """Extension -> logical format (reference: src/format.rs:17-33).

    Returns one of 'json' | 'yaml' | 'unknown'.
    """
    # Path::extension: the part after the final '.' of the final component,
    # unless the name starts with '.' and has no other dot.
    base = name.rsplit("/", 1)[-1].rsplit("\\", 1)[-1]
    if "." not in base:
        return "unknown"
    stem, _, ext = base.rpartition(".")
    if stem == "":
        # ".json" has no extension per Path::extension semantics
        return "unknown"
    ext = ext.lower()
    if ext == "json":
        return "json"
    if ext in ("yaml", "yml"):
        return "yaml"
    return "unknown"
