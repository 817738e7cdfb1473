"""YAML ingest: event-stream parse into a TreeArena.

Mirrors /root/reference/src/yaml_ingest/mod.rs — multi-doc inputs wrap in
an array root, sequences keep a head-contiguous cap, non-string mapping
keys canonicalize to deterministic strings, aliases resolve to a clone of
the anchored value (unresolvable ones become null). Plain-scalar typing
follows the reference loader's resolution rules (null/bool/i64/f64, with
floats keeping their raw source token).

Implementation uses pyyaml's event stream (not its loader) so that quoted
vs plain style and explicit tags are visible, which pyyaml's high-level
loader hides.
"""

from __future__ import annotations

import re

import yaml

from .arena import TreeArena
from .config import PriorityConfig

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_HEX_RE = re.compile(r"^[0-9a-fA-F]+$")
_OCT_RE = re.compile(r"^[0-7]+$")
_FLOAT_RE = re.compile(
    r"^[+-]?("
    r"inf(inity)?|nan|"
    r"[0-9]+\.?[0-9]*([eE][+-]?[0-9]+)?|"
    r"\.[0-9]+([eE][+-]?[0-9]+)?"
    r")$",
    re.IGNORECASE,
)
_SPECIAL_INF_NAN = {
    ".inf", "+.inf", "-.inf", ".Inf", "+.Inf", "-.Inf",
    ".INF", "+.INF", "-.INF", ".nan", ".NaN", ".NAN",
}

_I64_MIN = -(1 << 63)
_I64_MAX = (1 << 63) - 1

# Intermediate value tags (a tiny Yaml-enum equivalent)
V_NULL = ("null", None)


class YamlParseError(ValueError):
    pass


def _resolve_plain(v: str):
    """Plain scalar -> typed value (reference loader's from_str rules)."""
    if v.startswith("0x") and len(v) > 2 and _HEX_RE.match(v[2:]):
        i = int(v[2:], 16)
        if i <= _I64_MAX:
            return ("int", str(i))
    if v.startswith("0o") and len(v) > 2 and _OCT_RE.match(v[2:]):
        i = int(v[2:], 8)
        if i <= _I64_MAX:
            return ("int", str(i))
    if v in ("~", "null"):
        return V_NULL
    if v == "true":
        return ("bool", "true")
    if v == "false":
        return ("bool", "false")
    if _INT_RE.match(v):
        i = int(v)
        if _I64_MIN <= i <= _I64_MAX:
            return ("int", str(i))
    if v in _SPECIAL_INF_NAN or _FLOAT_RE.match(v):
        return ("real", v)
    return ("str", v)


def _resolve_tagged(tag: str, v: str):
    suffix = tag.rsplit(":", 1)[-1]
    if suffix == "str":
        return ("str", v)
    if suffix == "int":
        if _INT_RE.match(v):
            return ("int", str(int(v)))
        return V_NULL
    if suffix == "float":
        if v in _SPECIAL_INF_NAN or _FLOAT_RE.match(v):
            return ("real", v)
        return V_NULL
    if suffix == "bool":
        if v in ("true", "True"):
            return ("bool", "true")
        if v in ("false", "False"):
            return ("bool", "false")
        return V_NULL
    if suffix == "null":
        return V_NULL
    return ("str", v)


def _parse_docs(text: str) -> list:
    """Parse a YAML stream into a list of per-document value trees."""
    docs = []
    anchors: dict[str, object] = {}
    stack: list = []  # (kind, items/pairs, pending_key, anchor)
    try:
        for ev in yaml.parse(text):
            if isinstance(ev, yaml.StreamStartEvent):
                continue
            if isinstance(ev, yaml.StreamEndEvent):
                break
            if isinstance(ev, yaml.DocumentStartEvent):
                anchors = {}
                stack = [("doc", [], None, None)]
                continue
            if isinstance(ev, yaml.DocumentEndEvent):
                items = stack[0][1]
                docs.append(items[0] if items else V_NULL)
                stack = []
                continue
            if isinstance(ev, yaml.AliasEvent):
                _emit(stack, anchors.get(ev.anchor, V_NULL))
                continue
            if isinstance(ev, yaml.ScalarEvent):
                if ev.style in ("'", '"', "|", ">"):
                    val = ("str", ev.value)
                elif ev.tag is not None:
                    val = _resolve_tagged(ev.tag, ev.value)
                else:
                    val = _resolve_plain(ev.value)
                if ev.anchor:
                    anchors[ev.anchor] = val
                _emit(stack, val)
                continue
            if isinstance(ev, yaml.SequenceStartEvent):
                stack.append(("arr", [], None, ev.anchor))
                continue
            if isinstance(ev, yaml.MappingStartEvent):
                stack.append(("map", [], None, ev.anchor))
                continue
            if isinstance(
                ev, (yaml.SequenceEndEvent, yaml.MappingEndEvent)
            ):
                kind, items, _, anchor = stack.pop()
                val = (kind, items)
                if anchor:
                    anchors[anchor] = val
                _emit(stack, val)
                continue
    except yaml.YAMLError as e:
        raise YamlParseError(str(e)) from e
    return docs


def _emit(stack: list, val) -> None:
    kind, items, pending_key, anchor = stack[-1]
    if kind == "map":
        if pending_key is None:
            stack[-1] = (kind, items, val, anchor)
        else:
            items.append((pending_key, val))
            stack[-1] = (kind, items, None, anchor)
    else:
        items.append(val)


def _stringify_key(val) -> str:
    """Canonical key text (reference: yaml_ingest/mod.rs:221-248)."""
    kind, payload = val[0], val[1]
    if kind == "null":
        return "null"
    if kind in ("bool", "int", "real", "str"):
        return payload
    if kind == "arr":
        return "[" + ", ".join(_stringify_key(v) for v in payload) + "]"
    if kind == "map":
        items = sorted(
            (_stringify_key(k), _stringify_key(v)) for k, v in payload
        )
        return "{" + ", ".join(f"{k}: {v}" for k, v in items) + "}"
    return "null"


def _build(arena: TreeArena, val, cap: int) -> int:
    kind, payload = val[0], val[1]
    if kind == "str":
        return arena.push_string(payload)
    if kind == "int" or kind == "real":
        return arena.push_number_token(payload)
    if kind == "bool":
        return arena.push_bool(payload == "true")
    if kind == "null":
        return arena.push_null()
    if kind == "arr":
        total = len(payload)
        kept = min(total, cap)
        child_ids = [_build(arena, v, cap) for v in payload[:kept]]
        return arena.push_array(child_ids, total)
    if kind == "map":
        keys = []
        child_ids = []
        for k, v in payload:
            keys.append(_stringify_key(k))
            child_ids.append(_build(arena, v, cap))
        return arena.push_object(keys, child_ids)
    return arena.push_null()


def _doc_root(arena: TreeArena, docs: list, cap: int) -> int:
    if len(docs) == 0:
        return arena.push_array([], 0)
    if len(docs) == 1:
        return _build(arena, docs[0], cap)
    # Multi-doc input wraps in an array root (yaml_ingest/mod.rs:16-28)
    total = len(docs)
    kept = min(total, cap)
    child_ids = [_build(arena, d, cap) for d in docs[:kept]]
    return arena.push_array(child_ids, total)


def _decode(data: bytes | str) -> str:
    if isinstance(data, (bytes, bytearray, memoryview)):
        try:
            return bytes(data).decode("utf-8")
        except UnicodeDecodeError as e:
            raise YamlParseError("input is not valid UTF-8 text") from e
    return data


def parse_yaml_one(data: bytes | str, cfg: PriorityConfig) -> TreeArena:
    docs = _parse_docs(_decode(data))
    arena = TreeArena()
    arena.root_id = _doc_root(arena, docs, cfg.array_max_items)
    return arena


def parse_yaml_many(
    inputs: list[tuple[str, bytes | str]], cfg: PriorityConfig
) -> TreeArena:
    arena = TreeArena()
    keys = []
    child_ids = []
    for name, data in inputs:
        docs = _parse_docs(_decode(data))
        keys.append(name)
        child_ids.append(_doc_root(arena, docs, cfg.array_max_items))
    arena.root_id = arena.push_object(keys, child_ids)
    arena.is_fileset = True
    return arena
