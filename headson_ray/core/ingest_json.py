"""JSON ingest: parse bytes into a TreeArena with in-parse array sampling.

Semantics mirror the reference's streaming simd-json visitor
(/root/reference/src/json_ingest/mod.rs:18-58, builder.rs:157-276): number
tokens are canonicalized through the serde/Ryu rules, duplicate object keys
are preserved, arrays are sampled by the configured strategy. Because the
samplers are pure functions of (index, cap), sampling after a full parse is
bit-identical to sampling during the stream.
"""

from __future__ import annotations

import json

from .arena import TreeArena
from .config import PriorityConfig
from .numbers import float_token, int_token
from .samplers import sample_indices


class _RawNum:
    __slots__ = ("token",)

    def __init__(self, token: str) -> None:
        self.token = token


class _Pairs:
    """Object as ordered (key, value) pairs; duplicates preserved."""

    __slots__ = ("pairs",)

    def __init__(self, pairs) -> None:
        self.pairs = pairs


def _reject_constant(name: str):
    # simd-json rejects NaN/Infinity literals; Python's json would accept.
    raise ValueError(f"invalid JSON constant: {name}")


_DECODER = json.JSONDecoder(
    parse_int=lambda raw: _RawNum(int_token(raw)),
    parse_float=lambda raw: _RawNum(float_token(raw)),
    parse_constant=_reject_constant,
    object_pairs_hook=_Pairs,
)


class JsonParseError(ValueError):
    pass


def _parse(data: bytes | str):
    if isinstance(data, (bytes, bytearray, memoryview)):
        try:
            data = bytes(data).decode("utf-8")
        except UnicodeDecodeError as e:
            raise JsonParseError(f"invalid UTF-8: {e}") from e
    try:
        return _DECODER.decode(data)
    except (ValueError, RecursionError) as e:
        raise JsonParseError(str(e)) from e


def _build_value(arena: TreeArena, value, cfg: PriorityConfig) -> int:
    """Recursively add a parsed value to the arena; returns node id."""
    t = type(value)
    if t is str:
        return arena.push_string(value)
    if t is _RawNum:
        return arena.push_number_token(value.token)
    if t is bool:
        return arena.push_bool(value)
    if value is None:
        return arena.push_null()
    if t is list:
        total = len(value)
        kept_idx = sample_indices(total, cfg.array_max_items, cfg.array_sampler)
        child_ids = [_build_value(arena, value[i], cfg) for i in kept_idx]
        return arena.push_array(child_ids, total, kept_idx)
    if t is _Pairs:
        keys = []
        child_ids = []
        for k, v in value.pairs:
            keys.append(k)
            child_ids.append(_build_value(arena, v, cfg))
        return arena.push_object(keys, child_ids)
    raise JsonParseError(f"unsupported JSON value type: {t!r}")


def parse_json_one(data: bytes | str, cfg: PriorityConfig) -> TreeArena:
    """Single document -> arena (reference: json_ingest/mod.rs:18-34)."""
    value = _parse(data)
    arena = TreeArena()
    arena.root_id = _build_value(arena, value, cfg)
    return arena


def parse_json_many(
    inputs: list[tuple[str, bytes | str]], cfg: PriorityConfig
) -> TreeArena:
    """Fileset: N named documents under a synthetic object root
    (reference: json_ingest/mod.rs:36-58)."""
    arena = TreeArena()
    keys = []
    child_ids = []
    for name, data in inputs:
        value = _parse(data)
        keys.append(name)
        child_ids.append(_build_value(arena, value, cfg))
    arena.root_id = arena.push_object(keys, child_ids)
    arena.is_fileset = True
    return arena
