"""Text ingest: lossy-decode bytes into an array-of-lines tree.

Mirrors /root/reference/src/text_ingest/mod.rs:101-148 — CRLF/CR -> LF
normalization, split with no trailing empty line, line cap = array_max_items
(head-kept, no sampler).
"""

from __future__ import annotations

from .arena import TreeArena
from .config import PriorityConfig


def _to_lines(data: bytes | str) -> list[str]:
    if isinstance(data, (bytes, bytearray, memoryview)):
        s = bytes(data).decode("utf-8", errors="replace")
    else:
        s = data
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    if s == "":
        return []
    lines = s.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return lines


def _push_lines(arena: TreeArena, lines: list[str], cap: int) -> int:
    total = len(lines)
    kept = min(total, cap)
    child_ids = [arena.push_string(line) for line in lines[:kept]]
    return arena.push_array(child_ids, total)


def parse_text_one(data: bytes | str, cfg: PriorityConfig) -> TreeArena:
    arena = TreeArena()
    arena.root_id = _push_lines(arena, _to_lines(data), cfg.array_max_items)
    return arena


def parse_text_many(
    inputs: list[tuple[str, bytes | str]], cfg: PriorityConfig
) -> TreeArena:
    arena = TreeArena()
    keys = []
    child_ids = []
    for name, data in inputs:
        keys.append(name)
        child_ids.append(
            _push_lines(arena, _to_lines(data), cfg.array_max_items)
        )
    arena.root_id = arena.push_object(keys, child_ids)
    arena.is_fileset = True
    return arena
