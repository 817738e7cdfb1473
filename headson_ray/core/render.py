"""Rendering: five output templates + fileset sections + ANSI color.

Re-expression of /root/reference/src/serialization/ (mod.rs, templates/*,
output.rs, fileset.rs, color.rs). Rendering happens entirely inside the
per-document UDF; the result is a plain string.
"""

from __future__ import annotations

import json
from functools import lru_cache

from .config import (
    RenderConfig,
    STYLE_DEFAULT,
    STYLE_DETAILED,
    STYLE_STRICT,
    TEMPLATE_AUTO,
    TEMPLATE_JS,
    TEMPLATE_JSON,
    TEMPLATE_PSEUDO,
    TEMPLATE_TEXT,
    TEMPLATE_YAML,
    format_from_filename,
    map_json_template_for_style,
)
from .graphemes import take_n_graphemes
from .order import (
    N_ARRAY,
    N_ATOMIC,
    N_LEAFPART,
    N_OBJECT,
    N_SPLITTABLE,
    PriorityOrder,
)

ROOT_PQ_ID = 0

# ANSI SGR fragments (reference: src/serialization/color.rs:6-9)
_RESET = "\x1b[0m"
_BOLD_BLUE = "\x1b[1;34m"
_GREEN = "\x1b[32m"
_DARK_GRAY = "\x1b[90m"


@lru_cache(maxsize=65536)
def json_string(s: str) -> str:
    """JSON string literal with escapes (reference: src/utils/json.rs:4-11).

    serde_json escapes exactly: control chars, quote, backslash; non-ASCII
    kept verbatim — matching ensure_ascii=False. Cached: object keys
    repeat across documents in a batch (pure function of s).
    """
    return json.dumps(s, ensure_ascii=False)


def _decode_json_string(token: str) -> str | None:
    if not token.startswith('"'):
        return None
    try:
        v = json.loads(token)
    except ValueError:
        return None
    return v if isinstance(v, str) else None


def _rust_lines(s: str) -> list[str]:
    """str::lines() semantics: split on \\n, drop final empty, strip \\r."""
    parts = s.split("\n")
    if parts and parts[-1] == "":
        parts.pop()
    return [p[:-1] if p.endswith("\r") else p for p in parts]


class Out:
    """Buffered writer (reference: src/serialization/output.rs:5-93)."""

    __slots__ = ("parts", "newline", "indent_unit", "color", "style")

    def __init__(self, cfg: RenderConfig) -> None:
        self.parts: list[str] = []
        self.newline = cfg.newline
        self.indent_unit = cfg.indent_unit
        self.color = cfg.color_enabled
        self.style = cfg.style

    def push(self, s: str) -> None:
        self.parts.append(s)

    def push_newline(self) -> None:
        self.parts.append(self.newline)

    def push_indent(self, depth: int) -> None:
        if depth:
            self.parts.append(self.indent_unit * depth)

    def push_comment(self, body: str) -> None:
        if self.color:
            self.parts.append(_DARK_GRAY + body + _RESET)
        else:
            self.parts.append(body)

    def push_omission(self) -> None:
        if self.color:
            self.parts.append(_DARK_GRAY + "…" + _RESET)
        else:
            self.parts.append("…")

    def push_key(self, quoted_key: str) -> None:
        if self.color:
            self.parts.append(_BOLD_BLUE + quoted_key + _RESET)
        else:
            self.parts.append(quoted_key)

    def push_string_literal(self, quoted_value: str) -> None:
        if self.color:
            self.parts.append(_GREEN + quoted_value + _RESET)
        else:
            self.parts.append(quoted_value)

    def is_compact(self) -> bool:
        return self.newline == "" and self.indent_unit == ""

    def value(self) -> str:
        return "".join(self.parts)


def _has_newline(s: str) -> bool:
    return "\n" in s or "\r" in s




class Renderer:
    """Template-driven writer over an inclusion set
    (reference: src/serialization/mod.rs RenderScope). Inclusion for
    top-k is tested via subtree-min-rank (inc_rank[nid] < k), which is
    equivalent to the reference's mark-top-k-and-ancestors flags
    (src/utils/graph.rs:41-61) without per-probe marking work."""

    def __init__(
        self,
        order: PriorityOrder,
        k: int,
        config: RenderConfig,
        probe_cache: dict | None = None,
    ) -> None:
        self.o = order
        self.inc = order.ensure_inc_rank()
        self.k = k
        self.cfg = config
        # shared across the budget-fit probes of ONE document: a subtree
        # whose subtree_max_rank < k is FULLY included, so its rendered
        # string is identical for every probe that includes it — cache by
        # (nid, depth, inline, template). Only the probes share a cache
        # (same measure config); the final render passes None.
        self.probe_cache = probe_cache
        self.sub_max = (
            order.ensure_subtree_max_rank()
            if probe_cache is not None
            else None
        )

    # --- inclusion / omission helpers -----------------------------------
    def _count_kept_children(self, nid: int) -> int:
        from bisect import bisect_left

        sr = self.o.sorted_child_ranks.get(nid)
        if sr is None:
            inc = self.inc
            sr = sorted(inc[c] for c in self.o.children[nid])
            self.o.sorted_child_ranks[nid] = sr
        return bisect_left(sr, self.k)

    def _omitted_for(self, nid: int, kept: int) -> int:
        o = self.o
        t = o.node_type[nid]
        if t == N_ARRAY:
            orig = o.m_array_len[nid]
            return orig - kept if orig is not None and orig > kept else 0
        if t == N_OBJECT:
            orig = o.m_object_len[nid]
            return orig - kept if orig is not None and orig > kept else 0
        if t == N_SPLITTABLE:
            orig = o.m_string_len[nid]
            if orig is not None:
                if orig > kept:
                    return orig - kept
                return 1 if o.m_string_truncated[nid] else 0
            return 1 if o.m_string_truncated[nid] else 0
        return 0

    # --- leaves ----------------------------------------------------------
    def _serialize_string(self, nid: int, template: str) -> str:
        kept = self._count_kept_children(nid)
        omitted = self._omitted_for(nid, kept)
        full = self.o.payload[nid] or ""
        if template == TEMPLATE_TEXT:
            if omitted == 0:
                return full
            return take_n_graphemes(full, kept) + "…"
        if omitted == 0:
            return json_string(full)
        return json_string(take_n_graphemes(full, kept) + "…")

    # --- recursive node rendering ---------------------------------------
    def render_node(
        self, nid: int, depth: int, inline: bool, template: str
    ) -> str:
        o = self.o
        t = o.node_type[nid]
        # Only FULLY-included subtrees cache (render independent of k).
        # A partial-inclusion variant keyed by included-descendant count
        # was measured SLOWER (1036 vs 1441 docs/s): n_inc changes on
        # almost every probe, so the rank-list builds and key lookups
        # were pure overhead.
        cacheable = (
            self.probe_cache is not None and self.sub_max[nid] < self.k
        )
        if cacheable:
            key = (nid, depth, inline, template)
            hit = self.probe_cache.get(key)
            if hit is not None:
                return hit
        if t == N_SPLITTABLE:
            s = self._serialize_string(nid, template)
        elif t == N_ATOMIC:
            s = o.payload[nid] or ""
        else:
            out = Out(self.cfg)
            if t == N_ARRAY:
                self._write_array(nid, depth, inline, out, template)
            else:
                self._write_object(nid, depth, inline, out, template)
            s = out.value()
        if cacheable:
            self.probe_cache[key] = s
        return s

    def write_root(self, out: Out) -> None:
        nid = ROOT_PQ_ID
        o = self.o
        t = o.node_type[nid]
        template = self.cfg.template
        if t == N_ARRAY:
            self._write_array(nid, 0, False, out, template)
        elif t == N_OBJECT:
            self._write_object(nid, 0, False, out, template)
        elif t == N_SPLITTABLE:
            s = self._serialize_string(nid, template)
            if template == TEMPLATE_TEXT:
                out.push(s)
            else:
                out.push_string_literal(s)
        elif t == N_ATOMIC:
            out.push(o.payload[nid] or "")
        else:  # pragma: no cover - LeafPart is never rendered
            raise AssertionError("string part should not be rendered")

    # --- children gathering ----------------------------------------------
    def _gather_array_children(
        self, nid: int, depth: int, template: str
    ) -> tuple[list[tuple[int, int, str]], int]:
        """Returns ([(orig_index, child_type, rendered)], kept)."""
        o = self.o
        k = self.k
        inc = self.inc
        pairs = []
        kept = 0
        for i, cid in enumerate(o.children[nid]):
            if inc[cid] >= k:
                continue
            kept += 1
            rendered = self.render_node(cid, depth + 1, False, template)
            oi = o.index_in_parent_array[cid]
            pairs.append((oi if oi is not None else i, o.node_type[cid], rendered))
        return pairs, kept

    def _gather_object_children(
        self, nid: int, depth: int, template: str
    ) -> tuple[list[tuple[str, str]], int]:
        o = self.o
        k = self.k
        inc = self.inc
        pairs = []
        kept = 0
        for cid in o.children[nid]:
            if inc[cid] >= k:
                continue
            kept += 1
            key = json_string(o.key_in_object[cid] or "")
            val = self.render_node(cid, depth + 1, True, template)
            pairs.append((key, val))
        return pairs, kept

    # --- template dispatch ------------------------------------------------
    def _resolve_object_template(self, template: str) -> str:
        # In non-fileset contexts Auto maps to the JSON family by style
        # (reference: src/serialization/mod.rs:139-152).
        if template == TEMPLATE_AUTO:
            return map_json_template_for_style(self.cfg.style)
        return template

    def _write_array(
        self, nid: int, depth: int, inline: bool, out: Out, template: str
    ) -> None:
        pairs, kept = self._gather_array_children(nid, depth, template)
        omitted = self._omitted_for(nid, kept)
        tmpl = template
        if tmpl == TEMPLATE_AUTO:
            # Auto arrays use the Pseudo renderer regardless of style
            # (reference: templates/mod.rs:39-48)
            tmpl = TEMPLATE_PSEUDO
        if tmpl == TEMPLATE_JSON:
            self._array_json(pairs, kept, depth, inline, out)
        elif tmpl == TEMPLATE_PSEUDO:
            self._array_marked(pairs, kept, omitted, depth, inline, out, "pseudo")
        elif tmpl == TEMPLATE_JS:
            self._array_marked(pairs, kept, omitted, depth, inline, out, "js")
        elif tmpl == TEMPLATE_YAML:
            self._array_yaml(pairs, kept, omitted, depth, inline, out)
        elif tmpl == TEMPLATE_TEXT:
            self._array_text(pairs, omitted, out)
        else:  # pragma: no cover
            raise AssertionError(f"unknown template {tmpl}")

    def _write_object(
        self, nid: int, depth: int, inline: bool, out: Out, template: str
    ) -> None:
        # Fileset root renders as sections when newline enabled
        # (reference: src/serialization/fileset.rs:7-19)
        if (
            nid == ROOT_PQ_ID
            and self.o.root_is_fileset
            and self.cfg.newline != ""
        ):
            out.push(self._render_fileset_sections(depth))
            return
        pairs, kept = self._gather_object_children(nid, depth, template)
        omitted = self._omitted_for(nid, kept)
        fileset_root = nid == ROOT_PQ_ID and self.o.root_is_fileset
        tmpl = self._resolve_object_template(template)
        if tmpl == TEMPLATE_JSON:
            self._object_json(pairs, kept, depth, inline, out)
        elif tmpl == TEMPLATE_PSEUDO:
            self._object_marked(
                pairs, kept, omitted, depth, inline, out, "pseudo", fileset_root
            )
        elif tmpl == TEMPLATE_JS:
            self._object_marked(
                pairs, kept, omitted, depth, inline, out, "js", fileset_root
            )
        elif tmpl == TEMPLATE_YAML:
            self._object_yaml(
                pairs, kept, omitted, depth, inline, out, fileset_root
            )
        elif tmpl == TEMPLATE_TEXT:
            # Defensive delegation to pseudo (templates/text.rs:36-43)
            self._object_marked(
                pairs, kept, omitted, depth, inline, out, "pseudo", fileset_root
            )
        else:  # pragma: no cover
            raise AssertionError(f"unknown template {tmpl}")

    # --- shared core (templates/core.rs) ----------------------------------
    def _push_array_items(
        self,
        out: Out,
        pairs: list[tuple[int, int, str]],
        kept: int,
        depth: int,
        gap_fn,
    ) -> None:
        prev_index = None
        for i, (orig_index, ntype, item) in enumerate(pairs):
            if (
                gap_fn is not None
                and prev_index is not None
                and orig_index > prev_index + 1
            ):
                gap_fn(out, orig_index - prev_index - 1)
            if _has_newline(item):
                out.push(item)
            elif ntype in (N_ARRAY, N_OBJECT):
                out.push(item)
            else:
                out.push_indent(depth + 1)
                out.push(item)
            if i + 1 < kept:
                out.push(",")
            out.push_newline()
            prev_index = orig_index

    def _push_object_items(
        self, out: Out, pairs: list[tuple[str, str]], kept: int, depth: int
    ) -> None:
        space = self.cfg.space
        for i, (k, v) in enumerate(pairs):
            out.push_indent(depth + 1)
            out.push_key(k)
            out.push(":")
            out.push(space)
            if v.startswith('"'):
                out.push_string_literal(v)
            else:
                out.push(v)
            if i + 1 < kept:
                out.push(",")
            out.push_newline()

    # --- JSON template (templates/json.rs) --------------------------------
    def _array_json(self, pairs, kept, depth, inline, out: Out) -> None:
        if kept == 0:
            if not inline:
                out.push_indent(depth)
            out.push("[]")
            return
        if not inline:
            out.push_indent(depth)
        out.push("[")
        out.push_newline()
        self._push_array_items(out, pairs, kept, depth, None)
        out.push_indent(depth)
        out.push("]")

    def _object_json(self, pairs, kept, depth, inline, out: Out) -> None:
        if kept == 0:
            if not inline:
                out.push_indent(depth)
            out.push("{}")
            return
        if not inline:
            out.push_indent(depth)
        out.push("{")
        out.push_newline()
        self._push_object_items(out, pairs, kept, depth)
        out.push_indent(depth)
        out.push("}")

    # --- Pseudo + Js templates (templates/pseudo.rs, js.rs) ---------------
    def _array_marked(
        self, pairs, kept, omitted, depth, inline, out: Out, flavor: str
    ) -> None:
        def push_omitted(o: Out) -> None:
            if omitted > 0:
                o.push_indent(depth + 1)
                if flavor == "js":
                    o.push_comment(f"/* {omitted} more items */")
                else:
                    o.push_omission()
                if kept > 0 and self.cfg.prefer_tail_arrays:
                    o.push(",")
                o.push_newline()

        def gap_fn(o: Out, gap: int) -> None:
            o.push_indent(depth + 1)
            if flavor == "js":
                o.push_comment(f"/* {gap} more items */")
            else:
                o.push_omission()
            o.push_newline()

        if kept == 0:
            if not inline:
                out.push_indent(depth)
            out.push("[")
            if omitted > 0:
                out.push(" ")
                if flavor == "js":
                    out.push_comment(f"/* {omitted} more items */")
                else:
                    out.push_omission()
                out.push(" ")
            out.push("]")
            return
        if not inline:
            out.push_indent(depth)
        out.push("[")
        out.push_newline()
        if self.cfg.prefer_tail_arrays:
            push_omitted(out)
        self._push_array_items(out, pairs, kept, depth, gap_fn)
        if not self.cfg.prefer_tail_arrays:
            push_omitted(out)
        out.push_indent(depth)
        out.push("]")

    def _object_marked(
        self,
        pairs,
        kept,
        omitted,
        depth,
        inline,
        out: Out,
        flavor: str,
        fileset_root: bool,
    ) -> None:
        def omission_text() -> str:
            label = "files" if fileset_root else "properties"
            return f"/* {omitted} more {label} */"

        if kept == 0:
            if not inline:
                out.push_indent(depth)
            out.push("{")
            if omitted > 0:
                out.push(self.cfg.space)
                if flavor == "js":
                    out.push_comment(omission_text())
                else:
                    out.push_omission()
                out.push(self.cfg.space)
            out.push("}")
            return
        if not inline:
            out.push_indent(depth)
        out.push("{")
        out.push_newline()
        self._push_object_items(out, pairs, kept, depth)
        if omitted > 0:
            out.push_indent(depth + 1)
            if flavor == "js":
                out.push_comment(omission_text())
            else:
                out.push_omission()
            out.push_newline()
        out.push_indent(depth)
        out.push("}")

    # --- YAML template (templates/yaml.rs) --------------------------------
    def _yaml_omission_comment(self, out: Out, depth: int, detailed: str):
        style = self.cfg.style
        if style == STYLE_STRICT:
            return
        out.push_indent(depth)
        if style == STYLE_DEFAULT:
            out.push_comment("# …")
        else:
            out.push_comment(detailed)
        out.push_newline()

    def _array_yaml(self, pairs, kept, omitted, depth, inline, out: Out):
        if out.is_compact():
            self._array_json(pairs, kept, depth, inline, out)
            return
        if kept == 0:
            if not inline:
                out.push_indent(depth)
            out.push("[]")
            return
        if self.cfg.prefer_tail_arrays and omitted > 0:
            self._yaml_omission_comment(out, depth, f"# {omitted} more items")
        for _oi, _nt, item in pairs:
            self._push_yaml_array_item(out, depth, item)
        if not self.cfg.prefer_tail_arrays and omitted > 0:
            self._yaml_omission_comment(out, depth, f"# {omitted} more items")

    def _push_yaml_array_item(self, out: Out, depth: int, item: str) -> None:
        if not _has_newline(item):
            out.push_indent(depth)
            out.push("- ")
            self._push_yaml_scalar(out, item.strip())
            out.push_newline()
            return
        lines = _rust_lines(item)
        if lines:
            out.push_indent(depth)
            out.push("- ")
            out.push(lines[0].lstrip())
            out.push_newline()
        for rest in lines[1:]:
            out.push_indent(depth)
            out.push("  ")
            out.push(rest.lstrip())
            out.push_newline()

    def _push_yaml_scalar(self, out: Out, token: str) -> None:
        raw = _decode_json_string(token)
        if raw is not None:
            if not _yaml_value_needs_quotes(raw):
                out.push_string_literal(raw)
                return
            out.push_string_literal(token)
            return
        out.push(token)

    def _object_yaml(
        self, pairs, kept, omitted, depth, inline, out: Out, fileset_root: bool
    ) -> None:
        if out.is_compact():
            self._object_json(pairs, kept, depth, inline, out)
            return
        if kept == 0:
            if not inline:
                out.push_indent(depth)
            out.push("{}")
            return
        for k, v in pairs:
            key_text = _yaml_key_text(k)
            out.push_indent(depth)
            out.push_key(key_text)
            if not _has_newline(v):
                out.push(": ")
                self._push_yaml_scalar(out, v)
                out.push_newline()
            else:
                out.push(":")
                out.push_newline()
                out.push(v)
                if not v.endswith("\n") and not v.endswith("\r"):
                    out.push_newline()
        if omitted > 0:
            label = "files" if fileset_root else "properties"
            self._yaml_omission_comment(
                out, depth, f"# {omitted} more {label}"
            )

    # --- Text template (templates/text.rs) --------------------------------
    def _array_text(self, pairs, omitted, out: Out) -> None:
        def omission_line() -> None:
            style = self.cfg.style
            if style == STYLE_STRICT:
                return
            if style == STYLE_DEFAULT:
                out.push_omission()
                out.push_newline()
            else:
                out.push_omission()
                out.push(" ")
                out.push(f"{omitted} more lines ")
                out.push_omission()
                out.push_newline()

        if self.cfg.prefer_tail_arrays and omitted > 0:
            omission_line()
        for _oi, _nt, item in pairs:
            out.push(item)
            out.push_newline()
        if not self.cfg.prefer_tail_arrays and omitted > 0:
            omission_line()

    # --- fileset sections (fileset.rs) ------------------------------------
    def _render_fileset_sections(self, depth: int) -> str:
        o = self.o
        cfg = self.cfg
        nl = cfg.newline
        indent = cfg.indent_unit * depth
        parts: list[str] = []
        kept = 0
        children_ids = o.children[ROOT_PQ_ID]
        for cid in children_ids:
            if self.inc[cid] >= self.k:
                continue
            if kept > 0:
                parts.append(nl + nl)
            kept += 1
            raw_key = o.key_in_object[cid] or ""
            parts.append(f"{indent}==> {raw_key} <=={nl}")
            parts.append(self._fileset_render_child(cid, depth, raw_key))
        total = o.m_object_len[ROOT_PQ_ID]
        if total is None:
            total = len(children_ids)
        if total > kept and nl != "":
            parts.append(nl + nl)
            parts.append(f"{indent}==> {total - kept} more files <==")
        return "".join(parts)

    def _fileset_render_child(
        self, cid: int, depth: int, raw_key: str
    ) -> str:
        if self.cfg.template == TEMPLATE_AUTO:
            fmt = format_from_filename(raw_key)
            if fmt == "yaml":
                template = TEMPLATE_YAML
            elif fmt == "json":
                template = map_json_template_for_style(self.cfg.style)
            else:
                template = TEMPLATE_TEXT
            return self.render_node(cid, depth, False, template)
        return self.render_node(cid, depth, False, self.cfg.template)


# YAML quoting heuristics (templates/yaml.rs:111-223)
_YAML_RESERVED = {
    "true", "false", "null", "~", "yes", "no", "on", "off", "y", "n",
}
_YAML_DISALLOWED_PUNCT = set(":#{}[],&*?|>@%!")


def _yaml_key_needs_quotes(s: str) -> bool:
    if s == "":
        return True
    first = s[0]
    if first.isdigit() or first == "-" or first.isspace():
        return True
    if s.lower() in _YAML_RESERVED:
        return True
    if s[-1].isspace():
        return True
    for c in s:
        if not (c.isascii() and (c.isalnum() or c in "_-")):
            return True
    return False


def _yaml_key_text(quoted_key: str) -> str:
    raw = _decode_json_string(quoted_key)
    if raw is not None and not _yaml_key_needs_quotes(raw):
        return raw
    return quoted_key


def _yaml_value_looks_numeric(s: str) -> bool:
    if not s or s[0] not in "-+0123456789":
        return False
    has_digit = False
    for c in s:
        if c.isdigit() and c.isascii():
            has_digit = True
        elif c not in ".eE+-":
            return False
    return has_digit


def _yaml_value_needs_quotes(s: str) -> bool:
    if s == "":
        return True
    if "\n" in s or "\r" in s:
        return True
    if s[0].isspace() or s[-1].isspace():
        return True
    if s.lower() in _YAML_RESERVED:
        return True
    if _yaml_value_looks_numeric(s):
        return True
    return any(c in _YAML_DISALLOWED_PUNCT for c in s)


# --- top-level render entry points (mod.rs:531-592) -----------------------
def render_top_k(
    order: PriorityOrder,
    top_k: int,
    config: RenderConfig,
    probe_cache: dict | None = None,
) -> str:
    """Render the inclusion set = top-k by priority + their ancestors
    (reference: src/utils/graph.rs:41-61 + src/serialization/mod.rs:552-592).
    Membership is evaluated as inc_rank[nid] < k — the subtree-min-rank is
    computed once per document and shared by every budget-fit probe.
    probe_cache (one dict shared by a fit loop's probes) memoizes the
    renders of FULLY-included subtrees, which are k-independent."""
    k = min(top_k, order.total_nodes)
    r = Renderer(order, k, config, probe_cache)
    out = Out(config)
    r.write_root(out)
    return out.value()
