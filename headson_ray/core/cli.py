"""CLI-semantics helper: replicates the reference CLI's config derivation
(/root/reference/src/main.rs) so conformance tests can drive the engine
exactly like `headson <flags>` and compare against the committed snapshot
corpus. Also usable as `python -m headson_ray.core.cli`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .api import headson, headson_many
from .config import (
    PriorityConfig,
    RenderConfig,
    SAMPLER_DEFAULT,
    SAMPLER_HEAD,
    SAMPLER_TAIL,
    TEMPLATE_AUTO,
    TEMPLATE_TEXT,
    TEMPLATE_YAML,
    map_json_template_for_style,
)


@dataclass
class CliOptions:
    """Mirror of the reference CLI flags (src/main.rs:24-116)."""

    budget: int | None = None  # -n
    global_budget: int | None = None  # -N
    format: str = "auto"  # -f: auto|json|yaml|text
    style: str = "default"  # -t: strict|default|detailed
    indent: str = "  "
    no_space: bool = False
    no_newline: bool = False
    compact: bool = False
    string_cap: int = 500
    tail: bool = False
    head: bool = False
    # True = --color (On), False = --no-color (Off), None = Auto
    # (resolved against env + tty per src/serialization/color.rs:88-106)
    color: bool | None = None
    input_format: str = "json"  # -i


def compute_effective_budget(opts: CliOptions, input_count: int) -> int:
    """Reference: src/main.rs:161-168."""
    g, n = opts.global_budget, opts.budget
    if g is not None and n is not None:
        return min(g, n * input_count)
    if g is not None:
        return g
    if n is not None:
        return n * input_count
    return 500 * input_count


def compute_priority(
    opts: CliOptions, effective_budget: int, input_count: int
) -> PriorityConfig:
    """Reference: src/main.rs:170-185,416-433."""
    if opts.global_budget is not None and opts.budget is not None:
        eff_per_file = max(1, effective_budget // max(1, input_count))
        per_file = max(1, min(opts.budget, eff_per_file))
    else:
        per_file = max(1, effective_budget // max(1, input_count))
    if opts.tail:
        sampler = SAMPLER_TAIL
    elif opts.head:
        sampler = SAMPLER_HEAD
    else:
        sampler = SAMPLER_DEFAULT
    return PriorityConfig(
        max_string_graphemes=opts.string_cap,
        array_max_items=max(1, per_file // 2),
        prefer_tail_arrays=opts.tail,
        array_sampler=sampler,
    )


def get_render_config(opts: CliOptions) -> RenderConfig:
    """Reference: src/main.rs:369-414."""
    fmt = opts.format
    if fmt == "auto":
        template = TEMPLATE_AUTO
    elif fmt == "json":
        template = map_json_template_for_style(opts.style)
    elif fmt == "yaml":
        template = TEMPLATE_YAML
    else:
        template = TEMPLATE_TEXT
    space = "" if (opts.compact or opts.no_space) else " "
    newline = "" if (opts.compact or opts.no_newline) else "\n"
    indent_unit = "" if opts.compact else opts.indent
    from .color import resolve_color_enabled

    return RenderConfig(
        template=template,
        indent_unit=indent_unit,
        space=space,
        newline=newline,
        prefer_tail_arrays=opts.tail,
        color_enabled=resolve_color_enabled(opts.color),
        style=opts.style,
    )


def _template_for_stdin(fmt: str, style: str) -> str:
    """Reference: src/main.rs:453-464."""
    if fmt in ("auto", "json"):
        return map_json_template_for_style(style)
    if fmt == "yaml":
        return TEMPLATE_YAML
    return TEMPLATE_TEXT


def _template_for_single(fmt: str, style: str, lower_name: str) -> str:
    """Reference: src/main.rs:466-486."""
    if fmt == "json":
        return map_json_template_for_style(style)
    if fmt == "yaml":
        return TEMPLATE_YAML
    if fmt == "text":
        return TEMPLATE_TEXT
    if lower_name.endswith(".yaml") or lower_name.endswith(".yml"):
        return TEMPLATE_YAML
    if lower_name.endswith(".json"):
        return map_json_template_for_style(style)
    return TEMPLATE_TEXT


def run_stdin(opts: CliOptions, data: bytes | str) -> str:
    """Equivalent of piping to the CLI; returns stdout WITHOUT the final
    newline that println! adds (reference: src/main.rs:187-207)."""
    eff = compute_effective_budget(opts, 1)
    prio = compute_priority(opts, eff, 1)
    cfg = get_render_config(opts)
    cfg = cfg.copy_with(template=_template_for_stdin(opts.format, opts.style))
    return headson(data, cfg, prio, eff, input_format=opts.input_format)


def run_files(
    opts: CliOptions, entries: list[tuple[str, bytes | str]]
) -> str:
    """Equivalent of `headson f1 f2 ...` with pre-read file contents
    (reference: src/main.rs:213-303)."""
    included = len(entries)
    input_count = max(1, included)
    eff = compute_effective_budget(opts, input_count)
    prio = compute_priority(opts, eff, input_count)
    cfg = get_render_config(opts)
    if included == 0:
        return ""
    if included > 1:
        if opts.format == "auto":
            names = [n.lower() for n, _ in entries]
            if any(n.endswith(".yaml") or n.endswith(".yml") for n in names):
                chosen_input = "yaml"
            elif all(n.endswith(".json") for n in names):
                chosen_input = "json"
            else:
                chosen_input = "text"
        else:
            chosen_input = opts.input_format
        if opts.format == "auto":
            cfg = cfg.copy_with(template=TEMPLATE_AUTO)
        elif opts.format == "json":
            cfg = cfg.copy_with(
                template=map_json_template_for_style(opts.style)
            )
        elif opts.format == "yaml":
            cfg = cfg.copy_with(template=TEMPLATE_YAML)
        else:
            cfg = cfg.copy_with(template=TEMPLATE_TEXT)
        return headson_many(
            entries, cfg, prio, eff, input_format=chosen_input
        )
    name, data = entries[0]
    lower = name.lower()
    if opts.format == "auto":
        if lower.endswith(".yaml") or lower.endswith(".yml"):
            chosen_input = "yaml"
        elif lower.endswith(".json"):
            chosen_input = "json"
        else:
            chosen_input = "text"
    else:
        chosen_input = opts.input_format
    cfg = cfg.copy_with(
        template=_template_for_single(opts.format, opts.style, lower)
    )
    return headson(data, cfg, prio, eff, input_format=chosen_input)


def main(argv: list[str] | None = None) -> int:
    import argparse
    import sys

    p = argparse.ArgumentParser(prog="headson-ray")
    p.add_argument("-n", "--budget", type=int, default=None)
    p.add_argument("-N", "--global-budget", type=int, default=None)
    p.add_argument("-f", "--format", default="auto",
                   choices=["auto", "json", "yaml", "text"])
    p.add_argument("-t", "--template", dest="style", default="default",
                   choices=["strict", "default", "detailed"])
    p.add_argument("--indent", default="  ")
    p.add_argument("--no-space", action="store_true")
    p.add_argument("--no-newline", action="store_true")
    p.add_argument("-m", "--compact", action="store_true")
    p.add_argument("--string-cap", type=int, default=500)
    p.add_argument("--tail", action="store_true")
    p.add_argument("--head", action="store_true")
    p.add_argument("--color", action="store_true")
    p.add_argument("--no-color", action="store_true")
    p.add_argument("-i", "--input-format", default="json",
                   choices=["json", "yaml", "text"])
    p.add_argument("inputs", nargs="*")
    a = p.parse_args(argv)
    opts = CliOptions(
        budget=a.budget, global_budget=a.global_budget, format=a.format,
        style=a.style, indent=a.indent, no_space=a.no_space,
        no_newline=a.no_newline, compact=a.compact,
        string_cap=a.string_cap, tail=a.tail, head=a.head,
        # clap `conflicts_with` parity: both flags set is an error
        color=(True if a.color else (False if a.no_color else None)),
        input_format=a.input_format,
    )
    if a.color and a.no_color:
        print(
            "Error: --color cannot be used with --no-color", file=sys.stderr
        )
        return 2
    import os

    try:
        if a.inputs:
            # path ingestion parity (reference src/main.rs:348-367):
            # directories and binary-sniffed files are skipped with a
            # stderr notice, not errors
            entries = []
            for path in a.inputs:
                if os.path.isdir(path):
                    print(f"Ignored directory: {path}", file=sys.stderr)
                    continue
                with open(path, "rb") as fh:
                    first = fh.read(64 * 1024)
                    # content_inspector parity (reference
                    # src/main.rs:313-346): only the first 1024 bytes of
                    # the probe chunk are scanned for NUL (a NUL later in
                    # the file does NOT make it binary), and BOM-prefixed
                    # UTF-8/16/32 files are TEXT even though UTF-16/32
                    # bytes contain NULs.
                    from ..stages.derive import looks_binary

                    if looks_binary(first):
                        print(
                            f"Ignored binary file: {path}", file=sys.stderr
                        )
                        continue
                    entries.append((path, first + fh.read()))
            print(run_files(opts, entries))
        else:
            print(run_stdin(opts, sys.stdin.buffer.read()))
    except (ValueError, OSError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
