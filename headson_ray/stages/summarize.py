"""Summarizer stage: the reference's per-document transform as a stateful
Ray Data map_batches actor over zero-copy Arrow batches.

Usage:
    ds.map_batches(
        Summarizer,
        fn_constructor_kwargs=dict(budget=500, style="default"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(2, 8),
        batch_size=256,
    )

Config/compiled state lives in __init__ (once per actor, reference main.rs
config derivation); __call__ handles one Arrow batch. Per-row parse errors
become (preview=None, error=<msg>) instead of failing the task — at
10^12-document scale a poison row must never kill the job.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.api import headson
from ..core.config import (
    PriorityConfig,
    RenderConfig,
    SAMPLER_DEFAULT,
    SAMPLER_HEAD,
    SAMPLER_TAIL,
    TEMPLATE_TEXT,
    TEMPLATE_YAML,
    map_json_template_for_style,
)
from ..core.ingest_json import JsonParseError
from ..core.ingest_yaml import YamlParseError


class Summarizer:
    """Callable-class stage; one instance per actor-pool worker."""

    def __init__(
        self,
        *,
        budget: int = 500,
        style: str = "default",
        format: str = "auto",
        input_format: str = "auto",
        skew: str = "balanced",
        string_cap: int = 500,
        text_column: str = "text",
        output_column: str = "preview",
        error_column: str = "summarize_error",
        formats: dict | None = None,
    ) -> None:
        # driver-side register_format only mutates the DRIVER process;
        # workers import core.api fresh. Third-party formats must ride
        # the actor constructor: {name: parse_one | (parse_one,
        # parse_many)} is cloudpickled with the class and re-registered
        # once per actor process here.
        if formats:
            from ..core.api import register_format

            for name, fns in formats.items():
                one, many = (
                    fns if isinstance(fns, tuple) else (fns, None)
                )
                register_format(name, one, many, replace=True)
        sampler = {
            "balanced": SAMPLER_DEFAULT,
            "head": SAMPLER_HEAD,
            "tail": SAMPLER_TAIL,
        }[skew]
        prefer_tail = sampler == SAMPLER_TAIL
        fmt = format.lower()
        if fmt in ("auto", "json"):
            template = map_json_template_for_style(style)
        elif fmt in ("yaml", "yml"):
            template = TEMPLATE_YAML
        else:
            template = TEMPLATE_TEXT
        self.render_cfg = RenderConfig(
            template=template,
            indent_unit="  ",
            space=" ",
            newline="\n",
            prefer_tail_arrays=prefer_tail,
            color_enabled=False,
            style=style,
        )
        self.priority_cfg = PriorityConfig(
            max_string_graphemes=string_cap,
            array_max_items=max(1, max(budget, 1) // 2),
            prefer_tail_arrays=prefer_tail,
            array_sampler=sampler,
        )
        self.budget = budget
        self.input_format = input_format.lower()
        self.text_column = text_column
        self.output_column = output_column
        self.error_column = error_column
        self.text_render_cfg = self.render_cfg.copy_with(
            template=TEMPLATE_TEXT
        )

    def _summarize_one(self, text: str) -> tuple[str | None, str | None]:
        ifmt = self.input_format
        try:
            if ifmt == "auto":
                # Engine extension: content-based dispatch (the reference
                # dispatches on filename only, src/main.rs:274-287) — try
                # JSON, fall back to the text path.
                try:
                    return (
                        headson(
                            text, self.render_cfg, self.priority_cfg,
                            self.budget, input_format="json",
                        ),
                        None,
                    )
                except JsonParseError:
                    return (
                        headson(
                            text, self.text_render_cfg, self.priority_cfg,
                            self.budget, input_format="text",
                        ),
                        None,
                    )
            return (
                headson(
                    text, self.render_cfg, self.priority_cfg, self.budget,
                    input_format=ifmt,
                ),
                None,
            )
        except (JsonParseError, YamlParseError, ValueError, RecursionError) as e:
            return None, str(e)[:200]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        previews: list[str | None] = []
        errors: list[str | None] = []
        for t in texts:
            if t is None:
                previews.append(None)
                errors.append("null input")
                continue
            p, e = self._summarize_one(t)
            previews.append(p)
            errors.append(e)
        batch = batch.append_column(
            self.output_column, pa.array(previews, pa.string())
        )
        return batch.append_column(
            self.error_column, pa.array(errors, pa.string())
        )


def fileset_preview_group(
    group: pa.Table,
    *,
    budget: int = 500,
    max_files: int = 8,
    key_column: str = "domain",
    name_column: str = "url",
    text_column: str = "text",
) -> pa.Table:
    """One budgeted FILESET preview per group key — the Ray-side
    equivalent of the reference CLI's multi-file mode (SURVEY §1.4:
    fileset -> groupby(key).map_groups): the group's documents compete
    for ONE character budget and render as `==> name <==` sections with
    a trailing `==> N more files <==` marker.

    Deterministic: members sort by name and cap at max_files (the cap is
    the per-group analogue of the reference's budget-derived array cap —
    a hot domain's thousands of pages can't blow up one group render).
    Reuses run_files so config derivation (budget composition, ingest
    choice by extension, auto template) matches src/main.rs:213-303."""
    from ..core.cli import CliOptions, run_files

    key = group.column(key_column)[0].as_py() if group.num_rows else None
    idx = pa.compute.sort_indices(
        group, sort_keys=[(name_column, "ascending")]
    )
    t = group.take(idx)
    names = t.column(name_column).to_pylist()[:max_files]
    texts = t.column(text_column).to_pylist()[:max_files]
    entries = [(n, x or "") for n, x in zip(names, texts)]
    # -N (global budget): ONE budget shared competitively across the
    # group's files, exactly like `headson -N` over a directory.
    # color pinned OFF: dataset columns must not depend on worker env
    # (auto mode would embed ANSI under CLICOLOR_FORCE/FORCE_COLOR)
    preview = run_files(
        CliOptions(global_budget=budget, color=False), entries
    )
    return pa.table(
        {
            key_column: pa.array([key], pa.string()),
            "n_files": pa.array([group.num_rows], pa.int64()),
            "preview": pa.array([preview], pa.string()),
        }
    )
