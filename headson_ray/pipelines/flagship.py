"""Flagship pipeline: pages parquet -> derive -> summarizer actor pool ->
(optionally) exactly-once parquet sink.

This is the headline throughput pipeline (summarized-docs/sec): streaming
execution end-to-end, zero-copy Arrow batches, stateful summarizer actors.
"""

from __future__ import annotations

import ray.data

from ..stages.derive import add_binary_sniff, add_domain
from ..stages.summarize import Summarizer


def build_pages_dataset(paths: list[str]) -> "ray.data.Dataset":
    """Columns are pruned at the read (url/warc_ts/text/lang); the html
    payload is only read by pipelines that sniff it."""
    return ray.data.read_parquet(
        paths, columns=["url", "warc_ts", "text", "lang"]
    )


def summarize_pages(
    paths: list[str],
    *,
    budget: int = 500,
    style: str = "default",
    input_format: str = "auto",
    concurrency=(2, 8),
    batch_size: int = 256,
    with_domain: bool = True,
) -> "ray.data.Dataset":
    ds = build_pages_dataset(paths)
    if with_domain:
        ds = ds.map_batches(
            add_domain, batch_format="pyarrow", zero_copy_batch=True
        )
    ds = ds.map_batches(
        Summarizer,
        fn_constructor_kwargs=dict(
            budget=budget, style=style, input_format=input_format
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
    )
    return ds


def sniff_pages(paths: list[str]) -> "ray.data.Dataset":
    """Binary-sniff pipeline over the html payload (S2 in SURVEY §2)."""
    ds = ray.data.read_parquet(paths, columns=["url", "html"])
    return ds.map_batches(
        add_binary_sniff, batch_format="pyarrow", zero_copy_batch=True
    )
