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


def summarize_to_parquet(
    paths: list[str],
    out_dir: str,
    *,
    shards_per_chunk: int = 8,
    budget: int = 500,
    concurrency=8,
    batch_size: int = 256,
) -> dict:
    """Resumable partitioned output: input shards are processed in chunks,
    each chunk writing to its own directory with a _SUCCESS marker. A
    failed run reruns only unfinished chunks (partial output is wiped
    before the rerun), so output converges without duplicates — the
    batch-mode counterpart of the CEP engine's exactly-once sink."""
    import os
    import shutil

    done = skipped = 0
    root = os.path.abspath(out_dir)
    os.makedirs(root, exist_ok=True)
    for ci in range(0, len(paths), shards_per_chunk):
        chunk = paths[ci:ci + shards_per_chunk]
        cdir = os.path.join(root, f"chunk-{ci // shards_per_chunk:05d}")
        marker = os.path.join(cdir, "_SUCCESS")
        if os.path.exists(marker):
            skipped += 1
            continue
        shutil.rmtree(cdir, ignore_errors=True)
        ds = summarize_pages(
            chunk,
            budget=budget,
            concurrency=concurrency,
            batch_size=batch_size,
        )
        ds.write_parquet(cdir)
        with open(marker, "w") as fh:
            fh.write("")
        done += 1
    return {"chunks_written": done, "chunks_skipped": skipped}


def write_bucketed_by_domain(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    num_buckets: int = 64,
) -> None:
    """Partitioned output: one directory per hash(domain) bucket, so every
    later domain-keyed stage (windows, dedup, joins) reads only its
    co-located buckets instead of re-shuffling — the "pick ONE
    partitioning key and reuse it" layout for the 100 TB pipeline."""
    import pyarrow as pa

    from ..state.store import route_domains_batch

    def add_bucket(b: "pa.Table") -> "pa.Table":
        # same routing hash as the CEP actors / distributed merge, so
        # this layout is co-partitioned with every domain-keyed stage
        # (vectorized: one numpy hashing pass per batch)
        parts = route_domains_batch(
            ["" if d is None else d for d in b.column("domain").to_pylist()],
            num_buckets,
        )
        buckets = pa.array(parts.astype("int32"), pa.int32())
        return b.append_column("bucket", buckets)

    ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out_dir, partition_cols=["bucket"])


def sniff_pages(paths: list[str]) -> "ray.data.Dataset":
    """Binary-sniff pipeline over the html payload (S2 in SURVEY §2)."""
    ds = ray.data.read_parquet(paths, columns=["url", "html"])
    return ds.map_batches(
        add_binary_sniff, batch_format="pyarrow", zero_copy_batch=True
    )
