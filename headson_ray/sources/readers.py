"""Page-table readers beyond parquet: JSONL and CSV sources normalized
to the canonical pages schema.

Common-Crawl-style exports often arrive as JSONL (one page per line) or
CSV; these readers use Ray Data's native distributed readers and
normalize to the PAGES_SCHEMA contract used by every pipeline:
url:string, warc_ts:timestamp[us], text:string, lang:string.

The binary `html` payload is parquet-only by design: text container
formats would need base64 (inflating payloads 33% and decode time);
pipelines that sniff html (sniff_pages, multimodal) require parquet
inputs and say so. Timestamps in text formats are ISO-8601 strings and
are parsed vectorized (pc.strptime).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TEXT_COLUMNS = ["url", "warc_ts", "text", "lang"]


def _normalize(batch: pa.Table) -> pa.Table:
    ts = batch.column("warc_ts")
    # pc.cast string->timestamp parses ISO-8601 including fractional
    # seconds (strptime's %f variants do NOT cover arrow's grammar);
    # integer/epoch and coarser timestamp inputs cast the same way
    ts = pc.cast(ts, pa.timestamp("us"))
    return pa.table(
        {
            "url": pc.cast(batch.column("url"), pa.string()),
            "warc_ts": ts,
            "text": pc.cast(batch.column("text"), pa.string()),
            "lang": pc.cast(batch.column("lang"), pa.string()),
        }
    )


def read_pages(
    paths: list[str] | str,
    *,
    format: str = "parquet",
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Distributed page-table read for parquet / jsonl / csv inputs.

    Parquet passes `columns` down for read-side pruning; text formats
    read whole records (their container offers no column projection) and
    project after normalization."""
    if format == "parquet":
        return ray.data.read_parquet(paths, columns=columns)
    if format == "jsonl":
        ds = ray.data.read_json(paths)
    elif format == "csv":
        ds = ray.data.read_csv(paths)
    else:
        raise ValueError(f"unsupported pages format: {format}")
    ds = ds.map_batches(
        _normalize, batch_format="pyarrow", zero_copy_batch=True
    )
    if columns:
        missing = set(columns) - set(TEXT_COLUMNS)
        if missing:
            raise ValueError(
                f"columns {sorted(missing)} unavailable in {format} pages "
                "(binary html requires parquet)"
            )
        ds = ds.select_columns(columns)
    return ds


def export_pages_jsonl(table: pa.Table, path: str) -> None:
    """Write a pages table as JSONL (test/fixture helper; html dropped)."""
    import json

    cols = {c: table.column(c).to_pylist() for c in TEXT_COLUMNS}
    with open(path, "w") as fh:
        for i in range(table.num_rows):
            ts = cols["warc_ts"][i]
            fh.write(
                json.dumps(
                    {
                        "url": cols["url"][i],
                        "warc_ts": ts.isoformat(),
                        "text": cols["text"][i],
                        "lang": cols["lang"][i],
                    }
                )
                + "\n"
            )


def export_pages_csv(table: pa.Table, path: str) -> None:
    """Write a pages table as CSV (test/fixture helper; html dropped)."""
    import csv

    cols = {c: table.column(c).to_pylist() for c in TEXT_COLUMNS}
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(TEXT_COLUMNS)
        for i in range(table.num_rows):
            w.writerow(
                [
                    cols["url"][i],
                    cols["warc_ts"][i].isoformat(),
                    cols["text"][i],
                    cols["lang"][i],
                ]
            )
