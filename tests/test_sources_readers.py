"""JSONL/CSV page sources normalize to the parquet pages contract."""

from __future__ import annotations

import pyarrow as pa
import pytest

from headson_ray.sources.pages import generate_shard
from headson_ray.sources.readers import (
    export_pages_csv,
    export_pages_jsonl,
    read_pages,
)


@pytest.fixture(scope="module")
def small_pages():
    return generate_shard(0, 200)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_text_format_roundtrip_matches_parquet(small_pages, fmt, tmp_path):
    src = small_pages
    path = tmp_path / f"pages.{fmt}"
    if fmt == "jsonl":
        export_pages_jsonl(src, str(path))
    else:
        export_pages_csv(src, str(path))
    ds = read_pages([str(path)], format=fmt)
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    got = got.take(pa.compute.sort_indices(got, sort_keys=[("url", "ascending")]))
    exp = src.select(["url", "warc_ts", "text", "lang"])
    exp = exp.take(pa.compute.sort_indices(exp, sort_keys=[("url", "ascending")]))
    assert got.column("url").to_pylist() == exp.column("url").to_pylist()
    assert got.column("text").to_pylist() == exp.column("text").to_pylist()
    assert got.column("lang").to_pylist() == exp.column("lang").to_pylist()
    assert got.schema.field("warc_ts").type == pa.timestamp("us")
    assert (
        got.column("warc_ts").to_pylist() == exp.column("warc_ts").to_pylist()
    )


@pytest.mark.usefixtures("ray_session")
def test_text_format_rejects_html_column(small_pages, tmp_path):
    path = tmp_path / "pages.jsonl"
    export_pages_jsonl(small_pages, str(path))
    with pytest.raises(ValueError, match="html"):
        read_pages([str(path)], format="jsonl", columns=["url", "html"])


@pytest.mark.usefixtures("ray_session")
def test_jsonl_pages_feed_summarizer(small_pages, tmp_path):
    from headson_ray.stages.summarize import Summarizer

    path = tmp_path / "pages.jsonl"
    export_pages_jsonl(small_pages, str(path))
    ds = read_pages([str(path)], format="jsonl", columns=["url", "text"])
    out = ds.map_batches(
        Summarizer,
        fn_constructor_kwargs=dict(budget=200),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
        batch_size=128,
        num_cpus=1,
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert t.num_rows == small_pages.num_rows
    assert "preview" in t.column_names


@pytest.mark.usefixtures("ray_session")
def test_jsonl_fractional_second_timestamps(tmp_path):
    """Sub-second ISO timestamps arrive as strings from the JSON reader
    and must parse exactly (review finding: strptime %.f was invalid)."""
    import json

    path = tmp_path / "frac.jsonl"
    rows = [
        {"url": "https://x.com/1", "warc_ts": "2024-01-01T10:00:00.123456",
         "text": "hello world", "lang": "en"},
        {"url": "https://x.com/2", "warc_ts": "2024-01-01T10:00:01",
         "text": "second page", "lang": "en"},
    ]
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    ds = read_pages([str(path)], format="jsonl")
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    ts = sorted(got.column("warc_ts").to_pylist())
    assert ts[0].microsecond == 123456
    assert got.schema.field("warc_ts").type == pa.timestamp("us")
