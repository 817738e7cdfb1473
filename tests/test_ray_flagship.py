"""Ray-level tests: pages source determinism + flagship summarize pipeline
parity with the single-process core (per-url byte-identical previews)."""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pytest

from headson_ray.core.api import headson
from headson_ray.core.config import PriorityConfig, RenderConfig
from headson_ray.core.ingest_json import JsonParseError
from headson_ray.sources.pages import generate_shard, materialize_pages
from headson_ray.pipelines.flagship import summarize_pages, sniff_pages


def test_pages_deterministic():
    a = generate_shard(0, 500)
    b = generate_shard(0, 500)
    assert a.equals(b)
    # hot domain exists
    domains = [u.split("/")[2] for u in a.column("url").to_pylist()]
    assert domains.count("wikipedia.org") > 50


def _oracle_preview(text: str) -> str:
    cfg = RenderConfig(template="pseudo", style="default")
    prio = PriorityConfig(max_string_graphemes=500, array_max_items=250)
    try:
        return headson(text, cfg, prio, 500, input_format="json")
    except JsonParseError:
        return headson(
            text, cfg.copy_with(template="text"), prio, 500,
            input_format="text",
        )


@pytest.mark.usefixtures("ray_session")
def test_flagship_matches_single_process_oracle(tmp_path):
    paths = materialize_pages(
        2000, num_shards=4, tag="test-flagship",
        base_dir=str(tmp_path / "pages"),
    )
    ds = summarize_pages(paths, concurrency=2, batch_size=200)
    table = pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=4096)
    )
    assert table.num_rows == 2000
    got = dict(
        zip(table.column("url").to_pylist(), table.column("preview").to_pylist())
    )
    errs = [e for e in table.column("summarize_error").to_pylist() if e]
    assert errs == []
    # per-url byte-identical vs driving the core directly
    src = pa.concat_tables(
        [generate_shard(s, 500) for s in range(4)]
    )
    checked = 0
    for url, text in zip(
        src.column("url").to_pylist()[:300], src.column("text").to_pylist()[:300]
    ):
        assert got[url] == _oracle_preview(text), url
        checked += 1
    assert checked == 300
    # domain column present and correct
    doms = dict(
        zip(table.column("url").to_pylist(), table.column("domain").to_pylist())
    )
    for url, d in list(doms.items())[:50]:
        assert url.split("/")[2] == d


@pytest.mark.usefixtures("ray_session")
def test_sniff_flags_binary_rows(tmp_path):
    paths = materialize_pages(
        1000, num_shards=2, tag="test-sniff", base_dir=str(tmp_path / "pages")
    )
    table = sniff_pages(paths).to_pandas()
    frac = table["skipped"].mean()
    assert 0.05 < frac < 0.15  # ~10% of rows carry the binary prefix


@pytest.mark.usefixtures("ray_session")
def test_summarize_to_parquet_resumable(tmp_path):
    import pyarrow.parquet as pq
    from headson_ray.pipelines.flagship import summarize_to_parquet
    from headson_ray.sources.pages import materialize_pages

    paths = materialize_pages(800, num_shards=4, tag="resume-out")
    out = str(tmp_path / "out")
    m1 = summarize_to_parquet(
        paths, out, shards_per_chunk=2, budget=120, concurrency=2
    )
    assert m1 == {"chunks_written": 2, "chunks_skipped": 0}
    # simulate a crashed chunk: delete one marker, corrupt its dir
    marker = Path(out) / "chunk-00001" / "_SUCCESS"
    marker.unlink()
    m2 = summarize_to_parquet(
        paths, out, shards_per_chunk=2, budget=120, concurrency=2
    )
    assert m2 == {"chunks_written": 1, "chunks_skipped": 1}
    total = sum(
        pq.read_table(p).num_rows for p in Path(out).rglob("*.parquet")
    )
    assert total == 800
