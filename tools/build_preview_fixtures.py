"""Build the committed preview-parity fixtures (round-4 verdict task 8).

The per-document previews are deterministic outputs of the snapshot-
validated core (byte-exact against the reference corpus in
tests/test_snapshots*.py), but they are not SQL-expressible — so the
DuckDB oracles for summarize_documents / summarize_pages join against
parquet fixtures generated HERE by that same core:

- tests/fixtures/doc_previews.parquet: (text, preview) for every
  distinct document text in /root/testdata/sf{0.001,0.01,0.1}/
  documents.parquet, previews from Summarizer(budget=200,
  input_format="text") — the exact q_summarize_documents stage.
  Keyed by text so ONE fixture serves every sf dir (the oracle joins
  documents.text -> preview).
- tests/fixtures/page_previews.parquet: (url, domain, preview) for the
  deterministic 5000-page stream _q_summarize_pages consumes (the
  row cap makes that stream identical across sf dirs), budget=300.

Regenerate after ANY core-summarizer change:
    python tools/build_preview_fixtures.py
(tests/test_queries_oracle.py asserts fixture parity against a fresh
computation, so a stale fixture fails fast.)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
)


def build_doc_previews() -> None:
    from headson_ray.stages.summarize import Summarizer

    s = Summarizer(budget=200, input_format="text")
    seen: dict[str, str] = {}
    for sf in ("0.001", "0.01", "0.1"):
        t = pq.read_table(
            f"/root/testdata/sf{sf}/documents.parquet",
            columns=["doc_id", "text"],
        )
        out = s(t)
        for text, prev in zip(
            out.column("text").to_pylist(), out.column("preview").to_pylist()
        ):
            seen.setdefault(text, prev)
    items = sorted(seen.items())
    pq.write_table(
        pa.table(
            {
                "text": pa.array([k for k, _ in items], pa.string()),
                "preview": pa.array([v for _, v in items], pa.string()),
            }
        ),
        os.path.join(FIXTURE_DIR, "doc_previews.parquet"),
        compression="zstd",
    )
    print(f"doc_previews.parquet: {len(items)} distinct texts")


def build_page_previews() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    from headson_ray.pipelines.flagship import summarize_pages
    from headson_ray.sources.pages import materialize_pages

    rows = 5000  # _q_summarize_pages's cap, identical for every sf dir
    paths = materialize_pages(rows, tag=f"q-{rows}")
    ds = summarize_pages(paths, budget=300, concurrency=(1, 4))
    t = (
        ds.select_columns(["url", "domain", "preview"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pq.write_table(
        pa.Table.from_pandas(t, preserve_index=False),
        os.path.join(FIXTURE_DIR, "page_previews.parquet"),
        compression="zstd",
    )
    print(f"page_previews.parquet: {len(t)} pages")
    ray.shutdown()


def build_fileset_previews() -> None:
    """Fixture for q_domain_fileset_previews: one budgeted FILESET
    preview per domain over the same deterministic 5000-page stream
    (budget=400, max_files=6). Computed here WITHOUT Ray — the group
    kernel is a pure function of the sorted group, so an in-process
    groupby reproduces the distributed map_groups bit-for-bit."""
    from headson_ray.sources.pages import materialize_pages
    from headson_ray.stages.derive import add_domain
    from headson_ray.stages.summarize import fileset_preview_group

    paths = materialize_pages(5000, tag="q-5000")
    t = pa.concat_tables(
        [pq.read_table(p, columns=["url", "text"]) for p in paths]
    )
    t = add_domain(t)
    groups: dict[str, list[int]] = {}
    for i, d in enumerate(t.column("domain").to_pylist()):
        groups.setdefault(d, []).append(i)
    parts = [
        fileset_preview_group(
            t.take(pa.array(idx)), budget=400, max_files=6
        )
        for _, idx in sorted(groups.items())
    ]
    out = pa.concat_tables(parts)
    pq.write_table(
        out,
        os.path.join(FIXTURE_DIR, "fileset_previews.parquet"),
        compression="zstd",
    )
    print(f"fileset_previews.parquet: {out.num_rows} domains")


if __name__ == "__main__":
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    build_doc_previews()
    build_page_previews()
    build_fileset_previews()
