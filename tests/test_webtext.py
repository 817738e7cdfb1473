"""Webtext crawl operators (pipelines/webtext.py) vs DuckDB oracles on
small deterministic page streams, plus kernel-level canonicalization
edge cases."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entry
from headson_ray.pipelines.webtext import (
    canonicalize_urls,
    derive_url_variants,
    host_crawl_overlap,
    url_canonical_dedup,
    url_host_stats,
)
from headson_ray.sources.pages import materialize_pages

ROWS = 1500


@pytest.fixture(scope="module")
def pages(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("webtext-pages"))
    cur = materialize_pages(
        ROWS, num_shards=3, tag="webtext-test", base_dir=base
    )
    prior = materialize_pages(
        ROWS // 2, num_shards=2, tag="webtext-test", base_dir=base
    )
    return cur, prior


def _glob(paths: list[str]) -> str:
    return paths[0].rsplit("/", 1)[0] + "/shard-*.parquet"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(ray_ds, sql: str):
    got = _norm(ray_ds.to_pandas())
    exp = _norm(duckdb.connect().execute(sql).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False, check_exact=True
    )


@pytest.mark.usefixtures("ray_session")
def test_url_host_stats_matches_duckdb(pages):
    cur, _ = pages
    sql = entry.SQL_URL_HOST_STATS.replace(entry._PAGES_GLOB, _glob(cur))
    _compare(url_host_stats(cur), sql)


@pytest.mark.usefixtures("ray_session")
def test_url_canonical_dedup_matches_duckdb(pages):
    cur, _ = pages
    sql = entry.SQL_URL_CANONICAL_DEDUP.replace(
        entry._PAGES_GLOB, _glob(cur)
    )
    _compare(url_canonical_dedup(cur), sql)


@pytest.mark.usefixtures("ray_session")
def test_host_crawl_overlap_matches_duckdb(pages):
    cur, prior = pages
    sql = entry.SQL_HOST_CRAWL_OVERLAP.replace(
        entry._PAGES_GLOB, _glob(cur)
    ).replace(entry._PRIOR_GLOB, _glob(prior))
    _compare(host_crawl_overlap(cur, prior), sql)


@pytest.mark.usefixtures("ray_session")
def test_host_crawl_overlap_counts_refetches_once(pages):
    """A url refetched in the current crawl is one distinct url, and
    prior membership still resolves across shards/buckets."""
    cur, prior = pages
    # feed the same current shards twice: every url is a "refetch"
    once = host_crawl_overlap(cur, prior).to_pandas()
    twice = host_crawl_overlap(cur + cur, prior).to_pandas()
    o = _norm(once)
    t = _norm(twice)
    pd.testing.assert_frame_equal(o, t, check_dtype=False)


def test_canonicalize_urls_edge_cases():
    raw = pa.array(
        [
            # utm-only query: whole query (and the '?') must go
            "https://A.com/x?utm_source=a&utm_medium=b",
            # legit param survives, utm noise goes, order preserved
            "https://b.com/y?ref=1&utm_source=a",
            # utm first, legit after: '?&' must collapse to '?'
            "https://c.com/z?utm_source=a&ref=2",
            # fragment stripped, host+scheme lowercased, path case kept
            "HTTPS://D.COM/Path#frag",
            # no noise: identity
            "https://e.com/p?q=1",
        ]
    )
    got = canonicalize_urls(raw).to_pylist()
    assert got == [
        "https://a.com/x",
        "https://b.com/y?ref=1",
        "https://c.com/z?ref=2",
        "https://d.com/Path",
        "https://e.com/p?q=1",
    ]


def test_derive_url_variants_shape():
    t = pa.table(
        {
            "url": pa.array(
                [
                    "https://h0.com/page/3",  # 3%3=0 -> 1 variant
                    "https://h1.com/page/4",  # 4%3=1 -> 2 variants
                    "https://h2.com/page/5",  # 5%3=2 -> 3 variants
                ]
            ),
            "warc_ts": pa.array([100, 200, 300], pa.timestamp("us")),
        }
    )
    out = derive_url_variants(t)
    raws = out.column("raw_url").to_pylist()
    assert len(raws) == 6
    assert raws[0] == "https://h0.com/page/3"
    assert "?ref=r4&utm_source=feed&utm_campaign=c4" in raws[3]
    assert raws[-1].startswith("HTTPS://H2.COM/page/5#s1")
    # canonicalizing the variant stream collapses case+fragment noise
    canon = canonicalize_urls(out.column("raw_url")).to_pylist()
    assert canon.count("https://h2.com/page/5") == 2  # v0 + v2
