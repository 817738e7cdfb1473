"""Deterministic Common-Crawl-style pages table generator.

Schema per BASELINE.json:input_hint:
    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

Domains are Zipf-distributed over ~1000 hosts so hot keys (wikipedia.org
style) exist; warc_ts is monotone-ish event time with bounded disorder to
exercise watermark/late-data paths; ~10% of html payloads carry an invalid
UTF-8 prefix to exercise the binary-sniff path. Everything is a pure
function of (seed, row index) — no external data.

Output is sharded parquet under /tmp (one directory per (rows, seed)
config, one file per shard) so pipelines stream block-by-block and a
resumable run can skip finished shards.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_DOMAINS = 1000
ZIPF_S = 1.2
# Event-time parameters: bounded disorder of +-5 steps
T0_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
STEP_US = 1_000_000  # one logical second per row
JITTER_STEPS = 5

_TLDS = ["com", "org", "net", "io", "dev", "edu"]
_WORDS = [
    "alpha", "beta", "gamma", "delta", "news", "shop", "wiki", "blog",
    "data", "cloud", "media", "forum", "mail", "play", "code", "docs",
]

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def domain_list() -> list[str]:
    """~1000 deterministic hostnames; index 0 is the hottest."""
    domains = ["wikipedia.org", "example.com", "github.com", "nytimes.com"]
    i = 0
    while len(domains) < N_DOMAINS:
        w1 = _WORDS[i % len(_WORDS)]
        w2 = _WORDS[(i // len(_WORDS)) % len(_WORDS)]
        tld = _TLDS[i % len(_TLDS)]
        domains.append(f"{w1}-{w2}{i}.{tld}")
        i += 1
    return domains[:N_DOMAINS]


def _zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, N_DOMAINS + 1, dtype=np.float64)
    w = 1.0 / ranks**ZIPF_S
    return np.cumsum(w / w.sum())


_LANGS = ["en", "de", "fr", "es", "ja"]


def _doc_text(i: int, rng_val: int) -> str:
    """Deterministic per-row document for the summarizer (JSON or text)."""
    shape = rng_val % 4
    if shape == 0:
        # API-page-ish (reference bench fixture shape,
        # /root/reference/examples/genfixture.rs:33-80)
        n = 3 + (rng_val >> 4) % 8
        results = [
            {
                "name": _WORDS[(i + j) % len(_WORDS)],
                "url": f"https://example.com/api/v1/item/{i + j}/",
            }
            for j in range(n)
        ]
        return json.dumps(
            {"count": n, "next": None, "previous": None, "results": results}
        )
    if shape == 1:
        # Nested object
        return json.dumps(
            {
                "id": i,
                "meta": {"page": i % 50, "tags": _WORDS[: 3 + i % 5]},
                "user": {
                    "name": _WORDS[i % len(_WORDS)].title(),
                    "bio": " ".join(_WORDS[(i + k) % len(_WORDS)] for k in range(12)),
                },
                "scores": [((i * 7 + k) % 100) / 10.0 for k in range(6)],
            }
        )
    if shape == 2:
        # Plain multi-line text (log-like)
        n = 5 + (rng_val >> 3) % 20
        return "\n".join(
            f"line{j}: {_WORDS[(i + j) % len(_WORDS)]} event at t={i + j}"
            for j in range(n)
        )
    # Flat array of numbers/strings
    n = 4 + (rng_val >> 2) % 12
    return json.dumps(
        [i + j if j % 2 == 0 else _WORDS[(i + j) % len(_WORDS)] for j in range(n)]
    )


def generate_shard(
    shard: int, rows_per_shard: int, *, seed: int = SEED, ts_shift_us: int = 0,
    url_salt: str = "",
) -> pa.Table:
    """Build one shard as an Arrow table (pure function of args)."""
    rng = np.random.RandomState(seed + shard * 1_000_003)
    start = shard * rows_per_shard
    idx = np.arange(start, start + rows_per_shard, dtype=np.int64)
    cdf = _zipf_cdf()
    draws = rng.random_sample(rows_per_shard)
    dom_idx = np.searchsorted(cdf, draws)
    domains = domain_list()
    jitter = rng.randint(
        -JITTER_STEPS, JITTER_STEPS + 1, size=rows_per_shard
    ).astype(np.int64)
    ts = T0_US + idx * STEP_US + jitter * STEP_US + ts_shift_us
    rvals = rng.randint(0, 1 << 30, size=rows_per_shard)

    urls = []
    texts = []
    htmls = []
    langs = []
    for k in range(rows_per_shard):
        i = int(idx[k])
        d = domains[int(dom_idx[k])]
        urls.append(f"https://{d}/{url_salt}page/{i}")
        text = _doc_text(i, int(rvals[k]))
        texts.append(text)
        body = f"<html><body><pre>{text[:200]}</pre></body></html>".encode()
        if rvals[k] % 10 == 0:
            # invalid-UTF-8 prefix to exercise the binary-sniff path
            body = b"\x00\xff\xfe" + body
        htmls.append(body)
        langs.append(_LANGS[i % len(_LANGS)])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def materialize_pages(
    total_rows: int,
    *,
    num_shards: int | None = None,
    seed: int = SEED,
    tag: str = "main",
    base_dir: str = "/tmp/headson_ray_pages",
    ts_shift_us: int = 0,
    url_salt: str = "",
) -> list[str]:
    """Write (or reuse) sharded parquet; returns shard file paths.

    Shards are written atomically (tmp + rename) so partially generated
    directories are never read.
    """
    if num_shards is None:
        num_shards = max(1, min(64, total_rows // 10_000))
    rows_per_shard = (total_rows + num_shards - 1) // num_shards
    out_dir = Path(base_dir) / f"{tag}-r{total_rows}-s{seed}"
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for shard in range(num_shards):
        n = min(rows_per_shard, total_rows - shard * rows_per_shard)
        if n <= 0:
            break
        path = out_dir / f"shard-{shard:05d}.parquet"
        if not path.exists():
            table = generate_shard(
                shard, n, seed=seed, ts_shift_us=ts_shift_us, url_salt=url_salt
            )
            tmp = path.with_suffix(".tmp")
            pq.write_table(table, tmp)
            os.replace(tmp, path)
        paths.append(str(path))
    return paths


def rows_for_sf_dir(sf_dir: str) -> int:
    """Map a testdata sf dir to a pages row count (lineitem-scaled)."""
    name = Path(sf_dir).name  # e.g. sf0.01
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(1000, int(sf * 6_000_000))
