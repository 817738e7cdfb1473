"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable
from typing import Any

from headson_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: synthetic Common-Crawl-style pages (per
    BASELINE.json:input_hint) -> domain derivation -> summarizer actor
    pool. Returns the resulting Dataset."""
    from headson_ray.pipelines.flagship import summarize_pages
    from headson_ray.sources.pages import materialize_pages

    paths = materialize_pages(2000, num_shards=4, tag="entry-sf0.001")
    return summarize_pages(paths, budget=500, concurrency=(1, 4))


def _q_summarize_pages(sf_dir: str):
    from headson_ray.pipelines.flagship import summarize_pages
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 5000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    ds = summarize_pages(paths, budget=300, concurrency=(1, 4))
    return ds.select_columns(["url", "domain", "preview"])


def _q_sniff_pages(sf_dir: str):
    from headson_ray.pipelines.flagship import sniff_pages
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return sniff_pages(paths).select_columns(["url", "skipped"])


def _q_cep_stream(sf_dir: str):
    """End-to-end streaming CEP run (windows + watermark + dedup + delta
    join + exactly-once sink) over the synthetic page stream; returns the
    finalized window panes."""
    from headson_ray.pipelines.cep import CepEngine
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    prior = materialize_pages(rows // 2, tag=f"q-{rows}")
    work = tempfile.mkdtemp(prefix="headson-cep-q-")
    try:
        eng = CepEngine(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=4,
            window_size_s=600,
            allowed_lateness_s=60,
        )
        eng.load_prior_crawl(prior)
        groups = [paths[i : i + 4] for i in range(0, len(paths), 4)]
        eng.run(groups)
        return eng.sink.read_all_windows()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    q = dict(QUERIES)
    q["summarize_pages"] = _q_summarize_pages
    q["sniff_pages"] = _q_sniff_pages
    q["cep_stream_windows"] = _q_cep_stream
    return q


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
