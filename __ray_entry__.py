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


def _q_cep_lineage(sf_dir: str):
    """Per-partition lineage audit (the north-rule checkpoint log as a
    queryable surface): run the deterministic CEP stream and explode the
    manifest's commit records to one row per (batch, state partition) —
    rows routed to each actor, late drops, the watermark, and windows
    finalized per flow at each commit. This is exactly the record the
    exactly-once resume path replays."""
    import json as _json

    import pyarrow as _pa

    from headson_ray.pipelines.cep import CepEngine
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 5000)
    paths = materialize_pages(rows, tag=f"qlin-{rows}")
    work = tempfile.mkdtemp(prefix="headson-cep-lin-")
    try:
        eng = CepEngine(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=4,
            window_size_s=600,
            allowed_lateness_s=60,
        )
        groups = [paths[i : i + 4] for i in range(0, len(paths), 4)]
        eng.run(groups)
        cols = {
            "batch": [], "partition": [], "rows_seen": [], "n_late": [],
            "watermark": [], "windows_finalized": [],
        }
        with open(eng.sink.manifest_path) as fh:
            for line in fh:
                rec = _json.loads(line)
                if rec.get("kind") != "commit":
                    continue
                for part, rs in enumerate(rec.get("actor_rows", [])):
                    cols["batch"].append(int(rec["batch"]))
                    cols["partition"].append(part)
                    cols["rows_seen"].append(int(rs))
                    cols["n_late"].append(int(rec.get("n_late", 0)))
                    cols["watermark"].append(int(rec.get("watermark", 0)))
                    cols["windows_finalized"].append(
                        int(rec.get("windows_finalized", 0))
                    )
        return _pa.table(
            {k: _pa.array(v, _pa.int64()) for k, v in cols.items()}
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_url_host_stats(sf_dir: str):
    """Per-host crawl table (C4/CCNet domain stats) over the synthetic
    page stream — see pipelines/webtext.py:url_host_stats."""
    from headson_ray.pipelines.webtext import url_host_stats
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return url_host_stats(paths)


def _q_url_canonical_dedup(sf_dir: str):
    """Tracking-param URL canonicalization + first-fetch dedup over a
    deterministic messy-variant stream — webtext.py:url_canonical_dedup."""
    from headson_ray.pipelines.webtext import url_canonical_dedup
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return url_canonical_dedup(paths)


def _q_host_crawl_overlap(sf_dir: str):
    """Inter-crawl URL overlap per host (current vs prior crawl,
    partitioned hash semi-join) — webtext.py:host_crawl_overlap."""
    from headson_ray.pipelines.webtext import host_crawl_overlap
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    prior = materialize_pages(rows // 2, tag=f"q-{rows}")
    return host_crawl_overlap(paths, prior)


def _q_host_lang_profile(sf_dir: str):
    """Per-host majority-language routing table —
    webtext.py:host_lang_profile."""
    from headson_ray.pipelines.webtext import host_lang_profile
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_lang_profile(paths)


def _q_extraction_ratios(sf_dir: str):
    """Per-page extracted-text-to-html ratio (boilerplate / soft-404
    signal) — webtext.py:extraction_ratios."""
    from headson_ray.pipelines.webtext import extraction_ratios
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return extraction_ratios(paths)


def _q_mirror_hosts(sf_dir: str):
    """Mirror / CDN-alias host pairs via a content-fingerprint inverted
    index — webtext.py:mirror_host_detection."""
    from headson_ray.pipelines.webtext import mirror_host_detection
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return mirror_host_detection(paths)


def _q_mirror_alias_clusters(sf_dir: str):
    """Mirror-cluster canonicalization: transitive closure of the
    strong (Jaccard >= 0.2) alias-pair graph via distributed min-label
    propagation; every clustered host maps to its lexicographic-min
    cluster member — webtext.py:mirror_alias_clusters."""
    from headson_ray.pipelines.webtext import mirror_alias_clusters
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return mirror_alias_clusters(paths)


def _q_host_boilerplate_lines(sf_dir: str):
    """CCNet-style per-host boilerplate line detection over a
    deterministic boilerplate-injected stream —
    webtext.py:host_boilerplate_lines."""
    from headson_ray.pipelines.webtext import host_boilerplate_lines
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_boilerplate_lines(paths)


def _q_host_link_graph(sf_dir: str):
    """Host-level web link graph over the derived outlink stream —
    webtext.py:host_link_graph."""
    from headson_ray.pipelines.webtext import host_link_graph
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_link_graph(paths, rows)


def _q_host_outdegree_hist(sf_dir: str):
    """Out-degree distribution of the host link graph —
    webtext.py:host_outdegree_hist."""
    from headson_ray.pipelines.webtext import host_outdegree_hist
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_outdegree_hist(paths, rows)


def _q_host_triangles(sf_dir: str):
    """Triangle census of the undirected host link graph via
    distributed degree-orientation (compact-forward) wedge closure —
    webtext.py:host_triangles."""
    from headson_ray.pipelines.webtext import host_triangles
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_triangles(paths, rows)


def _q_host_transitivity(sf_dir: str):
    """Global clustering coefficient (3 x triangles / wedges, ppm) of
    the undirected host link graph — webtext.py:host_transitivity."""
    from headson_ray.pipelines.webtext import host_transitivity
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_transitivity(paths, rows)


def _q_host_components(sf_dir: str):
    """Weakly-connected components of the host link graph via
    distributed min-label propagation — webtext.py:host_components."""
    from headson_ray.pipelines.webtext import host_components
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_components(paths, rows)


def _q_host_reciprocity(sf_dir: str):
    """Mutual-link share of the directed host graph —
    webtext.py:host_reciprocity."""
    from headson_ray.pipelines.webtext import host_reciprocity
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_reciprocity(paths, rows)


def _q_host_pagerank(sf_dir: str):
    """Integer-exact PageRank over the host link graph —
    webtext.py:host_pagerank."""
    from headson_ray.pipelines.webtext import host_pagerank
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_pagerank(paths, rows)


def _q_host_crawl_budget(sf_dir: str):
    """Per-host politeness cut: earliest BUDGET_PER_HOST fetches per
    host — webtext.py:host_crawl_budget."""
    from headson_ray.pipelines.webtext import host_crawl_budget
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_crawl_budget(paths)


def _q_host_change_rate(sf_dir: str):
    """Per-host inter-crawl content change rate (freshness signal) —
    webtext.py:host_change_rate."""
    from headson_ray.pipelines.webtext import host_change_rate
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    prior = materialize_pages(rows // 2, tag=f"q-{rows}")
    return host_change_rate(paths, prior)


def _q_host_anchor_terms(sf_dir: str):
    """Top anchor terms per destination host over the derived link
    stream — webtext.py:host_anchor_terms."""
    from headson_ray.pipelines.webtext import host_anchor_terms
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_anchor_terms(paths, rows)


def _q_host_dup_rate(sf_dir: str):
    """Intra-host exact-duplicate-page rate over the landing-template
    injected stream — webtext.py:host_dup_rate."""
    from headson_ray.pipelines.webtext import host_dup_rate
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return host_dup_rate(paths)


def _q_frontier_topk(sf_dir: str):
    """Crawl-frontier next-fetch queue: top-k urls by integer-exact
    staleness x inverse-host-mass priority — webtext.py:frontier_topk."""
    from headson_ray.pipelines.webtext import frontier_topk
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return frontier_topk(paths)


def _q_host_crawl_delta(sf_dir: str):
    """Incremental-crawl ledger: new/kept/gone urls per host between
    the current and prior crawl — webtext.py:host_crawl_delta."""
    from headson_ray.pipelines.webtext import host_crawl_delta
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    prior = materialize_pages(rows // 2, tag=f"q-{rows}")
    return host_crawl_delta(paths, prior)


def _q_window_host_hll(sf_dir: str):
    """Approximate windowed host coverage: per tumbling window, the HLL
    register state (register, max rho) over host hashes — the sketch
    path that replaces the exact (window, host) shuffle at 10^8+ hosts
    with O(#windows * 256) rows. Registers are bit-exact oracled (the
    string mixer is SQL-reproducible); estimate accuracy vs the exact
    path is pinned in tests/test_webtext.py."""
    from headson_ray.pipelines.webtext import window_host_hll
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return window_host_hll(paths)


def _q_window_host_coverage(sf_dir: str):
    """Per tumbling 600s warc_ts window: page throughput + exact
    distinct-host coverage — webtext.py:window_host_coverage."""
    from headson_ray.pipelines.webtext import window_host_coverage
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    return window_host_coverage(paths)


def _stream_panes_fold(
    sf_dir: str, fold, *, with_prior: bool, kind: str = "windows"
):
    """Shared harness for the streaming webtext folds: run the CEP
    engine over the deterministic page stream (micro-batches, watermark
    finalization, exactly-once sink), read the committed tumbling panes
    back as a Dataset, and apply a distributed pane fold. The fold
    result materializes (window/host grain, bounded) before the temp
    sink dir is removed."""
    import os as _os

    import ray.data as _rd

    from headson_ray.pipelines.cep import CepEngine
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    work = tempfile.mkdtemp(prefix="headson-cep-fold-")
    try:
        eng = CepEngine(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=4,
            window_size_s=600,
            allowed_lateness_s=60,
        )
        if with_prior:
            prior = materialize_pages(rows // 2, tag=f"q-{rows}")
            eng.load_prior_crawl(prior)
        groups = [paths[i : i + 4] for i in range(0, len(paths), 4)]
        eng.run(groups)
        files = []
        for b in sorted(eng.sink.committed_batches()):
            p = _os.path.join(f"{work}/out", f"{kind}-b{b:06d}.parquet")
            if _os.path.exists(p):
                files.append(p)
            d = _os.path.join(f"{work}/out", f"{kind}-b{b:06d}")
            if _os.path.isdir(d):
                files.extend(
                    sorted(
                        _os.path.join(d, f)
                        for f in _os.listdir(d)
                        if f.startswith("part-") and f.endswith(".parquet")
                    )
                )
        panes = _rd.read_parquet(files)
        return fold(panes).materialize()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_cep_window_coverage(sf_dir: str):
    """Streaming crawl-coverage dashboard (round-4 verdict task 7): the
    batch window_host_coverage semantics run THROUGH the CEP engine —
    pages stream in micro-batches, tumbling panes finalize as the
    watermark passes, the exactly-once sink commits them — and the
    committed panes fold (distributed, window-grain) to per-window page
    throughput + exact distinct-host coverage. Proves the webtext suite
    composes with the north-rule machinery; kill/resume byte-equality
    is pinned in tests/test_cep_sigkill_resume.py."""
    from headson_ray.pipelines.webtext import window_coverage_from_panes

    return _stream_panes_fold(
        sf_dir, window_coverage_from_panes, with_prior=False
    )


def _q_cep_crawl_delta(sf_dir: str):
    """Streaming crawl-delta ledger: the CEP engine's stateful
    prior-crawl join classifies every first-seen url as new / changed /
    unchanged while the stream runs; the committed panes fold
    (distributed, host-grain) to the per-host ledger — the streaming
    analog of host_crawl_delta, driven by actor-pool join state instead
    of a batch semi-join."""
    from headson_ray.pipelines.webtext import host_delta_from_panes

    return _stream_panes_fold(
        sf_dir, host_delta_from_panes, with_prior=True
    )


def _q_cep_sessions(sf_dir: str):
    """Streaming per-domain sessionization through the CEP engine: the
    session state store gap-merges out-of-order fragments per domain
    (all of a domain's rows route to ONE state actor), the watermark
    finalizes sessions whose end + gap it has passed, and the
    exactly-once sink commits them. Oracle = gaps-and-islands SQL over
    the same stream (exact because the deterministic stream carries no
    session-late rows at these parameters — n_late == 0, asserted in
    tests)."""
    return _stream_panes_fold(
        sf_dir, lambda panes: panes, with_prior=False, kind="sessions"
    )


def _q_cep_late_updates(sf_dir: str):
    """UPDATE-MODE lateness (pipelines/streamlate.py): the page stream
    arrives in pair-swapped event-time ranges, so half the batches are
    genuinely late behind the watermark — instead of dropping them
    (the engine's n_late contract), every pane folds all arrivals and
    RE-EMITS with a bumped version; the returned materialized view
    (latest version per (domain, window)) therefore converges to the
    exact batch aggregate, which is the oracle. Re-emission counts and
    kill/resume byte-equality are pinned in tests/test_streamlate.py."""
    from headson_ray.pipelines.streamlate import (
        LateUpdateStream,
        late_shuffled_groups,
    )
    from headson_ray.sources.pages import materialize_pages, rows_for_sf_dir

    rows = min(rows_for_sf_dir(sf_dir), 20000)
    paths = materialize_pages(rows, tag=f"q-{rows}")
    work = tempfile.mkdtemp(prefix="headson-late-upd-")
    try:
        eng = LateUpdateStream(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=4,
        )
        eng.run(late_shuffled_groups(paths, 8))
        return eng.materialized_view().materialize()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_cep_topk_hosts(sf_dir: str):
    """Streaming hot-host dashboard: each tumbling window's top-10
    hosts by routed page count, computed THROUGH the CEP engine —
    micro-batched stream, watermark finalization, exactly-once pane
    commits — then a two-phase distributed top-k fold over the
    committed panes (per-batch trims bound the shuffle at k rows per
    (window, block)). Oracle = ROW_NUMBER over the pane SQL, the same
    (n_pages DESC, domain ASC) total order."""
    from headson_ray.pipelines.webtext import topk_hosts_from_panes

    return _stream_panes_fold(
        sf_dir, topk_hosts_from_panes, with_prior=False
    )


def queries() -> dict[str, Callable[[str], Any]]:
    q = dict(QUERIES)
    q["summarize_pages"] = _q_summarize_pages
    q["sniff_pages"] = _q_sniff_pages
    q["cep_stream_windows"] = _q_cep_stream
    q["cep_partition_lineage"] = _q_cep_lineage
    q["url_host_stats"] = _q_url_host_stats
    q["url_canonical_dedup"] = _q_url_canonical_dedup
    q["host_crawl_overlap"] = _q_host_crawl_overlap
    q["host_lang_profile"] = _q_host_lang_profile
    q["extraction_ratios"] = _q_extraction_ratios
    q["mirror_hosts"] = _q_mirror_hosts
    q["mirror_alias_clusters"] = _q_mirror_alias_clusters
    q["host_boilerplate_lines"] = _q_host_boilerplate_lines
    q["host_link_graph"] = _q_host_link_graph
    q["host_outdegree_hist"] = _q_host_outdegree_hist
    q["host_triangles"] = _q_host_triangles
    q["host_transitivity"] = _q_host_transitivity
    q["host_components"] = _q_host_components
    q["host_reciprocity"] = _q_host_reciprocity
    q["host_pagerank"] = _q_host_pagerank
    q["host_anchor_terms"] = _q_host_anchor_terms
    q["host_change_rate"] = _q_host_change_rate
    q["host_crawl_budget"] = _q_host_crawl_budget
    q["host_dup_rate"] = _q_host_dup_rate
    q["frontier_topk"] = _q_frontier_topk
    q["window_host_coverage"] = _q_window_host_coverage
    q["host_crawl_delta"] = _q_host_crawl_delta
    q["cep_window_coverage"] = _q_cep_window_coverage
    q["cep_crawl_delta"] = _q_cep_crawl_delta
    q["cep_sessions"] = _q_cep_sessions
    q["cep_topk_hosts"] = _q_cep_topk_hosts
    q["cep_late_updates"] = _q_cep_late_updates
    q["window_host_hll"] = _q_window_host_hll
    return q


# ---------------------------------------------------------------------------
# Oracles for the synthetic-pages queries. The driver compares at sf=0.01,
# where _q_sniff_pages/_q_cep_stream materialize exactly these deterministic
# parquet paths (sources/pages.py: tag=f"q-{rows}", rows=min(sf*6M, 20000));
# DuckDB reads them directly with read_parquet(). Window size 600s and the
# prior crawl = the first rows//2 pages of the same deterministic stream
# mirror _q_cep_stream's parameters.
# ---------------------------------------------------------------------------
_SF001_ROWS = 20000
_PAGES_GLOB = (
    f"/tmp/headson_ray_pages/q-{_SF001_ROWS}-r{_SF001_ROWS}-s42/"
    "shard-*.parquet"
)
_PRIOR_GLOB = (
    f"/tmp/headson_ray_pages/q-{_SF001_ROWS}-r{_SF001_ROWS // 2}-s42/"
    "shard-*.parquet"
)

# content_inspector-parity sniff over the binary html column: BOM-prefixed
# UTF-8/16/32 payloads are text; otherwise a NUL in the first 1024 bytes
# (2048 hex chars) is binary. Matches stages/derive.py:looks_binary.
SQL_SNIFF_PAGES = f"""
SELECT url,
       COALESCE(
         NOT (hex(html) LIKE 'EFBBBF%' OR hex(html) LIKE 'FFFE0000%'
              OR hex(html) LIKE '0000FEFF%' OR hex(html) LIKE 'FFFE%'
              OR hex(html) LIKE 'FEFF%')
         AND regexp_matches(substring(hex(html), 1, 2048),
                            '^([0-9A-F]{{2}})*?00'),
         FALSE) AS skipped
FROM read_parquet('{_PAGES_GLOB}')
"""

# Batch oracle of the full streaming CEP run (tumbling pane flow): same
# windowing, dedup (first (domain,url) occurrence in stream order wins)
# and prior-crawl delta join, expressed over the same parquet stream.
# total_chars counts first-seen rows only, like the engine.
_CEP_WINDOW_US = 600 * 1_000_000
_DOMAIN_RE = "'^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)'"
SQL_CEP_STREAM_WINDOWS = f"""
WITH cur AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS domain,
         epoch_us(warc_ts) // {_CEP_WINDOW_US} AS window_id,
         url, length(text) AS n_chars, text, filename, file_row_number
  FROM read_parquet('{_PAGES_GLOB}', filename=true, file_row_number=true)
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY domain, url ORDER BY filename, file_row_number
  ) AS occ
  FROM cur
), joined AS (
  SELECT r.domain, r.window_id, r.n_chars,
         r.occ > 1 AS is_dup,
         pr.url IS NOT NULL AS in_prior,
         pr.text IS NOT DISTINCT FROM r.text AS same_text
  FROM ranked r
  LEFT JOIN read_parquet('{_PRIOR_GLOB}') pr USING (url)
)
SELECT domain, window_id,
       count(*) AS n_pages,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(sum(CASE WHEN NOT is_dup AND NOT in_prior
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN NOT is_dup AND in_prior AND NOT same_text
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(sum(CASE WHEN NOT is_dup AND in_prior AND same_text
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       CAST(sum(CASE WHEN NOT is_dup THEN n_chars ELSE 0 END) AS BIGINT)
         AS total_chars
FROM joined
GROUP BY domain, window_id
"""


# Per-host crawl aggregates. length(text) == utf8 codepoints on both
# sides (page text is generated ASCII-safe either way).
# Preview parity as a hashable oracle (round-4 verdict task 8): the
# 5000-page stream _q_summarize_pages consumes is identical across sf
# dirs (row cap), so the oracle reads the committed per-url preview
# fixture generated by the snapshot-validated core
# (tools/build_preview_fixtures.py; staleness caught by the fixture-
# parity test in tests/test_queries_oracle.py).
import os as _os

_PAGE_PREVIEW_FIXTURE = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)),
    "tests", "fixtures", "page_previews.parquet",
)
SQL_SUMMARIZE_PAGES = f"""
SELECT url, domain, preview FROM read_parquet('{_PAGE_PREVIEW_FIXTURE}')
"""


# Streaming coverage = fold of the CEP pane oracle: per window, total
# pages and one distinct-host unit per (domain, window) pane row. The
# engine's pane n_pages counts every routed row (dups included), so the
# fold is prior-crawl-independent.
SQL_CEP_WINDOW_COVERAGE = f"""
WITH w AS ({SQL_CEP_STREAM_WINDOWS})
SELECT CAST(window_id * {_CEP_WINDOW_US} AS BIGINT) AS win_start,
       CAST(sum(n_pages) AS BIGINT) AS n_pages,
       CAST(count(*) AS BIGINT) AS n_hosts
FROM w GROUP BY window_id
"""


# Update-mode lateness: the converged materialized view equals the
# plain batch aggregate over the same stream, whatever the (deliberately
# disordered) arrival schedule — that convergence IS the contract.
SQL_CEP_LATE_UPDATES = f"""
SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS domain,
       CAST(epoch_us(warc_ts) // {_CEP_WINDOW_US} * {_CEP_WINDOW_US}
            AS BIGINT) AS win_start,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM read_parquet('{_PAGES_GLOB}')
GROUP BY 1, 2
"""

from headson_ray.pipelines.webtext import CEP_TOPK_HOSTS as _CEP_TOPK_K

# Streaming top-k = ROW_NUMBER over the pane oracle with the fold's
# exact total order (n_pages DESC, domain ASC) — rank ties impossible.
SQL_CEP_TOPK_HOSTS = f"""
WITH w AS ({SQL_CEP_STREAM_WINDOWS}), r AS (
  SELECT window_id, domain, n_pages,
         ROW_NUMBER() OVER (
           PARTITION BY window_id
           ORDER BY n_pages DESC, domain
         ) AS rnk
  FROM w
)
SELECT CAST(window_id * {_CEP_WINDOW_US} AS BIGINT) AS win_start,
       CAST(rnk AS BIGINT) AS rnk, domain,
       CAST(n_pages AS BIGINT) AS n_pages
FROM r WHERE rnk <= {_CEP_TOPK_K}
"""


# HLL register state per window, recomputed bit-for-bit: host string ->
# codepoint Horner mod 2^64 -> two mix rounds (the stages/hashing.py
# family, same staged CTEs as the minhash oracle), register = v % 256,
# rho = 57 - bit_length(v // 256). DISTINCT (window, host) first — max
# over duplicates is unchanged and the char-level Horner runs once per
# distinct host.
def _window_host_hll_sql() -> str:
    from headson_ray.pipelines.queries import _M64, _mixr_sql

    w_us = 600 * 1_000_000
    return f"""
WITH p AS (
  SELECT DISTINCT regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         epoch_us(warc_ts) // {w_us} * {w_us} AS win_start
  FROM read_parquet('{_PAGES_GLOB}')
), h0 AS (
  SELECT win_start,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             [CAST(ord(ch) AS HUGEINT) for ch in string_split(host, '')]),
             (a, x) -> (a * 1000003 + x) % {_M64}) AS v
  FROM p
), hm1 AS (SELECT win_start, {_mixr_sql('v')} AS v FROM h0),
hm2 AS (SELECT win_start, {_mixr_sql('v')} AS v FROM hm1),
r AS (
  SELECT win_start, CAST(v % 256 AS BIGINT) AS register, v // 256 AS w
  FROM hm2
), pw AS (
  SELECT i, CAST(2 AS HUGEINT) ** i AS p FROM range(57) t(i)
), bl AS (
  SELECT win_start, register,
         COALESCE((SELECT max(pw.i) + 1 FROM pw WHERE pw.p <= r.w), 0)
           AS bitlen
  FROM r
)
SELECT CAST(win_start AS BIGINT) AS win_start, register,
       CAST(max(57 - bitlen) AS BIGINT) AS rho
FROM bl GROUP BY 1, 2
"""


SQL_WINDOW_HOST_HLL = _window_host_hll_sql()


# Streaming sessionization oracle: gaps-and-islands over (domain, ts)
# with the engine's 1800s default gap. Exact because the deterministic
# stream has no session-late rows at these parameters (n_late == 0,
# asserted in tests/test_cep.py) and every aggregate is
# arrival-order-invariant (min/max/count/sum over the session's rows).
_SESSION_GAP_US = 1800 * 1_000_000
SQL_CEP_SESSIONS = f"""
WITH src AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS domain,
         epoch_us(warc_ts) AS ts, length(text) AS n_chars, url
  FROM read_parquet('{_PAGES_GLOB}')
), o AS (
  -- ORDER BY must be TOTAL (ts, url): with ts ties alone, lag and the
  -- running sum below may evaluate under DIFFERENT tie orders and split
  -- a tied pair across sessions nondeterministically
  SELECT domain, ts, n_chars, url,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM src
  WINDOW w AS (PARTITION BY domain ORDER BY ts, url)
), g AS (
  SELECT domain, ts, n_chars,
         sum(brk) OVER (
           PARTITION BY domain ORDER BY ts, url
           ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM o
)
SELECT domain,
       CAST(min(ts) AS BIGINT) AS session_start,
       CAST(max(ts) AS BIGINT) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM g GROUP BY domain, sid
"""


# Streaming crawl-delta = host-grain fold of the CEP pane oracle (the
# pane SQL already reproduces the dedup + prior-crawl classification).
SQL_CEP_CRAWL_DELTA = f"""
WITH w AS ({SQL_CEP_STREAM_WINDOWS})
SELECT domain AS host,
       CAST(sum(n_new) AS BIGINT) AS n_new,
       CAST(sum(n_changed) AS BIGINT) AS n_changed,
       CAST(sum(n_unchanged) AS BIGINT) AS n_unchanged,
       CAST(sum(n_dup) AS BIGINT) AS n_dup
FROM w GROUP BY domain
"""


SQL_URL_HOST_STATS = rf"""
WITH p AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         epoch_us(warc_ts) AS ts, length(text) AS n_chars
  FROM read_parquet('{_PAGES_GLOB}')
)
SELECT host,
       regexp_extract(host, '\.([^.]+)$', 1) AS tld,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(ts) AS BIGINT) AS first_ts,
       CAST(max(ts) AS BIGINT) AS last_ts
FROM p GROUP BY host
"""

# Messy-variant derivation + canonicalization, same spec as
# webtext.derive_url_variants / canonicalize_urls: the SAME RE2 patterns
# run on both sides, so canonical_url is compared byte-for-byte.
_URL_HEAD_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)(.*)$"
SQL_URL_CANONICAL_DEDUP = rf"""
WITH src AS (
  SELECT url, epoch_us(warc_ts) AS ts,
         CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS BIGINT) AS i,
         regexp_extract(url, '{_URL_HEAD_RE}', 1) AS head,
         regexp_extract(url, '{_URL_HEAD_RE}', 2) AS rest
  FROM read_parquet('{_PAGES_GLOB}')
), obs AS (
  SELECT url AS raw_url, ts FROM src
  UNION ALL
  SELECT url || '?ref=r' || (i % 5) ||
         '&utm_source=feed&utm_campaign=c' || (i % 7), ts + 1
  FROM src WHERE i % 3 >= 1
  UNION ALL
  SELECT upper(head) || rest || '#s' || (i % 4), ts + 2
  FROM src WHERE i % 3 = 2
), canon AS (
  SELECT raw_url, ts,
    regexp_replace(
      regexp_replace(
        regexp_replace(raw_url, '#.*$', '', 'g'),
        'utm_[^&#]*&?', '', 'g'),
      '[?&]+$', '', 'g') AS s3
  FROM obs
), canon2 AS (
  SELECT raw_url, ts, regexp_replace(s3, '\?&', '?', 'g') AS s4
  FROM canon
), final AS (
  SELECT raw_url, ts,
         lower(regexp_extract(s4, '{_URL_HEAD_RE}', 1)) ||
           regexp_extract(s4, '{_URL_HEAD_RE}', 2) AS canonical_url
  FROM canon2
)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_seen,
       CAST(sum(CASE WHEN raw_url <> canonical_url THEN 1 ELSE 0 END)
            AS BIGINT) AS n_modified,
       CAST(min(ts) AS BIGINT) AS first_ts
FROM final GROUP BY canonical_url
"""

SQL_HOST_CRAWL_OVERLAP = rf"""
WITH cur AS (
  SELECT DISTINCT url FROM read_parquet('{_PAGES_GLOB}')
), pr AS (
  SELECT DISTINCT url FROM read_parquet('{_PRIOR_GLOB}')
), j AS (
  SELECT regexp_extract(cur.url, {_DOMAIN_RE}, 1) AS host,
         CASE WHEN pr.url IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM cur LEFT JOIN pr USING (url)
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(hit) AS BIGINT) AS n_overlap,
       CAST(CAST(sum(hit) AS BIGINT) * 1000000 // count(*) AS BIGINT)
         AS overlap_ppm
FROM j GROUP BY host
"""


# Majority language per host: counts per (host, lang), majority picked
# with ties broken by lexicographically smallest lang — exactly
# webtext._lang_majority's lexsort((lang, -cnt)) order.
SQL_HOST_LANG_PROFILE = f"""
WITH c AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host, lang,
         count(*) AS cnt
  FROM read_parquet('{_PAGES_GLOB}')
  GROUP BY host, lang
), t AS (
  SELECT host, sum(cnt) AS n_pages, count(*) AS n_langs FROM c GROUP BY host
), r AS (
  SELECT host, lang, cnt,
         row_number() OVER (
           PARTITION BY host ORDER BY cnt DESC, lang ASC
         ) AS rn
  FROM c
)
SELECT r.host,
       CAST(t.n_pages AS BIGINT) AS n_pages,
       CAST(t.n_langs AS BIGINT) AS n_langs,
       r.lang AS top_lang,
       CAST(r.cnt * 1000000 // t.n_pages AS BIGINT) AS top_lang_ppm
FROM r JOIN t USING (host) WHERE r.rn = 1
"""

# Per-page extraction ratio: utf8 chars of text (generated ASCII-safe,
# so length() == codepoints on both sides) vs raw html BYTES.
SQL_EXTRACTION_RATIOS = f"""
SELECT url,
       CAST(length(text) AS BIGINT) AS text_chars,
       CAST(octet_length(html) AS BIGINT) AS html_bytes,
       CAST(length(text) * 1000000 // octet_length(html) AS BIGINT)
         AS extract_ppm,
       length(text) * 1000000 // octet_length(html) < 100000 AS is_thin
FROM read_parquet('{_PAGES_GLOB}')
"""

# Mirror derivation (i % 4 == 0 pages also served by m.<host>) + host
# pairs sharing content. SQL joins on the text itself where the Ray
# side joins on its 64-bit fingerprint — identical output absent hash
# collisions (same contract as host_crawl_overlap's url-hash join).
SQL_MIRROR_HOSTS = f"""
WITH src AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host, text,
         CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS BIGINT) AS i
  FROM read_parquet('{_PAGES_GLOB}')
), obs AS (
  SELECT DISTINCT host, text FROM src
  UNION
  SELECT DISTINCT 'm.' || host, text FROM src WHERE i % 4 = 0
), tot AS (
  SELECT host, count(*) AS n FROM obs GROUP BY host
), pairs AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared_fps
  FROM obs a JOIN obs b ON a.text = b.text AND a.host < b.host
  GROUP BY 1, 2
)
SELECT host_a, host_b,
       CAST(shared_fps AS BIGINT) AS shared_fps,
       CAST(ta.n AS BIGINT) AS n_a,
       CAST(tb.n AS BIGINT) AS n_b,
       CAST(shared_fps * 1000000 // (ta.n + tb.n - shared_fps) AS BIGINT)
         AS jaccard_ppm
FROM pairs
JOIN tot ta ON ta.host = pairs.host_a
JOIN tot tb ON tb.host = pairs.host_b
"""


# Mirror-cluster canonicalization: the three-tier alias derive (host,
# m.host on i%4==0, cdn.host on i%8==0), strong pairs at Jaccard >=
# 0.2 (integer ppm, same floor division as the Ray kernel), then a
# recursive-CTE transitive closure; canonical = lexicographic min
# member (hosts are ASCII, so DuckDB byte-wise VARCHAR min == Python
# str min). Exact absent 64-bit text-fp collisions (same contract as
# mirror_hosts).
SQL_MIRROR_ALIAS_CLUSTERS = f"""
WITH RECURSIVE src AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host, text,
         CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS BIGINT) AS i
  FROM read_parquet('{_PAGES_GLOB}')
), obs AS (
  SELECT DISTINCT host, text FROM src
  UNION
  SELECT DISTINCT 'm.' || host, text FROM src WHERE i % 4 = 0
  UNION
  SELECT DISTINCT 'cdn.' || host, text FROM src WHERE i % 8 = 0
), tot AS (
  SELECT host, count(*) AS n FROM obs GROUP BY host
), pairs AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
  FROM obs a JOIN obs b ON a.text = b.text AND a.host < b.host
  GROUP BY 1, 2
), strong AS (
  SELECT host_a AS a, host_b AS b
  FROM pairs
  JOIN tot ta ON ta.host = pairs.host_a
  JOIN tot tb ON tb.host = pairs.host_b
  WHERE shared * 1000000 // (ta.n + tb.n - shared) >= 200000
), edges AS (
  SELECT a, b FROM strong UNION SELECT b, a FROM strong
), nodes AS (
  SELECT DISTINCT a AS host FROM edges
), reach(host, r) AS (
  SELECT host, host FROM nodes
  UNION
  SELECT reach.host, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT host, min(r) AS canonical_host FROM reach GROUP BY host
"""


# Boilerplate injection (cookie banner on every page; nav+footer on
# i % 2 == 0 pages) + per-(host, line) support counting, mirroring
# webtext.derive_boilerplate_pages / host_boilerplate_lines. A line is
# boilerplate when support >= 2 and support >= 40% of the host's pages.
SQL_HOST_BOILERPLATE_LINES = f"""
WITH src AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS BIGINT) AS i,
         text
  FROM read_parquet('{_PAGES_GLOB}')
), pages AS (
  SELECT host,
         'cookie notice: ' || host || chr(10) ||
         CASE WHEN i % 2 = 0
              THEN 'nav | ' || host || ' | home' || chr(10) || text ||
                   chr(10) || '(c) ' || host || ' footer'
              ELSE text END AS full_text
  FROM src
), pl AS (
  SELECT host, unnest(list_distinct(string_split(full_text, chr(10))))
           AS line
  FROM pages
), sup AS (
  SELECT host, line, count(*) AS support FROM pl GROUP BY host, line
), hp AS (
  SELECT host, count(*) AS n_pages FROM src GROUP BY host
), per AS (
  SELECT s.host,
         count(*) AS n_distinct_lines,
         sum(CASE WHEN s.support >= 2
                   AND s.support * 1000000 >= 400000 * h.n_pages
                  THEN 1 ELSE 0 END) AS n_boiler_lines
  FROM sup s JOIN hp h USING (host) GROUP BY s.host
)
SELECT h.host,
       CAST(h.n_pages AS BIGINT) AS n_pages,
       CAST(p.n_distinct_lines AS BIGINT) AS n_distinct_lines,
       CAST(p.n_boiler_lines AS BIGINT) AS n_boiler_lines,
       CAST(p.n_boiler_lines * 1000000 // p.n_distinct_lines AS BIGINT)
         AS boiler_line_ppm
FROM per p JOIN hp h USING (host)
"""


# Derived outlinks: page i -> (i+1) % N and (7i+3) % N (page indices
# are contiguous 0..N-1 in the materialized stream). Host-level edge
# counts via a self-join on the target index.
_SQL_LINK_GRAPH_BASE = f"""
WITH src AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS BIGINT) AS i
  FROM read_parquet('{_PAGES_GLOB}')
), nn AS (
  SELECT count(*) AS n FROM src
), e AS (
  SELECT s.host AS src_host, (s.i + 1) % nn.n AS t FROM src s CROSS JOIN nn
  UNION ALL
  SELECT s.host, (s.i * 7 + 3) % nn.n FROM src s CROSS JOIN nn
), g AS (
  SELECT e.src_host, d.host AS dst_host, count(*) AS n_links
  FROM e JOIN src d ON d.i = e.t
  GROUP BY 1, 2
)"""

SQL_HOST_LINK_GRAPH = (
    _SQL_LINK_GRAPH_BASE
    + """
SELECT src_host, dst_host, CAST(n_links AS BIGINT) AS n_links FROM g
"""
)

# Triangle census: distinct undirected edges (a < b lexicographically
# in SQL, by node hash in Ray — set-identical either way), then the
# canonical a<b<c three-way self-join. Counts are orientation-free so
# both sides agree exactly.
# Degree histogram: g is already unique (src, dst) pair grain, so the
# per-host out-degree is a plain row count — then the histogram over it.
SQL_HOST_OUTDEGREE_HIST = (
    _SQL_LINK_GRAPH_BASE
    + """
, od AS (SELECT src_host, count(*) AS outdeg FROM g GROUP BY src_host)
SELECT CAST(outdeg AS BIGINT) AS outdeg,
       CAST(count(*) AS BIGINT) AS n_hosts
FROM od GROUP BY outdeg
"""
)

SQL_HOST_TRIANGLES = (
    _SQL_LINK_GRAPH_BASE
    + """
, ue AS (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM g WHERE src_host <> dst_host
), nodes AS (
  SELECT a AS h FROM ue UNION SELECT b FROM ue
)
SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_hosts,
       CAST((SELECT count(*) FROM ue) AS BIGINT) AS n_edges,
       CAST((SELECT count(*)
             FROM ue e1
             JOIN ue e2 ON e2.a = e1.a AND e2.b > e1.b
             JOIN ue e3 ON e3.a = e1.b AND e3.b = e2.b)
            AS BIGINT) AS n_triangles
"""
)

# Transitivity: wedges = sum over nodes of C(deg, 2) on the undirected
# deduped edge set; triangles as above; 3T/W in integer ppm (floor
# division on both sides, so the ratio is bit-exact).
SQL_HOST_TRANSITIVITY = (
    _SQL_LINK_GRAPH_BASE
    + """
, ue AS (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM g WHERE src_host <> dst_host
), degs AS (
  SELECT h, count(*) AS deg
  FROM (SELECT a AS h FROM ue UNION ALL SELECT b FROM ue)
  GROUP BY h
), w AS (
  SELECT COALESCE(sum(deg * (deg - 1) // 2), 0) AS n_wedges FROM degs
), tri AS (
  SELECT count(*) AS n_triangles
  FROM ue e1
  JOIN ue e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ue e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(CASE WHEN n_wedges > 0
                 THEN 3 * n_triangles * 1000000 // n_wedges
                 ELSE 0 END AS BIGINT) AS transitivity_ppm
FROM w, tri
"""
)


# Weakly-connected components: recursive closure over the symmetric
# edge set; canonical = component's lexicographic-min host (hosts are
# ASCII, so DuckDB byte-wise VARCHAR min == the Ray side's string min —
# the mirror_alias_clusters contract). WITH RECURSIVE must govern the
# whole CTE list, so the shared base is rewritten in place.
SQL_HOST_COMPONENTS = (
    _SQL_LINK_GRAPH_BASE.replace("WITH src", "WITH RECURSIVE src")
    + """
, ue AS (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM g WHERE src_host <> dst_host
), edges AS (
  SELECT a, b FROM ue UNION SELECT b, a FROM ue
), nodes AS (
  SELECT DISTINCT a AS host FROM edges
), reach(host, r) AS (
  SELECT host, host FROM nodes
  UNION
  SELECT reach.host, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT host, min(r) AS component_host FROM reach GROUP BY host
"""
)

# Reciprocity: distinct directed edges (g is already per-pair grain),
# self-loops excluded; an edge is reciprocal when its reverse exists.
SQL_HOST_RECIPROCITY = (
    _SQL_LINK_GRAPH_BASE
    + """
, de AS (
  SELECT src_host, dst_host FROM g WHERE src_host <> dst_host
), r AS (
  SELECT CAST((SELECT count(*) FROM de) AS BIGINT) AS n_edges,
         CAST((SELECT count(*)
               FROM de e1 JOIN de e2
                 ON e2.src_host = e1.dst_host
                AND e2.dst_host = e1.src_host) AS BIGINT) AS n_reciprocal
)
SELECT n_edges, n_reciprocal,
       CAST(CASE WHEN n_edges > 0
                 THEN n_reciprocal * 1000000 // n_edges
                 ELSE 0 END AS BIGINT) AS reciprocity_ppm
FROM r
"""
)


def _pagerank_sql() -> str:
    """Chained-CTE mirror of webtext.host_pagerank: SCALE=1e9 fixed
    point, floor division per edge, then 85%-damp floor + teleport —
    identical arithmetic order to the numpy fold."""
    from headson_ray.pipelines.webtext import (
        PAGERANK_DAMP_PCT,
        PAGERANK_ITERS,
        PAGERANK_SCALE,
    )

    parts = [
        _SQL_LINK_GRAPH_BASE
        + f""", hosts AS (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM g UNION SELECT dst_host FROM g
  )
), nh AS (
  SELECT count(*) AS nh FROM hosts
), outd AS (
  SELECT src_host AS host, sum(n_links) AS outw FROM g GROUP BY 1
), r0 AS (
  SELECT host, CAST({PAGERANK_SCALE} // nh.nh AS BIGINT) AS r
  FROM hosts CROSS JOIN nh
)"""
    ]
    for k in range(1, PAGERANK_ITERS + 1):
        parts.append(
            f""", r{k} AS (
  SELECT h.host,
         CAST((15 * CAST({PAGERANK_SCALE} AS BIGINT) // 100) // nh.nh
              + {PAGERANK_DAMP_PCT} * COALESCE(c.contrib, 0) // 100
              AS BIGINT) AS r
  FROM hosts h CROSS JOIN nh
  LEFT JOIN (
    SELECT g.dst_host AS host,
           sum(r{k - 1}.r * g.n_links // o.outw) AS contrib
    FROM g
    JOIN r{k - 1} ON r{k - 1}.host = g.src_host
    JOIN outd o ON o.host = g.src_host
    GROUP BY 1
  ) c ON c.host = h.host
)"""
        )
    parts.append(
        f"""
SELECT host, CAST(r AS BIGINT) AS pr_rank FROM r{PAGERANK_ITERS}
"""
    )
    return "".join(parts)


SQL_HOST_PAGERANK = _pagerank_sql()


# Politeness cut mirror: earliest BUDGET_PER_HOST fetches per host by
# (warc_ts, url) — urls are unique so the order is total and the cut
# deterministic (webtext._budget_partial/_budget_final).
SQL_HOST_CRAWL_BUDGET = f"""
WITH src AS (
  SELECT url, regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         epoch_us(warc_ts) AS ts_us
  FROM read_parquet('{_PAGES_GLOB}')
), r AS (
  SELECT host, url, ts_us,
         row_number() OVER (
           PARTITION BY host ORDER BY ts_us ASC, url ASC
         ) AS rnk
  FROM src
)
SELECT host, url, CAST(ts_us AS BIGINT) AS ts_us,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 8
"""


# Intra-host duplicate-page rate: pages with i % 6 == 0 serve the
# host's landing template (mirrored from webtext._dup_rate_partial).
# SQL counts DISTINCT effective texts where the Ray side counts
# distinct 64-bit fingerprints — identical output absent hash
# collisions (same contract as mirror_hosts / host_change_rate).
SQL_HOST_DUP_RATE = f"""
WITH src AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS BIGINT) AS i,
         text
  FROM read_parquet('{_PAGES_GLOB}')
), eff AS (
  SELECT host,
         CASE WHEN i % 6 = 0 THEN 'landing page for ' || host
              ELSE text END AS t
  FROM src
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT t) AS BIGINT) AS n_distinct,
       CAST((count(*) - count(DISTINCT t)) * 1000000 // count(*)
            AS BIGINT) AS dup_ppm
FROM eff GROUP BY host
"""


# Crawl-frontier priority: score = ((gmax_ts - ts) // 1e6 seconds)
# * 1000 // host_page_count, floor division throughout (mirrored from
# webtext._frontier_score_stage); global top FRONTIER_K=200 with ties
# broken by url ASC.
SQL_FRONTIER_TOPK = f"""
WITH p AS (
  SELECT url, regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         epoch_us(warc_ts) AS ts
  FROM read_parquet('{_PAGES_GLOB}')
), h AS (
  SELECT host, count(*) AS n FROM p GROUP BY host
), g AS (
  SELECT max(ts) AS gmax FROM p
), scored AS (
  SELECT p.url, p.host,
         ((g.gmax - p.ts) // 1000000) * 1000 // h.n AS score
  FROM p CROSS JOIN g JOIN h ON h.host = p.host
), r AS (
  SELECT row_number() OVER (ORDER BY score DESC, url ASC) AS rnk,
         url, host, score
  FROM scored
)
SELECT CAST(rnk AS BIGINT) AS rnk, url, host,
       CAST(score AS BIGINT) AS score
FROM r WHERE rnk <= 200
"""


# Incremental-crawl delta ledger: full outer join of the two crawls'
# DISTINCT url sets (the Ray side resolves membership in url-hash
# buckets over 64-bit hashes — identical output absent collisions,
# the same contract as host_crawl_overlap).
SQL_HOST_CRAWL_DELTA = f"""
WITH cur AS (
  SELECT DISTINCT url, regexp_extract(url, {_DOMAIN_RE}, 1) AS host
  FROM read_parquet('{_PAGES_GLOB}')
), pr AS (
  SELECT DISTINCT url, regexp_extract(url, {_DOMAIN_RE}, 1) AS host
  FROM read_parquet('{_PRIOR_GLOB}')
)
SELECT COALESCE(c.host, p.host) AS host,
       CAST(count(*) FILTER (p.host IS NULL) AS BIGINT) AS n_new,
       CAST(count(*) FILTER (c.host IS NOT NULL AND p.host IS NOT NULL)
            AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (c.host IS NULL) AS BIGINT) AS n_gone
FROM cur c FULL OUTER JOIN pr p USING (url)
GROUP BY 1
"""


# Windowed crawl coverage: tumbling 600s event-time windows (epoch-us
# floor division, mirrored from webtext._coverage_partial) x exact
# distinct-host counting.
SQL_WINDOW_HOST_COVERAGE = f"""
WITH p AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         (epoch_us(warc_ts) // {600 * 1_000_000}) * {600 * 1_000_000}
           AS win_start
  FROM read_parquet('{_PAGES_GLOB}')
)
SELECT CAST(win_start AS BIGINT) AS win_start,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM p GROUP BY win_start
"""


# Inter-crawl change detection: the CURRENT crawl serves updated
# content (text || ' rev2') for pages with i % 5 == 0 — mirrored from
# webtext._change_explode. The SQL compares the text itself where the
# Ray side compares 64-bit content fingerprints — identical output
# absent hash collisions (same contract as mirror_hosts). Only urls
# present in both crawls produce rows.
SQL_HOST_CHANGE_RATE = f"""
WITH cur AS (
  SELECT DISTINCT url, regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         CASE WHEN CAST(regexp_extract(url, '/page/([0-9]+)$', 1)
                    AS BIGINT) % 5 = 0
              THEN text || ' rev2' ELSE text END AS text
  FROM read_parquet('{_PAGES_GLOB}')
), pr AS (
  SELECT DISTINCT url, text FROM read_parquet('{_PRIOR_GLOB}')
), j AS (
  SELECT cur.host,
         CASE WHEN cur.text <> pr.text THEN 1 ELSE 0 END AS chg
  FROM cur JOIN pr USING (url)
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_refetched,
       CAST(sum(chg) AS BIGINT) AS n_changed,
       CAST(sum(chg) * 1000000 // count(*) AS BIGINT) AS change_ppm
FROM j GROUP BY host
"""


# Anchor terms derive from (src_i, t) alone — mirrored from
# webtext._anchor_explode: w<(i*5 + t*2) % 97> and w<(i + t*3) % 53> —
# then count per destination host and keep the top 3 per host with ties
# broken by lexicographically smallest term (webtext._anchor_topk's
# lexsort((term, -n)) order).
SQL_HOST_ANCHOR_TERMS = f"""
WITH src AS (
  SELECT regexp_extract(url, {_DOMAIN_RE}, 1) AS host,
         CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS BIGINT) AS i
  FROM read_parquet('{_PAGES_GLOB}')
), nn AS (
  SELECT count(*) AS n FROM src
), e AS (
  SELECT s.i AS src_i, (s.i + 1) % nn.n AS t FROM src s CROSS JOIN nn
  UNION ALL
  SELECT s.i, (s.i * 7 + 3) % nn.n FROM src s CROSS JOIN nn
), et AS (
  SELECT t, 'w' || CAST((src_i * 5 + t * 2) % 97 AS VARCHAR) AS term
  FROM e
  UNION ALL
  SELECT t, 'w' || CAST((src_i + t * 3) % 53 AS VARCHAR) FROM e
), c AS (
  SELECT d.host AS dst_host, et.term, count(*) AS n_mentions
  FROM et JOIN src d ON d.i = et.t
  GROUP BY 1, 2
), r AS (
  SELECT dst_host, term, n_mentions,
         row_number() OVER (
           PARTITION BY dst_host ORDER BY n_mentions DESC, term ASC
         ) AS rnk
  FROM c
)
SELECT dst_host, term,
       CAST(n_mentions AS BIGINT) AS n_mentions,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
"""


def oracle_sql() -> dict[str, str]:
    o = dict(ORACLE_SQL)
    o["sniff_pages"] = SQL_SNIFF_PAGES
    o["cep_stream_windows"] = SQL_CEP_STREAM_WINDOWS
    o["url_host_stats"] = SQL_URL_HOST_STATS
    o["url_canonical_dedup"] = SQL_URL_CANONICAL_DEDUP
    o["host_crawl_overlap"] = SQL_HOST_CRAWL_OVERLAP
    o["host_lang_profile"] = SQL_HOST_LANG_PROFILE
    o["extraction_ratios"] = SQL_EXTRACTION_RATIOS
    o["mirror_hosts"] = SQL_MIRROR_HOSTS
    o["mirror_alias_clusters"] = SQL_MIRROR_ALIAS_CLUSTERS
    o["host_boilerplate_lines"] = SQL_HOST_BOILERPLATE_LINES
    o["host_link_graph"] = SQL_HOST_LINK_GRAPH
    o["host_outdegree_hist"] = SQL_HOST_OUTDEGREE_HIST
    o["host_triangles"] = SQL_HOST_TRIANGLES
    o["host_transitivity"] = SQL_HOST_TRANSITIVITY
    o["host_components"] = SQL_HOST_COMPONENTS
    o["host_reciprocity"] = SQL_HOST_RECIPROCITY
    o["host_pagerank"] = SQL_HOST_PAGERANK
    o["host_anchor_terms"] = SQL_HOST_ANCHOR_TERMS
    o["host_change_rate"] = SQL_HOST_CHANGE_RATE
    o["host_crawl_budget"] = SQL_HOST_CRAWL_BUDGET
    o["host_dup_rate"] = SQL_HOST_DUP_RATE
    o["frontier_topk"] = SQL_FRONTIER_TOPK
    o["window_host_coverage"] = SQL_WINDOW_HOST_COVERAGE
    o["host_crawl_delta"] = SQL_HOST_CRAWL_DELTA
    o["cep_window_coverage"] = SQL_CEP_WINDOW_COVERAGE
    o["cep_crawl_delta"] = SQL_CEP_CRAWL_DELTA
    o["cep_sessions"] = SQL_CEP_SESSIONS
    o["cep_topk_hosts"] = SQL_CEP_TOPK_HOSTS
    o["cep_late_updates"] = SQL_CEP_LATE_UPDATES
    o["window_host_hll"] = SQL_WINDOW_HOST_HLL
    o["summarize_pages"] = SQL_SUMMARIZE_PAGES
    return o
