"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, ...}

--scaling runs the headline pipeline at two parallelism levels (8 and 32
CPUs by default) in fresh subprocesses on the same input and reports both
throughputs + scaling efficiency (the N vs 4N cluster-size stand-in).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf() -> float:
    name = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.0


def _pages_rows() -> int:
    # summarizer bench sized down vs lineitem scale: the per-doc transform
    # is the expensive stage (Python algorithm, ~1-3 ms/doc).
    # GRAFT_ROWS_MULT (set by --scaling) enlarges the job so per-run fixed
    # costs (pool startup, per-micro-batch scheduling) amortize the way a
    # long-running cluster job would.
    mult = int(os.environ.get("GRAFT_ROWS_MULT", "1"))
    return max(2000, int(_sf() * 1_200_000)) * mult


def run_benchmarks(num_cpus: int, headline_only: bool = False) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        # worker log lines race with the final summary line on stdout;
        # a stray "(pid=...)" line AFTER the JSON would break the
        # driver's last-line parse
        log_to_driver=False,
    )
    from headson_ray.pipelines.cep import CepEngine
    from headson_ray.pipelines.flagship import summarize_pages
    from headson_ray.pipelines.queries import QUERIES
    from headson_ray.sources.pages import materialize_pages

    import shutil
    import tempfile

    results: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- headline 1: summarized-docs/sec ---------------------------------
    rows = _pages_rows()
    paths = materialize_pages(
        rows, tag=f"bench-{rows}", num_shards=max(8, rows // 10_000)
    )
    t0 = time.time()
    ds = summarize_pages(
        paths,
        budget=500,
        # fixed-size actor pool: autoscaling from a small floor leaves the
        # pool under-provisioned for most of a short run. Reserve
        # ~num_cpus/8 slots for the read/write task stages: at 32 CPUs a
        # 30-actor pool starves them (27.0k docs/s vs 31.4k at 28 in the
        # session-3 A/B; at 8 CPUs 6 actors is the measured optimum, and
        # 8 - max(2, 1) = 6 keeps it).
        concurrency=max(2, num_cpus - max(2, num_cpus // 8)),
        batch_size=128,
    )
    # realistic consumption: parallel parquet sink (read -> map -> write)
    out_dir = tempfile.mkdtemp(prefix="headson-bench-flagship-")
    ds.write_parquet(out_dir)
    import glob

    import pyarrow.parquet as _pq

    n = sum(
        _pq.ParquetFile(p).metadata.num_rows
        for p in glob.glob(out_dir + "/*.parquet")
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    dt = time.time() - t0
    results["summarize_pages"] = dt
    extras["summarize_docs_per_sec"] = n / dt
    extras["summarize_rows"] = n

    # --- headline 2: windows-finalized/sec (streaming CEP) ---------------
    work = tempfile.mkdtemp(prefix="headson-bench-cep-")
    try:
        import ray as _ray

        eng = CepEngine(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=max(2, num_cpus // 4),
            window_size_s=600,
            allowed_lateness_s=60,
            # realistic end-to-end stream: summarize every page (exactly-
            # once preview output), then window/dedup/join the results
            summarize_budget=300,
            summarizer_concurrency=max(2, num_cpus - 2),
        )
        # actor pool startup is cluster setup, not stream throughput:
        # wait for every state actor to be live BEFORE the clock starts
        # (keeps this figure comparable with the repo-recorded runs
        # regardless of how cold the process is)
        _ray.get([a.stats.remote() for a in eng.actors])
        n_g = max(1, len(paths) // 4)
        groups = [paths[i : i + n_g] for i in range(0, len(paths), n_g)]
        t0 = time.time()
        m = eng.run(groups)
        dt = time.time() - t0
        results["cep_stream"] = dt
        extras["windows_finalized_per_sec"] = m["windows_emitted"] / dt
        extras["cep_rows_per_sec"] = m["rows_processed"] / dt
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # --- catalog queries --------------------------------------------------
    for name in [] if headline_only else [
        "tumbling_events", "sliding_events", "session_events",
        "dedup_exact", "token_stats", "knn_topk", "ivf_topk", "lsh_topk",
        "embedding_near_dups", "embedding_near_dups_lsh", "lineitem_agg",
        "orders_by_segment", "minhash_near_dups", "cep_near_dup_stream",
        "cep_stream_join",
        "ngram_jaccard_pairs", "simhash_near_dups", "near_dup_canonical",
        "heavy_hitter_tokens", "value_rank_select", "regex_token_counts",
        "repetition_scores", "dup_shingle_stats", "substring_dup_spans",
        "bpe_merges", "domain_fileset_previews", "tfidf_top_terms",
        "late_events", "quality_filter", "windowed_topk_events",
        "event_transitions", "user_running_value", "kmeans_clusters",
        "stratified_sample", "cluster_label_purity",
        "event_session_ids", "reservoir_sample", "sequence_packing",
        "distinct_users_per_type", "video_frame_plans", "hll_user_registers",
        "text_scrub", "decontam_flags", "curation_pipeline",
        "event_concurrency", "event_pattern_matches", "blocklist_filter",
        "events_cube", "regional_nation_revenue",
        "late_ship_priority_counts", "customer_order_distribution",
        "user_top_event_type", "large_volume_orders",
        "idle_rich_customers", "small_quantity_part_revenue",
        "customer_balance_ranks", "promo_revenue_share",
        "top_supplier_revenue", "brand_disjunctive_revenue",
        "lonely_late_suppliers", "cms_user_registers",
        "user_event_type_pivot", "order_growth_by_quarter",
        "returned_customer_revenue", "nation_trade_volume",
        "value_moments_by_type", "repeat_buyer_customers",
        "forecast_revenue_change", "nation_market_share",
        "term_search_topk", "top_decile_revenue_share",
        "dup_cluster_size_hist", "customer_reorder_gaps",
        "dau_wau_stickiness", "nation_revenue_share_in_region",
        "user_retention_cohorts", "vocab_growth_by_source",
        "hourly_seasonality", "part_supplier_counts",
        "ship_latency_hist", "doc_len_quantiles_by_lang",
        "user_value_moving_sum", "user_first_last_value",
        "part_dominant_suppliers", "min_cost_part_supplier",
        "user_event_path", "part_value_threshold", "mixture_sample",
        "mixture_upsample", "lm_quality_scores",
        "returnflag_priority_counts",
    ]:
        t0 = time.time()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "iter_batches"):
            for _ in res.iter_batches(batch_format="pyarrow", batch_size=8192):
                pass
        results[name] = time.time() - t0

    # --- webtext crawl suite (pages-stream queries in __ray_entry__) -----
    if not headline_only:
        import __ray_entry__ as _entry

        eq = _entry.queries()
        for name in [
            "url_host_stats", "url_canonical_dedup", "host_crawl_overlap",
            "host_lang_profile", "extraction_ratios", "mirror_hosts",
            "host_boilerplate_lines", "host_link_graph", "host_pagerank",
            "host_anchor_terms", "host_change_rate", "host_crawl_budget",
            "host_dup_rate", "frontier_topk", "window_host_coverage",
            "host_crawl_delta", "cep_window_coverage", "cep_crawl_delta",
            "window_host_hll", "cep_sessions", "cep_topk_hosts",
            "cep_late_updates",
            "mirror_alias_clusters",
            "host_triangles", "host_components", "host_reciprocity",
            "host_outdegree_hist", "host_transitivity",
        ]:
            t0 = time.time()
            res = eq[name](SF_DIR)
            if hasattr(res, "iter_batches"):
                for _ in res.iter_batches(
                    batch_format="pyarrow", batch_size=8192
                ):
                    pass
            results[name] = time.time() - t0

    ray.shutdown()
    return {"queries": results, "extras": extras}


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += 1
    return x


def _hardware_scaling_baseline(lows: int, highs: int) -> float:
    """Pure-CPU-bound scaling ceiling of this machine: run N busy loops
    for a fixed wall interval at both widths and compare aggregate
    throughput. Turbo clocking / shared memory bandwidth mean highs/lows
    processes rarely reach the ideal highs/lows ratio — pipeline scaling
    efficiency should be read against this ceiling (a real N -> 4N node
    cluster adds whole machines instead of loading one machine 4x
    harder, so it does not pay this penalty)."""
    import multiprocessing as mp

    rates = {}
    for n in (lows, highs):
        with mp.Pool(n) as pool:
            rates[n] = sum(pool.map(_burn, range(n)))
    return (rates[highs] / rates[lows]) / (highs / lows)


def _membw_burn(_):
    """3s of streaming passes over a 32 MiB array (larger than any
    per-core LLC share): aggregate passes/s tracks achievable memory
    bandwidth, which is what Arrow-batch pipelines are actually bound
    by, unlike the cache-resident CPU burn above."""
    import numpy as np

    a = np.empty(32 * 1024 * 1024 // 8)
    a[:] = 1.0
    for _ in range(3):  # touch pages / warm the stream before timing
        a = a * 1.000001
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 3.0:
        a = a * 1.000001
        n += 1
    return n


def _membw_scaling_baseline(lows: int, highs: int) -> float:
    """Memory-bandwidth scaling ceiling of this machine: 8 processes on
    this box already saturate a large fraction of the shared memory
    controllers, so 4x the processes cannot pull 4x the bytes. A real
    N -> 4N *node* scale-up multiplies memory bandwidth along with
    cores (each node brings its own controllers), so a bandwidth-bound
    pipeline's single-box 8-vs-32-proc ratio must be read against this
    ceiling, not against the CPU-burn ceiling."""
    import multiprocessing as mp

    rates = {}
    for n in (lows, highs):
        with mp.Pool(n) as pool:
            rates[n] = sum(pool.map(_membw_burn, range(n)))
    return (rates[highs] / rates[lows]) / (highs / lows)


def _round_floats(obj, nd: int):
    """Round every float in a JSON-ish structure to nd decimals — the
    driver captures only a short tail of stdout, and round-4's
    full-precision summary line overflowed it (BENCH_r04 'parsed': null).
    Centisecond precision keeps the one-liner well under the window."""
    if isinstance(obj, float):
        return round(obj, nd)
    if isinstance(obj, dict):
        return {k: _round_floats(v, nd) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_round_floats(v, nd) for v in obj]
    return obj


def _emit(payload: dict) -> None:
    """ONE compact JSON summary line on stdout (rounded, no spaces) as
    the final line, plus the full-precision record in BENCH_LOCAL.json
    next to this file as the driver-independent fallback.

    Headline-only legs are --scaling subprocesses; they must not
    clobber BENCH_LOCAL.json (the parent --scaling emit, or a full
    catalog run, owns that record). The parent --scaling record goes
    to BENCH_SCALING.json so the catalog-timings record and the
    scaling record never overwrite each other."""
    if "--headline-only" in sys.argv:
        print(json.dumps(_round_floats(payload, 2),
                         separators=(",", ":")), flush=True)
        return
    fname = ("BENCH_SCALING.json" if "--scaling" in sys.argv
             else "BENCH_LOCAL.json")
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            fname)
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(_round_floats(payload, 2), separators=(",", ":")),
          flush=True)


def _page_cache_gb() -> float:
    """Page-cache size (GiB) from /proc/meminfo — passive, no I/O
    against the inputs, so recording it cannot perturb the legs."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("Cached:"):
                    return round(int(line.split()[1]) / (1 << 20), 2)
    except OSError:
        pass
    return -1.0


def _run_leg(cpus: int) -> tuple[dict, dict]:
    """One headline-only bench leg in a fresh subprocess; returns
    (parsed summary, host-state snapshot)."""
    state = {
        "started_unix": time.time(),
        "loadavg_1m_before": os.getloadavg()[0],
        # passive page-cache snapshot: a leg whose INPUT is already
        # resident reads systematically hot (r5 runs 7/9/10: 8-legs at
        # 7.8-10.8k docs/s vs 3-4k cold deflate the pair ratio); the
        # cached size before each leg makes that signature objective
        # in the trace instead of inferred from throughput.
        "page_cache_gb": _page_cache_gb(),
    }
    proc = subprocess.run(
        [sys.executable, __file__, "--single", str(cpus),
         "--headline-only"],
        capture_output=True,
        text=True,
        env={**os.environ, "RAY_GRAFT_CPUS": str(cpus),
             "GRAFT_ROWS_MULT": "4"},
    )
    line = proc.stdout.strip().splitlines()[-1]
    parsed = json.loads(line)
    state["wall_sec"] = parsed["value"]
    return parsed, state


def main() -> None:
    if "--scaling" in sys.argv:
        # Default 8->32; override with GRAFT_SCALING_LOW/HIGH to sample
        # the same 4x ratio at a different absolute point (e.g. 4->16,
        # below the box's measured DRAM-bandwidth saturation knee).
        lows = int(os.environ.get("GRAFT_SCALING_LOW", "8"))
        highs = int(os.environ.get("GRAFT_SCALING_HIGH", "32"))
        # --- membw gate (round-4 verdict task 3) -------------------------
        # The sandbox box's own 8->32-proc memory-bandwidth scaling dips
        # to 0.35-0.58 during documented troughs, dragging ANY pipeline
        # measurement down with it. Probe the ceiling FIRST and wait out
        # a trough instead of arguing normalization afterwards.
        gate_min = float(os.environ.get("GRAFT_MEMBW_GATE", "0.7"))
        gate_tries = int(os.environ.get("GRAFT_MEMBW_RETRIES", "3"))
        # r5 run 10 lesson: a single green probe between two 0.44-0.45
        # reads means the ceiling is FLAPPING, not recovered — require
        # GRAFT_MEMBW_CONSEC consecutive green probes before starting.
        gate_consec = int(os.environ.get("GRAFT_MEMBW_CONSEC", "2"))
        gate_trace = []
        green_run = 0
        for attempt in range(gate_tries):
            probe = _membw_scaling_baseline(lows, highs)
            gate_trace.append(
                {
                    "membw_scaling_efficiency": probe,
                    "loadavg_1m": os.getloadavg()[0],
                    "unix": time.time(),
                }
            )
            green_run = green_run + 1 if probe >= gate_min else 0
            if green_run >= gate_consec:
                break
            time.sleep(float(os.environ.get("GRAFT_MEMBW_COOLDOWN", "25")))
        membw_eff = gate_trace[-1]["membw_scaling_efficiency"]

        # --- interleaved leg pairs --------------------------------------
        # Each pair runs its 8- and 32-CPU legs back-to-back so both
        # sample the same host state; pair efficiencies are computed
        # within a pair, never across drifting host epochs.
        reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
        pair_cooldown = float(os.environ.get("GRAFT_PAIR_COOLDOWN", "75"))
        pairs = []
        for rep in range(reps):
            if rep:
                # let the box drain to steady state between pairs: the
                # 8-CPU leg started right after a 32-CPU leg reads
                # systematically hot (turbo/cache), deflating its
                # pair's ratio (r5 runs 1-3: every pair-2 8-leg ran
                # 0.9-1.1k docs/s above its pair-1 sibling)
                time.sleep(pair_cooldown)
            low_out, low_state = _run_leg(lows)
            high_out, high_state = _run_leg(highs)
            p = {"legs": {str(lows): low_state, str(highs): high_state}}
            for key, name in (
                ("summarize_docs_per_sec", "summarize"),
                ("cep_rows_per_sec", "cep"),
                ("windows_finalized_per_sec", "windows"),
            ):
                lo = low_out["extras"][key]
                hi = high_out["extras"][key]
                p[f"{name}_low"] = lo
                p[f"{name}_high"] = hi
                p[f"{name}_eff"] = (hi / lo) / (highs / lows)
            pairs.append(p)

        def mean(xs):
            return sum(xs) / len(xs)

        eff = mean([p["summarize_eff"] for p in pairs])
        cep_eff = mean([p["cep_eff"] for p in pairs])
        win_eff = mean([p["windows_eff"] for p in pairs])
        hw_eff = _hardware_scaling_baseline(lows, highs)
        _emit(
                {
                    "metric": "scaling_efficiency",
                    "value": eff,
                    "unit": "ratio",
                    "low_cpus": lows,
                    "high_cpus": highs,
                    "pairs": pairs,
                    "docs_per_sec_low": mean(
                        [p["summarize_low"] for p in pairs]
                    ),
                    "docs_per_sec_high": mean(
                        [p["summarize_high"] for p in pairs]
                    ),
                    "cep_rows_per_sec_low": mean(
                        [p["cep_low"] for p in pairs]
                    ),
                    "cep_rows_per_sec_high": mean(
                        [p["cep_high"] for p in pairs]
                    ),
                    "cep_scaling_efficiency": cep_eff,
                    "windows_per_sec_low": mean(
                        [p["windows_low"] for p in pairs]
                    ),
                    "windows_per_sec_high": mean(
                        [p["windows_high"] for p in pairs]
                    ),
                    "windows_scaling_efficiency": win_eff,
                    "hardware_scaling_efficiency": hw_eff,
                    "membw_scaling_efficiency": membw_eff,
                    "membw_gate": {
                        "min": gate_min,
                        "passed": green_run >= gate_consec,
                        "consecutive_required": gate_consec,
                        "trace": gate_trace,
                    },
                    "normalized_efficiency": eff / hw_eff,
                    "cep_normalized_efficiency": cep_eff / hw_eff,
                    "windows_normalized_efficiency": win_eff / hw_eff,
                    "membw_normalized_efficiency": eff / membw_eff,
                    "cep_membw_normalized_efficiency": cep_eff / membw_eff,
                    "sf": _sf(),
                }
        )
        return

    if "--single" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--single") + 1])
    else:
        cpus = NUM_CPUS
    r = run_benchmarks(cpus, headline_only="--headline-only" in sys.argv)
    total = sum(r["queries"].values())
    _emit(
        {
            "metric": "bench_total_wall",
            "value": total,
            "unit": "sec",
            "queries": r["queries"],
            "extras": r["extras"],
            "sf": _sf(),
            "num_cpus": cpus,
        }
    )


if __name__ == "__main__":
    main()
