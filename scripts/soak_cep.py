"""CEP scale-path soaks (run standalone, never next to other Ray work):

  python scripts/soak_cep.py worst-case   # forced-spill + forced
                                          # distributed-merge stream
  python scripts/soak_cep.py prior-load   # bench-scale prior crawl load
                                          # with driver-RSS sampling

worst-case: every state actor spills its seen store to the sqlite cold
tier (seen_mem_entries small vs stream) and EVERY finalization takes the
distributed actor-spill -> Ray-groupby -> partitioned-write path
(distributed_merge_threshold=0) — the slowest legal configuration. The
figure to beat is the recorded round-2 ceiling (18.5k rows/s, set by the
then per-row sqlite probe). Micro-batch protocol matches round 2's run:
120k-row micro-batches (the finalize step is 3 Ray Dataset jobs whose
~3s fixed cost must amortize over the batch, exactly as real streaming
micro-batches are sized ≥100k rows; 12k-row batches measure job-launch
overhead, not the engine).

prior-load: loads a bench-scale prior crawl through the worker-side
scatter stage while a sampler thread records driver RSS; flat RSS is the
evidence that the corpus-sized join side never flows through the driver.

Each mode prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _driver_rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class RssSampler:
    def __init__(self, period_s: float = 0.2):
        self.period = period_s
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            self.samples.append(_driver_rss_mb())
            self._stop.wait(self.period)

    def __enter__(self):
        self.samples.append(_driver_rss_mb())
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()
        self.samples.append(_driver_rss_mb())


def soak_worst_case(rows: int = 480_000, num_cpus: int = 32) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from headson_ray.pipelines.cep import CepEngine
    from headson_ray.sources.pages import materialize_pages

    paths = materialize_pages(
        rows, tag=f"soak-{rows}", num_shards=max(8, rows // 12_000)
    )
    work = tempfile.mkdtemp(prefix="headson-soak-cep-")
    try:
        eng = CepEngine(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=8,
            window_size_s=600,
            allowed_lateness_s=60,
            seen_mem_entries=50_000,  # force every actor to spill
            distributed_merge_threshold=0,  # force distributed merges
            merge_parts=8,
        )
        ray.get([a.stats.remote() for a in eng.actors])
        # ~120k-row micro-batches (round-2 comparable; see module doc)
        n_g = max(1, round(120_000 / max(1, rows / len(paths))))
        groups = [paths[i : i + n_g] for i in range(0, len(paths), n_g)]
        t0 = time.time()
        m = eng.run(groups)
        dt = time.time() - t0
        stats = m["actor_stats"]
        out = {
            "metric": "cep_worst_case_rows_per_sec",
            "value": m["rows_processed"] / dt,
            "unit": "rows/sec",
            "rows": m["rows_processed"],
            "seconds": dt,
            "micro_batches": len(groups),
            "windows_emitted": m["windows_emitted"]
            + m["sliding_emitted"]
            + m["sessions_emitted"],
            "actors_spilled": sum(1 for s in stats if s["seen_spilled"]),
            "num_state_actors": len(stats),
            "num_cpus": num_cpus,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()
    return out


def soak_prior_load(rows: int = 480_000, num_cpus: int = 32) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from headson_ray.pipelines.cep import CepEngine
    from headson_ray.sources.pages import materialize_pages

    paths = materialize_pages(
        rows, tag=f"soak-{rows}", num_shards=max(8, rows // 12_000)
    )
    work = tempfile.mkdtemp(prefix="headson-soak-prior-")
    try:
        eng = CepEngine(
            out_dir=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            num_state_actors=8,
            window_size_s=600,
            seen_mem_entries=100_000,  # actors spill their prior tier too
        )
        ray.get([a.stats.remote() for a in eng.actors])
        with RssSampler() as rss:
            t0 = time.time()
            total = eng.load_prior_crawl(paths)
            dt = time.time() - t0
        per_actor = [
            s["prior_entries"]
            for s in ray.get([a.stats.remote() for a in eng.actors])
        ]
        out = {
            "metric": "prior_load_rows_per_sec",
            "value": total / dt,
            "unit": "rows/sec",
            "rows": total,
            "seconds": dt,
            "driver_rss_start_mb": rss.samples[0],
            "driver_rss_peak_mb": max(rss.samples),
            "driver_rss_end_mb": rss.samples[-1],
            "driver_rss_growth_mb": max(rss.samples) - rss.samples[0],
            "prior_entries_total": sum(per_actor),
            "prior_entries_min_actor": min(per_actor),
            "prior_entries_max_actor": max(per_actor),
            "num_cpus": num_cpus,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "worst-case"
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 480_000
    if mode == "worst-case":
        print(json.dumps(soak_worst_case(rows)))
    elif mode == "prior-load":
        print(json.dumps(soak_prior_load(rows)))
    else:
        raise SystemExit(f"unknown mode: {mode}")


if __name__ == "__main__":
    main()
