"""Streaming CEP job runner — the `ray job submit` entry point.

    ray job submit --working-dir /root/repo -- \
        python scripts/run_stream.py \
            --input '/data/pages/shard-*.parquet' \
            --out /data/out --checkpoint /data/ckpt \
            --window-s 3600 --lateness-s 300 --slide-count 3 \
            --session-gap-s 1800 --batch-shards 8 \
            --state-actors 16 --summarize-budget 500

Resume-safe by construction: re-submitting the identical command after a
crash skips committed micro-batches (manifest) and restores actor state
from the per-batch checkpoint; output files regenerate byte-identically.
Standalone use auto-inits Ray; under `ray job submit` it connects to the
cluster started by the job.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet shard glob (event-time ordered)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--prior", default=None,
                    help="prior-crawl parquet glob for the delta join")
    ap.add_argument("--window-s", type=int, default=3600)
    ap.add_argument("--lateness-s", type=int, default=300)
    ap.add_argument("--slide-count", type=int, default=3)
    ap.add_argument("--session-gap-s", type=int, default=1800)
    ap.add_argument("--batch-shards", type=int, default=8,
                    help="shards per micro-batch")
    ap.add_argument("--state-actors", type=int, default=8)
    ap.add_argument("--summarize-budget", type=int, default=None,
                    help="enable the per-document summarize stage")
    ap.add_argument("--seen-mem-entries", type=int, default=500_000,
                    help="hot-tier cap of the tiered dedup state")
    ap.add_argument("--seen-mode", choices=["exact", "bloom"],
                    default="exact",
                    help="exact tiered dedup or approximate bloom mode")
    ap.add_argument("--distributed-merge-threshold", type=int,
                    default=500_000,
                    help="open-window count above which the second-phase "
                         "merge runs distributed instead of driver-side")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from headson_ray.pipelines.cep import CepEngine

    shards = sorted(glob.glob(args.input))
    if not shards:
        print(f"Error: no shards match {args.input}", file=sys.stderr)
        return 1
    groups = [
        shards[i:i + args.batch_shards]
        for i in range(0, len(shards), args.batch_shards)
    ]
    eng = CepEngine(
        out_dir=args.out,
        checkpoint_dir=args.checkpoint,
        num_state_actors=args.state_actors,
        window_size_s=args.window_s,
        allowed_lateness_s=args.lateness_s,
        slide_count=args.slide_count,
        session_gap_s=args.session_gap_s,
        summarize_budget=args.summarize_budget,
        seen_mem_entries=args.seen_mem_entries,
        seen_mode=args.seen_mode,
        distributed_merge_threshold=args.distributed_merge_threshold,
    )
    if args.prior:
        n = eng.load_prior_crawl(sorted(glob.glob(args.prior)))
        print(f"prior crawl loaded: {n} rows", file=sys.stderr)
    t0 = time.time()
    metrics = eng.run(groups)
    metrics["wall_s"] = round(time.time() - t0, 2)
    metrics.pop("actor_stats", None)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
