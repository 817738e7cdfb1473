"""Long-horizon CEP soak: hundreds of micro-batches with forced state
spill, a hard crash exactly AT a finalize boundary (windows written,
commit record absent — the worst-ordered crash the exactly-once sink
must absorb), resume, and three invariants:

1. final outputs byte-equal an uninterrupted run (windows/sliding/sessions);
2. checkpoint growth is bounded: snapshot retention keeps O(num_actors)
   pickles, not O(num_batches);
3. the manifest has exactly one commit per batch (replayed batch included).

Usage:
    python scripts/cep_long_soak.py [--batches 400] [--rows-per-batch 50]
                                    [--crash-at 25] [--workdir DIR]

The script re-invokes itself (`--_run`) for the clean / crashed / resumed
runs so each owns a fresh Ray session and the crash kills a real process.
Exits 0 only if every assertion holds; prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_SETTINGS = dict(
    num_state_actors=2,
    window_size_s=600,
    allowed_lateness_s=60,
    slide_count=2,
    session_gap_s=60,
    # force the tiered seen-state to spill to the sqlite cold tier early
    seen_mem_entries=64,
    # low enough that wide finalizations (notably the final flush) take
    # the distributed merge path at least once during the soak
    distributed_merge_threshold=300,
)


def _run_child(args: argparse.Namespace) -> None:
    """One engine run in THIS process (invoked via --_run)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        log_to_driver=False,
    )
    from headson_ray.pipelines.cep import CepEngine
    from headson_ray.sources.pages import materialize_pages

    paths = materialize_pages(
        args.batches * args.rows_per_batch,
        num_shards=args.batches,
        tag=f"cep-soak-{args.batches}x{args.rows_per_batch}",
    )
    groups = [[p] for p in paths]
    eng = CepEngine(
        out_dir=args.out, checkpoint_dir=args.ckpt, **SOAK_SETTINGS
    )
    if args.crash_at >= 0:
        orig = CepEngine._finalize_flows

        def crashing(self, b, max_window, wm):
            counts = orig(self, b, max_window, wm)
            if b == args.crash_at:
                # hard-kill AT the finalize boundary: this batch's window
                # parts are on disk, snapshot+commit never happen
                os._exit(137)
            return counts

        CepEngine._finalize_flows = crashing
    m = eng.run(groups)
    print("DONE", m["rows_processed"], m["windows_emitted"])
    ray.shutdown()


def _committed(manifest: str) -> list[int]:
    out = []
    if os.path.exists(manifest):
        with open(manifest) as fh:
            for line in fh:
                if line.strip():
                    rec = json.loads(line)
                    if rec.get("kind") == "commit":
                        out.append(rec["batch"])
    return out


def _read_all(out_dir: str, kind: str):
    """Canonical committed-output reader (single-file and
    distributed-merge partitioned forms)."""
    from headson_ray.sinks.parquet import ExactlyOnceSink

    return ExactlyOnceSink(out_dir).read_all_windows(kind)


def _spawn(extra: list[str], timeout: int) -> subprocess.CompletedProcess:
    env = {**os.environ, "RAY_ADDRESS": "local"}
    return subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--_run", *extra],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=400)
    ap.add_argument("--rows-per-batch", type=int, default=50)
    ap.add_argument("--crash-at", type=int, default=25)
    ap.add_argument("--workdir", default="/tmp/cep-long-soak")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--_run", action="store_true")
    ap.add_argument("--out")
    ap.add_argument("--ckpt")
    args = ap.parse_args()
    if getattr(args, "_run"):
        _run_child(args)
        return 0

    import shutil

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    base = [
        "--batches", str(args.batches),
        "--rows-per-batch", str(args.rows_per_batch),
    ]
    clean_out, clean_ck = f"{wd}/clean-out", f"{wd}/clean-ck"
    kill_out, kill_ck = f"{wd}/kill-out", f"{wd}/kill-ck"

    # 1. uninterrupted reference run
    r = _spawn(
        [*base, "--crash-at", "-1", "--out", clean_out, "--ckpt", clean_ck],
        args.timeout,
    )
    assert r.returncode == 0 and "DONE" in r.stdout, r.stdout + r.stderr

    # 2. crash exactly at the finalize boundary of --crash-at
    r = _spawn(
        [
            *base,
            "--crash-at", str(args.crash_at),
            "--out", kill_out,
            "--ckpt", kill_ck,
        ],
        args.timeout,
    )
    assert r.returncode == 137, (r.returncode, r.stdout, r.stderr)
    manifest = os.path.join(kill_out, "MANIFEST.jsonl")
    committed = _committed(manifest)
    assert max(committed) == args.crash_at - 1, committed
    # the boundary crash left batch K's finalized parts WITHOUT a commit
    # (whichever flows finalized rows this batch — empty flows skip the
    # file by design)
    orphans = [
        p
        for kind in ("windows", "sliding", "sessions")
        for p in (
            os.path.join(kill_out, f"{kind}-b{args.crash_at:06d}.parquet"),
            os.path.join(kill_out, f"{kind}-b{args.crash_at:06d}"),
        )
        if os.path.exists(p)
    ]
    assert orphans, "crash was not at the finalize boundary"

    # 3. resume to completion
    r = _spawn(
        [*base, "--crash-at", "-1", "--out", kill_out, "--ckpt", kill_ck],
        args.timeout,
    )
    assert r.returncode == 0 and "DONE" in r.stdout, r.stdout + r.stderr
    resumed_rows = int(r.stdout.split("DONE", 1)[1].split()[0])
    assert resumed_rows == (args.batches - args.crash_at) * args.rows_per_batch

    # invariant 1: byte-equal outputs
    for kind in ("windows", "sliding", "sessions"):
        a = _read_all(clean_out, kind)
        b = _read_all(kill_out, kind)
        assert a is not None and b is not None, kind
        keys = [(c, "ascending") for c in a.column_names]
        assert a.sort_by(keys).equals(b.sort_by(keys)), f"{kind} diverged"

    # invariant 2: bounded checkpoints — retention keeps <= 2 snapshot
    # pickles per actor regardless of batch count
    n_pickles = {}
    for ck in (clean_ck, kill_ck):
        for actor_dir in sorted(os.listdir(ck)):
            d = os.path.join(ck, actor_dir)
            if not (actor_dir.startswith("actor-") and os.path.isdir(d)):
                continue
            snaps = [f for f in os.listdir(d)
                     if f.startswith("batch-") and f.endswith(".pkl")]
            n_pickles[f"{os.path.basename(ck)}/{actor_dir}"] = len(snaps)
            assert len(snaps) <= 2, (actor_dir, snaps)
        spill = os.path.join(ck, "merge-spill")
        if os.path.isdir(spill):
            assert os.listdir(spill) == [], "merge spill accumulated"

    # invariant 3: exactly one commit per batch incl. the final flush and
    # the replayed boundary batch
    for out in (clean_out, kill_out):
        c = _committed(os.path.join(out, "MANIFEST.jsonl"))
        assert sorted(c) == list(range(args.batches + 1)), (out, sorted(c)[:5])
        assert len(c) == len(set(c)), "duplicate commit records"

    print(json.dumps({
        "batches": args.batches,
        "rows_per_batch": args.rows_per_batch,
        "crash_at": args.crash_at,
        "snapshot_pickles": n_pickles,
        "ok": True,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
