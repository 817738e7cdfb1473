"""Hard-kill resume for the round-5 streaming flows: a run in a
separate process is SIGKILLed mid-stream; a fresh process resumes from
the manifest + actor snapshots and the committed ledgers are
byte-identical to an uninterrupted run (the same contract as
test_cep_sigkill_resume, applied to the near-dup and stream-join
flows)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

DEDUP_RUNNER = r"""
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         log_to_driver=False)
from headson_ray.pipelines.streamdedup import NearDupStream, doc_range_groups

out_dir, ckpt_dir = sys.argv[1], sys.argv[2]
paths = ["/root/testdata/sf0.001/documents.parquet"]
eng = NearDupStream(out_dir=out_dir, checkpoint_dir=ckpt_dir,
                    num_state_actors=2)
m = eng.run(doc_range_groups(paths, 16))
print("DONE", m["rows_processed"])
ray.shutdown()
"""

JOIN_RUNNER = r"""
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         log_to_driver=False)
from headson_ray.pipelines.streamjoin import StreamJoin, ts_range_groups

out_dir, ckpt_dir = sys.argv[1], sys.argv[2]
paths = ["/root/testdata/sf0.001/events.parquet"]
eng = StreamJoin(out_dir=out_dir, checkpoint_dir=ckpt_dir,
                 num_state_actors=2)
m = eng.run(ts_range_groups(paths, 16))
print("DONE", m["pairs_emitted"])
ray.shutdown()
"""


def _committed(manifest) -> set[int]:
    done = set()
    if os.path.exists(manifest):
        with open(manifest) as fh:
            for line in fh:
                if line.strip():
                    rec = json.loads(line)
                    if rec.get("kind") == "commit":
                        done.add(rec["batch"])
    return done


def _kill_and_resume(tmp_path, runner, kind, min_commits=3):
    clean_out = str(tmp_path / "clean-out")
    kill_out = str(tmp_path / "kill-out")

    r = subprocess.run(
        [sys.executable, "-c", runner, clean_out,
         str(tmp_path / "clean-ck")],
        capture_output=True, text=True, timeout=300,
    )
    assert "DONE" in r.stdout, r.stdout + r.stderr

    proc = subprocess.Popen(
        [sys.executable, "-c", runner, kill_out,
         str(tmp_path / "kill-ck")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    manifest = os.path.join(kill_out, "MANIFEST.jsonl")
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        if len(_committed(manifest)) >= min_commits and proc.poll() is None:
            os.kill(proc.pid, signal.SIGKILL)
            killed = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.02)
    proc.wait(timeout=60)
    if not killed:
        pytest.skip("run finished before the killer caught it")
    n_before = len(_committed(manifest))
    assert min_commits <= n_before < 16  # partial progress only

    r2 = subprocess.run(
        [sys.executable, "-c", runner, kill_out,
         str(tmp_path / "kill-ck")],
        capture_output=True, text=True, timeout=300,
    )
    assert "DONE" in r2.stdout, r2.stdout + r2.stderr

    assert _committed(manifest) == set(range(16))
    for b in range(16):
        a = os.path.join(clean_out, f"{kind}-b{b:06d}.parquet")
        k = os.path.join(kill_out, f"{kind}-b{b:06d}.parquet")
        assert os.path.exists(a) == os.path.exists(k), b
        if os.path.exists(a):
            assert pq.read_table(a).equals(pq.read_table(k)), b


def test_neardup_stream_sigkill_resume(tmp_path):
    _kill_and_resume(tmp_path, DEDUP_RUNNER, "ledger")


def test_stream_join_sigkill_resume(tmp_path):
    _kill_and_resume(tmp_path, JOIN_RUNNER, "pairs")
