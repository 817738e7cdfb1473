"""Hard-kill resume: a CEP run in a separate process is SIGKILLed after
its first micro-batch commits; a fresh process resumes from the manifest +
checkpoint and the final output is byte-identical to an uninterrupted run
(the sandbox analog of killing and resubmitting a `ray job submit` run).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

RUNNER = r"""
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         log_to_driver=False)
from headson_ray.pipelines.cep import CepEngine
from headson_ray.sources.pages import materialize_pages

out_dir, ckpt_dir = sys.argv[1], sys.argv[2]
paths = materialize_pages(1200, num_shards=6, tag="sigkill-resume")
eng = CepEngine(out_dir=out_dir, checkpoint_dir=ckpt_dir,
                num_state_actors=2, window_size_s=600,
                allowed_lateness_s=60, slide_count=2, session_gap_s=60)
groups = [paths[i:i + 1] for i in range(len(paths))]
m = eng.run(groups)
print("DONE", m["rows_processed"])
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


def _read_all(out_dir, kind):
    parts = []
    for b in sorted(_committed(os.path.join(out_dir, "MANIFEST.jsonl"))):
        p = os.path.join(out_dir, f"{kind}-b{b:06d}.parquet")
        if os.path.exists(p):
            parts.append(pq.read_table(p))
    import pyarrow as pa

    return pa.concat_tables(parts) if parts else None


def test_sigkill_mid_run_then_resume(tmp_path):
    clean_out = str(tmp_path / "clean-out")
    kill_out = str(tmp_path / "kill-out")

    # uninterrupted run
    r = subprocess.run(
        [sys.executable, "-c", RUNNER, clean_out, str(tmp_path / "clean-ck")],
        capture_output=True, text=True, timeout=300,
    )
    assert "DONE 1200" in r.stdout, r.stdout + r.stderr

    # run to be killed: SIGKILL as soon as >= 2 batches committed
    proc = subprocess.Popen(
        [sys.executable, "-c", RUNNER, kill_out, str(tmp_path / "kill-ck")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    manifest = os.path.join(kill_out, "MANIFEST.jsonl")
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        if len(_committed(manifest)) >= 2 and proc.poll() is None:
            os.kill(proc.pid, signal.SIGKILL)
            killed = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.05)
    proc.wait(timeout=60)
    assert killed, "run finished before it could be killed; speed up batches"
    n_before = len(_committed(manifest))
    assert 2 <= n_before < 7  # partial progress only

    # fresh process resumes and completes
    r2 = subprocess.run(
        [sys.executable, "-c", RUNNER, kill_out, str(tmp_path / "kill-ck")],
        capture_output=True, text=True, timeout=300,
    )
    assert "DONE" in r2.stdout, r2.stdout + r2.stderr
    # resumed run processed only the remaining rows
    resumed_rows = int(r2.stdout.split("DONE", 1)[1].split()[0])
    assert resumed_rows == 1200 - n_before * 200

    for kind in ("windows", "sliding", "sessions"):
        a = _read_all(clean_out, kind)
        b = _read_all(kill_out, kind)
        assert a is not None and b is not None, kind
        sort_keys = [(c, "ascending") for c in a.column_names]
        assert a.sort_by(sort_keys).equals(b.sort_by(sort_keys)), kind

    # the streaming coverage fold (cep_window_coverage) over the killed+
    # resumed run's committed panes is byte-identical to the clean run's
    from headson_ray.pipelines.webtext import (
        _pane_coverage_partial,
        _pane_delta_partial,
    )

    cov_a = _pane_coverage_partial(_read_all(clean_out, "windows"))
    cov_b = _pane_coverage_partial(_read_all(kill_out, "windows"))
    keys = [("win_start", "ascending")]
    assert cov_a.num_rows > 0
    assert cov_a.sort_by(keys).equals(cov_b.sort_by(keys))

    # same for the streaming crawl-delta fold (cep_crawl_delta)
    del_a = _pane_delta_partial(_read_all(clean_out, "windows"))
    del_b = _pane_delta_partial(_read_all(kill_out, "windows"))
    hkeys = [("host", "ascending")]
    assert del_a.num_rows > 0
    assert del_a.sort_by(hkeys).equals(del_b.sort_by(hkeys))
